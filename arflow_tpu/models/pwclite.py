"""Placeholder — implemented later this round."""


class PWCLite:
    def __init__(self, *a, **k):
        raise NotImplementedError("PWCLite lands later this round")
