"""Placeholder — implemented later this round."""


class PWCLiteUflow:
    def __init__(self, *a, **k):
        raise NotImplementedError("PWCLiteUflow lands later this round")
