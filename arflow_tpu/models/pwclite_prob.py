"""Placeholder — implemented later this round."""


class PWCLiteProb:
    def __init__(self, *a, **k):
        raise NotImplementedError("PWCLiteProb lands later this round")
