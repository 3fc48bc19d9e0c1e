"""Placeholder — implemented later this round."""


class PWCProbFlow:
    def __init__(self, *a, **k):
        raise NotImplementedError("PWCProbFlow lands later this round")


class ComponentNet:
    def __init__(self, *a, **k):
        raise NotImplementedError("ComponentNet lands later this round")
