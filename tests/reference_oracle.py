"""Import helpers for using the reference PyTorch code as a numerical oracle.

The reference at /root/reference is read-only PUBLIC content; we import its
torch-only modules to generate golden values for parity tests. Nothing from it
is copied into the framework.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_easydict_shim():
    """The reference imports easydict (not installed); Config is compatible."""
    if "easydict" in sys.modules:
        return
    from arflow_tpu.config import Config

    mod = types.ModuleType("easydict")
    mod.EasyDict = Config
    sys.modules["easydict"] = mod


def add_reference_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _install_easydict_shim()
    # The reference's top-level dirs are PEP-420 namespace packages; installed
    # regular packages with the same name (e.g. HuggingFace 'datasets') win
    # resolution. Pin explicit package shims at the reference paths.
    import os

    for pkg in ("datasets", "trainer", "transforms", "models", "losses", "utils"):
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [os.path.join(REFERENCE_ROOT, pkg)]
            sys.modules[pkg] = mod
    # path.py isn't installed; a pathlib.Path subclass covers what the
    # reference uses at import time (the datasets aren't exercised in tests).
    if "path" not in sys.modules:
        try:
            import path  # noqa: F401
        except ImportError:
            import pathlib

            pm = types.ModuleType("path")

            class _Path(type(pathlib.Path())):
                def files(self, pattern="*"):
                    return sorted(p for p in self.glob(pattern) if p.is_file())

                def dirs(self):
                    return sorted(p for p in self.iterdir() if p.is_dir())

                def makedirs_p(self):
                    self.mkdir(parents=True, exist_ok=True)

            pm.Path = _Path
            sys.modules["path"] = pm
    # torchvision isn't installed; stub the symbols the reference touches.
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tvt = types.ModuleType("torchvision.transforms")

            class _Compose:
                def __init__(self, ts):
                    self.ts = ts

                def __call__(self, x):
                    for t in self.ts:
                        x = t(x)
                    return x

            tvt.Compose = _Compose
            tvt.ColorJitter = lambda **kw: (lambda x: x)
            tv.transforms = tvt
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tvt


def import_reference(name: str):
    """Import a module from the reference tree, e.g. 'utils.uflow_utils'."""
    add_reference_path()
    import importlib

    return importlib.import_module(name)
