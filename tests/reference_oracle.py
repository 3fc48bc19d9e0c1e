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


def import_reference(name: str):
    """Import a module from the reference tree, e.g. 'utils.uflow_utils'."""
    add_reference_path()
    import importlib

    return importlib.import_module(name)
