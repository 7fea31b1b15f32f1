"""Loader for the native VCF-emission CPython extension
(io/_native/vcfemit.c, built on demand by the shared Makefile)."""

from __future__ import annotations

import importlib.machinery
import importlib.util
import os

from .native import _NATIVE_DIR, _build, _needs_rebuild

_SO_PATH = os.path.join(_NATIVE_DIR, "_pepper_vcfemit.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "vcfemit.c")

_module = None


def get_module():
    """Import (building if missing/stale) the _pepper_vcfemit extension."""
    global _module
    if _module is not None:
        return _module
    if (not os.path.exists(_SO_PATH)
            or os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
            or _needs_rebuild()):
        _build()
    loader = importlib.machinery.ExtensionFileLoader("_pepper_vcfemit",
                                                     _SO_PATH)
    spec = importlib.util.spec_from_loader("_pepper_vcfemit", loader)
    _module = importlib.util.module_from_spec(spec)
    loader.exec_module(_module)
    return _module
