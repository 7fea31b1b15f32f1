"""Loader for the native VCF-emission CPython extension
(io/_native/vcfemit.c, built on demand by the shared Makefile)."""

from __future__ import annotations

import importlib.machinery
import importlib.util
import os

from .native import _NATIVE_DIR, _build, _needs_rebuild

_SO_PATH = os.path.join(_NATIVE_DIR, "_pepper_vcfemit.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "vcfemit.c")

_modules: dict = {}


def _load_extension(name: str, so_path: str, src_path: str):
    if name in _modules:
        return _modules[name]
    if (not os.path.exists(so_path)
            or os.path.getmtime(src_path) > os.path.getmtime(so_path)
            or _needs_rebuild()):
        _build()
    loader = importlib.machinery.ExtensionFileLoader(name, so_path)
    spec = importlib.util.spec_from_loader(name, loader)
    module = importlib.util.module_from_spec(spec)
    loader.exec_module(module)
    _modules[name] = module
    return module


def get_module():
    """Import (building if missing/stale) the _pepper_vcfemit extension."""
    return _load_extension("_pepper_vcfemit", _SO_PATH, _SRC_PATH)


def get_decode_module():
    """Import the _pepper_decode extension (candidate-decode gate pass)."""
    return _load_extension(
        "_pepper_decode", os.path.join(_NATIVE_DIR, "_pepper_decode.so"),
        os.path.join(_NATIVE_DIR, "decode_gates.c"))
