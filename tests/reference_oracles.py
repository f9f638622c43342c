"""Loaders for the reference's pure-NumPy env engines, used as golden
oracles in differential tests.  The reference tree is mounted read-only at
/root/reference; we import its env modules (NOT algorithm/TF code) and
replay identical action sequences through both implementations.

Tests that need an oracle must skip gracefully when the reference tree is
unavailable (e.g. when this repo is checked out standalone).
"""

import importlib.util
import os

import numpy as np

REFERENCE_ROOT = os.environ.get("CM3_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def _shim_legacy_numpy():
    # the 2018-era reference uses np.float / np.int, removed in numpy>=1.24
    for name, typ in (("float", float), ("int", int), ("bool", bool)):
        try:
            getattr(np, name)
        except AttributeError:
            setattr(np, name, typ)


def load_module(rel_path, name):
    _shim_legacy_numpy()
    path = os.path.join(REFERENCE_ROOT, rel_path)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_checkers():
    return load_module("env/checkers.py", "ref_checkers")


def ensure_multiagent_package():
    """Make ``multiagent.*`` submodules importable WITHOUT executing the
    package __init__ (which imports gym, unavailable here)."""
    import sys
    import types
    _shim_legacy_numpy()
    if "multiagent" in sys.modules:
        return
    pkg_dir = os.path.join(REFERENCE_ROOT, "env", "multiagent-particle-envs",
                           "multiagent")
    pkg = types.ModuleType("multiagent")
    pkg.__path__ = [pkg_dir]
    sys.modules["multiagent"] = pkg


def load_particle_core():
    """multiagent.core is numpy-only; importable directly."""
    ensure_multiagent_package()
    import multiagent.core as core  # noqa
    return core
