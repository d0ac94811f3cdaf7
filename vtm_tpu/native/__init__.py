"""Native (C) runtime components, built on demand with the system
compiler and cached next to the source. Always fall back to the Python
engines when a compiler is unavailable.

Set VTM_TPU_NO_NATIVE=1 to force the pure-Python paths.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(name: str, sources: list[str]):
    tag = sysconfig.get_config_var("SOABI") or "cpython"
    so = os.path.join(_DIR, f"_{name}.{tag}.so")
    srcs = [os.path.join(_DIR, s) for s in sources]
    newest = max(os.path.getmtime(s) for s in srcs)
    if not os.path.exists(so) or os.path.getmtime(so) < newest:
        cc = os.environ.get("CC", "cc")
        inc = sysconfig.get_paths()["include"]
        cmd = [cc, "-O3", "-shared", "-fPIC", f"-I{inc}", *srcs, "-o", so]
        subprocess.run(cmd, check=True, capture_output=True)
    return so


def load_cabac():
    """Return the _cabac_native module, building it if needed; None if the
    native path is disabled or the build fails."""
    if os.environ.get("VTM_TPU_NO_NATIVE"):
        return None
    try:
        import _cabac_native  # already importable?

        return _cabac_native
    except ImportError:
        pass
    try:
        so = _build("cabac_native", ["cabac.c"])
        import importlib.util

        spec = importlib.util.spec_from_file_location("_cabac_native", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules["_cabac_native"] = mod
        return mod
    except Exception:
        return None


def load_tcq():
    """Return the _tcq_native module (batched TCQ scan, the native twin
    of encoder/tcq_scan.py), building on demand; None if disabled or the
    build fails."""
    if os.environ.get("VTM_TPU_NO_NATIVE"):
        return None
    try:
        so = _build("tcq_native", ["tcq.c"])
        import importlib.util

        spec = importlib.util.spec_from_file_location("_tcq_native", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


def load_depquant():
    """Return the _depquant_native module, building on demand; None if the
    native path is disabled or the build fails."""
    if os.environ.get("VTM_TPU_NO_NATIVE"):
        return None
    try:
        so = _build("depquant_native", ["depquant.c"])
        import importlib.util

        spec = importlib.util.spec_from_file_location("_depquant_native", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None
