"""ctypes bindings + on-demand build of the native runtime library.

The shared library is compiled once (g++ -O3) into ``_build/`` next to this
file and cached by source hash. If no toolchain is available, callers fall
back to the pure-Python paths (``native_available()`` gates).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).parent
_SRC = _HERE / "src" / "pharmsol_native.cpp"
_BUILD = _HERE / "_build"

_lock = threading.Lock()
_lib = None
_tried = False


def _source_hash() -> str:
    return hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]


def _compile() -> Optional[Path]:
    _BUILD.mkdir(exist_ok=True)
    out = _BUILD / f"libpharmsol_native_{_source_hash()}.so"
    if out.exists():
        return out
    cxx = os.environ.get("CXX", "g++")
    cmd = [
        cxx, "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", str(out), str(_SRC),
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        # retry without -march=native (portability)
        cmd.remove("-march=native")
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        except (OSError, subprocess.TimeoutExpired):
            return None
        if proc.returncode != 0:
            sys.stderr.write(f"pharmsol-tpu native build failed:\n{proc.stderr}\n")
            return None
    return out


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    lib.psn_parse.restype = c.c_void_p
    lib.psn_parse.argtypes = [c.c_char_p, c.c_long]
    lib.psn_error.restype = c.c_char_p
    lib.psn_error.argtypes = [c.c_void_p]
    lib.psn_nrows.restype = c.c_long
    lib.psn_nrows.argtypes = [c.c_void_p]
    lib.psn_ncov.restype = c.c_long
    lib.psn_ncov.argtypes = [c.c_void_p]
    lib.psn_numeric.restype = c.c_int
    lib.psn_numeric.argtypes = [c.c_void_p, c.c_char_p, c.POINTER(c.c_double)]
    lib.psn_interned.restype = c.c_int
    lib.psn_interned.argtypes = [c.c_void_p, c.c_char_p, c.POINTER(c.c_long)]
    lib.psn_cov_column.restype = c.c_int
    lib.psn_cov_column.argtypes = [c.c_void_p, c.c_long, c.POINTER(c.c_double)]
    lib.psn_table_len.restype = c.c_long
    lib.psn_table_len.argtypes = [c.c_void_p, c.c_char_p]
    lib.psn_table_get.restype = c.c_long
    lib.psn_table_get.argtypes = [c.c_void_p, c.c_char_p, c.c_long, c.c_char_p, c.c_long]
    lib.psn_cov_name.restype = c.c_long
    lib.psn_cov_name.argtypes = [c.c_void_p, c.c_long, c.c_char_p, c.c_long]
    lib.psn_free.restype = None
    lib.psn_free.argtypes = [c.c_void_p]
    lib.psn_version.restype = c.c_char_p
    return lib


def get_library() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PHARMSOL_TPU_NO_NATIVE") == "1":
            return None
        so = _compile()
        if so is None:
            return None
        try:
            _lib = _bind(ctypes.CDLL(str(so)))
        except OSError:
            _lib = None
        return _lib


def native_available() -> bool:
    return get_library() is not None
