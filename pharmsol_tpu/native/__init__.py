"""Native (C++) runtime components: columnar CSV parsing, ctypes bindings.

Built on demand with g++; every entry point degrades gracefully to the
pure-Python implementation when no toolchain is present
(PHARMSOL_TPU_NO_NATIVE=1 forces the fallback).
"""

from .loader import get_library, native_available  # noqa: F401
from .pmetrics import read_pmetrics_native  # noqa: F401
