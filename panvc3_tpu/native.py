"""Loader for the native host extension, with pure-Python fallback.

Build with ``make native``; the extension lands in
``panvc3_tpu/native_build/``.  All call sites must work without it (the
numpy paths remain the reference implementations the native code is tested
against).
"""

from __future__ import annotations

import os
import sys

_native = None


def get_native():
    """The _panvc3_native module, or None when not built."""
    global _native
    if _native is not None:
        return _native or None
    build_dir = os.path.join(os.path.dirname(__file__), "native_build")
    if os.path.isdir(build_dir) and build_dir not in sys.path:
        sys.path.insert(0, build_dir)
    try:
        import _panvc3_native

        _native = _panvc3_native
    except ImportError:
        _native = False
    return _native or None
