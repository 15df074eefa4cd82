"""ctypes bridge to the native compiler core (native/libdrstencil.so).

The C++17 library is the production compiler path (parser → fusion →
partition → Pallas emitter); this bridge exposes it to Python for the
autotuner and for differential tests against the pure-Python IR.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdrstencil.so")

_lib = None


class NativeError(RuntimeError):
    pass


def build(force: bool = False) -> str:
    """Build the native library (make -C native); make is a fast no-op
    when the .so is newer than the sources, so this always runs it —
    a stale committed binary must never shadow edited sources."""
    if force:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "clean"], check=True,
            capture_output=True,
        )
    subprocess.run(
        ["make", "-C", _NATIVE_DIR, "libdrstencil.so"],
        check=True,
        capture_output=True,
    )
    return _LIB_PATH


def _get_lib():
    global _lib
    if _lib is None:
        build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.drs_analyze.restype = ctypes.c_void_p
        lib.drs_analyze.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.drs_emit.restype = ctypes.c_void_p
        lib.drs_emit.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
        ]
        lib.drs_free.restype = None
        lib.drs_free.argtypes = [ctypes.c_void_p]
        if lib.drs_abi_version() != 8:
            raise NativeError(
                "libdrstencil ABI mismatch (stale build?) — "
                "run `make -C native clean libdrstencil.so`"
            )
        _lib = lib
    return _lib


def _consume(lib, ptr) -> str:
    if not ptr:
        raise NativeError("null result from libdrstencil")
    try:
        return ctypes.string_at(ptr).decode()
    finally:
        lib.drs_free(ptr)


def analyze(stc_text: str, name: str = "stencil", step: int = 1,
            distance: int = 0, merge_forward: int = 5) -> dict:
    """Run the native analysis pipeline; returns the parsed JSON dump."""
    lib = _get_lib()
    ptr = lib.drs_analyze(
        stc_text.encode(), name.encode(), step, distance, merge_forward
    )
    out = json.loads(_consume(lib, ptr))
    if "error" in out:
        raise NativeError(out["error"])
    return out


def emit(stc_text: str, name: str = "stencil", step: int = 1,
         distance: int = 0, merge_forward: int = 5, tm: int = 0,
         check: bool = False, gold_only: bool = False,
         dtype: str = "float32", trapezoid: bool = False,
         lane_mode: str = "", ch: int = 0, shards: int = 0,
         vfuse: bool = False, block: int = 1, prefetch: int = 2,
         jfix: str = "outer") -> str:
    """Emit a specialized Pallas program via the native emitter."""
    lib = _get_lib()
    ptr = lib.drs_emit(
        stc_text.encode(), name.encode(), step, distance, merge_forward,
        tm, int(check), int(gold_only), dtype.encode(),
        int(trapezoid), (lane_mode or "").encode(), ch, shards,
        int(vfuse), int(block), prefetch, jfix.encode(),
    )
    out = _consume(lib, ptr)
    if out.startswith('{"error"'):
        raise NativeError(json.loads(out)["error"])
    return out
