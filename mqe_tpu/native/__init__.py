"""Native (C++) host-side kernels with ctypes bindings and numpy fallbacks.

The compute path is JAX/XLA/Pallas on the TPU; this package covers the
host-side runtime work the reference delegated to Isaac Gym's native code
(construction-time terrain generation, ref barrier_track.py:395-410).
Kernels are pure functions over caller-provided buffers; all randomness
stays in numpy so native and fallback paths are numerically identical.

Build once with `python -m mqe_tpu.native.build`; consumers call
`get_lib()` which returns the loaded library or None (fallback).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "terrain_kernels.cc")
_SO = os.path.join(_DIR, "libterrain_kernels.so")

_lib = None
_tried = False


def build(verbose: bool = True) -> bool:
    """Compile the shared library with g++. Returns True on success."""
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        if verbose:
            print(f"native build failed to launch: {e}", file=sys.stderr)
        return False
    if r.returncode != 0:
        if verbose:
            print(f"native build failed:\n{r.stderr}", file=sys.stderr)
        return False
    return True


def get_lib():
    """Load (building if stale/missing) the native library, or None."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    fresh = os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    if not fresh and not build(verbose=False):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    import numpy as np
    from numpy.ctypeslib import ndpointer

    f64 = ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    lib.perlin_octave.argtypes = [f64, i64, i64, i64, i64, f64]
    lib.perlin_octave.restype = None
    lib.perlin_octave_accumulate.argtypes = [
        f64, i64, i64, i64, i64, i64, i64, ctypes.c_double, f64, f64,
    ]
    lib.perlin_octave_accumulate.restype = None
    _lib = lib
    return _lib
