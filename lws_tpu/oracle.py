"""ctypes binding for the native C++ oracle (lws_tpu/native/lws_oracle.cpp).

The oracle is the trusted scalar implementation of the LWS semantics
(Gauss-Seidel raster order, double precision) that the fast TPU kernels are
differential-tested against. It is compiled on demand with g++ and cached
under native/build/.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "oracle_sweeps", "oracle_online"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "lws_oracle.cpp")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "liblws_oracle.so")

_lib = None
_D = ctypes.POINTER(ctypes.c_double)


def _build() -> str:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True)
    return _LIB_PATH


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.lws_oracle_sweeps.argtypes = [
            _D, _D, ctypes.c_int, ctypes.c_int, _D, _D,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _D, ctypes.c_int, ctypes.c_int]
        lib.lws_oracle_online.argtypes = [
            _D, _D, ctypes.c_int, ctypes.c_int, _D, _D, _D, _D, _D, _D,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _D, ctypes.c_int, ctypes.c_int]
        _lib = lib
    return _lib


def available() -> bool:
    """Whether the trusted-scalar oracle can run here (g++ at runtime).

    Differential tests SKIP when this is False — a clean install without a
    compiler silently loses that coverage, so surface it: set
    LWS_TPU_DISABLE_ORACLE=1 to exercise/validate the skip path
    deliberately (tools/ci.sh wheel-install smoke)."""
    if os.environ.get("LWS_TPU_DISABLE_ORACLE"):
        return False
    try:
        _get_lib()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _dp(a):
    return a.ctypes.data_as(_D)


def _prep_w(W):
    W = np.asarray(W, dtype=np.complex128)
    return np.ascontiguousarray(W.real), np.ascontiguousarray(W.imag)


def _prep(S, W):
    S = np.asarray(S, dtype=np.complex128)
    sr = np.ascontiguousarray(S.real)
    si = np.ascontiguousarray(S.imag)
    wr, wi = _prep_w(W)
    return sr, si, wr, wi


def oracle_sweeps(S, W, thresholds, visibility=None):
    """Batch (visibility=Q-1, default) or no-future (visibility=-1) sweeps."""
    lib = _get_lib()
    sr, si, wr, wi = _prep(S, W)
    T, F = sr.shape
    Qprime, Q, Lp1 = W.shape
    if visibility is None:
        visibility = Q - 1
    thr = np.ascontiguousarray(np.asarray(thresholds, dtype=np.float64))
    lib.lws_oracle_sweeps(_dp(sr), _dp(si), T, F, _dp(wr), _dp(wi),
                          Qprime, Q, Lp1 - 1, _dp(thr), len(thr), int(visibility))
    return sr + 1j * si


def oracle_online(S, W, W_ai, W_af, thresholds, LA):
    """Online (TF-RTISI-LA) schedule."""
    lib = _get_lib()
    sr, si, wr, wi = _prep(S, W)
    wr_ai, wi_ai = _prep_w(W_ai)
    wr_af, wi_af = _prep_w(W_af)
    T, F = sr.shape
    Qprime, Q, Lp1 = W.shape
    thr = np.ascontiguousarray(np.asarray(thresholds, dtype=np.float64))
    lib.lws_oracle_online(_dp(sr), _dp(si), T, F, _dp(wr), _dp(wi),
                          _dp(wr_ai), _dp(wi_ai), _dp(wr_af), _dp(wi_af),
                          Qprime, Q, Lp1 - 1, _dp(thr), len(thr), int(LA))
    return sr + 1j * si
