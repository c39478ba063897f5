"""ctypes bridge to the native reference-orbit evaluator
(``native/fs_orbit.cpp``), the MT3-CPU-path analogue.

The shared library is built on demand with g++ against the system
libgmp (mpn layer, stable ABI) and cached under ``native/build/``.
Falls back gracefully: callers use ``available()`` and keep the pure
Python fixed-point path when the toolchain or libgmp is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from fractalshark_tpu.core.hdr_host import HD
from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.engine.perturbation_results import PerturbationResults

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "fs_orbit.cpp")
_SO = os.path.join(_ROOT, "native", "build", "libfs_orbit.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-march=native", "-pthread",
           "-o", _SO, _SRC, "-l:libgmp.so.10"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.fs_reference_orbit.restype = ctypes.c_int64
        lib.fs_reference_orbit.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),   # out_e (HDR exponents)
            ctypes.POINTER(ctypes.c_int32),   # status
            ctypes.c_int64,                   # reuse_limbs (0 = off)
            ctypes.POINTER(ctypes.c_uint64),  # out_reuse
            ctypes.POINTER(ctypes.c_int8),    # out_reuse_sign
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _hp_to_limbs(x: HighPrecision, nlimbs: int) -> tuple[np.ndarray, int]:
    """Sign-magnitude little-endian 64-bit limbs, one integer limb
    (value = mag / 2^(64*(nlimbs-1)))."""
    frac_bits = 64 * (nlimbs - 1)
    sh = x.exp + frac_bits
    mant = x.mant << sh if sh >= 0 else _round_shift(x.mant, -sh)
    sign = -1 if mant < 0 else 1
    mant = abs(mant)
    out = np.zeros(nlimbs, np.uint64)
    i = 0
    while mant and i < nlimbs:
        out[i] = mant & 0xFFFFFFFFFFFFFFFF
        mant >>= 64
        i += 1
    if mant:
        raise OverflowError("value exceeds native fixed-point range")
    return out, sign


def _round_shift(m: int, s: int) -> int:
    half = 1 << (s - 1)
    return (m + half) >> s if m >= 0 else -((-m + half) >> s)


def compute_reference_orbit_native(center_x: HighPrecision,
                                   center_y: HighPrecision,
                                   max_iterations: int,
                                   max_radius: HighPrecision,
                                   periodicity: bool = True,
                                   precision_bits: int | None = None,
                                   reuse_frac_bits: int | None = None
                                   ) -> PerturbationResults:
    """reuse_frac_bits: when set, the native loop also records the
    intermediate-precision reuse copy of every z during the run (a
    limb-truncating memcpy per iteration — RefOrbitCalc.cpp:543-548),
    attached as ``extra["reuse_orbit"]``.  The effective reuse
    precision rounds up to a limb multiple ≥ the request."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native orbit library unavailable")
    prec = precision_bits or max(center_x.prec, center_y.prec)
    nlimbs = max(2, (prec + 80 + 63) // 64 + 1)
    cx, sx = _hp_to_limbs(center_x, nlimbs)
    cy, sy = _hp_to_limbs(center_y, nlimbs)
    rad = HD.from_hp(max_radius)
    out_x = np.zeros(max_iterations + 2, np.float64)
    out_y = np.zeros(max_iterations + 2, np.float64)
    out_e = np.zeros(max_iterations + 2, np.int32)
    status = ctypes.c_int32(0)
    rl = 0
    out_reuse = np.zeros(1, np.uint64)
    out_rsign = np.zeros(2, np.int8)
    if reuse_frac_bits is not None:
        rl = min(-(-int(reuse_frac_bits) // 64) + 1, nlimbs)
        out_reuse = np.zeros((max_iterations + 2) * 2 * rl, np.uint64)
        out_rsign = np.zeros((max_iterations + 2) * 2, np.int8)
    count = lib.fs_reference_orbit(
        cx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), sx,
        cy.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), sy,
        nlimbs, max_iterations, rad.m, rad.e, int(periodicity),
        out_x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_e.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(status), rl,
        out_reuse.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out_rsign.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    period = count if status.value == 1 else 0
    escaped = count if status.value == 2 else 0
    oe = out_e[:count]
    res = PerturbationResults(
        center_x=center_x, center_y=center_y,
        orbit_x=out_x[:count].copy(), orbit_y=out_y[:count].copy(),
        max_radius=max_radius, period=period, escaped_at=escaped,
        max_iterations=max_iterations, precision_bits=prec,
        orbit_e=oe.copy() if (oe != 0).any() else None)
    if reuse_frac_bits is not None and rl > 0:
        from fractalshark_tpu.engine.reuse import ReuseOrbit
        limbs = out_reuse[:count * 2 * rl].reshape(count, 2, rl)
        sgn = out_rsign[:count * 2].reshape(count, 2)
        raw = limbs.tobytes()
        stride = 2 * rl * 8
        half = rl * 8
        rzx, rzy = [], []
        for i in range(count):
            o = i * stride
            rzx.append(int(sgn[i, 0]) * int.from_bytes(
                raw[o:o + half], "little"))
            rzy.append(int(sgn[i, 1]) * int.from_bytes(
                raw[o + half:o + stride], "little"))
        res.extra["reuse_orbit"] = ReuseOrbit(
            zx=rzx, zy=rzy, frac_bits=64 * (rl - 1),
            center_x=center_x, center_y=center_y)
    return res
