"""ctypes bridge to the native LA-table builder (``native/la_build.cpp``).

The reference builds its LA tables in C++ on the CPU
(``FractalSharkLib/LAReference.cpp:218+`` CreateLAFromOrbit/MT); the
Python builder in ``la_reference.py`` costs ~60 µs per orbit entry
(HD/HDC object arithmetic), which dominates deep-view render setup.
This bridge runs the identical algorithm natively (~3 orders of
magnitude faster) and returns an ``LAReferenceHost``-compatible object
holding the flattened arrays directly.

Falls back gracefully: callers use ``available()`` and keep the Python
builder when the toolchain is missing. The Python builder remains the
differential-test oracle (tests/test_la.py compares the two).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from fractalshark_tpu.core.hdr_host import HD, HDC
from fractalshark_tpu.engine.la_reference import (ATInfo, LAParameters,
                                                  LAReferenceHost)

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "la_build.cpp")
_SO = os.path.join(_ROOT, "native", "build", "libfs_la.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False

_D = ctypes.POINTER(ctypes.c_double)
_I = ctypes.POINTER(ctypes.c_int64)


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    # -ffp-contract=off: no FMA contraction — outputs stay bit-exact vs
    # the Python oracle (the baseline -O2 build relied on x86-64 having
    # no FMA instruction; make it explicit); C++20 for std::bit_cast
    cmd = ["g++", "-O3", "-std=c++20", "-ffp-contract=off",
           "-shared", "-fPIC", "-o", _SO, _SRC]
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
        lib.fs_la_generate.restype = ctypes.c_int64
        lib.fs_la_generate.argtypes = [
            _D, _D, ctypes.c_int64,                      # orbit
            ctypes.c_void_p,                             # orbit exps (opt)
            ctypes.c_double, ctypes.c_int64,             # radius
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int,
            ctypes.c_int64,                              # low_bound
            ctypes.c_int,                                # sub_is_f32
            ctypes.c_int64,                              # cap
            _D, _I, _D, _I, _D, _I, _D, _I, _D, _I,      # node arrays
            _I, _I,                                      # step/next
            _I, _I,                                      # stage arrays
            _D, _I, _I,                                  # AT + flags
        ]
        lib.fs_la_generate_rc.restype = ctypes.c_int64
        lib.fs_la_generate_rc.argtypes = [
            _D, _D, _I, ctypes.c_int64, ctypes.c_int64,  # anchors, n_orbit
            ctypes.c_double, ctypes.c_double,            # cx/cy low
            ctypes.c_double, ctypes.c_int64,             # radius
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int,
            ctypes.c_int64,                              # low_bound
            ctypes.c_int,                                # sub_is_f32
            ctypes.c_int64,                              # cap
            _D, _I, _D, _I, _D, _I, _D, _I, _D, _I,
            _I, _I,
            _I, _I,
            _D, _I, _I,
        ]
        lib.fs_la_begin_rc.restype = ctypes.c_void_p
        lib.fs_la_begin_rc.argtypes = [
            _D, _D, _I, ctypes.c_int64, ctypes.c_int64,  # anchors, n_orbit
            ctypes.c_double, ctypes.c_double,            # cx/cy low
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int,
            ctypes.c_int64,                              # low_bound
        ]
        lib.fs_la_result_n.restype = ctypes.c_int64
        lib.fs_la_result_n.argtypes = [ctypes.c_void_p]
        lib.fs_la_result_stages.restype = ctypes.c_int64
        lib.fs_la_result_stages.argtypes = [ctypes.c_void_p]
        lib.fs_la_collect.restype = ctypes.c_int64
        lib.fs_la_collect.argtypes = [
            ctypes.c_void_p,
            ctypes.c_double, ctypes.c_int64,             # radius
            ctypes.c_int,                                # sub_is_f32
            _D, _I, _D, _I, _D, _I, _D, _I, _D, _I,
            _I, _I,
            _I, _I,
            _D, _I, _I,
        ]
        lib.fs_la_free.restype = None
        lib.fs_la_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class LAReferenceArrays(LAReferenceHost):
    """LA table built natively — array-backed; same consumer interface
    as the Python-built table (device_arrays / use_at / at / stages)."""

    def __init__(self, arrays: dict, stage_la_index, stage_macro,
                 stage_count: int, at: ATInfo | None,
                 params: LAParameters):
        super().__init__(params=params)
        self._arrays = arrays
        self.stage_la_index = list(stage_la_index)
        self.stage_macro_it_count = list(stage_macro)
        self.stage_count = stage_count
        self.at = at
        self.use_at = at is not None
        self.is_valid = True
        self.las = _NodeView(arrays)

    def device_arrays(self, dtype=np.float32) -> dict:
        a = self._arrays
        return {
            "ref_m": a["ref_m"].astype(dtype), "ref_e": a["ref_e"],
            "zc_m": a["zc_m"].astype(dtype), "zc_e": a["zc_e"],
            "cc_m": a["cc_m"].astype(dtype), "cc_e": a["cc_e"],
            "thr_m": a["thr_m"].astype(dtype), "thr_e": a["thr_e"],
            "thrc_m": a["thrc_m"].astype(dtype), "thrc_e": a["thrc_e"],
            "step_length": a["step_length"],
            # int64: stage-0 next indices are orbit positions (up to
            # the period — beyond int32 at View #27 class)
            "next_stage_la_index": a["next_stage_la_index"],
            "stage_la_index": np.asarray(self.stage_la_index, np.int32),
            "stage_macro_it_count": np.asarray(
                self.stage_macro_it_count, np.int32),
            "stage_count": self.stage_count,
        }


    # ------------------------------------------------------ persistence

    def save_npz(self, path: str) -> None:
        """Persist the full node table + stages + AT (the View #27
        class builds take ~20 min over 28e9 reconstructed orbit points
        — the render driver must not pay that twice)."""
        at = self.at
        at_m = np.zeros(10, np.float64)
        at_e = np.zeros(6, np.int64)
        at_step = 0
        if at is not None:
            at_step = int(at.step_length)
            at_m[:] = [at.threshold_c.m, at.sqr_escape_radius.m,
                       at.ref_c.m.real, at.ref_c.m.imag,
                       at.zcoeff.m.real, at.zcoeff.m.imag,
                       at.ccoeff.m.real, at.ccoeff.m.imag,
                       at.inv_zcoeff.m.real, at.inv_zcoeff.m.imag]
            at_e[:] = [at.threshold_c.e, at.sqr_escape_radius.e,
                       at.ref_c.e, at.zcoeff.e, at.ccoeff.e,
                       at.inv_zcoeff.e]
        np.savez(path, **self._arrays,
                 stage_la_index=np.asarray(self.stage_la_index, np.int64),
                 stage_macro=np.asarray(self.stage_macro_it_count,
                                        np.int64),
                 meta=np.asarray([self.stage_count,
                                  1 if at is not None else 0, at_step,
                                  self.params.period_divisor,
                                  self.params.low_bound], np.int64),
                 at_m=at_m, at_e=at_e)

    @staticmethod
    def load_npz(path: str) -> "LAReferenceArrays":
        z = np.load(path)
        meta = z["meta"]
        at = None
        if int(meta[1]):
            at_m, at_e = z["at_m"], z["at_e"]
            at = ATInfo(
                step_length=int(meta[2]),
                threshold_c=HD(float(at_m[0]), int(at_e[0])),
                sqr_escape_radius=HD(float(at_m[1]), int(at_e[1])),
                ref_c=HDC(complex(at_m[2], at_m[3]), int(at_e[2])),
                zcoeff=HDC(complex(at_m[4], at_m[5]), int(at_e[3])),
                ccoeff=HDC(complex(at_m[6], at_m[7]), int(at_e[4])),
                inv_zcoeff=HDC(complex(at_m[8], at_m[9]), int(at_e[5])))
        arrays = {k: z[k] for k in (
            "ref_m", "ref_e", "zc_m", "zc_e", "cc_m", "cc_e",
            "thr_m", "thr_e", "thrc_m", "thrc_e",
            "step_length", "next_stage_la_index")}
        p = LAParameters(period_divisor=int(meta[3]),
                         low_bound=int(meta[4]))
        return LAReferenceArrays(arrays, z["stage_la_index"],
                                 z["stage_macro"], int(meta[0]), at, p)


class _NodeView:
    """len()/indexing facade over the flattened node arrays (a few
    callers ask for len(la.las) or individual node fields)."""

    def __init__(self, a: dict):
        self._a = a

    def __len__(self):
        return len(self._a["thr_m"])

    def __getitem__(self, k):
        a = self._a
        from fractalshark_tpu.engine.la_reference import LANode
        return LANode(
            ref=HDC(complex(a["ref_m"][k, 0], a["ref_m"][k, 1]),
                    int(a["ref_e"][k])),
            zcoeff=HDC(complex(a["zc_m"][k, 0], a["zc_m"][k, 1]),
                       int(a["zc_e"][k])),
            ccoeff=HDC(complex(a["cc_m"][k, 0], a["cc_m"][k, 1]),
                       int(a["cc_e"][k])),
            la_threshold=HD(float(a["thr_m"][k]), int(a["thr_e"][k])),
            la_threshold_c=HD(float(a["thrc_m"][k]), int(a["thrc_e"][k])),
            min_mag=HD.zero(),
            step_length=int(a["step_length"][k]),
            next_stage_la_index=int(a["next_stage_la_index"][k]))


def _dp(a):
    return a.ctypes.data_as(_D)


def _ip(a):
    return a.ctypes.data_as(_I)


def _out_bufs(cap: int) -> dict:
    return dict(
        ref_m=np.empty((cap, 2), np.float64), ref_e=np.empty(cap, np.int64),
        zc_m=np.empty((cap, 2), np.float64), zc_e=np.empty(cap, np.int64),
        cc_m=np.empty((cap, 2), np.float64), cc_e=np.empty(cap, np.int64),
        thr_m=np.empty(cap, np.float64), thr_e=np.empty(cap, np.int64),
        thrc_m=np.empty(cap, np.float64), thrc_e=np.empty(cap, np.int64),
        step_length=np.empty(cap, np.int64),
        next_idx=np.empty(cap, np.int64),
        stage_idx=np.zeros(1025, np.int64),
        stage_macro=np.zeros(1025, np.int64),
        at_m=np.zeros(10, np.float64), at_e=np.zeros(6, np.int64),
        flags=np.zeros(4, np.int64))


def _out_ptrs(b: dict) -> tuple:
    return (_dp(b["ref_m"]), _ip(b["ref_e"]), _dp(b["zc_m"]),
            _ip(b["zc_e"]), _dp(b["cc_m"]), _ip(b["cc_e"]),
            _dp(b["thr_m"]), _ip(b["thr_e"]), _dp(b["thrc_m"]),
            _ip(b["thrc_e"]), _ip(b["step_length"]), _ip(b["next_idx"]),
            _ip(b["stage_idx"]), _ip(b["stage_macro"]),
            _dp(b["at_m"]), _ip(b["at_e"]), _ip(b["flags"]))


def _collect(cnt: int, b: dict, p: LAParameters):
    flags = b["flags"]
    if cnt <= 0 or flags[0] == 0:
        return None
    at_m, at_e = b["at_m"], b["at_e"]
    stage_count = int(flags[3])
    at = None
    if flags[1]:
        at = ATInfo(
            step_length=int(flags[2]),
            threshold_c=HD(float(at_m[0]), int(at_e[0])),
            sqr_escape_radius=HD(float(at_m[1]), int(at_e[1])),
            ref_c=HDC(complex(at_m[2], at_m[3]), int(at_e[2])),
            zcoeff=HDC(complex(at_m[4], at_m[5]), int(at_e[3])),
            ccoeff=HDC(complex(at_m[6], at_m[7]), int(at_e[4])),
            inv_zcoeff=HDC(complex(at_m[8], at_m[9]), int(at_e[5])))
    arrays = {
        "ref_m": b["ref_m"][:cnt].copy(),
        "ref_e": b["ref_e"][:cnt].astype(np.int32),
        "zc_m": b["zc_m"][:cnt].copy(),
        "zc_e": b["zc_e"][:cnt].astype(np.int32),
        "cc_m": b["cc_m"][:cnt].copy(),
        "cc_e": b["cc_e"][:cnt].astype(np.int32),
        "thr_m": b["thr_m"][:cnt].copy(),
        "thr_e": b["thr_e"][:cnt].astype(np.int32),
        "thrc_m": b["thrc_m"][:cnt].copy(),
        "thrc_e": b["thrc_e"][:cnt].astype(np.int32),
        "step_length": b["step_length"][:cnt].copy(),
        "next_stage_la_index": b["next_idx"][:cnt].copy(),
    }
    return LAReferenceArrays(arrays, b["stage_idx"][:stage_count],
                             b["stage_macro"][:stage_count], stage_count,
                             at, p)


def generate_native(orbit_x: np.ndarray, orbit_y: np.ndarray,
                    radius_hd: HD, params: LAParameters | None = None,
                    sub_is_f32: bool = True,
                    orbit_e: np.ndarray | None = None):
    """Native LAReferenceHost.generate. Returns None when the library
    is unavailable or the orbit yields no valid table (callers fall
    back to the Python builder / direct render)."""
    lib = _load()
    if lib is None:
        return None
    p = params or LAParameters()
    ox = np.ascontiguousarray(orbit_x, np.float64)
    oy = np.ascontiguousarray(orbit_y, np.float64)
    n = len(ox)
    cap = 2 * n + 64
    b = _out_bufs(cap)
    rad = radius_hd.reduce()
    if orbit_e is not None:
        oe = np.ascontiguousarray(orbit_e, np.int32)
        oe_ptr = oe.ctypes.data_as(ctypes.c_void_p)
    else:
        oe_ptr = None
    cnt = lib.fs_la_generate(
        _dp(ox), _dp(oy), n, oe_ptr, float(rad.m), int(rad.e),
        p.detection_method, p.la_threshold_scale, p.la_threshold_c_scale,
        p.stage0_period_detection_threshold2,
        p.period_detection_threshold2,
        p.stage0_period_detection_threshold, p.period_detection_threshold,
        p.period_divisor, p.low_bound, 1 if sub_is_f32 else 0,
        cap, *_out_ptrs(b))
    return _collect(cnt, b, p)


def generate_native_rc(compressed, radius_hd: HD,
                       params: LAParameters | None = None,
                       sub_is_f32: bool = True,
                       cap: int | None = None):
    """LA table straight from a ``CompressedOrbit``: the native builder
    reads the orbit through a streaming reconstructing accessor
    (anchors + the f64 recurrence, resetting at every anchor), so the
    uncompressed orbit never materializes anywhere — the LA-build path
    for orbits that only exist compressed (period-billions View #27
    class, ``Notes/FractalShark-06-RefOrbit.tex:740-747``).  Values
    reconstruct exactly as ``CompressedOrbit.decompress``; reference
    analogue: LA building through the decompressing orbit helpers
    (``PerturbationResultsHelpers.h:51-161``).

    ``cap`` bounds the node-table allocation (default: orbit length
    + 64, the empirical ceiling for period-driven stage-0 tables);
    returns None when the library is unavailable, the orbit yields no
    valid table, or the cap is exceeded.

    Default params use period_divisor=8: the reference widens stage-0
    node spacing for compressed orbits to bound table memory
    (LAReference.cpp:12-19, periodDivisor = SimpleCompression ? 8 : 2)
    — at View #27 scale the divisor-2 table would be ~9e9 nodes."""
    lib = _load()
    if lib is None:
        return None
    p = params or LAParameters(period_divisor=8)
    ax = np.ascontiguousarray(compressed.anchors_x, np.float64)
    ay = np.ascontiguousarray(compressed.anchors_y, np.float64)
    ai = np.ascontiguousarray(compressed.anchor_index, np.int64)
    n = int(compressed.total_count)
    if cap is None:
        cap = n + 64
    b = _out_bufs(cap)
    rad = radius_hd.reduce()
    cnt = lib.fs_la_generate_rc(
        _dp(ax), _dp(ay), _ip(ai), len(ax), n,
        float(compressed.cx_low), float(compressed.cy_low),
        float(rad.m), int(rad.e),
        p.detection_method, p.la_threshold_scale, p.la_threshold_c_scale,
        p.stage0_period_detection_threshold2,
        p.period_detection_threshold2,
        p.stage0_period_detection_threshold, p.period_detection_threshold,
        p.period_divisor, p.low_bound, 1 if sub_is_f32 else 0,
        cap, *_out_ptrs(b))
    return _collect(cnt, b, p)


def generate_native_rc_streamed(compressed, radius_hd: HD,
                                params: LAParameters | None = None,
                                sub_is_f32: bool = True):
    """Two-call-protocol variant of :func:`generate_native_rc`: the
    native builder runs to completion first, reports the EXACT node
    count, and only then are output buffers allocated (sized to fit by
    construction) and marshalled into.  This removes the cap-guessing
    failure mode of the one-call API, which cost two wasted hour-long
    full-orbit passes at View #27 scale (period 28.3e9) when the real
    table outgrew the guessed preallocation.

    Set ``FS_LA_PROGRESS=<path>`` to stream one JSON line per ~2^28
    consumed orbit entries (live node-density monitoring for
    hour-scale builds).

    Returns ``(la, info)``: ``la`` is the :class:`LAReferenceArrays`
    (or None on failure) and ``info`` always carries the diagnostic
    facts (``n_nodes`` is -2 when stage-0 detection found no valid
    table — growing memory cannot help; ``error`` names the failure).
    """
    lib = _load()
    if lib is None:
        return None, {"error": "native library unavailable"}
    p = params or LAParameters(period_divisor=8)
    ax = np.ascontiguousarray(compressed.anchors_x, np.float64)
    ay = np.ascontiguousarray(compressed.anchors_y, np.float64)
    ai = np.ascontiguousarray(compressed.anchor_index, np.int64)
    n_orbit = int(compressed.total_count)
    h = lib.fs_la_begin_rc(
        _dp(ax), _dp(ay), _ip(ai), len(ax), n_orbit,
        float(compressed.cx_low), float(compressed.cy_low),
        p.detection_method, p.la_threshold_scale, p.la_threshold_c_scale,
        p.stage0_period_detection_threshold2,
        p.period_detection_threshold2,
        p.stage0_period_detection_threshold, p.period_detection_threshold,
        p.period_divisor, p.low_bound)
    try:
        n = int(lib.fs_la_result_n(h))
        stages = int(lib.fs_la_result_stages(h))
        info = {"n_nodes": n, "n_stage_entries": stages}
        if n < 0:
            info["error"] = "no valid LA table (stage-0 detection failed)"
            return None, info
        if stages > 1025:
            info["error"] = "stage table overflow (>1025 entries)"
            return None, info
        b = _out_bufs(max(n, 1))
        rad = radius_hd.reduce()
        cnt = lib.fs_la_collect(h, float(rad.m), int(rad.e),
                                1 if sub_is_f32 else 0, *_out_ptrs(b))
        info["cnt"] = int(cnt)
        return _collect(cnt, b, p), info
    finally:
        lib.fs_la_free(h)
