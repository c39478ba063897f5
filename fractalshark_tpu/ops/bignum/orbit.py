"""High-precision reference orbit computed ON DEVICE.

TPU counterpart of the reference's grid-wide cooperative GPU orbit
kernel (``HpSharkFloatLib/KernelHpSharkReferenceOrbit_cu.h:14-141``,
session wrapper ``KernelInvoke.h:63-116``): the entire chip iterates one
big number.  Structure:

* device: chunks of K iterations under ``lax.scan`` — per iteration one
  3-way NTT multiply (x², y², x·y share two forward transforms) + signed
  fixed-point adds; per iteration a *normalized* low-precision shadow
  (top-digit window + exponent) is emitted into the scan output
  (the reference emits HDRFloat pairs into ``OutputIters``);
* host: drives chunked launches (``RefOrbitCalc.cpp:2205-2233``),
  converts the shadow to f64, runs the cheap periodicity (dzdc) and
  escape bookkeeping (``PeriodicityChecker.h:46-95``), and stops the
  session at period/escape/budget.

Device↔host crossing happens once per chunk, not per iteration.
"""

from __future__ import annotations

import functools
import threading
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from fractalshark_tpu.core.hdr_host import HD
from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.engine.perturbation_results import PerturbationResults
from fractalshark_tpu.ops.bignum import fixedpoint as FP

WINDOW = 4  # top digits emitted per value (64 bits ≥ f64 precision)


def _emit_shadow(digits):
    """Normalize: (window of WINDOW digits ending at the top nonzero
    digit, window base index). Zero value → idx 0, zero window."""
    D = digits.shape[0]
    nz = digits != 0
    idx = jnp.where(nz, jnp.arange(D, dtype=jnp.int32), -1).max()
    base = jnp.clip(idx - (WINDOW - 1), 0, D - WINDOW)
    win = jax.lax.dynamic_slice(digits, (base,), (WINDOW,))
    return win, base


@functools.partial(jax.jit, static_argnames=("spec", "steps"))
def orbit_chunk(sx, x, sy, y, scx, cx, scy, cy, *, spec: FP.FixedSpec,
                steps: int):
    """Run `steps` iterations of z ← z² + c; returns final state and the
    per-iteration shadows of the PRE-update z (like the reference, which
    stores z before updating, RefOrbitCalc.cpp:533)."""

    def body(state, _):
        sx, x, sy, y = state
        winx, basex = _emit_shadow(x)
        winy, basey = _emit_shadow(y)
        # whole update fused: x²−y² combined in the frequency domain,
        # +c and the ×2 folded into the CRT accumulation
        # (fixedpoint.iterate_z) — one carry ripple per component
        nsx, nx, nsy, ny = FP.iterate_z(sx, x, sy, y,
                                        scx, cx, scy, cy, spec)
        return (nsx, nx, nsy, ny), (sx, winx, basex, sy, winy, basey)

    state, shadows = jax.lax.scan(body, (sx, x, sy, y), None, length=steps)
    return state, shadows


def _shadow_to_f64(sign, win, base, spec: FP.FixedSpec) -> np.ndarray:
    """Exact f64 of sign·(Σ win_i 2^(16(base+i)))·2^-frac_bits."""
    sign = np.asarray(sign, np.float64)
    win = np.asarray(win, np.float64)     # [K, WINDOW]
    base = np.asarray(base, np.int64)     # [K]
    weights = win[:, 0] + win[:, 1] * 65536.0 + \
        win[:, 2] * 65536.0 ** 2 + win[:, 3] * 65536.0 ** 3
    exp = 16 * base - spec.frac_bits
    return sign * weights * np.exp2(exp.astype(np.float64))


@functools.partial(jax.jit, static_argnames=("spec", "steps"))
def orbit_nr_chunk(sx, x, sy, y, sdx, dx, sdy, dy,
                   scx, cx, scy, cy, *, spec: FP.FixedSpec, steps: int):
    """NR-mode orbit chunk: z ← z² + c AND dzdc ← 2·z·dzdc + 1, both at
    full precision on device (the reference's NR kernel variant with
    W0..W3 products, KernelHpSharkReferenceOrbit_cu.h:59-92). Returns
    the final (z, dzdc) state — the host runs the cheap Newton step."""

    def body(state, _):
        sx, x, sy, y, sdx, dx, sdy, dy = state
        # whole z/dzdc update fused (fixedpoint.iterate_z_nr):
        # frequency-domain combines, +c/+1 and doublings folded into
        # the CRT accumulations
        return FP.iterate_z_nr(sx, x, sy, y, sdx, dx, sdy, dy,
                               scx, cx, scy, cy, spec), None

    state, _ = jax.lax.scan(body, (sx, x, sy, y, sdx, dx, sdy, dy),
                            None, length=steps)
    return state


def evaluate_critical_orbit_and_derivs_device(cx: HighPrecision,
                                              cy: HighPrecision,
                                              period: int,
                                              precision_bits: int,
                                              chunk_steps: int = 256):
    """Device counterpart of feature_finder's host evaluator: returns
    (z_x, z_y, dzdc_x, dzdc_y) as HighPrecision after period−1 updates
    from z = c, dzdc = 1 (EvaluateCriticalOrbitAndDerivs_GPU analogue,
    KernelInvoke.h:148-169)."""
    limbs = 1 << max(3, (-(-(precision_bits + 80) // 32)
                         - 1).bit_length())
    spec = FP.FixedSpec.for_limbs(limbs)
    scx_i, cxd = FP.hp_to_digits(cx, spec)
    scy_i, cyd = FP.hp_to_digits(cy, spec)
    one_s, one_d = FP.hp_to_digits(HighPrecision(1, prec=64), spec)
    state = (jnp.int32(scx_i), jnp.asarray(cxd),
             jnp.int32(scy_i), jnp.asarray(cyd),
             jnp.int32(one_s), jnp.asarray(one_d),
             jnp.int32(1), jnp.asarray(np.zeros(spec.digits, np.uint32)))
    remaining = period - 1
    while remaining > 0:
        steps = min(chunk_steps, remaining)
        state = orbit_nr_chunk(*state,
                               jnp.int32(scx_i), jnp.asarray(cxd),
                               jnp.int32(scy_i), jnp.asarray(cyd),
                               spec=spec, steps=steps)
        remaining -= steps

    def to_hp(sign, digits):
        v = FP.digits_to_int(np.asarray(digits))
        return HighPrecision.from_mant_exp(
            int(sign) * v, -spec.frac_bits, prec=precision_bits)

    sx, x, sy, y, sdx, dxd, sdy, dyd = state
    return (to_hp(sx, x), to_hp(sy, y), to_hp(sdx, dxd), to_hp(sdy, dyd))


@dataclass
class TpuOrbitSession:
    """RAII-style session mirroring GpuOrbitSession (KernelInvoke.h:63)."""
    spec: FP.FixedSpec
    center_x: HighPrecision
    center_y: HighPrecision
    max_radius: HighPrecision
    chunk_steps: int = 256

    def run(self, max_iterations: int, periodicity: bool = True,
            abort_flag: threading.Event | None = None,
            progress_cb=None) -> PerturbationResults:
        spec = self.spec
        scx_i, cx_d = FP.hp_to_digits(self.center_x, spec)
        scy_i, cy_d = FP.hp_to_digits(self.center_y, spec)
        scx = jnp.int32(scx_i)
        scy = jnp.int32(scy_i)
        cxj = jnp.asarray(cx_d)
        cyj = jnp.asarray(cy_d)
        # z starts at c (RefOrbitCalc.cpp:509-511)
        state = (scx, cxj, scy, cyj)

        radius = HD.from_hp(self.max_radius)
        dzdc_x = HD.from_float(1.0)
        dzdc_y = HD.zero()
        cxf = float(self.center_x)
        cyf = float(self.center_y)

        xs = [0.0]  # zero seed entry (PerturbationResults.cpp:866)
        ys = [0.0]
        period = 0
        escaped_at = 0
        t0 = time.perf_counter()
        done = False

        it = 0
        while it < max_iterations and not done:
            if abort_flag is not None and abort_flag.is_set():
                break
            steps = min(self.chunk_steps, max_iterations - it)
            state, shadows = orbit_chunk(*state, scx, cxj, scy, cyj,
                                         spec=spec, steps=steps)
            sxs, winx, basex, sys_, winy, basey = shadows
            zxs = _shadow_to_f64(sxs, winx, basex, spec)
            zys = _shadow_to_f64(sys_, winy, basey, spec)
            # host bookkeeping per emitted value
            for k in range(steps):
                lzx = float(zxs[k])
                lzy = float(zys[k])
                xs.append(lzx)
                ys.append(lzy)
                if periodicity:
                    azx = HD.from_float(abs(lzx))
                    azy = HD.from_float(abs(lzy))
                    n2 = azy if azx.lt(azy) else azx
                    r0 = (dzdc_y.abs()
                          if dzdc_x.abs().lt(dzdc_y.abs())
                          else dzdc_x.abs())
                    n3 = (radius * r0).mul_pow2(1)
                    if n2.lt(n3):
                        period = len(xs)
                        done = True
                        break
                    ndx = (dzdc_x.mul_float(lzx) -
                           dzdc_y.mul_float(lzy)).mul_pow2(1) + \
                        HD.from_float(1.0)
                    ndy = (dzdc_y.mul_float(lzx) +
                           dzdc_x.mul_float(lzy)).mul_pow2(1)
                    dzdc_x, dzdc_y = ndx, ndy
                tx = lzx + cxf
                ty = lzy + cyf
                if tx * tx + ty * ty > 256.0:
                    escaped_at = len(xs)
                    done = True
                    break
            it += steps
            if progress_cb is not None:
                progress_cb(it, max_iterations, time.perf_counter() - t0)

        return PerturbationResults(
            center_x=self.center_x, center_y=self.center_y,
            orbit_x=np.asarray(xs, np.float64),
            orbit_y=np.asarray(ys, np.float64),
            max_radius=self.max_radius,
            period=period, escaped_at=escaped_at,
            max_iterations=max_iterations,
            precision_bits=spec.frac_bits)


def compute_reference_orbit_device(center_x: HighPrecision,
                                   center_y: HighPrecision,
                                   max_iterations: int,
                                   max_radius: HighPrecision,
                                   limbs32: int | None = None,
                                   periodicity: bool = True,
                                   chunk_steps: int = 256,
                                   abort_flag=None) -> PerturbationResults:
    """Device-orbit entry point (the analogue of
    RefOrbitCalc::AddPerturbationReferencePointGPU,
    RefOrbitCalc.cpp:2167-2260)."""
    if limbs32 is None:
        prec = max(center_x.prec, center_y.prec)
        limbs32 = max(8, -(-(prec + 64) // 32))
        limbs32 = 1 << (limbs32 - 1).bit_length()  # round up to pow2
    spec = FP.FixedSpec.for_limbs(limbs32)
    session = TpuOrbitSession(spec=spec, center_x=center_x,
                              center_y=center_y, max_radius=max_radius,
                              chunk_steps=chunk_steps)
    return session.run(max_iterations, periodicity=periodicity,
                       abort_flag=abort_flag)
