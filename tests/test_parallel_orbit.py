"""Mesh-wired orbit iteration (parallel/orbit_sharded.py): the full
z ← z² + c update — limb-sharded four-step transforms, frequency
combines, AND the sharded CRT/carry tail — bit-identical to the
single-chip fixedpoint.iterate_z on the 8-virtual-device CPU mesh.
This is the VERDICT r2 #1 done-criterion (reference analogue: whole
device = one bignum, KernelHpSharkReferenceOrbit_cu.h:255)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fractalshark_tpu.core.highprecision import HighPrecision
from fractalshark_tpu.ops.bignum import fixedpoint as FP
from fractalshark_tpu.parallel import orbit_sharded as OS


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return OS.make_limb_mesh(jax.devices()[:8])


def _digits(hpstr, spec, prec):
    v = HighPrecision(hpstr, prec=prec)
    return FP.hp_to_digits(v, spec)


def _run_both(spec, cx_s, cy_s, steps, mesh):
    prec = spec.frac_bits - 20
    scx, cxd = _digits(cx_s, spec, prec)
    scy, cyd = _digits(cy_s, spec, prec)
    cxj = jnp.asarray(cxd)
    cyj = jnp.asarray(cyd)
    s1 = (jnp.int32(scx), cxj, jnp.int32(scy), cyj)
    s2 = s1
    for _ in range(steps):
        s1 = FP.iterate_z(*s1, jnp.int32(scx), cxj, jnp.int32(scy),
                          cyj, spec)
        s2 = OS.iterate_z_sharded(*s2, jnp.int32(scx), cxj,
                                  jnp.int32(scy), cyj, spec=spec,
                                  mesh=mesh)
    return s1, s2


@pytest.mark.parametrize("cx,cy", [
    ("-0.743643887037158704752191506114774",
     "0.131825904205311970493132056385139"),
    ("-1.999999999999", "0.0000000000001"),   # View-#30-like 0xFFFF run
])
def test_iterate_z_sharded_bit_identical(mesh, cx, cy):
    spec = FP.FixedSpec.for_limbs(512)        # nfft 2048
    s1, s2 = _run_both(spec, cx, cy, 4, mesh)
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_iterate_z_sharded_view30_operand_size(mesh):
    """One update at the 16384-limb View #30 operand size (nfft 65536)
    — the scale the mesh equalizer exists for."""
    from fractalshark_tpu.core.views import get_view_preset
    spec = FP.FixedSpec.for_limbs(16384)
    prec = spec.frac_bits - 20
    v30 = get_view_preset(30).ptz
    scx, cxd = FP.hp_to_digits(v30.pt_x.with_precision(prec), spec)
    scy, cyd = FP.hp_to_digits(v30.pt_y.with_precision(prec), spec)
    cxj = jnp.asarray(cxd)
    cyj = jnp.asarray(cyd)
    args = (jnp.int32(scx), cxj, jnp.int32(scy), cyj)
    want = FP.iterate_z(*args, jnp.int32(scx), cxj, jnp.int32(scy),
                        cyj, spec)
    got = OS.iterate_z_sharded(*args, jnp.int32(scx), cxj,
                               jnp.int32(scy), cyj, spec=spec,
                               mesh=mesh)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbit_chunk_sharded_matches_single(mesh):
    """orbit_chunk with a mesh: the session-level scan (shadow emission,
    periodicity flags, dzdc carry) over the sharded update equals the
    single-chip chunk exactly."""
    from fractalshark_tpu.ops.bignum.orbit import orbit_chunk
    spec = FP.FixedSpec.for_limbs(256)        # nfft 1024
    prec = spec.frac_bits - 20
    cx = HighPrecision("-0.7436438870371587", prec=prec)
    cy = HighPrecision("0.1318259042053119", prec=prec)
    scx, cxd = FP.hp_to_digits(cx, spec)
    scy, cyd = FP.hp_to_digits(cy, spec)
    args = (jnp.int32(scx), jnp.asarray(cxd), jnp.int32(scy),
            jnp.asarray(cyd))
    dzdc0 = (jnp.float64(1.0), jnp.float64(0.0), jnp.int32(0))
    consts = (jnp.float64(1.0), jnp.int32(-40),
              jnp.float64(float(cx)), jnp.float64(float(cy)))
    st1, out1 = orbit_chunk(*args, *dzdc0, args[0], args[1], args[2],
                            args[3], *consts, spec=spec, steps=6)
    st2, out2 = orbit_chunk(*args, *dzdc0, args[0], args[1], args[2],
                            args[3], *consts, spec=spec, steps=6,
                            mesh=mesh)
    for a, b in zip(st1[:4], st2[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
