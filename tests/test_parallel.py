"""Sharded MSM/NTT vs single-chip kernels on the 8-device virtual CPU mesh.

The multi-chip analog of the reference's thread-count invariance (rayon results
are independent of RAYON_NUM_THREADS): sharded results must equal single-chip
results exactly (SURVEY.md §4 implication (d)).
"""

import jax
import jax.numpy as jnp
import pytest

from halo2_tpu.curves.point import Point, batch_normalize, generator, to_affine_ints
from halo2_tpu.curves.spec import BN254_G1
from halo2_tpu.fields import limb
from halo2_tpu.fields.spec import NLIMBS
from halo2_tpu.ops import ntt as ntt_ops
from halo2_tpu.ops.msm import msm
from halo2_tpu.ops.scalar_mul import batch_scalar_mul
from halo2_tpu.parallel import default_mesh, sharded_intt, sharded_msm, sharded_ntt

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return default_mesh(8)


def _points(curve, n):
    fr = curve.scalar
    s_pows = ntt_ops.power_table(fr, 12345, n)
    gpt = generator(curve)
    g = Point(
        jnp.broadcast_to(gpt.x.reshape(NLIMBS, 1), (NLIMBS, n)),
        jnp.broadcast_to(gpt.y.reshape(NLIMBS, 1), (NLIMBS, n)),
        jnp.broadcast_to(gpt.z.reshape(NLIMBS, 1), (NLIMBS, n)),
    )
    return batch_normalize(curve, batch_scalar_mul(curve, s_pows, g))


def test_sharded_msm_matches_single_chip(mesh):
    curve = BN254_G1
    n = 128
    points = _points(curve, n)
    scalars = ntt_ops.power_table(curve.scalar, 777, n)
    single = to_affine_ints(curve, msm(curve, scalars, points))[0]
    shard = to_affine_ints(curve, sharded_msm(curve, scalars, points, mesh))[0]
    assert single == shard


def test_sharded_ntt_matches_single_chip(mesh):
    spec = BN254_G1.scalar
    k = 7
    n = 1 << k
    omega = pow(spec.root_of_unity, 1 << (spec.s - k), spec.p)
    a = limb.from_ints(spec, [(3 * i + 1) % spec.p for i in range(n)])
    tw = ntt_ops.power_table(spec, omega, n // 2)
    single = limb.to_ints(spec, ntt_ops.ntt(spec, a, tw, k))
    shard = limb.to_ints(spec, sharded_ntt(spec, a, k, omega, mesh))
    assert single == shard


def test_sharded_intt_roundtrip(mesh):
    spec = BN254_G1.scalar
    k = 6
    n = 1 << k
    omega = pow(spec.root_of_unity, 1 << (spec.s - k), spec.p)
    vals = [(7 * i + 5) % spec.p for i in range(n)]
    a = limb.from_ints(spec, vals)
    fwd = sharded_ntt(spec, a, k, omega, mesh)
    back = sharded_intt(spec, fwd, k, omega, mesh)
    assert limb.to_ints(spec, back) == vals
