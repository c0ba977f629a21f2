"""Pallas Montgomery-multiply kernel vs the pure-jnp path (interpret mode)."""

import pytest

from halo2_tpu.fields import limb
from halo2_tpu.fields.pallas_kernels import TILE, mont_mul_pallas
from halo2_tpu.fields.spec import BN254_FR, PASTA_FP

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)


def _check(spec, n):
    p = spec.p
    avals = [(7 * i * i + 3 * i + 5) % p for i in range(1, n + 1)]
    bvals = [(11 * i * i + 13) % p for i in range(1, n + 1)]
    a = limb.from_ints(spec, avals)
    b = limb.from_ints(spec, bvals)
    expect = limb.to_ints(spec, limb.fmul(spec, a, b))
    got = limb.to_ints(spec, mont_mul_pallas(spec, a, b, True))
    assert got == expect == [(x * y) % p for x, y in zip(avals, bvals)]


def test_mont_mul_pallas_matches_jnp_small():
    _check(BN254_FR, 8)  # exercises padding to TILE


def test_mont_mul_pallas_matches_jnp_multitile():
    _check(BN254_FR, TILE + 32)


def test_mont_mul_pallas_pasta():
    _check(PASTA_FP, 16)
