"""Curve kernel tests vs host int arithmetic (SURVEY.md §4 pattern (a))."""

import random

import jax
import pytest

from halo2_tpu.curves import (
    ALL_CURVES,
    BN254_G1,
    PALLAS,
    Point,
    ec_add,
    ec_double,
    ec_neg,
    from_affine_ints,
    host,
    identity,
    to_affine_ints,
)

random.seed(99)


def rand_points(spec, n):
    g = host.generator(spec)
    return [host.mul(spec, g, random.randrange(1, spec.scalar.p)) for _ in range(n)]


@pytest.mark.parametrize("spec", ALL_CURVES, ids=lambda s: s.name)
def test_host_curve_sanity(spec):
    g = host.generator(spec)
    assert host.on_curve(spec, g)
    g2 = host.double(spec, g)
    assert host.on_curve(spec, g2)
    assert host.add(spec, g, host.neg(spec, g)) is None
    # group order annihilates
    assert host.mul(spec, g, spec.scalar.p) is None


@pytest.mark.parametrize("spec", ALL_CURVES, ids=lambda s: s.name)
def test_complete_add(spec):
    n = 6
    pa = rand_points(spec, n)
    pb = rand_points(spec, n)
    # exercise complete-formula special cases
    pb[0] = pa[0]                       # P + P
    pb[1] = host.neg(spec, pa[1])       # P + (-P)
    pa[2] = None                        # 0 + Q
    pb[3] = None                        # P + 0
    a, b = from_affine_ints(spec, pa), from_affine_ints(spec, pb)
    got = to_affine_ints(spec, ec_add(spec, a, b))
    want = [host.add(spec, x, y) for x, y in zip(pa, pb)]
    assert got == want


@pytest.mark.parametrize("spec", [BN254_G1, PALLAS], ids=lambda s: s.name)
def test_double_and_neg(spec):
    n = 4
    pa = rand_points(spec, n)
    pa[0] = None
    a = from_affine_ints(spec, pa)
    assert to_affine_ints(spec, ec_double(spec, a)) == [
        host.double(spec, x) for x in pa
    ]
    assert to_affine_ints(spec, ec_neg(spec, a)) == [host.neg(spec, x) for x in pa]


def test_add_chain_matches_scalar_mul():
    spec = BN254_G1
    g = from_affine_ints(spec, [host.generator(spec)])
    acc = identity(spec, (1,))
    step = jax.jit(lambda p, q: ec_add(spec, p, q))
    for i in range(1, 8):
        acc = step(acc, g)
        assert to_affine_ints(spec, acc) == [host.mul(spec, host.generator(spec), i)]
