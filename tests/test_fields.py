"""Field kernel unit tests vs the Python-int golden reference.

Mirrors the reference test strategy (SURVEY.md §4.1): kernel unit tests against
host-side scalar arithmetic.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.fields import ALL_FIELDS, BN254_FR, PASTA_FP, FieldSpec, limb
from halo2_tpu.fields.spec import NLIMBS

random.seed(1234)


def rand_elems(spec: FieldSpec, n: int):
    vals = [random.randrange(spec.p) for _ in range(n)]
    # sprinkle in edge cases
    if n >= 4:
        vals[0], vals[1], vals[2], vals[3] = 0, 1, spec.p - 1, spec.p - 2
    return vals


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_roundtrip(spec):
    vals = rand_elems(spec, 8)
    a = limb.from_ints(spec, vals)
    assert limb.to_ints(spec, a) == vals


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_add_sub_neg(spec):
    n = 16
    av, bv = rand_elems(spec, n), rand_elems(spec, n)
    a, b = limb.from_ints(spec, av), limb.from_ints(spec, bv)
    assert limb.to_ints(spec, limb.fadd(spec, a, b)) == [
        (x + y) % spec.p for x, y in zip(av, bv)
    ]
    assert limb.to_ints(spec, limb.fsub(spec, a, b)) == [
        (x - y) % spec.p for x, y in zip(av, bv)
    ]
    assert limb.to_ints(spec, limb.fneg(spec, a)) == [(-x) % spec.p for x in av]


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_mul_square(spec):
    n = 16
    av, bv = rand_elems(spec, n), rand_elems(spec, n)
    a, b = limb.from_ints(spec, av), limb.from_ints(spec, bv)
    assert limb.to_ints(spec, limb.fmul(spec, a, b)) == [
        (x * y) % spec.p for x, y in zip(av, bv)
    ]
    assert limb.to_ints(spec, limb.fsquare(spec, a)) == [
        (x * x) % spec.p for x in av
    ]


@pytest.mark.parametrize("spec", [BN254_FR, PASTA_FP], ids=lambda s: s.name)
def test_pow_inv(spec):
    n = 8
    av = rand_elems(spec, n)
    a = limb.from_ints(spec, av)
    e = 0xDEADBEEF12345
    assert limb.to_ints(spec, limb.fpow_const(spec, a, e)) == [
        pow(x, e, spec.p) for x in av
    ]
    got = limb.to_ints(spec, limb.finv(spec, a))
    want = [pow(x, -1, spec.p) if x else 0 for x in av]
    assert got == want


@pytest.mark.parametrize("spec", [BN254_FR], ids=lambda s: s.name)
def test_batch_inv(spec):
    n = 10
    av = [random.randrange(1, spec.p) for _ in range(n)]
    a = limb.from_ints(spec, av)
    got = limb.to_ints(spec, limb.batch_inv(spec, a))
    assert got == [pow(x, -1, spec.p) for x in av]


@pytest.mark.parametrize("spec", [BN254_FR], ids=lambda s: s.name)
def test_mont_conversions(spec):
    av = rand_elems(spec, 6)
    canon = np.stack(
        [np.asarray([(v >> (16 * i)) & 0xFFFF for i in range(NLIMBS)], np.uint32) for v in av],
        axis=1,
    )
    mont = limb.to_mont(spec, jnp.asarray(canon))
    assert limb.to_ints(spec, mont) == av
    back = limb.from_mont(spec, mont)
    assert [
        int(sum(int(back[i, j]) << (16 * i) for i in range(NLIMBS)))
        for j in range(len(av))
    ] == av


def test_field_constants():
    # root_of_unity has exact order 2^s; zeta is a primitive cube root.
    for spec in [BN254_FR, PASTA_FP]:
        w = spec.root_of_unity
        assert pow(w, 1 << spec.s, spec.p) == 1
        assert pow(w, 1 << (spec.s - 1), spec.p) == spec.p - 1
        assert (spec.root_of_unity * spec.root_of_unity_inv) % spec.p == 1
        z = spec.zeta
        assert z != 1 and pow(z, 3, spec.p) == 1
        assert (2 * spec.two_inv) % spec.p == 1


def test_jit_and_vmap_compatibility():
    spec = BN254_FR
    av, bv = rand_elems(spec, 8), rand_elems(spec, 8)
    a, b = limb.from_ints(spec, av), limb.from_ints(spec, bv)
    f = jax.jit(lambda x, y: limb.fmul(spec, x, y))
    assert limb.to_ints(spec, f(a, b)) == [(x * y) % spec.p for x, y in zip(av, bv)]


def test_sqrt():
    for spec in ALL_FIELDS:
        for v in [4, 9, 2, 5, random.randrange(spec.p)]:
            sq = v * v % spec.p
            r = spec.sqrt(sq)
            assert r is not None and r * r % spec.p == sq
