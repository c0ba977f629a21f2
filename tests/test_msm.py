"""MSM kernel vs host reference (SURVEY.md §7 item 3 test: random vectors)."""

import random

import pytest

from halo2_tpu.curves import BN254_G1, PALLAS, from_affine_ints, host, to_affine_ints
from halo2_tpu.fields import limb
from halo2_tpu.ops.msm import choose_window, msm

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)

random.seed(42)


@pytest.mark.parametrize(
    "spec, n",
    [(BN254_G1, 1), (BN254_G1, 33), (PALLAS, 5)],
    ids=["bn254-1", "bn254-33", "pallas-5"],
)
def test_msm_random(spec, n):
    g = host.generator(spec)
    pts = [host.mul(spec, g, random.randrange(1, spec.scalar.p)) for _ in range(n)]
    scalars = [random.randrange(spec.scalar.p) for _ in range(n)]
    if n >= 3:
        scalars[0] = 0
        pts[1] = None  # identity point in the input
    want = host.msm(spec, scalars, pts)
    got = msm(spec, limb.from_ints(spec.scalar, scalars), from_affine_ints(spec, pts), 4)
    assert to_affine_ints(spec, got)[0] == want


def test_msm_window_choices():
    spec = BN254_G1
    n = 17
    g = host.generator(spec)
    pts = [host.mul(spec, g, 3 + i) for i in range(n)]
    scalars = [random.randrange(spec.scalar.p) for _ in range(n)]
    want = host.msm(spec, scalars, pts)
    sc = limb.from_ints(spec.scalar, scalars)
    pd = from_affine_ints(spec, pts)
    for c in [1, 7]:
        got = msm(spec, sc, pd, c)
        assert to_affine_ints(spec, got)[0] == want
    assert 1 <= choose_window(1 << 16) <= 16


def test_msm_large_window():
    """c=12 at tiny n exercises the wide bucket-end gather and the telescoped
    fold over 2^c-1 ends (ADVICE.md round-2: keep one large-window case)."""
    spec = BN254_G1
    n = 5
    g = host.generator(spec)
    pts = [host.mul(spec, g, 11 + 3 * i) for i in range(n)]
    scalars = [random.randrange(spec.scalar.p) for _ in range(n)]
    want = host.msm(spec, scalars, pts)
    got = msm(spec, limb.from_ints(spec.scalar, scalars), from_affine_ints(spec, pts), 12)
    assert to_affine_ints(spec, got)[0] == want


def test_msm_sequential_windows():
    """window_batch=1 (the k=16 HBM-bounded path) must agree with the batched
    path — this is the configuration bench.py runs on the real chip."""
    spec = BN254_G1
    n = 9
    g = host.generator(spec)
    pts = [host.mul(spec, g, 5 + i) for i in range(n)]
    scalars = [random.randrange(spec.scalar.p) for _ in range(n)]
    want = host.msm(spec, scalars, pts)
    sc = limb.from_ints(spec.scalar, scalars)
    pd = from_affine_ints(spec, pts)
    got = msm(spec, sc, pd, 8, 1)
    assert to_affine_ints(spec, got)[0] == want
