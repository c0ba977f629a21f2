"""NTT/domain tests: FFT o iFFT = id, rotation identities, vanishing division
(mirrors reference poly/domain.rs:488-557 tests)."""

import random

import jax.numpy as jnp
import pytest

from halo2_tpu.fields import BN254_FR, PASTA_FP, limb
from halo2_tpu.ops import arith, ntt
from halo2_tpu.poly import EvaluationDomain, Poly, Rotation
from halo2_tpu.poly.polynomial import COEFF, LAGRANGE

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)

random.seed(7)


def naive_dft(spec, vals, omega):
    n = len(vals)
    return [
        sum(vals[j] * pow(omega, i * j, spec.p) for j in range(n)) % spec.p
        for i in range(n)
    ]


@pytest.mark.parametrize("spec", [BN254_FR, PASTA_FP], ids=lambda s: s.name)
def test_ntt_matches_naive(spec):
    k = 3
    n = 1 << k
    omega = pow(spec.root_of_unity, 1 << (spec.s - k), spec.p)
    vals = [random.randrange(spec.p) for _ in range(n)]
    a = limb.from_ints(spec, vals)
    tw = ntt.power_table(spec, omega, n // 2)
    got = limb.to_ints(spec, ntt.ntt(spec, a, tw, k))
    assert got == naive_dft(spec, vals, omega)


@pytest.mark.parametrize("k", [2, 5, 9, 10, 13])
def test_sixstep_matches_butterfly(k):
    """ntt_sixstep (the gather-free fast path) must be bit-identical to the
    butterfly network at even/odd k; k=13 exercises the >=128-lane batch
    shape whose fused slice-of-concat pattern miscompiled on the TPU backend
    before the per-stage optimization barrier (ops/ntt.py)."""
    spec = BN254_FR
    n = 1 << k
    omega = pow(spec.root_of_unity, 1 << (spec.s - k), spec.p)
    vals = [random.randrange(spec.p) for _ in range(n)]
    a = limb.from_ints(spec, vals)
    tw = ntt.power_table(spec, omega, n // 2)
    wc = ntt.cross_twiddles(spec, omega, k)
    ref = limb.to_ints(spec, ntt.ntt(spec, a, tw, k))
    got = limb.to_ints(spec, ntt.ntt_sixstep(spec, a, tw, wc, k))
    assert got == ref


def test_power_table():
    spec = BN254_FR
    t = ntt.power_table(spec, 7, 11)
    assert limb.to_ints(spec, t) == [pow(7, i, spec.p) for i in range(11)]


def test_ifft_roundtrip_and_rotation():
    spec = BN254_FR
    domain = EvaluationDomain(spec, 3, 4)
    vals = [random.randrange(spec.p) for _ in range(domain.n)]
    poly = domain.lagrange_from_vec(limb.from_ints(spec, vals))

    coeff = domain.lagrange_to_coeff(poly)
    back = domain.coeff_to_lagrange(coeff)
    assert limb.to_ints(spec, back.values) == vals

    # rotation identity: eval(rotate(poly, next), x) == eval(poly, omega*x)
    x = random.randrange(1, spec.p)
    rot = domain.lagrange_to_coeff(poly.rotate(Rotation.next()))
    ex = limb.to_int(spec, arith.eval_polynomial(spec, rot.values, x))
    ex2 = limb.to_int(
        spec, arith.eval_polynomial(spec, coeff.values, x * domain.omega % spec.p)
    )
    assert ex == ex2


def test_extended_domain_quotient():
    """(f^2 - f) / t(X) roundtrips for f vanishing nowhere... instead check
    that coeff -> extended -> coeff is identity on the low n coefficients."""
    spec = BN254_FR
    domain = EvaluationDomain(spec, 3, 4)
    vals = [random.randrange(spec.p) for _ in range(domain.n)]
    coeff = domain.coeff_from_vec(limb.from_ints(spec, vals))
    ext = domain.coeff_to_extended(coeff)
    back = domain.extended_to_coeff(ext)  # length n * quotient_poly_degree
    assert limb.to_ints(spec, back[:, : domain.n]) == vals
    assert all(v == 0 for v in limb.to_ints(spec, back[:, domain.n :]))


def test_divide_by_vanishing():
    """h(X) = t(X)*g(X) in the extended domain divides back to g."""
    spec = BN254_FR
    domain = EvaluationDomain(spec, 3, 3)
    p = spec.p
    g = [random.randrange(p) for _ in range(domain.n)]
    # build t(X)*g(X) evaluations over the zeta-coset extended domain
    gpoly = domain.coeff_from_vec(limb.from_ints(spec, g))
    gext = domain.coeff_to_extended(gpoly)
    m = 1 << (domain.extended_k - domain.k)
    tvals = [pow(domain.t_evaluations_inv[i % m], -1, p) for i in range(domain.extended_len)]
    prod = limb.fmul(spec, gext.values, limb.from_ints(spec, tvals))
    q = domain.divide_by_vanishing_poly(Poly(prod, "extended_lagrange"))
    assert limb.to_ints(spec, q.values) == limb.to_ints(spec, gext.values)


def test_eval_and_kate_division():
    spec = BN254_FR
    n = 16
    p = spec.p
    coeffs = [random.randrange(p) for _ in range(n)]
    c = limb.from_ints(spec, coeffs)
    x = random.randrange(1, p)
    want = sum(co * pow(x, i, p) for i, co in enumerate(coeffs)) % p
    assert limb.to_int(spec, arith.eval_polynomial(spec, c, x)) == want

    b = random.randrange(1, p)
    q = arith.kate_division(spec, c, b)
    qi = limb.to_ints(spec, q)
    # check (X - b) * q(X) + p(b) == p(X)
    pb = sum(co * pow(b, i, p) for i, co in enumerate(coeffs)) % p
    recon = [0] * n
    recon[0] = pb
    for i in range(n - 1):
        recon[i + 1] = (recon[i + 1] + qi[i]) % p
        recon[i] = (recon[i] - b * qi[i]) % p
    assert recon == coeffs


def test_lagrange_interpolate():
    spec = BN254_FR
    pts = [random.randrange(spec.p) for _ in range(5)]
    evs = [random.randrange(spec.p) for _ in range(5)]
    coeffs = arith.lagrange_interpolate(spec, pts, evs)
    for x, y in zip(pts, evs):
        assert sum(c * pow(x, i, spec.p) for i, c in enumerate(coeffs)) % spec.p == y


def test_l_i_range():
    spec = PASTA_FP
    domain = EvaluationDomain(spec, 1, 3)
    p = spec.p
    pts = [pow(domain.omega, i, p) for i in range(8)]
    x = random.randrange(p)
    xn = pow(x, 8, p)
    evals = domain.l_i_range(x, xn, range(-7, 8))
    for i in range(8):
        li = [0] * 8
        li[i] = 1
        coeffs = arith.lagrange_interpolate(spec, pts, li)
        want = sum(c * pow(x, d, p) for d, c in enumerate(coeffs)) % p
        assert evals[7 + i] == want
        assert evals[7 - i] == (
            sum(
                c * pow(x, d, p)
                for d, c in enumerate(
                    arith.lagrange_interpolate(
                        spec, pts, [1 if t == (8 - i) % 8 else 0 for t in range(8)]
                    )
                )
            )
            % p
        )
