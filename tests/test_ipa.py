"""IPA commitment scheme: params, group-NTT Lagrange SRS, open/verify,
multiopen matrix (the IPA legs of poly/multiopen_test.rs)."""

import pytest

from halo2_tpu.curves import PALLAS
from halo2_tpu.curves.point import to_affine_ints
from halo2_tpu.fields import limb
from halo2_tpu.ops import arith
from halo2_tpu.plonk.prover import ProverQuery
from halo2_tpu.poly.ipa import (
    IPASingleStrategy,
    MSMIPA,
    ParamsIPA,
    ipa_commit_create_proof,
    ipa_commit_verify_proof,
)
from halo2_tpu.poly.multiopen_gwc import VerifierQuery
from halo2_tpu.poly.multiopen_ipa import ipa_create_proof, ipa_verify_proof
from halo2_tpu.poly.polynomial import COEFF, LAGRANGE, Poly
from halo2_tpu.transcript import Blake2bTranscript
from halo2_tpu.utils.rng import FieldRng

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)

K = 3
FR = PALLAS.scalar


@pytest.fixture(scope="module")
def params():
    return ParamsIPA.setup(K)


def _poly(vals):
    return Poly(limb.from_ints(FR, [v % FR.p for v in vals]), COEFF)


def test_lagrange_srs_consistency(params):
    """commit_lagrange(evals) == commit(coeffs) for the same polynomial
    (the g_to_lagrange identity, reference kzg/commitment.rs:361-384 analog)."""
    from halo2_tpu.poly.domain import EvaluationDomain

    n = 1 << K
    domain = EvaluationDomain(FR, 2, K)
    coeffs = _poly(range(1, n + 1))
    lagr = domain.coeff_to_lagrange(coeffs)
    c1 = to_affine_ints(params.curve, params.commit(coeffs))[0]
    c2 = to_affine_ints(
        params.curve, params.commit_lagrange(Poly(lagr.values, LAGRANGE))
    )[0]
    assert c1 == c2


def test_ipa_open_roundtrip(params):
    n = 1 << K
    poly = _poly([7 * i + 3 for i in range(n)])
    blind = 99
    commitment = to_affine_ints(params.curve, params.commit(poly, blind))[0]
    x = 41
    v = limb.to_ints(FR, arith.eval_polynomial(FR, poly.values, x))[0]

    rng = FieldRng(FR, b"ipa-open")
    tr = Blake2bTranscript(params.curve)
    tr.write_point(commitment)
    tr.write_scalar(v)
    ipa_commit_create_proof(params, rng, tr, poly, blind, x)
    proof = tr.finalize()

    tv = Blake2bTranscript(params.curve, proof)
    cm = tv.read_point()
    v_read = tv.read_scalar()
    msm = MSMIPA(params)
    msm.append_term(1, cm)
    guard = ipa_commit_verify_proof(params, msm, tv, x, v_read)
    assert guard.use_challenges().check()

    # compute_g consistency: G from s-vector equals folding of the SRS
    g = guard.compute_g()
    assert g is not None

    # corrupt the eval -> must fail
    tv2 = Blake2bTranscript(params.curve, proof)
    cm2 = tv2.read_point()
    v_bad = (tv2.read_scalar() + 1) % FR.p
    msm2 = MSMIPA(params)
    msm2.append_term(1, cm2)
    guard2 = ipa_commit_verify_proof(params, msm2, tv2, x, v_bad)
    assert not guard2.use_challenges().check()


def test_ipa_multiopen_roundtrip(params):
    n = 1 << K
    p = FR.p
    ax = _poly([10 + i for i in range(n)])
    bx = _poly([10 + i for i in range(n)])
    cx = _poly([100 + 3 * i for i in range(n)])
    x, y = 17, 29

    def ev(poly, pt):
        return limb.to_ints(FR, arith.eval_polynomial(FR, poly.values, pt))[0]

    blinds = {"a": 11, "b": 22, "c": 33}
    rng = FieldRng(FR, b"ipa-multiopen")
    tr = Blake2bTranscript(params.curve)
    comms = {}
    for name, poly in (("a", ax), ("b", bx), ("c", cx)):
        pt = to_affine_ints(params.curve, params.commit(poly, blinds[name]))[0]
        comms[name] = pt
        tr.write_point(pt)
    pq = [
        ProverQuery(x, ax, blinds["a"]),
        ProverQuery(x, bx, blinds["b"]),
        ProverQuery(x, cx, blinds["c"]),
        ProverQuery(y, cx, blinds["c"]),
    ]
    ipa_create_proof(params, rng, tr, pq)
    proof = tr.finalize()

    tv = Blake2bTranscript(params.curve, proof)
    rcomms = {name: tv.read_point() for name in ("a", "b", "c")}
    vq = [
        VerifierQuery(rcomms["a"], x, ev(ax, x)),
        VerifierQuery(rcomms["b"], x, ev(bx, x)),
        VerifierQuery(rcomms["c"], x, ev(cx, x)),
        VerifierQuery(rcomms["c"], y, ev(cx, y)),
    ]
    guard = ipa_verify_proof(params, tv, vq, MSMIPA(params))
    assert guard.use_challenges().check()

    # bad eval fails
    tb = Blake2bTranscript(params.curve, proof)
    bcomms = {name: tb.read_point() for name in ("a", "b", "c")}
    vq_bad = [
        VerifierQuery(bcomms["a"], x, ev(ax, x)),
        VerifierQuery(bcomms["b"], x, ev(bx, x)),
        VerifierQuery(bcomms["c"], x, ev(cx, x)),
        VerifierQuery(bcomms["c"], y, (ev(cx, y) + 1) % p),
    ]
    guard_bad = ipa_verify_proof(params, tb, vq_bad, MSMIPA(params))
    assert not guard_bad.use_challenges().check()
