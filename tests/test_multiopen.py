"""Multiopen roundtrip matrix — the analog of poly/multiopen_test.rs:26-121.

Proves and verifies a small set of polynomial openings (shared polys across
points, shared point sets) for {GWC, SHPLONK} x {Blake2b, Keccak256}, plus an
invalid-eval negative path.
"""

import pytest

from halo2_tpu.curves import BN254_G1
from halo2_tpu.fields import limb
from halo2_tpu.ops import arith
from halo2_tpu.plonk.prover import ProverQuery
from halo2_tpu.poly.kzg import ParamsKZG
from halo2_tpu.poly.multiopen_gwc import (
    DualMSM,
    VerifierQuery,
    gwc_create_proof,
    gwc_verify_proof,
)
from halo2_tpu.poly.multiopen_shplonk import (
    shplonk_create_proof,
    shplonk_verify_proof,
)
from halo2_tpu.poly.polynomial import COEFF, Poly
from halo2_tpu.transcript import TRANSCRIPTS

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)

K = 3
SPEC = BN254_G1.scalar


@pytest.fixture(scope="module")
def params():
    return ParamsKZG.setup(K, seed=b"multiopen-test")


def _setup(params, bad=False):
    p = SPEC.p
    n = 1 << K
    ax = Poly(limb.from_ints(SPEC, [(10 + i) % p for i in range(n)]), COEFF)
    bx = Poly(limb.from_ints(SPEC, [(10 + i) % p for i in range(n)]), COEFF)
    cx = Poly(limb.from_ints(SPEC, [(100 + 3 * i) % p for i in range(n)]), COEFF)
    x = 17
    y = 29
    polys = {"a": ax, "b": bx, "c": cx}

    def ev(poly, pt):
        return limb.to_ints(SPEC, arith.eval_polynomial(SPEC, poly.values, pt))[0]

    evals = {
        ("a", x): ev(ax, x),
        ("b", x): ev(bx, x),
        ("c", x): ev(cx, x),
        ("c", y): (ev(cx, y) + (1 if bad else 0)) % p,
    }
    prover_queries = [
        ProverQuery(x, ax),
        ProverQuery(x, bx),
        ProverQuery(x, cx),
        ProverQuery(y, cx),
    ]
    return polys, evals, prover_queries, x, y


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
@pytest.mark.parametrize("hash_name", ["blake2b", "keccak256"])
def test_multiopen_roundtrip(params, scheme, hash_name):
    create, verify = {
        "gwc": (gwc_create_proof, gwc_verify_proof),
        "shplonk": (shplonk_create_proof, shplonk_verify_proof),
    }[scheme]
    T = TRANSCRIPTS[hash_name]
    polys, evals, pqueries, x, y = _setup(params)

    tr = T(BN254_G1)
    # commit each poly so the verifier has commitments
    from halo2_tpu.curves.point import to_affine_ints

    comms = {}
    for name, poly in polys.items():
        pt = to_affine_ints(params.curve, params.commit(poly))[0]
        comms[name] = pt
        tr.write_point(pt)
    create(params, None, tr, pqueries)
    proof = tr.finalize()

    tv = T(BN254_G1, proof)
    rcomms = {name: tv.read_point() for name in polys}
    vqueries = [
        VerifierQuery(rcomms["a"], x, evals[("a", x)]),
        VerifierQuery(rcomms["b"], x, evals[("b", x)]),
        VerifierQuery(rcomms["c"], x, evals[("c", x)]),
        VerifierQuery(rcomms["c"], y, evals[("c", y)]),
    ]
    guard = verify(params, tv, vqueries, DualMSM(params))
    assert guard.check()


@pytest.mark.parametrize("scheme", ["gwc", "shplonk"])
def test_multiopen_bad_eval_fails(params, scheme):
    create, verify = {
        "gwc": (gwc_create_proof, gwc_verify_proof),
        "shplonk": (shplonk_create_proof, shplonk_verify_proof),
    }[scheme]
    T = TRANSCRIPTS["blake2b"]
    polys, evals, pqueries, x, y = _setup(params, bad=True)

    from halo2_tpu.curves.point import to_affine_ints

    tr = T(BN254_G1)
    for name, poly in polys.items():
        tr.write_point(to_affine_ints(params.curve, params.commit(poly))[0])
    create(params, None, tr, pqueries)
    proof = tr.finalize()

    tv = T(BN254_G1, proof)
    rcomms = {name: tv.read_point() for name in polys}
    vqueries = [
        VerifierQuery(rcomms["a"], x, evals[("a", x)]),
        VerifierQuery(rcomms["b"], x, evals[("b", x)]),
        VerifierQuery(rcomms["c"], x, evals[("c", x)]),
        VerifierQuery(rcomms["c"], y, evals[("c", y)]),  # corrupted eval
    ]
    guard = verify(params, tv, vqueries, DualMSM(params))
    assert not guard.check()
