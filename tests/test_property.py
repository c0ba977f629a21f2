"""Property-based test analogs of the reference's proptest suites.

- SHPLONK ``construct_intermediate_sets`` determinism
  (kzg/multiopen/shplonk.rs:150-262): the commitment grouping must depend
  only on the query structure, never on evals.
- ``Assigned`` arithmetic vs evaluated field semantics
  (plonk/assigned.rs:446-640): every operation on deferred rationals must
  agree with the corresponding operation on the evaluated values, including
  the Zero/Trivial/Rational denominator special cases.

No proptest/hypothesis library is baked into this image, so the strategies
are seeded ``random`` generators with many iterations — same coverage idea,
reproducible failures.
"""

import pytest
import random

from halo2_tpu.circuit.value import Assigned, to_assigned
from halo2_tpu.fields import BN254_FR
from halo2_tpu.poly.multiopen_shplonk import construct_intermediate_sets

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)

P = BN254_FR.p


class _Q:
    def __init__(self, commitment, point, ev):
        self.commitment = commitment
        self.point = point
        self.ev = ev


def _random_queries(rng, commitments, points, num_queries):
    return [
        _Q(
            rng.choice(commitments),
            rng.choice(points),
            rng.randrange(P),
        )
        for _ in range(num_queries)
    ]


def test_shplonk_intermediate_sets_deterministic():
    """Same query structure, different evals -> identical rotation sets
    (shplonk.rs:242-261)."""
    rng = random.Random(1234)
    for trial in range(30):
        commitments = [object() for _ in range(rng.randrange(1, 9))]
        points = [rng.randrange(P) for _ in range(rng.randrange(1, 9))]
        num_queries = rng.randrange(1, 17)
        qs1 = _random_queries(rng, commitments, points, num_queries)
        # same structure, fresh evals
        qs2 = [_Q(q.commitment, q.point, rng.randrange(P)) for q in qs1]

        rs1, sps1 = construct_intermediate_sets(
            qs1, lambda q: q.commitment, lambda q: q.point
        )
        rs2, sps2 = construct_intermediate_sets(
            qs2, lambda q: q.commitment, lambda q: q.point
        )
        sets1 = [(pts, [id(c) for c in comms]) for pts, comms in rs1]
        sets2 = [(pts, [id(c) for c in comms]) for pts, comms in rs2]
        assert sets1 == sets2
        assert sps1 == sps2

        # invariants: every commitment appears in exactly one rotation set,
        # and its point set is exactly the union of points it was queried at
        seen = {}
        for pts, comms in rs1:
            for c in comms:
                assert id(c) not in seen
                seen[id(c)] = set(pts)
        for q in qs1:
            assert q.point in seen[id(q.commitment)]
        for c in commitments:
            queried = {q.point for q in qs1 if q.commitment is c}
            if queried:
                assert seen[id(c)] == queried
        # super point set is the union of all queried points
        assert set(sps1) == {q.point for q in qs1}


def _ev(a: Assigned) -> int:
    if a.denominator == 1:
        return a.numerator % P
    return a.numerator * pow(a.denominator, -1, P) % P


def _rand_assigned(rng) -> Assigned:
    kind = rng.randrange(3)
    if kind == 0:
        return Assigned.zero()
    if kind == 1:
        return Assigned.trivial(rng.randrange(P))
    num = rng.randrange(P)
    den = rng.randrange(1, P)
    return Assigned(num, den)


def test_assigned_arithmetic_matches_field_semantics():
    """add/sub/mul/neg/double/square/cube/invert on deferred rationals agree
    with the evaluated field operations (plonk/assigned.rs proptests)."""
    rng = random.Random(99)
    for _ in range(200):
        a = _rand_assigned(rng)
        b = _rand_assigned(rng)
        av, bv = _ev(a), _ev(b)
        assert _ev(a + b) == (av + bv) % P
        assert _ev(a - b) == (av - bv) % P
        assert _ev(a * b) == av * bv % P
        assert _ev(-a) == (-av) % P
        assert _ev(a.double()) == 2 * av % P
        assert _ev(a.square()) == av * av % P
        assert _ev(a.cube()) == av * av % P * av % P
        inv = a.invert()
        if av == 0:
            # inv0 semantics: 0^{-1} = 0 (denominator 0 treated as zero)
            assert inv.numerator % P == 0 or _ev_inv_zero(inv)
        else:
            assert _ev(inv) == pow(av, -1, P)
        # mixed int coercion
        k = rng.randrange(P)
        assert _ev(a + to_assigned(k)) == (av + k) % P
        assert _ev(a * to_assigned(k)) == av * k % P


def _ev_inv_zero(a: Assigned) -> bool:
    # Assigned.invert of Zero yields (den, 0): evaluating treats 1/0 as 0
    return a.denominator % P == 0


def test_prover_sanity_checks_pass_on_valid_witness(monkeypatch):
    """HALO2_TPU_SANITY_CHECKS=1 exercises the in-prover telescoping asserts
    (lookup + permutation grand products) on a valid proof."""
    import sys

    sys.path.insert(0, "tests")
    from circuits import StandardPlonkCircuit

    from halo2_tpu.circuit import Value
    from halo2_tpu.curves import BN254_G1
    from halo2_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
    from halo2_tpu.poly.kzg import ParamsKZG
    from halo2_tpu.poly.multiopen_gwc import gwc_create_proof, gwc_verify_proof
    from halo2_tpu.transcript import Blake2bTranscript
    from halo2_tpu.utils.rng import FieldRng

    monkeypatch.setenv("HALO2_TPU_SANITY_CHECKS", "1")
    spec = BN254_G1.scalar
    a = 2834758237 * spec.zeta % spec.p
    table = [2, a, a, 0]
    circuit = StandardPlonkCircuit(Value.known(a), table)
    empty = StandardPlonkCircuit(Value.unknown(), table)
    params = ParamsKZG.setup_host(5, seed=b"sanity")
    vk = keygen_vk(params, empty)
    pk = keygen_pk(params, vk, empty)
    rng = FieldRng(spec, b"sanity-rng")
    tr = Blake2bTranscript(BN254_G1)
    proof = create_proof(params, pk, [circuit], [[[2]]], rng, tr, gwc_create_proof)
    tv = Blake2bTranscript(BN254_G1, proof)
    assert verify_proof(params, vk, [[[2]]], tv, gwc_verify_proof)
