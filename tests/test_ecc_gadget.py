"""ECC chip tests: witness/add vs host Pallas arithmetic (MockProver)."""

import pytest

from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.curves import PALLAS, host
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields.spec import PASTA_FP
from halo2_tpu.gadgets.ecc import EccChip

G = host.generator(PALLAS)
G2 = host.double(PALLAS, G)
G3 = host.add(PALLAS, G2, G)


class AddCircuit(Circuit):
    def __init__(self, p, q, expected, complete=True):
        self.p, self.q, self.expected, self.complete = p, q, expected, complete

    def without_witnesses(self):
        return AddCircuit(
            Value.unknown(), Value.unknown(), self.expected, self.complete
        )

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(9)]
        return EccChip.configure(meta, advices)

    def synthesize(self, config, layouter):
        chip = EccChip(config)
        p = chip.witness_point(layouter, self.p)
        q = chip.witness_point(layouter, self.q)
        if self.complete:
            r = chip.add(layouter, p, q)
        else:
            r = chip.add_incomplete(layouter, p, q)
        if not r.x.value.is_none() and self.expected is not None:
            got = r.value().value()
            assert got == self.expected, (got, self.expected)


def _run(p, q, expected, complete=True):
    # identity is witnessed as the (0, 0) sentinel (chip.py docstring)
    p = (0, 0) if p is None else p
    q = (0, 0) if q is None else q
    circ = AddCircuit(Value.known(p), Value.known(q), expected, complete)
    return MockProver.run(PASTA_FP, 5, circ, []).verify()


def test_witness_and_incomplete_add():
    assert _run(G, G2, G3, complete=False) == []


def test_complete_add_distinct():
    assert _run(G, G2, G3) == []


def test_complete_add_doubling():
    assert _run(G, G, G2) == []


def test_complete_add_identity_cases():
    assert _run(None, G, G) == []
    assert _run(G, None, G) == []
    assert _run(G, host.neg(PALLAS, G), None) == []  # P + (-P) = identity


def test_witness_rejects_off_curve():
    bad = (G[0], (G[1] + 1) % PASTA_FP.p)
    circ = AddCircuit(Value.known(bad), Value.known(G2), None, complete=True)
    assert MockProver.run(PASTA_FP, 5, circ, []).verify() != []


class MulCircuit(Circuit):
    """Variable-base scalar mul; digest checked against host.mul."""

    def __init__(self, scalar, base, expected):
        self.scalar, self.base, self.expected = scalar, base, expected

    def without_witnesses(self):
        return MulCircuit(Value.unknown(), Value.unknown(), self.expected)

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(9)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return EccChip.configure(meta, advices)

    def synthesize(self, config, layouter):
        chip = EccChip(config)
        base = chip.witness_point(layouter, self.base)
        result, z = chip.mul(layouter, self.scalar, base)
        if not result.x.value.is_none() and self.expected is not None:
            got = result.value().value()
            assert got == self.expected, (got, self.expected)
            assert z.value.value() == self.scalar.value()


@pytest.mark.slow
def test_variable_base_mul():
    """[k]G for a random-ish 253-bit k vs host double-and-add
    (ecc/chip/mul.rs coverage; all-complete rounds, PARITY.md note)."""
    k = 0x0ACE1234DEADBEEF5A5A5A5AC0FFEE0123456789ABCDEF0102030405060708
    expected = host.mul(PALLAS, G, k)
    circ = MulCircuit(Value.known(k), Value.known(G), expected)
    assert MockProver.run(PASTA_FP, 11, circ, []).verify() == []


@pytest.mark.slow
def test_variable_base_mul_wrong_bit_fails():
    """Tampered witness: claiming [k+1]G for scalar k must fail the z chain."""
    k = 0x3FF
    wrong = host.mul(PALLAS, G, k + 1)
    circ = MulCircuit(Value.known(k), Value.known(G), None)

    class Tampered(MulCircuit):
        def synthesize(self, config, layouter):
            chip = EccChip(config)
            base = chip.witness_point(layouter, self.base)
            result, z = chip.mul(layouter, self.scalar.map(lambda v: v + 1), base)

    t = Tampered(Value.known(k), Value.known(G), None)
    # the z chain's final cell equals k+1, not k — nothing constrains it to
    # an instance here, but a wrong BIT inside the chain breaks booleanity /
    # select equations.  Check the honest circuit rejects a flipped bit by
    # corrupting the scalar decomposition parity.
    prover = MockProver.run(PASTA_FP, 11, t, [])
    assert prover.verify() == []  # consistent tampered witness still proves k+1

    # corrupt one decomposition bit cell (lam column of a mul-step row) so
    # the "bit boolean" constraint fails
    bad = MockProver.run(PASTA_FP, 11, MulCircuit(Value.known(k), Value.known(G), None), [])
    step_region = next(r for r in bad.regions if r.name.startswith("mul step 5"))
    row = min(step_region.rows)
    bad.advice[4][row] = 2  # advices[4] is the lam/bit column
    failures = bad.verify()
    assert any(
        f.kind == "ConstraintNotSatisfied" and f.constraint == "bit boolean"
        for f in failures
    ), [str(f) for f in failures[:3]]
