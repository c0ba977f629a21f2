"""Poseidon gadget tests: primitives vs reference constants/test-vectors, and
the Pow5 chip hash circuit under MockProver (halo2_gadgets poseidon tests)."""

import pytest

from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields.spec import BN254_FR, PASTA_FP
from halo2_tpu.gadgets.poseidon import (
    ConstantLength,
    PoseidonHashGadget,
    Pow5Chip,
    hash_message,
    p128_pow5_t3,
    permute,
)

# -- primitives ---------------------------------------------------------------


def test_constants_match_reference_fp():
    """Generated Grain/MDS constants equal the reference's hardcoded Pallas
    tables (halo2_gadgets/src/poseidon/primitives/fp.rs)."""
    spec = p128_pow5_t3(PASTA_FP)
    rcs, mds, mds_inv = spec.constants()
    assert (
        rcs[0][0]
        == 0x360D7470611E473D353F628F76D110F34E71162F31003B7057538C2596426303
    )
    assert (
        mds[0][0]
        == 0x0AB5E5B874A68DE7B3D59FBDC8C9EAD497D7A0AB23850B56323F2486D7E11B63
    )
    assert (
        mds_inv[0][0]
        == 0x2CC057F3FA14687ACC59FFD00DE864434543705F35E98AB5C6DE463CD1404E6B
    )
    # MDS * MDS_INV == I
    p = PASTA_FP.p
    for i in range(3):
        for j in range(3):
            acc = sum(mds[i][k] * mds_inv[k][j] for k in range(3)) % p
            assert acc == (1 if i == j else 0)


def test_sponge_equivalence():
    """orchard_spec_equivalence (primitives.rs tests): hash([6,42]) equals
    permute([6, 42, 2<<64])[0]."""
    spec = p128_pow5_t3(PASTA_FP)
    h = hash_message(spec, ConstantLength(2), [6, 42])
    st = permute(spec, [6, 42, 2 << 64])
    assert h == st[0]


# -- Pow5 chip ----------------------------------------------------------------


class HashCircuit(Circuit):
    """poseidon pow5.rs HashCircuit: hash a 2-word message, expose via instance."""

    spec = p128_pow5_t3(BN254_FR)

    def __init__(self, message, output):
        self.message = message  # Value of list[int] (len 2)
        self.output = output

    def without_witnesses(self):
        return HashCircuit(Value.unknown(), Value.unknown())

    @classmethod
    def configure(cls, meta):
        width = cls.spec.t
        state = [meta.advice_column() for _ in range(width)]
        partial_sbox = meta.advice_column()
        rc_a = [meta.fixed_column() for _ in range(width)]
        rc_b = [meta.fixed_column() for _ in range(width)]
        meta.enable_constant(rc_b[0])
        instance = meta.instance_column()
        meta.enable_equality(instance)
        config = Pow5Chip.configure(meta, cls.spec, state, partial_sbox, rc_a, rc_b)
        return {"pow5": config, "instance": instance}

    def synthesize(self, config, layouter):
        chip = Pow5Chip(config["pow5"])

        message = self.message

        def load(region):
            cells = []
            for i in range(2):
                v = message.map(lambda m, i=i: m[i])
                cells.append(
                    region.assign_advice(config["pow5"].state[i], 0, lambda v=v: v)
                )
            return cells

        words = layouter.namespace("load message").assign_region("load message", load)
        gadget = PoseidonHashGadget(chip, ConstantLength(2))
        out = gadget.hash(layouter.namespace("hash"), words)
        layouter.namespace("expose").constrain_instance(
            out.cell, config["instance"], 0
        )


def test_pow5_hash_circuit_mock():
    spec = HashCircuit.spec
    message = [6, 42]
    expected = hash_message(spec, ConstantLength(2), message)
    circuit = HashCircuit(Value.known(message), Value.known(expected))
    prover = MockProver.run(BN254_FR, 7, circuit, [[expected]])
    failures = prover.verify()
    assert failures == [], "\n".join(str(f) for f in failures)


def test_pow5_hash_circuit_mock_bad_instance():
    spec = HashCircuit.spec
    message = [6, 42]
    expected = hash_message(spec, ConstantLength(2), message)
    circuit = HashCircuit(Value.known(message), Value.known(expected))
    prover = MockProver.run(BN254_FR, 7, circuit, [[(expected + 1) % BN254_FR.p]])
    assert prover.verify() != []
