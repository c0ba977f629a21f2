"""MockProver tests (reference test strategy §4.4: MockProver as universal
circuit fixture) including negative paths (§4.5)."""

import pytest

from halo2_tpu.circuit import Value
from halo2_tpu.dev import MockProver
from halo2_tpu.fields import BN254_FR

from circuits import SimpleCircuit


def test_simple_circuit_satisfied():
    p = BN254_FR.p
    a, constant = 5, 7
    c = constant * pow(a, 4, p) % p
    circuit = SimpleCircuit(constant, Value.known(a))
    prover = MockProver.run(BN254_FR, 4, circuit, [[c]])
    assert prover.verify() == []
    prover.assert_satisfied()


def test_simple_circuit_bad_instance():
    p = BN254_FR.p
    a, constant = 5, 7
    c = constant * pow(a, 4, p) % p
    circuit = SimpleCircuit(constant, Value.known(a))
    prover = MockProver.run(BN254_FR, 4, circuit, [[(c + 1) % p]])
    failures = prover.verify()
    assert any(f.kind == "Permutation" for f in failures)
