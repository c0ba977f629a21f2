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


def test_vectorized_verify_matches_python():
    """The device whole-column verify path (dev.rs verify_par analog) must
    produce the identical failure list to the per-row Python path."""
    from circuits import StandardPlonkCircuit

    spec = BN254_FR
    a = 2834758237 * spec.zeta % spec.p
    table = [2, a, a, 0]

    good = MockProver.run(spec, 5, StandardPlonkCircuit(Value.known(a), table), [[2]])
    assert good.verify(vectorized=False) == good.verify(vectorized=True) == []

    bad = MockProver.run(
        spec, 5, StandardPlonkCircuit(Value.known((a + 1) % spec.p), table), [[2]]
    )
    f_py = bad.verify(vectorized=False)
    f_vec = bad.verify(vectorized=True)
    assert f_py == f_vec
    assert any(f.kind == "ConstraintNotSatisfied" for f in f_py)
    assert any(f.kind == "Lookup" for f in f_py)
