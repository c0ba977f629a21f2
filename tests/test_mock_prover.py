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

    # a consistent-but-wrong witness breaks only the lookup (the gates are
    # self-consistent in the tampered witness)
    bad = MockProver.run(
        spec, 5, StandardPlonkCircuit(Value.known((a + 1) % spec.p), table), [[2]]
    )
    f_py = bad.verify(vectorized=False)
    f_vec = bad.verify(vectorized=True)
    assert f_py == f_vec
    assert any(f.kind == "Lookup" for f in f_py)

    # tampering one assigned cell after synthesis breaks a gate row: both
    # paths must agree on the ConstraintNotSatisfied failure too
    tampered = MockProver.run(
        spec, 5, StandardPlonkCircuit(Value.known(a), table), [[2]]
    )
    # advice column 3 is c (the mult output; creation order e,a,b,c,d);
    # find an assigned row and corrupt it
    col = 3
    row = next(
        r for r, v in enumerate(tampered.advice[col]) if isinstance(v, int) and v != 0
    )
    tampered.advice[col][row] = (tampered.advice[col][row] + 1) % spec.p
    t_py = tampered.verify(vectorized=False)
    t_vec = tampered.verify(vectorized=True)
    assert t_py == t_vec
    assert any(f.kind == "ConstraintNotSatisfied" for f in t_py)
    # failure rendering follows the reference Display format (failure.rs:191)
    msg = str(next(f for f in t_py if f.kind == "ConstraintNotSatisfied"))
    assert "is not satisfied in Region" in msg and "at offset" in msg, msg
