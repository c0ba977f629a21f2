"""End-to-end: keygen -> prove -> verify (KZG + GWC + Blake2b).

The minimum end-to-end slice from SURVEY.md §7: simple-example circuit at k=4,
KZG-GWC, Blake2b transcript, SimpleFloorPlanner, single permutation set, no
lookups.
"""

import pytest

from halo2_tpu.circuit import Value
from halo2_tpu.curves import BN254_G1
from halo2_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from halo2_tpu.poly.kzg import ParamsKZG
from halo2_tpu.poly.multiopen_gwc import gwc_create_proof, gwc_verify_proof
from halo2_tpu.transcript import Blake2bTranscript
from halo2_tpu.utils.rng import FieldRng

from circuits import SimpleCircuit

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)

K = 4


@pytest.fixture(scope="module")
def params():
    return ParamsKZG.setup(K, seed=b"test-srs")


def test_simple_circuit_proof_roundtrip(params):
    spec = BN254_G1.scalar
    p = spec.p
    constant = 7
    a = 5
    c = constant * pow(a, 4, p) % p

    circuit = SimpleCircuit(constant, Value.known(a))
    vk = keygen_vk(params, circuit.without_witnesses())
    pk = keygen_pk(params, vk, circuit.without_witnesses())

    rng = FieldRng(spec, b"proof-rng")
    transcript = Blake2bTranscript(BN254_G1)
    proof = create_proof(
        params, pk, [circuit], [[[c]]], rng, transcript, gwc_create_proof
    )
    assert len(proof) > 0

    tr = Blake2bTranscript(BN254_G1, proof)
    assert verify_proof(params, vk, [[[c]]], tr, gwc_verify_proof)

    # determinism: same seed -> same bytes
    rng2 = FieldRng(spec, b"proof-rng")
    tr2 = Blake2bTranscript(BN254_G1)
    proof2 = create_proof(
        params, pk, [circuit], [[[c]]], rng2, tr2, gwc_create_proof
    )
    assert proof2 == proof

    # wrong instance must fail
    bad = Blake2bTranscript(BN254_G1, proof)
    assert not verify_proof(params, vk, [[[(c + 1) % p]]], bad, gwc_verify_proof)


def test_proof_verifies_through_real_pairing(params):
    """verify_proof with params._s = None: the verifier must run the actual
    optimal-ate Miller loop + final exponentiation (kzg/msm.rs:151-169),
    not the known-s dev shortcut (VERDICT r3 weak #4)."""
    spec = BN254_G1.scalar
    p = spec.p
    constant = 7
    a = 5
    c = constant * pow(a, 4, p) % p

    circuit = SimpleCircuit(constant, Value.known(a))
    vk = keygen_vk(params, circuit.without_witnesses())
    pk = keygen_pk(params, vk, circuit.without_witnesses())
    rng = FieldRng(spec, b"proof-rng-pairing")
    transcript = Blake2bTranscript(BN254_G1)
    proof = create_proof(
        params, pk, [circuit], [[[c]]], rng, transcript, gwc_create_proof
    )

    saved = params._s
    try:
        params._s = None  # simulate externally loaded params
        tr = Blake2bTranscript(BN254_G1, proof)
        assert verify_proof(params, vk, [[[c]]], tr, gwc_verify_proof)
        bad = Blake2bTranscript(BN254_G1, proof)
        assert not verify_proof(
            params, vk, [[[(c + 1) % p]]], bad, gwc_verify_proof
        )
    finally:
        params._s = saved
