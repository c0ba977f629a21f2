"""End-to-end Poseidon hash circuit proof: keygen -> prove -> verify (KZG+GWC).

The BASELINE.md config-3 analog (halo2_gadgets/benches/poseidon.rs) at K=7
with WIDTH=3/RATE=2 over BN254.
"""

import pytest

from halo2_tpu.circuit import Value
from halo2_tpu.curves import BN254_G1
from halo2_tpu.fields.spec import BN254_FR
from halo2_tpu.gadgets.poseidon import ConstantLength, hash_message
from halo2_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from halo2_tpu.poly.kzg import ParamsKZG
from halo2_tpu.poly.multiopen_gwc import gwc_create_proof, gwc_verify_proof
from halo2_tpu.transcript import Blake2bTranscript
from halo2_tpu.utils.rng import FieldRng

from test_poseidon import HashCircuit

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)

K = 7


@pytest.mark.slow
def test_poseidon_proof_roundtrip():
    spec = BN254_FR
    message = [6, 42]
    expected = hash_message(HashCircuit.spec, ConstantLength(2), message)

    params = ParamsKZG.setup(K, seed=b"poseidon-e2e")
    circuit = HashCircuit(Value.known(message), Value.known(expected))
    vk = keygen_vk(params, circuit.without_witnesses())
    pk = keygen_pk(params, vk, circuit.without_witnesses())

    rng = FieldRng(spec, b"poseidon-rng")
    transcript = Blake2bTranscript(BN254_G1)
    proof = create_proof(
        params, pk, [circuit], [[[expected]]], rng, transcript, gwc_create_proof
    )
    assert len(proof) > 0

    tr = Blake2bTranscript(BN254_G1, proof)
    assert verify_proof(params, vk, [[[expected]]], tr, gwc_verify_proof)

    bad = Blake2bTranscript(BN254_G1, proof)
    assert not verify_proof(
        params, vk, [[[(expected + 1) % spec.p]]], bad, gwc_verify_proof
    )
