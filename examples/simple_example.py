"""simple-example.rs analog: prove and verify `out = constant * a^4` (KZG+GWC).

Run: PYTHONPATH=. python examples/simple_example.py
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from halo2_tpu.circuit import Value
from halo2_tpu.curves import BN254_G1
from halo2_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from halo2_tpu.poly.kzg import ParamsKZG
from halo2_tpu.poly.multiopen_gwc import gwc_create_proof, gwc_verify_proof
from halo2_tpu.transcript import Blake2bTranscript
from halo2_tpu.utils.rng import FieldRng

from circuits import SimpleCircuit


def main(k: int = 4):
    spec = BN254_G1.scalar
    constant, a = 7, 5
    c = constant * pow(a, 4, spec.p) % spec.p

    params = ParamsKZG.setup(k)
    circuit = SimpleCircuit(constant, Value.known(a))
    vk = keygen_vk(params, circuit.without_witnesses())
    pk = keygen_pk(params, vk, circuit.without_witnesses())

    rng = FieldRng(spec)
    transcript = Blake2bTranscript(BN254_G1)
    proof = create_proof(params, pk, [circuit], [[[c]]], rng, transcript, gwc_create_proof)
    print(f"proof: {len(proof)} bytes")

    verifier_transcript = Blake2bTranscript(BN254_G1, proof)
    ok = verify_proof(params, vk, [[[c]]], verifier_transcript, gwc_verify_proof)
    print("verified:", ok)
    assert ok


if __name__ == "__main__":
    main()
