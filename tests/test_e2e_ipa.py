"""End-to-end IPA: keygen -> prove -> verify over Pallas (QUERY_INSTANCE=true).

The IPA leg of tests/plonk_api.rs: simple circuit at k=4, ProverIPA multiopen,
Blake2b transcript, real blinds.
"""

import pytest

from halo2_tpu.circuit import Value
from halo2_tpu.curves import PALLAS
from halo2_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from halo2_tpu.poly.ipa import IPASingleStrategy, MSMIPA, ParamsIPA
from halo2_tpu.poly.multiopen_ipa import ipa_create_proof, ipa_verify_proof
from halo2_tpu.transcript import Blake2bTranscript
from halo2_tpu.utils.rng import FieldRng

from circuits import SimpleCircuit

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)

K = 4


class IPAStrategy:
    def __init__(self, params):
        self.params = params

    def process(self, f):
        guard = f(MSMIPA(self.params))
        return guard.use_challenges().check()


@pytest.fixture(scope="module")
def params():
    return ParamsIPA.setup(K, seed=b"ipa-e2e")


def test_simple_circuit_ipa_roundtrip(params):
    spec = PALLAS.scalar
    p = spec.p
    constant = 7
    a = 5
    c = constant * pow(a, 4, p) % p

    circuit = SimpleCircuit(constant, Value.known(a))
    vk = keygen_vk(params, circuit.without_witnesses())
    pk = keygen_pk(params, vk, circuit.without_witnesses())

    rng = FieldRng(spec, b"ipa-proof-rng")
    transcript = Blake2bTranscript(PALLAS)
    proof = create_proof(
        params, pk, [circuit], [[[c]]], rng, transcript, ipa_create_proof,
        query_instance=True,
    )
    assert len(proof) > 0

    tr = Blake2bTranscript(PALLAS, proof)
    ok = verify_proof(
        params, vk, [[[c]]], tr, ipa_verify_proof,
        query_instance=True, strategy=IPAStrategy(params),
    )
    assert ok

    # wrong instance must fail
    bad = Blake2bTranscript(PALLAS, proof)
    assert not verify_proof(
        params, vk, [[[(c + 1) % p]]], bad, ipa_verify_proof,
        query_instance=True, strategy=IPAStrategy(params),
    )
