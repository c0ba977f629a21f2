"""plonk_api.rs port: standard-plonk + lookup circuit, two instances per proof.

Mirrors /root/reference/halo2_proofs/tests/plonk_api.rs:23-626: the K=5
StandardPlonk circuit with an in-proof lookup, proved as TWO circuit instances
in one proof, for GWC, SHPLONK and IPA; `bad_keys` k-too-small errors
(:428-446); MockProver satisfaction (:495-499); and a pinned-VK regression
(:624-626).  This is the only test that drives the lookup argument and
multi-instance handling through create_proof.
"""

import hashlib

import pytest

from halo2_tpu.circuit import Value
from halo2_tpu.curves import BN254_G1, PALLAS
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from halo2_tpu.plonk.batch import BatchVerifier
from halo2_tpu.plonk.error import NotEnoughRowsAvailable
from halo2_tpu.poly.ipa import IPASingleStrategy, MSMIPA, ParamsIPA
from halo2_tpu.poly.kzg import ParamsKZG
from halo2_tpu.poly.multiopen_gwc import gwc_create_proof, gwc_verify_proof
from halo2_tpu.poly.multiopen_ipa import ipa_create_proof, ipa_verify_proof
from halo2_tpu.poly.multiopen_shplonk import shplonk_create_proof, shplonk_verify_proof
from halo2_tpu.transcript import Blake2bTranscript
from halo2_tpu.utils.rng import FieldRng

from circuits import StandardPlonkCircuit

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)

K = 5


def _assert_pinned(name: str, proof: bytes):
    """Pin proof bytes in tests/data/ (BASELINE.md correctness config 2 /
    VERDICT r4 next-round #9): any transcript-order, RNG-order, or arithmetic
    regression changes the bytes and fails the suite, not just the driver
    dryrun.  Set HALO2_TPU_REPIN=1 to regenerate after an intentional
    protocol change."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", f"{name}.hex")
    if os.environ.get("HALO2_TPU_REPIN") == "1" or not os.path.exists(path):
        with open(path, "w") as f:
            f.write(proof.hex() + "\n")
    with open(path) as f:
        expected = bytes.fromhex(f.read().strip())
    assert proof == expected, f"{name}: proof bytes diverge from the pinned run"


def common(spec):
    """plonk_api.rs common! macro: witness a, instance, lookup table."""
    p = spec.p
    a = 2834758237 * spec.zeta % p
    instance = 2
    return a, instance, [instance, a, a, 0]


def make_circuit(spec, with_witness: bool):
    a, instance, table = common(spec)
    return StandardPlonkCircuit(
        Value.known(a) if with_witness else Value.unknown(), table
    )


# -- bad_keys! (plonk_api.rs:418-446) ---------------------------------------


def test_bad_keys_kzg():
    empty = make_circuit(BN254_G1.scalar, with_witness=False)
    with pytest.raises(NotEnoughRowsAvailable) as exc:
        keygen_vk(ParamsKZG.setup_host(1, seed=b"bad-keys"), empty)
    assert exc.value.current_k == 1
    with pytest.raises(NotEnoughRowsAvailable) as exc:
        keygen_vk(ParamsKZG.setup_host(K - 1, seed=b"bad-keys"), empty)
    assert exc.value.current_k == K - 1


# -- KZG (GWC + SHPLONK share one pk) ---------------------------------------


@pytest.fixture(scope="module")
def kzg_setup():
    params = ParamsKZG.setup_host(K, seed=b"plonk-api")
    empty = make_circuit(BN254_G1.scalar, with_witness=False)
    vk = keygen_vk(params, empty)
    pk = keygen_pk(params, vk, empty)
    return params, vk, pk


def _prove_two_instances(params, pk, spec, multiopen, seed, query_instance=False):
    a, instance, _ = common(spec)
    circuit = make_circuit(spec, with_witness=True)
    rng = FieldRng(spec, seed)
    transcript = Blake2bTranscript(params.curve)
    return create_proof(
        params, pk, [circuit, circuit], [[[instance]], [[instance]]],
        rng, transcript, multiopen, query_instance=query_instance,
    )


def test_plonk_api_gwc(kzg_setup):
    params, vk, pk = kzg_setup
    spec = BN254_G1.scalar
    _, instance, _ = common(spec)

    # MockProver satisfaction (plonk_api.rs:495-499)
    prover = MockProver.run(spec, K, make_circuit(spec, True), [[instance]])
    assert prover.verify() == []

    proof = _prove_two_instances(params, pk, spec, gwc_create_proof, b"gwc-rng")
    assert len(proof) > 0
    _assert_pinned("plonk_api_gwc_k5", proof)

    tr = Blake2bTranscript(params.curve, proof)
    assert verify_proof(params, vk, [[[instance]], [[instance]]], tr, gwc_verify_proof)

    # wrong instance fails
    bad = Blake2bTranscript(params.curve, proof)
    assert not verify_proof(
        params, vk, [[[instance]], [[(instance + 1) % spec.p]]], bad, gwc_verify_proof
    )


def test_plonk_api_shplonk(kzg_setup):
    params, vk, pk = kzg_setup
    spec = BN254_G1.scalar
    _, instance, _ = common(spec)

    proof = _prove_two_instances(params, pk, spec, shplonk_create_proof, b"shplonk-rng")
    _assert_pinned("plonk_api_shplonk_k5", proof)
    tr = Blake2bTranscript(params.curve, proof)
    assert verify_proof(
        params, vk, [[[instance]], [[instance]]], tr, shplonk_verify_proof
    )
    bad = Blake2bTranscript(params.curve, proof)
    assert not verify_proof(
        params, vk, [[[(instance + 1) % spec.p]], [[instance]]], bad,
        shplonk_verify_proof,
    )


def test_pinned_vk_matches_rust_reference():
    """plonk_api.rs:622-626 — the `{:#?}` Debug string of the pinned VK,
    byte-identical to the Rust reference.

    This is the strongest cross-implementation anchor in the suite: for it
    to hold, omega, the whole constraint system (query dedup order, gates,
    permutation columns, lookups), the SSWU-derived IPA SRS, every fixed
    commitment (including lookup-table default fill and ZETA), and every
    permutation sigma commitment must all be byte-exact with Rust.
    """
    from halo2_tpu.curves import VESTA
    from halo2_tpu.plonk.rust_debug import pinned_vk_debug

    spec = VESTA.scalar
    empty = make_circuit(spec, with_witness=False)
    params = ParamsIPA.setup(K, VESTA)  # EqAffine SRS, "Halo2-Parameters"
    vk = keygen_vk(params, empty)
    got = pinned_vk_debug(vk, VESTA.base.p, VESTA.scalar.p, alternate=True)
    # sha256 of the exact 394-line string frozen in the reference's
    # tests/plonk_api.rs:622-626 (compared in full against the reference
    # checkout when present)
    import os
    import re

    ref = "/root/reference/halo2_proofs/tests/plonk_api.rs"
    if os.path.exists(ref):
        m = re.search(r'r#####"(PinnedVerificationKey \{.*?)"#####', open(ref).read(), re.S)
        assert got == m.group(1)
    assert (
        hashlib.sha256(got.encode()).hexdigest()
        == "093a7bc1f3ccba4efcac3d5f4212b6b3edae1e4b2791b52078029ad00ae5146b"
    )
    # the transcript_repr derived from the compact {:?} string (the value
    # every Rust proof transcript starts from)
    assert vk.transcript_repr == (
        0x1CDCAD9331146096EFAE2CAA7B690FFA5870C98E90A8B7509DDA04D118A2AD38
    )


# -- IPA ----------------------------------------------------------------------


class _IPAStrategy:
    def __init__(self, params):
        self.params = params

    def process(self, f):
        guard = f(MSMIPA(self.params))
        return guard.use_challenges().check()


def test_plonk_api_ipa():
    spec = PALLAS.scalar
    params = ParamsIPA.setup(K, seed=b"plonk-api-ipa")
    _, instance, _ = common(spec)
    empty = make_circuit(spec, with_witness=False)
    vk = keygen_vk(params, empty)
    pk = keygen_pk(params, vk, empty)

    proof = _prove_two_instances(
        params, pk, spec, ipa_create_proof, b"ipa-rng", query_instance=True
    )
    _assert_pinned("plonk_api_ipa_k5", proof)
    tr = Blake2bTranscript(params.curve, proof)
    assert verify_proof(
        params, vk, [[[instance]], [[instance]]], tr, ipa_verify_proof,
        query_instance=True, strategy=_IPAStrategy(params),
    )

    # BatchVerifier (verifier/batch.rs:89-133): two good proofs pass;
    # adding a corrupted one fails the whole batch.
    batch = BatchVerifier()
    batch.add_proof([[[instance]], [[instance]]], proof)
    batch.add_proof([[[instance]], [[instance]]], proof)
    assert batch.finalize(params, vk)

    tampered = bytearray(proof)
    tampered[-1] ^= 1  # corrupt the final IPA fold scalar
    batch_bad = BatchVerifier()
    batch_bad.add_proof([[[instance]], [[instance]]], proof)
    batch_bad.add_proof([[[instance]], [[instance]]], bytes(tampered))
    assert not batch_bad.finalize(params, vk)
