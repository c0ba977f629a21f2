"""Streaming quotient evaluation: on-demand cosets must not change the proof.

SURVEY §7 hard part #5 / VERDICT r4 next-round #4: above a size threshold
evaluate_h computes advice/instance extended cosets lazily under an LRU
budget.  Sharding, streaming, and caching are all exact-arithmetic
reorderings of the same field ops, so proof bytes must be bit-identical.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from circuits import SimpleCircuit

from halo2_tpu.circuit import Value
from halo2_tpu.curves.spec import BN254_G1
from halo2_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from halo2_tpu.poly.kzg import ParamsKZG
from halo2_tpu.poly.multiopen_gwc import gwc_create_proof, gwc_verify_proof
from halo2_tpu.transcript import Blake2bTranscript
from halo2_tpu.utils.rng import FieldRng

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)

SPEC = BN254_G1.scalar


def _prove(params, pk):
    rng = FieldRng(SPEC, b"stream-test-rng")
    transcript = Blake2bTranscript(BN254_G1)
    circuit = SimpleCircuit(7, Value.known(5))
    c = 7 * 5**4 % SPEC.p
    return create_proof(
        params, pk, [circuit], [[[c]]], rng, transcript, gwc_create_proof
    ), [[[c]]]


def test_streaming_cosets_bit_identical(monkeypatch):
    k = 4
    circuit = SimpleCircuit(7, Value.unknown())
    params = ParamsKZG.setup_host(k, seed=b"stream-test")
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)

    monkeypatch.setenv("HALO2_TPU_STREAM_COSETS", "0")
    base, instances = _prove(params, pk)

    monkeypatch.setenv("HALO2_TPU_STREAM_COSETS", "1")
    monkeypatch.setenv("HALO2_TPU_COSET_BUDGET", "1")  # force eviction churn
    streamed, _ = _prove(params, pk)

    assert streamed == base
    assert verify_proof(
        params, vk, instances, Blake2bTranscript(BN254_G1, streamed), gwc_verify_proof
    )
