"""BatchVerifier: check many IPA proofs with one final MSM.

Rebuild of plonk/verifier/batch.rs (SURVEY.md §2.23): each proof's multiopen
verification produces a GuardIPA; the guards' MSMs are accumulated with random
scaling (so no invalid proof can cancel another) and a single MSM evaluation
decides the whole batch.  The reference parallelizes over proofs with rayon;
the per-proof transcript replay here is host-bound and the final MSM runs on
device, so the batch reduces to one large device dispatch.
"""

from __future__ import annotations

from typing import List

from ..poly.ipa import MSMIPA, ParamsIPA
from ..poly.multiopen_ipa import ipa_verify_proof
from ..transcript import Blake2bTranscript
from ..utils.rng import FieldRng
from .verifier import verify_proof


class _BatchStrategy:
    """verifier/batch.rs BatchStrategy: return the guard's MSM unchecked."""

    def __init__(self, params: ParamsIPA):
        self.params = params
        self.msm_out = None

    def process(self, f):
        guard = f(MSMIPA(self.params))
        self.msm_out = guard.use_challenges()
        return True  # deferred: actual check happens in finalize()


class BatchVerifier:
    def __init__(self, transcript_cls=Blake2bTranscript):
        self.items: List[tuple] = []
        self.transcript_cls = transcript_cls

    def add_proof(self, instances, proof: bytes):
        self.items.append((instances, proof))

    def finalize(self, params: ParamsIPA, vk, rng=None) -> bool:
        rng = rng or FieldRng(params.curve.scalar, b"halo2-tpu-batch")
        acc = MSMIPA(params)
        for instances, proof in self.items:
            strategy = _BatchStrategy(params)
            transcript = self.transcript_cls(params.curve, proof)
            try:
                verify_proof(
                    params, vk, instances, transcript, ipa_verify_proof,
                    query_instance=True, strategy=strategy,
                )
            except (ValueError, AssertionError):
                return False
            acc.scale(rng())
            acc.add_msm(strategy.msm_out)
        return acc.check()
