"""Negative tests for the round-5 gadget soundness fixes (ADVICE.md).

The short-range-check bitshift gate reads the 2^-num_bits multiplier from an
advice cell; before the fix it was a FREE witness, so a malicious prover
could choose any multiplier and defeat the num_bits bound entirely.  The fix
assigns it with assign_advice_from_constant, so honest keygen bakes a copy
constraint to a fixed constant cell into the permutation argument — a forged
multiplier then breaks the permutation grand product and the proof fails.

These tests run the REAL attack: honest keygen (the verifier's view), a
malicious witness generator through create_proof, and assert verify rejects.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.curves import PALLAS
from halo2_tpu.gadgets.utilities import LookupRangeCheckConfig
from halo2_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
from halo2_tpu.poly.ipa import IPASingleStrategy, MSMIPA, ParamsIPA
from halo2_tpu.poly.multiopen_ipa import ipa_create_proof, ipa_verify_proof
from halo2_tpu.transcript import Blake2bTranscript
from halo2_tpu.utils.rng import FieldRng

pytestmark = pytest.mark.slow  # full prover pipelines

# IPA on purpose: its commitments carry real blinds, so an all-zero quotient
# piece still commits to a non-identity point (KZG ignores blinds — both here
# and in the reference — and errors on identity commitments for degenerate
# tiny circuits like this one).
SPEC = PALLAS.scalar
K_LOOKUP = 4  # 4-bit lookup table
NUM_BITS = 3  # claimed bound: value < 8


class ShortCheckCircuit(Circuit):
    """witness_short_check(value, 3) over a 4-bit table (honest gadget)."""

    def __init__(self, value):
        self.value = value

    def without_witnesses(self):
        return type(self)(Value.unknown())

    @classmethod
    def configure(cls, meta):
        running_sum = meta.advice_column()
        table_idx = meta.lookup_table_column()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return LookupRangeCheckConfig.configure(
            meta, running_sum, table_idx, K_LOOKUP, SPEC
        )

    def synthesize(self, config, layouter):
        config.load(layouter)
        config.witness_short_check(layouter, self.value, NUM_BITS)


class ForgedShortCheckCircuit(ShortCheckCircuit):
    """Malicious witness: value = 9 >= 2^3, with a forged multiplier chosen
    so the bitshift gate and both lookups still pass.  Identical region
    shape/order to the honest gadget, so honest keygen's layout applies."""

    def synthesize(self, config, layouter):
        config.load(layouter)
        p = SPEC.p
        evil = 9  # violates the 3-bit claim, still < 2^4 (passes the lookup)
        shifted = 15  # any table value
        # gate: word * 2^K * inv - shifted == 0  ->  pick inv accordingly
        forged_inv = shifted * pow(evil * (1 << K_LOOKUP), -1, p) % p

        def do(region):
            el = region.assign_advice(
                config.running_sum, 0, lambda: Value.known(evil)
            )
            config.q_lookup.enable(region, 0)
            region.assign_advice(config.running_sum, 1, lambda: Value.known(shifted))
            config.q_lookup.enable(region, 1)
            config.q_bitshift.enable(region, 1)
            # the attack: a free advice cell instead of the constant copy
            region.assign_advice(
                config.running_sum, 2, lambda: Value.known(forged_inv)
            )
            return el

        layouter.namespace("short range check").assign_region(
            f"Witness short check {NUM_BITS} bits", do
        )


class _IPAStrategy:
    def __init__(self, params):
        self.params = params

    def process(self, f):
        guard = f(MSMIPA(self.params))
        return guard.use_challenges().check()


@pytest.fixture(scope="module")
def keys():
    k = 6
    params = ParamsIPA.setup(k, seed=b"soundness-test")
    empty = ShortCheckCircuit(Value.unknown())
    vk = keygen_vk(params, empty)
    pk = keygen_pk(params, vk, empty)
    return params, vk, pk


def _prove(params, pk, circuit):
    return create_proof(
        params, pk, [circuit], [[]], FieldRng(SPEC, b"soundness-rng"),
        Blake2bTranscript(params.curve), ipa_create_proof, query_instance=True,
    )


def _verify(params, vk, proof):
    return verify_proof(
        params, vk, [[]], Blake2bTranscript(params.curve, proof),
        ipa_verify_proof, query_instance=True, strategy=_IPAStrategy(params),
    )


def test_honest_short_check_verifies(keys):
    params, vk, pk = keys
    proof = _prove(params, pk, ShortCheckCircuit(Value.known(5)))
    assert _verify(params, vk, proof)


def test_forged_short_check_multiplier_rejected(keys):
    """Pre-fix, this attack produced a VERIFYING proof for a 4-bit value
    against a 3-bit claim (ADVICE r4 high #1).  The constant-copy now breaks
    the permutation argument for any forged multiplier."""
    params, vk, pk = keys
    proof = _prove(params, pk, ForgedShortCheckCircuit(Value.unknown()))
    assert not _verify(params, vk, proof)


def test_mul_fixed_short_copies_last_window():
    """Structural check for ADVICE r4 high #2: the short fixed-base mul's
    last-window cell in the u column must be COPY-CONSTRAINED to the
    running-sum cell z_21 (short.rs:173-176), not freshly witnessed — keygen
    must record an equality cycle touching the u column."""
    import numpy as np

    from halo2_tpu.circuit.layouter import SimpleFloorPlanner
    from halo2_tpu.curves import PALLAS
    from halo2_tpu.gadgets.ecc import EccChip
    from halo2_tpu.gadgets.ecc.mul_fixed import MulFixedChip
    from halo2_tpu.plonk.circuit import ConstraintSystem
    from halo2_tpu.plonk.keygen import KeygenAssembly

    class ShortMulCircuit(Circuit):
        floor_planner = SimpleFloorPlanner

        def __init__(self, mag_sign):
            self.mag_sign = mag_sign

        def without_witnesses(self):
            return ShortMulCircuit(Value.unknown())

        @classmethod
        def configure(cls, meta):
            advices = [meta.advice_column() for _ in range(11)]
            constants = meta.fixed_column()
            meta.enable_constant(constants)
            ecc = EccChip.configure(meta, advices[:9])
            return MulFixedChip.configure(meta, ecc, advices[9], advices[10])

        def synthesize(self, config, layouter):
            chip = MulFixedChip(config)
            chip.mul_short(layouter, self.mag_sign, (PALLAS.gx, PALLAS.gy))

    cs = ConstraintSystem()
    config = type(ShortMulCircuit(None)).configure(cs)
    k = 9
    n = 1 << k
    assembly = KeygenAssembly(k, cs, n)
    circ = ShortMulCircuit(Value.known((100, 1)))
    SimpleFloorPlanner.synthesize(assembly, circ, config, list(cs.constants))
    u_col = config.u
    perm = assembly.permutation
    m_idx = perm.columns.index(u_col)  # raises if u has no equality at all
    identity = np.arange(len(perm.columns) * n, dtype=np.int64).reshape(
        len(perm.columns), n
    )[m_idx]
    # at least one u-column cell participates in a copy cycle (the z_21 copy)
    assert (perm.mapping[m_idx] != identity).any(), (
        "no equality constraint on the u column: the short-mul last window "
        "is unbound again"
    )
