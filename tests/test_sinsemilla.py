"""Sinsemilla chip + Merkle CRH circuit tests (MockProver vs host primitives)."""

import pytest

from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields.spec import PASTA_FP
from halo2_tpu.gadgets.sinsemilla import primitives as prim
from halo2_tpu.gadgets.sinsemilla.chip import (
    HashDomainGadget,
    SinsemillaChip,
    message_from_bitstring,
)
from halo2_tpu.gadgets.utilities import LookupRangeCheckConfig, i2lebsp

K = prim.K
DOMAIN = prim.HashDomain("MerkleCRH")


class HashCircuit(Circuit):
    """Witness a 2-piece message and hash it; compare against host primitives."""

    def __init__(self, bits, expected):
        self.bits = bits  # list[Value[bool]], length multiple of K
        self.expected = expected  # host affine point or None

    def without_witnesses(self):
        return HashCircuit([Value.unknown()] * len(self.bits), self.expected)

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(7)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        fixed_y_q = meta.fixed_column()
        table_idx = meta.lookup_table_column()
        table_x = meta.lookup_table_column()
        table_y = meta.lookup_table_column()
        range_check = LookupRangeCheckConfig.configure(
            meta, advices[6], table_idx, K, PASTA_FP
        )
        return SinsemillaChip.configure(
            meta,
            advices[:5],
            advices[5],
            fixed_y_q,
            (table_idx, table_x, table_y),
            range_check,
        )

    def synthesize(self, config, layouter):
        SinsemillaChip.load(config, layouter)
        chip = SinsemillaChip(config)
        domain = HashDomainGadget(chip, DOMAIN.Q)
        pieces = message_from_bitstring(chip, layouter, self.bits)
        (x, y), zs = domain.hash_to_point(layouter, pieces)
        if not x.value.is_none() and self.expected is not None:
            got = (x.value.value(), y.value.value())
            assert got == self.expected, (got, self.expected)
        # running sums: first z of each piece is the piece itself
        assert len(zs) == len(pieces)


def _hash_run(nbits: int, seed: int):
    val = pow(seed, 5, 1 << nbits)
    bits = i2lebsp(val, nbits)
    expected = DOMAIN.hash_to_point(bits)
    circ = HashCircuit([Value.known(b) for b in bits], expected)
    return MockProver.run(PASTA_FP, 11, circ, []).verify()


def test_hash_short_message():
    assert _hash_run(2 * K, 3) == []


def test_hash_multi_piece():
    # 300 bits = 30 words: one 25-word piece + one 5-word piece
    assert _hash_run(30 * K, 7) == []


def test_hash_matches_primitives_many():
    # host-only spot checks across message lengths (no prover)
    for nbits, seed in [(K, 1), (3 * K, 2), (7 * K, 5)]:
        val = pow(seed, 3, 1 << nbits)
        bits = i2lebsp(val, nbits)
        pt = DOMAIN.hash_to_point(bits)
        assert pt is not None
        p = PASTA_FP.p
        assert (pt[1] ** 2 - pt[0] ** 3 - 5) % p == 0


# ---------------------------------------------------------------------------
# Merkle CRH path gadget (merkle.rs tests analog)
# ---------------------------------------------------------------------------

from halo2_tpu.gadgets.sinsemilla.merkle import (
    MERKLE_CRH_PERSONALIZATION,
    MerkleChip,
    MerklePath,
)
from halo2_tpu.gadgets.utilities import load_private

MERKLE_DOMAIN = prim.HashDomain(MERKLE_CRH_PERSONALIZATION)


def host_merkle_root(leaf: int, pos: int, path: list) -> int:
    node = leaf
    for l, sibling in enumerate(path):
        bit = (pos >> l) & 1
        left, right = (sibling, node) if bit else (node, sibling)
        msg = prim.i2lebsp(l, 10) + prim.i2lebsp(left, 255) + prim.i2lebsp(right, 255)
        node = MERKLE_DOMAIN.hash(msg)
    return node


class MerkleCircuit(Circuit):
    def __init__(self, leaf, leaf_pos, path, depth, expected_root):
        self.leaf, self.leaf_pos, self.path = leaf, leaf_pos, path
        self.depth, self.expected_root = depth, expected_root

    def without_witnesses(self):
        return MerkleCircuit(
            Value.unknown(), Value.unknown(), Value.unknown(), self.depth, None
        )

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(7)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        fixed_y_q = meta.fixed_column()
        table_idx = meta.lookup_table_column()
        table_x = meta.lookup_table_column()
        table_y = meta.lookup_table_column()
        range_check = LookupRangeCheckConfig.configure(
            meta, advices[6], table_idx, K, PASTA_FP
        )
        sin_config = SinsemillaChip.configure(
            meta, advices[:5], advices[5], fixed_y_q,
            (table_idx, table_x, table_y), range_check,
        )
        return MerkleChip.configure(meta, sin_config)

    def synthesize(self, config, layouter):
        SinsemillaChip.load(config.sinsemilla_config, layouter)
        chip = MerkleChip(config)
        leaf = load_private(
            layouter, config.advices[0], self.leaf
        )
        path_gadget = MerklePath(
            [chip], MERKLE_DOMAIN.Q, self.leaf_pos, self.path, self.depth
        )
        root = chip_root = path_gadget.calculate_root(layouter, leaf)
        if not root.value.is_none() and self.expected_root is not None:
            from halo2_tpu.gadgets.sinsemilla.chip import _ev

            got = root.value.map(_ev).value()
            assert got == self.expected_root, (got, self.expected_root)


def test_merkle_path_depth4():
    depth = 4
    leaf = 0x2F0F40C2F152A01C9CAF66298493D5D0944A041C2E65BA0117C24F76BF8E6483 % PASTA_FP.p
    pos = 0b1011
    path = [(7 * i + 3) * 10**70 % PASTA_FP.p for i in range(depth)]
    expected = host_merkle_root(leaf, pos, path)
    circ = MerkleCircuit(
        Value.known(leaf), Value.known(pos), Value.known(path), depth, expected
    )
    assert MockProver.run(PASTA_FP, 11, circ, []).verify() == []


def test_merkle_path_depth32():
    """Reference-scale path (merkle.rs tests use MERKLE_DEPTH = 32)."""
    import random

    rng = random.Random(42)
    depth = 32
    leaf = rng.randrange(PASTA_FP.p)
    pos = rng.randrange(1 << depth)
    path = [rng.randrange(PASTA_FP.p) for _ in range(depth)]
    expected = host_merkle_root(leaf, pos, path)
    circ = MerkleCircuit(
        Value.known(leaf), Value.known(pos), Value.known(path), depth, expected
    )
    assert MockProver.run(PASTA_FP, 12, circ, []).verify() == []


# ---------------------------------------------------------------------------
# CommitDomain in-circuit (sinsemilla.rs:612-755 + the reference's gadget
# test, which drives commit through the ECC fixed-base machinery)
# ---------------------------------------------------------------------------

from halo2_tpu.curves import PALLAS, host
from halo2_tpu.gadgets.ecc import EccChip
from halo2_tpu.gadgets.ecc.mul_fixed import MulFixedChip
from halo2_tpu.gadgets.sinsemilla.chip import CommitDomainGadget

COMMIT_DOMAIN = prim.CommitDomain("z.cash:test-commit")


class CommitCircuit(Circuit):
    def __init__(self, bits, r, expected):
        self.bits, self.r, self.expected = bits, r, expected

    def without_witnesses(self):
        return CommitCircuit(
            [Value.unknown()] * len(self.bits), Value.unknown(), self.expected
        )

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(12)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        fixed_y_q = meta.fixed_column()
        table_idx = meta.lookup_table_column()
        table_x = meta.lookup_table_column()
        table_y = meta.lookup_table_column()
        range_check = LookupRangeCheckConfig.configure(
            meta, advices[8], table_idx, K, PASTA_FP
        )
        sin_config = SinsemillaChip.configure(
            meta, advices[:5], advices[9], fixed_y_q,
            (table_idx, table_x, table_y), range_check,
        )
        ecc_config = EccChip.configure(meta, advices[:9])
        mf_config = MulFixedChip.configure(meta, ecc_config, advices[10], advices[11])
        return sin_config, mf_config

    def synthesize(self, config, layouter):
        sin_config, mf_config = config
        SinsemillaChip.load(sin_config, layouter)
        sin_chip = SinsemillaChip(sin_config)
        mf_chip = MulFixedChip(mf_config)
        domain = CommitDomainGadget(
            sin_chip, mf_chip, COMMIT_DOMAIN.M.Q, COMMIT_DOMAIN.R
        )
        pieces = message_from_bitstring(sin_chip, layouter, self.bits)
        point, zs = domain.commit(layouter, pieces, self.r)
        if not point.x.value.is_none() and self.expected is not None:
            got = point.value().value()
            assert got == self.expected, (got, self.expected)


@pytest.mark.slow
def test_commit_domain_circuit():
    nbits = 2 * K
    val = 0b1011001110_0100110101
    bits = i2lebsp(val, nbits)
    r = 0x2C45DEADBEEF1234567890
    expected = COMMIT_DOMAIN.commit(bits, r)
    circ = CommitCircuit([Value.known(b) for b in bits], Value.known(r), expected)
    assert MockProver.run(PASTA_FP, 11, circ, []).verify() == []
