"""SHA-256 gadget foundation: host primitives vs hashlib/NIST, spread utils,
and the spread-table chip under MockProver (small-k variant of the 2^16 table
for test speed: the chip logic is size-agnostic)."""

import hashlib

import pytest

from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields.spec import BN254_FR
from halo2_tpu.gadgets.sha256 import (
    get_tag,
    sha256_compress,
    sha256_digest,
    spread_u16,
)
from halo2_tpu.gadgets.sha256.primitives import IV, message_schedule, pad_message
from halo2_tpu.gadgets.sha256.spread_table import SpreadTableChip
from halo2_tpu.gadgets.sha256.util import even_bits, odd_bits


def test_sha256_nist_vectors():
    # FIPS 180-4 / NIST CAVS known answers
    assert (
        sha256_digest(b"abc").hex()
        == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    assert (
        sha256_digest(b"").hex()
        == "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    )
    msg = b"abcdbcdecdefdefgefghfghighijhijkijkljklmklmnlmnomnopnopq"
    assert (
        sha256_digest(msg).hex()
        == "248d6a61d20638b8e5c026930c3e6039a33ce45964ff2167f6ecedd419db06c1"
    )


def test_sha256_matches_hashlib_multiblock():
    for msg in [b"x" * 55, b"x" * 56, b"x" * 64, b"x" * 200]:
        assert sha256_digest(msg) == hashlib.sha256(msg).digest()


def test_compress_trace_consistent():
    block = pad_message(b"abc")[0]
    out, rounds, w = sha256_compress(list(IV), block, trace=True)
    assert len(rounds) == 64 and len(w) == 64
    assert out == sha256_compress(list(IV), block)
    assert w[:16] == block == message_schedule(block)[:16]


def test_spread_even_odd():
    for x in [0, 1, 0xFFFF, 0x1234, 0xBEEF]:
        s = spread_u16(x)
        assert even_bits(s, 16) == x
        assert odd_bits(s, 16) == 0
    # spread sums model XOR: even bits of spread(a)+spread(b) = a^b
    a, b = 0x0F0F, 0x3355
    s = spread_u16(a) + spread_u16(b)
    assert even_bits(s, 16) == a ^ b
    assert odd_bits(s, 16) == a & b


def test_get_tag_boundaries():
    assert get_tag(0) == 0
    assert get_tag((1 << 7) - 1) == 0
    assert get_tag(1 << 7) == 1
    assert get_tag((1 << 10) - 1) == 1
    assert get_tag(1 << 13) == 4
    assert get_tag(0xFFFF) == 5


class SmallSpreadCircuit(Circuit):
    """Exercises the spread-table chip with a truncated table (8-bit dense
    values at k=9) — same chip code, test-sized table."""

    TABLE_BITS = 8

    def __init__(self, word):
        self.word = word

    def without_witnesses(self):
        return SmallSpreadCircuit(Value.unknown())

    @classmethod
    def configure(cls, meta):
        tag = meta.advice_column()
        dense = meta.advice_column()
        spread = meta.advice_column()
        return SpreadTableChip.configure(meta, tag, dense, spread)

    def synthesize(self, config, layouter):
        chip = SpreadTableChip(config)

        # truncated load: only [0, 2^TABLE_BITS) rows
        def do(table):
            for d in range(1 << self.TABLE_BITS):
                table.assign_cell(config.table_tag, d, lambda v=d: get_tag(v))
                table.assign_cell(config.table_dense, d, lambda v=d: v)
                table.assign_cell(config.table_spread, d, lambda v=d: spread_u16(v))

        layouter.get_root().assign_table("spread table", do)

        def assign(region):
            chip.assign_word(region, 0, self.word)

        layouter.namespace("word").assign_region("word", assign)


def test_spread_table_chip_mock():
    prover = MockProver.run(BN254_FR, 10, SmallSpreadCircuit(Value.known(0x5A)), [])
    assert prover.verify() == []


def test_spread_table_chip_rejects_bad_word():
    # 9-bit value is absent from the truncated 8-bit table
    prover = MockProver.run(BN254_FR, 10, SmallSpreadCircuit(Value.known(0x1FF)), [])
    assert prover.verify() != []


# ---------------------------------------------------------------------------
# Full Table16-class circuit: message schedule + compression (table16.py)
# ---------------------------------------------------------------------------

from halo2_tpu.circuit import Circuit
from halo2_tpu.gadgets.sha256 import Sha256, Table16Chip, pad_message

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)


class Sha256Circuit(Circuit):
    """Hash the padded blocks; digest half-words exposed as the instance."""

    def __init__(self, blocks):
        self.blocks = blocks  # list of 16-element lists of Value

    def without_witnesses(self):
        return Sha256Circuit(
            [[Value.unknown() for _ in b] for b in self.blocks]
        )

    @classmethod
    def configure(cls, meta):
        config = Table16Chip.configure(meta)
        instance = meta.instance_column()
        meta.enable_equality(instance)
        return config, instance

    def synthesize(self, config, layouter):
        table_config, instance = config
        chip = Table16Chip(table_config)
        Table16Chip.load(table_config, layouter)
        hasher = Sha256(chip, layouter)
        for block in self.blocks:
            hasher.process_block(block)
        for i, word in enumerate(hasher.digest()):
            layouter.constrain_instance(word.lo.dense.cell, instance, 2 * i)
            layouter.constrain_instance(word.hi.dense.cell, instance, 2 * i + 1)


def _digest_instance(msg: bytes):
    import hashlib as _hl

    digest = _hl.sha256(msg).digest()
    words = [int.from_bytes(digest[4 * i : 4 * i + 4], "big") for i in range(8)]
    halves = []
    for w in words:
        halves.append(w & 0xFFFF)
        halves.append(w >> 16)
    return halves


def test_sha256_circuit_nist_abc():
    """NIST vector SHA-256("abc") through the full circuit at k=17
    (table16/compression.rs + message_schedule.rs coverage; the reference
    gadget test is sha256/table16.rs tests + benches/sha256.rs)."""
    msg = b"abc"
    blocks = [[Value.known(w) for w in blk] for blk in pad_message(msg)]
    circuit = Sha256Circuit(blocks)
    prover = MockProver.run(BN254_FR, 17, circuit, [_digest_instance(msg)])
    assert prover.verify() == []


def test_sha256_circuit_wrong_digest_fails():
    msg = b"abc"
    blocks = [[Value.known(w) for w in blk] for blk in pad_message(msg)]
    circuit = Sha256Circuit(blocks)
    bad = _digest_instance(msg)
    bad[0] ^= 1
    prover = MockProver.run(BN254_FR, 17, circuit, [bad])
    assert any(f.kind == "Permutation" for f in prover.verify())
