"""Utilities gadget tests (halo2_gadgets utilities/* test analogs)."""

import pytest

from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields.spec import PASTA_FP
from halo2_tpu.gadgets.utilities import (
    CondSwapChip,
    LookupRangeCheckConfig,
    RunningSumConfig,
    bitrange_subset,
    decompose_word,
    load_private,
)

P = PASTA_FP.p


def test_decompose_word_roundtrip():
    word = 0b1011_0110_0101
    windows = decompose_word(word, 12, 3)
    assert len(windows) == 4
    acc = sum(w << (3 * i) for i, w in enumerate(windows))
    assert acc == word


def test_bitrange_subset():
    v = 0b1111_0000_1010
    assert bitrange_subset(v, 0, 4) == 0b1010
    assert bitrange_subset(v, 4, 8) == 0b0000
    assert bitrange_subset(v, 8, 12) == 0b1111


class CondSwapCircuit(Circuit):
    def __init__(self, a, b, swap):
        self.a, self.b, self.swap = a, b, swap

    def without_witnesses(self):
        return CondSwapCircuit(Value.unknown(), Value.unknown(), Value.unknown())

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(5)]
        return CondSwapChip.configure(meta, advices)

    def synthesize(self, config, layouter):
        chip = CondSwapChip(config)
        a = load_private(layouter, config.a, self.a)
        a_sw, b_sw = chip.swap(layouter, (a, self.b), self.swap)
        # check witnessed swap output host-side
        if not a_sw.value.is_none():
            av, bv, sw = self.a.value(), self.b.value(), self.swap.value()
            assert a_sw.value.value() == (bv if sw else av)
            assert b_sw.value.value() == (av if sw else bv)


@pytest.mark.parametrize("swap", [False, True])
def test_cond_swap(swap):
    circ = CondSwapCircuit(Value.known(11), Value.known(22), Value.known(swap))
    prover = MockProver.run(PASTA_FP, 5, circ, [])
    assert prover.verify() == []


class RunningSumCircuit(Circuit):
    WINDOW = 3
    WORD_BITS = 9
    NUM_WINDOWS = 3

    def __init__(self, alpha, strict=True):
        self.alpha = alpha
        self.strict = strict

    def without_witnesses(self):
        return RunningSumCircuit(Value.unknown(), self.strict)

    @classmethod
    def configure(cls, meta):
        z = meta.advice_column()
        q = meta.selector()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return RunningSumConfig.configure(meta, q, z, cls.WINDOW, PASTA_FP)

    def synthesize(self, config, layouter):
        def do(region):
            config.witness_decompose(
                region, 0, self.alpha, self.strict, self.WORD_BITS, self.NUM_WINDOWS
            )

        layouter.namespace("decompose").assign_region("decompose", do)


def test_running_sum_in_range():
    circ = RunningSumCircuit(Value.known(0b101_110_011))
    prover = MockProver.run(PASTA_FP, 5, circ, [])
    assert prover.verify() == []


def test_running_sum_out_of_range():
    # 10-bit value cannot decompose into 3 windows of 3 bits strictly
    circ = RunningSumCircuit(Value.known(1 << 9))
    prover = MockProver.run(PASTA_FP, 5, circ, [])
    assert prover.verify() != []


class LookupRangeCircuit(Circuit):
    K = 4
    NUM_WORDS = 2

    def __init__(self, value, strict=True):
        self.value = value
        self.strict = strict

    def without_witnesses(self):
        return LookupRangeCircuit(Value.unknown(), self.strict)

    @classmethod
    def configure(cls, meta):
        running_sum = meta.advice_column()
        table_idx = meta.lookup_table_column()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return LookupRangeCheckConfig.configure(
            meta, running_sum, table_idx, cls.K, PASTA_FP
        )

    def synthesize(self, config, layouter):
        config.load(layouter)
        config.witness_check(layouter, self.value, self.NUM_WORDS, self.strict)


def test_lookup_range_check_in_range():
    circ = LookupRangeCircuit(Value.known(0xAB))  # 8 bits = 2 words of 4
    prover = MockProver.run(PASTA_FP, 7, circ, [])
    assert prover.verify() == []


def test_lookup_range_check_out_of_range():
    circ = LookupRangeCircuit(Value.known(0x1AB))  # 9 bits
    prover = MockProver.run(PASTA_FP, 7, circ, [])
    assert prover.verify() != []
