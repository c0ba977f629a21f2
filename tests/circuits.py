"""Shared test circuits (Python renditions of the reference examples)."""

from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.poly import Rotation


class SimpleCircuit(Circuit):
    """simple-example.rs: out = constant * a^4 via three mul regions.

    Exercises: custom gate with selector, equality (permutation), constants,
    instance exposure.
    """

    def __init__(self, constant: int, a):
        self.constant = constant
        self.a = a  # Value

    def without_witnesses(self):
        return SimpleCircuit(self.constant, Value.unknown())

    @classmethod
    def configure(cls, meta):
        advice = [meta.advice_column(), meta.advice_column()]
        instance = meta.instance_column()
        constant = meta.fixed_column()
        meta.enable_equality(instance)
        meta.enable_constant(constant)
        for column in advice:
            meta.enable_equality(column)
        s_mul = meta.selector()

        def gate(cells):
            lhs = cells.query_advice(advice[0], Rotation.cur())
            rhs = cells.query_advice(advice[1], Rotation.cur())
            out = cells.query_advice(advice[0], Rotation.next())
            s = cells.query_selector(s_mul)
            return [("mul", s * (lhs * rhs - out))]

        meta.create_gate("mul", gate)
        return {
            "advice": advice,
            "instance": instance,
            "constant": constant,
            "s_mul": s_mul,
        }

    def synthesize(self, config, layouter):
        advice = config["advice"]

        def load_private(value):
            def do(region):
                return region.assign_advice(advice[0], 0, lambda: value)

            return layouter.namespace("load private").assign_region("load private", do)

        def load_constant(c):
            def do(region):
                return region.assign_advice_from_constant(advice[0], 0, c)

            return layouter.namespace("load constant").assign_region("load constant", do)

        def mul(a_cell, b_cell):
            def do(region):
                config["s_mul"].enable(region, 0)
                a_cell.copy_advice(region, advice[0], 0)
                b_cell.copy_advice(region, advice[1], 0)
                value = a_cell.value * b_cell.value
                return region.assign_advice(advice[0], 1, lambda: value)

            return layouter.namespace("mul").assign_region("mul", do)

        a = load_private(self.a)
        c = load_constant(self.constant)
        ab = mul(a, a)
        absq = mul(ab, ab)
        out = mul(c, absq)
        layouter.namespace("expose").constrain_instance(out.cell, config["instance"], 0)
