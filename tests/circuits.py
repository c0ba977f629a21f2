"""Shared test circuits (Python renditions of the reference examples)."""

from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.poly import Rotation


class StandardPlonkCircuit(Circuit):
    """tests/plonk_api.rs:23-400 MyCircuit: standard plonk + lookup.

    Columns (creation order mirrors the reference configure): advice e, a, b;
    fixed sf; advice c, d; instance p; fixed sm, sa, sb, sc, sp; lookup table
    sl.  Gates: "Combined add-mult" a*sa + b*sb + a*b*sm - c*sc + sf*(d_next *
    e_prev) and "Public input" sp*(a - p); one lookup a ∈ sl.
    """

    def __init__(self, a, lookup_table):
        self.a = a  # Value (canonical int)
        self.lookup_table = list(lookup_table)

    def without_witnesses(self):
        return StandardPlonkCircuit(Value.unknown(), self.lookup_table)

    @classmethod
    def configure(cls, meta):
        e = meta.advice_column()
        a = meta.advice_column()
        b = meta.advice_column()
        sf = meta.fixed_column()
        c = meta.advice_column()
        d = meta.advice_column()
        p = meta.instance_column()

        meta.enable_equality(a)
        meta.enable_equality(b)
        meta.enable_equality(c)

        sm = meta.fixed_column()
        sa = meta.fixed_column()
        sb = meta.fixed_column()
        sc = meta.fixed_column()
        sp = meta.fixed_column()
        sl = meta.lookup_table_column()

        meta.lookup("lookup", lambda cells: [(cells.query_any(a, Rotation.cur()), sl)])

        def combined_gate(cells):
            d_q = cells.query_advice(d, Rotation.next())
            a_q = cells.query_advice(a, Rotation.cur())
            sf_q = cells.query_fixed(sf, Rotation.cur())
            e_q = cells.query_advice(e, Rotation.prev())
            b_q = cells.query_advice(b, Rotation.cur())
            c_q = cells.query_advice(c, Rotation.cur())
            sa_q = cells.query_fixed(sa, Rotation.cur())
            sb_q = cells.query_fixed(sb, Rotation.cur())
            sc_q = cells.query_fixed(sc, Rotation.cur())
            sm_q = cells.query_fixed(sm, Rotation.cur())
            return [
                a_q * sa_q + b_q * sb_q + a_q * b_q * sm_q
                - (c_q * sc_q) + sf_q * (d_q * e_q)
            ]

        meta.create_gate("Combined add-mult", combined_gate)

        def public_gate(cells):
            a_q = cells.query_advice(a, Rotation.cur())
            p_q = cells.query_instance(p, Rotation.cur())
            sp_q = cells.query_fixed(sp, Rotation.cur())
            return [sp_q * (a_q - p_q)]

        meta.create_gate("Public input", public_gate)

        for col in (sf, e, d, p, sm, sa, sb, sc, sp):
            meta.enable_equality(col)

        return {
            "a": a, "b": b, "c": c, "d": d, "e": e,
            "sa": sa, "sb": sb, "sc": sc, "sm": sm, "sp": sp, "sf": sf,
            "sl": sl,
        }

    def synthesize(self, config, layouter):
        def raw_gate(name, sa_v, sb_v, sc_v, sm_v, vals):
            """vals: Value of (lhs, rhs, out) canonical ints."""

            def do(region):
                lhs = region.assign_advice(config["a"], 0, lambda: vals.map(lambda t: t[0]))
                region.assign_advice(
                    config["d"], 0, lambda: vals.map(lambda t: t[0]).square().square()
                )
                rhs = region.assign_advice(config["b"], 0, lambda: vals.map(lambda t: t[1]))
                region.assign_advice(
                    config["e"], 0, lambda: vals.map(lambda t: t[1]).square().square()
                )
                out = region.assign_advice(config["c"], 0, lambda: vals.map(lambda t: t[2]))
                region.assign_fixed(config["sa"], 0, sa_v)
                region.assign_fixed(config["sb"], 0, sb_v)
                region.assign_fixed(config["sc"], 0, sc_v)
                region.assign_fixed(config["sm"], 0, sm_v)
                return lhs.cell, rhs.cell, out.cell

            return layouter.assign_region(name, do)

        def copy(left, right):
            def do(region):
                region.constrain_equal(left, right)
                region.constrain_equal(left, right)

            layouter.assign_region("copy", do)

        def public_input(value):
            def do(region):
                cell = region.assign_advice(config["a"], 0, lambda: value)
                region.assign_fixed(config["sp"], 0, 1)
                return cell.cell

            return layouter.assign_region("public_input", do)

        public_input(Value.known(2))

        a = self.a
        a_sq = a.square()
        for _ in range(10):
            a0, _, c0 = raw_gate(
                "raw_multiply", 0, 0, 1, 1, a.zip(a_sq).map(lambda t: (t[0], t[0], t[1]))
            )
            fin = a_sq + a
            a1, b1, _ = raw_gate(
                "raw_add", 1, 1, 1, 0,
                a.zip(a_sq).zip(fin).map(lambda t: (t[0][0], t[0][1], t[1])),
            )
            copy(a0, a1)
            copy(b1, c0)

        def table(tbl):
            for index, value in enumerate(self.lookup_table):
                tbl.assign_cell(config["sl"], index, value)

        layouter.assign_table("lookup_table", table)


class BenchPlonkCircuit(Circuit):
    """benches/plonk.rs MyCircuit: domain-filling standard plonk.

    (2^(k-1) - 3) iterations of {raw_multiply, raw_add, 2 copies} over 3
    advice + 4 fixed columns with a/b/c in the permutation — fills the whole
    2^k domain like the reference criterion workload (plonk.rs:240-262), so
    prove wall-time at k is an honest full-size measurement.  No lookup or
    instance columns (the reference bench has none).
    """

    def __init__(self, k: int, a):
        self.k = k
        self.a = a  # Value (canonical int)

    def without_witnesses(self):
        return BenchPlonkCircuit(self.k, Value.unknown())

    @classmethod
    def configure(cls, meta):
        a = meta.advice_column()
        b = meta.advice_column()
        c = meta.advice_column()
        meta.enable_equality(a)
        meta.enable_equality(b)
        meta.enable_equality(c)
        sa = meta.fixed_column()
        sb = meta.fixed_column()
        sc = meta.fixed_column()
        sm = meta.fixed_column()

        def gate(cells):
            a_q = cells.query_advice(a, Rotation.cur())
            b_q = cells.query_advice(b, Rotation.cur())
            c_q = cells.query_advice(c, Rotation.cur())
            sa_q = cells.query_fixed(sa, Rotation.cur())
            sb_q = cells.query_fixed(sb, Rotation.cur())
            sc_q = cells.query_fixed(sc, Rotation.cur())
            sm_q = cells.query_fixed(sm, Rotation.cur())
            return [a_q * sa_q + b_q * sb_q + a_q * b_q * sm_q - (c_q * sc_q)]

        meta.create_gate("Combined add-mult", gate)
        return {"a": a, "b": b, "c": c, "sa": sa, "sb": sb, "sc": sc, "sm": sm}

    def synthesize(self, config, layouter):
        def raw(name, sa_v, sb_v, sm_v, vals):
            def do(region):
                lhs = region.assign_advice(config["a"], 0, lambda: vals.map(lambda t: t[0]))
                rhs = region.assign_advice(config["b"], 0, lambda: vals.map(lambda t: t[1]))
                out = region.assign_advice(config["c"], 0, lambda: vals.map(lambda t: t[2]))
                region.assign_fixed(config["sa"], 0, sa_v)
                region.assign_fixed(config["sb"], 0, sb_v)
                region.assign_fixed(config["sc"], 0, 1)
                region.assign_fixed(config["sm"], 0, sm_v)
                return lhs.cell, rhs.cell, out.cell

            return layouter.assign_region(name, do)

        def copy(left, right):
            layouter.assign_region(
                "copy", lambda region: region.constrain_equal(left, right)
            )

        a = self.a
        a_sq = a.square()
        fin = a_sq + a
        mul_vals = a.zip(a_sq).map(lambda t: (t[0], t[0], t[1]))
        add_vals = a.zip(a_sq).zip(fin).map(lambda t: (t[0][0], t[0][1], t[1]))
        for _ in range((1 << (self.k - 1)) - 3):
            a0, _, c0 = raw("raw_multiply", 0, 0, 1, mul_vals)
            a1, b1, _ = raw("raw_add", 1, 1, 0, add_vals)
            copy(a0, a1)
            copy(b1, c0)


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
