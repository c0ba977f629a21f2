"""Dev tooling: CircuitCost, CircuitGates, V1 floor planner, key serde."""

import sys

import pytest

from halo2_tpu.circuit import V1FloorPlanner, Value
from halo2_tpu.dev.cost import CircuitCost
from halo2_tpu.dev.gates import CircuitGates
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields.spec import BN254_FR

sys.path.insert(0, "tests")
from circuits import SimpleCircuit  # noqa: E402


class V1Simple(SimpleCircuit):
    floor_planner = V1FloorPlanner

    def without_witnesses(self):
        return V1Simple(self.constant, Value.unknown())


P = BN254_FR.p


def _instance():
    return 7 * pow(5, 4, P) % P


def test_v1_floor_planner_mock():
    circ = V1Simple(7, Value.known(5))
    prover = MockProver.run(BN254_FR, 4, circ, [[_instance()]])
    assert prover.verify() == []


def test_v1_floor_planner_detects_bad_witness():
    circ = V1Simple(7, Value.known(6))  # wrong private input
    prover = MockProver.run(BN254_FR, 4, circ, [[_instance()]])
    assert prover.verify() != []


def test_circuit_cost():
    cost = CircuitCost.measure(4, V1Simple(7, Value.known(5)))
    assert cost.advice_columns == 2
    assert cost.permutation_cols == 4
    assert cost.max_deg == 3
    size = cost.proof_size(1).total()
    assert size > 0
    # two instances cost more than one
    assert cost.proof_size(2).total() > size
    marginal = cost.marginal_proof_size().total()
    assert cost.proof_size(2).total() - cost.proof_size(1).total() == marginal


def test_circuit_gates_dump():
    gates = CircuitGates.collect(V1Simple)
    text = str(gates)
    assert "mul" in text
    assert "selector[0]" in text


def test_selector_compression_packs_disjoint():
    """Two disjoint simple selectors pack into one fixed column."""
    from halo2_tpu.plonk.circuit import ConstraintSystem
    from halo2_tpu.plonk.keygen import compress_selectors
    import numpy as np

    cs = ConstraintSystem()
    a = cs.advice_column()
    s1 = cs.selector()
    s2 = cs.selector()

    def gate1(cells):
        s = cells.query_selector(s1)
        x = cells.query_advice(a, __import__("halo2_tpu.poly.polynomial", fromlist=["Rotation"]).Rotation.cur())
        return [("g1", s * x)]

    def gate2(cells):
        from halo2_tpu.poly.polynomial import Rotation

        s = cells.query_selector(s2)
        x = cells.query_advice(a, Rotation.cur())
        return [("g2", s * x)]

    cs.create_gate("g1", gate1)
    cs.create_gate("g2", gate2)
    n = 16
    sel1 = np.zeros(n, dtype=bool)
    sel2 = np.zeros(n, dtype=bool)
    sel1[0] = True
    sel2[1] = True  # disjoint rows
    before = cs.num_fixed_columns
    values = compress_selectors(cs, [sel1, sel2])
    # both packed into ONE new fixed column with roots 1 and 2
    assert cs.num_fixed_columns == before + 1
    assert len(values) == 1
    assert values[0][0] == 1 and values[0][1] == 2


def test_circuit_dot_graph_and_layout():
    """dev-graph analogs (dev/graph.rs + graph/layout.rs): DOT call tree and
    SVG layout render for a small circuit."""
    from circuits import SimpleCircuit

    from halo2_tpu.circuit import Value
    from halo2_tpu.dev.graph import CircuitLayout, circuit_dot_graph
    from halo2_tpu.fields import BN254_FR

    circuit = SimpleCircuit(7, Value.known(5))
    dot = circuit_dot_graph(BN254_FR, circuit)
    assert dot.startswith("digraph {") and dot.rstrip().endswith("}")
    assert "region" in dot and "->" in dot

    svg = CircuitLayout().render(BN254_FR, 4, circuit, [[7 * 5**4 % BN254_FR.p]])
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert "rect" in svg and ("load private" in svg or "<text" in svg)
