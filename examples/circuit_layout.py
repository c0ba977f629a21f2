"""Render a circuit's region layout to SVG — circuit-layout.rs analog.

The reference renders the plonk_api MyCircuit's layout with plotters
(`halo2_proofs/examples/circuit-layout.rs`); here the dependency-free SVG
renderer in halo2_tpu.dev.graph draws the same standard-plonk + lookup
circuit at k=5 and also dumps the DOT call tree.

Run: python examples/circuit_layout.py   ->  layout.svg, circuit.dot
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

from circuits import StandardPlonkCircuit

from halo2_tpu.circuit import Value
from halo2_tpu.curves.spec import BN254_G1
from halo2_tpu.dev.graph import CircuitLayout, circuit_dot_graph


def main():
    spec = BN254_G1.scalar
    a = 2834758237 * spec.zeta % spec.p
    instance = 2
    circuit = StandardPlonkCircuit(Value.unknown(), [instance, a, a, 0])

    svg = CircuitLayout().render(spec, 5, circuit, [[instance]])
    with open("layout.svg", "w") as f:
        f.write(svg)
    print(f"layout.svg: {len(svg)} bytes")

    dot = circuit_dot_graph(spec, circuit)
    with open("circuit.dot", "w") as f:
        f.write(dot)
    print(f"circuit.dot: {len(dot)} bytes")


if __name__ == "__main__":
    main()
