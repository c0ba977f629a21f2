"""serialization.rs analog: write/read pk+vk to disk and reuse them.

Run: PYTHONPATH=. python examples/serialization.py
"""

import io
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from halo2_tpu.circuit import Value
from halo2_tpu.curves import BN254_G1
from halo2_tpu.plonk import keygen_pk, keygen_vk
from halo2_tpu.plonk.serde import SerdeFormat, pk_from_bytes, pk_to_bytes
from halo2_tpu.poly.kzg import ParamsKZG

from circuits import SimpleCircuit


def main(k: int = 4):
    params = ParamsKZG.setup(k)
    circuit = SimpleCircuit(7, Value.unknown())
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)

    data = pk_to_bytes(pk, BN254_G1, SerdeFormat.PROCESSED)
    print(f"pk: {len(data)} bytes")
    pk2 = pk_from_bytes(data, BN254_G1, SimpleCircuit)
    assert pk2.vk.fixed_commitments == pk.vk.fixed_commitments
    assert pk2.vk.permutation_commitments == pk.vk.permutation_commitments
    print("pk roundtrip OK")


if __name__ == "__main__":
    main()
