"""RawBytes / RawBytesUnchecked serde: halo2curves Montgomery limb layout.

Closes PARITY divergence #2 (VERDICT r4 next-round #7): raw formats now write
field elements as 4x64-bit little-endian limbs of the MONTGOMERY form and
points as uncompressed affine coordinates in that form, matching the
reference's SerdeObject layout (helpers.rs:8-20), with modulus/on-curve
checks on `RawBytes` and none on `Unchecked`.
"""

import io
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from circuits import SimpleCircuit

from halo2_tpu.circuit import Value
from halo2_tpu.curves.spec import BN254_G1
from halo2_tpu.plonk import keygen_pk, keygen_vk
from halo2_tpu.plonk.serde import (
    SerdeFormat,
    _read_point,
    _write_point,
    pk_from_bytes,
    pk_to_bytes,
    vk_from_bytes,
    vk_to_bytes,
)
from halo2_tpu.poly.kzg import ParamsKZG

SPEC = BN254_G1.scalar
FQ = BN254_G1.base


def test_raw_point_montgomery_layout():
    """The raw encoding of a point is its coordinates times R mod p, LE."""
    g = (BN254_G1.gx, BN254_G1.gy)
    buf = io.BytesIO()
    _write_point(buf, BN254_G1, g, SerdeFormat.RAW_BYTES)
    raw = buf.getvalue()
    assert len(raw) == 64
    assert int.from_bytes(raw[:32], "little") == BN254_G1.gx * FQ.r % FQ.p
    assert int.from_bytes(raw[32:], "little") == BN254_G1.gy * FQ.r % FQ.p
    assert _read_point(io.BytesIO(raw), BN254_G1, SerdeFormat.RAW_BYTES) == g
    assert _read_point(io.BytesIO(raw), BN254_G1, SerdeFormat.RAW_BYTES_UNCHECKED) == g


def test_raw_point_rejects_off_curve_and_overflow():
    g = (BN254_G1.gx, BN254_G1.gy)
    buf = io.BytesIO()
    _write_point(buf, BN254_G1, g, SerdeFormat.RAW_BYTES)
    raw = bytearray(buf.getvalue())
    raw[0] ^= 1  # perturb x -> off curve
    with pytest.raises(ValueError):
        _read_point(io.BytesIO(bytes(raw)), BN254_G1, SerdeFormat.RAW_BYTES)
    # Unchecked accepts the same bytes without complaint
    _read_point(io.BytesIO(bytes(raw)), BN254_G1, SerdeFormat.RAW_BYTES_UNCHECKED)
    over = (FQ.p).to_bytes(32, "little") + raw[32:]
    with pytest.raises(ValueError):
        _read_point(io.BytesIO(over), BN254_G1, SerdeFormat.RAW_BYTES)


@pytest.fixture(scope="module")
def keys():
    k = 4
    circuit = SimpleCircuit(7, Value.unknown())
    params = ParamsKZG.setup_host(k, seed=b"serde-raw-test")
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    return params, vk, pk


@pytest.mark.parametrize(
    "fmt", [SerdeFormat.RAW_BYTES, SerdeFormat.RAW_BYTES_UNCHECKED]
)
def test_vk_pk_raw_roundtrip(keys, fmt):
    params, vk, pk = keys
    data = vk_to_bytes(vk, BN254_G1, fmt)
    vk2 = vk_from_bytes(data, BN254_G1, SimpleCircuit, SPEC, fmt)
    assert vk2.fixed_commitments == vk.fixed_commitments
    assert vk2.permutation_commitments == vk.permutation_commitments
    # the recomputed transcript_repr (the consensus anchor) must match
    assert vk2._compute_repr() == vk._compute_repr()

    pdata = pk_to_bytes(pk, BN254_G1, fmt)
    pk2 = pk_from_bytes(pdata, BN254_G1, SimpleCircuit, SPEC, fmt)
    assert pk_to_bytes(pk2, BN254_G1, fmt) == pdata


def test_raw_and_processed_differ_but_agree(keys):
    params, vk, pk = keys
    raw = vk_to_bytes(vk, BN254_G1, SerdeFormat.RAW_BYTES)
    processed = vk_to_bytes(vk, BN254_G1, SerdeFormat.PROCESSED)
    assert raw != processed  # different layouts
    vk_raw = vk_from_bytes(raw, BN254_G1, SimpleCircuit, SPEC, SerdeFormat.RAW_BYTES)
    vk_pro = vk_from_bytes(processed, BN254_G1, SimpleCircuit, SPEC)
    assert vk_raw.fixed_commitments == vk_pro.fixed_commitments


def test_params_raw_roundtrip(tmp_path, keys):
    params, _, _ = keys
    path = str(tmp_path / "params_raw.bin")
    params.write(path, SerdeFormat.RAW_BYTES)
    loaded = ParamsKZG.read(path, SerdeFormat.RAW_BYTES)
    from halo2_tpu.curves.point import to_affine_ints

    assert to_affine_ints(BN254_G1, loaded.g) == to_affine_ints(BN254_G1, params.g)
    assert to_affine_ints(BN254_G1, loaded.g_lagrange) == to_affine_ints(
        BN254_G1, params.g_lagrange
    )
    assert loaded.g2 == params.g2 and loaded.s_g2 == params.s_g2
