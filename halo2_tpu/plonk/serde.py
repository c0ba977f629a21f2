"""Key/params serialization: SerdeFormat + vk/pk read/write.

Rebuild of helpers.rs (SerdeFormat, selector bit packing; SURVEY.md §2.11) and
plonk.rs VerifyingKey/ProvingKey read/write (§2.24, plonk.rs:60-157,300-370).

Layout mirrors the reference: vk = k (u32 BE) | num_fixed_commitments (u32 BE)
| fixed commitments | permutation commitments | bit-packed selectors;
pk = vk | l0 | l_last | l_active_row | fixed_values | fixed_polys |
fixed_cosets | permutation polys.  `Processed` writes compressed points and
canonical scalars; `RawBytes`/`RawBytesUnchecked` write uncompressed affine
coordinates (this build's "raw" form — our internal limb representation has no
Montgomery byte layout to dump), skipping validation on Unchecked.
"""

from __future__ import annotations

import io
import struct
from enum import Enum
from typing import List

from ..curves.point import from_affine_ints, to_affine_ints
from ..fields import limb
from ..poly.domain import EvaluationDomain
from ..poly.polynomial import COEFF, EXTENDED, LAGRANGE, Poly
from ..transcript.transcript import point_from_bytes, point_to_bytes
from .circuit import ConstraintSystem
from .keygen import ProvingKey, VerifyingKey, compress_selectors


class SerdeFormat(Enum):
    PROCESSED = 0
    RAW_BYTES = 1
    RAW_BYTES_UNCHECKED = 2


def pack(bits: List[bool]) -> int:
    """Pack up to 8 bools into a byte, LSB-first (helpers.rs pack)."""
    byte = 0
    for i, bit in enumerate(bits):
        byte |= int(bool(bit)) << i
    return byte


def unpack(byte: int, count: int = 8) -> List[bool]:
    return [bool((byte >> i) & 1) for i in range(count)]


def _write_point(w, curve, pt, fmt: SerdeFormat):
    if fmt == SerdeFormat.PROCESSED:
        w.write(point_to_bytes(curve, pt))
    else:
        if pt is None:
            w.write(b"\x00" * 64)
        else:
            w.write(pt[0].to_bytes(32, "little"))
            w.write(pt[1].to_bytes(32, "little"))


def _read_point(r, curve, fmt: SerdeFormat):
    if fmt == SerdeFormat.PROCESSED:
        return point_from_bytes(curve, r.read(32))
    x = int.from_bytes(r.read(32), "little")
    y = int.from_bytes(r.read(32), "little")
    if x == 0 and y == 0:
        return None
    if fmt == SerdeFormat.RAW_BYTES:
        f = curve.base
        if x >= f.p or y >= f.p or (y * y - x * x * x - curve.b) % f.p != 0:
            raise ValueError("invalid raw point encoding")
    return (x, y)


def _write_poly(w, spec, poly: Poly):
    vals = limb.to_ints(spec, poly.values)
    w.write(struct.pack("<I", len(vals)))
    for v in vals:
        w.write(v.to_bytes(32, "little"))


def _read_poly(r, spec, basis) -> Poly:
    (n,) = struct.unpack("<I", r.read(4))
    vals = [int.from_bytes(r.read(32), "little") for v in range(n)]
    return Poly(limb.from_ints(spec, vals), basis)


def _write_poly_slice(w, spec, polys: List[Poly]):
    w.write(struct.pack("<I", len(polys)))
    for poly in polys:
        _write_poly(w, spec, poly)


def _read_poly_slice(r, spec, basis) -> List[Poly]:
    (count,) = struct.unpack("<I", r.read(4))
    return [_read_poly(r, spec, basis) for _ in range(count)]


# ---------------------------------------------------------------------------
# VerifyingKey
# ---------------------------------------------------------------------------


def write_vk(vk: VerifyingKey, w, curve, fmt: SerdeFormat = SerdeFormat.PROCESSED):
    w.write(struct.pack(">I", vk.domain.k))
    w.write(struct.pack(">I", len(vk.fixed_commitments)))
    for commitment in vk.fixed_commitments:
        _write_point(w, curve, commitment, fmt)
    w.write(struct.pack(">I", len(vk.permutation_commitments)))
    for commitment in vk.permutation_commitments:
        _write_point(w, curve, commitment, fmt)
    for selector in vk.selectors:
        bits = list(selector)
        for i in range(0, len(bits), 8):
            w.write(bytes([pack(bits[i : i + 8])]))


def read_vk(r, curve, circuit_cls, spec=None, fmt: SerdeFormat = SerdeFormat.PROCESSED) -> VerifyingKey:
    spec = spec or curve.scalar
    (k,) = struct.unpack(">I", r.read(4))
    cs = ConstraintSystem()
    circuit_cls.configure(cs)
    degree = cs.degree()
    domain = EvaluationDomain(spec, degree, k)

    (num_fixed,) = struct.unpack(">I", r.read(4))
    fixed_commitments = [_read_point(r, curve, fmt) for _ in range(num_fixed)]
    (num_perm,) = struct.unpack(">I", r.read(4))
    perm_commitments = [_read_point(r, curve, fmt) for _ in range(num_perm)]

    n = 1 << k
    selectors = []
    import numpy as np

    for _ in range(cs.num_selectors):
        nbytes = (n + 7) // 8
        data = r.read(nbytes)
        bits = []
        for byte in data:
            bits.extend(unpack(byte))
        selectors.append(np.asarray(bits[:n], dtype=bool))
    compress_selectors(cs, selectors)
    return VerifyingKey(
        domain, cs, fixed_commitments, perm_commitments, selectors, curve=curve
    )


def vk_to_bytes(vk: VerifyingKey, curve, fmt: SerdeFormat = SerdeFormat.PROCESSED) -> bytes:
    buf = io.BytesIO()
    write_vk(vk, buf, curve, fmt)
    return buf.getvalue()


def vk_from_bytes(data: bytes, curve, circuit_cls, spec=None, fmt: SerdeFormat = SerdeFormat.PROCESSED) -> VerifyingKey:
    return read_vk(io.BytesIO(data), curve, circuit_cls, spec, fmt)


# ---------------------------------------------------------------------------
# ProvingKey
# ---------------------------------------------------------------------------


def write_pk(pk: ProvingKey, w, curve, fmt: SerdeFormat = SerdeFormat.PROCESSED):
    spec = pk.vk.domain.spec
    write_vk(pk.vk, w, curve, fmt)
    _write_poly(w, spec, pk.l0)
    _write_poly(w, spec, pk.l_last)
    _write_poly(w, spec, pk.l_active_row)
    _write_poly_slice(w, spec, pk.fixed_values)
    _write_poly_slice(w, spec, pk.fixed_polys)
    _write_poly_slice(w, spec, pk.fixed_cosets)
    _write_poly_slice(w, spec, pk.permutation.permutations)
    _write_poly_slice(w, spec, pk.permutation.polys)
    _write_poly_slice(w, spec, pk.permutation.cosets)


def read_pk(r, curve, circuit_cls, spec=None, fmt: SerdeFormat = SerdeFormat.PROCESSED) -> ProvingKey:
    from .evaluation import Evaluator
    from .permutation import PermutationPK

    vk = read_vk(r, curve, circuit_cls, spec, fmt)
    spec = vk.domain.spec
    l0 = _read_poly(r, spec, EXTENDED)
    l_last = _read_poly(r, spec, EXTENDED)
    l_active_row = _read_poly(r, spec, EXTENDED)
    fixed_values = _read_poly_slice(r, spec, LAGRANGE)
    fixed_polys = _read_poly_slice(r, spec, COEFF)
    fixed_cosets = _read_poly_slice(r, spec, EXTENDED)
    permutations = _read_poly_slice(r, spec, LAGRANGE)
    polys = _read_poly_slice(r, spec, COEFF)
    cosets = _read_poly_slice(r, spec, EXTENDED)
    permutation_pk = PermutationPK(permutations, polys, cosets)
    ev = Evaluator(vk.cs)
    return ProvingKey(
        vk, l0, l_last, l_active_row, fixed_values, fixed_polys, fixed_cosets,
        permutation_pk, ev,
    )


def pk_to_bytes(pk: ProvingKey, curve, fmt: SerdeFormat = SerdeFormat.PROCESSED) -> bytes:
    buf = io.BytesIO()
    write_pk(pk, buf, curve, fmt)
    return buf.getvalue()


def pk_from_bytes(data: bytes, curve, circuit_cls, spec=None, fmt: SerdeFormat = SerdeFormat.PROCESSED) -> ProvingKey:
    return read_pk(io.BytesIO(data), curve, circuit_cls, spec, fmt)
