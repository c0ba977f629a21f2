"""Key/params serialization: SerdeFormat + vk/pk read/write.

Rebuild of helpers.rs (SerdeFormat, selector bit packing; SURVEY.md §2.11) and
plonk.rs VerifyingKey/ProvingKey read/write (§2.24, plonk.rs:60-157,300-370).

Layout mirrors the reference: vk = k (u32 BE) | num_fixed_commitments (u32 BE)
| fixed commitments | permutation commitments | bit-packed selectors;
pk = vk | l0 | l_last | l_active_row | fixed_values | fixed_polys |
fixed_cosets | permutation polys.  `Processed` writes compressed points and
canonical (standard-form) scalars; `RawBytes`/`RawBytesUnchecked` write
uncompressed affine points and field elements in the 4x64-bit-limb
little-endian **Montgomery** representation — the halo2curves `SerdeObject`
raw layout (helpers.rs:8-20, SerdeCurveAffine/SerdePrimeField) — so
raw-serialized keys interop with reference-side tooling.  `RawBytes` checks
element < modulus and point-on-curve on read; `Unchecked` skips both.
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


def _to_mont(field, v: int) -> int:
    return v * field.r % field.p


def _from_mont(field, v: int) -> int:
    return v * pow(field.r, -1, field.p) % field.p


def _write_point(w, curve, pt, fmt: SerdeFormat):
    if fmt == SerdeFormat.PROCESSED:
        w.write(point_to_bytes(curve, pt))
    else:
        # halo2curves write_raw: uncompressed affine, coordinates as 4x64-bit
        # LE limbs of the Montgomery form; identity = (0, 0)
        if pt is None:
            w.write(b"\x00" * 64)
        else:
            f = curve.base
            w.write(_to_mont(f, pt[0]).to_bytes(32, "little"))
            w.write(_to_mont(f, pt[1]).to_bytes(32, "little"))


def _read_point(r, curve, fmt: SerdeFormat):
    if fmt == SerdeFormat.PROCESSED:
        return point_from_bytes(curve, r.read(32))
    xm = int.from_bytes(r.read(32), "little")
    ym = int.from_bytes(r.read(32), "little")
    if xm == 0 and ym == 0:
        return None
    f = curve.base
    if fmt == SerdeFormat.RAW_BYTES and (xm >= f.p or ym >= f.p):
        raise ValueError("raw field element exceeds the modulus")
    x = _from_mont(f, xm)
    y = _from_mont(f, ym)
    if fmt == SerdeFormat.RAW_BYTES and (y * y - x * x * x - curve.b) % f.p != 0:
        raise ValueError("raw point is not on the curve")
    return (x, y)


def _write_scalar(w, spec, v: int, fmt: SerdeFormat):
    if fmt == SerdeFormat.PROCESSED:
        w.write(v.to_bytes(32, "little"))
    else:
        w.write(_to_mont(spec, v).to_bytes(32, "little"))


def _read_scalar(r, spec, fmt: SerdeFormat) -> int:
    v = int.from_bytes(r.read(32), "little")
    if fmt == SerdeFormat.PROCESSED:
        if v >= spec.p:
            raise ValueError("field element exceeds the modulus")
        return v
    if fmt == SerdeFormat.RAW_BYTES and v >= spec.p:
        raise ValueError("raw field element exceeds the modulus")
    return _from_mont(spec, v)


def _write_poly(w, spec, poly: Poly, fmt: SerdeFormat):
    from ..fields.limb import limbs_np_to_ints

    import numpy as np

    n = poly.values.shape[1]
    w.write(struct.pack(">I", n))
    if fmt == SerdeFormat.PROCESSED:
        for v in limb.to_ints(spec, poly.values):
            w.write(v.to_bytes(32, "little"))
    else:
        # device limbs already hold the Montgomery form: dump directly
        for v in limbs_np_to_ints(np.asarray(poly.values)):
            w.write(v.to_bytes(32, "little"))


def _read_poly(r, spec, basis, fmt: SerdeFormat) -> Poly:
    (n,) = struct.unpack(">I", r.read(4))
    vals = [_read_scalar(r, spec, fmt) for _ in range(n)]
    return Poly(limb.from_ints(spec, vals), basis)


def _write_poly_slice(w, spec, polys: List[Poly], fmt: SerdeFormat):
    w.write(struct.pack(">I", len(polys)))
    for poly in polys:
        _write_poly(w, spec, poly, fmt)


def _read_poly_slice(r, spec, basis, fmt: SerdeFormat) -> List[Poly]:
    (count,) = struct.unpack(">I", r.read(4))
    return [_read_poly(r, spec, basis, fmt) for _ in range(count)]


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
    _write_poly(w, spec, pk.l0, fmt)
    _write_poly(w, spec, pk.l_last, fmt)
    _write_poly(w, spec, pk.l_active_row, fmt)
    _write_poly_slice(w, spec, pk.fixed_values, fmt)
    _write_poly_slice(w, spec, pk.fixed_polys, fmt)
    _write_poly_slice(w, spec, pk.fixed_cosets, fmt)
    _write_poly_slice(w, spec, pk.permutation.permutations, fmt)
    _write_poly_slice(w, spec, pk.permutation.polys, fmt)
    _write_poly_slice(w, spec, pk.permutation.cosets, fmt)


def read_pk(r, curve, circuit_cls, spec=None, fmt: SerdeFormat = SerdeFormat.PROCESSED) -> ProvingKey:
    from .evaluation import Evaluator
    from .permutation import PermutationPK

    vk = read_vk(r, curve, circuit_cls, spec, fmt)
    spec = vk.domain.spec
    l0 = _read_poly(r, spec, EXTENDED, fmt)
    l_last = _read_poly(r, spec, EXTENDED, fmt)
    l_active_row = _read_poly(r, spec, EXTENDED, fmt)
    fixed_values = _read_poly_slice(r, spec, LAGRANGE, fmt)
    fixed_polys = _read_poly_slice(r, spec, COEFF, fmt)
    fixed_cosets = _read_poly_slice(r, spec, EXTENDED, fmt)
    permutations = _read_poly_slice(r, spec, LAGRANGE, fmt)
    polys = _read_poly_slice(r, spec, COEFF, fmt)
    cosets = _read_poly_slice(r, spec, EXTENDED, fmt)
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
