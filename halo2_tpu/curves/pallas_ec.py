"""Fully-fused elliptic-curve kernels on the row-major (16, R, 128) layout.

One Pallas kernel per EC group op: the complete Renes–Costello–Batina a=0
addition (12 Montgomery muls) or doubling (8 muls) runs start-to-finish in
VMEM on (rows, 128) vreg tiles — one launch, six (three) HBM reads and three
writes per point, zero intermediate HBM traffic.  The previous design issued
~13 separate dispatches per EC add (3 Pallas fmuls + ~10 XLA elementwise
clusters), each bouncing operands through HBM; this is the kernel-fusion fix
for the measured 40 ms/fmul hot path.

Layout: a batch of n field elements is (16, n//128, 128) uint32 — limb axis
leading (untiled major dim), rows x lanes forming clean (8, 128) vreg tiles.
Indexing ``ref[i]`` inside the kernel selects limb i's (RT, 128) tile with no
sublane movement; all field arithmetic is fields/vreg.py unrolled-limb code.

The same bodies run as plain jnp on non-TPU backends (``*_rows`` dispatch), so
CPU tests exercise bit-identical arithmetic.

Replaces the reference's halo2curves group ops (SURVEY.md §2.12); formulas
match curves/point.py (RCB 2016 Algorithms 7/9) exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import vreg
from ..fields.spec import NLIMBS, FieldSpec, int_to_limbs
from .spec import CurveSpec

ROWS_PER_TILE = 8  # block (16, 8, 128) per operand = 64 KiB in VMEM
LANES = 128


def _b3_limbs(spec: CurveSpec):
    return int_to_limbs(spec.base.to_mont(3 * spec.b))


def ec_add_body(spec: CurveSpec, p1, p2):
    """RCB Algorithm 7 (a=0) on vreg Limbs triples. p1/p2: (X, Y, Z) Limbs."""
    f = spec.base
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    mul = lambda a, b: vreg.vmul(f, a, b)
    add = lambda a, b: vreg.vadd(f, a, b)
    sub = lambda a, b: vreg.vsub(f, a, b)
    b3mul = lambda a: vreg.vmul_small(f, a, 3 * spec.b)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = mul(add(x1, y1), add(x2, y2))
    t3 = sub(sub(t3, t0), t1)  # x1y2 + x2y1
    t4 = mul(add(y1, z1), add(y2, z2))
    t4 = sub(sub(t4, t1), t2)  # y1z2 + y2z1
    xz = mul(add(x1, z1), add(x2, z2))
    y3 = sub(sub(xz, t0), t2)  # x1z2 + x2z1
    t0x3 = add(add(t0, t0), t0)  # 3*t0
    t2b = b3mul(t2)
    z3 = add(t1, t2b)
    t1m = sub(t1, t2b)
    y3b = b3mul(y3)
    x3 = sub(mul(t3, t1m), mul(t4, y3b))
    y3o = add(mul(y3b, t0x3), mul(t1m, z3))
    z3o = add(mul(z3, t4), mul(t0x3, t3))
    return x3, y3o, z3o


def ec_double_body(spec: CurveSpec, p):
    """RCB Algorithm 9 (a=0) on a vreg Limbs triple."""
    f = spec.base
    x, y, z = p
    mul = lambda a, b: vreg.vmul(f, a, b)
    add = lambda a, b: vreg.vadd(f, a, b)
    sub = lambda a, b: vreg.vsub(f, a, b)

    t0 = mul(y, y)
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)  # 8y^2
    t1 = mul(y, z)
    t2 = vreg.vmul_small(f, mul(z, z), 3 * spec.b)
    x3 = mul(t2, z3)
    y3 = add(t0, t2)
    z3o = mul(t1, z3)
    t1b = add(t2, t2)
    t2c = add(t1b, t2)
    t0m = sub(t0, t2c)
    y3 = mul(t0m, y3)
    y3o = add(x3, y3)
    xy = mul(x, y)
    x3o = mul(t0m, xy)
    x3o = add(x3o, x3o)
    return x3o, y3o, z3o


def _refs_to_limbs(ref):
    return [ref[i] for i in range(NLIMBS)]


def _store(ref, limbs):
    for i in range(NLIMBS):
        ref[i] = limbs[i]


def _ec_add_kernel(spec, x1, y1, z1, x2, y2, z2, ox, oy, oz):
    r = ec_add_body(
        spec,
        (_refs_to_limbs(x1), _refs_to_limbs(y1), _refs_to_limbs(z1)),
        (_refs_to_limbs(x2), _refs_to_limbs(y2), _refs_to_limbs(z2)),
    )
    _store(ox, r[0])
    _store(oy, r[1])
    _store(oz, r[2])


def _ec_double_kernel(spec, x1, y1, z1, ox, oy, oz):
    r = ec_double_body(
        spec, (_refs_to_limbs(x1), _refs_to_limbs(y1), _refs_to_limbs(z1))
    )
    _store(ox, r[0])
    _store(oy, r[1])
    _store(oz, r[2])


def _use_pallas() -> bool:
    from ..fields.pallas_kernels import backend_is_tpu

    return backend_is_tpu()


def _rows_spec():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(
        (NLIMBS, ROWS_PER_TILE, LANES),
        lambda i, j: (0, i, j),
        memory_space=pltpu.VMEM,
    )


def _pad_rows(arrs, rt: int):
    """Pad rows to a multiple of rt and lanes to a multiple of 128."""
    r, l = arrs[0].shape[1], arrs[0].shape[2]
    pr = (-r) % rt
    pl_ = (-l) % LANES
    if pr == 0 and pl_ == 0:
        return arrs, r, l
    return (
        [jnp.pad(a, ((0, 0), (0, pr), (0, pl_))) for a in arrs],
        r,
        l,
    )


@functools.partial(jax.jit, static_argnums=(0, 7))
def _ec_add_pallas(spec: CurveSpec, x1, y1, z1, x2, y2, z2, interpret=False):
    from jax.experimental import pallas as pl

    (x1, y1, z1, x2, y2, z2), r, l = _pad_rows(
        [x1, y1, z1, x2, y2, z2], ROWS_PER_TILE
    )
    rp, lp = x1.shape[1], x1.shape[2]
    shape = jax.ShapeDtypeStruct((NLIMBS, rp, lp), jnp.uint32)
    out = pl.pallas_call(
        functools.partial(_ec_add_kernel, spec),
        out_shape=(shape, shape, shape),
        grid=(rp // ROWS_PER_TILE, lp // LANES),
        in_specs=[_rows_spec()] * 6,
        out_specs=(_rows_spec(), _rows_spec(), _rows_spec()),
        interpret=interpret,
    )(x1, y1, z1, x2, y2, z2)
    return tuple(o[:, :r, :l] for o in out)


@functools.partial(jax.jit, static_argnums=(0, 4))
def _ec_double_pallas(spec: CurveSpec, x1, y1, z1, interpret=False):
    from jax.experimental import pallas as pl

    (x1, y1, z1), r, l = _pad_rows([x1, y1, z1], ROWS_PER_TILE)
    rp, lp = x1.shape[1], x1.shape[2]
    shape = jax.ShapeDtypeStruct((NLIMBS, rp, lp), jnp.uint32)
    out = pl.pallas_call(
        functools.partial(_ec_double_kernel, spec),
        out_shape=(shape, shape, shape),
        grid=(rp // ROWS_PER_TILE, lp // LANES),
        in_specs=[_rows_spec()] * 3,
        out_specs=(_rows_spec(), _rows_spec(), _rows_spec()),
        interpret=interpret,
    )(x1, y1, z1)
    return tuple(o[:, :r, :l] for o in out)


def _jnp_triple(body, spec, *coords):
    """Non-TPU fallback: route through curves/point.py's batched-fmul graphs.

    The vreg bodies unroll to ~34k HLO nodes per instance — fine inside one
    Pallas kernel, hostile to XLA compile time as a plain graph.  point.py's
    ec_add/ec_double are ~20x smaller and bit-identical (pinned by tests).
    """
    from . import point

    shape = coords[0].shape  # (16, R, L)
    flat = [c.reshape(NLIMBS, -1) for c in coords]
    if len(flat) == 6:
        r = point.ec_add(
            spec, point.Point(*flat[:3]), point.Point(*flat[3:])
        )
    else:
        r = point.ec_double(spec, point.Point(*flat))
    return tuple(c.reshape(shape) for c in r)


def ec_add_rows(spec: CurveSpec, p1, p2, interpret: bool | None = None):
    """Complete EC add of two (x, y, z) triples of (16, R, 128) u32 arrays.

    Pallas kernel on TPU; identical jnp graph elsewhere (or with
    ``interpret=True`` for kernel-path tests on CPU).
    """
    if interpret is None:
        if _use_pallas():
            return _ec_add_pallas(spec, *p1, *p2)
        return _jnp_triple(ec_add_body, spec, *p1, *p2)
    return _ec_add_pallas(spec, *p1, *p2, interpret=interpret)


def ec_double_rows(spec: CurveSpec, p, interpret: bool | None = None):
    """Complete EC double of an (x, y, z) triple of (16, R, 128) u32 arrays."""
    if interpret is None:
        if _use_pallas():
            return _ec_double_pallas(spec, *p)
        return _jnp_triple(ec_double_body, spec, *p)
    return _ec_double_pallas(spec, *p, interpret=interpret)
