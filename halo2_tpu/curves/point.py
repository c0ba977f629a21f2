"""Branch-free elliptic-curve point kernels over limb arrays.

Points are homogeneous projective triples ``(x, y, z)`` of Montgomery-form limb
arrays (shape ``(16, ...)`` each); identity is ``(0, 1, 0)``.  Addition and
doubling use the Renes–Costello–Batina (2016) *complete* formulas for a = 0
(Algorithms 7/9), so identity/equal/negated inputs all flow through the same
straight-line code — the TPU-native replacement for the reference's branchy
Jacobian arithmetic in halo2curves (SURVEY.md §2.12).

Cost: complete add = 12 fmul + 2 mul-by-(3b); double = 6 fmul + 2 mul-by-(3b).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..fields import limb
from ..fields.spec import NLIMBS, int_to_limbs
from .spec import CurveSpec


class Point(NamedTuple):
    """Projective point; a pytree of three (16, ...) uint32 limb arrays."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[1:]


def identity(spec: CurveSpec, shape=()) -> Point:
    one = jnp.asarray(int_to_limbs(spec.base.to_mont(1)))
    one = jnp.broadcast_to(one.reshape((NLIMBS,) + (1,) * len(shape)), (NLIMBS,) + tuple(shape))
    zero = jnp.zeros((NLIMBS,) + tuple(shape), dtype=jnp.uint32)
    return Point(zero, one, zero)


def generator(spec: CurveSpec) -> Point:
    f = spec.base
    return Point(
        limb.from_int(f, spec.gx), limb.from_int(f, spec.gy), limb.from_int(f, 1)
    )


def from_affine_ints(spec: CurveSpec, coords) -> Point:
    """List of (x, y) canonical-int pairs (or None for identity) -> batched Point."""
    f = spec.base
    xs, ys, zs = [], [], []
    for c in coords:
        if c is None:
            xs.append(0), ys.append(1), zs.append(0)
        else:
            xs.append(c[0]), ys.append(c[1]), zs.append(1)
    return Point(limb.from_ints(f, xs), limb.from_ints(f, ys), limb.from_ints(f, zs))


def to_affine_ints(spec: CurveSpec, p: Point):
    """Batched Point -> list of (x, y) canonical int pairs / None for identity."""
    f = spec.base
    zinv = limb.finv(f, p.z)  # 0 -> 0, so identity maps to (0, 0)
    xs = limb.to_ints(f, limb.fmul(f, p.x, zinv))
    ys = limb.to_ints(f, limb.fmul(f, p.y, zinv))
    zs = limb.to_ints(f, p.z)
    return [None if z == 0 else (x, y) for x, y, z in zip(xs, ys, zs)]


def _stk(*xs):
    return jnp.stack(xs, axis=1)  # (16, m, ...) batched field elements


def ec_add(spec: CurveSpec, p: Point, q: Point) -> Point:
    """Complete projective addition (RCB Algorithm 7, a = 0).

    The 12M+2m are grouped into three *batched* fmul calls (6+2+6 lanes) so the
    compiled graph is ~3 field-mul kernels and the VPU sees larger fused ops.
    """
    f = spec.base
    add, sub, mul = (
        lambda a, b: limb.fadd(f, a, b),
        lambda a, b: limb.fsub(f, a, b),
        lambda a, b: limb.fmul(f, a, b),
    )
    x1, y1, z1 = p
    x2, y2, z2 = q

    s1 = add(_stk(x1, y1, x1), _stk(y1, z1, z1))  # [x1+y1, y1+z1, x1+z1]
    s2 = add(_stk(x2, y2, x2), _stk(y2, z2, z2))
    m = mul(
        jnp.concatenate([_stk(x1, y1, z1), s1], axis=1),
        jnp.concatenate([_stk(x2, y2, z2), s2], axis=1),
    )  # [x1x2, y1y2, z1z2, (x1+y1)(x2+y2), (y1+z1)(y2+z2), (x1+z1)(x2+z2)]
    t0, t1, t2 = m[:, 0], m[:, 1], m[:, 2]
    pairs = add(_stk(t0, t1, t0), _stk(t1, t2, t2))
    d = sub(m[:, 3:6], pairs)
    t3, t4, xz = d[:, 0], d[:, 1], d[:, 2]  # x1y2+x2y1, y1z2+y2z1, x1z2+x2z1

    b3 = jnp.asarray(int_to_limbs(f.to_mont(3 * spec.b)))
    b3 = b3.reshape((NLIMBS,) + (1,) * (t2.ndim - 1))
    mb = mul(_stk(t2, xz), _stk(*(jnp.broadcast_to(b3, t2.shape),) * 2))
    t2b, y3b = mb[:, 0], mb[:, 1]

    two_t0 = add(t0, t0)
    pair2 = add(_stk(two_t0, t1), _stk(t0, t2b))  # [3*t0, z3]
    t0x3, z3 = pair2[:, 0], pair2[:, 1]
    t1m = sub(t1, t2b)

    m2 = mul(_stk(t4, t3, y3b, t1m, t0x3, z3), _stk(y3b, t1m, t0x3, z3, t3, t4))
    # [t4*y3b, t3*t1m, y3b*t0x3, t1m*z3, t0x3*t3, z3*t4]
    x3 = sub(m2[:, 1], m2[:, 0])
    fin = add(_stk(m2[:, 3], m2[:, 5]), _stk(m2[:, 2], m2[:, 4]))
    return Point(x3, fin[:, 0], fin[:, 1])


def ec_double(spec: CurveSpec, p: Point) -> Point:
    """Complete projective doubling (RCB Algorithm 9, a = 0), batched fmuls."""
    f = spec.base
    add, sub, mul = (
        lambda a, b: limb.fadd(f, a, b),
        lambda a, b: limb.fsub(f, a, b),
        lambda a, b: limb.fmul(f, a, b),
    )
    x, y, z = p
    m = mul(_stk(y, y, z, x), _stk(y, z, z, y))  # [y^2, yz, z^2, xy]
    t0, t1, zz, xy = m[:, 0], m[:, 1], m[:, 2], m[:, 3]

    b3 = jnp.asarray(int_to_limbs(f.to_mont(3 * spec.b)))
    b3 = jnp.broadcast_to(b3.reshape((NLIMBS,) + (1,) * (zz.ndim - 1)), zz.shape)
    t2 = mul(zz, b3)

    d2 = add(_stk(t0, t2), _stk(t0, t2))  # [2t0, 2t2]
    z3 = add(d2[:, 0], d2[:, 0])  # 4t0
    z3 = add(z3, z3)  # 8t0 = 8y^2
    y3 = add(t0, t2)
    t2x3 = add(d2[:, 1], t2)  # 3t2
    t0m = sub(t0, t2x3)

    m2 = mul(_stk(t2, t1, t0m, t0m), _stk(z3, z3, y3, xy))
    # [t2*z3, t1*z3, t0m*y3, t0m*xy]
    y3f = add(m2[:, 0], m2[:, 2])
    x3f = add(m2[:, 3], m2[:, 3])
    return Point(x3f, y3f, m2[:, 1])


def ec_neg(spec: CurveSpec, p: Point) -> Point:
    return Point(p.x, limb.fneg(spec.base, p.y), p.z)


def ec_select(cond, p: Point, q: Point) -> Point:
    """Pointwise select: where cond (batch-shaped) pick p else q."""
    return Point(
        limb.select(cond, p.x, q.x),
        limb.select(cond, p.y, q.y),
        limb.select(cond, p.z, q.z),
    )


def is_identity(p: Point):
    return limb.is_zero(p.z)


def batch_normalize(spec: CurveSpec, p: Point) -> Point:
    """Projective -> affine-with-z=1 (identity stays (0,*,0) via inv(0)=0).

    Mirrors halo2curves batch_normalize; uses one batched inversion.
    """
    f = spec.base
    zinv = limb.finv(f, p.z)
    one = jnp.asarray(int_to_limbs(f.to_mont(1)))
    one = jnp.broadcast_to(one.reshape((NLIMBS,) + (1,) * (p.x.ndim - 1)), p.x.shape)
    ident = limb.is_zero(p.z)
    z = limb.select(ident, p.z, one)
    return Point(limb.fmul(f, p.x, zinv), limb.fmul(f, p.y, zinv), z)
