"""Batched per-lane scalar multiplication: out[i] = k[i] * P[i].

Used by parameter generation (powers of s, Lagrange SRS) and small verifier
folds.  Branch-free double-and-add over 256 bits as a fori_loop of complete
adds; the whole batch rides the lane dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..curves.point import Point, ec_add, ec_double, ec_select, identity
from ..curves.spec import CurveSpec
from ..fields import limb
from ..fields.spec import LIMB_BITS


@functools.partial(jax.jit, static_argnums=(0,))
def batch_scalar_mul(spec: CurveSpec, scalars_mont: jnp.ndarray, points: Point) -> Point:
    """scalars_mont: (16, n) Montgomery scalar-field limbs; points batched (n)."""
    scal = limb.from_mont(spec.scalar, scalars_mont)
    n = scal.shape[1]
    acc = identity(spec, (n,))

    def body(i, carry):
        acc, base = carry
        bit_idx = i
        word = scal[bit_idx // LIMB_BITS]
        bit = ((word >> (bit_idx % LIMB_BITS)) & 1).astype(jnp.bool_)
        added = ec_add(spec, acc, base)
        acc = ec_select(bit, added, acc)
        base = ec_double(spec, base)
        return acc, base

    acc, _ = jax.lax.fori_loop(0, 256, body, (acc, points))
    return acc
