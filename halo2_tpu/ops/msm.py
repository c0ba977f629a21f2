"""Pippenger multi-scalar multiplication as a sort/scan TPU kernel.

TPU-native replacement for the reference ``best_multiexp`` (arithmetic.rs:
16-159).  The reference splits points across rayon threads and runs a serial
bucket loop per thread; scatter-style bucket accumulation is hostile to SIMD
hardware, so here each window instead:

  1. extracts the c-bit digit of every scalar        (vector bit ops)
  2. sorts points by digit                            (argsort + gather)
  3. inclusive-scans the sorted points under the complete EC add
     (``jax.lax.associative_scan`` — log-depth, branch-free)
  4. reads bucket sums as differences of scan values at segment ends
     (searchsorted + gather + batched subtract)
  5. folds buckets with the standard suffix-sum trick (reverse scan + tree add)

All windows run batched under ``vmap`` so the TPU sees one wide kernel; the
final window combination is a small fori_loop Horner with c doublings a step.

Scalars arrive in Montgomery form (like every field element on device) and are
converted to canonical form internally for digit extraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..curves.point import Point, ec_add, ec_double, ec_neg, identity
from ..curves.spec import CurveSpec
from ..fields import limb
from ..fields.spec import LIMB_BITS, NLIMBS


def choose_window(n: int) -> int:
    """Window size heuristic ~ total work (256/c)(2n + 2^(c+1)) minimized."""
    best_c, best_w = 1, None
    for c in range(1, 17):
        w = (256 + c - 1) // c * (2 * n + (1 << (c + 1)))
        if best_w is None or w < best_w:
            best_c, best_w = c, w
    return best_c


def _extract_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """Canonical (16, n) limbs -> (num_windows, n) int32 c-bit digits."""
    num_windows = (256 + c - 1) // c
    outs = []
    mask = jnp.uint32((1 << c) - 1)
    for w in range(num_windows):
        bit = w * c
        l0, off = bit // LIMB_BITS, bit % LIMB_BITS
        d = scalars[l0] >> off
        if off + c > LIMB_BITS and l0 + 1 < NLIMBS:
            d = d | (scalars[l0 + 1] << (LIMB_BITS - off))
        outs.append((d & mask).astype(jnp.int32))
    return jnp.stack(outs, axis=0)


def _window_sum(spec: CurveSpec, digits, px, py, pz, c: int):
    """Sum of digit_i * P_i for one window; returns a single point (x, y, z)."""
    n = digits.shape[0]
    order = jnp.argsort(digits)
    sd = digits[order]
    pts = Point(px[:, order], py[:, order], pz[:, order])

    # inclusive prefix scan under complete addition, over the point axis
    prefix = jax.lax.associative_scan(
        lambda a, b: ec_add(spec, a, b),
        pts,
        axis=px.ndim - 1,
    )

    nb = 1 << c
    # e_j = last sorted index with digit <= j (may be -1)
    ends = jnp.searchsorted(sd, jnp.arange(nb, dtype=jnp.int32), side="right") - 1
    safe = jnp.clip(ends, 0, n - 1)
    at_ends = Point(prefix.x[:, safe], prefix.y[:, safe], prefix.z[:, safe])
    ident = identity(spec, (nb,))
    at_ends = Point(
        limb.select(ends >= 0, at_ends.x, ident.x),
        limb.select(ends >= 0, at_ends.y, ident.y),
        limb.select(ends >= 0, at_ends.z, ident.z),
    )
    # bucket_j = at_ends[j] - at_ends[j-1] for j = 1..nb-1
    upper = Point(at_ends.x[:, 1:], at_ends.y[:, 1:], at_ends.z[:, 1:])
    lower = Point(at_ends.x[:, :-1], at_ends.y[:, :-1], at_ends.z[:, :-1])
    buckets = ec_add(spec, upper, ec_neg(spec, lower))  # (nb-1) buckets, j>=1

    # weighted fold: sum_j j * B_j = sum of suffix sums
    suffix = jax.lax.associative_scan(
        lambda a, b: ec_add(spec, a, b), buckets, reverse=True, axis=px.ndim - 1
    )
    acc = suffix
    m = nb - 1
    while m > 1:
        half = m // 2
        s = ec_add(
            spec,
            Point(acc.x[:, :half], acc.y[:, :half], acc.z[:, :half]),
            Point(acc.x[:, half : 2 * half], acc.y[:, half : 2 * half], acc.z[:, half : 2 * half]),
        )
        if m % 2:
            s = Point(
                jnp.concatenate([s.x, acc.x[:, -1:]], axis=1),
                jnp.concatenate([s.y, acc.y[:, -1:]], axis=1),
                jnp.concatenate([s.z, acc.z[:, -1:]], axis=1),
            )
            m = half + 1
        else:
            m = half
        acc = s
    return acc.x[:, 0], acc.y[:, 0], acc.z[:, 0]


@functools.partial(jax.jit, static_argnums=(0, 3))
def msm(spec: CurveSpec, scalars_mont: jnp.ndarray, points: Point, c: int = 0) -> Point:
    """Multi-scalar multiplication: sum_i scalars[i] * points[i].

    scalars_mont: (16, n) Montgomery-form scalar-field limbs.
    points: batched Point over the same n.  Returns a single projective Point.
    """
    n = scalars_mont.shape[1]
    if c == 0:
        c = choose_window(n)
    scal = limb.from_mont(spec.scalar, scalars_mont)
    digits = _extract_digits(scal, c)  # (W, n)

    window_fn = jax.vmap(
        lambda d: _window_sum(spec, d, points.x, points.y, points.z, c)
    )
    wx, wy, wz = window_fn(digits)  # each (W, 16)
    wx, wy, wz = wx.T, wy.T, wz.T  # (16, W)

    num_windows = digits.shape[0]

    def body(i, acc):
        w = num_windows - 1 - i
        acc = jax.lax.fori_loop(0, c, lambda _, a: ec_double(spec, a), acc)
        wp = Point(wx[:, w], wy[:, w], wz[:, w])
        return ec_add(spec, acc, wp)

    acc0 = ec_add(
        spec,
        identity(spec),
        Point(wx[:, num_windows - 1], wy[:, num_windows - 1], wz[:, num_windows - 1]),
    )

    def outer(i, acc):
        return body(i + 1, acc)

    return jax.lax.fori_loop(0, num_windows - 1, outer, acc0)
