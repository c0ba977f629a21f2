"""Vectorized polynomial arithmetic kernels.

TPU-native replacements for the reference arithmetic.rs helpers:
- eval_polynomial (arithmetic.rs Horner loop) -> power-table dot + tree reduce
- kate_division (synthetic division)         -> suffix-scan closed form
- lagrange_interpolate                        -> host ints (tiny inputs only)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields import limb
from ..fields.spec import NLIMBS, FieldSpec
from . import ntt as ntt_ops


def reduce_add(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Tree-sum a (16, n) limb array over axis 1 -> (16,)."""
    n = a.shape[1]
    while n > 1:
        half = n // 2
        lo = a[:, :half]
        hi = a[:, half : 2 * half]
        s = limb.fadd(spec, lo, hi)
        if n % 2:
            s = jnp.concatenate([s, a[:, -1:]], axis=1)
            n = half + 1
        else:
            n = half
        a = s
    return a[:, 0]


def eval_polynomial(spec: FieldSpec, coeffs: jnp.ndarray, x: int) -> jnp.ndarray:
    """Evaluate coefficient-form poly at canonical host scalar x -> (16,) mont."""
    n = coeffs.shape[1]
    xpow = ntt_ops.power_table(spec, x, n)
    return reduce_add(spec, limb.fmul(spec, coeffs, xpow))


import functools


@functools.partial(jax.jit, static_argnums=0)
def eval_polynomials_batched(
    spec: FieldSpec, coeffs: jnp.ndarray, x_mont: jnp.ndarray
) -> jnp.ndarray:
    """Evaluate m coefficient-form polys at m points in ONE dispatch.

    coeffs: (16, m, n); x_mont: (16, m) Montgomery points.  Returns (16, m).
    The prover batches every post-x opening evaluation through this — the
    per-query eval loop was 19 dispatch+pull round trips (~90 ms each over
    the device tunnel), ~37% of the warm k=14 prove (PROFILE_k14).
    """
    m, n = coeffs.shape[1], coeffs.shape[2]
    one = jnp.broadcast_to(
        jnp.asarray(spec.r_limbs).reshape(NLIMBS, 1, 1), (NLIMBS, m, 1)
    )
    table = one
    step = x_mont[:, :, None]  # x^size per point
    size = 1
    while size < n:
        upper = limb.fmul(spec, table, jnp.broadcast_to(step, table.shape))
        table = jnp.concatenate([table, upper], axis=2)
        if 2 * size < n:
            step = limb.fmul(spec, step, step)
        size *= 2
    prod = limb.fmul(spec, coeffs, table[:, :, :n])
    # tree-sum over the coefficient axis
    while n > 1:
        half = n // 2
        s = limb.fadd(spec, prod[:, :, :half], prod[:, :, half : 2 * half])
        if n % 2:
            s = jnp.concatenate([s, prod[:, :, -1:]], axis=2)
            n = half + 1
        else:
            n = half
        prod = s
    return prod[:, :, 0]


def eval_lagrange(spec: FieldSpec, values: jnp.ndarray, li: jnp.ndarray) -> jnp.ndarray:
    """Inner product of Lagrange values with precomputed l_i(x) table."""
    return reduce_add(spec, limb.fmul(spec, values, li))


def kate_division(spec: FieldSpec, coeffs: jnp.ndarray, b: int) -> jnp.ndarray:
    """q(X) = (p(X) - p(b)) / (X - b) for canonical host scalar b != 0.

    Closed form (parallel, replaces the reference's sequential synthetic
    division, arithmetic.rs): q_i = b^{-(i+1)} * sum_{j>i} p_j b^j.
    """
    assert b % spec.p != 0
    n = coeffs.shape[1]
    bpow = ntt_ops.power_table(spec, b, n)  # b^j
    pj_bj = limb.fmul(spec, coeffs, bpow)
    # suffix sums over axis 1 (exclusive): S_i = sum_{j>i} p_j b^j
    t = jnp.moveaxis(pj_bj, 1, 0)  # (n, 16)
    suff = jax.lax.associative_scan(
        lambda x, y: jnp.moveaxis(
            limb.fadd(spec, jnp.moveaxis(x, 0, 1), jnp.moveaxis(y, 0, 1)), 1, 0
        ),
        t,
        reverse=True,
    )
    suff_excl = jnp.concatenate(
        [suff[1:], jnp.zeros_like(suff[:1])], axis=0
    )  # S_i excludes j = i
    S = jnp.moveaxis(suff_excl, 0, 1)  # (16, n)
    binv = pow(b, -1, spec.p)
    binv_pow = ntt_ops.power_table(spec, binv, n + 1)[:, 1:]  # b^{-(i+1)}
    q = limb.fmul(spec, S, binv_pow)
    # q has degree n-2; q[n-1] = 0 structurally
    return q


def lagrange_interpolate(spec: FieldSpec, points, evals):
    """Host-side Lagrange interpolation on canonical ints (small inputs only;
    reference arithmetic.rs:446-488). Returns coefficient list of len(points)."""
    p = spec.p
    n = len(points)
    assert len(set(points)) == n
    if n == 1:
        return [evals[0] % p]
    coeffs = [0] * n
    for i, (xi, yi) in enumerate(zip(points, evals)):
        # numerator poly prod_{j!=i} (X - x_j), denominator prod (x_i - x_j)
        num = [1]
        denom = 1
        for j, xj in enumerate(points):
            if j == i:
                continue
            new = [0] * (len(num) + 1)
            for d, c in enumerate(num):
                new[d] = (new[d] - c * xj) % p
                new[d + 1] = (new[d + 1] + c) % p
            num = new
            denom = denom * (xi - xj) % p
        scale = yi * pow(denom, -1, p) % p
        for d, c in enumerate(num):
            coeffs[d] = (coeffs[d] + c * scale) % p
    return coeffs
