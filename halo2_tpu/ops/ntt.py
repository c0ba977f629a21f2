"""Radix-2 NTT kernels over multi-limb field arrays.

TPU-native replacement for the reference ``best_fft`` (arithmetic.rs:171-274):
instead of a threaded in-place butterfly network, each stage is a whole-array
vectorized butterfly (reshape + broadcast twiddle multiply), traced once and
fused by XLA.  Input/output are Montgomery-form limb arrays of shape (16, n).

The transform computes the standard DFT: out[i] = sum_j a[j] * omega^(i*j),
matching the reference's semantics (bit-reversal + DIT butterflies).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.spec import NLIMBS, FieldSpec, int_to_limbs


@functools.lru_cache(maxsize=None)
def _bitrev_indices(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def power_table(spec: FieldSpec, base: int, n: int) -> jnp.ndarray:
    """(16, n) Montgomery table of [1, base, base^2, ..., base^(n-1)].

    Device-side doubling construction: P_{2m} = [P_m, base^m * P_m], so the
    table costs log2(n) vectorized fmuls instead of n host muls.  ``base`` is
    a canonical Python int.
    """
    m = 1
    while m < n:
        m <<= 1
    table = limb.from_int(spec, 1).reshape(NLIMBS, 1)
    step = base % spec.p
    size = 1
    while size < m:
        s = limb.from_int(spec, step).reshape(NLIMBS, 1)
        upper = limb.fmul(spec, table, jnp.broadcast_to(s, table.shape))
        table = jnp.concatenate([table, upper], axis=1)
        step = step * step % spec.p
        size <<= 1
    return table[:, :n]


def _stage_indices(k: int, s, n: int):
    """Gather indices for DIT stage ``s`` (1-based, traced int32).

    Returns (lo_pos, hi_pos, tw_idx, out_src, out_is_hi): positions of the
    butterfly pair and twiddle for each of the n/2 butterflies, plus the
    re-assembly map sending butterfly results back to natural positions.
    """
    half_idx = jnp.arange(n // 2, dtype=jnp.int32)
    full_idx = jnp.arange(n, dtype=jnp.int32)
    sm1 = s - 1
    h = jnp.int32(1) << sm1
    off = half_idx & (h - 1)
    lo_pos = ((half_idx >> sm1) << s) | off
    hi_pos = lo_pos | h
    tw_idx = off << (jnp.int32(k) - s)
    out_src = ((full_idx >> s) << sm1) | (full_idx & (h - 1))
    out_is_hi = (full_idx & h) != 0
    return lo_pos, hi_pos, tw_idx, out_src, out_is_hi


@functools.partial(jax.jit, static_argnums=(0, 3))
def ntt(spec: FieldSpec, a: jnp.ndarray, twiddles: jnp.ndarray, k: int) -> jnp.ndarray:
    """DFT of a (16, 2^k) limb array.

    ``twiddles`` is the (16, 2^(k-1)) table of powers of the domain generator
    (from :func:`power_table` with base=omega).

    The k butterfly stages run under one ``fori_loop`` whose body is traced
    once — per-stage data movement is expressed as gathers with indices
    computed from the (traced) stage number, so the compiled graph holds a
    single Montgomery multiply instead of k of them.  XLA compile time of the
    reference-style fully-unrolled network was ~10s/stage on small hosts.
    """
    n = 1 << k
    assert a.shape == (NLIMBS, n)
    if k == 0:
        return a
    a = a[:, _bitrev_indices(k)]

    def stage(s, x):
        lo_pos, hi_pos, tw_idx, out_src, out_is_hi = _stage_indices(k, s, n)
        u = x[:, lo_pos]
        v = x[:, hi_pos]
        t = limb.fmul(spec, v, twiddles[:, tw_idx])
        res_lo = limb.fadd(spec, u, t)
        res_hi = limb.fsub(spec, u, t)
        return jnp.where(out_is_hi[None, :], res_hi[:, out_src], res_lo[:, out_src])

    return jax.lax.fori_loop(1, k + 1, stage, a)


@functools.partial(jax.jit, static_argnums=(0, 3))
def ntt_batched(
    spec: FieldSpec, a: jnp.ndarray, twiddles: jnp.ndarray, k: int
) -> jnp.ndarray:
    """DFT along the last axis of a (16, B, 2^k) limb array.

    Butterfly network identical to :func:`ntt` with one extra batch axis; used
    per-row by the distributed four-step NTT (parallel/ntt.py) and for batched
    column transforms.
    """
    n = 1 << k
    assert a.shape[0] == NLIMBS and a.shape[-1] == n
    if k == 0:
        return a
    a = a[:, :, _bitrev_indices(k)]

    def stage(s, x):
        lo_pos, hi_pos, tw_idx, out_src, out_is_hi = _stage_indices(k, s, n)
        u = x[:, :, lo_pos]
        v = x[:, :, hi_pos]
        t = limb.fmul(spec, v, jnp.broadcast_to(twiddles[:, None, tw_idx], v.shape))
        res_lo = limb.fadd(spec, u, t)
        res_hi = limb.fsub(spec, u, t)
        return jnp.where(
            out_is_hi[None, None, :], res_hi[:, :, out_src], res_lo[:, :, out_src]
        )

    return jax.lax.fori_loop(1, k + 1, stage, a)


@functools.partial(jax.jit, static_argnums=(0, 3))
def intt(
    spec: FieldSpec,
    a: jnp.ndarray,
    inv_twiddles: jnp.ndarray,
    k: int,
    n_inv_mont: jnp.ndarray,
) -> jnp.ndarray:
    """Inverse DFT: NTT with omega^-1 followed by scaling with 1/2^k.

    Mirrors EvaluationDomain::ifft (reference poly/domain.rs:355-362).
    """
    out = ntt(spec, a, inv_twiddles, k)
    scale = jnp.broadcast_to(n_inv_mont.reshape(NLIMBS, 1), out.shape)
    return limb.fmul(spec, out, scale)


def distribute_powers(spec: FieldSpec, a: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Elementwise a[i] *= table[i] (generic coset power distribution)."""
    return limb.fmul(spec, a, table)
