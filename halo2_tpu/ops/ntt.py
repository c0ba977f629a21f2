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


@functools.partial(jax.jit, static_argnums=(0, 3))
def ntt(spec: FieldSpec, a: jnp.ndarray, twiddles: jnp.ndarray, k: int) -> jnp.ndarray:
    """DFT of a (16, 2^k) limb array.

    ``twiddles`` is the (16, 2^(k-1)) table of powers of the domain generator
    (from :func:`power_table` with base=omega).
    """
    n = 1 << k
    assert a.shape == (NLIMBS, n)
    a = a[:, _bitrev_indices(k)]
    for s in range(1, k + 1):
        half = 1 << (s - 1)
        stride = 1 << (k - s)
        tw = twiddles[:, ::stride][:, :half]  # (16, half)
        x = a.reshape(NLIMBS, n // (2 * half), 2, half)
        lo = x[:, :, 0, :]
        hi = x[:, :, 1, :]
        t = limb.fmul(spec, hi, jnp.broadcast_to(tw[:, None, :], hi.shape))
        out0 = limb.fadd(spec, lo, t)
        out1 = limb.fsub(spec, lo, t)
        a = jnp.stack([out0, out1], axis=2).reshape(NLIMBS, n)
    return a


@functools.partial(jax.jit, static_argnums=(0, 3))
def ntt_batched(
    spec: FieldSpec, a: jnp.ndarray, twiddles: jnp.ndarray, k: int
) -> jnp.ndarray:
    """DFT along the last axis of a (16, B, 2^k) limb array.

    Butterfly network identical to :func:`ntt` with one extra batch axis; the
    batch rides a second lane dimension so the compiled graph stays a dense
    stack of whole-array VPU ops.  Used per-row by the distributed four-step
    NTT (parallel/ntt.py) and for batched column transforms.
    """
    n = 1 << k
    assert a.shape[0] == NLIMBS and a.shape[-1] == n
    b = a.shape[1]
    a = a[:, :, _bitrev_indices(k)]
    for s in range(1, k + 1):
        half = 1 << (s - 1)
        stride = 1 << (k - s)
        tw = twiddles[:, ::stride][:, :half]  # (16, half)
        x = a.reshape(NLIMBS, b, n // (2 * half), 2, half)
        lo = x[:, :, :, 0, :]
        hi = x[:, :, :, 1, :]
        t = limb.fmul(spec, hi, jnp.broadcast_to(tw[:, None, None, :], hi.shape))
        out0 = limb.fadd(spec, lo, t)
        out1 = limb.fsub(spec, lo, t)
        a = jnp.stack([out0, out1], axis=3).reshape(NLIMBS, b, n)
    return a


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
