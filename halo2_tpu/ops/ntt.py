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


# ---------------------------------------------------------------------------
# Six-step + Stockham NTT: the TPU fast path (no gathers)
# ---------------------------------------------------------------------------
#
# The butterfly network above moves data with per-stage gathers over the lane
# axis; on TPU those lower to slow scatter/gather + sublane relayouts and the
# transform runs ~40x below the Montgomery-mul rate (measured in
# BENCH_full.json r5: 3.6M pts/s at k=16 vs an MSM sustaining >1.1G muls/s).
# The six-step factorization n = n1*n2 turns the whole transform into:
#
#     (16, n2, n1):  Stockham NTT of size n2 along axis 1   (batch n1 on lanes)
#     twiddle by W[i2, j1] = w^(i2*j1)                      (one elementwise mul)
#     transpose -> (16, n1, n2)
#     Stockham NTT of size n1 along axis 1                  (batch n2 on lanes)
#     reshape -> X[i1*n2 + i2]  (natural order, no bit-reversal)
#
# Stockham (DIF, auto-sorting) makes every stage a contiguous half-split +
# add/sub/mul + concat: NO gather indices anywhere, every elementwise op runs
# full-width with >= 2^(k/2) lanes.  Outputs are bit-identical to ``ntt``
# (same field ops, reassociated), pinned by tests/test_ntt.py.


def _stockham_axis1(spec: FieldSpec, x, tw, k: int):
    """Size-2^k DIF Stockham transform along axis 1 of (16, m, B); ``tw`` is
    the (16, m/2) table of the m-th root's powers.  Output in natural order."""
    m = 1 << k
    b = x.shape[2]
    x = x.reshape(NLIMBS, m, 1, b)
    for t in range(k):
        h = m >> (t + 1)
        a, c = x[:, :h], x[:, h:]
        u = limb.fadd(spec, a, c)
        w = tw[:, :: 1 << t][:, :h]  # (w^(2^t))^j for j < h
        wb = jnp.broadcast_to(w[:, :, None, None], a.shape)
        v = limb.fmul(spec, limb.fsub(spec, a, c), wb)
        x = jnp.concatenate([u, v], axis=2)  # new output bit on the slow side
        # WORKAROUND: the XLA:TPU pipeline miscompiles the fused
        # slice-of-concat pattern across stages when the trailing batch dim
        # is >= 128 lanes (eager execution and CPU are correct; a barrier
        # after each stage's concat restores correctness — empirically
        # isolated, see round-5 build notes).  Stages are separated by the
        # Pallas multiply anyway, so the fusion cost is negligible.
        x = jax.lax.optimization_barrier(x)
    return x.reshape(NLIMBS, m, b)


@functools.partial(jax.jit, static_argnums=(0, 4))
def ntt_sixstep(
    spec: FieldSpec, a: jnp.ndarray, tw: jnp.ndarray, w_cross: jnp.ndarray, k: int
) -> jnp.ndarray:
    """DFT of a (16, 2^k) limb array via the six-step algorithm.

    ``tw``: (16, 2^(k-1)) powers of the length-n root w (same table as
    :func:`ntt`).  ``w_cross``: the (16, n2, n1) cross-twiddle table
    W[i2, j1] = w^(i2*j1) from :func:`cross_twiddles`.
    """
    n = 1 << k
    assert a.shape == (NLIMBS, n)
    if k < 2:
        return ntt(spec, a, tw, k)
    k1 = k // 2
    k2 = k - k1
    n1, n2 = 1 << k1, 1 << k2
    # x[j], j = j1 + n1*j2  ->  view [j2][j1]
    x = a.reshape(NLIMBS, n2, n1)
    tw2 = tw[:, ::n1][:, : n2 // 2]  # powers of w^n1 (the n2-th root)
    x = _stockham_axis1(spec, x, tw2, k2)  # Y[i2, j1]
    x = limb.fmul(spec, x, w_cross)
    x = jnp.swapaxes(x, 1, 2)  # (16, n1, n2): [j1-> to transform, i2 batch]
    tw1 = tw[:, ::n2][:, : n1 // 2]  # powers of w^n2 (the n1-th root)
    x = _stockham_axis1(spec, x, tw1, k1)  # D[i1, i2]
    return x.reshape(NLIMBS, n)  # X[i1*n2 + i2]


@functools.partial(jax.jit, static_argnums=(0, 4))
def intt_sixstep(
    spec: FieldSpec,
    a: jnp.ndarray,
    inv_tw: jnp.ndarray,
    inv_cross: jnp.ndarray,
    k: int,
    n_inv_mont: jnp.ndarray,
) -> jnp.ndarray:
    """Inverse DFT on the six-step path (forward with omega^-1, scaled)."""
    out = ntt_sixstep(spec, a, inv_tw, inv_cross, k)
    scale = jnp.broadcast_to(n_inv_mont.reshape(NLIMBS, 1), out.shape)
    return limb.fmul(spec, out, scale)


def cross_twiddles(spec: FieldSpec, omega: int, k: int) -> jnp.ndarray:
    """(16, n2, n1) Montgomery table W[i2, j1] = omega^(i2*j1) for the
    six-step transform (host-built once per domain, cached by the caller)."""
    from ..fields.limb import ints_to_limbs_np

    k1 = k // 2
    n1, n2 = 1 << k1, 1 << (k - k1)
    p = spec.p
    flat = []
    for i2 in range(n2):
        step = pow(omega, i2, p)  # row i2: geometric sequence with this ratio
        v = 1
        for _ in range(n1):
            flat.append(spec.to_mont(v))
            v = v * step % p
    return jnp.asarray(ints_to_limbs_np(flat)).reshape(NLIMBS, n2, n1)


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
