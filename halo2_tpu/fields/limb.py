"""Vectorized multi-limb Montgomery field arithmetic in JAX.

Replaces the reference's external ``halo2curves`` scalar layer (SURVEY.md §2.12)
with a TPU-native design: field elements are 16 little-endian 16-bit limbs in
``uint32`` with the **limb axis leading** — an array of n elements has shape
``(16, n)`` so the batch occupies the TPU lane dimension and every operation
below is a fully vectorized VPU op over the batch.  Limb loops are unrolled at
trace time (16 or 32 static iterations) and fused by XLA.

All values on device are kept in Montgomery form (v·R mod p, R = 2^256), like
the reference.  16x16-bit limb products fit exactly in uint32; column sums are
accumulated with lo/hi splitting so no intermediate exceeds 32 bits.

Every function takes the :class:`~halo2_tpu.fields.spec.FieldSpec` first;
specs are hashable dataclasses, safe to close over in jitted code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import NLIMBS, LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs, limbs_to_int

U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


def _u(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=U32)


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------

def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros((NLIMBS,) + tuple(shape), dtype=U32)


def from_int(spec: FieldSpec, v: int) -> jnp.ndarray:
    """Canonical Python int -> Montgomery-form limb vector (16,)."""
    return jnp.asarray(int_to_limbs(spec.to_mont(v)))


def ints_to_limbs_np(vs) -> np.ndarray:
    """Canonical ints -> (16, n) uint32 canonical limbs, via a single bytes
    round-trip (C-speed; no per-limb Python loop)."""
    buf = b"".join(v.to_bytes(32, "little") for v in vs)
    arr = np.frombuffer(buf, dtype=np.uint16).reshape(len(vs), NLIMBS)
    return np.ascontiguousarray(arr.T).astype(np.uint32)


def limbs_np_to_ints(a) -> list:
    """(16, n) canonical limbs -> list of canonical ints (bytes round-trip)."""
    arr = np.ascontiguousarray(np.asarray(a).astype(np.uint16).T)  # (n, 16)
    raw = arr.tobytes()
    return [
        int.from_bytes(raw[32 * j : 32 * (j + 1)], "little") for j in range(arr.shape[0])
    ]


def from_ints(spec: FieldSpec, vs) -> jnp.ndarray:
    """Iterable of canonical ints -> Montgomery limb array (16, n)."""
    return jnp.asarray(ints_to_limbs_np([spec.to_mont(v) for v in vs]))


def to_ints(spec: FieldSpec, a) -> list:
    """Montgomery limb array (16, ...) -> list of canonical ints (flattened)."""
    arr = np.asarray(a).reshape(NLIMBS, -1)
    rinv = pow(spec.r, -1, spec.p)
    return [v * rinv % spec.p for v in limbs_np_to_ints(arr)]


def from_canonical_ints(spec: FieldSpec, vs) -> jnp.ndarray:
    """Canonical ints -> Montgomery limbs via a single device to_mont fmul."""
    return to_mont(spec, jnp.asarray(ints_to_limbs_np(vs)))


def to_int(spec: FieldSpec, a) -> int:
    (v,) = to_ints(spec, a)
    return v


# ---------------------------------------------------------------------------
# carry / borrow chains (unrolled over the static limb axis)
# ---------------------------------------------------------------------------

def _carry_propagate(digits):
    """Normalize a list of uint32 digits (< 2^32) to 16-bit digits.

    Returns (list of len(digits) normalized digits, final carry).
    """
    out = []
    carry = None
    for d in digits:
        v = d if carry is None else d + carry
        out.append(v & _MASK)
        carry = v >> LIMB_BITS
    return out, carry


def _sub_borrow(a_digits, b_digits):
    """a - b over 16-bit digit lists. Returns (digits, borrow_out in {0,1})."""
    out = []
    borrow = _u(0)
    base = np.uint32(1 << LIMB_BITS)
    for ai, bi in zip(a_digits, b_digits):
        t = ai + base - bi - borrow  # in [1, 2^17)
        out.append(t & _MASK)
        borrow = _u(1) - (t >> LIMB_BITS)
    return out, borrow


def _add_digits(a_digits, b_digits):
    """a + b over 16-bit digit lists, dropping the final carry."""
    out, _ = _carry_propagate([ai + bi for ai, bi in zip(a_digits, b_digits)])
    return out


def _split(a):
    return [a[i] for i in range(NLIMBS)]


def _stack(digits):
    return jnp.stack(digits, axis=0)


def _cond_sub_p(spec: FieldSpec, digits):
    """Reduce a 16-digit value in [0, 2p) to [0, p) branch-free."""
    p_digits = [np.uint32(x) for x in spec.p_limbs]
    diff, borrow = _sub_borrow(digits, p_digits)
    # borrow == 0  =>  value >= p  =>  take the difference
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, d, s) for d, s in zip(digits, diff)]


# ---------------------------------------------------------------------------
# add / sub / neg
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def fadd(spec: FieldSpec, a, b):
    s, _ = _carry_propagate([x + y for x, y in zip(_split(a), _split(b))])
    return _stack(_cond_sub_p(spec, s))


@functools.partial(jax.jit, static_argnums=0)
def fsub(spec: FieldSpec, a, b):
    d, borrow = _sub_borrow(_split(a), _split(b))
    p_digits = [np.uint32(x) for x in spec.p_limbs]
    dp = _add_digits(d, p_digits)
    need_p = borrow.astype(jnp.bool_)
    return _stack([jnp.where(need_p, x, y) for x, y in zip(dp, d)])


@functools.partial(jax.jit, static_argnums=0)
def fneg(spec: FieldSpec, a):
    d, _ = _sub_borrow([np.uint32(x) for x in spec.p_limbs], _split(a))
    z = is_zero(a)
    return _stack([jnp.where(z, jnp.zeros_like(x), x) for x in d])


def fdbl(spec: FieldSpec, a):
    return fadd(spec, a, a)


def is_zero(a):
    z = a[0] == 0
    for i in range(1, NLIMBS):
        z = z & (a[i] == 0)
    return z


def select(cond, a, b):
    """Elementwise select between two limb arrays (cond broadcast over batch)."""
    return jnp.where(cond[None, ...], a, b)


# ---------------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------------

def _pallas_enabled() -> bool:
    # Re-evaluated per call (jax caches backend resolution): the dryrun
    # switches the process from the axon TPU to a virtual CPU mesh mid-run,
    # and a cached True here would route CPU work into TPU-only Pallas.
    from .pallas_kernels import backend_is_tpu

    return backend_is_tpu()


@functools.partial(jax.jit, static_argnums=0)
def fmul(spec: FieldSpec, a, b):
    """Montgomery product: returns a*b/R mod p, inputs/outputs in [0, p).

    On the TPU backend the whole product runs as one tiled Pallas kernel
    (fields/pallas_kernels.py); elsewhere it lowers to the fused jnp graph
    below.  The two paths are bit-identical (tests/test_pallas_kernels.py).
    """
    if _pallas_enabled() and a.shape == b.shape and a.ndim >= 2:
        from .pallas_kernels import mont_mul_flat

        batch = a.shape[1:]
        out = mont_mul_flat(spec, a.reshape(NLIMBS, -1), b.reshape(NLIMBS, -1))
        return out.reshape((NLIMBS,) + batch)
    # Coarse (SOS) Montgomery reduction, sized for small compiled graphs:
    #   T = a*b                (one big product, columns via two gathers)
    #   m = (T mod R) * n' mod R   (n' = -p^{-1} mod R; one low product)
    #   result = (T + m*p) / R     (one full product + carry chain)
    # ~270 HLO ops vs ~700 for word-by-word REDC; all column accumulators stay
    # lazily-carried uint32 (<= 32 terms of < 2^16 each).
    t = _product_columns(a, b)  # 32 lazy columns of T = a*b

    # m = (T mod R) * n' mod R: normalize the low half first so the next
    # product's operands are true 16-bit digits.
    t_lo, _ = _carry_propagate(t[:NLIMBS])
    nprime = jnp.asarray(spec.nprime_limbs).reshape(
        (NLIMBS,) + (1,) * (a.ndim - 1)
    )
    m_cols = _product_columns_low(_stack(t_lo), jnp.broadcast_to(nprime, a.shape))
    m, _ = _carry_propagate(m_cols)  # 16 digits of m (carry out of R dropped)

    # U = m * p; S = T + U is divisible by R, result = S / R < 2p.
    p_arr = jnp.asarray(spec.p_limbs).reshape((NLIMBS,) + (1,) * (a.ndim - 1))
    u = _product_columns(_stack(m), jnp.broadcast_to(p_arr, a.shape))
    s = [x + y for x, y in zip(t, u)]
    carry = _u(0)
    for i in range(NLIMBS):  # low half: digits are zero, keep the carry
        carry = (s[i] + carry) >> LIMB_BITS
    s[NLIMBS] = s[NLIMBS] + carry
    hi, _ = _carry_propagate(s[NLIMBS:])
    return _stack(_cond_sub_p(spec, hi))


@functools.lru_cache(maxsize=None)
def _anti_diagonal_indices(ncols: int, shift: int) -> np.ndarray:
    """(16, ncols) gather map: entry [i, c] = (c - i - shift) mod 32, pointing
    into a (16, 32) array whose upper half [.., 16:] is zeros — out-of-range
    anti-diagonal terms land there."""
    i = np.arange(NLIMBS)[:, None]
    c = np.arange(ncols)[None, :]
    return ((c - i - shift) % (2 * NLIMBS)).astype(np.int32)


def _columns_from_prods(prods, ncols: int):
    """prods: (16, 16, ...) uint32 limb products -> list of ncols lazy column
    sums of the double-width number (lo parts at i+j, hi parts at i+j+1)."""
    lo = prods & _MASK
    hi = prods >> LIMB_BITS
    z = jnp.zeros_like(lo)
    zlo = jnp.concatenate([lo, z], axis=1)  # (16, 32, ...)
    zhi = jnp.concatenate([hi, z], axis=1)
    rows = np.arange(NLIMBS)[:, None]
    glo = zlo[rows, _anti_diagonal_indices(ncols, 0)]  # (16, ncols, ...)
    ghi = zhi[rows, _anti_diagonal_indices(ncols, 1)]
    cols = glo.sum(axis=0) + ghi.sum(axis=0)  # (ncols, ...)
    return [cols[k] for k in range(ncols)]


def _product_columns(a, b):
    """Full 32-column lazy product of two (16, ...) limb arrays."""
    return _columns_from_prods(a[:, None] * b[None, :], 2 * NLIMBS)


def _product_columns_low(a, b):
    """Low 16 columns of the product (the mod-2^256 part)."""
    return _columns_from_prods(a[:, None] * b[None, :], NLIMBS)


def fsquare(spec: FieldSpec, a):
    return fmul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    """Canonical limbs -> Montgomery form (multiply by R^2)."""
    r2 = jnp.asarray(spec.r2_limbs).reshape((NLIMBS,) + (1,) * (a.ndim - 1))
    return fmul(spec, a, jnp.broadcast_to(r2, a.shape))

def from_mont(spec: FieldSpec, a):
    """Montgomery form -> canonical limbs (REDC with 1)."""
    one = np.zeros((NLIMBS,), dtype=np.uint32)
    one[0] = 1
    o = jnp.asarray(one).reshape((NLIMBS,) + (1,) * (a.ndim - 1))
    return fmul(spec, a, jnp.broadcast_to(o, a.shape))


# ---------------------------------------------------------------------------
# pow / inverse
# ---------------------------------------------------------------------------

def fpow_const(spec: FieldSpec, a, e: int):
    """a^e for a static Python-int exponent.

    Small exponents unroll at trace time; large ones (field inversions etc.)
    run as a fori_loop over the exponent bits so the compiled graph stays at
    two fmuls regardless of exponent size.
    """
    one = jnp.broadcast_to(
        jnp.asarray(spec.r_limbs).reshape((NLIMBS,) + (1,) * (a.ndim - 1)), a.shape
    )
    if e == 0:
        return one
    nbits = e.bit_length()
    if nbits <= 8:
        acc = None
        base = a
        while e:
            if e & 1:
                acc = base if acc is None else fmul(spec, acc, base)
            e >>= 1
            if e:
                base = fsquare(spec, base)
        return acc

    bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=jnp.bool_)

    def body(i, carry):
        acc, base = carry
        bit = bits[i]
        acc = jnp.where(bit, fmul(spec, acc, base), acc)
        base = fsquare(spec, base)
        return acc, base

    acc, _ = jax.lax.fori_loop(0, nbits, body, (one, a))
    return acc


@functools.partial(jax.jit, static_argnums=0)
def finv(spec: FieldSpec, a):
    """Batched inverse via Fermat: a^(p-2).  Maps 0 -> 0 (like batch usage in
    the reference where zero denominators are structurally excluded)."""
    return fpow_const(spec, a, spec.p - 2)


@functools.partial(jax.jit, static_argnums=0)
def batch_inv(spec: FieldSpec, a):
    """Montgomery-trick batched inversion over axis 1 of a (16, n) array.

    Cost: two associative scans of field muls + one Fermat inversion of the
    total product, instead of n Fermat inversions.  Requires all entries
    nonzero (reference batch_invert has the same contract, poly.rs:180-209).
    """
    n = a.shape[1]
    if n == 1:
        return finv(spec, a)
    # scans over the batch axis: move batch to axis 0 for associative_scan
    at = jnp.moveaxis(a, 1, 0)  # (n, 16, ...)
    prefix = jax.lax.associative_scan(lambda x, y: _scan_mul(spec, x, y), at)
    suffix = jax.lax.associative_scan(lambda x, y: _scan_mul(spec, x, y), at, reverse=True)
    total = prefix[-1]
    total_inv = finv(spec, total)  # (16, ...)
    one = jnp.asarray(spec.r_limbs).reshape((NLIMBS,) + (1,) * (a.ndim - 2))
    # inv_i = prefix_{i-1} * suffix_{i+1} * total_inv
    pre = jnp.concatenate([jnp.broadcast_to(one, (1,) + prefix.shape[1:]), prefix[:-1]], axis=0)
    suf = jnp.concatenate([suffix[1:], jnp.broadcast_to(one, (1,) + suffix.shape[1:])], axis=0)
    part = jax.vmap(lambda x, y: fmul(spec, x, y))(pre, suf)
    out = jax.vmap(lambda x: fmul(spec, x, total_inv))(part)
    return jnp.moveaxis(out, 0, 1)


def _scan_mul(spec: FieldSpec, x, y):
    """fmul with the limb axis at position 1 (batch leading), for scans."""
    return jnp.moveaxis(
        fmul(spec, jnp.moveaxis(x, 0, 1), jnp.moveaxis(y, 0, 1)), 1, 0
    )
