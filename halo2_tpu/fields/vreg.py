"""Register-resident Montgomery field arithmetic: one array per limb.

The (16, n) limb-major layout in :mod:`fields.limb` puts the limb axis on TPU
*sublanes*, so cross-limb ops (pads, shifts, column gathers) compile to Mosaic
sublane relayouts — measured ~40 ms for a single width-65536 fmul, ~1000x off
VPU speed-of-light.  This module instead represents a field element batch as a
**Python list of 16 same-shaped uint32 arrays**, one per limb.  All cross-limb
indexing happens at trace time; every emitted op is a plain elementwise VPU op
on identically-shaped arrays, so Mosaic never moves data across sublanes.

The functions are pure jnp and run identically:
  * inside Pallas TPU kernels (curves/pallas_ec.py) on (rows, 128) vreg tiles,
  * as regular XLA ops on any backend (CPU tests, interpret mode).

Same algorithms as fields/limb.py (16x16-bit limbs, word-by-word Montgomery
REDC, lazy uint32 column accumulation — every intermediate stays < 2^24), so
outputs are bit-identical to the limb-major path; tests pin this.

TPU-native replacement for the reference's ``halo2curves`` field backend
(SURVEY.md §2.12, halo2curves ff impls); the hot-loop design (unrolled limbs,
branch-free conditional subtract) mirrors what the reference gets from Rust
codegen, re-derived for a 128-lane vector unit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .spec import LIMB_BITS, LIMB_MASK, NLIMBS, FieldSpec

_MASK = np.uint32(LIMB_MASK)
_BASE = np.uint32(1 << LIMB_BITS)
_ONE = np.uint32(1)

Limbs = list  # list of NLIMBS uint32 arrays, all the same shape


def splat(shape, limbs16) -> Limbs:
    """Broadcast a host (16,) uint32 limb vector to a Limbs batch of `shape`."""
    return [jnp.full(shape, np.uint32(v), dtype=jnp.uint32) for v in limbs16]


def from_array(a) -> Limbs:
    """(16, ...) limb-major array -> Limbs list (16 slices)."""
    return [a[i] for i in range(NLIMBS)]


def to_array(a: Limbs):
    return jnp.stack(a, axis=0)


def vselect(cond, a: Limbs, b: Limbs) -> Limbs:
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _cond_sub_p(spec: FieldSpec, a: Limbs) -> Limbs:
    """Reduce a value in [0, 2p) to [0, p): branch-free subtract-if-ge."""
    p = [np.uint32(x) for x in spec.p_limbs]
    diff = []
    borrow = None
    for ai, pi in zip(a, p):
        t = ai + (_BASE - pi) if borrow is None else ai + (_BASE - pi) - borrow
        diff.append(t & _MASK)
        borrow = _ONE - (t >> LIMB_BITS)
    keep = borrow.astype(jnp.bool_)  # borrow==1 => a < p => keep a
    return [jnp.where(keep, x, d) for x, d in zip(a, diff)]


def vadd(spec: FieldSpec, a: Limbs, b: Limbs) -> Limbs:
    out = []
    carry = None
    for ai, bi in zip(a, b):
        v = ai + bi if carry is None else ai + bi + carry
        out.append(v & _MASK)
        carry = v >> LIMB_BITS
    return _cond_sub_p(spec, out)


def vsub(spec: FieldSpec, a: Limbs, b: Limbs) -> Limbs:
    p = [np.uint32(x) for x in spec.p_limbs]
    d = []
    borrow = None
    for ai, bi in zip(a, b):
        t = ai + _BASE - bi if borrow is None else ai + _BASE - bi - borrow
        d.append(t & _MASK)
        borrow = _ONE - (t >> LIMB_BITS)
    need_p = borrow.astype(jnp.bool_)
    # a - b + p where it underflowed
    dp = []
    carry = None
    for di, pi in zip(d, p):
        v = di + pi if carry is None else di + pi + carry
        dp.append(v & _MASK)
        carry = v >> LIMB_BITS
    return [jnp.where(need_p, x, y) for x, y in zip(dp, d)]


def vneg(spec: FieldSpec, a: Limbs) -> Limbs:
    """p - a, with 0 -> 0."""
    p = [np.uint32(x) for x in spec.p_limbs]
    d = []
    borrow = None
    for pi, ai in zip(p, a):
        t = pi + _BASE - ai if borrow is None else pi + _BASE - ai - borrow
        d.append(t & _MASK)
        borrow = _ONE - (t >> LIMB_BITS)
    z = a[0] == 0
    for i in range(1, NLIMBS):
        z = z & (a[i] == 0)
    return [jnp.where(z, jnp.zeros_like(x), x) for x in d]


def vdbl(spec: FieldSpec, a: Limbs) -> Limbs:
    return vadd(spec, a, a)


def vmul_small(spec: FieldSpec, a: Limbs, k: int) -> Limbs:
    """k*a for a small static positive int via double-and-add of vadds.

    Cheaper than a full vmul for k like 9 (= 3b for BN254): 4 vadds (~600
    vector ops) vs ~2600 for a Montgomery multiply.
    """
    assert k >= 1
    acc = None
    base = a
    while k:
        if k & 1:
            acc = base if acc is None else vadd(spec, acc, base)
        k >>= 1
        if k:
            base = vadd(spec, base, base)
    return acc


def vmul(spec: FieldSpec, a: Limbs, b: Limbs) -> Limbs:
    """Montgomery product a*b/R mod p; inputs/outputs normalized in [0, p).

    Schoolbook 16x16 product with lazy uint32 column accumulation (each
    column sums < 2^24), then word-by-word REDC (matches the proof sketch in
    fields/pallas_kernels.py; the reference's Rust equivalent is halo2curves'
    64-bit CIOS `montgomery_reduce`).
    """
    t = [None] * (2 * NLIMBS)

    def acc(k, v):
        t[k] = v if t[k] is None else t[k] + v

    for i in range(NLIMBS):
        ai = a[i]
        for j in range(NLIMBS):
            prod = ai * b[j]
            acc(i + j, prod & _MASK)
            acc(i + j + 1, prod >> LIMB_BITS)

    n0 = np.uint32(spec.n0)
    p = [np.uint32(x) for x in spec.p_limbs]
    for i in range(NLIMBS):
        m = (t[i] * n0) & _MASK
        prod0 = m * p[0]
        low = t[i] + (prod0 & _MASK)
        t[i + 1] = t[i + 1] + ((low >> LIMB_BITS) + (prod0 >> LIMB_BITS))
        for j in range(1, NLIMBS):
            prod = m * p[j]
            t[i + j] = t[i + j] + (prod & _MASK)
            t[i + j + 1] = t[i + j + 1] + (prod >> LIMB_BITS)

    out = []
    carry = None
    for d in t[NLIMBS:]:
        v = d if carry is None else d + carry
        out.append(v & _MASK)
        carry = v >> LIMB_BITS
    return _cond_sub_p(spec, out)


def vsquare(spec: FieldSpec, a: Limbs) -> Limbs:
    return vmul(spec, a, a)
