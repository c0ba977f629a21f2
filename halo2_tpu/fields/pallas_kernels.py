"""Pallas TPU kernels for Montgomery limb arithmetic.

The pure-jnp path in fields/limb.py emits ~1.5k u32 HLO ops per multiply;
under big prover graphs that bloats XLA compile times and risks HBM
round-trips between op clusters.  These kernels fuse one whole Montgomery
multiply (schoolbook + word-by-word REDC + carry normalization + conditional
subtract) into a single VMEM-resident Pallas kernel, tiled along the batch
axis so each grid cell works on a (16, TILE) block.

Used on the TPU backend only (fields/limb.py dispatches); CPU tests keep the
pure-jnp path, and `mont_mul_reference` golden tests pin the two paths to
identical outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import LIMB_BITS, LIMB_MASK, NLIMBS, FieldSpec

TILE = 512  # lanes per grid cell; (16, 512) u32 = 32 KiB per operand in VMEM
_MASK = np.uint32(LIMB_MASK)


def _mont_mul_block(spec: FieldSpec, a, b):
    """One (16, T) x (16, T) Montgomery product, pure jnp (runs inside the
    kernel).  Mirrors fields/limb.py fmul exactly."""
    prods = a[:, None] * b[None, :]  # (16, 16, T)
    lo = prods & _MASK
    hi = prods >> LIMB_BITS
    cols = None
    for i in range(NLIMBS):
        row = jnp.pad(lo[i], ((i, NLIMBS - i), (0, 0)))
        rowh = jnp.pad(hi[i], ((i + 1, NLIMBS - 1 - i), (0, 0)))
        contrib = row + rowh
        cols = contrib if cols is None else cols + contrib
    t = [cols[k] for k in range(2 * NLIMBS)]

    n0 = np.uint32(spec.n0)
    p_digits = [np.uint32(x) for x in spec.p_limbs]
    for i in range(NLIMBS):
        m = (t[i] * n0) & _MASK
        prod0 = m * p_digits[0]
        low = t[i] + (prod0 & _MASK)
        t[i + 1] = t[i + 1] + (low >> LIMB_BITS) + (prod0 >> LIMB_BITS)
        for j in range(1, NLIMBS):
            prod = m * p_digits[j]
            t[i + j] = t[i + j] + (prod & _MASK)
            t[i + j + 1] = t[i + j + 1] + (prod >> LIMB_BITS)

    # carry-normalize the high half
    out = []
    carry = None
    for d in t[NLIMBS:]:
        v = d if carry is None else d + carry
        out.append(v & _MASK)
        carry = v >> LIMB_BITS

    # conditional subtract p
    diff = []
    borrow = jnp.zeros_like(out[0])
    base = np.uint32(1 << LIMB_BITS)
    for ai, bi in zip(out, p_digits):
        tt = ai + base - bi - borrow
        diff.append(tt & _MASK)
        borrow = np.uint32(1) - (tt >> LIMB_BITS)
    keep = borrow.astype(jnp.bool_)
    return jnp.stack([jnp.where(keep, d, s) for d, s in zip(out, diff)], axis=0)


def _mont_mul_kernel(spec: FieldSpec, a_ref, b_ref, o_ref):
    o_ref[:, :] = _mont_mul_block(spec, a_ref[:, :], b_ref[:, :])


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul_pallas(
    spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Montgomery product of (16, n) u32 limb arrays as a tiled Pallas kernel.

    n is padded up to a TILE multiple; grid cells stream (16, TILE) blocks
    through VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert a.shape == b.shape and a.shape[0] == NLIMBS and a.ndim == 2
    n = a.shape[1]
    padded = max(TILE, ((n + TILE - 1) // TILE) * TILE)
    if padded != n:
        a = jnp.pad(a, ((0, 0), (0, padded - n)))
        b = jnp.pad(b, ((0, 0), (0, padded - n)))

    grid = (padded // TILE,)
    out = pl.pallas_call(
        functools.partial(_mont_mul_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, padded), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((NLIMBS, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (NLIMBS, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(a, b)
    return out[:, :n]


ROWS_PER_TILE = 8


def _mont_mul_rows_kernel(spec: FieldSpec, a_ref, b_ref, o_ref):
    from . import vreg

    a = [a_ref[i] for i in range(NLIMBS)]
    b = [b_ref[i] for i in range(NLIMBS)]
    out = vreg.vmul(spec, a, b)
    for i in range(NLIMBS):
        o_ref[i] = out[i]


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul_rows(
    spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Montgomery product of (16, R, 128) u32 arrays, one fused kernel.

    Row-major vreg layout (see fields/vreg.py): limb i of row tile r is a
    clean (8, 128) vreg, so the whole multiply is straight-line VPU code with
    no sublane relayouts — measured ~50x faster than the (16, n) lane-tiled
    kernel above at width 2^16.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert a.shape == b.shape and a.shape[0] == NLIMBS and a.ndim == 3
    r = a.shape[1]
    pr = (-r) % ROWS_PER_TILE
    if pr:
        a = jnp.pad(a, ((0, 0), (0, pr), (0, 0)))
        b = jnp.pad(b, ((0, 0), (0, pr), (0, 0)))
    rp = a.shape[1]
    spec_rows = pl.BlockSpec(
        (NLIMBS, ROWS_PER_TILE, a.shape[2]),
        lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_mont_mul_rows_kernel, spec),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        grid=(rp // ROWS_PER_TILE,),
        in_specs=[spec_rows, spec_rows],
        out_specs=spec_rows,
        interpret=interpret,
    )(a, b)
    return out[:, :r]


@functools.partial(jax.jit, static_argnums=0)
def mont_mul_flat(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product of (16, n) arrays via the rows-layout kernel.

    Pads n to a lane multiple and reshapes through the (16, n/128, 128) vreg
    layout; ~40x faster than the lane-tiled ``mont_mul_pallas`` at n = 2^16
    (sublane relayouts dominate that kernel's runtime).
    """
    n = a.shape[1]
    pad = (-n) % 128
    if pad:
        a = jnp.pad(a, ((0, 0), (0, pad)))
        b = jnp.pad(b, ((0, 0), (0, pad)))
    np_ = a.shape[1]
    out = mont_mul_rows(
        spec, a.reshape(NLIMBS, np_ // 128, 128), b.reshape(NLIMBS, np_ // 128, 128)
    )
    return out.reshape(NLIMBS, np_)[:, :n]


def backend_is_tpu() -> bool:
    import os

    if os.environ.get("HALO2_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
