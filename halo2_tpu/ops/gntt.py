"""Radix-2 NTT over *curve points* (additive group transform).

The reference's ``best_fft`` is generic over ``halo2curves::Group``, so the
same FFT runs over scalars and over curve points — used by ``g_to_lagrange``
(arithmetic.rs:277-301) to convert the IPA monomial SRS into the Lagrange SRS.
Here the butterfly is: t = twiddle * hi (a per-lane scalar multiplication),
out0 = lo + t, out1 = lo - t; all lanes ride the batch axis via the branch-free
double-and-add kernel (ops/scalar_mul.py) and complete-formula adds.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..curves.point import Point, ec_add, ec_neg
from ..curves.spec import CurveSpec
from ..fields import limb
from ..fields.spec import NLIMBS
from .ntt import _bitrev_indices, power_table
from .scalar_mul import batch_scalar_mul


def _gather(p: Point, idx) -> Point:
    return Point(p.x[:, idx], p.y[:, idx], p.z[:, idx])


def group_ntt(spec: CurveSpec, points: Point, twiddles: jnp.ndarray, k: int) -> Point:
    """DFT of a batched Point array of length 2^k over the scalar field.

    ``twiddles``: (16, 2^(k-1)) Montgomery power table of the domain generator.
    """
    n = 1 << k
    a = _gather(points, _bitrev_indices(k))
    for s in range(1, k + 1):
        half = 1 << (s - 1)
        stride = 1 << (k - s)
        tw = twiddles[:, ::stride][:, :half]  # (16, half)
        groups = n // (2 * half)
        lo = Point(
            a.x.reshape(NLIMBS, groups, 2, half)[:, :, 0, :].reshape(NLIMBS, n // 2),
            a.y.reshape(NLIMBS, groups, 2, half)[:, :, 0, :].reshape(NLIMBS, n // 2),
            a.z.reshape(NLIMBS, groups, 2, half)[:, :, 0, :].reshape(NLIMBS, n // 2),
        )
        hi = Point(
            a.x.reshape(NLIMBS, groups, 2, half)[:, :, 1, :].reshape(NLIMBS, n // 2),
            a.y.reshape(NLIMBS, groups, 2, half)[:, :, 1, :].reshape(NLIMBS, n // 2),
            a.z.reshape(NLIMBS, groups, 2, half)[:, :, 1, :].reshape(NLIMBS, n // 2),
        )
        tw_full = jnp.tile(tw, (1, groups))
        t = batch_scalar_mul(spec, tw_full, hi)
        out0 = ec_add(spec, lo, t)
        out1 = ec_add(spec, lo, ec_neg(spec, t))

        def interleave(p0, p1):
            x = jnp.stack(
                [p0.reshape(NLIMBS, groups, half), p1.reshape(NLIMBS, groups, half)],
                axis=2,
            )
            return x.reshape(NLIMBS, n)

        a = Point(
            interleave(out0.x, out1.x),
            interleave(out0.y, out1.y),
            interleave(out0.z, out1.z),
        )
    return a


def g_to_lagrange(spec: CurveSpec, g: Point, k: int) -> Point:
    """Monomial-basis SRS -> Lagrange-basis SRS (arithmetic.rs:277-301):
    inverse group NTT with omega^-1 twiddles, scaled by 1/n."""
    fr = spec.scalar
    n = 1 << k
    omega_inv = pow(pow(fr.root_of_unity, 1 << (fr.s - k), fr.p), -1, fr.p)
    tw_inv = power_table(fr, omega_inv, max(n // 2, 1))
    out = group_ntt(spec, g, tw_inv, k)
    n_inv = pow(n, -1, fr.p)
    scale = jnp.broadcast_to(
        limb.from_int(fr, n_inv).reshape(NLIMBS, 1), (NLIMBS, n)
    )
    return batch_scalar_mul(spec, scale, out)
