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


def _select_pt(cond, p: Point, q: Point) -> Point:
    return Point(
        limb.select(cond, p.x, q.x),
        limb.select(cond, p.y, q.y),
        limb.select(cond, p.z, q.z),
    )


def _pad_pow2(spec: CurveSpec, pts: Point, m: int) -> Point:
    n = pts.x.shape[-1]
    if m == n:
        return pts
    ident = identity(spec, (m - n,))
    return Point(
        jnp.concatenate([pts.x, ident.x], axis=-1),
        jnp.concatenate([pts.y, ident.y], axis=-1),
        jnp.concatenate([pts.z, ident.z], axis=-1),
    )


def _scan_points(spec: CurveSpec, pts: Point) -> Point:
    """Inclusive prefix scan under complete EC addition along the last axis.

    Two-level blocked scan sized for both compile time and work: the array is
    viewed as an (R, C) row-major grid; a ``fori_loop`` sweeps the C columns
    sequentially (one compiled add instance, R-wide lanes), then per-row
    offsets (an exclusive Hillis scan over the R axis, one more instance)
    are broadcast-added.  Total work ~2n + R·logR complete adds, depth
    C + log R, and THREE compiled add instances regardless of n —
    ``associative_scan`` put ~2·log2(n) adds into the graph, which dominated
    XLA compile time for the big-field limb kernels.

    The grid is deliberately wide-R / short-C (C ≈ 32): every sequential step
    is then a ≥2048-lane EC add, so the VPU stays saturated and the depth per
    scan stays ~45 instead of the ~260 a square grid gives at n = 2^16.
    """
    n = pts.x.shape[-1]
    if n == 1:
        return pts
    m = 1 << max(n - 1, 0).bit_length()
    pts = _pad_pow2(spec, pts, m)
    logm = m.bit_length() - 1
    c = min(32, 1 << (logm // 2))
    r = m // c
    x = pts.x.reshape(NLIMBS, r, c)
    y = pts.y.reshape(NLIMBS, r, c)
    z = pts.z.reshape(NLIMBS, r, c)

    def col(j, g):
        gx, gy, gz = g
        prev = Point(
            jax.lax.dynamic_slice(gx, (0, 0, j - 1), (NLIMBS, r, 1)),
            jax.lax.dynamic_slice(gy, (0, 0, j - 1), (NLIMBS, r, 1)),
            jax.lax.dynamic_slice(gz, (0, 0, j - 1), (NLIMBS, r, 1)),
        )
        cur = Point(
            jax.lax.dynamic_slice(gx, (0, 0, j), (NLIMBS, r, 1)),
            jax.lax.dynamic_slice(gy, (0, 0, j), (NLIMBS, r, 1)),
            jax.lax.dynamic_slice(gz, (0, 0, j), (NLIMBS, r, 1)),
        )
        s = ec_add(spec, cur, prev)
        return (
            jax.lax.dynamic_update_slice(gx, s.x, (0, 0, j)),
            jax.lax.dynamic_update_slice(gy, s.y, (0, 0, j)),
            jax.lax.dynamic_update_slice(gz, s.z, (0, 0, j)),
        )

    x, y, z = jax.lax.fori_loop(1, c, col, (x, y, z))

    # exclusive scan of row totals (= last column) over the small R axis
    tot = Point(x[:, :, -1], y[:, :, -1], z[:, :, -1])
    idx = jnp.arange(r, dtype=jnp.int32)
    ident = identity(spec, (r,))

    def level(l, p):
        src = idx - (jnp.int32(1) << l)
        valid = src >= 0
        srcc = jnp.clip(src, 0, r - 1)
        q = _select_pt(valid, Point(p.x[:, srcc], p.y[:, srcc], p.z[:, srcc]), ident)
        return ec_add(spec, p, q)

    inc = jax.lax.fori_loop(0, max(r - 1, 0).bit_length(), level, tot)
    exc = _select_pt(
        idx >= 1,
        Point(
            inc.x[:, jnp.clip(idx - 1, 0, r - 1)],
            inc.y[:, jnp.clip(idx - 1, 0, r - 1)],
            inc.z[:, jnp.clip(idx - 1, 0, r - 1)],
        ),
        ident,
    )
    out = ec_add(
        spec,
        Point(x, y, z),
        Point(exc.x[:, :, None], exc.y[:, :, None], exc.z[:, :, None]),
    )
    return Point(
        out.x.reshape(NLIMBS, m)[:, :n],
        out.y.reshape(NLIMBS, m)[:, :n],
        out.z.reshape(NLIMBS, m)[:, :n],
    )


def _reduce_points(spec: CurveSpec, pts: Point) -> Point:
    """Sum along the last axis: sequential column fold over an (R, C) grid
    (one compiled add instance, work n) + XOR-partner fold of the R row sums
    (one more instance, work R·log R)."""
    n = pts.x.shape[-1]
    m = 1 << max(n - 1, 0).bit_length()
    pts = _pad_pow2(spec, pts, m)
    logm = m.bit_length() - 1
    c = min(16, 1 << (logm // 2))
    r = m // c
    if c > 1:
        x = pts.x.reshape(NLIMBS, r, c)
        y = pts.y.reshape(NLIMBS, r, c)
        z = pts.z.reshape(NLIMBS, r, c)
        acc0 = Point(x[:, :, 0], y[:, :, 0], z[:, :, 0])

        def col(j, acc):
            cur = Point(
                jax.lax.dynamic_slice(x, (0, 0, j), (NLIMBS, r, 1))[:, :, 0],
                jax.lax.dynamic_slice(y, (0, 0, j), (NLIMBS, r, 1))[:, :, 0],
                jax.lax.dynamic_slice(z, (0, 0, j), (NLIMBS, r, 1))[:, :, 0],
            )
            return ec_add(spec, acc, cur)

        rows = jax.lax.fori_loop(1, c, col, acc0)
    else:
        rows = pts

    nr = rows.x.shape[-1]
    idx = jnp.arange(nr, dtype=jnp.int32)

    def level(l, p):
        partner = idx ^ (jnp.int32(1) << l)
        q = Point(p.x[:, partner], p.y[:, partner], p.z[:, partner])
        return ec_add(spec, p, q)

    out = jax.lax.fori_loop(0, max(nr - 1, 0).bit_length(), level, rows)
    return Point(out.x[:, 0], out.y[:, 0], out.z[:, 0])


def _small_scalar_mul(spec: CurveSpec, k: int, p: Point) -> Point:
    """k * P for a static small non-negative int k (double-and-add, unrolled
    over k's ~c bits)."""
    acc = None
    base = p
    while k:
        if k & 1:
            acc = base if acc is None else ec_add(spec, acc, base)
        k >>= 1
        if k:
            base = ec_double(spec, base)
    return acc if acc is not None else identity(spec, p.x.shape[1:])


def _window_sum(spec: CurveSpec, digits, px, py, pz, c: int):
    """Sum of digit_i * P_i for one window; returns a single point (x, y, z).

    Bucket sums come from one inclusive prefix scan over digit-sorted points
    (segment boundaries via searchsorted); the weighted bucket fold uses the
    telescoped identity

        sum_{j=1}^{nb-1} j * B_j = (nb-1) * E_{nb-1} - sum_{j=0}^{nb-2} E_j

    where E_j is the scan value at the end of bucket j (E_{nb-1} = total sum),
    so no suffix scan or per-bucket differences are needed.
    """
    n = digits.shape[0]
    order = jnp.argsort(digits)
    sd = digits[order]
    pts = Point(px[:, order], py[:, order], pz[:, order])

    prefix = _scan_points(spec, pts)

    nb = 1 << c
    # e_j = last sorted index with digit <= j (may be -1), for j = 0..nb-2
    ends = jnp.searchsorted(sd, jnp.arange(nb - 1, dtype=jnp.int32), side="right") - 1
    safe = jnp.clip(ends, 0, n - 1)
    ident = identity(spec, (nb - 1,))
    at_ends = _select_pt(
        ends >= 0,
        Point(prefix.x[:, safe], prefix.y[:, safe], prefix.z[:, safe]),
        ident,
    )
    total = Point(prefix.x[:, -1], prefix.y[:, -1], prefix.z[:, -1])
    # (nb-1)*T = 2^c*T - T: c doublings + one subtract (vs ~2c double-and-add)
    t2c = total
    for _ in range(c):
        t2c = ec_double(spec, t2c)
    acc = ec_add(
        spec,
        ec_add(spec, t2c, ec_neg(spec, total)),
        ec_neg(spec, _reduce_points(spec, at_ends)),
    )
    return acc.x, acc.y, acc.z


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm(
    spec: CurveSpec,
    scalars_mont: jnp.ndarray,
    points: Point,
    c: int = 0,
    window_batch: int = 0,
) -> Point:
    """Multi-scalar multiplication: sum_i scalars[i] * points[i].

    scalars_mont: (16, n) Montgomery-form scalar-field limbs.
    points: batched Point over the same n.  Returns a single projective Point.

    Work ~ W·(2n + nb) complete adds with a handful of compiled add instances
    (blocked scans) — see ``_window_sum``.  Windows run ``window_batch`` at a
    time under ``lax.map`` so peak HBM is bounded by one window group's
    working set (a full-W ``vmap`` compiled to ~25 GB of live buffers at
    k=16 on a 16 GB chip); small inputs batch all windows at once.
    """
    n = scalars_mont.shape[1]
    if c == 0:
        c = choose_window(n)
    scal = limb.from_mont(spec.scalar, scalars_mont)
    digits = _extract_digits(scal, c)  # (W, n)
    num_windows = digits.shape[0]
    if window_batch == 0:
        # bound one group's working set: sorted copies + scan buffers scale
        # with n, so batch more windows only when n is small
        window_batch = max(1, min(num_windows, (1 << 14) // max(n, 1)))

    window_fn = lambda d: _window_sum(spec, d, points.x, points.y, points.z, c)
    if window_batch >= num_windows:
        wx, wy, wz = jax.vmap(window_fn)(digits)
    else:
        wx, wy, wz = jax.lax.map(
            lambda d: window_fn(d), digits, batch_size=window_batch
        )  # each (W, 16)
    wx, wy, wz = wx.T, wy.T, wz.T  # (16, W)

    # Horner fold over windows, flattened to ONE loop of total length
    # (W-1)*(c+1): step i doubles, except every (c+1)-th step which adds the
    # next window sum (nested fori_loops of EC ops compile poorly).
    def body(i, acc):
        q, r = jnp.divmod(i, c + 1)
        w = num_windows - 2 - q
        doubled = ec_double(spec, acc)
        wp = Point(wx[:, w], wy[:, w], wz[:, w])
        added = ec_add(spec, acc, wp)
        is_add = r == c
        return Point(
            limb.select(is_add, added.x, doubled.x),
            limb.select(is_add, added.y, doubled.y),
            limb.select(is_add, added.z, doubled.z),
        )

    acc0 = Point(wx[:, num_windows - 1], wy[:, num_windows - 1], wz[:, num_windows - 1])
    if num_windows == 1:
        return acc0
    return jax.lax.fori_loop(0, (num_windows - 1) * (c + 1), body, acc0)
