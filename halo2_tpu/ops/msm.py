"""Multi-scalar multiplication: signed-digit Straus windows, batched on TPU.

TPU-native replacement for the reference ``best_multiexp`` (arithmetic.rs:
16-159).  The reference runs serial Pippenger bucket loops per rayon thread;
bucket scatter (and the sort+scan variant this repo shipped through round 3)
is hostile to this hardware — measured on-chip: argsort(2^16) 18 ms and a
(16, 2^16) lane gather 50 ms, versus ~875 us per dispatch and ~0.5 T u32
ops/s on the VPU.  So the MSM here is **sort-free and gather-free**:

  1. scalars -> signed c-bit digits d in [-2^(c-1), 2^(c-1)]   (vector ops)
  2. table T_j = j*P_i for j = 0..2^(c-1) (halved by the sign bit)
  3. per window w: select T_|d| (where-chain over the tiny j axis),
     negate y where d < 0 — all windows stacked into one batch
  4. one pairwise tree-fold over the point axis, ALL windows at once —
     log2(n) launches of the fused complete-add Pallas kernel
     (curves/pallas_ec.py), each a single wide VMEM-resident pass
  5. window combination: every window sum doubled c*w times in parallel
     lanes (one in-jit fori_loop), then a 7-level lane tree-add

Work: (ceil(256/c) + 2^(c-1) - 1) * n complete adds (c=5: 67n), zero sorts,
zero gathers, O(log n) kernel launches.  Everything runs under one jit.

Scalars arrive in Montgomery form (like every field element on device) and
are converted to canonical form internally for digit extraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.point import Point, ec_add, ec_double, ec_neg, identity
from ..curves.spec import CurveSpec
from ..curves.pallas_ec import ec_add_rows, ec_double_rows
from ..fields import limb
from ..fields.spec import LIMB_BITS, NLIMBS, int_to_limbs

LANES = 128


def choose_window(n: int) -> int:
    """Window bits minimizing Straus work (ceil(256/c) + 2^(c-1) - 1) * n."""
    best_c, best_w = 1, None
    for c in range(1, 17):
        w = (256 + c - 1) // c + (1 << (c - 1)) - 1
        if best_w is None or w < best_w:
            best_c, best_w = c, w
    return best_c  # = 5 for the flat per-point model


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


def _signed_digits(scalars_canon: jnp.ndarray, c: int) -> jnp.ndarray:
    """(16, n) canonical limbs -> (W, n) int32 digits in [-2^(c-1), 2^(c-1)].

    Booth-style recode: digit d >= 2^(c-1) becomes d - 2^c with carry 1 into
    the next window.  Scalars are < 2^254 < 2^(cW-1), so the top window
    absorbs the final carry without overflow.
    """
    raw = _extract_digits(scalars_canon, c)
    h = 1 << (c - 1)
    full = np.int32(1 << c)
    num = raw.shape[0]
    if c * num < 257:  # c=1: the final carry needs one extra window
        num += 1
    outs = []
    carry = jnp.zeros(raw.shape[1:], jnp.int32)
    for w in range(num):
        t = (raw[w] + carry) if w < raw.shape[0] else carry
        if w == num - 1:
            # top window stays unrecoded (value in [0, h]; scalars < 2^254
            # leave enough headroom — pinned by the numpy recode model test)
            outs.append(t)
            break
        ge = t >= h
        outs.append(jnp.where(ge, t - full, t))
        carry = ge.astype(jnp.int32)
    return jnp.stack(outs, axis=0)


def _identity_rows(spec: CurveSpec, nr: int, lanes: int):
    one = np.zeros((NLIMBS, 1, 1), np.uint32)
    for i, v in enumerate(int_to_limbs(spec.base.to_mont(1))):
        one[i, 0, 0] = v
    shape = (NLIMBS, nr, lanes)
    return (
        jnp.zeros(shape, jnp.uint32),
        jnp.broadcast_to(jnp.asarray(one), shape),
        jnp.zeros(shape, jnp.uint32),
    )


def _build_table(spec: CurveSpec, pts, h: int, unroll: bool):
    """[T_0 .. T_h], T_j = j * P, each a coordinate triple of (16, nr, L).

    ``unroll`` (the TPU path, h <= 16): h-1 wide fused-add launches.
    Otherwise the stacked (16, h+1, nr, L) table builds under a fori_loop —
    one compiled add instance, which keeps XLA compile time flat in h (the
    unrolled form explodes compile for c >= 7, and costs ~10 extra compiled
    instances even at c = 5 on CPU test runs).
    """
    nr, lanes = pts[0].shape[1], pts[0].shape[2]
    if unroll and h <= 16:
        table = [_identity_rows(spec, nr, lanes), pts]
        if h >= 2:
            table.append(ec_double_rows(spec, pts))
        for _ in range(3, h + 1):
            table.append(ec_add_rows(spec, table[-1], pts))
        return table

    ident = _identity_rows(spec, nr, lanes)
    if h == 1:
        return [ident, pts]
    start = [ident, pts, ec_double_rows(spec, pts)]
    stacked = [
        jnp.concatenate(
            [e[ci][:, None] for e in start]
            + [jnp.zeros((NLIMBS, h - 2, nr, lanes), jnp.uint32)],
            axis=1,
        )
        for ci in range(3)
    ]

    def body(j, arrs):
        prev = tuple(
            jax.lax.dynamic_slice(
                a, (0, j - 1, 0, 0), (NLIMBS, 1, nr, lanes)
            )[:, 0]
            for a in arrs
        )
        nxt = ec_add_rows(spec, prev, pts)
        return tuple(
            jax.lax.dynamic_update_slice(a, x[:, None], (0, j, 0, 0))
            for a, x in zip(arrs, nxt)
        )

    return jax.lax.fori_loop(3, h + 1, body, tuple(stacked))


def _neg_y(spec: CurveSpec, y):
    return limb.fneg(spec.base, y)


def _select_window_points(spec: CurveSpec, table, digits, h: int):
    """digits: (W, nr, L) -> selected triple of (16, W*nr, L).

    h <= 16 uses an unrolled where-chain (one fused VPU pass); larger tables
    (tests exercise c up to 12) fall back to take_along_axis.
    """
    w, nr, lanes = digits.shape
    absd = jnp.abs(digits)[None]  # (1, W, nr, L)
    neg = (digits < 0)[None]

    is_list = isinstance(table, (list, tuple)) and len(table) == h + 1

    def entry(coord_idx, j):
        return table[j][coord_idx] if is_list else table[coord_idx][:, j]

    def sel(coord_idx):
        if h <= 16:
            acc = jnp.broadcast_to(
                entry(coord_idx, 0)[:, None], (NLIMBS, w, nr, lanes)
            )
            for j in range(1, h + 1):
                acc = jnp.where(absd == j, entry(coord_idx, j)[:, None], acc)
            return acc
        stacked = table[coord_idx]  # (16, h+1, nr, L) from _build_table
        idx = jnp.broadcast_to(absd[:, :, None], (NLIMBS, w, 1, nr, lanes))
        src = jnp.broadcast_to(stacked[:, None], (NLIMBS, w, h + 1, nr, lanes))
        return jnp.take_along_axis(src, idx, axis=2)[:, :, 0]

    x = sel(0)
    y = sel(1)
    z = sel(2)
    y = jnp.where(neg, _neg_y(spec, y), y)
    flat = lambda a: a.reshape(NLIMBS, w * nr, lanes)
    return flat(x), flat(y), flat(z)


def _fold_rows(spec: CurveSpec, triple, w: int):
    """Tree-fold the per-window row axis down to 1 row per window.

    triple coords: (16, w*nr, L) with window-major rows; returns (16, w, L).
    """
    nr = triple[0].shape[1] // w
    lanes = triple[0].shape[2]
    while nr > 1:
        half = nr // 2
        a, b = [], []
        for coord in triple:
            c4 = coord.reshape(NLIMBS, w, nr, lanes)
            a.append(c4[:, :, :half].reshape(NLIMBS, w * half, lanes))
            b.append(c4[:, :, half:].reshape(NLIMBS, w * half, lanes))
        triple = ec_add_rows(spec, tuple(a), tuple(b))
        nr = half
    return tuple(c.reshape(NLIMBS, w, lanes) for c in triple)


def _fold_lanes_tpu(spec: CurveSpec, triple):
    """(16, W, 128) -> (16, W): tree-add the 128 lanes of each window.

    Lane reduction via one transpose (lanes -> rows) so every add stays a
    row-sliced Pallas call.  W may exceed 128 (msm_many stacks windows of
    several columns); the post-transpose lane axis pads to a 128 multiple
    (padding is lanewise garbage on the non-folded axis — sliced off).
    """
    w = triple[0].shape[1]
    t = [jnp.swapaxes(c, 1, 2) for c in triple]  # (16, 128, W)
    wpad = (-w) % LANES
    if wpad:
        t = [jnp.pad(c, ((0, 0), (0, 0), (0, wpad))) for c in t]
    rows = LANES
    while rows > 1:
        half = rows // 2
        a = tuple(c[:, :half] for c in t)
        b = tuple(c[:, half:] for c in t)
        t = list(ec_add_rows(spec, a, b))
        rows = half
    return tuple(c[:, 0, :w] for c in t)  # (16, W)


def _fold_rows_fixed(spec: CurveSpec, triple, w: int):
    """XOR-butterfly row fold at fixed shape: ONE compiled add instance.

    Work nr*log(nr) instead of the halving fold's nr, but compile time is flat
    — the right trade on the CPU test path where nr is tiny and XLA compile
    dominates wall clock.
    """
    nr = triple[0].shape[1] // w
    lanes = triple[0].shape[2]
    if nr == 1:
        return tuple(c.reshape(NLIMBS, w, lanes) for c in triple)
    arrs = tuple(c.reshape(NLIMBS, w, nr, lanes) for c in triple)
    idx = jnp.arange(nr, dtype=jnp.int32)

    def body(l, arrs):
        perm = jnp.bitwise_xor(idx, jnp.left_shift(jnp.int32(1), l))
        flat = tuple(a.reshape(NLIMBS, w * nr, lanes) for a in arrs)
        part = tuple(
            a[:, :, perm].reshape(NLIMBS, w * nr, lanes) for a in arrs
        )
        s = ec_add_rows(spec, flat, part)
        return tuple(x.reshape(NLIMBS, w, nr, lanes) for x in s)

    arrs = jax.lax.fori_loop(0, nr.bit_length() - 1, body, arrs)
    return tuple(a[:, :, 0] for a in arrs)


def _fold_lanes_fixed(spec: CurveSpec, triple):
    """XOR-butterfly lane fold at fixed shape (one compiled add instance)."""
    lanes = triple[0].shape[2]
    if lanes == 1:
        return tuple(c[:, :, 0] for c in triple)
    idx = jnp.arange(lanes, dtype=jnp.int32)

    def body(l, arrs):
        perm = jnp.bitwise_xor(idx, jnp.left_shift(jnp.int32(1), l))
        part = tuple(a[:, :, perm] for a in arrs)
        return tuple(ec_add_rows(spec, arrs, part))

    triple = jax.lax.fori_loop(0, lanes.bit_length() - 1, body, tuple(triple))
    return tuple(c[:, :, 0] for c in triple)


def _combine_windows_tpu(spec: CurveSpec, sums, c: int) -> Point:
    """(16, W) window sums -> sum_w 2^(cw) S_w, windows in parallel lanes.

    Window w is doubled c*w times (all windows advance together under one
    in-jit fori_loop; lanes that reached their count freeze via select),
    then the lanes are tree-added.  Lanes beyond W are padded with the
    identity so the final tree-add is unaffected.
    """
    w = sums[0].shape[1]
    ix, iy, iz = _identity_rows(spec, 1, LANES)
    trip = tuple(
        jnp.concatenate([s[:, None, :], ident[:, :, w:]], axis=2)
        for s, ident in zip(sums, (ix, iy, iz))
    )  # (16, 1, 128)
    need = (jnp.arange(LANES, dtype=jnp.int32) * c)[None, None, :]  # (1,1,128)

    def body(t, trip):
        dbl = ec_double_rows(spec, trip)
        keep = t < need
        return tuple(jnp.where(keep, d, s) for d, s in zip(dbl, trip))

    trip = jax.lax.fori_loop(0, c * (w - 1), body, trip)
    # tree-add the 128 lanes (W live + identity padding): lanes -> rows
    t = [jnp.swapaxes(x, 1, 2) for x in trip]  # (16, 128, 1)
    t = [jnp.pad(x, ((0, 0), (0, 0), (0, LANES - 1))) for x in t]
    rows = LANES
    while rows > 1:
        half = rows // 2
        a = tuple(x[:, :half] for x in t)
        b = tuple(x[:, half:] for x in t)
        t = list(ec_add_rows(spec, a, b))
        rows = half
    return Point(t[0][:, 0, 0], t[1][:, 0, 0], t[2][:, 0, 0])


def _reduce_points(spec: CurveSpec, pts: Point) -> Point:
    """Sum a small batched Point along its last axis (tree fold of complete
    adds).  Used by parallel/msm.py to combine per-chip partials."""
    x, y, z = pts
    n = x.shape[-1]
    m = 1 << max(n - 1, 0).bit_length()
    if m != n:
        ident = identity(spec, x.shape[1:-1] + (m - n,))
        x = jnp.concatenate([x, ident.x], axis=-1)
        y = jnp.concatenate([y, ident.y], axis=-1)
        z = jnp.concatenate([z, ident.z], axis=-1)
    while m > 1:
        half = m // 2
        s = ec_add(
            spec,
            Point(x[..., :half], y[..., :half], z[..., :half]),
            Point(x[..., half:], y[..., half:], z[..., half:]),
        )
        x, y, z = s
        m = half
    return Point(x[..., 0], y[..., 0], z[..., 0])


def _combine_windows_horner(spec: CurveSpec, sums, c: int) -> Point:
    """Width-1 Horner fold over windows (non-TPU tail: minimal total work).

    One fori_loop of (W-1)(c+1) steps: double each step, add the next window
    sum every (c+1)-th step (flat loop: nested EC fori_loops compile poorly).
    """
    wx, wy, wz = sums
    num_windows = wx.shape[1]
    acc0 = Point(wx[:, -1], wy[:, -1], wz[:, -1])
    if num_windows == 1:
        return acc0

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

    return jax.lax.fori_loop(0, (num_windows - 1) * (c + 1), body, acc0)


def _combine_windows_grid_tpu(spec: CurveSpec, sums, c: int, m: int, w: int):
    """(16, m*w) window sums (column-major groups) -> coords (16, m).

    Like _combine_windows_tpu but for m independent columns at once: columns
    ride the row axis, the w windows of each column ride lanes.
    """
    ix, iy, iz = _identity_rows(spec, m, LANES)
    trip = tuple(
        jnp.concatenate([s.reshape(NLIMBS, m, w), ident[:, :, w:]], axis=2)
        for s, ident in zip(sums, (ix, iy, iz))
    )  # (16, m, 128)
    need = (jnp.arange(LANES, dtype=jnp.int32) * c)[None, None, :]

    def body(t, trip):
        dbl = ec_double_rows(spec, trip)
        keep = t < need
        return tuple(jnp.where(keep, d, s) for d, s in zip(dbl, trip))

    trip = jax.lax.fori_loop(0, c * (w - 1), body, trip)
    # tree-add lanes: lanes -> rows, columns -> lanes
    t = [jnp.swapaxes(x, 1, 2) for x in trip]  # (16, 128, m)
    rows = LANES
    while rows > 1:
        half = rows // 2
        a = tuple(x[:, :half] for x in t)
        b = tuple(x[:, half:] for x in t)
        t = list(ec_add_rows(spec, a, b))
        rows = half
    return tuple(x[:, 0, :m] for x in t)  # (16, m)


@functools.partial(jax.jit, static_argnums=(0, 3))
def msm_many(
    spec: CurveSpec, scalars_mont: jnp.ndarray, points: Point, c: int = 0
) -> Point:
    """m MSMs over one shared base set, in one fused pass.

    scalars_mont: (m, 16, n); points: batched Point over n.  Returns a
    batched projective Point with coordinate shape (16, m).

    The per-phase prover commitments (plonk/prover.py) use this to turn
    one-MSM-per-column (SURVEY §3.2 sync-point note, VERDICT r3 weak #5)
    into a single dispatch: the window table is built once and every
    column's windows join the same tree-fold.
    """
    m, _, n = scalars_mont.shape
    tpu = _use_tpu_layout()
    if c == 0:
        c = 5 if n >= 2048 else 4
    h = 1 << (c - 1)

    lanes = LANES if tpu else min(LANES, 1 << max(n - 1, 0).bit_length())
    npad = lanes
    while npad < n:
        npad *= 2
    nr = npad // lanes
    scal_mont = scalars_mont
    pts = tuple(points)
    if npad != n:
        scal_mont = jnp.pad(scal_mont, ((0, 0), (0, 0), (0, npad - n)))
        pts = tuple(jnp.pad(coord, ((0, 0), (0, npad - n))) for coord in pts)
    pts = tuple(coord.reshape(NLIMBS, nr, lanes) for coord in pts)

    # all m columns convert to canonical in one rows-kernel call
    scal_rows = jnp.moveaxis(scal_mont, 0, 1).reshape(NLIMBS, m * nr, lanes)
    one = np.zeros((NLIMBS, 1, 1), np.uint32)
    one[0, 0, 0] = 1
    one_b = jnp.broadcast_to(jnp.asarray(one), scal_rows.shape)
    if tpu:
        from ..fields.pallas_kernels import mont_mul_rows

        scal = mont_mul_rows(spec.scalar, scal_rows, one_b)
    else:
        from ..fields import vreg

        scal = vreg.to_array(
            vreg.vmul(spec.scalar, vreg.from_array(scal_rows), vreg.from_array(one_b))
        )

    scal4 = scal.reshape(NLIMBS, m, nr, lanes)
    digits = _signed_digits(scal4, c)  # (W, m, nr, lanes)
    w = digits.shape[0]
    digits = jnp.moveaxis(digits, 1, 0).reshape(m * w, nr, lanes)

    table = _build_table(spec, pts, h, unroll=tpu)
    selected = _select_window_points(spec, table, digits, h)

    if tpu and w <= LANES:
        per_win = _fold_rows(spec, selected, m * w)
        sums = _fold_lanes_tpu(spec, per_win)  # (16, m*w)
        return Point(*_combine_windows_grid_tpu(spec, sums, c, m, w))
    per_win = _fold_rows_fixed(spec, selected, m * w)
    sums = _fold_lanes_fixed(spec, per_win)  # (16, m*w)
    outs = [
        _combine_windows_horner(
            spec, tuple(s[:, i * w : (i + 1) * w] for s in sums), c
        )
        for i in range(m)
    ]
    return Point(
        jnp.stack([o.x for o in outs], axis=1),
        jnp.stack([o.y for o in outs], axis=1),
        jnp.stack([o.z for o in outs], axis=1),
    )


def _use_tpu_layout() -> bool:
    from ..fields.pallas_kernels import backend_is_tpu

    return backend_is_tpu()


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm(
    spec: CurveSpec,
    scalars_mont: jnp.ndarray,
    points: Point,
    c: int = 0,
    window_batch: int = 0,  # kept for API compat; unused by the Straus kernel
) -> Point:
    """Multi-scalar multiplication: sum_i scalars[i] * points[i].

    scalars_mont: (16, n) Montgomery-form scalar-field limbs.
    points: batched Point over the same n.  Returns a single projective Point.
    """
    del window_batch
    n = scalars_mont.shape[1]
    tpu = _use_tpu_layout()
    if c == 0:
        c = 5 if n >= 2048 else 4
    h = 1 << (c - 1)

    # pad n up to lanes * 2^m (padded scalars are 0 -> all digits 0 ->
    # identity selected, so padded garbage points never contribute)
    lanes = LANES if tpu else min(LANES, 1 << max(n - 1, 0).bit_length())
    npad = lanes
    while npad < n:
        npad *= 2
    nr = npad // lanes
    if npad != n:
        scal_mont = jnp.pad(scalars_mont, ((0, 0), (0, npad - n)))
        pts = tuple(
            jnp.pad(coord, ((0, 0), (0, npad - n))) for coord in points
        )
    else:
        scal_mont = scalars_mont
        pts = tuple(points)

    scal_rows = scal_mont.reshape(NLIMBS, nr, lanes)
    pts = tuple(coord.reshape(NLIMBS, nr, lanes) for coord in pts)

    # Montgomery -> canonical for digit extraction: multiply by the literal 1
    # (= REDC), in rows layout so the TPU path uses the fused vreg kernel.
    one = np.zeros((NLIMBS, 1, 1), np.uint32)
    one[0, 0, 0] = 1
    one_b = jnp.broadcast_to(jnp.asarray(one), scal_rows.shape)
    if tpu:
        from ..fields.pallas_kernels import mont_mul_rows

        scal = mont_mul_rows(spec.scalar, scal_rows, one_b)
    else:
        from ..fields import vreg

        scal = vreg.to_array(
            vreg.vmul(spec.scalar, vreg.from_array(scal_rows), vreg.from_array(one_b))
        )

    digits = _signed_digits(scal, c)  # (W, nr, lanes)
    w = digits.shape[0]

    table = _build_table(spec, pts, h, unroll=tpu)
    selected = _select_window_points(spec, table, digits, h)

    if tpu and w <= LANES:
        per_win = _fold_rows(spec, selected, w)  # (16, W, lanes)
        sums = _fold_lanes_tpu(spec, per_win)
        return _combine_windows_tpu(spec, sums, c)
    # non-TPU (or c <= 2, where windows exceed lanes): fixed-shape butterfly
    # folds (compile-lean) + flat width-1 Horner
    per_win = _fold_rows_fixed(spec, selected, w)
    sums = _fold_lanes_fixed(spec, per_win)
    return _combine_windows_horner(spec, sums, c)
