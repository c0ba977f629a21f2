"""IPA (Halo-style) polynomial commitment scheme — no trusted setup.

Rebuild of poly/ipa/{commitment.rs, commitment/{prover,verifier}.rs, msm.rs,
strategy.rs} (SURVEY.md §2.10) over the Pasta cycle:

- ``ParamsIPA``: random-oracle SRS {g, g_lagrange, w, u}; g_lagrange via the
  group inverse-NTT (ops/gntt.py).  For Pallas/Vesta the SRS points come from
  the real SSWU ``hash_to_curve("Halo2-Parameters")`` (curves/sswu.py),
  matching ipa/commitment.rs:160-205 byte-for-byte: g[i] = H(0x00 || i_le32),
  w = H([1]), u = H([2]).  Curves without derived iso constants (BN254) fall
  back to a documented blake2b try-and-increment map (PARITY.md).
- ``ipa_commit_create_proof``/``ipa_commit_verify_proof``: the k-round inner
  product argument (ipa/commitment/prover.rs:29-153, verifier.rs:23-105) with
  the vector collapses and L/R multiexps as device kernels.
- ``MSMIPA``/``GuardIPA``/strategies (ipa/msm.rs, ipa/strategy.rs) with the
  x-coordinate-keyed base dedup and the s-vector expansion ``compute_s``.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Dict, List, Optional

import jax.numpy as jnp

from ..curves import host
from ..curves.point import (
    Point,
    batch_normalize,
    from_affine_ints,
    to_affine_ints,
)
from ..curves.spec import PALLAS, CurveSpec
from ..fields import limb
from ..fields.spec import NLIMBS
from ..ops import arith, gntt
from ..ops.msm import msm as device_msm
from ..transcript.transcript import point_from_bytes, point_to_bytes
from .polynomial import COEFF, LAGRANGE, Poly


def _map_to_curve(curve: CurveSpec, seed: bytes, index: int):
    """Deterministic try-and-increment point derivation (see parity NOTE)."""
    f = curve.base
    ctr = 0
    while True:
        h = hashlib.blake2b(
            seed + struct.pack("<II", index, ctr), digest_size=64
        ).digest()
        x = int.from_bytes(h, "little") % f.p
        y2 = (x * x * x + curve.b) % f.p
        y = f.sqrt(y2)
        if y is not None and x != 0:
            if y & 1:
                y = f.p - y
            return (x, y)
        ctr += 1


class ParamsIPA:
    """ipa/commitment.rs:29-36 — {g, g_lagrange, w, u} over Pallas/Vesta."""

    def __init__(self, k: int, curve: CurveSpec, g: Point, g_lagrange: Point, w, u):
        self.k = k
        self.n = 1 << k
        self.curve = curve
        self.g = g  # (n,)-batched normalized Point
        self.g_lagrange = g_lagrange
        self.w = w  # host affine (x, y)
        self.u = u

    @classmethod
    def setup(cls, k: int, curve: CurveSpec = PALLAS, seed: bytes = b"Halo2-Parameters") -> "ParamsIPA":
        n = 1 << k
        from ..curves.sswu import ISO_PARAMS, hash_to_curve

        if curve.name in ISO_PARAMS and seed == b"Halo2-Parameters":
            # reference-exact SRS (ipa/commitment.rs:167-201): the message for
            # g[i] is a 5-byte buffer [0, i_le32]; w and u use [1] and [2].
            hasher = hash_to_curve(curve, "Halo2-Parameters")
            pts = [hasher(b"\x00" + i.to_bytes(4, "little")) for i in range(n)]
            w = hasher(b"\x01")
            u = hasher(b"\x02")
        else:
            pts = [_map_to_curve(curve, seed, i) for i in range(n)]
            w = _map_to_curve(curve, seed + b"-w", 0)
            u = _map_to_curve(curve, seed + b"-u", 0)
        g = from_affine_ints(curve, pts)
        g_lagrange = batch_normalize(curve, gntt.g_to_lagrange(curve, g, k))
        return cls(k, curve, g, g_lagrange, w, u)

    # -- commitments (blind rides the w base, ipa/commitment.rs:90-110,215-235)
    def _commit(self, values: jnp.ndarray, bases: Point, blind: int) -> Point:
        cm = device_msm(self.curve, values, bases)
        if blind:
            wb = host.mul(self.curve, self.w, blind)
            cm_aff = to_affine_ints(self.curve, cm)[0]
            return from_affine_ints(self.curve, [host.add(self.curve, cm_aff, wb)])
        return cm

    def commit(self, poly: Poly, blind: int = 0) -> Point:
        assert poly.basis == COEFF
        return self._commit(poly.values, self.g, blind)

    def commit_lagrange(self, poly: Poly, blind: int = 0) -> Point:
        assert poly.basis == LAGRANGE
        return self._commit(poly.values, self.g_lagrange, blind)

    def empty_msm(self) -> "MSMIPA":
        return MSMIPA(self)

    # -- serialization (ipa/commitment.rs:110-147)
    def write(self, path: str):
        with open(path, "wb") as f:
            f.write(struct.pack("<I", self.k))
            for pt in to_affine_ints(self.curve, self.g):
                f.write(point_to_bytes(self.curve, pt))
            for pt in to_affine_ints(self.curve, self.g_lagrange):
                f.write(point_to_bytes(self.curve, pt))
            f.write(point_to_bytes(self.curve, self.w))
            f.write(point_to_bytes(self.curve, self.u))

    @classmethod
    def read(cls, path: str, curve: CurveSpec = PALLAS) -> "ParamsIPA":
        with open(path, "rb") as f:
            (k,) = struct.unpack("<I", f.read(4))
            n = 1 << k
            g = [point_from_bytes(curve, f.read(32)) for _ in range(n)]
            gl = [point_from_bytes(curve, f.read(32)) for _ in range(n)]
            w = point_from_bytes(curve, f.read(32))
            u = point_from_bytes(curve, f.read(32))
        return cls(k, curve, from_affine_ints(curve, g), from_affine_ints(curve, gl), w, u)


# ---------------------------------------------------------------------------
# MSMIPA + Guard + strategies (ipa/msm.rs, ipa/strategy.rs)
# ---------------------------------------------------------------------------


class MSMIPA:
    """Accumulator with special bases g / w / u and x-keyed dedup of others."""

    def __init__(self, params: ParamsIPA):
        self.params = params
        self.g_scalars: Optional[List[int]] = None
        self.w_scalar: Optional[int] = None
        self.u_scalar: Optional[int] = None
        self.other: Dict[int, List[int]] = {}  # x -> [scalar, y]

    def append_term(self, scalar: int, point):
        if point is None:
            return
        p = self.params.curve.scalar.p
        x, y = point
        if x in self.other:
            entry = self.other[x]
            if entry[1] == y:
                entry[0] = (entry[0] + scalar) % p
            else:
                entry[0] = (entry[0] - scalar) % p
        else:
            self.other[x] = [scalar % p, y]

    def add_msm(self, other: "MSMIPA"):
        for x, (scalar, y) in other.other.items():
            self.append_term(scalar, (x, y))
        if other.g_scalars is not None:
            self.add_to_g_scalars(other.g_scalars)
        if other.w_scalar is not None:
            self.add_to_w_scalar(other.w_scalar)
        if other.u_scalar is not None:
            self.add_to_u_scalar(other.u_scalar)

    def scale(self, factor: int):
        p = self.params.curve.scalar.p
        if self.g_scalars is not None:
            self.g_scalars = [s * factor % p for s in self.g_scalars]
        for entry in self.other.values():
            entry[0] = entry[0] * factor % p
        if self.w_scalar is not None:
            self.w_scalar = self.w_scalar * factor % p
        if self.u_scalar is not None:
            self.u_scalar = self.u_scalar * factor % p

    def add_constant_term(self, constant: int):
        if self.g_scalars is None:
            self.g_scalars = [0] * self.params.n
        p = self.params.curve.scalar.p
        self.g_scalars[0] = (self.g_scalars[0] + constant) % p

    def add_to_g_scalars(self, scalars: List[int]):
        assert len(scalars) == self.params.n
        p = self.params.curve.scalar.p
        if self.g_scalars is None:
            self.g_scalars = [s % p for s in scalars]
        else:
            self.g_scalars = [
                (a + b) % p for a, b in zip(self.g_scalars, scalars)
            ]

    def add_to_w_scalar(self, scalar: int):
        p = self.params.curve.scalar.p
        self.w_scalar = ((self.w_scalar or 0) + scalar) % p

    def add_to_u_scalar(self, scalar: int):
        p = self.params.curve.scalar.p
        self.u_scalar = ((self.u_scalar or 0) + scalar) % p

    def eval(self):
        """Full MSM evaluation; the n-sized g part runs on device."""
        curve = self.params.curve
        acc = None
        if self.g_scalars is not None:
            scal = limb.from_ints(curve.scalar, [s % curve.scalar.p for s in self.g_scalars])
            g_part = device_msm(curve, scal, self.params.g)
            acc = to_affine_ints(curve, g_part)[0]
        for x, (scalar, y) in self.other.items():
            acc = host.add(curve, acc, host.mul(curve, (x, y), scalar))
        if self.w_scalar is not None:
            acc = host.add(curve, acc, host.mul(curve, self.params.w, self.w_scalar))
        if self.u_scalar is not None:
            acc = host.add(curve, acc, host.mul(curve, self.params.u, self.u_scalar))
        return acc

    def check(self) -> bool:
        return self.eval() is None


def compute_s(u: List[int], init: int, p: int) -> List[int]:
    """Coefficients of g(X) = prod (1 + u_{k-1-i} X^{2^i}) (strategy.rs:161)."""
    assert u
    v = [0] * (1 << len(u))
    v[0] = init % p
    length = 1
    for u_j in reversed(u):
        for i in range(length):
            v[length + i] = v[i] * u_j % p
        length <<= 1
    return v


def compute_b(x: int, u: List[int], p: int) -> int:
    """b = prod (1 + u_{k-1-i} x^{2^i}) (ipa/commitment/verifier.rs:103-112)."""
    tmp = 1
    cur = x
    for u_j in reversed(u):
        tmp = tmp * (1 + u_j * cur) % p
        cur = cur * cur % p
    return tmp


class GuardIPA:
    """strategy.rs:24-77."""

    def __init__(self, msm: MSMIPA, neg_c: int, u: List[int]):
        self.msm = msm
        self.neg_c = neg_c
        self.u = u

    def use_challenges(self) -> MSMIPA:
        p = self.msm.params.curve.scalar.p
        s = compute_s(self.u, self.neg_c, p)
        self.msm.add_to_g_scalars(s)
        return self.msm

    def use_g(self, g):
        self.msm.append_term(self.neg_c, g)
        return self.msm, Accumulator(g, list(self.u))

    def compute_g(self):
        p = self.msm.params.curve.scalar.p
        s = compute_s(self.u, 1, p)
        curve = self.msm.params.curve
        scal = limb.from_canonical_ints(curve.scalar, s)
        return to_affine_ints(curve, device_msm(curve, scal, self.msm.params.g))[0]


class Accumulator:
    """Recursion accumulator (strategy.rs:31-40)."""

    def __init__(self, g, u_packed):
        self.g = g
        self.u_packed = u_packed


class IPASingleStrategy:
    """strategy.rs:118-160."""

    def __init__(self, params: ParamsIPA):
        self.params = params

    def process(self, f) -> bool:
        guard = f(MSMIPA(self.params))
        return guard.use_challenges().check()


class IPAAccumulatorStrategy:
    """strategy.rs:80-116 — batch accumulation with random scaling."""

    def __init__(self, params: ParamsIPA, rng):
        self.params = params
        self.rng = rng
        self.msm = MSMIPA(params)

    def process(self, f):
        self.msm.scale(self.rng())
        guard = f(self.msm)
        self.msm = guard.use_challenges()
        return self

    def finalize(self) -> bool:
        return self.msm.check()


# ---------------------------------------------------------------------------
# inner product argument: open at a point (ipa/commitment/{prover,verifier}.rs)
# ---------------------------------------------------------------------------


def _inner_product(spec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return arith.reduce_add(spec, limb.fmul(spec, a, b))


def ipa_commit_create_proof(
    params: ParamsIPA, rng, transcript, p_poly: Poly, p_blind: int, x_3: int
):
    """k-round folding argument (ipa/commitment/prover.rs:29-153)."""
    curve = params.curve
    fr = curve.scalar
    p = fr.p
    n = params.n
    assert len(p_poly) == n

    # random polynomial with a root at x_3
    s_vals = [rng() for _ in range(n)]
    s_at_x3 = 0
    for c in reversed(s_vals):
        s_at_x3 = (s_at_x3 * x_3 + c) % p
    s_vals[0] = (s_vals[0] - s_at_x3) % p
    s_poly = Poly(limb.from_ints(fr, s_vals), COEFF)
    s_blind = rng()
    s_commit = to_affine_ints(curve, params.commit(s_poly, s_blind))[0]
    transcript.write_point(s_commit)

    xi = transcript.squeeze_challenge()
    z = transcript.squeeze_challenge()

    # P' = xi * S + P, with constant term shifted so P'(x_3) = 0
    xi_b = jnp.broadcast_to(limb.from_int(fr, xi).reshape(NLIMBS, 1), s_poly.values.shape)
    p_prime = limb.fadd(fr, limb.fmul(fr, s_poly.values, xi_b), p_poly.values)
    v = limb.to_ints(fr, arith.eval_polynomial(fr, p_prime, x_3))[0]
    const = limb.fsub(fr, p_prime[:, :1], limb.from_int(fr, v).reshape(NLIMBS, 1))
    p_prime = jnp.concatenate([const, p_prime[:, 1:]], axis=1)
    f = (s_blind * xi + p_blind) % p

    from ..ops import ntt as ntt_ops

    b = ntt_ops.power_table(fr, x_3, n)  # powers of x_3
    g_prime = params.g

    k = params.k
    for j in range(k):
        half = 1 << (k - j - 1)
        p_lo, p_hi = p_prime[:, :half], p_prime[:, half : 2 * half]
        b_lo, b_hi = b[:, :half], b[:, half : 2 * half]
        g_lo = Point(g_prime.x[:, :half], g_prime.y[:, :half], g_prime.z[:, :half])
        g_hi = Point(
            g_prime.x[:, half : 2 * half],
            g_prime.y[:, half : 2 * half],
            g_prime.z[:, half : 2 * half],
        )

        l_j = to_affine_ints(curve, device_msm(curve, p_hi, g_lo))[0]
        r_j = to_affine_ints(curve, device_msm(curve, p_lo, g_hi))[0]
        value_l = limb.to_ints(fr, _inner_product(fr, p_hi, b_lo))[0]
        value_r = limb.to_ints(fr, _inner_product(fr, p_lo, b_hi))[0]
        l_rand = rng()
        r_rand = rng()
        l_j = host.add(
            curve,
            l_j,
            host.add(
                curve,
                host.mul(curve, params.u, value_l * z % p),
                host.mul(curve, params.w, l_rand),
            ),
        )
        r_j = host.add(
            curve,
            r_j,
            host.add(
                curve,
                host.mul(curve, params.u, value_r * z % p),
                host.mul(curve, params.w, r_rand),
            ),
        )
        transcript.write_point(l_j)
        transcript.write_point(r_j)

        u_j = transcript.squeeze_challenge()
        u_j_inv = pow(u_j, -1, p)

        # collapse p', b, G'
        uinv_b = jnp.broadcast_to(limb.from_int(fr, u_j_inv).reshape(NLIMBS, 1), p_hi.shape)
        u_b = jnp.broadcast_to(limb.from_int(fr, u_j).reshape(NLIMBS, 1), b_hi.shape)
        p_prime = limb.fadd(fr, p_lo, limb.fmul(fr, p_hi, uinv_b))
        b = limb.fadd(fr, b_lo, limb.fmul(fr, b_hi, u_b))
        from ..ops.scalar_mul import batch_scalar_mul
        from ..curves.point import ec_add

        uj_table = jnp.broadcast_to(
            limb.from_int(fr, u_j).reshape(NLIMBS, 1), (NLIMBS, half)
        )
        g_prime = batch_normalize(
            curve, ec_add(curve, g_lo, batch_scalar_mul(curve, uj_table, g_hi))
        )

        f = (f + l_rand * u_j_inv + r_rand * u_j) % p

    c = limb.to_ints(fr, p_prime)[0]
    transcript.write_scalar(c)
    transcript.write_scalar(f)


def ipa_commit_verify_proof(
    params: ParamsIPA, msm: MSMIPA, transcript, x: int, v: int
) -> GuardIPA:
    """ipa/commitment/verifier.rs:23-105."""
    p = params.curve.scalar.p
    k = params.k

    msm.add_constant_term((-v) % p)
    s_commit = transcript.read_point()
    xi = transcript.squeeze_challenge()
    msm.append_term(xi, s_commit)
    z = transcript.squeeze_challenge()

    rounds = []
    for _ in range(k):
        l = transcript.read_point()
        r = transcript.read_point()
        u_j = transcript.squeeze_challenge()
        rounds.append((l, r, u_j))

    u = []
    for l, r, u_j in rounds:
        msm.append_term(pow(u_j, -1, p), l)
        msm.append_term(u_j, r)
        u.append(u_j)

    c = transcript.read_scalar()
    neg_c = (-c) % p
    f = transcript.read_scalar()
    b = compute_b(x, u, p)

    msm.add_to_u_scalar(neg_c * b % p * z % p)
    msm.add_to_w_scalar((-f) % p)
    return GuardIPA(msm, neg_c, u)
