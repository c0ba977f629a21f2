"""KZG polynomial commitment parameters + commit kernels (BN254).

TPU-native rebuild of the reference ParamsKZG (poly/kzg/commitment.rs:23-129):
the SRS (powers of s, Lagrange-basis SRS, G2 elements) is generated with
batched device kernels — one batched per-lane scalar-mul for g, a closed-form
Lagrange evaluation at s (L_i(s) = (s^n - 1) * omega^i / (n (s - omega^i)))
for g_lagrange instead of the reference's FFT-over-points — and commitments
are the Pippenger MSM kernel (commit = MSM over g or g_lagrange,
kzg/commitment.rs:281-292,327-334).

Dev/test setups keep the toxic waste s so the pairing check can be replaced by
the equivalent known-s G1 check (s*L == R) until a proof needs real pairings.
"""

from __future__ import annotations

import hashlib
import struct

import jax.numpy as jnp

from ..curves import bn254_g2
from ..curves.point import Point, batch_normalize, from_affine_ints, to_affine_ints
from ..curves.spec import BN254_G1, CurveSpec
from ..fields import limb
from ..fields.spec import NLIMBS
from ..ops import ntt as ntt_ops
from ..ops.msm import msm
from ..ops.scalar_mul import batch_scalar_mul
from ..transcript.transcript import point_from_bytes, point_to_bytes
from .polynomial import COEFF, LAGRANGE, Poly


class ParamsKZG:
    """Universal (trusted) setup for KZG over BN254."""

    curve: CurveSpec = BN254_G1

    def __init__(self, k: int, g: Point, g_lagrange: Point, g2, s_g2, s: int | None = None):
        self.k = k
        self.n = 1 << k
        self.g = g  # (n,)-batched affine Point (z normalized to 1)
        self.g_lagrange = g_lagrange
        self.g2 = g2
        self.s_g2 = s_g2
        self._s = s  # dev-only toxic waste (None for externally loaded params)
        # optional jax.sharding.Mesh: commitments shard points over the mesh
        # (parallel/msm.py), the TPU-native analog of the reference's
        # chunk-per-thread best_multiexp (arithmetic.rs:132-159)
        self.mesh = None

    def _msm(self, scalars, points: Point) -> Point:
        ndev = self.mesh.shape["shard"] if self.mesh is not None else 0
        n = scalars.shape[1]
        if ndev > 1 and n % ndev == 0 and n // ndev >= 2:
            from ..parallel.msm import sharded_msm

            return sharded_msm(self.curve, scalars, points, self.mesh)
        return msm(self.curve, scalars, points)

    # ------------------------------------------------------------------
    @classmethod
    def setup(cls, k: int, seed: bytes = b"halo2-tpu-kzg") -> "ParamsKZG":
        curve = cls.curve
        fr = curve.scalar
        n = 1 << k
        s = (
            int.from_bytes(hashlib.blake2b(seed, digest_size=64).digest(), "little")
            % fr.p
        )
        if s == 0:
            s = 1

        # g[i] = s^i * G
        s_pows = ntt_ops.power_table(fr, s, n)  # (16, n) mont
        gpt = from_affine_ints(curve, [(curve.gx, curve.gy)])
        g_broad = Point(
            jnp.broadcast_to(gpt.x, (NLIMBS, n)),
            jnp.broadcast_to(gpt.y, (NLIMBS, n)),
            jnp.broadcast_to(gpt.z, (NLIMBS, n)),
        )
        g = batch_normalize(curve, batch_scalar_mul(curve, s_pows, g_broad))

        # g_lagrange[i] = L_i(s) * G,  L_i(s) = (s^n - 1)/n * omega^i / (s - omega^i)
        omega = pow(fr.root_of_unity, 1 << (fr.s - k), fr.p)
        omega_pows = ntt_ops.power_table(fr, omega, n)
        s_arr = jnp.broadcast_to(limb.from_int(fr, s).reshape(NLIMBS, 1), (NLIMBS, n))
        denom = limb.fsub(fr, s_arr, omega_pows)
        denom_inv = limb.batch_inv(fr, denom)
        common = (pow(s, n, fr.p) - 1) * pow(n, -1, fr.p) % fr.p
        common_arr = jnp.broadcast_to(
            limb.from_int(fr, common).reshape(NLIMBS, 1), (NLIMBS, n)
        )
        li = limb.fmul(fr, limb.fmul(fr, common_arr, omega_pows), denom_inv)
        g_lagrange = batch_normalize(curve, batch_scalar_mul(curve, li, g_broad))

        g2 = bn254_g2.G2_GENERATOR
        s_g2 = bn254_g2.g2_mul(g2, s)
        return cls(k, g, g_lagrange, g2, s_g2, s=s)

    # ------------------------------------------------------------------
    @classmethod
    def setup_host(cls, k: int, seed: bytes = b"halo2-tpu-kzg") -> "ParamsKZG":
        """SRS computed host-side with Python ints — same values as ``setup``.

        The device setup jits a 256-step double-and-add chain whose XLA
        compile alone takes minutes on small hosts; for small/medium k a
        host fixed-base windowed multiplication is instant and bit-identical
        (tests/test_kzg_params.py pins the two paths equal).  Uses 4-bit
        fixed-base windows over G, so each of the 2n scalar muls costs 64
        host adds.
        """
        from ..curves import host

        curve = cls.curve
        fr = curve.scalar
        p = fr.p
        n = 1 << k
        s = int.from_bytes(hashlib.blake2b(seed, digest_size=64).digest(), "little") % p
        if s == 0:
            s = 1

        # fixed-base window table: table[w][d] = d * 16^w * G (affine)
        gpt = (curve.gx, curve.gy)
        table = []
        base = gpt
        for _ in range(64):
            row = [None]
            acc = None
            for _ in range(15):
                acc = host.add(curve, acc, base)
                row.append(acc)
            table.append(row)
            base = host.add(curve, acc, base)  # 16 * (16^w * G)

        def mul_g(scalar: int):
            """Jacobian accumulation: 64 mixed adds, NO inversions (the
            per-point affine normalization is batched below — one modular
            inversion for the whole SRS instead of 64 per scalar)."""
            acc = host.JAC_IDENTITY
            for w in range(64):
                d = (scalar >> (4 * w)) & 0xF
                if d:
                    acc = host.jac_add_mixed(curve, acc, table[w][d])
            return acc

        # g[i] = s^i * G
        s_pows = []
        cur = 1
        for _ in range(n):
            s_pows.append(cur)
            cur = cur * s % p

        # g_lagrange[i] = L_i(s) * G, L_i(s) = (s^n - 1)/n * omega^i / (s - omega^i)
        omega = pow(fr.root_of_unity, 1 << (fr.s - k), p)
        common = (pow(s, n, p) - 1) * pow(n, -1, p) % p
        om = 1
        lag = []
        denoms = []
        for _ in range(n):
            lag.append(common * om % p)
            denoms.append((s - om) % p)
            om = om * omega % p
        # batch-invert the n Lagrange denominators (one pow for all)
        prefix = [1] * (n + 1)
        for i, d in enumerate(denoms):
            prefix[i + 1] = prefix[i] * d % p
        inv = pow(prefix[-1], -1, p)
        for i in range(n - 1, -1, -1):
            lag[i] = lag[i] * (inv * prefix[i] % p) % p
            inv = inv * denoms[i] % p

        jac = [mul_g(v) for v in s_pows] + [mul_g(v) for v in lag]
        aff = host.jac_batch_to_affine(curve, jac)
        g_aff, gl_aff = aff[:n], aff[n:]

        g = from_affine_ints(curve, g_aff)
        g_lagrange = from_affine_ints(curve, gl_aff)
        g2 = bn254_g2.G2_GENERATOR
        s_g2 = bn254_g2.g2_mul(g2, s)
        return cls(k, g, g_lagrange, g2, s_g2, s=s)

    # ------------------------------------------------------------------
    def commit_lagrange(self, poly: Poly, blind: int = 0) -> Point:
        """MSM over the Lagrange SRS.  KZG ignores the blinding factor
        (kzg/commitment.rs:281-292 takes Blind and drops it); the parameter
        exists so the prover is scheme-generic with IPA."""
        assert poly.basis == LAGRANGE
        return self._msm(poly.values, self.g_lagrange)

    def commit(self, poly: Poly, blind: int = 0) -> Point:
        assert poly.basis == COEFF
        return self._msm(poly.values, self.g)

    def commit_lagrange_many(self, polys, blinds=None) -> Point:
        """Commit m Lagrange polys in ONE batched MSM dispatch (blinds are
        ignored like commit_lagrange).  Returns a batched Point (16, m).

        Single-chip only: with a mesh attached the caller should fall back to
        per-column sharded commits.
        """
        import jax.numpy as jnp

        from ..ops.msm import msm_many

        assert self.mesh is None
        stacked = jnp.stack([p.values for p in polys], axis=0)  # (m, 16, n)
        return msm_many(self.curve, stacked, self.g_lagrange)

    def empty_msm(self):
        from .multiopen_gwc import HostMSM

        return HostMSM(self.curve)

    def commit_coeffs(self, coeffs: jnp.ndarray) -> Point:
        """Commit raw coefficient limbs of arbitrary length <= n."""
        m = coeffs.shape[1]
        g = Point(self.g.x[:, :m], self.g.y[:, :m], self.g.z[:, :m])
        return self._msm(coeffs, g)

    # ------------------------------------------------------------------
    def verify_pairing_known_s(self, lhs, rhs) -> bool:
        """Equivalent of e(L, s G2) * e(R, -G2) == 1 using known s (dev only):
        s * L == R in G1 (host scalar muls)."""
        assert self._s is not None, "params loaded without toxic waste"
        from ..curves import host

        return host.mul(self.curve, lhs, self._s) == rhs

    def verify_pairing(self, lhs, rhs) -> bool:
        """Real pairing check e(L, s G2) * e(-R, G2) == 1 (kzg/msm.rs:151-169).

        Dev params keep the toxic waste and use the equivalent known-s G1
        check, which is much faster; externally-loaded params run the full
        optimal-ate pairing (curves/bn254_pairing.py).
        """
        if self._s is not None:
            return self.verify_pairing_known_s(lhs, rhs)
        from ..curves import bn254_pairing as pairing
        from ..curves import host

        return pairing.pairing_check(
            [(lhs, self.s_g2), (host.neg(self.curve, rhs), self.g2)]
        )

    # ------------------------------------------------------------------
    def write(self, path: str, fmt=None):
        """Serialize the SRS.  ``fmt`` is a plonk.serde.SerdeFormat (default
        Processed = compressed points); the Raw formats dump uncompressed
        affine coordinates in the halo2curves Montgomery limb layout
        (kzg/commitment.rs write_custom + helpers.rs SerdeCurveAffine)."""
        from ..plonk.serde import SerdeFormat, _write_point

        fmt = fmt or SerdeFormat.PROCESSED
        curve = self.curve
        gs = to_affine_ints(curve, self.g)
        gl = to_affine_ints(curve, self.g_lagrange)
        fq = curve.base
        mont = (lambda v: v * fq.r % fq.p) if fmt != SerdeFormat.PROCESSED else (lambda v: v)
        with open(path, "wb") as f:
            f.write(struct.pack("<I", self.k))
            for pt in gs + gl:
                _write_point(f, curve, pt, fmt)
            for g2pt in (self.g2, self.s_g2):
                for c in (g2pt[0].c0, g2pt[0].c1, g2pt[1].c0, g2pt[1].c1):
                    f.write(mont(c).to_bytes(32, "little"))

    @classmethod
    def read(cls, path: str, fmt=None) -> "ParamsKZG":
        from ..plonk.serde import SerdeFormat, _read_point

        fmt = fmt or SerdeFormat.PROCESSED
        curve = cls.curve
        fq = curve.base
        unmont = (
            (lambda v: v * pow(fq.r, -1, fq.p) % fq.p)
            if fmt != SerdeFormat.PROCESSED
            else (lambda v: v)
        )
        with open(path, "rb") as f:
            (k,) = struct.unpack("<I", f.read(4))
            n = 1 << k
            pts = [_read_point(f, curve, fmt) for _ in range(2 * n)]
            g2s = []
            for _ in range(2):
                c = [unmont(int.from_bytes(f.read(32), "little")) for _ in range(4)]
                g2s.append(
                    (bn254_g2.Fq2(c[0], c[1]), bn254_g2.Fq2(c[2], c[3]))
                )
        g = from_affine_ints(curve, pts[:n])
        g_lagrange = from_affine_ints(curve, pts[n:])
        return cls(k, g, g_lagrange, g2s[0], g2s[1])
