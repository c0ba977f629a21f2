"""Transcript tests: keccak vectors, point compression roundtrip, determinism."""

import random

from halo2_tpu.curves import BN254_G1, PALLAS, host
from halo2_tpu.transcript import (
    Blake2bTranscript,
    Keccak256Transcript,
    keccak256,
    point_from_bytes,
    point_to_bytes,
)

random.seed(5)


def test_keccak256_vectors():
    # Known Keccak-256 (pre-NIST) test vectors (EVM convention)
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # incremental across the rate boundary
    from halo2_tpu.transcript import Keccak256

    long = bytes(range(256)) * 3
    inc = Keccak256()
    for i in range(0, len(long), 37):
        inc.update(long[i : i + 37])
    assert inc.digest() == keccak256(long)


def test_point_compression_roundtrip():
    for curve in [BN254_G1, PALLAS]:
        g = host.generator(curve)
        for k in [1, 2, 3, 12345, random.randrange(1, curve.scalar.p)]:
            pt = host.mul(curve, g, k)
            b = point_to_bytes(curve, pt)
            assert len(b) == 32
            assert point_from_bytes(curve, b) == pt
        assert point_from_bytes(curve, point_to_bytes(curve, None)) is None


def test_transcript_prover_verifier_agree():
    for cls in [Blake2bTranscript, Keccak256Transcript]:
        curve = BN254_G1
        g = host.generator(curve)
        pts = [host.mul(curve, g, k) for k in [5, 9]]
        tw = cls(curve)
        tw.common_scalar(42)
        c0 = tw.squeeze_challenge()
        tw.write_point(pts[0])
        c1 = tw.squeeze_challenge()
        tw.write_scalar(777)
        tw.write_point(pts[1])
        c2 = tw.squeeze_challenge()
        proof = tw.finalize()

        tr = cls(curve, proof)
        tr.common_scalar(42)
        assert tr.squeeze_challenge() == c0
        assert tr.read_point() == pts[0]
        assert tr.squeeze_challenge() == c1
        assert tr.read_scalar() == 777
        assert tr.read_point() == pts[1]
        assert tr.squeeze_challenge() == c2
        # distinct challenges, in-field
        assert len({c0, c1, c2}) == 3
        for c in (c0, c1, c2):
            assert 0 <= c < curve.scalar.p
