"""BN254 optimal-ate pairing: bilinearity, degeneracy, KZG-check equivalence."""

import pytest

from halo2_tpu.curves import host
from halo2_tpu.curves.bn254_g2 import G2_GENERATOR, g2_mul, g2_on_curve
from halo2_tpu.curves.bn254_pairing import Fq12, pairing, pairing_check
from halo2_tpu.curves.spec import BN254_G1

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)

G1 = (1, 2)


def test_bilinearity():
    assert g2_on_curve(G2_GENERATOR)
    e = pairing(G1, G2_GENERATOR)
    assert e != Fq12.one()
    a, b = 123456789, 987654321
    lhs = pairing(host.mul(BN254_G1, G1, a), g2_mul(G2_GENERATOR, b))
    assert lhs == e.pow(a * b % BN254_G1.scalar.p)
    assert lhs == pairing(host.mul(BN254_G1, G1, b), g2_mul(G2_GENERATOR, a))


def test_pairing_check_product():
    s = 424242
    assert pairing_check(
        [
            (host.mul(BN254_G1, G1, s), G2_GENERATOR),
            (host.neg(BN254_G1, G1), g2_mul(G2_GENERATOR, s)),
        ]
    )
    assert not pairing_check(
        [
            (host.mul(BN254_G1, G1, s), G2_GENERATOR),
            (host.neg(BN254_G1, G1), g2_mul(G2_GENERATOR, s + 1)),
        ]
    )


def test_kzg_pairing_matches_known_s():
    """The real pairing agrees with the known-s dev shortcut on a KZG check:
    L = aG, R = (s*a)G must verify; any other R must not."""
    from halo2_tpu.poly.kzg import ParamsKZG

    params = ParamsKZG.setup(2, seed=b"pairing-eq")
    s = params._s
    a = 31337
    lhs = host.mul(BN254_G1, G1, a)
    rhs = host.mul(BN254_G1, G1, a * s % BN254_G1.scalar.p)
    assert params.verify_pairing_known_s(lhs, rhs)
    # force the real pairing path
    params._s = None
    assert params.verify_pairing(lhs, rhs)
    bad = host.mul(BN254_G1, G1, a * s % BN254_G1.scalar.p + 1)
    assert not params.verify_pairing(lhs, bad)
