"""SSWU hash-to-curve + Sinsemilla host primitives.

Ground truth: the reference's own SINSEMILLA_S table
(halo2_gadgets/src/sinsemilla/primitives/sinsemilla_s.rs) pins the full
Pallas hash_to_curve pipeline bit-for-bit; the digest below is the SHA-256
of all 1024 (x || y) little-endian 32-byte pairs parsed from that table.
"""

import hashlib

from halo2_tpu.curves import iso_derive, sswu
from halo2_tpu.curves.spec import PALLAS, VESTA
from halo2_tpu.gadgets.sinsemilla import primitives as prim

# sha256 over S[j].x (32B LE) || S[j].y for j in 0..1024, parsed from the
# reference sinsemilla_s.rs
S_TABLE_DIGEST = "0324100005e533be76d04c4c9a0c161f17d6f7ce6f984fd55201c82a311e8cd2"

S0 = (
    0x0DB5218BE6881F0F1431D4EA7D4AFC7B29A05BAFBEDE62B55A91EB912044EA5F,
    0x2F0F40C2F152A01C9CAF66298493D5D0944A041C2E65BA0117C24F76BF8E6483,
)
S1023 = (
    0x026ABF29D79296474EC871664D23DEAE7929235C2BDF68802BC3ED47D3B19DAE,
    0x397CDFB14D5465CE0D499BA7A480134C15BA29C7C672FAD28951204B52626B96,
)


def test_s_table_matches_reference():
    s = prim.sinsemilla_s()
    assert len(s) == 1 << prim.K
    assert s[0] == S0
    assert s[1023] == S1023
    h = hashlib.sha256()
    for x, y in s:
        h.update(x.to_bytes(32, "little"))
        h.update(y.to_bytes(32, "little"))
    assert h.hexdigest() == S_TABLE_DIGEST


def test_iso_constants_rederive():
    """The pinned iso constants are reproduced by the Velu derivation."""
    for spec in (PALLAS, VESTA):
        params = sswu.ISO_PARAMS[spec.name]
        assert params.a in iso_derive.iso_a_candidates(spec)
        assert iso_derive.derive_iso(spec, params.a) == params.iso


def test_hash_to_curve_on_curve():
    for spec in (PALLAS, VESTA):
        hasher = sswu.hash_to_curve(spec, "Halo2-Parameters")
        p = spec.base.p
        for msg in (b"", b"\x01", b"\x02", b"hello", (7).to_bytes(4, "little")):
            x, y = hasher(msg)
            assert (y * y - x * x * x - spec.b) % p == 0


def test_pad_matches_reference_vectors():
    # primitives.rs:246-290 pad test vectors
    assert prim.pad([]) == []
    assert prim.pad([True]) == [True] + [False] * 9
    assert prim.pad([True, True]) == [True, True] + [False] * 8
    ten = [True, True, False, True, False, True, False, True, False, True]
    assert prim.pad(ten) == ten
    assert prim.pad(ten + [True]) == ten + [True] + [False] * 9


def test_hash_domain_fold():
    d = prim.HashDomain("MerkleCRH")
    p = PALLAS.base.p
    qx, qy = d.Q
    assert (qy * qy - qx**3 - 5) % p == 0
    # manual fold must agree
    msg = prim.i2lebsp(0b1101011010_0110110101, 20)
    s = prim.sinsemilla_s()
    acc = d.Q
    for chunk in (msg[:10], msg[10:]):
        acc = prim.incomplete_add(prim.incomplete_add(acc, s[prim.lebs2ip_k(chunk)]), acc)
    assert d.hash_to_point(msg) == acc
    assert d.hash(msg) == acc[0]


def test_commit_domain():
    from halo2_tpu.curves import host

    d = prim.CommitDomain("MerkleCRH")
    p = PALLAS.base.p
    rx, ry = d.R
    assert (ry * ry - rx**3 - 5) % p == 0
    msg = prim.i2lebsp(0x2AB, 10)
    r = 0x123456789ABCDEF
    c = d.commit(msg, r)
    expect = host.add(PALLAS, d.M.hash_to_point(msg), host.mul(PALLAS, d.R, r))
    assert c == expect
    assert d.short_commit(msg, r) == expect[0]
    # commit with r=0 is just the hash point
    assert d.commit(msg, 0) == d.M.hash_to_point(msg)
