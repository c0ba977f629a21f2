"""Host-side (Python int) curve arithmetic: golden reference + small host ops.

Used for kernel golden tests, SRS generation helpers, and verifier-side scalar
work where device dispatch isn't worth it.  Points are (x, y) int tuples or
None for the identity.
"""

from __future__ import annotations

from .spec import CurveSpec


def on_curve(spec: CurveSpec, pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    p = spec.base.p
    return (y * y - x * x * x - spec.b) % p == 0


def neg(spec: CurveSpec, pt):
    if pt is None:
        return None
    return (pt[0], (-pt[1]) % spec.base.p)


def add(spec: CurveSpec, a, b):
    p = spec.base.p
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return (x3, y3)


def double(spec: CurveSpec, a):
    return add(spec, a, a)


def mul(spec: CurveSpec, pt, k: int):
    k %= spec.scalar.p
    acc = None
    while k:
        if k & 1:
            acc = add(spec, acc, pt)
        pt = add(spec, pt, pt)
        k >>= 1
    return acc


def generator(spec: CurveSpec):
    return (spec.gx, spec.gy)


def msm(spec: CurveSpec, scalars, points):
    """Naive host MSM (golden reference for the device Pippenger kernel)."""
    acc = None
    for k, pt in zip(scalars, points):
        acc = add(spec, acc, mul(spec, pt, k))
    return acc
