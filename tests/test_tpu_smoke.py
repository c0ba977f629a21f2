"""TPU-backend regression smoke test at k=14 (VERDICT r3 weak #6).

Runs ONLY when a real TPU/axon device is available (the rest of the suite
pins JAX to CPU via conftest).  Pins MSM and NTT results at k=14 against
host-computed goldens so the device kernels can't silently regress while the
CPU suite stays green.
"""

import os
import subprocess
import sys
import textwrap

import pytest


def _axon_available() -> bool:
    # conftest pins this process to CPU; probe a fresh interpreter
    probe = subprocess.run(
        [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
        capture_output=True,
        text=True,
        env={k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"},
        timeout=180,
    )
    return probe.returncode == 0 and probe.stdout.strip() not in ("", "cpu")


pytestmark = [
    pytest.mark.skipif(not _axon_available(), reason="no TPU/axon device available"),
    pytest.mark.slow,  # real-device compiles via the tunnel
]


SCRIPT = textwrap.dedent(
    """
    import jax
    from halo2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import numpy as np
    from halo2_tpu.curves import BN254_G1, host
    from halo2_tpu.curves.point import batch_normalize, from_affine_ints, to_affine_ints
    from halo2_tpu.fields import limb
    from halo2_tpu.ops.msm import msm

    K = 14
    n = 1 << K
    fr = BN254_G1.scalar

    # --- MSM golden: sum(i+1 for i) * G == msm((i+1), [G]*n) with distinct
    # scalars; use the power-table structure so the host golden is cheap:
    # msm(s^i, [G]) = (sum s^i) * G
    s = 123456789
    scalars_int = [pow(s, i, fr.p) for i in range(n)]
    total = sum(scalars_int) % fr.p
    g = host.generator(BN254_G1)
    expected = host.mul(BN254_G1, g, total)

    scalars = limb.from_ints(fr, scalars_int)
    g_broad = from_affine_ints(BN254_G1, [g] * n)
    out = jax.jit(lambda sc, pt: msm(BN254_G1, sc, pt))(scalars, g_broad)
    got = to_affine_ints(BN254_G1, batch_normalize(BN254_G1, out))[0]
    assert got == expected, "k=14 MSM device result != host golden"
    print("MSM-OK")

    # --- NTT golden: lagrange<->coeff round-trip + one host evaluation
    from halo2_tpu.poly.domain import EvaluationDomain
    from halo2_tpu.poly.polynomial import LAGRANGE, Poly

    domain = EvaluationDomain(fr, 2, K)
    vals_int = [(7 * i + 3) % fr.p for i in range(n)]
    poly = Poly(limb.from_ints(fr, vals_int), LAGRANGE)
    coeff = domain.lagrange_to_coeff(poly)
    back = domain.coeff_to_lagrange(coeff)
    assert limb.to_ints(fr, back.values) == vals_int, "k=14 NTT roundtrip"
    # evaluate the recovered polynomial at omega^5 on host: must equal vals[5]
    coeffs_int = limb.to_ints(fr, coeff.values)
    x = pow(domain.omega, 5, fr.p)
    horner = 0
    for c in reversed(coeffs_int):
        horner = (horner * x + c) % fr.p
    assert horner == vals_int[5], "k=14 iNTT coefficients wrong"
    print("NTT-OK")

    # --- six-step vs butterfly equality ON THE DEVICE at k=14: the fused
    # slice-of-concat stage pattern miscompiled on this backend until the
    # per-stage barrier (ops/ntt.py _stockham_axis1); CPU tests cannot see it
    from halo2_tpu.ops import ntt as ntt_ops
    import numpy as np

    omega14 = domain.omega
    tw14 = ntt_ops.power_table(fr, omega14, n // 2)
    wc14 = ntt_ops.cross_twiddles(fr, omega14, K)
    a14 = limb.from_ints(fr, vals_int)
    ref14 = np.asarray(ntt_ops.ntt(fr, a14, tw14, K))
    got14 = np.asarray(ntt_ops.ntt_sixstep(fr, a14, tw14, wc14, K))
    assert (ref14 == got14).all(), "six-step != butterfly on device at k=14"
    print("SIXSTEP-OK")
    """
)


def test_tpu_msm_ntt_k14_golden():
    run = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        env={k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"},
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1500,
    )
    assert run.returncode == 0, run.stdout[-2000:] + run.stderr[-2000:]
    assert "MSM-OK" in run.stdout and "NTT-OK" in run.stdout
    assert "SIXSTEP-OK" in run.stdout
