"""Full benchmark sweep (BASELINE.json metric set) on the local chip.

Writes BENCH_full.json with every metric and prints one JSON line per metric.
The driver-facing headline bench stays in bench.py (one line, MSM only).

Metrics:
  * msm_bn254_points_per_sec_k16  — headline Pippenger rate
  * ntt_bn254_points_per_sec_k16  — radix-2 NTT rate over the base domain
  * intt+coset extension rate at extended k (the prover's coeff_to_extended)
  * prove_wall_s_k{K}             — standard-plonk-class circuit keygen/prove/
                                    verify wall time (KZG-GWC, Blake2b)

Scaling efficiency (1 -> 8 virtual devices) is measured by the driver's
multichip dryrun (MULTICHIP_r*.json); reference CPU numbers are estimates
(BASELINE.md: the Rust toolchain is absent from this image).
"""

import json
import sys
import time

import jax

from halo2_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

CPU_MSM_BASELINE = 1.0e6  # pts/s, BASELINE.md estimate for best_multiexp
CPU_NTT_BASELINE = 2.0e7  # pts/s, typical multicore best_fft at 2^16


def emit(metric, value, unit, vs):
    line = {
        "metric": metric,
        "value": round(value, 1),
        "unit": unit,
        "vs_baseline": round(vs, 4),
    }
    print(json.dumps(line), flush=True)
    return line


def bench_msm(k=16, reps=5):
    import numpy as np

    from halo2_tpu.curves.point import Point, batch_normalize, generator
    from halo2_tpu.curves.spec import BN254_G1
    from halo2_tpu.fields.spec import NLIMBS
    from halo2_tpu.ops import ntt as ntt_ops
    from halo2_tpu.ops.msm import msm
    from halo2_tpu.ops.scalar_mul import batch_scalar_mul

    import jax.numpy as jnp

    curve = BN254_G1
    fr = curve.scalar
    n = 1 << k
    s = 0x2F39C57A1F6BC5E7D5A8E2B1C4D3F6A7B8C9D0E1F2A3B4C5D6E7F8091A2B3C4 % fr.p
    s_pows = ntt_ops.power_table(fr, s, n)
    gpt = generator(curve)
    g_broad = Point(
        jnp.broadcast_to(gpt.x.reshape(NLIMBS, 1), (NLIMBS, n)),
        jnp.broadcast_to(gpt.y.reshape(NLIMBS, 1), (NLIMBS, n)),
        jnp.broadcast_to(gpt.z.reshape(NLIMBS, 1), (NLIMBS, n)),
    )
    points = batch_normalize(curve, batch_scalar_mul(curve, s_pows, g_broad))
    t = 0x1D2C3B4A5968778695A4B3C2D1E0F1E2D3C4B5A69788796A5B4C3D2E1F0A1B2 % fr.p
    scalars = ntt_ops.power_table(fr, t, n)
    run = jax.jit(lambda sc, pt: msm(curve, sc, pt))
    out = run(scalars, points)
    _ = np.asarray(out.x)
    start = time.perf_counter()
    for _ in range(reps):
        out = run(scalars, points)
    _ = np.asarray(out.x)
    rate = n * reps / (time.perf_counter() - start)
    return emit(
        f"msm_bn254_points_per_sec_k{k}", rate, "points/sec", rate / CPU_MSM_BASELINE
    )


def bench_ntt(k=16, reps=20):
    import numpy as np

    from halo2_tpu.fields import limb
    from halo2_tpu.fields.spec import BN254_FR
    from halo2_tpu.ops import ntt as ntt_ops

    spec = BN254_FR
    n = 1 << k
    omega = pow(spec.root_of_unity, 1 << (spec.s - k), spec.p)
    tw = ntt_ops.power_table(spec, omega, n // 2)
    vals = limb.from_ints(spec, [(i * 7 + 3) % spec.p for i in range(n)])
    run = jax.jit(lambda a: ntt_ops.ntt(spec, a, tw, k))
    _ = np.asarray(run(vals))
    start = time.perf_counter()
    out = vals
    for _ in range(reps):
        out = run(out)
    _ = np.asarray(out)
    rate = n * reps / (time.perf_counter() - start)
    return emit(
        f"ntt_bn254_points_per_sec_k{k}", rate, "points/sec", rate / CPU_NTT_BASELINE
    )


def bench_prove(k=12):
    """keygen + prove + verify wall time, simple mul circuit, KZG-GWC."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    from circuits import SimpleCircuit

    from halo2_tpu.circuit import Value
    from halo2_tpu.curves import BN254_G1
    from halo2_tpu.plonk import create_proof, keygen_pk, keygen_vk, verify_proof
    from halo2_tpu.poly.kzg import ParamsKZG
    from halo2_tpu.poly.multiopen_gwc import gwc_create_proof, gwc_verify_proof
    from halo2_tpu.transcript import Blake2bTranscript
    from halo2_tpu.utils.rng import FieldRng

    spec = BN254_G1.scalar
    constant, a = 7, 5
    c = constant * pow(a, 4, spec.p) % spec.p
    circuit = SimpleCircuit(constant, Value.known(a))
    params = ParamsKZG.setup_host(k, seed=b"bench-prove")

    t0 = time.perf_counter()
    vk = keygen_vk(params, circuit.without_witnesses())
    pk = keygen_pk(params, vk, circuit.without_witnesses())
    keygen_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    rng = FieldRng(spec, b"bench-prove-rng")
    transcript = Blake2bTranscript(BN254_G1)
    proof = create_proof(params, pk, [circuit], [[[c]]], rng, transcript, gwc_create_proof)
    prove_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    tr = Blake2bTranscript(BN254_G1, proof)
    assert verify_proof(params, vk, [[[c]]], tr, gwc_verify_proof)
    verify_s = time.perf_counter() - t0

    out = []
    out.append(emit(f"keygen_wall_s_k{k}", keygen_s, "s", 0.0))
    out.append(emit(f"prove_wall_s_k{k}", prove_s, "s", 0.0))
    out.append(emit(f"verify_wall_s_k{k}", verify_s, "s", 0.0))
    return out


def main():
    prove_k = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    results = []
    results.append(bench_msm())
    results.append(bench_ntt())
    results.extend(bench_prove(prove_k))
    with open("BENCH_full.json", "w") as f:
        json.dump({"results": results, "ts": time.time()}, f, indent=1)


if __name__ == "__main__":
    main()
