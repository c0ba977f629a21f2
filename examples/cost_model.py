"""cost-model.rs analog: estimate proof size and prover time for a circuit
shape from measured MSM/NTT rates.

Run: PYTHONPATH=. python examples/cost_model.py --k 14
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def measure_msm_rate(k: int) -> float:
    """points/sec of the device MSM at 2^k points."""
    import jax
    import jax.numpy as jnp

    from halo2_tpu.curves.point import Point, batch_normalize, generator
    from halo2_tpu.curves.spec import BN254_G1
    from halo2_tpu.fields.spec import NLIMBS
    from halo2_tpu.ops import ntt as ntt_ops
    from halo2_tpu.ops.msm import msm
    from halo2_tpu.ops.scalar_mul import batch_scalar_mul

    n = 1 << k
    fr = BN254_G1.scalar
    s_pows = ntt_ops.power_table(fr, 12345, n)
    gpt = generator(BN254_G1)
    g = Point(
        jnp.broadcast_to(gpt.x.reshape(NLIMBS, 1), (NLIMBS, n)),
        jnp.broadcast_to(gpt.y.reshape(NLIMBS, 1), (NLIMBS, n)),
        jnp.broadcast_to(gpt.z.reshape(NLIMBS, 1), (NLIMBS, n)),
    )
    points = batch_normalize(BN254_G1, batch_scalar_mul(BN254_G1, s_pows, g))
    scalars = ntt_ops.power_table(fr, 777, n)
    out = msm(BN254_G1, scalars, points)
    jax.block_until_ready(out)
    start = time.perf_counter()
    out = msm(BN254_G1, scalars, points)
    jax.block_until_ready(out)
    return n / (time.perf_counter() - start)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=12, help="log2 circuit rows")
    ap.add_argument("--advice", type=int, default=3)
    ap.add_argument("--lookups", type=int, default=1)
    ap.add_argument("--permutations", type=int, default=4)
    ap.add_argument("--degree", type=int, default=5)
    ap.add_argument("--measure-k", type=int, default=10, help="MSM size for rate measurement")
    args = ap.parse_args()

    rate = measure_msm_rate(args.measure_k)
    n = 1 << args.k
    chunks = (args.permutations + args.degree - 3) // max(args.degree - 2, 1)
    # commitments of size n during proving (prover.rs / SURVEY.md §3.2)
    msms = (
        args.advice                      # advice columns
        + 3 * args.lookups               # permuted input/table + product
        + chunks                         # permutation z per chunk
        + 1                              # vanishing random poly
        + (args.degree - 1)              # h pieces
        + 1                              # multiopen witness (scheme-dependent)
    )
    est = msms * n / rate
    print(f"measured MSM rate @2^{args.measure_k}: {rate:,.0f} points/sec")
    print(f"estimated k={args.k} prover MSM time: {est:.2f}s ({msms} MSMs of 2^{args.k})")


if __name__ == "__main__":
    main()
