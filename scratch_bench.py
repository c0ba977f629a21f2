import json, time, sys

import jax

from halo2_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

K = 16


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from halo2_tpu.curves.point import Point, batch_normalize
    from halo2_tpu.curves.spec import BN254_G1
    from halo2_tpu.ops import ntt as ntt_ops
    from halo2_tpu.ops.msm import msm
    from halo2_tpu.ops.scalar_mul import batch_scalar_mul

    import jax.numpy as jnp
    import numpy as np
    from halo2_tpu.fields.spec import NLIMBS

    curve = BN254_G1
    fr = curve.scalar
    n = 1 << K
    log(f"devices: {jax.devices()}")

    s = 0x2F39C57A1F6BC5E7D5A8E2B1C4D3F6A7B8C9D0E1F2A3B4C5D6E7F8091A2B3C4 % fr.p
    t0 = time.perf_counter()
    s_pows = ntt_ops.power_table(fr, s, n)
    from halo2_tpu.curves.point import generator

    gpt = generator(curve)
    g_broad = Point(
        jnp.broadcast_to(gpt.x.reshape(NLIMBS, 1), (NLIMBS, n)),
        jnp.broadcast_to(gpt.y.reshape(NLIMBS, 1), (NLIMBS, n)),
        jnp.broadcast_to(gpt.z.reshape(NLIMBS, 1), (NLIMBS, n)),
    )
    points = batch_normalize(curve, batch_scalar_mul(curve, s_pows, g_broad))
    points = jax.block_until_ready(points)
    log(f"points setup done in {time.perf_counter()-t0:.1f}s")

    t = 0x1D2C3B4A5968778695A4B3C2D1E0F1E2D3C4B5A69788796A5B4C3D2E1F0A1B2 % fr.p
    scalars = ntt_ops.power_table(fr, t, n)
    scalars = jax.block_until_ready(scalars)
    log("scalars ready")

    wb = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    run = jax.jit(lambda sc, pt: msm(curve, sc, pt, c, wb))
    t0 = time.perf_counter()
    lowered = run.lower(scalars, points)
    log(f"traced in {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    compiled = lowered.compile()
    log(f"compiled in {time.perf_counter()-t0:.1f}s")
    mem = compiled.memory_analysis()
    log(f"memory: {mem}")
    t0 = time.perf_counter()
    out = compiled(scalars, points)
    _ = np.asarray(out.x)
    dt = time.perf_counter() - t0
    log(f"first run: {dt:.2f}s -> {n/dt:.0f} pts/s")
    t0 = time.perf_counter()
    for _ in range(3):
        out = compiled(scalars, points)
    _ = np.asarray(out.x)
    dt = (time.perf_counter() - t0) / 3
    log(f"steady: {dt:.3f}s -> {n/dt:.0f} pts/s")


if __name__ == "__main__":
    main()
