"""VPU/MXU roofline microbenchmarks + the field-mul speed-of-light model.

Measures, on the local chip (VERDICT r4 next-round #5):
  1. u32 multiply-add throughput of the VPU (pallas kernel, many independent
     vreg chains so the pipeline is full) — the true denominator for the
     Montgomery-mul MFU.
  2. u32 add/mask throughput (the cheap-op rate, for the ops model split).
  3. Achieved Montgomery muls/s of the production rows-layout kernel
     (fields/pallas_kernels.mont_mul_rows).
  4. MXU int8->int32 and bf16 matmul rates (dot_general) — the data for the
     "should limb products ride the MXU?" question.

Writes ROOFLINE.json and prints one JSON line per metric.  The ops model and
conclusions live in docs/SPEED_OF_LIGHT.md.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from halo2_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

# ops per Montgomery mul in the vreg kernel (counted from fields/vreg.py vmul;
# the breakdown is derived in docs/SPEED_OF_LIGHT.md)
OPS_PER_MONT_MUL = 2736
MULS_PER_MONT_MUL = 528

ROWS = 256  # (8*ROWS, 128) u32 block = 8 MB -> VMEM-tiled by pallas
LANES = 128


def _bench_chain(fn, x, *rest, reps=20):
    """Time ``reps`` calls with the output CHAINED into the next input, and a
    host pull of one element at the end — immune to duplicate-computation
    elision and to unreliable block_until_ready on the axon tunnel."""
    x0 = x
    x = fn(x, *rest)
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]  # warm-up sync
    x = x0
    t0 = time.perf_counter()
    for _ in range(reps):
        x = fn(x, *rest)
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]
    return (time.perf_counter() - t0) / reps


def bench_vpu_mul(iters=1 << 16, reps=3):
    """y = y*x + x chained ``iters`` times over a (2048, 128) u32 block.
    Rows are independent -> the VPU pipeline stays full; measures u32
    multiply-add issue throughput."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        y = x

        def body(_, y):
            return y * x + x

        y = jax.lax.fori_loop(0, iters, body, y)
        o_ref[...] = y

    shape = (8 * ROWS, LANES)
    x = jnp.arange(np.prod(shape), dtype=jnp.uint32).reshape(shape) | jnp.uint32(1)
    spec = pl.BlockSpec((8 * ROWS, LANES), lambda: (0, 0), memory_space=pltpu.VMEM)
    run = jax.jit(
        lambda a: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
            in_specs=[spec], out_specs=spec,
        )(a)
    )
    dt = _bench_chain(run, x, reps=reps)
    # one loop body = 1 u32 multiply + 1 u32 add per element
    ops = np.prod(shape) * iters * 2
    return float(ops / dt)


def bench_vpu_add(iters=1 << 16, reps=3):
    """y = (y + x) & mask chains: the cheap-op (add/logical) issue rate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mask = np.uint32(0xFFFF)  # numpy scalar: folds into the kernel, not a capture

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        y = x

        def body(_, y):
            return (y + x) & mask

        y = jax.lax.fori_loop(0, iters, body, y)
        o_ref[...] = y

    shape = (8 * ROWS, LANES)
    x = jnp.arange(np.prod(shape), dtype=jnp.uint32).reshape(shape)
    spec = pl.BlockSpec((8 * ROWS, LANES), lambda: (0, 0), memory_space=pltpu.VMEM)
    run = jax.jit(
        lambda a: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
            in_specs=[spec], out_specs=spec,
        )(a)
    )
    dt = _bench_chain(run, x, reps=reps)
    ops = np.prod(shape) * iters * 2  # add + and
    return float(ops / dt)


def bench_mont_mul(n=1 << 18, inner=256, reps=3):
    """Achieved Montgomery muls/s of the production kernel at width n.

    ``inner`` chained multiplies run inside ONE dispatch (fori_loop) so the
    ~1 ms axon per-dispatch latency is amortized out of the measurement."""
    from halo2_tpu.fields import limb
    from halo2_tpu.fields.pallas_kernels import mont_mul_flat
    from halo2_tpu.fields.spec import BN254_FR

    spec = BN254_FR
    a = limb.from_ints(spec, [(i * 7 + 3) % spec.p for i in range(4096)])
    a = jnp.tile(a, (1, n // 4096))
    run = jax.jit(
        lambda x, y: jax.lax.fori_loop(
            0, inner, lambda _, acc: mont_mul_flat(spec, acc, y), x
        )
    )
    dt = _bench_chain(run, a, a, reps=reps)
    return float(n * inner / dt)


def bench_mxu(m=2048, k=2048, n=2048, dtype="int8", reps=3):
    """dot_general MACs/s at the given shape/dtype."""
    if dtype == "int8":
        a = jnp.ones((m, k), jnp.int8)
        b = jnp.ones((k, n), jnp.int8)
        run = jax.jit(
            lambda x, y: jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        )
    else:
        a = jnp.ones((m, k), jnp.bfloat16)
        b = jnp.ones((k, n), jnp.bfloat16)
        run = jax.jit(
            lambda x, y: jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        )
    # chain inside one dispatch: result feeds the next A operand (cast), so
    # no duplicate-elision and no per-call RPC latency in the measurement
    inner = 256
    if dtype == "int8":
        chained = jax.jit(
            lambda x, y: jax.lax.fori_loop(
                0, inner, lambda _, acc: run(acc.astype(jnp.int8), y), x
            )
        )
        a0 = a.astype(jnp.int32)
    else:
        chained = jax.jit(
            lambda x, y: jax.lax.fori_loop(
                0, inner, lambda _, acc: run(acc.astype(jnp.bfloat16), y), x
            )
        )
        a0 = a.astype(jnp.float32)
    dt = _bench_chain(chained, a0, b, reps=reps)
    return float(m * k * n * inner / dt)  # MACs/s


def main():
    results = {}

    def emit(metric, value, unit):
        results[metric] = {"value": value, "unit": unit}
        print(json.dumps({"metric": metric, "value": f"{value:.4g}", "unit": unit}), flush=True)

    vpu_mul = bench_vpu_mul()
    emit("vpu_u32_muladd_ops_per_sec", vpu_mul, "u32 ops/s (mul+add pairs counted as 2)")
    vpu_add = bench_vpu_add()
    emit("vpu_u32_addmask_ops_per_sec", vpu_add, "u32 ops/s")
    fmuls = bench_mont_mul()
    emit("mont_mul_per_sec_k18", fmuls, "field muls/s (mont_mul_rows, n=2^18)")

    # speed-of-light model: a Montgomery mul is OPS_PER_MONT_MUL u32 ops of
    # which MULS_PER_MONT_MUL are multiplies; bound by whichever issue rate
    # binds first.  CAVEAT (docs/SPEED_OF_LIGHT.md §2): the single-op-type
    # chains above under-measure the VPU's mixed-stream peak — the fused EC
    # add kernel inside the MSM sustains ~3e12 u32 ops/s, ~4x these chains —
    # so treat this as a LOWER bound on hardware peak; per-kernel MFUs are
    # quoted against it and against the architectural estimate below.
    mul_bound = vpu_mul / 2 / MULS_PER_MONT_MUL  # mul issue slots
    ops_bound = vpu_add / (OPS_PER_MONT_MUL - 2 * MULS_PER_MONT_MUL)
    sol = min(mul_bound, ops_bound)
    emit("mont_mul_speed_of_light_per_sec", sol, "field muls/s (single-stream VPU model)")
    emit("mont_mul_mfu_vs_vpu_model", fmuls / sol, "fraction")
    # v5e architectural estimate: (8x128) lanes x ~4 ALU slots x ~1.74 GHz
    ARCH_PEAK_U32_OPS = 7.1e12
    emit("vpu_arch_peak_u32_ops_per_sec_est", ARCH_PEAK_U32_OPS, "u32 ops/s (estimate)")
    emit(
        "mont_mul_ops_fraction_of_arch_peak",
        fmuls * OPS_PER_MONT_MUL / ARCH_PEAK_U32_OPS,
        "fraction",
    )

    mxu_i8 = bench_mxu(dtype="int8")
    emit("mxu_int8_macs_per_sec", mxu_i8, "int8 MACs/s")
    mxu_bf16 = bench_mxu(dtype="bf16")
    emit("mxu_bf16_macs_per_sec", mxu_bf16, "bf16 MACs/s")

    results["model"] = {
        "ops_per_mont_mul": OPS_PER_MONT_MUL,
        "muls_per_mont_mul": MULS_PER_MONT_MUL,
        "notes": "see docs/SPEED_OF_LIGHT.md for the derivation and the MXU "
        "analysis (shared-operand REDC m*p matmul vs per-element a*b)",
    }
    with open("ROOFLINE.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote ROOFLINE.json", flush=True)


if __name__ == "__main__":
    main()
