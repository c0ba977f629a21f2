"""One golden check through the fully-optimized XLA pipeline.

The rest of the suite compiles with jax_disable_most_optimizations for speed
(conftest.py), which means bench.py's production pipeline is otherwise never
tested; this subprocess runs a field-mul + tiny-MSM golden check with full
optimizations so an optimization-dependent miscompile of the limb graphs
cannot ship silently (ADVICE.md round-2 finding).
"""

import pytest
import os
import subprocess
import sys

pytestmark = pytest.mark.slow  # compile-heavy (full-optimization subprocess)

_CHECK = r"""
import jax, random
jax.config.update("jax_platforms", "cpu")
random.seed(7)
from halo2_tpu.curves import BN254_G1, from_affine_ints, host, to_affine_ints
from halo2_tpu.fields import limb
from halo2_tpu.fields.spec import BN254_FR
from halo2_tpu.ops.msm import msm

# field mul golden
a, b = random.randrange(BN254_FR.p), random.randrange(BN254_FR.p)
out = limb.to_ints(
    BN254_FR, limb.fmul(BN254_FR, limb.from_ints(BN254_FR, [a]), limb.from_ints(BN254_FR, [b]))
)[0]
assert out == a * b % BN254_FR.p, "optimized-pipeline fmul miscompile"

# tiny MSM golden
spec = BN254_G1
g = host.generator(spec)
pts = [host.mul(spec, g, 3 + i) for i in range(4)]
scalars = [random.randrange(spec.scalar.p) for _ in range(4)]
want = host.msm(spec, scalars, pts)
got = msm(spec, limb.from_ints(spec.scalar, scalars), from_affine_ints(spec, pts), 4)
assert to_affine_ints(spec, got)[0] == want, "optimized-pipeline msm miscompile"
print("OPTIMIZED-OK")
"""


def test_optimized_pipeline_golden():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # strip the suite's de-optimization flags; keep the persistent cache off so
    # this actually compiles through the optimized pipeline
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    out = subprocess.run(
        [sys.executable, "-c", _CHECK], env=env, capture_output=True, text=True,
        timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OPTIMIZED-OK" in out.stdout
