"""setup vs setup_host equivalence: the two SRS paths must be bit-identical.

setup_host (host fixed-base windowed mul) is the default SRS path in
__graft_entry__.py and the plonk_api tests; setup (device scalar-mul chain)
is the original.  Both derive s from the same blake2b(seed) and must agree
on every g[i], g_lagrange[i] and s_g2 (ADVICE.md round-2 medium finding).
"""

import pytest
import numpy as np

from halo2_tpu.poly.kzg import ParamsKZG

pytestmark = pytest.mark.slow  # compile-heavy (full pipelines / large shapes)

K = 3


def test_setup_host_matches_setup():
    seed = b"setup-equiv"
    dev = ParamsKZG.setup(K, seed=seed)
    hst = ParamsKZG.setup_host(K, seed=seed)
    assert dev._s == hst._s
    for name in ("g", "g_lagrange"):
        a, b = getattr(dev, name), getattr(hst, name)
        for coord in ("x", "y", "z"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, coord)),
                np.asarray(getattr(b, coord)),
                err_msg=f"{name}.{coord} differs between setup and setup_host",
            )
    assert dev.g2 == hst.g2
    assert dev.s_g2 == hst.s_g2
