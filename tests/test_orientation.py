"""JAX orientation assignment vs NumPy oracle golden tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from popsift_tpu.config import SiftConfig
from popsift_tpu.ops.extrema import OctaveExtrema
from popsift_tpu.ops.orientation import assign_orientations
from popsift_tpu.oracle import oracle_pyramid, oracle_extrema, oracle_orientations


def _pack(exts, cap):
    """Pack oracle extrema into the padded OctaveExtrema layout."""
    n = len(exts)
    z = np.zeros(cap, np.float32)
    zi = np.zeros(cap, np.int32)
    ext = OctaveExtrema(
        x=z.copy(), y=z.copy(), s=z.copy(), level=zi.copy(),
        sigma=z.copy(), cell=zi.copy(),
        valid=np.zeros(cap, bool), count=np.int32(n),
        n_candidates=np.int32(n), n_dropped=np.int32(0))
    for i, e in enumerate(exts[:cap]):
        ext.x[i] = e.x
        ext.y[i] = e.y
        ext.s[i] = e.s
        ext.level[i] = e.level
        ext.sigma[i] = e.sigma
        ext.valid[i] = True
    return OctaveExtrema(*[jnp.asarray(v) for v in ext])


def _angdiff(a, b):
    d = abs(a - b) % (2 * math.pi)
    return min(d, 2 * math.pi - d)


def test_orientations_match_oracle(small_image):
    cfg = SiftConfig(octaves=3)
    blurs, dogs = oracle_pyramid(small_image, cfg)
    checked = 0
    for octv, (blur, dog) in enumerate(zip(blurs, dogs)):
        exts = oracle_extrema(dog, cfg, octv)
        if not exts:
            continue
        cap = max(8, len(exts))
        packed = _pack(exts, cap)
        got = jax.jit(lambda b, e: assign_orientations(b, e, cfg))(blur, packed)
        for i, e in enumerate(exts[:cap]):
            want = oracle_orientations(blur, e, cfg)
            n = int(got.num_ori[i])
            assert n == len(want), \
                f"oct{octv} kp{i}: num_ori {n} vs oracle {len(want)}"
            for j in range(n):
                assert _angdiff(float(got.ori[i, j]), want[j]) < 2e-3, \
                    f"oct{octv} kp{i} ori{j}: {float(got.ori[i, j])} vs {want[j]}"
            checked += n
    assert checked > 5


def test_invalid_extrema_get_no_orientations(small_image):
    cfg = SiftConfig(octaves=1)
    blurs, dogs = oracle_pyramid(small_image, cfg)
    exts = oracle_extrema(dogs[0], cfg, 0)
    cap = len(exts) + 4
    packed = _pack(exts, cap)
    got = jax.jit(lambda b, e: assign_orientations(b, e, cfg))(blurs[0], packed)
    # padded slots (valid=False) must have zero orientations
    for i in range(len(exts), cap):
        assert int(got.num_ori[i]) == 0
