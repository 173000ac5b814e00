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


def test_smoothing_variants_match_numpy():
    """smooth_histograms reproduces both reference smoothing branches
    (s_orientation.cu:142-176) against a direct NumPy rendering."""
    from popsift_tpu.ops.orientation import smooth_histograms

    rng = np.random.default_rng(7)
    h = rng.uniform(0, 4, size=(5, 36)).astype(np.float32)

    # vlfeat: 3 x two circular box-3 passes
    want = h.copy()
    for _ in range(6):
        want = (np.roll(want, 1, axis=1) + want
                + np.roll(want, -1, axis=1)) / 3.0
    got = np.asarray(smooth_histograms(jnp.asarray(h), "vlfeat"))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # opencv: one circular binomial [1,4,6,4,1]/16 pass
    want = np.zeros_like(h)
    for b in range(36):
        want[:, b] = (h[:, (b - 2) % 36] + h[:, (b + 2) % 36]
                      + 4.0 * (h[:, (b - 1) % 36] + h[:, (b + 1) % 36])
                      + 6.0 * h[:, b]) / 16.0
    got = np.asarray(smooth_histograms(jnp.asarray(h), "opencv"))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # binomial preserves total mass (it's a convex circular kernel)
    np.testing.assert_allclose(got.sum(axis=1), h.sum(axis=1), rtol=1e-5)


def test_opencv_smoothing_threads_through_extract(small_image):
    """ori_smoothing='opencv' must reach the orientation tail: the two
    variants yield different (but both plausible) orientation sets."""
    from popsift_tpu.pipeline import build_extract_plan, extract

    h, w = small_image.shape
    pa = build_extract_plan(SiftConfig(octaves=2), h, w)
    pb = build_extract_plan(SiftConfig(octaves=2, ori_smoothing="opencv"),
                            h, w)
    a = extract(small_image, pa)
    b = extract(small_image, pb)
    na, nb = int(a.n_descriptors), int(b.n_descriptors)
    assert na > 0 and nb > 0
    # same detector output, different orientation smoothing: descriptor
    # sets should overlap heavily but not be forced identical
    assert abs(na - nb) <= max(4, na // 4)
    ang_a = np.sort(np.asarray(a.ori)[np.asarray(a.ori_valid, bool)])
    ang_b = np.sort(np.asarray(b.ori)[np.asarray(b.ori_valid, bool)])
    assert not (ang_a.shape == ang_b.shape
                and np.allclose(ang_a, ang_b, atol=1e-6))


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
