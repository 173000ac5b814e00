"""JAX pyramid vs NumPy oracle golden tests."""

import jax
import numpy as np

from popsift_tpu.config import SiftConfig
from popsift_tpu.ops.pyramid import build_pyramid, build_pyramid_plan
from popsift_tpu.oracle import oracle_pyramid


def _compare(img, cfg, atol=2e-3):
    plan = build_pyramid_plan(cfg, *img.shape)
    fn = jax.jit(lambda x: build_pyramid(x, plan))
    blurs_j, dogs_j = fn(img)
    blurs_o, dogs_o = oracle_pyramid(img, cfg)
    assert len(blurs_j) == len(blurs_o)
    for o, (bj, bo) in enumerate(zip(blurs_j, blurs_o)):
        bj = np.asarray(bj)
        assert bj.shape == bo.shape, f"octave {o} shape"
        err = np.abs(bj - bo).max()
        assert err < atol, f"octave {o} blur max err {err}"
    for o, (dj, do) in enumerate(zip(dogs_j, dogs_o)):
        err = np.abs(np.asarray(dj) - do).max()
        assert err < atol, f"octave {o} dog max err {err}"


def test_pyramid_matches_oracle(small_image):
    _compare(small_image, SiftConfig(octaves=3))


def test_pyramid_matches_oracle_odd_size():
    rng = np.random.default_rng(5)
    img = (rng.uniform(0, 255, size=(61, 83))).astype(np.uint8)
    _compare(img, SiftConfig(octaves=3))


def test_pyramid_matches_oracle_no_upscale(small_image):
    _compare(small_image, SiftConfig(octaves=2, upscale_factor=0.0))


def test_pyramid_matches_oracle_more_levels(small_image):
    _compare(small_image, SiftConfig(octaves=2, levels=4))


def test_pyramid_strategy_branches(small_image):
    """Direct scaling and relative-all modes build and stay close to the
    incremental pyramid (same target sigmas, different accumulation)."""
    import jax
    from popsift_tpu.config import SiftConfig
    from popsift_tpu.ops.pyramid import build_pyramid, build_pyramid_plan

    h, w = small_image.shape
    base_cfg = SiftConfig(octaves=3)
    base_plan = build_pyramid_plan(base_cfg, h, w)
    base_blurs, _ = jax.jit(lambda x: build_pyramid(x, base_plan))(small_image)

    for kw in ({"scaling_mode": "direct"},
               {"gauss_mode": "vlfeat-relative-all"}):
        cfg = SiftConfig(octaves=3, **kw)
        plan = build_pyramid_plan(cfg, h, w)
        blurs, dogs = jax.jit(lambda x: build_pyramid(x, plan))(small_image)
        for o, (b, bb) in enumerate(zip(blurs, base_blurs)):
            assert b.shape == bb.shape
            # interior agreement within a few gray levels
            d = np.abs(np.asarray(b) - np.asarray(bb))[:, 4:-4, 4:-4]
            # direct scaling is a documented accuracy trade-off in the
            # reference; divergence grows with octave
            assert d.mean() < 3.0 + 1.5 * o, (kw, o, d.mean())
