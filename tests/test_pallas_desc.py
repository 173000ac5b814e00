"""Pallas descriptor kernel vs the XLA loop-chunk formulation
(interpret mode on CPU; Mosaic-compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from popsift_tpu.config import SiftConfig
from popsift_tpu.ops.descriptors import (
    DescriptorJobs, _descriptor_loop_chunk, loop_patch_radius)
from popsift_tpu.ops.pallas.desc import descriptor_loop_pallas
from popsift_tpu.ops.patches import (extract_patches_rect,
                                     pad_for_patches)


def _jobs(rng, F, H, W, cfg):
    x = rng.uniform(8, W - 8, F).astype(np.float32)
    y = rng.uniform(8, H - 8, F).astype(np.float32)
    sigma = rng.uniform(1.2, 2.8, F).astype(np.float32)
    level = rng.integers(0, 3, F).astype(np.int32)
    ang = rng.uniform(-np.pi, np.pi, F).astype(np.float32)
    valid = np.ones(F, bool)
    valid[-1] = False
    return DescriptorJobs(
        x=jnp.asarray(x), y=jnp.asarray(y), sigma=jnp.asarray(sigma),
        level=jnp.asarray(level), ang=jnp.asarray(ang),
        kp_index=jnp.arange(F, dtype=jnp.int32),
        valid=jnp.asarray(valid),
        count=jnp.int32(F - 1))


def test_desc_kernel_matches_chunk(rng):
    cfg = SiftConfig()
    H, W = 96, 128
    L = cfg.total_levels
    blur = jnp.asarray(
        rng.normal(64, 32, size=(L, H, W)).astype(np.float32))
    radius = loop_patch_radius(cfg)
    img = pad_for_patches(blur, 2 * radius + 1)
    jobs = _jobs(rng, 16, H, W, cfg)

    want = np.asarray(_descriptor_loop_chunk(img, (H, W), jobs, radius))

    rows = -(-(2 * radius + 1) // 8) * 8
    cols = -(-(2 * radius + 1) // 128) * 128
    img2 = pad_for_patches(blur, max(rows, cols))
    xr = jnp.round(jobs.x).astype(jnp.int32)
    yr = jnp.round(jobs.y).astype(jnp.int32)
    patches, y0, x0 = extract_patches_rect(img2, jobs.level, yr, xr,
                                           rows, cols, radius, radius)
    got = np.asarray(descriptor_loop_pallas(
        patches, y0, x0, jobs, H, W, interpret=True))

    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * max(scale, 1.0))
    # invalid job must be zero
    assert np.abs(got[-1]).max() == 0.0


def test_desc_dma_kernel_matches_chunk(rng):
    from popsift_tpu.ops.pallas.desc import descriptor_loop_pallas_dma
    cfg = SiftConfig()
    H, W = 96, 128
    L = cfg.total_levels
    blur = jnp.asarray(
        rng.normal(64, 32, size=(L, H, W)).astype(np.float32))
    radius = loop_patch_radius(cfg)
    img = pad_for_patches(blur, 2 * radius + 1)
    jobs = _jobs(rng, 16, H, W, cfg)
    want = np.asarray(_descriptor_loop_chunk(img, (H, W), jobs, radius))

    Hp = max(-(-(H + 64) // 8) * 8, 112)
    Wp = max(-(-(W + 208) // 128) * 128, 256)
    img2 = jnp.pad(blur, ((0, 0), (0, Hp - H), (0, Wp - W)), mode="edge")
    got = np.asarray(descriptor_loop_pallas_dma(
        img2, jobs, radius, H, W, interpret=True))

    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * max(scale, 1.0))
    assert np.abs(got[-1]).max() == 0.0


def test_orientation_hist_pallas_matches_xla(rng):
    from popsift_tpu.ops.extrema import OctaveExtrema
    from popsift_tpu.ops.orientation import (_orientation_hist_xla,
                                             max_ori_radius)
    from popsift_tpu.ops.pallas.orient import orientation_hist_pallas

    cfg = SiftConfig()
    H, W = 96, 160
    L = cfg.total_levels
    blur = jnp.asarray(
        rng.normal(96, 40, size=(L, H, W)).astype(np.float32))
    K = 16
    valid = np.ones(K, bool)
    valid[-2:] = False
    ext = OctaveExtrema(
        x=jnp.asarray(rng.uniform(3, W - 3, K).astype(np.float32)),
        y=jnp.asarray(rng.uniform(3, H - 3, K).astype(np.float32)),
        s=jnp.zeros(K, jnp.float32),
        level=jnp.asarray(rng.integers(0, 3, K).astype(np.int32)),
        sigma=jnp.asarray(rng.uniform(1.2, 3.0, K).astype(np.float32)),
        cell=jnp.zeros(K, jnp.int32),
        valid=jnp.asarray(valid),
        count=jnp.int32(K - 2),
        n_candidates=jnp.int32(K),
        n_dropped=jnp.int32(0))

    R = max_ori_radius(cfg)
    want = np.array(_orientation_hist_xla(blur, ext, cfg, R))
    # the XLA path doesn't mask invalid rows (done later via ext.valid);
    # zero them for comparison
    want[~valid] = 0.0

    Hp = max(-(-(H + 40) // 8) * 8, 64)
    Wp = max(-(-(W + 240) // 128) * 128, 256)
    img2 = jnp.pad(blur, ((0, 0), (0, Hp - H), (0, Wp - W)), mode="edge")
    got = np.asarray(orientation_hist_pallas(img2, ext, R, H, W,
                                             interpret=True))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=3e-5 * scale)


def test_candidate_mask_pallas_matches_xla(rng):
    from popsift_tpu.ops.extrema import _candidate_mask
    from popsift_tpu.ops.pallas.extrema_mask import candidate_mask_pallas

    cfg = SiftConfig()
    D, H, W = cfg.total_levels - 1, 96, 160
    dog = jnp.asarray(rng.normal(0, 3, size=(D, H, W)).astype(np.float32))
    want = np.asarray(_candidate_mask(dog, cfg, use_pallas=False))
    from popsift_tpu.ops.extrema import _first_threshold
    got = np.asarray(candidate_mask_pallas(
        dog[:want.shape[0] + 2], _first_threshold(cfg), interpret=True))
    np.testing.assert_array_equal(got, want)


def test_window_extractor_matches_gather(rng):
    from popsift_tpu.ops.pallas.window import extract_windows_pallas

    D, H, W = 5, 64, 96
    vol = jnp.asarray(rng.normal(size=(D, H, W)).astype(np.float32))
    R, P = 5, 11
    Wpad = -(-(W + R + 256) // 128) * 128
    volp = jnp.pad(vol, ((0, 0), (R, R + 16), (R, Wpad - W - R)),
                   mode="edge")
    K = 16
    cy = jnp.asarray(rng.integers(0, H, K).astype(np.int32))
    cx = jnp.asarray(rng.integers(0, W, K).astype(np.int32))
    got, y0, x0 = extract_windows_pallas(volp, cy + R, cx + R, R, P, P,
                                         interpret=True)
    got = np.asarray(got)
    vp = np.asarray(volp)
    for k in range(K):
        ref = vp[:, int(y0[k]):int(y0[k]) + P, int(x0[k]):int(x0[k]) + P]
        np.testing.assert_array_equal(got[k], ref)


def test_desc_dma_bucketed_matches_chunk(rng):
    """Sigma-bucketed two-instance kernel path == the XLA loop chunk on
    a job mix straddling the sigma split (small and large windows)."""
    import math
    from popsift_tpu.config import DESC_MAGNIFY
    from popsift_tpu.ops.pallas.desc import descriptor_loop_pallas_bucketed
    cfg = SiftConfig()
    H, W = 96, 128
    L = cfg.total_levels
    blur = jnp.asarray(
        rng.normal(64, 32, size=(L, H, W)).astype(np.float32))
    radius = loop_patch_radius(cfg)
    img = pad_for_patches(blur, 2 * radius + 1)
    jobs = _jobs(rng, 16, H, W, cfg)
    # push half the jobs above the split so both kernel instances run
    sigma_split = cfg.sigma * 2.0 ** (2.5 / cfg.levels)
    sig = np.asarray(jobs.sigma).copy()
    sig[::2] = rng.uniform(sigma_split + 0.2, 4.4,
                           len(sig[::2])).astype(np.float32)
    jobs = jobs._replace(sigma=jnp.asarray(sig))
    radius_small = int(math.ceil(2.5 * math.sqrt(2.0)
                                 * DESC_MAGNIFY * sigma_split)) + 2

    want = np.asarray(_descriptor_loop_chunk(img, (H, W), jobs, radius))

    Hp = max(-(-(H + 64) // 8) * 8, 112)
    Wp = max(-(-(W + 240) // 128) * 128, 256)
    img2 = jnp.pad(blur, ((0, 0), (0, Hp - H), (0, Wp - W)), mode="edge")
    got = np.asarray(descriptor_loop_pallas_bucketed(
        img2, jobs, radius, sigma_split, radius_small, H, W,
        interpret=True))

    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * max(scale, 1.0))
    assert np.abs(got[-1]).max() == 0.0


def test_orientation_hist_bucketed_matches_xla(rng):
    """Radius-bucketed orientation kernel == XLA path on a sigma mix
    straddling the bucket split."""
    from popsift_tpu.ops.extrema import OctaveExtrema
    from popsift_tpu.ops.orientation import (_orientation_hist_xla,
                                             max_ori_radius)
    from popsift_tpu.ops.pallas.orient import (
        orientation_hist_pallas_bucketed)
    from popsift_tpu.config import ORI_WINFACTOR

    cfg = SiftConfig()
    H, W = 96, 160
    L = cfg.total_levels
    blur = jnp.asarray(
        rng.normal(96, 40, size=(L, H, W)).astype(np.float32))
    K = 16
    valid = np.ones(K, bool)
    valid[-2:] = False
    sigma_split = cfg.sigma * 2.0 ** (2.5 / cfg.levels)
    sig = rng.uniform(1.2, 2.6, K).astype(np.float32)
    sig[::2] = rng.uniform(sigma_split + 0.2, 4.8,
                           len(sig[::2])).astype(np.float32)
    ext = OctaveExtrema(
        x=jnp.asarray(rng.uniform(3, W - 3, K).astype(np.float32)),
        y=jnp.asarray(rng.uniform(3, H - 3, K).astype(np.float32)),
        s=jnp.zeros(K, jnp.float32),
        level=jnp.asarray(rng.integers(0, 3, K).astype(np.int32)),
        sigma=jnp.asarray(sig),
        cell=jnp.zeros(K, jnp.int32),
        valid=jnp.asarray(valid),
        count=jnp.int32(K - 2),
        n_candidates=jnp.int32(K),
        n_dropped=jnp.int32(0))

    R = max_ori_radius(cfg)
    radius_small = int(round(3.0 * ORI_WINFACTOR * sigma_split))
    want = np.array(_orientation_hist_xla(blur, ext, cfg, R))
    want[~valid] = 0.0

    Hp = max(-(-(H + 64) // 8) * 8, 112)
    Wp = max(-(-(W + 240) // 128) * 128, 256)
    img2 = jnp.pad(blur, ((0, 0), (0, Hp - H), (0, Wp - W)), mode="edge")
    got = np.asarray(orientation_hist_pallas_bucketed(
        img2, ext, R, sigma_split, radius_small, H, W, interpret=True))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=3e-5 * scale)
