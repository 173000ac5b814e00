"""Config semantics + Gauss filter bank tests (vs hand-computed reference
values from gauss_filter.cu / sift_conf.cu formulas)."""

import math

import numpy as np
import pytest

from popsift_tpu.config import SiftConfig, GAUSS_ALIGN
from popsift_tpu.gauss import build_gauss_tables, gauss_span, full_kernel


def test_defaults_match_reference():
    c = SiftConfig()
    assert c.levels == 3
    assert c.sigma == 1.6
    assert c.edge_limit == 10.0
    assert c.threshold == 0.04
    assert c.upscale_factor == 1.0
    assert c.total_levels == 6
    # peak threshold: 0.04 * 0.5 * 255 / 3 (sift_conf.cu:275-278)
    assert abs(c.peak_threshold - 1.7) < 1e-6
    assert abs(c.sigma_k - 2 ** (1 / 3)) < 1e-9
    # initial blur scaled to upscaled coords: 0.5 * 2 = 1.0
    assert abs(c.scaled_initial_blur - 1.0) < 1e-9


def test_octave_count_auto():
    c = SiftConfig()
    # floor(log2(min(w,h))) - 3 + 2^1 (popsift.cpp:107-111)
    assert c.num_octaves_for(640, 480) == int(math.floor(math.log2(480))) - 1
    assert c.num_octaves_for(640, 480) == 7
    assert c.num_octaves_for(16, 16) == 3
    assert c.num_octaves_for(4, 4) == 1  # clamped at 1
    assert SiftConfig(octaves=4).num_octaves_for(640, 480) == 4


def test_octave_dims():
    c = SiftConfig()
    dims = c.octave_dims(640, 480)
    assert dims[0] == (960, 1280)
    assert dims[1] == (480, 640)
    assert dims[2] == (240, 320)
    # ceil halving (popsift.cpp: w = ceilf(w/2.0f))
    c2 = SiftConfig(octaves=3, upscale_factor=0.0)
    assert c2.octave_dims(101, 75) == [(75, 101), (38, 51), (19, 26)]


def test_vlfeat_span():
    # ceil(4 sigma) + 1 (gauss_filter.cu:302-308)
    assert gauss_span(1.6, "vlfeat") == 8
    assert gauss_span(1.2489995, "vlfeat") == 6
    assert gauss_span(10.0, "vlfeat") == GAUSS_ALIGN - 1  # clamp


def test_opencv_span():
    # (round(8 sigma + 1) | 1) >> 1 + 1 (gauss_filter.cu:322-328)
    sigma = 1.6
    span = int(round(8 * sigma + 1)) | 1
    assert gauss_span(sigma, "opencv") == (span >> 1) + 1


def test_filters_normalized_and_symmetric():
    c = SiftConfig()
    t = build_gauss_tables(c)
    for half, span in zip(t.inc, t.inc_span):
        k = full_kernel(half, int(span))
        assert abs(k.sum() - 1.0) < 1e-6
        assert np.allclose(k, k[::-1])
        assert np.all(k >= 0)


def test_incremental_sigma_recursion():
    c = SiftConfig()
    t = build_gauss_tables(c)
    # sigma_inc[l] = sqrt(sigma_l^2 - sigma_{l-1}^2) (gauss_filter.cu:181-186)
    for lvl in range(1, c.total_levels):
        s_prev = 1.6 * 2 ** ((lvl - 1) / 3)
        s_next = 1.6 * 2 ** (lvl / 3)
        expect = math.sqrt(s_next ** 2 - s_prev ** 2)
        assert abs(t.inc_sigma[lvl] - expect) < 1e-5
    # level 0 subtracts the scaled initial blur: sqrt(1.6^2 - 1.0^2)
    assert abs(t.inc_sigma[0] - math.sqrt(1.6 ** 2 - 1.0 ** 2)) < 1e-5


def test_dd_table_level0_equals_inc_level0():
    """dd.sigma[0] must equal inc.sigma[0] so octave-0 level-0 horizontal
    (dd) and vertical (inc) passes use the same blur
    (gauss_filter.cu comments at s_pyramid_build_ra.cu:25-28)."""
    c = SiftConfig()
    t = build_gauss_tables(c)
    assert abs(t.dd_sigma[0] - t.inc_sigma[0]) < 1e-6


def test_incremental_composition_equals_absolute():
    """Blurring by inc[1] after abs_o0[0] must equal abs_o0[1] blur
    (the sigma-addition identity the pyramid relies on)."""
    c = SiftConfig()
    t = build_gauss_tables(c)
    target = float(t.abs_o0_sigma[1])
    composed = math.sqrt(float(t.abs_o0_sigma[0]) ** 2 + float(t.inc_sigma[1]) ** 2)
    assert abs(composed - target) < 1e-5


def test_capacity_rules():
    c = SiftConfig()
    assert c.capacity_for_octave(960, 1280) == (960 * 1280) // 128
    assert c.capacity_for_octave(2160, 3840) == c.extrema_capacity_cap
    assert c.capacity_for_octave(16, 16) == 512
    c2 = SiftConfig(extrema_capacity=1000)
    assert c2.capacity_for_octave(960, 1280) == 1000


def test_config_validation():
    with pytest.raises(ValueError):
        SiftConfig(sigma=2.5)
    with pytest.raises(ValueError):
        SiftConfig(desc_mode="bogus")
    assert SiftConfig(levels=1).levels == 2  # clamped like popsift.cpp:71
    # gauss mode aliases (sift_conf.cu:83-101)
    assert SiftConfig(gauss_mode="relative").gauss_mode == "vlfeat-relative"
    assert SiftConfig(gauss_mode="vlfeat-direct").gauss_mode == "vlfeat-relative-all"


def _fold_blur_table(half: np.ndarray, span: int):
    """Reference transformBlurTable (gauss_filter.cu:374-411), test-only:
    fold adjacent tap pairs (a, b) into (ratio u, weight v) so one
    hardware-lerp fetch at offset x + (1 - u) applies both taps."""
    i_span = span if span % 2 == 1 else span + 1
    folded = np.zeros(GAUSS_ALIGN, np.float32)
    folded[0] = half[0]
    for x in range(1, i_span, 2):
        a = float(half[x])
        b = float(half[x + 1])
        folded[x] = a / (a + b)        # ratio u (odd slots)
        folded[x + 1] = a + b          # multiplier v (even slots)
    return folded, i_span


def _unfold_through_lerp(folded: np.ndarray, i_span: int) -> np.ndarray:
    """Expand the folded table through the hardware linear interpolation:
    v * lerp(I[x], I[x+1]; 1-u) contributes v*u to tap x and v*(1-u) to
    tap x+1 (s_pyramid_build_ai.cu:17-44 sampling convention)."""
    eff = np.zeros(GAUSS_ALIGN, np.float32)
    eff[0] = folded[0]
    for x in range(1, i_span, 2):
        u = float(folded[x])
        v = float(folded[x + 1])
        eff[x] = np.float32(v * u)
        eff[x + 1] = np.float32(v * (1.0 - u))
    return eff


@pytest.mark.parametrize("mode", ["vlfeat-relative", "vlfeat", "opencv"])
def test_tap_folding_identity(mode):
    """The hw-interpolated blur path (gauss::absoluteSourceInterpolated,
    s_pyramid_build_ai.cu) is numerically the plain-tap filter: folding
    (gauss_filter.cu:374-411) then expanding through the lerp recovers
    every tap. This checks the claim gauss.py:17-19 relies on when it
    builds only the plain-tap bank."""
    c = SiftConfig(gauss_mode=mode)
    t = build_gauss_tables(c)
    for bank, spans in ((t.inc, t.inc_span), (t.abs_o0, t.abs_o0_span),
                        (t.abs_oN, t.abs_oN_span)):
        for half, span in zip(bank, spans):
            span = int(span)
            if span < 2:     # identity filter: nothing to fold
                continue
            folded, i_span = _fold_blur_table(half, span)
            eff = _unfold_through_lerp(folded, i_span)
            # exact up to a few f32 roundings (fold divide + unfold multiply)
            np.testing.assert_allclose(eff[:span], half[:span],
                                       rtol=1e-6, atol=1e-12)
            # full symmetric kernels agree too (what the image sees)
            np.testing.assert_allclose(
                full_kernel(eff, span), full_kernel(half, span),
                rtol=1e-6, atol=1e-12)
