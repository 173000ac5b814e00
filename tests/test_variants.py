"""Reference-semantics variants (round-2 work package): float input,
true grid descriptor, iloop descriptor, fixed9/fixed15 gauss modes,
interpolated downscale, grid-filter budget redistribution.

Each variant is anchored to its oracle extension (popsift_tpu.oracle),
which re-derives the reference semantics independently in NumPy.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from popsift_tpu.config import SiftConfig
from popsift_tpu.gauss import build_gauss_tables
from popsift_tpu.ops.descriptors import (
    DescriptorJobs,
    _descriptor_iloop_chunk,
    _descriptor_tilegrid_chunk,
)
from popsift_tpu.ops.gridfilter import grid_filter_mask
from popsift_tpu.oracle.sift_oracle import (
    OracleExtremum,
    oracle_descriptor_grid,
    oracle_descriptor_iloop,
    oracle_descriptor_tilegrid,
    oracle_extrema,
    oracle_orientations,
    oracle_pyramid,
)
from popsift_tpu.pipeline import build_extract_plan, extract
from popsift_tpu.ops.pyramid import build_pyramid, build_pyramid_plan

from conftest import synthetic_image


# ---------------------------------------------------------------------------
# pyramid variants
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gauss_mode", ["fixed9", "fixed15"])
def test_fixed_mode_pyramid_matches_oracle(small_image, gauss_mode):
    """Fixed modes build octave 0 entirely from the input with abs_o0 and
    octaves >0 from level 0 with abs_oN (s_pyramid_fixed.cu:202-288)."""
    cfg = SiftConfig(octaves=3, gauss_mode=gauss_mode)
    plan = build_pyramid_plan(cfg, *small_image.shape)
    blurs, dogs = build_pyramid(jnp.asarray(small_image), plan)
    oblurs, odogs = oracle_pyramid(small_image, cfg)
    for octv in range(3):
        got = np.asarray(blurs[octv])
        want = oblurs[octv]
        assert np.max(np.abs(got - want)) < 5e-3, f"octave {octv}"
        # level 1+ must NOT equal the incremental-mode pyramid
    inc = build_pyramid(jnp.asarray(small_image),
                        build_pyramid_plan(SiftConfig(octaves=3),
                                           *small_image.shape))
    assert np.max(np.abs(np.asarray(blurs[0][3])
                         - np.asarray(inc[0][0][3]))) > 0.05


def test_fixed_mode_requires_levels3():
    with pytest.raises(ValueError):
        SiftConfig(gauss_mode="fixed9", levels=4)


def test_interpolated_downscale_matches_oracle(small_image):
    """get_by_2_interpolate picks texel (2x+1, 2y+1)
    (s_pyramid_build.cu:33-49)."""
    cfg = SiftConfig(octaves=3, downscale_mode="interpolate")
    plan = build_pyramid_plan(cfg, *small_image.shape)
    blurs, _ = build_pyramid(jnp.asarray(small_image), plan)
    oblurs, _ = oracle_pyramid(small_image, cfg)
    for octv in (1, 2):
        assert np.max(np.abs(np.asarray(blurs[octv][0])
                             - oblurs[octv][0])) < 2e-3
    # and it differs from pick-every-second
    cfg2 = SiftConfig(octaves=3)
    blurs2, _ = build_pyramid(jnp.asarray(small_image),
                              build_pyramid_plan(cfg2, *small_image.shape))
    assert np.max(np.abs(np.asarray(blurs[1][0])
                         - np.asarray(blurs2[1][0]))) > 0.05


def test_float_input_matches_uint8(small_image):
    """ImageFloat mode (s_image.cu:264-293): float [0,1] input must give
    the same pyramid/features as uint8/255."""
    cfg = SiftConfig(octaves=3, extrema_capacity=256)
    plan = build_extract_plan(cfg, *small_image.shape)
    o1 = extract(jnp.asarray(small_image), plan)
    o2 = extract(jnp.asarray(small_image.astype(np.float32) / 255.0), plan)
    assert int(o1.n_keypoints) == int(o2.n_keypoints)
    assert np.allclose(np.asarray(o1.x), np.asarray(o2.x), atol=1e-3)
    assert np.allclose(np.asarray(o1.desc), np.asarray(o2.desc), atol=2e-3)


def test_api_accepts_float_image(small_image):
    from popsift_tpu.api import PopSift
    ps = PopSift(SiftConfig(octaves=3, extrema_capacity=256))
    job = ps.enqueue(small_image.astype(np.float32) / 255.0)
    f = job.get()
    assert f.getFeatureCount() > 0
    with pytest.raises(TypeError):
        ps.enqueue(small_image.astype(np.float64))


def test_vlfeat_relative_end_to_end(small_image):
    """vlfeat-relative (hw-interpolated tables) differs only by filter
    span on TPU (no texture unit); the mode must run end-to-end and
    produce a similar keypoint set to plain vlfeat."""
    cfg = SiftConfig(octaves=3, extrema_capacity=256,
                     gauss_mode="vlfeat-relative")
    plan = build_extract_plan(cfg, *small_image.shape)
    out = extract(jnp.asarray(small_image), plan)
    base = extract(jnp.asarray(small_image),
                   build_extract_plan(SiftConfig(octaves=3,
                                                 extrema_capacity=256),
                                      *small_image.shape))
    n, nb = int(out.n_keypoints), int(base.n_keypoints)
    assert n > 0 and abs(n - nb) <= max(2, nb // 3)


# ---------------------------------------------------------------------------
# descriptor variants
# ---------------------------------------------------------------------------

def _sample_jobs(img, cfg, n=6):
    """Build a few real descriptor jobs (octave 0) for variant tests."""
    blurs, dogs = oracle_pyramid(img, cfg)
    exts = oracle_extrema(dogs[0], cfg, 0)
    rows = []
    for e in exts:
        for ang in oracle_orientations(blurs[0], e, cfg):
            rows.append((e, ang))
        if len(rows) >= n:
            break
    assert len(rows) >= 2
    rows = rows[:n]
    jobs = DescriptorJobs(
        x=jnp.asarray([e.x for e, _ in rows], jnp.float32),
        y=jnp.asarray([e.y for e, _ in rows], jnp.float32),
        sigma=jnp.asarray([e.sigma for e, _ in rows], jnp.float32),
        level=jnp.asarray([e.level for e, _ in rows], jnp.int32),
        ang=jnp.asarray([a for _, a in rows], jnp.float32),
        kp_index=jnp.zeros(len(rows), jnp.int32),
        valid=jnp.ones(len(rows), bool),
        count=jnp.asarray(len(rows), jnp.int32))
    return jnp.asarray(blurs[0]), rows, jobs


def test_tilegrid_descriptor_matches_oracle(medium_image):
    cfg = SiftConfig(octaves=1, threshold=0.02)
    blur, rows, jobs = _sample_jobs(medium_image, cfg)
    got = np.asarray(_descriptor_tilegrid_chunk(blur, jobs))
    for i, (e, ang) in enumerate(rows):
        want = oracle_descriptor_tilegrid(np.asarray(blur), e, ang, cfg)
        denom = max(1e-3, float(np.abs(want).max()))
        assert np.max(np.abs(got[i] - want)) / denom < 5e-3, i


def test_iloop_descriptor_matches_oracle(medium_image):
    cfg = SiftConfig(octaves=1, threshold=0.02)
    blur, rows, jobs = _sample_jobs(medium_image, cfg, n=4)
    got = np.asarray(_descriptor_iloop_chunk(blur, jobs))
    for i, (e, ang) in enumerate(rows):
        want = oracle_descriptor_iloop(np.asarray(blur), e, ang, cfg)
        denom = max(1e-3, float(np.abs(want).max()))
        assert np.max(np.abs(got[i] - want)) / denom < 5e-3, i


def test_grid_differs_from_igrid(medium_image):
    """The config names must map to distinct semantics: grid rounds
    sample addresses (s_desc_grid.cu:73), igrid interpolates."""
    cfg = SiftConfig(octaves=1, threshold=0.02)
    blur, rows, jobs = _sample_jobs(medium_image, cfg)
    e, ang = rows[0]
    tg = oracle_descriptor_tilegrid(np.asarray(blur), e, ang, cfg)
    ig = oracle_descriptor_grid(np.asarray(blur), e, ang, cfg)
    # similar direction but not identical values
    cos = float(tg @ ig / (np.linalg.norm(tg) * np.linalg.norm(ig) + 1e-9))
    assert cos > 0.85
    assert np.max(np.abs(tg - ig)) > 1e-3


def test_all_desc_modes_run_end_to_end(small_image):
    counts = {}
    for mode in ("loop", "iloop", "grid", "igrid", "notile"):
        cfg = SiftConfig(octaves=2, extrema_capacity=128, desc_mode=mode)
        plan = build_extract_plan(cfg, *small_image.shape)
        out = extract(jnp.asarray(small_image), plan)
        counts[mode] = int(out.n_descriptors)
        assert counts[mode] > 0
    assert counts["igrid"] == counts["notile"]


# ---------------------------------------------------------------------------
# grid filter budget redistribution
# ---------------------------------------------------------------------------

def _ref_gridfilter_numpy(cells, sigmas, valid, budget, n_cells,
                          mode="largest"):
    """Direct NumPy port of the reference host algorithm
    (s_filtergrid.cu:159-281): sort per cell by the mode order, compute
    newlimit from the sorted histogram, keep the first newlimit of each
    cell."""
    idx = np.arange(len(cells))
    counts = np.array([int(np.sum(valid & (cells == c)))
                       for c in range(n_cells)])
    total = counts.sum()
    cs = np.sort(counts)
    prefix = np.cumsum(cs)
    sumup = prefix + cs * (n_cells - 1 - np.arange(n_cells))
    ct = int(np.sum(sumup > budget))
    if ct == 0:
        return valid.copy()
    tail_avg = cs[n_cells - ct:].sum() / ct
    newlimit = int(np.ceil(tail_avg - (total - budget) / ct))
    keep = np.zeros_like(valid)
    for c in range(n_cells):
        rows = idx[valid & (cells == c)]
        if mode == "largest":
            order = rows[np.argsort(-sigmas[rows], kind="stable")]
        elif mode == "smallest":
            order = rows[np.argsort(sigmas[rows], kind="stable")]
        else:
            order = rows
        keep[order[:max(newlimit, 1)]] = True
    return keep


def test_grid_filter_redistributes_budget():
    """Uneven load: a dense cell keeps more than budget/n_cells because
    sparse cells don't use their share (s_filtergrid.cu:245-260)."""
    rng = np.random.default_rng(5)
    n_cells = 4
    counts = [300, 20, 15, 10]
    cells = np.concatenate([np.full(c, i) for i, c in enumerate(counts)])
    sigmas = rng.uniform(1.0, 8.0, cells.shape[0]).astype(np.float32)
    valid = np.ones(cells.shape[0], bool)
    budget = 200
    cfg = SiftConfig(filter_max_extrema=budget, filter_grid_size=2,
                     grid_filter_mode="largest")
    keep = np.asarray(grid_filter_mask(
        jnp.asarray(cells, jnp.int32), jnp.asarray(sigmas),
        jnp.asarray(valid), cfg))
    want = _ref_gridfilter_numpy(cells, sigmas, valid, budget, n_cells)
    # sparse cells keep everything
    for c in (1, 2, 3):
        assert keep[cells == c].sum() == counts[c]
    # dense cell absorbs the unused budget: limit = ceil(300-(345-200)/1)
    assert keep[cells == 0].sum() == 155
    assert keep.sum() == want.sum()
    assert np.array_equal(keep, want)


def test_grid_filter_two_dense_cells():
    rng = np.random.default_rng(9)
    counts = [120, 100, 8, 4]
    cells = np.concatenate([np.full(c, i) for i, c in enumerate(counts)])
    sigmas = rng.uniform(1.0, 8.0, cells.shape[0]).astype(np.float32)
    valid = np.ones(cells.shape[0], bool)
    budget = 100
    cfg = SiftConfig(filter_max_extrema=budget, filter_grid_size=2,
                     grid_filter_mode="smallest")
    keep = np.asarray(grid_filter_mask(
        jnp.asarray(cells, jnp.int32), jnp.asarray(sigmas),
        jnp.asarray(valid), cfg))
    want = _ref_gridfilter_numpy(cells, sigmas, valid, budget, 4,
                                 mode="smallest")
    assert np.array_equal(keep, want)


def test_grid_filter_under_budget_keeps_all():
    cells = np.array([0, 0, 1, 2, 3], np.int32)
    sig = np.ones(5, np.float32)
    valid = np.ones(5, bool)
    cfg = SiftConfig(filter_max_extrema=100, filter_grid_size=2)
    keep = np.asarray(grid_filter_mask(jnp.asarray(cells),
                                       jnp.asarray(sig),
                                       jnp.asarray(valid), cfg))
    assert keep.all()


# ---------------------------------------------------------------------------
# compaction density clamp observability
# ---------------------------------------------------------------------------

def test_compact_mask_exact_on_dense_mask():
    """The advisor's failure case: ~10% density small mask must not lose
    candidates (K auto-scales with capacity/size)."""
    from popsift_tpu.ops.extrema import _compact_mask
    rng = np.random.default_rng(3)
    mask = rng.random(777) < 0.12
    n = int(mask.sum())
    idx, total, dropped = _compact_mask(jnp.asarray(mask), capacity=256)
    assert int(total) == n
    assert int(dropped) == 0
    assert np.array_equal(np.asarray(idx)[:n], np.nonzero(mask)[0])


def test_compact_mask_reports_dropped():
    from popsift_tpu.ops.extrema import _compact_mask
    mask = np.zeros(1024, bool)
    mask[:200] = True          # 128-dense first block with block_k=16
    idx, total, dropped = _compact_mask(jnp.asarray(mask), capacity=512,
                                        block_k=16)
    # round-5: the sort-based rank compaction counts exactly (the old
    # int8 rank-maximum form saturated at 127 and under-reported a
    # 100%-dense block's drop count by exactly 1)
    assert int(dropped) == (128 - 16) + (72 - 16)
    assert int(total) == 32


def test_saturation_warning(small_image):
    """Capacity saturation must be surfaced (VERDICT round 1, weak #3)."""
    import warnings
    from popsift_tpu.api import PopSift
    ps = PopSift(SiftConfig(octaves=3, extrema_capacity=4,
                            threshold=0.005))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ps.enqueue(small_image).get()
    assert any("saturated" in str(r.message) for r in rec)


def test_calibrate_plan(small_image):
    from popsift_tpu.pipeline import calibrate_plan
    cfg = SiftConfig(octaves=3)
    plan = calibrate_plan(cfg, [jnp.asarray(small_image)],
                          *small_image.shape)
    assert all(c >= 256 for c in plan.ext_caps)
    out = extract(jnp.asarray(small_image), plan)
    assert int(out.n_keypoints) > 0


def test_grid_filter_random_mode_counts():
    """'random' keep-ORDER is a documented deliberate deviation (hash
    order vs Thrust shuffle, sift_conf.h:72-76 calls random unstable);
    the per-cell KEPT COUNTS must still match the redistribution
    algorithm exactly."""
    rng = np.random.default_rng(13)
    counts = [200, 40, 30, 10]
    cells = np.concatenate([np.full(c, i) for i, c in enumerate(counts)])
    sigmas = rng.uniform(1.0, 8.0, cells.shape[0]).astype(np.float32)
    valid = np.ones(cells.shape[0], bool)
    budget = 150
    cfg = SiftConfig(filter_max_extrema=budget, filter_grid_size=2,
                     grid_filter_mode="random")
    keep = np.asarray(grid_filter_mask(
        jnp.asarray(cells, jnp.int32), jnp.asarray(sigmas),
        jnp.asarray(valid), cfg))
    want = _ref_gridfilter_numpy(cells, sigmas, valid, budget, 4)
    for c in range(4):
        assert keep[cells == c].sum() == want[cells == c].sum(), c


def test_interpolated_downscale_odd_dims():
    """Odd-sized sources need the edge clamp in _decimate2_interpolate
    (texel 2i+1 can exceed the source)."""
    from popsift_tpu.ops.pyramid import _decimate2_interpolate
    rng = np.random.default_rng(2)
    x = rng.normal(size=(33, 41)).astype(np.float32)
    oh, ow = 17, 21
    got = np.asarray(_decimate2_interpolate(jnp.asarray(x), oh, ow))
    yi = np.minimum(2 * np.arange(oh) + 1, 32)
    xi = np.minimum(2 * np.arange(ow) + 1, 40)
    want = x[np.ix_(yi, xi)]
    np.testing.assert_array_equal(got, want)


def test_popsift_calibrate_api(small_image):
    from popsift_tpu.api import PopSift
    ps = PopSift(SiftConfig(octaves=3))
    plan = ps.calibrate([small_image])
    assert all(c >= 256 for c in plan.ext_caps)
    feats = ps.enqueue(small_image).get()     # uses the calibrated plan
    assert feats.getFeatureCount() > 0
