"""Canvas-path detection parity (interpret mode).

The TPU pipeline reads detection inputs from a shared halo-padded DoG
canvas (ops/pyramid.py::assemble_dog_canvas) whose halo is ZEROS, not
edge replicas — safe because border pixels are forced false in the mask
kernel and the refinement one-hot neighborhood never selects
out-of-image pixels (step policy clamps to [1, H-2],
/root/reference/src/popsift/s_extrema.cu:258-284). These tests check
that claim numerically: the canvas path must reproduce the plain
(edge-padded, XLA) path bit for bit on awkward (non-tile-aligned)
sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from popsift_tpu.config import SiftConfig
from popsift_tpu.ops.extrema import (_candidate_mask, collect_candidates,
                                     refine_candidates)
from popsift_tpu.ops.pyramid import (DOG_OX, DOG_OY, assemble_dog_canvas,
                                     assemble_gauss_canvas,
                                     dog_canvas_dims, gauss_canvas_dims)


def _random_dog(H, W, D=5, seed=0, scale=60.0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(D, H, W)).astype(np.float32)
    # smooth a little so strict extrema are sparse-ish but present
    k = np.array([0.25, 0.5, 0.25], np.float32)
    for ax in (1, 2):
        base = (np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), ax, base))
    return jnp.asarray(base * scale)


@pytest.mark.parametrize("hw", [(67, 93), (64, 128), (35, 41)])
def test_mask_canvas_parity(hw):
    H, W = hw
    cfg = SiftConfig()
    dog = _random_dog(H, W)
    ref = _candidate_mask(dog, cfg, use_pallas=False)
    canvas = assemble_dog_canvas([dog[d] for d in range(dog.shape[0])],
                                 H, W)
    assert canvas.shape[1:] == dog_canvas_dims(H, W)
    got = _candidate_mask(None, cfg, canvas=canvas, dims=(H, W),
                          interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_collect_refine_canvas_parity():
    """Full canvas detection (mask + compact + window DMA + refine)
    equals the plain path: positions, scales and validity bit-exact."""
    H, W = 67, 93
    cfg = SiftConfig()
    cap = 256
    dog = _random_dog(H, W, seed=3)
    plain = collect_candidates(dog, cfg, cap)
    canvas = assemble_dog_canvas([dog[d] for d in range(dog.shape[0])],
                                 H, W)
    canv = collect_candidates(None, cfg, cap, canvas=canvas, dims=(H, W),
                              interpret=True)
    assert int(canv.n_found) == int(plain.n_found)
    n = int(plain.n_found)
    for f in ("x0", "y0", "z0"):
        assert np.array_equal(np.asarray(getattr(canv, f))[:n],
                              np.asarray(getattr(plain, f))[:n]), f

    rp = refine_candidates(plain, cfg, W, H)
    rc = refine_candidates(canv, cfg, W, H)
    assert np.array_equal(np.asarray(rc.valid), np.asarray(rp.valid))
    for f in ("x", "y", "s", "sigma"):
        assert np.array_equal(np.asarray(getattr(rc, f)),
                              np.asarray(getattr(rp, f))), f


def test_collect_batched_parity():
    """Frame-batched canvas collection (one mask launch + one window
    launch for F frames) equals per-frame plain collection."""
    from popsift_tpu.ops.extrema import collect_candidates_batched

    H, W = 67, 93
    cfg = SiftConfig()
    cap = 64          # multiple of the window kernel's block size
    F = 2
    dogs = [_random_dog(H, W, seed=s) for s in (3, 11)]
    canvases = [assemble_dog_canvas([d[i] for i in range(d.shape[0])],
                                    H, W) for d in dogs]
    stacked = jnp.concatenate(canvases, axis=0)     # [F*D, Hd, Wd]
    got = collect_candidates_batched(stacked, F, cfg, cap, (H, W),
                                     interpret=True)
    for f in range(F):
        plain = collect_candidates(dogs[f], cfg, cap)
        n = int(plain.n_found)
        assert int(got.n_found[f]) == n
        for fld in ("x0", "y0", "z0"):
            assert np.array_equal(np.asarray(getattr(got, fld))[f, :n],
                                  np.asarray(getattr(plain, fld))[:n]), \
                (fld, f)
        # patches are frame-major [F*cap, D, P, P]; compare against the
        # single-frame canvas path (zero halo differs from the plain
        # path's edge replicas outside the image, by design)
        single = collect_candidates(None, cfg, cap, canvas=canvases[f],
                                    dims=(H, W), interpret=True)
        gp = np.asarray(got.patches)[f * cap:f * cap + n]
        pp = np.asarray(single.patches)[:n]
        assert np.array_equal(gp, pp), f

        # refinement from either candidate set agrees
        sl = lambda a: a[f * cap:(f + 1) * cap]
        sub = got.__class__(patches=sl(got.patches),
                            x0=got.x0[f], y0=got.y0[f], z0=got.z0[f],
                            valid=got.valid[f], n_found=got.n_found[f],
                            n_dropped=got.n_dropped[f])
        rp = refine_candidates(plain, cfg, W, H)
        rc = refine_candidates(sub, cfg, W, H)
        assert np.array_equal(np.asarray(rc.valid), np.asarray(rp.valid))
        for fld in ("x", "y", "s", "sigma"):
            assert np.array_equal(np.asarray(getattr(rc, fld)),
                                  np.asarray(getattr(rp, fld))), (fld, f)


def test_gauss_canvas_geometry():
    H, W = 35, 41
    lv = [jnp.full((H, W), float(i)) for i in range(6)]
    c = assemble_gauss_canvas(lv, H, W)
    assert c.shape[1:] == gauss_canvas_dims(H, W)
    assert np.array_equal(np.asarray(c[3, :H, :W]), np.asarray(lv[3]))
    assert float(jnp.sum(c[:, H:, :])) == 0.0

    dgc = assemble_dog_canvas(lv[:5], H, W)
    assert np.array_equal(
        np.asarray(dgc[2, DOG_OY:DOG_OY + H, DOG_OX:DOG_OX + W]),
        np.asarray(lv[2]))
    assert float(jnp.sum(dgc[:, :DOG_OY, :])) == 0.0


@pytest.mark.parametrize("gauss_mode,scaling",
                         [("vlfeat", "indirect"),
                          ("vlfeat-relative-all", "indirect"),
                          ("fixed9", "indirect"),
                          ("vlfeat", "direct")])
def test_canvas_direct_build_parity(gauss_mode, scaling):
    """build_pyramid_canvases (canvas-only storage, round-5 bandwidth
    fix) must reproduce the assemble_* canvases bit for bit across the
    strategy branches it mirrors (s_pyramid_build.cu:460-596)."""
    from popsift_tpu.ops.pyramid import (build_pyramid_canvases,
                                         build_pyramid_octaves,
                                         build_pyramid_plan)

    rng = np.random.default_rng(7)
    h, w = 61, 83
    img = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
    cfg = SiftConfig(gauss_mode=gauss_mode, scaling_mode=scaling,
                     octaves=3)
    if gauss_mode == "fixed9":
        cfg = cfg.replace(levels=3)
    plan = build_pyramid_plan(cfg, h, w)

    octs = build_pyramid_octaves(jnp.asarray(img), plan)
    ref_g = [assemble_gauss_canvas(lv, *plan.dims[o])
             for o, (lv, _) in enumerate(octs)]
    ref_d = [assemble_dog_canvas(dg, *plan.dims[o])
             for o, (_, dg) in enumerate(octs)]
    got_g, got_d = build_pyramid_canvases(jnp.asarray(img), plan)
    for o in range(len(plan.dims)):
        assert np.array_equal(np.asarray(got_g[o]), np.asarray(ref_g[o])), o
        assert np.array_equal(np.asarray(got_d[o]), np.asarray(ref_d[o])), o


def test_canvas_direct_into_batch_layout():
    """into=(gc2, dc2) with gbase/dbase must land each frame's layers
    exactly where the unrolled batched front puts them."""
    from popsift_tpu.ops.pyramid import (build_pyramid_canvases,
                                         build_pyramid_plan,
                                         dog_canvas_dims,
                                         gauss_canvas_dims)

    rng = np.random.default_rng(8)
    h, w = 41, 57
    F = 2
    imgs = rng.integers(0, 255, size=(F, h, w), dtype=np.uint8)
    cfg = SiftConfig(octaves=2)
    plan = build_pyramid_plan(cfg, h, w)
    L = cfg.total_levels

    gc2 = [jnp.zeros((F * L,) + gauss_canvas_dims(*d), jnp.float32)
           for d in plan.dims]
    dc2 = [jnp.zeros((F * (L - 1),) + dog_canvas_dims(*d), jnp.float32)
           for d in plan.dims]
    for f in range(F):
        build_pyramid_canvases(jnp.asarray(imgs[f]), plan,
                               into=(gc2, dc2), gbase=f * L,
                               dbase=f * (L - 1))
    for f in range(F):
        g1, d1 = build_pyramid_canvases(jnp.asarray(imgs[f]), plan)
        for o in range(len(plan.dims)):
            assert np.array_equal(np.asarray(gc2[o][f * L:(f + 1) * L]),
                                  np.asarray(g1[o])), (f, o)
            assert np.array_equal(
                np.asarray(dc2[o][f * (L - 1):(f + 1) * (L - 1)]),
                np.asarray(d1[o])), (f, o)
