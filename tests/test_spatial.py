"""Spatially-sharded pyramid: halo-exchange blur over an 8-device mesh
must reproduce the single-device pyramid exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from popsift_tpu.config import SiftConfig
from popsift_tpu.ops.pyramid import _sep_blur, build_pyramid_plan
from popsift_tpu.parallel.mesh import make_mesh
from popsift_tpu.parallel.spatial import make_sharded_pyramid_fn


@pytest.mark.distributed
def test_sharded_pyramid_matches_single_device(rng):
    cfg = SiftConfig()
    H, W = 256, 96
    lvl0 = jnp.asarray(
        rng.normal(96, 40, size=(H, W)).astype(np.float32))

    mesh = make_mesh(8, axis_name="sp")
    fn = make_sharded_pyramid_fn(cfg, H, W, mesh)
    blurs, dogs = fn(lvl0)

    # single-device reference
    plan = build_pyramid_plan(cfg, H, W)
    levels = [lvl0]
    for lvl in range(1, cfg.total_levels):
        levels.append(_sep_blur(levels[-1], plan.inc_kernels[lvl]))
    ref_blur = np.stack([np.asarray(l) for l in levels])
    ref_dog = ref_blur[1:] - ref_blur[:-1]

    np.testing.assert_allclose(np.asarray(blurs), ref_blur, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dogs), ref_dog, atol=1e-4)


@pytest.mark.distributed
def test_sharded_pyramid_rejects_bad_height():
    cfg = SiftConfig()
    mesh = make_mesh(8, axis_name="sp")
    with pytest.raises(ValueError):
        make_sharded_pyramid_fn(cfg, 63, 96, mesh)
    with pytest.raises(ValueError):
        make_sharded_pyramid_fn(cfg, 64, 96, mesh)  # band < halo


# ---------------------------------------------------------------------------
# End-to-end sharded extraction (round-2 VERDICT item 1)
# ---------------------------------------------------------------------------

def _feature_sets(feats):
    """(sorted keypoint rows, per-kp descriptor lists) from SiftFeatures."""
    valid = np.asarray(feats.valid)
    rows = np.nonzero(valid)[0]
    x = np.asarray(feats.x)[rows]
    y = np.asarray(feats.y)[rows]
    sig = np.asarray(feats.sigma)[rows]
    nori = np.asarray(feats.num_ori)[rows]
    order = np.lexsort((sig, y, x))
    kp = np.stack([x, y, sig, nori], axis=1)[order]

    dvalid = np.asarray(feats.desc_valid)
    drows = np.nonzero(dvalid)[0]
    dkp = np.asarray(feats.desc_kp)[drows]
    desc = np.asarray(feats.desc)[drows]
    by_kp = {}
    for d, k in zip(desc, dkp):
        by_kp.setdefault(int(k), []).append(d)
    # keypoint global row -> position key
    key_of = {int(r): (float(np.asarray(feats.x)[r]),
                       float(np.asarray(feats.y)[r])) for r in rows}
    desc_sets = {}
    for k, ds in by_kp.items():
        desc_sets[key_of[k]] = np.sort(np.stack(ds), axis=0)
    return kp, desc_sets


@pytest.mark.distributed
@pytest.mark.slow
def test_sharded_extract_parity():
    """Full sharded extraction on a 4-device row mesh must reproduce the
    single-device keypoint + descriptor sets (band interiors are
    bit-identical; only ordering differs)."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from conftest import synthetic_image
    from popsift_tpu.parallel.spatial import make_sharded_extract_fn
    from popsift_tpu.pipeline import build_extract_plan, extract

    H, W = 224, 160
    img = synthetic_image(H, W, seed=11)
    cfg = SiftConfig(octaves=4, extrema_capacity=512)
    mesh = make_mesh(4, axis_name="sp")

    fn, eff_caps = make_sharded_extract_fn(cfg, H, W, mesh)
    out_s = fn(jnp.asarray(img))

    plan = build_extract_plan(cfg, H, W, octave_caps=eff_caps)
    out_p = extract(jnp.asarray(img), plan)

    assert int(out_s.n_keypoints) == int(out_p.n_keypoints) > 10
    assert int(out_s.n_descriptors) == int(out_p.n_descriptors)

    kp_s, ds_s = _feature_sets(out_s)
    kp_p, ds_p = _feature_sets(out_p)
    np.testing.assert_allclose(kp_s, kp_p, atol=2e-4)
    assert len(ds_s) == len(ds_p)
    for key in ds_s:
        near = min(ds_p, key=lambda q: abs(q[0] - key[0])
                   + abs(q[1] - key[1]))
        assert abs(near[0] - key[0]) + abs(near[1] - key[1]) < 1e-3, key
        a, b = ds_s[key], ds_p[near]
        assert a.shape == b.shape, key
        np.testing.assert_allclose(a, b, atol=5e-3)


@pytest.mark.distributed
def test_sharded_extract_rejects_unsupported():
    from popsift_tpu.parallel.spatial import make_sharded_extract_fn
    mesh = make_mesh(4, axis_name="sp")
    with pytest.raises(ValueError):
        make_sharded_extract_fn(SiftConfig(scaling_mode="direct"),
                                224, 160, mesh)
    with pytest.raises(ValueError):
        make_sharded_extract_fn(SiftConfig(), 225, 160, mesh)


@pytest.mark.distributed
@pytest.mark.slow
def test_batched_sharded_extract_2d_mesh():
    """DP x SP composition: 2 frames over a (2 dp, 2 sp) mesh must match
    per-frame single-device extraction."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from conftest import synthetic_image
    from popsift_tpu.parallel.spatial import make_batched_sharded_extract_fn
    from popsift_tpu.pipeline import build_extract_plan, extract

    H, W = 224, 160
    imgs = np.stack([synthetic_image(H, W, seed=20 + i) for i in range(2)])
    cfg = SiftConfig(octaves=4, extrema_capacity=512)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = jax.sharding.Mesh(devs, ("dp", "sp"))
    fn, eff_caps = make_batched_sharded_extract_fn(cfg, H, W, mesh)
    out = fn(jnp.asarray(imgs))

    plan = build_extract_plan(cfg, H, W, octave_caps=eff_caps)
    for b in range(2):
        ref = extract(jnp.asarray(imgs[b]), plan)
        got_n = int(np.asarray(out.n_keypoints)[b])
        assert got_n == int(ref.n_keypoints) > 10, b
        vs = np.asarray(out.valid[b])
        vp = np.asarray(ref.valid)
        ks = np.sort(np.asarray(out.x[b])[vs])
        kp = np.sort(np.asarray(ref.x)[vp])
        np.testing.assert_allclose(ks, kp, atol=2e-4)
        ds = np.sort(np.asarray(out.desc[b])[np.asarray(out.desc_valid[b])],
                     axis=0)
        dp_ = np.sort(np.asarray(ref.desc)[np.asarray(ref.desc_valid)],
                      axis=0)
        np.testing.assert_allclose(ds, dp_, atol=5e-3)
