"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from popsift_tpu.config import SiftConfig
from popsift_tpu.parallel.batch import make_batched_extract_fn
from popsift_tpu.parallel.mesh import make_mesh, device_report
from tests.conftest import synthetic_image


pytestmark = pytest.mark.distributed


def test_devices_available():
    assert len(jax.devices()) == 8
    assert device_report()


def test_batched_extract_matches_single():
    cfg = SiftConfig(octaves=2, extrema_capacity=128)
    h, w = 48, 64
    imgs = np.stack([synthetic_image(h, w, seed=i) for i in range(8)])
    mesh = make_mesh(8)
    fn = make_batched_extract_fn(cfg, h, w, mesh)
    feats, _ = fn(imgs)
    counts = np.asarray(feats.n_keypoints)
    assert counts.shape == (8,)

    # single-image pipeline must agree per image
    from popsift_tpu.pipeline import build_extract_plan, make_extract_fn
    plan = build_extract_plan(cfg, h, w)
    single = make_extract_fn(plan)
    for i in range(8):
        got = single(imgs[i])
        assert int(got.n_keypoints) == int(counts[i])
        xs_b = np.asarray(feats.x[i])[np.asarray(feats.valid[i])]
        xs_s = np.asarray(got.x)[np.asarray(got.valid)]
        np.testing.assert_allclose(np.sort(xs_b), np.sort(xs_s), atol=1e-4)


def test_ring_matching_over_ici():
    cfg = SiftConfig(octaves=2, extrema_capacity=128)
    h, w = 48, 64
    base = synthetic_image(h, w, seed=1)
    # every image is a small shift of the previous -> ring pairs match
    imgs = np.stack([np.roll(base, (i, 2 * i), axis=(0, 1))
                     for i in range(8)])
    mesh = make_mesh(8)
    fn = make_batched_extract_fn(cfg, h, w, mesh, match_pairs=True)
    feats, res = fn(imgs)
    acc = np.asarray(res.accept)
    nvalid = np.asarray(feats.desc_valid).sum(axis=1)
    for i in range(8):
        assert acc[i].sum() > 0.3 * max(nvalid[i], 1), \
            f"pair {i}->{(i + 1) % 8}: {acc[i].sum()}/{nvalid[i]} matches"


def test_allpairs_sharded_matching():
    """Systolic ring all-pairs matching must reproduce the local
    all-pairs result for every (i, j) pair (VERDICT round-2 item 9)."""
    from popsift_tpu.ops.matching import match_brute_small
    from popsift_tpu.parallel.batch import make_allpairs_match_fn
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    N, C = 8, 48
    desc = rng.normal(size=(N, C, 128)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    # plant strong matches between every pair
    for i in range(N):
        for j in range(i + 1, N):
            desc[j, (i * 3) % C] = desc[i, (j * 5) % C] + \
                rng.normal(scale=0.01, size=128).astype(np.float32)
    valid = rng.random((N, C)) < 0.9

    mesh = make_mesh(4, axis_name="dp")
    fn = make_allpairs_match_fn(mesh, axis_name="dp", tile=32)
    res = fn(jnp.asarray(desc), jnp.asarray(valid))

    for i in range(N):
        for j in range(N):
            if i == j:
                continue
            want = match_brute_small(
                jnp.asarray(desc[i]), jnp.asarray(valid[i]),
                jnp.asarray(desc[j]), jnp.asarray(valid[j]))
            np.testing.assert_array_equal(
                np.asarray(res.accept[i, j]), np.asarray(want.accept),
                err_msg=f"pair {i},{j}")
            acc = np.asarray(want.accept)
            np.testing.assert_array_equal(
                np.asarray(res.best_idx[i, j])[acc],
                np.asarray(want.best_idx)[acc])
            np.testing.assert_allclose(
                np.asarray(res.best_dist[i, j])[acc],
                np.asarray(want.best_dist)[acc], atol=1e-5)
