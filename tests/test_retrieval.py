"""VLAD retrieval for SfM pair selection: k-means, signatures,
shortlist recall of truly-overlapping pairs."""

import numpy as np
import jax.numpy as jnp

from popsift_tpu.sfm.retrieval import (build_signatures, kmeans,
                                       pair_shortlist, vlad_signature)


def test_kmeans_recovers_clusters():
    rng = np.random.default_rng(0)
    true_c = rng.normal(0, 1, (8, 128)).astype(np.float32) * 3
    pts = (true_c[rng.integers(0, 8, 512)]
           + 0.1 * rng.normal(size=(512, 128))).astype(np.float32)
    centers = np.asarray(kmeans(jnp.asarray(pts),
                                jnp.ones(512, bool), k=8, iters=15))
    # every true center has a learned center within the noise scale
    d = np.linalg.norm(true_c[:, None] - centers[None], axis=2)
    assert (d.min(1) < 0.5).all(), d.min(1)


def test_vlad_signature_properties():
    rng = np.random.default_rng(1)
    desc = np.abs(rng.normal(size=(256, 128))).astype(np.float32)
    centers = np.asarray(kmeans(jnp.asarray(desc),
                                jnp.ones(256, bool), k=16))
    sig = np.asarray(vlad_signature(jnp.asarray(desc),
                                    jnp.ones(256, bool),
                                    jnp.asarray(centers)))
    assert sig.shape == (16 * 128,)
    assert abs(np.linalg.norm(sig) - 1.0) < 1e-5
    # padding-invariant
    descp = np.concatenate([desc, np.zeros((64, 128), np.float32)])
    vp = np.concatenate([np.ones(256, bool), np.zeros(64, bool)])
    sig2 = np.asarray(vlad_signature(jnp.asarray(descp),
                                     jnp.asarray(vp),
                                     jnp.asarray(centers)))
    np.testing.assert_allclose(sig2, sig, atol=1e-5)


def test_shortlist_recall_on_sequence():
    """Synthetic sequence: image i samples scene regions [i, i+4), so
    images overlap iff |i - j| < 4. The VLAD shortlist at top_m=6 must
    recover >= 90% of the truly-overlapping pairs while proposing a
    small fraction of the O(N^2) total."""
    rng = np.random.default_rng(2)
    n_img, n_regions = 24, 28
    region_desc = {r: np.abs(rng.normal(
        size=(40, 128))).astype(np.float32) + 0.05
        for r in range(n_regions)}
    descs = {}
    for i in range(n_img):
        parts = [region_desc[r] + 0.05 * rng.normal(
            size=region_desc[r].shape).astype(np.float32)
            for r in range(i, i + 4)]
        d = np.concatenate(parts)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        descs[i] = d.astype(np.float32)

    sigs = build_signatures(descs, k=32)
    pairs = pair_shortlist(sigs, top_m=6)

    true_pairs = set((i, j) for i in range(n_img)
                     for j in range(i + 1, n_img) if j - i < 4)
    got = set(pairs)
    recall = len(got & true_pairs) / len(true_pairs)
    assert recall >= 0.9, recall
    assert len(pairs) <= 6 * n_img      # bounded proposal budget
    assert len(pairs) < n_img * (n_img - 1) // 2 * 0.6
