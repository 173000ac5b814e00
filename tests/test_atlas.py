"""Octave-atlas parity (interpret mode): the ori/desc window kernels
launched ONCE over vertically-stacked octave canvases (seg form: all
math octave-local, only the DMA row address offset) must reproduce the
per-octave launches BIT FOR BIT. Round-5: per-launch fixed cost
(~60-135 us) dominated the small octaves, so pipeline phase 3a/3b
packs octaves >= 2 into one atlas (pyramid.gauss_atlas_layout)."""

import jax.numpy as jnp
import numpy as np
import pytest

from popsift_tpu.config import SiftConfig
from popsift_tpu.ops.extrema import OctaveExtrema
from popsift_tpu.ops.pyramid import gauss_canvas_dims, gauss_atlas_layout

L = 4
DIMS = ((64, 96), (32, 48), (16, 24))


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(5)
    canvases = []
    for (h, w) in DIMS:
        Hg, Wg = gauss_canvas_dims(h, w)
        img = np.zeros((L, Hg, Wg), np.float32)
        base = rng.normal(size=(L, h, w)).astype(np.float32)
        k = np.array([0.25, 0.5, 0.25], np.float32)
        for ax in (1, 2):
            base = np.apply_along_axis(
                lambda v: np.convolve(v, k, mode="same"), ax, base)
        img[:, :h, :w] = base * 40 + 120
        canvases.append(img)

    arow, Ha, Wa = gauss_atlas_layout(DIMS, 0)
    atlas = np.zeros((L, Ha, Wa), np.float32)
    for o, cv in enumerate(canvases):
        atlas[:, arow[o]:arow[o] + cv.shape[1], :cv.shape[2]] = cv

    K = 24
    exts = []
    for (h, w) in DIMS:
        exts.append(dict(
            x=rng.uniform(2, w - 3, K).astype(np.float32),
            y=rng.uniform(2, h - 3, K).astype(np.float32),
            sigma=rng.uniform(1.2, 3.0, K).astype(np.float32),
            level=rng.integers(1, L - 1, K).astype(np.int32),
            valid=(rng.random(K) < 0.8),
        ))
    return canvases, atlas, arow, exts


def _mk_ext(e, K, yoff=0.0):
    return OctaveExtrema(
        x=jnp.asarray(e["x"]), y=jnp.asarray(e["y"] + yoff),
        s=jnp.zeros(K, jnp.float32),
        level=jnp.asarray(e["level"]),
        sigma=jnp.asarray(e["sigma"]),
        cell=jnp.zeros(K, jnp.int32),
        valid=jnp.asarray(e["valid"]),
        count=jnp.int32(K), n_candidates=jnp.int32(K),
        n_dropped=jnp.int32(0))


def test_ori_atlas_parity(scene):
    from popsift_tpu.ops.pallas.orient import orientation_hist_pallas

    canvases, atlas, arow, exts = scene
    K = len(exts[0]["x"])
    R = 13
    ref = [np.asarray(orientation_hist_pallas(
        jnp.asarray(cv), _mk_ext(e, K), R, DIMS[o][0], DIMS[o][1],
        interpret=True))
        for o, (cv, e) in enumerate(zip(canvases, exts))]

    for o, e in enumerate(exts):
        h, w = DIMS[o]
        hg, wg = gauss_canvas_dims(h, w)
        seg = tuple(jnp.asarray(np.full(K, v, np.int32))
                    for v in (arow[o], hg, wg, h, w))
        got = np.asarray(orientation_hist_pallas(
            jnp.asarray(atlas), _mk_ext(e, K),
            R, atlas.shape[1], atlas.shape[2], seg=seg,
            interpret=True))
        assert np.array_equal(got, ref[o]), o


def test_desc_atlas_parity(scene):
    from popsift_tpu.ops.descriptors import DescriptorJobs
    from popsift_tpu.ops.pallas.desc import descriptor_loop_pallas_dma

    canvases, atlas, arow, exts = scene
    K = len(exts[0]["x"])
    radius = 20

    def jobs_for(e, yoff=0.0):
        return DescriptorJobs(
            x=jnp.asarray(e["x"]), y=jnp.asarray(e["y"] + yoff),
            sigma=jnp.asarray(e["sigma"]),
            level=jnp.asarray(e["level"]),
            ang=jnp.asarray(e["x"] * 0.1),
            kp_index=jnp.arange(K, dtype=jnp.int32),
            valid=jnp.asarray(e["valid"]),
            count=jnp.int32(K))

    ref = [np.asarray(descriptor_loop_pallas_dma(
        jnp.asarray(cv), jobs_for(e), radius, DIMS[o][0], DIMS[o][1],
        interpret=True))
        for o, (cv, e) in enumerate(zip(canvases, exts))]

    for o, e in enumerate(exts):
        h, w = DIMS[o]
        hg, wg = gauss_canvas_dims(h, w)
        seg = tuple(jnp.asarray(np.full(K, v, np.int32))
                    for v in (arow[o], hg, wg, h, w))
        got = np.asarray(descriptor_loop_pallas_dma(
            jnp.asarray(atlas), jobs_for(e),
            radius, atlas.shape[1], atlas.shape[2], seg=seg,
            interpret=True))
        assert np.array_equal(got, ref[o]), o
