"""Fused collect+refine kernel parity (interpret mode).

The fused kernel (ops/pallas/refine.py) runs the 5-iteration sub-pixel
refinement (/root/reference/src/popsift/s_extrema.cu:359-460) inside
the window-DMA kernel and emits 13 scalars per candidate; the XLA path
(collect_candidates + refine_candidates) is the bit-exact reference.
Every neighborhood selection is one-hot (single non-zero term per
reduction) and the algebra mirrors the XLA ops one for one; the two
compiled programs may still differ by ~1 ULP where XLA makes different
FMA/fusion choices, so validity masks and counts compare EXACTLY and
float fields compare at 1e-5 (measured max deviation: 1 ULP on one of
256 candidates).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from popsift_tpu.config import SiftConfig
from popsift_tpu.ops.extrema import (collect_candidates, collect_refined,
                                     collect_refined_batched,
                                     finalize_refined, refine_candidates)
from popsift_tpu.ops.pyramid import assemble_dog_canvas


def _random_dog(H, W, D=5, seed=0, scale=60.0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(D, H, W)).astype(np.float32)
    k = np.array([0.25, 0.5, 0.25], np.float32)
    for ax in (1, 2):
        base = (np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), ax, base))
    return jnp.asarray(base * scale)


def _canvas(dog, H, W):
    return assemble_dog_canvas([dog[d] for d in range(dog.shape[0])],
                               H, W)


def _assert_extrema_equal(got, ref):
    assert np.array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    assert int(got.count) == int(ref.count)
    for f in ("x", "y", "s", "sigma"):
        a, b = np.asarray(getattr(got, f)), np.asarray(getattr(ref, f))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=2e-5,
                                   err_msg=f)
    for f in ("level", "cell"):
        a, b = np.asarray(getattr(got, f)), np.asarray(getattr(ref, f))
        # integer fields can flip only where the float is within 1 ULP
        # of a rounding boundary — allow at most a couple of rows
        assert int(np.sum(a != b)) <= 2, f


@pytest.mark.parametrize("mode", ["popsift", "vlfeat"])
def test_fused_refine_parity(mode):
    H, W = 67, 93
    sift_mode = "opencv" if mode == "popsift" else "vlfeat"
    cfg = SiftConfig(sift_mode=sift_mode)
    cap = 256
    dog = _random_dog(H, W, seed=3)
    canvas = _canvas(dog, H, W)

    plain = collect_candidates(None, cfg, cap, canvas=canvas,
                               dims=(H, W), interpret=True)
    ref = refine_candidates(plain, cfg, W, H)

    rset = collect_refined(cfg, cap, canvas, (H, W), interpret=True)
    assert int(rset.n_found) == int(plain.n_found)
    got = finalize_refined(rset.vals, rset.valid, cfg, W, H,
                           rset.n_found, rset.n_dropped)
    assert int(got.count) > 0          # non-degenerate scene
    _assert_extrema_equal(got, ref)


def test_fused_refine_parity_batched():
    H, W = 64, 96
    cfg = SiftConfig()
    cap = 256
    F = 2
    dogs = [_random_dog(H, W, seed=s) for s in (1, 4)]
    canv = jnp.concatenate([_canvas(d, H, W) for d in dogs], axis=0)

    rset = collect_refined_batched(canv, F, cfg, cap, (H, W),
                                   interpret=True)
    vals = rset.vals.reshape(F, cap, -1)
    for f in range(F):
        plain = collect_candidates(None, cfg, cap,
                                   canvas=_canvas(dogs[f], H, W),
                                   dims=(H, W), interpret=True)
        ref = refine_candidates(plain, cfg, W, H)
        got = finalize_refined(vals[f], rset.valid[f], cfg, W, H,
                               rset.n_found[f], rset.n_dropped[f])
        assert int(rset.n_found[f]) == int(plain.n_found)
        assert int(got.count) > 0
        _assert_extrema_equal(got, ref)
