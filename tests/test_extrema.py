"""JAX extrema detection vs NumPy oracle golden tests."""

import jax
import numpy as np
import pytest

from popsift_tpu.config import SiftConfig
from popsift_tpu.ops.pyramid import build_pyramid, build_pyramid_plan
from popsift_tpu.ops.extrema import detect_extrema
from popsift_tpu.oracle import oracle_pyramid, oracle_extrema


def _extract_sets(img, cfg):
    """Run both implementations on the *same oracle DoG* so the comparison
    isolates the extrema stage from pyramid float noise."""
    _, dogs_o = oracle_pyramid(img, cfg)
    results = []
    for octv, dog in enumerate(dogs_o):
        H, W = dog.shape[1:]
        cap = cfg.capacity_for_octave(H, W)
        fn = jax.jit(lambda d: detect_extrema(d, cfg, cap, W, H))
        got = fn(dog)
        jax_set = []
        for i in range(cap):
            if bool(got.valid[i]):
                jax_set.append((float(got.x[i]), float(got.y[i]),
                                float(got.s[i]), int(got.level[i]),
                                float(got.sigma[i]), int(got.cell[i])))
        oracle_set = [(e.x, e.y, e.s, e.level, e.sigma, e.cell)
                      for e in oracle_extrema(dog, cfg, octv)]
        results.append((jax_set, oracle_set))
    return results


def _match_sets(jax_set, oracle_set, tol=1e-3):
    assert len(jax_set) == len(oracle_set), \
        f"count mismatch: jax {len(jax_set)} oracle {len(oracle_set)}"
    used = [False] * len(oracle_set)
    for j in jax_set:
        best, bi = None, -1
        for i, o in enumerate(oracle_set):
            if used[i]:
                continue
            d = abs(j[0] - o[0]) + abs(j[1] - o[1]) + abs(j[2] - o[2])
            if best is None or d < best:
                best, bi = d, i
        assert best is not None and best < tol, f"unmatched extremum {j}"
        used[bi] = True
        o = oracle_set[bi]
        assert j[3] == o[3], "level mismatch"
        assert abs(j[4] - o[4]) < 1e-3, "sigma mismatch"
        assert j[5] == o[5], "cell mismatch"


def test_extrema_match_oracle(small_image):
    cfg = SiftConfig(octaves=3)
    for jax_set, oracle_set in _extract_sets(small_image, cfg):
        _match_sets(jax_set, oracle_set)


def test_extrema_match_oracle_vlfeat_mode(small_image):
    cfg = SiftConfig(octaves=2, sift_mode="vlfeat")
    for jax_set, oracle_set in _extract_sets(small_image, cfg):
        _match_sets(jax_set, oracle_set)


def test_extrema_nonempty(small_image):
    cfg = SiftConfig(octaves=3)
    sets = _extract_sets(small_image, cfg)
    total = sum(len(j) for j, _ in sets)
    assert total > 5


def test_capacity_clamp(small_image):
    """With a tiny capacity, count is clamped and outputs stay valid."""
    cfg = SiftConfig(octaves=1, extrema_capacity=4)
    _, dogs_o = oracle_pyramid(small_image, cfg)
    H, W = dogs_o[0].shape[1:]
    got = jax.jit(lambda d: detect_extrema(d, cfg, 4, W, H))(dogs_o[0])
    assert int(got.count) <= 4
    assert got.x.shape == (4,)
