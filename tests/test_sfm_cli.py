"""popsift-sfm CLI: plumbing smoke test (extract -> match -> tracks ->
reconstruction attempt) on a synthetic warped pair."""

import subprocess
import sys

import numpy as np
import pytest

from popsift_tpu.eval.repeatability import warp_image
from popsift_tpu.io.image import write_pgm


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["incremental", "global"])
def test_sfm_cli_smoke(tmp_path, mode):
    rng = np.random.default_rng(11)
    h, w = 120, 160
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 90 + 40 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
    for _ in range(14):
        cx, cy = rng.uniform(0.15, 0.85) * w, rng.uniform(0.15, 0.85) * h
        s = rng.uniform(2, 10)
        img += rng.uniform(60, 140) * rng.choice([-1, 1]) * np.exp(
            -((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
    base = np.clip(img, 0, 255).astype(np.uint8)

    a = np.deg2rad(4.0)
    c = np.array([w / 2, h / 2])
    R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    t = c - R @ c + [3.0, -2.0]
    H = np.array([[R[0, 0], R[0, 1], t[0]],
                  [R[1, 0], R[1, 1], t[1]], [0, 0, 1.0]])
    warped = warp_image(base, H)

    p1, p2 = str(tmp_path / "a.pgm"), str(tmp_path / "b.pgm")
    write_pgm(p1, base)
    write_pgm(p2, warped)

    extra = (["--global", "--min-covis", "8"]
             if mode == "global" else
             ["--export-colmap", str(tmp_path / "sparse"),
              "--export-ply", str(tmp_path / "cloud.ply"),
              "--refine"])
    res = subprocess.run(
        [sys.executable, "-m", "popsift_tpu.cli.sfm",
         "-i", p1, p2, "--fx", "200", "-v",
         "--export", str(tmp_path / "rec.npz")] + extra,
        capture_output=True, text=True, timeout=900,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "."})
    # a planar two-view scene may or may not reconstruct; the pipeline
    # itself (extract, match, tracks) must run and report
    assert "tracks:" in res.stdout, res.stdout + res.stderr
    assert res.returncode in (0, 1), res.stderr
