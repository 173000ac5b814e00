"""Image I/O and CLI tests."""

import subprocess
import sys

import numpy as np
import pytest

from popsift_tpu.io.image import read_pgm, rgb_to_gray, write_pgm


def test_pgm_roundtrip(tmp_path, small_image):
    p = str(tmp_path / "x.pgm")
    write_pgm(p, small_image)
    back = read_pgm(p)
    np.testing.assert_array_equal(back, small_image)


def test_pgm_ascii(tmp_path):
    p = tmp_path / "a.pgm"
    p.write_bytes(b"P2\n# comment\n3 2\n255\n0 128 255\n10 20 30\n")
    img = read_pgm(str(p))
    np.testing.assert_array_equal(
        img, np.array([[0, 128, 255], [10, 20, 30]], np.uint8))


def test_pgm_maxval_rescale(tmp_path):
    p = tmp_path / "m.pgm"
    p.write_bytes(b"P2\n2 1\n100\n0 100\n")
    img = read_pgm(str(p))
    np.testing.assert_array_equal(img, np.array([[0, 255]], np.uint8))


def test_ppm_gray_conversion(tmp_path):
    p = tmp_path / "c.ppm"
    p.write_bytes(b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0]))
    img = read_pgm(str(p))
    # integer OpenCV coefficients (pgmread.cpp:17-33)
    assert img[0, 0] == (255 * 4899 + 8192) >> 14
    assert img[0, 1] == (255 * 9617 + 8192) >> 14


def test_rgb_to_gray_white():
    white = np.full((1, 1, 3), 255, np.uint8)
    assert rgb_to_gray(white)[0, 0] == 255


@pytest.mark.slow
def test_demo_cli(tmp_path, small_image):
    img_path = str(tmp_path / "in.pgm")
    out_path = str(tmp_path / "feat.txt")
    write_pgm(img_path, small_image)
    r = subprocess.run(
        [sys.executable, "-m", "popsift_tpu.cli.demo",
         "-i", img_path, "-o", out_path, "--octaves", "2",
         "--print-time-info"],
        capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": ".", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"})
    assert r.returncode == 0, r.stderr
    assert "Number of features:" in r.stdout
    lines = open(out_path).read().strip().splitlines()
    assert lines and len(lines[0].split()) == 133


def test_compare_features_tool(tmp_path, small_image):
    """The parity-comparison tool round-trips our own output at 100%."""
    import json
    import subprocess
    import sys

    from popsift_tpu.api import PopSift
    from popsift_tpu.config import SiftConfig

    host = PopSift(SiftConfig(octaves=2, extrema_capacity=128)) \
        .enqueue(small_image).get()
    f1 = str(tmp_path / "a.txt")
    host.save(f1)

    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "oxford"))
    from compare_features import compare, load_feature_file
    xy, sigma, desc = load_feature_file(f1)
    assert desc.shape == (host.getDescriptorCount(), 128)
    r = compare(f1, f1, eps=0.5)
    assert r["parity_pct"] == 100.0
    assert r["mean_rel_desc_dist"] == 0.0


def test_match_cli_geometric_verification(tmp_path, medium_image, capsys):
    """popsift-match end-to-end: ratio-test matching of an image
    against its shifted copy + two-view RANSAC verification (--geom
    homography; a pure translation IS a homography, so nearly every
    ratio-test match must verify as an inlier)."""
    import numpy as np
    from popsift_tpu.cli.match import main as match_main

    left = str(tmp_path / "l.pgm")
    right = str(tmp_path / "r.pgm")
    shifted = np.roll(medium_image, (3, 5), axis=(0, 1))
    write_pgm(left, medium_image)
    write_pgm(right, shifted)

    rc = match_main(["-l", left, "-r", right, "--octaves", "3",
                     "--geom", "homography", "--max-print", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "accepted matches:" in out
    line = [l for l in out.splitlines()
            if l.startswith("geometric verification")][0]
    frac = line.split(": ")[1].split(" ")[0]
    inl, tot = map(int, frac.split("/"))
    assert tot >= 8 and inl / tot >= 0.7, line
    assert " inlier" in out


def test_load_image_png_jpeg(tmp_path, small_image):
    """Non-PNM formats load through the optional decoder chain
    (PIL/OpenCV — the reference's analogous optional path is DevIL)."""
    import pytest
    cv2 = pytest.importorskip("cv2")
    from popsift_tpu.io.image import load_image

    png = str(tmp_path / "t.png")
    cv2.imwrite(png, small_image)
    got = load_image(png)
    np.testing.assert_array_equal(got, small_image)   # PNG is lossless

    jpg = str(tmp_path / "t.jpg")
    cv2.imwrite(jpg, small_image)
    got = load_image(jpg)
    assert got.shape == small_image.shape and got.dtype == np.uint8
    assert abs(got.astype(int) - small_image.astype(int)).mean() < 3.0
