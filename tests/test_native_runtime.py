"""Tests for the native C++ host runtime (native/popsift_host.cpp via
popsift_tpu.runtime.native): PNM codec parity with the pure-Python
reference implementation and the threaded decode pipeline."""

import io
import os

import numpy as np
import pytest

from popsift_tpu.io import image as pyio
from popsift_tpu.runtime import available

pytestmark = pytest.mark.skipif(not available(),
                                reason="no C++ toolchain for native runtime")


def _native():
    from popsift_tpu.runtime import native
    return native


def _p5_bytes(img):
    h, w = img.shape
    return b"P5\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes()


def _p6_bytes(rgb, maxval=255):
    h, w, _ = rgb.shape
    hdr = b"P6\n%d %d\n%d\n" % (w, h, maxval)
    if maxval < 256:
        return hdr + rgb.astype(np.uint8).tobytes()
    return hdr + rgb.astype(">u2").tobytes()


def _p2_bytes(img, maxval=255):
    h, w = img.shape
    body = "\n".join(" ".join(str(v) for v in row) for row in img.tolist())
    return (f"P2\n{w} {h}\n{maxval}\n{body}\n").encode()


def test_version():
    assert "runtime" in _native().version()


def test_p5_roundtrip(rng):
    img = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    out = _native().decode_pnm(_p5_bytes(img))
    np.testing.assert_array_equal(out, img)


def test_p6_rgb_matches_python(rng):
    rgb = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
    want = pyio.rgb_to_gray(rgb)
    got = _native().decode_pnm(_p6_bytes(rgb))
    np.testing.assert_array_equal(got, want)


def test_p2_ascii_maxval_rescale(rng):
    img = rng.integers(0, 100, size=(9, 11), dtype=np.uint8)
    got = _native().decode_pnm(_p2_bytes(img, maxval=99))
    # rounded rescale v*255/99
    want = ((img.astype(np.uint32) * 255 + 49) // 99).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_p6_16bit(rng):
    rgb = rng.integers(0, 65536, size=(7, 5, 3), dtype=np.uint32)
    got = _native().decode_pnm(_p6_bytes(rgb, maxval=65535))
    scaled = ((rgb * 255 + 65535 // 2) // 65535).astype(np.uint8)
    want = pyio.rgb_to_gray(scaled)
    np.testing.assert_array_equal(got, want)


def test_decode_errors():
    n = _native()
    with pytest.raises(ValueError):
        n.decode_pnm(b"JUNK")
    with pytest.raises(ValueError):
        n.decode_pnm(b"P5\n10 10\n255\nshort")


def test_pgm_write_read(tmp_path, rng):
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    p = str(tmp_path / "out.pgm")
    _native().write_pgm(p, img)
    np.testing.assert_array_equal(pyio.read_pgm(p), img)
    np.testing.assert_array_equal(_native().read_pnm(p), img)


def test_pipeline_files(tmp_path, rng):
    n = _native()
    imgs = [rng.integers(0, 256, size=(20 + i, 30 + i), dtype=np.uint8)
            for i in range(6)]
    paths = []
    for i, img in enumerate(imgs):
        p = str(tmp_path / f"im{i}.pgm")
        n.write_pgm(p, img)
        paths.append(p)

    with n.HostPipeline(threads=3, queue_capacity=2) as pl:
        jobs = [pl.submit(p) for p in paths]
        for img, job in zip(imgs, jobs):
            np.testing.assert_array_equal(job.get(), img)
        assert pl.jobs_done == len(imgs)


def test_pipeline_bytes_and_errors(tmp_path, rng):
    n = _native()
    img = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    with n.HostPipeline(threads=1) as pl:
        ok = pl.submit_bytes(_p5_bytes(img))
        bad = pl.submit(str(tmp_path / "missing.pgm"))
        np.testing.assert_array_equal(ok.get(), img)
        with pytest.raises(IOError):
            bad.get()


def test_load_image_uses_native(tmp_path, rng):
    img = rng.integers(0, 256, size=(12, 14), dtype=np.uint8)
    p = str(tmp_path / "x.pgm")
    pyio.write_pgm(p, img)
    np.testing.assert_array_equal(pyio.load_image(p), img)


def test_native_feature_writer(tmp_path):
    """Native streaming writer vs the Python per-feature formatter."""
    pytest.importorskip("popsift_tpu.runtime.native")
    import io
    from popsift_tpu.api import PopSift
    from popsift_tpu.config import SiftConfig
    from conftest import synthetic_image

    img = synthetic_image(64, 80, seed=3)
    host = PopSift(SiftConfig(octaves=2, extrema_capacity=128)) \
        .enqueue(img).get()
    out = str(tmp_path / "f.txt")
    host.save(out)
    buf = io.StringIO()
    host.print(buf)
    nat = open(out).read().strip().splitlines()
    py = buf.getvalue().strip().splitlines()
    assert len(nat) == len(py) == host.getDescriptorCount()
    for a, b in zip(nat, py):
        fa = [float(t) for t in a.split()]
        fb = [float(t) for t in b.split()]
        assert len(fa) == len(fb) == 133
        # native uses %g (6 sig digits, like the reference ostream);
        # python uses repr — compare within formatting tolerance
        for va, vb in zip(fa, fb):
            assert abs(va - vb) <= 1e-3 * max(1.0, abs(vb))
