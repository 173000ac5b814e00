"""Pallas fused blur+DoG kernel vs the XLA shift-add reference path.

Runs in interpreter mode (CPU backend); the same kernel compiles for TPU
via Mosaic (exercised by bench/driver on hardware).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from popsift_tpu.config import SiftConfig
from popsift_tpu.gauss import build_gauss_tables, full_kernel
from popsift_tpu.ops.pallas.blur import blur_and_dog
from popsift_tpu.ops.pyramid import _sep_blur


@pytest.mark.parametrize("shape", [(64, 80), (130, 200), (128, 128)])
@pytest.mark.parametrize("level", [1, 3, 5])
def test_blur_and_dog_matches_sep_blur(shape, level, rng):
    cfg = SiftConfig()
    tables = build_gauss_tables(cfg)
    k = full_kernel(tables.inc[level], int(tables.inc_span[level]))

    img = jnp.asarray(
        rng.normal(0, 64, size=shape).astype(np.float32) + 128.0)
    want_blur = _sep_blur(img, k)
    got_blur, got_dog = blur_and_dog(img, k, interpret=True)

    np.testing.assert_allclose(np.asarray(got_blur), np.asarray(want_blur),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_dog),
                               np.asarray(want_blur - img),
                               rtol=0, atol=2e-4)


def test_blur_edge_replication(rng):
    """Border columns/rows must follow clamped-read semantics exactly."""
    cfg = SiftConfig()
    tables = build_gauss_tables(cfg)
    k = full_kernel(tables.inc[2], int(tables.inc_span[2]))
    img = jnp.asarray(rng.normal(0, 1, size=(40, 48)).astype(np.float32))
    a = np.asarray(blur_and_dog(img, k, interpret=True)[0])
    b = np.asarray(_sep_blur(img, k))
    # check the borders specifically
    np.testing.assert_allclose(a[0], b[0], atol=2e-5)
    np.testing.assert_allclose(a[-1], b[-1], atol=2e-5)
    np.testing.assert_allclose(a[:, 0], b[:, 0], atol=2e-5)
    np.testing.assert_allclose(a[:, -1], b[:, -1], atol=2e-5)
