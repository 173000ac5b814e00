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
