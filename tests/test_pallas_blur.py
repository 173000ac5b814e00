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


def test_interleave2x2(rng):
    from popsift_tpu.ops.pyramid import _interleave2x2
    H, W = 64, 128
    planes = [jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
              for _ in range(4)]
    out = np.asarray(_interleave2x2(((planes[0], planes[1]),
                                     (planes[2], planes[3]))))
    p00, p01, p10, p11 = [np.asarray(p) for p in planes]
    np.testing.assert_array_equal(out[0::2, 0::2], p00)
    np.testing.assert_array_equal(out[0::2, 1::2], p01)
    np.testing.assert_array_equal(out[1::2, 0::2], p10)
    np.testing.assert_array_equal(out[1::2, 1::2], p11)


def test_polyphase_lvl0_matches_gather_path(rng):
    """The polyphase 2x-upscale path must reproduce the generic
    resample+conv path to f32 tolerance."""
    from popsift_tpu.config import SiftConfig
    from popsift_tpu.ops.pyramid import build_pyramid_plan, _octave0_level0
    import dataclasses
    cfg = SiftConfig()
    h, w = 37, 53
    plan = build_pyramid_plan(cfg, h, w)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    fast = np.asarray(_octave0_level0(jnp.asarray(img), plan))
    # force the generic path by lying about the shift (still 1.0 value,
    # so compare against a plan whose dims break the structural test)
    slow_plan = dataclasses.replace(plan, shift0=plan.shift0 + 0.0)
    object.__setattr__  # noqa: B018
    # build the generic result by calling the internals directly
    from popsift_tpu.ops.pyramid import _lerp_rows, _conv1d_valid
    oh, ow = plan.dims[0]
    kx = plan.lvl0_kernel_x
    pad = (kx.shape[0] - 1) // 2
    x = jnp.asarray(img).astype(jnp.float32) / 255.0
    ys = (np.arange(oh, dtype=np.float64) + plan.shift0) * (h / oh) - 0.5
    xs = (np.arange(-pad, ow + pad, dtype=np.float64)
          + plan.shift0) * (w / ow) - 0.5
    r = _lerp_rows(x, ys)
    r = _lerp_rows(r.T, xs).T
    out = _conv1d_valid(r, kx, axis=1) * 255.0
    ky = plan.lvl0_kernel_y
    pady = (ky.shape[0] - 1) // 2
    out = jnp.pad(out, ((pady, pady), (0, 0)), mode="edge")
    slow = np.asarray(_conv1d_valid(out, ky, axis=0))
    np.testing.assert_allclose(fast, slow, atol=2e-3)


@pytest.mark.parametrize("group", [None, 3, 2])
def test_octave_chain_matches_sep_blur_chain(rng, group):
    """Fused octave chain kernel (interpret mode) vs the XLA
    incremental _sep_blur chain, including edge replication — both
    fully fused and split into compile-bounded groups (the production
    setting, build_pyramid use_pallas='chain' uses group=3)."""
    from popsift_tpu.config import SiftConfig
    from popsift_tpu.gauss import build_gauss_tables, full_kernel
    from popsift_tpu.ops.pallas.blur import octave_blur_chain
    from popsift_tpu.ops.pyramid import _sep_blur

    cfg = SiftConfig()
    tables = build_gauss_tables(cfg)
    kernels = [full_kernel(tables.inc[l], int(tables.inc_span[l]))
               for l in range(1, cfg.total_levels)]
    H, W = 75, 131
    lvl0 = rng.normal(96, 40, size=(H, W)).astype(np.float32)

    blurs, dogs = octave_blur_chain(jnp.asarray(lvl0), kernels,
                                    interpret=True, group=group)
    prev = jnp.asarray(lvl0)
    for l, k in enumerate(kernels):
        want = _sep_blur(prev, k)
        np.testing.assert_allclose(np.asarray(blurs[l]),
                                   np.asarray(want), atol=1e-3,
                                   err_msg=f"level {l + 1}")
        np.testing.assert_allclose(np.asarray(dogs[l]),
                                   np.asarray(want - prev), atol=1e-3,
                                   err_msg=f"dog {l}")
        prev = want
