"""Spatial (sequence-parallel analog) sharding: very large frames split
across devices by rows, with halo exchange over ICI.

SURVEY.md section 2.7: the reference handles large inputs only by
downsampling (sift_conf.h:179-184); the TPU framework shards the image
axis instead — the moral equivalent of ring attention for stencil ops.
Each device holds a contiguous row band; every separable blur exchanges
a halo of boundary rows with its mesh neighbors via ``lax.ppermute``
before convolving, so results are bit-identical to the single-device
pyramid (interior bands; the global top/bottom keep edge-replication).

This covers the bandwidth-bound pyramid + DoG + candidate-mask front of
the pipeline, which is where a frame too large for one chip's HBM
actually hurts; detected candidates are tiny and are gathered to every
device for the keypoint stages.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SiftConfig
from ..gauss import full_kernel
from ..ops.pyramid import _conv1d_valid


def _exchange_halo(x: jnp.ndarray, halo: int, axis_name: str):
    """Append ``halo`` rows from each row-band neighbor (edge-replicate
    at the global top/bottom). x: [Hs, W] -> [Hs + 2*halo, W]."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    down = [(i, (i + 1) % n) for i in range(n)]   # send my rows downward
    up = [(i, (i - 1) % n) for i in range(n)]

    from_above = jax.lax.ppermute(x[-halo:], axis_name, down)
    from_below = jax.lax.ppermute(x[:halo], axis_name, up)
    # global borders: replicate own edge rows instead of wrapping
    top_edge = jnp.broadcast_to(x[:1], (halo,) + x.shape[1:])
    bot_edge = jnp.broadcast_to(x[-1:], (halo,) + x.shape[1:])
    top = jnp.where(idx == 0, top_edge, from_above)
    bot = jnp.where(idx == n - 1, bot_edge, from_below)
    return jnp.concatenate([top, x, bot], axis=0)


def _sharded_blur(x: jnp.ndarray, kernel: np.ndarray, axis_name: str):
    """Separable blur of a row-sharded image with halo exchange."""
    pad = (kernel.shape[0] - 1) // 2
    xh = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    xh = _conv1d_valid(xh, kernel, axis=1)       # horizontal: no halo
    xh = _exchange_halo(xh, pad, axis_name)      # vertical halo over ICI
    return _conv1d_valid(xh, kernel, axis=0)


def make_sharded_pyramid_fn(cfg: SiftConfig, height: int, width: int,
                            mesh: Mesh, axis_name: str = "sp"):
    """Jitted fn: f32[H, W] (row-sharded) -> (blurs, dogs) of octave 0,
    all row-sharded over the mesh. H must divide by the mesh size.

    Octave 0 only — coarser octaves fit on one device and are built from
    the gathered level L-3 by the regular pipeline. The caller provides
    the already upscaled-and-prefiltered level-0 image (or the raw frame
    when no upscale is used)."""
    from ..gauss import build_gauss_tables

    tables = build_gauss_tables(cfg)
    kernels = tuple(
        full_kernel(tables.inc[l], int(tables.inc_span[l]))
        for l in range(cfg.total_levels))
    n = mesh.shape[axis_name]
    if height % n:
        raise ValueError(f"height {height} not divisible by mesh {n}")
    max_halo = max((k.shape[0] - 1) // 2 for k in kernels[1:])
    if height // n < max_halo:
        raise ValueError(
            f"row band {height // n} smaller than the largest blur halo "
            f"{max_halo}; use fewer shards for this frame size")

    def local(lvl0):
        levels = [lvl0]
        dogs = []
        for lvl in range(1, cfg.total_levels):
            levels.append(_sharded_blur(levels[-1], kernels[lvl],
                                        axis_name))
            dogs.append(levels[-1] - levels[-2])
        return jnp.stack(levels), jnp.stack(dogs)

    spec = P(axis_name, None)
    mapped = shard_map(local, mesh=mesh, in_specs=(spec,),
                       out_specs=(P(None, axis_name, None),
                                  P(None, axis_name, None)))
    return jax.jit(mapped)
