"""Grid-based extrema budget filter.

TPU-first redesign of the reference's Thrust filtering pipeline
(/root/reference/src/popsift/s_filtergrid.cu:109-322): when the number of
initial extrema exceeds ``filter_max_extrema`` by more than 10%
(s_orientation.cu:362-367), the image is split into
``filter_grid_size^2`` cells and each cell keeps only its best extrema,
ordered by scale (largest/smallest first) or pseudo-randomly
(GridFilterMode, sift_conf.h:77-81).

The Thrust sort / reduce_by_key / scan / copy_if chain becomes a single
composite-key ``argsort`` plus a segmented rank (cummax of segment
starts) over the fixed-capacity extrema buffer — no host round-trip (the
reference computes the per-cell limit on the host,
s_filtergrid.cu:245-260; we use the uniform budget/cells limit, which is
what that host loop converges to for evenly loaded cells).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SiftConfig
from .extrema import OctaveExtrema


def grid_filter_mask(cell: jnp.ndarray, sigma: jnp.ndarray,
                     valid: jnp.ndarray, cfg: SiftConfig) -> jnp.ndarray:
    """Return an updated validity mask keeping at most
    ``filter_max_extrema / grid_size^2`` extrema per grid cell.

    Operates on the *global* (all octaves concatenated) arrays; ``sigma``
    must be in input-image units so cross-octave ordering is meaningful.
    """
    n = cell.shape[0]
    n_cells = cfg.filter_grid_size * cfg.filter_grid_size
    limit = max(1, cfg.filter_max_extrema // n_cells)

    if cfg.grid_filter_mode == "largest":
        sec = -sigma            # biggest scale first (LargestScaleFirst)
    elif cfg.grid_filter_mode == "smallest":
        sec = sigma
    else:  # "random": deterministic pseudo-random order
        h = (jnp.arange(n, dtype=jnp.uint32) * np.uint32(2654435761)) \
            ^ np.uint32(0x9E3779B9)
        sec = h.astype(jnp.float32)

    # normalize secondary key into [0, 1) then build composite sort key;
    # invalid entries sort last
    smin = jnp.min(jnp.where(valid, sec, jnp.inf))
    smax = jnp.max(jnp.where(valid, sec, -jnp.inf))
    rng = jnp.maximum(smax - smin, 1e-20)
    frac = jnp.clip((sec - smin) / rng, 0.0, 1.0) * 0.999
    key = jnp.where(valid, cell.astype(jnp.float32) + frac,
                    np.float32(n_cells + 2))
    order = jnp.argsort(key)

    sc = cell[order]
    sv = valid[order]
    first = jnp.concatenate([jnp.ones(1, bool), sc[1:] != sc[:-1]])
    idx = jnp.arange(n, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(first, idx, -1))
    rank = idx - seg_start
    keep_sorted = sv & (rank < limit)

    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def maybe_grid_filter(cell, sigma, valid, cfg: SiftConfig):
    """Apply the filter only when >10% over budget
    (s_orientation.cu:362-367). Trace-safe: both branches computed,
    selected by the predicate."""
    total = jnp.sum(valid, dtype=jnp.int32)
    over = total.astype(jnp.float32) > 1.1 * cfg.filter_max_extrema
    filtered = grid_filter_mask(cell, sigma, valid, cfg)
    return jnp.where(over, filtered, valid)


def apply_grid_filter(ext: OctaveExtrema, cfg: SiftConfig) -> OctaveExtrema:
    """Per-octave convenience wrapper (single-octave budget)."""
    new_valid = maybe_grid_filter(ext.cell, ext.sigma, ext.valid, cfg)
    return ext._replace(valid=new_valid,
                        count=jnp.sum(new_valid, dtype=jnp.int32))
