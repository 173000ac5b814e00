"""Pallas TPU kernel: orientation histograms.

Reference: one CUDA block per extremum accumulating a 36-bin gradient
histogram in shared memory (s_orientation.cu:60-140). The XLA
formulation extracts [K, 49, 49] patches to HBM and reads them back
through per-bin masked reductions (~9 ms/frame). This kernel DMAs each
keypoint's window straight from the blur stack (same aligned-window +
dynamic-roll scheme as the descriptor kernel) and accumulates the
histogram in VMEM. Peak smoothing/refinement stays in XLA — it is a
[K, 36] problem.

Returns raw (unsmoothed) histograms; semantics match the histogram
section of ops.orientation.assign_orientations exactly.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import ORI_NBINS, ORI_WINFACTOR
from .desc import _atan2

_G = 8
_WR = 64    # DMA window rows (56-row patch + 8-row alignment slack)
_WC = 256   # DMA window cols (128-col patch + 128-lane slack)
_P = 56     # patch rows
_PL = 128   # patch cols


def _ori_kernel(nv_ref, lv_ref, ya_ref, ca_ref, pk_ref, par_ref,
                blur_hbm, out_ref, scratch, sems, *, P=_P,
                WR=_WR):
    """par_ref f32[G, 16]: (x, y, sigma, valid, y0, x0, xr, yr,
    ylo, yhi, xhi, 0...). Bounds are PER JOB so one launch can serve
    many octave segments stacked in a canvas atlas (each row's
    in-image test is ylo <= yy <= yhi, 1 <= xx <= xhi in canvas
    coords). nv_ref: i32[1] count of front-packed candidate rows —
    blocks fully past it skip DMA and math."""
    G = _G
    PL = _PL
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nv = nv_ref[0]

    def active(step):
        return step * G < nv

    def dma(step, to_slot, g):
        j = step * G + g
        y0a = pl.multiple_of(ya_ref[j], 8)
        c0a = pl.multiple_of(ca_ref[j], 128)
        return pltpu.make_async_copy(
            blur_hbm.at[lv_ref[j], pl.ds(y0a, WR), pl.ds(c0a, _WC)],
            scratch.at[to_slot, g],
            sems.at[to_slot, g])

    @pl.when((i == 0) & active(0))
    def _():
        for g in range(G):
            dma(0, 0, g).start()

    @pl.when((i + 1 < n) & active(i + 1))
    def _():
        for g in range(G):
            dma(i + 1, jax.lax.rem(i + 1, 2), g).start()

    @pl.when(jnp.logical_not(active(i)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(active(i))
    def _():
        _ori_math(i, slot, dma, pk_ref, par_ref, out_ref, scratch,
                  P=P, PL=PL, WR=WR)


def _ori_math(i, slot, dma, pk_ref, par_ref, out_ref, scratch,
              *, P, PL, WR=_WR):
    G = _G
    patches = []
    for g in range(G):
        dma(i, slot, g).wait()
        pk = pk_ref[i * G + g]
        ry = jax.lax.div(pk, 256)
        rx = jax.lax.rem(pk, 256)
        w = pltpu.roll(pltpu.roll(scratch[slot, g], WR - ry, 0),
                       _WC - rx, 1)
        patches.append(w[:P, :PL])
    patch = jnp.stack(patches)                  # [G, P, PL]
    par = par_ref[:]

    ii = jax.lax.broadcasted_iota(jnp.int32, (P, PL), 0).astype(
        jnp.float32)[None]
    jj = jax.lax.broadcasted_iota(jnp.int32, (P, PL), 1).astype(
        jnp.float32)[None]
    x0 = par[:, 5][:, None, None]
    y0 = par[:, 4][:, None, None]
    xx = x0 + jj
    yy = y0 + ii

    zero_col = jnp.zeros((G, P, 1), jnp.float32)
    dxv = (jnp.concatenate([patch[:, :, 1:], zero_col], axis=2)
           - jnp.concatenate([zero_col, patch[:, :, :-1]], axis=2))
    zero_row = jnp.zeros((G, 1, PL), jnp.float32)
    dyv = (jnp.concatenate([patch[:, 1:, :], zero_row], axis=1)
           - jnp.concatenate([zero_row, patch[:, :-1, :]], axis=1))
    grad = jnp.sqrt(dxv * dxv + dyv * dyv)
    theta = _atan2(dyv, dxv)

    sig = par[:, 2][:, None, None]
    sigw = np.float32(ORI_WINFACTOR) * sig
    rad = jnp.round(3.0 * sigw)
    factor = np.float32(-0.5) / (sigw * sigw + np.float32(1e-30))
    sq_thres = rad * rad
    xr = par[:, 6][:, None, None]
    yr = par[:, 7][:, None, None]

    ylo = par[:, 8][:, None, None]
    yhi = par[:, 9][:, None, None]
    xhi = par[:, 10][:, None, None]
    inb = ((jnp.abs(xx - xr) <= rad) & (jnp.abs(yy - yr) <= rad)
           & (xx >= 1.0) & (xx <= xhi)
           & (yy >= ylo) & (yy <= yhi))
    fdx = xx - par[:, 0][:, None, None]
    fdy = yy - par[:, 1][:, None, None]
    sq = jnp.floor(fdx * fdx + fdy * fdy)
    inb = inb & (sq <= sq_thres)
    inb = inb & (par[:, 3][:, None, None] > 0.5)

    weight = jnp.where(inb, grad * jnp.exp(sq * factor), 0.0)

    bidx = jnp.round(
        np.float32(ORI_NBINS) * (theta + np.float32(math.pi))
        / np.float32(2.0 * math.pi)).astype(jnp.int32)
    bidx = jnp.where(bidx == ORI_NBINS, 0, bidx)

    # 36 masked reductions per job block
    for g in range(_G):
        h = [jnp.sum(jnp.where(bidx[g] == b, weight[g], 0.0))
             for b in range(ORI_NBINS)]
        out_ref[g, :] = jnp.stack(h)


@functools.partial(jax.jit, static_argnames=("P", "WR", "interpret"))
def _ori_call(nv, lv, ya, ca, pk, params, blur, P=_P, WR=_WR,
              interpret=False):
    F = params.shape[0]
    grid = (F // _G,)
    kernel = functools.partial(_ori_kernel, P=P, WR=WR)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_G, 16), lambda i, *s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_G, ORI_NBINS), lambda i, *s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _G, WR, _WC), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _G)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, ORI_NBINS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nv, lv, ya, ca, pk, params, blur)


def orientation_hist_pallas(blur, ext, radius: int, H, W,
                            seg=None, interpret: bool = False):
    """Raw 36-bin orientation histograms for the padded extrema buffer.

    blur: f32[L, Hb, Wb] edge-padded so aligned 64x256 windows fit
    (caller pads, see ops.orientation). radius: max window radius
    (must be <= 26 so the 56-row/128-col patch covers radius+1).

    ``seg=(yoff, hcan, wcan, him, wim)`` (per-row i32/f32 arrays) runs
    the octave-atlas form: ``blur`` is the stacked atlas and each row's
    octave segment starts at atlas row ``yoff`` (a multiple of 8) with
    canvas dims (hcan, wcan) and image dims (him, wim). The window
    origin clip, the patch-coordinate math and the in-image bounds all
    stay in OCTAVE-LOCAL coordinates (bit-identical to the per-octave
    launch — atlas-absolute math would shift f32 rounding); only the
    DMA row address adds ``yoff``."""
    L, Hb, Wb = blur.shape
    K = ext.x.shape[0]
    pad = (-K) % _G
    # patch rows sized to the radius: per-keypoint VPU cost scales with
    # P, so bucketed callers pass a tighter radius for small-sigma rows
    P = min(-(-(2 * radius + 3) // 8) * 8, _P)
    WR = P + 8

    xr = jnp.round(ext.x).astype(jnp.int32)
    yr = jnp.round(ext.y).astype(jnp.int32)
    ones = jnp.ones_like(ext.x)
    if seg is None:
        hc, wc = Hb, Wb
        ylo, yhi, xhi = ones, ones * (H - 2.0), ones * (W - 2.0)
        yoff = 0
    else:
        yoff, hc, wc, him, wim = seg
        ylo = ones
        yhi = him.astype(jnp.float32) - 2.0
        xhi = wim.astype(jnp.float32) - 2.0
    y0 = jnp.clip(yr - (radius + 1), 0, hc - WR)
    x0 = jnp.clip(xr - (radius + 1), 0, wc - _WC)
    y0a = (y0 // 8) * 8 + yoff          # yoff is 8-aligned: pk unchanged
    c0a = (x0 // 128) * 128
    lv = jnp.clip(ext.level, 0, L - 1).astype(jnp.int32)
    pk = ((y0 - (y0 // 8) * 8) * 256 + (x0 - c0a)).astype(jnp.int32)
    zeros = jnp.zeros_like(ext.x)
    params = jnp.stack([
        ext.x, ext.y, ext.sigma,
        ext.valid.astype(jnp.float32),
        y0.astype(jnp.float32), x0.astype(jnp.float32),
        xr.astype(jnp.float32), yr.astype(jnp.float32),
        ylo, yhi, xhi,
        zeros, zeros, zeros, zeros, zeros], axis=1)
    if pad:
        lv, y0a, c0a, pk = (jnp.pad(a, (0, pad))
                            for a in (lv, y0a, c0a, pk))
        params = jnp.pad(params, ((0, pad), (0, 0)))
    nv = ext.n_candidates.astype(jnp.int32).reshape(1)
    out = _ori_call(nv, lv, y0a.astype(jnp.int32),
                    c0a.astype(jnp.int32), pk, params, blur,
                    P=P, WR=WR, interpret=interpret)
    return out[:K]


def ori_pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def orientation_hist_pallas_bucketed(blur, ext, radius, sigma_split,
                                     radius_small, H, W, seg=None,
                                     interpret: bool = False):
    """Radius-bucketed orientation histograms: rows with
    sigma <= sigma_split (the bulk — low pyramid levels) run through a
    small-window kernel instance, the rest through the full-radius one.
    Per-keypoint VPU cost scales with the static patch rows, and the
    kernels skip grid blocks past their bucket count, so compute
    follows the actual bucket sizes. Same split/gather-back scheme as
    descriptor_loop_pallas_bucketed."""
    K = ext.x.shape[0]
    small = ext.valid & (ext.sigma <= sigma_split)
    large = ext.valid & ~small

    def bucket(mask):
        from ..extrema import first_set_indices
        n = jnp.sum(mask, dtype=jnp.int32)
        idx = first_set_indices(mask, K)
        sel = lambda a: a[idx]
        bsel = (None if seg is None
                else tuple(sel(b) for b in seg))
        return ext._replace(
            x=sel(ext.x), y=sel(ext.y), s=sel(ext.s),
            level=sel(ext.level), sigma=sel(ext.sigma),
            cell=sel(ext.cell),
            valid=jnp.arange(K, dtype=jnp.int32) < n,
            n_candidates=n), bsel

    ext_s, b_s = bucket(small)
    ext_l, b_l = bucket(large)
    h_s = orientation_hist_pallas(blur, ext_s, radius_small,
                                  H, W, seg=b_s, interpret=interpret)
    h_l = orientation_hist_pallas(blur, ext_l, radius,
                                  H, W, seg=b_l, interpret=interpret)
    rs = jnp.cumsum(small.astype(jnp.int32)) - 1
    rl = jnp.cumsum(large.astype(jnp.int32)) - 1
    src = jnp.where(small, rs, K + rl)
    out = jnp.concatenate([h_s, h_l], axis=0)[src]
    return jnp.where(ext.valid[:, None], out, 0.0)
