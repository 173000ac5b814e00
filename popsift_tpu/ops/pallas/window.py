"""Pallas TPU kernel: batched window extraction from a layered image.

XLA gathers of small per-candidate blocks (e.g. the refine loop's
[5, 11, 11] neighborhoods) move tiny rows and reach ~1.5 GB/s
(measured ~5 ms for 3072 candidates). This kernel DMAs an aligned
[D, 24, 256] window per candidate (double-buffered), rolls the
sub-window offset away, and writes the result; callers slice the
useful region in XLA. Effective bandwidth is DMA-engine bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G = 8
_WR = 24    # DMA window rows (>= patch rows + 7-row alignment slack)
_WC = 256   # DMA window cols (>= patch cols + 127-lane slack)
_OR = 16    # output rows per candidate (after the roll de-offsets)
_OC = 128   # output cols per candidate


def _win_kernel(nv_ref, ya_ref, ca_ref, pk_ref, vol_hbm, out_ref,
                scratch, sems, *, D):
    G = _G
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
            vol_hbm.at[:, pl.ds(y0a, _WR), pl.ds(c0a, _WC)],
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

    @pl.when(active(i))
    def _():
        for g in range(G):
            dma(i, slot, g).wait()
            pk = pk_ref[i * G + g]
            ry = jax.lax.div(pk, 256)
            rx = jax.lax.rem(pk, 256)
            w = pltpu.roll(pltpu.roll(scratch[slot, g], _WR - ry, 1),
                           _WC - rx, 2)
            # write only the aligned useful region: the [24, 256] DMA
            # window exists for alignment slack, but materializing it
            # per candidate costs 4x the HBM write traffic of the
            # [16, 128] tile the callers actually slice from
            out_ref[g] = w[:, :_OR, :_OC]

    @pl.when(jnp.logical_not(active(i)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _win_call(nv, ya, ca, pk, vol, interpret=False):
    D = vol.shape[0]
    F = ya.shape[0]
    grid = (F // _G,)
    kernel = functools.partial(_win_kernel, D=D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_G, D, _OR, _OC),
                               lambda i, *s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _G, D, _WR, _WC), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _G)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, D, _OR, _OC), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nv, ya, ca, pk, vol)


def extract_windows_pallas(vol: jnp.ndarray, cy: jnp.ndarray,
                           cx: jnp.ndarray, radius: int, rows: int,
                           cols: int, n_valid=None,
                           interpret: bool = False):
    """Extract [K, D, rows, cols] windows of ``vol`` (all layers) with
    the window origin at clip(c - radius, 0, limit), matching
    extract_patches semantics. rows <= 16, cols <= 128.

    Returns (windows, y0, x0). Caller pads ``vol`` so every aligned
    [24, 256] block fits: Hb >= max(cy)+rows-radius+24, Wb multiple of
    128 >= max(cx)+cols-radius+256 (see detect_extrema).
    """
    D, Hb, Wb = vol.shape
    K = cy.shape[0]
    pad = (-K) % _G
    y0 = jnp.clip(cy - radius, 0, Hb - _WR)
    x0 = jnp.clip(cx - radius, 0, Wb - _WC)
    y0a = (y0 // 8) * 8
    c0a = (x0 // 128) * 128
    pk = ((y0 - y0a) * 256 + (x0 - c0a)).astype(jnp.int32)
    if n_valid is None:
        n_valid = jnp.int32(K)
    nv = n_valid.astype(jnp.int32).reshape(1) if hasattr(n_valid, "astype") \
        else jnp.asarray([n_valid], jnp.int32)
    args = [a.astype(jnp.int32) for a in (y0a, c0a, pk)]
    if pad:
        args = [jnp.pad(a, (0, pad)) for a in args]
    out = _win_call(nv, *args, vol, interpret=interpret)
    return out[:K, :, :rows, :cols], y0, x0


def window_pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# frame-batched variant: jobs from F frames against a [F*D, Hb, Wb]
# volume (frames stacked on the layer axis); per-job layer base selects
# the frame, and a per-block activity mask (computed from the per-frame
# front-packed counts) preserves the skip-empty-blocks optimization that
# a single global count cannot express for concatenated segments.
# ---------------------------------------------------------------------------

def _win_kernel_b(ba_ref, zb_ref, ya_ref, ca_ref, pk_ref, vol_hbm,
                  out_ref, scratch, sems, *, D):
    G = _G
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def active(step):
        return ba_ref[step] > 0

    def dma(step, to_slot, g):
        j = step * G + g
        y0a = pl.multiple_of(ya_ref[j], 8)
        c0a = pl.multiple_of(ca_ref[j], 128)
        return pltpu.make_async_copy(
            vol_hbm.at[pl.ds(zb_ref[j], D), pl.ds(y0a, _WR),
                       pl.ds(c0a, _WC)],
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

    @pl.when(active(i))
    def _():
        for g in range(G):
            dma(i, slot, g).wait()
            pk = pk_ref[i * G + g]
            ry = jax.lax.div(pk, 256)
            rx = jax.lax.rem(pk, 256)
            w = pltpu.roll(pltpu.roll(scratch[slot, g], _WR - ry, 1),
                           _WC - rx, 2)
            out_ref[g] = w[:, :_OR, :_OC]

    @pl.when(jnp.logical_not(active(i)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit, static_argnames=("D", "interpret"))
def _win_call_b(ba, zb, ya, ca, pk, vol, D, interpret=False):
    F = ya.shape[0]
    grid = (F // _G,)
    kernel = functools.partial(_win_kernel_b, D=D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_G, D, _OR, _OC),
                               lambda i, *s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _G, D, _WR, _WC), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _G)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, D, _OR, _OC), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ba, zb, ya, ca, pk, vol)


def extract_windows_pallas_batched(vol: jnp.ndarray, zbase: jnp.ndarray,
                                   cy: jnp.ndarray, cx: jnp.ndarray,
                                   radius: int, rows: int, cols: int,
                                   D: int, block_valid=None,
                                   interpret: bool = False):
    """Like :func:`extract_windows_pallas` for jobs spanning F frames.

    vol: f32[F*D, Hb, Wb]; zbase: i32[K] per-job first layer (f*D);
    block_valid: bool/int[K // 8] per-block activity (a block with no
    valid job skips its DMAs). Returns windows f32[K, D, rows, cols].
    """
    _, Hb, Wb = vol.shape
    K = cy.shape[0]
    pad = (-K) % _G
    y0 = jnp.clip(cy - radius, 0, Hb - _WR)
    x0 = jnp.clip(cx - radius, 0, Wb - _WC)
    y0a = (y0 // 8) * 8
    c0a = (x0 // 128) * 128
    pk = ((y0 - y0a) * 256 + (x0 - c0a)).astype(jnp.int32)
    args = [a.astype(jnp.int32) for a in (zbase, y0a, c0a, pk)]
    if pad:
        args = [jnp.pad(a, (0, pad)) for a in args]
    nblk = (K + pad) // _G
    if block_valid is None:
        ba = jnp.ones((nblk,), jnp.int32)
    else:
        ba = block_valid.astype(jnp.int32)
    out = _win_call_b(ba, *args, vol, D, interpret=interpret)
    return out[:K, :, :rows, :cols]
