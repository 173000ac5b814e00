"""Pallas TPU kernel: DoG extrema candidate mask (26-neighbor test).

Reference: find_extrema_in_dog's grouped short-circuit neighbor test
(s_extrema.cu:56-120). The XLA formulation expresses the 26 comparisons
as dynamic-slices of the padded DoG — each is a separate HBM read
stream (~2.6 GB/frame, ~9 ms). This stencil reads each DoG row tile
once into VMEM and evaluates all comparisons there.

Output is an int8 0/1 mask (bool layouts are awkward across the Mosaic
boundary; int8 quarters the kernel's store traffic vs f32 — the o0 mask
write was output-bandwidth-bound at ~100 MB/frame, round-5 trace)
ABI); callers threshold at > 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 32  # output rows per grid step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _mask_kernel(dog_hbm, out_ref, scratch, sems, *, D, Z, W, Wo, thr1):
    """Grid step i covers output rows [i*TH, i*TH+TH).

    dog_hbm: f32[D, Ho+2, Wp] (rows/cols edge-padded by 1, rows padded
    to 8-aligned tiles); scratch: VMEM [2, D, TH+8, Wp]; out_ref
    [Z, TH, Wo] f32 0/1.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    TH = _TH
    slot = jax.lax.rem(i, 2)

    def dma(step, to_slot):
        # rows [step*TH, step*TH + TH + 8): the +-1 halo lives in the
        # first/last +8 alignment slack (input is padded by 1 + tail)
        return pltpu.make_async_copy(
            dog_hbm.at[:, pl.ds(step * TH, TH + 8), :],
            scratch.at[to_slot],
            sems.at[to_slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma(i + 1, jax.lax.rem(i + 1, 2)).start()

    dma(i, slot).wait()
    x = scratch[slot]                         # [D, TH+8, Wp]

    # separable 26-neighbor max/min: "c strictly greater than all 26"
    # is exactly "c > max of the 26" — 3-tap running max/min along x,
    # then y, then the cross-layer combine: ~30 vector ops instead of
    # 104 shifted compares.
    R = TH + 8
    C = x.shape[2]
    hmax = jnp.maximum(jnp.maximum(x[:, :, :C - 2], x[:, :, 1:C - 1]),
                       x[:, :, 2:])                     # col-centered j+1
    hmin = jnp.minimum(jnp.minimum(x[:, :, :C - 2], x[:, :, 1:C - 1]),
                       x[:, :, 2:])
    box9max = jnp.maximum(jnp.maximum(hmax[:, :R - 2], hmax[:, 1:R - 1]),
                          hmax[:, 2:])                  # 3x3 incl center
    box9min = jnp.minimum(jnp.minimum(hmin[:, :R - 2], hmin[:, 1:R - 1]),
                          hmin[:, 2:])
    rows6max = jnp.maximum(hmax[:, :R - 2], hmax[:, 2:])  # rows y+-1
    rows6min = jnp.minimum(hmin[:, :R - 2], hmin[:, 2:])
    side2max = jnp.maximum(x[:, 1:R - 1, :C - 2], x[:, 1:R - 1, 2:])
    side2min = jnp.minimum(x[:, 1:R - 1, :C - 2], x[:, 1:R - 1, 2:])
    inp8max = jnp.maximum(rows6max, side2max)           # in-plane 8
    inp8min = jnp.minimum(rows6min, side2min)

    for z in range(1, Z + 1):
        c = x[z, 1:TH + 1, 1:Wo + 1]
        first = jnp.abs(c) >= thr1
        max26 = jnp.maximum(jnp.maximum(box9max[z - 1, :TH, :Wo],
                                        box9max[z + 1, :TH, :Wo]),
                            inp8max[z, :TH, :Wo])
        min26 = jnp.minimum(jnp.minimum(box9min[z - 1, :TH, :Wo],
                                        box9min[z + 1, :TH, :Wo]),
                            inp8min[z, :TH, :Wo])
        gt = first & (c > max26)
        lt = first & (c < min26)
        out_ref[z - 1] = (gt | lt).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("Z", "Wo", "thr1",
                                             "interpret"))
def _mask_call(dogp, Z, Wo, thr1, interpret=False):
    D, Hp, Wp = dogp.shape                    # Hp = Ho + 8 (halo+slack)
    TH = _TH
    Ho = Hp - 8
    grid = (Ho // TH,)
    kernel = functools.partial(_mask_kernel, D=D, Z=Z, W=Wo, Wo=Wo,
                               thr1=thr1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((Z, TH, Wo), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, Ho, Wo), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, D, TH + 8, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dogp)


def candidate_mask_pallas(dog: jnp.ndarray, thr1: float,
                          interpret: bool = False) -> jnp.ndarray:
    """26-neighbor strict extremum mask for layers 1..D-2.

    dog: f32[D, H, W]; thr1: first-contrast threshold (|c| >= thr1).
    Returns bool[D-2, H, W]. Edge-replicated borders reproduce the
    clamped-texture behavior (border pixels always fail the strict
    test).
    """
    D, H, W = dog.shape
    Z = D - 2
    Ho = _round_up(H, _TH)
    Wo = _round_up(W, 128)
    Wp = _round_up(Wo + 2, 128)
    # rows: 1 top halo + (Ho - H + 7) bottom (halo + alignment slack);
    # the kernel reads [TH + 8] rows per tile so the last tile stays in
    # range: Ho - TH + TH + 8 = Ho + 8 = Hp.
    dogp = jnp.pad(dog, ((0, 0), (1, Ho - H + 7), (1, Wp - W - 1)),
                   mode="edge")
    out = _mask_call(dogp, Z, Wo, float(thr1), interpret=interpret)
    return (out[:, :H, :W] > 0)


def mask_pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# canvas variant: reads the shared halo-padded DoG canvas directly
# (ops/pyramid.py::assemble_dog_canvas) — no per-consumer edge-pad copy.
# ---------------------------------------------------------------------------

_OY = 8     # canvas interior row origin (pyramid.DOG_OY)
_OX = 128   # canvas interior col origin (pyramid.DOG_OX)


def _mask_canvas_kernel(dog_hbm, out_ref, scratch, sems, *, D, Z, H, W,
                        Wo, thr1):
    """Grid step i covers image rows [i*TH, i*TH + TH).

    dog_hbm: f32[D, Hd, Wd] canvas with the image at (OY, OX); the halo
    holds zeros, NOT edge replicas — border rows/cols are forced false
    in-kernel instead (a border pixel can never be a strict extremum:
    the reference's clamped-texture read makes ``val > val`` false,
    s_extrema.cu:98-120). DMA tiles of TH+16 rows start at the aligned
    row i*TH and carry the +-1 halo inside the OY offset.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    TH = _TH
    slot = jax.lax.rem(i, 2)

    def dma(step, to_slot):
        return pltpu.make_async_copy(
            dog_hbm.at[:, pl.ds(step * TH, TH + 16), :],
            scratch.at[to_slot],
            sems.at[to_slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma(i + 1, jax.lax.rem(i + 1, 2), ).start()

    dma(i, slot).wait()
    x = scratch[slot]                         # [D, TH+16, Wd]
    # image row i*TH + r lives at local row OY + r; col j at OX + j.

    R = TH + 16
    C = x.shape[2]
    hmax = jnp.maximum(jnp.maximum(x[:, :, :C - 2], x[:, :, 1:C - 1]),
                       x[:, :, 2:])                     # col-centered j+1
    hmin = jnp.minimum(jnp.minimum(x[:, :, :C - 2], x[:, :, 1:C - 1]),
                       x[:, :, 2:])
    box9max = jnp.maximum(jnp.maximum(hmax[:, :R - 2], hmax[:, 1:R - 1]),
                          hmax[:, 2:])                  # row-centered r+1
    box9min = jnp.minimum(jnp.minimum(hmin[:, :R - 2], hmin[:, 1:R - 1]),
                          hmin[:, 2:])
    rows6max = jnp.maximum(hmax[:, :R - 2], hmax[:, 2:])  # rows y+-1 only
    rows6min = jnp.minimum(hmin[:, :R - 2], hmin[:, 2:])
    side2max = jnp.maximum(x[:, 1:R - 1, :C - 2], x[:, 1:R - 1, 2:])
    side2min = jnp.minimum(x[:, 1:R - 1, :C - 2], x[:, 1:R - 1, 2:])
    inp8max = jnp.maximum(rows6max, side2max)           # in-plane 8
    inp8min = jnp.minimum(rows6min, side2min)

    # border forcing: image row/col 0 and H-1/W-1 always fail
    rr = jax.lax.broadcasted_iota(jnp.int32, (TH, Wo), 0) + i * TH
    cc = jax.lax.broadcasted_iota(jnp.int32, (TH, Wo), 1)
    interior = ((rr >= 1) & (rr <= H - 2) & (cc >= 1) & (cc <= W - 2))

    # center rows at local OY..OY+TH-1 -> box/inp index OY-1; center
    # cols at OX..OX+Wo-1 -> index OX-1
    ro = _OY - 1
    co = _OX - 1
    for z in range(1, Z + 1):
        c = x[z, _OY:_OY + TH, _OX:_OX + Wo]
        first = jnp.abs(c) >= thr1
        max26 = jnp.maximum(
            jnp.maximum(box9max[z - 1, ro:ro + TH, co:co + Wo],
                        box9max[z + 1, ro:ro + TH, co:co + Wo]),
            inp8max[z, ro:ro + TH, co:co + Wo])
        min26 = jnp.minimum(
            jnp.minimum(box9min[z - 1, ro:ro + TH, co:co + Wo],
                        box9min[z + 1, ro:ro + TH, co:co + Wo]),
            inp8min[z, ro:ro + TH, co:co + Wo])
        gt = first & (c > max26)
        lt = first & (c < min26)
        out_ref[z - 1] = ((gt | lt) & interior).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("Z", "H", "W", "Wo", "thr1",
                                             "interpret"))
def _mask_canvas_call(canvas, Z, H, W, Wo, thr1, interpret=False):
    D, Hd, Wd = canvas.shape
    TH = _TH
    Ho = _round_up(H, TH)
    grid = (Ho // TH,)
    kernel = functools.partial(_mask_canvas_kernel, D=D, Z=Z, H=H, W=W,
                               Wo=Wo, thr1=thr1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((Z, TH, Wo), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, Ho, Wo), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, D, TH + 16, Wd), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(canvas)


def candidate_mask_canvas_pallas(canvas: jnp.ndarray, H: int, W: int,
                                 thr1: float,
                                 interpret: bool = False) -> jnp.ndarray:
    """26-neighbor strict extremum mask for DoG layers 1..D-2 read from
    the shared halo-padded canvas (interior at (DOG_OY, DOG_OX)).

    canvas: f32[D, Hd, Wd] from assemble_dog_canvas. Returns
    bool[D-2, H, W] in image coordinates.
    """
    D = canvas.shape[0]
    Z = D - 2
    Wo = _round_up(W, 128)
    out = _mask_canvas_call(canvas, Z, H, W, Wo, float(thr1),
                            interpret=interpret)
    return (out[:, :H, :W] > 0)


# ---------------------------------------------------------------------------
# frame-batched canvas variant: one kernel for F frames' canvases
# (stacked on the layer axis), grid (F, row-steps).
# ---------------------------------------------------------------------------

def _mask_canvas_kernel_b(dog_hbm, out_ref, scratch, sems, *, D, Z, H, W,
                          Wo, thr1):
    """dog_hbm: f32[F*D, Hd, Wd]; grid (F, Ho//TH); out [F, Z, Ho, Wo]."""
    f = pl.program_id(0)
    i = pl.program_id(1)
    nf = pl.num_programs(0)
    n = pl.num_programs(1)
    TH = _TH
    step_lin = f * n + i
    slot = jax.lax.rem(step_lin, 2)

    def dma(fs, step, to_slot):
        return pltpu.make_async_copy(
            dog_hbm.at[pl.ds(fs * D, D), pl.ds(step * TH, TH + 16), :],
            scratch.at[to_slot],
            sems.at[to_slot])

    @pl.when(step_lin == 0)
    def _():
        dma(0, 0, 0).start()

    @pl.when(step_lin + 1 < nf * n)
    def _():
        nxt = step_lin + 1
        dma(jax.lax.div(nxt, n), jax.lax.rem(nxt, n),
            jax.lax.rem(nxt, 2)).start()

    dma(f, i, slot).wait()
    x = scratch[slot]

    R = TH + 16
    C = x.shape[2]
    hmax = jnp.maximum(jnp.maximum(x[:, :, :C - 2], x[:, :, 1:C - 1]),
                       x[:, :, 2:])
    hmin = jnp.minimum(jnp.minimum(x[:, :, :C - 2], x[:, :, 1:C - 1]),
                       x[:, :, 2:])
    box9max = jnp.maximum(jnp.maximum(hmax[:, :R - 2], hmax[:, 1:R - 1]),
                          hmax[:, 2:])
    box9min = jnp.minimum(jnp.minimum(hmin[:, :R - 2], hmin[:, 1:R - 1]),
                          hmin[:, 2:])
    rows6max = jnp.maximum(hmax[:, :R - 2], hmax[:, 2:])
    rows6min = jnp.minimum(hmin[:, :R - 2], hmin[:, 2:])
    side2max = jnp.maximum(x[:, 1:R - 1, :C - 2], x[:, 1:R - 1, 2:])
    side2min = jnp.minimum(x[:, 1:R - 1, :C - 2], x[:, 1:R - 1, 2:])
    inp8max = jnp.maximum(rows6max, side2max)
    inp8min = jnp.minimum(rows6min, side2min)

    rr = jax.lax.broadcasted_iota(jnp.int32, (TH, Wo), 0) + i * TH
    cc = jax.lax.broadcasted_iota(jnp.int32, (TH, Wo), 1)
    interior = ((rr >= 1) & (rr <= H - 2) & (cc >= 1) & (cc <= W - 2))

    ro = _OY - 1
    co = _OX - 1
    for z in range(1, Z + 1):
        c = x[z, _OY:_OY + TH, _OX:_OX + Wo]
        first = jnp.abs(c) >= thr1
        max26 = jnp.maximum(
            jnp.maximum(box9max[z - 1, ro:ro + TH, co:co + Wo],
                        box9max[z + 1, ro:ro + TH, co:co + Wo]),
            inp8max[z, ro:ro + TH, co:co + Wo])
        min26 = jnp.minimum(
            jnp.minimum(box9min[z - 1, ro:ro + TH, co:co + Wo],
                        box9min[z + 1, ro:ro + TH, co:co + Wo]),
            inp8min[z, ro:ro + TH, co:co + Wo])
        gt = first & (c > max26)
        lt = first & (c < min26)
        out_ref[0, z - 1] = ((gt | lt) & interior).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("F", "Z", "H", "W", "Wo",
                                             "thr1", "interpret"))
def _mask_canvas_call_b(canvas, F, Z, H, W, Wo, thr1, interpret=False):
    FD, Hd, Wd = canvas.shape
    D = FD // F
    TH = _TH
    Ho = _round_up(H, TH)
    grid = (F, Ho // TH)
    kernel = functools.partial(_mask_canvas_kernel_b, D=D, Z=Z, H=H, W=W,
                               Wo=Wo, thr1=thr1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, Z, TH, Wo), lambda f, i: (f, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, Z, Ho, Wo), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, D, TH + 16, Wd), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(canvas)


def candidate_mask_canvas_batched(canvas: jnp.ndarray, F: int, H: int,
                                  W: int, thr1: float,
                                  interpret: bool = False) -> jnp.ndarray:
    """Frame-batched canvas mask: canvas f32[F*D, Hd, Wd] (F frames'
    DoG canvases stacked on the layer axis). Returns bool[F, D-2, H, W].
    """
    D = canvas.shape[0] // F
    Z = D - 2
    Wo = _round_up(W, 128)
    out = _mask_canvas_call_b(canvas, F, Z, H, W, Wo, float(thr1),
                              interpret=interpret)
    return (out[:, :, :H, :W] > 0)
