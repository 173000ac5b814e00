"""Pallas TPU kernel: fused separable Gaussian blur + DoG.

The hot loop of pyramid construction (reference: one horizontal +
one vertical warp-shuffle pass per level, s_pyramid_build_aa.cu:17-131,
plus a separate DoG kernel, s_pyramid_build.cu:74-92). The XLA shift-add
formulation materializes intermediates between the two passes and the
DoG subtraction re-reads both blur levels; this kernel does all three in
one VMEM round-trip:

    HBM read (tile + vertical halo)  ->  horiz taps  ->  vert taps  ->
    blur tile + DoG tile written back

per 128-row tile. Input tiles overlap by the 2S-row vertical halo, which
BlockSpec index maps cannot express, so the input stays in HBM and each
grid step DMAs its halo'd slab into VMEM scratch (double-buffered: the
next tile's DMA is issued before the current tile's compute).

Both passes exploit kernel symmetry (paired taps, half the multiplies —
the same trick as the reference's paired-tap loop,
s_pyramid_build_aa.cu:35-49). The DoG layer dog[l-1] = blur[l] -
blur[l-1] falls out for free because the input tile *is* blur[l-1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 64  # output rows per grid step (VMEM: double-buffered in+out tiles)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _blur_dog_kernel(x_hbm, blur_ref, dog_ref, scratch, sems,
                     *, taps, S, SV, Wo):
    """Grid step i: rows [i*TH, i*TH+TH) of the output.

    x_hbm: f32[Ho+2*SV, Wpad] in HBM (SV = S rounded up so DMA row
    counts are sublane-aligned; Wpad = Wo+2S rounded up to 128 lanes).
    scratch: VMEM [2, TH+2*SV, Wpad] double buffer. blur_ref/dog_ref:
    VMEM [TH, Wo] output tiles.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    TH = _TH
    slot = jax.lax.rem(i, 2)

    def dma(to_slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * TH, TH + 2 * SV), :],
            scratch.at[to_slot],
            sems.at[to_slot])

    # warm-up: first tile's DMA is issued by the first grid step
    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    # prefetch the next tile while computing this one
    @pl.when(i + 1 < n)
    def _():
        dma(jax.lax.rem(i + 1, 2), i + 1).start()

    dma(slot, i).wait()
    x = scratch[slot]                               # [TH+2SV, Wpad]

    # horizontal pass over the rows the vertical taps will touch
    acc = x[:, S:S + Wo] * taps[0]
    for off in range(1, S + 1):
        acc += (x[:, S - off:S - off + Wo]
                + x[:, S + off:S + off + Wo]) * taps[off]

    # vertical pass restricted to the output rows
    out = acc[SV:SV + TH, :] * taps[0]
    for off in range(1, S + 1):
        out += (acc[SV - off:SV - off + TH, :]
                + acc[SV + off:SV + off + TH, :]) * taps[off]

    blur_ref[:] = out
    # DoG for the *input* level: dog = blur_l - blur_{l-1}
    dog_ref[:] = out - x[SV:SV + TH, S:S + Wo]


@functools.partial(jax.jit, static_argnames=("taps", "Wo", "interpret"))
def _blur_dog_call(xp, taps, Wo, interpret=False):
    S = len(taps) - 1
    SV = _round_up(S, 4)
    Hp, Wp = xp.shape            # Ho + 2*SV, Wpad
    TH = _TH
    Ho = Hp - 2 * SV
    grid = (Ho // TH,)

    kernel = functools.partial(_blur_dog_kernel, taps=taps, S=S, SV=SV,
                               Wo=Wo)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((TH, Wo), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, Wo), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Ho, Wo), jnp.float32),
            jax.ShapeDtypeStruct((Ho, Wo), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2 * SV, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp)


def blur_and_dog(img: jnp.ndarray, kernel: np.ndarray,
                 interpret: bool = False):
    """Fused separable blur + DoG of one level.

    img: f32[H, W] (blur level l-1). kernel: full symmetric 1-D filter.
    Returns (blur_l f32[H, W], dog_{l-1} f32[H, W]) with edge-replicated
    borders (clamped-texture semantics, assist.h:66-81).
    """
    H, W = img.shape
    klen = kernel.shape[0]
    S = (klen - 1) // 2
    SV = _round_up(S, 4)
    Ho = _round_up(max(H, _TH), _TH)
    Wo = _round_up(max(W, 128), 128)
    Wpad = _round_up(Wo + 2 * S, 128)

    # edge-replicate the true borders; the alignment tail (rows H..Ho,
    # cols W..Wo) just repeats the edge and is sliced away afterwards.
    xp = jnp.pad(img, ((SV, Ho - H + SV), (S, Wpad - W - S)), mode="edge")
    taps = tuple(float(kernel[S + i]) for i in range(S + 1))
    blur, dog = _blur_dog_call(xp, taps, Wo, interpret=interpret)
    return blur[:H, :W], dog[:H, :W]


def blur_dog_available() -> bool:
    """Pallas path is used on TPU backends only (tests force interpret)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
