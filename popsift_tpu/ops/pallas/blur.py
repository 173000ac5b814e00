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


# ---------------------------------------------------------------------------
# Fused whole-octave chain: levels 1..L-1 + all DoGs in one pass
# ---------------------------------------------------------------------------

_TH_CHAIN = 256  # output rows per grid step


def _octave_chain_kernel(x_hbm, *refs, taps_per_level, Vcum, Hcum, Wo,
                         H, W):
    """Grid step i computes rows [i*TH, i*TH+TH) of EVERY level.

    The incremental chain blur_l = G_l * blur_{l-1} re-reads each level
    from HBM in the XLA formulation (~(L-1) * 4 array passes per
    octave); here level 0 is read ONCE per tile (with the cumulative
    halo of all downstream filters) and the whole chain runs in VMEM,
    writing only the final outputs — the s_pyramid_fixed.cu:93-119 idea
    applied to the incremental filter bank.

    Shrinking-window formulation: each level's separable conv is
    computed only over the region whose halo is still valid, so the
    buffer SHRINKS by the filter span per level and every tap is a
    plain static slice of the previous buffer — the same
    shifted-slice pattern as :func:`_blur_dog_kernel` (which Mosaic
    compiles in seconds). The previous concatenate-based in-tile
    edge padding kept the tile shape constant but blew Mosaic
    compile time past 25 minutes at 1080p (round-2 finding).
    """
    nlev = len(taps_per_level)
    blur_refs = refs[:nlev]
    dog_refs = refs[nlev:2 * nlev]
    scratch, sems = refs[2 * nlev], refs[2 * nlev + 1]

    i = pl.program_id(0)
    n = pl.num_programs(0)
    TH = _TH_CHAIN
    slot = jax.lax.rem(i, 2)

    def dma(to_slot, tile):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile * TH, TH + 2 * Vcum), :],
            scratch.at[to_slot],
            sems.at[to_slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma(jax.lax.rem(i + 1, 2), i + 1).start()

    dma(slot, i).wait()
    prev = scratch[slot]                 # [TH+2*Vcum, Wo+2*Hcum]
    vr, hc = Vcum, Hcum                  # margins around central tile

    for l, taps in enumerate(taps_per_level):
        S = len(taps) - 1
        Ht, Wt = prev.shape
        Wn, Hn = Wt - 2 * S, Ht - 2 * S
        # horizontal pass over output cols [S, Wt-S)
        acc = prev[:, S:S + Wn] * taps[0]
        for off in range(1, S + 1):
            acc += (prev[:, S - off:S - off + Wn]
                    + prev[:, S + off:S + off + Wn]) * taps[off]
        # vertical pass over output rows [S, Ht-S)
        cur = acc[S:S + Hn, :] * taps[0]
        for off in range(1, S + 1):
            cur += (acc[S - off:S - off + Hn, :]
                    + acc[S + off:S + off + Hn, :]) * taps[off]
        vr -= S
        hc -= S

        # Per-level border re-replication (the reference's clamped
        # texture reads replicate EACH level's border, assist.h:66-81;
        # without this fixup levels >= 2 would see "blur of replicated
        # level-0" in the halo instead of "replicated blur").
        g_row = (jax.lax.broadcasted_iota(jnp.int32, (Hn, 1), 0)
                 + i * TH - vr)
        g_col = jax.lax.broadcasted_iota(jnp.int32, (1, Wn), 1) - hc
        left = cur[:, hc:hc + 1]
        right = cur[:, hc + W - 1:hc + W]
        cur = jnp.where(g_col < 0, left, cur)
        cur = jnp.where(g_col > W - 1, right, cur)
        # image row 0 sits at local row vr only on grid step 0, which
        # is the only step where g_row < 0 can hold — static slice OK
        top = cur[vr:vr + 1, :]
        # the bottom image row lives at a grid-step-dependent offset;
        # Mosaic has no dynamic_slice, so read it with a one-hot
        # row reduction
        bot_local = jnp.clip(vr + (H - 1) - i * TH, 0, Hn - 1)
        bot_mask = (jax.lax.broadcasted_iota(jnp.int32, (Hn, 1), 0)
                    == bot_local).astype(cur.dtype)
        bot = jnp.sum(cur * bot_mask, axis=0, keepdims=True)
        cur = jnp.where(g_row < 0, top, cur)
        cur = jnp.where(g_row > H - 1, bot, cur)

        blur_refs[l][:] = cur[vr:vr + TH, hc:hc + Wo]
        dog_refs[l][:] = (cur[vr:vr + TH, hc:hc + Wo]
                          - prev[vr + S:vr + S + TH,
                                 hc + S:hc + S + Wo])
        prev = cur


@functools.partial(jax.jit, static_argnames=("taps_per_level", "Wo",
                                             "H", "W", "interpret"))
def _octave_chain_call(xp, taps_per_level, Wo, H, W, interpret=False):
    Scum = sum(len(t) - 1 for t in taps_per_level)
    Vcum = _round_up(Scum, 4)
    Hp, Wt = xp.shape
    TH = _TH_CHAIN
    Ho = Hp - 2 * Vcum
    nlev = len(taps_per_level)
    Hcum = (Wt - Wo) // 2

    kernel = functools.partial(_octave_chain_kernel,
                               taps_per_level=taps_per_level,
                               Vcum=Vcum, Wo=Wo, Hcum=Hcum,
                               H=H, W=W)
    out_spec = pl.BlockSpec((TH, Wo), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Ho, Wo), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(Ho // TH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=tuple([out_spec] * (2 * nlev)),
        out_shape=tuple([out_shape] * (2 * nlev)),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2 * Vcum, Wt), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(xp)


def _chain_group(lvl0: jnp.ndarray, kernels, interpret: bool):
    """One pallas_call fusing ``len(kernels)`` consecutive levels."""
    H, W = lvl0.shape
    Ss = [(k.shape[0] - 1) // 2 for k in kernels]
    Scum = sum(Ss)
    Vcum = _round_up(Scum, 4)
    TH = _TH_CHAIN
    Ho = _round_up(max(H, TH), TH)
    Wo = _round_up(max(W, 128), 128)
    Wt = _round_up(Wo + 2 * Scum, 128)
    Hcum = (Wt - Wo) // 2

    xp = jnp.pad(lvl0, ((Vcum, Ho - H + Vcum),
                        (Hcum, Wt - W - Hcum)), mode="edge")
    taps_per_level = tuple(
        tuple(float(k[s + i]) for i in range(s + 1))
        for k, s in zip(kernels, Ss))
    outs = _octave_chain_call(xp, taps_per_level, Wo, H, W,
                              interpret=interpret)
    nlev = len(kernels)
    blurs = [o[:H, :W] for o in outs[:nlev]]
    dogs = [o[:H, :W] for o in outs[nlev:]]
    return blurs, dogs


def octave_blur_chain(lvl0: jnp.ndarray, kernels, interpret: bool = False,
                      group: int | None = None):
    """Fused incremental blur chain for one octave.

    lvl0: f32[H, W]; kernels: list of full symmetric 1-D filters for
    levels 1..L-1. Returns (blurs, dogs): lists of f32[H, W], where
    blurs[l-1] is level l and dogs[l-1] = blur_l - blur_{l-1}, all with
    edge-replicated borders — numerically the `_sep_blur` chain
    (interpret-mode parity test in tests/test_pallas_blur.py).

    ``group`` caps the number of levels fused into one pallas_call
    (None = all): the chain is split into consecutive groups, each
    re-reading the previous group's last blur level from HBM. Round-2
    measured Mosaic compile of the 5-level concat-based kernel at >25
    minutes; the shrinking-window rewrite plus ``group`` bounds the
    per-kernel unrolled op count so compile stays tractable while
    still cutting the octave to ``ceil((L-1)/group)`` HBM round-trips
    (vs L-1 for per-level kernels).
    """
    if group is None or group >= len(kernels):
        return _chain_group(lvl0, kernels, interpret)
    blurs, dogs = [], []
    prev = lvl0
    for g0 in range(0, len(kernels), group):
        bl, dg = _chain_group(prev, kernels[g0:g0 + group], interpret)
        blurs += bl
        dogs += dg
        prev = bl[-1]
    return blurs, dogs
