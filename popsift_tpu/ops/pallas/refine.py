"""Pallas TPU kernel: fused refinement-window DMA + 5-iteration
sub-pixel refinement.

The reference refines each candidate in registers right after the
26-neighbor test (one thread per extremum, s_extrema.cu:359-460).  The
round-1..3 TPU pipeline split this in two: a window-DMA kernel wrote
lane-padded [K, D, 16, 128] patches to HBM (~6% useful bytes, 39 MB at
the densest 1080p octave) and ~400 small XLA ops ran the 5 one-hot
refinement iterations over them (the largest single slice of the
round-4 op-overhead tail, BASELINE.md trace table).  This kernel keeps
the DMA'd window in VMEM and runs the full refinement loop in-kernel,
emitting 13 scalars per candidate instead of 4 KB of patch — the final
accept tests stay in XLA (:func:`popsift_tpu.ops.extrema
.finalize_refined`), batched across octaves.

Exactness: the neighborhood extraction is one-hot selection (every
reduction has exactly one non-zero term, so float order is irrelevant)
and the algebra mirrors ``refine_candidates`` op for op in f32.  The
two compiled programs can still differ by ~1 ULP where XLA makes
different FMA/fusion choices around the shared ops, so
tests/test_pallas_refine.py compares validity masks and counts exactly
and float fields at 1e-5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..extrema import MAX_ITERATIONS, _solve3

_G = 8
_WR = 24    # DMA window rows (11 patch rows + 7-row alignment slack)
_WC = 256   # DMA window cols (11 patch cols + 127-lane slack)
_VR = 16    # VMEM window rows kept after the de-offset roll
_VC = 128   # VMEM window cols kept
NOUT = 16   # output lanes per job (13 used, see _refine_math)


def _refine_math(wstk, par, *, D, maxlevel, W, H, vlfeat):
    """5-iteration refinement over G jobs' VMEM windows.

    wstk f32[G, D, VR, VC]: window with origin at the job's (y0w, x0w);
    par f32[G, 8]: (x0, y0, z0, yr, xr, 0, 0, 0) — x0/y0/z0 the
    candidate cell in octave-local integer coords, (yr, xr) its offset
    inside the window.  Returns f32[G, NOUT]:
    (nx, ny, nz, dx, dy, dz, v, Dx, Dy, Ds, DDx, DDy, DXy, 0, 0, 0).

    Mirrors ops.extrema.refine_candidates' loop exactly
    (s_extrema.cu:359-460; vlfeat step policy :207-232).
    """
    G = wstk.shape[0]
    f32 = jnp.float32
    nx = par[:, 0]                    # f32 exact integers
    ny = par[:, 1]
    nz = par[:, 2].astype(jnp.int32)
    yr = par[:, 3].astype(jnp.int32)
    xr = par[:, 4].astype(jnp.int32)

    oy = jnp.zeros((G,), jnp.int32)
    ox = jnp.zeros((G,), jnp.int32)
    z = jnp.zeros((G,), f32)
    v = z
    dx = dy = dz = z
    Dx = Dy = Ds = z
    DDx = DDy = DXy = z
    done = jnp.zeros((G,), bool)

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (G, _VR), 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (G, _VC), 1)
    Wb = np.float32(W)
    Hb = np.float32(H)
    one = np.float32(1.0)

    for it in range(1, MAX_ITERATIONS + 1):
        act = ~done
        # neighborhood nb[a][b][c] [G] = vol[nz+a-1, py+b-1, px+c-1]
        # via one-hot select (layers -> rows -> lanes); each sum has a
        # single non-zero term, so this is exact selection, not
        # accumulation.
        py = yr + oy
        px = xr + ox
        planes = []
        for a in range(3):
            za = jnp.clip(nz + (a - 1), 0, D - 1)
            pa = jnp.zeros((G, _VR, _VC), f32)
            for zl in range(D):
                m = (za == zl).astype(f32)[:, None, None]
                pa = pa + m * wstk[:, zl]
            planes.append(pa)
        nb = [[[None] * 3 for _ in range(3)] for _ in range(3)]
        for b in range(3):
            oyb = (iota_r == (py + (b - 1))[:, None]).astype(f32)
            for a in range(3):
                t2 = jnp.sum(planes[a] * oyb[:, :, None], axis=1)
                for c in range(3):
                    oxc = (iota_c == (px + (c - 1))[:, None]).astype(f32)
                    nb[a][b][c] = jnp.sum(t2 * oxc, axis=1)

        c0 = nb[1][1][1]
        if it == 1:
            v = c0                     # contrast base, s_extrema.cu:357
        p2, p0 = nb[1][1][2], nb[1][1][0]
        q2, q0 = nb[1][2][1], nb[1][0][1]
        r2, r0 = nb[2][1][1], nb[0][1][1]
        nDx = 0.5 * (p2 - p0)
        nDy = 0.5 * (q2 - q0)
        nDs = 0.5 * (r2 - r0)
        nDDx = p2 + p0 - 2.0 * c0
        nDDy = q2 + q0 - 2.0 * c0
        nDDs = r2 + r0 - 2.0 * c0
        nDXy = 0.25 * (nb[1][2][2] + nb[1][0][0]
                       - nb[1][2][0] - nb[1][0][2])
        nDXs = 0.25 * (nb[2][1][2] + nb[0][1][0]
                       - nb[2][1][0] - nb[0][1][2])
        nDYs = 0.25 * (nb[2][2][1] + nb[0][0][1]
                       - nb[0][2][1] - nb[2][0][1])

        sing, sx, sy, ss = _solve3(nDDx, nDXy, nDXs, nDDy, nDYs, nDDs,
                                   -nDx, -nDy, -nDs)

        Dx = jnp.where(act, nDx, Dx)
        Dy = jnp.where(act, nDy, Dy)
        Ds = jnp.where(act, nDs, Ds)
        DDx = jnp.where(act, nDDx, DDx)
        DDy = jnp.where(act, nDDy, DDy)
        DXy = jnp.where(act, nDXy, DXy)
        dx = jnp.where(act, sx, dx)
        dy = jnp.where(act, sy, dy)
        dz = jnp.where(act, ss, dz)

        if it != MAX_ITERATIONS:
            # step policy (s_extrema.cu:258-284 / vlfeat :207-232)
            tx = (jnp.where((sx >= 0.6) & (nx < Wb - 2.0), 1, 0)
                  + jnp.where((sx <= -0.6) & (nx > one), -1, 0))
            ty = (jnp.where((sy >= 0.6) & (ny < Hb - 2.0), 1, 0)
                  + jnp.where((sy <= -0.6) & (ny > one), -1, 0))
            if vlfeat:
                tz = jnp.zeros_like(tx)
            else:
                tz = (jnp.where((ss >= 0.6) & (nz < maxlevel - 1), 1, 0)
                      + jnp.where((ss <= -0.6) & (nz > 1), -1, 0))
            converged = (tx == 0) & (ty == 0) & (tz == 0)
            move = act & ~sing & ~converged
            mtx = jnp.where(move, tx, 0)
            mty = jnp.where(move, ty, 0)
            mtz = jnp.where(move, tz, 0)
            nx = nx + mtx.astype(f32)
            ny = ny + mty.astype(f32)
            nz = nz + mtz
            ox = ox + mtx
            oy = oy + mty
            done = done | (act & (sing | converged))

    zeros = jnp.zeros((G,), f32)
    cols = [nx, ny, nz.astype(f32), dx, dy, dz, v,
            Dx, Dy, Ds, DDx, DDy, DXy, zeros, zeros, zeros]
    return jnp.stack(cols, axis=1)                 # [G, NOUT]


def _roll_window(scratch_gs, pk):
    ry = jax.lax.div(pk, 256)
    rx = jax.lax.rem(pk, 256)
    w = pltpu.roll(pltpu.roll(scratch_gs, _WR - ry, 1), _WC - rx, 2)
    return w[:, :_VR, :_VC]


def _refine_kernel(nv_ref, ya_ref, ca_ref, pk_ref, par_ref, vol_hbm,
                   out_ref, scratch, wv, sems, *, D, maxlevel, W, H,
                   vlfeat):
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
            wv[g] = _roll_window(scratch[slot, g], pk_ref[i * G + g])
        out_ref[:] = _refine_math(wv[:], par_ref[:], D=D,
                                  maxlevel=maxlevel, W=W, H=H,
                                  vlfeat=vlfeat)

    @pl.when(jnp.logical_not(active(i)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit, static_argnames=("maxlevel", "W", "H",
                                             "vlfeat", "interpret"))
def _refine_call(nv, ya, ca, pk, par, vol, maxlevel, W, H, vlfeat,
                 interpret=False):
    D = vol.shape[0]
    K = ya.shape[0]
    grid = (K // _G,)
    kernel = functools.partial(_refine_kernel, D=D, maxlevel=maxlevel,
                               W=W, H=H, vlfeat=vlfeat)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_G, 8), lambda i, *s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_G, NOUT), lambda i, *s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _G, D, _WR, _WC), jnp.float32),
            pltpu.VMEM((_G, D, _VR, _VC), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _G)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, NOUT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nv, ya, ca, pk, par, vol)


def _refine_kernel_b(ba_ref, zb_ref, ya_ref, ca_ref, pk_ref, par_ref,
                     vol_hbm, out_ref, scratch, wv, sems, *, D,
                     maxlevel, W, H, vlfeat):
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
            wv[g] = _roll_window(scratch[slot, g], pk_ref[i * G + g])
        out_ref[:] = _refine_math(wv[:], par_ref[:], D=D,
                                  maxlevel=maxlevel, W=W, H=H,
                                  vlfeat=vlfeat)

    @pl.when(jnp.logical_not(active(i)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit, static_argnames=("D", "maxlevel", "W", "H",
                                             "vlfeat", "interpret"))
def _refine_call_b(ba, zb, ya, ca, pk, par, vol, D, maxlevel, W, H,
                   vlfeat, interpret=False):
    K = ya.shape[0]
    grid = (K // _G,)
    kernel = functools.partial(_refine_kernel_b, D=D, maxlevel=maxlevel,
                               W=W, H=H, vlfeat=vlfeat)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_G, 8), lambda i, *s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_G, NOUT), lambda i, *s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _G, D, _WR, _WC), jnp.float32),
            pltpu.VMEM((_G, D, _VR, _VC), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _G)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, NOUT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ba, zb, ya, ca, pk, par, vol)


def _window_geometry(canvas, y_loc, x_loc, oy, ox):
    """Aligned DMA origin + in-window center offsets, shared with
    extract_windows_pallas' clip formulas (never binding for the
    canvas geometry, ops/pyramid.py::dog_canvas_dims)."""
    _, Hb, Wb = canvas.shape if canvas.ndim == 3 else (0,) + canvas.shape[1:]
    R = MAX_ITERATIONS
    cy = y_loc + oy
    cx = x_loc + ox
    y0w = jnp.clip(cy - R, 0, Hb - _WR)
    x0w = jnp.clip(cx - R, 0, Wb - _WC)
    ya = (y0w // 8) * 8
    ca = (x0w // 128) * 128
    pk = ((y0w - ya) * 256 + (x0w - ca)).astype(jnp.int32)
    yr = (cy - y0w).astype(jnp.float32)
    xr = (cx - x0w).astype(jnp.float32)
    return ya.astype(jnp.int32), ca.astype(jnp.int32), pk, yr, xr


def refine_windows_pallas(canvas, y_loc, x_loc, z0, n_valid, *, oy, ox,
                          W, H, maxlevel, vlfeat,
                          interpret: bool = False):
    """Fused window-DMA + refinement for one octave's candidates.

    canvas f32[D, Hb, Wb] DoG canvas (interior at (oy, ox));
    y_loc/x_loc/z0 i32[K] octave-local candidate cells; n_valid i32[]
    front-packed count.  Returns f32[K, NOUT] per-candidate refinement
    state for :func:`popsift_tpu.ops.extrema.finalize_refined`.
    """
    K = y_loc.shape[0]
    pad = (-K) % _G
    ya, ca, pk, yr, xr = _window_geometry(canvas, y_loc, x_loc, oy, ox)
    par = jnp.stack([
        x_loc.astype(jnp.float32), y_loc.astype(jnp.float32),
        z0.astype(jnp.float32), yr, xr,
        jnp.zeros_like(yr), jnp.zeros_like(yr), jnp.zeros_like(yr)],
        axis=1)
    nv = n_valid.astype(jnp.int32).reshape(1) \
        if hasattr(n_valid, "astype") else jnp.asarray([n_valid],
                                                       jnp.int32)
    args = [ya, ca, pk]
    if pad:
        args = [jnp.pad(a, (0, pad)) for a in args]
        par = jnp.pad(par, ((0, pad), (0, 0)))
    out = _refine_call(nv, *args, par, canvas, maxlevel, W, H,
                       bool(vlfeat), interpret=interpret)
    return out[:K]


def refine_windows_pallas_batched(canvas, zbase, y_loc, x_loc, z0,
                                  block_valid, *, oy, ox, D, W, H,
                                  maxlevel, vlfeat,
                                  interpret: bool = False):
    """Batched variant: jobs from F frames against a [F*D, Hb, Wb]
    canvas; zbase i32[K] per-job first layer (f*D); block_valid
    bool/int[K // 8] per-block activity."""
    K = y_loc.shape[0]
    pad = (-K) % _G
    ya, ca, pk, yr, xr = _window_geometry(canvas, y_loc, x_loc, oy, ox)
    par = jnp.stack([
        x_loc.astype(jnp.float32), y_loc.astype(jnp.float32),
        z0.astype(jnp.float32), yr, xr,
        jnp.zeros_like(yr), jnp.zeros_like(yr), jnp.zeros_like(yr)],
        axis=1)
    args = [zbase.astype(jnp.int32), ya, ca, pk]
    if pad:
        args = [jnp.pad(a, (0, pad)) for a in args]
        par = jnp.pad(par, ((0, pad), (0, 0)))
    nblk = (K + pad) // _G
    ba = jnp.ones((nblk,), jnp.int32) if block_valid is None \
        else block_valid.astype(jnp.int32)
    out = _refine_call_b(ba, *args, par, canvas, D, maxlevel, W, H,
                         bool(vlfeat), interpret=interpret)
    return out[:K]


def refine_pallas_available() -> bool:
    """True when the fused collect+refine kernel should be used.

    OFF by default since round 5: two same-session A/Bs (round-4
    BASELINE.md 71.3 vs 71.8 fps; round-5 scripts/ab_refine.py
    14.0/14.61 vs 14.13/14.10 ms/frame interleaved reps) measured the
    kernel throughput-neutral against the XLA patch-refine path, and a
    neutral kernel is pure complexity on the production path. It
    remains the lower-HBM-traffic option (no 4 KB lane-padded patch
    per candidate, ~39 MB/frame less at 1080p saturation) — opt in
    with POPSIFT_TPU_FUSED_REFINE=1 for traffic-constrained
    deployments. Reference anchor: in-register refinement,
    s_extrema.cu:359-460."""
    import os
    if os.environ.get("POPSIFT_TPU_FUSED_REFINE", "0") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
