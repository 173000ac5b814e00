"""Per-stage roofline table for 1080p extraction on the current device.

For each pipeline stage: measured per-frame device time (batch-size
slope, see stage_slope.py), analytic HBM traffic and FLOPs from the
plan, and the implied fraction of the measured device peaks — the
"speed-of-light" accounting BASELINE.md's target table asks for.

Usage:
    PYTHONPATH=/root/.axon_site python scripts/roofline.py [--fast]

Peaks are MEASURED, not nameplate: the tunneled v5e allocation is
fractional (8.8 TF bf16 measured vs ~197 TF nameplate), so rooflines
against nameplate would be meaningless.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcc")

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def measure_hbm_bw(mb=256, reps=16):
    """Streaming bandwidth: a chain of whole-array copies.

    Elementwise chains fuse into ONE memory pass, so each rep includes a
    ``jnp.roll`` — a genuine read+write copy XLA cannot fuse away — plus
    a fused add (2 reads + 1 write per rep)."""
    n = mb * 2**20 // 4
    x = jnp.arange(n, dtype=jnp.float32) * 1e-9
    y = jnp.ones(n, jnp.float32)

    def chain(x, y, k):
        for i in range(k):
            y = jnp.roll(y + x * np.float32(1.0 + 1e-9 * i), 1)
        return jnp.sum(y)

    f = jax.jit(lambda x, y: chain(x, y, reps))
    f1 = jax.jit(lambda x, y: chain(x, y, 1))
    np.asarray(f(x, y))
    t0 = time.perf_counter()
    np.asarray(f(x, y))
    dt1 = time.perf_counter() - t0
    np.asarray(f1(x, y))
    t0 = time.perf_counter()
    np.asarray(f1(x, y))
    dt0 = time.perf_counter() - t0
    per_rep = (dt1 - dt0) / (reps - 1)
    return 3 * n * 4 / per_rep        # bytes/s (2 reads + 1 write)


def measure_matmul_peak(k=4096, reps=8):
    a = jnp.ones((k, k), jnp.bfloat16)
    b = jnp.ones((k, k), jnp.bfloat16)

    @jax.jit
    def f(a, b):
        acc = None
        x = a
        for i in range(reps):
            x = (x @ b) * np.float32(1e-4)
            acc = x if acc is None else acc + x
        return jnp.sum(acc.astype(jnp.float32))

    np.asarray(f(a, b))
    t0 = time.perf_counter()
    np.asarray(f(a, b))
    dt = time.perf_counter() - t0
    return reps * 2 * k**3 / dt


def stage_model(plan, cfg, caps):
    """Analytic (bytes_moved, flops) per frame per stage."""
    F = 4
    px = [h * w for h, w in plan.pyramid.dims]
    L = cfg.total_levels

    # pyramid: per octave, L-1 separable blurs (2 passes, each
    # read+write f32) + DoG (read 2, write 1, fused to ~1 extra pass)
    pyr_bytes = sum(p * ((L - 1) * 4 + (L - 1)) * F for p in px)
    # octave-0 build from input: polyphase = ~4 small convs + interleave
    pyr_bytes += px[0] * 3 * F
    spans = [k.shape[0] for k in plan.pyramid.inc_kernels[1:]]
    pyr_flops = sum(p * sum(2 * ((s + 1) // 2) * 2 for s in spans)
                    for p in px)

    # candidate mask: read L-3+2 DoG layers, write bool
    mask_bytes = sum(p * ((L - 1) * 4 + 1) for p in px)
    mask_flops = sum(p * (L - 3) * 26 * 2 for p in px)

    # compaction: int8 rank phase = ~7 passes over int8 + reductions
    comp_bytes = sum(p * (L - 3) * (1 + 8) for p in px)

    # refine: per candidate an 11x11xD window
    refine_bytes = sum(c * L * 11 * 11 * 4 for c in caps)

    # orientation: per keypoint a P^2 window read (DMA), P ~ 2R+3
    from popsift_tpu.ops.orientation import max_ori_radius
    P = 2 * (max_ori_radius(cfg) + 1) + 1
    ori_bytes = sum(c * P * P * 4 for c in caps)
    ori_flops = sum(c * P * P * 30 for c in caps)

    # descriptors (loop kernel): per job one 112x256 window DMA + math
    job_caps = [c + c // 4 for c in caps]
    desc_bytes = sum(j * 112 * 256 * 4 for j in job_caps)
    desc_flops = sum(j * 112 * 256 * 40 for j in job_caps)

    return {
        "pyramid": (pyr_bytes, pyr_flops),
        "mask": (mask_bytes, mask_flops),
        "compact": (comp_bytes, 0),
        "extrema": (mask_bytes + comp_bytes + refine_bytes, mask_flops),
        "orientation": (ori_bytes, ori_flops),
        "descriptors": (desc_bytes, desc_flops),
    }


def main():
    from bench import make_frame
    from stage_slope import CAPS, slope, probe
    from popsift_tpu.config import SiftConfig
    from popsift_tpu.pipeline import build_extract_plan, extract
    from popsift_tpu.ops.pyramid import build_pyramid
    from popsift_tpu.ops.extrema import _candidate_mask, _compact_mask, \
        detect_extrema
    from popsift_tpu.ops.orientation import assign_orientations

    bw = measure_hbm_bw()
    tf = measure_matmul_peak()
    print(f"measured peaks: HBM {bw / 1e9:.0f} GB/s, "
          f"matmul {tf / 1e12:.1f} TFLOP/s")

    cfg = SiftConfig(extrema_capacity=8192)
    plan = build_extract_plan(cfg, 1080, 1920, octave_caps=CAPS)
    dims = plan.pyramid.dims
    imgs = np.stack([make_frame(1080, 1920, seed=i) for i in range(4)])
    model = stage_model(plan, cfg, CAPS)

    import subprocess
    measured = {}

    def run_stage(name, fn, arrs):
        s, ts = slope(fn, arrs)
        measured[name] = s
        return s

    run_stage("pyramid", lambda im: probe(build_pyramid(
        im, plan.pyramid, use_pallas=False)), imgs)
    pyr = jax.jit(lambda xs: jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls),
        *[build_pyramid(xs[i], plan.pyramid, use_pallas=False)
          for i in range(4)]))
    blurs, dogs = pyr(imgs)
    run_stage("mask", lambda d: probe(tuple(
        _candidate_mask(x, cfg) for x in d)), dogs)
    run_stage("compact", lambda d: probe(tuple(
        _compact_mask(_candidate_mask(x, cfg).reshape(-1),
                      plan.ext_caps[o])
        for o, x in enumerate(d))), dogs)
    run_stage("extrema", lambda d: probe(tuple(
        detect_extrema(x, cfg, plan.ext_caps[o], dims[o][1], dims[o][0])
        for o, x in enumerate(d))), dogs)

    def ext_one(d):
        return tuple(
            detect_extrema(x, cfg, plan.ext_caps[o], dims[o][1],
                           dims[o][0]) for o, x in enumerate(d))
    ext = jax.jit(lambda ds: jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls),
        *[ext_one(jax.tree_util.tree_map(lambda x: x[i], ds))
          for i in range(4)]))
    exts = ext(dogs)
    run_stage("orientation", lambda be: probe(tuple(
        assign_orientations(b, e, cfg)
        for b, e in zip(be[0], be[1]))), (blurs, exts))

    from popsift_tpu.ops.descriptors import (
        compute_descriptors, make_descriptor_jobs, normalize_descriptors)

    def ori_one(be):
        return tuple(assign_orientations(b, e, cfg)
                     for b, e in zip(be[0], be[1]))
    ori = jax.jit(lambda be: jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls),
        *[ori_one(jax.tree_util.tree_map(lambda x: x[i], be))
          for i in range(4)]))
    oris = ori((blurs, exts))

    def desc_stage(t3):
        bl, ex, orr = t3
        out = []
        for o, (b, e, r) in enumerate(zip(bl, ex, orr)):
            jobs = make_descriptor_jobs(e, r, plan.job_caps[o])
            out.append(probe(normalize_descriptors(
                compute_descriptors(b, jobs, cfg), cfg)))
        return sum(out)
    run_stage("descriptors", desc_stage, (blurs, exts, oris))

    run_stage("full", lambda im: extract(im, plan).n_keypoints
              .astype(jnp.float32), imgs)

    print(f"\n{'stage':<13}{'ms/img':>8}{'GB moved':>10}{'GFLOP':>8}"
          f"{'bw-bound ms':>12}{'flop-bound ms':>14}{'% of light':>11}")
    for name, t in measured.items():
        if name not in model:
            print(f"{name:<13}{t:>8.2f}")
            continue
        b, f = model[name]
        t_bw = b / bw * 1e3
        t_fl = f / tf * 1e3
        bound = max(t_bw, t_fl)
        pct = 100 * bound / t if t > 0 else 0
        print(f"{name:<13}{t:>8.2f}{b / 1e9:>10.2f}{f / 1e9:>8.1f}"
              f"{t_bw:>12.2f}{t_fl:>14.2f}{pct:>10.0f}%")


if __name__ == "__main__":
    main()
