"""Per-image cost of one pipeline stage via batch-size slope.

Times the vmapped stage at B=1 and B=4 on the current device; the slope
(t4 - t1) / 3 is the marginal per-image device time, with dispatch/RTT
overhead cancelled. Usage:

    python scripts/stage_slope.py pyramid|mask|compact|extrema|orientation|descriptors|full
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcc")

sys.path.insert(0, ".")
from bench import make_frame  # noqa: E402

from popsift_tpu.config import SiftConfig  # noqa: E402
from popsift_tpu.ops.descriptors import (  # noqa: E402
    compute_descriptors, make_descriptor_jobs, normalize_descriptors)
from popsift_tpu.ops.extrema import (  # noqa: E402
    _candidate_mask, _compact_mask, detect_extrema)
from popsift_tpu.ops.orientation import assign_orientations  # noqa: E402
from popsift_tpu.ops.pyramid import build_pyramid  # noqa: E402
from popsift_tpu.pipeline import build_extract_plan, extract  # noqa: E402

CAPS = (256, 256, 256, 3072, 512, 256, 256, 256, 256)


def probe(tree):
    ls = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in ls)


def slope(stagefn, arrs, iters=8):
    # unrolled batch (not vmap) to match the production batching mode:
    # vmapped gathers trigger pathological batch-minor relayouts.
    ts = {}
    for B in (1, 4):
        def fn_(a, B=B):
            tot = jnp.float32(0)
            for i in range(B):
                tot = tot + stagefn(
                    jax.tree_util.tree_map(lambda x: x[i], a))
            return tot
        fn = jax.jit(fn_)
        a = jax.tree_util.tree_map(lambda x: x[:4], arrs)
        np.asarray(fn(a))
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(fn(a))
        ts[B] = (time.perf_counter() - t0) / iters * 1000
    return (ts[4] - ts[1]) / 3, ts


def main():
    which = sys.argv[1]
    cfg = SiftConfig(extrema_capacity=8192)
    plan = build_extract_plan(cfg, 1080, 1920, octave_caps=CAPS)
    dims = plan.pyramid.dims
    imgs = np.stack([make_frame(1080, 1920, seed=i) for i in range(4)])

    if which.startswith("pyr_"):
        s, ts = _pyr_parts(which, plan, cfg, imgs, dims)
        print(f"{which}: {s:.1f} ms/img  (B1={ts[1]:.0f} B4={ts[4]:.0f})")
        return
    if which == "full":
        s, ts = slope(lambda im: extract(im, plan).n_keypoints
                      .astype(jnp.float32), imgs)
        print(f"full: {s:.1f} ms/img  (B1={ts[1]:.0f} B4={ts[4]:.0f})")
        return
    if which == "pyramid":
        s, ts = slope(lambda im: probe(build_pyramid(im, plan.pyramid,
                                                     use_pallas=False)), imgs)
        print(f"pyramid: {s:.1f} ms/img  (B1={ts[1]:.0f} B4={ts[4]:.0f})")
        return
    if which == "pyramid_chain":
        s, ts = slope(lambda im: probe(build_pyramid(
            im, plan.pyramid, use_pallas="chain")), imgs)
        print(f"pyramid_chain: {s:.1f} ms/img  "
              f"(B1={ts[1]:.0f} B4={ts[4]:.0f})")
        return

    pyr = jax.jit(lambda xs: jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls),
        *[build_pyramid(xs[i], plan.pyramid, use_pallas=False)
          for i in range(4)]))
    blurs, dogs = pyr(imgs)

    if which == "mask":
        s, ts = slope(lambda d: probe(tuple(_candidate_mask(x, cfg)
                                            for x in d)), dogs)
    elif which == "compact":
        s, ts = slope(lambda d: probe(tuple(
            _compact_mask(_candidate_mask(x, cfg).reshape(-1),
                          plan.ext_caps[o])
            for o, x in enumerate(d))), dogs)
    elif which == "extrema":
        s, ts = slope(lambda d: probe(tuple(
            detect_extrema(x, cfg, plan.ext_caps[o], dims[o][1], dims[o][0])
            for o, x in enumerate(d))), dogs)
    else:
        def ext_one(d):
            return tuple(
                detect_extrema(x, cfg, plan.ext_caps[o], dims[o][1],
                               dims[o][0]) for o, x in enumerate(d))
        ext = jax.jit(lambda ds: jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls),
            *[ext_one(jax.tree_util.tree_map(lambda x: x[i], ds))
              for i in range(4)]))
        exts = ext(dogs)
        if which == "orientation":
            s, ts = slope(lambda be: probe(tuple(
                assign_orientations(b, e, cfg)
                for b, e in zip(be[0], be[1]))), (blurs, exts))
        elif which == "descriptors":
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
            s, ts = slope(desc_stage, (blurs, exts, oris))
        else:
            raise SystemExit(f"unknown stage {which}")
    print(f"{which}: {s:.1f} ms/img  (B1={ts[1]:.0f} B4={ts[4]:.0f})")


# --- pyramid decomposition helpers (invoked via stage names below) ---
def _pyr_parts(which, plan, cfg, imgs, dims):
    from popsift_tpu.ops.pyramid import (_octave0_level0, _sep_blur,
                                          _upsample2_axis)

    if which == "pyr_resample":
        return slope(lambda im: probe(_octave0_level0(im, plan.pyramid)),
                     imgs)
    if which == "pyr_upsample":
        return slope(lambda im: probe(_upsample2_axis(_upsample2_axis(
            im.astype(jnp.float32), 0), 1)), imgs)
    if which == "pyr_oct0":
        def f(im):
            lvl0 = _octave0_level0(im, plan.pyramid)
            acc = jnp.float32(0)
            cur = lvl0
            for lvl in range(1, cfg.total_levels):
                cur = _sep_blur(cur, plan.pyramid.inc_kernels[lvl])
                acc = acc + jnp.sum(cur)
            return acc
        return slope(f, imgs)
    if which == "pyr_nostack":
        def f(im):
            lvl0 = _octave0_level0(im, plan.pyramid)
            acc = jnp.float32(0)
            prev_ds = None
            for octv, (oh, ow) in enumerate(dims):
                cur = lvl0 if octv == 0 else prev_ds[0::2, 0::2][:oh, :ow]
                levels = [cur]
                for lvl in range(1, cfg.total_levels):
                    levels.append(_sep_blur(levels[-1],
                                            plan.pyramid.inc_kernels[lvl]))
                acc = acc + sum(jnp.sum(l) for l in levels)
                prev_ds = levels[cfg.total_levels - 3]
            return acc
        return slope(f, imgs)
    raise SystemExit(which)


if __name__ == "__main__":
    main()
