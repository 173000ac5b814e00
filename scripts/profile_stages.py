"""Stage-by-stage timing of the extraction pipeline on the current device.

Times each phase as its own jitted program (compile excluded) so we know
where the frame budget goes before optimizing. Usage:

    python scripts/profile_stages.py [--height 1080 --width 1920]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--capacity", type=int, default=3072)
    ap.add_argument("--desc-mode", default="loop")
    args = ap.parse_args()

    from popsift_tpu.config import SiftConfig
    from popsift_tpu.ops.descriptors import (
        compute_descriptors, make_descriptor_jobs, normalize_descriptors)
    from popsift_tpu.ops.extrema import detect_extrema
    from popsift_tpu.ops.orientation import assign_orientations
    from popsift_tpu.ops.pyramid import build_pyramid
    from popsift_tpu.pipeline import build_extract_plan, make_extract_fn

    import sys
    sys.path.insert(0, ".")
    from bench import make_frame

    h, w = args.height, args.width
    img = make_frame(h, w)
    cfg = SiftConfig(extrema_capacity=args.capacity, desc_mode=args.desc_mode)
    plan = build_extract_plan(cfg, h, w)
    print(f"device={jax.devices()[0]}  dims={plan.pyramid.dims}")
    print(f"ext_caps={plan.ext_caps}")

    # full pipeline
    fn = make_extract_fn(plan)
    t_all = timeit(fn, img)
    print(f"full pipeline        {t_all:8.2f} ms  ({1000.0 / t_all:.2f} fps)")

    # pyramid
    pyr_fn = jax.jit(lambda x: build_pyramid(x, plan.pyramid))
    t_pyr = timeit(pyr_fn, img)
    print(f"pyramid              {t_pyr:8.2f} ms")
    blurs, dogs = jax.block_until_ready(pyr_fn(img))

    # extrema (all octaves)
    def ext_fn(dogs):
        return tuple(
            detect_extrema(dog, cfg, plan.ext_caps[o], dim[1], dim[0])
            for o, (dog, dim) in enumerate(zip(dogs, plan.pyramid.dims)))
    ext_jit = jax.jit(ext_fn)
    t_ext = timeit(ext_jit, dogs)
    print(f"extrema              {t_ext:8.2f} ms")
    exts = jax.block_until_ready(ext_jit(dogs))

    # orientation (all octaves)
    def ori_fn(blurs, exts):
        return tuple(assign_orientations(b, e, cfg)
                     for b, e in zip(blurs, exts))
    ori_jit = jax.jit(ori_fn)
    t_ori = timeit(ori_jit, blurs, exts)
    print(f"orientation          {t_ori:8.2f} ms")
    oris = jax.block_until_ready(ori_jit(blurs, exts))

    # descriptor jobs + descriptors (all octaves)
    def desc_fn(blurs, exts, oris):
        outs = []
        for o, (b, e, r) in enumerate(zip(blurs, exts, oris)):
            jobs = make_descriptor_jobs(e, r, plan.job_caps[o])
            raw = compute_descriptors(b, jobs, cfg)
            outs.append(normalize_descriptors(raw, cfg))
        return tuple(outs)
    desc_jit = jax.jit(desc_fn)
    t_desc = timeit(desc_jit, blurs, exts, oris)
    print(f"descriptors          {t_desc:8.2f} ms")

    total = t_pyr + t_ext + t_ori + t_desc
    print(f"sum of stages        {total:8.2f} ms")
    n = sum(int(np.asarray(e.count)) for e in exts)
    print(f"extrema found: {n}")


if __name__ == "__main__":
    main()
