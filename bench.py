"""Benchmark: 1080p SIFT extraction throughput per chip.

Prints ONE JSON line:
  {"metric": "sift_1080p_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 20.3}

Baseline: the reference's best published end-to-end number, 20.3 fps on a
GTX 980 Ti with the notile descriptor variant
(/root/reference/src/popsift/s_desc_notile.cu:18-22, BASELINE.md).

Methodology: a synthetic 1920x1080 frame with realistic keypoint density;
the pipeline capacity is sized from a calibration pass (actual extrema
count + 30% headroom) the way a production deployment would pin it, then
throughput is measured over pipelined async dispatches (JAX dispatch
overlaps host->device upload with device compute, the same overlap the
reference gets from its 2-stage host pipeline, popsift.cpp:171-213).
"""

import json
import sys
import time

import numpy as np


def make_frame(h=1080, w=1920, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (96.0 + 40.0 * np.sin(xx / 9.0) * np.cos(yy / 11.0)
           + 30.0 * np.sin(xx / 37.0 + yy / 23.0))
    for _ in range(64):
        cx, cy = rng.uniform(0.05, 0.95) * w, rng.uniform(0.05, 0.95) * h
        s = rng.uniform(1.5, 24.0)
        a = rng.uniform(40, 120) * rng.choice([-1.0, 1.0])
        img += a * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
    img += rng.normal(0, 2.0, size=(h, w)).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    import jax
    from popsift_tpu.config import SiftConfig
    from popsift_tpu.pipeline import build_extract_plan, make_extract_fn

    h, w = 1080, 1920
    frames = [make_frame(h, w, seed=i) for i in range(4)]

    # calibration: modest capacity to learn the actual extrema count
    cfg0 = SiftConfig(extrema_capacity=8192)
    plan0 = build_extract_plan(cfg0, h, w)
    fn0 = make_extract_fn(plan0)
    out = fn0(frames[0])
    n_kp = int(out.n_keypoints)
    n_desc = int(out.n_descriptors)

    cap = max(512, int((n_kp * 1.3) // 512 + 1) * 512)
    cfg = SiftConfig(extrema_capacity=cap)
    fn = make_extract_fn(build_extract_plan(cfg, h, w))
    r = fn(frames[0])
    jax.block_until_ready(r)

    # timed: pipelined async dispatch over distinct frames
    iters = 20
    t0 = time.perf_counter()
    results = []
    for i in range(iters):
        results.append(fn(frames[i % len(frames)]))
    jax.block_until_ready(results)
    dt = time.perf_counter() - t0
    fps = iters / dt

    print(json.dumps({
        "metric": "sift_1080p_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.3, 3),
        "detail": {"keypoints": n_kp, "descriptors": n_desc,
                   "capacity_per_octave": cap,
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    sys.exit(main())
