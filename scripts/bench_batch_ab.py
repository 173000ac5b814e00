"""A/B bench: single-frame scan extraction vs frame-batched extract_batch.

Usage:  PYTHONPATH=/root/.axon_site python scripts/bench_batch_ab.py [F ...]

For each requested batch size F, runs extract_batch over chunks of F
frames via lax.scan so every variant processes the same 16 frames per
dispatch, checks the per-frame keypoint/descriptor counts against the
single-frame path (the 2110/2505 bench invariant), and prints one JSON
line per variant. Run on the real TPU; one process covers all variants
(tunnel-friendly).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from importlib import import_module

bench = import_module("bench")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcc")
    import jax.numpy as jnp
    from popsift_tpu.config import SiftConfig
    from popsift_tpu.pipeline import (build_extract_plan, extract,
                                      extract_batch)

    Fs = [int(a) for a in sys.argv[1:]] or [4]
    h, w = 1080, 1920
    frames = [bench.make_frame(h, w, seed=i) for i in range(4)]

    cfg = SiftConfig(extrema_capacity=8192)
    plan0 = build_extract_plan(cfg, h, w)
    from popsift_tpu.pipeline import make_extract_fn
    out0 = make_extract_fn(plan0)(frames[0])
    cand = __import__("numpy").asarray(out0.octave_candidates)
    caps = tuple(int(max(256, -(-int(c) * 3 // 2) // 128 * 128 + 128))
                 for c in cand)
    plan = build_extract_plan(cfg, h, w, octave_caps=caps)
    print(json.dumps({"calibration": {
        "keypoints": int(out0.n_keypoints),
        "descriptors": int(out0.n_descriptors)}}), flush=True)

    B = 16
    batch = jnp.asarray(__import__("numpy").stack(
        [frames[i % len(frames)] for i in range(B)]))

    def timed(fn, x):
        r = fn(x)
        jax.block_until_ready(r)
        iters = 3
        t0 = time.perf_counter()
        rs = [fn(x) for _ in range(iters)]
        jax.block_until_ready(rs)
        dt = time.perf_counter() - t0
        return iters * B / dt, rs[0]

    # baseline: single-frame scan
    def scan_single(xs):
        def body(_, img):
            out = extract(img, plan)
            cs = (jnp.sum(out.desc) + jnp.sum(out.x) + jnp.sum(out.y)
                  + jnp.sum(out.sigma) + jnp.sum(out.ori)
                  + jnp.sum(out.desc_kp.astype(jnp.float32)))
            return 0, (out.n_keypoints, out.n_descriptors, cs)
        return jax.lax.scan(body, 0, xs)[1]

    fps1, r1 = timed(jax.jit(scan_single), batch)
    kp1 = [int(k) for k in r1[0]]
    print(json.dumps({"variant": "single_scan16", "fps": round(fps1, 2),
                      "kp": kp1[:4], "desc": int(r1[1][0])}), flush=True)

    for F in Fs:
        assert B % F == 0
        chunks = batch.reshape(B // F, F, h, w)

        def scan_batched(xs):
            def body(_, imgs):
                out = extract_batch(imgs, plan)
                cs = (jnp.sum(out.desc) + jnp.sum(out.x) + jnp.sum(out.y)
                      + jnp.sum(out.sigma) + jnp.sum(out.ori)
                      + jnp.sum(out.desc_kp.astype(jnp.float32)))
                return 0, (out.n_keypoints, out.n_descriptors, cs)
            return jax.lax.scan(body, 0, xs)[1]

        try:
            fpsF, rF = timed(jax.jit(scan_batched), chunks)
        except Exception as e:  # OOM or compile failure: report and go on
            print(json.dumps({"variant": f"batched_F{F}",
                              "error": repr(e)[:300]}), flush=True)
            continue
        kpF = [int(k) for k in __import__("numpy").asarray(
            rF[0]).reshape(-1)]
        ok = kpF == kp1
        print(json.dumps({"variant": f"batched_F{F}",
                          "fps": round(fpsF, 2),
                          "kp_match_single": ok,
                          "kp": kpF[:4],
                          "desc": int(__import__("numpy").asarray(
                              rF[1]).reshape(-1)[0])}), flush=True)


if __name__ == "__main__":
    main()
