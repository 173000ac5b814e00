"""Localize where frame-batched extraction loses time on hardware.

BENCH_r03 measured extract_batch at ~36 fps vs 72 fps for the
single-frame scan — the opposite of the op-count proxy's prediction
(BASELINE.md). This script times CUMULATIVE prefixes of the batched
pipeline at a given F (via the ``_stage`` diagnostics hook in
``extract_batch``) plus the full program, for both front modes
("vmap" and "unroll"); consecutive differences localize the
regression to a phase. Timing uses the chained-scalar slope
methodology (bench.py::_timed): k dispatches chained through a
checksum so the tunnel cannot short-circuit and RTT cancels.

Run on the real TPU (ONE process at a time):
    PYTHONPATH=/root/.axon_site:. timeout 3600 \
        python scripts/stage_slope_batch.py [F] [--modes vmap,unroll]

TRUST MODEL (round-4 verdict weak #5): every prefix checksums all
carried leaves, but XLA still DCEs *differently per prefix* — a later
prefix can compile to LESS work than an earlier one (e.g. the refine
prefix materializes candidate patches that the full program's fused
consumer never stores, so "refine minus cands" can come out negative).
Prefix deltas are therefore LOWER-CONFIDENCE than either (a) the full
program's time or (b) an XProf trace (scripts/capture_trace.py +
analyze_trace.py), which is the source of truth for per-stage cost.
Treat deltas below the ~1 ms RTT-variance floor as noise.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax            # noqa: E402
import jax.numpy as jnp   # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcc")

from bench import make_frame  # noqa: E402
from popsift_tpu.config import SiftConfig  # noqa: E402
from popsift_tpu.pipeline import (build_extract_plan, extract,  # noqa: E402
                                  extract_batch, make_extract_fn)

CAPS = (256, 256, 256, 3072, 512, 256, 256, 256, 256)
STAGES = ("front", "cands", "refine", "grid", "orient", None)


def probe(tree):
    ls = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(jnp.asarray(l).astype(jnp.float32)) for l in ls)


def timed_ms(fn, x, k=4, reps=3):
    """Per-dispatch device ms via the k-chain slope; fn(x, s)->scalar."""
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    float(np.asarray(jfn(x, jnp.float32(0.0))))
    t_compile = time.perf_counter() - t0

    def run(n, seed):
        s = jnp.float32(seed)
        t0 = time.perf_counter()
        for _ in range(n):
            s = jfn(x, s)
        float(np.asarray(s))
        return time.perf_counter() - t0

    t1 = min(run(1, 1 + i) for i in range(reps))
    tk = min(run(k, 100 + i) for i in range(reps))
    dt = tk - t1
    if dt <= max(1e-4, 0.02 * tk):
        return float("nan"), t_compile
    return dt / (k - 1) * 1e3, t_compile


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    F = int(args[0]) if args else 8
    modes = ["vmap", "unroll"]
    for a in sys.argv[1:]:
        if a.startswith("--modes"):
            modes = a.split("=", 1)[1].split(",")
    smoke = "--smoke" in sys.argv
    h, w = (96, 128) if smoke else (1080, 1920)

    cfg = SiftConfig(extrema_capacity=8192)
    caps = None if smoke else CAPS
    plan = build_extract_plan(cfg, h, w, octave_caps=caps)
    frames = np.stack([make_frame(h, w, seed=i % 4) for i in range(F)])
    batch = jnp.asarray(frames)
    print(f"device {jax.devices()[0]}  frame {h}x{w}  F={F}", flush=True)

    # single-frame reference: per-frame full-extract time
    def single(img, s):
        return s + probe(extract(img, plan))
    ms1, _ = timed_ms(single, batch[0])
    print(json.dumps({"stage": "single_full", "ms_per_frame": round(ms1, 2)}),
          flush=True)

    if "--single" in sys.argv:
        # re-baseline the SINGLE-frame per-stage table with the same
        # cumulative-prefix methodology (round-3 verdict weak item 2:
        # the round-2 stage table no longer describes the pipeline)
        prev = 0.0
        for st in STAGES:
            def fn(x, s, st=st):
                return s + probe(extract(x, plan, _stage=st))
            try:
                ms, tc = timed_ms(fn, batch[0])
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"mode": "single", "stage": st or "full",
                                  "error": repr(e)[:200]}), flush=True)
                continue
            print(json.dumps({
                "mode": "single", "stage": st or "full",
                "cum_ms": round(ms, 2),
                "delta_ms": round(ms - prev, 2),
                "compile_s": round(tc, 1)}), flush=True)
            prev = ms
        return

    for mode in modes:
        prev = 0.0
        for st in STAGES:
            def fn(x, s, st=st, mode=mode):
                return s + probe(extract_batch(x, plan, front_mode=mode,
                                               _stage=st))
            try:
                ms, tc = timed_ms(fn, batch)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(json.dumps({"mode": mode, "stage": st or "full",
                                  "error": repr(e)[:200]}), flush=True)
                continue
            name = st or "full"
            print(json.dumps({
                "mode": mode, "stage": name,
                "cum_ms": round(ms, 2),
                "delta_ms": round(ms - prev, 2),
                "ms_per_frame": round(ms / F, 2),
                "compile_s": round(tc, 1)}), flush=True)
            prev = ms

    # count invariant for the unroll mode (must match single-frame)
    out1 = make_extract_fn(plan)(batch[0])
    for mode in modes:
        ob = jax.jit(lambda x, m=mode: extract_batch(x, plan,
                                                     front_mode=m))(batch)
        ok = (int(np.asarray(ob.n_keypoints)[0]) == int(out1.n_keypoints)
              and int(np.asarray(ob.n_descriptors)[0])
              == int(out1.n_descriptors))
        print(json.dumps({"mode": mode, "counts_match_single": ok,
                          "kp": int(np.asarray(ob.n_keypoints)[0]),
                          "desc": int(np.asarray(ob.n_descriptors)[0])}),
              flush=True)


if __name__ == "__main__":
    main()
