"""XProf trace of the frame-batched 1080p extraction (extract_batch).

Companion to capture_trace.py for the batched program: localizes the
front/orient regressions the stage-slope run can only bracket.

    PYTHONPATH=/root/.axon_site:. python scripts/capture_trace_batch.py \
        [--out /tmp/xprof_batch] [--F 8] [--mode unroll]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/xprof_batch")
    p.add_argument("--F", type=int, default=8)
    p.add_argument("--mode", default="unroll")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcc")
    from bench import make_frame
    from popsift_tpu.config import SiftConfig
    from popsift_tpu.pipeline import build_extract_plan, extract_batch
    from popsift_tpu.utils.profiling import device_trace

    h, w = 1080, 1920
    cfg = SiftConfig(extrema_capacity=8192)
    caps = (256, 256, 256, 3072, 512, 256, 256, 256, 256)
    plan = build_extract_plan(cfg, h, w, octave_caps=caps)
    batch = jnp.asarray(np.stack(
        [make_frame(h, w, seed=i % 4) for i in range(args.F)]))

    def fn(xs):
        out = extract_batch(xs, plan, front_mode=args.mode)
        return jnp.sum(out.desc) + jnp.sum(
            out.n_keypoints.astype(jnp.float32))

    jfn = jax.jit(fn)
    np.asarray(jfn(batch))          # compile outside the trace
    with device_trace(args.out):
        np.asarray(jfn(batch))
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
