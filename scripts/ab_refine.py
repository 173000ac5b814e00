"""Same-session A/B of the fused collect+refine Pallas kernel vs the
XLA patch-refine path (round-5 verdict item 2), plus an in-session HBM
bandwidth probe (the fractional-slice ceiling that bounds the canvas
traffic — matmul peak alone does not predict it).

Both variants are built in ONE process (POPSIFT_TPU_FUSED_REFINE is
read at trace time) and timed interleaved with the bench's k-chain
slope method, so tunnel drift hits both equally.

    PYTHONPATH=/root/.axon_site:. timeout 2400 python scripts/ab_refine.py [B]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax            # noqa: E402
import jax.numpy as jnp   # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcc")

from bench import make_frame  # noqa: E402
from popsift_tpu.config import SiftConfig  # noqa: E402
from popsift_tpu.pipeline import build_extract_plan, extract  # noqa: E402

CAPS = (256, 256, 256, 3072, 512, 256, 256, 256, 256)


def hbm_bandwidth_gbs(mb=512, reps=5):
    """Streaming HBM bandwidth: y = x * a + b over a 512 MB f32 array
    (read + write = 2x traffic). The tunneled slice's effective
    bandwidth varies with the allocation like the matmul peak does."""
    n = mb * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def stream(x, s):
        y = x * jnp.float32(1.0000001) + s
        return y, jnp.sum(y[:128])

    (y, s) = stream(x, jnp.float32(0))
    jax.block_until_ready(y)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y, s = stream(x, s)
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    return 2 * mb / 1024 / min(ts)


def scan_fps(plan, B, imgs):
    def prog(batch, s):
        def body(c, im):
            out = extract(im, plan)
            return c + jnp.sum(out.desc.astype(jnp.float32)) \
                + jnp.sum(out.x) + s * 0, None
        c, _ = jax.lax.scan(body, jnp.float32(0), batch)
        return c

    jfn = jax.jit(prog)
    t0 = time.perf_counter()
    float(np.asarray(jfn(imgs, jnp.float32(0))))
    compile_s = time.perf_counter() - t0

    def run(k):
        s = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(k):
            s = jfn(imgs, s + i)
        float(np.asarray(s))
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(3))
    t4 = min(run(4) for _ in range(3))
    ms = (t4 - t1) / 3 / B * 1000
    return ms, compile_s


def main(B=16):
    h, w = 1080, 1920
    cfg = SiftConfig(extrema_capacity=8192)
    plan = build_extract_plan(cfg, h, w, octave_caps=CAPS)
    imgs = jnp.asarray(np.stack([make_frame(h, w, seed=i % 4)
                                 for i in range(B)]))

    bw = hbm_bandwidth_gbs()

    progs = {}
    for name, env in (("fused_refine", "1"), ("xla_refine", "0")):
        os.environ["POPSIFT_TPU_FUSED_REFINE"] = env
        ms, compile_s = scan_fps(plan, B, imgs)
        progs[name] = {"ms_per_frame": round(ms, 2),
                       "fps": round(1000 / ms, 2),
                       "compile_s": round(compile_s, 1)}
        # second interleaved rep to cancel drift
    for name, env in (("fused_refine", "1"), ("xla_refine", "0")):
        os.environ["POPSIFT_TPU_FUSED_REFINE"] = env
        ms, _ = scan_fps(plan, B, imgs)
        progs[name]["ms_per_frame_rep2"] = round(ms, 2)

    print(json.dumps({"metric": "refine_ab_1080p",
                      "hbm_stream_gbs": round(bw, 1),
                      "device": str(jax.devices()[0]),
                      **progs}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
