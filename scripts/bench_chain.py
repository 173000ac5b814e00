"""A/B the fused octave-chain pyramid against the XLA shift-add chain.

For each variant (xla, chain-g3, chain-full, per-level pallas) on a
1080p frame: wall-clock of the FIRST jitted call (dominated by Mosaic /
XLA compile — the chain kernel's known risk, round-2 measured >25 min
for the concat-based 5-level fusion) and steady-state per-frame device
time via a lax.scan over B frames per dispatch (tunnel RTT amortized,
full-field checksums against DCE).

Run on the real TPU:
    PYTHONPATH=/root/.axon_site:. python scripts/bench_chain.py [B]

Variants that fail (compile timeout is enforced by running under
`timeout`) simply report their first-call time as the budget consumed.
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
from popsift_tpu.ops.pyramid import build_pyramid  # noqa: E402
from popsift_tpu.pipeline import build_extract_plan  # noqa: E402


def run_variant(name, plan, batch, use_pallas, B):
    def scan(xs):
        def body(_, img):
            blurs, dogs = build_pyramid(img, plan, use_pallas=use_pallas)
            s = sum(jnp.sum(b) for b in blurs) + sum(jnp.sum(d)
                                                     for d in dogs)
            return 0, s
        return jax.lax.scan(body, 0, xs)[1]

    fn = jax.jit(scan)
    t0 = time.perf_counter()
    r = fn(batch)
    jax.block_until_ready(r)
    t_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    iters = 3
    rs = [fn(batch) for _ in range(iters)]
    jax.block_until_ready(rs)
    per_frame = (time.perf_counter() - t0) / (iters * B) * 1e3
    print(f"{name:14s} first-call {t_first:7.1f} s   "
          f"steady {per_frame:6.2f} ms/frame   checksum "
          f"{float(np.asarray(r[0])):.6g}", flush=True)
    return per_frame


def main():
    smoke = "--smoke" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else (2 if smoke else 8)
    h, w = (96, 128) if smoke else (1080, 1920)
    cfg = SiftConfig()
    plan = build_extract_plan(cfg, h, w).pyramid
    frames = np.stack([make_frame(h, w, seed=i) for i in range(B)])
    batch = jnp.asarray(frames)
    print(f"device {jax.devices()[0]}  frame {h}x{w}  B={B}", flush=True)

    run_variant("xla", plan, batch, False, B)
    if not smoke:   # pallas variants need the real TPU (no interpret)
        run_variant("chain-g3", plan, batch, "chain", B)
        run_variant("pallas-level", plan, batch, True, B)


if __name__ == "__main__":
    main()
