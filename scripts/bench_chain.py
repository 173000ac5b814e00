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


def run_variant(name, plan, batch, use_pallas, B, R=3):
    """Steady-state per-frame time via the SLOPE between a 1x and an Rx
    scan over the same frames inside single dispatches: per-dispatch
    overhead (tunnel RTT, enqueue, fetch) cancels in the difference.
    Every timing fetches the checksum to host (device_get) — over the
    tunnel, ``block_until_ready`` on an enqueued execution has been
    observed to return before the device finishes (round-3 finding:
    0.02 ms/frame "measured" for the XLA pyramid), so only a real
    transfer is a trustworthy barrier."""
    def scan(xs):
        def body(_, img):
            blurs, dogs = build_pyramid(img, plan, use_pallas=use_pallas)
            s = sum(jnp.sum(b) for b in blurs) + sum(jnp.sum(d)
                                                     for d in dogs)
            return 0, s
        return jax.lax.scan(body, 0, xs)[1]

    fn = jax.jit(scan)
    long_batch = jnp.concatenate([batch] * R)

    t0 = time.perf_counter()
    r = np.asarray(fn(batch))
    t_first = time.perf_counter() - t0

    def timed(xs, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(xs))
            best = min(best, time.perf_counter() - t0)
        return best

    np.asarray(fn(long_batch))           # compile the Rx program
    t_short = timed(batch)
    t_long = timed(long_batch)
    per_frame = (t_long - t_short) / ((R - 1) * B) * 1e3
    print(f"{name:14s} first-call {t_first:7.1f} s   "
          f"steady {per_frame:6.2f} ms/frame   "
          f"(1x {t_short * 1e3:.1f} ms, {R}x {t_long * 1e3:.1f} ms)   "
          f"checksum {float(r[0]):.6g}", flush=True)
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
