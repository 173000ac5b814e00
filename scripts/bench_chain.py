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


def run_variant(name, plan, batch, use_pallas, B, k=4, reps=3):
    """Steady-state per-frame time via the slope across k dispatches
    CHAINED through a scalar data dependency (same methodology as
    bench.py::_timed): each dispatch consumes the previous checksum, so
    the device must execute every dispatch (no two are identical, the
    tunnel cannot short-circuit) and the final host fetch is a real
    barrier. Per-dispatch overhead (tunnel RTT, enqueue, fetch) cancels
    in t(k) - t(1)."""
    def scan(xs, s0):
        def body(c, img):
            blurs, dogs = build_pyramid(img, plan, use_pallas=use_pallas)
            s = sum(jnp.sum(b) for b in blurs) + sum(jnp.sum(d)
                                                     for d in dogs)
            return c + s, ()
        return jax.lax.scan(body, s0, xs)[0]

    fn = jax.jit(scan)

    t0 = time.perf_counter()
    r = float(np.asarray(fn(batch, jnp.float32(0.0))))
    t_first = time.perf_counter() - t0

    def run(n, seed):
        s = jnp.float32(seed)
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(batch, s)
        float(np.asarray(s))
        return time.perf_counter() - t0

    t1 = min(run(1, 1 + i) for i in range(reps))
    tk = min(run(k, 100 + i) for i in range(reps))
    dt = tk - t1
    # guard: a non-positive or sub-jitter slope is noise/short-circuit,
    # not a real steady-state number — report raw times as untrusted.
    if dt <= max(1e-4, 0.02 * tk):
        print(f"{name:14s} first-call {t_first:7.1f} s   "
              f"steady UNTRUSTED (slope {dt * 1e3:.2f} ms <= jitter; "
              f"1x {t1 * 1e3:.1f} ms, {k}x {tk * 1e3:.1f} ms)   "
              f"checksum {r:.6g}", flush=True)
        return float("nan")
    per_frame = dt / ((k - 1) * B) * 1e3
    print(f"{name:14s} first-call {t_first:7.1f} s   "
          f"steady {per_frame:6.2f} ms/frame   "
          f"(1x {t1 * 1e3:.1f} ms, {k}x {tk * 1e3:.1f} ms)   "
          f"checksum {r:.6g}", flush=True)
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
