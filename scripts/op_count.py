"""HLO op-count proxy for the frame-batching win.

The 1080p pipeline is op-dispatch-overhead-bound (BASELINE.md roofline:
no stage is HBM- or MXU-bound; ~20 ms/frame spread over thousands of
small fused ops). extract_batch computes F frames in ONE program whose
op count grows far slower than F, so per-frame fixed overhead divides
by ~F. This script counts lowered StableHLO ops for extract vs
extract_batch at 1080p (trace-only, runs on CPU in seconds - no
backend compile), giving a hardware-independent view of the win.

    PYTHONPATH=. python scripts/op_count.py [F ...]
"""

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from popsift_tpu.config import SiftConfig
from popsift_tpu.pipeline import build_extract_plan, extract, extract_batch


def n_ops(lowered) -> int:
    txt = lowered.as_text()
    # count StableHLO operation lines (assignments + returns), minus
    # pure metadata
    return len(re.findall(r"^\s+%?\w[\w.]* =", txt, re.M))


def main():
    Fs = [int(a) for a in sys.argv[1:]] or [4, 8]
    h, w = 1080, 1920
    cfg = SiftConfig(extrema_capacity=8192)
    plan = build_extract_plan(cfg, h, w)

    img = jnp.zeros((h, w), jnp.uint8)
    single = jax.jit(lambda x: extract(x, plan)).lower(img)
    n1 = n_ops(single)
    print(f"extract        1080p: {n1} StableHLO ops "
          f"({n1} ops/frame)")
    for F in Fs:
        imgs = jnp.zeros((F, h, w), jnp.uint8)
        b = jax.jit(lambda x: extract_batch(x, plan)).lower(imgs)
        nb = n_ops(b)
        print(f"extract_batch F={F}: {nb} StableHLO ops "
              f"({nb / F:.0f} ops/frame, {n1 / (nb / F):.2f}x fewer "
              f"than single)")


if __name__ == "__main__":
    main()
