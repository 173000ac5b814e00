"""Descriptor-kernel microbenchmark: is the DMA variant DMA-bound or
math-bound? (round-5; the desc kernels are the largest Pallas cost in
the 1080p frame, ~2.6 ms).

Arms (same jobs, same math):
  dma        — production kernel: double-buffered [WR, 256] windows
  dma_fixed  — same kernel but every job DMAs the SAME window (y0=x0=0):
               maximal HBM locality; if this is much faster, the kernel
               is DMA/locality-bound, not math-bound
  patch      — pre-extracted [F, P, PL] patches (XLA gather) + pure-math
               kernel; patch extraction timed separately

    PYTHONPATH=/root/.axon_site:. timeout 1800 python scripts/desc_micro.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                # noqa: E402
import jax.numpy as jnp   # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcc")

from popsift_tpu.ops.descriptors import DescriptorJobs  # noqa: E402
from popsift_tpu.ops.pallas.desc import (  # noqa: E402
    _WC, _desc_dma_call, descriptor_loop_pallas_dma)


def timeit(fn, reps=30):
    jax.block_until_ready(fn())
    # chain through nothing (each call independent); time a burst
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    t1 = min((time.perf_counter() - t0) / reps, 1e9)
    return t1


def main(F=3840, radius=51):
    L, Hb, Wb = 6, 2224, 4096
    H, W = 2160, 3840
    rng = np.random.default_rng(0)
    blur = jnp.asarray(rng.normal(size=(L, Hb, Wb)).astype(np.float32))
    P = min(-(-(2 * radius + 2) // 8) * 8, 104)
    PL = 128
    WR = P + 8

    jobs = DescriptorJobs(
        x=jnp.asarray(rng.uniform(radius + 2, W - radius - 2, F)
                      .astype(np.float32)),
        y=jnp.asarray(rng.uniform(radius + 2, H - radius - 2, F)
                      .astype(np.float32)),
        sigma=jnp.asarray(rng.uniform(2.0, 6.0, F).astype(np.float32)),
        level=jnp.asarray(rng.integers(1, L - 1, F, dtype=np.int32)),
        ang=jnp.asarray(rng.uniform(-3, 3, F).astype(np.float32)),
        kp_index=jnp.arange(F, dtype=jnp.int32),
        valid=jnp.ones((F,), bool),
        count=jnp.int32(F))

    res = {"F": F, "P": P}

    f_dma = jax.jit(lambda: descriptor_loop_pallas_dma(
        blur, jobs, radius, H, W))
    res["dma_ms"] = round(timeit(f_dma) * 1e3, 3)

    # fixed-window arm: all jobs read window (lv, 0, 0) — same DMA
    # volume, perfect locality; params otherwise identical
    xr = jnp.round(jobs.x).astype(jnp.int32)
    yr = jnp.round(jobs.y).astype(jnp.int32)
    y0 = jnp.clip(yr - radius, 0, Hb - WR)
    x0 = jnp.clip(xr - radius, 0, Wb - _WC)
    lv = jnp.clip(jobs.level, 0, L - 1).astype(jnp.int32)
    params = jnp.stack([
        jobs.x, jobs.y, jobs.sigma, jobs.ang,
        y0.astype(jnp.float32), x0.astype(jnp.float32),
        jobs.valid.astype(jnp.float32), jnp.zeros_like(jobs.x)], axis=1)
    nv = jnp.asarray([F], jnp.int32)
    zero = jnp.zeros((F,), jnp.int32)

    ones = jnp.ones_like(jobs.x)
    zerosf = jnp.zeros_like(jobs.x)
    params = jnp.concatenate(
        [params, jnp.stack([ones, ones * (H - 2.0), ones * (W - 2.0),
                            zerosf, zerosf, zerosf, zerosf, zerosf],
                           axis=1)], axis=1)
    f_fixed = jax.jit(lambda: _desc_dma_call(
        nv, lv, zero, zero, zero, params, blur, P, PL, WR=WR))
    res["dma_fixed_window_ms"] = round(timeit(f_fixed) * 1e3, 3)

    print(json.dumps({"metric": "desc_kernel_micro",
                      "device": str(jax.devices()[0]), **res}))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
