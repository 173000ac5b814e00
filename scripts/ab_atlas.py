"""On-chip parity + same-session A/B of the small-octave atlas path
(octaves >= 2 share one stacked gauss canvas; ori/desc kernels launch
once with per-job segment geometry — round 5, pyramid.gauss_atlas_layout).

Parity: extract() with POPSIFT_TPU_ATLAS=1 vs =0 on the 1080p bench
frame must agree BIT FOR BIT (the seg form keeps all kernel math
octave-local). Then both variants are timed interleaved.

    PYTHONPATH=/root/.axon_site:. timeout 3000 python scripts/ab_atlas.py [B]
"""

import json
import os
import sys

sys.path.insert(0, ".")

import jax            # noqa: E402
import jax.numpy as jnp   # noqa: E402
import numpy as np        # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcc")

from bench import make_frame  # noqa: E402
from popsift_tpu.config import SiftConfig  # noqa: E402
from popsift_tpu.pipeline import build_extract_plan, extract  # noqa: E402
from ab_refine import scan_fps  # noqa: E402

CAPS = (256, 256, 256, 3072, 512, 256, 256, 256, 256)


def main(B=16):
    h, w = 1080, 1920
    cfg = SiftConfig(extrema_capacity=8192)
    plan = build_extract_plan(cfg, h, w, octave_caps=CAPS)
    img = jnp.asarray(make_frame(h, w, seed=0))
    imgs = jnp.asarray(np.stack([make_frame(h, w, seed=i % 4)
                                 for i in range(B)]))

    # --- bit parity on one frame -------------------------------------
    outs = {}
    for env in ("1", "0"):
        os.environ["POPSIFT_TPU_ATLAS"] = env
        outs[env] = jax.jit(lambda im: extract(im, plan))(img)
        jax.block_until_ready(outs[env])
    fields = {}
    exact = True
    for name in outs["1"]._fields:
        a = np.asarray(getattr(outs["1"], name))
        b = np.asarray(getattr(outs["0"], name))
        eq = np.array_equal(a, b)
        exact &= eq
        if not eq:
            fields[name] = float(np.max(np.abs(
                a.astype(np.float64) - b.astype(np.float64))))
    parity = {"bit_exact": bool(exact),
              "n_keypoints": int(outs["1"].n_keypoints),
              "n_descriptors": int(outs["1"].n_descriptors)}
    if fields:
        parity["max_diffs"] = fields

    # --- interleaved timing ------------------------------------------
    progs = {}
    arms = (("atlas", "1"), ("per_octave", "0"))
    for rep in range(2):
        for name, env in arms:
            os.environ["POPSIFT_TPU_ATLAS"] = env
            ms, compile_s = scan_fps(plan, B, imgs)
            d = progs.setdefault(name, {})
            d[f"ms_per_frame_rep{rep + 1}"] = round(ms, 2)
            if rep == 0:
                d["fps"] = round(1000 / ms, 2)
                d["compile_s"] = round(compile_s, 1)

    print(json.dumps({"metric": "atlas_ab_1080p", "parity": parity,
                      "device": str(jax.devices()[0]), **progs}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
