"""Same-session A/B of the canvas-direct pyramid front (canvas-only
per-level storage, round-5 bandwidth fix) vs the assemble path
(standalone levels + canvas copies). Both variants are built in ONE
process (POPSIFT_TPU_CANVAS_DIRECT is read at trace time) and timed
interleaved so tunnel drift hits both arms equally.

    PYTHONPATH=/root/.axon_site:. timeout 2400 python scripts/ab_canvas.py [B]
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
from popsift_tpu.pipeline import build_extract_plan  # noqa: E402
from ab_refine import scan_fps  # noqa: E402

CAPS = (256, 256, 256, 3072, 512, 256, 256, 256, 256)


def main(B=16):
    h, w = 1080, 1920
    cfg = SiftConfig(extrema_capacity=8192)
    plan = build_extract_plan(cfg, h, w, octave_caps=CAPS)
    imgs = jnp.asarray(np.stack([make_frame(h, w, seed=i % 4)
                                 for i in range(B)]))

    progs = {}
    arms = (("canvas_direct", "1"), ("assemble", "0"))
    for name, env in arms:
        os.environ["POPSIFT_TPU_CANVAS_DIRECT"] = env
        ms, compile_s = scan_fps(plan, B, imgs)
        progs[name] = {"ms_per_frame": round(ms, 2),
                       "fps": round(1000 / ms, 2),
                       "compile_s": round(compile_s, 1)}
    for name, env in arms:
        os.environ["POPSIFT_TPU_CANVAS_DIRECT"] = env
        ms, _ = scan_fps(plan, B, imgs)
        progs[name]["ms_per_frame_rep2"] = round(ms, 2)

    print(json.dumps({"metric": "canvas_direct_ab_1080p",
                      "device": str(jax.devices()[0]), **progs}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
