"""Large-scale incremental-SfM host-driver benchmark.

Round-3 verdict item 3: "scale the SfM host driver to 1000 cameras /
100k tracks ... profiled host vs device time reported". This script
reconstructs an n-camera synthetic forward-motion sequence (same
generator as tests/test_sfm_scale.py) and reports

  * per-phase wall time (initialize / registration loop / final BA),
  * the host/device split: every device entry point the driver uses
    (ransac_essential, recover_pose, refine_pose, triangulate_rows,
    ransac_pnp, bundle_adjust) is wrapped with a block-until-ready
    timer, so "device" is time spent inside jitted SfM kernels and
    "host" is the remaining Python bookkeeping,
  * the ATE gate (same 1%-of-trajectory bound as the tests).

Usage (CPU works; TPU via PYTHONPATH=/root/.axon_site):
    PYTHONPATH=. timeout 7200 python scripts/bench_sfm_scale.py [n_cams]

The reference has no SfM at all (features.cu ends at matching); this
benchmarks the north-star capability layer (BASELINE.json).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcc")


class DeviceTimer:
    """Wraps device entry points; accumulates block-until-ready time."""

    def __init__(self):
        self.total = 0.0
        self.calls = {}

    def wrap(self, mod, name):
        fn = getattr(mod, name)

        def timed(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            self.total += dt
            c, s = self.calls.get(name, (0, 0.0))
            self.calls[name] = (c + 1, s + dt)
            return out

        setattr(mod, name, timed)


def main():
    n_cams = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_pts = 6 * n_cams

    from test_sfm_scale import INTR, make_sequence, tracks_from_vis

    import popsift_tpu.sfm.incremental as inc
    from popsift_tpu.sfm.evaluate import ate_rmse

    timer = DeviceTimer()
    # the driver imports these names at module level — patch its copies
    for name in ("ransac_essential", "recover_pose", "refine_pose",
                 "triangulate_rows", "ransac_pnp_batch", "bundle_adjust"):
        timer.wrap(inc, name)

    rng = np.random.default_rng(17)
    t0 = time.perf_counter()
    # stretch the cloud with the 0.25/frame trajectory and pin per-
    # camera visibility to ~400 points (the default fixed [-4, 12] box
    # degenerates past ~200 cameras: late cameras only see a distant
    # cloud and registration collapses)
    X, cams, kps, vis = make_sequence(rng, n_pts=n_pts, n_cams=n_cams,
                                      noise=0.2,
                                      span=0.25 * n_cams + 10,
                                      vis_pts=min(400, n_pts))
    tracks = tracks_from_vis(kps, vis)
    t_gen = time.perf_counter() - t0
    n_obs = len(np.asarray(tracks.track_id))

    t0 = time.perf_counter()
    # windowed local BA after every batch + bounded-spacing global BA:
    # O(N*W) + O(N^2/ba_every) total BA work. Round-5 drift probes on
    # this sequence: ba_every=50 with NO local BA diverges past ~150
    # registrations (ATE 54 at 1000 cams); local BA alone cannot stop
    # global trajectory bending (ATE ~10); geometric global-BA spacing
    # folds the model once tail gaps exceed ~150. Frequent-enough
    # global BA keeps the model inside LM's quadratic basin.
    sfm = inc.IncrementalSfM(tracks, INTR, ba_every=25,
                             register_batch=8, local_ba_window=25)
    sfm.initialize()
    t_init = time.perf_counter() - t0

    t0 = time.perf_counter()
    while sfm.register_next() is not None:
        pass
    t_reg = time.perf_counter() - t0

    t0 = time.perf_counter()
    # final polish: robust BA -> cull gross points -> retriangulate
    # (plain global_ba leaves unculled outlier tracks dominating the
    # reported cost even when the ATE gate passes)
    costs = sfm.refine(rounds=3, ba_iters=12)
    t_ba = time.perf_counter() - t0

    reg = sorted(sfm.rec.registered)
    C_est = np.stack([-(sfm.rec.cam_R[i].T @ sfm.rec.cam_t[i])
                      for i in reg])
    C_gt = np.stack([-(cams[i][0].T @ cams[i][1]) for i in reg])
    rmse = ate_rmse(C_est, C_gt)
    extent = float(np.linalg.norm(C_gt.max(0) - C_gt.min(0)))

    wall = t_init + t_reg + t_ba
    print(json.dumps({
        "n_cams": n_cams,
        "n_tracks": int(tracks.n_tracks),
        "n_obs": n_obs,
        "registered": len(reg),
        "ate_rmse": round(float(rmse), 4),
        "trajectory_extent": round(extent, 1),
        "ate_gate_1pct": bool(rmse < 0.01 * extent),
        "final_ba_cost": round(float(costs[-1]), 2),
        "wall_s": {"generate": round(t_gen, 1),
                   "initialize": round(t_init, 1),
                   "register_loop": round(t_reg, 1),
                   "final_ba": round(t_ba, 1),
                   "total": round(wall, 1)},
        "device_s": round(timer.total, 1),
        "host_s": round(wall - timer.total, 1),
        "device_calls": {k: [c, round(s, 1)]
                         for k, (c, s) in sorted(timer.calls.items())},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
