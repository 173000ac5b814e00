"""SfM layer tests on synthetic scenes with exact ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from popsift_tpu.sfm.rotation import exp_so3, log_so3
from popsift_tpu.sfm.twoview import (
    ransac_essential,
    ransac_homography,
    recover_pose,
    triangulate,
)
from popsift_tpu.sfm.ba import BAProblem, bundle_adjust, residuals
from popsift_tpu.sfm.evaluate import ate_rmse, camera_centers, umeyama


def _rotmat(rng, scale=0.3):
    w = rng.standard_normal(3) * scale
    return np.asarray(exp_so3(jnp.asarray(w, jnp.float32)))


def make_scene(rng, n_pts=120, n_cams=2, noise=0.0):
    """Random 3D points in front of cameras on a small baseline arc."""
    X = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n_pts, 3))
    cams = []
    for i in range(n_cams):
        w = np.array([0.02 * i, 0.03 * i, 0.01 * i])
        R = np.asarray(exp_so3(jnp.asarray(w, jnp.float32)))
        C = np.array([0.5 * i, 0.05 * i, -0.1 * i])  # camera center
        t = -R @ C
        cams.append((R, t))
    obs = []
    for R, t in cams:
        Xc = X @ R.T + t
        x = Xc[:, :2] / Xc[:, 2:3]
        if noise > 0:
            x = x + rng.normal(0, noise, x.shape)
        obs.append(x.astype(np.float32))
    return X.astype(np.float32), cams, obs


def test_rotation_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 3)).astype(np.float32) * 0.8
    R = exp_so3(jnp.asarray(w))
    w2 = np.asarray(log_so3(R))
    np.testing.assert_allclose(w2, w, atol=1e-4)
    # orthonormality
    RtR = np.einsum("nij,nik->njk", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-5)


def test_essential_ransac_and_pose():
    rng = np.random.default_rng(1)
    X, cams, obs = make_scene(rng, n_pts=100, n_cams=2, noise=0.0)
    x1, x2 = obs
    # inject 20% outliers
    n_out = 20
    x2c = x2.copy()
    x2c[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2)).astype(np.float32)
    valid = np.ones(100, bool)

    key = jax.random.PRNGKey(0)
    res = ransac_essential(key, jnp.asarray(x1), jnp.asarray(x2c),
                           jnp.asarray(valid), thresh=1e-6, n_hyp=256)
    inl = np.asarray(res.inliers)
    assert inl[n_out:].sum() >= 70, f"only {inl[n_out:].sum()} true inliers"
    assert inl[:n_out].sum() <= 3, "outliers slipped through"

    R2, t2, good = recover_pose(res.model, jnp.asarray(x1),
                                jnp.asarray(x2c), res.inliers)
    R_gt, t_gt = cams[1]
    # translation known up to scale
    t_est = np.asarray(t2)
    t_gt_n = t_gt / np.linalg.norm(t_gt)
    assert min(np.linalg.norm(t_est - t_gt_n),
               np.linalg.norm(t_est + t_gt_n)) < 0.02
    # rotation error
    dR = np.asarray(R2) @ R_gt.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert ang < 0.01, f"rotation error {ang}"


def test_triangulation_exact():
    rng = np.random.default_rng(2)
    X, cams, obs = make_scene(rng, n_pts=50, n_cams=2)
    (R1, t1), (R2, t2) = cams
    Xe = np.asarray(triangulate(
        jnp.asarray(R1, jnp.float32), jnp.asarray(t1, jnp.float32),
        jnp.asarray(R2, jnp.float32), jnp.asarray(t2, jnp.float32),
        jnp.asarray(obs[0]), jnp.asarray(obs[1])))
    np.testing.assert_allclose(Xe, X, atol=2e-2)


def test_homography_ransac():
    rng = np.random.default_rng(3)
    H_gt = np.array([[1.1, 0.02, 5.0], [-0.03, 0.95, -3.0],
                     [1e-4, -2e-5, 1.0]])
    x1 = rng.uniform(0, 400, (80, 2))
    h = np.concatenate([x1, np.ones((80, 1))], axis=1) @ H_gt.T
    x2 = h[:, :2] / h[:, 2:3]
    x2[:15] = rng.uniform(0, 400, (15, 2))  # outliers
    res = ransac_homography(jax.random.PRNGKey(1),
                            jnp.asarray(x1, jnp.float32),
                            jnp.asarray(x2, jnp.float32),
                            jnp.ones(80, bool), thresh=1.0, n_hyp=256)
    inl = np.asarray(res.inliers)
    assert inl[15:].sum() >= 60
    assert inl[:15].sum() <= 2


def _make_ba_problem(rng, n_cams=4, n_pts=60, noise_px=0.5,
                     perturb=True):
    f, cx, cy = 500.0, 320.0, 240.0
    X = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n_pts, 3)).astype(np.float32)
    cams_gt = []
    for i in range(n_cams):
        w = np.array([0.02 * i, -0.015 * i, 0.01 * i], np.float32)
        R = np.asarray(exp_so3(jnp.asarray(w)))
        C = np.array([0.4 * i, 0.05 * i, -0.05 * i], np.float32)
        t = (-R @ C).astype(np.float32)
        cams_gt.append(np.concatenate([w, t]))
    cams_gt = np.stack(cams_gt)

    obs_cam, obs_pt, obs_uv = [], [], []
    for ci in range(n_cams):
        R = np.asarray(exp_so3(jnp.asarray(cams_gt[ci, :3])))
        t = cams_gt[ci, 3:]
        Xc = X @ R.T + t
        uv = np.stack([f * Xc[:, 0] / Xc[:, 2] + cx,
                       f * Xc[:, 1] / Xc[:, 2] + cy], axis=1)
        uv += rng.normal(0, noise_px, uv.shape)
        for pi in range(n_pts):
            obs_cam.append(ci)
            obs_pt.append(pi)
            obs_uv.append(uv[pi])

    cams0 = cams_gt.copy()
    X0 = X.copy()
    if perturb:
        cams0 = cams0 + rng.normal(0, 0.01, cams0.shape).astype(np.float32)
        cams0[0] = cams_gt[0]   # gauge camera stays exact
        X0 = X0 + rng.normal(0, 0.05, X0.shape).astype(np.float32)

    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    prob = BAProblem(
        cams=jnp.asarray(cams0),
        points=jnp.asarray(X0),
        intr=jnp.asarray([f, f, cx, cy], jnp.float32),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(np.asarray(obs_uv, np.float32)),
        obs_valid=jnp.ones(len(obs_cam), bool),
        cam_fixed=jnp.asarray(fixed),
    )
    return prob, cams_gt, X


def test_bundle_adjustment_recovers_perturbed_focal():
    """opt_intr=True with a focal-only mask pulls a 5%-perturbed shared
    focal back to truth via the joint augmented-Schur solve
    (ba.py::schur_dense_step(opt_intr=True); no reference analog — the
    reference stops at matching, features.cu).

    Geometry note: cameras must TILT (rotate about x), not just orbit
    about y — with all rotations about a single axis, the focal along
    that axis is exactly gauge-degenerate (fy*s, Y/s, ty/s is an exact
    symmetry of the pinhole model)."""
    rng = np.random.default_rng(11)
    f, cx, cy = 500.0, 320.0, 240.0
    n_cams, n_pts = 8, 80
    X = rng.uniform([-2, -2, -2], [2, 2, 2],
                    size=(n_pts, 3)).astype(np.float32)
    cams_gt = []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams * 0.35
        C = np.array([8 * np.sin(ang), 3.0 * np.sin(2 * ang + 1.0),
                      -8 * np.cos(ang)], np.float32)
        w = np.array([0.25 * np.sin(3.1 * i + 0.5), ang,
                      0.1 * np.cos(2.3 * i)], np.float32)
        R = np.asarray(exp_so3(jnp.asarray(w)))
        cams_gt.append(np.concatenate([w, (-R @ C).astype(np.float32)]))
    cams_gt = np.stack(cams_gt)
    obs_cam, obs_pt, obs_uv = [], [], []
    for ci in range(n_cams):
        R = np.asarray(exp_so3(jnp.asarray(cams_gt[ci, :3])))
        Xc = X @ R.T + cams_gt[ci, 3:]
        uv = np.stack([f * Xc[:, 0] / Xc[:, 2] + cx,
                       f * Xc[:, 1] / Xc[:, 2] + cy], 1)
        uv += rng.normal(0, 0.2, uv.shape)
        for pi in range(n_pts):
            obs_cam.append(ci)
            obs_pt.append(pi)
            obs_uv.append(uv[pi])
    cams0 = cams_gt + rng.normal(0, 0.01, cams_gt.shape).astype(np.float32)
    cams0[0] = cams_gt[0]
    X0 = X + rng.normal(0, 0.05, X.shape).astype(np.float32)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    bad = BAProblem(
        cams=jnp.asarray(cams0), points=jnp.asarray(X0),
        intr=jnp.asarray([f * 1.05, f * 1.05, cx, cy], jnp.float32),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(np.asarray(obs_uv, np.float32)),
        obs_valid=jnp.ones(len(obs_cam), bool),
        cam_fixed=jnp.asarray(fixed))

    out, costs = bundle_adjust(bad, iters=20, opt_intr=True,
                               intr_mask=(1.0, 1.0, 0.0, 0.0))
    for f_est in (float(out.intr[0]), float(out.intr[1])):
        assert abs(f_est - f) / f < 0.005, f"focal {f_est} vs true {f}"
    # principal point was frozen by the mask
    np.testing.assert_allclose(np.asarray(out.intr[2:]),
                               np.asarray(bad.intr[2:]), rtol=0, atol=0)
    # and without opt_intr the focal error stays (control)
    out2, _ = bundle_adjust(bad, iters=20)
    np.testing.assert_allclose(float(out2.intr[0]), f * 1.05)


def test_bundle_adjustment_converges():
    rng = np.random.default_rng(4)
    prob, cams_gt, X_gt = _make_ba_problem(rng, noise_px=0.0)
    r0 = np.asarray(residuals(prob))
    cost0 = float((r0 ** 2).sum())
    out, costs = bundle_adjust(prob, iters=12, cg_iters=30)
    r1 = np.asarray(residuals(out))
    cost1 = float((r1 ** 2).sum())
    assert cost1 < cost0 * 1e-4, f"BA did not converge: {cost0} -> {cost1}"

    ate = ate_rmse(camera_centers(np.asarray(out.cams)),
                   camera_centers(cams_gt))
    assert ate < 1e-3, f"ATE {ate}"


def test_bundle_adjustment_with_noise():
    rng = np.random.default_rng(5)
    prob, cams_gt, X_gt = _make_ba_problem(rng, noise_px=0.5)
    out, costs = bundle_adjust(prob, iters=10, cg_iters=25)
    ate = ate_rmse(camera_centers(np.asarray(out.cams)),
                   camera_centers(cams_gt))
    assert ate < 5e-3, f"ATE {ate}"


def test_umeyama_alignment():
    rng = np.random.default_rng(6)
    src = rng.standard_normal((30, 3))
    R = _rotmat(rng, 0.5)
    s, t = 1.7, np.array([1.0, -2.0, 0.5])
    dst = s * src @ R.T + t
    s2, R2, t2 = umeyama(src, dst)
    assert abs(s2 - s) < 1e-6
    np.testing.assert_allclose(R2, R, atol=1e-6)
    assert ate_rmse(src, dst) < 1e-6


def test_bundle_adjustment_huber_outliers():
    """Huber IRLS BA (opt-in) shrugs off gross observation outliers
    that pull the plain L2 objective off ground truth. 5% of the
    observations are corrupted by ~80 px; the robust solve must stay
    an order of magnitude closer to GT than the L2 solve, for both the
    dense-Schur and CG paths."""
    rng = np.random.default_rng(7)
    prob, cams_gt, X_gt = _make_ba_problem(rng, noise_px=0.3)
    uv = np.asarray(prob.obs_uv).copy()
    n_obs = uv.shape[0]
    bad = rng.choice(n_obs, size=n_obs // 20, replace=False)
    uv[bad] += rng.normal(0, 80.0, (len(bad), 2))
    prob = prob._replace(obs_uv=jnp.asarray(uv.astype(np.float32)))

    out_l2, _ = bundle_adjust(prob, iters=12)
    ate_l2 = ate_rmse(camera_centers(np.asarray(out_l2.cams)),
                      camera_centers(cams_gt))
    for dense in (True, False):
        out_h, costs = bundle_adjust(prob, iters=12, dense=dense,
                                     huber_delta=1.0)
        ate_h = ate_rmse(camera_centers(np.asarray(out_h.cams)),
                         camera_centers(cams_gt))
        assert costs[-1] <= costs[0]
        # measured: L2 ATE ~0.12, Huber ~0.004 (noise floor ~3e-3)
        assert ate_h < 6e-3, f"robust ATE {ate_h} (dense={dense})"
        assert ate_h < ate_l2 / 10, (ate_h, ate_l2)
