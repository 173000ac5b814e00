"""External cross-validation of the SfM frontend against OpenCV.

The reference has no SfM layer; this framework's two-view geometry and
PnP (popsift_tpu/sfm/) are validated internally against synthetic ground
truth in tests/test_sfm.py. Here the same problems are additionally
solved by OpenCV (findHomography / findEssentialMat + recoverPose /
solvePnPRansac) and both solvers are held to the same ground-truth
accuracy bar — the SfM analog of the cv2 extraction parity gate
(tests/test_cv2_parity.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from popsift_tpu.sfm.twoview import (ransac_essential, ransac_homography,
                                     recover_pose, refine_pose)


def _rot(axis, deg):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    a = np.deg2rad(deg)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)


def test_homography_parity_with_cv2():
    rng = np.random.default_rng(0)
    H_gt = np.array([[1.05, 0.02, 8.0],
                     [-0.03, 0.98, -5.0],
                     [1e-4, -5e-5, 1.0]])
    n = 200
    x1 = rng.uniform(0, 500, size=(n, 2))
    p = np.concatenate([x1, np.ones((n, 1))], axis=1) @ H_gt.T
    x2 = p[:, :2] / p[:, 2:3] + rng.normal(0, 0.4, (n, 2))
    x2[:40] = rng.uniform(0, 500, size=(40, 2))     # 20% outliers

    res = ransac_homography(jax.random.PRNGKey(0), jnp.asarray(x1),
                            jnp.asarray(x2), jnp.ones(n, bool))
    H_ours = np.asarray(res.model)
    H_cv, mask_cv = cv2.findHomography(x1, x2, cv2.RANSAC, 2.0)

    def h_err(H):
        q = np.concatenate([x1[40:], np.ones((n - 40, 1))], 1) @ (
            H / H[2, 2]).T
        return np.sqrt(((q[:, :2] / q[:, 2:3] - x2[40:]) ** 2
                        ).sum(1)).mean()

    e_ours, e_cv = h_err(H_ours), h_err(H_cv)
    assert e_ours < 1.0 and e_cv < 1.0
    assert e_ours < e_cv + 0.5, (e_ours, e_cv)
    # inlier classification agrees with cv2 on >= 90% of points
    agree = (np.asarray(res.inliers) ==
             mask_cv.ravel().astype(bool)).mean()
    assert agree >= 0.9, agree


def test_essential_pose_parity_with_cv2():
    rng = np.random.default_rng(1)
    n = 300
    X = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3))
    R_gt = _rot([0.2, 1.0, 0.1], 9.0)
    t_gt = np.array([0.8, 0.05, 0.1])
    t_gt /= np.linalg.norm(t_gt)
    x1 = X[:, :2] / X[:, 2:3]
    Xc = X @ R_gt.T + t_gt
    x2 = Xc[:, :2] / Xc[:, 2:3]
    x1 += rng.normal(0, 1e-3, x1.shape)
    x2 += rng.normal(0, 1e-3, x2.shape)
    x2[:30] = rng.uniform(-0.5, 0.5, (30, 2))       # 10% outliers

    valid = np.ones(n, bool)
    # squared-Sampson gate matched to the 1e-3 noise level (the default
    # 1e-4 is sized for pixel-scale pipelines and admits a few false
    # inliers here, skewing the final refit)
    res = ransac_essential(jax.random.PRNGKey(2), jnp.asarray(x1),
                           jnp.asarray(x2), jnp.asarray(valid),
                           thresh=2e-5)
    R_ours, t_ours, _ = recover_pose(res.model, jnp.asarray(x1),
                                     jnp.asarray(x2), res.inliers)
    R_ours, t_ours = refine_pose(R_ours, t_ours, jnp.asarray(x1),
                                 jnp.asarray(x2), res.inliers)
    E_cv, _ = cv2.findEssentialMat(x1, x2, np.eye(3), cv2.RANSAC, 0.999,
                                   1e-3)
    _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, x1, x2, np.eye(3))

    def rot_err(R):
        c = (np.trace(R_gt @ np.asarray(R).T) - 1) / 2
        return np.rad2deg(np.arccos(np.clip(c, -1, 1)))

    def t_err(t):
        t = np.asarray(t).ravel()
        return np.rad2deg(np.arccos(np.clip(
            abs(t @ t_gt) / np.linalg.norm(t), -1, 1)))

    assert rot_err(R_ours) < 1.0 and t_err(t_ours) < 2.0, (
        rot_err(R_ours), t_err(t_ours))
    assert rot_err(R_cv) < 1.0 and t_err(t_cv) < 2.0
    # ours within 1 degree of cv2's accuracy on both components
    assert rot_err(R_ours) < rot_err(R_cv) + 1.0
    assert t_err(t_ours) < t_err(t_cv) + 1.0


def test_pnp_parity_with_cv2():
    from popsift_tpu.sfm.pnp import ransac_pnp

    rng = np.random.default_rng(3)
    n = 150
    X = rng.uniform([-2, -2, 4], [2, 2, 12], size=(n, 3))
    R_gt = _rot([0.1, 0.3, 1.0], 14.0)
    t_gt = np.array([0.4, -0.2, 0.6])
    Xc = X @ R_gt.T + t_gt
    x = Xc[:, :2] / Xc[:, 2:3] + rng.normal(0, 1e-3, (n, 2))
    x[:15] = rng.uniform(-0.5, 0.5, (15, 2))        # 10% outliers

    res = ransac_pnp(jax.random.PRNGKey(4), jnp.asarray(X),
                     jnp.asarray(x), jnp.ones(n, bool))
    ok, rvec, tvec, _ = cv2.solvePnPRansac(
        X.astype(np.float64), x.astype(np.float64), np.eye(3), None,
        flags=cv2.SOLVEPNP_ITERATIVE, reprojectionError=3e-3)
    assert ok
    R_cv = cv2.Rodrigues(rvec)[0]

    def pose_err(R, t):
        c = (np.trace(R_gt @ np.asarray(R).T) - 1) / 2
        rot = np.rad2deg(np.arccos(np.clip(c, -1, 1)))
        return rot, np.linalg.norm(np.asarray(t).ravel() - t_gt)

    r_o, t_o = pose_err(res.R, res.t)
    r_c, t_c = pose_err(R_cv, tvec)
    assert r_o < 0.5 and t_o < 0.05, (r_o, t_o)
    assert r_c < 0.5 and t_c < 0.05
    assert r_o < r_c + 0.5 and t_o < t_c + 0.05
