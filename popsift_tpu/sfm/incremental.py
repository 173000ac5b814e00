"""Incremental structure-from-motion reconstruction.

New capability relative to the reference (BASELINE.json north star).
Host orchestration (which image to register next) drives batched
device-side solvers: two-view RANSAC for the seed pair (twoview.py),
PnP RANSAC for registration (pnp.py), batched DLT triangulation, and
capacity-padded Schur-complement BA (ba.py). The reconstruction state is
a plain pytree of arrays, checkpointable at every milestone
(checkpoint.py) so long runs are restartable — the failure-recovery
behavior the reference lacks entirely (every error exit()s,
common/debug_macros.cu:36-45).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .ba import BAProblem, bundle_adjust
from .pnp import ransac_pnp
from .rotation import exp_so3, log_so3
from .tracks import Tracks
from .twoview import ransac_essential, recover_pose, triangulate


@dataclass
class Reconstruction:
    """Mutable host-side reconstruction state (cams map world->camera)."""

    intr: np.ndarray                       # fx fy cx cy (shared)
    cam_R: dict = field(default_factory=dict)    # img -> [3,3]
    cam_t: dict = field(default_factory=dict)    # img -> [3]
    points: dict = field(default_factory=dict)   # track -> [3]
    registered: list = field(default_factory=list)

    def normalized(self, uv: np.ndarray) -> np.ndarray:
        fx, fy, cx, cy = self.intr
        return np.stack([(uv[..., 0] - cx) / fx,
                         (uv[..., 1] - cy) / fy], axis=-1)


def _pad(a, n, fill=0):
    a = np.asarray(a)
    out = np.full((n,) + a.shape[1:], fill, a.dtype)
    out[:len(a)] = a
    return out


class IncrementalSfM:
    """Incremental reconstruction driver.

    Usage::

        sfm = IncrementalSfM(tracks, intrinsics)
        sfm.initialize()          # best seed pair
        while sfm.register_next():
            pass
        sfm.global_ba()
    """

    def __init__(self, tracks: Tracks, intr, seed: int = 0,
                 min_pnp_points: int = 8, reproj_thresh: float = 2e-4,
                 ba_every: int = 3, checkpoint_dir: str | None = None):
        self.tracks = tracks
        self.rec = Reconstruction(intr=np.asarray(intr, np.float32))
        self.key = jax.random.PRNGKey(seed)
        self.min_pnp_points = min_pnp_points
        self.reproj_thresh = reproj_thresh
        self.ba_every = ba_every
        self.checkpoint_dir = checkpoint_dir
        self._since_ba = 0

        t = tracks
        self.images = sorted(set(int(i) for i in t.image_id))
        # per-image observation rows
        self._rows = {img: np.nonzero(t.image_id == img)[0]
                      for img in self.images}

    # -- helpers -----------------------------------------------------------

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _common_tracks(self, a: int, b: int):
        t = self.tracks
        ta = set(t.track_id[self._rows[a]])
        tb = set(t.track_id[self._rows[b]])
        return sorted(ta & tb)

    def _obs_uv(self, img: int, track_ids):
        """uv of given tracks in the given image (must exist)."""
        t = self.tracks
        rows = self._rows[img]
        by_track = {int(tr): i for i, tr in enumerate(t.track_id[rows])}
        sel = [rows[by_track[tr]] for tr in track_ids]
        return t.uv[sel]

    # -- phases ------------------------------------------------------------

    def initialize(self, pair=None) -> tuple:
        """Pick (or accept) a seed pair, estimate relative pose, and
        triangulate the shared tracks. Returns the pair used."""
        if pair is None:
            best, best_n = None, -1
            for i in self.images:
                for j in self.images:
                    if j <= i:
                        continue
                    n = len(self._common_tracks(i, j))
                    if n > best_n:
                        best, best_n = (i, j), n
            pair = best
        a, b = pair
        common = self._common_tracks(a, b)
        if len(common) < 8:
            raise ValueError("seed pair shares fewer than 8 tracks")

        xa = self.rec.normalized(self._obs_uv(a, common))
        xb = self.rec.normalized(self._obs_uv(b, common))
        N = len(common)
        cap = max(64, 1 << (N - 1).bit_length())
        valid = np.arange(cap) < N
        res = ransac_essential(self._next_key(),
                               jnp.asarray(_pad(xa, cap)),
                               jnp.asarray(_pad(xb, cap)),
                               jnp.asarray(valid),
                               thresh=self.reproj_thresh)
        R2, t2, good = recover_pose(res.model, jnp.asarray(_pad(xa, cap)),
                                    jnp.asarray(_pad(xb, cap)),
                                    jnp.asarray(valid) & res.inliers)
        X = triangulate(jnp.eye(3), jnp.zeros(3), R2, t2,
                        jnp.asarray(_pad(xa, cap)), jnp.asarray(_pad(xb, cap)))
        X = np.asarray(X)
        good = np.asarray(good)

        self.rec.cam_R[a] = np.eye(3, dtype=np.float32)
        self.rec.cam_t[a] = np.zeros(3, np.float32)
        self.rec.cam_R[b] = np.asarray(R2)
        self.rec.cam_t[b] = np.asarray(t2)
        self.rec.registered = [a, b]
        for i, tr in enumerate(common):
            if good[i]:
                self.rec.points[tr] = X[i]
        self._checkpoint("init")
        return pair

    def register_next(self) -> int | None:
        """Register the unregistered image seeing the most reconstructed
        points (PnP RANSAC), then triangulate its new tracks. Returns the
        image id, or None when no image can be registered."""
        remaining = [i for i in self.images
                     if i not in self.rec.registered]
        if not remaining:
            return None
        t = self.tracks
        counts = []
        for img in remaining:
            seen = sum(1 for tr in t.track_id[self._rows[img]]
                       if int(tr) in self.rec.points)
            counts.append((seen, img))
        counts.sort(reverse=True)
        seen, img = counts[0]
        if seen < self.min_pnp_points:
            return None

        rows = self._rows[img]
        trs = [int(tr) for tr in t.track_id[rows]]
        sel = [(k, tr) for k, tr in enumerate(trs) if tr in self.rec.points]
        X = np.stack([self.rec.points[tr] for _, tr in sel])
        uv = t.uv[rows[[k for k, _ in sel]]]
        x = self.rec.normalized(uv)
        N = len(sel)
        cap = max(64, 1 << (N - 1).bit_length())
        res = ransac_pnp(self._next_key(),
                         jnp.asarray(_pad(X, cap)), jnp.asarray(_pad(x, cap)),
                         jnp.asarray(np.arange(cap) < N),
                         thresh=self.reproj_thresh)
        if int(res.n_inliers) < self.min_pnp_points:
            return None
        self.rec.cam_R[img] = np.asarray(res.R)
        self.rec.cam_t[img] = np.asarray(res.t)
        self.rec.registered.append(img)

        self._triangulate_new(img)
        self._since_ba += 1
        if self._since_ba >= self.ba_every:
            self.global_ba(iters=4)
            self._since_ba = 0
        self._checkpoint(f"reg-{img}")
        return img

    def _triangulate_new(self, img: int):
        """Triangulate tracks newly observable from ``img`` against the
        best-sharing registered partner."""
        for other in self.rec.registered:
            if other == img:
                continue
            common = [tr for tr in self._common_tracks(img, other)
                      if tr not in self.rec.points]
            if not common:
                continue
            xa = self.rec.normalized(self._obs_uv(other, common))
            xb = self.rec.normalized(self._obs_uv(img, common))
            N = len(common)
            cap = max(16, 1 << (N - 1).bit_length())
            X = triangulate(jnp.asarray(self.rec.cam_R[other]),
                            jnp.asarray(self.rec.cam_t[other]),
                            jnp.asarray(self.rec.cam_R[img]),
                            jnp.asarray(self.rec.cam_t[img]),
                            jnp.asarray(_pad(xa, cap)),
                            jnp.asarray(_pad(xb, cap)))
            X = np.asarray(X)
            # cheirality in both views
            for i, tr in enumerate(common):
                z1 = (self.rec.cam_R[other] @ X[i]
                      + self.rec.cam_t[other])[2]
                z2 = (self.rec.cam_R[img] @ X[i] + self.rec.cam_t[img])[2]
                if z1 > 0 and z2 > 0:
                    self.rec.points[tr] = X[i]

    def as_ba_problem(self) -> tuple:
        """Pack the current reconstruction into a capacity-padded
        BAProblem. Returns (problem, cam_ids, track_ids)."""
        cam_ids = list(self.rec.registered)
        cam_index = {c: i for i, c in enumerate(cam_ids)}
        track_ids = sorted(self.rec.points)
        track_index = {tr: i for i, tr in enumerate(track_ids)}

        t = self.tracks
        oc, op, ouv = [], [], []
        for img in cam_ids:
            rows = self._rows[img]
            for r in rows:
                tr = int(t.track_id[r])
                if tr in track_index:
                    oc.append(cam_index[img])
                    op.append(track_index[tr])
                    ouv.append(t.uv[r])
        cams = np.stack([np.concatenate([
            np.asarray(log_so3(jnp.asarray(self.rec.cam_R[c]))),
            self.rec.cam_t[c]]) for c in cam_ids]).astype(np.float32)
        pts = np.stack([self.rec.points[tr] for tr in track_ids]
                       ).astype(np.float32)
        fixed = np.zeros(len(cam_ids), bool)
        fixed[0] = True

        prob = BAProblem(
            cams=jnp.asarray(cams), points=jnp.asarray(pts),
            intr=jnp.asarray(self.rec.intr),
            obs_cam=jnp.asarray(np.asarray(oc, np.int32)),
            obs_pt=jnp.asarray(np.asarray(op, np.int32)),
            obs_uv=jnp.asarray(np.stack(ouv).astype(np.float32)),
            obs_valid=jnp.ones(len(oc), bool),
            cam_fixed=jnp.asarray(fixed))
        return prob, cam_ids, track_ids

    def global_ba(self, iters: int = 10):
        prob, cam_ids, track_ids = self.as_ba_problem()
        out, costs = bundle_adjust(prob, iters=iters)
        cams = np.asarray(out.cams)
        pts = np.asarray(out.points)
        for i, c in enumerate(cam_ids):
            self.rec.cam_R[c] = np.asarray(exp_so3(jnp.asarray(cams[i, :3])))
            self.rec.cam_t[c] = cams[i, 3:]
        for i, tr in enumerate(track_ids):
            self.rec.points[tr] = pts[i]
        self._checkpoint("ba")
        return np.asarray(costs)

    def _checkpoint(self, tag: str):
        if self.checkpoint_dir is None:
            return
        from .checkpoint import save_reconstruction
        save_reconstruction(self.checkpoint_dir, self.rec, tag=tag)

    @classmethod
    def resume(cls, tracks: Tracks, checkpoint_dir: str, seed: int = 0,
               **kw) -> "IncrementalSfM":
        """Restart a killed run from the LATEST checkpoint.

        The reconstruction state (cameras, points, registered set) is
        restored; ``register_next``/``global_ba`` then continue exactly
        where the crashed process left off. The reference exit()s on any
        failure with no recovery path (debug_macros.cu:36-45) — this is
        the elastic-recovery capability SURVEY.md section 5 requires.
        """
        from .checkpoint import load_reconstruction
        rec = load_reconstruction(checkpoint_dir)
        sfm = cls(tracks, rec.intr, seed=seed,
                  checkpoint_dir=checkpoint_dir, **kw)
        sfm.rec = rec
        return sfm
