"""SO(3) utilities (batched, jit-safe)."""

from __future__ import annotations

import jax.numpy as jnp


def hat(w):
    """Skew-symmetric matrix [..., 3, 3] from [..., 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def exp_so3(w):
    """Rodrigues: rotation matrix [..., 3, 3] from rotation vector [..., 3].

    Taylor-safe near zero."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + 1e-30)
    K = hat(w / jnp.maximum(theta[..., 0], 1e-30))
    small = theta2 < 1e-12
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    R = eye + s * K + (1.0 - c) * (K @ K)
    R_small = eye + hat(w)
    return jnp.where(small, R_small, R)


def log_so3(R):
    """Rotation vector [..., 3] from rotation matrix [..., 3, 3]."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    s = jnp.where(jnp.abs(jnp.sin(theta)) < 1e-7, 1.0, 2.0 * jnp.sin(theta))
    scale = jnp.where(theta[..., None] < 1e-6, 0.5,
                      (theta / s)[..., None])
    return v * scale
