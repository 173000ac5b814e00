"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run anywhere (the real TPU tunnel exposes a single chip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize registers the TPU plugin and pins
# jax_platforms to "axon,cpu", overriding the env var — force CPU here.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def synthetic_image(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Deterministic grayscale test image with blobs, edges and texture —
    enough structure to produce stable SIFT keypoints at several scales."""
    rng_ = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 40.0 + 20.0 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
    # gaussian blobs at pseudo-random locations/scales
    for _ in range(12):
        cx, cy = rng_.uniform(0.15, 0.85) * w, rng_.uniform(0.15, 0.85) * h
        s = rng_.uniform(1.5, min(h, w) / 10.0)
        a = rng_.uniform(60, 160) * rng_.choice([-1.0, 1.0])
        img += a * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
    # a couple of hard edges
    img[h // 3:, : w // 4] += 50.0
    img[: h // 5, w // 2:] -= 40.0
    img += rng_.normal(0, 1.0, size=(h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="session")
def small_image():
    return synthetic_image(64, 80, seed=3)


@pytest.fixture(scope="session")
def medium_image():
    return synthetic_image(120, 160, seed=7)
