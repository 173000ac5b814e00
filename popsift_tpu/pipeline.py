"""End-to-end SIFT extraction pipeline.

The TPU counterpart of the reference's stage-2 worker
(``extractDownloadLoop`` -> Pyramid::step1/step2/get_descriptors,
/root/reference/src/popsift/popsift.cpp:182-213,
sift_pyramid.cu:226-321): one jitted XLA program that takes a grayscale
uint8 image and returns capacity-padded keypoint + descriptor arrays.

Where the reference walks octaves on streams with device/host counter
round-trips (readDescCountersFromDevice, sift_pyramid.cu:372-375), this
pipeline keeps all counts as on-device scalars; the octave loop is
unrolled at trace time (static shapes per octave).

Output layout mirrors FeaturesHost/FeaturesDev (features.h:65-118):
struct-of-arrays keypoints in *input image* coordinates (prep_features
scaling 2^(octave - upscale), sift_pyramid.cu:250-261), a flat
descriptor array, and the descriptor->keypoint reverse map
(features.h:100-118).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ORIENTATION_MAX_COUNT, SiftConfig
from .ops.descriptors import (
    compute_descriptors,
    make_descriptor_jobs,
    normalize_descriptors,
)
from .ops.extrema import detect_extrema
from .ops.gridfilter import maybe_grid_filter
from .ops.orientation import assign_orientations
from .ops.pyramid import PyramidPlan, build_pyramid, build_pyramid_plan


class SiftFeatures(NamedTuple):
    """Capacity-padded extraction result (device pytree)."""

    # keypoints [K_total]
    x: jnp.ndarray
    y: jnp.ndarray
    sigma: jnp.ndarray
    octave: jnp.ndarray
    num_ori: jnp.ndarray
    valid: jnp.ndarray
    ori: jnp.ndarray          # [K_total, 4]
    ori_valid: jnp.ndarray    # [K_total, 4]
    # descriptors [F_total]
    desc: jnp.ndarray         # [F_total, 128]
    desc_kp: jnp.ndarray      # [F_total] -> keypoint row (reverse map)
    desc_valid: jnp.ndarray   # [F_total]
    # counts
    n_keypoints: jnp.ndarray
    n_descriptors: jnp.ndarray
    # per-octave pre-refinement candidate counts (capacity calibration);
    # saturates at the octave capacity
    octave_candidates: jnp.ndarray   # i32[n_octaves]
    # per-octave candidates dropped by the compaction density clamp —
    # nonzero means the scene outgrew the calibrated capacity plan
    octave_dropped: jnp.ndarray      # i32[n_octaves]


@dataclass(frozen=True)
class ExtractPlan:
    """Static plan: shapes, capacities and filters for one (config, size)."""

    config: SiftConfig
    height: int
    width: int
    pyramid: PyramidPlan
    ext_caps: tuple      # per-octave extrema capacity
    job_caps: tuple      # per-octave descriptor-job capacity

    @property
    def total_kp_capacity(self) -> int:
        return sum(self.ext_caps)

    @property
    def total_desc_capacity(self) -> int:
        return sum(self.job_caps)


def build_extract_plan(config: SiftConfig, height: int, width: int,
                       octave_caps: tuple | None = None) -> ExtractPlan:
    """Build the static plan.

    ``octave_caps`` optionally pins a per-octave extrema capacity
    (production deployments calibrate these once per camera/scene —
    downstream orientation/descriptor compute is proportional to the
    padded capacity, so right-sizing each octave is a large win; the
    reference sizes one global buffer from ``max_extrema`` up front,
    sift_pyramid.cu:121-164, and clamps overflow the same way).
    """
    pyr = build_pyramid_plan(config, height, width)
    ext_caps = []
    job_caps = []
    for octv, (oh, ow) in enumerate(pyr.dims):
        if octave_caps is not None:
            cap = octave_caps[octv] if octv < len(octave_caps) else \
                octave_caps[-1]
        else:
            cap = config.capacity_for_octave(oh, ow)
        cap = min(cap, config.max_extrema)
        ext_caps.append(cap)
        # reference sizes the flat orientation list at 1.25x extrema
        # (sift_constants.cu:31)
        job_caps.append(cap + cap // 4)
    return ExtractPlan(config=config, height=height, width=width,
                       pyramid=pyr, ext_caps=tuple(ext_caps),
                       job_caps=tuple(job_caps))


def extract(img_u8: jnp.ndarray, plan: ExtractPlan,
            desc_chunk: int = 1024) -> SiftFeatures:
    """Run the full pipeline on one image. Jit-compatible."""
    cfg = plan.config
    blurs, dogs = build_pyramid(img_u8, plan.pyramid)

    kp_fields = {k: [] for k in
                 ("x", "y", "sigma", "octave", "num_ori", "valid",
                  "ori", "ori_valid")}
    desc_fields = {k: [] for k in ("desc", "desc_kp", "desc_valid")}

    # phase 1: detect in every octave (Pyramid::find_extrema)
    exts = []
    for octv, ((oh, ow), dog) in enumerate(zip(plan.pyramid.dims, dogs)):
        exts.append(detect_extrema(dog, cfg, plan.ext_caps[octv], ow, oh))

    # phase 2: global grid-budget filter before the expensive stages
    # (extrema_filter_grid runs before orientation, s_orientation.cu:353-367)
    if cfg.filter_max_extrema > 0:
        cells = jnp.concatenate([e.cell for e in exts])
        sig_g = jnp.concatenate(
            [e.sigma * np.float32(2.0 ** (o - cfg.upscale_factor))
             for o, e in enumerate(exts)])
        val_g = jnp.concatenate([e.valid for e in exts])
        new_valid = maybe_grid_filter(cells, sig_g, val_g, cfg)
        off = 0
        for octv, e in enumerate(exts):
            cap = plan.ext_caps[octv]
            seg = new_valid[off:off + cap]
            exts[octv] = e._replace(
                valid=seg, count=jnp.sum(seg, dtype=jnp.int32))
            off += cap

    # phase 3: orientation + descriptors per octave
    kp_offset = 0
    for octv, ((oh, ow), blur, dog) in enumerate(
            zip(plan.pyramid.dims, blurs, dogs)):
        cap = plan.ext_caps[octv]
        ext = exts[octv]
        oris = assign_orientations(blur, ext, cfg)
        jobs = make_descriptor_jobs(ext, oris, plan.job_caps[octv])
        raw = compute_descriptors(blur, jobs, cfg, chunk=desc_chunk)
        desc = normalize_descriptors(raw, cfg)
        desc = jnp.where(jobs.valid[:, None], desc, 0.0)

        scale = np.float32(2.0 ** (octv - cfg.upscale_factor))
        kp_fields["x"].append(ext.x * scale)
        kp_fields["y"].append(ext.y * scale)
        kp_fields["sigma"].append(ext.sigma * scale)
        kp_fields["octave"].append(
            jnp.full((cap,), octv, jnp.int32))
        kp_fields["num_ori"].append(oris.num_ori)
        kp_fields["valid"].append(ext.valid)
        kp_fields["ori"].append(oris.ori)
        kp_fields["ori_valid"].append(oris.ori_valid)

        desc_fields["desc"].append(desc)
        desc_fields["desc_kp"].append(jobs.kp_index + kp_offset)
        desc_fields["desc_valid"].append(jobs.valid)
        kp_offset += cap

    cat = lambda xs: jnp.concatenate(xs, axis=0)
    valid = cat(kp_fields["valid"])
    desc_valid = cat(desc_fields["desc_valid"])
    return SiftFeatures(
        x=cat(kp_fields["x"]),
        y=cat(kp_fields["y"]),
        sigma=cat(kp_fields["sigma"]),
        octave=cat(kp_fields["octave"]),
        num_ori=cat(kp_fields["num_ori"]),
        valid=valid,
        ori=cat(kp_fields["ori"]),
        ori_valid=cat(kp_fields["ori_valid"]),
        desc=cat(desc_fields["desc"]),
        desc_kp=cat(desc_fields["desc_kp"]),
        desc_valid=desc_valid,
        n_keypoints=jnp.sum(valid, dtype=jnp.int32),
        n_descriptors=jnp.sum(desc_valid, dtype=jnp.int32),
        octave_candidates=jnp.stack([e.n_candidates for e in exts]),
        octave_dropped=jnp.stack([e.n_dropped for e in exts]),
    )


def make_extract_fn(plan: ExtractPlan, desc_chunk: int = 1024):
    """Jitted single-image extraction closure."""
    return jax.jit(lambda img: extract(img, plan, desc_chunk=desc_chunk))


def saturation_report(feats: SiftFeatures, plan: ExtractPlan) -> list:
    """Human-readable warnings when an octave hit its candidate capacity
    or the compaction density clamp dropped candidates.

    The reference silently clamps to ``max_extrema``
    (s_extrema.cu:551-561); here saturation is observable so deployments
    can re-run :func:`calibrate_plan` when the scene changes.
    """
    warnings = []
    cand = np.asarray(feats.octave_candidates)
    dropped = np.asarray(feats.octave_dropped)
    for octv, cap in enumerate(plan.ext_caps):
        if cand[octv] >= cap:
            warnings.append(
                f"octave {octv}: candidate count saturated at capacity "
                f"{cap}; keypoints are being silently dropped — "
                f"recalibrate with calibrate_plan() or raise "
                f"extrema_capacity")
        if dropped[octv] > 0:
            warnings.append(
                f"octave {octv}: {int(dropped[octv])} candidates dropped "
                f"by the per-block density clamp; raise "
                f"config.compact_block_k or the peak threshold")
    return warnings


def calibrate_plan(config: SiftConfig, frames, height: int | None = None,
                   width: int | None = None, headroom: float = 1.5,
                   probe_capacity: int = 8192) -> ExtractPlan:
    """Measure per-octave candidate counts on representative ``frames``
    and return a plan with right-sized (pinned) octave capacities.

    Downstream orientation/descriptor compute is proportional to the
    padded capacity, so production deployments calibrate once per
    camera/scene. ``headroom`` scales the observed per-octave maximum;
    capacities are rounded up to a multiple of 128 (+128 guard).

    The reference counterpart is ``reallocExtrema``'s grow-to-fit
    (sift_pyramid.cu:179-209) — which needs a second pass too (realloc +
    re-run) the first time a scene outgrows the buffers.
    """
    frames = list(frames)
    if height is None or width is None:
        height, width = frames[0].shape[-2:]
    probe_cfg = config.replace(extrema_capacity=probe_capacity)
    probe_fn = make_extract_fn(build_extract_plan(probe_cfg, height, width))
    cand = np.zeros(len(config.octave_dims(width, height)), np.int64)
    for f in frames:
        out = probe_fn(f)
        cand = np.maximum(cand, np.asarray(out.octave_candidates))
    caps = tuple(int(max(256, -(-int(c * headroom) // 128) * 128 + 128))
                 for c in cand)
    return build_extract_plan(config, height, width, octave_caps=caps)
