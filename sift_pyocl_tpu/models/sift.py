"""End-to-end SIFT pipeline and the `SiftPlan` public API.

TPU-native re-architecture of the reference's plan engine
(reference: sift-src/plan.py::SiftPlan — SURVEY.md §2.1/§3.1-3.2).  The
reference pre-allocates device buffers and pre-compiles OpenCL kernels per
image shape, then runs `keypoints(img)` repeatedly at low overhead; here the
same compile-once idiom is `jax.jit` of one fused program per (shape, dtype,
config): pyramid -> detection -> orientation -> descriptor, all octaves
unrolled at trace time with static shapes and static-capacity keypoint
buffers (no atomics, no per-scale host syncs).
"""

from __future__ import annotations

import dataclasses
import logging
from functools import lru_cache, partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

from ..config import SiftConfig
from ..ops import on_tpu
from ..oracle import KP_DTYPE
from ..ops.detect import detect_octave
from ..ops.orient_desc import assign_orientations, compute_descriptors, gradient_planes
from ..ops.pyramid import (build_scale_space_and_masks_jax,
                           build_scale_space_jax)


class KeypointBuffer(NamedTuple):
    """Fixed-capacity keypoint output (the functional analog of the
    reference's keypoint recarray, with a validity mask instead of a count)."""

    x: jnp.ndarray        # (cap,) f32 column in input-image coords
    y: jnp.ndarray        # (cap,) f32 row in input-image coords
    scale: jnp.ndarray    # (cap,) f32 absolute sigma in input-image coords
    angle: jnp.ndarray    # (cap,) f32 in (-pi, pi]
    desc: jnp.ndarray     # (cap, 128) uint8
    valid: jnp.ndarray    # (cap,) bool
    counts: jnp.ndarray   # (n_octaves, 2) int32 true (extrema, oriented) counts


def octave_capacities(shape: Tuple[int, int], cfg: SiftConfig) -> List[Tuple[int, int]]:
    """(candidate_cap, descriptor_cap) per octave, shrinking with resolution.

    kp_per_octave_cap bounds octave 0 and halves per octave (floor 128):
    keypoint density drops ~4x per octave, and on TPU unused capacity is not
    free — every slot is a (skipped) grid step of the per-keypoint kernels.
    """
    h, w = shape
    if cfg.double_im_size:
        h, w = 2 * h, 2 * w
    caps = []
    cap_bound = cfg.kp_per_octave_cap
    for _ in range(cfg.n_octaves(shape)):
        cap = int(min(cap_bound, max(h * w // cfg.pix_per_kp, 64)))
        cap = (cap + 63) // 64 * 64
        dcap = cap + cap // 2
        caps.append((cap, dcap))
        h, w = h // 2, w // 2
        cap_bound = max(cap_bound // 2, 128)
    return caps


def _resolve_kp_backend(cfg: SiftConfig) -> str:
    from ..ops.orient_desc import _desc_window_size, _ori_window_size

    be = cfg.kp_backend
    if be == "auto":
        be = "pallas" if on_tpu() else "xla"
    if be == "pallas" and max(_ori_window_size(cfg), _desc_window_size(cfg)) > 128:
        # The Pallas window kernels hold a keypoint window in (win, 128)
        # lanes; configs whose window exceeds 128 (e.g. init_sigma=1.8,
        # scales=2) must take the XLA path to stay correct.
        be = "xla"
    return be


def detect_and_describe(img: jnp.ndarray, cfg: SiftConfig) -> KeypointBuffer:
    """The full forward pass (reference: SiftPlan.keypoints, SURVEY.md §3.2).

    Two equivalent compute paths per stage (same numerics, SURVEY.md §4
    oracle strategy): "xla" (vectorized jnp, runs anywhere) and "pallas"
    (TPU kernels in ops/pallas/ — the production path; the XLA gathers and
    nonzero-compaction are pathological on TPU).
    """
    octaves, masks = build_scale_space_and_masks_jax(img, cfg)
    return describe_octaves(octaves, img.shape[:2], cfg, masks=masks)


def describe_octaves(octaves, shape: Tuple[int, int],
                     cfg: SiftConfig, masks=None) -> KeypointBuffer:
    """Detection + orientation + descriptors over a prebuilt scale space.

    Split out of `detect_and_describe` so the pyramid stage and this stage
    can run on DIFFERENT devices (parallel/pipeline_octaves.py — PP).
    masks: optional fused in-ladder extrema masks
    (ops.pyramid.build_scale_space_and_masks_jax)."""
    use_pallas = _resolve_kp_backend(cfg) == "pallas"
    caps = octave_capacities(shape, cfg)
    if use_pallas and cfg.kp_multi_launch:
        return _describe_octaves_pallas(octaves, caps, cfg, masks=masks)
    if use_pallas:
        return _describe_octaves_pallas_per_octave(octaves, caps, cfg)

    xs, ys, scales_, angles, descs, valids, counts = [], [], [], [], [], [], []
    octsize = 0.5 if cfg.double_im_size else 1.0
    for o, (blurs, dogs) in enumerate(octaves):
        cap, dcap = caps[o]
        mags, oris = gradient_planes(blurs, cfg)
        kps = detect_octave(dogs, cfg, o, cap)
        extrema_count = jnp.sum(kps.valid.astype(jnp.int32))
        okps = assign_orientations(mags, oris, kps, cfg, dcap,
                                   max_ori=cfg.max_ori)
        desc = compute_descriptors(mags, oris, okps, cfg)
        sigma_oct = cfg.init_sigma * 2.0 ** (okps.fs / cfg.scales)
        xs.append(okps.fc * octsize)
        ys.append(okps.fr * octsize)
        scales_.append(sigma_oct * octsize)
        angles.append(okps.angle)
        descs.append(desc)
        valids.append(okps.valid)
        counts.append(jnp.stack([extrema_count, okps.count]))
        octsize *= 2.0
    return KeypointBuffer(
        x=jnp.concatenate(xs),
        y=jnp.concatenate(ys),
        scale=jnp.concatenate(scales_),
        angle=jnp.concatenate(angles),
        desc=jnp.concatenate(descs),
        valid=jnp.concatenate(valids),
        counts=jnp.stack(counts),
    )


def _describe_octaves_pallas_per_octave(octaves, caps,
                                        cfg: SiftConfig) -> KeypointBuffer:
    """Per-octave launch variant (cfg.kp_multi_launch=False): one detect and
    one fused orientation+descriptor launch per octave."""
    from ..ops.detect import detect_octave_pallas
    from ..ops.orient_desc import orient_and_describe_fused_pallas
    from ..ops.pallas.window import pad_grad_planes

    xs, ys, scales_, angles, descs, valids, counts = [], [], [], [], [], [], []
    octsize = 0.5 if cfg.double_im_size else 1.0
    for o, (blurs, dogs) in enumerate(octaves):
        cap, dcap = caps[o]
        mags, oris = gradient_planes(blurs, cfg)
        kps, _raw = detect_octave_pallas(
            dogs, cfg, o, cap, interpret=cfg.pallas_interpret
        )
        extrema_count = jnp.sum(kps.valid.astype(jnp.int32))
        mag_p, ori_p = pad_grad_planes(mags, oris)
        okps, desc = orient_and_describe_fused_pallas(
            mag_p, ori_p, kps, cfg, max_ori=cfg.max_ori,
            interpret=cfg.pallas_interpret,
        )
        sigma_oct = cfg.init_sigma * 2.0 ** (okps.fs / cfg.scales)
        xs.append(okps.fc * octsize)
        ys.append(okps.fr * octsize)
        scales_.append(sigma_oct * octsize)
        angles.append(okps.angle)
        descs.append(desc)
        valids.append(okps.valid)
        counts.append(jnp.stack([extrema_count, okps.count]))
        octsize *= 2.0
    return KeypointBuffer(
        x=jnp.concatenate(xs),
        y=jnp.concatenate(ys),
        scale=jnp.concatenate(scales_),
        angle=jnp.concatenate(angles),
        desc=jnp.concatenate(descs),
        valid=jnp.concatenate(valids),
        counts=jnp.stack(counts),
    )


def _describe_octaves_pallas(octaves, caps, cfg: SiftConfig,
                             max_ori: int = None,
                             oct_ids=None, masks=None) -> KeypointBuffer:
    """Pallas production path: one multi-octave compact launch, one
    atlas-refine launch (ops.detect.detect_all_octaves_pallas), and one
    fused orientation+descriptor launch over a gradient-plane atlas (the
    per-octave row offset is folded into the keypoint row coordinate, so
    the single-octave kernel serves every octave branch-free).  The atlas
    itself comes from the fused gradient+pad kernel
    (ops/pallas/gradpad.py) unless cfg.grad_backend == "xla"."""
    from ..ops.detect import detect_all_octaves_pallas
    from ..ops.orient_desc import _desc_window_size, quantize_descriptors
    from ..ops.pallas.gradpad import grad_atlas_pallas
    from ..ops.pallas.window import build_grad_atlas, orient_desc_fused_pallas

    if max_ori is None:
        max_ori = cfg.max_ori
    if oct_ids is None:
        oct_ids = list(range(len(octaves)))
    interp = cfg.pallas_interpret
    detected = detect_all_octaves_pallas(
        [dogs for _, dogs in octaves], cfg, [c for c, _ in caps],
        interpret=interp, oct_ids=oct_ids, masks=masks,
    )
    if cfg.grad_backend == "pallas":
        mag_a, ori_a, row_starts = grad_atlas_pallas(
            [blurs for blurs, _ in octaves], cfg.scales, interpret=interp,
        )
    else:
        mag_l, ori_l = [], []
        for blurs, _ in octaves:
            mags, oris = gradient_planes(blurs, cfg)
            mag_l.append(mags)
            ori_l.append(oris)
        mag_a, ori_a, row_starts = build_grad_atlas(mag_l, ori_l)

    kps_l = [d[0] for d in detected]
    s_cat = jnp.concatenate([k.s_int for k in kps_l])
    fs_cat = jnp.concatenate([k.fs for k in kps_l])
    fr_cat = jnp.concatenate([k.fr for k in kps_l])
    fc_cat = jnp.concatenate([k.fc for k in kps_l])
    valid_cat = jnp.concatenate([k.valid for k in kps_l])
    row_off_cat = jnp.concatenate([
        jnp.full((caps[o][0],), row_starts[o], jnp.int32)
        for o in range(len(octaves))
    ])
    sigma_cat = cfg.init_sigma * 2.0 ** (fs_cat / cfg.scales)
    win = _desc_window_size(cfg)
    use_buckets = False
    if cfg.desc_buckets >= 2:
        # split by keypoint sigma: the fused kernel's per-keypoint cost
        # scales with its static window, sized for sigma_max — but fs is
        # roughly uniform over [0.5, scales+0.5], so most keypoints fit a
        # ~2x smaller window.  Two launches over the same slots (each
        # skipping the other bucket via the valid mask), merged by bucket.
        from ..ops.orient_desc import _desc_window_for_sigma

        fs_split = 0.5 * (cfg.scales + 1.0)
        sig_split = cfg.init_sigma * 2.0 ** (fs_split / cfg.scales)
        win_s = _desc_window_for_sigma(cfg, sig_split)
        use_buckets = win_s < win   # if the floor dominates, bucketing is
                                    # an extra launch for nothing
    if use_buckets:
        small = sigma_cat <= jnp.float32(sig_split)
        ang_s, ok_s, raw_s = orient_desc_fused_pallas(
            mag_a, ori_a, s_cat, fr_cat, fc_cat, sigma_cat,
            valid_cat & small, win=win_s, max_ori=max_ori,
            interpret=interp, row_off=row_off_cat,
        )
        ang_l, ok_l, raw_l = orient_desc_fused_pallas(
            mag_a, ori_a, s_cat, fr_cat, fc_cat, sigma_cat,
            valid_cat & jnp.logical_not(small), win=win, max_ori=max_ori,
            interpret=interp, row_off=row_off_cat,
        )
        ang = jnp.where(small[:, None], ang_s, ang_l)
        ok = jnp.where(small[:, None], ok_s, ok_l)
        raw = jnp.where(small[:, None, None], raw_s, raw_l)
    else:
        ang, ok, raw = orient_desc_fused_pallas(
            mag_a, ori_a, s_cat, fr_cat, fc_cat, sigma_cat, valid_cat,
            win=win, max_ori=max_ori, interpret=interp, row_off=row_off_cat,
        )
    desc = quantize_descriptors(raw.reshape(-1, 128))

    def rep(x):
        return jnp.repeat(x, max_ori, axis=0)   # slot i*max_ori + o

    base = 0.5 if cfg.double_im_size else 1.0
    octsize_cat = jnp.concatenate([
        jnp.full((caps[o][0],), base * 2.0 ** oct_ids[o], jnp.float32)
        for o in range(len(octaves))
    ])
    counts = []
    off = 0
    for o in range(len(octaves)):
        cap = caps[o][0]
        counts.append(jnp.stack([
            jnp.sum(kps_l[o].valid.astype(jnp.int32)),
            jnp.sum(ok[off : off + cap].astype(jnp.int32)),
        ]))
        off += cap
    return KeypointBuffer(
        x=rep(fc_cat * octsize_cat),
        y=rep(fr_cat * octsize_cat),
        scale=rep(sigma_cat * octsize_cat),
        angle=ang.reshape(-1),
        desc=desc,
        valid=ok.reshape(-1),
        counts=jnp.stack(counts),
    )


def detect_and_describe_batched(imgs: jnp.ndarray,
                                cfg: SiftConfig) -> KeypointBuffer:
    """Batched frontend: B frames through ONE set of detection launches.

    Single-chip throughput mode for the video frontend (BASELINE config 3;
    jax.vmap over the pipeline is blocked by Mosaic — ANY-space refs cannot
    be batched — so batching rides the existing multi-octave atlas
    machinery instead: every frame's octaves are concatenated into one
    entry list, giving ONE compact launch, ONE refine launch, ONE gradient
    atlas and ONE fused orientation+descriptor launch for the whole batch;
    only the pyramid builds stay per-frame).  Per-frame numerics are
    IDENTICAL to detect_and_describe (same kernels, same per-entry
    geometry).

    imgs: (B, H, W).  Returns a KeypointBuffer whose arrays carry a leading
    batch axis: x/y/scale/angle/valid (B, N), desc (B, N, 128),
    counts (B, n_octaves, 2).
    """
    B = imgs.shape[0]
    shape = imgs.shape[1:3]
    caps1 = octave_capacities(shape, cfg)
    n_oct = len(caps1)
    use_pallas = _resolve_kp_backend(cfg) == "pallas"
    if not (use_pallas and cfg.kp_multi_launch):
        # XLA / per-octave paths have no cross-octave launches to amortize
        bufs = [detect_and_describe(imgs[f], cfg) for f in range(B)]
        return KeypointBuffer(*[
            jnp.stack([getattr(b, fld) for b in bufs])
            for fld in KeypointBuffer._fields
        ])
    octs, masks = [], []
    for f in range(B):
        o_f, m_f = build_scale_space_and_masks_jax(imgs[f], cfg)
        octs.extend(o_f)
        masks.extend(m_f if m_f is not None else [None] * len(o_f))
    if all(m is None for m in masks):
        masks = None
    buf = _describe_octaves_pallas(
        octs, caps1 * B, cfg, oct_ids=list(range(n_oct)) * B, masks=masks
    )
    n = buf.x.shape[0] // B
    return KeypointBuffer(
        x=buf.x.reshape(B, n),
        y=buf.y.reshape(B, n),
        scale=buf.scale.reshape(B, n),
        angle=buf.angle.reshape(B, n),
        desc=buf.desc.reshape(B, n, 128),
        valid=buf.valid.reshape(B, n),
        counts=buf.counts.reshape(B, n_oct, 2),
    )


@lru_cache(maxsize=32)
def _jitted_detector(cfg: SiftConfig):
    """Process-wide jitted detector per config.

    One jax.jit wrapper per SiftConfig (frozen dataclass, hashable) so
    every SiftPlan with the same config shares one trace cache and one set
    of compiled executables.  Before this, each plan instance owned its own
    wrapper and re-TRACED the full detection graph (~30-60 s of host work
    for the Pallas path) — measured as 91 s of a 117 s warm 50-frame SfM
    run, since IncrementalSfM constructs a fresh SiftPlan per run.
    """
    return jax.jit(partial(detect_and_describe, cfg=cfg))


class SiftPlan:
    """Compile-once SIFT plan (API parity with sift-src/plan.py::SiftPlan).

    >>> plan = SiftPlan(shape=(512, 512), dtype="float32")
    >>> kp = plan.keypoints(img)     # structured array, KP_DTYPE records

    `devicetype` is accepted for signature parity but ignored: JAX owns device
    placement (SURVEY.md §2.1, opencl.py row — "mostly free on TPU").
    """

    def __init__(
        self,
        shape: Optional[Tuple[int, int]] = None,
        dtype="float32",
        template: Optional[np.ndarray] = None,
        config: Optional[SiftConfig] = None,
        devicetype: str = "TPU",
        PIX_PER_KP: Optional[int] = None,
        init_sigma: Optional[float] = None,
        **_ignored,
    ):
        if template is not None:
            shape = template.shape[:2]
            dtype = template.dtype
        if shape is None:
            raise ValueError("provide shape=(h, w) or template=image")
        cfg = config or SiftConfig()
        overrides = {}
        if PIX_PER_KP is not None:
            overrides["pix_per_kp"] = PIX_PER_KP
        if init_sigma is not None:
            overrides["init_sigma"] = init_sigma
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.cfg = cfg
        self._check_memory()
        self._fn = _jitted_detector(cfg)
        # verbose memory/geometry report (reference: plan.py::_calc_memory
        # logs a device-memory breakdown at plan construction)
        logger.info(
            "SiftPlan %s %s: %d octaves, caps %s, kp backend %s, "
            "est. device memory %.1f MiB",
            self.shape, self.dtype, cfg.n_octaves(self.shape),
            octave_capacities(self.shape, cfg), _resolve_kp_backend(cfg),
            self.calc_memory() / 2**20,
        )

    def calc_memory(self) -> int:
        """Estimated peak device bytes for this plan's arrays (reference:
        plan.py::_calc_memory — the reference raises before allocating an
        image that cannot fit; we pre-check the same way instead of failing
        deep inside Mosaic).  Counts the blur/DoG stacks, gradient planes and
        their Pallas DMA padding, and the keypoint buffers, all f32."""
        cfg = self.cfg
        h, w = self.shape
        if cfg.double_im_size:
            h, w = 2 * h, 2 * w
        total = h * w * 4 * 2  # input + normalized/doubled base
        caps = octave_capacities(self.shape, cfg)
        for cap, dcap in caps:
            blur_dog = (cfg.n_scale_imgs + cfg.n_dogs) * h * w * 4
            grads = 2 * cfg.scales * h * w * 4
            # pad_grad_planes: +2*PAD_R rows, +2*PAD_C cols per plane
            grads_pad = 2 * cfg.scales * (h + 160) * (w + 512) * 4
            kp_bufs = (cap * 8 + dcap * (8 + 128)) * 4
            total += blur_dog + grads + grads_pad + kp_bufs
            h, w = (h + 1) // 2, (w + 1) // 2
        return total

    def _check_memory(self, limit_bytes: Optional[int] = None):
        need = self.calc_memory()
        if limit_bytes is None:
            try:
                stats = jax.devices()[0].memory_stats() or {}
                limit_bytes = stats.get("bytes_limit", 0) or 0
            except Exception:  # noqa: BLE001 — backends without memory_stats
                limit_bytes = 0
            if not limit_bytes:
                limit_bytes = 16 << 30  # v5e HBM
        if need > limit_bytes:
            raise MemoryError(
                f"SiftPlan{self.shape}: estimated {need / 2**30:.2f} GiB of "
                f"device arrays exceeds the {limit_bytes / 2**30:.2f} GiB "
                "limit (reference parity: plan.py::_calc_memory pre-check)"
            )

    def compile(self) -> "SiftPlan":
        """Force ahead-of-time compilation (the reference does this in __init__)."""
        dummy = jnp.zeros(self.shape, dtype=jnp.float32)
        self._fn.lower(dummy).compile()
        return self

    def keypoints_raw(self, image) -> KeypointBuffer:
        """Device-resident fixed-capacity result (for fused downstream use)."""
        img = jnp.asarray(image)
        if img.shape[:2] != self.shape:
            raise ValueError(f"image shape {img.shape[:2]} != plan shape {self.shape}")
        return self._fn(img)

    def keypoints(self, image) -> np.ndarray:
        """Host-side structured keypoint array (reference output format)."""
        buf = jax.device_get(self.keypoints_raw(image))
        m = buf.valid
        n = int(m.sum())
        out = np.zeros(n, dtype=KP_DTYPE)
        out["x"] = buf.x[m]
        out["y"] = buf.y[m]
        out["scale"] = buf.scale[m]
        out["angle"] = buf.angle[m]
        out["desc"] = buf.desc[m]
        return out

    __call__ = keypoints

    def log_profile(self):
        """Parity shim for the reference's event-profiling report
        (reference: plan.py::log_profile).  Under XLA there is one fused
        program; use utils.profiling.stage_times for a per-stage breakdown."""
        from ..utils.profiling import stage_times

        return stage_times(self)
