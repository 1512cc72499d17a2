"""Incremental SfM over an image sequence (BASELINE.json config 4:
two-view init + sequential registration + pose graph + bundle adjustment).

Host-orchestrated over jitted kernels: the SIFT frontend, matcher, RANSAC,
PnP and BA all run on device with static shapes; the host keeps the growing
map (points, descriptors, observation table) in NumPy and pads device inputs
to power-of-two buckets so jit recompiles O(log) times as the map grows.

New subsystem — no reference counterpart (SURVEY.md §2.3).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SiftConfig
from ..models.sift import SiftPlan
from ..ops.match import match_descriptors_jax
from .ba import BAObs, BAParams, run_ba
from .geometry import pose_compose
from .pnp import ransac_pnp
from .twoview import initialize_two_view

logger = logging.getLogger(__name__)


def _say(verbose: bool, msg: str, *args):
    """Runtime observability (reference parity: per-module logging)."""
    logger.info(msg, *args)
    if verbose:
        print(msg % args if args else msg)


def _pow2_pad(n: int, floor: int = 256) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


@dataclass
class SfMResult:
    Rs: np.ndarray                 # (F,3,3) world-to-camera
    ts: np.ndarray                 # (F,3)
    points: np.ndarray             # (P,3)
    n_obs: int
    frames_registered: List[int] = field(default_factory=list)


class IncrementalSfM:
    """Sequential SfM: bootstrap pair -> PnP registration -> triangulate new
    points -> periodic + final BA."""

    def __init__(
        self,
        K: np.ndarray,
        frame_shape,
        cfg: Optional[SiftConfig] = None,
        min_boot_flow_px: float = 8.0,
        min_matches: int = 30,
        reproj_px: float = 3.0,
        ba_every: int = 8,
        ratio_sq: float = 0.7,
        seed: int = 0,
        loop_closure: bool = True,
        loop_min_inliers: int = 15,
        map_match_window: Optional[int] = None,
        reloc_fallback: bool = True,
    ):
        self.K = np.asarray(K, np.float32)
        self.cfg = cfg or SiftConfig()
        self.sift = SiftPlan(shape=frame_shape, config=self.cfg)
        self.min_boot_flow = min_boot_flow_px
        self.min_matches = min_matches
        self.reproj_px = reproj_px
        self.ba_every = ba_every
        # looser ratio than the pairwise default 0.5329: SfM matching is
        # outlier-gated downstream by RANSAC-PnP / reprojection checks
        self.ratio_sq = ratio_sq
        self.key = jax.random.key(seed)
        # loop closure (BASELINE config 4 "pose graph"): after sequential
        # registration, re-match late frames against the oldest map points
        # (bootstrap-anchored, hence drift-free up to gauge), turn accepted
        # PnP poses into pose-graph edges, optimize, and re-anchor the map.
        self.loop_closure = loop_closure
        self.loop_min_inliers = loop_min_inliers
        # when set, sequential PnP matches only points first observed in the
        # last W cameras (local-map tracking as real-time systems do); global
        # anchoring then comes from loop closure alone
        self.map_match_window = map_match_window
        # full-map retry when the windowed match starves (revisits)
        self.reloc_fallback = reloc_fallback
        self.n_loop_edges = 0

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _match(self, d1, d2):
        """Padded-bucket descriptor matching; returns (M,2) int indices."""
        n1, n2 = len(d1), len(d2)
        if n1 == 0 or n2 == 0:
            return np.zeros((0, 2), np.int32)
        p1, p2 = _pow2_pad(n1), _pow2_pad(n2)
        d1p = np.zeros((p1, 128), np.uint8)
        d1p[:n1] = d1
        d2p = np.zeros((p2, 128), np.uint8)
        d2p[:n2] = d2
        v1 = np.arange(p1) < n1
        v2 = np.arange(p2) < n2
        res = match_descriptors_jax(
            jnp.asarray(d1p), jnp.asarray(v1), jnp.asarray(d2p), jnp.asarray(v2),
            ratio_sq=self.ratio_sq,
        )
        m = np.asarray(res.valid)
        return np.stack([np.asarray(res.idx1)[m], np.asarray(res.idx2)[m]], 1)

    def run(self, frames, verbose: bool = False) -> Optional[SfMResult]:
        F = len(frames)
        kps = [self.sift.keypoints(np.asarray(f)) for f in frames]
        K = jnp.asarray(self.K)

        # --- bootstrap: frame 0 against the best-baseline frame ---
        # prefer the first frame meeting both gates (enough inliers AND enough
        # parallax); if none does, fall back to the candidate maximizing
        # inliers * flow (baseline-vs-coverage tradeoff)
        boot = None
        fallback = None
        fallback_score = 0.0
        for b in range(1, F):
            m = self._match(kps[0]["desc"], kps[b]["desc"])
            if len(m) < max(self.min_matches // 2, 10):
                continue
            uv0 = np.stack([kps[0]["x"][m[:, 0]], kps[0]["y"][m[:, 0]]], 1)
            uvb = np.stack([kps[b]["x"][m[:, 1]], kps[b]["y"][m[:, 1]]], 1)
            flow = float(np.median(np.linalg.norm(uvb - uv0, axis=1)))
            n = _pow2_pad(len(m))
            uv0p = np.zeros((n, 2), np.float32)
            uv0p[: len(m)] = uv0
            uvbp = np.zeros((n, 2), np.float32)
            uvbp[: len(m)] = uvb
            vp = np.arange(n) < len(m)
            init = initialize_two_view(
                self._next_key(), K, jnp.asarray(uv0p), jnp.asarray(uvbp),
                jnp.asarray(vp), thresh_px=self.reproj_px,
            )
            n_inl = int(init.n_inliers)
            if n_inl >= self.min_matches and flow >= self.min_boot_flow:
                boot = (b, m, uv0, uvb, init)
                break
            score = n_inl * flow
            if n_inl >= max(self.min_matches // 2, 10) and score > fallback_score:
                fallback = (b, m, uv0, uvb, init)
                fallback_score = score
        if boot is None:
            boot = fallback
        if boot is None:
            return None
        b, m, uv0, uvb, init = boot
        _say(verbose, "bootstrap: frames (0, %d), %d inliers",
             b, int(init.n_inliers))

        # --- map state (host) ---
        inl = np.asarray(init.inliers)[: len(m)]
        map_X = np.asarray(init.points)[: len(m)][inl].astype(np.float32)
        map_desc = kps[0]["desc"][m[inl, 0]]
        obs_cam, obs_pt, obs_uv = [], [], []
        for pi, (i0, ib) in enumerate(m[inl]):
            obs_cam += [0, 1]
            obs_pt += [pi, pi]
            obs_uv += [
                [kps[0]["x"][i0], kps[0]["y"][i0]],
                [kps[b]["x"][ib], kps[b]["y"][ib]],
            ]
        cam_of_frame = {0: 0, b: 1}
        Rs = [np.eye(3, dtype=np.float32), np.asarray(init.R, np.float32)]
        ts = [np.zeros(3, np.float32), np.asarray(init.t, np.float32)]
        frames_reg = [0, b]
        pt_first_cam = np.zeros(len(map_X), np.int32)  # all bootstrap points

        # --- sequential registration of the remaining frames ---
        order = [f for f in range(1, F) if f != b]
        order = [f for f in order if f > b] + [f for f in order if f < b]
        for f in sorted(set(order)):
            if self.map_match_window is not None:
                lo = max(0, len(Rs) - self.map_match_window)
                sel = np.nonzero(pt_first_cam >= lo)[0]
                mm = self._match(map_desc[sel], kps[f]["desc"])
                if len(mm):
                    mm = np.stack([sel[mm[:, 0]], mm[:, 1]], 1)
                # relocalization fallback (r4): when windowed matching
                # starves — typically a revisit whose overlap is with OLD
                # map points outside the window (out-and-back sequences) —
                # retry against the full map rather than dropping the frame.
                # One starved frame otherwise cascades: the next frame's
                # window shifts onto the same stale points and the rest of
                # the sequence never registers (measured: a single marginal
                # triangulation flip cost 3 of 12 registrations).
                if len(mm) < 12 and self.reloc_fallback:
                    mm_full = self._match(map_desc, kps[f]["desc"])
                    if len(mm_full) > len(mm):
                        _say(verbose,
                             "frame %d: windowed match starved (%d), "
                             "relocalizing vs full map (%d)",
                             f, len(mm), len(mm_full))
                        mm = mm_full
            else:
                mm = self._match(map_desc, kps[f]["desc"])
            if len(mm) < 12:
                _say(verbose, "frame %d: only %d map matches, skipped",
                     f, len(mm))
                continue
            n = _pow2_pad(len(mm))
            Xp = np.zeros((n, 3), np.float32)
            Xp[: len(mm)] = map_X[mm[:, 0]]
            uvp = np.zeros((n, 2), np.float32)
            uvp[: len(mm)] = np.stack(
                [kps[f]["x"][mm[:, 1]], kps[f]["y"][mm[:, 1]]], 1
            )
            wp = (np.arange(n) < len(mm)).astype(np.float32)
            R0, t0 = Rs[-1], ts[-1]  # previous registered pose as init
            R, t, inl_f, n_inl = ransac_pnp(
                self._next_key(), K, jnp.asarray(R0), jnp.asarray(t0),
                jnp.asarray(Xp), jnp.asarray(uvp), jnp.asarray(wp),
                thresh_px=self.reproj_px,
            )
            if int(n_inl) < 10:
                _say(verbose, "frame %d: PnP failed (%d inliers)",
                     f, int(n_inl))
                continue
            cam_id = len(Rs)
            cam_of_frame[f] = cam_id
            Rs.append(np.asarray(R, np.float32))
            ts.append(np.asarray(t, np.float32))
            frames_reg.append(f)
            inl_np = np.asarray(inl_f)[: len(mm)]
            for k_, (pi, ki) in enumerate(mm):
                if inl_np[k_]:
                    obs_cam.append(cam_id)
                    obs_pt.append(int(pi))
                    obs_uv.append([kps[f]["x"][ki], kps[f]["y"][ki]])
                    # refresh the map point's descriptor to the newest view so
                    # sequential matching tracks appearance drift
                    map_desc[pi] = kps[f]["desc"][ki]

            # triangulate new points vs the previous registered frame
            prev_f = frames_reg[-2]
            self._triangulate_new(
                kps, f, prev_f, cam_of_frame, Rs, ts, mm,
                map_X, map_desc, obs_cam, obs_pt, obs_uv,
            )
            map_X, map_desc, n_new = self._map_arrays
            if n_new:
                pt_first_cam = np.concatenate(
                    [pt_first_cam,
                     np.full(n_new, cam_of_frame[prev_f], np.int32)]
                )

            # periodic BA
            if len(Rs) % self.ba_every == 0:
                Rs, ts, map_X = self._run_ba(Rs, ts, map_X, obs_cam, obs_pt, obs_uv)
                self._map_arrays = (map_X, map_desc, 0)
            _say(verbose, "frame %d: cam %d, %d PnP inliers, map %d",
                 f, cam_id, int(n_inl), len(map_X))

        # --- loop closure + pose graph (BASELINE config 4) ---
        if self.loop_closure and len(Rs) > 3:
            Rs, ts, map_X = self._pose_graph_close(
                kps, frames_reg, cam_of_frame, Rs, ts,
                map_X, map_desc, pt_first_cam, verbose,
            )

        # --- final global BA ---
        Rs, ts, map_X = self._run_ba(Rs, ts, map_X, obs_cam, obs_pt, obs_uv, iters=25)
        return SfMResult(
            Rs=np.stack(Rs), ts=np.stack(ts), points=map_X,
            n_obs=len(obs_cam), frames_registered=frames_reg,
        )

    # -- helpers -------------------------------------------------------------

    def _triangulate_new(self, kps, f, prev_f, cam_of_frame, Rs, ts, mm,
                         map_X, map_desc, obs_cam, obs_pt, obs_uv):
        """Add map points from f<->prev_f matches not already in the map."""
        from .geometry import triangulate_two_view

        m = self._match(kps[prev_f]["desc"], kps[f]["desc"])
        used_f = set(mm[:, 1].tolist())
        fresh = [(i, j) for i, j in m if j not in used_f]
        if len(fresh) < 5:
            self._map_arrays = (map_X, map_desc, 0)
            return
        fresh = np.array(fresh, np.int32)
        ca, cb = cam_of_frame[prev_f], cam_of_frame[f]
        uva = np.stack([kps[prev_f]["x"][fresh[:, 0]], kps[prev_f]["y"][fresh[:, 0]]], 1)
        uvb = np.stack([kps[f]["x"][fresh[:, 1]], kps[f]["y"][fresh[:, 1]]], 1)
        K = jnp.asarray(self.K)
        X, z1, z2 = triangulate_two_view(
            K, jnp.asarray(Rs[ca]), jnp.asarray(ts[ca]),
            K, jnp.asarray(Rs[cb]), jnp.asarray(ts[cb]),
            jnp.asarray(uva.astype(np.float32)), jnp.asarray(uvb.astype(np.float32)),
        )
        from .geometry import project

        pa, _ = project(K, jnp.asarray(Rs[ca]), jnp.asarray(ts[ca]), X)
        pb, _ = project(K, jnp.asarray(Rs[cb]), jnp.asarray(ts[cb]), X)
        ea = np.linalg.norm(np.asarray(pa) - uva, axis=1)
        eb = np.linalg.norm(np.asarray(pb) - uvb, axis=1)
        ok = (np.asarray(z1) > 1e-3) & (np.asarray(z2) > 1e-3)
        ok &= (ea < self.reproj_px) & (eb < self.reproj_px)
        Xn = np.asarray(X)[ok]
        base = len(map_X)
        if len(Xn):
            map_X = np.concatenate([map_X, Xn.astype(np.float32)])
            map_desc = np.concatenate([map_desc, kps[f]["desc"][fresh[ok, 1]]])
            for k_, (i, j) in enumerate(fresh[ok]):
                obs_cam += [ca, cb]
                obs_pt += [base + k_, base + k_]
                obs_uv += [
                    [kps[prev_f]["x"][i], kps[prev_f]["y"][i]],
                    [kps[f]["x"][j], kps[f]["y"][j]],
                ]
        self._map_arrays = (map_X, map_desc, len(Xn))

    def _pose_graph_close(self, kps, frames_reg, cam_of_frame, Rs, ts,
                          map_X, map_desc, pt_first_cam, verbose=False):
        """Detect loop closures and optimize the pose graph.

        Loop detection: match each late frame's descriptors against the
        OLDEST map points (first observed by the bootstrap cameras — those
        are in the gauge-fixed world frame, so a PnP pose against them is a
        drift-free absolute measurement).  Accepted PnP results become
        strong 0->c pose-graph edges alongside unit-weight odometry edges;
        after sfm.posegraph.optimize_pose_graph, every map point is
        re-anchored through its first-observing camera's correction.
        """
        from .posegraph import PoseGraph, optimize_pose_graph, relative_pose
        from .pnp import ransac_pnp

        C = len(Rs)
        old_mask = pt_first_cam <= 1
        if old_mask.sum() < 20:
            return Rs, ts, map_X
        old_idx = np.nonzero(old_mask)[0]
        ei, ej, eZR, eZt, ew = [], [], [], [], []
        for c in range(1, C):
            ZR, Zt = relative_pose(
                jnp.asarray(Rs[c - 1]), jnp.asarray(ts[c - 1]),
                jnp.asarray(Rs[c]), jnp.asarray(ts[c]),
            )
            ei.append(c - 1)
            ej.append(c)
            eZR.append(np.asarray(ZR))
            eZt.append(np.asarray(Zt))
            ew.append(1.0)
        K = jnp.asarray(self.K)
        n_lc = 0
        for f in frames_reg:
            c = cam_of_frame[f]
            if c <= 1:
                continue
            mm = self._match(map_desc[old_idx], kps[f]["desc"])
            if len(mm) < self.loop_min_inliers:
                continue
            n = _pow2_pad(len(mm))
            Xp = np.zeros((n, 3), np.float32)
            Xp[: len(mm)] = map_X[old_idx[mm[:, 0]]]
            uvp = np.zeros((n, 2), np.float32)
            uvp[: len(mm)] = np.stack(
                [kps[f]["x"][mm[:, 1]], kps[f]["y"][mm[:, 1]]], 1
            )
            wp = (np.arange(n) < len(mm)).astype(np.float32)
            R, t, _inl, n_inl = ransac_pnp(
                self._next_key(), K, jnp.asarray(Rs[c]), jnp.asarray(ts[c]),
                jnp.asarray(Xp), jnp.asarray(uvp), jnp.asarray(wp),
                thresh_px=self.reproj_px,
            )
            if int(n_inl) < self.loop_min_inliers:
                continue
            # T_0 = I, so the absolute PnP pose IS the 0->c edge transform
            ei.append(0)
            ej.append(c)
            eZR.append(np.asarray(R, np.float32))
            eZt.append(np.asarray(t, np.float32))
            ew.append(3.0)
            n_lc += 1
        self.n_loop_edges = n_lc
        if n_lc == 0:
            return Rs, ts, map_X
        graph = PoseGraph(
            i=jnp.asarray(np.asarray(ei, np.int32)),
            j=jnp.asarray(np.asarray(ej, np.int32)),
            Z_R=jnp.asarray(np.stack(eZR)),
            Z_t=jnp.asarray(np.stack(eZt)),
            w=jnp.asarray(np.asarray(ew, np.float32)),
        )
        free = jnp.asarray((np.arange(C) > 0).astype(np.float32))
        R_old = np.stack(Rs)
        t_old = np.stack(ts)
        Rn, tn, cost = optimize_pose_graph(
            jnp.asarray(R_old), jnp.asarray(t_old), graph, free,
            iters=20, huber=10.0,
        )
        Rn = np.asarray(Rn, np.float32)
        tn = np.asarray(tn, np.float32)
        self._pgo_debug = (R_old, t_old, Rn, tn,
                           [np.stack(eZR[C - 1:]), np.stack(eZt[C - 1:]),
                            ej[C - 1:]] if n_lc else None)
        _say(verbose, "pose graph: %d loop edges, cost %.4f",
             n_lc, float(cost))
        # re-anchor map points through their first-observing camera:
        # X' = R_new_a^T (R_old_a X + t_old_a - t_new_a)
        a = np.clip(pt_first_cam, 0, C - 1)
        Xc = np.einsum("pij,pj->pi", R_old[a], map_X) + t_old[a]
        map_X = np.einsum("pji,pj->pi", Rn[a], Xc - tn[a]).astype(np.float32)
        return [Rn[i] for i in range(C)], [tn[i] for i in range(C)], map_X

    def _run_ba(self, Rs, ts, map_X, obs_cam, obs_pt, obs_uv, iters: int = 12):
        C = len(Rs)
        P = len(map_X)
        M = len(obs_cam)
        Mp = _pow2_pad(M)
        Pp = _pow2_pad(P)
        uv = np.zeros((Mp, 2), np.float32)
        uv[:M] = np.asarray(obs_uv, np.float32)
        cam = np.zeros(Mp, np.int32)
        cam[:M] = obs_cam
        pt = np.zeros(Mp, np.int32)
        pt[:M] = obs_pt
        w = np.zeros(Mp, np.float32)
        w[:M] = 1.0
        Xp = np.zeros((Pp, 3), np.float32)
        Xp[:P] = map_X
        params = BAParams(
            jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ts)), jnp.asarray(Xp)
        )
        obs = BAObs(jnp.asarray(uv), jnp.asarray(cam), jnp.asarray(pt), jnp.asarray(w))
        params, _ = run_ba(
            params, obs, jnp.asarray(self.K), fixed_cams=(0,), iters=iters,
            huber_px=self.reproj_px,
        )
        Rs = [np.asarray(params.Rs[i]) for i in range(C)]
        ts = [np.asarray(params.ts[i]) for i in range(C)]
        return Rs, ts, np.asarray(params.X[:P])
