"""Local mapping: per-keyframe map refinement.

Replaces the reference ``LocalMapping`` thread (``LocalMapping.cc:64-283``)
as a synchronous (or host-async) phase invoked after keyframe insertion:

  ProcessNewKeyFrame → MapPointCulling → CreateNewMapPoints (epipolar
  triangulation) → local BA (Schur) → KeyFrameCulling.

The mapping plane is independent of tracking's latency budget; on real
deployments it runs as an async dispatch on a second computation stream
(the tracking plane only consumes updated arrays at frame boundaries).
"""

from __future__ import annotations

import functools

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import SlamConfig
from orb_slam3_rgbl_tpu.geometry import lie, triangulation
from orb_slam3_rgbl_tpu.geometry import camera as cam_mod
from orb_slam3_rgbl_tpu.ops import matching
from orb_slam3_rgbl_tpu.optim import local_ba
from orb_slam3_rgbl_tpu.slam.frame import inv_scale_sigma2
from orb_slam3_rgbl_tpu.slam.map_state import MapState

BA_POSES_CAP = 24       # optimized + fixed window sizes (static shapes)
BA_LM_CAP = 8192
BA_OBS_CAP = 8          # D — max obs per landmark inside the window
TRI_CAP = 256           # compacted triangulations downloaded per neighbor


class DeviceKfCache:
    """Device-resident mirror of keyframe FEATURE arrays.

    The mapping plane's batched kernels (Fuse projection, triangulation)
    need the uv/descriptor/octave/angle blocks of ~16 keyframes per call;
    re-uploading them from the host map cost ~1.5 MB (≈ 200 ms on the
    measurement tunnel) per keyframe. Features are immutable once a
    keyframe exists (reference KeyFrame: features const, pose mutable),
    so they are appended here ONCE — in the fused path straight from the
    device-resident extraction output, zero host round-trip — and every
    kernel gathers by keyframe id on device. Poses stay host-authoritative
    (BA rewrites them) and ride in as a small per-call argument."""

    def __init__(self, n_feat: int, cap: int = 128):
        self.n_feat = n_feat
        self.cap = cap
        self.have = set()
        self._alloc(cap)

    def _alloc(self, cap):
        self.d_uv = jnp.zeros((cap, self.n_feat, 2), jnp.float32)
        self.d_desc = jnp.zeros((cap, self.n_feat, 8), jnp.uint32)
        self.d_oct = jnp.zeros((cap, self.n_feat), jnp.int32)
        self.d_angle = jnp.zeros((cap, self.n_feat), jnp.float32)
        self.d_valid = jnp.zeros((cap, self.n_feat), bool)
        self.d_ur = jnp.zeros((cap, self.n_feat), jnp.float32)

    def _grow(self, need):
        cap = self.cap
        while cap < need:
            cap *= 2
        pad = cap - self.cap

        def g(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])

        (self.d_uv, self.d_desc, self.d_oct, self.d_angle, self.d_valid,
         self.d_ur) = (
            g(self.d_uv), g(self.d_desc), g(self.d_oct), g(self.d_angle),
            g(self.d_valid), g(self.d_ur))
        self.cap = cap

    def reset(self):
        """Invalidate after an id remap (atlas merge) — entries backfill
        lazily from the host map on next use."""
        self.have.clear()

    def ensure(self, m: MapState, ids):
        """Backfill any keyframes missing from the device mirror (maps
        built before the cache attached, classic-path creations, loads)."""
        for k in ids:
            k = int(k)
            if k not in self.have:
                self.add(k, _HostFeats(
                    uv=m.kf_uv[k], desc=m.kf_desc[k],
                    octave=m.kf_octave[k].astype(np.int32),
                    angle=m.kf_angle[k], valid=m.kf_feat_valid[k],
                    u_right=m.kf_ur[k]))

    def add(self, kf_id: int, feats):
        """Register keyframe features (FrameFeatures, device or host)."""
        if kf_id >= self.cap:
            self._grow(kf_id + 1)
        self.have.add(int(kf_id))
        self.d_uv = self.d_uv.at[kf_id].set(
            jnp.asarray(feats.uv, jnp.float32))
        self.d_desc = self.d_desc.at[kf_id].set(jnp.asarray(feats.desc))
        self.d_oct = self.d_oct.at[kf_id].set(
            jnp.asarray(feats.octave).astype(jnp.int32))
        self.d_angle = self.d_angle.at[kf_id].set(
            jnp.asarray(feats.angle, jnp.float32))
        self.d_valid = self.d_valid.at[kf_id].set(jnp.asarray(feats.valid))
        self.d_ur = self.d_ur.at[kf_id].set(
            jnp.asarray(feats.u_right, jnp.float32))


class _HostFeats:
    def __init__(self, uv, desc, octave, angle, valid, u_right):
        (self.uv, self.desc, self.octave, self.angle, self.valid,
         self.u_right) = (uv, desc, octave, angle, valid, u_right)


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels"))
def _fuse_project_batch(cam, scale_factor, n_levels, tg_idx, poses, tvalid,
                        d_uv, d_desc, d_oct, d_valid,
                        P, Pdesc, Pmaxd, Pvalid):
    """``ORBmatcher::Fuse`` projection half for up to T target keyframes
    in one XLA program: project the landmark set into every target and
    windowed-match (radius 3·scale at the predicted octave, TH_LOW).

    Target features GATHER from the device keyframe mirror by id
    (``DeviceKfCache``) — no per-call host upload of keyframe blocks.

    Returns (idx (T, cap) int16 matched feature per landmark slot or −1,
    dist (T, cap) f16 — Hamming ≤ 256 is exact in f16; the narrow dtypes
    halve the host download)."""
    uvs = d_uv[tg_idx]
    descs = d_desc[tg_idx]
    octs = d_oct[tg_idx]
    fvalids = d_valid[tg_idx]

    def one(Tcw, uv, desc, octv, fvalid, valid):
        pc = lie.se3_apply(Tcw[None, :], P)
        z = pc[:, 2]
        uvp = cam_mod.geo_project(cam, pc)
        u, v = uvp[:, 0], uvp[:, 1]
        ok = Pvalid & valid & (z > 0.1)
        ok &= (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
        center = lie.se3_trans(lie.se3_inv(Tcw))
        dist_w = jnp.linalg.norm(P - center[None, :], axis=-1)
        ratio = Pmaxd / jnp.maximum(dist_w, 1e-6)
        po = jnp.clip(jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-6))
                               / jnp.log(scale_factor)), 0, n_levels - 1
                      ).astype(jnp.int32)
        radius = 3.0 * scale_factor ** po.astype(jnp.float32)
        proj_uv = jnp.stack([u, v], axis=1)
        idx, dist = matching.windowed_projection_match(
            proj_uv, ok, Pdesc, po, uv, fvalid, desc, octv.astype(jnp.int32),
            radius, th=matching.TH_LOW)
        # halve the download: feature index fits int16, Hamming distance
        # (≤256) fits f16 exactly
        return idx.astype(jnp.int16), dist.astype(jnp.float16)

    return jax.vmap(one)(poses, uvs, descs, octs, fvalids, tvalid)


def fuse_project_targets_async(mapper, tg, P, Pdesc, Pmaxd, Pvalid, TB):
    """Dispatch half: pad target ids/poses to TB slots and ENQUEUE the
    fused projection batch against the device feature mirror. Returns
    device arrays — batch the fetch with other in-flight dispatches
    (each separate fetch pays a full tunnel round trip)."""
    m = mapper.map
    mapper.dev_cache.ensure(m, tg)
    tgp = np.zeros(TB, np.int32)
    tgp[: len(tg)] = tg
    posesp = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (TB, 1))
    posesp[: len(tg)] = m.kf_pose[tg]
    tvalid = np.zeros(TB, bool)
    tvalid[: len(tg)] = True
    c = mapper.dev_cache
    return _fuse_project_batch(
        mapper.geo_cam, float(mapper.cfg.orb.scale_factor),
        mapper.cfg.orb.n_levels,
        jnp.asarray(tgp), jnp.asarray(posesp), jnp.asarray(tvalid),
        c.d_uv, c.d_desc, c.d_oct, c.d_valid,
        jnp.asarray(P), jnp.asarray(Pdesc), jnp.asarray(Pmaxd),
        jnp.asarray(Pvalid),
    )


def fuse_project_targets(mapper, tg, P, Pdesc, Pmaxd, Pvalid, TB):
    """Dispatch + fetch in one call (single-batch call sites)."""
    return jax.device_get(fuse_project_targets_async(
        mapper, tg, P, Pdesc, Pmaxd, Pvalid, TB))


@functools.partial(jax.jit, static_argnames=("cam", "scale_factor"))
def _triangulate_batch(cam, scale_factor, kf_idx, T1, unbound1,
                       nb_idx, T2s, unbound2s, pair_valid,
                       d_uv, d_desc, d_oct, d_angle):
    """All CreateNewMapPoints pair-math for up to NB neighbors in one XLA
    program: per-neighbor epipolar-gated mutual matching + DLT
    triangulation + parallax/cheirality/reprojection gates.

    Keyframe features GATHER from the device mirror by id (no per-call
    host upload). Results COMPACT on device to ``TRI_CAP`` accepted
    pairs per neighbor — the full (NB, N) idx/ok/X download was ~500 KB
    per keyframe (~40 ms on the measurement tunnel) for a few hundred
    accepted triangulations. Returns (f1 (NB, C) current-feature index
    int16, f2 (NB, C) neighbor-feature index int16, X (NB, C, 3) points,
    cnt (NB,) accepted count)."""
    K = None if cam_mod.is_fisheye(cam) else cam.K
    uv1 = d_uv[kf_idx]
    desc1 = d_desc[kf_idx]
    ang1 = d_angle[kf_idx]
    oct1 = d_oct[kf_idx]
    uv2s = d_uv[nb_idx]
    desc2s = d_desc[nb_idx]
    ang2s = d_angle[nb_idx]
    oct2s = d_oct[nb_idx]
    N = uv1.shape[0]

    def dirs(uv):
        return cam_mod.geo_unproject(cam, uv)

    def reproj_ok(X, Tcw, uv, octv):
        pc = lie.se3_apply(Tcw[None, :], X)
        z = pc[:, 2]
        uvp = cam_mod.geo_project(cam, pc)
        err2 = jnp.sum((uvp - uv) ** 2, axis=-1)
        sigma2 = scale_factor ** (2.0 * octv.astype(jnp.float32))
        return (z > 0.1) & (err2 < 5.991 * sigma2)

    def one(T2, uv2, desc2, ang2, oct2, unbound2, valid):
        d = matching.distance_table(desc1, desc2, unbound1, unbound2 & valid)
        sigma2 = scale_factor ** (2.0 * oct2.astype(jnp.float32))
        if cam_mod.is_fisheye(cam):
            # fisheye epipolar lines are curves in pixel space — gate on
            # bearings with the essential matrix instead (reference
            # KannalaBrandt8::epipolarConstrain works bearing-side too)
            E12 = triangulation.essential_from_poses(T1, T2)
            b1 = dirs(uv1)
            b2 = dirs(uv2)
            ep = triangulation.bearing_sampson_sq(
                E12, b1[:, None, :], b2[None, :, :], cam.fx)
        else:
            F12 = triangulation.fundamental_from_poses(K, K, T1, T2)
            ep = triangulation.epipolar_distance_sq(
                F12, uv1[:, None, :], uv2[None, :, :])
        d = jnp.where(ep < 3.84 * sigma2[None, :], d, 256.0)
        idx, _ = matching.mutual_best_match(
            d, ang1, ang2, th=matching.TH_LOW, ratio=0.8, check_rotation=True)
        matched = idx >= 0
        f2 = jnp.where(matched, idx, 0)
        xn1 = dirs(uv1)
        xn2 = dirs(uv2[f2])
        T1b = jnp.broadcast_to(T1, (N, 7))
        T2b = jnp.broadcast_to(T2, (N, 7))
        cosp = triangulation.parallax_cos(xn1, xn2, T1b, T2b)
        # closed-form inhomogeneous DLT: the batched 4×4 eigh was ~110 ms
        # of the ~125 ms triangulation program (r5 stage probe); the
        # reprojection/parallax gates below reject anything the w=1
        # assumption could degrade
        X = triangulation.triangulate_fast(xn1, xn2, T1b, T2b)
        ok = matched & (cosp > 0) & (cosp < 0.9998)
        ok &= jnp.isfinite(X).all(axis=1)
        Xs = jnp.nan_to_num(X)
        ok &= reproj_ok(Xs, T1, uv1, oct1)
        ok &= reproj_ok(Xs, T2, uv2[f2], oct2[f2])
        ok = ok & valid
        # device-side compaction: accepted pairs first (stable → ascending
        # feature id, matching the old host iteration order)
        order = jnp.argsort(~ok)[:TRI_CAP]
        return (order.astype(jnp.int16),
                f2[order].astype(jnp.int16),
                Xs[order],
                ok.sum().astype(jnp.int32))

    return jax.vmap(one)(T2s, uv2s, desc2s, ang2s, oct2s, unbound2s, pair_valid)


class LocalMapper:
    def __init__(self, config: SlamConfig, map_state: MapState):
        self.cfg = config
        self.cam = config.camera
        self.geo_cam = config.geo_camera  # residual/projection camera model
        self.map = map_state
        # device mirror of keyframe features (fed by the tracker's fused
        # path at KF creation; lazily backfilled from the host map)
        self.dev_cache = DeviceKfCache(map_state.n_features)
        self.inv_sigma2 = np.asarray(inv_scale_sigma2(config.orb.n_levels, config.orb.scale_factor))
        self.recent_lm: list = []   # (lm_ids, created_at_kf) for culling
        self.is_mono = config.sensor in (0, 3)  # MONOCULAR / IMU_MONOCULAR
        self.timer = None           # StageTimer (REGISTER_TIMES LocalMapping
        #   taxonomy: kf_insert/mp_cull/mp_create/lba/kf_cull)
        self._last_job_s = 0.0      # wall time of the previous mapping job
        self.lba_budget_s = 0.4     # above this, LBA iterations throttle
        self.obs_cap = BA_OBS_CAP   # D — observers kept per landmark in
        #   local BA (reference keeps EVERY observer; the cap is a TPU
        #   static-shape budget — measured via BENCH_OBS_CAP)
        self.backlog_fn = None      # wired by System: keyframes queued
        #   behind this job (reference mbAbortBA pressure signal)
        self._lba_skipped = 0       # consecutive skips under backlog
        self.bad_imu = False        # reference mbBadImu: motion-starved
        #   VI init → System resets the active map (LocalMapping.cc:144)
        self._t_init = 0.0          # accumulated well-excited time (mTinit)

    def _stage(self, name):
        import contextlib

        return (self.timer.stage(name) if self.timer is not None
                else contextlib.nullcontext())

    def prewarm(self, lm_tiers=(4096, 8192)):
        """Compile the local-BA solver at every landmark capacity tier the
        run will cross (each tier is its own XLA program — a mid-run tier
        crossing otherwise stalls ~35 s on the measurement tunnel)."""
        for Mw in lm_tiers:
            prob = local_ba.BAProblem(
                poses=jnp.asarray(np.tile(
                    np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
                    (BA_POSES_CAP, 1))),
                pose_fixed=jnp.asarray(np.arange(BA_POSES_CAP) == 0),
                pose_valid=jnp.ones(BA_POSES_CAP, bool),
                landmarks=jnp.zeros((Mw, 3), jnp.float32)
                + jnp.asarray([0.0, 0.0, 10.0], jnp.float32),
                lm_valid=jnp.ones(Mw, bool),
                obs_kf=jnp.zeros((Mw, self.obs_cap), jnp.int32),
                obs_uv=jnp.full((Mw, self.obs_cap, 2), 100.0, jnp.float32),
                obs_ur=jnp.full((Mw, self.obs_cap), -1.0, jnp.float32),
                obs_inv_sigma2=jnp.ones((Mw, self.obs_cap), jnp.float32),
                obs_mask=jnp.ones((Mw, self.obs_cap), bool))
            # NOTE: static kwargs must be passed EXACTLY like the real
            # call sites — this jax version caches omitted-default and
            # explicitly-passed static args as different entries
            local_ba.bundle_adjust(prob, self.geo_cam, iterations=10,
                                   n_iters=1)

    # ------------------------------------------------------------------
    def process_keyframe(self, kf_id: int, run_ba: bool = True):
        import time as _time

        _t0 = _time.perf_counter()
        with self._stage("kf_insert"):
            self.map.update_landmark_stats(np.array([kf_id]))
        with self._stage("mp_cull"):
            self._map_point_culling(kf_id)
        with self._stage("mp_create"):
            self._triangulate_new_points(kf_id)
        with self._stage("loop_fusion"):
            self._search_in_neighbors(kf_id)
        min_kf_for_ba = 2 if self.is_mono else 3
        if run_ba and self.map.n_kf >= min_kf_for_ba:
            # after IMU initialization the mapping-plane BA is the
            # 15-DoF sliding-window LocalInertialBA (reference
            # LocalMapping.cc:149 vs :154 selects by sensor + init state)
            with self._stage("lba"):
                if self.cfg.inertial and self.map.imu_initialized:
                    self._check_vi_excitation(kf_id)
                    self.local_inertial_bundle_adjustment(kf_id)
                else:
                    # pressure-adaptive iteration budget — the reference
                    # ABORTS local BA when the next keyframe arrives
                    # (mbAbortBA, Optimizer.cc:1173: InsertKeyFrame sets
                    # the flag and the solve bails between iterations).
                    # Here the QUEUE BACKLOG throttles the same way:
                    # nothing queued → full 10 iterations; one queued →
                    # short solve; ≥2 queued → abort-at-zero (skip), but
                    # never more than twice in a row so a sustained
                    # backlog cannot starve the window of refinement.
                    backlog = (self.backlog_fn()
                               if self.backlog_fn is not None else 0)
                    if backlog >= 2 and self._lba_skipped < 2:
                        self._lba_skipped += 1
                    else:
                        self._lba_skipped = 0
                        iters = 10 if backlog == 0 else 4
                        self.local_bundle_adjustment(kf_id, n_iters=iters)
        with self._stage("kf_cull"):
            self._keyframe_culling(kf_id)
        self._last_job_s = _time.perf_counter() - _t0

    # ------------------------------------------------------------------
    def _check_vi_excitation(self, kf_id: int):
        """Reference bad-IMU detection (LocalMapping.cc:129-146): after
        IMU init but before VIBA2, a motion-starved stretch (last two
        inter-KF baselines summing < 2 cm within the first 10 s of
        excited time) means the inertial init is unreliable — flag the
        map for reset (``mbBadImu`` → ``ResetActiveMap``)."""
        if getattr(self, "_viba_stage", 0) >= 2:
            return
        m = self.map
        kfs = m.valid_kf_ids()
        kfs = kfs[kfs <= kf_id]
        if kfs.size < 3:
            return
        c = lie.np_se3_centers(m.kf_pose[kfs[-3:]])
        dist = (np.linalg.norm(c[2] - c[1]) + np.linalg.norm(c[1] - c[0]))
        if dist > 0.05:
            self._t_init += float(m.kf_timestamp[kfs[-1]]
                                  - m.kf_timestamp[kfs[-2]])
        if self._t_init < 10.0 and dist < 0.02:
            from orb_slam3_rgbl_tpu.utils.logging import log

            log("Not enough motion for VI initialization — flagging map "
                "for reset (bad IMU)")
            self.bad_imu = True

    # ------------------------------------------------------------------
    def _fuse_into(self, kf: int, lm_ids: np.ndarray, counts: np.ndarray,
                   remap: np.ndarray, cap: int, th: float = 3.0,
                   touched: list = None) -> int:
        """``ORBmatcher::Fuse`` (reference ORBmatcher.cc Fuse overloads):
        project the landmarks into keyframe ``kf``; a windowed descriptor
        match (radius th·scale, TH_LOW) either BINDS an unbound feature or
        REPLACES a duplicate landmark (keep the one with more
        observations — ``MapPoint::Replace``). Mutates ``remap``/bindings;
        returns the number of fusions+bindings."""
        m = self.map
        lm_ids = lm_ids[: cap]
        n = lm_ids.size
        if n == 0:
            return 0
        P = np.zeros((cap, 3), np.float32)
        Pdesc = np.zeros((cap, 8), np.uint32)
        Pvalid = np.zeros(cap, bool)
        Pmaxd = np.ones(cap, np.float32)
        P[:n] = m.lm_pos[lm_ids]
        Pdesc[:n] = m.lm_desc[lm_ids]
        Pmaxd[:n] = m.lm_max_dist[lm_ids]
        Pvalid[:n] = True
        # single-target batch against the device feature mirror (same
        # kernel as the forward pass — projection, PredictScale octave
        # and windowed match all on device)
        idx_b, d_b = fuse_project_targets(
            self, np.asarray([kf], np.int64), P, Pdesc, Pmaxd, Pvalid, TB=1)
        return self._apply_fuse_matches(kf, lm_ids, counts, remap,
                                        idx_b[0], d_b[0], touched=touched)

    def _apply_fuse_matches(self, kf: int, lm_ids: np.ndarray,
                            counts: np.ndarray, remap: np.ndarray,
                            idx: np.ndarray, d: np.ndarray,
                            touched: list = None) -> int:
        """Host half of Fuse: bind unbound features / Replace duplicates
        from a (cap,) projection-match result."""
        m = self.map
        hit = np.nonzero(idx >= 0)[0]
        hit = hit[hit < lm_ids.size]
        if hit.size == 0:
            return 0
        # feature-wise collision resolution: closest projection wins
        order = hit[np.argsort(d[hit], kind="stable")]
        feats_of = idx[order]
        first = np.unique(feats_of, return_index=True)[1]
        win_p, win_f = order[first], feats_of[first]

        src = lm_ids[win_p]
        tgt = m.kf_lm_idx[kf, win_f]
        n_ops = 0
        # unbound features → new observation of the projected landmark;
        # a landmark already observed at ANOTHER slot of this keyframe
        # must not bind twice (reference Fuse checks MapPoint::IsInKeyFrame)
        row = m.kf_lm_idx[kf]
        present = np.zeros(m.capacity_lm, bool)
        present[row[row >= 0]] = True
        free = (tgt < 0) & ~present[src]
        if free.any():
            m.kf_lm_idx[kf, win_f[free]] = src[free]
            n_ops += int(free.sum())
            if touched is not None:
                touched.append(src[free])
        # bound to a different landmark → Replace (more observations wins)
        dup = (~free) & (tgt != src)
        if dup.any():
            a, b = src[dup], tgt[dup]          # a = projected, b = resident
            keep_a = counts[a] >= counts[b]
            winner = np.where(keep_a, a, b)
            loser = np.where(keep_a, b, a)
            fresh = loser != winner
            remap[loser[fresh]] = winner[fresh]
            n_ops += int(fresh.sum())
            if touched is not None:
                touched.append(winner[fresh])
        return n_ops

    def _search_in_neighbors(self, kf_id: int):
        """Reference ``LocalMapping::SearchInNeighbors``
        (LocalMapping.cc:714-824): two-hop covisible duplicate fusion —
        project the new keyframe's landmarks into its extended neighborhood
        and the neighborhood's landmarks back, merging duplicates via
        ``MapPoint::Replace`` and adding missed observations (this is what
        grows covisibility weights and observation counts after
        triangulation)."""
        m = self.map
        nn = 20 if self.is_mono else 10
        hop1 = m.best_covisible(kf_id, nn, min_weight=1)
        targets = set(int(k) for k in hop1)
        for k in hop1[:5]:
            for k2 in m.best_covisible(int(k), 5, min_weight=1):
                if int(k2) != kf_id:
                    targets.add(int(k2))
        # temporal neighbors too (the reference adds the mPrevKF chain in
        # inertial mode, LocalMapping.cc:734-744; duplicates between fully
        # disjoint landmark sets have zero covisibility BY DEFINITION, so
        # recency is the only edge that can seed their fusion)
        recent = m.valid_kf_ids()
        for k in recent[recent < kf_id][-3:]:
            targets.add(int(k))
        targets.discard(kf_id)
        if not targets:
            return
        targets = sorted(targets)

        counts = m.observation_counts()
        remap = np.arange(m.capacity_lm, dtype=np.int32)
        cap = m.n_features
        own = m.kf_lm_idx[kf_id]
        own = np.unique(own[own >= 0])
        n_ops = 0
        touched = []
        # forward (this KF's landmarks into every neighbor) and backward
        # (the neighborhood's landmarks into this KF) are independent
        # gathers: DISPATCH both, then fetch both in ONE round trip —
        # round trips dominate on the shared tunnel queue
        TB = 16
        tg_all = np.asarray(targets[:TB], np.int64)
        fwd_out = None
        own_c = own[:cap]
        if own.size and tg_all.size:
            n = own_c.size
            P = np.zeros((cap, 3), np.float32)
            Pdesc = np.zeros((cap, 8), np.uint32)
            Pmaxd = np.ones(cap, np.float32)
            Pvalid = np.zeros(cap, bool)
            P[:n] = m.lm_pos[own_c]
            Pdesc[:n] = m.lm_desc[own_c]
            Pmaxd[:n] = m.lm_max_dist[own_c]
            Pvalid[:n] = True
            fwd_out = fuse_project_targets_async(
                self, tg_all, P, Pdesc, Pmaxd, Pvalid, TB=TB)
        back = m.kf_lm_idx[np.asarray(targets)]
        back = np.unique(back[back >= 0])
        back = back[~np.isin(back, own)]
        back = back[: 2 * cap]
        bwd_out = None
        if back.size:
            bcap = 2 * cap
            Pb = np.zeros((bcap, 3), np.float32)
            Pbd = np.zeros((bcap, 8), np.uint32)
            Pbm = np.ones(bcap, np.float32)
            Pbv = np.zeros(bcap, bool)
            nb2 = back.size
            Pb[:nb2] = m.lm_pos[back]
            Pbd[:nb2] = m.lm_desc[back]
            Pbm[:nb2] = m.lm_max_dist[back]
            Pbv[:nb2] = True
            bwd_out = fuse_project_targets_async(
                self, np.asarray([kf_id], np.int64), Pb, Pbd, Pbm, Pbv, TB=1)
        fetched = jax.device_get((fwd_out, bwd_out))
        if fetched[0] is not None:
            idx_b, dist_b = fetched[0]
            for a, k2 in enumerate(tg_all):
                n_ops += self._apply_fuse_matches(
                    int(k2), own_c, counts, remap, idx_b[a], dist_b[a],
                    touched=touched)
        if fetched[1] is not None:
            idx1, d1 = fetched[1]
            n_ops += self._apply_fuse_matches(
                kf_id, back, counts, remap, idx1[0], d1[0], touched=touched)

        # apply Replace remaps globally (path-compress chains first)
        changed = remap != np.arange(m.capacity_lm, dtype=np.int32)
        if changed.any():
            for _ in range(4):
                nxt = remap[remap]
                if np.array_equal(nxt, remap):
                    break
                remap = nxt
            bound = m.kf_lm_idx >= 0
            m.kf_lm_idx[bound] = remap[m.kf_lm_idx[bound]]
            losers = np.nonzero(remap != np.arange(m.capacity_lm, dtype=np.int32))[0]
            winners = remap[losers]
            # Replace merges the visibility statistics (MapPoint::Replace)
            np.add.at(m.lm_found, winners, m.lm_found[losers])
            np.add.at(m.lm_visible, winners, m.lm_visible[losers])
            with m.alloc_lock:
                m.lm_valid[losers] = False
                m.lm_gen[losers] += 1
                m.lm_free.extend(int(i) for i in losers)
        if n_ops:
            # a keyframe may now bind one landmark at two feature slots
            # (Replace remap collisions) — restore the one-obs-per-pair
            # invariant after EVERY fusion pass, not only on Replace
            from orb_slam3_rgbl_tpu.slam.map_state import dedup_kf_bindings

            dedup_kf_bindings(m)
            # refresh distinctive descriptors / normals / depth bands of
            # the landmarks actually touched (reference updates per fused
            # point; refreshing the whole neighborhood cost ~100 ms/KF)
            ids = (np.unique(np.concatenate(touched)) if touched
                   else np.zeros(0, np.int64))
            ids = remap[np.clip(ids, 0, m.capacity_lm - 1)]
            m.update_landmark_stats(lm_ids=ids)
            m.version += 1

    # ------------------------------------------------------------------
    def _map_point_culling(self, kf_id: int):
        """Reference ``MapPointCulling`` (LocalMapping.cc:346-386): kill
        landmarks with found/visible < 0.25, or with < 3 observations
        after 2 keyframes."""
        if not self.recent_lm:
            self._note_new_landmarks(kf_id)
            return
        counts = self.map.observation_counts()
        keep_list = []
        for lm_ids, born_kf in self.recent_lm:
            lm_ids = lm_ids[self.map.lm_valid[lm_ids]]
            age = self.map.n_kf - born_kf
            ratio = self.map.lm_found[lm_ids] / np.maximum(self.map.lm_visible[lm_ids], 1)
            bad = ratio < 0.25
            if age >= 2:
                bad |= counts[lm_ids] < 3
            self.map.remove_landmarks(lm_ids[bad])
            if age < 3:
                keep_list.append((lm_ids[~bad], born_kf))
        self.recent_lm = keep_list
        self._note_new_landmarks(kf_id)

    def _note_new_landmarks(self, kf_id: int):
        ids = self.map.kf_lm_idx[kf_id]
        ids = ids[ids >= 0]
        born = ids[self.map.lm_first_kf[ids] == kf_id]
        if born.size:
            self.recent_lm.append((born.copy(), self.map.n_kf))

    # ------------------------------------------------------------------
    def _triangulate_new_points(self, kf_id: int, n_neighbors: int = 0):
        """Reference ``CreateNewMapPoints`` (LocalMapping.cc:388-713):
        epipolar-gated matching of unbound features against the best
        covisible keyframes, DLT triangulation, parallax/reprojection/
        positive-depth checks. Depth sensors already provide close points,
        so this adds the *far* structure that stabilizes rotation.

        ALL neighbors process in ONE device dispatch (`vmap` over the
        neighbor axis) with a single bulk download — the per-neighbor
        loop was round-trip-bound on the TPU tunnel (~0.25 s × 10
        neighbors per keyframe)."""
        if n_neighbors <= 0:
            # mono relies on wide-baseline pairs: nn=30 (LocalMapping.cc:391-394)
            n_neighbors = 30 if self.is_mono else 10
        neighbors = self.map.best_covisible(kf_id, n_neighbors, min_weight=1)
        if neighbors.size == 0:
            return
        m = self.map
        unbound1 = (m.kf_lm_idx[kf_id] < 0) & m.kf_feat_valid[kf_id]
        # mono maps have arbitrary scale: gate the baseline against the
        # median scene depth instead of meters (reference
        # LocalMapping.cc:434-446: ratioBaselineDepth > 0.01)
        if self.is_mono:
            lm_here = m.kf_lm_idx[kf_id]
            lm_here = lm_here[lm_here >= 0]
            if lm_here.size == 0:
                return
            center1 = lie.np_se3_centers(m.kf_pose[kf_id])
            med_depth = float(np.median(
                np.linalg.norm(m.lm_pos[lm_here] - center1[None, :], axis=-1)
            ))
            min_baseline = 0.01 * med_depth
        else:
            min_baseline = 0.08
        if unbound1.sum() < 10:
            return

        # pack the neighbor batch (fixed NBB slots, invalid ones masked)
        # and run ONE program + one download — fewer round trips beats
        # smaller programs on the shared tunnel queue (r5 bench audit);
        # keyframe feature blocks gather from the device mirror by id
        NBB = 32 if self.is_mono else 12
        nb_all = neighbors[: (32 if self.is_mono else 12)]
        c1 = lie.np_se3_centers(m.kf_pose[kf_id])
        baselines = np.linalg.norm(
            lie.np_se3_centers(m.kf_pose[nb_all]) - c1[None, :], axis=-1)
        unbound2_all = (m.kf_lm_idx[nb_all] < 0) & m.kf_feat_valid[nb_all]
        pv_all = (baselines >= min_baseline) & (unbound2_all.sum(1) >= 10)
        N = m.n_features
        if not pv_all.any():
            return
        self.dev_cache.ensure(m, np.concatenate([[kf_id], nb_all]))
        c = self.dev_cache
        import time as _time

        _t0 = _time.perf_counter()
        outs = []
        for s in range(0, len(nb_all), NBB):
            nb = nb_all[s: s + NBB]
            pv = pv_all[s: s + NBB]
            if not pv.any():
                outs.append(None)
                continue

            def padnb(a, fill=0):
                out = np.full((NBB,) + a.shape[1:], fill, a.dtype)
                out[: len(nb)] = a
                return out

            pair_valid = np.zeros(NBB, bool)
            pair_valid[: len(nb)] = pv
            nb_idx = np.zeros(NBB, np.int32)
            nb_idx[: len(nb)] = nb
            outs.append(_triangulate_batch(
                self.geo_cam, float(self.cfg.orb.scale_factor),
                jnp.asarray(np.int32(kf_id)), jnp.asarray(m.kf_pose[kf_id]),
                jnp.asarray(unbound1),
                jnp.asarray(nb_idx), jnp.asarray(padnb(m.kf_pose[nb])),
                jnp.asarray(padnb(unbound2_all[s: s + NBB])),
                jnp.asarray(pair_valid),
                c.d_uv, c.d_desc, c.d_oct, c.d_angle,
            ))
        fetched = jax.device_get([o for o in outs if o is not None])
        if self.timer is not None:
            self.timer.record("tri_fetch", _time.perf_counter() - _t0)
        # stitch batch results back into per-neighbor rows
        f1_rows, f2_rows, X_rows, cnt_rows = [], [], [], []
        fi = 0
        for s in range(0, len(nb_all), NBB):
            if outs[s // NBB] is None:
                continue
            f1_b, f2_b, X_b, cnt_b = fetched[fi]
            fi += 1
            nb = nb_all[s: s + NBB]
            for a in range(len(nb)):
                f1_rows.append(f1_b[a])
                f2_rows.append(f2_b[a])
                X_rows.append(X_b[a])
                cnt_rows.append(cnt_b[a] if pv_all[s + a] else 0)
        nb = np.concatenate([nb_all[s: s + NBB]
                             for s in range(0, len(nb_all), NBB)
                             if outs[s // NBB] is not None]) \
            if any(o is not None for o in outs) else np.zeros(0, np.int64)
        pair_valid = np.ones(len(nb), bool)
        f1_b, f2_b, X_b = f1_rows, f2_rows, X_rows
        cnt_b = cnt_rows

        created_all = []
        claimed1 = ~unbound1
        for a in range(len(nb)):
            if not pair_valid[a]:
                continue
            n = int(cnt_b[a])
            if n > TRI_CAP:
                # no silent caps (SURVEY §5): compaction dropped the tail
                from orb_slam3_rgbl_tpu.utils.logging import log

                log("triangulation: %d accepted pairs beyond the %d "
                    "download cap dropped" % (n - TRI_CAP, TRI_CAP))
                n = TRI_CAP
            if n == 0:
                continue
            k2 = int(nb[a])
            f1s = f1_b[a][:n].astype(np.int64)
            f2s = f2_b[a][:n].astype(np.int64)
            X = X_b[a][:n]
            # features already claimed by an earlier neighbor this pass
            keep = ~claimed1[f1s]
            f1s, f2s, X = f1s[keep], f2s[keep], X[keep]
            # drop features on the neighbor side already bound/claimed
            good2 = m.kf_lm_idx[k2, f2s] < 0
            f1s, f2s, X = f1s[good2], f2s[good2], X[good2]
            if f1s.size == 0:
                continue
            claimed1[f1s] = True
            vecs = X - c1[None, :]
            dd = np.linalg.norm(vecs, axis=-1)
            normals = vecs / np.maximum(dd[:, None], 1e-9)
            octv = m.kf_octave[kf_id][f1s]
            sf = self.cfg.orb.scale_factor ** octv.astype(np.float32)
            ids = m.add_landmarks(
                X.astype(np.float32), m.kf_desc[kf_id][f1s], kf_id, f1s,
                normals.astype(np.float32), (dd * sf).astype(np.float32),
                (dd * sf / self.cfg.orb.scale_factor ** (self.cfg.orb.n_levels - 1)).astype(np.float32),
            )
            m.kf_lm_idx[k2, f2s] = ids
            created_all.append(ids)
        if created_all:
            self.recent_lm.append((np.concatenate(created_all), self.map.n_kf))

    def _unproject_dirs(self, uv: np.ndarray) -> jnp.ndarray:
        from orb_slam3_rgbl_tpu.geometry.camera import np_geo_unproject

        return jnp.asarray(np_geo_unproject(self.geo_cam, uv).astype(np.float32))

    def _reproj_ok(self, X, Tcw, uv, octave, chi2=5.991):
        from orb_slam3_rgbl_tpu.geometry.camera import np_geo_project

        Tcw = np.asarray(Tcw, np.float32)
        pc = lie.np_quat_rotate(Tcw[:4], X.astype(np.float32)) + Tcw[4:7]
        z = pc[:, 2]
        proj = np_geo_project(self.geo_cam, pc)
        err2 = (proj[:, 0] - uv[:, 0]) ** 2 + (proj[:, 1] - uv[:, 1]) ** 2
        sigma2 = 1.2 ** (2 * octave.astype(np.float32))
        return (z > 0.1) & np.nan_to_num(err2 < chi2 * sigma2, nan=False)

    # ------------------------------------------------------------------
    def local_bundle_adjustment(self, kf_id: int, iterations: int = 10,
                                n_iters=None):
        """Assemble the covisibility window and run the Schur BA
        (reference ``Optimizer::LocalBundleAdjustment`` semantics: current
        KF + covisible neighbors optimized, their landmarks, plus fixed
        observer keyframes; writeback under map version bump)."""
        import time as _time

        _t_asm0 = _time.perf_counter()
        w = self.map.covisibility_weights(kf_id)
        order = np.argsort(-w)
        opt_ids = [kf_id] + [int(k) for k in order if w[k] > 0][: BA_POSES_CAP // 2 - 1]
        opt_set = np.array(opt_ids, np.int64)

        tbl = self.map.kf_lm_idx[opt_set]
        lm_ids = np.unique(tbl[tbl >= 0])
        lm_ids = lm_ids[self.map.lm_valid[lm_ids]][:BA_LM_CAP]
        if lm_ids.size < 30:
            return
        # landmark capacity tiers (powers of two, minimum 4096): small
        # windows were paying the full 8192-slot problem upload every
        # keyframe; the floor keeps early-map and steady-state keyframes
        # on the SAME compiled program (a lower floor put the first BA on
        # a tier the rest of the run never reuses — one wasted compile)
        from orb_slam3_rgbl_tpu.slam.ba_assembly import _tier

        lm_cap = min(_tier(lm_ids.size, 4096), BA_LM_CAP)

        # fixed observers: other KFs seeing these landmarks
        mask = np.zeros(self.map.capacity_lm, bool)
        mask[lm_ids] = True
        valid_kfs = self.map.valid_kf_ids()
        sees = (
            (mask[np.clip(self.map.kf_lm_idx[valid_kfs], 0, None)] & (self.map.kf_lm_idx[valid_kfs] >= 0))
            .sum(axis=1)
        )
        fixed_pool = [int(k) for k, s in zip(valid_kfs, sees) if s > 0 and k not in set(opt_ids)]
        n_fixed_slots = BA_POSES_CAP - len(opt_set)
        fixed_set = np.array(fixed_pool[:n_fixed_slots], np.int64)
        window = np.concatenate([opt_set, fixed_set])
        pose_fixed = np.zeros(BA_POSES_CAP, bool)
        pose_fixed[len(opt_set):] = True
        # the map's origin keyframe is always gauge-fixed (reference
        # Optimizer.cc local BA: InitKFid keyframes get setFixed(true))
        for i, k in enumerate(window):
            if k == 0:
                pose_fixed[i] = True
        # if nothing is fixed at all, pin the oldest pose in the window
        if not pose_fixed[: len(window)].any():
            anchor = int(np.argmin(self.map.kf_frame_id[window]))
            pose_fixed[anchor] = True

        Kw = BA_POSES_CAP
        poses = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (Kw, 1))
        pose_valid = np.zeros(Kw, bool)
        poses[: len(window)] = self.map.kf_pose[window]
        pose_valid[: len(window)] = True

        Mw = lm_cap
        obs_kf, obs_feat, obs_mask, obs_uv, obs_ur = self.map.gather_observations(
            window, lm_ids, self.obs_cap
        )
        self.dev_cache.ensure(self.map, window)
        if self.map.last_dropped_obs:
            # no silent caps: dense covisibility exceeded the D-per-landmark
            # budget (reference local BA keeps every observer)
            from orb_slam3_rgbl_tpu.utils.logging import log

            log("local BA: %d observations beyond the %d-per-landmark cap "
                "dropped" % (self.map.last_dropped_obs, self.obs_cap))
        lm_valid = np.zeros(Mw, bool)
        lm_valid[: lm_ids.size] = True

        def pad_obs(a, fill=0):
            out = np.full((Mw,) + a.shape[1:], fill, a.dtype)
            out[: a.shape[0]] = a
            return out

        # observation pixels / pseudo-stereo / weights GATHER from the
        # device feature mirror (uploading them cost ~0.5 MB per solve);
        # index uploads ride as int16/int8 (another ~0.45 MB/solve on the
        # tunnel) and widen on device
        kf_global = window[np.clip(obs_kf, 0, len(window) - 1)]
        kfg_dev = jnp.asarray(pad_obs(kf_global.astype(np.int16))).astype(jnp.int32)
        feat_dev = jnp.asarray(pad_obs(obs_feat.astype(np.int16))).astype(jnp.int32)
        mask_dev = jnp.asarray(pad_obs(obs_mask))
        c = self.dev_cache
        obs_uv_dev = c.d_uv[kfg_dev, feat_dev]
        obs_ur_dev = jnp.where(mask_dev, c.d_ur[kfg_dev, feat_dev], -1.0)
        oct_dev = jnp.clip(c.d_oct[kfg_dev, feat_dev], 0,
                           len(self.inv_sigma2) - 1)
        inv_s2_dev = jnp.asarray(self.inv_sigma2.astype(np.float32))[oct_dev]

        problem = local_ba.BAProblem(
            poses=jnp.asarray(poses),
            pose_fixed=jnp.asarray(pose_fixed),
            pose_valid=jnp.asarray(pose_valid),
            landmarks=jnp.asarray(pad_obs(self.map.lm_pos[lm_ids])),
            lm_valid=jnp.asarray(lm_valid),
            obs_kf=jnp.asarray(pad_obs(obs_kf.astype(np.int8))).astype(jnp.int32),
            obs_uv=obs_uv_dev,
            obs_ur=obs_ur_dev,
            obs_inv_sigma2=inv_s2_dev,
            obs_mask=mask_dev,
        )
        if self.timer is not None:
            self.timer.record("lba_asm", _time.perf_counter() - _t_asm0)
        _t_sol0 = _time.perf_counter()
        # ONE dispatch, one download: on the measurement tunnel the cost
        # driver is round trips waiting behind the shared device queue,
        # not program length — chunking this solve into 4-iteration
        # dispatches measurably WORSENED every plane (r5 bench audit)
        res = local_ba.bundle_adjust(problem, self.geo_cam,
                                     iterations=iterations, n_iters=n_iters)

        # writeback (the reference takes mMutexMapUpdate; here it is just
        # array stores bumping the version). ONE batched fetch: each
        # separate np.asarray pays a full tunnel round trip (~26 ms) —
        # three of them were ~80 ms of the solve stage (r5 probe)
        new_poses, new_lms, inl = jax.device_get(
            (res.poses, res.landmarks, res.obs_inlier))
        self.map.kf_pose[window] = np.asarray(new_poses, np.float32)[: len(window)]
        self.map.lm_pos[lm_ids] = np.asarray(new_lms, np.float32)[: lm_ids.size]

        # drop observations classified outlier (unbind feature slots)
        inl = np.asarray(inl)[: lm_ids.size]
        bad_obs = (~inl) & obs_mask
        if bad_obs.any():
            mrows, dcols = np.nonzero(bad_obs)
            kfg = window[obs_kf[mrows, dcols]]
            self.map.kf_lm_idx[kfg, obs_feat[mrows, dcols]] = -1
            self.map.cull_orphans(lm_ids[np.unique(mrows)])
        self.map.version += 1
        if self.timer is not None:
            self.timer.record("lba_solve", _time.perf_counter() - _t_sol0)

    # ------------------------------------------------------------------
    VI_OPT_WINDOW = 10   # optimizable temporal states (Optimizer.cc:2392)
    VI_FIX_WINDOW = 5    # fixed temporal anchors

    def _vi_extrinsics(self):
        from orb_slam3_rgbl_tpu.slam import imu_frontend

        if not hasattr(self, "_T_bc"):
            self._T_bc, self._T_cb = imu_frontend.body_cam_extrinsics(self.cfg)
        return self._T_bc, self._T_cb

    def _build_vi_problem(self, chain: np.ndarray, n_fixed: int,
                          lm_cap: int = 4096, obs_cap: int = 8):
        """Assemble a VIBAProblem over the temporal keyframe ``chain``
        (oldest first; the first ``n_fixed`` states are anchors)."""
        from orb_slam3_rgbl_tpu.optim import inertial_ba as viba
        from orb_slam3_rgbl_tpu.slam import imu_frontend

        m = self.map
        T_bc, T_cb = self._vi_extrinsics()
        K = len(chain)
        # state-count tiers (powers of two, floor 16): whole-map
        # FullInertialBA chains vary per call — padding + state_valid
        # masking keeps the jit shape set O(log K) instead of O(calls)
        from orb_slam3_rgbl_tpu.slam.ba_assembly import _tier

        Kp = _tier(K, 16)
        T_bw = lie.np_se3_mul(np.tile(T_bc, (K, 1)), m.kf_pose[chain])
        Twb_real = lie.np_se3_inv(T_bw)
        Twb = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (Kp, 1))
        Twb[:K] = Twb_real

        def pads(a, fill=0):
            out = np.full((Kp,) + a.shape[1:], fill, a.dtype)
            out[:K] = a
            return out

        # landmarks seen by the optimizable states
        opt_kfs = chain[n_fixed:]
        tbl = m.kf_lm_idx[opt_kfs]
        lm_ids = np.unique(tbl[tbl >= 0])
        lm_ids = lm_ids[m.lm_valid[lm_ids]][:lm_cap]
        obs_kf, obs_feat, obs_mask, obs_uv, obs_ur = m.gather_observations(
            chain, lm_ids, obs_cap)
        Mw = lm_cap
        def padm(a, fill=0):
            out = np.full((Mw,) + a.shape[1:], fill, a.dtype)
            out[: a.shape[0]] = a
            return out
        kf_global = chain[np.clip(obs_kf, 0, K - 1)]
        octv = m.kf_octave[kf_global, obs_feat].astype(np.int32)
        inv_s2 = self.inv_sigma2[np.clip(octv, 0, len(self.inv_sigma2) - 1)].astype(np.float32)
        lm_valid = np.zeros(Mw, bool)
        lm_valid[: lm_ids.size] = True

        # temporal IMU factors between consecutive chain states
        pair_i, pair_j, preints, pv = [], [], [], []
        for a in range(K - 1):
            k_next = int(chain[a + 1])
            ok = (k_next in m.imu_preint
                  and int(m.kf_prev_imu[k_next]) == int(chain[a]))
            pair_i.append(a)
            pair_j.append(a + 1)
            pv.append(ok)
            if ok:
                preints.append(imu_frontend.preint_from_numpy(m.imu_preint[k_next]))
            else:
                import jax.numpy as _jnp
                from orb_slam3_rgbl_tpu.imu import preintegration as pre
                preints.append(pre.preintegrate(
                    _jnp.zeros((2, 3), _jnp.float32), _jnp.zeros((2, 3), _jnp.float32),
                    _jnp.zeros(2, _jnp.float32), _jnp.zeros(2, bool), pre.ImuBias.zero()))
        icfg = self.cfg.imu
        fixed = np.zeros(Kp, bool)
        fixed[:n_fixed] = True
        fixed[K:] = True          # padded states are inert
        if not fixed[:K].any():
            fixed[0] = True
        state_valid = np.zeros(Kp, bool)
        state_valid[:K] = True

        # pad the pair-factor axis (pads repeat the last preint purely for
        # shape — pair_valid masks them out of every residual)
        n_pairs = len(pair_i)
        for a in range(n_pairs, Kp - 1):
            pair_i.append(0)
            pair_j.append(min(1, Kp - 1))
            pv.append(False)
            preints.append(preints[-1])
        meas = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *preints)
        dts = np.maximum(np.asarray(meas.dt), 1e-3)
        info_bg = 1.0 / np.maximum(icfg.gyro_walk ** 2 * dts, 1e-12)
        info_ba = 1.0 / np.maximum(icfg.acc_walk ** 2 * dts, 1e-12)

        problem = viba.VIBAProblem(
            Twb=jnp.asarray(Twb), vel=jnp.asarray(pads(m.kf_vel[chain])),
            bg=jnp.asarray(pads(m.kf_bg[chain])),
            ba=jnp.asarray(pads(m.kf_ba[chain])),
            state_fixed=jnp.asarray(fixed), state_valid=jnp.asarray(state_valid),
            T_cb=jnp.asarray(T_cb),
            landmarks=jnp.asarray(padm(m.lm_pos[lm_ids])),
            lm_valid=jnp.asarray(lm_valid),
            obs_kf=jnp.asarray(padm(obs_kf)), obs_uv=jnp.asarray(padm(obs_uv)),
            obs_ur=jnp.asarray(padm(obs_ur, -1.0)),
            obs_inv_sigma2=jnp.asarray(padm(inv_s2)),
            obs_mask=jnp.asarray(padm(obs_mask)),
            pair_i=jnp.asarray(np.asarray(pair_i, np.int32)),
            pair_j=jnp.asarray(np.asarray(pair_j, np.int32)),
            pair_meas=meas,
            pair_valid=jnp.asarray(np.asarray(pv, bool)),
            info_bg=jnp.asarray(np.minimum(info_bg, 1e8).astype(np.float32)),
            info_ba=jnp.asarray(np.minimum(info_ba, 1e8).astype(np.float32)),
        )
        return problem, lm_ids, (obs_kf, obs_feat, obs_mask)

    def _temporal_chain(self, kf_id: int, length: int) -> np.ndarray:
        """Walk the kf_prev_imu chain back from kf_id (inclusive), oldest
        first (reference vpOptimizableKFs assembly, Optimizer.cc:2392-2410)."""
        chain = [int(kf_id)]
        k = int(kf_id)
        while len(chain) < length:
            p = int(self.map.kf_prev_imu[k])
            if p < 0 or not self.map.kf_valid[p]:
                break
            chain.append(p)
            k = p
        return np.asarray(chain[::-1], np.int64)

    def local_inertial_bundle_adjustment(self, kf_id: int, iterations: int = 8):
        """``Optimizer::LocalInertialBA`` (reference Optimizer.cc:2383):
        sliding window of Opt=10 temporal states + Fix=5 anchors, joint
        visual + preintegration + bias-walk solve, map writeback."""
        from orb_slam3_rgbl_tpu.optim import inertial_ba as viba

        chain = self._temporal_chain(kf_id, self.VI_OPT_WINDOW + self.VI_FIX_WINDOW)
        if len(chain) < 3:
            return
        n_fixed = max(len(chain) - self.VI_OPT_WINDOW, 1)
        problem, lm_ids, (obs_kf, obs_feat, obs_mask) = self._build_vi_problem(
            chain, n_fixed)
        res = viba.vi_bundle_adjust(problem, self.geo_cam, iterations=iterations)
        self._vi_writeback(chain, n_fixed, lm_ids, res,
                           obs_kf, obs_feat, obs_mask)

    def full_inertial_ba(self, kf_id: int, iterations: int = 10,
                         max_states: int = 256):
        """``Optimizer::FullInertialBA`` (reference Optimizer.cc:392 runs
        the WHOLE map; here the whole temporal chain up to ``max_states``
        — state-count tiers keep the jit shape set small, and chains
        beyond the cap anchor on their oldest retained state, logged)."""
        chain = self._temporal_chain(kf_id, max_states)
        if len(chain) == max_states:
            from orb_slam3_rgbl_tpu.utils.logging import log

            log("FullInertialBA: temporal chain hit the %d-state cap — "
                "older states anchor" % max_states)
        if len(chain) < 4:
            return
        from orb_slam3_rgbl_tpu.optim import inertial_ba as viba

        problem, lm_ids, obs = self._build_vi_problem(chain, n_fixed=1)
        res = viba.vi_bundle_adjust(problem, self.geo_cam, iterations=iterations)
        self._vi_writeback(chain, 1, lm_ids, res, *obs)

    def _vi_writeback(self, chain, n_fixed, lm_ids, res,
                      obs_kf, obs_feat, obs_mask):
        m = self.map
        _, T_cb = self._vi_extrinsics()
        K = len(chain)
        # one batched fetch (each separate np.asarray is a tunnel RT)
        Twb, vel, bg, ba, lms_d, inl_d = jax.device_get(
            (res.Twb, res.vel, res.bg, res.ba, res.landmarks, res.obs_inlier))
        Twb = np.asarray(Twb, np.float32)[:K]       # drop tier padding
        Tcw = lie.np_se3_mul(np.tile(np.asarray(T_cb, np.float32), (K, 1)),
                             lie.np_se3_inv(Twb))
        upd = chain[n_fixed:]
        m.kf_pose[upd] = Tcw[n_fixed:]
        m.kf_vel[upd] = np.asarray(vel, np.float32)[n_fixed:K]
        m.kf_bg[upd] = np.asarray(bg, np.float32)[n_fixed:K]
        m.kf_ba[upd] = np.asarray(ba, np.float32)[n_fixed:K]
        if lm_ids.size:
            m.lm_pos[lm_ids] = np.asarray(lms_d, np.float32)[: lm_ids.size]
        inl = np.asarray(inl_d)[: lm_ids.size]
        bad = (~inl) & obs_mask
        if bad.any():
            rows, cols = np.nonzero(bad)
            kfg = chain[obs_kf[rows, cols]]
            m.kf_lm_idx[kfg, obs_feat[rows, cols]] = -1
            m.cull_orphans(lm_ids[np.unique(rows)])
        m.version += 1

    def maybe_viba(self, timestamp: float):
        """VIBA1/VIBA2 refinement schedule after IMU initialization
        (reference ``LocalMapping::Run`` LocalMapping.cc:218-256: a
        FullInertialBA ~5 s after init and another ~15 s after)."""
        m = self.map
        if not (self.cfg.inertial and m.imu_initialized):
            return
        t0 = getattr(self, "_imu_init_time", None)
        if t0 is None:
            return
        stage = getattr(self, "_viba_stage", 0)
        if stage == 0 and timestamp - t0 >= 5.0:
            kfs = m.valid_kf_ids()
            if kfs.size:
                self.full_inertial_ba(int(kfs[-1]))
            self._viba_stage = 1
        elif stage == 1 and timestamp - t0 >= 15.0:
            kfs = m.valid_kf_ids()
            if kfs.size:
                self.full_inertial_ba(int(kfs[-1]))
            self._viba_stage = 2

    # ------------------------------------------------------------------
    def maybe_initialize_imu(self, min_kf: int = 6, min_span_s: float = 1.0,
                             max_cost: float = 1e3):
        """3-stage IMU initialization (reference ``LocalMapping::
        InitializeIMU``, LocalMapping.cc:1173-1428): gyro bias from
        rotation-only GN, linear gravity/velocity/scale bootstrap, joint
        refinement — all inside :func:`optim.inertial.imu_initialization`.
        On success the map is re-expressed gravity-down and metric
        (``Map::ApplyScaledRotation``) and per-keyframe velocities/biases
        land in the map arrays. Returns the applied Sim3 (new←old world)
        or None."""
        from orb_slam3_rgbl_tpu.config import IMU_MONOCULAR
        from orb_slam3_rgbl_tpu.optim import inertial
        from orb_slam3_rgbl_tpu.slam import imu_frontend
        from orb_slam3_rgbl_tpu.slam import map_state as ms
        from orb_slam3_rgbl_tpu.imu import preintegration as pre

        m = self.map
        if not self.cfg.inertial or m.imu_initialized:
            return None
        kfs = m.valid_kf_ids()
        if kfs.size < min_kf:
            return None
        if float(m.kf_timestamp[kfs[-1]] - m.kf_timestamp[kfs[0]]) < min_span_s:
            return None
        # temporal chain: consecutive valid-KF pairs with a preintegration
        pairs_ok = np.zeros(kfs.size - 1, bool)
        preints = []
        zero = imu_frontend.preint_to_numpy(
            pre.preintegrate(jnp.zeros((2, 3), jnp.float32), jnp.zeros((2, 3), jnp.float32),
                             jnp.zeros(2, jnp.float32), jnp.zeros(2, bool), pre.ImuBias.zero())
        )
        for i in range(kfs.size - 1):
            k = int(kfs[i + 1])
            if k in m.imu_preint and int(m.kf_prev_imu[k]) == int(kfs[i]):
                pairs_ok[i] = True
                preints.append(m.imu_preint[k])
            else:
                preints.append(zero)
        if pairs_ok.sum() < min_kf - 1:
            return None

        T_bc = jnp.asarray(imu_frontend.body_cam_extrinsics(self.cfg)[0])
        T_bw = lie.se3_mul(T_bc[None, :], jnp.asarray(m.kf_pose[kfs]))
        Twb = np.asarray(lie.se3_inv(T_bw), np.float32)
        meas = imu_frontend.stack_preints(preints)
        fix_scale = self.cfg.sensor != IMU_MONOCULAR
        out = inertial.imu_initialization(
            jnp.asarray(Twb), meas, jnp.asarray(pairs_ok), fix_scale=fix_scale,
        )
        scale = float(out["scale"])
        if not np.isfinite(float(out["cost"])) or scale < 1e-2 or scale > 1e2:
            return None

        # new world: gravity-down, metric — X_new = s · R_gw · X_old
        q_gw = np.asarray(lie.quat_conj(out["Rwg"]), np.float32)
        S_align = np.concatenate([q_gw, np.zeros(3, np.float32),
                                  [np.float32(scale)]]).astype(np.float32)
        # velocities from the init are metric in the OLD world frame
        m.kf_vel[kfs] = np.asarray(out["velocities"], np.float32)
        m.kf_bg[kfs] = np.asarray(out["bias"].bg, np.float32)
        m.kf_ba[kfs] = np.asarray(out["bias"].ba, np.float32)
        ms.apply_scaled_rotation(m, S_align, vel_metric_preserved=True)
        self.dev_cache.reset()   # metric rescale invalidates mirrored ur
        m.imu_initialized = True
        self._imu_init_time = float(m.kf_timestamp[kfs[-1]])
        self._viba_stage = 0
        return S_align

    def _relink_imu_chain(self, k: int) -> bool:
        """Before culling keyframe ``k`` in inertial mode, weld its
        temporal IMU chain: the successor's preintegration absorbs k's
        (reference KeyFrameCulling inertial branch, LocalMapping.cc:
        ~990-1040, via ``Preintegrated::MergePrevious``). Returns False
        when the chain cannot be preserved (then k must be kept) — the
        reference likewise refuses to cull chain-critical inertial KFs or
        ones spanning > 3 s."""
        from orb_slam3_rgbl_tpu.imu.preintegration import merge
        from orb_slam3_rgbl_tpu.slam import imu_frontend

        m = self.map
        p = int(m.kf_prev_imu[k])
        succ = np.nonzero(m.kf_prev_imu[: m.n_kf] == k)[0]
        if succ.size == 0:
            # chain tail: tracking still preintegrates against it
            return False
        n = int(succ[0])
        if p < 0 or k not in m.imu_preint or n not in m.imu_preint:
            return False
        # time-span gates of LocalMapping.cc:1024: a wide gap is only
        # acceptable once the IMU is initialized (t<3 s); before that only
        # rapid-fire keyframes may merge (t<0.5 s)
        span = float(m.kf_timestamp[n] - m.kf_timestamp[p])
        if span > (3.0 if m.imu_initialized else 0.5):
            return False
        merged = merge(
            imu_frontend.preint_from_numpy(m.imu_preint[k]),
            imu_frontend.preint_from_numpy(m.imu_preint[n]),
        )
        m.imu_preint[n] = imu_frontend.preint_to_numpy(merged)
        m.kf_prev_imu[n] = p
        del m.imu_preint[k]
        m.kf_prev_imu[k] = -1
        return True

    def _keyframe_culling(self, kf_id: int):
        """Reference ``KeyFrameCulling`` (LocalMapping.cc:902-1054): a
        covisible keyframe is redundant if ≥ 90% of its landmarks are seen
        by ≥ 3 other keyframes at the same or finer scale."""
        neighbors = self.map.best_covisible(kf_id, 20, min_weight=15)
        if neighbors.size == 0:
            return
        # inertial gates (reference LocalMapping.cc:1012-1019): never thin
        # the map below the Nd=21 optimizable window, keep the 2 newest
        inertial = self.cfg.inertial
        if inertial and self.map.valid_kf_ids().size <= 21:
            return
        redundant_th = 0.5 if (inertial and self.cfg.sensor != 3) else 0.9
        counts = self.map.observation_counts()
        for k in neighbors:
            if k == 0:  # keep the origin keyframe
                continue
            if inertial and k >= kf_id - 2:
                continue
            ids = self.map.kf_lm_idx[k]
            sel = ids >= 0
            lm = ids[sel]
            if lm.size < 30:
                continue
            redundant = (counts[lm] >= 4).mean()  # self + 3 others
            if redundant > redundant_th:
                if inertial and not self._relink_imu_chain(int(k)):
                    continue
                self.map.remove_keyframe(int(k))
