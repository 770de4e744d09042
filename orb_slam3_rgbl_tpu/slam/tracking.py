"""Per-frame tracking: state machine + jitted compute steps.

Replaces the reference ``Tracking`` (``Tracking.cc:1828-2367``). Control
flow (state transitions, keyframe policy) is host Python operating on a
handful of scalars; all per-feature math — projection, windowed matching,
robust pose optimization — is jitted with fixed shapes (SURVEY.md §7
"keep decisions on host with scalars pulled once per frame").

States mirror ``Tracking.h:123-131``: NO_IMAGES_YET → NOT_INITIALIZED →
OK / RECENTLY_LOST / LOST. Pipeline per frame (state OK):
TrackWithMotionModel (``Tracking.cc:2888``) → TrackLocalMap
(``Tracking.cc:2983``) → NeedNewKeyFrame/CreateNewKeyFrame
(``Tracking.cc:3098/3250``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import SlamConfig, MONOCULAR, IMU_MONOCULAR
from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.geometry import two_view
from orb_slam3_rgbl_tpu.ops import matching
from orb_slam3_rgbl_tpu.optim import pose_opt
from orb_slam3_rgbl_tpu.optim import pnp
from orb_slam3_rgbl_tpu.slam.frame import FrameFeatures, inv_scale_sigma2
from orb_slam3_rgbl_tpu.slam.map_state import MapState
from orb_slam3_rgbl_tpu.slam import imu_frontend

import jax

NO_IMAGES_YET = 0
NOT_INITIALIZED = 1
OK = 2
RECENTLY_LOST = 3
LOST = 4

STATE_NAMES = {0: "NO_IMAGES_YET", 1: "NOT_INITIALIZED", 2: "OK", 3: "RECENTLY_LOST", 4: "LOST"}

LOCAL_LM_CAP = 8192   # local-map landmark budget per frame
LOCAL_KF_CAP = 80     # reference caps local keyframes at 80 (Tracking.cc:3543)
MONO_INIT_CAP = 1024  # fixed match capacity for two-view reconstruction


def _sqrt_info(H: np.ndarray, cap: float = 1e8) -> np.ndarray:
    """L with L·Lᵀ ≈ the PSD projection of H — the marginal information
    carried between VI pose solves (the reference stores the matrix
    itself in ``ConstraintPoseImu``; the square root keeps the joint GN
    weights diagonal). Eigenvalues clip to [0, cap] so the chained prior
    can never harden into the fixed-anchor (infinite-information) limit
    it replaces."""
    Hs = 0.5 * (H + H.T)
    w, V = np.linalg.eigh(Hs)
    w = np.clip(w, 0.0, cap)
    return np.asarray(V @ np.diag(np.sqrt(w)), np.float32)


@dataclasses.dataclass
class TrackResult:
    pose: np.ndarray          # (7,) Tcw
    state: int
    n_inliers: int
    created_kf: bool
    timestamp: float


class Tracker:
    def __init__(self, config: SlamConfig, map_state: MapState,
                 start_frame_id: int = 0):
        self.cfg = config
        self.cam = config.camera
        # geometric camera for matching projections + optimizer residuals
        # (pinhole | KB8 — reference GeometricCamera polymorphism)
        self.geo_cam = config.geo_camera
        self.map = map_state
        self.state = NO_IMAGES_YET
        self._start_frame_id = start_frame_id
        self.n_feat = None  # set on first frame
        self.kf_db = None   # KeyFrameDatabase, wired by System for reloc
        self.fast = None    # FastPath, wired by System for the fused loop
        self.pre_kf_hook = None  # called right before keyframe creation
        self.kf_feats_hook = None  # called with (kf_id, feats) right after
        #   creation — feeds the mapping plane's device feature mirror
        #   (DeviceKfCache); the fused path hands the DEVICE extraction
        #   output so no host round-trip happens
        self._pending_device_feats = None
        #   (System joins the async mapping plane here — the reference's
        #   LocalMapping::SetNotStop/queue gate)
        self.mapping_busy_fn = None  # reference bLocalMappingIdle gate:
        #   while the async plane is mid-job, NeedNewKeyFrame declines
        #   (we cannot InterruptBA a dispatched XLA program, so the busy
        #   window defers insertion instead — Tracking.cc:3137/3228)
        self.join_mapping_fn = None  # wired by System: blocks until the
        #   in-flight async mapping job lands — the classic per-stage
        #   ladder reads live map arrays and must not race the worker
        self.mapping_inflight_fn = None  # wired by System: ANY worker job
        #   running right now (a single in-flight job already mutates the
        #   arrays — the ≥2 busy gate above is only the insertion policy)
        self.kf_guard = None  # wired by System: lock held across keyframe
        #   creation so a loop correction cannot rewrite the map mid-insert
        self._stat_buffer: list = []  # deferred lm_visible/lm_found bumps
        #   captured while a mapping job is mutating the arrays
        self._reloc_key = jax.random.PRNGKey(13)
        self.is_mono = config.sensor in (MONOCULAR, IMU_MONOCULAR)
        self._mono_ref = None          # (FrameFeatures, timestamp) init reference
        self._mono_key = jax.random.PRNGKey(21)
        self.new_kf_ids: list = []     # keyframes created this frame (0, 1 or 2)
        self._feats_prefetch = None    # (feats, blob, desc) async KF download

        self.cur_pose = np.asarray(lie.se3_identity(), np.float32)
        self.last_pose: Optional[np.ndarray] = None
        self.velocity: Optional[np.ndarray] = None   # T_cur_last
        self.last_feats: Optional[FrameFeatures] = None
        self.last_lm_idx: Optional[np.ndarray] = None
        self.last_lm_gen: Optional[np.ndarray] = None  # lm_gen snapshot
        self.ref_kf: int = -1
        self.last_kf_frame: int = -9999
        self.last_reloc_frame: int = -9999
        # frame ids are GLOBAL across atlas maps (the reference's
        # Frame::nNextId is a static counter) — loop/merge adjacency
        # gates compare them
        self.frame_id: int = start_frame_id - 1
        self.inv_sigma2 = np.asarray(
            inv_scale_sigma2(config.orb.n_levels, config.orb.scale_factor)
        )
        self.scale_factors = np.asarray(
            [config.orb.scale_factor ** l for l in range(config.orb.n_levels)], np.float32
        )
        # depth threshold in meters: mThDepth = bf · ThDepth / fx
        # (reference Tracking.cc ParseCamParamFile)
        self.th_depth_m = self.cam.bf * self.cam.th_depth / self.cam.fx
        # --- inertial frontend (reference GrabImuData/PreintegrateIMU) ---
        self.inertial = config.inertial
        if self.inertial:
            self.T_bc, self.T_cb = imu_frontend.body_cam_extrinsics(config)
            self._imu_kf_acc = imu_frontend.ImuAccumulator(config)
            # frame-to-frame window (reference mpImuPreintegratedFrame):
            # feeds the last-frame VI optimizer and resets every frame
            self._imu_frame_acc = imu_frontend.ImuAccumulator(config)
            self._last_imu_kf: int = -1
            self.cur_vel = np.zeros(3, np.float32)       # world body velocity
            self.cur_bias = (np.zeros(3, np.float32), np.zeros(3, np.float32))
            self._prev_body_center: Optional[np.ndarray] = None
            self._prev_body_time: Optional[float] = None
            # last OK frame's body state + the map version it was solved
            # against (PoseInertialOptimizationLastFrame anchoring)
            self._last_frame_vi = None
            self._last_frame_map_version = -1
            self._vi_prior_L = None   # marginalization prior chain (mpcpi)
        # RECENTLY_LOST grace window (reference time_recently_lost, ~5 s:
        # inertial modes dead-reckon on IMU prediction before giving up,
        # Tracking.cc:2019-2053)
        self.time_recently_lost = 5.0
        self._lost_since = -1e9
        # trajectory log: relative pose to reference KF per frame
        # (reference Tracking.cc:2336-2360)
        self.traj_rel: list = []
        self.traj_ref_kf: list = []
        self.traj_time: list = []
        self.traj_lost: list = []
        self.min_frames = 0
        self.max_frames = int(config.fps)
        # bench/diagnostic knob: force a keyframe every N frames (the
        # reference's NeedNewKeyFrame density on real KITTI is ~1 KF per
        # 3-5 frames — synthetic worlds track too well to reach it);
        # deferred_kf counts insertions the mapping busy-gate declined
        # (must stay ~0 or the gate is thinning the map = accuracy loss)
        self.force_kf_every = 0
        self.deferred_kf = 0
        # localization-only mode (reference mbOnlyTracking, set by
        # System::ActivateLocalizationMode, System.cc:139-155): track
        # against the frozen map, never insert keyframes
        self.only_tracking = False

    # ------------------------------------------------------------------
    def track(self, feats: FrameFeatures, timestamp: float,
              imu: Optional[np.ndarray] = None) -> TrackResult:
        # the classic ladder reads live map arrays (lm_pos, kf_lm_idx,
        # covisibility) — an in-flight async mapping job may be rewriting
        # them; join first (the fused path alone is snapshot-tolerant)
        if self.join_mapping_fn is not None:
            self.join_mapping_fn()
        self.frame_id += 1
        if self.n_feat is None:
            self.n_feat = int(feats.uv.shape[0])
        if self.inertial and imu is not None:
            # samples since the previous frame: (S, 7) [t, acc, gyro]
            self._imu_kf_acc.add(imu)
            self._imu_frame_acc.add(imu)

        created_kf = False
        self.new_kf_ids = []
        if self.state in (NO_IMAGES_YET, NOT_INITIALIZED):
            if self.is_mono:
                ok = self._monocular_initialization(feats, timestamp)
            else:
                ok = self._stereo_initialization(feats, timestamp)
            self.state = OK if ok else NOT_INITIALIZED
            n_inl = int(np.asarray(feats.valid).sum()) if ok else 0
            created_kf = ok
        else:
            ok, n_inl = self._track_frame(feats, timestamp)
            if ok:
                self.state = OK
                created_kf = self._maybe_insert_keyframe(feats, timestamp, n_inl)
            else:
                if self.state == OK:
                    self.state = RECENTLY_LOST
                    self._lost_since = timestamp
                elif self.state == RECENTLY_LOST:
                    # inertial grace: stay RECENTLY_LOST while the IMU
                    # carries the pose (Tracking.cc:2019-2035 keeps the
                    # state for time_recently_lost before declaring LOST)
                    if not self._imu_grace_active(timestamp):
                        self.state = LOST

        if self.inertial and self.state == OK:
            # pre-init velocity bootstrap: finite-difference body centers
            # (reference seeds KF velocities the same way before IMU init)
            c = np.asarray(lie.se3_trans(self._body_pose(self.cur_pose)), np.float32)
            if (self._prev_body_center is not None and not self.map.imu_initialized
                    and timestamp > self._prev_body_time):
                self.cur_vel = (
                    (c - self._prev_body_center) / (timestamp - self._prev_body_time)
                ).astype(np.float32)
            self._prev_body_center, self._prev_body_time = c, timestamp

        self._log_trajectory(timestamp)
        self._update_last(feats)
        if self.inertial:
            if self.state == OK:
                # last-frame anchor for PoseInertialOptimizationLastFrame
                self._last_frame_vi = (
                    np.asarray(self._body_pose(self.cur_pose), np.float32),
                    self.cur_vel.copy(),
                    self.cur_bias[0].copy(), self.cur_bias[1].copy())
                self._last_frame_map_version = self.map.version
            else:
                self._last_frame_vi = None
            self._imu_frame_acc.reset()
        return TrackResult(
            pose=self.cur_pose.copy(), state=self.state, n_inliers=n_inl,
            created_kf=created_kf, timestamp=timestamp,
        )

    # ------------------------------------------------------------------
    def _stereo_initialization(self, feats: FrameFeatures, timestamp: float) -> bool:
        """Reference ``Tracking::StereoInitialization`` (Tracking.cc:2369):
        need ≥ 500 features; create KF0 at identity + landmarks from every
        feature with positive depth."""
        valid = np.asarray(feats.valid)
        depth = np.asarray(feats.depth)
        if valid.sum() < 500:
            return False
        self.cur_pose = np.asarray(lie.se3_identity(), np.float32)
        has_depth = valid & (depth > 0)
        feat_idx = np.nonzero(has_depth)[0]
        uv = np.asarray(feats.uv)
        rays = self._unproject(uv[feat_idx], depth[feat_idx], self.cur_pose)
        lm_idx = np.full(self.n_feat, -1, np.int32)

        kf_id = self.map.add_keyframe(
            self.cur_pose, uv, np.asarray(feats.octave, np.int16),
            np.asarray(feats.desc), depth, np.asarray(feats.u_right),
            valid, lm_idx, timestamp, self.frame_id,
            angle=np.asarray(feats.angle),
        )
        desc = np.asarray(feats.desc)[feat_idx]
        centers = rays - 0.0  # camera at origin: ray == position
        normals = rays / np.maximum(np.linalg.norm(rays, axis=-1, keepdims=True), 1e-9)
        octv = np.asarray(feats.octave)[feat_idx]
        dist = np.linalg.norm(rays, axis=-1)
        sf = self.scale_factors[np.clip(octv, 0, len(self.scale_factors) - 1)]
        ids = self.map.add_landmarks(
            rays.astype(np.float32), desc, kf_id, feat_idx, normals.astype(np.float32),
            (dist * sf).astype(np.float32),
            (dist * sf / self.scale_factors[-1] / self.cfg.orb.scale_factor).astype(np.float32),
        )
        self.cur_lm_idx = lm_idx.copy()
        self.cur_lm_idx[feat_idx] = ids
        self.ref_kf = kf_id
        self.last_kf_frame = self.frame_id
        self.new_kf_ids = [kf_id]
        if self.kf_feats_hook is not None:
            self.kf_feats_hook(kf_id, feats)
        if self.inertial:
            self._imu_kf_acc.reset()
            self._last_imu_kf = kf_id
        return True

    # ------------------------------------------------------------------
    def _monocular_initialization(self, feats: FrameFeatures, timestamp: float) -> bool:
        """Reference ``Tracking::MonocularInitialization`` (Tracking.cc:2483)
        + ``CreateInitialMapMonocular`` (Tracking.cc:2588): hold a reference
        frame with > 100 features, window-match the next frame
        (``SearchForInitialization``), race F/H two-view reconstruction,
        scale the initial map to unit median depth, create KF0 + KF1."""
        valid = np.asarray(feats.valid)
        if self._mono_ref is None:
            if valid.sum() > 100:
                self._mono_ref = (feats, timestamp)
                if self.inertial:
                    # IMU window for KF0→KF1 starts at the init reference
                    self._imu_kf_acc.reset()
            return False
        if valid.sum() <= 100:
            self._mono_ref = None
            return False
        ref, ref_t = self._mono_ref

        # SearchForInitialization: mutual best descriptor match restricted
        # to a 100 px window around the reference keypoint (ratio 0.9)
        d = matching.distance_table(ref.desc, feats.desc, ref.valid, feats.valid)
        duv2 = jnp.sum((ref.uv[:, None, :] - feats.uv[None, :, :]) ** 2, axis=-1)
        d = jnp.where(duv2 < 100.0 ** 2, d, 512.0)
        idx, _ = matching.mutual_best_match(d, ref.angle, feats.angle,
                                            th=matching.TH_LOW, ratio=0.9,
                                            check_rotation=True)
        idx = np.asarray(idx)
        f1 = np.nonzero(idx >= 0)[0]
        if f1.size < 100:
            # too few matches: the reference drops the init frame and waits
            self._mono_ref = (feats, timestamp)
            if self.inertial:
                self._imu_kf_acc.reset()
            return False
        f2 = idx[f1]

        P = MONO_INIT_CAP
        m = min(f1.size, P)
        uv1 = np.zeros((P, 2), np.float32)
        uv2 = np.zeros((P, 2), np.float32)
        vm = np.zeros(P, bool)
        uv1[:m] = np.asarray(ref.uv)[f1[:m]]
        uv2[:m] = np.asarray(feats.uv)[f2[:m]]
        vm[:m] = True
        self._mono_key, sub = jax.random.split(self._mono_key)
        res = two_view.reconstruct_two_views(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(vm), self.cam, sub
        )
        if not bool(res.success):
            return False
        T21 = np.asarray(res.T21, np.float32).copy()   # cur←ref (ref at identity)
        X = np.asarray(res.points, np.float32)
        good = np.asarray(res.is_good) & vm
        sel = np.nonzero(good)[0]
        # the reference rejects initial maps under 100 points
        # (CreateInitialMapMonocular: MapPointsInMap()<100 → Reset,
        # Tracking.cc:2588ff) — a marginal-parallax init dies quickly
        if sel.size < 100:
            return False
        med = float(np.median(X[sel, 2]))
        if not np.isfinite(med) or med <= 1e-6:
            return False
        # unit-median-depth gauge (reference: invMedianDepth scaling of
        # the baseline and all points)
        X = X / med
        T21[4:7] /= med

        fsel1 = f1[sel]
        fsel2 = f2[sel]
        lm0 = np.full(self.n_feat, -1, np.int32)
        kf0 = self.map.add_keyframe(
            np.asarray(lie.se3_identity(), np.float32), np.asarray(ref.uv),
            np.asarray(ref.octave, np.int16), np.asarray(ref.desc),
            np.asarray(ref.depth), np.asarray(ref.u_right), np.asarray(ref.valid),
            lm0, ref_t, max(self.frame_id - 1, 0), angle=np.asarray(ref.angle),
        )
        kf1 = self.map.add_keyframe(
            T21, np.asarray(feats.uv), np.asarray(feats.octave, np.int16),
            np.asarray(feats.desc), np.asarray(feats.depth),
            np.asarray(feats.u_right), valid, lm0.copy(), timestamp, self.frame_id,
            angle=np.asarray(feats.angle),
        )
        pts = X[sel]
        dist = np.linalg.norm(pts, axis=-1)  # KF0 camera at origin
        normals = pts / np.maximum(dist[:, None], 1e-9)
        octv = np.asarray(ref.octave)[fsel1]
        sf = self.scale_factors[np.clip(octv, 0, len(self.scale_factors) - 1)]
        ids = self.map.add_landmarks(
            pts.astype(np.float32), np.asarray(ref.desc)[fsel1], kf0, fsel1,
            normals.astype(np.float32), (dist * sf).astype(np.float32),
            (dist * sf / self.scale_factors[-1] / self.cfg.orb.scale_factor).astype(np.float32),
        )
        self.map.kf_lm_idx[kf1, fsel2] = ids

        self.cur_pose = T21.copy()
        self.cur_lm_idx = np.full(self.n_feat, -1, np.int32)
        self.cur_lm_idx[fsel2] = ids
        self.ref_kf = kf1
        self.last_kf_frame = self.frame_id
        self.new_kf_ids = [kf0, kf1]
        if self.kf_feats_hook is not None:
            self.kf_feats_hook(kf0, ref)
            self.kf_feats_hook(kf1, feats)
        if self.inertial:
            from orb_slam3_rgbl_tpu.imu.preintegration import ImuBias

            meas = self._imu_kf_acc.preintegrate(
                ImuBias(jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32)))
            if meas is not None:
                self.map.imu_preint[kf1] = imu_frontend.preint_to_numpy(meas)
                self.map.kf_prev_imu[kf1] = kf0
            self._imu_kf_acc.reset()
            self._last_imu_kf = kf1
        self._mono_ref = None
        return True

    # ------------------------------------------------------------------
    def _track_frame(self, feats: FrameFeatures, timestamp: float):
        """Motion-model (or reference-KF) tracking then local-map
        refinement. Returns (ok, n_inliers)."""
        lm_idx = None
        self._loc_total_inliers = 0
        if self.state in (RECENTLY_LOST, LOST):
            if self.state == RECENTLY_LOST and self._imu_grace_active(timestamp) \
                    and self._imu_ready():
                # inertial dead-reckoning grace (Tracking.cc:2019-2035):
                # carry the pose on the IMU prediction and try to
                # re-acquire the local map visually from it — the
                # reference's PredictStateIMU → TrackLocalMap sequence
                p = self._predict_pose_imu()
                if p is not None:
                    self.cur_pose = p
                    self.cur_vel = np.asarray(self._pred_vel, np.float32)
                    lm_idx, n_inl = self._track_local_map(
                        feats, np.full(self.n_feat, -1, np.int32))
                    self.cur_lm_idx = lm_idx
                    if n_inl >= 15:
                        return True, n_inl   # visually re-acquired
                    return False, 0          # carried on IMU alone
            # reference Tracking.cc:2036-2053: RECENTLY_LOST attempts
            # relocalization before giving up
            lm_idx, n = self._relocalization(feats)
            if n < 15:
                return False, 0
        if lm_idx is None and self.velocity is not None and self.state == OK:
            lm_idx, n = self._track_with_motion_model(feats, th=15.0)
            if n < 20:
                lm_idx, n = self._track_with_motion_model(feats, th=30.0)
            if n < 20:
                lm_idx = None
        if lm_idx is None:
            lm_idx, n = self._track_reference_keyframe(feats)
            if n < 10 and self.state == OK:
                lm_idx, n = self._relocalization(feats)
            if n < 10:
                return False, 0

        lm_idx, n_inl = self._track_local_map(feats, lm_idx)
        if self._imu_ready():
            # visual-inertial refinement against the last keyframe
            # (reference PoseInertialOptimizationLastKeyFrame path of
            # TrackLocalMap, Tracking.cc:3019-3036)
            vi_inl = self._vi_refine(feats, lm_idx)
            if vi_inl > 0:
                n_inl = vi_inl
        self.cur_lm_idx = lm_idx
        # acceptance (reference Tracking.cc:3064-3096): ≥ 30 inliers
        # (50 right after relocalization; inertial modes accept ≥ 15)
        need = 50 if self.frame_id < self.last_reloc_frame + self.max_frames else 30
        if self.inertial and self.map.imu_initialized:
            need = 15
        if self.only_tracking and n_inl < need:
            # reference localization mode keeps going on visual-odometry
            # evidence alone (mbVO, ≥20 total matches — Tracking.cc:2106)
            total = getattr(self, "_loc_total_inliers", 0)
            if total >= 20:
                return True, n_inl
        return n_inl >= need, n_inl

    # ------------------------------------------------------------------
    def _predict_pose(self) -> np.ndarray:
        if self._imu_ready():
            p = self._predict_pose_imu()
            if p is not None:
                return p
        if self.velocity is None or self.last_pose is None:
            return self.cur_pose
        return np.asarray(
            lie.se3_mul(jnp.asarray(self.velocity), jnp.asarray(self.last_pose)),
            np.float32,
        )

    # --- inertial helpers ---------------------------------------------
    def _imu_ready(self) -> bool:
        return (self.inertial and self.map.imu_initialized
                and self._last_imu_kf >= 0 and self._imu_kf_acc.n >= 2)

    def _imu_grace_active(self, timestamp: float) -> bool:
        """RECENTLY_LOST dead-reckoning window: an initialized inertial
        system rides the IMU prediction for ``time_recently_lost``
        seconds before falling to LOST (reference Tracking.cc:2019-2035)."""
        return (self.inertial and self.map.imu_initialized
                and timestamp - self._lost_since <= self.time_recently_lost)

    def _kf_vi_state(self, k: int):
        """VIState of keyframe k from map arrays (body frame)."""
        from orb_slam3_rgbl_tpu.optim.inertial import VIState
        from orb_slam3_rgbl_tpu.imu.preintegration import ImuBias

        T_bw = lie.se3_mul(jnp.asarray(self.T_bc), jnp.asarray(self.map.kf_pose[k]))
        return VIState(
            Twb=lie.se3_inv(T_bw),
            vw=jnp.asarray(self.map.kf_vel[k]),
            bias=ImuBias(jnp.asarray(self.map.kf_bg[k]), jnp.asarray(self.map.kf_ba[k])),
        )

    def _body_pose(self, Tcw: np.ndarray) -> jnp.ndarray:
        return lie.se3_inv(lie.se3_mul(jnp.asarray(self.T_bc), jnp.asarray(Tcw)))

    def _cam_pose(self, Twb) -> np.ndarray:
        return np.asarray(lie.se3_mul(jnp.asarray(self.T_cb), lie.se3_inv(jnp.asarray(Twb))), np.float32)

    def _predict_pose_imu(self) -> Optional[np.ndarray]:
        """IMU state propagation from the last keyframe
        (``Tracking::PredictStateIMU``, Tracking.cc:1772)."""
        from orb_slam3_rgbl_tpu.imu import preintegration as pre

        k = self._last_imu_kf
        bias = pre.ImuBias(jnp.asarray(self.map.kf_bg[k]), jnp.asarray(self.map.kf_ba[k]))
        meas = self._imu_kf_acc.preintegrate(bias)
        if meas is None:
            return None
        st = self._kf_vi_state(k)
        R1, v1, p1 = pre.predict_state(
            lie.se3_rot(st.Twb), st.vw, lie.se3_trans(st.Twb), meas, bias
        )
        self._pred_vel = np.asarray(v1, np.float32)
        return self._cam_pose(lie.se3(R1, p1))

    def _vi_refine(self, feats: FrameFeatures, lm_idx: np.ndarray) -> int:
        """15-DoF visual-inertial pose solve of the current frame.

        Anchor selection mirrors the reference ``TrackLocalMap``
        (Tracking.cc:3019-3036): when the map has NOT changed since the
        last frame was solved, a JOINT solve with the LAST FRAME's state
        under the previous solve's marginalization prior
        (``PoseInertialOptimizationLastFrame`` + ``mpcpi``,
        Optimizer.cc:3389+), re-marginalized each frame
        (``Optimizer::Marginalize``); otherwise anchor to the last
        keyframe held fixed (``PoseInertialOptimizationLastKeyFrame``),
        which seeds a fresh prior chain."""
        from orb_slam3_rgbl_tpu.optim import inertial
        from orb_slam3_rgbl_tpu.imu import preintegration as pre

        prev = None
        meas = None
        prior_L = None
        if (self._last_frame_vi is not None
                and self._last_frame_map_version == self.map.version
                and self._imu_frame_acc.n >= 2):
            Twb_l, vw_l, bg_l, ba_l = self._last_frame_vi
            bias_l = pre.ImuBias(jnp.asarray(bg_l), jnp.asarray(ba_l))
            prev = inertial.VIState(Twb=jnp.asarray(Twb_l),
                                    vw=jnp.asarray(vw_l), bias=bias_l)
            meas = self._imu_frame_acc.preintegrate(bias_l)
            prior_L = getattr(self, "_vi_prior_L", None)
        if meas is None:
            k = self._last_imu_kf
            prev = self._kf_vi_state(k)
            meas = self._imu_kf_acc.preintegrate(
                pre.ImuBias(jnp.asarray(self.map.kf_bg[k]),
                            jnp.asarray(self.map.kf_ba[k]))
            )
            prior_L = None
        if meas is None:
            return 0
        bound = lm_idx >= 0
        Xw = np.zeros((self.n_feat, 3), np.float32)
        Xw[bound] = self.map.lm_pos[lm_idx[bound]]
        obs = pose_opt.PoseObs(
            Xw=jnp.asarray(Xw), uv=feats.uv, u_right=feats.u_right,
            inv_sigma2=jnp.asarray(
                self.inv_sigma2[np.clip(np.asarray(feats.octave), 0, len(self.inv_sigma2) - 1)]
            ),
            valid=jnp.asarray(bound) & feats.valid,
        )
        state0 = inertial.VIState(
            Twb=self._body_pose(self.cur_pose),
            vw=jnp.asarray(getattr(self, "_pred_vel", self.cur_vel)),
            bias=prev.bias,
        )
        if prior_L is not None:
            out, _prev_out, n_inl, H_marg = inertial.inertial_pose_optimize_prior(
                state0, prev, jnp.asarray(prior_L), meas, obs,
                jnp.asarray(self.T_cb), self.geo_cam
            )
        else:
            out, n_inl, H_marg = inertial.inertial_pose_optimize(
                state0, prev, meas, obs, jnp.asarray(self.T_cb), self.geo_cam
            )
        # carry the marginal information forward (the mpcpi chain)
        self._vi_prior_L = _sqrt_info(np.asarray(H_marg, np.float64))
        self.cur_pose = self._cam_pose(out.Twb)
        self.cur_vel = np.asarray(out.vw, np.float32)
        self.cur_bias = (np.asarray(out.bias.bg, np.float32),
                         np.asarray(out.bias.ba, np.float32))
        return int(n_inl)

    def _track_with_motion_model(self, feats: FrameFeatures, th: float):
        """Project last frame's landmarks with the constant-velocity
        prediction and match in windows (reference Tracking.cc:2888,
        th=15 for RGBD-like sensors, doubled on retry)."""
        pred = self._predict_pose()
        lm_ids = self.last_lm_idx
        safe = np.clip(lm_ids, 0, None)
        sel = lm_ids >= 0
        sel &= self.map.lm_valid[safe]
        if self.last_lm_gen is not None:
            # slot-recycling guard: a culled+reused slot passes lm_valid
            # but its generation moved (MapState.lm_gen)
            sel &= self.map.lm_gen[safe] == self.last_lm_gen
        ids = lm_ids[sel]
        if ids.size < 10:
            return None, 0
        cap = self.n_feat
        P = np.zeros((cap, 3), np.float32)
        Pdesc = np.zeros((cap, 8), np.uint32)
        Poct = np.zeros(cap, np.int32)
        Pvalid = np.zeros(cap, bool)
        m = min(ids.size, cap)
        Pangle = np.zeros(cap, np.float32)
        P[:m] = self.map.lm_pos[ids[:m]]
        Pdesc[:m] = self.map.lm_desc[ids[:m]]
        Poct[:m] = np.asarray(self.last_feats.octave)[np.nonzero(sel)[0][:m]]
        Pangle[:m] = np.asarray(self.last_feats.angle)[np.nonzero(sel)[0][:m]]
        Pvalid[:m] = True
        ids_global = np.full(cap, -1, np.int64)
        ids_global[:m] = ids[:m]
        if self.only_tracking and m < cap:
            # localization mode: temporal visual-odometry points from the
            # last frame's close unbound depth (reference UpdateLastFrame,
            # Tracking.cc:2815-2886 — lets tracking continue through
            # regions the frozen map never covered)
            lf_d = np.asarray(self.last_feats.depth)
            lf_valid = np.asarray(self.last_feats.valid)
            vo = np.nonzero(lf_valid & (lf_d > 0) & (self.last_lm_idx < 0))[0]
            if vo.size:
                order_d = vo[np.argsort(lf_d[vo])]
                keep = order_d[(lf_d[order_d] < self.th_depth_m)
                               | (np.arange(order_d.size) < 100)]
                keep = keep[: cap - m]
                if keep.size:
                    uv_l = np.asarray(self.last_feats.uv)[keep]
                    Xvo = self._unproject(uv_l, lf_d[keep], self.last_pose)
                    e = m + keep.size
                    P[m:e] = Xvo
                    Pdesc[m:e] = np.asarray(self.last_feats.desc)[keep]
                    Poct[m:e] = np.asarray(self.last_feats.octave)[keep]
                    Pangle[m:e] = np.asarray(self.last_feats.angle)[keep]
                    Pvalid[m:e] = True
                    ids_global[m:e] = -2  # VO sentinel: pose-only evidence
        lm_idx, n, feat_slot = self._match_and_bind(
            feats, pred, P, Pdesc, Poct, Pvalid,
            ids_global=ids_global, th=th, Pangle=Pangle)
        has_vo = self.only_tracking and (ids_global == -2).any()
        n_total = int((feat_slot >= 0).sum())
        if (n if not has_vo else n_total) < 10:
            return lm_idx, n
        if has_vo:
            # optimize against map + VO structure jointly; only map
            # matches stay bound afterwards
            Xw = P[np.clip(feat_slot, 0, cap - 1)]
            obs = pose_opt.PoseObs(
                Xw=jnp.asarray(Xw), uv=feats.uv, u_right=feats.u_right,
                inv_sigma2=jnp.asarray(self.inv_sigma2[
                    np.clip(np.asarray(feats.octave), 0, len(self.inv_sigma2) - 1)]),
                valid=jnp.asarray(feat_slot >= 0) & feats.valid,
            )
            res = pose_opt.pose_optimize(jnp.asarray(pred, jnp.float32), obs, self.geo_cam)
            self.cur_pose = np.asarray(res.Tcw, np.float32)
            inliers = np.asarray(res.inliers)
            self._loc_total_inliers = int(res.n_inliers)
            lm_idx = np.where(inliers, lm_idx, -1)
            lm_idx = np.where(lm_idx == -2, -1, lm_idx)
            return lm_idx, int((lm_idx >= 0).sum())
        # pose optimization on the bindings
        pose, n_inl, inliers = self._optimize_pose(feats, lm_idx, pred)
        self.cur_pose = pose
        lm_idx = np.where(inliers, lm_idx, -1)
        return lm_idx, int(n_inl)

    def _track_reference_keyframe(self, feats: FrameFeatures):
        """Brute-force descriptor match against the reference keyframe
        (reference Tracking.cc:2754 uses BoW-accelerated matching; the MXU
        distance table makes full 2000×2000 cheap)."""
        k = self.ref_kf
        if k < 0:
            return np.full(self.n_feat, -1, np.int32), 0
        kf_desc = jnp.asarray(self.map.kf_desc[k])
        kf_valid = jnp.asarray(self.map.kf_lm_idx[k] >= 0)
        d = matching.distance_table(feats.desc, kf_desc, feats.valid, kf_valid)
        idx, dist = matching.mutual_best_match(
            d, feats.angle, jnp.asarray(self.map.kf_angle[k]),
            th=matching.TH_LOW, ratio=0.7, check_rotation=True,
        )
        idx = np.asarray(idx)
        lm_idx = np.where(idx >= 0, self.map.kf_lm_idx[k][np.clip(idx, 0, None)], -1).astype(np.int32)
        lm_idx = np.where((lm_idx >= 0) & self.map.lm_valid[np.clip(lm_idx, 0, None)], lm_idx, -1)
        n = int((lm_idx >= 0).sum())
        if n < 10:
            return lm_idx, n
        init = self.last_pose if self.last_pose is not None else self.cur_pose
        pose, n_inl, inliers = self._optimize_pose(feats, lm_idx, init)
        self.cur_pose = pose
        lm_idx = np.where(inliers, lm_idx, -1)
        return lm_idx, int(n_inl)

    # ------------------------------------------------------------------
    def _track_local_map(self, feats: FrameFeatures, lm_idx: np.ndarray):
        """Expand to the covisibility-local map and re-optimize
        (reference ``TrackLocalMap`` Tracking.cc:2983: UpdateLocalMap +
        SearchLocalPoints + PoseOptimization)."""
        local_kfs = self._local_keyframes(lm_idx)
        local_lms = self._local_landmarks(local_kfs, exclude=lm_idx)

        if local_lms.size > 0:
            cap = LOCAL_LM_CAP
            P = np.zeros((cap, 3), np.float32)
            Pdesc = np.zeros((cap, 8), np.uint32)
            Poct = np.zeros(cap, np.int32)
            Pvalid = np.zeros(cap, bool)
            m = min(local_lms.size, cap)
            sel = local_lms[:m]
            P[:m] = self.map.lm_pos[sel]
            Pdesc[:m] = self.map.lm_desc[sel]
            # predicted octave from distance (MapPoint::PredictScale)
            centers = P[:m] - np.asarray(
                lie.se3_trans(lie.se3_inv(jnp.asarray(self.cur_pose))))[None, :]
            dist = np.linalg.norm(centers, axis=-1)
            ratio = self.map.lm_max_dist[sel] / np.maximum(dist, 1e-6)
            Poct[:m] = np.clip(
                np.ceil(np.log(np.maximum(ratio, 1e-6)) / np.log(self.cfg.orb.scale_factor)),
                0, self.cfg.orb.n_levels - 1,
            ).astype(np.int32)
            Pvalid[:m] = True
            # visibility bookkeeping
            self.map.lm_visible[sel] += 1
            extra_idx, _, _ = self._match_and_bind(
                feats, self.cur_pose, P, Pdesc, Poct, Pvalid, ids_global=sel,
                th=4.0, exclude_bound=lm_idx,
            )
            lm_idx = np.where(lm_idx >= 0, lm_idx, extra_idx)

        pose, n_inl, inliers = self._optimize_pose(feats, lm_idx, self.cur_pose)
        self.cur_pose = pose
        lm_idx = np.where(inliers, lm_idx, -1)
        found = lm_idx[lm_idx >= 0]
        self.map.lm_found[found] += 1
        return lm_idx, int(n_inl)

    def _local_keyframes(self, lm_idx: np.ndarray) -> np.ndarray:
        """Keyframes sharing landmarks with the current frame, ranked by
        count (reference ``UpdateLocalKeyFrames`` Tracking.cc:3491)."""
        ids = lm_idx[lm_idx >= 0]
        if ids.size == 0:
            return np.array([self.ref_kf], np.int64) if self.ref_kf >= 0 else np.zeros(0, np.int64)
        mask = np.zeros(self.map.capacity_lm, bool)
        mask[ids] = True
        valid_kfs = self.map.valid_kf_ids()
        tbl = self.map.kf_lm_idx[valid_kfs]
        shared = (mask[np.clip(tbl, 0, None)] & (tbl >= 0)).sum(axis=1)
        order = np.argsort(-shared)
        sel = valid_kfs[order[:LOCAL_KF_CAP]]
        sel = sel[shared[order[:LOCAL_KF_CAP]] > 0]
        if sel.size:
            # reference keyframe = most-shared
            self.ref_kf = int(sel[0])
        return sel

    def _local_landmarks(self, kf_ids: np.ndarray, exclude: np.ndarray) -> np.ndarray:
        if kf_ids.size == 0:
            return np.zeros(0, np.int64)
        tbl = self.map.kf_lm_idx[kf_ids]
        ids = np.unique(tbl[tbl >= 0])
        ids = ids[self.map.lm_valid[ids]]
        bound = set(exclude[exclude >= 0].tolist())
        if bound:
            ids = ids[~np.isin(ids, list(bound))]
        return ids

    # ------------------------------------------------------------------
    def _match_and_bind(self, feats, pose, P, Pdesc, Poct, Pvalid, ids_global,
                        th: float, exclude_bound: Optional[np.ndarray] = None,
                        Pangle: Optional[np.ndarray] = None):
        """Project landmark array P with `pose`, window-match against the
        frame, return per-feature landmark bindings (N,)."""
        from orb_slam3_rgbl_tpu.geometry.camera import np_geo_project

        pc = np.asarray(lie.se3_apply(jnp.asarray(pose), jnp.asarray(P)))
        z = pc[:, 2]
        proj_uv = np_geo_project(self.geo_cam, pc).astype(np.float32)
        u, v = proj_uv[:, 0], proj_uv[:, 1]
        in_front = z > 0.1
        in_img = (u >= 0) & (u < self.cam.width) & (v >= 0) & (v < self.cam.height)
        Pvalid = Pvalid & in_front & np.nan_to_num(in_img, nan=False)
        radius = (th * self.scale_factors[np.clip(Poct, 0, len(self.scale_factors) - 1)]).astype(np.float32)

        kp_valid = np.asarray(feats.valid)
        if exclude_bound is not None:
            kp_valid = kp_valid & (exclude_bound < 0)
        idx, dist = matching.windowed_projection_match(
            jnp.asarray(proj_uv), jnp.asarray(Pvalid), jnp.asarray(Pdesc),
            jnp.asarray(Poct), feats.uv, jnp.asarray(kp_valid), feats.desc,
            feats.octave, jnp.asarray(radius), th=matching.TH_HIGH,
            proj_angle=None if Pangle is None else jnp.asarray(Pangle),
            kp_angle=None if Pangle is None else feats.angle,
        )
        idx = np.asarray(idx)
        dist = np.asarray(dist)
        # resolve collisions feature-wise: keep the closest landmark
        lm_idx = np.full(self.n_feat, -1, np.int32)
        feat_slot = np.full(self.n_feat, -1, np.int32)
        hit = np.nonzero(idx >= 0)[0]
        if hit.size:
            order = hit[np.argsort(dist[hit], kind="stable")]
            feats_of = idx[order]
            first = np.unique(feats_of, return_index=True)[1]
            lm_idx[feats_of[first]] = ids_global[order[first]]
            feat_slot[feats_of[first]] = order[first].astype(np.int32)
        return lm_idx, int((lm_idx >= 0).sum()), feat_slot

    def _optimize_pose(self, feats, lm_idx, init_pose):
        bound = lm_idx >= 0
        Xw = np.zeros((self.n_feat, 3), np.float32)
        Xw[bound] = self.map.lm_pos[lm_idx[bound]]
        obs = pose_opt.PoseObs(
            Xw=jnp.asarray(Xw),
            uv=feats.uv,
            u_right=feats.u_right,
            inv_sigma2=jnp.asarray(
                self.inv_sigma2[np.clip(np.asarray(feats.octave), 0, len(self.inv_sigma2) - 1)]
            ),
            valid=jnp.asarray(bound) & feats.valid,
        )
        res = pose_opt.pose_optimize(jnp.asarray(init_pose, jnp.float32), obs,
                                     self.geo_cam)
        return (
            np.asarray(res.Tcw, np.float32),
            int(res.n_inliers),
            np.asarray(res.inliers),
        )

    # ------------------------------------------------------------------
    def _relocalization(self, feats: FrameFeatures):
        """Recover the pose from scratch (reference ``Relocalization``
        ``Tracking.cc:3643-3810``): KFDB candidates → descriptor match →
        PnP RANSAC → robust pose refinement. Depth sensors supply the 3D
        of query features, so hypotheses are rigid 3-point alignments
        (MLPnP replaced — see ``optim/pnp.py``)."""
        fail = np.full(self.n_feat, -1, np.int32), 0
        if self.kf_db is None:
            return fail
        desc_np = np.asarray(feats.desc)
        valid_np = np.asarray(feats.valid)
        depth_np = np.asarray(feats.depth)
        cands = self.kf_db.detect_relocalization_candidates(desc_np, valid_np, 5)
        from orb_slam3_rgbl_tpu.ops import matching as _m

        for cand in cands:
            cand = int(cand)
            b2 = self.map.kf_lm_idx[cand] >= 0
            if b2.sum() < 15:
                continue
            d = _m.distance_table(
                feats.desc, jnp.asarray(self.map.kf_desc[cand]),
                feats.valid, jnp.asarray(b2),
            )
            idx, _ = _m.mutual_best_match(
                d, feats.angle, jnp.asarray(self.map.kf_angle[cand]),
                th=_m.TH_LOW, ratio=0.75, check_rotation=True)
            idx = np.asarray(idx)
            # depth sensors: 3D-3D rigid hypotheses; mono: 2D-3D DLT PnP
            has_depth = depth_np > 0 if not self.is_mono else np.ones_like(depth_np, bool)
            f1 = np.nonzero((idx >= 0) & has_depth)[0]
            if f1.size < 15:
                continue
            lm = self.map.kf_lm_idx[cand, idx[f1]]
            ok_lm = self.map.lm_valid[lm]
            f1, lm = f1[ok_lm], lm[ok_lm]
            if f1.size < 15:
                continue
            uv = np.asarray(feats.uv)[f1]
            s2 = (self.cfg.orb.scale_factor ** (2 * np.asarray(feats.octave)[f1])).astype(np.float32)
            # fixed-tier padding: the match count varies per candidate and
            # unpadded shapes would compile a fresh PnP executable per call
            from orb_slam3_rgbl_tpu.slam.loop_closing import _pair_tier

            cap = _pair_tier(len(f1))
            Pn = min(len(f1), cap)   # truncate when n_features > hi tier
            f1, lm, uv, s2 = f1[:Pn], lm[:Pn], uv[:Pn], s2[:Pn]

            def padp(a, fill=0.0):
                a = np.asarray(a, np.float32)
                o = np.full((cap,) + a.shape[1:], fill, np.float32)
                o[:Pn] = a[:Pn]
                return o

            vm = np.zeros(cap, bool)
            vm[:Pn] = True
            Xl = padp(self.map.lm_pos[lm])
            uvp = padp(uv)
            s2p = padp(s2, 1.0)
            self._reloc_key, sub = jax.random.split(self._reloc_key)
            if self.is_mono:
                res = pnp.dlt_pnp_ransac(
                    jnp.asarray(Xl), jnp.asarray(uvp),
                    jnp.asarray(s2p), jnp.asarray(vm), self.cam, sub,
                )
            else:
                from orb_slam3_rgbl_tpu.geometry.camera import np_geo_unproject

                z = depth_np[f1]
                p_cam = padp((np_geo_unproject(self.geo_cam, uv)
                              * z[:, None]).astype(np.float32))
                res = pnp.rigid_pnp_ransac(
                    jnp.asarray(p_cam), jnp.asarray(Xl),
                    jnp.asarray(uvp), jnp.asarray(s2p),
                    jnp.asarray(vm), self.cam, sub,
                )
            # reference RANSAC accepts ≥ 10 inliers (SetRansacParameters
            # minInliers=10, Tracking.cc:3690), refines, then escalates
            # with a wide SearchByProjection against ALL candidate-KF
            # landmarks before the 50-inlier final accept (Tracking.cc:3760)
            if int(res.n_inliers) < 10:
                continue
            lm_idx = np.full(self.n_feat, -1, np.int32)
            inl = np.asarray(res.inliers)[:Pn]
            lm_idx[f1[inl]] = lm[inl]
            pose, n_inl, inliers = self._optimize_pose(
                feats, lm_idx, np.asarray(res.Tcw, np.float32)
            )
            if n_inl < 10:
                continue
            lm_idx = np.where(inliers, lm_idx, -1)
            if n_inl < 50:
                cand_lms = self.map.kf_lm_idx[cand]
                cand_lms = np.unique(cand_lms[cand_lms >= 0])
                cand_lms = cand_lms[self.map.lm_valid[cand_lms]]
                cap = self.n_feat
                P = np.zeros((cap, 3), np.float32)
                Pdesc = np.zeros((cap, 8), np.uint32)
                Poct = np.zeros(cap, np.int32)
                Pvalid = np.zeros(cap, bool)
                mm = min(cand_lms.size, cap)
                P[:mm] = self.map.lm_pos[cand_lms[:mm]]
                Pdesc[:mm] = self.map.lm_desc[cand_lms[:mm]]
                Pvalid[:mm] = True
                extra, _, _ = self._match_and_bind(
                    feats, pose, P, Pdesc, Poct, Pvalid,
                    ids_global=cand_lms[:mm], th=10.0, exclude_bound=lm_idx,
                )
                lm_idx = np.where(lm_idx >= 0, lm_idx, extra)
                pose, n_inl, inliers = self._optimize_pose(feats, lm_idx, pose)
                lm_idx = np.where(inliers, lm_idx, -1)
            if n_inl >= 30:
                self.cur_pose = pose
                self.last_reloc_frame = self.frame_id
                self.ref_kf = cand
                return lm_idx, int(n_inl)
        return fail

    # ------------------------------------------------------------------
    def _maybe_insert_keyframe(self, feats, timestamp, n_inl) -> bool:
        """Keyframe policy (reference ``NeedNewKeyFrame`` Tracking.cc:3098)
        + creation (``CreateNewKeyFrame`` Tracking.cc:3250)."""
        if self.ref_kf < 0 or self.only_tracking:
            # reference NeedNewKeyFrame returns false in localization-only
            # mode (Tracking.cc:3100-3102)
            return False
        # inertial temporal-density rules (reference Tracking.cc:3142-3151):
        # before IMU init insert every 0.25 s so the init window has a
        # dense preintegration chain; after init every 0.5 s keeps the
        # chain alive
        if self.inertial and self._last_imu_kf >= 0:
            gap = timestamp - float(self.map.kf_timestamp[self._last_imu_kf])
            if (not self.map.imu_initialized and gap >= 0.25) or gap >= 0.5:
                self._create_keyframe(feats, timestamp)
                return True
        # reference: suppress insertion right after relocalization when the
        # map is established (Tracking.cc:3109-3112)
        if (self.map.n_kf > self.max_frames
                and self.frame_id < self.last_reloc_frame + self.max_frames):
            return False
        forced = (self.force_kf_every > 0
                  and self.frame_id >= self.last_kf_frame + self.force_kf_every)
        want = forced
        if not want:
            ref_matches = self._ref_kf_tracked()
            depth = np.asarray(feats.depth)
            valid = np.asarray(feats.valid)
            close = valid & (depth > 0) & (depth < self.th_depth_m)
            tracked_close = close & (self.cur_lm_idx >= 0)
            non_tracked_close = close & (self.cur_lm_idx < 0)
            need_close = self._need_close(int(tracked_close.sum()),
                                          int(non_tracked_close.sum()))

            # reference thRefRatio: mono 0.9, stereo/RGBD 0.75; 0.4 ≤2 KFs
            th_ref = 0.75
            if self.map.n_kf < 2:
                th_ref = 0.4
            if self.is_mono:
                th_ref = 0.9
            c1a = self.frame_id >= self.last_kf_frame + self.max_frames
            c1b = self.frame_id >= self.last_kf_frame + self.min_frames
            c1c = n_inl < ref_matches * 0.25 or need_close
            c2 = (n_inl < ref_matches * th_ref or need_close) and n_inl > 15
            want = (c1a or c1b or c1c) and c2
        if not want:
            return False
        # the busy-gate declines AFTER the policy decision so every
        # starved insertion is visible (reference InterruptBA instead
        # aborts the mapping BA — we count what the gate costs)
        if self.mapping_busy_fn is not None and self.mapping_busy_fn():
            self.deferred_kf += 1
            return False
        self._create_keyframe(feats, timestamp)
        return True

    def _create_keyframe(self, feats, timestamp):
        if self.pre_kf_hook is not None:
            self.pre_kf_hook()
        import contextlib

        with (self.kf_guard if self.kf_guard is not None
              else contextlib.nullcontext()):
            self._create_keyframe_locked(feats, timestamp)

    def _create_keyframe_locked(self, feats, timestamp):
        uv = np.asarray(feats.uv)
        depth = np.asarray(feats.depth)
        valid = np.asarray(feats.valid)
        lm_idx = self.cur_lm_idx.copy()
        kf_id = self.map.add_keyframe(
            self.cur_pose, uv, np.asarray(feats.octave, np.int16),
            np.asarray(feats.desc), depth, np.asarray(feats.u_right),
            valid, lm_idx, timestamp, self.frame_id,
            angle=np.asarray(feats.angle),
        )
        # create close landmarks for unbound features (reference sorts by
        # depth, creates at least the 100 closest / all closer than ThDepth)
        cand = np.nonzero(valid & (depth > 0) & (lm_idx < 0))[0]
        if cand.size:
            order = cand[np.argsort(depth[cand])]
            keep = order[(depth[order] < self.th_depth_m) | (np.arange(order.size) < 100)]
            if keep.size:
                rays = self._unproject(uv[keep], depth[keep], self.cur_pose)
                center = np.asarray(lie.se3_trans(lie.se3_inv(jnp.asarray(self.cur_pose))))
                vecs = rays - center[None, :]
                d = np.linalg.norm(vecs, axis=-1)
                normals = vecs / np.maximum(d[:, None], 1e-9)
                octv = np.asarray(feats.octave)[keep]
                sf = self.scale_factors[np.clip(octv, 0, len(self.scale_factors) - 1)]
                ids = self.map.add_landmarks(
                    rays.astype(np.float32), np.asarray(feats.desc)[keep], kf_id, keep,
                    normals.astype(np.float32), (d * sf).astype(np.float32),
                    (d * sf / self.scale_factors[-1] / self.cfg.orb.scale_factor).astype(np.float32),
                )
                self.cur_lm_idx[keep] = ids
                self.map.kf_lm_idx[kf_id, keep] = ids
        if self.inertial:
            from orb_slam3_rgbl_tpu.imu.preintegration import ImuBias

            self.map.kf_vel[kf_id] = self.cur_vel
            self.map.kf_bg[kf_id], self.map.kf_ba[kf_id] = self.cur_bias
            prev = self._last_imu_kf
            if prev >= 0:
                meas = self._imu_kf_acc.preintegrate(
                    ImuBias(jnp.asarray(self.map.kf_bg[prev]),
                            jnp.asarray(self.map.kf_ba[prev]))
                )
                if meas is not None:
                    self.map.imu_preint[kf_id] = imu_frontend.preint_to_numpy(meas)
                    self.map.kf_prev_imu[kf_id] = prev
            self._imu_kf_acc.reset()
            self._last_imu_kf = kf_id
        self.ref_kf = kf_id
        self.last_kf_frame = self.frame_id
        self.new_kf_id = kf_id
        self.new_kf_ids = [kf_id]
        if self.kf_feats_hook is not None:
            df = self._pending_device_feats
            self.kf_feats_hook(kf_id, df if df is not None else feats)
            self._pending_device_feats = None

    # ------------------------------------------------------------------
    def _unproject(self, uv: np.ndarray, depth: np.ndarray, Tcw) -> np.ndarray:
        from orb_slam3_rgbl_tpu.geometry.camera import np_geo_unproject

        # pure numpy: the input size varies per keyframe — a jitted kernel
        # would recompile on every call (seconds each on the TPU tunnel)
        pc = (np_geo_unproject(self.geo_cam, uv) * depth[:, None]).astype(np.float32)
        Twc = lie.np_se3_inv(np.asarray(Tcw, np.float32))
        return lie.np_quat_rotate(Twc[:4], pc) + Twc[4:7]

    def _update_last(self, feats):
        if self.state == OK:
            if self.last_pose is not None:
                self.velocity = lie.np_se3_mul(self.cur_pose,
                                               lie.np_se3_inv(self.last_pose))
            self.last_pose = self.cur_pose.copy()
            self.last_feats = feats
            self.last_lm_idx = getattr(self, "cur_lm_idx", np.full(self.n_feat, -1, np.int32)).copy()
            self.last_lm_gen = self.map.lm_gen[np.clip(self.last_lm_idx, 0, None)].copy()
        elif self.state in (RECENTLY_LOST, LOST):
            self.velocity = None

    def _log_trajectory(self, timestamp):
        """Relative pose to the reference keyframe, resolved at save time
        against the (possibly BA-corrected) keyframe pose — the exact
        scheme of ``SaveTrajectoryKITTI`` (System.cc:1348)."""
        if self.ref_kf >= 0 and self.state in (OK, RECENTLY_LOST):
            Tcr = lie.np_se3_mul(self.cur_pose,
                                 lie.np_se3_inv(self.map.kf_pose[self.ref_kf]))
            self.traj_rel.append(np.asarray(Tcr, np.float32))
            self.traj_ref_kf.append(self.ref_kf)
            self.traj_time.append(timestamp)
            self.traj_lost.append(self.state != OK)
        else:
            self.traj_rel.append(np.asarray(lie.se3_identity(), np.float32))
            self.traj_ref_kf.append(max(self.ref_kf, 0))
            self.traj_time.append(timestamp)
            self.traj_lost.append(True)

    # ==================================================================
    # Fused fast path (single-dispatch engine hot loop)
    # ==================================================================
    def track_image_rgbd(self, img, depth_img, timestamp: float,
                         timer=None) -> TrackResult:
        """One-dispatch tracking of an RGB-D frame (fused step in 'rgbd'
        mode — dense depth sampled at the keypoints,
        ``Frame::ComputeStereoFromRGBD``)."""
        return self.track_image_rgbl(img, depth_img, None, timestamp,
                                     timer=timer)

    def track_image_rgbl(self, img, points, cloud_valid, timestamp: float,
                         timer=None) -> TrackResult:
        """One-dispatch tracking of an RGB-L (or RGB-D — see
        ``track_image_rgbd``) frame via the fused step
        (``compiled.make_track_step``). Falls back to the classic
        per-stage path on initialization, tracking failure, or any state
        where the reference would leave the TrackWithMotionModel →
        TrackLocalMap ladder (reloc, lost, inertial)."""
        fp = self.fast
        usable = (
            fp is not None and self.state == OK and not self.inertial
            and self.velocity is not None and self.ref_kf >= 0
            and self.last_lm_idx is not None
            and self.frame_id + 1 >= self.last_reloc_frame + self.max_frames
        )
        if usable:
            # prefetch gate: a forced-cadence KF is due, or (natural
            # policy) ≥3 frames since the last KF — the realistic KF
            # period is 3-5 frames, so this skips most non-KF frames
            # (each prefetch costs ~130 KB of tunnel bandwidth)
            gap = self.frame_id + 1 - self.last_kf_frame
            kf_likely = (self.ref_kf >= 0 and not self.only_tracking
                         and gap >= (self.force_kf_every
                                     if self.force_kf_every > 0
                                     else max(3, self.min_frames)))
            if timer is not None:
                with timer.stage("pose_pred"):
                    fp.sync(self.map, self.ref_kf, self.last_feats,
                            self.last_lm_idx, self.last_lm_gen)
                    pred = self._predict_pose_fused()
                with timer.stage("lm_track"):
                    out = fp.run(img, points, cloud_valid, pred)
                    if kf_likely:
                        self._prefetch_feats(out.feats)
                    host = self._download_fused(out)
            else:
                fp.sync(self.map, self.ref_kf, self.last_feats,
                        self.last_lm_idx, self.last_lm_gen)
                out = fp.run(img, points, cloud_valid, self._predict_pose_fused())
                if kf_likely:
                    self._prefetch_feats(out.feats)
                host = self._download_fused(out)
            if host[0] >= 30:
                return self._accept_fused(out, host, timestamp, timer=timer)
            feats = out.feats  # reuse the extraction for the classic ladder
        else:
            feats = self._extract_rgbl(img, points, cloud_valid)
        return self.track(feats, timestamp)

    def _download_fused(self, out):
        """ONE host transfer for everything the control loop needs — the
        step packs its scalars/bindings into a single f32 vector; each
        separate fetch would pay a device round-trip (the median frame
        was ~80% host overhead before packing)."""
        v = np.asarray(jax.device_get(out.packed))
        N = self.n_feat
        n_inl, n_mm, n_tc, n_ntc = v[:4].astype(np.int64)
        pose = v[4:11].astype(np.float32)
        bind_prev = v[11: 11 + N].astype(np.int32)
        bind_win = v[11 + N: 11 + 2 * N].astype(np.int32)
        win_visible = v[11 + 2 * N:] > 0.5
        return (int(n_inl), pose, bind_prev, bind_win, win_visible,
                int(n_tc), int(n_ntc))

    def _extract_rgbl(self, img, points, cloud_valid) -> FrameFeatures:
        from orb_slam3_rgbl_tpu.ops import depth as depth_ops
        from orb_slam3_rgbl_tpu.slam import frame as frame_mod

        cfg, cam, lc = self.cfg, self.cam, self.cfg.lidar
        feats = frame_mod.extract_features(
            img, cam.height, cam.width, n_features=cfg.orb.n_features,
            n_levels=cfg.orb.n_levels, scale_factor=cfg.orb.scale_factor,
            ini_th=float(cfg.orb.ini_th_fast), min_th=float(cfg.orb.min_th_fast),
        )
        if self.fast is not None and self.fast.mode == "mono":
            return feats
        if self.fast is not None and self.fast.mode == "rgbd":
            return frame_mod.attach_depth_map(feats, points, cam.bf)
        K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float32)
        P = jnp.asarray(depth_ops.lidar_projection_matrix(K, np.asarray(lc.T_velo_cam)))
        feats, _ = frame_mod.attach_lidar_depth(
            feats, points, P, cam.height, cam.width, cam.bf,
            min_dist=lc.min_dist, max_dist=lc.max_dist, method=lc.method,
            dil_kind=lc.dil_kernel_type, dil_ku=lc.dil_kernel_size_u,
            dil_kv=lc.dil_kernel_size_v, valid_mask=cloud_valid,
        )
        return feats

    def _predict_pose_fused(self) -> np.ndarray:
        return lie.np_se3_mul(self.velocity, self.last_pose)

    def _need_close(self, tracked_close: int, nontracked_close: int) -> bool:
        """Close-point starvation trigger (``bNeedToInsertClose``,
        Tracking.cc:3160-3161): exact reference constants."""
        return tracked_close < 100 and nontracked_close > 70

    def _ref_kf_tracked(self) -> int:
        """Reference ``KeyFrame::TrackedMapPoints(nMinObs)`` used by
        NeedNewKeyFrame (Tracking.cc:3120-3123): ref-KF landmarks observed
        by ≥ 3 keyframes (≥ 2 while the map is tiny) — NOT all bound
        features, which would overcount the fresh depth-created points and
        force a keyframe every frame."""
        key = (self.map.version, self.ref_kf)
        cached = getattr(self, "_ref_tracked_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        min_obs = 3 if self.map.n_kf > 2 else 2
        ids = self.map.kf_lm_idx[self.ref_kf]
        ids = ids[ids >= 0]
        if ids.size == 0:
            return 0
        counts = self.map.observation_counts(ids)
        n = int((counts >= min_obs).sum())
        # degenerate young map (every landmark single-observation — e.g.
        # right after stereo init): fall back to the bound count so the
        # ratio clause can trigger the SECOND keyframe at all; the
        # reference escapes this via close-point starvation on real data
        out = n if n > 0 else ids.size
        # observation counts only move on structural map changes — cache
        # per (version, ref_kf) so the per-frame policy stays O(1)
        self._ref_tracked_cache = (key, out)
        return out

    def _fast_kf_policy(self, n_inl: int, tracked_close: int,
                        nontracked_close: int) -> bool:
        """Host replica of ``_maybe_insert_keyframe``'s decision using the
        close-point scalars computed on device (NeedNewKeyFrame,
        Tracking.cc:3098-3249)."""
        if self.ref_kf < 0 or self.only_tracking:
            return False
        if (self.map.n_kf > self.max_frames
                and self.frame_id < self.last_reloc_frame + self.max_frames):
            return False
        forced = (self.force_kf_every > 0
                  and self.frame_id >= self.last_kf_frame + self.force_kf_every)
        want = forced
        if not want:
            ref_matches = self._ref_kf_tracked()
            need_close = self._need_close(tracked_close, nontracked_close)
            th_ref = 0.75
            if self.map.n_kf < 2:
                th_ref = 0.4
            if self.is_mono:
                th_ref = 0.9
            c1a = self.frame_id >= self.last_kf_frame + self.max_frames
            c1b = self.frame_id >= self.last_kf_frame + self.min_frames
            c1c = n_inl < ref_matches * 0.25 or need_close
            c2 = (n_inl < ref_matches * th_ref or need_close) and n_inl > 15
            want = (c1a or c1b or c1c) and c2
        if not want:
            return False
        if self.mapping_busy_fn is not None and self.mapping_busy_fn():
            self.deferred_kf += 1
            return False
        return True

    def _accept_fused(self, out, host, timestamp: float,
                      timer=None) -> TrackResult:
        fp = self.fast
        self.frame_id += 1
        self.new_kf_ids = []
        n_inl, pose, bind_prev, bind_win, win_visible, n_tc, n_ntc = host
        pose = np.asarray(pose, np.float32)
        cur = np.full(self.n_feat, -1, np.int32)
        cur_gen = np.zeros(self.n_feat, np.int32)
        pm = bind_prev >= 0
        cur[pm] = fp.prev_lm_ids[bind_prev[pm]]
        cur_gen[pm] = fp.prev_lm_gen[bind_prev[pm]]
        wm = bind_win >= 0
        cur[wm] = fp.win_ids[bind_win[wm]]
        cur_gen[wm] = fp.win_gen[bind_win[wm]]
        # slot-recycling guard (MapState.lm_gen): an async mapping job may
        # have culled + reused a slot since the window snapshot — drop
        # those bindings instead of silently re-associating
        b = cur >= 0
        safe = np.clip(cur, 0, None)
        stale = b & ((~self.map.lm_valid[safe])
                     | (self.map.lm_gen[safe] != cur_gen))
        if stale.any():
            cur[stale] = -1
        self.cur_pose = pose
        self.cur_lm_idx = cur

        # visibility / found bookkeeping (MapPoint::IncreaseVisible/Found);
        # deferred while a mapping job is mutating the arrays in place
        vis = win_visible[: len(fp.win_ids)]
        self._bump_stats(fp.win_ids[vis], fp.win_gen[vis],
                         cur[cur >= 0], cur_gen[cur >= 0])

        created = False
        if self._fast_kf_policy(n_inl, int(n_tc), int(n_ntc)):
            self._pending_device_feats = out.feats
            if timer is not None:
                with timer.stage("new_kf"):
                    self._create_keyframe(self._download_feats(out.feats),
                                          timestamp)
            else:
                self._create_keyframe(self._download_feats(out.feats),
                                      timestamp)
            created = True

        self._log_trajectory(timestamp)
        if self.last_pose is not None:
            self.velocity = lie.np_se3_mul(pose, lie.np_se3_inv(self.last_pose))
        self.last_pose = pose.copy()
        self.last_feats = out.feats
        self.last_lm_idx = self.cur_lm_idx.copy()
        if created:
            # keyframe creation may have minted fresh landmarks into
            # cur_lm_idx — re-snapshot their generations from the map
            cur_gen = self.map.lm_gen[np.clip(self.cur_lm_idx, 0, None)].copy()
        self.last_lm_gen = cur_gen
        fp.advance(out, self.cur_lm_idx.copy(), cur_gen)
        return TrackResult(pose=pose.copy(), state=OK, n_inliers=n_inl,
                           created_kf=created, timestamp=timestamp)

    @staticmethod
    def _pack_feats_blob(feats: FrameFeatures):
        blob = jnp.concatenate([
            feats.uv.reshape(-1), feats.response,
            feats.octave.astype(jnp.float32), feats.angle,
            feats.valid.astype(jnp.float32), feats.depth, feats.u_right,
        ])
        return blob, feats.desc

    def _prefetch_feats(self, feats: FrameFeatures):
        """Start the keyframe feats download ASYNC, right behind the fused
        step in the device queue — before the mapping worker can slip a
        ~100 ms program in between. Issued only on frames the keyframe
        policy is likely to fire (cadence/min-frames due), so non-KF
        frames pay nothing."""
        blob, desc = self._pack_feats_blob(feats)
        try:
            blob.copy_to_host_async()
            desc.copy_to_host_async()
        except AttributeError:
            pass
        self._feats_prefetch = (feats, blob, desc)

    def _download_feats(self, feats: FrameFeatures) -> FrameFeatures:
        """Keyframe-creation feats download in TWO transfers (one f32
        blob + the u32 descriptors) instead of eight — the (N,)-array
        round-trips dominated the KF-frame tail. Uses the async prefetch
        when one was issued for this frame's features."""
        N = feats.uv.shape[0]
        pf = self._feats_prefetch
        if pf is not None and pf[0] is feats:
            blob, desc = pf[1], pf[2]
        else:
            blob, desc = self._pack_feats_blob(feats)
        self._feats_prefetch = None
        b, desc = jax.device_get((blob, desc))
        b = np.asarray(b)
        uv = b[: 2 * N].reshape(N, 2).astype(np.float32)
        response = b[2 * N: 3 * N].astype(np.float32)
        octave = b[3 * N: 4 * N].astype(np.int32)
        angle = b[4 * N: 5 * N].astype(np.float32)
        valid = b[5 * N: 6 * N] > 0.5
        depth = b[6 * N: 7 * N].astype(np.float32)
        u_right = b[7 * N: 8 * N].astype(np.float32)
        return FrameFeatures(uv=uv, response=response, octave=octave,
                             angle=angle, desc=np.asarray(desc),
                             valid=valid, depth=depth, u_right=u_right)

    # ------------------------------------------------------------------
    def _bump_stats(self, vis_ids, vis_gen, found_ids, found_gen):
        """``MapPoint::IncreaseVisible/IncreaseFound`` counters. While an
        async mapping job is in flight the arrays are being mutated (and
        possibly replaced by capacity growth) on the worker thread — the
        increments are buffered and flushed at the next join."""
        inflight = self.mapping_inflight_fn or self.mapping_busy_fn
        if inflight is not None and inflight():
            self._stat_buffer.append(
                (vis_ids.copy(), vis_gen.copy(), found_ids.copy(), found_gen.copy()))
            return
        self.flush_stat_buffer()
        self.map.lm_visible[vis_ids] += 1
        self.map.lm_found[found_ids] += 1

    def flush_stat_buffer(self):
        """Apply deferred visibility/found increments (called after the
        async mapping job joins). Entries whose slot generation moved in
        the meantime are dropped — the landmark was culled/recycled."""
        if not self._stat_buffer:
            return
        m = self.map
        for vis_ids, vis_gen, found_ids, found_gen in self._stat_buffer:
            ok_v = m.lm_gen[vis_ids] == vis_gen
            ok_f = m.lm_gen[found_ids] == found_gen
            m.lm_visible[vis_ids[ok_v]] += 1
            m.lm_found[found_ids[ok_f]] += 1
        self._stat_buffer.clear()

    # ------------------------------------------------------------------
    def rebind_after_merge(self, new_map: MapState, kf_remap: np.ndarray,
                           lm_map: np.ndarray, S_w2_w1: np.ndarray):
        """Re-express all tracker state in the merged map's frame/ids
        after an Atlas weld (reference ``MergeLocal`` updates the current
        frame and the tracker's last-frame pointers the same way,
        ``LoopClosing.cc:1383-1401``)."""
        self.map = new_map
        S = jnp.asarray(S_w2_w1)
        s = float(S_w2_w1[7])
        S_w1_w2 = lie.sim3_inv(S)

        def transport(T):
            return np.asarray(lie.sim3_to_se3(
                lie.sim3_mul(lie.sim3_from_se3(jnp.asarray(T)), S_w1_w2)
            ), np.float32)

        self.cur_pose = transport(self.cur_pose)
        if self.last_pose is not None:
            self.last_pose = transport(self.last_pose)
        if self.velocity is not None:
            # relative pose: rotation invariant, translation rescales
            # (merged-map units are s× active-map units)
            v = self.velocity.copy()
            v[4:7] *= s
            self.velocity = v

        def remap_lms(idx):
            if idx is None:
                return None
            return np.where(idx >= 0, lm_map[np.clip(idx, 0, None)], -1).astype(np.int32)

        self.last_lm_idx = remap_lms(self.last_lm_idx)
        if self.last_lm_idx is not None:
            self.last_lm_gen = new_map.lm_gen[np.clip(self.last_lm_idx, 0, None)].copy()
        if hasattr(self, "cur_lm_idx"):
            self.cur_lm_idx = remap_lms(self.cur_lm_idx)
        self._stat_buffer.clear()  # pre-merge ids are void
        self._vi_prior_L = None    # prior chain is frame-local state
        if self.ref_kf >= 0:
            self.ref_kf = int(kf_remap[self.ref_kf])
        if self.inertial:
            q = jnp.asarray(S_w2_w1[:4])
            self.cur_vel = s * np.asarray(
                lie.quat_rotate(q, jnp.asarray(self.cur_vel)), np.float32)
            if self._prev_body_center is not None:
                self._prev_body_center = np.asarray(
                    lie.sim3_apply(S, jnp.asarray(self._prev_body_center)), np.float32)
        # metric depth of the cached last frame rescales with the weld
        if self.last_feats is not None and s != 1.0:
            d = np.asarray(self.last_feats.depth)
            self.last_feats = self.last_feats._replace(
                depth=jnp.asarray(np.where(d > 0, d * s, d))
            )
        self.th_depth_m = self.cam.bf * self.cam.th_depth / self.cam.fx

    def trajectory_world(self) -> np.ndarray:
        """Resolve the per-frame relative log into world-frame camera
        poses Twc (F, 7) using current keyframe poses (culled reference
        keyframes resolve through the cull-redirect chain)."""
        if not self.traj_rel:
            return np.zeros((0, 7), np.float32)
        ref_poses = np.stack([self.map.effective_kf_pose(int(rk))
                              for rk in self.traj_ref_kf])
        Tcw = lie.np_se3_mul(np.stack(self.traj_rel), ref_poses)
        return lie.np_se3_inv(Tcw)
