"""System facade — the public API.

Replaces reference ``System`` (``System.h:87-210`` / ``System.cc``): one
object wiring config → frame pipeline → tracker → local mapper → loop
closer → atlas, with per-frame entry points ``track_rgbl`` /
``track_rgbd`` / ``track_stereo`` and trajectory export.

The reference's four threads (Tracking / LocalMapping / LoopClosing /
Viewer, ``System.cc:194-244``) become phases over versioned map state;
the Atlas provides elastic recovery: hard tracking loss archives the
active map and starts a fresh one (``Tracking::CreateMapInAtlas``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import SlamConfig, RGBL, RGBD
from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.ops import depth as depth_ops
from orb_slam3_rgbl_tpu.slam import frame as frame_mod
from orb_slam3_rgbl_tpu.slam import tracking as trk
from orb_slam3_rgbl_tpu.slam.atlas import Atlas
from orb_slam3_rgbl_tpu.slam.local_mapping import LocalMapper
from orb_slam3_rgbl_tpu.slam.loop_closing import LoopCloser
from orb_slam3_rgbl_tpu.slam.map_state import MapState
from orb_slam3_rgbl_tpu.slam.tracking import Tracker, TrackResult
from orb_slam3_rgbl_tpu.io import trajectory as traj_io


class System:
    def __init__(self, config: SlamConfig, enable_mapping: bool = True):
        import dataclasses as _dc

        # image-plane preprocessing (reference System.cc:259-276 /
        # Settings rectification maps): true two-camera stereo rectifies
        # the pair; a distorted mono/RGB-D pinhole undistorts *keypoints*
        # (Frame::UndistortKeyPoints) and works distortion-free downstream
        self.rectifier = None
        self._undistort_cam = None
        if (config.stereo is not None and config.stereo.needs_rectify
                and config.camera_type == "PinHole"
                and config.sensor in (1, 4)):  # STEREO, IMU_STEREO
            from orb_slam3_rgbl_tpu.geometry.rectify import build_rectifier

            self.rectifier = build_rectifier(config)
            config = _dc.replace(config, camera=self.rectifier.cam_rect)
        elif config.camera.has_distortion and config.camera_type == "PinHole":
            self._undistort_cam = config.camera
            config = _dc.replace(
                config,
                camera=_dc.replace(config.camera, k1=0.0, k2=0.0, p1=0.0,
                                   p2=0.0, k3=0.0),
            )
            if config.sensor in (1, 4, RGBL):
                # stereo without a Camera2 rectifier / RGB-L with a
                # distorted intrinsic: keypoints are undistorted per frame,
                # but row-matching (stereo) and the LiDAR projection matrix
                # still assume a rectified pair — warn loudly
                from orb_slam3_rgbl_tpu.utils.logging import log

                log("WARNING: distorted PinHole config with sensor %d — "
                    "keypoints are undistorted per frame, but stereo row "
                    "matching / LiDAR projection assume rectified geometry; "
                    "provide rectified input or a Camera2 section"
                    % config.sensor)
        self.cfg = config
        self.cam = config.camera
        self._enable_mapping = enable_mapping
        # components materialize on the first frame (feature capacity
        # comes from the actual frame pipeline)
        self.atlas: Optional[Atlas] = None
        self.map: Optional[MapState] = None
        self.tracker: Optional[Tracker] = None
        self.mapper: Optional[LocalMapper] = None
        self.loop_closer: Optional[LoopCloser] = None
        self._lost_streak = 0
        self._fast = None          # shared FastPath (compiled once per run)
        self.use_fused = True      # single-dispatch engine loop for RGBL
        self.timer = None          # optional StageTimer (REGISTER_TIMES)
        # async mapping plane (the reference's LocalMapping/LoopClosing
        # threads, System.cc:198-217): per-keyframe map refinement runs on
        # a worker while tracking continues on the frozen snapshot; join
        # points: next keyframe creation, trajectory export, merges.
        # Default OFF (deterministic tests); the bench/drivers enable it.
        self.async_mapping = False
        self._map_exec = None
        self._map_future = None
        # keyframe queue to the mapping plane (reference
        # LocalMapping::InsertKeyFrame queue; the tracker's busy gate is
        # the reference's KeyframesInQueue() < 3 idle check — keyframe
        # creation no longer blocks on the in-flight job)
        from collections import deque

        self._map_queue = deque()
        # loop-closing plane (the reference's third thread,
        # System.cc:216-217): DETECTION runs on its own executor off the
        # mapping worker's critical path; verified events queue into
        # ``_loop_inbox`` and the CORRECTION applies serialized with map
        # mutations (on the mapping worker between jobs, or on the main
        # thread at a quiescent point — the reference's RequestStop)
        self._loop_exec = None
        self._loop_future = None
        self._loop_queue = deque()
        self._loop_inbox = deque()        # (map, LoopEvent) verified
        self._merge_candidate = None      # (map, kf_id) for _try_merge
        self._last_shed_kf = None         # newest index-only keyframe —
        #   re-queued for full detection when the mapping plane idles
        self._freeze_kf = False           # loop correction in progress:
        #   keyframe insertion must wait (a KF created mid-correction
        #   keeps OLD-frame coordinates and warps the corrected map —
        #   the reference blocks NeedNewKeyFrame while LocalMapping is
        #   stopped for CorrectLoop, Tracking.cc:3127)
        # the transient GBA job (reference LoopClosing.cc:1206 spawns a
        # thread; a new correction aborts a running solve via mbStopGBA)
        self._gba_exec = None
        self._gba_future = None
        self._gba_abort = None
        import threading

        self._gba_lock = threading.Lock()
        self._loop_lock = threading.Lock()
        self._kf_lock = threading.Lock()  # keyframe creation vs loop/GBA
        #   writeback exclusion (Map::mMutexMapUpdate for the one pair of
        #   operations that cannot tolerate interleaving)
        # live viewer (reference Viewer thread, System.cc:236-244);
        # created on demand via start_viewer()
        self._viewer = None
        self.P_lidar = jnp.asarray(
            depth_ops.lidar_projection_matrix(
                np.asarray(self.cam.K), np.asarray(config.lidar.T_velo_cam)
            )
        )

    # ------------------------------------------------------------------
    def _extract(self, gray: np.ndarray) -> frame_mod.FrameFeatures:
        img = jnp.asarray(gray, jnp.float32)
        return frame_mod.extract_features(
            img, self.cam.height, self.cam.width,
            n_features=self.cfg.orb.n_features,
            n_levels=self.cfg.orb.n_levels,
            scale_factor=self.cfg.orb.scale_factor,
            ini_th=float(self.cfg.orb.ini_th_fast),
            min_th=float(self.cfg.orb.min_th_fast),
        )

    CLOUD_CAP = 131072  # fixed LiDAR capacity (shape-stable jit; KITTI ~120k)

    def _pad_cloud(self, pointcloud, cloud_mask=None):
        """(Np, 3|4) → fixed (CLOUD_CAP, 4) + validity mask. Truncates
        over-capacity clouds (KITTI peaks ~130k — the tail is far-range
        returns the min/max-dist gate would reject anyway).

        A device array already at capacity passes through untouched (the
        bench pre-stages frames on device; downloading it to re-pad would
        defeat the zero-transfer loop). An explicit ``cloud_mask`` (the
        KITTI loaders' padded-cloud validity) is folded into the returned
        mask so the driver path lands on the same fused program."""
        if (isinstance(pointcloud, jnp.ndarray)
                and pointcloud.shape == (self.CLOUD_CAP, 4)):
            if cloud_mask is not None:
                return pointcloud, jnp.asarray(cloud_mask)
            if not hasattr(self, "_cloud_mask_ones"):
                self._cloud_mask_ones = jnp.ones(self.CLOUD_CAP, bool)
            return pointcloud, self._cloud_mask_ones
        pc = np.asarray(pointcloud, np.float32)
        if pc.shape[1] == 3:
            pc = np.concatenate([pc, np.ones((len(pc), 1), np.float32)], axis=1)
        n = min(len(pc), self.CLOUD_CAP)
        if pc.shape == (self.CLOUD_CAP, 4) and cloud_mask is not None:
            # loader-padded host cloud: ship as-is with its own mask
            return jnp.asarray(pc), jnp.asarray(cloud_mask)
        out = np.zeros((self.CLOUD_CAP, 4), np.float32)
        out[:n] = pc[:n]
        mask = np.zeros(self.CLOUD_CAP, bool)
        if cloud_mask is not None:
            mask[:n] = np.asarray(cloud_mask)[:n]
        else:
            mask[:n] = True
        return jnp.asarray(out), jnp.asarray(mask)

    def _frame_capacity(self) -> int:
        from orb_slam3_rgbl_tpu.ops import fast as fast_ops

        return int(sum(fast_ops.features_per_level(
            self.cfg.orb.n_features, self.cfg.orb.n_levels,
            self.cfg.orb.scale_factor)))

    def _check_timestamp_jump(self, timestamp: float):
        """Input-stream sanity (reference ``Tracking::Track`` head,
        Tracking.cc:1855-1888): a BACKWARD timestamp spawns a fresh map
        (the stream restarted — CreateMapInAtlas); a >1 s FORWARD gap in
        inertial mode invalidates the preintegration chain — reset the
        active map (pre-VIBA2) or spawn a new one (after)."""
        if self.tracker is None or not self.tracker.traj_time:
            return
        last = self.tracker.traj_time[-1]
        if timestamp < last:
            from orb_slam3_rgbl_tpu.utils.logging import log

            log("ERROR: frame timestamp older than previous frame — "
                "starting a new map")
            if self.tracker is not None and hasattr(self.tracker, "_imu_kf_acc"):
                try:
                    self.tracker._imu_kf_acc.reset()
                except AttributeError:
                    pass
            self._create_map_in_atlas()
        elif timestamp > last + 1.0 and self.cfg.inertial:
            from orb_slam3_rgbl_tpu.utils.logging import log

            log("timestamp jump detected (%.2f s) — resetting" % (timestamp - last))
            viba2_done = getattr(self.mapper, "_viba_stage", 0) >= 2 \
                if self.mapper is not None else False
            if self.map.imu_initialized and viba2_done:
                self._create_map_in_atlas()
            else:
                self.reset_active_map()

    def _create_map_in_atlas(self):
        """Archive the active map and start tracking in a fresh one
        (reference ``Tracking::CreateMapInAtlas``)."""
        n_feat = (self.tracker.n_feat if self.tracker is not None
                  and self.tracker.n_feat else self._frame_capacity())
        self._join_mapping()
        if self.map.n_kf >= 2:
            self.atlas.archive_trajectory(self.tracker)
        else:
            self.atlas.entries.pop(self.atlas.active_idx)
        self._spawn_components(n_feat)

    def track_rgbl(self, gray: np.ndarray, pointcloud: np.ndarray, timestamp: float,
                   cloud_mask: Optional[np.ndarray] = None) -> TrackResult:
        """RGB + raw LiDAR cloud (N, 3|4) — ``System::TrackRGBL``
        (reference ``System.cc:477-539``).

        The steady-state frame runs as ONE fused XLA dispatch
        (``compiled.make_track_step``); the classic per-stage path handles
        initialization / recovery / distorted-input configurations.
        ``cloud_mask`` (the loaders' padded-cloud validity) rides into the
        fused step's ``depth_valid`` input — masked and unmasked clouds
        share one compiled program."""
        self._check_timestamp_jump(timestamp)
        if self._viewer is not None:
            self._viewer.latest_img = gray   # FrameDrawer::Update feed
        if (self.use_fused and self._undistort_cam is None
                and self.cfg.sensor == RGBL):
            from orb_slam3_rgbl_tpu.slam.fast_path import FastPath

            n_feat = self._frame_capacity()
            if self.map is None:
                self._spawn_components(n_feat)
            if self._fast is None:
                self._fast = FastPath(self.cfg, n_feat)
                self.tracker.fast = self._fast
            img = jnp.asarray(gray, jnp.float32)
            pts, mask = self._pad_cloud(pointcloud, cloud_mask)
            res = self.tracker.track_image_rgbl(img, pts, mask, timestamp,
                                                timer=self.timer)
            return self._post_track(res)
        feats = self._extract(gray)
        lc = self.cfg.lidar
        feats, _ = frame_mod.attach_lidar_depth(
            feats, jnp.asarray(pointcloud, jnp.float32), self.P_lidar,
            self.cam.height, self.cam.width, self.cam.bf,
            min_dist=lc.min_dist, max_dist=lc.max_dist, method=lc.method,
            dil_kind=lc.dil_kernel_type, dil_ku=lc.dil_kernel_size_u,
            dil_kv=lc.dil_kernel_size_v,
            valid_mask=None if cloud_mask is None else jnp.asarray(cloud_mask),
        )
        return self._track(self._undistort_feats(feats), timestamp)

    def _undistort_feats(self, feats: frame_mod.FrameFeatures) -> frame_mod.FrameFeatures:
        """Undistort keypoint coordinates (``Frame::UndistortKeyPoints``)
        and re-derive the pseudo-stereo coordinate from the undistorted u.
        No-op for undistorted/rectified inputs."""
        if self._undistort_cam is None:
            return feats
        from orb_slam3_rgbl_tpu.geometry import camera as cam_mod

        uvu = cam_mod.undistort_points(self._undistort_cam, feats.uv)
        has_d = feats.depth > 0
        u_right = jnp.where(
            has_d, uvu[..., 0] - self.cam.bf / jnp.where(has_d, feats.depth, 1.0), -1.0
        )
        return feats._replace(uv=uvu, u_right=u_right)

    def track_rgbd(self, gray: np.ndarray, depth_img: np.ndarray, timestamp: float,
                   imu: Optional[np.ndarray] = None) -> TrackResult:
        """RGB + dense depth image — ``System::TrackRGBD``. Depth samples
        at the raw (distorted) pixel; geometry uses undistorted
        coordinates (reference Frame RGBD ctor semantics).

        Steady-state frames run as ONE fused XLA dispatch, exactly like
        ``track_rgbl`` (the depth source is the only difference)."""
        self._check_timestamp_jump(timestamp)
        if self._viewer is not None:
            self._viewer.latest_img = gray
        if (self.use_fused and self._undistort_cam is None and imu is None
                and self.cfg.sensor == RGBD):
            from orb_slam3_rgbl_tpu.slam.fast_path import FastPath

            n_feat = self._frame_capacity()
            if self.map is None:
                self._spawn_components(n_feat)
            if self._fast is None:
                self._fast = FastPath(self.cfg, n_feat, mode="rgbd")
                self.tracker.fast = self._fast
            res = self.tracker.track_image_rgbd(
                jnp.asarray(gray, jnp.float32),
                jnp.asarray(depth_img, jnp.float32), timestamp,
                timer=self.timer)
            return self._post_track(res)
        feats = self._extract(gray)
        feats = frame_mod.attach_depth_map(
            feats, jnp.asarray(depth_img, jnp.float32), self.cam.bf,
            depth_factor=1.0,
        )
        return self._track(self._undistort_feats(feats), timestamp, imu=imu)

    def track_stereo(self, gray_l: np.ndarray, gray_r: np.ndarray, timestamp: float,
                     imu: Optional[np.ndarray] = None) -> TrackResult:
        """Stereo pair — ``System::TrackStereo`` (reference
        ``System.cc:253``); unrectified calibrated pairs are rectified
        with the Settings-style precomputed maps first."""
        self._check_timestamp_jump(timestamp)
        if self.rectifier is not None:
            gray_l, gray_r = self.rectifier.remap(
                np.asarray(gray_l, np.float32), np.asarray(gray_r, np.float32)
            )
        feats_l = self._extract(gray_l)
        feats_r = self._extract(gray_r)
        if (self.cfg.camera_type == "KannalaBrandt8"
                and self.cfg.stereo is not None):
            # stereo-fisheye: epipolar-consistent matching + two-view
            # triangulation instead of rectified row matching (reference
            # Frame stereo-fisheye ctor, Frame.cc:1164+). Downstream
            # matching + optimizer residuals run KB8-native via
            # cfg.geo_camera (pose_opt/local_ba/inertial* dispatch on the
            # camera model, ≡ GeometricCamera edges).
            from orb_slam3_rgbl_tpu.geometry import lie as _lie
            from orb_slam3_rgbl_tpu.geometry.camera import KannalaBrandt8Camera

            c, st = self.cfg.camera, self.cfg.stereo
            cam_l = KannalaBrandt8Camera(
                fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
                k0=c.k1, k1=c.k2, k2=c.k3, k3=c.p2,
                width=c.width, height=c.height, bf=c.bf)
            cam_r = KannalaBrandt8Camera(
                fx=st.fx, fy=st.fy, cx=st.cx, cy=st.cy,
                k0=st.k1, k1=st.k2, k2=st.k3, k3=st.p2,
                width=c.width, height=c.height, bf=c.bf)
            T = np.asarray(st.T_c1_c2, np.float32).reshape(4, 4)
            q = _lie.matrix_to_quat(jnp.asarray(T[:3, :3]))
            T_lr = jnp.concatenate([q, jnp.asarray(T[:3, 3])])
            feats = frame_mod.attach_stereo_fisheye_depth(
                feats_l, feats_r, cam_l, cam_r, T_lr, self.cam.bf,
                n_levels=self.cfg.orb.n_levels,
                scale_factor=self.cfg.orb.scale_factor)
            return self._track(feats, timestamp, imu=imu)
        feats = frame_mod.attach_stereo_depth(
            feats_l, feats_r, self.cam.bf,
            min_disp=0.0, max_disp=self.cam.bf / 0.5,  # z ≥ 0.5 m
            n_levels=self.cfg.orb.n_levels, scale_factor=self.cfg.orb.scale_factor,
        )
        feats = frame_mod.refine_stereo_subpixel(
            feats, jnp.asarray(gray_l, jnp.float32),
            jnp.asarray(gray_r, jnp.float32), self.cam.bf)
        return self._track(self._undistort_feats(feats), timestamp, imu=imu)

    def track_monocular(self, gray: np.ndarray, timestamp: float,
                        imu: Optional[np.ndarray] = None) -> TrackResult:
        """Single camera, no depth — ``System::TrackMonocular``
        (reference ``System.h:129-135``). The map initializes from two-view
        reconstruction and is defined up to scale (metric once the IMU
        initializes in the inertial mode).

        ``imu``: (S, 7) samples ``[t, ax, ay, az, gx, gy, gz]`` since the
        previous frame (≡ the ``vImuMeas`` argument of the reference
        entry points).

        Steady-state frames run as ONE fused XLA dispatch, like the
        depth modes (two-view initialization and recovery stay on the
        classic ladder)."""
        self._check_timestamp_jump(timestamp)
        if self._viewer is not None:
            self._viewer.latest_img = gray
        from orb_slam3_rgbl_tpu.config import MONOCULAR

        if (self.use_fused and self._undistort_cam is None and imu is None
                and self.cfg.sensor == MONOCULAR):
            from orb_slam3_rgbl_tpu.slam.fast_path import FastPath

            n_feat = self._frame_capacity()
            if self.map is None:
                self._spawn_components(n_feat)
            if self._fast is None:
                self._fast = FastPath(self.cfg, n_feat, mode="mono")
                self.tracker.fast = self._fast
            img = jnp.asarray(gray, jnp.float32)
            res = self.tracker.track_image_rgbl(img, img, None, timestamp,
                                                timer=self.timer)
            return self._post_track(res)
        feats = self._extract(gray)
        return self._track(self._undistort_feats(feats), timestamp, imu=imu)

    def track_features(self, feats: frame_mod.FrameFeatures, timestamp: float,
                       imu: Optional[np.ndarray] = None) -> TrackResult:
        """Feature-level entry point (testing / replaying extracted
        features without images)."""
        return self._track(feats, timestamp, imu=imu)

    # ------------------------------------------------------------------
    def _cancel_gba(self):
        """Abort + discard any in-flight GBA (its snapshot belongs to a
        map that is being replaced/rebound)."""
        with self._gba_lock:
            self._abort_gba_locked()

    def _spawn_components(self, n_feat: int):
        self._cancel_gba()
        self._map_queue.clear()   # queued keyframes belong to the old map
        with self._loop_lock:
            self._loop_queue.clear()
        self._loop_inbox.clear()
        self._merge_candidate = None
        self._last_shed_kf = None
        if self.atlas is None:
            self.atlas = Atlas(self.cfg, n_feat)
        next_frame = self.tracker.frame_id + 1 if self.tracker is not None else 0
        self.map = self.atlas.create_new_map()
        self.tracker = Tracker(self.cfg, self.map, start_frame_id=next_frame)
        self.mapper = LocalMapper(self.cfg, self.map) if self._enable_mapping else None
        if self.mapper is not None:
            self.mapper.timer = self.timer
            # queue depth behind the running job = the reference's
            # mbAbortBA pressure (InsertKeyFrame aborts the LBA)
            self.mapper.backlog_fn = lambda: len(self._map_queue)
        self.tracker.pre_kf_hook = self._poll_mapping
        self.tracker.join_mapping_fn = self._join_mapping
        self.tracker.kf_guard = self._kf_lock
        if self.mapper is not None:
            self.tracker.kf_feats_hook = self.mapper.dev_cache.add
        # busy = the mapping plane is ≥ 3 keyframes behind (the reference
        # NeedNewKeyFrame inserts while KeyframesInQueue() < 3 and relies
        # on InterruptBA to catch up — our backlog-abort LBA plays that
        # role, so the gate only guards unbounded queue growth)
        self.tracker.mapping_busy_fn = (
            lambda: self._freeze_kf
            or len(self._map_queue)
            + (1 if self._map_future is not None
               and not self._map_future.done() else 0) >= 3)
        # in-flight = ANY worker job may be mutating the map arrays right
        # now (gates the tracker's direct lm_visible/lm_found writes —
        # a single running job already races them; the ≥2 busy gate above
        # is only the keyframe-insertion policy)
        self.tracker.mapping_inflight_fn = (
            lambda: bool(self._map_queue)
            or (self._map_future is not None
                and not self._map_future.done()))
        if self._fast is not None:
            self.tracker.fast = self._fast
        if self.cfg.loop_closing:
            self.loop_closer = LoopCloser(self.cfg, self.map)
            self.loop_closer.gba_dispatch = self._dispatch_gba
            self.tracker.kf_db = self.loop_closer.db
            # the entry keeps its database alive for later merge detection
            self.atlas.entries[self.atlas.active_idx].db = self.loop_closer.db
        self._lost_streak = 0

    def _track(self, feats, timestamp, imu: Optional[np.ndarray] = None) -> TrackResult:
        if self.map is None:
            self._spawn_components(int(feats.uv.shape[0]))
        res = self.tracker.track(feats, timestamp, imu=imu)
        return self._post_track(res)

    def _join_mapping(self):
        """Drain the mapping queue + in-flight job (≡ the reference's
        SetNotStop / queue-drain gates before structural operations).
        Atlas merges surfaced by the worker run HERE, on the calling
        thread — merging rebinds the tracker and must not race it."""
        while True:
            while self._map_future is not None or self._map_queue:
                if self._map_future is None:
                    self._submit_mapping_worker()
                pending = self._map_future.result()
                self._map_future = None
                if self._fast is not None:
                    self._fast.hold = False
                if self.tracker is not None:
                    # deferred lm_visible/lm_found bumps land now, against
                    # the settled arrays and BEFORE any merge remaps ids
                    self.tracker.flush_stat_buffer()
                if pending is not None:
                    self._try_merge(pending)
            # drain the loop-closing plane; its detections may enqueue
            # corrections (applied here — the mapping plane is idle)
            with self._loop_lock:
                self._kick_loop_worker_locked()
                lf = self._loop_future
            if lf is not None:
                lf.result()
            self._apply_loop_events()
            mc = self._merge_candidate
            if mc is not None:
                self._merge_candidate = None
                if mc[0] is self.map:
                    self._try_merge(mc[1])
            if (self._map_future is None and not self._map_queue
                    and self._loop_future is None and not self._loop_queue
                    and not self._loop_inbox):
                break
        if self.loop_closer is not None:
            self._poll_gba()

    def _poll_mapping(self):
        """Non-blocking structural checkpoint (pre-keyframe hook): land a
        FINISHED job's merge/stats without waiting on a running one —
        keyframe creation overlaps the mapping plane (the allocator lock
        in MapState serializes the slot bookkeeping)."""
        if self._map_future is not None and self._map_future.done():
            pending = self._map_future.result()
            self._map_future = None
            if self._fast is not None:
                self._fast.hold = False
            if self.tracker is not None:
                self.tracker.flush_stat_buffer()
            if pending is not None:
                self._try_merge(pending)
            # between jobs no worker is running — land a finished GBA
            # solve NOW (waiting for a fully-idle plane starved the
            # apply under sustained cadence; a solve landing hundreds of
            # frames stale at export time warped the trajectory)
            if self.loop_closer is not None:
                self._poll_gba()
            if self._map_queue or self._loop_inbox:
                self._submit_mapping_worker()
        # with the mapping plane idle this thread owns map mutations:
        # land cross-map merges and the GBA writeback (the reference
        # stops LocalMapping before each — MergeLocal / the staged GBA
        # swap). Queued loop CORRECTIONS go back to the worker instead of
        # running here: a correction costs ~0.5 s and would block the
        # tracking frame that triggered this poll.
        if self._map_future is None and not self._map_queue:
            if self._loop_inbox:
                self._submit_mapping_worker()
                return
            # retry the newest shed detection now that the mapping plane
            # is idle (the shed gate otherwise starves detection under a
            # sustained keyframe cadence)
            if (self._last_shed_kf is not None and not self._loop_queue
                    and self._loop_future is None):
                kf = self._last_shed_kf
                self._last_shed_kf = None
                self._enqueue_loop_detect(kf)
            mc = self._merge_candidate
            if mc is not None:
                self._merge_candidate = None
                if mc[0] is self.map:
                    self._try_merge(mc[1])
            if self.loop_closer is not None:
                self._poll_gba()

    def _mapping_job(self, kf_id: int, defer_merge: bool):
        import contextlib

        if self.mapper is not None and self.map.n_kf > 1:
            self.mapper.process_keyframe(kf_id)
        if self.loop_closer is None:
            return None
        if not defer_merge:
            # synchronous plane (tests / inertial): detect + correct inline
            with (self.timer.stage("pr") if self.timer is not None
                  else contextlib.nullcontext()):
                ev = self.loop_closer.on_keyframe(kf_id)
            if ev is None:
                self._try_merge(kf_id)
            return None
        # async engine: detection on the loop-closing plane — the mapping
        # worker moves straight to the next keyframe
        self._enqueue_loop_detect(kf_id)
        return None

    # -- loop-closing plane (reference LoopClosing thread) --------------
    def _enqueue_loop_detect(self, kf_id: int):
        with self._loop_lock:
            self._loop_queue.append(kf_id)
            self._kick_loop_worker_locked()

    def _kick_loop_worker_locked(self):
        """(Re)start the detection worker if items are queued and no live
        worker will see them. Caller holds ``_loop_lock``."""
        from concurrent.futures import ThreadPoolExecutor

        if not self._loop_queue:
            return
        if self._loop_exec is None:
            self._loop_exec = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="loop")
        if self._loop_future is None or self._loop_future.done():
            self._loop_future = self._loop_exec.submit(self._loop_worker)

    def _loop_worker(self):
        """Drain the detection queue (LoopClosing::Run poll loop)."""
        import contextlib

        while True:
            with self._loop_lock:
                if not self._loop_queue:
                    # mark no-live-worker ATOMICALLY with the empty check:
                    # an enqueue racing a worker shutdown would otherwise
                    # see a not-yet-done future, skip the resubmit, and
                    # strand its item (observed as a _join_mapping spin)
                    self._loop_future = None
                    return
                kf_id = self._loop_queue.popleft()
            # load shedding: a full detection costs ~1.5-2 s of shared
            # device-queue time on the tunnel — run it only when the
            # MAPPING plane is caught up (its solves would otherwise
            # stall behind the detection's round trips and vice versa);
            # under pressure the keyframe is INDEXED ONLY (the database
            # must stay complete; skipped verifications are re-covered
            # by later keyframes of the same revisit stretch)
            index_only = (
                len(self._loop_queue) > 0
                or bool(self._map_queue)
                or (self._map_future is not None
                    and not self._map_future.done()))
            lc = self.loop_closer
            if lc is None:
                continue
            try:
                with (self.timer.stage("pr") if self.timer is not None
                      else contextlib.nullcontext()):
                    ev = lc.detect_only(kf_id, index_only=index_only)
                if index_only:
                    # remember the newest shed keyframe — the idle poll
                    # re-enqueues it for a full detection once the
                    # mapping plane catches up
                    self._last_shed_kf = kf_id
                elif self._last_shed_kf is not None \
                        and kf_id >= self._last_shed_kf:
                    self._last_shed_kf = None
            except Exception:
                import traceback
                from orb_slam3_rgbl_tpu.utils.logging import log

                log("loop detection failed:\n" + traceback.format_exc())
                continue
            if lc is not self.loop_closer:
                continue               # components respawned mid-detect
            if ev is not None:
                # reserve the post-loop suppression window NOW — queued
                # detections behind this one would otherwise re-verify
                # the same revisit before the correction applies
                # (apply_event re-stamps the same value later)
                lc.last_loop_kf = kf_id
                self._loop_inbox.append((self.map, ev))
            else:
                self._merge_candidate = (self.map, kf_id)

    def _apply_loop_events(self):
        """Run queued corrections. Caller must own map mutations (the
        mapping worker between jobs, or the main thread with the worker
        idle) — the reference's LocalMapping::RequestStop exclusion."""
        import contextlib

        while self._loop_inbox:
            ev_map, ev = self._loop_inbox.popleft()
            if ev_map is not self.map or self.loop_closer is None:
                continue               # stale: map replaced since detection
            if not (self.map.kf_valid[ev.kf_cur]
                    and self.map.kf_valid[ev.kf_matched]):
                continue               # a side was culled since detection
            # freeze keyframe insertion for the duration: a keyframe
            # created mid-correction would keep old-frame coordinates
            # and anchor the rest of the run to a warped seam
            self._freeze_kf = True
            try:
                # the freeze stops NEW insertions; the lock waits out an
                # insertion already in flight on the tracking thread
                with self._kf_lock:
                    with (self.timer.stage("opt_essential")
                          if self.timer is not None
                          else contextlib.nullcontext()):
                        self.loop_closer.apply_event(ev)
            finally:
                self._freeze_kf = False

    # -- transient GBA job (reference LoopClosing.cc:1206/2268) ---------
    def _dispatch_gba(self):
        """Schedule the post-loop global BA as its own abortable job; a
        new correction supersedes (aborts) a running solve — the
        reference's ``mbStopGBA`` + thread respawn (LoopClosing.cc:975)."""
        if not self.async_mapping:
            self.loop_closer._global_ba()
            return
        import threading
        from concurrent.futures import ThreadPoolExecutor

        # assemble the snapshot HERE — on the thread that currently owns
        # map mutations (the mapping worker inside _correct_loop); only
        # the pure solve runs on the GBA thread (ADVICE r4: assembling on
        # the GBA thread read live arrays mid-mutation)
        snapshot = self.loop_closer._gba_assemble()
        with self._gba_lock:
            self._abort_gba_locked()
            if self._gba_exec is None:
                self._gba_exec = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="gba")
            self._gba_abort = threading.Event()
            # 16 LM iterations: the offline convergence probe
            # (tools/gba_probe.py on the r5 bench map) shows the loop-bent
            # map needs ~16-20 iterations to unbend (6 left 1.5 m KF ATE,
            # 16+ reaches <1 m); chunks stay abortable every 2 iterations
            self._gba_future = self._gba_exec.submit(
                self.loop_closer._gba_iterate, snapshot, 16, self._gba_abort)

    def _abort_gba_locked(self):
        if self._gba_future is not None:
            self._gba_abort.set()
            self._gba_future.result()  # chunks bail between LM iterations
            self._gba_future = None

    def _poll_gba(self, wait: bool = False):
        """Apply a finished GBA solve at a structural point (mapping plane
        idle — the staged-writeback swap of LoopClosing.cc:2329-2440)."""
        with self._gba_lock:
            fut = self._gba_future
            if fut is None or not (wait or fut.done()):
                return
            out = fut.result()
            self._gba_future = None
        if out is not None:
            self.loop_closer._apply_gba(out)

    def _dispatch_mapping(self, kf_id: int):
        # inertial modes stay synchronous: IMU init / VIBA interleave with
        # tracking state and are not snapshot-tolerant
        if not self.async_mapping or self.cfg.inertial:
            self._mapping_job(kf_id, defer_merge=False)
            return
        self._map_queue.append(kf_id)
        if self._map_future is None or self._map_future.done():
            self._poll_mapping()          # land a finished job first (it
            # resubmits when the queue is non-empty) — submitting again
            # here would orphan that job's future and drop its merge result
            if self._map_queue and self._map_future is None:
                self._submit_mapping_worker()

    def _submit_mapping_worker(self):
        if self._map_exec is None:
            from concurrent.futures import ThreadPoolExecutor

            self._map_exec = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="mapping")
        self._map_future = self._map_exec.submit(self._mapping_worker)

    def _mapping_worker(self):
        """Drain the keyframe queue sequentially (the reference's
        LocalMapping::Run loop body). Returns the last merge candidate
        (applied on the main thread at a structural point)."""
        pending = None
        while True:
            # corrections from the loop plane apply between jobs — this
            # thread owns map mutations while it runs (hold the fast
            # path's window refresh across the wholesale pose rewrite)
            if self._loop_inbox:
                if self._fast is not None:
                    self._fast.hold = True
                try:
                    self._apply_loop_events()
                finally:
                    if self._fast is not None:
                        self._fast.hold = False
            try:
                kf_id = self._map_queue.popleft()
            except IndexError:
                return pending
            # hold the tracker's device-window refresh while THIS item
            # mutates the arrays; release between items so a sustained
            # backlog cannot starve the fast path of map updates
            if self._fast is not None:
                self._fast.hold = True
            try:
                out = self._mapping_job(kf_id, defer_merge=True)
            finally:
                if self._fast is not None:
                    self._fast.hold = False
            if out is not None:
                pending = out

    def _post_track(self, res: TrackResult) -> TrackResult:
        """Mapping / loop-closing / recovery phases after the tracking
        stage (the reference's THREAD 2/3 handoffs, System.cc:198-217)."""
        if ((self._map_future is not None and self._map_future.done())
                or (self._loop_inbox and self._map_future is None)):
            self._poll_mapping()
        for kf_id in self.tracker.new_kf_ids:
            if kf_id == self.tracker.new_kf_ids[-1]:
                self._dispatch_mapping(kf_id)
        if (self.cfg.inertial and self.mapper is not None
                and self.tracker.new_kf_ids and self.map.imu_initialized):
            # VIBA1/VIBA2 refinement schedule (LocalMapping.cc:218-256)
            self.mapper.maybe_viba(res.timestamp)
        if (self.cfg.inertial and self.mapper is not None
                and self.tracker.new_kf_ids and not self.map.imu_initialized):
            S_align = self.mapper.maybe_initialize_imu()
            if S_align is not None:
                # re-express tracker state in the gravity-aligned metric
                # frame (ids unchanged — identity remaps)
                kf_id_map = np.arange(self.map.capacity_kf, dtype=np.int32)
                lm_id_map = np.concatenate([
                    np.arange(self.map.capacity_lm, dtype=np.int32), [-1]
                ]).astype(np.int32)
                self.tracker.rebind_after_merge(self.map, kf_id_map, lm_id_map, S_align)
                self.tracker.cur_vel = self.map.kf_vel[self.tracker.ref_kf].copy()
                self.tracker.cur_bias = (
                    self.map.kf_bg[self.tracker.ref_kf].copy(),
                    self.map.kf_ba[self.tracker.ref_kf].copy(),
                )

        # bad-IMU map reset (reference Tracking.cc:1839-1844 reacting to
        # LocalMapping's mbBadImu): the VI init was motion-starved —
        # discard the active map and restart
        if (self.mapper is not None and getattr(self.mapper, "bad_imu", False)):
            from orb_slam3_rgbl_tpu.utils.logging import log

            log("TRACK: resetting active map (bad IMU flag)")
            self.reset_active_map()
            return res
        # elastic recovery (reference Tracking.cc:2032-2058): persistent
        # LOST with an established map → archive it and start a new one
        if res.state == trk.LOST:
            self._lost_streak += 1
        elif res.state == trk.OK:
            self._lost_streak = 0
        if self._lost_streak > int(self.cfg.fps):
            n_feat = self.tracker.n_feat or self._frame_capacity()
            if self.map.n_kf >= 2:
                # archive the map + its trajectory segment (stays
                # mergeable — CreateMapInAtlas). Deliberate deviation from
                # the reference's n_kf<10 → ResetActiveMap discard
                # (Tracking.cc:2032-2058): even small fragments are kept
                # for later welding; never-grown ones are garbage-collected
                # by Atlas.remove_bad_maps instead of thrown away mid-run.
                self.atlas.archive_trajectory(self.tracker)
            else:
                # nothing usable was mapped — discard (ResetActiveMap)
                self.atlas.entries.pop(self.atlas.active_idx)
            self._spawn_components(n_feat)
        return res

    # -- live viewer (reference Viewer/FrameDrawer threads) -------------
    def start_viewer(self, out_dir: str = "viewer_out", hz: float = 2.0,
                     http_port=None, map_3d: bool = False):
        """Launch the live-viewer thread (``Viewer::Run`` analog): frame
        overlay + map view rendered continuously to ``out_dir`` and
        optionally served over HTTP (headless Pangolin replacement).
        Returns the :class:`~orb_slam3_rgbl_tpu.viz.live.LiveViewer`."""
        from orb_slam3_rgbl_tpu.viz.live import LiveViewer

        if self._viewer is None:
            self._viewer = LiveViewer(self, out_dir=out_dir, hz=hz,
                                      http_port=http_port, map_3d=map_3d)
            self._viewer.start()
        return self._viewer

    def stop_viewer(self):
        if self._viewer is not None:
            self._viewer.stop()
            self._viewer = None

    # ------------------------------------------------------------------
    def shutdown(self):
        """Drain the mapping plane (``System::Shutdown``)."""
        self.stop_viewer()
        self._join_mapping()
        self._poll_gba(wait=True)
        if self._map_exec is not None:
            self._map_exec.shutdown(wait=True)
            self._map_exec = None
        if self._loop_exec is not None:
            self._loop_exec.shutdown(wait=True)
            self._loop_exec = None
        if self._gba_exec is not None:
            self._gba_exec.shutdown(wait=True)
            self._gba_exec = None

    def _try_merge(self, kf_id: int) -> bool:
        """Cross-map place recognition + Atlas weld (reference
        ``NewDetectCommonRegions`` merge branch → ``MergeLocal``,
        LoopClosing.cc:324-533 / 1215-1782)."""
        from orb_slam3_rgbl_tpu.slam import merging
        import jax

        if (self.loop_closer is None or self.atlas.n_maps() < 2
                or self.map.n_kf < 1):
            return False
        qv = self.loop_closer.db.vectors[kf_id]
        fix_scale = self.cfg.sensor != 0
        for ei, entry in enumerate(self.atlas.entries):
            if entry.map is self.map or entry.db is None or entry.map.n_kf < 2:
                continue
            scores, shared = entry.db.query(qv, np.zeros(0, np.int64))
            if shared.max() == 0:
                continue
            gate = shared >= max(int(0.8 * shared.max()), 1)
            cands = np.argsort(-np.where(gate, scores, 0.0))[:3]
            for cand in cands:
                if not gate[cand] or scores[cand] <= 0:
                    continue
                self.loop_closer._key, sub = jax.random.split(self.loop_closer._key)
                out = merging.verify_cross_map(
                    self.cfg, self.map, kf_id, entry.map, int(cand), sub, fix_scale
                )
                if out is None:
                    continue
                S12, n_inl, fusion = out
                self._do_merge(ei, kf_id, int(cand), S12, fusion)
                return True
        return False

    def _do_merge(self, ei: int, kf_cur: int, kf_cand: int,
                  S12: np.ndarray, fusion):
        from orb_slam3_rgbl_tpu.slam import merging
        from orb_slam3_rgbl_tpu.utils.logging import log

        self._cancel_gba()  # solve snapshot predates the weld — discard
        entry_old = self.atlas.entries[ei]
        old = entry_old.map
        active_map_id = self.map.map_id
        S_w2_w1 = merging.world_alignment(
            S12, self.map.kf_pose[kf_cur], old.kf_pose[kf_cand]
        )
        res = merging.merge_maps(old, self.map, kf_cur, S_w2_w1)
        # fuse verified duplicates (active-side ids → merged ids first)
        cur_lms = res.lm_remap[fusion[0]]
        fuse_remap = merging.apply_fusion(res.map, cur_lms, fusion[1])
        lm_map = np.where(
            res.lm_remap >= 0, fuse_remap[np.clip(res.lm_remap, 0, None)], -1
        ).astype(np.int32)

        # --- weld the trajectory segments --------------------------------
        self.atlas.archive_trajectory(self.tracker)
        active_entry = self.atlas.entries[self.atlas.active_idx]
        s = float(S_w2_w1[7])
        for Tcr, rk, t, lost in zip(active_entry.traj_rel, active_entry.traj_ref_kf,
                                    active_entry.traj_time, active_entry.traj_lost):
            Tcr2 = np.asarray(Tcr, np.float32).copy()
            Tcr2[4:7] *= s  # relative translation in merged-map metric
            entry_old.traj_rel.append(Tcr2)
            entry_old.traj_ref_kf.append(int(res.kf_remap[rk]))
            entry_old.traj_time.append(t)
            entry_old.traj_lost.append(lost)

        # --- extend the archived map's database with the new keyframes ---
        db = entry_old.db
        if db.vectors.shape[0] < res.map.capacity_kf:
            grow = res.map.capacity_kf - db.vectors.shape[0]
            db.vectors = np.concatenate(
                [db.vectors, np.zeros((grow, db.vectors.shape[1]), db.vectors.dtype)]
            )
            db.present = np.concatenate([db.present, np.zeros(grow, bool)])
        for k in res.appended_kfs:
            db.add(int(k), res.map.kf_desc[k], res.map.kf_feat_valid[k])

        # --- rebind components to the merged map --------------------------
        self.map = res.map
        self.tracker.rebind_after_merge(res.map, res.kf_remap, lm_map, S_w2_w1)
        self.tracker.traj_rel = list(entry_old.traj_rel)
        self.tracker.traj_ref_kf = list(entry_old.traj_ref_kf)
        self.tracker.traj_time = list(entry_old.traj_time)
        self.tracker.traj_lost = list(entry_old.traj_lost)
        self.tracker.kf_db = db
        if self.mapper is not None:
            self.mapper.map = res.map
            self.mapper.dev_cache.reset()  # merged ids invalidate the mirror
            self.mapper.recent_lm = [
                (lm_map[np.clip(ids, 0, None)][lm_map[np.clip(ids, 0, None)] >= 0],
                 int(res.kf_remap[k]) if k < len(res.kf_remap) and res.kf_remap[k] >= 0 else res.map.n_kf - 1)
                for ids, k in self.mapper.recent_lm
            ]
        self.loop_closer.map = res.map
        self.loop_closer.db = db
        # suppress immediate re-detection around the weld
        self.loop_closer.last_loop_kf = res.kf_cur_new
        # the weld constraint joins every future essential graph
        # (reference KeyFrame::AddMergeEdge, LoopClosing.cc MergeLocal)
        self.loop_closer.extra_edges.append(
            (int(res.kf_cur_new), int(kf_cand), np.asarray(S12, np.float32), 10.0))
        self.loop_closer._consistent_groups = []

        # --- atlas bookkeeping --------------------------------------------
        self.atlas.entries.remove(active_entry)
        self.atlas.active_idx = self.atlas.entries.index(entry_old)
        # queued mapping keyframes carry OLD active-map ids — remap
        from collections import deque as _dq

        self._map_queue = _dq(
            int(res.kf_remap[k]) for k in list(self._map_queue)
            if 0 <= k < len(res.kf_remap) and res.kf_remap[k] >= 0)
        # queued loop detections / events carry old ids too — drop them
        # (the weld itself suppresses re-detection around the seam)
        with self._loop_lock:
            self._loop_queue.clear()
        self._loop_inbox.clear()
        self._merge_candidate = None
        self._last_shed_kf = None

        # --- weld-window bundle adjustment (LoopClosing.cc:1623-1627;
        # inertial maps use MergeInertialBA, Optimizer.cc:4875 — here the
        # same 15-DoF sliding-window solve as LocalInertialBA) ----------
        if self.mapper is not None:
            res.map.update_landmark_stats(np.array([res.kf_cur_new]))
            if self.cfg.inertial and res.map.imu_initialized:
                self.mapper.full_inertial_ba(res.kf_cur_new)
            else:
                self.mapper.local_bundle_adjustment(res.kf_cur_new)
        log("MERGE: welded map %d into map %d (%d KFs transported, scale %.4f)"
            % (active_map_id, old.map_id, len(res.appended_kfs), s))

    # ------------------------------------------------------------------
    def _resolve_segment(self, entry) -> np.ndarray:
        """Resolve a trajectory segment against current keyframe poses;
        frames logged against later-culled keyframes ride the cull
        redirect chain so they receive loop/GBA corrections
        (``SaveTrajectoryKITTI`` parent walk, System.cc:1348-1405)."""
        if not entry.traj_rel:
            return np.zeros((0, 7), np.float32)
        m = entry.map
        rks = np.asarray(entry.traj_ref_kf, np.int64)
        ref_poses = np.stack([m.effective_kf_pose(int(rk)) for rk in rks])
        Tcw = lie.np_se3_mul(np.stack(entry.traj_rel), ref_poses)
        return lie.np_se3_inv(Tcw)

    def trajectory(self) -> np.ndarray:
        """World-frame camera poses Twc (F, 7) across all atlas maps
        (each segment resolves against its own, possibly BA/loop-corrected
        keyframe poses — ``SaveTrajectoryKITTI`` semantics)."""
        self._join_mapping()
        self._poll_gba(wait=True)
        if self.atlas is None:
            return np.zeros((0, 7), np.float32)
        self.atlas.archive_trajectory(self.tracker)
        segs = [self._resolve_segment(e) for e in self.atlas.entries]
        segs = [s for s in segs if len(s)]
        return np.concatenate(segs) if segs else np.zeros((0, 7), np.float32)

    def timestamps(self):
        if self.atlas is None:
            return []
        self.atlas.archive_trajectory(self.tracker)
        out = []
        for e in self.atlas.entries:
            out.extend(e.traj_time)
        return out

    def save_trajectory_kitti(self, path: str):
        traj_io.save_kitti(path, self.trajectory())

    def save_trajectory_tum(self, path: str):
        traj_io.save_tum(path, self.timestamps(), self.trajectory())

    def save_trajectory_euroc(self, path: str):
        """``System::SaveTrajectoryEuRoC`` (reference System.cc:804)."""
        traj_io.save_euroc(path, self.timestamps(), self.trajectory())

    # -- keyframe-only trajectories (SaveKeyFrameTrajectory*, System.h:170-186)
    def _keyframe_poses(self):
        """(T, Twc(K,7)) for the atlas map with the most keyframes
        (reference ``pBiggerMap`` selection, System.cc:816-828) — after a
        tracking loss spawns a fresh active map, the established map is
        still the one exported."""
        big = self.map
        if self.atlas is not None:
            for e in self.atlas.entries:
                if e.map is not None and e.map.n_kf > big.n_kf:
                    big = e.map
        valid = big.valid_kf_ids()
        Twc = np.asarray(lie.se3_inv(jnp.asarray(big.kf_pose[valid])))
        return big.kf_timestamp[valid], Twc

    def save_keyframe_trajectory_kitti(self, path: str):
        _, Twc = self._keyframe_poses()
        traj_io.save_kitti(path, Twc)

    def save_keyframe_trajectory_tum(self, path: str):
        t, Twc = self._keyframe_poses()
        traj_io.save_tum(path, t, Twc)

    def save_keyframe_trajectory_euroc(self, path: str):
        t, Twc = self._keyframe_poses()
        traj_io.save_euroc(path, t, Twc)

    # -- lifecycle (System.h:139-155) -----------------------------------
    def activate_localization_mode(self):
        """Tracking-only / map-frozen mode (``ActivateLocalizationMode``):
        no new keyframes, no mapping or loop closing — the tracker localizes
        against the existing map."""
        if self.tracker is not None:
            self.tracker.only_tracking = True

    def deactivate_localization_mode(self):
        if self.tracker is not None:
            self.tracker.only_tracking = False

    def reset(self):
        """Full reset (``System::Reset``): drop the entire Atlas; fresh
        components materialize on the next frame."""
        self._join_mapping()
        self._cancel_gba()
        with self._loop_lock:
            self._loop_queue.clear()
        self._loop_inbox.clear()
        self._merge_candidate = None
        self._last_shed_kf = None
        self.atlas = None
        self.map = None
        self.tracker = None
        self.mapper = None
        self.loop_closer = None
        self._lost_streak = 0

    def reset_active_map(self):
        """``System::ResetActiveMap``: discard the active map's data (it is
        presumed corrupt — reference System.cc discards rather than archives)
        and restart tracking in a fresh map; other atlas maps are untouched
        and stay mergeable."""
        if self.tracker is None:
            return
        self._join_mapping()
        n_feat = self.map.kf_desc.shape[1]
        self.atlas.entries.pop(self.atlas.active_idx)
        self._spawn_components(n_feat)

    # -- persistence (SaveAtlas/LoadAtlas, System.cc:1545-1650) ---------
    def save_map(self, path: str):
        from orb_slam3_rgbl_tpu.utils import serialization

        serialization.save_map(path, self.map)

    def save_atlas(self, path: str):
        from orb_slam3_rgbl_tpu.utils import serialization

        serialization.save_atlas(path, self.atlas, tracker=self.tracker)

    def load_atlas(self, path: str, strict_vocab: bool = True):
        """Rebuild all components around a saved Atlas; tracking resumes in
        relocalization against the restored active map."""
        from orb_slam3_rgbl_tpu.utils import serialization
        from orb_slam3_rgbl_tpu.slam.loop_closing import LoopCloser

        self.atlas = serialization.load_atlas(path, self.cfg, strict_vocab=strict_vocab)
        entry = self.atlas.entries[self.atlas.active_idx]
        self.map = entry.map
        next_frame = 0
        for e in self.atlas.entries:
            if len(e.traj_time):
                next_frame += len(e.traj_time)
        self.tracker = Tracker(self.cfg, self.map, start_frame_id=next_frame)
        self.tracker.state = trk.LOST  # relocalize on the next frame
        self.tracker.traj_rel = list(entry.traj_rel)
        self.tracker.traj_ref_kf = list(entry.traj_ref_kf)
        self.tracker.traj_time = list(entry.traj_time)
        self.tracker.traj_lost = list(entry.traj_lost)
        entry.traj_rel, entry.traj_ref_kf = [], []
        entry.traj_time, entry.traj_lost = [], []
        self.mapper = LocalMapper(self.cfg, self.map) if self._enable_mapping else None
        self.loop_closer = None  # never let a pre-load instance survive
        if self.cfg.loop_closing and entry.db is not None:
            self.loop_closer = LoopCloser(self.cfg, self.map)
            self.loop_closer.db = entry.db
            self.tracker.kf_db = entry.db
        self._lost_streak = 0


