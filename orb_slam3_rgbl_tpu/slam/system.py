"""System facade — the public API.

Replaces reference ``System`` (``System.h:87-210`` / ``System.cc``): one
object wiring config → frame pipeline → tracker → local mapper → (loop
closer), with per-frame entry points ``track_rgbl`` / ``track_rgbd`` /
``track_stereo_depth`` and trajectory export.

The reference's four threads (Tracking / LocalMapping / LoopClosing /
Viewer, ``System.cc:194-244``) become phases over versioned map state;
`mapping_every` controls how often the mapping phase runs inline (the
async deployment dispatches it on a side stream instead).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import SlamConfig, RGBL, RGBD
from orb_slam3_rgbl_tpu.ops import depth as depth_ops
from orb_slam3_rgbl_tpu.slam import frame as frame_mod
from orb_slam3_rgbl_tpu.slam.local_mapping import LocalMapper
from orb_slam3_rgbl_tpu.slam.map_state import MapState
from orb_slam3_rgbl_tpu.slam.tracking import Tracker, TrackResult
from orb_slam3_rgbl_tpu.io import trajectory as traj_io


class System:
    def __init__(self, config: SlamConfig, enable_mapping: bool = True):
        self.cfg = config
        self.cam = config.camera
        self._enable_mapping = enable_mapping
        # map + tracker materialize on the first frame (feature capacity
        # comes from the actual frame pipeline, which may be narrower than
        # the config for tests)
        self.map: Optional[MapState] = None
        self.tracker: Optional[Tracker] = None
        self.mapper: Optional[LocalMapper] = None
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

    def track_rgbl(self, gray: np.ndarray, pointcloud: np.ndarray, timestamp: float) -> TrackResult:
        """RGB + raw LiDAR cloud (N, 3|4) — ``System::TrackRGBL``
        (reference ``System.cc:477-539``)."""
        feats = self._extract(gray)
        lc = self.cfg.lidar
        feats, _ = frame_mod.attach_lidar_depth(
            feats, jnp.asarray(pointcloud, jnp.float32), self.P_lidar,
            self.cam.height, self.cam.width, self.cam.bf,
            min_dist=lc.min_dist, max_dist=lc.max_dist, method=lc.method,
            dil_kind=lc.dil_kernel_type, dil_ku=lc.dil_kernel_size_u,
            dil_kv=lc.dil_kernel_size_v,
        )
        return self._track(feats, timestamp)

    def track_rgbd(self, gray: np.ndarray, depth_img: np.ndarray, timestamp: float) -> TrackResult:
        """RGB + dense depth image — ``System::TrackRGBD``."""
        feats = self._extract(gray)
        feats = frame_mod.attach_depth_map(
            feats, jnp.asarray(depth_img, jnp.float32), self.cam.bf,
            depth_factor=1.0,
        )
        return self._track(feats, timestamp)

    def track_features(self, feats: frame_mod.FrameFeatures, timestamp: float) -> TrackResult:
        """Feature-level entry point (testing / replaying extracted
        features without images)."""
        return self._track(feats, timestamp)

    def _track(self, feats, timestamp) -> TrackResult:
        if self.map is None:
            self.map = MapState.create(
                self.cfg.max_keyframes, self.cfg.max_map_points, int(feats.uv.shape[0])
            )
            self.tracker = Tracker(self.cfg, self.map)
            if self._enable_mapping:
                self.mapper = LocalMapper(self.cfg, self.map)
        res = self.tracker.track(feats, timestamp)
        if res.created_kf and self.mapper is not None and self.map.n_kf > 1:
            self.mapper.process_keyframe(self.tracker.new_kf_id)
        return res

    # ------------------------------------------------------------------
    def trajectory(self) -> np.ndarray:
        return self.tracker.trajectory_world()

    def save_trajectory_kitti(self, path: str):
        traj_io.save_kitti(path, self.trajectory())

    def save_trajectory_tum(self, path: str):
        traj_io.save_tum(path, self.tracker.traj_time, self.trajectory())

    def shutdown(self):
        pass
