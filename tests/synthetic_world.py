"""Synthetic SLAM world: ground-truth trajectory + landmarks rendered to
FrameFeatures. The feature-level analogue of a KITTI sequence for
end-to-end engine tests without dataset files (SURVEY.md §4: the rebuild
needs golden-trajectory integration tests; real-clip tests plug in the
same interface)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.slam.frame import FrameFeatures


class SyntheticWorld:
    def __init__(self, rng, n_landmarks=4000, length=100.0, cam=None,
                 corridor_half_width=25.0):
        self.rng = rng
        self.cam = cam
        # landmarks scattered around a forward corridor (z ∈ [0, length])
        self.points = np.stack(
            [
                rng.uniform(-corridor_half_width, corridor_half_width, n_landmarks),
                rng.uniform(-8, 8, n_landmarks),
                rng.uniform(-5.0, length + 60.0, n_landmarks),
            ],
            axis=1,
        ).astype(np.float32)
        # one stable random descriptor per landmark
        self.desc = rng.integers(0, 2**32, size=(n_landmarks, 8), dtype=np.uint32)

    def trajectory(self, n_frames=80, step=0.8, yaw_rate=0.0):
        """Forward-motion ground truth; returns (F, 7) Tcw poses."""
        poses = []
        T = np.asarray(lie.se3_identity(jnp.float32))
        for i in range(n_frames):
            yaw = yaw_rate + 0.002 * np.sin(i * 0.15)
            tau = np.array([0.0, 0.0, -step, 0.0, -yaw, 0.0], np.float32)
            # Tcw update: camera moves forward in world ⇒ world moves −z in cam
            T = np.asarray(lie.se3_mul(lie.se3_exp(jnp.asarray(tau)), jnp.asarray(T)))
            poses.append(T)
        return np.stack(poses)

    def render(self, Tcw: np.ndarray, n_feat=600, px_noise=0.3, depth_noise=0.02,
               depth_frac=0.95, dropout=0.1, desc_noise_bits=0,
               outlier_frac=0.0) -> FrameFeatures:
        """Project the world into a frame: fixed-capacity FrameFeatures.

        ``desc_noise_bits``: flip this many random bits in every rendered
        descriptor (models viewpoint/illumination appearance change — a
        real BRIEF is never bit-stable across frames).
        ``outlier_frac``: fraction of slots replaced by spurious features
        (random position + random descriptor, bound to no landmark)."""
        cam = self.cam
        rng = self.rng
        pc = np.asarray(lie.se3_apply(jnp.asarray(Tcw), jnp.asarray(self.points)))
        z = pc[:, 2]
        vis = z > 1.0
        u = cam.fx * pc[:, 0] / np.where(vis, z, 1.0) + cam.cx
        v = cam.fy * pc[:, 1] / np.where(vis, z, 1.0) + cam.cy
        vis &= (u >= 20) & (u < cam.width - 20) & (v >= 20) & (v < cam.height - 20)
        vis &= rng.uniform(size=len(z)) > dropout
        # deterministic priority by landmark id: a real detector re-fires
        # on the same corners every frame, so consecutive frames must
        # share most of their feature set (random subsampling would model
        # an unrealistically non-repeatable detector)
        ids = np.nonzero(vis)[0][:n_feat]

        uv = np.zeros((n_feat, 2), np.float32)
        desc = np.zeros((n_feat, 8), np.uint32)
        depth = np.full(n_feat, -1.0, np.float32)
        ur = np.full(n_feat, -1.0, np.float32)
        valid = np.zeros(n_feat, bool)
        m = len(ids)
        uv[:m, 0] = u[ids] + rng.normal(0, px_noise, m)
        uv[:m, 1] = v[ids] + rng.normal(0, px_noise, m)
        desc[:m] = self.desc[ids]
        if desc_noise_bits > 0 and m:
            # flip desc_noise_bits random bits per descriptor
            words = rng.integers(0, 8, (m, desc_noise_bits))
            bits = rng.integers(0, 32, (m, desc_noise_bits)).astype(np.uint32)
            for j in range(desc_noise_bits):
                desc[np.arange(m), words[:, j]] ^= (np.uint32(1) << bits[:, j])
        valid[:m] = True
        if outlier_frac > 0.0 and m:
            n_out = int(outlier_frac * m)
            if n_out:
                sl = rng.choice(m, n_out, replace=False)
                uv[sl, 0] = rng.uniform(20, self.cam.width - 20, n_out)
                uv[sl, 1] = rng.uniform(20, self.cam.height - 20, n_out)
                desc[sl] = rng.integers(0, 2**32, (n_out, 8), dtype=np.uint32)
        has_d = rng.uniform(size=m) < depth_frac
        zm = z[ids] * (1 + rng.normal(0, depth_noise, m))
        depth[:m] = np.where(has_d, zm, -1.0)
        ur[:m] = np.where(has_d, uv[:m, 0] - cam.bf / np.maximum(zm, 1e-3), -1.0)

        return FrameFeatures(
            uv=jnp.asarray(uv),
            response=jnp.asarray(np.where(valid, 50.0, 0.0).astype(np.float32)),
            octave=jnp.zeros(n_feat, jnp.int32),
            angle=jnp.zeros(n_feat, jnp.float32),
            desc=jnp.asarray(desc),
            valid=jnp.asarray(valid),
            depth=jnp.asarray(depth),
            u_right=jnp.asarray(ur),
        )
