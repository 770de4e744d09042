"""MapState → BAProblem assembly (shared by local BA, global BA, merge).

Capacity tiers keep jit shapes stable: the problem pads to the next tier
(powers of two) so recompiles happen O(log map-size) times per run —
SURVEY §7 "recompile tiers" mitigation for dynamic map growth.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.optim.local_ba import BAProblem
from orb_slam3_rgbl_tpu.slam.map_state import MapState


def _tier(n: int, lo: int) -> int:
    t = lo
    while t < n:
        t *= 2
    return t


def build_full_problem(
    m: MapState,
    inv_sigma2: np.ndarray,
    max_obs: int = 8,
    min_pose_tier: int = 32,
    min_lm_tier: int = 1024,
) -> Tuple[BAProblem, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Whole-map BA problem (origin keyframe gauge-fixed).

    Returns (problem, window_kf_ids, lm_ids, obs_kf_raw, obs_feat) — the
    raw index arrays let callers write results and outlier unbinding back
    into the map.
    """
    window = m.valid_kf_ids()
    lm_ids = np.nonzero(m.lm_valid)[0]
    Kp = _tier(len(window), min_pose_tier)
    Mp = _tier(max(len(lm_ids), 1), min_lm_tier)

    obs_kf, obs_feat, obs_mask, obs_uv, obs_ur = m.gather_observations(window, lm_ids, max_obs)

    def pad(a, n, fill=0):
        out = np.full((n,) + a.shape[1:], fill, a.dtype)
        out[: a.shape[0]] = a
        return out

    poses = pad(m.kf_pose[window], Kp)
    poses[len(window):, 0] = 1.0  # identity quaternions for padding
    pose_fixed = np.zeros(Kp, bool)
    pose_fixed[np.nonzero(window == 0)[0]] = True
    if not pose_fixed[: len(window)].any():
        pose_fixed[int(np.argmin(m.kf_frame_id[window]))] = True
    pose_valid = pad(np.ones(len(window), bool), Kp, False)

    kf_global = window[np.clip(obs_kf, 0, len(window) - 1)]
    octv = m.kf_octave[kf_global, obs_feat].astype(np.int32)
    inv_s2 = inv_sigma2[np.clip(octv, 0, len(inv_sigma2) - 1)].astype(np.float32)

    problem = BAProblem(
        poses=jnp.asarray(poses),
        pose_fixed=jnp.asarray(pose_fixed),
        pose_valid=jnp.asarray(pose_valid),
        landmarks=jnp.asarray(pad(m.lm_pos[lm_ids], Mp)),
        lm_valid=jnp.asarray(pad(np.ones(len(lm_ids), bool), Mp, False)),
        obs_kf=jnp.asarray(pad(obs_kf, Mp)),
        obs_uv=jnp.asarray(pad(obs_uv, Mp)),
        obs_ur=jnp.asarray(pad(obs_ur, Mp, -1.0)),
        obs_inv_sigma2=jnp.asarray(pad(inv_s2, Mp)),
        obs_mask=jnp.asarray(pad(obs_mask, Mp, False)),
    )
    return problem, window, lm_ids, obs_kf, obs_feat


def writeback(
    m: MapState,
    window: np.ndarray,
    lm_ids: np.ndarray,
    obs_kf: np.ndarray,
    obs_feat: np.ndarray,
    poses,
    landmarks,
    obs_inlier=None,
    obs_mask=None,
):
    """Apply solver output to the map (the reference's staged ``mTcwGBA``
    swap — here a plain array store bumping the version)."""
    m.kf_pose[window] = np.asarray(poses, np.float32)[: len(window)]
    m.lm_pos[lm_ids] = np.asarray(landmarks, np.float32)[: len(lm_ids)]
    if obs_inlier is not None and obs_mask is not None:
        inl = np.asarray(obs_inlier)[: len(lm_ids)]
        bad = (~inl) & obs_mask
        if bad.any():
            mr, dc = np.nonzero(bad)
            kfg = window[obs_kf[mr, dc]]
            m.kf_lm_idx[kfg, obs_feat[mr, dc]] = -1
            m.cull_orphans(lm_ids[np.unique(mr)])
    m.version += 1
