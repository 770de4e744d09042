"""Offline map/trajectory viewer.

Replaces the reference's Pangolin ``Viewer``/``MapDrawer``/``FrameDrawer``
threads (``src/Viewer.cc``, ``src/MapDrawer.cc``, ``src/FrameDrawer.cc``)
with matplotlib renderings produced off the critical path — a deliberate
TPU-deployment choice (SURVEY §2.4: visualization must not steal host
cycles from the dispatch loop). Covers the same content: map points,
keyframe frusta, covisibility graph, current-frame keypoint overlay.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.slam.map_state import MapState


def plot_map(map_state: MapState, trajectory: Optional[np.ndarray] = None,
             gt: Optional[np.ndarray] = None, path: str = "map.png",
             draw_covisibility: bool = False):
    """Top-down (x-z) map view: landmarks, keyframes, trajectory."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    lms = map_state.lm_pos[map_state.lm_valid]
    if len(lms):
        ax.scatter(lms[:, 0], lms[:, 2], s=0.5, c="#999999", label="landmarks")
    kfs = map_state.valid_kf_ids()
    if len(kfs):
        centers = np.asarray(
            lie.se3_trans(lie.se3_inv(jnp.asarray(map_state.kf_pose[kfs])))
        )
        ax.scatter(centers[:, 0], centers[:, 2], s=12, c="tab:blue", marker="s", label="keyframes")
        if draw_covisibility:
            for k in kfs:
                w = map_state.covisibility_weights(int(k))
                for nb in np.nonzero(w >= 100)[0]:
                    c1 = centers[list(kfs).index(k)]
                    c2 = np.asarray(lie.se3_trans(lie.se3_inv(jnp.asarray(map_state.kf_pose[nb]))))
                    ax.plot([c1[0], c2[0]], [c1[2], c2[2]], c="tab:green", lw=0.3)
    if trajectory is not None and len(trajectory):
        ax.plot(trajectory[:, 4], trajectory[:, 6], c="tab:red", lw=1.0, label="estimate")
    if gt is not None and len(gt):
        ax.plot(gt[:, 4], gt[:, 6], c="black", lw=1.0, ls="--", label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.axis("equal")
    ax.legend(loc="best", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def draw_frame(gray: np.ndarray, uv: np.ndarray, valid: np.ndarray,
               tracked: Optional[np.ndarray] = None, path: str = "frame.png",
               state: Optional[str] = None, n_kf: Optional[int] = None,
               n_lm: Optional[int] = None):
    """Keypoint overlay (``FrameDrawer::DrawFrame`` equivalent): detected
    keypoints in green, tracked map-point matches as red crosses, and the
    reference's status bar (state + KF/MP/match counts,
    ``FrameDrawer.cc:331-369``) as a caption."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 4))
    ax.imshow(gray, cmap="gray")
    sel = valid
    ax.scatter(uv[sel, 0], uv[sel, 1], s=6, facecolors="none", edgecolors="lime", lw=0.6)
    n_matches = 0
    if tracked is not None:
        ax.scatter(uv[tracked, 0], uv[tracked, 1], s=6, c="red", marker="+")
        n_matches = int(np.asarray(tracked).sum())
    parts = []
    if state is not None:
        parts.append(state)
    if n_kf is not None:
        parts.append(f"KFs: {n_kf}")
    if n_lm is not None:
        parts.append(f"MPs: {n_lm}")
    parts.append(f"Matches: {n_matches}")
    ax.set_title(" | ".join(parts), fontsize=9, loc="left")
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def draw_frame_from_system(system, gray: np.ndarray, path: str = "frame.png"):
    """Convenience: overlay the System's current frame state (the
    per-frame ``FrameDrawer::Update`` call site, reference
    ``Tracking.cc:2235``)."""
    from orb_slam3_rgbl_tpu.slam import tracking as trk

    t = system.tracker
    if t is None or t.last_feats is None:
        return draw_frame(gray, np.zeros((0, 2)), np.zeros(0, bool), path=path)
    feats = t.last_feats
    return draw_frame(
        gray, np.asarray(feats.uv), np.asarray(feats.valid),
        tracked=np.asarray(t.cur_lm_idx >= 0),
        state=trk.STATE_NAMES.get(t.state, str(t.state)),
        n_kf=system.map.n_kf if system.map is not None else 0,
        n_lm=system.map.n_lm if system.map is not None else 0,
        path=path,
    )
