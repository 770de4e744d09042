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


def _frustum_segments(Twc: np.ndarray, scale: float = 0.6):
    """Camera frustum wireframe segments (MapDrawer::DrawKeyFrames
    geometry, ``src/MapDrawer.cc:178``): apex + 4 image-plane corners."""
    w, h, z = 0.5 * scale, 0.3 * scale, 0.4 * scale
    corners = np.array([
        [0, 0, 0], [w, h, z], [-w, h, z], [-w, -h, z], [w, -h, z]
    ], np.float32)
    q, t = Twc[:4], Twc[4:7]
    pts = lie.np_quat_rotate(q[None, :], corners) + t
    idx = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    return [(pts[a], pts[b]) for a, b in idx]


def plot_map_3d(map_state: MapState, trajectory: Optional[np.ndarray] = None,
                loop_edges: Optional[list] = None, path: str = "map3d.png",
                draw_graph: bool = True, frustum_scale: float = 0.6):
    """3D map view — the offline analog of the Pangolin window
    (``MapDrawer::DrawMapPoints``/``DrawKeyFrames`` + the covisibility/
    spanning/loop graph toggle of ``Viewer::Run``): landmarks, keyframe
    frusta, sequential spanning chain, strong covisibility edges, and
    loop/merge constraints."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(11, 8))
    ax = fig.add_subplot(projection="3d")
    lms = map_state.lm_pos[map_state.lm_valid]
    if len(lms):
        ax.scatter(lms[:, 0], lms[:, 2], -lms[:, 1], s=0.3, c="#888888",
                   alpha=0.5)
    kfs = map_state.valid_kf_ids()
    if len(kfs):
        Twc = np.asarray(lie.np_se3_inv(map_state.kf_pose[kfs]))
        for T in Twc:
            for a, b in _frustum_segments(T, frustum_scale):
                ax.plot([a[0], b[0]], [a[2], b[2]], [-a[1], -b[1]],
                        c="tab:blue", lw=0.5)
        centers = Twc[:, 4:7]
        # spanning chain (the sequential odometry backbone)
        ax.plot(centers[:, 0], centers[:, 2], -centers[:, 1],
                c="tab:green", lw=0.8)
        if draw_graph and len(kfs) > 2:
            valid, W = map_state.covisibility_matrix()
            hi, hj = np.nonzero(np.triu(W >= 100, k=1))
            for a, b in zip(hi, hj):
                ax.plot([centers[a, 0], centers[b, 0]],
                        [centers[a, 2], centers[b, 2]],
                        [-centers[a, 1], -centers[b, 1]],
                        c="tab:olive", lw=0.3, alpha=0.6)
        if loop_edges:
            slot = {int(k): i for i, k in enumerate(kfs)}
            for e in loop_edges:
                a, b = int(e[0]), int(e[1])
                if a in slot and b in slot:
                    ca, cb = centers[slot[a]], centers[slot[b]]
                    ax.plot([ca[0], cb[0]], [ca[2], cb[2]], [-ca[1], -cb[1]],
                            c="tab:red", lw=1.5)
    if trajectory is not None and len(trajectory):
        ax.plot(trajectory[:, 4], trajectory[:, 6], -trajectory[:, 5],
                c="tab:red", lw=0.8)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_zlabel("-y [m]")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


class ViewerSession:
    """Periodic offline rendering during a run — the deployment analog of
    the reference ``Viewer`` thread (``System.cc:236-244``): every
    ``every`` frames it saves the FrameDrawer overlay and a map view into
    ``out_dir`` (numbered PNG series), entirely off the dispatch path."""

    def __init__(self, out_dir: str, every: int = 20, map_3d: bool = True):
        import os

        self.out_dir = out_dir
        self.every = max(1, every)
        self.map_3d = map_3d
        self.count = 0
        os.makedirs(out_dir, exist_ok=True)

    def update(self, system, gray: Optional[np.ndarray] = None):
        import os

        i = self.count
        self.count += 1
        if i % self.every:
            return None
        outs = []
        if gray is not None:
            outs.append(draw_frame_from_system(
                system, np.asarray(gray),
                path=os.path.join(self.out_dir, f"frame_{i:06d}.png")))
        if system.map is not None and system.map.n_kf:
            loop_edges = (system.loop_closer.extra_edges
                          if system.loop_closer is not None else None)
            render = plot_map_3d if self.map_3d else plot_map
            kw = dict(loop_edges=loop_edges) if self.map_3d else {}
            outs.append(render(
                system.map, trajectory=None,
                path=os.path.join(self.out_dir, f"map_{i:06d}.png"), **kw))
        return outs
