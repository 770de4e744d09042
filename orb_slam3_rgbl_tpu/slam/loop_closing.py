"""Loop closing: detection, Sim3 verification, map correction.

Replaces the reference ``LoopClosing`` thread (``LoopClosing.cc:90-308``):
``NewDetectCommonRegions`` (``:324-533``) → ``DetectCommonRegionsFromBoW``
(``:578-897``, BoW candidates → Sim3 RANSAC → guided projection →
OptimizeSim3) → ``CorrectLoop`` (``:969-1214``, Sim3 propagation of the
covisible window, duplicate fusion, essential-graph optimization).

Parity deltas (round 1, documented): detection accepts on one strongly-
verified candidate (high inlier thresholds) instead of the reference's
3-consecutive-keyframe temporal gate; map-merge across Atlas maps is not
yet wired.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import SlamConfig
from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.ops import matching
from orb_slam3_rgbl_tpu.optim import sim3 as sim3_opt
from orb_slam3_rgbl_tpu.optim import pose_graph
from orb_slam3_rgbl_tpu.retrieval.keyframe_db import KeyFrameDatabase
from orb_slam3_rgbl_tpu.slam.map_state import MapState


@dataclasses.dataclass
class LoopEvent:
    kf_cur: int
    kf_matched: int
    n_inliers: int
    S12: np.ndarray  # Sim3 cur←matched (camera frames)


class LoopCloser:
    def __init__(self, config: SlamConfig, map_state: MapState, run_gba: bool = True):
        self.cfg = config
        self.cam = config.camera
        self.map = map_state
        vocabulary = None
        if config.vocab_path:
            from orb_slam3_rgbl_tpu.retrieval.tree_vocab import TreeVocabulary

            vocabulary = TreeVocabulary.load(config.vocab_path)
        self.db = KeyFrameDatabase(map_state.capacity_kf, vocabulary=vocabulary)
        self.fix_scale = config.sensor != 0  # everything but pure mono
        self.last_loop_kf = -9999
        self.events: list[LoopEvent] = []
        self.run_gba = run_gba
        self._key = jax.random.PRNGKey(7)

    # ------------------------------------------------------------------
    def on_keyframe(self, kf_id: int, run_pose_graph: bool = True) -> Optional[LoopEvent]:
        """Detect + (if verified) correct a loop for the new keyframe, then
        index it. Returns the LoopEvent when a loop was closed."""
        event = None
        # index first: detect_candidates queries the stored signature of
        # kf_id (itself + covisibles are excluded from the results)
        self.db.add(kf_id, self.map.kf_desc[kf_id], self.map.kf_feat_valid[kf_id])
        # reference skips detection until the map holds ≥ 12 KFs
        # (LoopClosing.cc:356) and right after a correction
        if self.map.n_kf >= 12 and kf_id > self.last_loop_kf + 5:
            event = self._detect(kf_id)
            if event is not None:
                self._correct_loop(event, run_pose_graph=run_pose_graph)
                self.last_loop_kf = kf_id
                self.events.append(event)
        return event

    # ------------------------------------------------------------------
    def _detect(self, kf_id: int) -> Optional[LoopEvent]:
        cands = self.db.detect_candidates(self.map, kf_id, n_candidates=3)
        covis = None
        for cand in cands:
            # candidates temporally adjacent are odometry, not loops
            if abs(int(self.map.kf_frame_id[cand]) - int(self.map.kf_frame_id[kf_id])) < 30:
                continue
            # candidates already sharing landmarks are connected structure
            # (the tracker re-entered a mapped region) — not a loop; the
            # reference excludes the connected set the same way
            if covis is None:
                covis = self.map.covisibility_weights(kf_id)
            if covis[cand] > 5:
                continue
            ev = self._verify_candidate(kf_id, int(cand))
            if ev is not None:
                return ev
        return None

    def _verify_candidate(self, kf_id: int, cand: int) -> Optional[LoopEvent]:
        """Descriptor match on landmark-bound features → Sim3 RANSAC →
        GN refinement; thresholds follow the reference's 20 (BoW) /
        ≥ 30-50 (projection) ladder."""
        m = self.map
        b1 = m.kf_lm_idx[kf_id] >= 0
        b2 = m.kf_lm_idx[cand] >= 0
        if b1.sum() < 20 or b2.sum() < 20:
            return None
        d = matching.distance_table(
            jnp.asarray(m.kf_desc[kf_id]), jnp.asarray(m.kf_desc[cand]),
            jnp.asarray(b1), jnp.asarray(b2),
        )
        idx, _ = matching.mutual_best_match(
            d, jnp.asarray(m.kf_angle[kf_id]), jnp.asarray(m.kf_angle[cand]),
            th=matching.TH_LOW, ratio=0.75, check_rotation=True)
        idx = np.asarray(idx)
        f1 = np.nonzero(idx >= 0)[0]
        if f1.size < 20:
            return None
        f2 = idx[f1]

        lm1 = m.kf_lm_idx[kf_id, f1]
        lm2 = m.kf_lm_idx[cand, f2]
        # same-id pairs are covisible structure, not loop evidence
        distinct = lm1 != lm2
        f1, f2, lm1, lm2 = f1[distinct], f2[distinct], lm1[distinct], lm2[distinct]
        if f1.size < 20:
            return None
        T1 = jnp.asarray(m.kf_pose[kf_id])
        T2 = jnp.asarray(m.kf_pose[cand])
        p1_cam = np.asarray(lie.se3_apply(T1, jnp.asarray(m.lm_pos[lm1])))
        p2_cam = np.asarray(lie.se3_apply(T2, jnp.asarray(m.lm_pos[lm2])))
        uv1 = m.kf_uv[kf_id, f1]
        uv2 = m.kf_uv[cand, f2]
        s2_1 = (1.2 ** (2 * m.kf_octave[kf_id, f1])).astype(np.float32)
        s2_2 = (1.2 ** (2 * m.kf_octave[cand, f2])).astype(np.float32)

        P = f1.size
        self._key, sub = jax.random.split(self._key)
        res = sim3_opt.sim3_ransac(
            jnp.asarray(p1_cam), jnp.asarray(p2_cam), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(s2_1), jnp.asarray(s2_2), jnp.ones(P, bool), self.cam,
            sub, n_hypotheses=512, fix_scale=self.fix_scale,
        )
        if int(res.n_inliers) < 20:
            return None
        S12, inl, n = sim3_opt.optimize_sim3(
            res.S12, jnp.asarray(p1_cam), jnp.asarray(p2_cam), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.asarray(1.0 / s2_1), jnp.asarray(1.0 / s2_2),
            res.inliers, self.cam, fix_scale=self.fix_scale,
        )
        if int(n) < 25:
            return None
        # landmark fusion pairs: current landmark → matched (older) landmark
        inl_np = np.asarray(inl)
        self._pending_fusion = (lm1[inl_np], lm2[inl_np])
        return LoopEvent(kf_cur=kf_id, kf_matched=cand, n_inliers=int(n), S12=np.asarray(S12))

    # ------------------------------------------------------------------
    def _correct_loop(self, ev: LoopEvent, run_pose_graph: bool = True):
        """Reference ``CorrectLoop``: compute the corrected Sim3 of the
        current keyframe from the loop constraint, spread the correction
        through the pose graph, re-anchor landmarks, fuse duplicates."""
        m = self.map
        valid = m.valid_kf_ids()
        K = valid.size
        slot = {int(k): i for i, k in enumerate(valid)}

        # nodes: current SE3 poses as Sim3
        nodes = np.concatenate(
            [m.kf_pose[valid], np.ones((K, 1), np.float32)], axis=1
        )
        old_nodes = nodes.copy()

        # edges: sequential chain (spanning-tree equivalent) + strong covis
        ei, ej, Sij, w = [], [], [], []
        nodes_j = jnp.asarray(nodes)
        for a in range(1, K):
            i, j = int(valid[a]), int(valid[a - 1])
            ei.append(slot[i]); ej.append(slot[j]); w.append(1.0)
            Sij.append(np.asarray(pose_graph.relative_sim3(nodes_j, slot[i], slot[j])))
        # loop edge with the MEASURED relative Sim3:
        # S_cur_w(corrected) = S12 · S_matched_w  ⇒  S_cur←matched = S12
        ei.append(slot[ev.kf_cur]); ej.append(slot[ev.kf_matched]); w.append(10.0)
        Sij.append(ev.S12.astype(np.float32))

        problem = pose_graph.PoseGraphProblem(
            nodes=jnp.asarray(nodes.astype(np.float32)),
            node_fixed=jnp.asarray(np.arange(K) == slot[ev.kf_matched]),
            node_valid=jnp.ones(K, bool),
            edge_i=jnp.asarray(np.array(ei, np.int32)),
            edge_j=jnp.asarray(np.array(ej, np.int32)),
            edge_Sij=jnp.asarray(np.stack(Sij).astype(np.float32)),
            edge_weight=jnp.asarray(np.array(w, np.float32)),
            edge_valid=jnp.ones(len(ei), bool),
        )
        if run_pose_graph:
            # inertial maps with gravity observable use the 4-DoF variant
            # (translation + yaw only — reference OptimizeEssentialGraph4DoF,
            # selected at LoopClosing.cc:1183); otherwise full Sim3/SE3
            if self.cfg.inertial and m.imu_initialized:
                new_nodes = np.asarray(pose_graph.optimize_pose_graph_4dof(
                    problem, iterations=20
                ))
            else:
                new_nodes = np.asarray(pose_graph.optimize_pose_graph(
                    problem, iterations=20, fix_scale=self.fix_scale
                ))
        else:
            new_nodes = nodes

        # landmark correction via reference keyframes: X ← S_ref_new⁻¹ · S_ref_old · X
        lm_ids = np.nonzero(m.lm_valid)[0]
        ref = m.lm_ref_kf[lm_ids]
        ref_slot = np.array([slot.get(int(r), 0) for r in ref], np.int64)
        S_old = jnp.asarray(old_nodes[ref_slot])
        S_new = jnp.asarray(new_nodes[ref_slot])
        X = jnp.asarray(m.lm_pos[lm_ids])
        X_corr = lie.sim3_apply(lie.sim3_inv(S_new), lie.sim3_apply(S_old, X))
        m.lm_pos[lm_ids] = np.asarray(X_corr, np.float32)

        # pose writeback (drop scale into SE3 as the reference does)
        m.kf_pose[valid] = np.asarray(lie.sim3_to_se3(jnp.asarray(new_nodes)), np.float32)

        # fuse loop duplicate landmarks (current ones replaced by matched)
        if getattr(self, "_pending_fusion", None) is not None:
            cur_lms, old_lms = self._pending_fusion
            self._fuse(cur_lms, old_lms)
            self._pending_fusion = None
        m.version += 1

        # global BA after the correction (reference launches the GBA
        # thread at LoopClosing.cc:1206 when the map holds < 200 KFs)
        if self.run_gba and m.n_kf < 200:
            self._global_ba()

    def _global_ba(self, iterations: int = 6):
        from orb_slam3_rgbl_tpu.optim import global_ba
        from orb_slam3_rgbl_tpu.slam import ba_assembly
        from orb_slam3_rgbl_tpu.slam.frame import inv_scale_sigma2

        inv_s2 = np.asarray(inv_scale_sigma2(self.cfg.orb.n_levels, self.cfg.orb.scale_factor))
        problem, window, lm_ids, obs_kf, obs_feat = ba_assembly.build_full_problem(
            self.map, inv_s2
        )
        res = global_ba.global_bundle_adjust(problem, self.cam, iterations=iterations)
        ba_assembly.writeback(
            self.map, window, lm_ids, obs_kf, obs_feat,
            res.poses, res.landmarks,
        )

    def _fuse(self, cur_lms: np.ndarray, old_lms: np.ndarray):
        """Replace each current-side landmark with its loop-matched older
        twin in every binding (``MapPoint::Replace`` semantics)."""
        m = self.map
        remap = np.arange(m.capacity_lm, dtype=np.int32)
        keep = cur_lms != old_lms
        remap[cur_lms[keep]] = old_lms[keep]
        bound = m.kf_lm_idx >= 0
        m.kf_lm_idx[bound] = remap[m.kf_lm_idx[bound]]
        m.lm_valid[cur_lms[keep]] = False
