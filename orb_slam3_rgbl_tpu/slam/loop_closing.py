"""Loop closing: detection, Sim3 verification, map correction.

Replaces the reference ``LoopClosing`` thread (``LoopClosing.cc:90-308``):
``NewDetectCommonRegions`` (``:324-533``) → ``DetectCommonRegionsFromBoW``
(``:578-897``, BoW candidates → Sim3 RANSAC → guided projection →
OptimizeSim3) → ``CorrectLoop`` (``:969-1214``, Sim3 propagation of the
covisible window, duplicate fusion, essential-graph optimization).

Round-3 upgrades: 3-consecutive-keyframe temporal-consistency gating of
candidates (``LoopClosing.cc:396`` covisibility-consistency scheme), the
full essential graph (spanning chain + covisibility edges weight≥100 +
ALL accumulated loop/merge edges, ``Optimizer.cc:1501+``), and
``SearchAndFuse`` projection fusion of the loop-side landmarks into the
Sim3-corrected covisible window before the pose graph
(``LoopClosing.cc:1115-1214``).
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


def _pad_pairs(cap, p1, p2, uv1, uv2, s1, s2):
    """Pad Sim3-verification correspondence arrays to a fixed capacity
    tier + validity mask. The match count varies per candidate — unpadded
    shapes would compile a fresh Sim3 RANSAC/GN executable per call
    (seconds each on the TPU tunnel; the round-3 bench's mid-run spikes)."""
    P = min(len(p1), cap)   # truncate over-capacity match sets (reachable
    out = []                # when n_features > the hi tier cap)
    for a, fill in ((p1, 0.0), (p2, 0.0), (uv1, 0.0), (uv2, 0.0),
                    (s1, 1.0), (s2, 1.0)):
        a = np.asarray(a, np.float32)
        o = np.full((cap,) + a.shape[1:], fill, np.float32)
        o[:P] = a[:P]
        out.append(o)
    vm = np.zeros(cap, bool)
    vm[:P] = True
    return out, vm


def _pair_tier(n: int, lo: int = 256, hi: int = 2048) -> int:
    t = lo
    while t < n and t < hi:
        t *= 2
    return t


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
        # temporal-consistency state: [(covisibility group set, count)]
        # (reference mvConsistentGroups, consistency threshold 3)
        self.consistency_th = 3
        self._consistent_groups: list = []
        # accumulated loop/merge constraints fed to every future essential
        # graph (reference KeyFrame::mLoopEdges / mMergeEdges)
        self.extra_edges: list = []   # (kf_a, kf_b, S_ab (8,), weight)
        self.run_gba = run_gba
        # shape-tier floors for the loop-time solvers: a production run
        # sets these generously ONCE (+ prewarm) so every event reuses one
        # compiled program — per-tier recompiles cost tens of seconds on
        # the measurement tunnel (gba: (pose_tier, lm_tier); pg: (nodes,
        # edges) floors)
        self.gba_tiers = (32, 1024)
        self.pg_tiers = (64, 128)
        # wired by System when the async mapping plane is on: schedules
        # the post-loop GBA as its own abortable job (the reference's
        # transient GBA thread, LoopClosing.cc:1206); None → synchronous
        self.gba_dispatch = None
        self._key = jax.random.PRNGKey(7)

    # ------------------------------------------------------------------
    def prewarm(self, n_kf_hint: int = 96, lm_hint: int = 8192,
                pair_tiers=(256, 512)):
        """Compile the loop-closure-time XLA programs ahead of the first
        event. The first loop otherwise pays every compile (Sim3 RANSAC +
        refine, guided matching, pose graph, chunked GBA) as a mid-run
        stall — ~80 s on the measurement tunnel; a deployment calls this
        once at startup (the reference's analog is its vocabulary load)."""
        import numpy as _np
        from orb_slam3_rgbl_tpu.optim import global_ba as _gba
        from orb_slam3_rgbl_tpu.slam.ba_assembly import _tier
        from orb_slam3_rgbl_tpu.optim.local_ba import BAProblem

        m = self.map
        N = m.n_features
        rngk = jax.random.PRNGKey(0)
        # eager PRNG split compiles ~10 s on the tunnel — pay it here,
        # not inside the first mid-run Sim3 verification
        self._key, _ = jax.random.split(self._key)
        # -- Sim3 verification at the padded pair tiers ------------------
        for cap in pair_tiers:
            pts = _np.linspace(1.0, 2.0, cap * 3).reshape(cap, 3).astype(_np.float32)
            uv = _np.tile(_np.array([[100.0, 100.0]], _np.float32), (cap, 1))
            s2 = _np.ones(cap, _np.float32)
            vm = _np.zeros(cap, bool)
            vm[: max(cap // 4, 30)] = True
            res = sim3_opt.sim3_ransac(
                jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(uv),
                jnp.asarray(uv), jnp.asarray(s2), jnp.asarray(s2),
                jnp.asarray(vm), self.cam, rngk, n_hypotheses=512,
                fix_scale=self.fix_scale)
            sim3_opt.optimize_sim3(
                res.S12, jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(uv),
                jnp.asarray(uv), jnp.asarray(s2), jnp.asarray(s2),
                # the exact runtime expression, eager `&` included — a
                # bare res.inliers here left jit(bitwise_and) to compile
                # mid-run at the first real verification (r5 audit)
                res.inliers & jnp.asarray(vm), self.cam,
                fix_scale=self.fix_scale)
        # -- guided / fuse / reloc windowed matching variants ------------
        # (th and ratio are STATIC jit args — every distinct combination
        # used at loop/reloc time is its own executable)
        for cap, th in ((N, matching.TH_LOW), (2 * N, matching.TH_LOW),
                        (N, matching.TH_HIGH)):
            matching.windowed_projection_match(
                jnp.zeros((cap, 2), jnp.float32), jnp.zeros(cap, bool),
                jnp.zeros((cap, 8), jnp.uint32), jnp.zeros(cap, jnp.int32),
                jnp.zeros((N, 2), jnp.float32), jnp.zeros(N, bool),
                jnp.zeros((N, 8), jnp.uint32), jnp.zeros(N, jnp.int32),
                jnp.full(cap, 4.0, jnp.float32), th=th)
        # loop-verification / relocalization descriptor matching (ratio
        # 0.75 + rotation histogram — tracking warms only 0.7/0.8)
        d = matching.distance_table(
            jnp.zeros((N, 8), jnp.uint32), jnp.zeros((N, 8), jnp.uint32),
            jnp.zeros(N, bool), jnp.zeros(N, bool))
        matching.mutual_best_match(d, jnp.zeros(N, jnp.float32),
                                   jnp.zeros(N, jnp.float32),
                                   th=matching.TH_LOW, ratio=0.75,
                                   check_rotation=True)
        matching.mutual_best_match(d, th=matching.TH_LOW, ratio=0.75,
                                   check_rotation=False)
        # keyframe-database scoring at full capacity (first detection
        # otherwise compiles the score matvecs mid-run)
        self.db.query(self.db.vectors[0], np.zeros(0, np.int64))
        # relocalization PnP at the first pair tier
        from orb_slam3_rgbl_tpu.optim import pnp as _pnp

        capr = pair_tiers[0]
        _pnp.rigid_pnp_ransac(
            jnp.zeros((capr, 3), jnp.float32) + jnp.asarray([0.0, 0.0, 5.0], jnp.float32),
            jnp.zeros((capr, 3), jnp.float32) + jnp.asarray([0.0, 0.0, 5.0], jnp.float32),
            jnp.full((capr, 2), 100.0, jnp.float32),
            jnp.ones(capr, jnp.float32),
            jnp.concatenate([jnp.ones(32, bool), jnp.zeros(capr - 32, bool)]),
            self.cam, rngk)
        # -- essential graph at the expected node/edge tiers -------------
        from orb_slam3_rgbl_tpu.slam.ba_assembly import _tier as _t

        for K in {self.pg_tiers[0], _t(n_kf_hint, self.pg_tiers[0])}:
            E = _t(2 * K, self.pg_tiers[1])
            ident = _np.tile(_np.array([1, 0, 0, 0, 0, 0, 0, 1], _np.float32), (K, 1))
            eS = _np.tile(_np.array([1, 0, 0, 0, 0, 0, 0, 1], _np.float32), (E, 1))
            prob = pose_graph.PoseGraphProblem(
                nodes=jnp.asarray(ident),
                node_fixed=jnp.asarray(_np.arange(K) == 0),
                node_valid=jnp.ones(K, bool),
                edge_i=jnp.asarray((_np.arange(E) % (K - 1) + 1).astype(_np.int32)),
                edge_j=jnp.zeros(E, jnp.int32),
                edge_Sij=jnp.asarray(eS),
                edge_weight=jnp.ones(E, jnp.float32),
                edge_valid=jnp.ones(E, bool))
            pose_graph.optimize_pose_graph(prob, iterations=20,
                                           fix_scale=self.fix_scale)
        # -- chunked GBA at the expected pose/landmark tiers -------------
        for K in {self.gba_tiers[0], _t(n_kf_hint, self.gba_tiers[0])}:
            Mp = _t(lm_hint, self.gba_tiers[1])
            prob = BAProblem(
                poses=jnp.asarray(_np.tile(
                    _np.array([1, 0, 0, 0, 0, 0, 0], _np.float32), (K, 1))),
                pose_fixed=jnp.asarray(_np.arange(K) == 0),
                pose_valid=jnp.ones(K, bool),
                landmarks=jnp.zeros((Mp, 3), jnp.float32)
                + jnp.asarray([0.0, 0.0, 10.0], jnp.float32),
                lm_valid=jnp.ones(Mp, bool),
                obs_kf=jnp.zeros((Mp, 8), jnp.int32),
                obs_uv=jnp.full((Mp, 8, 2), 100.0, jnp.float32),
                obs_ur=jnp.full((Mp, 8), -1.0, jnp.float32),
                obs_inv_sigma2=jnp.ones((Mp, 8), jnp.float32),
                obs_mask=jnp.ones((Mp, 8), bool))
            # EXACT runtime signature (_gba_iterate chunks: iterations=2,
            # cg_iters=64) — iterations/cg_iters are static jit args, any
            # mismatch compiles a fresh executable mid-run (~75 s on the
            # tunnel at the first loop event, r5 bench)
            _gba.global_bundle_adjust(prob, self.cam, iterations=2,
                                      cg_iters=64)

    def on_keyframe(self, kf_id: int, run_pose_graph: bool = True) -> Optional[LoopEvent]:
        """Detect + (if verified) correct a loop for the new keyframe, then
        index it. Returns the LoopEvent when a loop was closed."""
        event = self.detect_only(kf_id)
        if event is not None:
            self.apply_event(event, run_pose_graph=run_pose_graph)
        return event

    def detect_only(self, kf_id: int,
                    index_only: bool = False) -> Optional[LoopEvent]:
        """Detection half (safe on the loop plane: reads map arrays +
        mutates only the database/its own consistency state — the
        reference's LoopClosing thread runs detection concurrently with
        LocalMapping the same way, LoopClosing.cc:90-308).

        ``index_only``: register the keyframe in the database but skip
        candidate verification — the loop plane's load-shedding mode when
        it falls behind the keyframe rate (verification costs ~1.5 s per
        keyframe on the measurement tunnel; the DATABASE must still see
        every keyframe or later retrievals lose recall)."""
        # index first: detect_candidates queries the stored signature of
        # kf_id (itself + covisibles are excluded from the results)
        self.db.add(kf_id, self.map.kf_desc[kf_id], self.map.kf_feat_valid[kf_id])
        if index_only:
            return None
        # reference skips detection until the map holds ≥ 12 KFs
        # (LoopClosing.cc:356) and right after a correction
        if self.map.n_kf >= 12 and kf_id > self.last_loop_kf + 5:
            return self._detect(kf_id)
        return None

    def apply_event(self, event: LoopEvent, run_pose_graph: bool = True):
        """Correction half (mutates the whole map — must run serialized
        with other map mutations: on the mapping worker or a quiesced
        main thread; the reference stops LocalMapping for CorrectLoop,
        LoopClosing.cc:975)."""
        self._correct_loop(event, run_pose_graph=run_pose_graph)
        self.last_loop_kf = event.kf_cur
        self.events.append(event)

    # ------------------------------------------------------------------
    def _detect(self, kf_id: int) -> Optional[LoopEvent]:
        cands = self.db.detect_candidates(self.map, kf_id, n_candidates=3)
        covis = None
        gated = []
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
            gated.append(int(cand))
        # temporal consistency (reference LoopClosing.cc:396 / the
        # ORB-SLAM covisibility-consistency scheme): a candidate's
        # covisibility group must intersect groups seen on the previous
        # consecutive keyframes ≥ consistency_th times before geometric
        # verification is even attempted — one-off false positives from
        # retrieval never reach Sim3
        new_groups = []
        consistent = []
        for cand in gated:
            group = set(int(k) for k in self.map.best_covisible(cand, 10, min_weight=1))
            group.add(cand)
            count = 0
            for pg, pc in self._consistent_groups:
                if group & pg:
                    count = max(count, pc + 1)
            new_groups.append((group, count))
            # accept on count ≥ th: count here IS nCurrentConsistency
            # (prev + 1), matching the reference's accumulation exactly —
            # a candidate needs th+1 consecutive detecting keyframes
            if count >= self.consistency_th:
                consistent.append(cand)
        self._consistent_groups = new_groups
        for cand in consistent:
            ev = self._verify_candidate(kf_id, cand)
            if ev is not None:
                self._consistent_groups = []
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
        # numpy: lm1/lm2 lengths vary per candidate — eager jnp ops would
        # compile a fresh executable per length (tunnel compile storms)
        T1 = m.kf_pose[kf_id]
        T2 = m.kf_pose[cand]
        p1_cam = lie.np_se3_apply(T1, m.lm_pos[lm1])
        p2_cam = lie.np_se3_apply(T2, m.lm_pos[lm2])
        uv1 = m.kf_uv[kf_id, f1]
        uv2 = m.kf_uv[cand, f2]
        s2_1 = (1.2 ** (2 * m.kf_octave[kf_id, f1])).astype(np.float32)
        s2_2 = (1.2 ** (2 * m.kf_octave[cand, f2])).astype(np.float32)

        P = f1.size
        cap = _pair_tier(P)
        (pp1, pp2, pu1, pu2, ps1, ps2), vm = _pad_pairs(
            cap, p1_cam, p2_cam, uv1, uv2, s2_1, s2_2)
        self._key, sub = jax.random.split(self._key)
        res = sim3_opt.sim3_ransac(
            jnp.asarray(pp1), jnp.asarray(pp2), jnp.asarray(pu1), jnp.asarray(pu2),
            jnp.asarray(ps1), jnp.asarray(ps2), jnp.asarray(vm), self.cam,
            sub, n_hypotheses=512, fix_scale=self.fix_scale,
        )
        # dispatch the refinement BEFORE gating on the RANSAC count: both
        # fetches then batch into single round trips instead of four
        # sequential ~26 ms RTs per candidate (r5 tunnel probe)
        S12, inl, n = sim3_opt.optimize_sim3(
            res.S12, jnp.asarray(pp1), jnp.asarray(pp2), jnp.asarray(pu1),
            jnp.asarray(pu2), jnp.asarray(1.0 / ps1), jnp.asarray(1.0 / ps2),
            res.inliers & jnp.asarray(vm), self.cam, fix_scale=self.fix_scale,
        )
        n_ransac, n_opt, inl_h, S12_h = jax.device_get(
            (res.n_inliers, n, inl, S12))
        if int(n_ransac) < 20 or int(n_opt) < 25:
            return None
        n = int(n_opt)
        inl_np = np.asarray(inl_h)[:P]

        # SearchBySim3 escalation (reference ORBmatcher::SearchBySim3 →
        # second OptimizeSim3, LoopClosing.cc:700-780 ladder): project the
        # candidate neighborhood's landmarks into the current keyframe
        # through the estimated Sim3 to grow the correspondence set, then
        # refine once more with everything
        S12_np = np.asarray(S12_h, np.float32)
        ext = self._guided_sim3_matches(kf_id, cand, S12_np,
                                        exclude_f1=f1[inl_np])
        if ext is not None:
            g_f1, g_f2, g_lm1, g_lm2 = ext
            a_f1 = np.concatenate([f1[inl_np], g_f1])
            a_f2 = np.concatenate([f2[inl_np], g_f2])
            a_lm1 = np.concatenate([lm1[inl_np], g_lm1])
            a_lm2 = np.concatenate([lm2[inl_np], g_lm2])
            P2 = len(a_f1)
            p1c = lie.np_se3_apply(T1, m.lm_pos[a_lm1])
            p2c = lie.np_se3_apply(T2, m.lm_pos[a_lm2])
            w1 = (1.2 ** (2 * m.kf_octave[kf_id, a_f1])).astype(np.float32)
            w2 = (1.2 ** (2 * m.kf_octave[cand, a_f2])).astype(np.float32)
            cap2 = _pair_tier(P2)
            (qp1, qp2, qu1, qu2, qw1, qw2), vm2 = _pad_pairs(
                cap2, p1c, p2c, m.kf_uv[kf_id, a_f1], m.kf_uv[cand, a_f2],
                w1, w2)
            S12b, inl2, n2 = sim3_opt.optimize_sim3(
                jnp.asarray(S12_np), jnp.asarray(qp1), jnp.asarray(qp2),
                jnp.asarray(qu1), jnp.asarray(qu2),
                jnp.asarray(1.0 / qw1), jnp.asarray(1.0 / qw2),
                jnp.asarray(vm2), self.cam, fix_scale=self.fix_scale,
            )
            S12b_np, inl2_h, n2 = jax.device_get((S12b, inl2, n2))
            if int(n2) >= n:
                S12b_np = np.asarray(S12b_np, np.float32)
                if not self._verify_with_neighbors(kf_id, cand, S12b_np):
                    return None
                inl2_np = np.asarray(inl2_h)[:P2]
                self._pending_fusion = (a_lm1[inl2_np], a_lm2[inl2_np])
                return LoopEvent(kf_cur=kf_id, kf_matched=cand,
                                 n_inliers=int(n2), S12=S12b_np)

        if not self._verify_with_neighbors(kf_id, cand, S12_np):
            return None
        # landmark fusion pairs: current landmark → matched (older) landmark
        self._pending_fusion = (lm1[inl_np], lm2[inl_np])
        return LoopEvent(kf_cur=kf_id, kf_matched=cand, n_inliers=int(n), S12=S12_np)

    def _verify_with_neighbors(self, kf_id: int, cand: int, S12: np.ndarray,
                               min_matches: int = 25,
                               need_pass: int = 1) -> bool:
        """Multi-keyframe geometric verification (reference
        ``DetectCommonRegionsFromBoW`` projects the hypothesis into extra
        covisible keyframes and demands nNumProjMatches on each before a
        loop is accepted, LoopClosing.cc:843-897). A perceptually-aliased
        match (symmetric structure seen from a different place) fits ONE
        view but not the neighborhood — this gate killed wrong loops that
        warped the bench map by tens of meters."""
        m = self.map
        neighbors = [int(k) for k in m.best_covisible(kf_id, 3, min_weight=1)
                     if int(k) != cand][:2]
        if not neighbors:
            return True   # nothing to check against (tiny map)
        T_cur_inv = lie.np_se3_inv(m.kf_pose[kf_id])
        passed = 0
        for nk in neighbors:
            # hypothesis pose of neighbor nk in the candidate's world:
            # S_nk_w = sim3(T_nk_cur) ∘ S12 ∘ sim3(T_cand_w)
            T_nk_cur = lie.np_se3_mul(m.kf_pose[nk], T_cur_inv)
            S_nk_w = lie.np_sim3_mul(
                lie.np_sim3_from_se3(T_nk_cur),
                lie.np_sim3_mul(S12, lie.np_sim3_from_se3(m.kf_pose[cand])))
            if self._count_loop_matches(nk, cand, S_nk_w) >= min_matches:
                passed += 1
                if passed >= need_pass:
                    return True
        return False

    def _count_loop_matches(self, kf: int, cand: int, S_kw: np.ndarray,
                            radius: float = 7.5) -> int:
        """Project the candidate neighborhood's landmarks through the
        hypothesis Sim3 into keyframe ``kf`` and count windowed descriptor
        matches (the counting half of SearchByProjection)."""
        m = self.map
        loop_kfs = [cand] + [int(k) for k in m.best_covisible(cand, 10,
                                                              min_weight=1)]
        tbl = m.kf_lm_idx[np.asarray(loop_kfs)]
        lms = np.unique(tbl[tbl >= 0])
        lms = lms[m.lm_valid[lms]]
        if lms.size == 0:
            return 0
        cap = m.n_features
        lms = lms[:cap]
        nl = lms.size
        P = np.zeros((cap, 3), np.float32)
        Pdesc = np.zeros((cap, 8), np.uint32)
        Pvalid = np.zeros(cap, bool)
        P[:nl] = m.lm_pos[lms]
        Pdesc[:nl] = m.lm_desc[lms]
        Pvalid[:nl] = True
        pc = lie.np_sim3_apply(S_kw, P)
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = self.cam.fx * pc[:, 0] / z + self.cam.cx
            v = self.cam.fy * pc[:, 1] / z + self.cam.cy
        ok = Pvalid & (z > 0.1)
        ok &= np.nan_to_num((u >= 0) & (u < self.cam.width)
                            & (v >= 0) & (v < self.cam.height), nan=False)
        idx, _ = matching.windowed_projection_match(
            jnp.asarray(np.stack([np.nan_to_num(u), np.nan_to_num(v)], 1
                                 ).astype(np.float32)),
            jnp.asarray(ok), jnp.asarray(Pdesc), jnp.zeros(cap, jnp.int32),
            jnp.asarray(m.kf_uv[kf]), jnp.asarray(m.kf_feat_valid[kf]),
            jnp.asarray(m.kf_desc[kf]), jnp.zeros(m.n_features, jnp.int32),
            jnp.asarray(np.full(cap, radius, np.float32)), th=matching.TH_HIGH,
        )
        return int((np.asarray(idx) >= 0).sum())

    def _guided_sim3_matches(self, kf_id: int, cand: int, S12: np.ndarray,
                             exclude_f1: np.ndarray, radius: float = 7.5):
        """Sim3-guided projection matching: candidate-side landmarks
        (2-hop neighborhood) projected into the current keyframe through
        ``S12 · T2w``; windowed descriptor match against features not yet
        in the correspondence set."""
        m = self.map
        loop_kfs = [cand] + [int(k) for k in m.best_covisible(cand, 10, min_weight=1)]
        tbl = m.kf_lm_idx[np.asarray(loop_kfs)]
        lms = np.unique(tbl[tbl >= 0])
        lms = lms[m.lm_valid[lms]]
        if lms.size == 0:
            return None
        cap = m.n_features
        lms = lms[:cap]
        n = lms.size
        P = np.zeros((cap, 3), np.float32)
        Pdesc = np.zeros((cap, 8), np.uint32)
        Pvalid = np.zeros(cap, bool)
        P[:n] = m.lm_pos[lms]
        Pdesc[:n] = m.lm_desc[lms]
        Pvalid[:n] = True
        # project through the loop Sim3: x1 = S12 · T2w · X (numpy — the
        # eager-jnp version compiled a fresh op family mid-run)
        S_1w = lie.np_sim3_mul(np.asarray(S12, np.float32),
                               lie.np_sim3_from_se3(m.kf_pose[cand]))
        pc = lie.np_sim3_apply(S_1w, P)
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = self.cam.fx * pc[:, 0] / z + self.cam.cx
            v = self.cam.fy * pc[:, 1] / z + self.cam.cy
        ok = Pvalid & (z > 0.1)
        ok &= np.nan_to_num((u >= 0) & (u < self.cam.width)
                            & (v >= 0) & (v < self.cam.height), nan=False)
        kp_valid = (m.kf_lm_idx[kf_id] >= 0) & m.kf_feat_valid[kf_id]
        kp_valid[exclude_f1] = False
        idx, dist = matching.windowed_projection_match(
            jnp.asarray(np.stack([np.nan_to_num(u), np.nan_to_num(v)], 1).astype(np.float32)),
            jnp.asarray(ok), jnp.asarray(Pdesc), jnp.zeros(cap, jnp.int32),
            jnp.asarray(m.kf_uv[kf_id]), jnp.asarray(kp_valid),
            jnp.asarray(m.kf_desc[kf_id]), jnp.zeros(m.n_features, jnp.int32),
            jnp.asarray(np.full(cap, radius, np.float32)), th=matching.TH_HIGH,
        )
        idx = np.asarray(idx)
        dist = np.asarray(dist)
        hit = np.nonzero(idx >= 0)[0]
        if hit.size == 0:
            return None
        order = hit[np.argsort(dist[hit], kind="stable")]
        feats_of = idx[order]
        first = np.unique(feats_of, return_index=True)[1]
        win_p, win_f = order[first], feats_of[first]
        g_lm2 = lms[win_p]
        g_f1 = win_f
        g_lm1 = m.kf_lm_idx[kf_id, g_f1]
        sel = (g_lm1 >= 0) & (g_lm1 != g_lm2)
        if not sel.any():
            return None
        g_f1, g_lm1, g_lm2 = g_f1[sel], g_lm1[sel], g_lm2[sel]
        # feature index of lm2 in the candidate keyframe (for uv/octave)
        pos_in_cand = np.full(m.capacity_lm, -1, np.int32)
        row = m.kf_lm_idx[cand]
        pos_in_cand[row[row >= 0]] = np.nonzero(row >= 0)[0]
        g_f2 = pos_in_cand[g_lm2]
        sel2 = g_f2 >= 0
        return g_f1[sel2], g_f2[sel2], g_lm1[sel2], g_lm2[sel2]

    # ------------------------------------------------------------------
    def _search_and_fuse(self, ev: LoopEvent):
        """Reference ``SearchAndFuse`` (LoopClosing.cc:2115) preceded by
        the Sim3 propagation of the current covisible window
        (LoopClosing.cc:1115-1177): project the loop-side (matched
        neighborhood) landmarks into the current keyframe's covisible
        window THROUGH THE LOOP-CORRECTED poses and Replace duplicates /
        add missed observations. The corrected poses are used only for
        projection here — the pose graph writes the final geometry."""
        from orb_slam3_rgbl_tpu.ops import matching as _matching

        m = self.map
        window = [int(k) for k in m.best_covisible(ev.kf_cur, 30, min_weight=1)]
        window = [ev.kf_cur] + [k for k in window if k != ev.kf_cur]
        # corrected Sim3 world→cam of the current KF: S_cw = S12 · T_mw
        # (numpy twins — eager jnp here compiled mid-run on the tunnel)
        S_cw = lie.np_sim3_mul(ev.S12.astype(np.float32),
                               lie.np_sim3_from_se3(m.kf_pose[ev.kf_matched]))
        T_cur_inv = lie.np_se3_inv(m.kf_pose[ev.kf_cur])

        # loop-side landmarks: matched KF's 2-hop neighborhood
        loop_kfs = [ev.kf_matched] + [
            int(k) for k in m.best_covisible(ev.kf_matched, 15, min_weight=1)]
        tbl = m.kf_lm_idx[np.asarray(loop_kfs)]
        loop_lms = np.unique(tbl[tbl >= 0])
        loop_lms = loop_lms[m.lm_valid[loop_lms]]
        if loop_lms.size == 0:
            return
        cap = 2 * m.n_features
        loop_lms = loop_lms[:cap]
        n = loop_lms.size
        P = np.zeros((cap, 3), np.float32)
        Pdesc = np.zeros((cap, 8), np.uint32)
        Pvalid = np.zeros(cap, bool)
        P[:n] = m.lm_pos[loop_lms]
        Pdesc[:n] = m.lm_desc[loop_lms]
        Pvalid[:n] = True

        counts = m.observation_counts()
        remap = np.arange(m.capacity_lm, dtype=np.int32)
        for k in window[:12]:
            # corrected pose of window KF k: S_kw = (T_kc as Sim3) · S_cw
            T_kc = lie.np_se3_mul(m.kf_pose[k], T_cur_inv)
            S_kw = lie.np_sim3_mul(lie.np_sim3_from_se3(T_kc), S_cw)
            pc = lie.np_sim3_apply(S_kw, P)
            z = pc[:, 2]
            with np.errstate(divide="ignore", invalid="ignore"):
                u = self.cam.fx * pc[:, 0] / z + self.cam.cx
                v = self.cam.fy * pc[:, 1] / z + self.cam.cy
            ok = Pvalid & (z > 0.1)
            ok &= np.nan_to_num((u >= 0) & (u < self.cam.width)
                                & (v >= 0) & (v < self.cam.height), nan=False)
            proj_uv = np.stack([np.nan_to_num(u), np.nan_to_num(v)], 1).astype(np.float32)
            radius = np.full(cap, 4.0, np.float32)
            idx, d = _matching.windowed_projection_match(
                jnp.asarray(proj_uv), jnp.asarray(ok), jnp.asarray(Pdesc),
                jnp.zeros(cap, jnp.int32), jnp.asarray(m.kf_uv[k]),
                jnp.asarray(m.kf_feat_valid[k]), jnp.asarray(m.kf_desc[k]),
                jnp.zeros(m.n_features, jnp.int32), jnp.asarray(radius),
                th=_matching.TH_LOW,
            )
            idx = np.asarray(idx)
            d = np.asarray(d)
            hit = np.nonzero(idx >= 0)[0]
            if hit.size == 0:
                continue
            order = hit[np.argsort(d[hit], kind="stable")]
            feats_of = idx[order]
            first = np.unique(feats_of, return_index=True)[1]
            win_p, win_f = order[first], feats_of[first]
            src = loop_lms[win_p]
            tgt = m.kf_lm_idx[k, win_f]
            # a landmark already bound at another slot of this keyframe
            # must not bind twice (reference Fuse: MapPoint::IsInKeyFrame)
            row = m.kf_lm_idx[k]
            present = np.zeros(m.capacity_lm, bool)
            present[row[row >= 0]] = True
            free = (tgt < 0) & ~present[src]
            m.kf_lm_idx[k, win_f[free]] = src[free]
            dup = (tgt >= 0) & (tgt != src)
            if dup.any():
                a, b = src[dup], tgt[dup]
                # the LOOP-side landmark always wins (reference
                # SearchAndFuse: current MapPoints are Replaced BY the
                # loop points unconditionally, LoopClosing.cc:2115+ —
                # the old side's geometry is the trusted one; keeping a
                # more-observed current point would anchor the seam to
                # the drifted position)
                fresh = a != b
                remap[b[fresh]] = a[fresh]
        changed = np.nonzero(remap != np.arange(m.capacity_lm, dtype=np.int32))[0]
        if changed.size:
            for _ in range(4):
                nxt = remap[remap]
                if np.array_equal(nxt, remap):
                    break
                remap = nxt
            bound = m.kf_lm_idx >= 0
            m.kf_lm_idx[bound] = remap[m.kf_lm_idx[bound]]
            losers = np.nonzero(remap != np.arange(m.capacity_lm, dtype=np.int32))[0]
            winners = remap[losers]
            np.add.at(m.lm_found, winners, m.lm_found[losers])
            np.add.at(m.lm_visible, winners, m.lm_visible[losers])
            with m.alloc_lock:
                m.lm_valid[losers] = False
                m.lm_gen[losers] += 1
                m.lm_free.extend(int(i) for i in losers)
        # restore the one-observation-per-(KF, landmark) invariant after
        # every fusion pass (Replace collisions can alias two slots)
        from orb_slam3_rgbl_tpu.slam.map_state import dedup_kf_bindings

        dedup_kf_bindings(m)

    def _essential_edges(self, valid, slot, ev: LoopEvent):
        """Essential-graph edge set (reference ``OptimizeEssentialGraph``
        Optimizer.cc:1501+): sequential spanning chain + covisibility
        edges weight ≥ 100 + ALL accumulated loop/merge edges + the new
        loop constraint. Sij for structural edges are batched (one
        vectorized Sim3 composition, no per-edge dispatch)."""
        m = self.map
        K = valid.size
        ei = list(range(1, K))
        ej = list(range(0, K - 1))
        w = [1.0] * (K - 1)
        # covisibility edges ≥ 100 shared observations
        vk, W = m.covisibility_matrix()
        hi, hj = np.nonzero(np.triu(W >= 100, k=1))
        adjacent = np.abs(hi - hj) <= 1   # chain already covers these
        hi, hj = hi[~adjacent], hj[~adjacent]
        ei += hi.tolist()
        ej += hj.tolist()
        w += [1.0] * len(hi)
        # structural edges measure the CURRENT relative geometry — batch
        nodes = np.concatenate([m.kf_pose[valid], np.ones((K, 1), np.float32)], 1)
        Si = nodes[np.asarray(ei, np.int64)]
        Sj = nodes[np.asarray(ej, np.int64)]
        Sij = lie.np_sim3_mul(Si, lie.np_sim3_inv(Sj))
        ei, ej, w, Sij = list(ei), list(ej), list(w), [r for r in Sij]
        # accumulated loop/merge edges keep their MEASURED constraints
        for (a, b, Sab, wt) in self.extra_edges:
            if m.kf_valid[a] and m.kf_valid[b] and int(a) in slot and int(b) in slot:
                ei.append(slot[int(a)]); ej.append(slot[int(b)])
                Sij.append(np.asarray(Sab, np.float32)); w.append(wt)
        # the new loop edge: S_cur←matched = S12
        ei.append(slot[ev.kf_cur]); ej.append(slot[ev.kf_matched]); w.append(10.0)
        Sij.append(ev.S12.astype(np.float32))
        return ei, ej, Sij, w

    def _correct_loop(self, ev: LoopEvent, run_pose_graph: bool = True):
        """Reference ``CorrectLoop`` (LoopClosing.cc:969-1214): fuse the
        loop-side landmarks into the Sim3-corrected covisible window,
        optimize the essential graph over the full accumulated edge set,
        re-anchor landmarks, record the constraint for future graphs."""
        m = self.map
        # duplicate fusion FIRST (in the corrected frame), so the pose
        # graph benefits from the strengthened covisibility
        self._search_and_fuse(ev)

        valid = m.valid_kf_ids()
        K = valid.size
        slot = {int(k): i for i, k in enumerate(valid)}
        nodes = np.concatenate(
            [m.kf_pose[valid], np.ones((K, 1), np.float32)], axis=1
        )
        old_nodes = nodes.copy()
        ei, ej, Sij, w = self._essential_edges(valid, slot, ev)

        # pad nodes/edges to power-of-two tiers: every loop event would
        # otherwise compile a fresh pose-graph program (SURVEY §7
        # recompile-tier mitigation, same as ba_assembly)
        from orb_slam3_rgbl_tpu.slam.ba_assembly import _tier

        Kp = _tier(K, self.pg_tiers[0])
        Ep = _tier(len(ei), self.pg_tiers[1])
        nodes_p = np.tile(np.array([1, 0, 0, 0, 0, 0, 0, 1], np.float32), (Kp, 1))
        nodes_p[:K] = nodes
        E = len(ei)
        ei_p = np.zeros(Ep, np.int32)
        ej_p = np.zeros(Ep, np.int32)
        ei_p[:E] = ei
        ej_p[:E] = ej
        Sij_p = np.tile(np.array([1, 0, 0, 0, 0, 0, 0, 1], np.float32), (Ep, 1))
        Sij_p[:E] = np.stack(Sij)
        w_p = np.zeros(Ep, np.float32)
        w_p[:E] = w

        problem = pose_graph.PoseGraphProblem(
            nodes=jnp.asarray(nodes_p),
            node_fixed=jnp.asarray(np.arange(Kp) == slot[ev.kf_matched]),
            node_valid=jnp.asarray(np.arange(Kp) < K),
            edge_i=jnp.asarray(ei_p),
            edge_j=jnp.asarray(ej_p),
            edge_Sij=jnp.asarray(Sij_p),
            edge_weight=jnp.asarray(w_p),
            edge_valid=jnp.asarray(np.arange(Ep) < E),
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

        new_nodes = np.asarray(new_nodes)[:K]
        # last line of defense: never write a diverged f32 solve into the
        # map (the pose graph is damped + accept/reject, but a correction
        # can only ever move poses by ~the loop drift, not orders of
        # magnitude — reject wholesale and keep the detected edge)
        drift_bound = 10.0 * (1.0 + np.abs(old_nodes[:, 4:7]).max())
        if (not np.isfinite(new_nodes).all()
                or np.abs(new_nodes[:, 4:7] - old_nodes[:, 4:7]).max() > drift_bound):
            from orb_slam3_rgbl_tpu.utils.logging import log

            log("loop correction REJECTED: pose-graph result out of bounds")
            new_nodes = old_nodes
        # landmark correction via reference keyframes: X ← S_ref_new⁻¹ · S_ref_old · X
        lm_ids = np.nonzero(m.lm_valid)[0]
        ref = m.lm_ref_kf[lm_ids]
        # a landmark whose reference KF was culled re-anchors through the
        # cull-redirect chain to a surviving observer (slot-0 fallback
        # would correct it with an unrelated keyframe's transform)
        ref_slot = np.array([slot.get(m.live_ref_kf(int(r)), 0) for r in ref],
                            np.int64)
        S_old = old_nodes[ref_slot]
        S_new = new_nodes[ref_slot]
        X_corr = lie.np_sim3_apply(lie.np_sim3_inv(S_new),
                                   lie.np_sim3_apply(S_old, m.lm_pos[lm_ids]))
        m.lm_pos[lm_ids] = X_corr

        # pose writeback (drop scale into SE3 as the reference does)
        m.kf_pose[valid] = lie.np_sim3_to_se3(new_nodes)

        # fuse loop duplicate landmarks (current ones replaced by matched)
        if getattr(self, "_pending_fusion", None) is not None:
            cur_lms, old_lms = self._pending_fusion
            self._fuse(cur_lms, old_lms)
            self._pending_fusion = None
        # the constraint joins every future essential graph
        self.extra_edges.append(
            (int(ev.kf_cur), int(ev.kf_matched), ev.S12.astype(np.float32), 10.0))
        m.version += 1

        # global BA after the correction (reference launches the GBA
        # thread at LoopClosing.cc:1206 when the map holds < 200 KFs)
        if self.run_gba and m.n_kf < 200:
            if self.gba_dispatch is not None:
                self.gba_dispatch()
            else:
                self._global_ba()

    def _global_ba(self, iterations: int = 6, abort_event=None):
        out = self._global_ba_solve(iterations, abort_event)
        if out is not None:
            self._apply_gba(out)

    def _gba_assemble(self):
        """SNAPSHOT half of the global BA: assemble the whole-map problem
        from the live arrays. Must run on the thread that owns map
        mutations at that moment (the mapping worker / caller) — the
        reference pauses LocalMapping before GBA assembly; assembling on
        the transient GBA thread would read arrays mid-mutation."""
        from orb_slam3_rgbl_tpu.slam import ba_assembly
        from orb_slam3_rgbl_tpu.slam.frame import inv_scale_sigma2

        m = self.map
        inv_s2 = np.asarray(inv_scale_sigma2(self.cfg.orb.n_levels, self.cfg.orb.scale_factor))
        problem, window, lm_ids, obs_kf, obs_feat = ba_assembly.build_full_problem(
            m, inv_s2, min_pose_tier=self.gba_tiers[0],
            min_lm_tier=self.gba_tiers[1],
        )
        pose_before = m.kf_pose.copy()       # staging (mTcwBefGBA analog)
        lm_gen_before = m.lm_gen[lm_ids].copy()
        return (problem, window, lm_ids, pose_before, lm_gen_before)

    def _gba_iterate(self, snapshot, iterations: int = 6, abort_event=None,
                     chunk: int = 2):
        """Solve half: LM iterations on the frozen snapshot in abortable
        chunks (the reference GBA thread polls ``mbStopGBA`` between g2o
        iterations, LoopClosing.cc:2268-2330). Touches no live map state —
        safe on the transient GBA thread. Returns None if aborted."""
        from orb_slam3_rgbl_tpu.optim import global_ba

        problem, window, lm_ids, pose_before, lm_gen_before = snapshot
        poses, lms = problem.poses, problem.landmarks
        res = None
        it = 0
        while it < iterations:
            if abort_event is not None and abort_event.is_set():
                return None
            n = min(chunk, iterations - it)
            res = global_ba.global_bundle_adjust(
                problem._replace(poses=poses, landmarks=lms), self.cam,
                iterations=n, cg_iters=64)
            poses, lms = res.poses, res.landmarks
            it += n
        return (window, lm_ids, res, pose_before, lm_gen_before)

    def _global_ba_solve(self, iterations: int = 6, abort_event=None,
                         chunk: int = 2):
        """Assembly + solve on the calling thread (synchronous path)."""
        return self._gba_iterate(self._gba_assemble(), iterations,
                                 abort_event, chunk)

    def _apply_gba(self, out):
        """Staged GBA writeback + correction propagation (reference
        ``RunGlobalBundleAdjustment`` tail, LoopClosing.cc:2337-2440):
        keyframes/landmarks created while the solve ran are corrected
        through their anchor keyframe (spanning-tree-child propagation
        analog); landmarks culled+recycled mid-solve are left alone
        (generation check)."""
        window, lm_ids, res, pose_before, lm_gen_before = out
        m = self.map
        new_poses, new_lms = jax.device_get((res.poses, res.landmarks))
        new_poses = np.asarray(new_poses, np.float32)[: len(window)]
        new_lms = np.asarray(new_lms, np.float32)[: len(lm_ids)]
        # reject a diverged solve wholesale (guards exist inside the
        # solver; this is the final writeback gate)
        bound = 10.0 * (1.0 + np.abs(pose_before[window][:, 4:7]).max())
        if (not np.isfinite(new_poses).all() or not np.isfinite(new_lms).all()
                or np.abs(new_poses[:, 4:7] - pose_before[window][:, 4:7]).max() > bound):
            from orb_slam3_rgbl_tpu.utils.logging import log

            log("GBA result REJECTED: out of bounds")
            return
        in_window = np.zeros(m.capacity_kf, bool)
        in_window[window] = True
        in_solve = np.zeros(m.capacity_lm, bool)
        still = m.lm_gen[lm_ids] == lm_gen_before
        in_solve[lm_ids[still]] = True

        before_all = m.kf_pose.copy()
        fresh_kfs = [int(k) for k in m.valid_kf_ids() if not in_window[k]]
        m.kf_pose[window] = new_poses
        ok = still & m.lm_valid[lm_ids]
        m.lm_pos[lm_ids[ok]] = new_lms[ok]

        # keyframes created during the solve: T_k ← (T_k ∘ T_a⁻¹) ∘ T_a'
        # with anchor a = the most covisible solved keyframe
        for k in fresh_kfs:
            w = m.covisibility_weights(k)
            w[~in_window] = 0
            anchor = int(np.argmax(w))
            if w[anchor] == 0:
                anchor = int(window[-1])
            T_rel = lie.np_se3_mul(before_all[k], lie.np_se3_inv(before_all[anchor]))
            m.kf_pose[k] = lie.np_se3_mul(T_rel, m.kf_pose[anchor])

        # landmarks created during the solve: re-anchor through their
        # reference keyframe's before/after poses
        fresh_lm = np.nonzero(m.lm_valid & ~in_solve)[0]
        if fresh_lm.size:
            ref = np.asarray([m.live_ref_kf(int(r)) for r in m.lm_ref_kf[fresh_lm]],
                             np.int64)
            Xc = lie.np_se3_apply(before_all[ref], m.lm_pos[fresh_lm])
            m.lm_pos[fresh_lm] = lie.np_se3_apply(
                lie.np_se3_inv(m.kf_pose[ref]), Xc)
        m.version += 1

    def _fuse(self, cur_lms: np.ndarray, old_lms: np.ndarray):
        """Replace each current-side landmark with its loop-matched older
        twin in every binding (``MapPoint::Replace`` semantics)."""
        m = self.map
        remap = np.arange(m.capacity_lm, dtype=np.int32)
        keep = cur_lms != old_lms
        remap[cur_lms[keep]] = old_lms[keep]
        bound = m.kf_lm_idx >= 0
        m.kf_lm_idx[bound] = remap[m.kf_lm_idx[bound]]
        losers = np.unique(cur_lms[keep])
        with m.alloc_lock:
            m.lm_valid[losers] = False
            m.lm_gen[losers] += 1
            m.lm_free.extend(int(i) for i in losers)
        from orb_slam3_rgbl_tpu.slam.map_state import dedup_kf_bindings

        dedup_kf_bindings(m)
