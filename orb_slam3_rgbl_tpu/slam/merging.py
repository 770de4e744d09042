"""Multi-map merging — the Atlas weld (reference ``LoopClosing::MergeLocal``,
``LoopClosing.cc:1215-1782``).

When tracking is lost hard, the active map is archived and a fresh map
starts at an arbitrary origin (``Tracking::CreateMapInAtlas``). Later,
when a new keyframe of the active map recognizes a place held by an
archived map (``NewDetectCommonRegions`` merge branch,
``LoopClosing.cc:324-533``), the two maps are welded: a Sim3 between the
matched keyframes anchors a similarity ``S_w2←w1`` between the two world
frames, the whole active map is transported into the archived map's
frame, keyframe/landmark arrays are concatenated, duplicate landmarks
from the verified match are fused (``MapPoint::Replace`` semantics), and
a weld-window bundle adjustment polishes the seam
(``LoopClosing.cc:1623-1627``).

TPU-native shape: instead of walking a pointer graph and re-parenting a
spanning tree, the weld is three dense array ops — a batched Sim3
transform of poses/landmarks, a block copy with two index remaps
(keyframe ids, landmark ids), and one fused local BA. The archived map's
world frame survives (the reference also keeps the matched map's frame
and kills the current one).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import SlamConfig
from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.ops import matching
from orb_slam3_rgbl_tpu.optim import sim3 as sim3_opt
from orb_slam3_rgbl_tpu.slam.map_state import MapState, INVALID


@dataclasses.dataclass
class MergeEvent:
    kf_cur: int            # keyframe id in the ACTIVE map
    kf_matched: int        # keyframe id in the ARCHIVED map
    entry_idx: int         # atlas index of the archived map
    n_inliers: int
    S12: np.ndarray        # Sim3 c_cur ← c_matched
    fusion: Tuple[np.ndarray, np.ndarray]  # (active lm ids, archived lm ids)


@dataclasses.dataclass
class MergeResult:
    map: MapState          # the welded map (archived map's arrays, extended)
    kf_remap: np.ndarray   # (active.capacity_kf,) old-active kf id → merged id
    lm_remap: np.ndarray   # (active.capacity_lm + 1,) active lm id → merged id
    S_w2_w1: np.ndarray    # Sim3 archived-world ← active-world
    kf_cur_new: int        # merged id of the event's current keyframe
    appended_kfs: np.ndarray  # merged ids of all transported keyframes


# ---------------------------------------------------------------------------
def verify_cross_map(
    cfg: SlamConfig,
    m1: MapState, kf1: int,
    m2: MapState, kf2: int,
    key: jax.Array,
    fix_scale: bool,
) -> Optional[Tuple[np.ndarray, int, Tuple[np.ndarray, np.ndarray]]]:
    """Geometric verification of a cross-map place-recognition candidate:
    descriptor match on landmark-bound features → Sim3 RANSAC → GN
    refinement (same ladder as the in-map loop verification,
    ``DetectCommonRegionsFromBoW`` LoopClosing.cc:578-897). Returns
    (S12 = Sim3 c1←c2, n_inliers, (lm1, lm2) fusion pairs) or None."""
    cam = cfg.camera
    b1 = m1.kf_lm_idx[kf1] >= 0
    b2 = m2.kf_lm_idx[kf2] >= 0
    if b1.sum() < 20 or b2.sum() < 20:
        return None
    d = matching.distance_table(
        jnp.asarray(m1.kf_desc[kf1]), jnp.asarray(m2.kf_desc[kf2]),
        jnp.asarray(b1), jnp.asarray(b2),
    )
    idx, _ = matching.mutual_best_match(d, th=matching.TH_LOW, ratio=0.75,
                                        check_rotation=False)
    idx = np.asarray(idx)
    f1 = np.nonzero(idx >= 0)[0]
    if f1.size < 20:
        return None
    f2 = idx[f1]
    lm1 = m1.kf_lm_idx[kf1, f1]
    lm2 = m2.kf_lm_idx[kf2, f2]
    ok = m1.lm_valid[lm1] & m2.lm_valid[lm2]
    f1, f2, lm1, lm2 = f1[ok], f2[ok], lm1[ok], lm2[ok]
    if f1.size < 20:
        return None

    # numpy: match counts vary per candidate (eager-jnp shape churn)
    p1_cam = lie.np_se3_apply(m1.kf_pose[kf1], m1.lm_pos[lm1])
    p2_cam = lie.np_se3_apply(m2.kf_pose[kf2], m2.lm_pos[lm2])
    uv1 = m1.kf_uv[kf1, f1]
    uv2 = m2.kf_uv[kf2, f2]
    s2_1 = (cfg.orb.scale_factor ** (2 * m1.kf_octave[kf1, f1])).astype(np.float32)
    s2_2 = (cfg.orb.scale_factor ** (2 * m2.kf_octave[kf2, f2])).astype(np.float32)

    # pad to a fixed tier — match counts vary per candidate and unpadded
    # shapes would compile a fresh Sim3 executable per call
    from orb_slam3_rgbl_tpu.slam.loop_closing import _pad_pairs, _pair_tier

    P = f1.size
    cap = _pair_tier(P)
    (pp1, pp2, pu1, pu2, ps1, ps2), vm = _pad_pairs(
        cap, p1_cam, p2_cam, uv1, uv2, s2_1, s2_2)
    res = sim3_opt.sim3_ransac(
        jnp.asarray(pp1), jnp.asarray(pp2), jnp.asarray(pu1), jnp.asarray(pu2),
        jnp.asarray(ps1), jnp.asarray(ps2), jnp.asarray(vm), cam,
        key, n_hypotheses=512, fix_scale=fix_scale,
    )
    if int(res.n_inliers) < 20:
        return None
    S12, inl, n = sim3_opt.optimize_sim3(
        res.S12, jnp.asarray(pp1), jnp.asarray(pp2), jnp.asarray(pu1),
        jnp.asarray(pu2), jnp.asarray(1.0 / ps1), jnp.asarray(1.0 / ps2),
        res.inliers & jnp.asarray(vm), cam, fix_scale=fix_scale,
    )
    if int(n) < 25:
        return None
    inl_np = np.asarray(inl)[:P]
    return np.asarray(S12), int(n), (lm1[inl_np], lm2[inl_np])


# ---------------------------------------------------------------------------
def world_alignment(S12: np.ndarray, T_c1_w1: np.ndarray, T_c2_w2: np.ndarray) -> np.ndarray:
    """Sim3 ``S_w2←w1`` aligning the active world frame (w1) to the
    archived one (w2), from the camera-frame loop constraint
    ``X_c1 = S12 · X_c2``:  S_c1_w2 = S12 ∘ T_c2_w2, and
    S_w2_w1 = S_c1_w2⁻¹ ∘ T_c1_w1."""
    S_c1_w2 = lie.sim3_mul(jnp.asarray(S12), lie.sim3_from_se3(jnp.asarray(T_c2_w2)))
    S_w2_w1 = lie.sim3_mul(lie.sim3_inv(S_c1_w2), lie.sim3_from_se3(jnp.asarray(T_c1_w1)))
    return np.asarray(S_w2_w1, np.float32)


def _grow_map(m: MapState, need_kf: int, need_lm: int) -> MapState:
    """Capacity-pool growth (SURVEY §7 'capacity doubling'): extend the
    struct-of-arrays in place with zero blocks so the weld fits."""
    def pad(a, n, fill=0):
        if n <= 0:
            return a
        block = np.full((n,) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, block], axis=0)

    gk = max(0, need_kf - m.capacity_kf)
    gl = max(0, need_lm - m.capacity_lm)
    if gk:
        m.kf_pose = pad(m.kf_pose, gk); m.kf_pose[-gk:, 0] = 1.0
        m.kf_valid = pad(m.kf_valid, gk)
        m.kf_timestamp = pad(m.kf_timestamp, gk)
        m.kf_frame_id = pad(m.kf_frame_id, gk)
        m.kf_uv = pad(m.kf_uv, gk)
        m.kf_octave = pad(m.kf_octave, gk)
        m.kf_desc = pad(m.kf_desc, gk)
        m.kf_depth = pad(m.kf_depth, gk, fill=-1.0)
        m.kf_ur = pad(m.kf_ur, gk, fill=-1.0)
        m.kf_feat_valid = pad(m.kf_feat_valid, gk)
        m.kf_lm_idx = pad(m.kf_lm_idx, gk, fill=INVALID)
        m.kf_angle = pad(m.kf_angle, gk)
        m.kf_vel = pad(m.kf_vel, gk)
        m.kf_bg = pad(m.kf_bg, gk)
        m.kf_ba = pad(m.kf_ba, gk)
        m.kf_prev_imu = pad(m.kf_prev_imu, gk, fill=INVALID)
    if gl:
        m.lm_pos = pad(m.lm_pos, gl)
        m.lm_valid = pad(m.lm_valid, gl)
        m.lm_desc = pad(m.lm_desc, gl)
        m.lm_normal = pad(m.lm_normal, gl)
        m.lm_max_dist = pad(m.lm_max_dist, gl)
        m.lm_min_dist = pad(m.lm_min_dist, gl)
        m.lm_ref_kf = pad(m.lm_ref_kf, gl, fill=INVALID)
        m.lm_first_kf = pad(m.lm_first_kf, gl, fill=INVALID)
        m.lm_visible = pad(m.lm_visible, gl)
        m.lm_found = pad(m.lm_found, gl)
        m.lm_gen = pad(m.lm_gen, gl)
    return m


def merge_maps(old: MapState, active: MapState, ev_kf_cur: int,
               S_w2_w1: np.ndarray) -> MergeResult:
    """Weld ``active`` into ``old`` (the archived map keeps its frame and
    ids — reference ``MergeLocal`` keeps the matched map). Pure array op:
    batched Sim3 transport + block copy + id remaps. Fusion of duplicate
    landmarks is applied afterwards by :func:`apply_fusion`."""
    S = jnp.asarray(S_w2_w1)
    S_w1_w2 = lie.sim3_inv(S)
    s = float(S_w2_w1[7])

    kfs = active.valid_kf_ids()
    lms = np.nonzero(active.lm_valid)[0]
    nK, nL = kfs.size, lms.size
    old = _grow_map(old, old.n_kf + nK, old.n_lm + nL)

    # --- transport poses: T_ck_w2 = se3(sim3(T_ck_w1) ∘ S_w1_w2) ---------
    # (numpy: the transported counts vary per weld — eager-jnp shape churn)
    S_w1_w2_np = np.asarray(S_w1_w2, np.float32)
    S_poses = lie.np_sim3_mul(lie.np_sim3_from_se3(active.kf_pose[kfs]),
                              S_w1_w2_np[None, :])
    new_poses = lie.np_sim3_to_se3(S_poses)
    # --- transport landmarks: X_w2 = S_w2_w1 · X_w1 ----------------------
    S_np = np.asarray(S_w2_w1, np.float32)
    new_lm_pos = lie.np_sim3_apply(S_np, active.lm_pos[lms])
    # normals rotate (unit length preserved); distance bands scale by s
    q = S_np[:4]
    new_normals = lie.np_quat_rotate(q[None, :], active.lm_normal[lms]).astype(np.float32)

    # --- id remaps --------------------------------------------------------
    kf_remap = np.full(active.capacity_kf, INVALID, np.int32)
    kf_remap[kfs] = old.n_kf + np.arange(nK, dtype=np.int32)
    lm_remap = np.full(active.capacity_lm + 1, INVALID, np.int32)
    lm_remap[lms] = old.n_lm + np.arange(nL, dtype=np.int32)

    new_kf_ids = kf_remap[kfs]
    new_lm_ids = lm_remap[lms]

    # --- block copy keyframes ----------------------------------------------
    old.kf_pose[new_kf_ids] = new_poses
    old.kf_valid[new_kf_ids] = True
    old.kf_timestamp[new_kf_ids] = active.kf_timestamp[kfs]
    old.kf_frame_id[new_kf_ids] = active.kf_frame_id[kfs]
    old.kf_uv[new_kf_ids] = active.kf_uv[kfs]
    old.kf_octave[new_kf_ids] = active.kf_octave[kfs]
    old.kf_desc[new_kf_ids] = active.kf_desc[kfs]
    # depth / pseudo-stereo are metric in w1; w2 units are s× w1 units
    # (X_w2 = s·R·X_w1 + t), so metric quantities transport as ·s
    d = active.kf_depth[kfs]
    old.kf_depth[new_kf_ids] = np.where(d > 0, d * s, d)
    ur = active.kf_ur[kfs]
    uu = active.kf_uv[kfs][..., 0]
    old.kf_ur[new_kf_ids] = np.where((ur >= 0) & (d > 0), uu - (uu - ur) / s, -1.0)
    old.kf_feat_valid[new_kf_ids] = active.kf_feat_valid[kfs]
    old.kf_angle[new_kf_ids] = active.kf_angle[kfs]
    tbl = active.kf_lm_idx[kfs]
    old.kf_lm_idx[new_kf_ids] = np.where(tbl >= 0, lm_remap[np.clip(tbl, 0, None)], INVALID)
    # inertial chain: velocities rotate + rescale into w2 units; the
    # preintegration dicts re-key through the id remap
    old.kf_vel[new_kf_ids] = s * lie.np_quat_rotate(
        q[None, :], active.kf_vel[kfs]).astype(np.float32)
    old.kf_bg[new_kf_ids] = active.kf_bg[kfs]
    old.kf_ba[new_kf_ids] = active.kf_ba[kfs]
    prev = active.kf_prev_imu[kfs]
    old.kf_prev_imu[new_kf_ids] = np.where(prev >= 0, kf_remap[np.clip(prev, 0, None)], INVALID)
    for k_old, k_new in zip(kfs, new_kf_ids):
        if int(k_old) in active.imu_preint:
            old.imu_preint[int(k_new)] = active.imu_preint[int(k_old)]
    old.imu_initialized = old.imu_initialized or active.imu_initialized

    # --- block copy landmarks ----------------------------------------------
    old.lm_pos[new_lm_ids] = new_lm_pos
    old.lm_valid[new_lm_ids] = True
    old.lm_desc[new_lm_ids] = active.lm_desc[lms]
    old.lm_normal[new_lm_ids] = new_normals
    old.lm_max_dist[new_lm_ids] = active.lm_max_dist[lms] * s
    old.lm_min_dist[new_lm_ids] = active.lm_min_dist[lms] * s
    old.lm_ref_kf[new_lm_ids] = kf_remap[np.clip(active.lm_ref_kf[lms], 0, None)]
    old.lm_first_kf[new_lm_ids] = kf_remap[np.clip(active.lm_first_kf[lms], 0, None)]
    old.lm_visible[new_lm_ids] = active.lm_visible[lms]
    old.lm_found[new_lm_ids] = active.lm_found[lms]

    old.n_kf += nK
    old.n_lm += nL
    old.version += 1
    return MergeResult(
        map=old, kf_remap=kf_remap, lm_remap=lm_remap,
        S_w2_w1=np.asarray(S_w2_w1, np.float32),
        kf_cur_new=int(kf_remap[ev_kf_cur]),
        appended_kfs=new_kf_ids,
    )


def apply_fusion(m: MapState, cur_lms: np.ndarray, old_lms: np.ndarray) -> np.ndarray:
    """Replace transported duplicates with their archived twins in every
    binding (``SearchAndFuse`` / ``MapPoint::Replace``). ``cur_lms`` are
    MERGED-map ids of the active-side landmarks. Returns the final
    landmark remap (capacity+1,) for rebinding external state."""
    remap = np.arange(m.capacity_lm + 1, dtype=np.int32)
    remap[-1] = INVALID
    keep = cur_lms != old_lms
    remap[cur_lms[keep]] = old_lms[keep]
    bound = m.kf_lm_idx >= 0
    m.kf_lm_idx[bound] = remap[m.kf_lm_idx[bound]]
    losers = np.unique(cur_lms[keep])
    m.lm_valid[losers] = False
    m.lm_gen[losers] += 1
    m.lm_free.extend(int(i) for i in losers)
    m.version += 1
    return remap
