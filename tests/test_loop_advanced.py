"""Reference-grade loop correction (round 3):

* temporal-consistency gate — one-shot false retrieval candidates never
  reach Sim3 verification (reference LoopClosing.cc:396);
* accumulated loop edges — the second loop's essential graph includes the
  first loop's constraint (reference KeyFrame::mLoopEdges in
  Optimizer.cc:1501+).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
from orb_slam3_rgbl_tpu.geometry import lie, align
from orb_slam3_rgbl_tpu.slam.system import System
from orb_slam3_rgbl_tpu.slam import tracking as trk

from test_loop_closing import CircularWorld, circle_trajectory


def double_loop_sequence(rng, n_per_lap=82, radius=18.0):
    """Two full laps of the circle: the revisit fires one loop per lap."""
    import dataclasses
    cfg = dataclasses.replace(kitti_rgbl_config(), loop_closing=True)
    world = CircularWorld(rng, cfg.camera, radius)
    lap = circle_trajectory(n_per_lap, radius)
    gt = np.concatenate([lap, lap[8:]])  # second lap skips the seam overlap
    sys = System(cfg)
    results = [
        sys.track_features(world.render(gt[i], n_feat=600, px_noise=0.6), i * 0.1)
        for i in range(len(gt))
    ]
    return sys, gt, results


class TestTemporalConsistency:
    def test_single_shot_false_candidate_rejected(self, rng):
        """Inject a bogus retrieval candidate on ONE keyframe: the 3-KF
        consistency gate must reject it without attempting Sim3."""
        import dataclasses
        cfg = dataclasses.replace(kitti_rgbl_config(), loop_closing=True)
        world = CircularWorld(rng, cfg.camera, 18.0)
        gt = circle_trajectory(140, 18.0)
        sys = System(cfg)
        injected = {"done": False, "verify_calls": 0}

        for i in range(140):
            feats = world.render(gt[i], n_feat=600, px_noise=0.6)
            if (sys.loop_closer is not None and not injected["done"]
                    and sys.map.n_kf >= 13):
                lc = sys.loop_closer
                orig_detect = lc.db.detect_candidates
                orig_verify = lc._verify_candidate

                def fake_detect(m, kf_id, n_candidates=3):
                    return np.asarray([0], np.int64)  # early KF ≠ real loop

                def counting_verify(kf_id, cand):
                    injected["verify_calls"] += 1
                    return orig_verify(kf_id, cand)

                lc.db.detect_candidates = fake_detect
                lc._verify_candidate = counting_verify
                sys.track_features(feats, i * 0.1)
                lc.db.detect_candidates = orig_detect
                lc._verify_candidate = orig_verify
                injected["done"] = True
                break   # stop right after the injection frame
            sys.track_features(feats, i * 0.1)

        assert injected["done"], f"never reached 13 KFs (n_kf={sys.map.n_kf})"
        # the gate swallowed the injection: no Sim3 attempt, no event
        assert injected["verify_calls"] == 0
        assert len(sys.loop_closer.events) == 0


class TestAccumulatedLoopEdges:
    def test_two_laps_two_loops_second_graph_sees_first_edge(self, rng):
        sys, gt, results = double_loop_sequence(rng)
        ok = np.mean([r.state == trk.OK for r in results])
        assert ok > 0.85, ok
        events = sys.loop_closer.events
        assert len(events) >= 1, "no loop closed over two laps"
        # every verified loop left its constraint for future graphs
        assert len(sys.loop_closer.extra_edges) == len(events)
        for (a, b, Sab, w) in sys.loop_closer.extra_edges:
            assert sys.map.kf_frame_id[a] - sys.map.kf_frame_id[b] > 30
            assert Sab.shape == (8,)
        # trajectory stays consistent after the corrections
        est = sys.trajectory()
        gt_twc = np.asarray(lie.se3_inv(jnp.asarray(gt)))
        err = float(align.ate_rmse(jnp.asarray(gt_twc[: len(est), 4:7]),
                                   jnp.asarray(est[:, 4:7])))
        assert err < 1.5, err
