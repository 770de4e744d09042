"""Driver-chain end-to-end (round 4, VERDICT missing #1): the full
``load_config(reference-format YAML) → KittiSequence → System →
SaveTrajectoryKITTI`` composition runs on a synthetic KITTI-format
fixture directory — times.txt / calib.txt / image_2/*.png /
velodyne/*.bin, a legacy flat-key settings file — exactly the surface
the reference driver consumes (``Examples/RGB-L/rgbl_kitti.cc:35-146``,
``Examples/RGB-L/KITTI00-02.yaml``)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_rgbl_tpu import synthetic as syn
from orb_slam3_rgbl_tpu.geometry.align import ate_rmse
from orb_slam3_rgbl_tpu.slam import tracking as trk

N_FRAMES = 22
W, H = 320, 192


@pytest.fixture(scope="module")
def kitti_fixture(tmp_path_factory):
    """Render the box world into an on-disk KITTI odometry sequence."""
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("kitti_seq")
    seq = root / "00"
    (seq / "image_2").mkdir(parents=True)
    (seq / "velodyne").mkdir()

    world = syn.make_world(0, tex_size=256)
    traj = syn.straight_trajectory(N_FRAMES, step=0.6, weave=0.4)
    cfg = syn.synthetic_rgbl_config()
    cam = cfg.camera
    for i, Twc in enumerate(traj):
        T = jnp.asarray(Twc)
        img = np.asarray(syn.render_image(
            world, T, cam.fx, cam.fy, cam.cx, cam.cy, H, W))
        cv2.imwrite(str(seq / "image_2" / f"{i:06d}.png"),
                    np.clip(img, 0, 255).astype(np.uint8))
        pts = np.asarray(syn.lidar_scan(world, T, n_az=256, n_el=48),
                         np.float32)
        pts.tofile(str(seq / "velodyne" / f"{i:06d}.bin"))
    np.savetxt(str(seq / "times.txt"), np.arange(N_FRAMES) * 0.1)
    with open(seq / "calib.txt", "w") as f:
        P2 = f"{cam.fx} 0 {cam.cx} 0 0 {cam.fy} {cam.cy} 0 0 0 1 0"
        f.write(f"P2: {P2}\n")
        Tr = np.asarray(syn.T_VELO_CAM).reshape(-1)
        f.write("Tr: " + " ".join(str(v) for v in Tr) + "\n")

    # legacy flat-key settings file (the KITTI00-02.yaml key set)
    Tr = np.asarray(syn.T_VELO_CAM)
    lines = [
        "%YAML:1.0", "---",
        f"Camera.fx: {cam.fx}", f"Camera.fy: {cam.fy}",
        f"Camera.cx: {cam.cx}", f"Camera.cy: {cam.cy}",
        "Camera.k1: 0.0", "Camera.k2: 0.0",
        "Camera.p1: 0.0", "Camera.p2: 0.0",
        f"Camera.width: {W}", f"Camera.height: {H}",
        "Camera.fps: 10.0", f"Camera.bf: {cam.bf}", "Camera.RGB: 1",
        "ThDepth: 100.0", "DepthMapFactor: 1.0",
        "LiDAR.Method: InverseDilation",
        "LiDAR.MethodInverseDilation.KernelType: Diamond",
        "LiDAR.MethodInverseDilation.KernelSize_u: 5",
        "LiDAR.MethodInverseDilation.KernelSize_v: 7",
        "LiDAR.min_dist: 1.5", "LiDAR.max_dist: 150.0",
        "ORBextractor.nFeatures: 600",
        "ORBextractor.scaleFactor: 1.2", "ORBextractor.nLevels: 4",
        "ORBextractor.iniThFAST: 12", "ORBextractor.minThFAST: 7",
    ]
    for r in range(3):
        for c in range(4):
            lines.append(f"LiDAR.Tr{r + 1}{c + 1}: {float(Tr[r, c])}")
    yaml_path = root / "settings.yaml"
    yaml_path.write_text("\n".join(lines) + "\n")
    return str(seq), str(yaml_path), traj


class TestKittiDriverChain:
    def test_driver_chain_end_to_end(self, kitti_fixture, tmp_path):
        from orb_slam3_rgbl_tpu.config import load_config, RGBL
        from orb_slam3_rgbl_tpu.io.kitti import KittiSequence
        from orb_slam3_rgbl_tpu.slam.system import System

        seq_dir, yaml_path, traj = kitti_fixture
        cfg = load_config(yaml_path, sensor=RGBL)
        # the YAML round-tripped the camera + LiDAR calibration
        assert cfg.camera.width == W and cfg.camera.height == H
        assert cfg.camera.bf > 0
        assert cfg.lidar.method == "InverseDilation"
        np.testing.assert_allclose(
            np.asarray(cfg.lidar.T_velo_cam).reshape(3, 4),
            np.asarray(syn.T_VELO_CAM), atol=1e-6)

        seq = KittiSequence(seq_dir, max_points=16384)
        assert len(seq) == N_FRAMES
        slam = System(cfg)
        slam.CLOUD_CAP = 16384
        states = []
        for i in range(len(seq)):
            img, pcd, mask, t = seq.frame(i)
            r = slam.track_rgbl(img, pcd, t, cloud_mask=mask)
            states.append(r.state)
        slam.shutdown()
        assert all(s == trk.OK for s in states), \
            [trk.STATE_NAMES[s] for s in states]
        # loader-padded cloud + mask rode the fused engine path
        assert slam._fast is not None and slam._fast.prev_lm_ids is not None

        out = tmp_path / "CameraTrajectory.txt"
        slam.save_trajectory_kitti(str(out))
        rows = np.loadtxt(out)
        assert rows.shape == (N_FRAMES, 12)
        assert np.isfinite(rows).all()
        est = slam.trajectory()
        err = float(ate_rmse(jnp.asarray(est[:, 4:7]),
                             jnp.asarray(traj[:, 4:7] - traj[0, 4:7])))
        # PNG-quantized imagery: slightly looser than the in-memory drive
        assert err < 0.25, err
