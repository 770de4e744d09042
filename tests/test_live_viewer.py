"""Live viewer (reference Viewer/FrameDrawer threads, System.cc:236-244):
the background render loop produces frame + map snapshots while the
engine tracks, and the built-in HTTP server serves them."""

import os
import time
import urllib.request

import numpy as np

from orb_slam3_rgbl_tpu.config import kitti_rgbl_config
from orb_slam3_rgbl_tpu.slam.system import System
from orb_slam3_rgbl_tpu.slam import tracking as trk

from synthetic_world import SyntheticWorld


def test_live_viewer_renders_and_serves(rng, tmp_path):
    cfg = kitti_rgbl_config()
    world = SyntheticWorld(rng, cam=cfg.camera, length=30.0)
    gt = world.trajectory(25, step=0.8)
    sysm = System(cfg)
    out = str(tmp_path / "viewer")
    viewer = sysm.start_viewer(out_dir=out, hz=20.0, http_port=0)
    gray = np.full((cfg.camera.height, cfg.camera.width), 20.0, np.float32)
    try:
        for i in range(25):
            feats = world.render(gt[i])
            sysm.track_features(feats, timestamp=i * 0.1)
            viewer.latest_img = gray     # track_features has no image;
            # the image entry points feed this automatically
        # wait for at least one full render tick
        t0 = time.time()
        while viewer.frames_rendered == 0 and time.time() - t0 < 30:
            time.sleep(0.1)
        assert viewer.frames_rendered >= 1
        assert os.path.exists(os.path.join(out, "live_map.png"))
        assert os.path.exists(os.path.join(out, "live_frame.png"))
        # HTTP: index + image round-trip (port 0 → auto-assigned)
        port = viewer.http_port
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read()
        assert b"live_frame.png" in html
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/live_map.png", timeout=10).read()
        assert png[:4] == b"\x89PNG"
    finally:
        sysm.shutdown()
    assert sysm._viewer is None          # shutdown stops the viewer
