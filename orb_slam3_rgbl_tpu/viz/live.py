"""Live viewer: the reference's Viewer thread, TPU-native style.

Replaces ``Viewer::Run`` + per-frame ``FrameDrawer::Update`` (reference
``src/Viewer.cc`` Run loop launched at ``System.cc:236-244``,
``src/FrameDrawer.cc:37/370``) for deployments without a display: a
background thread renders the current frame overlay + top-down map view
at a fixed rate into ``out_dir/live_frame.png`` / ``live_map.png``
(atomic replace), and an optional built-in HTTP server streams them to a
browser (the headless analog of the Pangolin window — a TPU host has no
GL stack).

Off the critical path by design: the viewer reads host-side tracker/map
snapshots; the only device transfer is the ≤2 Hz frame-image download,
and that rides the normal async dispatch queue.

Usage::

    sysm = System(cfg)
    viewer = sysm.start_viewer(out_dir="viewer_out", http_port=8765)
    ... track frames ...
    sysm.shutdown()            # stops the viewer too
"""

from __future__ import annotations

import os
import threading
import time
from typing import Optional

import numpy as np


class LiveViewer:
    def __init__(self, system, out_dir: str = "viewer_out", hz: float = 2.0,
                 http_port: Optional[int] = None, map_3d: bool = False):
        self.system = system
        self.out_dir = out_dir
        self.period = 1.0 / max(hz, 0.1)
        self.map_3d = map_3d
        self.http_port = http_port
        self.latest_img = None       # device or host gray image (set per frame)
        self.frames_rendered = 0
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._httpd = None
        self._http_thread = None
        os.makedirs(out_dir, exist_ok=True)

    # -- lifecycle -----------------------------------------------------
    def start(self):
        if self._thread is not None:
            return self
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="viewer")
        self._thread.start()
        if self.http_port is not None:
            self._start_http()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10.0)
            self._thread = None
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    # -- render loop (Viewer::Run) --------------------------------------
    def _run(self):
        while not self._stop.is_set():
            t0 = time.perf_counter()
            try:
                self._render_once()
            except Exception:                      # never kill the engine
                import traceback
                from orb_slam3_rgbl_tpu.utils.logging import log

                log("viewer render failed:\n" + traceback.format_exc())
            dt = time.perf_counter() - t0
            self._stop.wait(max(self.period - dt, 0.05))

    def _atomic(self, name: str):
        return (os.path.join(self.out_dir, name + ".tmp.png"),
                os.path.join(self.out_dir, name))

    def _render_once(self):
        from orb_slam3_rgbl_tpu.viz import viewer as vz

        sysm = self.system
        if sysm.map is None or sysm.tracker is None:
            return
        # frame overlay (FrameDrawer::DrawFrame)
        img = self.latest_img
        if img is not None and sysm.tracker.last_feats is not None:
            gray = np.asarray(img)
            tmp, dst = self._atomic("live_frame.png")
            vz.draw_frame_from_system(sysm, gray, path=tmp)
            os.replace(tmp, dst)
        # map view (MapDrawer::DrawMapPoints/DrawKeyFrames)
        traj = None
        t = sysm.tracker
        if t.traj_rel:
            # cheap top-down: keyframe centers stand in for the full
            # resolved trajectory (resolving joins the mapping plane —
            # too heavy for a 2 Hz side thread)
            traj = None
        tmp, dst = self._atomic("live_map.png")
        if self.map_3d:
            vz.plot_map_3d(sysm.map, trajectory=traj, path=tmp)
        else:
            vz.plot_map(sysm.map, trajectory=traj, path=tmp)
        os.replace(tmp, dst)
        self.frames_rendered += 1

    # -- HTTP serving (headless Pangolin analog) ------------------------
    def _start_http(self):
        import http.server

        out_dir = self.out_dir

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):           # quiet
                pass

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    body = (b"<html><head><meta http-equiv='refresh' "
                            b"content='1'><title>orb_slam3_rgbl_tpu</title>"
                            b"</head><body style='background:#111'>"
                            b"<img src='/live_frame.png' style='width:100%'>"
                            b"<img src='/live_map.png' style='width:49%'>"
                            b"</body></html>")
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                p = os.path.join(out_dir, os.path.basename(self.path))
                if os.path.exists(p) and p.endswith(".png"):
                    with open(p, "rb") as f:
                        body = f.read()
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(body)))
                    self.send_header("Cache-Control", "no-store")
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_error(404)

        self._httpd = http.server.ThreadingHTTPServer(
            ("0.0.0.0", self.http_port), Handler)
        self.http_port = self._httpd.server_address[1]  # resolve port 0
        self._http_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True, name="viewer-http")
        self._http_thread.start()
