"""Online SLAM node — the framework-agnostic analog of the reference's
ROS2 nodes (``ros2/ros2_orb_slam3/src/rgbd/rgbd-slam-node.cpp``): sensor
streams in (any transport — sockets, ROS bindings, dataset replay), an
approximate-time synchronizer pairs them (≡ ``message_filters::sync_
policies::ApproximateTime``, ``rgbd-slam-node.cpp:14``), and a worker
thread drives the ``System`` off the caller's thread, invoking a pose
callback per tracked frame.

No ROS dependency: the node exposes plain ``feed_*`` methods; a ROS2
wrapper would subscribe and forward into them (``rgbd-slam-node.cpp:52``
does exactly the forwarding this replaces).
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Optional

import numpy as np


class ApproximateTimeSync:
    """Pair two timestamped streams by nearest timestamp within ``slop``
    seconds (the reference's ApproximateTime policy with queue_size)."""

    def __init__(self, slop: float = 0.02, queue_size: int = 10):
        self.slop = slop
        self.a = collections.deque(maxlen=queue_size)
        self.b = collections.deque(maxlen=queue_size)
        self._lock = threading.Lock()

    def push_a(self, t: float, payload):
        with self._lock:
            self.a.append((t, payload))
            return self._match()

    def push_b(self, t: float, payload):
        with self._lock:
            self.b.append((t, payload))
            return self._match()

    def _match(self):
        if not self.a or not self.b:
            return None
        ta, pa = self.a[0]
        # closest b to the oldest a
        j = min(range(len(self.b)), key=lambda k: abs(self.b[k][0] - ta))
        tb, pb = self.b[j]
        if abs(tb - ta) <= self.slop:
            self.a.popleft()
            for _ in range(j + 1):
                self.b.popleft()
            return ta, pa, pb
        # oldest a unmatched and b has moved past it → drop a
        if self.b[0][0] - ta > self.slop:
            self.a.popleft()
        return None


class OnlineSlamNode:
    """Threaded online front door around :class:`System`.

    ``mode``: 'rgbd' | 'rgbl' | 'stereo' | 'mono'. Feed frames with the
    matching ``feed_*`` methods; tracked poses arrive via ``on_pose(
    timestamp, TrackResult)`` on the worker thread. IMU samples fed via
    ``feed_imu`` are windowed per frame exactly like the reference's
    inertial nodes accumulate ``vImuMeas``.
    """

    def __init__(self, system, mode: str = "rgbd",
                 on_pose: Optional[Callable] = None,
                 sync_slop: float = 0.02, max_queue: int = 4):
        if mode not in ("rgbd", "rgbl", "stereo", "mono"):
            raise ValueError(f"unknown mode: {mode}")
        self.system = system
        self.mode = mode
        self.on_pose = on_pose
        self.sync = ApproximateTimeSync(slop=sync_slop)
        self._work: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._imu: list = []
        self._imu_lock = threading.Lock()
        self._last_t = -np.inf
        self._dropped = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- feeds ----------------------------------------------------------
    def feed_imu(self, t: float, acc, gyro):
        with self._imu_lock:
            self._imu.append([t, *np.asarray(acc, float), *np.asarray(gyro, float)])

    def _imu_window(self, t: float) -> Optional[np.ndarray]:
        with self._imu_lock:
            if not self._imu:
                return None
            take = [s for s in self._imu if self._last_t < s[0] <= t]
            self._imu = [s for s in self._imu if s[0] > t]
        return np.asarray(take, np.float32) if take else None

    def _enqueue(self, item):
        """Latest-wins backpressure: a live sensor must never block —
        drop the oldest queued frame instead (the reference's ROS QoS
        keeps a shallow queue for the same reason)."""
        while True:
            try:
                self._work.put_nowait(item)
                return
            except queue.Full:
                try:
                    self._work.get_nowait()
                    self._dropped += 1
                except queue.Empty:
                    pass

    def feed_rgb(self, t: float, gray: np.ndarray):
        if self.mode == "mono":
            self._enqueue(("mono", t, gray))
        else:
            m = self.sync.push_a(t, gray)
            if m is not None:
                self._enqueue((self.mode, m[0], m[1], m[2]))

    def feed_depth(self, t: float, depth: np.ndarray):
        assert self.mode == "rgbd"
        m = self.sync.push_b(t, depth)
        if m is not None:
            self._enqueue(("rgbd", m[0], m[1], m[2]))

    def feed_cloud(self, t: float, cloud: np.ndarray):
        assert self.mode == "rgbl"
        m = self.sync.push_b(t, cloud)
        if m is not None:
            self._enqueue(("rgbl", m[0], m[1], m[2]))

    def feed_right(self, t: float, gray_r: np.ndarray):
        assert self.mode == "stereo"
        m = self.sync.push_b(t, gray_r)
        if m is not None:
            self._enqueue(("stereo", m[0], m[1], m[2]))

    # -- worker ---------------------------------------------------------
    def _run(self):
        while not self._stop.is_set():
            try:
                item = self._work.get(timeout=0.1)
            except queue.Empty:
                continue
            kind, t = item[0], item[1]
            imu = self._imu_window(t)
            if kind == "mono":
                res = self.system.track_monocular(item[2], t, imu=imu)
            elif kind == "rgbd":
                res = self.system.track_rgbd(item[2], item[3], t, imu=imu)
            elif kind == "rgbl":
                res = self.system.track_rgbl(item[2], item[3], t)
            else:  # stereo
                res = self.system.track_stereo(item[2], item[3], t, imu=imu)
            self._last_t = t
            if self.on_pose is not None:
                self.on_pose(t, res)

    def stop(self, timeout: float = 10.0):
        """Drain and stop the worker (≡ node shutdown → System::Shutdown)."""
        deadline = threading.Event()
        while not self._work.empty():
            if deadline.wait(0.05):
                break
        self._stop.set()
        self._thread.join(timeout=timeout)

    @property
    def dropped_frames(self) -> int:
        return self._dropped
