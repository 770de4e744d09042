"""Host-side IMU frontend: sample buffering + fixed-shape preintegration.

Replaces the measurement plumbing of the reference Tracking thread —
``GrabImuData`` queue + ``PreintegrateIMU`` trapezoidal integration
between frames (``Tracking.cc:1652-1760``) — with padded windows fed to
the jitted :func:`orb_slam3_rgbl_tpu.imu.preintegration.preintegrate`
scan. Windows pad to power-of-two tiers so XLA compiles a handful of
shapes, never per-frame.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.config import SlamConfig
from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.imu import preintegration as pre

_TIERS = (64, 256, 1024, 4096)


def body_cam_extrinsics(cfg: SlamConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(T_bc, T_cb) as (7,) SE3 from the 4×4 row-major ``IMU.T_b_c``
    calibration (camera→body, reference ``Calib::Tbc``)."""
    M = np.asarray(cfg.imu.T_body_cam, np.float32).reshape(4, 4)
    T_bc = np.asarray(lie.se3_from_matrix(jnp.asarray(M)), np.float32)
    T_cb = np.asarray(lie.se3_inv(jnp.asarray(T_bc)), np.float32)
    return T_bc, T_cb


def _pad_to_tier(n: int) -> int:
    for t in _TIERS:
        if n <= t:
            return t
    return _TIERS[-1]


def preintegrate_samples(samples: np.ndarray, bias: pre.ImuBias,
                         noise_acc: float, noise_gyro: float) -> pre.Preintegrated:
    """Preintegrate an (S, 7) [t, ax ay az, gx gy gz] sample block.

    Per-sample dt comes from consecutive timestamps (the first sample's
    dt is the following interval, matching the reference's trapezoid
    bookkeeping to first order)."""
    S = samples.shape[0]
    cap = _pad_to_tier(max(S, 2))
    t = samples[:, 0]
    dts = np.zeros(cap, np.float32)
    if S >= 2:
        d = np.diff(t).astype(np.float32)
        dts[: S - 1] = d
        dts[S - 1] = d[-1] if d.size else 0.0
    acc = np.zeros((cap, 3), np.float32)
    gyr = np.zeros((cap, 3), np.float32)
    acc[:S] = samples[:, 1:4]
    gyr[:S] = samples[:, 4:7]
    valid = np.zeros(cap, bool)
    valid[:S] = True
    return pre.preintegrate(
        jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts), jnp.asarray(valid),
        bias, noise_acc=noise_acc, noise_gyro=noise_gyro,
    )


class ImuAccumulator:
    """Samples since the last keyframe; re-preintegrated on demand at the
    current bias estimate (≡ ``Preintegrated::Reintegrate``)."""

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.samples: List[np.ndarray] = []

    def add(self, block: Optional[np.ndarray]):
        if block is not None and len(block):
            self.samples.append(np.asarray(block, np.float32).reshape(-1, 7))

    def reset(self):
        self.samples = []

    @property
    def n(self) -> int:
        return sum(len(s) for s in self.samples)

    def preintegrate(self, bias: pre.ImuBias) -> Optional[pre.Preintegrated]:
        if self.n < 2:
            return None
        block = np.concatenate(self.samples, axis=0)
        return preintegrate_samples(
            block, bias,
            noise_acc=self.cfg.imu.noise_acc, noise_gyro=self.cfg.imu.noise_gyro,
        )


def preint_to_numpy(p: pre.Preintegrated):
    """Host-storable tuple (kept in MapState.imu_preint)."""
    return tuple(np.asarray(x) for x in (
        p.dt, p.dR, p.dV, p.dP, p.JRg, p.JVg, p.JVa, p.JPg, p.JPa, p.cov,
        p.bias0.bg, p.bias0.ba,
    ))


def preint_from_numpy(t) -> pre.Preintegrated:
    return pre.Preintegrated(
        dt=jnp.asarray(t[0]), dR=jnp.asarray(t[1]), dV=jnp.asarray(t[2]),
        dP=jnp.asarray(t[3]), JRg=jnp.asarray(t[4]), JVg=jnp.asarray(t[5]),
        JVa=jnp.asarray(t[6]), JPg=jnp.asarray(t[7]), JPa=jnp.asarray(t[8]),
        cov=jnp.asarray(t[9]), bias0=pre.ImuBias(jnp.asarray(t[10]), jnp.asarray(t[11])),
    )


def stack_preints(ts) -> pre.Preintegrated:
    """Stack a list of numpy preint tuples into a batched Preintegrated
    (axis 0) for :func:`optim.inertial.imu_initialization`."""
    import jax

    ps = [preint_from_numpy(t) for t in ts]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ps)
