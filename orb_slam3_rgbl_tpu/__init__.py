"""orb_slam3_rgbl_tpu — a TPU-native RGB-L (RGB + LiDAR) SLAM engine.

A from-scratch re-design of the capabilities of TUMFTM/ORB_SLAM3_RGBL
(ORB-SLAM3 v1.0 + online LiDAR depth densification) for TPU hardware:

* compute path: JAX / XLA / Pallas — batched ORB extraction, Hamming
  matching, LiDAR depth projection/upsampling, Gauss-Newton/LM bundle
  adjustment with Schur complement over landmark blocks;
* state: the map is a fixed-capacity struct-of-arrays pytree (no pointer
  graph, no locks) with versioned snapshots replacing the reference's
  thread/mutex architecture;
* scale: keyframe/landmark blocks shard over a ``jax.sharding.Mesh``;
  collectives (psum / all_gather) reduce the Schur camera system over ICI.

Reference architecture is documented in /root/repo/SURVEY.md; citations in
docstrings (``file:line``) point into the reference tree for behavioural
parity checks only — no code is ported.
"""

__version__ = "0.1.0"

from orb_slam3_rgbl_tpu.config import SlamConfig, load_config  # noqa: F401
