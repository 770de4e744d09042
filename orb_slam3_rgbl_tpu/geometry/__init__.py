"""Geometry substrate: Lie groups, cameras, triangulation, alignment.

Replaces the reference's vendored Sophus (SE3/SO3/Sim3 header library,
``Thirdparty/Sophus``) and Eigen pose algebra with small, jit/vmap-safe
JAX modules operating on flat arrays.
"""

from orb_slam3_rgbl_tpu.geometry import lie  # noqa: F401
from orb_slam3_rgbl_tpu.geometry import camera  # noqa: F401
from orb_slam3_rgbl_tpu.geometry import align  # noqa: F401
from orb_slam3_rgbl_tpu.geometry import triangulation  # noqa: F401
