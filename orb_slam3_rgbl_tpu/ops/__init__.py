"""Compute kernels (XLA + Pallas) for the SLAM hot loops.

Each module replaces a reference C++ hot path (SURVEY.md §3.2):

* ``depth``     — LiDAR→depth-map engine (``src/DepthModule.cc``)
* ``pyramid``   — image pyramid (``ORBextractor::ComputePyramid``)
* ``fast``      — FAST corner detection + grid balancing
  (``ORBextractor::ComputeKeyPointsOctTree`` / ``DistributeOctTree``)
* ``orb``       — orientation + rBRIEF descriptors
  (``IC_Angle`` / ``computeOrbDescriptor``)
* ``matching``  — Hamming descriptor association (``ORBmatcher``)
"""
