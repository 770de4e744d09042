"""Optimizers: replaces the reference's g2o stack (``Optimizer.cc`` 5.6k
LoC + vendored g2o 14k LoC) with batched JAX Gauss-Newton/LM solvers.

* ``pose_opt``   — motion-only BA (``Optimizer::PoseOptimization``)
* ``local_ba``   — windowed BA with landmark Schur complement
  (``Optimizer::LocalBundleAdjustment``)
* ``pose_graph`` — essential-graph Sim3/SE3 optimization
  (``Optimizer::OptimizeEssentialGraph``)
* ``sim3_opt``   — relative Sim3 refinement (``Optimizer::OptimizeSim3``)
"""
