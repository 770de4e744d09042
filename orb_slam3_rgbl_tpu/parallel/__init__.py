"""Multi-chip scaling: device meshes, sharded bundle adjustment.

The reference's concurrency is four CPU threads in one address space
(SURVEY.md §2.4). Here scale comes from a ``jax.sharding.Mesh``:
landmark blocks shard across chips, the Schur-reduced camera system is
``psum``-reduced over ICI, and the (small) reduced solve is replicated.
"""
