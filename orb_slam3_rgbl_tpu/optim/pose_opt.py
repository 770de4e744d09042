"""Motion-only bundle adjustment (pose optimization).

Replaces ``Optimizer::PoseOptimization`` (reference
``Optimizer.cc:814-1114``): Levenberg-Marquardt on one SE3 pose with
fixed landmarks, Huber-robustified mono (2D) and stereo (3D) reprojection
residuals, 4 rounds × 10 iterations with chi-square outlier
re-classification between rounds (5.991 mono / 7.815 stereo) and the
robust kernel dropped for the final rounds.

TPU formulation: all M observations are batched; each LM iteration is a
handful of (M, 3, 6)-einsum contractions reduced to a 6×6 dense system —
no sparse structures, no data-dependent shapes. The whole 4-round solve
is one jitted computation.

Pose convention: ``Tcw`` (world→camera), updated left-multiplicatively
``Tcw ← exp(δ) · Tcw`` with tangent ``δ = [rho, omega]``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.geometry import lie
from orb_slam3_rgbl_tpu.geometry.camera import (
    PinholeCamera, geo_project, geo_project_jacobian, is_fisheye,
)

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
HUBER_MONO = jnp.sqrt(CHI2_MONO)
HUBER_STEREO = jnp.sqrt(CHI2_STEREO)


class PoseObs(NamedTuple):
    """Batched observations of known landmarks from one frame."""

    Xw: jax.Array        # (M, 3) world landmark positions
    uv: jax.Array        # (M, 2) measured pixel coords
    u_right: jax.Array   # (M,)   pseudo-stereo column, −1 → mono obs
    inv_sigma2: jax.Array  # (M,) information weight (per octave)
    valid: jax.Array     # (M,) bool


class PoseOptResult(NamedTuple):
    Tcw: jax.Array       # (7,) optimized pose
    inliers: jax.Array   # (M,) bool final inlier classification
    n_inliers: jax.Array  # () int32
    chi2: jax.Array      # () final robust cost


def _residuals_and_jac(Tcw: jax.Array, obs: PoseObs, cam):
    """Per-observation 3-vector residual [u, v, uR] (uR row zeroed for
    mono) and its (M, 3, 6) Jacobian w.r.t. the left-multiplicative SE3
    tangent. Analytic, matching ``EdgeSE3ProjectXYZOnlyPose`` +
    ``EdgeStereoSE3ProjectXYZOnlyPose`` linearization. The camera is any
    geometric model (pinhole | KB8 — reference edges project through
    ``GeometricCamera``, OptimizableTypes.h:31-196); fisheye observations
    are always mono (no pseudo-stereo column, Frame stereo-fisheye ctor)."""
    pc = lie.se3_apply(Tcw, obs.Xw)  # (M, 3)
    z = pc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    uv_hat = geo_project(cam, pc)
    u_hat, v_hat = uv_hat[:, 0], uv_hat[:, 1]

    is_stereo = obs.u_right >= 0
    if is_fisheye(cam):
        is_stereo = jnp.zeros_like(is_stereo)
        ur_hat = jnp.zeros_like(u_hat)
    else:
        ur_hat = u_hat - cam.bf / safe_z
    r = jnp.stack(
        [
            obs.uv[:, 0] - u_hat,
            obs.uv[:, 1] - v_hat,
            jnp.where(is_stereo, obs.u_right - ur_hat, 0.0),
        ],
        axis=-1,
    )  # (M, 3)

    # d(pc)/d(delta) for left perturbation: [I | −[pc]×]  (M, 3, 6)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3))
    dpc = jnp.concatenate([eye, -lie.so3_hat(pc)], axis=-1)

    Juv = geo_project_jacobian(cam, pc)  # (M, 2, 3) d(u,v)/d(pc)
    if is_fisheye(cam):
        dur = jnp.zeros_like(Juv[:, 0, :])
    else:
        # uR = u − bf/z → dUr/dpc = dU/dpc + bf/z² · e_z
        dur = Juv[:, 0, :] + jnp.stack(
            [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf / (safe_z * safe_z)], axis=-1
        )
    Jfull = jnp.concatenate([Juv, dur[:, None, :]], axis=1)  # (M, 3, 3)
    # residual = measured − predicted → J_r = −J_pred
    J = -jnp.einsum("mij,mjk->mik", Jfull, dpc)  # (M, 3, 6)
    mono_rows = jnp.array([1.0, 1.0, 0.0], dtype=J.dtype)
    J = jnp.where(is_stereo[:, None, None], J, J * mono_rows[None, :, None])

    # behind-camera observations are unusable this round
    depth_ok = z > 1e-3
    return r, J, is_stereo, depth_ok


def _chi2(r, obs, is_stereo):
    e2 = jnp.sum(r * r, axis=-1)
    return e2 * obs.inv_sigma2


def _huber_weight(chi2, is_stereo, use_huber):
    delta = jnp.where(is_stereo, HUBER_STEREO, HUBER_MONO)
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w = jnp.where(e <= delta, 1.0, delta / e)
    return jnp.where(use_huber, w, 1.0)


@functools.partial(jax.jit, static_argnames=("cam", "rounds", "iters_per_round"))
def pose_optimize(
    Tcw0: jax.Array,
    obs: PoseObs,
    cam: PinholeCamera,
    rounds: int = 4,
    iters_per_round: int = 5,
) -> PoseOptResult:
    """Run the 4-round robust LM pose solve.

    Round semantics follow the reference (``Optimizer.cc:1015-1103``):
    after each round every observation is re-classified inlier/outlier by
    chi², outliers are excluded from the next round's normal equations,
    and the Huber kernel is active only for the first two rounds.

    ``iters_per_round`` defaults to 5 (the reference passes 10 to g2o,
    but g2o terminates early on convergence — motion-only solves settle
    in 2-4 LM steps; a fixed-trip XLA loop must budget the cap itself,
    and 40 sequential tiny steps were ~a third of the fused frame's
    device time).
    """
    dtype = Tcw0.dtype

    def lm_round(round_idx, carry):
        Tcw, inlier = carry
        use_huber = round_idx < 2

        def lm_iter(it, st):
            Tcw, lam, _ = st
            r, J, is_stereo, depth_ok = _residuals_and_jac(Tcw, obs, cam)
            active = obs.valid & inlier & depth_ok
            chi2 = _chi2(r, obs, is_stereo)
            w_rob = _huber_weight(chi2, is_stereo, use_huber)
            w = jnp.where(active, obs.inv_sigma2 * w_rob, 0.0)
            # normal equations: H = Σ w Jᵀ J, b = Σ w Jᵀ r
            H = jnp.einsum("m,mij,mik->jk", w, J, J)
            b = jnp.einsum("m,mij,mi->j", w, J, r)
            cost = jnp.sum(jnp.where(active, jnp.minimum(chi2, 1e6) * w_rob, 0.0))

            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6, dtype=dtype)
            delta = -jnp.linalg.solve(Hd, b)
            T_new = lie.se3_normalize(lie.se3_mul(lie.se3_exp(delta), Tcw))

            r2, _, is_stereo2, depth_ok2 = _residuals_and_jac(T_new, obs, cam)
            chi2_new = _chi2(r2, obs, is_stereo2)
            w_rob2 = _huber_weight(chi2_new, is_stereo2, use_huber)
            active2 = obs.valid & inlier & depth_ok2
            cost_new = jnp.sum(jnp.where(active2, jnp.minimum(chi2_new, 1e6) * w_rob2, 0.0))

            # diverged steps can empty the active set (all points behind
            # camera / NaN) and collapse the cost to 0 — reject those
            accept = ((cost_new < cost) & jnp.isfinite(cost_new)
                      & (2 * jnp.sum(active2) >= jnp.sum(active)))
            Tcw = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, a, b), T_new, Tcw)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
            return (Tcw, lam, jnp.where(accept, cost_new, cost))

        Tcw, _, cost = jax.lax.fori_loop(
            0, iters_per_round, lm_iter, (Tcw, jnp.asarray(1e-3, dtype), jnp.asarray(0.0, dtype))
        )

        # re-classify
        r, _, is_stereo, depth_ok = _residuals_and_jac(Tcw, obs, cam)
        chi2 = _chi2(r, obs, is_stereo)
        th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        inlier = obs.valid & depth_ok & (chi2 <= th)
        return (Tcw, inlier)

    inlier0 = obs.valid
    Tcw, inlier = jax.lax.fori_loop(0, rounds, lm_round, (Tcw0, inlier0))

    r, _, is_stereo, depth_ok = _residuals_and_jac(Tcw, obs, cam)
    chi2 = jnp.sum(jnp.where(inlier, _chi2(r, obs, is_stereo), 0.0))
    return PoseOptResult(
        Tcw=Tcw,
        inliers=inlier,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
        chi2=chi2,
    )
