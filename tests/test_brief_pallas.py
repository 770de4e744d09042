"""Pallas BRIEF kernel tests (interpret mode on CPU) + binned-rBRIEF
semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_rgbl_tpu.ops import brief_pallas as bp
from orb_slam3_rgbl_tpu.ops import orb as orb_ops


def _setup(rng, H=256, W=512, N=70):
    img = jnp.round(jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32))
    uv = jnp.asarray(
        np.stack([rng.integers(20, W - 160, N), rng.integers(20, H - 28, N)], 1),
        jnp.int32,
    )
    ang = jnp.asarray(rng.uniform(-np.pi, np.pi, N), jnp.float32)
    return img, uv, ang


class TestBinnedReference:
    def test_matches_continuous_at_bin_centers(self, rng):
        """At exact bin-center angles the binned tables reproduce the
        continuous-rotation descriptor bit-for-bit."""
        img, uv, _ = _setup(rng)
        centers = (np.arange(bp.NB) + 0.5) * 2 * np.pi / bp.NB - np.pi
        ang = jnp.asarray(centers[np.arange(uv.shape[0]) % bp.NB], jnp.float32)
        d_binned = np.asarray(bp.brief_binned_ref(img, uv, ang))
        d_cont = np.asarray(orb_ops.brief_descriptors(img, uv, ang))
        np.testing.assert_array_equal(d_binned, d_cont)

    def test_rotation_invariance_binned(self, rng):
        """The matching-relevant property: the same physical point viewed
        under a 45° in-plane rotation maps to a nearby binned descriptor
        (mirrors the continuous-path invariance test in
        test_orb_frontend; blurred structured image, not raw noise)."""
        import cv2

        img = rng.uniform(0, 255, (160, 160)).astype(np.float32)
        img = cv2.GaussianBlur(img, (9, 9), 2.0)
        center = (80.0, 80.0)
        uv = jnp.asarray(
            np.stack([rng.integers(50, 110, 40), rng.integers(50, 110, 40)], 1),
            jnp.int32,
        )
        from orb_slam3_rgbl_tpu.ops import orb as oops

        img0 = jnp.round(jnp.asarray(img))
        a0 = oops.ic_angle(img0, uv)
        d0 = np.asarray(bp.brief_binned_ref(img0, uv, a0))
        rot = cv2.getRotationMatrix2D(center, 45.0, 1.0)
        img_r = cv2.warpAffine(img, rot, (160, 160))
        pts = np.concatenate([np.asarray(uv, np.float64), np.ones((40, 1))], 1)
        uv_r = jnp.asarray(np.round(pts @ rot.T), jnp.int32)
        img1 = jnp.round(jnp.asarray(img_r))
        a1 = oops.ic_angle(img1, uv_r)
        d1 = np.asarray(bp.brief_binned_ref(img1, uv_r, a1))
        dist = np.unpackbits((d0 ^ d1).view(np.uint8), axis=1).sum(1)
        # unrelated descriptors average ~128 bits; same-point under
        # rotation must stay well below the TH_HIGH=100 gate
        assert np.median(dist) < 70, np.median(dist)


class TestPallasKernel:
    def test_kernel_matches_reference(self, rng):
        img, uv, ang = _setup(rng)
        ref = np.asarray(bp.brief_binned_ref(img, uv, ang))
        S = bp.slot_capacity(uv.shape[0])
        bins = bp.angle_bins(ang)
        slots, block_bins = bp.bin_pure_layout(bins, S)
        uvb = jnp.ones((S, 2), jnp.int32).at[slots].set(uv - bp.HALF)
        out = np.asarray(
            bp.brief_blocks_pallas(img, uvb, block_bins, interpret=True)
        )[np.asarray(slots)]
        np.testing.assert_array_equal(out, ref)

    def test_multilevel_orchestrator(self, rng):
        img, uv, ang = _setup(rng)
        lvl1 = jnp.round(jnp.asarray(rng.uniform(0, 255, (128, 256)), jnp.float32))
        uv2 = jnp.asarray(
            np.stack([rng.integers(20, 236, 30), rng.integers(20, 108, 30)], 1),
            jnp.int32,
        )
        ang2 = jnp.asarray(rng.uniform(-np.pi, np.pi, 30), jnp.float32)
        d_ref = bp.descriptors_multilevel([img, lvl1], [uv, uv2], [ang, ang2],
                                          use_pallas=False)
        d_pal = bp.descriptors_multilevel([img, lvl1], [uv, uv2], [ang, ang2],
                                          use_pallas=True, interpret=True)
        for a, b in zip(d_ref, d_pal):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bin_pure_layout_is_pure_and_complete(self, rng):
        bins = jnp.asarray(rng.integers(0, bp.NB, 500), jnp.int32)
        S = bp.slot_capacity(500)
        slots, block_bins = bp.bin_pure_layout(bins, S)
        slots = np.asarray(slots)
        assert len(np.unique(slots)) == 500          # injective
        bb = np.asarray(block_bins).reshape(-1)
        for i, s in enumerate(slots):
            assert bb[s // bp.BLK] == int(bins[i])   # block bin matches


class TestContinuousKernel:
    def test_bit_exact_vs_gather_path(self, rng):
        """The continuous-rotation kernel must reproduce
        ``orb.brief_descriptors`` on rounded intensities bit-for-bit."""
        img, uv, ang = _setup(rng)
        ref = np.asarray(orb_ops.brief_descriptors(img, uv, ang))
        N = uv.shape[0]
        S = ((N + bp.BLK - 1) // bp.BLK) * bp.BLK
        corners = uv - bp.HALF
        uvb = jnp.ones((S, 2), jnp.int32).at[:N].set(corners)
        idx = jnp.zeros((S, 512), jnp.int32).at[:N].set(
            bp.continuous_index_tables(ang)
        )
        out = np.asarray(
            bp.brief_continuous_pallas(img, uvb, idx, interpret=True)
        )[:N]
        np.testing.assert_array_equal(out, ref)

    def test_multilevel_continuous_orchestrator(self, rng):
        img, uv, ang = _setup(rng)
        lvl1 = jnp.round(jnp.asarray(rng.uniform(0, 255, (128, 256)), jnp.float32))
        uv2 = jnp.asarray(
            np.stack([rng.integers(20, 236, 30), rng.integers(20, 100, 30)], 1),
            jnp.int32,
        )
        ang2 = jnp.asarray(rng.uniform(-np.pi, np.pi, 30), jnp.float32)
        d_cpu = bp.descriptors_multilevel([img, lvl1], [uv, uv2], [ang, ang2],
                                          use_pallas=False, mode="continuous")
        d_pal = bp.descriptors_multilevel([img, lvl1], [uv, uv2], [ang, ang2],
                                          use_pallas=True, interpret=True,
                                          mode="continuous")
        for a, b in zip(d_cpu, d_pal):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFusedFrontend:
    """Interpret-mode regression of the fused FAST+blur Pallas kernel
    against the XLA reference path (ADVICE r2: previously untested in CI)."""

    def _check(self, rng, h, w):
        from orb_slam3_rgbl_tpu.ops import frontend_pallas as fp
        from orb_slam3_rgbl_tpu.ops import fast as fast_ops
        from orb_slam3_rgbl_tpu.ops import pyramid as pyr_ops

        img = jnp.round(jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32))
        score_ref = np.asarray(fast_ops.fast_score(img))
        blur_ref = np.asarray(pyr_ops.gaussian_blur(img))
        score, blur = fp.fast_and_blur(img, interpret=True)
        np.testing.assert_array_equal(np.asarray(score), score_ref)
        np.testing.assert_allclose(np.asarray(blur), blur_ref, atol=1e-3)

    def test_aligned(self, rng):
        self._check(rng, 128, 256)

    def test_unaligned(self, rng):
        self._check(rng, 93, 171)

    def test_small_levels_take_xla_path(self, rng):
        """Levels smaller than the reflect halos must not reach the Pallas
        kernel (frame.extract_features gates on HALO/CHALO)."""
        from orb_slam3_rgbl_tpu.ops import frontend_pallas as fp

        assert fp.HALO == 8 and fp.CHALO == 64
        # jnp.pad reflect would raise for these shapes — the gate in
        # frame.extract_features must route them to the XLA path
        for h, w in [(8, 256), (128, 64)]:
            assert not (h > fp.HALO and w > fp.CHALO)
