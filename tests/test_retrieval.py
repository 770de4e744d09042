"""Retrieval tests: hierarchical tree vocabulary (DBoW2 equivalent) and
its integration with the keyframe database."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_rgbl_tpu.retrieval import tree_vocab
from orb_slam3_rgbl_tpu.retrieval.keyframe_db import KeyFrameDatabase


def random_desc(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)


def perturb(rng, desc, n_bits):
    """Flip ``n_bits`` random bits in each descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        for b in rng.integers(0, 256, n_bits):
            out[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


class TestTreeVocabulary:
    def test_train_and_descend_shapes(self, rng):
        desc = random_desc(rng, 500)
        voc = tree_vocab.train_vocabulary(desc, k=4, depth=3, iters=4)
        assert voc.n_words == 64
        w = np.asarray(voc.words(jnp.asarray(desc)))
        assert w.shape == (500,)
        assert (w >= 0).all() and (w < 64).all()
        # words must be used reasonably evenly (not all in one leaf)
        assert len(np.unique(w)) > 16

    def test_word_stability_under_bit_noise(self, rng):
        """Descriptors a few bits apart should usually map to the same
        word — the property loop detection relies on."""
        desc = random_desc(rng, 300)
        voc = tree_vocab.train_vocabulary(desc, k=4, depth=3, iters=4)
        w0 = np.asarray(voc.words(jnp.asarray(desc)))
        w1 = np.asarray(voc.words(jnp.asarray(perturb(rng, desc, 4))))
        agreement = (w0 == w1).mean()
        assert agreement > 0.5, agreement

    def test_bow_scores_rank_same_scene_higher(self, rng):
        base = random_desc(rng, 400)
        voc = tree_vocab.train_vocabulary(base, k=4, depth=3, iters=4)
        valid = jnp.ones(200, bool)
        a = base[:200]
        a_noisy = perturb(rng, a, 3)          # same scene, sensor noise
        b = random_desc(rng, 200)              # different scene
        va = voc.bow(jnp.asarray(a), valid)
        van = voc.bow(jnp.asarray(a_noisy), valid)
        vb = voc.bow(jnp.asarray(b), valid)
        s_same = 1.0 - 0.5 * float(jnp.abs(va - van).sum())
        s_diff = 1.0 - 0.5 * float(jnp.abs(va - vb).sum())
        assert s_same > s_diff + 0.1, (s_same, s_diff)

    def test_save_load_roundtrip(self, rng, tmp_path):
        desc = random_desc(rng, 200)
        voc = tree_vocab.train_vocabulary(desc, k=3, depth=2, iters=3)
        p = str(tmp_path / "voc.npz")
        voc.save(p)
        voc2 = tree_vocab.TreeVocabulary.load(p)
        assert voc2.checksum() == voc.checksum()
        w1 = np.asarray(voc.words(jnp.asarray(desc)))
        w2 = np.asarray(voc2.words(jnp.asarray(desc)))
        np.testing.assert_array_equal(w1, w2)

    def test_merge_is_deterministic(self, rng):
        desc = random_desc(rng, 200)
        v1 = tree_vocab.train_vocabulary(desc, k=3, depth=2, seed=5)
        v2 = tree_vocab.train_vocabulary(desc, k=3, depth=2, seed=5)
        assert v1.checksum() == v2.checksum()


class TestKfdbWithTreeVocab:
    def test_reloc_candidates_with_tree_vocab(self, rng):
        train = random_desc(rng, 600)
        voc = tree_vocab.train_vocabulary(train, k=4, depth=3, iters=4)
        db = KeyFrameDatabase(8, vocabulary=voc)
        valid = np.ones(100, bool)
        frames = [random_desc(rng, 100) for _ in range(4)]
        for i, d in enumerate(frames):
            db.add(i, d, valid)
        # query a noisy copy of frame 2
        q = perturb(rng, frames[2], 3)
        cands = db.detect_relocalization_candidates(jnp.asarray(q), jnp.asarray(valid))
        assert cands.size > 0
        assert cands[0] == 2
