"""Keyframe database: loop/reloc candidate retrieval.

Replaces ``KeyFrameDatabase`` (reference ``KeyFrameDatabase.cc``):
``DetectNBestCandidates`` (loop+merge, ``:604-720``) and
``DetectRelocalizationCandidates``, with the same selection semantics —
shared-word gate at 0.8·max, L1 scores accumulated over the candidate's
top-10 covisible group, best-N groups — but computed as dense matvecs
over the whole database instead of inverted-file walks.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from orb_slam3_rgbl_tpu.retrieval import vocab
from orb_slam3_rgbl_tpu.slam.map_state import MapState


class KeyFrameDatabase:
    def __init__(self, capacity_kf: int, vocabulary=None):
        """``vocabulary``: optional trained :class:`~orb_slam3_rgbl_tpu.
        retrieval.tree_vocab.TreeVocabulary` (the DBoW2-equivalent k-ary
        tree). Defaults to the dataset-free LSH word scheme of
        :mod:`~orb_slam3_rgbl_tpu.retrieval.vocab`."""
        self.vocabulary = vocabulary
        n_words = vocabulary.n_words if vocabulary is not None else vocab.VOCAB_SIZE
        self.vectors = np.zeros((capacity_kf, n_words), np.float32)
        self.present = np.zeros(capacity_kf, bool)

    def _bow(self, desc, valid) -> np.ndarray:
        if self.vocabulary is not None:
            return np.asarray(self.vocabulary.bow(jnp.asarray(desc), jnp.asarray(valid)))
        return np.asarray(vocab.bow_vector(jnp.asarray(desc), jnp.asarray(valid)))

    def add(self, kf_id: int, desc: np.ndarray, valid: np.ndarray):
        self.vectors[kf_id] = self._bow(desc, valid)
        self.present[kf_id] = True

    def erase(self, kf_id: int):
        self.present[kf_id] = False

    def query(self, query_vec: np.ndarray, exclude: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """L1 scores + shared-word counts against all stored keyframes
        (excluded / absent → score 0)."""
        scores = np.asarray(vocab.l1_score(jnp.asarray(query_vec), jnp.asarray(self.vectors)))
        shared = np.asarray(vocab.shared_word_counts(jnp.asarray(query_vec), jnp.asarray(self.vectors)))
        ok = self.present.copy()
        ok[exclude] = False
        return np.where(ok, scores, 0.0), np.where(ok, shared, 0)

    def detect_candidates(
        self,
        map_state: MapState,
        kf_id: int,
        n_candidates: int = 3,
        min_covis_exclude: int = 15,
    ) -> np.ndarray:
        """Loop/merge candidates for keyframe ``kf_id`` following
        ``DetectNBestCandidates``: exclude the covisible neighborhood,
        gate on shared words ≥ 0.8·max, accumulate scores over each
        candidate's covisible group, return the best-scoring group
        representatives."""
        query_vec = self.vectors[kf_id]
        covis_w = map_state.covisibility_weights(kf_id)
        exclude = np.nonzero(covis_w >= min_covis_exclude)[0]
        exclude = np.concatenate([exclude, [kf_id]])
        scores, shared = self.query(query_vec, exclude)

        if shared.max() == 0:
            return np.zeros(0, np.int64)
        min_shared = int(0.8 * shared.max())
        cand = np.nonzero((shared >= max(min_shared, 1)) & (scores > 0))[0]
        if cand.size == 0:
            return np.zeros(0, np.int64)

        # accumulate over each candidate's top-10 covisible group
        acc_scores = np.zeros(cand.size, np.float32)
        best_in_group = np.zeros(cand.size, np.int64)
        for i, c in enumerate(cand):
            group = np.concatenate([[c], map_state.best_covisible(int(c), 10, min_weight=1)])
            g_scores = scores[group]
            acc_scores[i] = g_scores.sum()
            best_in_group[i] = group[np.argmax(g_scores)]

        order = np.argsort(-acc_scores)
        out, seen = [], set()
        for i in order:
            b = int(best_in_group[i])
            if b not in seen:
                seen.add(b)
                out.append(b)
            if len(out) >= n_candidates:
                break
        return np.array(out, np.int64)

    def detect_relocalization_candidates(self, desc, valid, n_candidates: int = 5) -> np.ndarray:
        """Frame-level query (no covisibility exclusion) for relocalization
        (``DetectRelocalizationCandidates``)."""
        qv = self._bow(desc, valid)
        scores, shared = self.query(qv, np.zeros(0, np.int64))
        if shared.max() == 0:
            return np.zeros(0, np.int64)
        cand = np.nonzero(shared >= max(int(0.8 * shared.max()), 1))[0]
        order = cand[np.argsort(-scores[cand])]
        return order[:n_candidates]
