"""Trainable hierarchical binary vocabulary — the DBoW2 equivalent.

Replaces ``TemplatedVocabulary<FORB>`` (reference
``Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h``): a k-ary tree of binary
centroids built by hierarchical k-medians over ORB descriptors
(``create``/``HKmeansStep``), descriptor→word assignment by tree descent
with Hamming argmin per level (``transform``), and tf-idf weighted,
L1-normalized frame vectors scored with 1 − ½·Σ|a−b|
(``TemplatedVocabulary.h:135-162``).

TPU-native design: the tree is a *complete* k-ary structure stored as one
flat (n_nodes, 8) u32 center array per level, so the descent is a fixed
``depth``-step loop of batched gather + XOR/popcount + argmin — no
pointer chasing, jit-compilable, vmap-safe over descriptors. The
reference's ORBvoc.txt (k=10, L=6, ~1M words) is absent from the mount
(``.MISSING_LARGE_BLOBS:50``); vocabularies are trained from any image
collection with ``tools/train_vocabulary.py``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _popcount_u32(x: np.ndarray) -> np.ndarray:
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 8) u32 vs (M, 8) u32 → (N, M) int32 Hamming distances."""
    x = a[:, None, :] ^ b[None, :, :]
    return _popcount_u32(x).sum(-1).astype(np.int32)


def _binary_median(desc: np.ndarray) -> np.ndarray:
    """Bitwise majority vote over (N, 8) u32 → (8,) u32 — DBoW2's
    ``meanValue`` for binary descriptors."""
    bits = np.unpackbits(desc.view(np.uint8), bitorder="little").reshape(len(desc), 256)
    maj = (bits.sum(0) * 2 >= len(desc)).astype(np.uint8)
    return np.packbits(maj, bitorder="little").view(np.uint32)


def _kmedians(desc: np.ndarray, k: int, rng: np.random.Generator,
              iters: int = 8) -> tuple:
    """Binary k-medians with k-means++-style seeding (Hamming metric).
    Returns (centers (k, 8) u32, assignment (N,))."""
    n = len(desc)
    if n == 0:
        # empty subtree node (duplicate-heavy or tiny image sets): all-zero
        # children and no assignments — descendants stay empty all the way
        # down, which transform handles fine (they just never win argmin)
        return np.zeros((k, 8), np.uint32), np.zeros(0, np.int64)
    if n <= k:
        centers = np.zeros((k, 8), np.uint32)
        centers[:n] = desc
        if n < k:  # pad with perturbed copies so every child is distinct
            centers[n:] = desc[rng.integers(0, n, k - n)] ^ np.uint32(1)
        return centers, np.arange(n) % k
    # ++ seeding
    centers = [desc[rng.integers(n)]]
    for _ in range(k - 1):
        d = _hamming_np(desc, np.stack(centers)).min(1).astype(np.float64)
        p = d / max(d.sum(), 1e-9)
        centers.append(desc[rng.choice(n, p=p)])
    centers = np.stack(centers)
    assign = np.zeros(n, np.int64)
    for _ in range(iters):
        assign_new = _hamming_np(desc, centers).argmin(1)
        if np.array_equal(assign_new, assign):
            break
        assign = assign_new
        for c in range(k):
            members = desc[assign == c]
            if len(members):
                centers[c] = _binary_median(members)
            else:  # re-seed an empty cluster with the farthest point
                far = _hamming_np(desc, centers).min(1).argmax()
                centers[c] = desc[far]
    return centers, assign


@dataclasses.dataclass
class TreeVocabulary:
    """Complete k-ary binary vocabulary.

    levels: list of (k^(l+1), 8) u32 center arrays, l = 0..depth-1.
    idf:    (k^depth,) float32 inverse-document-frequency weights.
    """

    k: int
    depth: int
    levels: list
    idf: np.ndarray

    @property
    def n_words(self) -> int:
        return self.k ** self.depth

    # -- persistence ----------------------------------------------------
    def save(self, path: str):
        np.savez_compressed(
            path, k=self.k, depth=self.depth, idf=self.idf,
            **{f"level_{i}": lv for i, lv in enumerate(self.levels)},
        )

    @staticmethod
    def load(path: str) -> "TreeVocabulary":
        z = np.load(path)
        k, depth = int(z["k"]), int(z["depth"])
        levels = [z[f"level_{i}"] for i in range(depth)]
        return TreeVocabulary(k=k, depth=depth, levels=levels, idf=z["idf"])

    def checksum(self) -> str:
        """MD5 of the packed tree — the vocabulary-compatibility guard of
        ``System::CalculateCheckSum`` (reference ``System.cc:1650-1689``)."""
        import hashlib

        h = hashlib.md5()
        for lv in self.levels:
            h.update(np.ascontiguousarray(lv).tobytes())
        return h.hexdigest()

    # -- transform ------------------------------------------------------
    def words(self, desc: jax.Array) -> jax.Array:
        """(N, 8) u32 packed descriptors → (N,) int32 word ids via
        fixed-depth tree descent (jittable)."""
        return _descend(tuple(map(jnp.asarray, self.levels)), self.k, desc)

    def bow(self, desc: jax.Array, valid: jax.Array) -> jax.Array:
        """(N, 8), (N,) → (n_words,) L1-normalized tf-idf vector."""
        w = self.words(desc)
        hist = jnp.zeros((self.n_words,), jnp.float32).at[w].add(
            jnp.where(valid, 1.0, 0.0)
        )
        hist = hist * jnp.asarray(self.idf)
        return hist / jnp.maximum(jnp.sum(hist), 1e-9)


@functools.partial(jax.jit, static_argnames=("k",))
def _descend(levels: tuple, k: int, desc: jax.Array) -> jax.Array:
    idx = jnp.zeros((desc.shape[0],), jnp.int32)  # parent within level l-1
    for lv in levels:
        base = idx * k
        cand = lv[base[:, None] + jnp.arange(k)[None, :]]     # (N, k, 8)
        x = cand ^ desc[:, None, :].astype(jnp.uint32)
        d = jnp.sum(
            jax.lax.population_count(x).astype(jnp.int32), axis=-1
        )                                                       # (N, k)
        idx = base + jnp.argmin(d, axis=-1).astype(jnp.int32)
    return idx


def train_vocabulary(desc: np.ndarray, k: int = 10, depth: int = 4,
                     seed: int = 0, iters: int = 8,
                     idf_docs: Optional[list] = None) -> TreeVocabulary:
    """Hierarchical k-medians over (N, 8) u32 packed descriptors
    (DBoW2 ``create``). ``idf_docs``: optional list of per-image
    descriptor arrays for idf estimation (uniform weights otherwise)."""
    rng = np.random.default_rng(seed)
    desc = np.asarray(desc, np.uint32).reshape(-1, 8)
    levels = []
    # groups[i] = descriptor indices currently in node i of this level
    groups = [np.arange(len(desc))]
    for _ in range(depth):
        centers_lv = np.zeros((len(groups) * k, 8), np.uint32)
        next_groups = []
        for gi, g in enumerate(groups):
            c, a = _kmedians(desc[g], k, rng, iters=iters)
            centers_lv[gi * k:(gi + 1) * k] = c
            for ci in range(k):
                next_groups.append(g[a == ci] if len(g) else g)
        levels.append(centers_lv)
        groups = next_groups

    voc = TreeVocabulary(k=k, depth=depth, levels=levels,
                         idf=np.ones(k ** depth, np.float32))
    if idf_docs:
        df = np.zeros(voc.n_words, np.float64)
        for d in idf_docs:
            w = np.unique(np.asarray(voc.words(jnp.asarray(d, jnp.uint32))))
            df[w] += 1.0
        n_docs = len(idf_docs)
        voc.idf = np.log(n_docs / np.maximum(df, 1.0)).astype(np.float32)
        voc.idf[df == 0] = float(np.log(n_docs))
    return voc
