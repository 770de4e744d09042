"""Binary bag-of-words via multi-band bit-sampling LSH.

Functional replacement for DBoW2's ``TemplatedVocabulary<FORB>``
(reference ``Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h``): descriptor
→ word assignment + frame-level tf vector + L1 similarity score
(``TemplatedVocabulary.h:135-162`` scores with 1 − ½·Σ|a−b| on
L1-normalized vectors; we keep the same score so thresholds transfer).

A word is the integer formed by ``bits_per_band`` fixed random bit
positions of the 256-bit descriptor; ``n_bands`` independent bands give
robustness to bit noise (two descriptors within Hamming distance h agree
on a band with prob ≈ (1−h/256)^bits). Deterministic given the seed —
the "vocabulary file" is 100 integers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

N_BANDS = 8
BITS_PER_BAND = 10           # 1024 words per band
WORDS_PER_BAND = 1 << BITS_PER_BAND
VOCAB_SIZE = N_BANDS * WORDS_PER_BAND


def make_bit_tables(seed: int = 42) -> np.ndarray:
    """(N_BANDS, BITS_PER_BAND) bit positions in [0, 256)."""
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.choice(256, BITS_PER_BAND, replace=False) for _ in range(N_BANDS)]
    ).astype(np.int32)


BIT_TABLES = make_bit_tables()


@jax.jit
def descriptor_words(desc: jax.Array) -> jax.Array:
    """(N, 8) u32 packed descriptors → (N, N_BANDS) global word ids."""
    tables = jnp.asarray(BIT_TABLES)          # (B, b)
    word_idx = tables // 32                    # which u32 word
    bit_idx = (tables % 32).astype(jnp.uint32)
    # bits: (N, B, b)
    gathered = desc[:, word_idx]               # (N, B, b) u32
    bits = (gathered >> bit_idx[None]) & jnp.uint32(1)
    weights = (jnp.uint32(1) << jnp.arange(BITS_PER_BAND, dtype=jnp.uint32))
    words = jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint32)
    offsets = (jnp.arange(N_BANDS, dtype=jnp.uint32) * WORDS_PER_BAND)
    return (words + offsets[None, :]).astype(jnp.int32)


@jax.jit
def bow_vector(desc: jax.Array, valid: jax.Array) -> jax.Array:
    """Frame descriptors → (VOCAB_SIZE,) L1-normalized tf vector."""
    words = descriptor_words(desc)             # (N, B)
    w = jnp.where(valid[:, None], 1.0, 0.0)
    hist = jnp.zeros((VOCAB_SIZE,), jnp.float32).at[words.reshape(-1)].add(
        jnp.broadcast_to(w, words.shape).reshape(-1)
    )
    total = jnp.maximum(jnp.sum(hist), 1e-9)
    return hist / total


@jax.jit
def l1_score(a: jax.Array, b: jax.Array) -> jax.Array:
    """DBoW2 L1 similarity ∈ [0, 1]: 1 − ½·Σ|a − b| (both L1-normalized).

    Batched: a (W,) vs b (..., W) → (...,).
    """
    return 1.0 - 0.5 * jnp.sum(jnp.abs(a[None, :] - jnp.atleast_2d(b)), axis=-1)


@jax.jit
def shared_word_counts(a: jax.Array, b: jax.Array) -> jax.Array:
    """Count of vocabulary words present in both a (W,) and b (..., W) —
    the ``minCommonWords`` gate of DetectNBestCandidates."""
    return jnp.sum((a[None, :] > 0) & (jnp.atleast_2d(b) > 0), axis=-1).astype(jnp.int32)
