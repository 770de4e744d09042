"""Map checkpoint / resume.

Replaces ``System::SaveAtlas/LoadAtlas`` (reference ``System.cc:1545-1650``:
boost archive of the whole Atlas guarded by an MD5 checksum of the
vocabulary). The array-based map state serializes to a single compressed
``.npz`` (no pointer canonicalization needed — the ``PreSave/PostLoad``
dance of ``Atlas.cc:302-360`` disappears because ids ARE the references);
the vocabulary checksum becomes a SHA-256 over the LSH bit tables.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json

import numpy as np

from orb_slam3_rgbl_tpu.retrieval import vocab
from orb_slam3_rgbl_tpu.slam.map_state import MapState

FORMAT_VERSION = 1


def vocabulary_checksum() -> str:
    """SHA-256 of the retrieval vocabulary definition (≡ the MD5 vocab
    guard of ``System::CalculateCheckSum``, ``System.cc:1650-1689``)."""
    h = hashlib.sha256()
    h.update(vocab.BIT_TABLES.tobytes())
    h.update(np.int64([vocab.N_BANDS, vocab.BITS_PER_BAND]).tobytes())
    return h.hexdigest()


def save_map(path: str, m: MapState):
    arrays = {
        f.name: getattr(m, f.name)
        for f in dataclasses.fields(m)
        if isinstance(getattr(m, f.name), np.ndarray)
    }
    meta = {
        "format_version": FORMAT_VERSION,
        "n_kf": m.n_kf,
        "n_lm": m.n_lm,
        "version": m.version,
        "map_id": m.map_id,
        "vocab_checksum": vocabulary_checksum(),
        "imu_initialized": bool(m.imu_initialized),
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_map(path: str, strict_vocab: bool = True) -> MapState:
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported map format {meta['format_version']}")
    if strict_vocab and meta["vocab_checksum"] != vocabulary_checksum():
        raise ValueError(
            "vocabulary checksum mismatch — map was built with a different "
            "retrieval vocabulary (the reference refuses to load such "
            "atlases for the same reason)"
        )
    fields = {f.name for f in dataclasses.fields(MapState)}
    arrays = {k: data[k] for k in data.files if k in fields}
    m = MapState(**arrays)  # type: ignore[arg-type]
    m.n_kf = int(meta["n_kf"])
    m.n_lm = int(meta["n_lm"])
    m.version = int(meta["version"])
    m.map_id = int(meta["map_id"])
    m.imu_initialized = bool(meta.get("imu_initialized", False))
    return m
