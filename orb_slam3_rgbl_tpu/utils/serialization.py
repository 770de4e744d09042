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


_PREINT_FIELDS = 12  # dt dR dV dP JRg JVg JVa JPg JPa cov bg ba


def _map_arrays(m: MapState, prefix: str) -> dict:
    arrays = {
        prefix + f.name: getattr(m, f.name)
        for f in dataclasses.fields(m)
        if isinstance(getattr(m, f.name), np.ndarray)
    }
    # preintegration chain: pack the {kf_id: 12-tuple} dict as one id
    # vector + 12 stacked arrays (all preints store fixed-shape deltas)
    ks = sorted(m.imu_preint.keys())
    arrays[prefix + "imu_pre_ids"] = np.asarray(ks, np.int32)
    for j in range(_PREINT_FIELDS):
        arrays[prefix + f"imu_pre_f{j}"] = (
            np.stack([np.asarray(m.imu_preint[k][j]) for k in ks])
            if ks else np.zeros((0,), np.float32)
        )
    return arrays


def _map_from_arrays(data, prefix: str, meta: dict) -> MapState:
    fields = {f.name for f in dataclasses.fields(MapState)}
    arrays = {
        k[len(prefix):]: data[k] for k in data.files
        if k.startswith(prefix) and k[len(prefix):] in fields
    }
    m = MapState(**arrays)  # type: ignore[arg-type]
    m.n_kf = int(meta["n_kf"])
    m.n_lm = int(meta["n_lm"])
    m.version = int(meta["version"])
    m.map_id = int(meta["map_id"])
    m.imu_initialized = bool(meta.get("imu_initialized", False))
    m.refresh_free_list()
    ids = data.get(prefix + "imu_pre_ids")
    if ids is not None and ids.size:
        cols = [data[prefix + f"imu_pre_f{j}"] for j in range(_PREINT_FIELDS)]
        m.imu_preint = {
            int(k): tuple(c[i] for c in cols) for i, k in enumerate(ids)
        }
    return m


def save_atlas(path: str, atlas, tracker=None):
    """Whole-Atlas checkpoint (≡ ``System::SaveAtlas``, System.cc:1545):
    every map, its retrieval-database signatures, and the per-map
    trajectory segments, guarded by the vocabulary checksum."""
    if tracker is not None:
        atlas.archive_trajectory(tracker)
    arrays, maps_meta = {}, []
    for i, e in enumerate(atlas.entries):
        p = f"m{i}_"
        arrays.update(_map_arrays(e.map, p))
        m = e.map
        maps_meta.append({
            "n_kf": m.n_kf, "n_lm": m.n_lm, "version": m.version,
            "map_id": m.map_id, "imu_initialized": bool(m.imu_initialized),
            "has_db": e.db is not None,
        })
        if e.db is not None:
            arrays[p + "db_vectors"] = e.db.vectors
            arrays[p + "db_present"] = e.db.present
        arrays[p + "traj_rel"] = (
            np.stack(e.traj_rel) if e.traj_rel else np.zeros((0, 7), np.float32)
        )
        arrays[p + "traj_ref_kf"] = np.asarray(e.traj_ref_kf, np.int32)
        arrays[p + "traj_time"] = np.asarray(e.traj_time, np.float64)
        arrays[p + "traj_lost"] = np.asarray(e.traj_lost, bool)
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "atlas",
        "vocab_checksum": vocabulary_checksum(),
        "n_maps": len(atlas.entries),
        "active_idx": atlas.active_idx,
        "next_map_id": atlas._next_map_id,
        "n_features": atlas.n_features,
        "maps": maps_meta,
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_atlas(path: str, config, strict_vocab: bool = True):
    """Rebuild an :class:`~orb_slam3_rgbl_tpu.slam.atlas.Atlas` (maps,
    retrieval databases, trajectory segments) from a :func:`save_atlas`
    archive (≡ ``System::LoadAtlas`` + ``Atlas::PostLoad``)."""
    from orb_slam3_rgbl_tpu.retrieval.keyframe_db import KeyFrameDatabase
    from orb_slam3_rgbl_tpu.slam.atlas import Atlas, AtlasEntry

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    if meta.get("kind") != "atlas":
        raise ValueError("not an atlas archive (use load_map for single maps)")
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported atlas format {meta['format_version']}")
    if strict_vocab and meta["vocab_checksum"] != vocabulary_checksum():
        raise ValueError(
            "vocabulary checksum mismatch — atlas was built with a "
            "different retrieval vocabulary"
        )
    atlas = Atlas(config, int(meta["n_features"]))
    for i, mm in enumerate(meta["maps"]):
        p = f"m{i}_"
        m = _map_from_arrays(data, p, mm)
        e = AtlasEntry(map=m)
        if mm.get("has_db"):
            db = KeyFrameDatabase.__new__(KeyFrameDatabase)
            db.vectors = data[p + "db_vectors"].copy()
            db.present = data[p + "db_present"].copy()
            # restore the word scheme the vectors were built with: a
            # trained tree vocabulary if configured, else the LSH default
            db.vocabulary = None
            if getattr(config, "vocab_path", None):
                from orb_slam3_rgbl_tpu.retrieval.tree_vocab import TreeVocabulary

                db.vocabulary = TreeVocabulary.load(config.vocab_path)
            e.db = db
        e.traj_rel = [r for r in data[p + "traj_rel"]]
        e.traj_ref_kf = [int(x) for x in data[p + "traj_ref_kf"]]
        e.traj_time = [float(x) for x in data[p + "traj_time"]]
        e.traj_lost = [bool(x) for x in data[p + "traj_lost"]]
        atlas.entries.append(e)
    atlas.active_idx = int(meta["active_idx"])
    atlas._next_map_id = int(meta["next_map_id"])
    return atlas


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
    m.refresh_free_list()
    return m
