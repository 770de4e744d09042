#!/usr/bin/env python3
"""Train a hierarchical binary vocabulary from an image collection —
the replacement for the reference's (absent) ``Vocabulary/ORBvoc.txt``
(DBoW2 ``TemplatedVocabulary::create``; the 145 MB file is pruned from
the mount per ``.MISSING_LARGE_BLOBS:50``).

Extracts ORB descriptors with the engine's own extractor so train-time
and run-time descriptor distributions match, then runs hierarchical
k-medians (``retrieval/tree_vocab.py``).

Usage:
    python tools/train_vocabulary.py <image_dir> [--out vocab.npz] \
        [--k 10] [--depth 4] [--max-images 300] [--stride 1]
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image_dir")
    ap.add_argument("--out", default="vocab.npz")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--max-images", type=int, default=300)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--n-features", type=int, default=1000)
    args = ap.parse_args()

    import cv2
    import numpy as np
    import jax.numpy as jnp
    from orb_slam3_rgbl_tpu.slam import frame as frame_mod
    from orb_slam3_rgbl_tpu.retrieval import tree_vocab

    paths = sorted(
        os.path.join(args.image_dir, f)
        for f in os.listdir(args.image_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )[::args.stride][: args.max_images]
    if not paths:
        raise SystemExit(f"no images in {args.image_dir}")

    probe = cv2.imread(paths[0], cv2.IMREAD_GRAYSCALE)
    H, W = probe.shape
    docs = []
    for i, p in enumerate(paths):
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        if img is None or img.shape != (H, W):
            continue
        feats = frame_mod.extract_features(
            jnp.asarray(img, jnp.float32), H, W, n_features=args.n_features,
        )
        valid = np.asarray(feats.valid)
        docs.append(np.asarray(feats.desc)[valid])
        if i % 25 == 0:
            print(f"[{i}/{len(paths)}] {valid.sum()} descriptors", file=sys.stderr)

    all_desc = np.concatenate(docs)
    print(f"training on {len(all_desc)} descriptors from {len(docs)} images "
          f"(k={args.k}, depth={args.depth} -> {args.k ** args.depth} words)",
          file=sys.stderr)
    voc = tree_vocab.train_vocabulary(
        all_desc, k=args.k, depth=args.depth, idf_docs=docs,
    )
    voc.save(args.out)
    print(f"saved {args.out} (md5 {voc.checksum()})", file=sys.stderr)


if __name__ == "__main__":
    main()
