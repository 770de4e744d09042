#!/usr/bin/env python3
"""Timestamp association — mirror of the reference
``evaluation/associate.py``: match two TUM-format trajectory/ground-truth
files by closest timestamps within ``--max-difference``, print matched
pairs (or merged lines with ``--merge``).

Usage:
    python evaluation/associate.py first.txt second.txt \
        [--offset 0.0] [--max-difference 0.02] [--merge]
"""

import argparse


def read_file_list(path: str, offset: float = 0.0) -> dict:
    """TUM-format text file → {timestamp: [rest of line tokens]}."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            tok = line.replace(",", " ").split()
            out[float(tok[0]) + offset] = tok[1:]
    return out


def associate(first: dict, second: dict, max_difference: float = 0.02) -> list:
    """Greedy best-first matching of timestamps (same algorithm as the
    reference: sort all candidate pairs by |dt|, take each stamp once)."""
    fk, sk = set(first), set(second)
    cands = sorted(
        (abs(a - b), a, b)
        for a in fk
        for b in sk
        if abs(a - b) < max_difference
    )
    matches = []
    for _, a, b in cands:
        if a in fk and b in sk:
            fk.remove(a)
            sk.remove(b)
            matches.append((a, b))
    return sorted(matches)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("first")
    ap.add_argument("second")
    ap.add_argument("--offset", type=float, default=0.0,
                    help="added to the second file's timestamps")
    ap.add_argument("--max-difference", type=float, default=0.02)
    ap.add_argument("--merge", action="store_true",
                    help="print 'ts1 data1.. ts2 data2..' per match")
    args = ap.parse_args()

    first = read_file_list(args.first)
    second = read_file_list(args.second, offset=args.offset)
    for a, b in associate(first, second, args.max_difference):
        if args.merge:
            print(f"{a:.6f} " + " ".join(first[a])
                  + f" {b - args.offset:.6f} " + " ".join(second[b]))
        else:
            print(f"{a:.6f} {b - args.offset:.6f}")


if __name__ == "__main__":
    main()
