#!/usr/bin/env python
"""Per-iteration wall-time curve for bpe_learn at a production-scale
merge count (default 4096) — the r9 verdict's remaining BPE evidence:
the staged-materialization loop (operators/bpe.py) claims O(1) work
per merge regardless of how many merges preceded it; this script
measures it end-to-end and prints segment statistics.

The driver corpus has a FIXED 31-word vocabulary (sum(len-1) = 107 —
the absolute ceiling on learnable merges from that data), so a
4096-merge run is impossible on the shipped documents table at ANY
scale factor. The probe therefore synthesizes a deterministic
(word, wf) table with enough pair mass: ``--n-words`` md5-hex words
(16-symbol alphabet, 24 chars each -> ~23 x n_words learnable merges),
weights 1..5. bpe_learn consumes any (word, wf) table; the loop under
test is identical to the registered query's.

Usage:
    python scripts/bpe_curve.py [--n-merges 4096] [--n-words 2048]
                                [--segments 16]
Prints one JSON line: per-segment mean seconds/merge + the
flatness ratio (last segment mean / first segment mean).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def synthetic_words(spark, n_words: int):
    rows = []
    for i in range(n_words):
        h = hashlib.md5(f"bpe-curve:{i}".encode()).hexdigest()
        rows.append((h[:24], 1 + i % 5))
    return spark.createDataFrame(rows, "word string, wf long")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-merges", type=int, default=4096)
    ap.add_argument("--n-words", type=int, default=2048)
    ap.add_argument("--segments", type=int, default=16)
    args = ap.parse_args()

    from mr_mpi_blast_spark.operators.bpe import bpe_learn_iter
    from mr_mpi_blast_spark.session import get_spark

    spark = get_spark("bpe_curve")
    # the probe table is a few thousand rows: 32 reduce tasks per
    # iteration would measure scheduler overhead, not the loop.
    # 4 partitions keeps the per-iteration constant honest (the claim
    # under test is flatness ACROSS iterations, not absolute cost).
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    wc = (synthetic_words(spark, args.n_words).coalesce(4)
          .localCheckpoint(eager=True))

    # clamp: --segments above --n-merges must not make the segment
    # width zero (range step 0) after the measurement already ran
    seg = max(1, args.n_merges // args.segments)
    times: list[float] = []
    t0 = time.time()
    it = bpe_learn_iter(wc, args.n_merges)
    last = t0
    for m in it:
        now = time.time()
        times.append(now - last)
        last = now
    total = time.time() - t0
    if len(times) < args.n_merges:
        print(f"warning: pairs exhausted at merge {len(times)} "
              f"(< {args.n_merges}); raise --n-words", file=sys.stderr)
    seg_means = [
        round(sum(times[i:i + seg]) / max(1, len(times[i:i + seg])), 4)
        for i in range(0, len(times), seg)]
    out = {
        "metric": "bpe_per_merge_curve",
        "n_merges_done": len(times),
        "n_words": args.n_words,
        "total_sec": round(total, 2),
        "segment_size": seg,
        "segment_mean_sec": seg_means,
        "flatness_last_over_first": round(
            seg_means[-1] / seg_means[0], 3)
        if len(seg_means) > 1 and seg_means[0] > 0 else 1.0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
