#!/usr/bin/env python
"""Synthesize a sf1.0 decade from sf0.1 for scale-trend evidence —
for the queries whose semantics survive replication.

The driver provides sf{0.001,0.01,0.1} only, and TESTDATA.md forbids
regenerating testdata. Replication is semantically safe for
relational / windowed / packing / sampling / per-document-text
workloads when each replica is an INDEPENDENT population: every key
domain gets a per-replica offset (next power of 10 above the domain's
max), applied consistently to primary AND foreign keys, so join
fan-outs, per-user event densities, and per-key group sizes are
exactly preserved while row counts scale 10x.

Text independence (r8): documents.text gets a PER-REPLICA alphabet
rotation (a bijection on the a-z character space; replica 0 keeps the
original text). A bijection preserves every within-replica structure
the text operators measure — string lengths and n_chars, token
boundaries, shingle/k-mer EQUALITY (so per-replica Jaccard, exact-dup
groups, 13-gram collisions, and kernel seed sets are exactly the
replica-0 structure), and k-mer frequency profiles — while making the
k-mer spaces of different replicas disjoint, so replicas are
independent populations in TEXT space too. That makes the text-content
operators (blast kernel family, dedup/minhash/simhash, decontam,
curation) decade-eligible: duplicate/collision/hit volume scales
exactly 10x (linear), not quadratically as verbatim replication would.
(Alignment SCORES within a rotated replica differ from replica 0 —
BLOSUM entries are residue-specific — so replicas are statistically
equivalent workloads, not score-identical copies; that is what an
independent population means.)

Still NOT synthesized: embeddings.parquet (no text to rotate; vector
replication would inflate near-dup density), so ann_*/embedding_*
stay excluded at sf1.0.

Output: $SPARK_GRAFT_SF1_DIR (default /tmp/spark_graft_sf1.0) with
the same table names; scripts/bench_scaling.py picks it up for the
eligible query subset when the directory exists.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1.0")
REPLICAS = 10

# key domain -> the columns it governs across tables (PK first)
DOMAINS = {
    "regionkey": [("region", "r_regionkey"), ("nation", "n_regionkey")],
    "nationkey": [("nation", "n_nationkey"), ("customer", "c_nationkey"),
                  ("supplier", "s_nationkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents"]


def next_pow10(n: int) -> int:
    p = 1
    while p <= n:
        p *= 10
    return p


def main() -> None:
    from pyspark.sql import functions as F

    from mr_mpi_blast_spark.session import get_spark
    spark = get_spark("make_sf1")

    # per-domain offsets from the real data's key maxima (one reader
    # per table, shared with the overflow guard below)
    readers: dict[str, object] = {}

    def tbl(table: str):
        if table not in readers:
            readers[table] = spark.read.parquet(
                os.path.join(SRC, f"{table}.parquet"))
        return readers[table]

    offsets: dict[str, int] = {}
    for dom, cols in DOMAINS.items():
        mx = 0
        for table, col in cols:
            mx = max(mx, int(tbl(table).agg(F.max(col)).first()[0]))
        offsets[dom] = next_pow10(mx)

    col_offset = {(t, c): offsets[dom]
                  for dom, cols in DOMAINS.items() for t, c in cols}

    # replica-key overflow guard: the projection casts back to the
    # column's ORIGINAL type, which under non-ANSI settings silently
    # wraps instead of failing — validate the largest synthesized key
    # (max original + (REPLICAS-1)*offset) fits every keyed column's
    # type before writing anything
    int_max = {"byte": 2 ** 7 - 1, "short": 2 ** 15 - 1,
               "integer": 2 ** 31 - 1, "long": 2 ** 63 - 1}
    for dom, cols in DOMAINS.items():
        top = offsets[dom] - 1 + (REPLICAS - 1) * offsets[dom]
        for table, col in cols:
            tn = tbl(table).schema[col].dataType.typeName()
            cap = int_max.get(tn)
            if cap is not None and top > cap:
                raise ValueError(
                    f"{table}.{col} ({tn}): synthesized key {top} "
                    f"exceeds the column type's max {cap}; widen the "
                    f"column or reduce REPLICAS")

    os.makedirs(OUT, exist_ok=True)
    # Precondition for the rotation's disjointness claim: the rotation
    # is a bijection on [a-z] only, so any character OUTSIDE [a-z ] in
    # documents.text would be a fixed point — 13-grams of
    # rotation-invariant tokens would collide ACROSS replicas, making
    # duplicate/collision volume superlinear and the sf1.0 decade
    # exponents for the dedup/decontam/kernel families fake. Assert it
    # instead of assuming it survives a corpus regeneration. NULL,
    # empty, and letterless texts are flagged too: rlike() is NULL on
    # NULL input (a bare ~rlike filter would silently pass them), and
    # an all-space/empty text is a complete fixed point whose 10
    # identical replicas would inflate every pairwise dedup family.
    bad = (tbl("documents")
           .filter(F.col("text").isNull()
                   | ~F.col("text").rlike("^[a-z ]*$")
                   | ~F.col("text").rlike("[a-z]")).count())
    if bad:
        raise SystemExit(
            f"make_scale_decade: {bad} documents are NULL/letterless "
            f"or contain characters outside [a-z ]; the per-replica "
            f"rotation would leave them as cross-replica fixed "
            f"points — widen the rotation alphabet before "
            f"synthesizing (see module docstring)")
    for table in TABLES:
        src = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        # one read, 10 offset projections, one union write — the
        # replica id never materializes as a column, so schemas match
        # the originals exactly
        parts = []
        alpha = "abcdefghijklmnopqrstuvwxyz"
        for i in range(REPLICAS):
            cols = []
            for f in src.schema.fields:
                off = col_offset.get((table, f.name))
                if off is not None and i > 0:
                    cols.append((F.col(f.name) + F.lit(i * off))
                                .cast(f.dataType).alias(f.name))
                elif table == "documents" and f.name == "text" and i > 0:
                    # per-replica alphabet rotation: a bijection on the
                    # character space, so within-replica shingle/k-mer
                    # equality, token boundaries, and lengths are
                    # exactly preserved while cross-replica k-mer
                    # spaces are disjoint (see module docstring)
                    rot = alpha[i:] + alpha[:i]
                    cols.append(F.translate(F.col(f.name), alpha, rot)
                                .alias(f.name))
                else:
                    cols.append(F.col(f.name))
            parts.append(src.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        dest = os.path.join(OUT, f"{table}.parquet")
        out.write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{table}: {n} rows -> {dest}")
    print(f"done: {OUT}")


if __name__ == "__main__":
    main()
