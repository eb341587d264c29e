"""Per-key ordered top-k — the reference's reduce-side sort + cutoff.

Reference: per-query hits are sorted by (eValue ASC, bitScore DESC,
identity DESC) (comparator mrblast.cpp:1316-1334) and only the first
NUMHITCUTOFF are written (mrblast.cpp:1224-1241; doc/USERGUIDE:325-327).

Spark expression: a rank window. Catalyst turns
``row_number().over(partitionBy(k).orderBy(...)) <= n`` into a
WindowGroupLimit that pushes the limit to the map side (partial top-k
per input partition before the shuffle), so per-key skew — one query
with millions of hits — never materializes a full group. Never use
collect_list for this (SURVEY §7.3 hard-part 6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Deterministic hit ordering = BLAST result criteria 1,2,5
# (mrblast.cpp:1316-1334) + (sid, qstart) so golden tests are hash-exact
# (SURVEY §7.3 hard-part 2). Lazy: Column objects need a live session.
def hit_order() -> tuple[Column, ...]:
    return (
        F.col("evalue").asc(),
        F.col("bitscore").desc(),
        F.col("ident").desc(),
        F.col("sid").asc(),
        F.col("qstart").asc(),
        # periodic repeats produce hits identical on all of the above
        # except subject position — without this the top-k row set is
        # nondeterministic across runs
        F.col("sstart").asc(),
    )


def topk_per_key(df: DataFrame, keys: Sequence[str],
                 order: Sequence[Column], k: int,
                 rank_col: str = "rank") -> DataFrame:
    """Keep the first k rows per key group under a total order.

    k <= 0 means "keep all" (NUMHITCUTOFF=0 semantics,
    doc/USERGUIDE:325-327) — rows still get their rank.
    """
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order)
    ranked = df.withColumn(rank_col, F.row_number().over(w))
    if k > 0:
        ranked = ranked.filter(F.col(rank_col) <= k)
    return ranked


def top_hits(hits: DataFrame, cutoff: int) -> DataFrame:
    """NUMHITCUTOFF over the canonical hit table (O2 + O3)."""
    return topk_per_key(hits, ["qid"], hit_order(), cutoff).drop("rank")
