"""Skew-mitigation join: deterministic salting.

The reference balanced skewed reduce keys by hand: it histograms hits
per query with an Allreduce, then routes keys so every rank gets
~equal hit mass (mrblast.cpp:556-575). Spark's runtime answer is AQE
skew-join splitting (on in session.py); this module is the PLANNED
analog for when the skew is known ahead of time — e.g. a fact table
where a handful of join keys carry most rows, which AQE can only fix
after materializing the oversized partitions once.

Salting splits each fact key's rows across ``salt_mod`` sub-keys via
a deterministic per-row hash and replicates the (small-but-not-
broadcastable) dim side once per salt value: the join key becomes
(key, salt), so a hot key's rows land on ``salt_mod`` tasks instead of
one. Replication factor is salt_mod x |dim| — choose salt_mod ~ the
worst key's row share over the mean, not larger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                dim_key: str, row_key: str, salt_mod: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join fact x dim on (key, salt): the fact side salts each
    row by hashing its ``row_key`` (deterministic — reruns place rows
    identically); the dim side is exploded once per salt value. The
    merge hint opts out of broadcast so the pattern is exercised even
    when the dim fits the broadcast threshold (its purpose is the
    broadcast-too-big case). Result rows are exactly the plain join's
    (salt is dropped).

    Only fact-side-preserving join types are accepted: the dim side is
    replicated once per salt value, so a right/full outer join would
    emit every UNMATCHED dim row salt_mod times — silently wrong rows,
    not a perf trade. Flip the sides (or dedupe afterwards) for
    dim-preserving semantics."""
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if how.lower().replace("_", "") not in {a.replace("_", "")
                                            for a in allowed}:
        raise ValueError(
            f"salted_join: join type {how!r} is not fact-side-"
            f"preserving; the salt-replicated dim side would duplicate "
            f"unmatched dim rows. Supported: inner, left, left_semi, "
            f"left_anti")
    f = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(row_key)), F.lit(salt_mod)))
    d = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("long"),
                             F.lit(salt_mod - 1).cast("long"))))
    joined = f.join(
        d.hint("merge"),
        (f[fact_key] == d[dim_key]) & (f["_salt"] == d["_salt"]), how)
    return joined.drop("_salt")
