"""Change-data-capture operators: snapshot diff and changeset apply
(MERGE/upsert semantics).

A 100 TB warehouse is maintained incrementally: yesterday's snapshot
plus today's changeset, reconciled by key — the MERGE INTO of every
lakehouse engine, and the inverse question (what changed between two
snapshots?) that backfills and audits ask. Both are pure key-equi
shuffles here: no windows, no collects, per-key state is one row.

Column comparison uses IS DISTINCT FROM (null-safe inequality) per
column — never a rendered-string row hash, whose double/timestamp
formatting is engine-specific (the house determinism discipline:
compare values, not renderings).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_cols: list[str]) -> DataFrame:
    """Classify every key across two snapshots of the same schema:
    'added' (key only in new), 'removed' (only in old), 'changed'
    (present in both with any non-key column differing, counted in
    n_changed_cols). Unchanged keys are not emitted — the output is
    changeset-sized, not snapshot-sized.

    ONE full-outer sort-merge/hash join on the key (both sides
    shuffle once on the key; at scale bucket both snapshots on it and
    the diff is exchange-free — operators/bucketing.py). Comparisons
    are null-safe per column, no rendering.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    val_cols = [c for c in old.columns if c not in key_cols]
    if set(old.columns) != set(new.columns):
        raise ValueError(f"schema mismatch: {old.columns} vs {new.columns}")
    o = old.select(*key_cols,
                   F.lit(True).alias("_in_old"),
                   *[F.col(c).alias(f"_o_{c}") for c in val_cols])
    n = new.select(*key_cols,
                   F.lit(True).alias("_in_new"),
                   *[F.col(c).alias(f"_n_{c}") for c in val_cols])
    j = o.join(n, key_cols, "full_outer")
    ndiff = reduce(
        lambda a, b: a + b,
        [F.expr(f"_o_{c} IS DISTINCT FROM _n_{c}").cast("int")
         for c in val_cols],
        F.lit(0))
    return (j.select(
        *key_cols,
        F.when(F.col("_in_old").isNull(), F.lit("added"))
         .when(F.col("_in_new").isNull(), F.lit("removed"))
         .when(ndiff > 0, F.lit("changed"))
         .otherwise(F.lit("unchanged")).alias("change_type"),
        F.when(F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull(),
               ndiff).otherwise(F.lit(0)).cast("long")
         .alias("n_changed_cols"))
        .filter(F.col("change_type") != "unchanged"))


def apply_changeset(target: DataFrame, changes: DataFrame,
                    key_cols: list[str], op_col: str = "op",
                    validate: bool = True,
                    assert_unique_keys: bool = False) -> DataFrame:
    """MERGE: apply a CDC changeset to a snapshot. ``changes`` carries
    ``op_col`` in {'I','U','D'}: D removes the key, U replaces the
    key's row wholesale, I adds a new row. A key may appear at most
    once in the changeset (upstream compaction's contract).

    Contract enforcement (r10 advisory closure — silently DROPPING a
    row with a typo'd op code is the CDC equivalent of data loss):

    - ``validate=True`` (default) probes the changeset for op codes
      outside {'I','U','D'} and raises ValueError naming them. The
      probe is one job over the CHANGESET only (changeset-sized by
      definition, never the target) and collects at most 5 rows.
    - ``assert_unique_keys=True`` (debug mode) additionally raises if
      any key appears in more than one changeset row — the
      at-most-once contract this MERGE depends on (a duplicate would
      both upsert twice and make the result order-dependent). Also
      changeset-sized; off by default because upstream compaction
      already guarantees it in production.

    Shape: one anti-join of the target against the U/D key set (the
    only part that touches the big table, key-equi, broadcastable
    when the changeset is small — the common case) + a union of the
    U/I payload rows. No target row is rewritten in place; this is
    exactly the copy-on-write MERGE of a lakehouse table format.
    """
    data_cols = [c for c in changes.columns if c != op_col]
    if set(data_cols) != set(target.columns):
        raise ValueError(
            f"changeset columns {sorted(data_cols)} must match target "
            f"{sorted(target.columns)} plus '{op_col}'")
    if validate:
        # NULL op must be caught too: ~isin(...) is NULL (not TRUE)
        # for a NULL op under three-valued logic, which would slip
        # through this probe and still be dropped by the merge below
        bad = (changes.filter(~F.col(op_col).isin("I", "U", "D")
                              | F.col(op_col).isNull())
               .select(op_col).limit(5).collect())
        if bad:
            codes = sorted({repr(r[op_col]) for r in bad})
            raise ValueError(
                f"apply_changeset: unknown op code(s) {codes} in "
                f"'{op_col}' (expected 'I'/'U'/'D'); refusing to "
                f"silently drop changeset rows")
    if assert_unique_keys:
        dup = (changes.groupBy(*key_cols)
               .agg(F.count(F.lit(1)).alias("_n"))
               .filter(F.col("_n") > 1).limit(5).collect())
        if dup:
            keys = [tuple(r[k] for k in key_cols) for r in dup]
            raise ValueError(
                f"apply_changeset: key(s) {keys} appear more than once "
                f"in the changeset — the at-most-one-row-per-key MERGE "
                f"contract is violated (compact upstream first)")
    touched = (changes.filter(F.col(op_col).isin("U", "D"))
               .select(*key_cols))
    kept = target.join(touched, key_cols, "left_anti")
    upserts = (changes.filter(F.col(op_col).isin("U", "I"))
               .select(*target.columns))
    return kept.unionByName(upserts)
