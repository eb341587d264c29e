"""2-D skyline (Pareto-optimal rows) — beyond-reference OLAP operator
(the retrieved-paper corpus names it: "LShape Partitioning: Parallel
Skyline Query Processing using MapReduce", ICDE 2021; this module is
the classic two-phase local-prune/global-merge shape, not that paper's
grid variant).

Definition (both dimensions MINIMIZED): row r is in the skyline iff no
row s exists with s.d1 <= r.d1 AND s.d2 <= r.d2 AND (s.d1 < r.d1 OR
s.d2 < r.d2). Exact duplicates on both dims tie (neither strictly
better) and ALL survive. The skyline is a unique SET independent of
algorithm, which is what makes an independent NOT-EXISTS oracle a
strong check of this sweep implementation.

100 TB shape: the quadratic NOT-EXISTS form is the oracle, never the
plan. Phase 1 prunes each Arrow batch to its LOCAL skyline with an
O(n log n) sort-sweep — correct to prune with because dominance
within any subset implies dominance globally, so no global-skyline
row is ever dropped — and for data that isn't adversarially
anti-correlated the local skylines are tiny (O(log n) expected for
independent dims). Phase 2 runs the same sweep once over the union of
local skylines as ONE group (applyInPandas on a constant key: the
grouped form is what guarantees a single complete pandas frame —
mapInPandas on a coalesced partition may still arrive as several
Arrow batches). The phase-2 single task is the standard skyline
merge bottleneck; it is union-of-local-skylines-sized, not
corpus-sized. NULL and NaN dims are both excluded up front
(dominance needs ordered values, and NaN comparison semantics differ
across engines — numpy makes NaN incomparable while DuckDB's total
order puts it above everything, so admitting NaN rows would make the
engine and the NOT-EXISTS oracle disagree), documented rather than
guessed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sweep(pdf: pd.DataFrame, d1: str, d2: str) -> pd.DataFrame:
    """O(n log n) exact 2-D skyline of one pandas frame, both dims
    minimized. Sorted by (d1, d2): a row survives iff its d2 equals
    its d1-group minimum (same-d1 rows with larger d2 are dominated;
    equal d2 ties all survive) AND that d2 is STRICTLY below the
    running min over all smaller-d1 groups (an equal d2 there belongs
    to a row with strictly smaller d1, which dominates)."""
    if not len(pdf):
        return pdf
    d1v = pdf[d1].to_numpy()
    d2v = pdf[d2].to_numpy()
    order = np.lexsort((d2v, d1v))
    d1s, d2s = d1v[order], d2v[order]
    newgrp = np.r_[True, d1s[1:] != d1s[:-1]]
    gmin = d2s[newgrp]                       # per-group min (first, sorted)
    gidx = np.cumsum(newgrp) - 1
    # prefix STRICT min over earlier groups, in the NATIVE dtype: an
    # inf sentinel would upcast int64 minima to float64 and corrupt
    # dominance above 2^53 (2^53+1 rounds to 2^53.0) — the first group
    # has no predecessors, so it is handled by mask instead
    acc = np.minimum.accumulate(gmin)
    pmin = np.r_[gmin[:1], acc[:-1]]
    keep = (d2s == gmin[gidx]) & ((gidx == 0) | (d2s < pmin[gidx]))
    return pdf.iloc[order[keep]]


def skyline_2d(df: DataFrame, d1: str, d2: str) -> DataFrame:
    """Pareto-optimal rows of ``df`` minimizing (d1, d2); see module
    docstring for the definition, the two-phase plan shape, and the
    NULL/NaN policy. To MAXIMIZE a dimension, negate it in a
    projection first. Returns the input columns unchanged."""
    cols = df.columns

    def ordered(c):
        # isnan is only defined on float types; integer dims skip it
        col = F.col(c)
        if dict(df.dtypes)[c] in ("double", "float"):
            return col.isNotNull() & ~F.isnan(col)
        return col.isNotNull()

    src = df.filter(ordered(d1) & ordered(d2))
    schema = src.schema

    def local(batches):
        for pdf in batches:
            yield _sweep(pdf, d1, d2)

    pruned = src.mapInPandas(local, schema=schema)

    def merge(pdf):
        return _sweep(pdf.drop(columns=["_g"]), d1, d2)

    return (pruned.withColumn("_g", F.lit(1))
            .groupBy("_g")
            .applyInPandas(merge, schema=schema)
            .select(*cols))
