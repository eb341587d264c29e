"""Skew probe: measure how the engine's top-k tail and defline join
behave on an ACTUALLY skewed kernel workload (one hot query with ~50x
the hits of every other query — the shape the reference balances by
hand with its Allreduce hit histogram, mrblast.cpp:556-575).

Three measurements, printed as one JSON line and recorded in PLANS.md:

1. `topk_grouplimit_*` — the production tail (`top_hits`, a
   row_number window + rank filter). Catalyst plans a WindowGroupLimit
   that applies the cutoff on the MAP side, so the hot key ships at
   most maps*k rows into its reduce task instead of all of them.
   Per-task time spread (median/max from the UI REST API) shows the
   reduce stage stays balanced even with the hot key present.
2. `window_nolimit_*` — counterfactual: the same window with an extra
   full-group aggregate, which legally blocks the group-limit pushdown
   so every hot-key row crosses the shuffle into ONE task. Its
   max/median task-time spread is the skew cost the production plan
   avoids.
3. AQE skew-join: hits JOIN deflines on qid as a sort-merge join with
   AQE skew splitting enabled. Thresholds are lowered to the probe's
   MB-scale shuffle (factor 2 / 256k floor — production partitions in
   the 100s-of-MB clear the 256 MB defaults at the same ratio); the
   executed plan's metrics must report skewed partitions > 0 — the
   runtime analog of the reference's histogram routing.

Run: python scripts/skew_probe.py  (local[32], ~1 min)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_QIDS = 200
ROWS_PER_QID = 20_000
HOT_FACTOR = 50          # hot qid carries 50x a normal qid's hits
K = 25                   # NUMHITCUTOFF


def synth_hits(spark: SparkSession, hot: bool) -> DataFrame:
    """Deterministic synthetic hit table in the canonical hit shape.
    hot=True plants qid 0 with HOT_FACTOR*ROWS_PER_QID rows."""
    base = spark.range(N_QIDS * ROWS_PER_QID).select(
        (F.col("id") % N_QIDS).alias("qid"), F.col("id"))
    if hot:
        extra = spark.range((HOT_FACTOR - 1) * ROWS_PER_QID).select(
            F.lit(0).cast("long").alias("qid"),
            (F.col("id") + N_QIDS * ROWS_PER_QID).alias("id"))
        base = base.unionByName(extra)
    return base.select(
        "qid",
        F.concat(F.lit("s_"), (F.col("id") % 977).cast("string")).alias("sid"),
        (F.pmod(F.xxhash64("id"), F.lit(10_000)) / F.lit(1e7)).alias("evalue"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(500)) + 30.0).alias("bitscore"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(60)) + 40.0).alias("ident"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(900)).cast("int").alias("qstart"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(900)).cast("int").alias("sstart"),
    ).repartition(32, "id").drop("id")


class UiProbe:
    """Task-level spread and SQL metrics via the driver's UI REST API
    (task durations are not exposed through the PySpark status
    tracker)."""

    def __init__(self, spark: SparkSession):
        self.ui = spark.sparkContext.uiWebUrl
        self.app = spark.sparkContext.applicationId

    def _get(self, path: str):
        url = f"{self.ui}/api/v1/applications/{self.app}{path}"
        return json.load(urllib.request.urlopen(url))

    def max_stage_id(self) -> int:
        stages = self._get("/stages")
        return max((s["stageId"] for s in stages), default=-1)

    def reduce_task_spread(self, after_stage: int) -> dict:
        """(median, max) executorRunTime of the heaviest shuffle-READING
        multi-task stage that ran after the watermark — for these
        probes, the window/reduce stage."""
        stages = self._get("/stages?status=complete")
        best = {"med_ms": 0.0, "max_ms": 0.0, "stage": -1, "tasks": 0}
        for s in stages:
            # the window runs in the stage that READS the shuffle; the
            # map (shuffle-write) stage is uniform by construction
            # >= 2 tasks: AQE coalescing can shrink the reduce side
            # to a handful of tasks at probe scale
            if (s["stageId"] <= after_stage or s["numCompleteTasks"] < 2
                    or s.get("shuffleReadBytes", 0) <= 0):
                continue
            q = self._get(f"/stages/{s['stageId']}/0/taskSummary"
                          "?quantiles=0.5,1.0")
            med, mx = q["executorRunTime"]
            if mx > best["max_ms"]:
                best = {"med_ms": med, "max_ms": mx,
                        "stage": s["stageId"],
                        "tasks": s["numCompleteTasks"]}
        return best

    def skew_metrics(self) -> tuple[int, int]:
        """(skewed partitions, splits) summed over all SQL executions."""
        parts = splits = 0
        for ex in self._get("/sql?details=true&planDescription=false"):
            for node in ex.get("nodes", []):
                for m in node.get("metrics", []):
                    name = m["name"].lower()
                    if name == "number of skewed partitions":
                        parts += int(m["value"].replace(",", ""))
                    elif name == "number of skewed partition splits":
                        splits += int(m["value"].replace(",", ""))
        return parts, splits


def main() -> None:
    from mr_mpi_blast_spark.operators.topk import hit_order, top_hits
    from mr_mpi_blast_spark.session import get_spark

    spark = get_spark("skew_probe", extra_conf={
        "spark.ui.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
    })
    ui = UiProbe(spark)
    out: dict = {"n_qids": N_QIDS, "rows_per_qid": ROWS_PER_QID,
                 "hot_factor": HOT_FACTOR, "k": K}

    hits_hot = synth_hits(spark, hot=True).localCheckpoint()
    hits_uni = synth_hits(spark, hot=False).localCheckpoint()
    out["rows_hot"] = hits_hot.count()
    out["rows_uniform"] = hits_uni.count()

    def measure(tag: str, build, src: DataFrame) -> None:
        build(src).count()                      # codegen/stage warmup
        mark = ui.max_stage_id()
        t0 = time.time()
        build(src).count()
        out[f"{tag}_s"] = round(time.time() - t0, 3)
        spread = ui.reduce_task_spread(mark)
        out[f"{tag}_task_med_ms"] = spread["med_ms"]
        out[f"{tag}_task_max_ms"] = spread["max_ms"]

    # --- 1. production tail: WindowGroupLimit (map-side cutoff) ------
    explained = (top_hits(hits_hot, K)._jdf.queryExecution()
                 .optimizedPlan().toString())
    out["grouplimit_in_plan"] = "WindowGroupLimit" in explained
    measure("topk_grouplimit_hot", lambda d: top_hits(d, K), hits_hot)
    measure("topk_grouplimit_uniform", lambda d: top_hits(d, K), hits_uni)

    # --- 2. counterfactual: group limit blocked, full rows shuffle ---
    def window_nolimit(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("qid").orderBy(*hit_order())
        # the full-group count() needs every row of the group, which
        # blocks the rank-filter pushdown: the hot group's rows all
        # cross the shuffle into one task (the pre-optimization shape)
        # grp_n participates in the FILTER so column pruning cannot
        # drop it (a bare projection would be pruned under count(),
        # silently un-blocking the pushdown)
        return (df.withColumn("rank", F.row_number().over(w))
                  .withColumn("grp_n", F.count(F.lit(1)).over(w.rowsBetween(
                      Window.unboundedPreceding, Window.unboundedFollowing)))
                  .filter((F.col("rank") <= K) & (F.col("grp_n") >= 0)))

    measure("window_nolimit_hot", window_nolimit, hits_hot)
    measure("window_nolimit_uniform", window_nolimit, hits_uni)

    # --- 3. AQE skew-join on the defline merge-join ------------------
    deflines = spark.range(N_QIDS).select(
        F.col("id").alias("qid"),
        F.concat(F.lit("query def "), F.col("id")).alias("qdef"))
    joined = hits_hot.join(deflines.hint("merge"), "qid")
    t0 = time.time()
    out["skewjoin_rows"] = joined.count()
    out["skewjoin_s"] = round(time.time() - t0, 3)
    parts, splits = ui.skew_metrics()
    out["skewed_partitions"] = parts
    out["skew_splits"] = splits

    print(json.dumps(out))


if __name__ == "__main__":
    main()
