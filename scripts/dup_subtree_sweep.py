#!/usr/bin/env python
"""Sweep every declared query's physical plan for duplicated
aggregate/join detail signatures (expression ids stripped) — the
pattern behind the round's two best finds."""
import os, re, sys, collections
sys.path.insert(0, "/root/repo")
import __spark_entry__ as e
from mr_mpi_blast_spark.session import get_spark

spark = get_spark("dup_sweep")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs = e.queries()
strip = lambda s: re.sub(r"#\d+[L]?", "#", s)
findings = []
for name, fn in sorted(qs.items()):
    try:
        df = fn(spark, sf_dir)
        s = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
    except Exception as ex:
        print(f"SKIP {name}: {type(ex).__name__}", flush=True)
        continue
    # collect detail blocks: "(n) OpName ...\nKey: val..." until blank
    blocks = re.split(r"\n\n", s)
    sigs = collections.Counter()
    for b in blocks:
        m = re.match(r"\((\d+)\) (HashAggregate|ObjectHashAggregate|SortAggregate)\b", b)
        if not m:
            continue
        body = strip(re.sub(r"^\(\d+\) ", "", b))
        # only 'final' aggregates (keys+functions) - partial+final pairs
        # of ONE aggregate share text; dedupe by (op, keys, functions)
        keys = re.search(r"Keys \[.*?\]: (\[.*?\])", body, re.S)
        fns = re.search(r"Functions \[.*?\]: (\[.*?\])", body, re.S)
        if keys and fns:
            sigs[(m.group(2), keys.group(1), fns.group(1))] += 1
    dups = {k: c for k, c in sigs.items() if c > 2}  # >2: partial+final = 2 is normal
    if dups:
        findings.append((name, dups))
        print(f"DUP {name}: " + "; ".join(
            f"{op} x{c} keys={k[:60]} fns={f[:60]}"
            for (op, k, f), c in dups.items()), flush=True)
print(f"done: {len(findings)} queries with >2x repeated aggregate signatures")
