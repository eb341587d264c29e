"""Z-order layout (operators/layout.py): Morton bijectivity, the
bounded-both-dims pruning property vs a single-key layout, and the
inclusive time-RANGE frame of events_rolling."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mr_mpi_blast_spark.operators.layout import (zorder_file_stats,
                                                 zorder_sql, zvalue)


def _interleave(x, y, bits):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_bijective_on_grid(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.z for r in
           df.select("x", "y", zvalue("x", "y", 4).alias("z")).collect()}
    assert sorted(got.values()) == list(range(256))
    for (x, y), z in got.items():
        assert z == _interleave(x, y, 4)


def test_zorder_bounds_both_dims(spark):
    """On a 64x64 grid with 64-z-unit files, every z-order file is an
    aligned 8x8 block: BOTH dimension spans are 7. The x-major layout
    of the same data bounds x only — its y span stays the full 63.
    This is the pruning claim, asserted, not narrated."""
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    stats = zorder_file_stats(df, "x", "y", bits=6,
                              file_width_bits=6).collect()
    assert len(stats) == 64
    for r in stats:
        assert r.n_rows == 64
        assert r.max_x - r.min_x == 7 and r.max_y - r.min_y == 7
    xmajor = (df.groupBy(F.expr("x div 8").alias("file_id"))
              .agg(F.min("y").alias("min_y"), F.max("y").alias("max_y"))
              .collect())
    assert all(r.max_y - r.min_y == 63 for r in xmajor)


def test_zorder_sql_validation():
    with pytest.raises(ValueError, match="bits"):
        zorder_sql("x", "y", 0, "div")
    with pytest.raises(ValueError, match="bits"):
        zorder_sql("x", "y", 32, "//")


def test_zvalue_negative_input_fails_loudly(spark):
    """r10 advisory closure: engine %/div semantics on negatives make
    the interleave silently non-monotonic, so the checked default must
    raise executor-side instead of emitting a wrong curve value;
    checked=False opts out where the domain is proven."""
    df = spark.createDataFrame([(3, -1)], "x long, y long")
    with pytest.raises(Exception, match="zorder: negative input"):
        df.select(zvalue("x", "y", 4).alias("z")).collect()
    # opt-out still computes (documented caller responsibility)
    df.select(zvalue("x", "y", 4, checked=False).alias("z")).collect()
    # the guard passes cleanly on the non-negative domain
    ok = spark.createDataFrame([(3, 1)], "x long, y long")
    assert ok.select(zvalue("x", "y", 4).alias("z")).collect()[0].z \
        == _interleave(3, 1, 4)


def test_zvalue_null_input_fails_loudly(spark):
    """r11 advisory closure: `x < 0 OR y < 0` is NULL (not true) for a
    NULL dimension, so without an explicit IS NULL arm a NULL input
    slid to the ELSE branch and produced a silently-NULL z that
    zorder_file_stats binned NULLS-FIRST. The checked form must raise
    instead; checked=False keeps the documented raw passthrough."""
    df = spark.createDataFrame([(3, None)], "x long, y long")
    with pytest.raises(Exception, match="zorder: NULL dimension"):
        df.select(zvalue("x", "y", 4).alias("z")).collect()
    # opt-out: raw expression NULL-propagates (engine arithmetic)
    assert df.select(zvalue("x", "y", 4, checked=False).alias("z")) \
        .collect()[0].z is None


def test_rolling_range_inclusive_boundary(spark):
    from mr_mpi_blast_spark.operators.temporal import epoch_us
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        Row(event_id=1, user_id=1, ts=base, value=1.0),
        # exactly 3600s later: still inside the trailing hour (RANGE
        # bounds are inclusive both ends)
        Row(event_id=2, user_id=1,
            ts=base + dt.timedelta(seconds=3600), value=2.0),
        # one microsecond past: event 1 falls out
        Row(event_id=3, user_id=1,
            ts=base + dt.timedelta(seconds=3600, microseconds=1),
            value=4.0),
    ]
    ev = spark.createDataFrame(rows)
    from pyspark.sql import Window
    us = epoch_us(ev, "ts")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    w = (Window.partitionBy("user_id").orderBy(F.col("us"))
         .rangeBetween(-3_600_000_000, 0))
    got = {r.event_id: (r.n, r.c) for r in
           ev.select("event_id", "user_id", us.alias("us"),
                     cents.alias("cents"))
             .withColumn("n", F.count(F.lit(1)).over(w))
             .withColumn("c", F.sum("cents").over(w))
             .collect()}
    assert got == {1: (1, 100), 2: (2, 300), 3: (2, 600)}


def test_pruned_read_skips_files_and_matches_full_scan(spark, tmp_path):
    """r11: the manifest-driven scan must (a) open strictly fewer
    files than the full layout on a selective range predicate, (b)
    stay value-identical to the full scan once the exact predicate is
    re-applied (pruning is conservative by construction)."""
    from mr_mpi_blast_spark.operators.layout import (
        pruned_read, write_zorder_layout, zorder_manifest)
    rows = [(i, i % 97, (i * 7) % 31, f"p{i}") for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, x long, y long, s string")
    layout = str(tmp_path / "zl")
    write_zorder_layout(df, "x", "y", layout, target_files=32)
    manifest = zorder_manifest(spark, layout, "x", "y")
    got, kept, total = pruned_read(spark, layout, manifest,
                                   x_range=(10, 20), y_range=(0, 8))
    assert 1 <= kept < total, (kept, total)
    # physical pin: the PLAN's input file set is the surviving cells',
    # strictly smaller than the full layout's — bytes actually skipped,
    # not just a smaller path list on the python side
    full_files = set(spark.read.parquet(layout).inputFiles())
    got_files = set(got.inputFiles())
    assert got_files < full_files
    assert len({f.rsplit("/", 2)[-2] for f in got_files}) == kept
    pred = "x BETWEEN 10 AND 20 AND y BETWEEN 0 AND 8"
    want = sorted(r.id for r in df.filter(pred).collect())
    assert sorted(r.id for r in got.filter(pred).collect()) == want
    # an impossible envelope prunes everything and returns empty
    none, kept0, _ = pruned_read(spark, layout, manifest,
                                 x_range=(10_000, 20_000))
    assert kept0 == 0 and none.count() == 0


def test_pruned_read_bloom_point_lookup(spark, tmp_path):
    """Bloom-point pruning is one-sided: a present key's cells always
    survive (value parity), an absent key prunes to ~nothing (no
    K-fold collision at this size)."""
    from mr_mpi_blast_spark.operators.layout import (
        pruned_read, write_zorder_layout, zorder_manifest)
    rows = [(i, i % 53, (i * 11) % 29, i % 500) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, x long, y long, k long")
    layout = str(tmp_path / "zlb")
    write_zorder_layout(df, "x", "y", layout, target_files=16)
    manifest = zorder_manifest(spark, layout, "x", "y", bloom_col="k")
    got, kept, total = pruned_read(spark, layout, manifest,
                                   bloom_point=123)
    want = sorted(r.id for r in df.filter("k = 123").collect())
    assert sorted(r.id for r in got.filter("k = 123").collect()) == want
    absent, kept_a, _ = pruned_read(spark, layout, manifest,
                                    bloom_point=99_999)
    assert kept_a < total  # non-member prunes (collisions permitted)
    assert absent.filter("k = 99999").count() == 0


def test_pruned_read_bloom_point_type_and_quote_safety(spark, tmp_path):
    """r11 review regressions: non-int/str probes are rejected loudly
    (their repr need not match Spark's rendering); a quoted string key
    must not break expression parsing."""
    from mr_mpi_blast_spark.operators.layout import (
        pruned_read, write_zorder_layout, zorder_manifest)
    rows = [(i, i % 7, i % 5, f"k'{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long, k string")
    layout = str(tmp_path / "zq")
    write_zorder_layout(df, "x", "y", layout, target_files=4)
    manifest = zorder_manifest(spark, layout, "x", "y", bloom_col="k")
    got, kept, total = pruned_read(spark, layout, manifest,
                                   bloom_point="k'123")
    assert [r.id for r in got.filter("k = \"k'123\"").collect()] == [123]
    with pytest.raises(TypeError, match="int or str"):
        pruned_read(spark, layout, manifest, bloom_point=1.5)
    with pytest.raises(TypeError, match="int or str"):
        pruned_read(spark, layout, manifest, bloom_point=True)


def test_write_zorder_layout_empty_input_fails_loudly(spark, tmp_path):
    from mr_mpi_blast_spark.operators.layout import write_zorder_layout
    empty = spark.createDataFrame([], "x long, y long")
    with pytest.raises(ValueError, match="empty"):
        write_zorder_layout(empty, "x", "y", str(tmp_path / "ze"))


def test_layout_append_and_manifest_upsert(spark, tmp_path):
    """r11: appending through the stored curve parameters lands rows
    in the right cells (including brand-new cells past the original
    domain), touches only delta cells, and the incremental manifest
    upsert is row-for-row equal to a from-scratch manifest. Pruned
    reads over the appended layout stay value-identical to a full
    scan of base+delta."""
    from mr_mpi_blast_spark.operators.layout import (
        append_to_zorder_layout, pruned_read, upsert_zorder_manifest,
        write_zorder_layout, zorder_manifest)
    base = spark.createDataFrame(
        [(i, i % 37, (i * 3) % 23, i % 100) for i in range(2000)],
        "id long, x long, y long, k long")
    layout = str(tmp_path / "za")
    write_zorder_layout(base, "x", "y", layout, target_files=16)
    man0 = zorder_manifest(spark, layout, "x", "y", bloom_col="k")
    # delta includes values past the base domain -> new cells
    delta = spark.createDataFrame(
        [(10_000 + i, 37 + i % 10, 23 + i % 7, 100 + i % 9)
         for i in range(300)],
        "id long, x long, y long, k long")
    touched = append_to_zorder_layout(delta, layout)
    assert touched, "delta must touch at least one cell"
    man1 = upsert_zorder_manifest(spark, layout, man0, touched,
                                  "x", "y", bloom_col="k")
    fresh = zorder_manifest(spark, layout, "x", "y", bloom_col="k")
    a = sorted(map(tuple, man1.collect()))
    b = sorted(map(tuple, fresh.collect()))
    assert a == b
    # upsert really is incremental: untouched cells' rows are REUSED
    kept0 = {r.zcell: r.n_rows for r in man0.collect()}
    kept1 = {r.zcell: r.n_rows for r in man1.collect()}
    untouched = set(kept0) - set(touched)
    assert untouched and all(kept1[c] == kept0[c] for c in untouched)
    # pruned read over the appended layout == full union scan
    got, kept, total = pruned_read(spark, layout, man1,
                                   x_range=(38, 46))
    assert 1 <= kept < total
    pred = "x BETWEEN 38 AND 46"
    want = sorted(r.id for r in base.filter(pred).collect()) \
        + sorted(r.id for r in delta.filter(pred).collect())
    assert sorted(r.id for r in got.filter(pred).collect()) \
        == sorted(want)
    # bloom manifest over appended data: a delta-only key still found
    got2, kept2, _ = pruned_read(spark, layout, man1, bloom_point=105)
    assert sorted(r.id for r in got2.filter("k = 105").collect()) \
        == sorted(r.id for r in delta.filter("k = 105").collect())
    # appending to a meta-less dir fails loudly
    import pytest as _pytest
    bare = str(tmp_path / "bare")
    base.limit(5).write.mode("overwrite").parquet(bare)
    with _pytest.raises(FileNotFoundError, match="layout_meta"):
        append_to_zorder_layout(delta, bare)


def test_compact_zorder_cells(spark, tmp_path):
    """r11: compaction rewrites multi-file cells to one file each,
    leaves values and the manifest untouched, skips already-compact
    cells (metadata-sized check), and never touches unlisted cells."""
    import os

    from mr_mpi_blast_spark.operators.layout import (
        append_to_zorder_layout, compact_zorder_cells,
        write_zorder_layout, zorder_manifest)
    base = spark.createDataFrame(
        [(i, i % 31, (i * 5) % 17) for i in range(1500)],
        "id long, x long, y long")
    layout = str(tmp_path / "zc")
    write_zorder_layout(base, "x", "y", layout, target_files=8)
    # three appends -> multiple files per touched cell
    touched = set()
    for s in range(3):
        d = spark.createDataFrame(
            [(5000 + s * 100 + i, i % 31, (i * 5) % 17)
             for i in range(100)], "id long, x long, y long")
        touched.update(append_to_zorder_layout(d, layout))
    touched = sorted(touched)

    def files_in(c):
        d = os.path.join(layout, f"zcell={c}")
        return [f for f in os.listdir(d) if f.startswith("part-")]

    assert any(len(files_in(c)) > 1 for c in touched)
    before_vals = sorted(r.id for r in spark.read.parquet(layout).collect())
    man_before = sorted(map(tuple,
                            zorder_manifest(spark, layout, "x", "y")
                            .collect()))
    untouched_cells = [r.zcell for r in
                       zorder_manifest(spark, layout, "x", "y")
                       .select("zcell").collect()
                       if r.zcell not in touched]
    untouched_files = {c: files_in(c) for c in untouched_cells}

    done = compact_zorder_cells(spark, layout, touched)
    assert set(done) <= set(touched) and done
    for c in touched:
        assert len(files_in(c)) == 1, (c, files_in(c))
    # values and manifest identical; unlisted cells untouched
    assert sorted(r.id for r in
                  spark.read.parquet(layout).collect()) == before_vals
    assert sorted(map(tuple, zorder_manifest(spark, layout, "x", "y")
                      .collect())) == man_before
    assert {c: files_in(c) for c in untouched_cells} == untouched_files
    # second call: nothing to do (already compact)
    assert compact_zorder_cells(spark, layout, touched) == []
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="no cell"):
        compact_zorder_cells(spark, layout, [99_999])
