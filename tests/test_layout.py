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
    """r11/r12: the manifest-driven scan must (a) open strictly fewer
    files than the full layout on a selective range predicate, (b)
    stay value-identical to the full scan once the exact predicate is
    re-applied (pruning is conservative by construction)."""
    from mr_mpi_blast_spark.operators.layout import (
        pruned_read, write_zorder_layout)
    rows = [(i, i % 97, (i * 7) % 31, f"p{i}") for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, x long, y long, s string")
    layout = str(tmp_path / "zl")
    assert write_zorder_layout(df, "x", "y", layout,
                               target_files=32) == 1
    got, kept, total = pruned_read(spark, layout,
                                   x_range=(10, 20), y_range=(0, 8))
    assert 1 <= kept < total, (kept, total)
    # physical pin: the PLAN's input file set is the surviving cells',
    # strictly smaller than the full layout's — bytes actually skipped,
    # not just a smaller path list on the python side
    full_files = set(spark.read.parquet(f"{layout}/data").inputFiles())
    got_files = set(got.inputFiles())
    assert got_files < full_files
    assert len({f.rsplit("/", 2)[-2] for f in got_files}) == kept
    pred = "x BETWEEN 10 AND 20 AND y BETWEEN 0 AND 8"
    want = sorted(r.id for r in df.filter(pred).collect())
    assert sorted(r.id for r in got.filter(pred).collect()) == want
    # an impossible envelope prunes everything and returns empty,
    # with the same schema as the kept path
    none, kept0, _ = pruned_read(spark, layout,
                                 x_range=(10_000, 20_000))
    assert kept0 == 0 and none.count() == 0
    assert none.schema == got.schema


def test_pruned_read_bloom_point_lookup(spark, tmp_path):
    """Bloom-point pruning is one-sided: a present key's cells always
    survive (value parity), an absent key prunes to ~nothing (no
    K-fold collision at this size). Probe bits come from the stored
    table parameters — a layout written WITHOUT bloom_col refuses the
    probe loudly."""
    from mr_mpi_blast_spark.operators.layout import (
        pruned_read, write_zorder_layout)
    rows = [(i, i % 53, (i * 11) % 29, i % 500) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, x long, y long, k long")
    layout = str(tmp_path / "zlb")
    write_zorder_layout(df, "x", "y", layout, target_files=16,
                        bloom_col="k")
    got, kept, total = pruned_read(spark, layout, bloom_point=123)
    want = sorted(r.id for r in df.filter("k = 123").collect())
    assert sorted(r.id for r in got.filter("k = 123").collect()) == want
    absent, kept_a, _ = pruned_read(spark, layout, bloom_point=99_999)
    assert kept_a < total  # non-member prunes (collisions permitted)
    assert absent.filter("k = 99999").count() == 0
    plain = str(tmp_path / "plain")
    write_zorder_layout(df, "x", "y", plain, target_files=4)
    with pytest.raises(ValueError, match="bloom_col"):
        pruned_read(spark, plain, bloom_point=123)


def test_pruned_read_bloom_point_type_and_quote_safety(spark, tmp_path):
    """r11 review regressions: non-int/str probes are rejected loudly
    (their repr need not match Spark's rendering); a quoted string key
    must not break expression parsing."""
    from mr_mpi_blast_spark.operators.layout import (
        pruned_read, write_zorder_layout)
    rows = [(i, i % 7, i % 5, f"k'{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long, k string")
    layout = str(tmp_path / "zq")
    write_zorder_layout(df, "x", "y", layout, target_files=4,
                        bloom_col="k")
    got, kept, total = pruned_read(spark, layout, bloom_point="k'123")
    assert [r.id for r in got.filter("k = \"k'123\"").collect()] == [123]
    with pytest.raises(TypeError, match="int or str"):
        pruned_read(spark, layout, bloom_point=1.5)
    with pytest.raises(TypeError, match="int or str"):
        pruned_read(spark, layout, bloom_point=True)


def test_write_zorder_layout_empty_input_fails_loudly(spark, tmp_path):
    from mr_mpi_blast_spark.operators.layout import write_zorder_layout
    empty = spark.createDataFrame([], "x long, y long")
    with pytest.raises(ValueError, match="empty"):
        write_zorder_layout(empty, "x", "y", str(tmp_path / "ze"))


def test_layout_append_and_manifest_upsert(spark, tmp_path):
    """r11/r12: appending through the stored curve parameters lands
    rows in the right cells (including brand-new cells past the
    original domain), the incremental manifest upsert is row-for-row
    equal to a from-scratch manifest, untouched cells' rows are
    reused verbatim, and the upsert is idempotent (a replayed publish
    of the same append does not double anything)."""
    from mr_mpi_blast_spark.operators.layout import (
        append_to_zorder_layout, pruned_read, read_zorder_manifest,
        upsert_zorder_manifest, write_zorder_layout, zorder_manifest)
    base = spark.createDataFrame(
        [(i, i % 37, (i * 3) % 23, i % 100) for i in range(2000)],
        "id long, x long, y long, k long")
    layout = str(tmp_path / "za")
    write_zorder_layout(base, "x", "y", layout, target_files=16,
                        bloom_col="k")
    man0, v0 = read_zorder_manifest(spark, layout)
    # delta includes values past the base domain -> new cells
    delta = spark.createDataFrame(
        [(10_000 + i, 37 + i % 10, 23 + i % 7, 100 + i % 9)
         for i in range(300)],
        "id long, x long, y long, k long")
    res = append_to_zorder_layout(delta, layout)
    assert res.touched, "delta must touch at least one cell"
    # not yet visible: manifest head unchanged until the upsert
    _, vpre = read_zorder_manifest(spark, layout)
    assert vpre == v0
    v1 = upsert_zorder_manifest(spark, layout, res)
    assert v1 == v0 + 1
    man1, _ = read_zorder_manifest(spark, layout)
    fresh = zorder_manifest(spark, layout)
    a = sorted(map(tuple, man1.collect()))
    b = sorted(map(tuple, fresh.collect()))
    assert a == b
    # upsert really is incremental: untouched cells' rows are REUSED
    kept0 = {r.zcell: r.n_rows for r in man0.collect()}
    kept1 = {r.zcell: r.n_rows for r in man1.collect()}
    untouched = set(kept0) - set(res.touched)
    assert untouched and all(kept1[c] == kept0[c] for c in untouched)
    # idempotent publish: replaying the upsert for the same append id
    # is a no-op (crash-replay arm of the streaming ingest twin)
    assert upsert_zorder_manifest(spark, layout, res) == v1
    assert sorted(map(tuple, read_zorder_manifest(spark, layout)[0]
                      .collect())) == a
    # pruned read over the appended layout == full union scan
    got, kept, total = pruned_read(spark, layout, x_range=(38, 46))
    assert 1 <= kept < total
    pred = "x BETWEEN 38 AND 46"
    want = sorted([r.id for r in base.filter(pred).collect()]
                  + [r.id for r in delta.filter(pred).collect()])
    assert sorted(r.id for r in got.filter(pred).collect()) == want
    # bloom manifest over appended data: a delta-only key still found
    got2, kept2, _ = pruned_read(spark, layout, bloom_point=105)
    assert sorted(r.id for r in got2.filter("k = 105").collect()) \
        == sorted(r.id for r in delta.filter("k = 105").collect())
    # appending to a meta-less dir fails loudly
    bare = str(tmp_path / "bare")
    base.limit(5).write.mode("overwrite").parquet(bare)
    with pytest.raises(FileNotFoundError, match="layout_meta"):
        append_to_zorder_layout(delta, bare)


def test_torn_append_is_invisible_until_published(spark, tmp_path):
    """The committed manifest IS the table: an append whose publish
    never ran (crash between data write and manifest commit) is
    invisible to pruned reads — exactly-once at the read level — and
    gc removes its orphaned files."""
    from mr_mpi_blast_spark.operators.layout import (
        append_to_zorder_layout, gc_zorder_layout, pruned_read,
        write_zorder_layout)
    base = spark.createDataFrame(
        [(i, i % 11, i % 7) for i in range(500)],
        "id long, x long, y long")
    layout = str(tmp_path / "zt")
    write_zorder_layout(base, "x", "y", layout, target_files=8)
    orphan = spark.createDataFrame([(9999, 3, 4)],
                                   "id long, x long, y long")
    append_to_zorder_layout(orphan, layout)      # publish never runs
    got, _, _ = pruned_read(spark, layout)
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in base.collect())
    gone = gc_zorder_layout(spark, layout, keep_versions=1)
    assert gone["files"], "orphan files must be collected"
    got2, _, _ = pruned_read(spark, layout)
    assert got2.count() == 500


def test_compact_zorder_cells_snapshot_isolated(spark, tmp_path):
    """r12: compaction rewrites multi-file cells into ONE NEW file
    each and commits the next manifest version; values and manifest
    stats are untouched, already-compact cells are skipped, and — the
    r11 torn-read race, closed — a reader pinned to the PREVIOUS
    version stays value-identical while and after compaction commits,
    until gc retires its files."""
    from mr_mpi_blast_spark.operators.layout import (
        append_to_zorder_layout, compact_zorder_cells,
        gc_zorder_layout, manifest_versions, pruned_read,
        read_zorder_manifest, upsert_zorder_manifest,
        write_zorder_layout)
    base = spark.createDataFrame(
        [(i, i % 31, (i * 5) % 17) for i in range(1500)],
        "id long, x long, y long")
    layout = str(tmp_path / "zc")
    write_zorder_layout(base, "x", "y", layout, target_files=8)
    touched = set()
    for s in range(3):
        d = spark.createDataFrame(
            [(5000 + s * 100 + i, i % 31, (i * 5) % 17)
             for i in range(100)], "id long, x long, y long")
        res = append_to_zorder_layout(d, layout)
        upsert_zorder_manifest(spark, layout, res)
        touched.update(res.touched)
    touched = sorted(touched)
    man_before, v_before = read_zorder_manifest(spark, layout)
    nfiles = {r.zcell: len(r.files) for r in man_before.collect()}
    assert any(nfiles[c] > 1 for c in touched)
    all_ids = sorted(r.id for r in pruned_read(spark, layout)[0]
                     .collect())
    # pin a reader to the pre-compaction snapshot
    pinned, _, _ = pruned_read(spark, layout, version=v_before)

    done = compact_zorder_cells(spark, layout, touched)
    assert set(done) == {c for c in touched if nfiles[c] > 1}
    man_after, v_after = read_zorder_manifest(spark, layout)
    assert v_after == v_before + 1
    after = {r.zcell: r for r in man_after.collect()}
    for c in done:
        assert len(after[c].files) == 1
    # stats carried verbatim; values identical through the new version
    strip = lambda m: sorted(
        (r.zcell, r.n_rows, r.min_x, r.max_x, r.min_y, r.max_y)
        for r in m.collect())
    assert strip(man_after) == strip(man_before)
    assert sorted(r.id for r in pruned_read(spark, layout)[0]
                  .collect()) == all_ids
    # the PINNED reader still sees a consistent pre-compaction view
    assert sorted(r.id for r in pinned.collect()) == all_ids
    # second call: nothing to do (already compact)
    assert compact_zorder_cells(spark, layout, touched) == []
    with pytest.raises(FileNotFoundError, match="no cell"):
        compact_zorder_cells(spark, layout, [99_999])
    # gc retires the old version and the compacted-away files;
    # the current version still reads identically
    gone = gc_zorder_layout(spark, layout, keep_versions=1)
    assert v_before in gone["manifest_versions"]
    assert gone["files"]
    assert manifest_versions(spark, layout) == [v_after]
    assert sorted(r.id for r in pruned_read(spark, layout)[0]
                  .collect()) == all_ids
    with pytest.raises(ValueError, match="not committed"):
        read_zorder_manifest(spark, layout, version=v_before)


def test_layout_metadata_is_engine_portable():
    """r11 advisory: no driver-local filesystem call may touch
    layout_dir — every metadata read/write goes through Spark or the
    Hadoop FileSystem API, so hdfs:///s3a:// layouts behave like
    local ones. Source-level pin: operators/layout.py must not use
    os.path/os.listdir/open() at all."""
    import re
    src = open("mr_mpi_blast_spark/operators/layout.py").read()
    assert not re.search(r"\bos\.(path|listdir|makedirs|stat)\b", src)
    assert not re.search(r"\bopen\(", src)
    assert "import os" not in src


def test_append_published_is_wildcard_safe(spark, tmp_path):
    """r12 review: append ids like 'run_1' must not LIKE-match a
    committed 'runX1' (silent data loss — the replay guard would skip
    the publish); the check is exact segment equality, and ids
    outside [A-Za-z0-9_.-]+ are rejected before any write."""
    from mr_mpi_blast_spark.operators.layout import (
        append_published, append_to_zorder_layout, pruned_read,
        upsert_zorder_manifest, write_zorder_layout)
    base = spark.createDataFrame([(i, i % 5, i % 3)
                                  for i in range(100)],
                                 "id long, x long, y long")
    layout = str(tmp_path / "zw")
    write_zorder_layout(base, "x", "y", layout, target_files=4)
    d1 = spark.createDataFrame([(900, 1, 1)], "id long, x long, y long")
    upsert_zorder_manifest(
        spark, layout, append_to_zorder_layout(d1, layout,
                                               append_id="runX1"))
    assert append_published(spark, layout, "runX1")
    assert not append_published(spark, layout, "run_1")
    d2 = spark.createDataFrame([(901, 2, 2)], "id long, x long, y long")
    res = append_to_zorder_layout(d2, layout, append_id="run_1")
    upsert_zorder_manifest(spark, layout, res)
    assert sorted(r.id for r in pruned_read(spark, layout)[0]
                  .filter("id >= 900").collect()) == [900, 901]
    with pytest.raises(ValueError, match="plain name"):
        append_to_zorder_layout(d2, layout, append_id="a'b/c")


def test_write_zorder_layout_refuses_reinit(spark, tmp_path):
    """r12 review: initializing over a committed layout must refuse
    BEFORE touching anything — the old behavior overwrote data/a=base
    (deleting files every committed manifest referenced) and only
    then failed the optimistic commit, bricking the table."""
    from mr_mpi_blast_spark.operators.layout import (
        pruned_read, write_zorder_layout)
    df = spark.createDataFrame([(i, i % 5, i % 3) for i in range(50)],
                               "id long, x long, y long")
    layout = str(tmp_path / "zr")
    write_zorder_layout(df, "x", "y", layout, target_files=4)
    with pytest.raises(FileExistsError, match="already an initialized"):
        write_zorder_layout(df, "x", "y", layout, target_files=4)
    # the refusal left the committed table fully readable
    assert pruned_read(spark, layout)[0].count() == 50


def test_gc_default_retention_keeps_pinned_reader_alive(spark, tmp_path):
    """gc with keep_versions=2 (the default) retains the PREVIOUS
    snapshot's files: a reader pinned to v=N-1 stays value-correct
    through a gc that runs right after the v=N commit — the retention
    IS the reader contract."""
    from mr_mpi_blast_spark.operators.layout import (
        append_to_zorder_layout, compact_zorder_cells,
        gc_zorder_layout, manifest_versions, pruned_read,
        read_zorder_manifest, upsert_zorder_manifest,
        write_zorder_layout)
    base = spark.createDataFrame([(i, i % 7, i % 5)
                                  for i in range(300)],
                                 "id long, x long, y long")
    layout = str(tmp_path / "zg2")
    write_zorder_layout(base, "x", "y", layout, target_files=4)
    d = spark.createDataFrame([(900 + i, i % 7, i % 5)
                               for i in range(60)],
                              "id long, x long, y long")
    upsert_zorder_manifest(spark, layout,
                           append_to_zorder_layout(d, layout))
    _, v2 = read_zorder_manifest(spark, layout)
    pinned, _, _ = pruned_read(spark, layout, version=v2)
    want = sorted([r.id for r in base.collect()]
                  + [r.id for r in d.collect()])
    assert compact_zorder_cells(spark, layout)     # commits v3
    gc_zorder_layout(spark, layout)                # default keep=2
    assert manifest_versions(spark, layout) == [v2, v2 + 1]
    # the pinned pre-compaction reader still resolves every file
    assert sorted(r.id for r in pinned.collect()) == want
    # and a fresh pin of the retained old version still plans
    again, _, _ = pruned_read(spark, layout, version=v2)
    assert again.count() == len(want)


def test_fsck_zorder_layout(spark, tmp_path):
    """r12: the snapshot verifier is empty on a consistent layout in
    EVERY lifecycle state (incl. between compaction and gc, where the
    from-scratch zorder_manifest is documented invalid), and reports
    (zcell, field, stored, recomputed) when a manifest row disagrees
    with its own files."""
    from mr_mpi_blast_spark.operators.layout import (
        _commit_manifest, append_to_zorder_layout, compact_zorder_cells,
        fsck_zorder_layout, gc_zorder_layout, read_zorder_manifest,
        upsert_zorder_manifest, write_zorder_layout)
    base = spark.createDataFrame([(i, i % 7, i % 5, i % 40)
                                  for i in range(300)],
                                 "id long, x long, y long, k long")
    layout = str(tmp_path / "zf")
    write_zorder_layout(base, "x", "y", layout, target_files=4,
                        bloom_col="k")
    assert fsck_zorder_layout(spark, layout).count() == 0
    d = spark.createDataFrame([(900 + i, i % 7, i % 5, 40 + i % 3)
                               for i in range(50)],
                              "id long, x long, y long, k long")
    upsert_zorder_manifest(spark, layout,
                           append_to_zorder_layout(d, layout))
    assert fsck_zorder_layout(spark, layout).count() == 0
    compact_zorder_cells(spark, layout)
    # between compaction and gc — zorder_manifest's blind spot
    assert fsck_zorder_layout(spark, layout).count() == 0
    gc_zorder_layout(spark, layout)
    assert fsck_zorder_layout(spark, layout).count() == 0

    # tamper: commit a manifest whose first cell claims 1000 extra
    # rows — fsck must name exactly that cell and field
    man, v = read_zorder_manifest(spark, layout)
    first = man.limit(1).collect()[0].zcell
    bad = man.withColumn(
        "n_rows", F.when(F.col("zcell") == first,
                         F.col("n_rows") + 1000)
        .otherwise(F.col("n_rows")))
    _commit_manifest(spark, layout, bad, v)
    got = fsck_zorder_layout(spark, layout).collect()
    assert len(got) == 1
    assert (got[0].zcell, got[0].field) == (first, "n_rows")
    assert int(got[0].stored) == int(got[0].recomputed) + 1000


def test_zvalue_n_bijective_and_guarded(spark):
    """r12 N-dim curve: the 3-way interleave is a bijection on a
    grid (matches the python bit-mirror exactly), validation rejects
    k*bits >= 63 and k < 2, and the NULL/negative guards fail loudly
    like the 2-D curve's."""
    from mr_mpi_blast_spark.operators.layout import (zorder_sql_n,
                                                     zvalue_n)

    def py_z3(vals, bits):
        out = 0
        for i in range(bits):
            for j, v in enumerate(vals):
                out |= ((v >> i) & 1) << (i * len(vals) + j)
        return out

    rows = [(x, y, w) for x in range(8) for y in range(8)
            for w in range(8)]
    df = spark.createDataFrame(rows, "x long, y long, w long")
    got = {(r.x, r.y, r.w): r.z for r in
           df.withColumn("z", zvalue_n(["x", "y", "w"], 3)).collect()}
    assert len(set(got.values())) == len(rows)          # bijective
    for (x, y, w), z in got.items():
        assert z == py_z3([x, y, w], 3), (x, y, w)
    # 2-D delegation: zorder_sql_n([x,y]) == the classic interleave
    from mr_mpi_blast_spark.operators.layout import zorder_sql
    assert zorder_sql("a", "b", 5, "div") \
        == zorder_sql_n(["a", "b"], 5, "div")
    with pytest.raises(ValueError, match="63"):
        zorder_sql_n(["a", "b", "c"], 21, "div")
    with pytest.raises(ValueError, match="at least 2"):
        zorder_sql_n(["a"], 5, "div")
    bad = spark.createDataFrame([(1, 2, -3)], "x long, y long, w long")
    with pytest.raises(Exception, match="negative"):
        bad.select(zvalue_n(["x", "y", "w"], 3)).collect()
    nul = spark.createDataFrame([(1, None, 3)], "x long, y long, w long")
    with pytest.raises(Exception, match="NULL"):
        nul.select(zvalue_n(["x", "y", "w"], 3)).collect()


def test_zorder_magic_rendering_masks_high_bits_like_mirror(spark):
    """r12 perf re-route: the shift/mask interleave must agree with
    the per-bit mirror INCLUDING values exceeding the bit budget
    (high bits masked off, as the old div/mod form dropped them)."""
    from mr_mpi_blast_spark.operators.layout import zvalue_n

    def mirror(vals, bits, k):
        out = 0
        for i in range(bits):
            for j, v in enumerate(vals):
                out |= (((v & ((1 << bits) - 1)) >> i) & 1) \
                    << (i * k + j)
        return out

    rows = [(x * 977 + 5, (x * 31) % (1 << 20), x << 13)
            for x in range(0, 3000, 37)]
    df = spark.createDataFrame(rows, "x long, y long, w long")
    got = {(r.x, r.y, r.w): r.z for r in
           df.withColumn("z", zvalue_n(["x", "y", "w"], 7)).collect()}
    for (x, y, w), z in got.items():
        assert z == mirror([x, y, w], 7, 3), (x, y, w)


def test_delete_from_zorder_layout(spark, tmp_path):
    """r12 DELETE: copy-on-write rewrite of exactly the dirty cells.
    Value identity vs the complement filter, scope conjuncts narrow
    the delete's MEANING (out-of-scope matching rows survive), NULL
    predicate keeps the row (SQL DELETE), a no-match delete commits
    nothing, a pinned reader keeps the pre-delete view, and fsck is
    clean afterwards."""
    from mr_mpi_blast_spark.operators.layout import (
        delete_from_zorder_layout, fsck_zorder_layout, pruned_read,
        read_zorder_manifest, write_zorder_layout)
    rows = [(i, i % 61, (i * 13) % 37,
             None if i % 11 == 0 else i % 5) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, x long, y long, q int")
    layout = str(tmp_path / "zdel")
    assert write_zorder_layout(df, "x", "y", layout,
                               target_files=24) == 1
    res = delete_from_zorder_layout(spark, layout, "q <= 1",
                                    x_range=(10, 30))
    assert res["version"] == 2
    assert res["cells_rewritten"]
    # semantic check: deleted == q<=1 AND x in scope; NULL q kept
    keep_pred = "NOT (q <= 1 AND x BETWEEN 10 AND 30) OR q IS NULL"
    want = sorted(r.id for r in df.filter(keep_pred).collect())
    got, _k, _t = pruned_read(spark, layout)
    assert sorted(r.id for r in got.collect()) == want
    assert res["rows_deleted"] == 3000 - len(want)
    # out-of-scope matching rows survived
    assert got.filter("q <= 1 AND x > 30").count() > 0
    # pinned reader: version 1 still sees every row
    old, _k1, _t1 = pruned_read(spark, layout, version=1)
    assert old.count() == 3000
    assert fsck_zorder_layout(spark, layout).count() == 0
    # no-match delete: nothing committed, head unchanged
    res2 = delete_from_zorder_layout(spark, layout, "q = 999")
    assert res2 == {"version": 2, "cells_rewritten": [],
                    "cells_dropped": [], "rows_deleted": 0}
    _m, v = read_zorder_manifest(spark, layout)
    assert v == 2


def test_delete_drops_fully_emptied_cells(spark, tmp_path):
    """A cell whose every row matches the predicate disappears from
    the manifest (no zero-row tombstones); the read stays
    value-identical and gc retires the replaced files."""
    from mr_mpi_blast_spark.operators.layout import (
        delete_from_zorder_layout, fsck_zorder_layout,
        gc_zorder_layout, pruned_read, write_zorder_layout)

    rows = [(i, i % 16, i % 16) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    layout = str(tmp_path / "zdrop")
    write_zorder_layout(df, "x", "y", layout, target_files=16)
    res = delete_from_zorder_layout(spark, layout, "TRUE",
                                    x_range=(0, 3), y_range=(0, 3))
    assert res["cells_dropped"]
    got, kept, total = pruned_read(spark, layout)
    want = sorted(r.id for r in df.filter(
        "NOT (x BETWEEN 0 AND 3 AND y BETWEEN 0 AND 3)").collect())
    assert sorted(r.id for r in got.collect()) == want
    assert fsck_zorder_layout(spark, layout).count() == 0
    removed = gc_zorder_layout(spark, layout, keep_versions=1)
    assert removed["files"]
    got2, _k, _t = pruned_read(spark, layout)
    assert sorted(r.id for r in got2.collect()) == want


def test_merge_into_zorder_layout(spark, tmp_path):
    """r12 MERGE INTO: keyed upsert is value-identical to
    anti-join+union, both effects land in ONE commit, empty updates
    commit nothing, NULL keys are refused loudly, and fsck is clean
    afterwards."""
    from mr_mpi_blast_spark.operators.layout import (
        fsck_zorder_layout, merge_into_zorder_layout, pruned_read,
        write_zorder_layout)
    rows = [(i, i % 41, (i * 7) % 23, f"old{i}") for i in range(2500)]
    df = spark.createDataFrame(rows, "id long, x long, y long, s string")
    layout = str(tmp_path / "zmerge")
    write_zorder_layout(df, "x", "y", layout, target_files=24)
    # replace every id % 9 == 0, insert 100 brand-new ids (some past
    # the original domain -> brand-new cells through the stored curve)
    upd_rows = [(i, i % 41, (i * 7) % 23, f"new{i}")
                for i in range(0, 2500, 9)]
    upd_rows += [(10_000 + i, 60 + i, 40 + i, f"ins{i}")
                 for i in range(100)]
    upd = spark.createDataFrame(
        upd_rows, "id long, x long, y long, s string")
    res = merge_into_zorder_layout(spark, layout, upd, ["id"])
    assert res["version"] == 2
    assert res["rows_replaced"] == len(range(0, 2500, 9))
    assert res["rows_written"] == len(upd_rows)
    got = {(r.id, r.s) for r in pruned_read(spark, layout)[0].collect()}
    want = {(i, f"new{i}" if i % 9 == 0 else f"old{i}")
            for i in range(2500)}
    want |= {(10_000 + i, f"ins{i}") for i in range(100)}
    assert got == want
    assert fsck_zorder_layout(spark, layout).count() == 0
    # empty updates: no commit
    empty = spark.createDataFrame([], "id long, x long, y long, s string")
    res2 = merge_into_zorder_layout(spark, layout, empty, ["id"])
    assert res2["version"] == 2 and res2["rows_written"] == 0
    # NULL key refused loudly, and the refused merge left no trace
    bad = spark.createDataFrame([(None, 1, 1, "z")],
                                "id long, x long, y long, s string")
    with pytest.raises(ValueError, match="NULL in key"):
        merge_into_zorder_layout(spark, layout, bad, ["id"])
    still = {(r.id, r.s) for r in
             pruned_read(spark, layout)[0].collect()}
    assert still == want


def test_merge_composite_key(spark, tmp_path):
    """Composite keys match on ALL columns: an update row replaces
    only the exact (k1, k2) pair, not every row sharing k1."""
    from mr_mpi_blast_spark.operators.layout import (
        merge_into_zorder_layout, pruned_read, write_zorder_layout)
    rows = [(a, b, a * 3 + b, b, f"v{a}.{b}")
            for a in range(30) for b in range(4)]
    df = spark.createDataFrame(
        rows, "k1 long, k2 long, x long, y long, s string")
    layout = str(tmp_path / "zck")
    write_zorder_layout(df, "x", "y", layout, target_files=8)
    upd = spark.createDataFrame([(5, 2, 17, 2, "UPD")],
                                "k1 long, k2 long, x long, y long, s string")
    merge_into_zorder_layout(spark, layout, upd, ["k1", "k2"])
    got = {(r.k1, r.k2): r.s for r in
           pruned_read(spark, layout)[0].collect()}
    assert got[(5, 2)] == "UPD"
    assert got[(5, 1)] == "v5.1" and got[(5, 3)] == "v5.3"
    assert len(got) == len(rows)


def test_merge_key_envelope_pruning(spark, tmp_path):
    """r12: when a merge key IS a curve column, the dirty-cell
    discovery prunes candidate cells by the manifest envelopes on
    that dimension (one-sided — values stay identical); a key on a
    non-curve column scans every cell. The pruning is by column NAME
    against the stored curve params, so a non-curve key whose VALUES
    happen to correlate with a curve column still scans everything."""
    from mr_mpi_blast_spark.operators.layout import (
        fsck_zorder_layout, merge_into_zorder_layout, pruned_read,
        write_zorder_layout)
    # y doubles as the row id: unique, and a curve column
    rows = [(i, i % 50, i, f"old{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, x long, y long, s string")
    layout = str(tmp_path / "zprune")
    write_zorder_layout(df, "x", "y", layout, target_files=16)
    upd = spark.createDataFrame(
        [(i, i % 50, i, f"new{i}") for i in range(100, 120)],
        "id long, x long, y long, s string")
    res = merge_into_zorder_layout(spark, layout, upd, ["y"])
    assert res["cells_total"] > 0
    assert 0 < res["cells_scanned"] < res["cells_total"]
    assert res["rows_replaced"] == 20 and res["rows_written"] == 20
    got = {r.y: r.s for r in pruned_read(spark, layout)[0].collect()}
    assert len(got) == 5000
    assert all(got[i] == f"new{i}" for i in range(100, 120))
    assert got[99] == "old99" and got[120] == "old120"
    assert fsck_zorder_layout(spark, layout).count() == 0
    # non-curve key (values identical to y): no envelope to prune on
    upd2 = spark.createDataFrame(
        [(200, 0, 200, "byid")], "id long, x long, y long, s string")
    res2 = merge_into_zorder_layout(spark, layout, upd2, ["id"])
    assert res2["cells_scanned"] == res2["cells_total"]
    assert res2["rows_replaced"] == 1
    # composite (curve + non-curve) key still prunes on the curve arm
    upd3 = spark.createDataFrame(
        [(300, 0, 300, "bypair")], "id long, x long, y long, s string")
    res3 = merge_into_zorder_layout(spark, layout, upd3, ["y", "id"])
    assert res3["cells_scanned"] < res3["cells_total"]
    assert res3["rows_replaced"] == 1
    got3 = {r.y: r.s for r in pruned_read(spark, layout)[0].collect()}
    assert got3[200] == "byid" and got3[300] == "bypair"
    assert len(got3) == 5000


def test_update_zorder_layout(spark, tmp_path):
    """r12 UPDATE: SET expressions see the PRE-update row, only rows
    where (predicate AND scope) is TRUE change, NULL-predicate rows
    are kept, a pinned reader still sees the pre-update snapshot, a
    no-match update commits nothing, and SET on an unknown column is
    refused loudly."""
    from mr_mpi_blast_spark.operators.layout import (
        fsck_zorder_layout, pruned_read, update_zorder_layout,
        write_zorder_layout)
    rows = [(i, i % 40, (i * 3) % 30, i % 25, f"v{i}")
            for i in range(3000)]
    df = spark.createDataFrame(
        rows, "id long, x long, y long, qty long, s string")
    layout = str(tmp_path / "zupd")
    write_zorder_layout(df, "x", "y", layout, target_files=16)
    # swap semantics through the pre-update row: qty := qty + id,
    # s := old s with a marker — both must read OLD values
    res = update_zorder_layout(
        spark, layout, "qty <= 5",
        {"qty": "qty + id", "s": "concat(s, '!')"},
        x_range=(10, 19))
    assert res["version"] == 2
    assert 0 < res["cells_scanned"] < res["cells_total"]
    want_hit = {i for i in range(3000)
                if i % 25 <= 5 and 10 <= i % 40 <= 19}
    assert res["rows_updated"] == len(want_hit)
    got = {r.id: (r.qty, r.s) for r in
           pruned_read(spark, layout)[0].collect()}
    assert len(got) == 3000
    for i in range(3000):
        if i in want_hit:
            assert got[i] == (i % 25 + i, f"v{i}!"), i
        else:
            assert got[i] == (i % 25, f"v{i}"), i
    assert fsck_zorder_layout(spark, layout).count() == 0
    # pinned reader: version 1 still sees every pre-update value
    old = {r.id: r.qty for r in
           pruned_read(spark, layout, version=1)[0].collect()}
    assert all(old[i] == i % 25 for i in range(3000))
    # no-match update: nothing commits
    res2 = update_zorder_layout(spark, layout, "qty = -999",
                                {"s": "'never'"})
    assert res2["version"] == 2 and res2["rows_updated"] == 0
    # unknown SET column refused before any commit
    with pytest.raises(ValueError, match="unknown column"):
        update_zorder_layout(spark, layout, "qty <= 5",
                             {"nope": "1"})


def test_update_relocates_through_curve(spark, tmp_path):
    """An UPDATE that SETs a curve column re-routes the updated rows
    through the stored curve: they land in the cells their NEW
    coordinates belong to (manifest envelopes stay truthful — fsck
    clean, and a pruned read over the new range finds them), and a
    post-commit replay under the same update_id is a no-op."""
    from mr_mpi_blast_spark.operators.layout import (
        fsck_zorder_layout, manifest_versions, pruned_read,
        update_zorder_layout, write_zorder_layout)
    rows = [(i, i % 20, i % 16, f"v{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x long, y long, s string")
    layout = str(tmp_path / "zreloc")
    write_zorder_layout(df, "x", "y", layout, target_files=12)
    # move every x==7 row far outside the original domain
    res = update_zorder_layout(spark, layout, "x = 7",
                               {"x": "x + 1000", "s": "'moved'"},
                               update_id="mv1")
    assert res["version"] == 2 and res["rows_updated"] == 100
    assert fsck_zorder_layout(spark, layout).count() == 0
    # the moved rows are found by pruning on their NEW coordinates
    moved, kept, tot = pruned_read(spark, layout, x_range=(1000, 1100))
    assert kept < tot
    assert sorted(r.id for r in moved.filter("x = 1007").collect()) \
        == sorted(i for i in range(2000) if i % 20 == 7)
    assert moved.filter("s != 'moved'").count() == 0
    # nothing remains at the old coordinate
    left, _, _ = pruned_read(spark, layout, x_range=(0, 19))
    assert left.filter("x = 7").count() == 0
    assert pruned_read(spark, layout)[0].count() == 2000
    # post-commit replay: no-op before touching data
    res2 = update_zorder_layout(spark, layout, "x = 1007",
                                {"s": "'evil'"}, update_id="mv1")
    assert res2["rows_updated"] == 0
    assert manifest_versions(spark, layout)[-1] == 2
    assert pruned_read(spark, layout)[0] \
        .filter("s = 'evil'").count() == 0
    with pytest.raises(ValueError, match="dot-free"):
        update_zorder_layout(spark, layout, "x = 1", {"s": "'a'"},
                             update_id="a.b")


def test_replay_guard_respects_retained_snapshots(spark, tmp_path):
    """r12 review: a post-commit replay must no-op even after a LATER
    rewrite (compaction) dropped the merge's files from the head —
    an older RETAINED snapshot still references them, and re-running
    would overwrite files that snapshot reads."""
    from mr_mpi_blast_spark.operators.layout import (
        append_published, compact_zorder_cells, fsck_zorder_layout,
        manifest_versions, merge_into_zorder_layout, pruned_read,
        read_zorder_manifest, write_zorder_layout)
    base = spark.createDataFrame(
        [(i, i % 7, i % 5, "old") for i in range(600)],
        "id long, x long, y long, s string")
    layout = str(tmp_path / "zrg")
    write_zorder_layout(base, "x", "y", layout, target_files=4)
    upd = spark.createDataFrame([(7, 0, 2, "new")],
                                "id long, x long, y long, s string")
    merge_into_zorder_layout(spark, layout, upd, ["id"],
                             merge_id="job1")                    # v2
    compact_zorder_cells(spark, layout)                          # v3
    head, hv = read_zorder_manifest(spark, layout)
    assert hv == 3
    # precondition for the regression: the HEAD no longer references
    # the merge's delta dir (compaction rewrote that cell) — a
    # head-only guard would wrongly re-run the merge here
    assert not append_published(spark, layout, "mjob1.u", head)
    evil = spark.createDataFrame([(8, 1, 3, "evil")],
                                 "id long, x long, y long, s string")
    res = merge_into_zorder_layout(spark, layout, evil, ["id"],
                                   merge_id="job1")
    assert res["rows_written"] == 0 and res["version"] == 3
    assert manifest_versions(spark, layout)[-1] == 3
    # the retained pre-compaction snapshot is intact (its files were
    # not overwritten) and head values are unchanged
    v2 = {r.id: r.s for r in
          pruned_read(spark, layout, version=2)[0].collect()}
    assert len(v2) == 600 and v2[7] == "new" and v2[8] == "old"
    got = {r.id: r.s for r in pruned_read(spark, layout)[0].collect()}
    assert got[7] == "new" and got[8] == "old"
    assert fsck_zorder_layout(spark, layout).count() == 0


def test_delete_full_wipe_refused(spark, tmp_path):
    """r12 review: a delete matching EVERY row would commit an empty
    manifest (a state the read path refuses) — it is rejected loudly
    before the commit and the table stays readable."""
    from mr_mpi_blast_spark.operators.layout import (
        delete_from_zorder_layout, pruned_read, write_zorder_layout)
    df = spark.createDataFrame(
        [(i, i % 5, i % 3) for i in range(200)],
        "id long, x long, y long")
    layout = str(tmp_path / "zwipe")
    write_zorder_layout(df, "x", "y", layout, target_files=2)
    with pytest.raises(ValueError, match="full wipe"):
        delete_from_zorder_layout(spark, layout, "TRUE")
    assert pruned_read(spark, layout)[0].count() == 200


def test_dml_scope_requires_closed_ranges(spark, tmp_path):
    """r12 review: the DML scope is both an envelope filter and a
    row-level BETWEEN — open-ended bounds are refused loudly in both
    DELETE and UPDATE instead of diverging between the renderings."""
    from mr_mpi_blast_spark.operators.layout import (
        delete_from_zorder_layout, update_zorder_layout,
        write_zorder_layout)
    df = spark.createDataFrame(
        [(i, i % 5, i % 3) for i in range(50)],
        "id long, x long, y long")
    layout = str(tmp_path / "zrange")
    write_zorder_layout(df, "x", "y", layout, target_files=1)
    with pytest.raises(ValueError, match="closed"):
        delete_from_zorder_layout(spark, layout, "id = 1",
                                  x_range=(None, 3))
    with pytest.raises(ValueError, match="closed"):
        update_zorder_layout(spark, layout, "id = 1", {"id": "2"},
                             y_range=(1, None))


def test_layout_changes_feed(spark, tmp_path):
    """r12 change feed: UPDATE shows as delete(old)+insert(new) for
    exactly the matched rows (rewritten survivors cancel), an append
    is pure inserts, a compaction yields an EMPTY feed, and the feed
    composes across spans (1->3 == changes of both steps)."""
    from mr_mpi_blast_spark.operators.layout import (
        append_to_zorder_layout, compact_zorder_cells, layout_changes,
        update_zorder_layout, upsert_zorder_manifest,
        write_zorder_layout)
    rows = [(i, i % 13, i % 9, i % 7, f"v{i}") for i in range(1500)]
    df = spark.createDataFrame(
        rows, "id long, x long, y long, q long, s string")
    layout = str(tmp_path / "zcf")
    write_zorder_layout(df, "x", "y", layout, target_files=6)   # v1
    update_zorder_layout(spark, layout, "q = 3", {"s": "'upd'"})  # v2
    hit = {i for i in range(1500) if i % 7 == 3}
    feed = layout_changes(spark, layout, 1, 2).collect()
    dels = {(r.id, r.s) for r in feed if r.change_type == "delete"}
    inss = {(r.id, r.s) for r in feed if r.change_type == "insert"}
    assert dels == {(i, f"v{i}") for i in hit}
    assert inss == {(i, "upd") for i in hit}
    assert len(feed) == 2 * len(hit)      # survivors cancelled
    # append -> pure inserts
    extra = spark.createDataFrame(
        [(9000 + i, i % 13, i % 9, 0, "new") for i in range(40)],
        "id long, x long, y long, q long, s string")
    res = append_to_zorder_layout(extra, layout)
    upsert_zorder_manifest(spark, layout, res)                  # v3
    f23 = layout_changes(spark, layout, 2, 3).collect()
    assert {r.change_type for r in f23} == {"insert"}
    assert {r.id for r in f23} == {9000 + i for i in range(40)}
    # compaction: rows identical -> empty feed
    compact_zorder_cells(spark, layout)                         # v4
    assert layout_changes(spark, layout, 3, 4).count() == 0
    # spans compose: 1->3 is the union of the two steps' effects
    f13 = layout_changes(spark, layout, 1, 3)
    assert f13.count() == 2 * len(hit) + 40
    with pytest.raises(ValueError, match="from_version"):
        layout_changes(spark, layout, 3, 3)


def test_zorder_table_stats_metadata_only(spark, tmp_path):
    """r12 metadata-only stats: equal to the full-scan aggregate,
    maintained by delete, and answered with ZERO data I/O — proven by
    deleting every data file and re-answering (only the manifest and
    the meta sidecar remain readable)."""
    from mr_mpi_blast_spark.operators.layout import (
        _fs, delete_from_zorder_layout, write_zorder_layout,
        zorder_table_stats)
    rows = [(i, i % 19 + 3, (i * 5) % 29 + 1) for i in range(1234)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    layout = str(tmp_path / "zst")
    write_zorder_layout(df, "x", "y", layout, target_files=8)
    s = zorder_table_stats(spark, layout).collect()[0]
    assert (s.n_rows, s.min_x, s.max_x, s.min_y, s.max_y) == \
        (1234, 3, 21, 1, 29)
    assert s.n_cells >= 1 and s.n_files >= s.n_cells
    delete_from_zorder_layout(spark, layout, "x = 3")
    s2 = zorder_table_stats(spark, layout).collect()[0]
    assert s2.n_rows == df.filter("x != 3").count()
    assert s2.min_x == 4
    # the zero-data-I/O proof: drop every data file; stats still answer
    fs, hpath = _fs(spark, layout)
    fs.delete(hpath(f"{layout}/data"), True)
    s3 = zorder_table_stats(spark, layout).collect()[0]
    assert (s3.n_rows, s3.min_x) == (s2.n_rows, s2.min_x)
