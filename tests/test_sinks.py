"""S6 sink tests: the date-partitioned parquet layout must (a) round-trip
the data and (b) actually PRUNE partitions for date predicates — the
hypertable behavior the reference gets from TimescaleDB chunks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from real_big_data_project_spark.sources.registry import load_table
from real_big_data_project_spark.sources.sinks import (
    PARTITION_COL,
    read_time_partitioned,
    write_time_partitioned,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "_artifacts", "sink_events")


def test_partitioned_sink_roundtrip_and_pruning(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").alias("date"),
        F.col("user_id").alias("cid"),
        F.col("value"),
    )
    write_time_partitioned(ev, OUT)

    back = read_time_partitioned(spark, OUT)
    assert back.count() == ev.count()

    # physical layout: one directory per day
    days = [d for d in os.listdir(OUT) if d.startswith(f"{PARTITION_COL}=")]
    n_days = ev.select(F.col("date").cast("date")).distinct().count()
    assert len(days) == n_days

    # a one-day predicate must reach the scan as a partition filter and
    # read only that day's files
    one_day = sorted(days)[0].split("=", 1)[1]
    q = back.filter(F.col(PARTITION_COL) == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and one_day in plan
    expected = ev.filter(F.col("date").cast("date") == one_day).count()
    assert q.count() == expected


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    """X-series scale feature: same-key same-count bucketed tables must
    sort-merge join with NO Exchange on either side (the write-once
    shuffle replaces every join-time shuffle)."""
    from real_big_data_project_spark.sources.sinks import write_bucketed

    ev = load_table(spark, sf_dir, "events")
    write_bucketed(ev.select("event_id", "user_id", "value"),
                   "bkt_events", "user_id", n_buckets=8,
                   sort_cols=["user_id"])
    write_bucketed(
        ev.groupBy("user_id").agg(F.count("*").alias("n_events")),
        "bkt_users", "user_id", n_buckets=8, sort_cols=["user_id"])

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_events").join(spark.table("bkt_users"), "user_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_events")
        spark.sql("DROP TABLE IF EXISTS bkt_users")


def test_zorder_layout_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order clustering must shrink per-row-group min/max extents on
    BOTH columns (multi-dim data skipping), where a linear sort leaves
    the second column's extent near the full range. Measured from real
    parquet footers. Also pins the Morton interleave against a pure
    python reference."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from real_big_data_project_spark.operators.layout import (
        write_zordered, zorder_key_2d,
    )

    samples = [(0, 0), (1, 0), (0, 1), (5, 3), (255, 490), (99, 255)]
    got = spark.range(1).select(
        *[zorder_key_2d(F.lit(x), F.lit(y), 9).alias(f"z{i}")
          for i, (x, y) in enumerate(samples)]
    ).collect()[0]

    def ref(x, y, bits=9):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    assert list(got) == [ref(x, y) for x, y in samples]

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("int").alias("x"),
        F.floor("value").cast("int").alias("y"),
    )
    xr = ev.agg(F.max("x") - F.min("x")).collect()[0][0]
    yr = ev.agg(F.max("y") - F.min("y")).collect()[0][0]
    zdir, ldir = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    write_zordered(ev, zdir, "x", "y", bits=9, n_files=16)
    (ev.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(ldir))

    def extents(d):
        ex, ey = [], []
        for f in glob.glob(d + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                st = {row.column(i).path_in_schema: row.column(i).statistics
                      for i in range(row.num_columns)}
                ex.append(st["x"].max - st["x"].min)
                ey.append(st["y"].max - st["y"].min)
        return sum(ex) / len(ex), sum(ey) / len(ey)

    zx, zy = extents(zdir)
    lx, ly = extents(ldir)
    # z-order bounds BOTH dims to a fraction of their range (min/max
    # scaling keeps the curve balanced even when ranges are unequal)...
    assert max(zx / xr, zy / yr) < 0.4, (zx, xr, zy, yr)
    assert ly > 0.5 * yr, (ly, yr)   # ...while linear sort does not
    assert zy < 0.5 * ly             # and z-order beats it decisively


def test_csv_quarantine_captures_malformed_lines(spark, sf_dir):
    """The PERMISSIVE quarantine variant of the TSV source must parse
    exactly the rows DROPMALFORMED keeps AND capture every malformed
    line for audit (the error_dates concept, made real)."""
    from real_big_data_project_spark.sources.csv_source import (
        ensure_nation_tsv, read_nation_tsv, read_nation_tsv_with_quarantine,
    )

    path = ensure_nation_tsv(spark, sf_dir)
    # compare materialized ROWS, not count(): under DROPMALFORMED,
    # count() prunes every column so nothing is parsed and nothing is
    # dropped — the notorious pruning interaction
    dropped = {tuple(r) for r in read_nation_tsv(spark, path).collect()}
    clean, quarantine = read_nation_tsv_with_quarantine(spark, path)
    assert {tuple(r) for r in clean.collect()} == dropped
    bad = [r._corrupt_record for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("no tabs" in b for b in bad)


def test_jdbc_sink_roundtrip_append_overwrite(spark, sf_dir, tmp_path):
    """S6's database twin (the reference COPY loader's analogue) against
    the in-process Derby engine shipped with Spark: append must
    accumulate, overwrite must replace, and a partitioned read must
    split the scan into parallel range predicates."""
    from real_big_data_project_spark.sources.sinks import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    n = nation.count()

    write_jdbc(nation, url, "nation_tbl", mode="overwrite", driver=driver)
    write_jdbc(nation, url, "nation_tbl", mode="append", driver=driver)
    assert read_jdbc(spark, url, "nation_tbl", driver=driver).count() == 2 * n

    write_jdbc(nation, url, "nation_tbl", mode="overwrite", driver=driver)
    back = read_jdbc(
        spark, url, "nation_tbl", driver=driver,
        partition_column="n_nationkey", lower_bound=0, upper_bound=30,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in nation.collect()}


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-clustered files must carry tight min/max ranges on BOTH z-columns
    (≤ ~60% of files match a narrow predicate on either one), where a
    single-column sort prunes nothing on its off-dimension
    (operators/layout.py — including the normalization that prevents the
    degenerate single-column collapse)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from real_big_data_project_spark.operators.layout import zorder_write
    from real_big_data_project_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.dayofmonth("ts").alias("dom")
    )
    zdir, udir = str(tmp_path / "z"), str(tmp_path / "u")
    zorder_write(ev, zdir, ["user_id", "dom"], n_files=16)
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(udir)
    )

    def file_ranges(path):
        out = []
        for f in sorted(glob.glob(path + "/*.parquet")):
            md = pq.read_metadata(f)
            mins, maxs = {}, {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    st = col.statistics
                    if st is None:
                        continue
                    nm = col.path_in_schema
                    mins[nm] = min(mins.get(nm, st.min), st.min)
                    maxs[nm] = max(maxs.get(nm, st.max), st.max)
            out.append((mins, maxs))
        return out

    def matching(ranges, col, lo, hi):
        return sum(
            1 for mn, mx in ranges
            if not (mx[col] < lo or mn[col] > hi)
        )

    z, u = file_ranges(zdir), file_ranges(udir)
    # z-order: both dimensions prune
    assert matching(z, "user_id", 3, 5) <= 0.65 * len(z)
    assert matching(z, "dom", 10, 12) <= 0.65 * len(z)
    # single-column sort: off-dimension predicate matches every file
    assert matching(u, "dom", 10, 12) == len(u)
    # and the rewrite loses no rows
    assert spark.read.parquet(zdir).count() == ev.count()


def test_compaction_merges_small_files_per_partition(spark, sf_dir, tmp_path):
    """A fragmented day-partitioned store (many tiny files per day) must
    compact to ceil(rows/target) files per day with identical data, and
    compacting a day subset must leave other partitions' files untouched
    (dynamic partition overwrite)."""
    import glob

    from pyspark.sql import functions as F

    from real_big_data_project_spark.sources.registry import events_with_volume
    from real_big_data_project_spark.sources.sinks import (
        PARTITION_COL, compact_time_partitions)

    store = str(tmp_path / "store")
    ev = events_with_volume(spark, sf_dir).withColumn(
        PARTITION_COL, F.col("ts").cast("date"))
    # fragment: 12 writer tasks → up to 12 files per day partition
    ev.repartition(12).write.partitionBy(PARTITION_COL).parquet(store)

    def files_per_day():
        return {
            d.split("=", 1)[1]: len(glob.glob(d + "/*.parquet"))
            for d in glob.glob(store + f"/{PARTITION_COL}=*")
        }

    before = files_per_day()
    assert max(before.values()) > 3  # genuinely fragmented
    want = spark.read.parquet(store).orderBy("event_id").collect()

    days = sorted(before)[:2]
    compact_time_partitions(spark, store, 100_000, days=days)
    mid = files_per_day()
    assert all(mid[d] == 1 for d in days)                # compacted
    assert all(mid[d] == before[d] for d in before if d not in days)

    compact_time_partitions(spark, store, 100_000)
    assert set(files_per_day().values()) == {1}
    got = spark.read.parquet(store).orderBy("event_id").collect()
    assert got == want


def test_delete_keys_rewrites_only_affected_partitions(spark, sf_dir, tmp_path):
    """Compliance delete: the target keys vanish, everything else is
    row-identical, and partitions that never held the keys keep their
    original files (mtime-stable — never rewritten)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from real_big_data_project_spark.sources.registry import events_with_volume
    from real_big_data_project_spark.sources.sinks import (
        PARTITION_COL, delete_keys_from_store, write_time_partitioned)

    store = str(tmp_path / "store")
    ev = events_with_volume(spark, sf_dir)
    write_time_partitioned(ev, store, ts="ts", key="user_id")

    # one user active only in a few days → few affected partitions
    target = ev.filter(F.col("user_id") == 3)
    affected_days = {
        str(r[0]) for r in
        target.select(F.col("ts").cast("date")).distinct().collect()
    }
    before = {
        f: os.stat(f).st_mtime_ns for f in glob.glob(store + "/*/*.parquet")
    }
    keys = spark.createDataFrame([(3,)], "user_id long")
    n = delete_keys_from_store(spark, store, keys, "user_id")
    assert n == len(affected_days)

    got = spark.read.parquet(store)
    assert got.filter(F.col("user_id") == 3).count() == 0
    want = ev.filter(F.col("user_id") != 3).orderBy("event_id").drop("ts")
    have = got.orderBy("event_id").drop("ts", PARTITION_COL)
    assert [tuple(r) for r in have.select(*want.columns).collect()] == \
           [tuple(r) for r in want.collect()]
    # untouched partitions: original files still in place, byte-for-byte
    for f, mt in before.items():
        day = f.split(f"{PARTITION_COL}=")[1].split("/")[0]
        if day not in affected_days and os.path.exists(f):
            assert os.stat(f).st_mtime_ns == mt


def test_schema_evolution_merges_batches(spark, sf_dir, tmp_path):
    """Feeds gain columns over time; mergeSchema reads old + new batches
    as one table with NULLs for pre-evolution rows, and the widened
    column stays absent from scans that do not select it (pruned read)."""
    from pyspark.sql import functions as F

    from real_big_data_project_spark.sources.registry import load_table

    store = str(tmp_path / "evolving")
    nation = load_table(spark, sf_dir, "nation")
    nation.select("n_nationkey", "n_name").write.parquet(store + "/batch=1")
    nation.select(
        "n_nationkey", "n_name",
        F.lit("v2").alias("feed_version"),
    ).write.parquet(store + "/batch=2")

    df = spark.read.option("mergeSchema", True).parquet(store)
    assert set(df.columns) == {"n_nationkey", "n_name", "feed_version", "batch"}
    n = nation.count()
    assert df.count() == 2 * n
    assert df.filter(F.col("feed_version").isNull()).count() == n
    plan = (
        df.select("n_nationkey")._jdf.queryExecution().executedPlan().toString()
    )
    assert "feed_version" not in plan.split("ReadSchema")[1][:120]


def test_delete_keys_removes_fully_emptied_partitions(spark, tmp_path):
    """A partition whose EVERY row matches the keys must physically
    disappear — dynamic overwrite alone would leave its old files in
    place (review-found retention bug)."""
    import os

    from pyspark.sql import functions as F

    from real_big_data_project_spark.sources.sinks import (
        PARTITION_COL, delete_keys_from_store, write_time_partitioned)

    store = str(tmp_path / "store")
    rows = spark.createDataFrame(
        [(1, "2024-01-01", 7), (2, "2024-01-01", 7),   # day 1: only key 7
         (3, "2024-01-02", 7), (4, "2024-01-02", 8)],  # day 2: mixed
        "event_id long, ts string, user_id long",
    ).select("event_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "user_id")
    write_time_partitioned(rows, store, ts="ts", key="user_id")

    n = delete_keys_from_store(
        spark, store, spark.createDataFrame([(7,)], "user_id long"), "user_id"
    )
    assert n == 2
    assert not os.path.isdir(os.path.join(store, f"{PARTITION_COL}=2024-01-01"))
    got = spark.read.parquet(store).collect()
    assert [(r.event_id, r.user_id) for r in got] == [(4, 8)]


def test_snapshot_store_time_travel_and_isolation(spark, tmp_path):
    """Commits are versioned; a pinned historical read never sees later
    commits; a DataFrame resolved before a commit keeps its snapshot."""
    from real_big_data_project_spark.sources.snapshot_store import (
        expire_snapshots, latest_version, read_snapshot, snapshot_append,
        snapshot_compact, snapshot_delete_keys,
    )

    root = str(tmp_path / "store")
    a = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b = spark.createDataFrame([(3, "c")], "k int, v string")
    assert snapshot_append(a, root) == 1
    pinned = read_snapshot(spark, root)        # resolves v1's file list now
    assert snapshot_append(b, root) == 2
    assert sorted(r.k for r in read_snapshot(spark, root).collect()) == [1, 2, 3]
    assert sorted(r.k for r in read_snapshot(spark, root, version=1).collect()) == [1, 2]
    assert sorted(r.k for r in pinned.collect()) == [1, 2]  # isolation

    keys = spark.createDataFrame([(2,)], "k int")
    assert snapshot_delete_keys(spark, root, keys, "k") == 3
    assert sorted(r.k for r in read_snapshot(spark, root).collect()) == [1, 3]
    # history still has the deleted row
    assert sorted(r.k for r in read_snapshot(spark, root, version=2).collect()) == [1, 2, 3]

    assert snapshot_compact(spark, root) == 4
    assert sorted(r.k for r in read_snapshot(spark, root).collect()) == [1, 3]

    removed = expire_snapshots(root, keep_from=4)
    assert removed, "pre-compaction groups should be garbage-collected"
    assert latest_version(root) == 4
    assert sorted(r.k for r in read_snapshot(spark, root).collect()) == [1, 3]


def test_snapshot_store_empty_read_raises(spark, tmp_path):
    import pytest as _pytest

    from real_big_data_project_spark.sources.snapshot_store import read_snapshot

    with _pytest.raises(ValueError, match="no commits"):
        read_snapshot(spark, str(tmp_path / "nothing"))


def test_snapshot_store_expire_edge_cases(spark, tmp_path):
    from real_big_data_project_spark.sources.snapshot_store import (
        expire_snapshots, read_snapshot, snapshot_append,
    )

    root = str(tmp_path / "store2")
    assert expire_snapshots(root, keep_from=1) == []  # no commits: no-op
    snapshot_append(spark.createDataFrame([(1,)], "k int"), root)
    # keep_from below the valid floor clamps to 1 instead of crashing
    assert expire_snapshots(root, keep_from=0) == []
    assert [r.k for r in read_snapshot(spark, root).collect()] == [1]


def test_snapshot_store_concurrent_appends_serialize(spark, tmp_path):
    """Race two snapshot_append writers (VERDICT r6 item 7). With the
    round-7 optimistic CAS (os.link manifest publish: atomic, EEXIST on
    loss, loser retries against the new version), BOTH racing appends
    must land, serialized — the lost-update anomaly the old
    single-writer contract documented is closed. The barrier forces
    both writers to read the same base version so the conflict path
    actually executes."""
    import threading

    from real_big_data_project_spark.sources.snapshot_store import (
        latest_version, read_snapshot, snapshot_append,
    )

    root = str(tmp_path / "race_store")
    snapshot_append(spark.createDataFrame([(0, "base")], "k int, who string"),
                    root)
    assert latest_version(root) == 1

    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def writer(tag: str) -> None:
        df = spark.createDataFrame(
            [(i, tag) for i in range(1, 11)], "k int, who string"
        )
        try:
            barrier.wait(timeout=60)
            snapshot_append(df, root)
        except Exception as exc:  # surfaces in the main thread
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(t,))
               for t in ("alpha", "beta")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        # join(timeout=) returns even if the writer hung — assert it
        # actually finished, or the checks below race a live commit
        assert not t.is_alive(), "writer thread still running after 300s"
    assert not errors, errors

    # Serialization: both appends committed as their own versions —
    # base + alpha + beta, 3 manifests, NO lost commit.
    v = latest_version(root)
    assert v == 3, f"expected 3 serialized commits, got {v}"
    rows = read_snapshot(spark, root).collect()
    base = [r for r in rows if r.who == "base"]
    assert len(base) == 1
    per_writer = {
        tag: len([r for r in rows if r.who == tag])
        for tag in ("alpha", "beta")
    }
    for tag, n in per_writer.items():
        assert n == 10, f"{tag}: commit lost or partial ({n} rows)"
    # every historical version stays readable and nested: v2 has exactly
    # one writer's rows, v1 just the base
    assert len(read_snapshot(spark, root, version=1).collect()) == 1
    assert len(read_snapshot(spark, root, version=2).collect()) == 11
    # Every data group on disk is intact parquet, including a losing
    # writer's unreferenced group (files are never torn by a lost race).
    data_dir = os.path.join(root, "data")
    for g in sorted(os.listdir(data_dir)):
        spark.read.parquet(os.path.join(data_dir, g)).collect()


def test_snapshot_store_cas_conflict_paths(spark, tmp_path):
    """Deterministic CAS interleavings (no thread timing): the manifest
    link is the arbitration point, a stale _latest hint is ignored, and
    a delete recomputes against the version that beat it."""
    from real_big_data_project_spark.sources.snapshot_store import (
        CommitConflict, _commit, latest_version, read_snapshot,
        snapshot_append, snapshot_delete_keys,
    )

    import pytest

    root = str(tmp_path / "cas_store")
    snapshot_append(
        spark.createDataFrame([(i, "a") for i in range(4)],
                              "k int, who string"), root)
    # a second writer that ALSO read version 0 loses the raw CAS loudly
    with pytest.raises(CommitConflict):
        _commit(root, 0, ["phantom-group"])
    assert latest_version(root) == 1
    # the _latest hint is advisory: corrupt it backwards, truth holds
    with open(os.path.join(root, "_latest"), "w") as f:
        f.write("0")
    assert latest_version(root) == 1
    assert read_snapshot(spark, root).count() == 4
    # delete-vs-append conflict: the delete's replacement group must be
    # recomputed against the append that won the version, not the stale
    # base — simulate by appending between the delete's read and commit
    # via the public retry path (append first, then delete sees it).
    snapshot_append(
        spark.createDataFrame([(100, "b")], "k int, who string"), root)
    keys = spark.createDataFrame([(0,), (1,)], "k int")
    snapshot_delete_keys(spark, root, keys, "k")
    final = {r.k for r in read_snapshot(spark, root).collect()}
    assert final == {2, 3, 100}


def _race_commit_from_pid(root, group, barrier, q):
    """Child-process body for the cross-process CAS race (module-level:
    spawn pickles the target by qualified name). Spark-free — the commit
    path is pure manifest IO by design, which is exactly what lets real
    multi-job deployments race it from distinct drivers."""
    from real_big_data_project_spark.sources.snapshot_store import (
        append_group,
    )

    barrier.wait(timeout=120)
    try:
        q.put(("ok", os.getpid(), append_group(root, group)))
    except Exception as exc:  # report, never hang the parent
        q.put(("err", os.getpid(), repr(exc)))


def test_snapshot_store_cas_across_processes(spark, tmp_path):
    """VERDICT r7 item 5: the thread-based race proves the protocol, but
    real deployments are separate OS processes — race two writers
    through the os.link publish path from two spawned PIDs. Both data
    groups are pre-written by the parent (the Spark half is not under
    test); the children run the production OCC loop (`append_group`)
    against the same base version. Done-bar: both commits land,
    serialized, from distinct PIDs, no lost update."""
    import multiprocessing as mp

    from real_big_data_project_spark.sources.snapshot_store import (
        _write_group, latest_version, read_snapshot, snapshot_append,
    )

    root = str(tmp_path / "mp_store")
    snapshot_append(
        spark.createDataFrame([(0, "base")], "k int, who string"), root)
    assert latest_version(root) == 1
    groups = [
        _write_group(
            spark.createDataFrame([(i, tag) for i in range(1, 6)],
                                  "k int, who string"),
            root, latest_version(root))
        for tag in ("alpha", "beta")
    ]

    ctx = mp.get_context("spawn")  # fresh interpreters, no JVM inherited
    barrier = ctx.Barrier(2)
    q = ctx.Queue()
    procs = [ctx.Process(target=_race_commit_from_pid,
                         args=(root, g, barrier, q)) for g in groups]
    for p in procs:
        p.start()
    results = [q.get(timeout=180) for _ in procs]
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0, f"writer pid={p.pid} exit={p.exitcode}"

    assert all(r[0] == "ok" for r in results), results
    pids = {r[1] for r in results}
    assert len(pids) == 2 and os.getpid() not in pids, \
        f"writers must be distinct child PIDs: {pids}"
    # serialization: the two commits took exactly versions 2 and 3
    assert {r[2] for r in results} == {2, 3}, results
    assert latest_version(root) == 3
    rows = read_snapshot(spark, root).collect()
    per_writer = {tag: len([r for r in rows if r.who == tag])
                  for tag in ("base", "alpha", "beta")}
    assert per_writer == {"base": 1, "alpha": 5, "beta": 5}, per_writer
    # the loser's retry appended, not replaced: v2 nests inside v3
    assert len(read_snapshot(spark, root, version=2).collect()) == 6
