"""Operator-level equivalence tests for the scale-safe window
replacements (operators/windows.py) and split determinism."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_global_row_number_matches_global_window(spark, sf_dir):
    """Exact equivalence with Window.orderBy row_number on a total
    ordering — the operator is a scale-safe drop-in, not an approximation."""
    from pyspark.sql import Window

    from real_big_data_project_spark.operators.windows import global_row_number
    from real_big_data_project_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    got = {
        r.o_orderkey: r.rn
        for r in global_row_number(
            orders, ["o_totalprice", "o_orderkey"], num_ranges=7).collect()
    }
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {
        r.o_orderkey: r.rn
        for r in orders.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_exact_ntile_matches_window_ntile(spark, sf_dir):
    from pyspark.sql import Window

    from real_big_data_project_spark.operators.windows import exact_ntile
    from real_big_data_project_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    # 7 buckets over a count not divisible by 7 exercises the remainder rule
    got = {
        r.o_orderkey: r.bucket
        for r in exact_ntile(
            orders, ["o_totalprice", "o_orderkey"], 7, num_ranges=5).collect()
    }
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {
        r.o_orderkey: r.b
        for r in orders.withColumn("b", F.ntile(7).over(w)).collect()
    }
    assert got == want


def test_hash_split_stable_under_subsetting(spark, sf_dir):
    """A doc's split assignment must not change when other docs are
    added/removed — the property that makes the split usable across
    corpus versions."""
    from real_big_data_project_spark.datapipe.selection import hash_split
    from real_big_data_project_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    full = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    sub = {
        r.doc_id: r.split
        for r in hash_split(
            docs.filter(F.col("doc_id") % 3 == 0), "doc_id").collect()
    }
    assert sub and all(full[k] == v for k, v in sub.items())
    # all three splits are populated and roughly 80/10/10
    from collections import Counter

    c = Counter(full.values())
    n = sum(c.values())
    assert set(c) == {"train", "valid", "test"}
    assert abs(c["train"] / n - 0.8) < 0.05


def test_global_row_number_exact_without_exchange_reuse(spark, sf_dir):
    """repartitionByRange samples its cutpoints, so without the
    localCheckpoint pin the counts branch and the rank branch can see
    DIFFERENT partitionings whenever exchange reuse is off — measured
    87% wrong ranks before the fix. Pin the property under the config
    that exposes it."""
    from pyspark.sql import Window

    from real_big_data_project_spark.operators.windows import global_row_number
    from real_big_data_project_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        got = {
            r.o_orderkey: r.rn
            for r in global_row_number(
                orders, ["o_totalprice", "o_orderkey"], num_ranges=7
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {
        r.o_orderkey: r.rn
        for r in orders.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_merge_upsert_edge_semantics(spark):
    """CDC apply: delete-for-missing-key is a no-op (not an insert), a
    re-keyed insert lands, and last-write-wins resolves duplicate seqs by
    the op tiebreak (operators/merge.py)."""
    from real_big_data_project_spark.operators.merge import (
        merge_upsert, resolve_change_log)

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, v double")
    log = spark.createDataFrame(
        [
            (2, "U", 1, "b1", 21.0),   # superseded by seq 2
            (2, "U", 2, "b2", 22.0),
            (9, "D", 1, None, None),   # delete of a key not in the snapshot
            (3, "I", 1, "c", 30.0),    # insert
            (1, "D", 1, None, None),   # delete of an existing key
        ],
        "k long, op string, seq int, name string, v double",
    )
    out = {
        r.k: (r.name, r.v)
        for r in merge_upsert(snap, resolve_change_log(log, "k"), "k").collect()
    }
    assert out == {2: ("b2", 22.0), 3: ("c", 30.0)}


def test_heavy_hitters_exact_and_partitioning_invariant(spark):
    """The local-threshold candidate pass must never lose a true heavy
    hitter, whatever the partitioning (operators/heavy_hitters.py)."""
    from real_big_data_project_spark.operators.heavy_hitters import heavy_hitters

    rows = (
        [("hot",)] * 1000
        + [(f"warm{i}",) for i in range(10) for _ in range(50)]
        + [(f"tail{i}",) for i in range(5000)]
    )
    df = spark.createDataFrame(rows, "k string")
    want = {("hot", 1000)} | {(f"warm{i}", 50) for i in range(10)}
    for nparts in (1, 7, 32):
        got = {
            (r.k, r.n)
            for r in heavy_hitters(df.repartition(nparts), "k", 50).collect()
        }
        assert got == want, f"nparts={nparts}"
    # threshold=1 degenerates to plain distinct counts
    assert heavy_hitters(df, "k", 1).count() == 5011


def test_gapfill_and_ewma_semantics(spark):
    from real_big_data_project_spark.operators.windows import ewma, gapfill_locf

    bars = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-04", 40.0),
         (2, "2024-02-01", 5.0)],
        "k long, day string, close double",
    ).select("k", F.col("day").cast("date").alias("day"), "close")

    out = {(r.k, str(r.day)): (r.is_gap, r.close)
           for r in gapfill_locf(bars, "k", "day", ["close"]).collect()}
    # series 1 spans 4 days: the two middle days are synthesized + filled
    assert out[(1, "2024-01-02")] == (True, 10.0)
    assert out[(1, "2024-01-03")] == (True, 10.0)
    assert out[(1, "2024-01-04")] == (False, 40.0)
    # series 2's span is itself: no gaps, other series' calendar not leaked
    assert out[(2, "2024-02-01")] == (False, 5.0)
    assert len(out) == 5

    ew = {str(r.day): r.ewma
          for r in ewma(bars.filter("k = 1"), "k", "day", "close",
                        alpha=0.5, window=10).collect()}
    assert ew["2024-01-01"] == 10.0          # seed = first value
    assert ew["2024-01-04"] == 25.0          # 10*0.5 + 40*0.5


def test_require_clean_raises_with_rule_names(spark):
    import pytest

    from real_big_data_project_spark.functions.quality import (
        expectations_report, require_clean)

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id long, v double")
    rules = [
        ("positive_v", F.col("v") > 0),     # 2 violations (−5 and NULL)
        ("id_present", F.col("id").isNotNull()),
    ]
    rep = {r.rule: r.n_violations for r in
           expectations_report(df, rules).collect()}
    assert rep == {"positive_v": 2, "id_present": 0}
    require_clean(df, [("id_present", F.col("id").isNotNull())])
    with pytest.raises(ValueError, match="positive_v"):
        require_clean(df, rules)
    # tolerance: 2/3 violations pass at a generous max_rate
    require_clean(df, rules, max_rate=0.7)


def test_heavy_hitters_counts_null_keys(spark):
    """GROUP BY keeps the NULL group; so must heavy_hitters (review-found:
    value_counts dropped NULLs and the semi join could not match them)."""
    from real_big_data_project_spark.operators.heavy_hitters import heavy_hitters

    rows = [(None,)] * 80 + [("a",)] * 60 + [(f"t{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string")
    got = {(r.k, r.n) for r in heavy_hitters(df.repartition(5), "k", 50).collect()}
    assert got == {(None, 80), ("a", 60)}


def test_gapfill_preserves_real_null_observations(spark):
    """A stored row with a NULL value is a real observation: is_gap must
    be false even though LOCF fills its value (review finding)."""
    from real_big_data_project_spark.operators.windows import gapfill_locf

    bars = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-02", None)],
        "k long, day string, close double",
    ).select("k", F.col("day").cast("date").alias("day"), "close")
    out = {str(r.day): (r.is_gap, r.close)
           for r in gapfill_locf(bars, "k", "day", ["close"]).collect()}
    assert out["2024-01-02"] == (False, 10.0)


def test_expectations_guard_rails(spark):
    import pytest

    from real_big_data_project_spark.functions.quality import (
        expectations_report, require_clean)

    empty = spark.createDataFrame([], "v double")
    rep = expectations_report(empty, [("pos", F.col("v") > 0)]).collect()
    assert rep[0].n_violations == 0 and rep[0].violation_rate == 0.0
    require_clean(empty, [("pos", F.col("v") > 0)])  # vacuously clean
    with pytest.raises(ValueError, match="identifier-shaped"):
        expectations_report(empty, [("bad-name", F.col("v") > 0)])
    with pytest.raises(ValueError, match="non-empty"):
        expectations_report(empty, [])


def test_global_running_sum_matches_global_window(spark):
    """Range-sharded cumsum == the single-task window it replaces, on an
    ordering that scrambles the id order (value DESC, id)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_big_data_project_spark.operators.windows import global_running_sum

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 9)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = global_running_sum(
        df, [F.col("v").desc(), "id"], "v", out_col="cs", num_ranges=7
    )
    w = (
        Window.orderBy(F.col("v").desc(), "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cs", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_longest_streaks_islands(spark):
    """Gaps-and-islands: runs split on unflagged rows; per-key stats."""
    from real_big_data_project_spark.operators.windows import longest_streaks

    rows = [
        # key 1: T T F T T T -> streaks {2, 3}
        (1, 1, True), (1, 2, True), (1, 3, False),
        (1, 4, True), (1, 5, True), (1, 6, True),
        # key 2: F F -> no streaks (absent from output)
        (2, 1, False), (2, 2, False),
    ]
    df = spark.createDataFrame(rows, "k int, t int, up boolean")
    got = {r.k: r for r in
           longest_streaks(df, key="k", order_col="t", flag_col="up").collect()}
    assert got[1].longest_streak == 3
    assert got[1].n_streaks == 2
    assert got[1].n_flagged == 5
    assert 2 not in got


def test_global_running_sum_exact_without_exchange_reuse(spark, sf_dir):
    """Same hazard class as global_row_number: without the checkpoint
    pin, the per-range sums and the base-offset branch could resolve
    DIFFERENT sampled range partitionings when exchange reuse is off.
    Pin the cumsum's exactness under the exposing config."""
    from pyspark.sql import Window

    from real_big_data_project_spark.operators.windows import global_running_sum
    from real_big_data_project_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        got = {
            r.o_orderkey: r.cs
            for r in global_running_sum(
                orders, ["o_totalprice", "o_orderkey"],
                "o_orderkey", out_col="cs", num_ranges=7,
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)
    w = (
        Window.orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r.o_orderkey: r.cs
        for r in orders.withColumn("cs", F.sum("o_orderkey").over(w)).collect()
    }
    assert got == want
