"""Manifest-based snapshot table: versioned commits, snapshot-isolated
reads, and time travel over plain parquet — the minimal transactional-
table pattern (the Iceberg/Delta shape) built from immutable files plus
an atomically-flipped pointer. The reference's storage engine keeps
history via hypertables + continuous aggregates; this is the missing
"read the table as it was before last night's load" capability, and the
substrate that makes compaction/deletes SAFE under concurrent readers
(sources/sinks.py rewrites partitions in place — correct for a single
writer, but a reader racing the rewrite can see a partition half-old,
half-new; here a reader pinned to version v never can).

Layout (everything under one root):
  data/c{N}-{uuid}/part-*.parquet   immutable per-commit file groups
  manifests/v{N}.json               snapshot N = ordered list of groups
  _latest                           current version (atomic os.replace)

Invariants:
  * data files are NEVER mutated or deleted by commits — a commit only
    ADDS a file group and writes the next manifest (append: old list +
    new group; delete/compact: a single replacement group);
  * readers resolve a manifest ONCE and read exactly its groups —
    snapshot isolation for free, any historical version stays readable
    until `expire_snapshots` garbage-collects unreferenced groups;
  * the version pointer flips via os.replace (atomic on POSIX) — a
    crashed writer leaves either the old or the new version, never a
    torn table. (Multi-writer coordination — optimistic CAS on the
    pointer — needs the filesystem/catalog to arbitrate, exactly as in
    the real table formats; single-writer is assumed here.)

Driver-side file IO touches ONLY manifest-sized metadata (file-group
names, a version int); row data moves through executor-side
DataFrame reads/writes.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, "manifests", f"v{version}.json")


def _read_manifest(root: str, version: int) -> list[str]:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)["groups"]


def latest_version(root: str) -> int:
    """Current committed version; 0 = empty table (no commits yet)."""
    ptr = os.path.join(root, "_latest")
    if not os.path.exists(ptr):
        return 0
    with open(ptr) as f:
        return int(f.read().strip())


def _commit(root: str, version: int, groups: list[str]) -> int:
    """CONCURRENCY CONTRACT — single writer assumed. Two writers that
    both read version v will both build manifest v+1: the second manifest
    rename overwrites the first (both manifest and pointer are published
    via temp-file + atomic os.replace, so neither can tear), the second
    pointer flip wins, and the
    loser's rows are silently absent from v+1 (its file group stays on
    disk, unreferenced and un-torn — nothing is ever corrupted, the
    losing UPDATE is lost). This is exactly the anomaly optimistic table
    formats close with a compare-and-swap on the pointer, which a plain
    filesystem cannot express atomically; multi-writer deployments must
    front commits with a lock/catalog that arbitrates the flip.
    tests/test_sinks.py::test_snapshot_store_concurrent_append_contract
    pins the observable behavior (consistent table, no torn files)."""
    os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
    new_v = version + 1
    # The manifest gets the same temp-write + atomic-rename as the
    # pointer: two racing commits of DIFFERENT manifest lengths writing
    # the final path directly could interleave truncate/flush and leave
    # torn JSON behind a valid pointer. With os.replace the loser's
    # manifest is wholly overwritten, never mixed.
    mtmp = _manifest_path(root, new_v) + f".tmp.{uuid.uuid4().hex}"
    with open(mtmp, "w") as f:
        json.dump({"groups": groups}, f)
    os.replace(mtmp, _manifest_path(root, new_v))
    tmp = os.path.join(root, f"_latest.tmp.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(str(new_v))
    os.replace(tmp, os.path.join(root, "_latest"))  # atomic flip
    return new_v


def _write_group(df: DataFrame, root: str, version: int) -> str:
    group = f"c{version + 1}-{uuid.uuid4().hex[:8]}"
    df.write.mode("error").parquet(os.path.join(root, "data", group))
    return group


def snapshot_append(df: DataFrame, root: str) -> int:
    """Commit an append: new file group + manifest (old groups + new).
    Returns the new version."""
    v = latest_version(root)
    group = _write_group(df, root, v)
    groups = (_read_manifest(root, v) if v else []) + [group]
    return _commit(root, v, groups)


def snapshot_delete_keys(
    spark: SparkSession, root: str, keys: DataFrame, key_col: str
) -> int:
    """Commit a delete: anti-join the CURRENT snapshot against the key
    set into one replacement group. Prior versions keep the rows —
    compliance deletes that must destroy history additionally need
    `expire_snapshots` down to the new version."""
    v = latest_version(root)
    cur = read_snapshot(spark, root, version=v)
    kept = cur.join(F.broadcast(keys), on=key_col, how="left_anti")
    group = _write_group(kept, root, v)
    return _commit(root, v, [group])


def snapshot_compact(spark: SparkSession, root: str) -> int:
    """Commit a compaction: rewrite the current snapshot as one group.
    Old versions stay readable (their groups remain until expired)."""
    v = latest_version(root)
    cur = read_snapshot(spark, root, version=v)
    group = _write_group(cur, root, v)
    return _commit(root, v, [group])


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the table AS OF ``version`` (default: latest). The file list
    is resolved HERE, once — the returned DataFrame keeps seeing exactly
    this snapshot no matter what is committed afterwards."""
    latest = latest_version(root)
    v = latest if version is None else version
    if latest == 0:
        raise ValueError(f"snapshot store {root!r} has no commits")
    if not (1 <= v <= latest) or not os.path.exists(_manifest_path(root, v)):
        raise ValueError(
            f"snapshot store {root!r} has no version {v} "
            f"(latest is {latest}; earlier versions may be expired)"
        )
    groups = _read_manifest(root, v)
    return spark.read.parquet(
        *[os.path.join(root, "data", g) for g in groups]
    )


def expire_snapshots(root: str, keep_from: int) -> list[str]:
    """Garbage-collect: drop manifests below ``keep_from`` and delete
    file groups no surviving manifest references. Returns the removed
    group names. The one destructive operation — callers choose the
    retention horizon (and compliance deletes pass the deleting
    version)."""
    import shutil

    latest = latest_version(root)
    if latest == 0:
        return []
    keep_from = max(1, min(keep_from, latest))
    live: set[str] = set()
    for v in range(keep_from, latest + 1):
        live.update(_read_manifest(root, v))
    removed = []
    data_dir = os.path.join(root, "data")
    for g in sorted(os.listdir(data_dir)):
        if g not in live:
            shutil.rmtree(os.path.join(data_dir, g))
            removed.append(g)
    for v in range(1, keep_from):
        p = _manifest_path(root, v)
        if os.path.exists(p):
            os.remove(p)
    return removed


def ensure_versioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent three-version fixture for the time-travel oracle:
    v1 = pre-1998 orders, v2 = append the rest, v3 = compliance-delete
    every o_custkey divisible by 100. Cached per testdata generation
    (registry.fixture_tag)."""
    import shutil

    from .registry import fixture_tag, load_table

    artifacts = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "_artifacts",
    )
    root = os.path.join(artifacts, f"snapstore_orders_{fixture_tag(sf_dir)}")
    marker = os.path.join(root, ".built")
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)  # clear partial builds
        os.makedirs(root, exist_ok=True)
        orders = load_table(spark, sf_dir, "orders")
        snapshot_append(
            orders.filter(F.col("o_orderdate") < F.lit("1998-01-01")), root
        )
        snapshot_append(
            orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01")), root
        )
        del_keys = (
            orders.filter(F.col("o_custkey") % 100 == 0)
            .select("o_custkey").distinct()
        )
        snapshot_delete_keys(spark, root, del_keys, "o_custkey")
        with open(marker, "w") as f:
            f.write("ok\n")
    return root
