"""Named query catalog — the driver contract.

Every operator in SURVEY.md §2 is exercised by a named query over the
synthetic testdata (FIXTURES.md §B mapping), paired with an ANSI-SQL oracle
string that DuckDB runs on the same parquet for the correctness gate.

Cross-engine conventions (SURVEY.md §7 risk register):
- `min_by`/`max_by` instead of first/last (order-deterministic, exists in
  both engines);
- every ORDER BY / row_number ordering is total (tiebreak columns);
- every computed column is aliased identically on both sides;
- floating aggregates whose summation order differs between engines
  (big sums, windowed avg/stddev) are ROUNDed identically on both sides;
  pure elementwise arithmetic is left unrounded (IEEE ops are
  deterministic given identical expression trees).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, description: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        QUERIES[name] = QuerySpec(name, fn, oracle, description, tags)
        return fn
    return deco


# The driver's CORRECTNESS gate samples the FIRST 50 entries of
# ``queries()``, so exposure order is risk order, not registration order.
# The priority prefix rotates each round: new/changed queries lead (a green
# prior-round row does not certify new output), then the LEAST-recently
# gated queries, so every catalog entry is periodically re-proven on
# current-generation testdata.  Round-7 prefix (tools/gen_rotation.py):
# the two queries whose OUTPUT or CODE changed this round lead —
# q_approx_distinct (now emits oracle-checkable tolerance booleans
# instead of raw sketch values, VERDICT r6 item 6) and q_ann_recall_ivf
# (stored-centroid fixture, item 3) — then the r6 staleness tail
# oldest-first: q_union_all (r02, the stalest row in the repo), the 18
# r03-era rows (incl. the five streaming drains), and r04-era rows to
# fill the 50-slot sample. Done-bar per VERDICT item 2: after this
# round's gate, no catalog query's latest green row predates r04.
_RISKIEST: tuple[str, ...] = (
    "q_approx_distinct",  # last green r04
    "q_ann_recall_ivf",  # last green r05
    "q_union_all",  # last green r02
    "q_corpus_shard",  # last green r03
    "q_corpus_shuffle",  # last green r03
    "q_dedup_embedding",  # last green r03
    "q_dedup_incremental",  # last green r03
    "q_filter_funnel",  # last green r03
    "q_knn_graph",  # last green r03
    "q_ntile_deciles",  # last green r03
    "q_pii_scrub",  # last green r03
    "q_scan_excel",  # last green r03
    "q_scan_jdbc",  # last green r03
    "q_stream_stream_join",  # last green r03
    "q_streaming_dedup",  # last green r03
    "q_streaming_enrich",  # last green r03
    "q_streaming_ohlcv",  # last green r03
    "q_streaming_sessions",  # last green r03
    "q_tags_resolve",  # last green r03
    "q_train_test_split",  # last green r03
    "q_trend_slope_sql",  # last green r03
    "q_ann_recall_sq8",  # last green r04
    "q_catalog_tables",  # last green r04
    "q_corr_stats",  # last green r04
    "q_cube",  # last green r04
    "q_dq_expectations",  # last green r04
    "q_ewma_daily",  # last green r04
    "q_gapfill_locf",  # last green r04
    "q_having_large_orders",  # last green r04
    "q_heavy_hitters",  # last green r04
    "q_incremental_ohlcv",  # last green r04
    "q_linreg_train",  # last green r04
    "q_median_mode",  # last green r04
    "q_merge_upsert",  # last green r04
    "q_min_price_supplier",  # last green r04
    "q_pagerank",  # last green r04
    "q_percentiles",  # last green r04
    "q_pivot_wide",  # last green r04
    "q_quantile_bucket",  # last green r04
    "q_rank_functions",  # last green r04
    "q_recursive_ancestry",  # last green r04
    "q_scan_csv_quarantine",  # last green r04
    "q_scan_jsonl",  # last green r04
    "q_scan_mixed_dir",  # last green r04
    "q_scan_orc",  # last green r04
    "q_scd2_intervals",  # last green r04
    "q_semantic_dedup",  # last green r04
    "q_sessionize",  # last green r04
    "q_simjoin_prefix",  # last green r04
    "q_snapshot_diff",  # last green r04
)


def _family_rank(name: str, spec: QuerySpec) -> tuple[int, int]:
    if name in _RISKIEST:
        return (0, _RISKIEST.index(name))
    mod = spec.builder.__module__
    if mod.endswith("queries_datapipe"):
        return (1, 0)
    if mod.endswith("queries_streaming"):
        return (2, 0)
    return (3, 0)


def _ordered_specs() -> list[tuple[str, QuerySpec]]:
    _load_all()
    # Phantom prefix entries fail loudly: a _RISKIEST name that no
    # queries_* module registers would silently waste a gate slot.
    missing = [n for n in _RISKIEST if n not in QUERIES]
    if missing:
        raise AssertionError(
            f"_RISKIEST names not registered in QUERIES: {missing}"
        )
    # sorted() is stable: within a family, registration order is kept.
    return sorted(QUERIES.items(), key=lambda kv: _family_rank(*kv))


def queries_map() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in _ordered_specs()}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered_specs() if spec.oracle}


_loaded = False


def _load_all() -> None:
    """Import the query modules (registration side effect), once."""
    global _loaded
    if not _loaded:
        from . import queries_core  # noqa: F401
        from . import queries_datapipe  # noqa: F401
        from . import queries_streaming  # noqa: F401
        from . import queries_subquery  # noqa: F401
        _loaded = True
