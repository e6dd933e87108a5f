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
# The priority prefix rotates each round: queries that already hold a green
# driver row (CORRECTNESS_r02/r03, post-testdata-regeneration) are excluded
# from the prefix so the sample reaches never-gated queries first.
# Round 4 prefix = the 18 queries with no driver row on current-generation
# testdata (q_sql_passthrough's only row is r01, pre-regeneration), then
# round-4 additions.
_RISKIEST: tuple[str, ...] = (
    # never driver-sampled on current testdata (VERDICT r3 item 1)
    "q_sql_passthrough",  # the dashboard tab-3 surface
    "q_approx_distinct",
    "q_catalog_tables",
    "q_corr_stats",
    "q_cube",
    "q_having_large_orders",
    "q_percentiles",
    "q_pivot_wide",
    "q_quantile_bucket",
    "q_rank_functions",
    "q_scan_csv_quarantine",
    "q_scd2_intervals",
    "q_sessionize",
    "q_snapshot_diff",
    "q_streaming_stateful_pct",
    "q_trend_slope",
    "q_unpivot",
    "q_value_histogram",
    # round-4 additions — new operators go under the driver gate first
    "q_ann_recall",
    "q_multimodal_features",
    "q_scan_mixed_dir",
    "q_dedup_components_incremental",
    "q_dedup_recall",
    "q_ann_recall_ivf",
    "q_incremental_ohlcv",
    "q_merge_upsert",
    "q_heavy_hitters",
    "q_semantic_dedup",
    "q_ann_recall_sq8",
    "q_scan_jsonl",
    "q_scan_orc",
    "q_zorder_layout",
    "q_span_dedup",
    "q_linreg_train",
    "q_gapfill_locf",
    "q_ewma_daily",
    "q_dq_expectations",
    # round-4 continuation, riskiest first — the 50-query sample reaches
    # position 50, so the subtlest cross-engine contracts (iterative
    # float traces, rounding/parity disciplines, fixture-backed store
    # reads, the EXISTS-pair rewrite) outrank conventional SQL shapes;
    # the remainder rotates into the r5 sample.
    "q_supplier_wait_fault",
    "q_recursive_ancestry",
    "q_pagerank",
    "q_simjoin_prefix",
    "q_time_travel",
    "q_svm_train",
    "q_token_budget_select",
    "q_small_qty_revenue",
    "q_min_price_supplier",
    "q_market_share",
    "q_vwap_twap",
    "q_udtf_chunks",
    "q_median_mode",
    # below the 50-line on current counts — r5 rotation
    "q_grouping_sets",
    "q_idle_rich_customers",
    "q_order_count_distribution",
    "q_supplier_excl_count",
    "q_top_revenue_supplier",
    "q_qualified_suppliers",
    "q_promo_revenue",
    "q_profit_by_nation_year",
    "q_up_streaks",
    "q_source_divergence",
    "q_zipf_fit",
    "q_variant_extract",
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
