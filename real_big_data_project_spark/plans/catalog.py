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
# current-generation testdata.
#
# GENERATED — do not hand-edit.  Regenerate with
#     python tools/gen_rotation.py [pinned new/changed query names...]
# and paste the _ROTATION_VINTAGE/_PINNED/_RISKIEST block below verbatim.
# tests/test_plans.py::test_rotation_prefix_is_generated recomputes
# compute_prefix(_PINNED) from the live CORRECTNESS_r*.json set and fails
# the suite if this block is stale (VERDICT r8 item 1: round 8 silently
# re-proved the identical r7 sample; a hand-maintained prefix cannot be
# trusted to rotate).  Round-11 prefix: _PINNED is empty (no new or
# output-changed queries yet this round — re-pin via gen_rotation argv if
# any land); the 28 remaining r06-vintage rows lead (scan family, OHLCV,
# bollinger, tick compression, TPC-H pricing-summary kin), then r08-vintage
# fill — after this gate no catalog query's latest green row predates r08.
_ROTATION_VINTAGE = 10
_PINNED: tuple[str, ...] = ()
_RISKIEST: tuple[str, ...] = (
    "q_intersect_except",  # last green r06
    "q_interval_join",  # last green r06
    "q_isin_resolve",  # last green r06
    "q_join_distinct_orderby",  # last green r06
    "q_json_extract",  # last green r06
    "q_lag_pct_change",  # last green r06
    "q_minmax_range",  # last green r06
    "q_null_profile",  # last green r06
    "q_ohlcv_daily",  # last green r06
    "q_partition_prune",  # last green r06
    "q_prefix_normalize",  # last green r06
    "q_pricing_summary",  # last green r06
    "q_project_rename",  # last green r06
    "q_range_window",  # last green r06
    "q_regex_clean",  # last green r06
    "q_regional_volume",  # last green r06
    "q_rolling_bollinger",  # last green r06
    "q_rollup",  # last green r06
    "q_rowwise_stats",  # last green r06
    "q_scan_csv",  # last green r06
    "q_scan_parquet",  # last green r06
    "q_scan_pickle",  # last green r06
    "q_semi_join_orphans",  # last green r06
    "q_surrogate_keys",  # last green r06
    "q_tick_compression",  # last green r06
    "q_token_budget_select",  # last green r06
    "q_topk",  # last green r06
    "q_topk_per_group",  # last green r06
    "q_ann_bucket",  # last green r08
    "q_ann_ivf",  # last green r08
    "q_ann_recall",  # last green r08
    "q_ann_recall_ivf",  # last green r08
    "q_ann_recall_sq8",  # last green r08
    "q_ann_topk",  # last green r08
    "q_approx_distinct",  # last green r08
    "q_catalog_tables",  # last green r08
    "q_corpus_select",  # last green r08
    "q_corpus_shard",  # last green r08
    "q_corpus_shuffle",  # last green r08
    "q_corr_stats",  # last green r08
    "q_cube",  # last green r08
    "q_daily_stats_table",  # last green r08
    "q_datapipe_e2e",  # last green r08
    "q_decontaminate",  # last green r08
    "q_dedup_canonical",  # last green r08
    "q_dedup_components",  # last green r08
    "q_dedup_components_incremental",  # last green r08
    "q_dedup_embedding",  # last green r08
    "q_dedup_incremental",  # last green r08
    "q_dedup_minhash_lsh",  # last green r08
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
        from . import queries_tokenizer  # noqa: F401
        _loaded = True
