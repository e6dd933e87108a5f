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
# trusted to rotate).  Round-10 prefix: nothing is pinned yet (new
# round-10 queries get pinned when they register); the 26 remaining
# r05-vintage rows lead (multimodal family, lang-id/text-stats, the r04
# TPC-H analogues already cleared in r09), then r06-vintage fill — after
# this gate no catalog query's latest green row predates r06.
_ROTATION_VINTAGE = 9
_PINNED: tuple[str, ...] = ('q_semantic_dedup_autok', 'q_bpe_encode', 'q_bpe_vocab', 'q_doc_tokens')
_RISKIEST: tuple[str, ...] = (
    "q_semantic_dedup_autok",  # never gated
    "q_bpe_encode",  # last green r09
    "q_bpe_vocab",  # last green r09
    "q_doc_tokens",  # last green r09
    "q_lang_id",  # last green r05
    "q_market_share",  # last green r05
    "q_multimodal_decode",  # last green r05
    "q_multimodal_features",  # last green r05
    "q_multimodal_frames",  # last green r05
    "q_multimodal_meta",  # last green r05
    "q_order_count_distribution",  # last green r05
    "q_pandas_udf_norm",  # last green r05
    "q_profit_by_nation_year",  # last green r05
    "q_promo_revenue",  # last green r05
    "q_qualified_suppliers",  # last green r05
    "q_repetition_filter",  # last green r05
    "q_sequence_packing",  # last green r05
    "q_small_qty_revenue",  # last green r05
    "q_source_divergence",  # last green r05
    "q_stratified_sample",  # last green r05
    "q_supplier_excl_count",  # last green r05
    "q_temperature_mix",  # last green r05
    "q_text_stats",  # last green r05
    "q_top_revenue_supplier",  # last green r05
    "q_top_terms_by_lang",  # last green r05
    "q_unigram_surprisal",  # last green r05
    "q_up_streaks",  # last green r05
    "q_variant_extract",  # last green r05
    "q_weighted_sample",  # last green r05
    "q_zipf_fit",  # last green r05
    "q_above_avg",  # last green r06
    "q_anti_join_new_keys",  # last green r06
    "q_array_ops",  # last green r06
    "q_asof_join",  # last green r06
    "q_broadcast_lookup",  # last green r06
    "q_case_market_map",  # last green r06
    "q_case_when_clamp",  # last green r06
    "q_company_timeseries",  # last green r06
    "q_counts",  # last green r06
    "q_customer_revenue",  # last green r06
    "q_daily_bars_fallback",  # last green r06
    "q_dashboard_session",  # last green r06
    "q_dedup_keys",  # last green r06
    "q_event_transitions",  # last green r06
    "q_exists_late_orders",  # last green r06
    "q_filter_outliers",  # last green r06
    "q_filter_positive",  # last green r06
    "q_first_last_per_group",  # last green r06
    "q_fuzzy_match",  # last green r06
    "q_group_count",  # last green r06
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
