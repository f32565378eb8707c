"""Registry mapping query names → (Spark plan builder, DuckDB oracle SQL).

The driver contract (__spark_entry__.py) runs each builder at sf0.01 and
hash-compares against the oracle SQL; builders therefore alias every
computed column to the same name the SQL uses, and cast output numerics
to explicit DOUBLE/BIGINT on both sides (see functions/numeric.py for
why decimal-internal/double-out is the float-parity strategy).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    # Driver-window ordering. The correctness gate hash-checks exactly the
    # first 50 entries of queries(); priority (then registration order)
    # decides which land inside that window. Default 100 = in-window;
    # 900 = back-of-book (oracle-less iterative queries and relational
    # variants whose SURVEY §2 rows are already covered by an in-window
    # hash-green query — see tests/test_registry_window.py).
    priority: int = 100


_REGISTRY: dict[str, QuerySpec] = {}
_ORDER: dict[str, int] = {}

# Round-by-round rotation of the driver's 50-query correctness window,
# kept in ONE place instead of editing ~98 @register sites. The driver
# hash-checks exactly the first 50 of all_queries(); these overrides
# (applied over each spec's own priority) decide which 50. Policy:
# every oracle-bearing query must land inside the window in SOME round
# — tests/test_registry_window.py enforces "driver-green in a prior
# round's CORRECTNESS_r*.json OR in the current window".
#
# Round 4: promote the 26 oracle-bearing queries that have never had a
# driver row (corpus governance, IVF/quantization, TF-IDF, distributed
# ranking, the four layout roundtrips, diagnostics, SQL-text entry,
# unpivot/gap-fill/salted rollup, multimodal frame/audio, correlated
# variants) plus this round's new queries; keep 22 anchors that are
# regression-sensitive to round-4 changes (events/NTZ normalization,
# the deterministic-bounds ranking/packing rewrite) or headline perf
# queries; demote everything else that went green in r1-r3 (still
# oracle-tested every CI run by tests/test_oracle_parity.py).
PRIORITY_OVERRIDES: dict[str, int] = {
    # --- never driver-checked, oracle-bearing: promote (prio 10) ---
    **{
        name: 10
        for name in (
            "events_timespine_gapfill",
            "lineitem_measures_unpivot",
            "events_user_rollup_salted",
            "customer_value_deciles",
            "cheapest_supplier_per_part",
            "sole_late_supplier_orders",
            "training_data_mix",
            "decontaminate_ngram",
            "doc_repetition_stats",
            "docs_hash_sample",
            "source_overlap_matrix",
            "source_quality_cap",
            "ann_topk_ivf",
            "embedding_quantize_profile",
            "multimodal_frame_samples",
            "multimodal_audio_windows",
            "zorder_roundtrip",
            "incremental_rollup_roundtrip",
            "schema_evolution_roundtrip",
            "dpp_partitioned_join_roundtrip",
            "tfidf_top_terms",
            "nation_trade_volume_sql",
            "events_key_skew_profile",
            "orders_snapshot_diff",
            "lineitem_column_profile",
            "user_state_history_scd2",
        )
    },
    # --- round-4 regression anchors: keep in-window (prio 20) ---
    **{
        name: 20
        for name in (
            "word_count",
            "pricing_summary",
            "regional_revenue",
            "two_leg_conversion",
            "priority_month_matrix",
            "priority_month_dense_counts",
            "events_hourly_rollup",
            "events_sessionization_batch",
            "events_session_window_batch",
            "user_event_gaps",
            "latest_event_per_user",
            "sequence_packing",
            "doc_chunks_overlap",
            "dedup_exact",
            "dedup_minhash_lsh",
            "ann_topk_bruteforce",
            "multimodal_features",
            "big_spender_segments",
            "csv_roundtrip_word_count",
            "shipping_priority_topk",
            "order_rank_stats",
        )
    },
    # --- green in r1-r3, still CI-oracle-tested: demote (prio 500) ---
    # (anything not listed keeps its registered priority; oracle-less
    # iterative queries stay at 900.)
}
_DEMOTE_DEFAULT = 500


def _effective_priority(name: str) -> int:
    if name in PRIORITY_OVERRIDES:
        return PRIORITY_OVERRIDES[name]
    spec = _REGISTRY[name]
    # Un-listed oracle-bearing queries were all green in earlier rounds:
    # push them behind the promoted set but ahead of oracle-less ones.
    if spec.oracle is not None:
        return _DEMOTE_DEFAULT
    return max(spec.priority, _DEMOTE_DEFAULT + 1)


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    priority: int = 100,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name, fn, oracle, doc or (fn.__doc__ or ""), tags, priority
        )
        _ORDER[name] = len(_ORDER)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """All queries, ordered by (effective priority, registration order);
    the driver's correctness window is the first 50 of this ordering."""
    names = sorted(_REGISTRY, key=lambda n: (_effective_priority(n), _ORDER[n]))
    return {n: _REGISTRY[n] for n in names}
