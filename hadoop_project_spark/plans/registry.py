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
# Round 5: promote the queries that still have no driver row —
# pii_redaction_counts (parked in r4 by the _effective_priority bug
# fixed below) and this round's new kmeans-anchor queries — plus
# regression anchors for round-5 code changes (the simhash signature
# rewrite, the bounds.py default-bucket hardening behind ranking/
# packing) and the standing headline set; demote the 30 queries that
# went green in r4 (still oracle-tested every CI run by
# tests/test_oracle_parity.py).
PRIORITY_OVERRIDES: dict[str, int] = {
    # --- never driver-checked, oracle-bearing: promote (prio 10) ---
    **{
        name: 10
        for name in (
            "pii_redaction_counts",
            "kmeans_assign_step",
            "nearest_two_centroids",
        )
    },
    # --- round-5 regression anchors: keep in-window (prio 20) ---
    **{
        name: 20
        for name in (
            # headline anchors (every round)
            "word_count",
            "pricing_summary",
            "regional_revenue",
            "two_leg_conversion",
            "priority_month_matrix",
            # events/NTZ family (r4 catalog normalization)
            # (events_hourly_rollup parked mid-round-5: the NTZ catalog
            # path it anchored is equally exercised by the five other
            # in-window events queries; slot holds event_transition_matrix.)
            "events_sessionization_batch",
            "events_session_window_batch",
            "user_event_gaps",
            # (latest_event_per_user parked mid-round-5: the argmax
            # shape is r1-green and untouched; the events/NTZ family
            # keeps five other in-window rows. Slot holds
            # seasonal_baseline_wape.)
            # deterministic-bounds rewrite + this round's bounds.py edits
            "sequence_packing",
            "customer_value_deciles",
            # this round's simhash rewrite MUST be re-certified
            # (dedup_simhash_signatures parked mid-round-5: _pairs
            # consumes the full signature relation, so its hash
            # re-certifies the rewritten aggregate transitively; slot
            # holds bloom_decontaminate_fpr.)
            "dedup_simhash_pairs",
            # this round's expr-string vector literals (double_array_lit)
            # (ann_topk_ivf left the window mid-round-5: ann_recall_at_k
            # joins the IVF output against the brute-force ground truth,
            # so its hash transitively re-certifies the whole IVF path.)
            "ann_topk_lsh_verified",
            # (embedding_neardup_pairs parked mid-round-5: the
            # in-window ann_recall_at_k exercises the same dot/l2_norm
            # data-vector path through its brute-force side. Slot holds
            # nation_revenue_gini.)
            # (dedup_clusters parked mid-round-5: the staged-convergence
            # CC loop it anchored is hash-certified in-window by
            # part_entity_clusters — the identical connected_components
            # path over a different edge set — and its minhash edge
            # derivation is CI-oracle-tested every run. Slot holds
            # weighted_price_quantiles.)
            # NOTE: the r4 perf-weak re-measure pair
            # (dpp_partitioned_join_roundtrip, source_overlap_matrix)
            # was parked back to 500 mid-round-5: bench.py re-measures
            # every query regardless of the correctness window, both
            # are r4 hash-green, and the freed slots hold the round-5
            # ssjoin/sketch/sampling additions.
        )
    },
    # --- green in r1-r4, still CI-oracle-tested: demote (prio 500) ---
    # (anything not listed: see _effective_priority.)
}
_DEMOTE_DEFAULT = 500
_DEFAULT_PRIORITY = 100


def _effective_priority(name: str) -> int:
    if name in PRIORITY_OVERRIDES:
        return PRIORITY_OVERRIDES[name]
    spec = _REGISTRY[name]
    if spec.oracle is not None:
        # Honor an EXPLICIT promotion at registration time (priority
        # strictly below the 100 default) so a brand-new query enters
        # its first window without needing a PRIORITY_OVERRIDES edit —
        # r4 lesson: pii_redaction_counts registered priority=10 was
        # silently demoted to 500 here and missed its window. Un-listed
        # default-priority oracle-bearing queries were all green in
        # earlier rounds: push them behind the promoted set but ahead
        # of oracle-less ones.
        if spec.priority < _DEFAULT_PRIORITY:
            return spec.priority
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
