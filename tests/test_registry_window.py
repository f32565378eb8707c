"""The driver's correctness gate hash-checks exactly the first 50
registered queries. This suite pins the window's composition so a
refactor can't silently push an oracle-bearing query family out of
driver verification again (round-1 lesson: the whole dedup/ANN family
registered past the window and got no CORRECTNESS rows).

Round 4 changes the policy from a static window to a ROTATION: the
window now holds every oracle-bearing query that has never had a green
driver row (26 as of r3) plus regression anchors for this round's code
changes. The invariant enforced here: every oracle-bearing query is
either already driver-green in some committed CORRECTNESS_r*.json or
inside the current window — i.e. nothing oracle-bearing can be parked
forever.
"""

from __future__ import annotations

import glob
import json
import os

from hadoop_project_spark.plans import all_queries

WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Regression anchors for round 6 (VERDICT r5 item 2): the queries r5
# parked mid-round come back for re-certification, plus anchors for
# round-6 code changes and the standing headline set — must be proven
# green THIS round.
MUST_VERIFY = {
    # headline (every round)
    "word_count",
    "pricing_summary",
    "regional_revenue",
    "two_leg_conversion",
    "priority_month_matrix",
    # parked mid-round-5, brought back
    "dpp_partitioned_join_roundtrip",
    "source_overlap_matrix",
    "dedup_clusters",
    "embedding_neardup_pairs",
    "ann_topk_ivf",
    "dedup_simhash_signatures",
    "events_hourly_rollup",
    "latest_event_per_user",
    # round-6 code-touch anchors
    "bloom_decontaminate_fpr",  # bloom_probe per-row-id rewrite
    "part_entity_clusters",  # shares the CC loop with dedup_clusters
    "dedup_minhash_lsh",  # integer-minhash rewrite direct anchor
    "dedup_ngram_jaccard",  # shares the restructured jaccard_verify
    # round-6 new queries (self-promoted at priority=10)
    "hll_source_distinct_shingles",
    "multimodal_wav_features",
    "embedding_neardup_pairs_bucketed",
    "bigram_pmi_collocations",
    "doc_duplicate_spans",
    "hll_source_overlap",
    "quality_filter_funnel",
    "events_decayed_engagement",
    "price_quantile_histogram",
}


def _ever_green() -> set[str]:
    """Query names with a green driver row in any committed round."""
    green: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") or (
                row.get("hash_match") is None and row.get("rows_match")
            ):
                green.add(name)
    return green


def test_window_has_no_oracle_less_queries():
    specs = list(all_queries().values())[:WINDOW]
    missing = [s.name for s in specs if s.oracle is None]
    assert not missing, f"oracle-less queries inside the driver window: {missing}"


def test_must_verify_queries_inside_window():
    window_names = set(list(all_queries())[:WINDOW])
    out = MUST_VERIFY - window_names
    assert not out, f"must-verify queries outside the driver window: {out}"


def test_no_oracle_bearing_query_parked_forever():
    """Every oracle-bearing query has either already earned a green
    driver row (committed CORRECTNESS_r*.json) or sits inside the
    current window so it earns one this round."""
    qs = all_queries()
    window_names = set(list(qs)[:WINDOW])
    green = _ever_green()
    parked = [
        n
        for n, s in qs.items()
        if s.oracle is not None and n not in green and n not in window_names
    ]
    assert not parked, f"oracle-bearing queries with no path to a driver row: {parked}"


def test_exiled_oracle_less_queries_are_by_design():
    """Everything outside the window without an oracle must be one of
    the known oracle-less-by-design iterative/approximate queries, each
    covered by its own local test suite."""
    ORACLE_LESS_BY_DESIGN = {
        "kmeans_centroids",  # iterative; NumPy-Lloyd twin tests
        "kmeans_cluster_sizes",
        "kmeans_silhouette",
    }
    qs = all_queries()
    unexplained = [
        n
        for n, s in qs.items()
        if s.oracle is None and n not in ORACLE_LESS_BY_DESIGN
    ]
    assert not unexplained, f"oracle-less queries without a design note: {unexplained}"
