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

# Regression anchors for round 10 (VERDICT r9 items 1-4, 7-8): the
# headline set, the five new round-10 queries, and a hash anchor for
# every query whose code round 10 touched — must be proven green THIS
# round.
MUST_VERIFY = {
    # headline (every round)
    "word_count",
    "pricing_summary",
    "regional_revenue",
    "two_leg_conversion",
    "priority_month_matrix",
    # round-10 new: serving twins of the stored index / bucketed
    # PageRank, exact-substring dedup, avro roundtrip (self-promoted
    # prio=10)
    "phrase_search_served",
    "bm25_topk_served",
    "part_pagerank_served",
    "exact_substring_spans",
    "doc_duplication_coverage",
    "avro_roundtrip_segment_stats",
    # round-10 code-touch anchors: the LSM module was rewritten
    # (snapshot watermark, lost-base rebuild, manifest publish — the
    # serving-state probe now publishes via manifests)...
    "index_segment_compaction_roundtrip",
    "index_base_plus_segments_probe",
    # ...the stored-index builds route through write_index_tables /
    # write_bucketed, which gained external-path support...
    "inverted_index_build_roundtrip",
    "bm25_topk_stored",
    "bucketed_join_roundtrip",
    # ...and the bucketed PageRank iteration loop was extracted into a
    # helper shared with the served twin
    "part_pagerank_bucketed",
    # round-10 continuation: the product-quantization family (flat
    # ADC, composed IVF-PQ, its partition-pruned served twin, the
    # recall eval) and the ANN instantiation of the generalized LSM
    # segment machinery — all self-promoted prio=10
    "ann_topk_pq_adc",
    "ann_topk_ivfpq",
    "ann_topk_ivfpq_served",
    "ann_pq_recall",
    "ann_ivfpq_segment_compaction",
    "ann_ivfpq_base_plus_segments",
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


def test_every_query_has_an_oracle():
    """Round 8 closed the last oracle-less entries (the iterative
    K-Means queries now run the pinned fixed-point fit with a chained-
    CTE replay oracle, plans/ml_queries.py) — the whole registry is
    oracle-bearing and must stay that way."""
    qs = all_queries()
    oracle_less = [n for n, s in qs.items() if s.oracle is None]
    assert not oracle_less, f"oracle-less queries: {oracle_less}"
