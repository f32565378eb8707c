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

# Regression anchors for round 12 (VERDICT r11 items 1, 3-4, 6-8 +
# ADVICE r11): the headline set, the re-certified LR trio, the new
# incremental-rewrite and planted-PII queries, and a hash anchor for
# every query whose code round 12 touched — must be proven green THIS
# round.
MUST_VERIFY = {
    # headline (every round)
    "word_count",
    "pricing_summary",
    "regional_revenue",
    "two_leg_conversion",
    "priority_month_matrix",
    # round-12 #1: the trained quality classifier trio — the round-11
    # red rows, re-certified after the coherence fix (fit returns its
    # own weights, feature-semantics fingerprint token, values-verified
    # attach; serving.py + plans/quality_lr_queries.py)
    "quality_lr_train",
    "quality_lr_corpus_filter",
    "quality_lr_eval",
    # round-12 new: the incremental export CLOSED — dirty shards
    # re-cut via dynamic partition overwrite, clean shards reused
    # byte-for-byte, manifest read back from the files
    # (operators/shardexport.py); its two feeder queries re-certify
    "incremental_shard_rewrite",
    "training_shard_assignment",
    "incremental_shard_export",
    # round-12 new: PII fires at driver scale on planted corpus text
    # (40% of docs carry spans appended to their REAL text; clean docs
    # certified byte-identical), plus the re-promoted bucket audit
    "pii_planted_redaction",
    "pii_redaction_counts",
    # serving.py changed (trained-artifact coherence + the ivfpq
    # quantizer values fingerprint): every serving twin re-certifies
    "part_pagerank_served",
    "phrase_search_served",
    "bm25_topk_served",
    "ann_topk_ivfpq_served",
    "ann_topk_ivfpq",
    "ann_ivfpq_segment_compaction",
    "ann_ivfpq_base_plus_segments",
    "ann_topk_prefiltered",
    "index_segment_compaction_roundtrip",
    "index_base_plus_segments_probe",
    "semantic_dedup_decisions",
    "semantic_dedup_bucketed",
    "neardup_gate_served_probe",
    # dedup_queries.py touched (gate temp-root/table cleanup, ADVICE
    # r11 #3): the LSM gate pair re-certifies
    "neardup_gate_lsm_admissions",
    # retrieval.py touched (mmr_select missing-pair guard, ADVICE r11
    # #1): the retrieval trio re-certifies
    "mmr_diversified_topk",
    "hybrid_topk_rrf",
    "bm25_prf_dense_rerank",
    # similarity.py touched (blocked_anchor_cosines zero-norm guard,
    # ADVICE r11 #2)
    "contrastive_dense_negatives",
    # multimodal.py touched (audio short-clip contract, ADVICE r11 #4)
    "audio_fingerprint_neardup",
    "multimodal_wav_features",
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
