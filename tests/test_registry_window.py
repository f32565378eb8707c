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

# Regression anchors for round 11 (VERDICT r10 items 1-2, 6-7): the
# headline set, the new round-11 rewrite query, and a hash anchor for
# every query whose code round 11 touched — must be proven green THIS
# round.
MUST_VERIFY = {
    # headline (every round)
    "word_count",
    "pricing_summary",
    "regional_revenue",
    "two_leg_conversion",
    "priority_month_matrix",
    # round-11 new: the exact-substring corpus REWRITE (the cleaned
    # corpus, VERDICT r10 #1; self-promoted prio=10) and the combined
    # drop-then-cut FINAL corpus
    "exact_substring_dedup_rewrite",
    "exact_substring_dedup_corpus",
    # round-11 new: the LSM near-dup gate (streaming/lsh_segments.py —
    # the gate's LSH state as segments + compaction + versioned serving)
    "neardup_gate_lsm_admissions",
    "neardup_gate_served_probe",
    # round-11 new: the TRAINED quality classifier (operators/
    # lrquality.py — hard-sigmoid fixed-point logistic distillation,
    # full fit oracle-replayed)
    "quality_lr_train",
    "quality_lr_corpus_filter",
    "quality_lr_eval",
    # operators/substring.py refactored (merge_intervals factored out,
    # shared by spans/coverage/rewrite) — re-certify the r10 pair
    "exact_substring_spans",
    "doc_duplication_coverage",
    # LSM compaction converged onto serving.py's versioned publish
    # (VERDICT r10 #2): both instantiations' segment queries
    "index_segment_compaction_roundtrip",
    "index_base_plus_segments_probe",
    "ann_ivfpq_segment_compaction",
    "ann_ivfpq_base_plus_segments",
    # serving.py changed (ADVICE r10 fixes, fitted artifacts, storage
    # seam): every *_served twin re-certifies
    "phrase_search_served",
    "bm25_topk_served",
    "part_pagerank_served",
    "ann_topk_ivfpq_served",
    # fitted artifacts arrive via served tables now (VERDICT r10 #6)
    "semantic_dedup_decisions",
    "semantic_dedup_bucketed",
    "ann_topk_ivfpq",
    # round-11 new: hybrid retrieval (operators/retrieval.py — RRF
    # fusion in integer micro-units; BM25 → PRF centroid → dense rerank)
    "hybrid_topk_rrf",
    "bm25_prf_dense_rerank",
    # round-11 new: quality-aware canonical selection (keep the BEST
    # cluster member, not the lowest id); the cluster CTE refactor also
    # re-certifies dedup_clusters via its existing ever-green row + CI
    "dedup_canonical_by_quality",
    # round-11 new: contrastive pair mining (positives = ssjoin
    # near-dups; hard negatives = top unigram-Jaccard non-duplicates)
    "contrastive_pairs",
    # round-11 new: CDC report between raw and cleaned corpus versions
    "corpus_version_diff",
    # round-11 new: training shard export (seeded deterministic global
    # shuffle -> fixed-size shards + manifest, distributed prefix-sum)
    "training_shard_assignment",
    "training_shard_manifest",
    # round-11 new: perceptual near-dup for BOTH media codecs (decode
    # -> 60-bit code -> shared banded Hamming join); the bmp_pixels /
    # wav_samples refactors also re-certify the decode queries
    "image_dhash_neardup",
    "audio_fingerprint_neardup",
    "multimodal_bmp_features",
    "multimodal_wav_features",
    # round-11 new: metadata-filtered vector search (pre-filter as an
    # equi-join key, exact top-k over the filtered set)
    "ann_topk_prefiltered",
    # round-11 new: cluster-hashed leakage-free split + the measured
    # leak report (doc-level hashes leak 44% of near-dup pairs at
    # sf0.01; cluster-level leaks zero by construction)
    "leakage_free_split",
    "split_leakage_report",
    # round-11 new: dirty-shard incremental export (shard map x CDC)
    "incremental_shard_export",
    # round-11 new: MMR diversified re-rank (greedy in integer
    # nano-units; oracle = 5 unrolled CTE steps)
    "mmr_diversified_topk",
    # round-11 new: semantic-space contrastive negatives + the
    # tokenizer-cost report
    "contrastive_dense_negatives",
    "tokenizer_fertility_by_source",
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
