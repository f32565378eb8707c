"""Replay the reference's committed fixtures end-to-end.

The reference repo ships one real input/output pair: the `final`
K-Means project's inputs/sample.csv and outputs/KResults.txt +
Summary.txt (final/src/main/java/calc/Summarizer.java:86,100-113 write
the formats). Its unseeded java.util.Random (CGenerator.java:99) makes
value-level byte parity impossible (SURVEY.md §5), so these tests pin
what IS deterministic:

* the exact line grammar of both reports (validated against the
  committed goldens themselves, then against our replay output);
* the k=1 Double.MAX_VALUE silhouette sentinel (== 1.0, bug-compat);
* 3-dp HALF_UP centroid rounding in the Summary lines;
* the silhouette-vs-k shape (peak at the golden's k).
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

GOLD = Path("/root/reference/final/outputs")
SAMPLE = "/root/reference/final/inputs/sample.csv"

KRES_RE = re.compile(
    r"^SilScore:(-?\d+(?:\.\d+)?(?:E-?\d+)?) at Kvalue:(\d+) at iteration:(\d+)$"
)
SUMMARY_HDR_RE = re.compile(
    r"^Max SilScore:(-?\d+(?:\.\d+)?(?:E-?\d+)?) at kValue:(\d+) at iteration:(\d+)$"
)
CENTROID_RE = re.compile(r"^(\d+)\. Lat:(-?\d+(?:\.\d+)?) Longitude:(-?\d+(?:\.\d+)?)$")


def _lines(p: Path) -> list[str]:
    return p.read_text().strip("\n").split("\n")


def test_golden_files_match_the_grammar():
    """The regexes below ARE the golden formats: every committed golden
    line must parse, so the replay assertions test the same grammar the
    reference actually wrote."""
    for line in _lines(GOLD / "KResults.txt"):
        assert KRES_RE.match(line), line
    summary = _lines(GOLD / "Summary.txt")
    assert SUMMARY_HDR_RE.match(summary[0]), summary[0]
    assert summary[1] == "Corresponding centroids"
    for line in summary[2:]:
        assert CENTROID_RE.match(line), line


@pytest.fixture(scope="module")
def replay(spark):
    from hadoop_project_spark.sources.csv import read_pickups_csv
    from hadoop_project_spark.workloads.kmeans_pipeline import run_kmeans_pipeline

    pickups = read_pickups_csv(spark, SAMPLE)
    # the golden KResults sweeps k = 1..4 (KDriver's limit/step on the
    # sample run); max_iter 20 as KMeans.java's loop bound
    return run_kmeans_pipeline(pickups, k_limit=4, k_step=1, max_iter=20)


def test_kresults_replay_format(replay):
    assert len(replay.kresults_lines) == 4
    ks = []
    for line in replay.kresults_lines:
        m = KRES_RE.match(line)
        assert m, line
        ks.append(int(m.group(2)))
    assert ks == [1, 2, 3, 4]


def test_summary_replay_format(replay):
    summary = replay.summary_lines
    assert SUMMARY_HDR_RE.match(summary[0]), summary[0]
    assert summary[1] == "Corresponding centroids"
    assert len(summary) >= 3
    for line in summary[2:]:
        m = CENTROID_RE.match(line)
        assert m, line
        for g in (2, 3):
            v = float(m.group(g))
            # 3-dp HALF_UP rounding (KMeans.java:192-194)
            assert abs(v * 1000 - round(v * 1000)) < 1e-6, line


def test_silhouette_k1_sentinel_and_peak(replay):
    """Reference leaves second_distance at Double.MAX_VALUE for k=1, so
    SilScore is exactly 1.0 there (golden line 1) and the sweep peaks at
    k=1 — the same shape the golden KResults records."""
    assert replay.scores[1] == 1.0
    assert replay.best_k == 1
    assert replay.best_score == 1.0
    for k, s in replay.scores.items():
        assert 0.0 < s <= 1.0, (k, s)


def test_report_files_written(replay, spark, tmp_path):
    """S9 sink twin: the pipeline writes KResults/Summary text files in
    the reference's layout when given a report dir."""
    from hadoop_project_spark.sources.csv import read_pickups_csv
    from hadoop_project_spark.workloads.kmeans_pipeline import run_kmeans_pipeline

    pickups = read_pickups_csv(spark, SAMPLE).limit(200)
    out = str(tmp_path / "reports")
    run_kmeans_pipeline(pickups, k_limit=2, k_step=2, max_iter=5, report_dir=out)
    kres = list(Path(out).glob("KResults/part-*"))
    summ = list(Path(out).glob("Summary/part-*"))
    assert kres and summ
    for line in Path(kres[0]).read_text().strip().split("\n"):
        assert KRES_RE.match(line), line
