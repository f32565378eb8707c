"""Reference-workload parity tests: each workload's Spark result is
checked against an independent pure-Python evaluation of the reference
semantics (SURVEY.md §5 e2e level)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from hadoop_project_spark.workloads.airline_delay import (
    airline_month_avg_delay,
    format_delay_matrix,
)
from hadoop_project_spark.workloads.flight_join import two_leg_delay_stats
from hadoop_project_spark.workloads.kmeans_pipeline import run_kmeans_pipeline
from hadoop_project_spark.workloads.wordcount import word_count, word_count_filtered

from tests.fixtures import corpus_lines, flight_rows, pickup_rows


@pytest.fixture(scope="module")
def lines_df(spark):
    return spark.createDataFrame([(l,) for l in corpus_lines()], "value string")


@pytest.fixture(scope="module")
def flights_df(spark):
    return spark.createDataFrame(flight_rows())


@pytest.fixture(scope="module")
def pickups_df(spark):
    return spark.createDataFrame(pickup_rows())


def test_word_count(lines_df):
    expected = Counter(
        tok for line in corpus_lines() for tok in line.split() if tok
    )
    got = {r["word"]: r["count"] for r in word_count(lines_df).collect()}
    assert got == dict(expected)


def test_word_count_filtered(lines_df):
    expected = Counter(
        tok
        for line in corpus_lines()
        for tok in line.split()
        if tok and tok[0] in "mnopqMNOPQ"
    )
    got = {
        r["word"]: r["count"]
        for r in word_count_filtered(lines_df, partition_by_first_char=4).collect()
    }
    assert got == dict(expected)


def _py_two_leg(rows, origin="ORD", dest="JFK",
                lo=(2007, 6, 1), hi=(2008, 5, 31)):
    import datetime

    lo_d, hi_d = datetime.date(*lo), datetime.date(*hi)

    def valid(r):
        d = datetime.date(r["Year"], r["Month"], r["DayOfMonth"])
        if not (
            (r["Origin"] == origin or r["Dest"] == dest)
            and not (r["Origin"] == origin and r["Dest"] == dest)
        ):
            return False
        return (
            r["Cancelled"] != "1.00"
            and r["Diverted"] != "1.00"
            and lo_d <= d <= hi_d
        )

    def delay(r):
        return float(r["ArrDelayMinutes"]) if r["ArrDelayMinutes"] else 0.0

    leg1 = defaultdict(list)
    for r in rows:
        if valid(r) and r["Origin"] == origin:
            leg1[(r["Dest"], r["FlightDate"])].append(r)
    n, total = 0, 0.0
    for r in rows:
        if valid(r) and r["Dest"] == dest:
            for l1 in leg1.get((r["Origin"], r["FlightDate"]), []):
                if int(l1["ArrTime"]) < int(r["DepTime"]):
                    n += 1
                    total += delay(l1) + delay(r)
    return n, (total / n if n else None)


def test_two_leg_delay_stats(flights_df):
    rows = flight_rows()
    exp_n, exp_avg = _py_two_leg(rows)
    got = two_leg_delay_stats(flights_df).first()
    assert got["n_connections"] == exp_n
    if exp_n:
        assert math.isclose(got["avg_total_delay"], exp_avg, rel_tol=1e-9)


def _py_airline_matrix(rows, year=2008):
    sums, counts = defaultdict(float), defaultdict(int)
    airlines = set()
    for r in rows:
        if (
            r["Year"] == year
            and r["Cancelled"] != "1.00"
            and r["UniqueCarrier"]
            and r["Month"] is not None
        ):
            key = (r["UniqueCarrier"], r["Month"])
            d = float(r["ArrDelayMinutes"]) if r["ArrDelayMinutes"] else 0.0
            sums[key] += d
            counts[key] += 1
            airlines.add(r["UniqueCarrier"])
    out = {}
    for a in airlines:
        cells = []
        for m in range(1, 13):
            c = counts.get((a, m), 0)
            avg = math.ceil(sums[(a, m)] / c) if c else 0
            cells.append(f"({m},{avg})")
        out[a] = a + "," + ",".join(cells)
    return out


def test_airline_month_avg_delay_format(flights_df):
    rows = flight_rows()
    expected = _py_airline_matrix(rows)
    long_form = airline_month_avg_delay(flights_df)
    lines = [r["line"] for r in format_delay_matrix(long_form).collect()]
    assert lines == sorted(expected.values())
    # invariant from HCompute.java:171-175: every airline gets 12 cells
    assert all(line.count("(") == 12 for line in lines)


def test_kmeans_pipeline(pickups_df):
    res = run_kmeans_pipeline(pickups_df, k_limit=4, k_step=2, max_iter=15)
    # silhouette defined for every k, within the simplified formula range
    assert set(res.scores) == {2, 4}
    assert all(0.0 <= s <= 1.0 for s in res.scores.values())
    assert res.best_k in (2, 4)
    # output formats match the reference templates (FIXTURES.md §4)
    assert all(
        l.startswith("SilScore:") and " at Kvalue:" in l and " at iteration:" in l
        for l in res.kresults_lines
    )
    assert res.summary_lines[0].startswith("Max SilScore:")
    assert res.summary_lines[1] == "Corresponding centroids"
    assert all(". Lat:" in l for l in res.summary_lines[2:])
    # pipeline determinism: same seed → identical result
    res2 = run_kmeans_pipeline(pickups_df, k_limit=4, k_step=2, max_iter=15)
    assert res2.centroids == res.centroids
    assert res2.scores == res.scores


def test_flight_csv_roundtrip(spark, tmp_path):
    """S2: the 44-ordinal positional schema reads opencsv-shaped files."""
    from hadoop_project_spark.sources.csv import read_flights_csv

    rows = flight_rows(n=50)
    path = str(tmp_path / "flights_csv")
    vals = []
    from hadoop_project_spark.sources.csv import _FLIGHT_ORDINALS, N_FLIGHT_COLS

    for r in rows:
        cells = []
        for i in range(N_FLIGHT_COLS):
            if i in _FLIGHT_ORDINALS:
                cells.append(str(r[_FLIGHT_ORDINALS[i][0]]))
            else:
                cells.append("x")
        vals.append(",".join(cells))
    (tmp_path / "flights.csv").write_text("\n".join(vals))
    df = read_flights_csv(spark, str(tmp_path / "flights.csv"))
    assert df.count() == 50
    got = df.filter(F.col("Origin") == "ORD").count()
    exp = sum(1 for r in rows if r["Origin"] == "ORD")
    assert got == exp
