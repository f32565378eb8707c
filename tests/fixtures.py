"""Deterministic fixture generators per FIXTURES.md — corpus lines,
flight CSV rows, pickup clusters. Seeded; used by the workload-parity
tests (the driver's TPC-H tables cover the registry queries)."""

from __future__ import annotations

import random

VOCAB = (
    ["map", "merge", "night", "order", "quick", "plan", "query", "node",
     "metric", "open", "Mono", "Pool", "QUEUE", "nap", "onyx"]
    + ["alpha", "beta", "delta", "spark", "table", "row", "join", "scan",
       "filter", "group", "sort", "window", "the", "and", "of", "to"]
)


def corpus_lines(n_lines: int = 500, seed: int = 11) -> list[str]:
    rng = random.Random(seed)
    lines = []
    for _ in range(n_lines):
        toks = [rng.choice(VOCAB) for _ in range(rng.randint(5, 15))]
        if rng.random() < 0.2:
            toks[rng.randrange(len(toks))] += ","
        lines.append(" ".join(toks))
    return lines


AIRPORTS = ["ORD", "JFK", "LAX", "SFO", "DEN", "ATL", "BOS", "SEA",
            "MIA", "DFW", "PHX", "CLT"]
CARRIERS = ["AA", "UA", "DL", "WN", "B6", "AS", "NK", "F9"]


def flight_rows(n: int = 4000, seed: int = 13) -> list[dict]:
    """Rows with the named subset of the 44-ordinal flight schema."""
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        year = rng.choice([2007, 2008])
        month = rng.randint(1, 12)
        day = rng.randint(1, 28)
        origin = rng.choice(AIRPORTS)
        dest = rng.choice([a for a in AIRPORTS if a != origin])
        dep = rng.randint(0, 2359)
        arr = rng.randint(0, 2359)
        delay = "" if rng.random() < 0.05 else f"{rng.uniform(0, 180):.2f}"
        carrier = "" if rng.random() < 0.02 else rng.choice(CARRIERS)
        rows.append(
            {
                "Year": year,
                "Month": month,
                "DayOfMonth": day,
                "FlightDate": f"{year}-{month}-{day}",
                "UniqueCarrier": carrier,
                "FlightNum": str(rng.randint(1, 9999)),
                "Origin": origin,
                "Dest": dest,
                "DepTime": f"{dep:04d}",
                "ArrTime": f"{arr:04d}",
                "ArrDelayMinutes": delay,
                "Cancelled": "1.00" if rng.random() < 0.03 else "0.00",
                "Diverted": "1.00" if rng.random() < 0.01 else "0.00",
            }
        )
    return rows


def pickup_rows(n: int = 4000, seed: int = 17, n_clusters: int = 3) -> list[dict]:
    """Planted 2-D clusters + uniform noise (FIXTURES.md §3)."""
    rng = random.Random(seed)
    centers = [
        (rng.uniform(40.60, 40.90), rng.uniform(-74.20, -73.65))
        for _ in range(n_clusters)
    ]
    rows = []
    for i in range(n):
        if rng.random() < 0.9:
            cla, clo = centers[i % n_clusters]
            lat = rng.gauss(cla, 0.01)
            lon = rng.gauss(clo, 0.01)
        else:
            lat = rng.uniform(40.55, 40.95)
            lon = rng.uniform(-74.25, -73.60)
        rows.append(
            {
                "pickup_datetime": f"4/{rng.randint(1, 30)}/2014 "
                                   f"{rng.randint(0, 23)}:{rng.randint(0, 59):02d}",
                "lat": round(lat, 6),
                "lon": round(lon, 6),
                "base": f"B0{rng.randint(2500, 2599)}",
            }
        )
    return rows
