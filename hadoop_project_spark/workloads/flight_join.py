"""Flight1: two-leg flight self-join with date/validity filters and a
global average of summed delays (Flight1/src/main/java/hw3/PLAIN.java).

Semantics preserved exactly (SURVEY.md §7.3):
  * legs join on equal FlightDate only — connections crossing midnight
    are excluded by design (PLAIN.java:68-75);
  * direct ORD→JFK flights are excluded from both legs
    (PLAIN.java:93-96);
  * validity: not cancelled, not diverted, FlightDate within
    [2007-06-01, 2008-05-31] (PLAIN.java:86-109);
  * connection valid iff leg1.ArrTime < leg2.DepTime compared as
    integers (PLAIN.java:181-183);
  * result = count of valid connections + average of
    (leg1.delay + leg2.delay) (PLAIN.java:200-208, Hadoop counters →
    one agg).

Spark shape: the reference's hand-built repartition join + reducer
nested loop (J1, ~55 LoC) is one equi-join on (connect_airport,
FlightDate) with the theta predicate as a residual conjunct; Catalyst
picks the physical join, and at 100 TB the equi-keys carry the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DATE_FMT = "yyyy-M-d"  # PLAIN.java:37 'uuuu-MM-d'


def _valid_flights(flights: DataFrame, origin: str, dest: str,
                   date_lo: str, date_hi: str) -> DataFrame:
    d = F.to_date("FlightDate", DATE_FMT)
    return flights.filter(
        ((F.col("Origin") == origin) | (F.col("Dest") == dest))
        & ~((F.col("Origin") == origin) & (F.col("Dest") == dest))
        & (F.col("Cancelled") != "1.00")
        & (F.col("Diverted") != "1.00")
        & d.between(F.lit(date_lo), F.lit(date_hi))
    )


def two_leg_delay_stats(
    flights: DataFrame,
    origin: str = "ORD",
    dest: str = "JFK",
    date_lo: str = "2007-06-01",
    date_hi: str = "2008-05-31",
) -> DataFrame:
    """One row: (n_connections, avg_total_delay) for origin→X→dest."""
    valid = _valid_flights(flights, origin, dest, date_lo, date_hi)
    leg1 = valid.filter(F.col("Origin") == origin).select(
        F.col("Dest").alias("connect"),
        F.col("FlightDate").alias("fd"),
        F.col("ArrTime").try_cast("int").alias("arr_time"),
        F.coalesce(F.col("ArrDelayMinutes").try_cast("double"), F.lit(0.0)).alias("d1"),
    )
    leg2 = valid.filter(F.col("Dest") == dest).select(
        F.col("Origin").alias("connect"),
        F.col("FlightDate").alias("fd"),
        F.col("DepTime").try_cast("int").alias("dep_time"),
        F.coalesce(F.col("ArrDelayMinutes").try_cast("double"), F.lit(0.0)).alias("d2"),
    )
    pairs = leg1.join(leg2, ["connect", "fd"]).filter(
        F.col("arr_time") < F.col("dep_time")
    )
    return pairs.agg(
        F.count("*").alias("n_connections"),
        F.avg(F.col("d1") + F.col("d2")).alias("avg_total_delay"),
    )
