"""Flight2: per-airline-per-month average delay with dense month fill
and the reference's exact output line format
(Flight2/src/main/java/hw4/HCompute.java:141-196; Secondary.java:
167-221 is the same query from CSV instead of HBase).

The reference needed a composite-key secondary sort (partitioner + key
comparator + group comparator, ~60 LoC ×3 copies, HCompute.java:71-129)
so one reducer saw months in order. Relationally that machinery doesn't
exist: groupBy(airline, month) → ceil-avg → dense fill → pivot/format.

Semantics preserved:
  * year == 2008, Cancelled != '1.00', non-empty carrier/month
    (Secondary.java:69-91);
  * '' / missing delay → 0.0 (P7, Secondary.java:57-58);
  * avg = Math.ceil(sum/count) as int (F10, HCompute.java:187-195);
  * all 12 months emitted, 0 where absent (A7, HCompute.java:155-175);
  * line format `<airline>,(1,<avg>),...,(12,<avg>)` (A8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def airline_month_avg_delay(flights: DataFrame, year: int = 2008) -> DataFrame:
    """(airline, month, avg_delay) with dense 1-12 fill — long form."""
    base = flights.filter(
        (F.col("Year") == year)
        & (F.col("Cancelled") != "1.00")
        & F.col("UniqueCarrier").isNotNull()
        & (F.col("UniqueCarrier") != "")
        & F.col("Month").isNotNull()
    ).select(
        F.col("UniqueCarrier").alias("airline"),
        F.col("Month").alias("month"),
        F.coalesce(F.col("ArrDelayMinutes").try_cast("double"), F.lit(0.0)).alias("delay"),
    )
    agg = base.groupBy("airline", "month").agg(
        F.ceil(F.sum("delay") / F.count("*")).cast("int").alias("avg_delay")
    )
    airlines = base.select("airline").distinct()
    months = agg.sparkSession.range(1, 13).select(F.col("id").cast("int").alias("month"))
    dense = airlines.crossJoin(F.broadcast(months))
    return (
        dense.join(agg, ["airline", "month"], "left")
        .select("airline", "month", F.coalesce("avg_delay", F.lit(0)).alias("avg_delay"))
    )


def format_delay_matrix(long_form: DataFrame) -> DataFrame:
    """One line per airline: `<airline>,(1,<avg>),...,(12,<avg>)` —
    byte-parity with HCompute.java:148-177's reducer output, ordered by
    airline (the MR framework's key sort, O1)."""
    cell = F.concat(F.lit("("), F.col("month").cast("string"), F.lit(","),
                    F.col("avg_delay").cast("string"), F.lit(")"))
    per_airline = (
        long_form.select("airline", "month", "avg_delay", cell.alias("cell"))
        .groupBy("airline")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("month", "cell"))
                    ),
                    lambda s: s["cell"],
                ),
                ",",
            ).alias("cells")
        )
    )
    return per_airline.select(
        F.concat(F.col("airline"), F.lit(","), F.col("cells")).alias("line")
    ).orderBy("line")
