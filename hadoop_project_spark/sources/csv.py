"""CSV sources with explicit positional schemas (S2).

The reference addresses flight CSV columns by ordinal into an opencsv
array (Flight1/src/main/java/hw3/PLAIN.java:70-125;
Flight2/src/main/java/hw4/HPopulate.java:92-101) — the US DOT/BTS
on-time-performance layout. Here the ordinals are fixed ONCE as named
StructType fields (SURVEY.md §7.4 risk: off-by-one hazards), and every
workload uses names.

Quoting: opencsv with quotations honored (PLAIN.java:57) →
``quote='"', escape='"'`` on Spark's reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ordinal → (name, type); unused ordinals become filler strings
_FLIGHT_ORDINALS: dict[int, tuple[str, T.DataType]] = {
    0: ("Year", T.IntegerType()),
    2: ("Month", T.IntegerType()),
    3: ("DayOfMonth", T.IntegerType()),
    5: ("FlightDate", T.StringType()),  # 'yyyy-M-d', parsed on demand (F6)
    6: ("UniqueCarrier", T.StringType()),
    10: ("FlightNum", T.StringType()),
    11: ("Origin", T.StringType()),
    17: ("Dest", T.StringType()),
    24: ("DepTime", T.StringType()),  # 'hhmm', compared as int (F7)
    35: ("ArrTime", T.StringType()),
    37: ("ArrDelayMinutes", T.StringType()),  # '' → 0.0 (P7)
    41: ("Cancelled", T.StringType()),  # '0.00'/'1.00' flags (F8)
    43: ("Diverted", T.StringType()),
}
N_FLIGHT_COLS = 44

FLIGHT_COLUMNS = [name for _, (name, _t) in sorted(_FLIGHT_ORDINALS.items())]


def flight_schema() -> T.StructType:
    fields = []
    for i in range(N_FLIGHT_COLS):
        if i in _FLIGHT_ORDINALS:
            name, typ = _FLIGHT_ORDINALS[i]
        else:
            name, typ = f"_c{i}", T.StringType()
        fields.append(T.StructField(name, typ, True))
    return T.StructType(fields)


def read_flights_csv(spark: SparkSession, path: str) -> DataFrame:
    """Flight on-time CSV → named columns (S2 + §1.3 schema fix)."""
    return (
        spark.read.schema(flight_schema())
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
        .select(*FLIGHT_COLUMNS)
    )


def pickup_schema() -> T.StructType:
    """Uber pickups: datetime,lat,lon,base
    (final/inputs/sample.csv:1; PopulatePt.java:67-71 reads 1-2 only)."""
    return T.StructType(
        [
            T.StructField("pickup_datetime", T.StringType(), True),
            T.StructField("lat", T.DoubleType(), True),
            T.StructField("lon", T.DoubleType(), True),
            T.StructField("base", T.StringType(), True),
        ]
    )


def read_pickups_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(pickup_schema()).csv(path)


def write_csv(df: DataFrame, path: str, header: bool = False) -> None:
    """CSV sink with the same quoting convention the readers use
    (S5 generalized: the reference's text sinks write delimited lines,
    TextOutputFormat; here fields containing the delimiter/quote are
    quoted+escaped so the file round-trips through read_*_csv exactly).
    One file per partition — at scale, repartition first to control
    file count, as with every file sink."""
    (
        df.write.mode("overwrite")
        .option("quote", '"')
        .option("escape", '"')
        .option("header", str(header).lower())
        .csv(path)
    )
