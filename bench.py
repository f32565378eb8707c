"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing methodology: one warm-up action to JIT/own the session, then each
query timed as plan-build + execution to a count/collect-free sink
(``df.write.format("noop")``) so we measure the engine, not result
transfer to the driver.
"""

from __future__ import annotations

import json
import os
import time

HEADLINE = [
    "pricing_summary",
    "regional_revenue",
    "top3_orders_per_customer",
    "priority_month_matrix",
    "word_count",
    "two_leg_conversion",
    "events_hourly_rollup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from hadoop_project_spark.session import get_spark
    from hadoop_project_spark.plans import all_queries

    spark = get_spark(app_name="hps-bench", cpus=cpus, shuffle_partitions=int(cpus))
    specs = all_queries()
    names = [n for n in HEADLINE if n in specs] + [
        n for n in sorted(specs) if n not in HEADLINE
    ]

    # warm-up: steady-state measurement. One scan of the biggest table
    # (JVM, file listing), one hash aggregate and one broadcast join on
    # it (whole-stage-codegen + exchange machinery compile once here,
    # not inside the first measured query).
    from pyspark.sql import functions as F

    from hadoop_project_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    na = load_table(spark, sf_dir, "nation")
    li.count()
    li.groupBy("l_returnflag").agg(F.sum("l_quantity"), F.avg("l_extendedprice")) \
        .write.format("noop").mode("overwrite").save()
    li.join(F.broadcast(na), li.l_suppkey % 25 == na.n_nationkey) \
        .agg(F.count("*")).write.format("noop").mode("overwrite").save()
    # window + explode codegen templates and the Arrow/Python worker
    # pool (paid once per JVM; would otherwise land on the first
    # measured window/explode/mapInPandas query)
    from pyspark.sql import Window

    na.withColumn(
        "rn", F.row_number().over(Window.partitionBy("n_regionkey").orderBy("n_nationkey"))
    ).write.format("noop").mode("overwrite").save()
    na.select(F.explode(F.split("n_name", "_"))).write.format("noop") \
        .mode("overwrite").save()
    na.mapInPandas(lambda it: it, schema=na.schema) \
        .write.format("noop").mode("overwrite").save()

    # Per-query fault isolation: one broken query must never abort the
    # run before the JSON line prints (the r3 failure mode — a single
    # AnalysisException produced a bench artifact with ZERO numbers).
    # Errors are recorded per query; timings keep accumulating.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            df = specs[name].build(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "total_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_ok": len(timings),
        "n_err": len(errors),
    }
    if errors:
        result["errors"] = errors
    # Full per-query map also lands on disk so downstream consumers
    # aren't at the mercy of stdout tail-truncation.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_results.json"), "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
    except OSError:
        pass
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
