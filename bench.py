"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing methodology: one warm-up action to JIT/own the session, then each
query timed as plan-build + execution to a count/collect-free sink
(``df.write.format("noop")``) so we measure the engine, not result
transfer to the driver.

Noise control (round 5): each query runs SPARK_GRAFT_BENCH_RUNS times
(default 3) and reports the per-query MEDIAN — single-run local[32]
timings drift ±2x on contended queries (r4's dpp/overlap "regressions"
were exactly this). Build and execution are timed separately: roundtrip
queries do their parquet (re)writes eagerly inside build(), so the
build-phase median isolates write amplification from the read-side
query a DPP/layout regression would actually show up in. Phase medians
land in the detail file ("phases") — committed as bench_results.json
only via an explicit SPARK_GRAFT_BENCH_OUT opt-in, see main(); the
stdout line keeps the per-query total-median map the driver records.

Shuffle telemetry (round 6): per-query shuffle read/write MB medians
from the app's REST stage store land in the detail file
("shuffle_mb") — wall time at sf0.1 cannot see a shuffle-volume
regression that only dominates at 100x scale; bytes can.
"""

from __future__ import annotations

import json
import os
import statistics
import time
import urllib.request
from hadoop_project_spark.execution import clear_query_state


def _completed_stages(spark) -> list[dict]:
    """Completed-stage metrics from the app's own REST endpoint (the
    AppStatusStore the UI serves; enabled for the bench session only).
    Returns [] if the endpoint is unavailable — telemetry is additive,
    never a reason for the bench to fail."""
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as resp:
            return json.load(resp)
    except Exception:  # noqa: BLE001
        return []


class ShuffleMeter:
    """Per-query shuffle read/write bytes: stages are identified by
    monotonically increasing stageId, so "sum over stages newer than
    the last high-water mark" isolates one query's stages even though
    the REST store is cumulative (and robust to old-stage eviction,
    which only drops ids BELOW the mark). Wall time at sf0.1 cannot see
    a shuffle-volume regression that would dominate at 100× — bytes
    can (VERDICT r5 item 4)."""

    def __init__(self, spark):
        self.spark = spark
        self.mark = -1

    def reset(self) -> None:
        stages = _completed_stages(self.spark)
        self.mark = max((s["stageId"] for s in stages), default=self.mark)

    def delta(self) -> tuple[float, float] | None:
        """(shuffle_write_mb, shuffle_read_mb) since the last reset, or
        None when the endpoint is unavailable."""
        stages = _completed_stages(self.spark)
        if not stages:
            return None
        new = [s for s in stages if s["stageId"] > self.mark]
        w = sum(s.get("shuffleWriteBytes", 0) for s in new)
        r = sum(s.get("shuffleReadBytes", 0) for s in new)
        return round(w / 1e6, 3), round(r / 1e6, 3)

def _normalized_deltas(result: dict) -> dict | None:
    """Round-over-round per-query deltas NORMALIZED by host speed
    (VERDICT r10 #4): the last three rounds each burned a verdict
    adjudication on ambient host drift that the calibration block had
    already measured. Rule (documented in SCALING.md): host_scale =
    median of the three calibration ratios vs the committed
    bench_results.json; a query's normalized delta is
    (t_now / t_prev) / host_scale. Normalized deltas inside
    [1/1.5, 1.5] are the drift band; outside it AND >= 1 s now is an
    A/B-adjudication candidate, surfaced in "flagged". Returns None
    when there is no committed artifact to compare against.

    The comparison artifact is chosen BY SCALE FACTOR (round-11 review
    finding: hardcoding bench_results.json left sf1 runs without drift
    detection despite a committed bench_results_sf1.json): sf1 runs
    compare against the sf1 artifact, everything else against the
    default sf0.1 one; a residual sf mismatch still returns None."""
    name = (
        "bench_results_sf1.json"
        if result.get("sf") == 1.0
        else "bench_results.json"
    )
    prev_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), name
    )
    try:
        with open(prev_path) as fh:
            prev = json.load(fh)
    except (OSError, ValueError):
        return None
    if prev.get("sf") != result.get("sf"):
        return None  # cross-sf comparison is not a delta
    pc = prev.get("calibration") or {}
    cc = result.get("calibration") or {}
    ratios = [
        cc[k] / pc[k]
        for k in ("jvm_hash_s", "shuffle_s", "py_spin_s")
        if pc.get(k) and cc.get(k)
    ]
    if not ratios:
        return None
    host_scale = statistics.median(ratios)
    prev_q = prev.get("queries", {})
    deltas = {
        name: round((t / prev_q[name]) / host_scale, 3)
        for name, t in result["queries"].items()
        if prev_q.get(name)
    }
    flagged = {
        n: d
        for n, d in deltas.items()
        if (d >= 1.5 or d <= 1 / 1.5) and result["queries"][n] >= 1.0
    }
    return {
        "host_scale": round(host_scale, 3),
        "n_common": len(deltas),
        "deltas": deltas,
        "flagged": dict(sorted(flagged.items(), key=lambda kv: -kv[1])),
    }


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

    # UI on by default: the REST stage store is where the per-query
    # shuffle-bytes telemetry comes from (ShuffleMeter).
    # SPARK_GRAFT_BENCH_UI=0 turns it off for timing-only runs — the
    # live UI + listener bus tax every task, which is measurable on
    # sub-second queries (the r5 bench predates the telemetry and ran
    # UI-off; apples-to-apples comparisons against it need this).
    ui_on = os.environ.get("SPARK_GRAFT_BENCH_UI", "1") != "0"
    spark = get_spark(
        app_name="hps-bench",
        cpus=cpus,
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "true" if ui_on else "false"},
    )
    specs = all_queries()
    names = [n for n in HEADLINE if n in specs] + [
        n for n in sorted(specs) if n not in HEADLINE
    ]
    # SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the run to those queries
    # (iteration/A-B tool: fresh-session numbers for a subset without
    # paying the whole surface; the committed artifact always comes
    # from a full run).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = {w.strip() for w in only.split(",") if w.strip()}
        names = [n for n in names if n in wanted]

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

    # Host-speed calibration (round 7): three fixed micro-workloads
    # whose code never changes round to round — a codegen arithmetic
    # scan, one small shuffle, and a pure-Python spin. Round-over-round
    # wall-clock comparisons of the query surface are only meaningful
    # after normalizing by these: r7 measured byte-identical r5-era
    # relational queries at ~1.55x r5's recorded times in a fresh
    # session (same code/config/data/runs, UI off) — ambient host
    # drift, not a code regression. Shuffle-byte telemetry is the
    # host-independent signal; these numbers make wall-clock
    # cross-round comparable too.
    calibration: dict[str, float] = {}
    cal_jvm: list[float] = []
    cal_shuf: list[float] = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(50_000_000) \
            .selectExpr("sum(pmod(xxhash64(id), 1048576)) AS s") \
            .write.format("noop").mode("overwrite").save()
        cal_jvm.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        spark.range(2_000_000).selectExpr("id % 1000 AS k") \
            .groupBy("k").count() \
            .write.format("noop").mode("overwrite").save()
        cal_shuf.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    acc = 0
    for i in range(10_000_000):
        acc += i
    calibration = {
        "jvm_hash_s": round(statistics.median(cal_jvm), 4),
        "shuffle_s": round(statistics.median(cal_shuf), 4),
        "py_spin_s": round(time.perf_counter() - t0, 4),
    }

    # Per-query fault isolation: one broken query must never abort the
    # run before the JSON line prints (the r3 failure mode — a single
    # AnalysisException produced a bench artifact with ZERO numbers).
    # Errors are recorded per query; timings keep accumulating.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    phases: dict[str, dict[str, float]] = {}
    runs: dict[str, list[float]] = {}
    shuffle_mb: dict[str, dict[str, float]] = {}
    errors: dict[str, str] = {}
    meter = ShuffleMeter(spark)
    for name in names:
        build_s: list[float] = []
        exec_s: list[float] = []
        shuf_w: list[float] = []
        shuf_r: list[float] = []
        try:
            for _ in range(n_runs):
                meter.reset()
                t0 = time.perf_counter()
                df = specs[name].build(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                build_s.append(t1 - t0)
                exec_s.append(t2 - t1)
                d = meter.delta()
                if d is not None:
                    shuf_w.append(d[0])
                    shuf_r.append(d[1])
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        # release this query's persisted relations before the next one:
        # several operators pin multi-consumer relations (shingle sets,
        # edge lists); within a query's own n_runs the pin is reused via
        # plan-cache matching, but across 134 queries the entries would
        # otherwise accumulate until ContextCleaner got to them,
        # pressuring executor memory and distorting later timings.
        clear_query_state(spark)
        if build_s:  # partial runs still report (fault isolation)
            totals = [b + e for b, e in zip(build_s, exec_s)]
            timings[name] = round(statistics.median(totals), 4)
            phases[name] = {
                "build": round(statistics.median(build_s), 4),
                "exec": round(statistics.median(exec_s), 4),
            }
            runs[name] = [round(t, 4) for t in totals]
            if shuf_w:
                shuffle_mb[name] = {
                    "write": round(statistics.median(shuf_w), 3),
                    "read": round(statistics.median(shuf_r), 3),
                }

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
        "n_runs": n_runs,
        "stat": "median",
        "calibration": calibration,
    }
    if errors:
        result["errors"] = errors
    norm = _normalized_deltas(result)
    if norm is not None:
        # stdout stays compact: scale + the flagged movers only; the
        # full per-query normalized map lands in the detail file
        result["normalized"] = {
            "host_scale": norm["host_scale"],
            "n_common": norm["n_common"],
            "flagged": norm["flagged"],
        }
    # Full detail (per-run timings, build/exec phase medians) lands on
    # disk only — the stdout line stays compact so tail-truncation of
    # captured output can't eat the per-query map (r2 lesson).
    #
    # The detail file DEFAULTS to a non-repo path (round 9, closing
    # VERDICT r6 item 8 / r7 item 5 / r8 item 4 for good): any bench
    # invocation that does not explicitly opt in — iteration re-rolls
    # AND the round driver's own post-commit run — can no longer dirty
    # the committed bench_results.json with jitter. Refreshing the
    # committed artifact is the explicit act
    #   SPARK_GRAFT_BENCH_OUT=bench_results.json python bench.py
    # followed by the round-closing commit; the stdout JSON line (what
    # the driver records) is unaffected either way.
    import sys
    import tempfile

    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT") or os.path.join(
        tempfile.gettempdir(), f"bench_results_latest.{os.getuid()}.json"
    )
    try:
        with open(out_path, "w") as fh:
            json.dump(
                {**result, "phases": phases, "runs": runs,
                 "shuffle_mb": shuffle_mb,
                 **({"normalized_deltas": norm["deltas"]} if norm else {})},
                fh, indent=1, sort_keys=True)
    except OSError as exc:
        print(f"bench: detail file {out_path} not written: {exc}",
              file=sys.stderr)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
