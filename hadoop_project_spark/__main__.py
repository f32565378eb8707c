"""Engine front door: ``python -m hadoop_project_spark <cmd>``.

A user of the reference ran its jobs from a driver CLI (hadoop jar ...;
final/run.sh); this is the equivalent entry point for the Spark engine:

    python -m hadoop_project_spark list [--tag TAG]
    python -m hadoop_project_spark run QUERY [--sf DIR] [--limit N]
    python -m hadoop_project_spark explain QUERY [--sf DIR]
    python -m hadoop_project_spark check QUERY [--sf DIR]
    python -m hadoop_project_spark bench
    python -m hadoop_project_spark scaling

``run`` executes a registered query and prints rows; ``explain`` prints
the formatted physical plan (the artifact PLANS.md is generated from);
``check`` runs the query AND its DuckDB oracle side by side — the same
row-count + schema + sorted-value-hash comparison the round driver
applies (quality/oracle.py). ``bench`` and ``scaling`` reproduce the
round artifacts from the front door: the full bench harness
(bench_results.json + the driver's one-line JSON; honors
$SPARK_GRAFT_SF_DIR/_CPUS/_BENCH_RUNS) and the two-decade scaling
sweep (SCALING.md; needs testdata_sf1/ from scripts/gen_sf1.py).
"""

from __future__ import annotations

import argparse
import os
import sys
from hadoop_project_spark.execution import clear_query_state


def _spark(cpus: str):
    from hadoop_project_spark.session import get_spark

    return get_spark(app_name="hps-cli", cpus=cpus)


def main(argv: list[str] | None = None) -> int:
    from hadoop_project_spark.plans import all_queries

    p = argparse.ArgumentParser(prog="hadoop_project_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="enumerate registered queries")
    p_list.add_argument("--tag", default=None)

    sub.add_parser("bench", help="run the full bench harness (bench.py)")
    sub.add_parser(
        "scaling", help="run the two-decade scaling sweep (scripts/scaling.py)"
    )

    for name in ("run", "explain", "check"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument(
            "--sf",
            default=os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
            ),
        )
        if name == "run":
            sp.add_argument("--limit", type=int, default=20)
    args = p.parse_args(argv)

    if args.cmd in ("bench", "scaling"):
        # the artifact harnesses live at the repo root / scripts/ —
        # resolve relative to the installed package so the front door
        # works from any cwd
        import importlib.util

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        fname = (
            os.path.join(repo, "bench.py")
            if args.cmd == "bench"
            else os.path.join(repo, "scripts", "scaling.py")
        )
        if not os.path.isfile(fname):
            # an installed (site-packages) layout has no sibling
            # harness files — fail with intent, not a bare ENOENT
            print(
                f"{args.cmd}: {fname} not found — the bench/scaling "
                "harnesses ship with the repo checkout, not the "
                "installed package; run from a repo checkout",
                file=sys.stderr,
            )
            return 2
        spec_ = importlib.util.spec_from_file_location(f"hps_{args.cmd}", fname)
        mod = importlib.util.module_from_spec(spec_)
        spec_.loader.exec_module(mod)
        mod.main()
        return 0

    specs = all_queries()
    if args.cmd == "list":
        for name, spec in specs.items():
            if args.tag and args.tag not in spec.tags:
                continue
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t[{oracle}]\t{','.join(spec.tags)}")
        return 0

    if args.query not in specs:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    spec = specs[args.query]
    spark = _spark(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    try:
        df = spec.build(spark, args.sf)
        if args.cmd == "run":
            df.show(args.limit, truncate=False)
            return 0
        if args.cmd == "explain":
            df.explain("formatted")
            return 0
        # check
        if spec.oracle is None:
            n = df.count()
            print(f"{args.query}: rows-only (no oracle), rows={n}")
            return 0
        from hadoop_project_spark.quality import compare_to_oracle

        res = compare_to_oracle(spark, df, spec.oracle, args.sf, name=args.query)
        print(f"{args.query}: ok={res.ok} rows={res.rows} {res.detail}".rstrip())
        return 0 if res.ok else 1
    finally:
        # several operators pin multi-consumer relations (shingle sets,
        # edge lists) for the duration of the query; release them so a
        # long-lived CLI session doesn't accumulate executor memory
        # (same discipline as bench.py's per-query release)
        clear_query_state(spark)


if __name__ == "__main__":
    raise SystemExit(main())
