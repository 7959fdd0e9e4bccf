#!/usr/bin/env python
"""Ad-hoc per-query profiling harness (guide §1.4): times named
queries in isolation with the noop sink, best-of-N, and can dump
.explain("formatted") to plans/. bench.py stays the frozen driver
artifact; numbers cited in OPTIMIZATION_r06.md come from here.

Usage:
    python bench_extra.py q1 q2 ...            # time queries
    python bench_extra.py --explain DIR q1 ... # also dump plans
    python bench_extra.py --all                # every query
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "3"))


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    if args and args[0] == "--explain":
        explain_dir = Path(args[1])
        explain_dir.mkdir(parents=True, exist_ok=True)
        args = args[2:]

    from __spark_entry__ import queries
    from fluent_plugin_record_reformer_spark.session import get_spark
    from fluent_plugin_record_reformer_spark.sources.tables import load_table
    from fluent_plugin_record_reformer_spark.sources.transcripts import (
        transcripts_from_events,
    )

    qs = queries()
    if args and args[0] == "--all":
        names = list(qs)
    else:
        names = args
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name=f"bench-extra-local[{CPUS}]", cpus=CPUS)
    # same JVM/codegen warmup as bench.py
    transcripts_from_events(load_table(spark, SF_DIR, "events")).count()

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        df = qs[name](spark, SF_DIR)
        if explain_dir is not None:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (explain_dir / f"{name}.txt").write_text(plan)
        runs = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(runs), "runs": runs}
        print(f"{name}: best={min(runs)} runs={runs}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))


if __name__ == "__main__":
    main()
