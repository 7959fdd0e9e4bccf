"""Same-day host-ceiling control for the scaling ledger.

Measures the N->4N scaling efficiency of a PURE-JVM Spark job
(sha2 over spark.range — no Python workers, no shuffle of note, no
parquet) under the same taskset pinning as bench.py --scaling. This
is the ceiling ANY Spark job can reach on this host at that moment:
the engine's measured efficiency should be read against it, since the
sandbox's hypervisor drifts +-30% across minutes and all-core memory
bandwidth is shared.

Prints one JSON line {lo, hi, eff, runs_lo, runs_hi}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ROWS = int(os.environ.get("CEILING_ROWS", str(40_000_000)))


def worker(cpus: int) -> dict:
    from fluent_plugin_record_reformer_spark.session import get_spark

    spark = get_spark(app_name=f"ceiling-{cpus}", cpus=cpus)
    try:
        from pyspark.sql import functions as F

        df = spark.range(0, ROWS, 1, cpus * 2).select(
            F.sha2(F.col("id").cast("string"), 256).alias("h")
        )
        agg = df.select(F.max("h").alias("m"))
        for _ in range(2):
            agg.write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            agg.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        return {"cpus": cpus, "sec": min(times), "runs": [round(t, 3) for t in times]}
    finally:
        spark.stop()


def main() -> None:
    if "--worker" in sys.argv:
        cpus = int(os.environ["CEILING_CPUS"])
        print(json.dumps(worker(cpus)))
        return
    lo, hi = (int(x) for x in os.environ.get("CEILING_CORES", "2,8").split(","))
    results: dict[int, dict] = {}
    for n in (lo, hi):
        env = dict(os.environ, CEILING_CPUS=str(n))
        cmd = [sys.executable, str(Path(__file__)), "--worker"]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{n - 1}"] + cmd
        out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
        results[n] = json.loads(out.stdout.strip().splitlines()[-1])
    eff = (results[lo]["sec"] / results[hi]["sec"]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "host_ceiling_pure_jvm_eff",
                "eff": round(eff, 3),
                "cores": [lo, hi],
                "sec_lo": round(results[lo]["sec"], 3),
                "sec_hi": round(results[hi]["sec"], 3),
                "runs_lo": results[lo]["runs"],
                "runs_hi": results[hi]["runs"],
            }
        )
    )


if __name__ == "__main__":
    main()
