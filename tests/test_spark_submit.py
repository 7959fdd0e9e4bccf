"""Launch-path test: the pipeline deployed exactly as the north rule
prescribes — ``spark-submit --py-files <package.zip>`` — processes
input shards, resumes idempotently, and fans out to the routed sinks.

Each input shard must be conversation-complete (turn_idx derives from a
window within conv; the lineage resume unit is the shard)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = Path(__file__).resolve().parents[1]
SF = "/root/testdata/sf0.001"


def _zip_package(tmp: Path) -> str:
    zpath = tmp / "reformer.zip"
    pkg = REPO / "fluent_plugin_record_reformer_spark"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in pkg.rglob("*.py"):
            z.write(p, p.relative_to(REPO))
    return str(zpath)


def _submit(zip_path: str, events_dir: str, out_dir: str, manifest_dir: str):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    cmd = [
        "spark-submit",
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", zip_path,
        str(REPO / "scripts" / "run_pipeline.py"),
        "--events-dir", events_dir,
        "--out-dir", out_dir,
        "--manifest-dir", manifest_dir,
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_spark_submit_pipeline_and_resume(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    ev_dir = tmp_path / "events"
    # two conversation-complete shards (user_id parity)
    events.filter("user_id % 2 = 0").coalesce(1).write.parquet(str(ev_dir / "shard0"))
    events.filter("user_id % 2 = 1").coalesce(1).write.parquet(str(ev_dir / "shard1"))
    out, man = str(tmp_path / "out"), str(tmp_path / "manifest")
    zp = _zip_package(tmp_path)

    s1 = _submit(zp, str(ev_dir), out, man)
    assert s1["processed"] == 2 and s1["n_rows"] == events.count()
    assert set(s1["per_route"]) == {"user_sink", "assistant_sink", "ops_sink"}
    assert sum(s1["per_route"].values()) == events.count()

    # rerun: everything committed -> no-op (idempotent resume)
    s2 = _submit(zp, str(ev_dir), out, man)
    assert s2["processed"] == 0 and s2["skipped"] == 2

    got = spark.read.option("basePath", out).parquet(os.path.join(out, "batch=*"))
    assert got.count() == events.count()
    assert "message" in got.columns and "text" not in got.columns