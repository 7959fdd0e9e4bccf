#!/usr/bin/env python
"""spark-submit entry point for the parse -> enrich -> reform -> route ->
aggregate pipeline with checkpointed lineage.

Cluster launch (the north-rule deployment shape):

    zip -r reformer.zip fluent_plugin_record_reformer_spark
    spark-submit --master <cluster> --py-files reformer.zip \
        scripts/run_pipeline.py \
        --events-dir  /data/events \
        --out-dir     /data/out \
        --manifest-dir /data/manifest

The script never sets a master itself — spark-submit owns deployment
(local[N] in tests, YARN/k8s at N or 4N executors in production). Rerun
after a crash and only un-committed inputs are processed
(plans/lineage.py manifest semantics). Prints ONE JSON summary line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events-dir", required=True, help="dir of events parquet inputs")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--manifest-dir", required=True)
    ap.add_argument("--hostname", default="reformer-host")
    args = ap.parse_args()

    # spark-submit provides the session; no master/memory here.
    spark = (
        SparkSession.builder.appName("record-reformer-pipeline")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from fluent_plugin_record_reformer_spark import (
        ReformContext,
        TransformSpec,
        reform,
    )
    from fluent_plugin_record_reformer_spark.operators.enrich import enrich, role_dim
    from fluent_plugin_record_reformer_spark.operators.parse import grok_parse
    from fluent_plugin_record_reformer_spark.operators.route import Route, RouteTable
    from fluent_plugin_record_reformer_spark.plans.lineage import checkpointed_fanout
    from fluent_plugin_record_reformer_spark.sources.transcripts import (
        transcripts_from_events,
        with_tag,
    )

    spec = TransformSpec(
        tag="reformed.${tag_prefix[-2]}",
        record={
            "hostname": "${hostname}",
            "message": "${record['etype']} by ${record['role_kind']}",
        },
        remove_keys=["text", "props_raw"],
    )
    routes = RouteTable(
        [
            Route("user_sink", "reformed.transcripts.user"),
            Route("assistant_sink", "reformed.transcripts.assistant"),
            Route("ops_sink", "**"),
        ]
    )
    ctx = ReformContext(hostname=args.hostname)

    def transform(events_df):
        t = with_tag(transcripts_from_events(events_df))
        parsed = grok_parse(
            t,
            "event=%{WORD:etype} value=%{NUMBER:val} props=%{GREEDYDATA:props_raw}",
            types={"val": "double"},
        )
        enriched = enrich(parsed, role_dim(spark), on="role")
        return reform(enriched, spec, ctx)

    inputs = sorted(
        p
        for p in glob.glob(os.path.join(args.events_dir, "*"))
        if not os.path.basename(p).startswith(("_", "."))
    )
    summary = checkpointed_fanout(
        spark, inputs, transform, routes, args.out_dir, args.manifest_dir
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
