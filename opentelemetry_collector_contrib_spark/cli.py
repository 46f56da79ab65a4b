"""spark-submit entry point for the log pipeline.

Production invocation (north rule: spark-submit --py-files on a
multi-executor cluster):

    cd /root/repo && zip -r /tmp/otelspark.zip opentelemetry_collector_contrib_spark
    spark-submit --py-files /tmp/otelspark.zip \
        --conf spark.sql.adaptive.enabled=true \
        opentelemetry_collector_contrib_spark/cli.py \
        --input-dir /data/sf --out-dir /data/out [--streaming] \
        [--checkpoint-dir /data/ck] [--parse-mode native|arrow]

In local mode (no cluster manager) the same file runs directly:
    python -m opentelemetry_collector_contrib_spark.cli --input-dir ... --out-dir ...

The driver creates no SparkSession config beyond defaults — executor
count/memory/shuffle settings belong to spark-submit flags, so the same
job scales from local[2] to 1000 executors unchanged.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="parse→enrich→route→aggregate pipeline")
    ap.add_argument("--input-dir", required=True,
                    help="directory with the base parquet tables (or, with "
                         "--streaming, transcript-shaped parquet files)")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--dims-dir", default=None,
                    help="directory for enrichment dims (default: --input-dir)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--parse-mode", choices=["native", "arrow"], default="native")
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("--trigger", default="availableNow",
                    help="availableNow | processingTime:<interval>")
    ap.add_argument("--flush-interval", type=float, default=None,
                    help="fileexporter flush_interval seconds (streaming; "
                         "maps to the processingTime trigger)")
    ap.add_argument("--with-histograms", action="store_true",
                    help="emit the full metric block (per-sink counts + "
                         "per-sink/role + per-tool histograms, one pass)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("otelcol-spark-pipeline").getOrCreate()
    dims = args.dims_dir or args.input_dir

    if args.streaming:
        # absolute fallback: spark-submit runs this FILE as __main__ (not
        # as a package member); the --py-files zip provides the package
        try:
            from .streaming import pipeline as spipe
        except ImportError:
            from opentelemetry_collector_contrib_spark.streaming import (
                pipeline as spipe,
            )

        if not args.checkpoint_dir:
            ap.error("--streaming requires --checkpoint-dir")
        q = spipe.run_to_sinks(
            spark,
            args.input_dir,
            dims,
            args.out_dir,
            args.checkpoint_dir,
            available_now=args.trigger == "availableNow",
            processing_time=args.trigger.split(":", 1)[-1]
            if args.trigger.startswith("processingTime")
            else "5 seconds",
            flush_interval=args.flush_interval,
        )
        q.awaitTermination()
        print(json.dumps({"status": "stream-finished"}))
        return 0

    try:
        from .plans import pipeline
    except ImportError:
        from opentelemetry_collector_contrib_spark.plans import pipeline

    res = pipeline.run(
        spark, args.input_dir, out_dir=args.out_dir,
        parse_mode=args.parse_mode, with_histograms=args.with_histograms,
    )
    print(json.dumps(res, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
