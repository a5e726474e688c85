"""spark-submit entry point — the north rule's deployment mode.

    python -m spider_spark.session  # build the zip, or use build_pyfiles_zip()
    spark-submit --master <cluster> --py-files /tmp/spider_spark_pyfiles.zip \
        tools/submit_crawl.py --pages <parquet> --seed URL [--depth N] \
        [--budget K] [--out DIR]

The script only uses the session spark-submit hands it (``getOrCreate`` with
no master override), so the same file runs unchanged on local[N], YARN,
or K8s. Results and metrics are committed through TableIO at ``--out``.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True, help="pages parquet path, or synthetic:N")
    p.add_argument("--seed", required=True, action="append",
                   help="seed URL (repeatable)")
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--budget", type=int, default=0, help="per-host budget (0=off)")
    p.add_argument("--out", default="/tmp/spider_crawl_out")
    args = p.parse_args()

    spark = SparkSession.builder.appName("spider-spark-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports AFTER session exists: on a cluster these resolve from --py-files
    from spider_spark.plans.crawl import CrawlConfig, CrawlEngine
    from spider_spark.sources.pages import synthetic_pages
    from spider_spark.sources.tableio import ParquetManifestIO

    if args.pages.startswith("synthetic:"):
        pages = synthetic_pages(spark, int(args.pages.split(":", 1)[1]))
        pages = pages.localCheckpoint(eager=True)
    else:
        pages = spark.read.parquet(args.pages)

    io = ParquetManifestIO(spark, args.out)
    cfg = CrawlConfig(
        depth=args.depth,
        budget=args.budget or None,
        verify_text=False,
        durable=True,
    )
    result = CrawlEngine(spark, pages, cfg, io=io).crawl(args.seed)
    print(
        f"crawl done: rounds={len(result.metrics)} "
        f"total_calls={result.total_calls} crawled={result.successful_crawls} "
        f"results_version={io.current_version('results')}"
    )


if __name__ == "__main__":
    main()
