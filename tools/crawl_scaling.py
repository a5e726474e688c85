"""Crawl-only scaling leg: bench.py's q1 (frontier crawl over the bucketed
synthetic pages table) at one parallelism level, printed as one JSON line.
Run back-to-back at two SPARK_GRAFT_CPUS values on the same input for the
north rule's N→4N throughput-scaling evidence (BENCH/BASELINE.md records
the pairs).

    SPARK_GRAFT_CPUS=2 SPARK_GRAFT_CRAWL_PAGES=3000000 \
        SPARK_GRAFT_CRAWL_SEEDS=750000 python tools/crawl_scaling.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from pyspark.sql import functions as F  # noqa: E402

from bench import bucketed_pages  # noqa: E402
from spider_spark.plans.crawl import CrawlConfig, CrawlEngine  # noqa: E402
from spider_spark.session import get_spark  # noqa: E402
from spider_spark.sources.pages import url_expr  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_pages = int(os.environ.get("SPARK_GRAFT_CRAWL_PAGES", "3000000"))
    n_seeds = int(os.environ.get("SPARK_GRAFT_CRAWL_SEEDS", "750000"))
    depth = int(os.environ.get("SPARK_GRAFT_CRAWL_DEPTH", "2"))
    filler = int(os.environ.get("SPARK_GRAFT_PAGE_FILLER", "16"))
    n_runs = int(os.environ.get("SPARK_GRAFT_CRAWL_RUNS", "2"))

    local_dir = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None
    extra = {"spark.sql.warehouse.dir": "/tmp/spider_warehouse"}
    if local_dir:
        extra["spark.local.dir"] = local_dir
    spark = get_spark(
        app_name=f"spider-crawl-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = bucketed_pages(spark, n_pages, filler)

    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(x):
        return x

    spark.range(0, 100_000, 1, 2 * cpus).select(_warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()
    pages.limit(1000).write.format("noop").mode("overwrite").save()

    seeds_df = spark.range(0, n_pages, max(1, n_pages // n_seeds), 64).select(
        url_expr(F.col("id")).alias("url")
    )
    cfg = CrawlConfig(
        depth=depth,
        verify_text=False,
        bloom_capacity=2 * n_pages,
        broadcast_threshold=100_000,
    )
    runs, fetched, best_engine = [], 0, None
    for _ in range(n_runs):
        engine = CrawlEngine(spark, pages, cfg)
        t0 = time.perf_counter()
        result = engine.crawl(seeds_df, seeds_canonical=True, seeds_unique=True)
        sec = time.perf_counter() - t0
        if not runs or sec < min(runs):
            fetched = result.successful_crawls
            best_engine = engine
        runs.append(round(sec, 1))
    best = min(runs)
    print(json.dumps({
        "metric": "crawl-only frontier pages/sec",
        "cpus": cpus,
        "n_pages": n_pages,
        "n_seeds": n_seeds,
        "crawl_sec_all_runs": runs,
        "best_sec": best,
        "fetched": fetched,
        "pages_per_sec": round(fetched / best, 0) if best else 0.0,
        "phase_sec": {k: round(v, 2) for k, v in getattr(best_engine, "phase_times", {}).items()},
    }))


if __name__ == "__main__":
    main()
