"""SparkSession factory (single engine-wide entry point).

Mirrors the reference's Borg/singleton DAO state (singleton.py:9-26) at the
session level: one configured SparkSession per process. All engine jobs rely
on Arrow-vectorized Python UDFs and AQE, so those are switched on here rather
than per-call.
"""

from __future__ import annotations

import os
import pathlib
import tempfile
import zipfile

from pyspark.sql import SparkSession


def build_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the spider_spark package for ``spark-submit --py-files`` (the
    north rule's deployment mode). The session factory also ships this zip
    automatically via ``addPyFile`` so Python workers can unpickle the
    engine's pandas UDFs regardless of the driver's working directory."""
    pkg_dir = pathlib.Path(__file__).resolve().parent
    dest = dest or os.path.join(tempfile.gettempdir(), "spider_spark_pyfiles.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(pkg_dir.rglob("*.py")):
            zf.write(p, arcname=str(p.relative_to(pkg_dir.parent)))
    return dest


def get_spark(
    app_name: str = "spider_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Defaults are scale-oriented: AQE on (runtime re-plan + skew-join), Arrow
    transfer on (every per-row kernel in this engine is a pandas UDF), and
    shuffle parallelism tied to the core count so `local[8]` vs `local[32]`
    scaling runs are honest (no fixed 200-partition floor dominating small
    stages).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if shuffle_partitions is None:
        # derive from master string when it is local[N]
        if master.startswith("local[") and master != "local[*]":
            try:
                shuffle_partitions = int(master[len("local[") : -1])
            except ValueError:
                shuffle_partitions = None
    if shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # ship the package to Python workers (equivalent of --py-files); without
    # this, UDF unpickling fails whenever the driver cwd isn't the repo root
    spark.sparkContext.addPyFile(build_pyfiles_zip())
    return spark
