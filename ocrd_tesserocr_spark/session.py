"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "ocrd_tesserocr_spark",
) -> SparkSession:
    """Build (or reuse) a session tuned for the Arrow extraction path.

    AQE stays on (runtime re-plan / skew handling); Arrow batch size is
    capped so large HTML payloads don't balloon a single batch
    (SURVEY.md section 4 tuning surface).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(cpus)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        # sandbox corpora are 10s-100s of MB: the 128MB default would fold
        # the whole scan into 1-4 splits and serialize the scan stage.
        # (At production scale this is retuned upward — 128-512MB splits —
        # to keep task count ~2-4x executor-cores per stage.)
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_MAX_PART_BYTES", str(8 * 1024 * 1024)))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # shuffle files on the RAM disk: the sandbox's virtual disk
        # serializes concurrent shuffle writers (73% sys-time at 32 cores);
        # a real cluster uses local NVMe per executor instead
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate clones the generator expression into a
        # pre-Generate filter (size(e) > 0 AND isnotnull(e)) — for this
        # engine's explodes the generator is an expensive higher-order
        # shingle/trigram build, so the "optimization" re-evaluates that
        # whole subtree twice more per row at the scan (measured 6x on the
        # decontaminate eval branch, round 6).  Excluding the rule never
        # changes results; empty-array rows are rare in every operator
        # here, so the filter it infers saves nothing.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    return b.getOrCreate()
