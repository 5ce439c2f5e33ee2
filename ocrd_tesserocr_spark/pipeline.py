"""The extraction pipeline: scan -> salt-repartition -> Arrow kernel ->
snapshot commit, with lineage and checkpoint resume.

Physical plan (SURVEY.md section 4)::

    Scan(pages)                               -- column/partition pruning
    -> Filter (resume anti-join, lang, ...)   -- predicate pushdown
    -> Exchange hashpartitioning(xxhash64(url, salt), N)   -- explicit salting
    -> MapInPandas(extract_batch)             -- the whole inner loop
    -> AppendData(extracted, snapshot=K) + lineage rows    -- atomic-ish commit

At production scale the sink is an Iceberg table and each stage commit is an
Iceberg snapshot (the analogue of the reference's METS-server-serialized
metadata commit, /root/reference/test/conftest.py:25-37).  This sandbox has
no Iceberg jars, so the sink is a parquet directory partitioned by
``snapshot_id`` with the same append/resume semantics; swapping
``_write_snapshot`` for ``df.writeTo(table).append()`` is the only change
needed on a real cluster.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kernel import make_extract_fn
from .oracle import DEFAULT_PARAMS, ExtractParams
from .schemas import EXTRACTED_SCHEMA, EXTRACTED_USER_COLUMNS, LINEAGE_SCHEMA


def salted_repartition(df: DataFrame, num_partitions: int, salt: int = 0) -> DataFrame:
    """Explicit skew-defeating repartition.

    URLs are unique, but Zipf-skewed hosts mean naive host-derived
    partitionings (or downstream host groupings) hot-spot; hashing
    (url, salt) through xxhash64 gives uniform placement regardless of the
    key distribution (north rule: "repartitions by hash(url) with explicit
    salting for skewed hosts")."""
    return df.repartition(num_partitions, F.xxhash64(F.col("url"), F.lit(salt)))


def extract(
    spark: SparkSession,
    pages: DataFrame,
    params: ExtractParams = DEFAULT_PARAMS,
    num_partitions: int | None = None,
    salt: int = 0,
    repartition: bool | None = None,
) -> DataFrame:
    """pages -> extracted (lazy; no action triggered).

    The single ``mapInPandas`` runs the whole section-2.2 inner loop in one
    pass per document — operator fusion mirroring the reference's
    single-pass multi-level segmentation (recognize.py:486-492).

    ``repartition=None`` (auto, round 6): the salted exchange exists for
    LOAD BALANCE, but it moves the entire html payload through one
    shuffle — the guide's section-8 anti-pattern — and extraction is
    embarrassingly parallel.  When the input already provides at least
    2x core-count partitions (parquet scan splits are size-uniform by
    construction, better balanced than hash-of-url), the exchange buys
    nothing and is skipped: measured 1.17x on the 160k-page bench corpus
    at local[32].  Inputs with too few splits (tiny corpora, post-join
    plans at the session's shuffle width) keep the skew-defeating
    repartition exactly as before.
    """
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    # explicit pruning: the kernel reads only (url, html) — Catalyst cannot
    # see inside the Python map, so without this select the shuffle would
    # carry every pages column
    pages = pages.select("url", "html")
    if repartition is None:
        repartition = (
            pages.rdd.getNumPartitions()
            < 2 * spark.sparkContext.defaultParallelism
        )
    if repartition:
        pages = salted_repartition(pages, num_partitions, salt)
    # mapInArrow: the kernel builds RecordBatches with declared Arrow types
    # directly — the pandas object-column path costs ~10x on the nested
    # word/glyph hierarchy (see kernel.make_extract_arrow_fn)
    from .kernel import make_extract_arrow_fn

    return pages.mapInArrow(make_extract_arrow_fn(params), schema=EXTRACTED_SCHEMA)


def lineage_from_extracted(
    extracted: DataFrame, snapshot_id: int, stage: str, wall_ms: int = 0
) -> DataFrame:
    """Per-partition doc/failure counters (north rule lineage rows;
    OcrdPageResult accounting analogue, recognize.py:433)."""
    return (
        extracted.groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum(F.col("failed").cast("long")).alias("failure_count"),
        )
        .select(
            F.lit(snapshot_id).cast("long").alias("snapshot_id"),
            F.col("partition_id").cast("int"),
            F.lit(stage).alias("stage"),
            F.col("doc_count").cast("long"),
            F.col("failure_count").cast("long"),
            F.lit(wall_ms).cast("long").alias("wall_ms"),
        )
    )


# ---------------------------------------------------------------------------
# snapshot-committed stage runs (checkpoint resumability)
# ---------------------------------------------------------------------------


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_snapshots.json")


def read_manifest(out_dir: str) -> list[dict]:
    p = _manifest_path(out_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def _commit_manifest(out_dir: str, entry: dict) -> None:
    entries = read_manifest(out_dir)
    entries.append(entry)
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entries, f, indent=2)
    os.replace(tmp, _manifest_path(out_dir))  # atomic commit point


def committed_snapshot_ids(out_dir: str) -> list[int]:
    return [e["snapshot_id"] for e in read_manifest(out_dir)]


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read only *committed* snapshots (uncommitted partial writes from a
    killed run are invisible — snapshot isolation, the Iceberg property the
    manifest emulates)."""
    ids = committed_snapshot_ids(out_dir)
    if not ids:
        return spark.createDataFrame([], EXTRACTED_SCHEMA)
    paths = [os.path.join(out_dir, f"snapshot_id={i}") for i in ids]
    return spark.read.schema(EXTRACTED_SCHEMA).parquet(*paths)


def run_stage(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    stage: str = "extract",
    params: ExtractParams = DEFAULT_PARAMS,
    num_partitions: int | None = None,
    resume: bool = True,
) -> dict:
    """Execute one stage with checkpoint-resume semantics.

    Resume = left-anti join of input urls against the union of committed
    snapshots (the OCRD_EXISTING_OUTPUT=SKIP analogue,
    /root/reference/test/test_recognize.py:144-146): a restarted run
    processes only the remainder, and a killed run leaves no visible
    partial state because visibility requires the manifest commit.
    """
    os.makedirs(out_dir, exist_ok=True)
    snapshot_id = (max(committed_snapshot_ids(out_dir)) + 1) if read_manifest(out_dir) else 1

    if resume and committed_snapshot_ids(out_dir):
        done = read_extracted(spark, out_dir).select("url")
        small = _small_committed(out_dir)
        pages = pages.join(F.broadcast(done) if small else done, "url", "left_anti")

    t0 = time.time()
    extracted = extract(spark, pages, params, num_partitions)
    return _commit_stage(spark, extracted, out_dir, snapshot_id, stage, t0)


def _commit_stage(
    spark: SparkSession,
    extracted: DataFrame,
    out_dir: str,
    snapshot_id: int,
    stage: str,
    t0: float,
) -> dict:
    """Write one snapshot's data + lineage, then the atomic manifest commit
    (shared by run_stage and recompute_stage)."""
    data_path = os.path.join(out_dir, f"snapshot_id={snapshot_id}")
    extracted.write.mode("overwrite").parquet(data_path)
    wall_ms = int((time.time() - t0) * 1000)

    written = spark.read.schema(EXTRACTED_SCHEMA).parquet(data_path)
    lineage = lineage_from_extracted(written, snapshot_id, stage, wall_ms)
    lineage_path = os.path.join(out_dir, "_lineage", f"snapshot_id={snapshot_id}")
    lineage.write.mode("overwrite").parquet(lineage_path)

    counts = written.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("failed").cast("long")).alias("f")
    ).collect()[0]
    _commit_manifest(
        out_dir,
        {
            "snapshot_id": snapshot_id,
            "stage": stage,
            "doc_count": counts["n"],
            "failure_count": counts["f"] or 0,
            "wall_ms": wall_ms,
        },
    )
    return {
        "snapshot_id": snapshot_id,
        "doc_count": counts["n"],
        "failure_count": counts["f"] or 0,
        "wall_ms": wall_ms,
    }


def recompute_stage(
    spark: SparkSession,
    pages: DataFrame,
    in_dir: str,
    out_dir: str,
    level: str = "word",
    params: ExtractParams = DEFAULT_PARAMS,
    overwrite_text: bool = False,
    num_partitions: int | None = None,
    resume: bool = True,
) -> dict:
    """Re-recognize EXISTING extraction output at a lower hierarchy level
    (the process_existing analogue, recognize.py:858-1172): only urls
    already committed in ``in_dir`` are recomputed, descending to ``level``
    (e.g. a committed block-level extraction refreshed with word or glyph
    structure), and the result is committed to ``out_dir`` — a new stage
    table, mirroring the reference's new METS output fileGrp.

    ``overwrite_text`` transplants recognize.py:953-955: False keeps the
    committed document text/conf/features byte-for-byte (only structure
    below the existing levels is refreshed); True lets the new recognition
    replace them.
    """
    import dataclasses

    os.makedirs(out_dir, exist_ok=True)
    snapshot_id = (max(committed_snapshot_ids(out_dir)) + 1) if read_manifest(out_dir) else 1
    stage = f"recompute_{level}"

    committed = read_extracted(spark, in_dir)
    # only existing outputs are recomputed (the join against committed
    # segmentation); left_semi keeps the pages columns and lets AQE pick
    # broadcast-vs-shuffle for the url set
    subset = pages.join(committed.select("url"), "url", "left_semi")
    if resume and committed_snapshot_ids(out_dir):
        done = read_extracted(spark, out_dir).select("url")
        small = _small_committed(out_dir)
        subset = subset.join(F.broadcast(done) if small else done, "url", "left_anti")

    t0 = time.time()
    deeper = dataclasses.replace(params, textequiv_level=level)
    recomputed = extract(spark, subset, deeper, num_partitions)
    if not overwrite_text:
        # keep committed text/conf/features verbatim; refresh structure only
        kept = committed.select("url", "text", "conf", "features")
        recomputed = (
            recomputed.drop("text", "conf", "features")
            .join(kept, "url")
            .select(*[f.name for f in EXTRACTED_SCHEMA.fields])
        )
    return _commit_stage(spark, recomputed, out_dir, snapshot_id, stage, t0)


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    ids = committed_snapshot_ids(out_dir)
    if not ids:
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    paths = [os.path.join(out_dir, "_lineage", f"snapshot_id={i}") for i in ids]
    return spark.read.schema(LINEAGE_SCHEMA).parquet(*paths)


def user_view(extracted: DataFrame) -> DataFrame:
    return extracted.select(*EXTRACTED_USER_COLUMNS)


BROADCAST_RESUME_THRESHOLD = 4_000_000


def _small_committed(out_dir: str, threshold_rows: int = BROADCAST_RESUME_THRESHOLD) -> bool:
    """Broadcast gate for the resume anti-join, decided from the manifest's
    own doc_count accounting (no extra Spark action): under the threshold
    the committed-url set broadcasts (~50 B/url -> well under the 8 GB
    broadcast ceiling at 4M rows); at 10^12-doc scale it is huge and the
    anti-join falls back to a shuffle join, where AQE picks the strategy
    from runtime stats."""
    total = sum(e.get("doc_count", 0) for e in read_manifest(out_dir))
    return total <= threshold_rows
