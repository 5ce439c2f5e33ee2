"""Structured Streaming surface.

The reference is strictly batch (finite METS workspace; SURVEY.md section
2.9), and the north rule asks for batch with checkpoint resumability — so
streaming is a thin adapter, not a separate engine: the same Arrow kernel
drops into ``foreachBatch`` unchanged, giving continuous ingestion of
newly-landed WARC partitions with exactly-once sinks via the same
snapshot-manifest commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..kernel import make_extract_fn
from ..oracle import DEFAULT_PARAMS, ExtractParams
from ..schemas import EXTRACTED_SCHEMA, PAGES_SCHEMA


def pages_stream(spark: SparkSession, input_dir: str, max_files: int = 16) -> DataFrame:
    """File-source stream over a pages parquet directory (the analogue of
    watching a Common-Crawl landing zone)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def extract_stream(
    pages: DataFrame, params: ExtractParams = DEFAULT_PARAMS
) -> DataFrame:
    """Streaming extraction: identical kernel, streaming plan.

    Uses the mapInArrow kernel — the same RecordBatch construction as the
    batch path, skipping the nested-struct pandas conversion tax.  A
    runtime lacking streaming mapInArrow support would fail at
    ``.start()`` (plan construction here is lazy, so no fallback can be
    taken at this point); on such a runtime, route through
    ``extract_stream_pandas`` instead."""
    from ..kernel import make_extract_arrow_fn

    return pages.mapInArrow(make_extract_arrow_fn(params), schema=EXTRACTED_SCHEMA)


def extract_stream_pandas(
    pages: DataFrame, params: ExtractParams = DEFAULT_PARAMS
) -> DataFrame:
    """mapInPandas variant of :func:`extract_stream` (same output, slower
    nested-struct conversion) for runtimes without streaming mapInArrow."""
    return pages.mapInPandas(make_extract_fn(params), schema=EXTRACTED_SCHEMA)


def start_to_parquet(
    extracted: DataFrame, out_dir: str, checkpoint_dir: str, trigger_once: bool = True
):
    """Write stream with Spark's own checkpointing (exactly-once file sink).

    ``trigger_once`` processes the current backlog and stops — the
    streaming twin of one ``run_stage`` snapshot.
    """
    w = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
