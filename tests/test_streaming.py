"""Streaming surface: the same kernel over a file-source stream must
produce exactly the batch results (availableNow trigger = one snapshot)."""

from __future__ import annotations

from ocrd_tesserocr_spark.pipeline import extract
from ocrd_tesserocr_spark.streaming import extract_stream, pages_stream, start_to_parquet


def test_stream_matches_batch(spark, pages_small, tmp_path):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    sample = pages_small.limit(100)
    sample.write.parquet(src)

    stream = extract_stream(pages_stream(spark, src, max_files=2))
    q = start_to_parquet(stream, out, ckpt, trigger_once=True)
    q.awaitTermination(300)

    got = {r["url"]: r["text"] for r in spark.read.parquet(out).collect()}
    exp = {r["url"]: r["text"] for r in extract(spark, sample, num_partitions=2).collect()}
    assert got == exp

    # restart with no new files: checkpoint prevents reprocessing
    q2 = start_to_parquet(
        extract_stream(pages_stream(spark, src, max_files=2)), out, ckpt, trigger_once=True
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == len(exp)


def test_stateful_dedup_stream_across_batches(spark, pages_small, tmp_path):
    """applyInPandasWithState exact dedup: duplicates arriving in a LATER
    micro-batch are dropped by the checkpointed state."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from ocrd_tesserocr_spark.streaming import pages_stream
    from ocrd_tesserocr_spark.streaming.stateful import dedup_stream

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    first = pages_small.limit(40)
    first.coalesce(1).write.parquet(src)

    def run_available():
        q = (
            dedup_stream(pages_stream(spark, src, max_files=1))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_available()
    n1 = spark.read.parquet(out).where(F.length("url") > 0).count()
    assert n1 > 0

    # second landing: 20 duplicate payloads (same html, new urls) + nothing new
    dupes = first.limit(20).select(
        F.concat(F.lit("https://re.example/"), F.col("url")).alias("url"),
        "warc_ts", "html", "text", "lang",
    )
    dupes.coalesce(1).write.mode("append").parquet(src)
    run_available()

    rows = [r for r in spark.read.parquet(out).collect() if r["url"]]
    # no re-emission: every content_hash appears exactly once, and no keeper
    # url comes from the duplicate landing
    hashes = [r["content_hash"] for r in rows]
    assert len(hashes) == len(set(hashes)) == n1
    assert not any(r["url"].startswith("https://re.example/") for r in rows)
