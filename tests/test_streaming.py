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
