"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction on sf0.001;
``queries()``/``oracle_sql()`` expose the SURVEY.md section-2 operator
inventory plus the training-data-pipeline layer (dedup / similarity / text
analysis), each with an exactly-matching DuckDB oracle where SQL can
express it.  Extraction queries over synthesized HTML payloads have no SQL
twin (DOM parsing is not ANSI SQL) — those are checked byte-identically
against the pure-Python oracle by ``python -m pytest -x -q`` instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize pages from sf0.001 documents, run the full
    Arrow-batched extraction, return (url, text, conf, n_blocks, failed)."""
    from ocrd_tesserocr_spark.corpus import pages_df
    from ocrd_tesserocr_spark.pipeline import extract

    pages = pages_df(spark, "/root/testdata/sf0.001")
    out = extract(spark, pages)
    return out.select(
        "url",
        "text",
        F.round("conf", 6).alias("conf"),
        F.size("blocks").alias("n_blocks"),
        "failed",
    )


def _extract_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocrd_tesserocr_spark.corpus import pages_df
    from ocrd_tesserocr_spark.pipeline import extract

    out = extract(spark, pages_df(spark, sf_dir))
    return out.select(
        "url",
        "text",
        F.round("conf", 6).alias("conf"),
        F.size("blocks").alias("n_blocks"),
        "failed",
    )


def _extract_block_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded span table: one row per block (the SQL-facing face of the
    nested hierarchy)."""
    from ocrd_tesserocr_spark.corpus import pages_df
    from ocrd_tesserocr_spark.pipeline import extract

    out = extract(spark, pages_df(spark, sf_dir))
    b = out.select("url", F.explode("blocks").alias("b"))
    return b.select(
        "url",
        F.col("b.block_id").alias("block_id"),
        F.col("b.kind").alias("kind"),
        F.col("b.order_idx").alias("order_idx"),
        F.col("b.char_start").alias("char_start"),
        F.col("b.char_end").alias("char_end"),
        F.col("b.is_main").alias("is_main"),
        F.round(F.col("b.link_density"), 6).alias("link_density"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocrd_tesserocr_spark.operators import all_queries

    q, _ = all_queries()
    q = dict(q)
    q["extract_flagship"] = _extract_flagship
    q["extract_block_spans"] = _extract_block_spans
    return q


def oracle_sql() -> dict[str, str]:
    from ocrd_tesserocr_spark.corpus import materialize_pages
    from ocrd_tesserocr_spark.operators import all_queries

    # oracles for font_style/media_meta read the deterministic pages cache;
    # materialize it (pure pyarrow, no Spark) so the SQL runs regardless of
    # whether the Spark query ran first
    from ocrd_tesserocr_spark.corpus import materialize_words

    try:
        materialize_pages("/root/testdata/sf0.01")
        materialize_words("/root/testdata/sf0.01")
    except Exception:
        pass  # cache is best-effort; the Spark query side also materializes
    _, o = all_queries()
    return dict(o)
