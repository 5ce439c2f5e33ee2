"""Sources: the pages-table scan (S1/S3 in SURVEY.md section 2.1).

At production scale the corpus is an Iceberg table
(``spark.read.table("warehouse.pages")``) and resume/incremental reads use
snapshot ids.  This sandbox has parquet files; the reader below keeps one
call site so the swap is a one-liner.  Feature filtering (the reference's
``feature_filter`` on derived images, recognize.py:413-415) is a plain
WHERE on the ``features`` tag array — pushed down by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import PAGES_SCHEMA


def read_pages(
    spark: SparkSession,
    path_or_table: str,
    langs: list[str] | None = None,
) -> DataFrame:
    """Scan the pages corpus with pushed-down pruning.

    ``langs`` becomes a parquet/Iceberg-pushable predicate; column pruning
    is automatic once downstream selects a subset.
    """
    if "/" in path_or_table:
        df = spark.read.schema(PAGES_SCHEMA).parquet(path_or_table)
    else:
        df = spark.read.table(path_or_table)
    if langs:
        df = df.where(F.col("lang").isin(langs))
    return df


def filter_features(extracted: DataFrame, exclude: list[str]) -> DataFrame:
    """feature_filter analogue: skip rows already carrying a stage tag
    (e.g. don't re-crop a 'cropped' page; crop.py:71-75)."""
    cond = None
    for tag in exclude:
        c = ~F.array_contains(F.col("features"), tag)
        cond = c if cond is None else (cond & c)
    return extracted.where(cond) if cond is not None else extracted
