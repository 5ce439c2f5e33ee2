"""Font-shape analogue (P7): per-word style from inline DOM markers.

The reference's TesserocrFontShape annotates words with TextStyle
(bold/italic/monospace/..., /root/reference/ocrd_tesserocr/fontshape.py:99-141)
via a legacy OCR model.  The web analogue reads the style straight from the
inline tags (``<b>/<i>/<code>``) — a pure JVM-side regexp pass over the
payload, no Python at all (whole-stage codegen keeps it in the scan
pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def font_style_counts(pages: DataFrame) -> DataFrame:
    s = F.col("html").cast("string")  # utf-8; invalid bytes -> U+FFFD, no abort
    return pages.select(
        "url",
        F.size(F.regexp_extract_all(s, F.lit(r"<b>[^<]*</b>"), 0)).alias("n_bold"),
        F.size(F.regexp_extract_all(s, F.lit(r"<i>[^<]*</i>"), 0)).alias("n_italic"),
        F.size(F.regexp_extract_all(s, F.lit(r"<code>[^<]*</code>"), 0)).alias(
            "n_monospace"
        ),
    )


def q_font_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..corpus import pages_df

    return font_style_counts(pages_df(spark, sf_dir))


QUERIES = {"font_style": q_font_style}
ORACLE_SQL: dict[str, str] = {}
