"""Operator inventory (SURVEY.md section 2) as named DataFrame queries.

Each module exports ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE_SQL: dict[name, str]`` with byte/value-parity DuckDB SQL.
``__spark_entry__`` merges them all.
"""

from __future__ import annotations


def all_queries():
    from . import (
        dedup,
        fontshape,
        glyphs,
        linkgraph,
        multimodal,
        relational,
        similarity,
        text,
        urls,
    )

    q = {}
    o = {}
    for mod in (
        relational,
        text,
        dedup,
        similarity,
        multimodal,
        fontshape,
        glyphs,
        urls,
        linkgraph,
    ):
        q.update(mod.QUERIES)
        o.update(mod.ORACLE_SQL)
    return q, o
