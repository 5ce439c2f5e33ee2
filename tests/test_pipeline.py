"""Stage runs: snapshot commits, lineage accounting, checkpoint resume."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ocrd_tesserocr_spark.pipeline import (
    read_extracted,
    read_lineage,
    run_stage,
    user_view,
)


def test_run_stage_and_lineage(spark, pages_small, tmp_path):
    out_dir = str(tmp_path / "extracted")
    res = run_stage(spark, pages_small, out_dir, num_partitions=4)
    assert res["snapshot_id"] == 1
    assert res["doc_count"] == pages_small.count()
    assert res["failure_count"] > 0  # malformed template rows

    lin = read_lineage(spark, out_dir)
    agg = lin.agg(
        F.sum("doc_count").alias("d"), F.sum("failure_count").alias("f")
    ).collect()[0]
    assert agg["d"] == res["doc_count"]
    assert agg["f"] == res["failure_count"]
    # per-partition rows, one per non-empty partition
    assert lin.select("partition_id").distinct().count() <= 4
    assert lin.filter(F.col("stage") != "extract").count() == 0


def test_resume_skips_done_work(spark, pages_small, tmp_path):
    out_dir = str(tmp_path / "extracted")
    half = pages_small.limit(200)
    r1 = run_stage(spark, half, out_dir, num_partitions=4)
    assert r1["doc_count"] == 200
    # full input; only the remainder is processed (anti-join resume,
    # OCRD_EXISTING_OUTPUT=SKIP analogue)
    r2 = run_stage(spark, pages_small, out_dir, num_partitions=4)
    assert r2["snapshot_id"] == 2
    assert r1["doc_count"] + r2["doc_count"] == pages_small.count()

    all_rows = read_extracted(spark, out_dir)
    assert all_rows.count() == pages_small.count()
    assert all_rows.select("url").distinct().count() == pages_small.count()

    # idempotent: third run processes nothing
    r3 = run_stage(spark, pages_small, out_dir, num_partitions=4)
    assert r3["doc_count"] == 0


def test_uncommitted_snapshot_invisible(spark, pages_small, tmp_path):
    """A killed run leaves data files but no manifest entry -> invisible
    (snapshot isolation, the Iceberg property the manifest emulates)."""
    out_dir = str(tmp_path / "extracted")
    run_stage(spark, pages_small.limit(50), out_dir, num_partitions=2)
    # simulate a crash: data written for snapshot 2 but no manifest commit
    os.makedirs(os.path.join(out_dir, "snapshot_id=2"), exist_ok=True)
    pages_small.limit(10)  # no-op
    assert read_extracted(spark, out_dir).count() == 50


def test_user_view_columns(spark, pages_small, tmp_path):
    out_dir = str(tmp_path / "extracted")
    run_stage(spark, pages_small.limit(20), out_dir, num_partitions=2)
    cols = user_view(read_extracted(spark, out_dir)).columns
    assert cols == ["url", "text", "conf", "blocks", "features"]


def test_mid_crash_rerun_is_idempotent(spark, pages_small, tmp_path):
    """SURVEY 7.3.4: a run killed after data write but before manifest
    commit leaves invisible files; the rerun reprocesses those urls and the
    committed view stays duplicate-free."""
    import shutil

    out_dir = str(tmp_path / "extracted")
    r1 = run_stage(spark, pages_small.limit(100), out_dir, num_partitions=2)
    # simulate: snapshot 2 data fully written, then crash pre-commit
    r2_data = os.path.join(out_dir, "snapshot_id=2")
    from ocrd_tesserocr_spark.pipeline import extract

    extract(spark, pages_small.limit(300), num_partitions=2).write.mode(
        "overwrite"
    ).parquet(r2_data)
    assert read_extracted(spark, out_dir).count() == 100  # crash invisible

    # restart: resume sees only committed snapshot 1, reprocesses the rest;
    # run_stage overwrites the orphaned uncommitted directory
    r3 = run_stage(spark, pages_small, out_dir, num_partitions=2)
    assert r3["doc_count"] == pages_small.count() - 100
    view = read_extracted(spark, out_dir)
    assert view.count() == pages_small.count()
    assert view.select("url").distinct().count() == pages_small.count()


def test_resume_broadcast_gate(spark, pages_small, tmp_path):
    """The resume anti-join broadcasts the committed-url set when the
    manifest's doc_count is under the threshold and shuffles above it."""
    from ocrd_tesserocr_spark.pipeline import (
        _small_committed,
        extract,
        read_extracted,
    )
    import json as _json

    out_dir = str(tmp_path / "extracted")
    run_stage(spark, pages_small.limit(50), out_dir, num_partitions=2)
    assert _small_committed(out_dir)  # 50 docs committed -> broadcast

    done = read_extracted(spark, out_dir).select("url")
    plan = pages_small.join(
        F.broadcast(done), "url", "left_anti"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan

    # fake a huge committed history: the gate must flip to shuffle
    manifest = os.path.join(out_dir, "_snapshots.json")
    entries = _json.load(open(manifest))
    entries.append({"snapshot_id": 99, "stage": "x", "doc_count": 10_000_000,
                    "failure_count": 0, "wall_ms": 0})
    with open(manifest, "w") as f:
        _json.dump(entries, f)
    assert not _small_committed(out_dir)


def test_connected_components_raises_without_convergence(spark):
    """A chain graph whose diameter exceeds max_iter must raise, not
    silently return unconverged labels."""
    import pytest

    from ocrd_tesserocr_spark.operators.dedup import connected_components

    n = 8
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=2)
    out = connected_components(nodes, edges, max_iter=20)
    assert out.where(F.col("component_id") != 0).count() == 0


def test_recompute_stage_lower_level(spark, pages_small, tmp_path):
    """process_existing analogue (recognize.py:858-1172): recompute only
    already-committed urls at a deeper level; higher levels stay
    byte-stable unless overwrite_text."""
    from ocrd_tesserocr_spark.pipeline import recompute_stage
    from ocrd_tesserocr_spark.plans import EXTRACT

    in_dir = str(tmp_path / "block_level")
    out_dir = str(tmp_path / "word_level")
    r1 = run_stage(
        spark, pages_small.limit(80), in_dir, params=EXTRACT, num_partitions=2
    )
    assert r1["doc_count"] == 80

    # full pages input, but only the 80 committed urls are recomputed
    r2 = recompute_stage(
        spark, pages_small, in_dir, out_dir, level="word",
        params=EXTRACT, num_partitions=2,
    )
    assert r2["doc_count"] == 80

    before = {r["url"]: r for r in read_extracted(spark, in_dir).collect()}
    after = {r["url"]: r for r in read_extracted(spark, out_dir).collect()}
    assert set(before) == set(after)
    refreshed = 0
    for url, b in before.items():
        a = after[url]
        # overwrite_text=False: doc text/conf byte-stable
        assert a["text"] == b["text"] and a["conf"] == b["conf"]
        for ab, bb in zip(a["blocks"], b["blocks"]):
            assert ab["block_id"] == bb["block_id"]
            assert ab["char_start"] == bb["char_start"]
            assert bb["lines"] == []  # block preset emitted no lines
            if ab["is_main"]:
                refreshed += 1
                assert ab["lines"], "recompute must add word-level structure"
                assert ab["lines"][0]["words"]
    assert refreshed > 0

    # lineage records the recompute stage
    stages = {r["stage"] for r in read_lineage(spark, out_dir).collect()}
    assert stages == {"recompute_word"}

    # resume: a second recompute over the same input is a no-op
    r3 = recompute_stage(
        spark, pages_small, in_dir, out_dir, level="word",
        params=EXTRACT, num_partitions=2,
    )
    assert r3["doc_count"] == 0


def test_malformed_config_fails_fast_on_driver(spark, pages_small):
    """A malformed extra value or rule predicate must raise at plan time
    (make_extract_fn), never inside executor tasks."""
    import pytest

    from ocrd_tesserocr_spark.oracle import ExtractParams
    from ocrd_tesserocr_spark.pipeline import extract

    with pytest.raises(ValueError):
        extract(spark, pages_small,
                ExtractParams(extra=(("min_paragraph_chars", "not-an-int"),)))
    with pytest.raises(ValueError):
        extract(spark, pages_small,
                ExtractParams(block_rules=(("kind ~~ junk", ()),)))
