"""Robustness: property-based oracle fuzzing (hypothesis) and the skew
flattening check (SURVEY.md section 7.3.5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocrd_tesserocr_spark.oracle import extract_document

_tags = st.sampled_from(
    ["<p>", "</p>", "<div>", "<b>", "</b>", "<br>", "<table>", "<td>", "</td>",
     "<nav>", "</nav>", "<script>", "</script>", '<p dir="rtl">', "<hr>",
     '<p data-join="1">', "<h1>", "</h1>", "&amp;", "&lt;",
     "<i>", "</i>", "<code>", "</code>", "<b/>", "</code></b>"]
)
_chunks = st.lists(st.one_of(_tags, st.text(max_size=24)), max_size=30)


@settings(max_examples=150, deadline=None)
@given(_chunks)
def test_oracle_never_crashes_and_stays_consistent(chunks):
    """Any tag soup: no exception, and the structural invariants hold."""
    html = ("<html><body>" + "".join(chunks) + "</body></html>").encode("utf-8")
    out = extract_document(html)
    assert isinstance(out["failed"], bool)
    if out["failed"]:
        return
    text = out["text"]
    assert not text.endswith("\n") and not text.endswith("\f")
    prev = -1
    for b in out["blocks"]:
        assert b["order_idx"] == prev + 1
        prev = b["order_idx"]
        if not b["is_main"]:
            assert b["char_start"] == -1 and b["lines"] == []
            continue
        assert text[b["char_start"] : b["char_end"]] == b["text"]
        for ln in b["lines"]:
            assert text[ln["char_start"] : ln["char_end"]] == ln["text"]
            assert " ".join(w["text"] for w in ln["words"]) == ln["text"]
            for w in ln["words"]:
                # style bits are always a well-formed bool struct, even
                # under unbalanced/self-closed style-tag soup
                assert set(w["style"]) == {"bold", "italic", "monospace"}
                assert all(isinstance(v, bool) for v in w["style"].values())


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=200))
def test_oracle_arbitrary_bytes_never_raise(payload):
    out = extract_document(payload)
    assert isinstance(out["failed"], bool)


@settings(max_examples=100, deadline=None)
@given(_chunks)
def test_emission_levels_project_consistently(chunks):
    """Lazy emission (round 4: sub-level structure is never BUILT below
    the textequiv_level) must be a pure projection: for any tag soup, the
    block-level output equals the word-level output with lines dropped,
    and line-level equals word-level with words dropped — offsets,
    confidences, and doc text identical at every level."""
    from ocrd_tesserocr_spark.oracle import ExtractParams

    html = ("<html><body>" + "".join(chunks) + "</body></html>").encode("utf-8")
    word = extract_document(html, ExtractParams(textequiv_level="word"))
    line = extract_document(html, ExtractParams(textequiv_level="line"))
    block = extract_document(html, ExtractParams(textequiv_level="block"))
    for k in ("text", "conf", "failed", "features"):
        assert word[k] == line[k] == block[k]

    def drop_words(b):
        return dict(b, lines=[dict(ln, words=[]) for ln in b["lines"]])

    def drop_lines(b):
        return dict(b, lines=[])

    assert [drop_words(b) for b in word["blocks"]] == line["blocks"]
    assert [drop_lines(b) for b in word["blocks"]] == block["blocks"]


def test_salted_repartition_flattens_skewed_hosts(spark, pages_small):
    """~30% of urls share one host (corpus.py Zipf skew); hashing
    (url, salt) must still spread docs near-uniformly across partitions."""
    from pyspark.sql import functions as F

    from ocrd_tesserocr_spark.pipeline import salted_repartition

    n_parts = 8
    df = salted_repartition(pages_small, n_parts, salt=3)
    counts = (
        df.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in counts)
    assert len(counts) == n_parts
    for r in counts:
        # no partition holds anywhere near the 30% hot-host share
        assert r["count"] < 0.25 * total


_attrs = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["paragraph", "heading", "table", "noise"]),
        "n_chars": st.integers(0, 5000),
        "link_density": st.floats(0, 1, allow_nan=False),
        "text_density": st.floats(0, 500, allow_nan=False),
        "rtl": st.booleans(),
        "join": st.booleans(),
    }
)
_clause = st.sampled_from(
    ["kind=paragraph", "kind!=table", "n_chars>100", "n_chars<=42",
     "link_density>=0.5", "rtl=true", "join=false", "nosuch=1"]
)
_pred = st.lists(_clause, min_size=1, max_size=3).map(" and ".join)


@settings(max_examples=150, deadline=None)
@given(_pred, _attrs)
def test_predicate_dsl_total_on_valid_exprs(expr, attrs):
    """Every well-formed predicate evaluates to a bool on any attrs —
    never an exception (rules run per block in the hot kernel)."""
    from ocrd_tesserocr_spark.oracle import compile_predicate

    assert compile_predicate(expr)(attrs) in (True, False)


_num_attr = st.sampled_from(["n_chars", "link_density", "text_density"])
_bad_lit = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
).filter(lambda s: s not in ("inf", "infinity", "nan"))


@settings(max_examples=100, deadline=None)
@given(_num_attr, st.sampled_from([">", "<", ">=", "<=", "=", "!="]), _bad_lit)
def test_predicate_dsl_rejects_nonnumeric_rhs_at_compile(attr, op, lit):
    """A non-numeric literal against a numeric attr raises at COMPILE time
    (so driver-side _validate catches it before any executor task runs)."""
    import pytest

    from ocrd_tesserocr_spark.oracle import compile_predicate

    with pytest.raises(ValueError):
        compile_predicate(f"{attr}{op}{lit}")


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(
                ["min_paragraph_chars", "max_link_density", "oem", "dpi"]
            ),
            st.sampled_from(["1", "0.5", "64", "true"]),
        ),
        max_size=4,
    )
)
def test_extra_params_never_crash_extraction(pairs):
    """Arbitrary opaque engine-parameter maps (valid typed values or
    unknown names) must never break extraction."""
    from ocrd_tesserocr_spark.oracle import ExtractParams, extract_document

    # skip type-invalid combos the schema would reject upfront
    try:
        from ocrd_tesserocr_spark.oracle import resolve_params

        resolve_params(ExtractParams(extra=tuple(pairs)))
    except ValueError:
        return
    out = extract_document(
        b"<html><body><p>sturdy paragraph with enough text</p></body></html>",
        ExtractParams(extra=tuple(pairs)),
    )
    assert isinstance(out["failed"], bool)
