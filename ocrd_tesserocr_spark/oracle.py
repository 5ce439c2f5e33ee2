"""Single-document reference extractor — the byte-identical truth.

This module is pure Python (stdlib only, no Spark).  It defines the
extraction semantics exactly once; the Arrow batch kernel (kernel.py) and the
tests both import it, so every whitespace/ordering/id decision has a single
source of truth (SURVEY.md section 7.3.1).

Semantics transplanted from the reference:

  * hierarchy page -> block -> line -> word
      (/root/reference/ocrd_tesserocr/recognize.py:527-856)
  * block kinds = the 13-way region-type switch collapsed to web kinds
      (recognize.py:585-674): paragraph/heading/caption/floating/table/
      separator/image/noise
  * bottom-up concatenation: words ' ', lines '\\n', blocks '\\n' unless a
    join relation suppresses the separator
      (/root/reference/ocrd_tesserocr/common.py:68-180, join relations
       common.py:90-99,166-175)
  * RTL reading direction reverses word traversal
      (common.py:138-151)
  * trailing '\\n'/'\\f' stripped from every recognized text
      (recognize.py:636)
  * id formats block%04d / _line%04d / _word%04d
      (recognize.py:604,769,804)
  * degenerate filters: empty blocks dropped (recognize.py:598-601),
    too-small text blocks demoted (recognize.py:584-597)
  * confidences are arithmetic means of children at every level
      (common.py:127-128, recognize.py:637)
  * lazy recognition: non-main blocks stay segment-only (no lines/spans),
    the analogue of textequiv_level='none' (recognize.py:411,481-486)
  * script/style/comment stripping = the binarization "non-text mask"
      (/root/reference/ocrd_tesserocr/binarize.py:106-110)
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache
from html import unescape

#: bump on ANY change to extract_document semantics: the token is baked
#: into the oracle-cache parquet filenames (corpus.materialize_words /
#: materialize_extracted), so a semantic change invalidates stale oracle
#: snapshots automatically instead of silently failing the gate until
#: someone runs `rm -rf .cache`.  (2 = auto_model exempts rule-selected
#: models, round 4.)
ORACLE_VERSION = 2

# --------------------------------------------------------------------------
# parameters (analogue of the ocrd-tool.json parameter surface)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ExtractParams:
    """Extraction parameters; defaults mirror ocrd-tool.json defaults."""

    #: minimum characters for a paragraph-kind block to count as main content
    #: (too-small region filter, recognize.py:584-597)
    min_paragraph_chars: int = 16
    #: maximum link density for a block to count as main content
    max_link_density: float = 0.45
    #: main-eligible kinds (TextRegion-typed, recognize.py:585-674)
    main_kinds: frozenset = frozenset(
        {"paragraph", "heading", "caption", "floating", "table"}
    )
    #: segment-only mode: skip recognition (textequiv_level='none',
    #: recognize.py:411) — blocks get no lines/spans and doc text is None
    segment_only: bool = False
    #: exit level of the hierarchy to EMIT (the reference's
    #: textequiv_level parameter, ocrd-tool.json:90-98): 'block' emits
    #: block spans only (the north rule's contract: text + spans per
    #: block), 'line' adds lines, 'word' the word hierarchy, 'glyph'
    #: descends to per-character glyphs with ranked TextEquiv choices
    #: (recognize.py:816-856).  The document text/conf/spans are identical
    #: at every level — this only gates how much nested structure crosses
    #: the Arrow boundary.
    textequiv_level: str = "word"
    #: stage-lineage tags recorded on every row (AlternativeImage @comments
    #: analogue, recognize.py:489-491)
    features: tuple = ("cleaned", "segmented", "recognized")
    #: default recognition model tag (the reference's ``model`` parameter,
    #: ocrd-tool.json:100-105); recorded per block, overridden by
    #: ``model_rules`` matches
    model: str = "default"
    #: opaque engine-parameter map — the ``tesseract_parameters`` analogue
    #: (ocrd-tool.json:154-158): ((name, value), ...) string pairs.
    #: Recognized names override the typed fields above (like SetVariable
    #: overrides Tesseract runtime variables); unknown names are carried
    #: through untouched for forward compatibility.
    extra: tuple = ()
    #: per-segment config rules — the ``xpath_parameters`` analogue
    #: (recognize.py:233-246, ocrd-tool.json:159-163):
    #: ((predicate, ((name, value), ...)), ...).  Predicates are boolean
    #: expressions over block attributes (kind, n_chars, link_density,
    #: text_density, rtl, join), e.g. "kind=paragraph and link_density>0.5";
    #: ALL matching rules apply, in order.
    block_rules: tuple = ()
    #: per-segment model selection — the ``xpath_model`` analogue
    #: (recognize.py:247-262, ocrd-tool.json:164-168):
    #: ((predicate, model), ...).  Matching models are '+'-joined
    #: (recognize.py:258-259); no match falls back to ``model``.
    model_rules: tuple = ()
    #: pluggable model resource — the custom ``.traineddata`` analogue
    #: (ocrd-tool.json:188+): a ((char, (alt, ...)), ...) confusion table
    #: replacing the built-in GLYPH_CONFUSIONS for glyph recognition.
    #: Ships to executors inside the kernel closure (broadcast semantics:
    #: serialized once per task set, resolved once per document).
    glyph_confusions: tuple = ()
    #: in-kernel auto model selection (recognize.py:266-277): when True
    #: and the effective model is a '+'-joined list, every candidate is
    #: scored on the block (MeanTextConf analogue) and the argmax wins —
    #: the winner is recorded in block.model and its confusion table
    #: drives glyph recognition for that block.
    auto_model: bool = False
    #: named model resources for auto_model scoring: ((model_name,
    #: ((char, (alt, ...)), ...)), ...) — each candidate model's
    #: confusion table (its .traineddata analogue).  A model without an
    #: entry falls back to glyph_confusions / the built-in table.
    model_resources: tuple = ()


DEFAULT_PARAMS = ExtractParams()

# ---------------------------------------------------------------------------
# predicate DSL + parameter resolution (xpath_parameters/xpath_model
# analogue, recognize.py:233-262)
# ---------------------------------------------------------------------------

#: typed fields the opaque ``extra`` map / block rules may override
#: (SetVariable analogue: string values coerced to the field's type)
_TYPED_FIELDS = {
    "min_paragraph_chars": int,
    "max_link_density": float,
    "textequiv_level": str,
    "segment_only": lambda v: v.lower() in ("1", "true", "yes"),
    "auto_model": lambda v: v.lower() in ("1", "true", "yes"),
    "model": str,
}

_PRED_CLAUSE_RE = re.compile(
    r"^\s*([a-z_]+)\s*(>=|<=|!=|=|>|<)\s*(\S+)\s*$"
)

#: fixed attribute schema the rule predicates evaluate against (the
#: block-classification inputs assembled in extract_document); typing the
#: RHS literal at COMPILE time lets a mistyped rule like 'n_chars>ten'
#: fail driver-side in _validate instead of killing executor tasks.
_PRED_ATTR_TYPES = {
    "kind": str,
    "n_chars": float,
    "link_density": float,
    "text_density": float,
    "rtl": bool,
    "join": bool,
}


@lru_cache(maxsize=1024)
def compile_predicate(expr: str):
    """'kind=paragraph and link_density>0.5' -> callable(attrs) -> bool.

    The web-DOM stand-in for the reference's XPath predicates over PAGE
    segments (recognize.py:238-240): attribute comparisons joined with
    'and'.  Unknown attributes never match (mirrors an XPath query that
    selects nothing).  RHS literals are coerced against the fixed attr
    schema HERE, so a type-mismatched rule raises at plan time.
    """
    clauses = []
    for part in expr.split(" and "):
        m = _PRED_CLAUSE_RE.match(part)
        if not m:
            raise ValueError(f"bad predicate clause: {part!r}")
        name, op, raw = m.group(1), m.group(2), m.group(3)
        typ = _PRED_ATTR_TYPES.get(name)
        if typ is bool:
            want = raw.lower() in ("1", "true", "yes")
        elif typ is float:
            try:
                want = float(raw)
            except ValueError:
                raise ValueError(
                    f"predicate clause {part!r}: {name} is numeric, "
                    f"got non-numeric literal {raw!r}"
                )
        else:
            want = raw  # str attr, or unknown attr (never matches anyway)
        clauses.append((name, op, want))

    def test(attrs: dict) -> bool:
        for name, op, want in clauses:
            if name not in attrs:
                return False
            actual = attrs[name]
            if op == "=":
                ok = actual == want
            elif op == "!=":
                ok = actual != want
            elif op == ">":
                ok = actual > want
            elif op == "<":
                ok = actual < want
            elif op == ">=":
                ok = actual >= want
            else:
                ok = actual <= want
            if not ok:
                return False
        return True

    return test


def _coerce_overrides(pairs) -> dict:
    out = {}
    for name, val in pairs:
        conv = _TYPED_FIELDS.get(name)
        if conv is not None:
            out[name] = conv(val)
    return out


def resolve_params(params: ExtractParams) -> ExtractParams:
    """Apply the opaque ``extra`` map onto the typed fields (the
    SetVariable pass the reference runs at init, recognize.py:361-365 via
    tesseract_parameters); unknown names stay in ``extra`` untouched."""
    if not params.extra:
        return params
    overrides = _coerce_overrides(params.extra)
    if not overrides:
        return params
    from dataclasses import replace

    return replace(params, **overrides)


def _block_effective(params: ExtractParams, attrs: dict):
    """Per-block (effective_params, model, from_rule) after rule application.

    All matching block_rules apply in order (recognize.py:238-246 applies
    every matching xpath_parameters entry); matching model_rules '+'-join
    (recognize.py:258-259), falling back to the default model.
    ``from_rule`` records whether a model_rule matched: the reference
    RETURNS right after an xpath_model match (recognize.py:258-262 — the
    '+'-joined rule models are used jointly, verbatim), so auto_model
    scoring must only ever apply to the preset model.
    """
    if not params.block_rules and not params.model_rules:
        # no-rules fast path (the common production config): skip the
        # override scan entirely — callers then need not build attrs
        return params, params.model, False
    eff = params
    overrides: dict = {}
    for expr, pairs in params.block_rules:
        if compile_predicate(expr)(attrs):
            overrides.update(_coerce_overrides(pairs))
    if overrides:
        from dataclasses import replace

        eff = replace(params, **overrides)
    models = [m for expr, m in params.model_rules if compile_predicate(expr)(attrs)]
    if models:
        return eff, "+".join(models), True
    return eff, eff.model, False

# tag -> block kind (region-type switch, recognize.py:585-674)
_BLOCK_KIND = {
    "p": "paragraph",
    "li": "paragraph",
    "pre": "paragraph",
    "dd": "paragraph",
    "dt": "paragraph",
    "h1": "heading",
    "h2": "heading",
    "h3": "heading",
    "h4": "heading",
    "h5": "heading",
    "h6": "heading",
    "figcaption": "caption",
    "caption": "caption",
    "blockquote": "floating",
    "td": "table",
    "th": "table",
}
# void block tags that carry no text
_VOID_KIND = {"hr": "separator", "img": "image"}
# inline style tags -> TextStyle bits (fontshape.py:125-140 analogue)
_STYLE_BITS = {"b": 1, "i": 2, "code": 4}
# content inside these is masked out entirely (binarize.py:106-110 analogue)
_SKIP_CONTENT = {"script", "style", "template", "noscript", "title"}
# boilerplate containers: descendants are noise (NoiseRegion analogue)
_BOILERPLATE = {"nav", "header", "footer", "aside"}

# one dict lookup per tag instead of a chain of set-membership tests in
# the parser's hottest hooks (the tag sets above are disjoint; 0 = any
# other tag, the most common case in real markup)
_CAT_SKIP, _CAT_BOILER, _CAT_VOID, _CAT_BR, _CAT_A, _CAT_STYLE, _CAT_BLOCK = (
    1, 2, 3, 4, 5, 6, 7,
)
_TAG_CAT = {t: _CAT_SKIP for t in _SKIP_CONTENT}
_TAG_CAT.update({t: _CAT_BOILER for t in _BOILERPLATE})
_TAG_CAT.update({t: _CAT_VOID for t in _VOID_KIND})
_TAG_CAT["br"] = _CAT_BR
_TAG_CAT["a"] = _CAT_A
_TAG_CAT.update({t: _CAT_STYLE for t in _STYLE_BITS})
_TAG_CAT.update({t: _CAT_BLOCK for t in _BLOCK_KIND})

_WS_RE = re.compile(r"[ \t\r\n\f\v]+")
#: does a text run need _WS_RE normalization at all?  any non-space
#: whitespace char, or a run of 2+ spaces (a single space maps to itself)
_WS_DIRTY_RE = re.compile(r"[\t\r\n\f\v]|  ")
_WORD_RE = re.compile(r"\S+")
_ALNUM_RE = re.compile(r"[0-9A-Za-z\u00c0-\u024f\u0590-\u06ff\u4e00-\u9fff]")

# ---------------------------------------------------------------------------
# glyph level: ranked character alternatives
# (the ChoiceIterator analogue; constants transplant recognize.py:56-57)
# ---------------------------------------------------------------------------

#: maximum number of choices to annotate (recognize.py:56)
CHOICE_THRESHOLD_NUM = 10
#: maximum score drop from the best choice (recognize.py:57; like the
#: reference's /100 scale, the drop rule is a maximum that rarely binds \u2014
#: the rank cutoff is the practical limit)
CHOICE_THRESHOLD_CONF = 1.0

#: deterministic OCR-style confusion table: char -> ranked alternatives
#: (plays the role of Tesseract's per-symbol ChoiceIterator; shared with
#: the relational glyph_topk query so both engines agree byte-for-byte)
GLYPH_CONFUSIONS = {
    "0": ("o", "O"),
    "o": ("0",),
    "O": ("0",),
    "1": ("l", "I"),
    "l": ("1", "I"),
    "I": ("1", "l"),
    "5": ("s", "S"),
    "s": ("5",),
    "S": ("5",),
    "8": ("B",),
    "B": ("8",),
    "e": ("c",),
    "c": ("e",),
    "m": ("n",),
    "n": ("m",),
    "u": ("v",),
    "v": ("u",),
}


def glyph_conf(ch: str) -> float:
    """Deterministic per-glyph confidence: 1.0 for alphanumeric glyphs,
    0.5 otherwise (the per-char basis of word_conf)."""
    return 1.0 if _ALNUM_RE.match(ch) else 0.5


def glyph_choices(ch: str, table: dict | None = None) -> list:
    """Ranked TextEquiv choices for one glyph.

    Index 0 is the recognized glyph itself; alternatives follow in
    confusion-table order with a deterministic 0.02/rank score decay,
    cut off by the reference's dual rule (recognize.py:849-851): stop at
    rank > CHOICE_THRESHOLD_NUM or when the score drop from the best
    choice exceeds CHOICE_THRESHOLD_CONF.  Alternatives equal to the best
    text are skipped (recognize.py:845-846).  ``table`` swaps in a custom
    model resource (ExtractParams.glyph_confusions).
    """
    if table is None:
        table = GLYPH_CONFUSIONS
    best = glyph_conf(ch)
    out = [{"text": ch, "conf": best}]
    for rank, alt in enumerate(table.get(ch, ()), 1):
        if alt == ch:
            continue
        conf = round(best - 0.02 * rank, 4)
        if best - conf > CHOICE_THRESHOLD_CONF or rank > CHOICE_THRESHOLD_NUM:
            break
        out.append({"text": alt, "conf": conf})
    return out


@lru_cache(maxsize=65536)
def _model_table(params: "ExtractParams", model: str) -> dict:
    """Resolve one candidate model's confusion table (its .traineddata
    analogue): named entry in ``model_resources``, else the document-level
    custom table, else the built-in."""
    for name, table in params.model_resources:
        if name == model:
            return dict(table)
    return dict(params.glyph_confusions) if params.glyph_confusions else GLYPH_CONFUSIONS


def model_block_score(line_words: list, table: dict) -> float:
    """MeanTextConf analogue (recognize.py:270-273) for one candidate
    model over one block: mean per-glyph confidence, where a glyph listed
    in the model's confusion table is ambiguous under that model and
    scores 0.25 below its base conf.  A model whose confusions overlap
    the block's glyphs less scores higher — the argmax is the model that
    'reads' the block most confidently."""
    total = 0.0
    n = 0
    for words, _ in line_words:
        for w in words:
            for ch in w:
                c = glyph_conf(ch)
                if ch in table:
                    c -= 0.25
                total += c
                n += 1
    return total / n if n else 0.0


@lru_cache(maxsize=65536)
def word_conf(word: str) -> float:
    """Deterministic per-word confidence in [0.5, 1.0].

    Plays the role of Tesseract's per-choice Confidence()/100
    (/root/reference/ocrd_tesserocr/recognize.py:638); defined as
    1 - 0.5 * (non-alphanumeric fraction), rounded to 4 decimals.
    Cached: real corpora repeat tokens heavily (Zipf), so the amortized
    cost is a dict hit (bounded LRU — unbounded would leak in a
    long-lived executor worker over web-scale vocabulary).
    """
    if not word:
        return 0.5
    alnum = len(_ALNUM_RE.findall(word))
    return round(1.0 - 0.5 * ((len(word) - alnum) / len(word)), 4)


#: raw block record layout (plain list — LOAD_FAST + BINARY_SUBSCR beat
#: slots-attribute traffic across the parser's ~40 constructions and
#: ~hundreds of accesses per document, round 6):
#:   [kind, rtl, btt, join, parts, tag_count]
#: ``parts`` holds (text, in_link, style_bits); ``btt`` is the
#: bottom-to-top line order flag (common.py:131-134).
_RK, _RRTL, _RBTT, _RJOIN, _RPARTS, _RTAGS = 0, 1, 2, 3, 4, 5

# single-pass token scanner (replaces stdlib HTMLParser, which profiled at
# ~60% of kernel time; same event stream, lenient like a browser tokenizer).
# Alternation order: most common first (start tag, end tag) so the engine
# tries at most one extra branch per real tag — safe because every branch
# except the bogus catch-all is mutually exclusive on the 2nd/3rd char
# ('<a', '</', '<!--', '<![', '<!D'), and bogus stays last.
_TOKEN_RE = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:_-]*)([^>]*)>"  # start tag (attrs incl. selfclose /)
    r"|</\s*([a-zA-Z][a-zA-Z0-9:_-]*)[^>]*>"  # end tag
    r"|<!--.*?-->"  # comment
    r"|<!\[CDATA\[.*?\]\]>"  # cdata
    r"|<!DOCTYPE[^>]*>"  # doctype
    r"|<[^>]*>?",  # bogus markup -> dropped
    re.S | re.I,
)
#: case-insensitive end-tag finders for raw-content skips: searching with
#: one of these from the current position replaces lowering the WHOLE
#: document (html.lower() allocated + scanned a full copy per document
#: just to skip a <title>)
_SKIP_END = {t: re.compile(r"</" + t, re.I) for t in _SKIP_CONTENT}
_ATTR_RE = re.compile(
    r"([a-zA-Z][a-zA-Z0-9_:-]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
)


def _unquote_attr(v: str) -> str:
    if len(v) >= 2 and v[0] in "\"'" and v[-1] == v[0]:
        v = v[1:-1]
    return unescape(v) if "&" in v else v


#: shared immutable separator parts: whitespace-run and <br> separators
#: are appended tens of times per document — one tuple each, never rebuilt
_SEP_PART = (" ", False, 0)
_BR_PART = ("\n", False, 0)


def _parse_blocks(html: str) -> list:
    """Streaming DOM tokenizer -> flat list of raw block records in
    document order (the analogue of Tesseract's single-pass layout
    analysis: one walk over the token stream yields every block with its
    classification inputs, recognize.py:486-492).

    One function, all state in locals (round 6): the former _BlockParser
    class dispatched ~320 method calls per document whose bodies were
    dominated by ``self._x`` attribute traffic; inlining the handlers
    keeps the whole event loop in LOAD_FAST territory.  The event stream
    and its semantics are byte-identical (digest-pinned across every
    preset x corpus combination).
    """
    blocks: list = []
    stack: list = []  # open block records
    open_tags: list = []  # open block tag names ('#implicit' sentinel)
    link_depth = 0
    boiler_depth = 0
    dir_stack: list = []  # rtl flags from dir= attrs
    dir_tags: list = []
    # open b/i/code depths -> current style bits for text parts
    style_depth = {"b": 0, "i": 0, "code": 0}
    style_bits = 0

    pos = 0
    n = len(html)
    search = _TOKEN_RE.search
    tag_cat = _TAG_CAT
    unesc = unescape
    ws_dirty = _WS_DIRTY_RE.search
    ws_sub = _WS_RE.sub
    while pos < n:
        m = search(html, pos)
        if m is None:
            start = pend = n
        else:
            # one span() call instead of separate start()/end() lookups
            start, pend = m.span()
        if start > pos:
            # -- text run (the former handle_data, inlined) --------------
            chunk = html[pos:start]
            if "&" in chunk:
                chunk = unesc(chunk)
            if not chunk or chunk.isspace():
                # keep a single separator between inline siblings, but
                # never open an implicit block on pure whitespace
                if stack:
                    parts = stack[-1][4]
                    if parts:
                        parts.append(_SEP_PART)
            else:
                if stack:
                    top = stack[-1]
                else:
                    # bare text outside any block opens an implicit
                    # paragraph (sparse_text analogue, recognize.py:736-750)
                    top = [
                        "noise" if boiler_depth else "paragraph",
                        dir_stack[-1] if dir_stack else False,
                        False,
                        False,
                        [],
                        0,
                    ]
                    blocks.append(top)
                    stack.append(top)
                    open_tags.append("#implicit")
                # normalize whitespace runs only when one exists (single C
                # scan beats an unconditional re.sub: most parts are clean)
                if ws_dirty(chunk) is not None:
                    chunk = ws_sub(" ", chunk)
                top[4].append((chunk, link_depth > 0, style_bits))
        if m is None:
            break
        pos = pend
        # lastindex names the branch without fetching every group: start
        # tags stop at group 2 (attrs always matches, possibly empty),
        # end tags at group 3, comment/doctype/bogus at None
        li = m.lastindex
        if li == 2:
            # -- start tag (the former handle_starttag, inlined) ---------
            tag_raw, attrs_raw = m.group(1, 2)
            tag = tag_raw.lower()
            cat = tag_cat.get(tag, 0)
            if cat == _CAT_SKIP:
                # fast-forward past the raw content (script/style/...)
                mm = _SKIP_END[tag].search(html, pos)
                if mm is None:
                    break
                k = html.find(">", mm.start())
                pos = n if k < 0 else k + 1
                continue
            selfclose = attrs_raw.endswith("/")
            if selfclose:
                attrs_raw = attrs_raw[:-1]
            # attrs are only parsed when dir/data-* appear in the raw tag
            # (the overwhelmingly common tag has none)
            a = None
            if attrs_raw and (
                "dir" in attrs_raw
                or "data-join" in attrs_raw
                or "data-line-order" in attrs_raw
            ):
                a = dict(
                    (x.lower(), _unquote_attr(v))
                    for x, v in _ATTR_RE.findall(attrs_raw)
                )
                d = a.get("dir", "").lower()
                if d in ("rtl", "ltr"):
                    dir_stack.append(d == "rtl")
                    dir_tags.append(tag)
            if cat == 0:  # any other tag: counts toward text_density only
                if stack:
                    stack[-1][5] += 1
                continue
            if cat == _CAT_BLOCK:
                if open_tags and open_tags[-1] == "#implicit":
                    open_tags.pop()
                    stack.pop()
                boiler = boiler_depth > 0
                if a is None:
                    blk = [
                        "noise" if boiler else _BLOCK_KIND[tag],
                        dir_stack[-1] if dir_stack else False,
                        False,
                        False,
                        [],
                        0,
                    ]
                else:
                    d = a.get("dir", "").lower()
                    blk = [
                        "noise" if boiler else _BLOCK_KIND[tag],
                        False
                        if d == "ltr"
                        else (
                            (dir_stack[-1] if dir_stack else False)
                            or d == "rtl"
                        ),
                        # textLineOrder bottom-to-top analogue
                        # (common.py:131-134)
                        a.get("data-line-order", "").lower()
                        in ("btt", "bottom-to-top"),
                        "data-join" in a,
                        [],
                        0,
                    ]
                blocks.append(blk)
                stack.append(blk)
                open_tags.append(tag)
                if selfclose:
                    # <p/>: open + immediate close
                    if open_tags and open_tags[-1] == "#implicit":
                        open_tags.pop()
                        stack.pop()
                    if dir_tags and dir_tags[-1] == tag:
                        dir_tags.pop()
                        dir_stack.pop()
                    if open_tags and open_tags[-1] == tag:
                        open_tags.pop()
                        stack.pop()
                continue
            if cat == _CAT_STYLE:
                style_depth[tag] += 1
                style_bits |= _STYLE_BITS[tag]
                if stack:
                    stack[-1][5] += 1
                if selfclose:
                    if dir_tags and dir_tags[-1] == tag:
                        dir_tags.pop()
                        dir_stack.pop()
                    if style_depth[tag] > 0:
                        style_depth[tag] -= 1
                        if style_depth[tag] == 0:
                            style_bits &= ~_STYLE_BITS[tag]
                continue
            if cat == _CAT_A:
                link_depth += 1
                if stack:
                    stack[-1][5] += 1
                continue
            if cat == _CAT_BR:
                if stack:
                    stack[-1][4].append(_BR_PART)
                continue
            if cat == _CAT_BOILER:
                boiler_depth += 1
                if open_tags and open_tags[-1] == "#implicit":
                    open_tags.pop()
                    stack.pop()
                continue
            # _CAT_VOID
            if open_tags and open_tags[-1] == "#implicit":
                open_tags.pop()
                stack.pop()
            blocks.append(
                [
                    "noise" if boiler_depth else _VOID_KIND[tag],
                    False,
                    False,
                    False,
                    [],
                    0,
                ]
            )
        elif li == 3:
            # -- end tag (the former handle_endtag, inlined) -------------
            tag = m.group(3).lower()
            cat = tag_cat.get(tag, 0)
            if cat == _CAT_SKIP:
                continue  # no skip frame can be open: starts fast-forward
            # dir-stack pop must precede the boilerplate/<a> branches: a
            # dir attribute on <nav>/<header>/<footer>/<aside>/<a> is
            # pushed on open and would otherwise leak RTL past its close
            if dir_tags and dir_tags[-1] == tag:
                dir_tags.pop()
                dir_stack.pop()
            if cat == _CAT_BLOCK:
                # close innermost matching open block (lenient parser)
                if open_tags and open_tags[-1] == "#implicit":
                    open_tags.pop()
                    stack.pop()
                if open_tags and open_tags[-1] == tag:
                    open_tags.pop()
                    stack.pop()
            elif cat == _CAT_STYLE:
                if style_depth[tag] > 0:
                    style_depth[tag] -= 1
                    if style_depth[tag] == 0:
                        style_bits &= ~_STYLE_BITS[tag]
            elif cat == _CAT_A:
                if link_depth:
                    link_depth -= 1
            elif cat == _CAT_BOILER:
                if boiler_depth:
                    boiler_depth -= 1
        # comments / doctype / bogus markup: dropped
    return blocks


# --------------------------------------------------------------------------
# assembly: raw blocks -> span hierarchy + canonical text
# --------------------------------------------------------------------------


def _assemble_block(raw: list) -> tuple:
    """One raw block -> lines/words with local canonical text.

    Lines split on <br>-induced '\\n' (textLineOrder analogue,
    recognize.py:735-780); words are whitespace tokens
    (recognize.py:782-814); RTL blocks reverse word order per line
    (common.py:138-151).
    """
    kind, rtl, btt, join, parts, tag_count = raw
    if not parts:
        # 14% of blocks (void/empty elements): the general path below
        # reduces to exactly this constant shape
        return (kind, rtl, join, [], 0, 0.0, 0.0)
    if len(parts) == 1:
        # 79% of blocks carry a single coalesced text part: skip the
        # join and the accumulation loop (same arithmetic, one pass)
        text, in_link, sbits = parts[0]
        nl = text.count("\n")
        total_chars = len(text) - text.count(" ") - nl
        link_chars = total_chars if in_link else 0
        any_style = bool(sbits)
    else:
        text = "".join(p for p, _, _ in parts)
        nl = text.count("\n")
        total_chars = 0
        link_chars = 0
        any_style = False
        for part, in_link, sbits in parts:
            # non-whitespace char count; count() beats building two
            # stripped copies via replace() (same value: parts only carry
            # ' '/'\n' whitespace after the tokenizer's _WS_RE
            # normalization)
            n = len(part) - part.count(" ") - part.count("\n")
            total_chars += n
            if in_link:
                link_chars += n
            if sbits:
                any_style = True
    # styled intervals (only materialized when a style tag occurred): a
    # word's TextStyle is the OR of the bits of every styled part it
    # overlaps, so a word assembled across a style boundary (e.g.
    # foo<b>bar</b>) still carries the style — mirroring
    # WordFontAttributes being per-word.  Interval overlap (typically one
    # interval per block) beats a per-char bits array by ~10x; unstyled
    # blocks skip the offset bookkeeping entirely (the hot path).
    styled_ivs: list[tuple[int, int, int]] = []
    if any_style:
        pos = 0
        for part, _, sbits in parts:
            if sbits:
                styled_ivs.append((pos, pos + len(part), sbits))
            pos += len(part)
    # each line is (words, style_bits_or_None): words stay plain strings —
    # the downstream joins/conf sums run straight over them — and the
    # parallel bits list only exists when a style tag occurred (round 6:
    # dropping the per-word (w, sbits) tuples removed ~40 tuple builds +
    # unpacks per document from the hot path)
    lines = []
    if not styled_ivs:
        if nl == 0:
            # single-line fast path (reuses the count computed above):
            # no "\n" means exactly one candidate segment
            words = text.split()
            if words:
                if rtl:
                    words.reverse()
                lines.append((words, None))
        else:
            for seg in text.split("\n"):
                words = seg.split()
                if not words:
                    continue
                if rtl:
                    words.reverse()
                lines.append((words, None))
    else:
        offset = 0
        for seg in text.split("\n"):
            words = []
            bits = []
            for m in _WORD_RE.finditer(seg):
                s = offset + m.start()
                e = offset + m.end()
                sbits = 0
                for ivs, ive, ivb in styled_ivs:
                    if ivs < e and s < ive:
                        sbits |= ivb
                words.append(m.group(0))
                bits.append(sbits)
            offset += len(seg) + 1
            if not words:
                continue
            if rtl:
                words.reverse()
                bits.reverse()
            lines.append((words, bits))
    if btt:
        # bottom-to-top textLineOrder reverses line traversal
        # (common.py:131-134)
        lines.reverse()
    # link-free blocks (the common case) skip the round() call outright
    link_density = (
        round(link_chars / total_chars, 6) if link_chars else 0.0
    )
    text_density = total_chars / (1.0 + tag_count)
    return (
        kind,
        rtl,
        join,
        lines,
        total_chars,
        link_density,
        round(text_density, 6),
    )


def _block_canonical_text(line_words: list) -> str:
    # str.join over a LIST beats a generator here (join pre-sizes;
    # measured 1.4x on the bench corpus's block-shape distribution);
    # single-line blocks (the majority) skip the outer join entirely
    if len(line_words) == 1:
        return " ".join(line_words[0][0])
    return "\n".join([" ".join(ws) for ws, _ in line_words])


def classify_is_main(kind: str, n_chars: int, link_density: float,
                     params: ExtractParams) -> bool:
    """Main-content gate (the web analogue of text-region acceptance,
    recognize.py:584-601 + the north rule's boilerplate classification)."""
    if kind not in params.main_kinds:
        return False
    if link_density > params.max_link_density:
        return False
    if kind == "paragraph" and n_chars < params.min_paragraph_chars:
        return False
    return n_chars > 0


#: preformatted block ids ("block%04d"): ~40 formats per document replaced
#: by list indexing; documents with >1024 blocks fall back to the format
_BLOCK_IDS = ["block%04d" % i for i in range(1024)]


def extract_document(html: bytes | str | None,
                     params: ExtractParams = DEFAULT_PARAMS) -> dict:
    """html payload -> extracted record (dict matching EXTRACTED_SCHEMA
    minus url/partition bookkeeping).

    Failure rows (undecodable/unparseable payloads) return
    ``{"failed": True, ...}`` instead of raising — failures are counted in
    lineage, they never abort the job (north rule).
    """
    params = resolve_params(params)  # opaque extra map -> typed fields
    # custom model resource (the .traineddata analogue): resolved once per
    # document, default table otherwise
    glyph_table = dict(params.glyph_confusions) if params.glyph_confusions else None
    try:
        if html is None:
            raise ValueError("null payload")
        if isinstance(html, (bytes, bytearray, memoryview)):
            html = bytes(html).decode("utf-8", errors="strict")
        raws = _parse_blocks(html)
    except Exception:
        return {
            "text": None,
            "conf": 0.0,
            "blocks": [],
            "features": ["failed"],
            "failed": True,
        }

    assembled = []
    for raw in raws:
        a = _assemble_block(raw)
        # binary-empty filter: drop blocks with no tokens unless they are
        # structural markers (recognize.py:598-601)
        if not a[3] and a[0] not in ("separator", "image"):
            continue
        assembled.append(a)

    blocks = []
    doc_parts: list[str] = []
    pos = 0  # running char offset into canonical doc text
    prev_main = False
    main_confs: list[float] = []

    # loop invariants hoisted out of the per-block walk (round 6): rule
    # presence, the default (eff, model) triple, and the auto_model
    # precondition are properties of params, not of any block
    has_rules = bool(params.block_rules or params.model_rules)
    default_model = params.model
    may_auto = params.auto_model and "+" in default_model
    main_kinds = params.main_kinds
    max_ld = params.max_link_density
    min_pc = params.min_paragraph_chars

    for idx, a in enumerate(assembled):
        # positional unpack of the _assemble_block tuple: the loop body
        # reads these fields 10+ times per block
        a_kind, a_rtl, a_join, a_line_words, a_n_chars, a_link_density, a_text_density = a
        block_id = _BLOCK_IDS[idx] if idx < 1024 else "block%04d" % idx
        # per-segment dynamic config (xpath_parameters/xpath_model
        # analogue): rules see the block's classification inputs (the
        # attrs dict is only built when a rule could read it)
        if has_rules:
            attrs = {
                "kind": a_kind,
                "n_chars": a_n_chars,
                "link_density": a_link_density,
                "text_density": a_text_density,
                "rtl": a_rtl,
                "join": a_join,
            }
            eff, model, model_from_rule = _block_effective(params, attrs)
        else:
            eff, model, model_from_rule = params, default_model, False
        # in-kernel auto_model (recognize.py:266-277): '+'-joined candidates
        # are each scored on THIS block; the argmax (first on ties, like
        # np.argmax) becomes the block's model and its confusion table
        # drives glyph recognition below.  A model selected by a matched
        # model_rule is exempt: the reference returns after an xpath_model
        # match (recognize.py:258-262), using the joined tag verbatim —
        # auto_model only ever scores the preset model.
        block_glyph_table = glyph_table
        if (may_auto or has_rules) and eff.auto_model and not model_from_rule and "+" in model:
            cands = model.split("+")
            scores = [
                model_block_score(a_line_words, _model_table(params, m))
                for m in cands
            ]
            best = max(range(len(cands)), key=lambda i: (scores[i], -i))
            model = cands[best]
            block_glyph_table = _model_table(params, model)
        if has_rules:
            is_main = classify_is_main(a_kind, a_n_chars, a_link_density, eff)
        else:
            # inlined classify_is_main over the hoisted default gates
            # (identical logic; the call itself was ~1.5% of the document
            # walk on the bench corpus)
            is_main = (
                a_kind in main_kinds
                and a_link_density <= max_ld
                and not (a_kind == "paragraph" and a_n_chars < min_pc)
                and a_n_chars > 0
            )
        if eff.segment_only:
            is_main_out = is_main
            blocks.append(
                {
                    "block_id": block_id,
                    "kind": a_kind,
                    "order_idx": idx,
                    "char_start": -1,
                    "char_end": -1,
                    "text": "",
                    "conf": 0.0,
                    "text_density": a_text_density,
                    "link_density": a_link_density,
                    "is_main": is_main_out,
                    "model": model,
                    "lines": [],
                }
            )
            continue
        btext = _block_canonical_text(a_line_words)
        if not is_main:
            # lazy recognition: segment-only for non-main blocks
            blocks.append(
                {
                    "block_id": block_id,
                    "kind": a_kind,
                    "order_idx": idx,
                    "char_start": -1,
                    "char_end": -1,
                    "text": btext,
                    "conf": 0.0,
                    "text_density": a_text_density,
                    "link_density": a_link_density,
                    "is_main": False,
                    "model": model,
                    "lines": [],
                }
            )
            continue

        # separator between main blocks: '\n' unless join relation
        # (common.py:166-175)
        if prev_main and not a_join:
            doc_parts.append("\n")
            pos += 1
        b_start = pos
        lines_out = []
        line_confs = []
        # emission gate (textequiv_level): structure below the exit level
        # never crosses the batch boundary — and is never BUILT (true lazy
        # emission, the analogue of running lower RIL levels only when
        # asked, recognize.py:806-856); per-block rules may deepen/shallow
        # the level for matching blocks.  Offsets and confidences are
        # computed identically at every level — only dict construction is
        # skipped.  The production 'extract' preset is block-level, so
        # this skip is its hot path.
        level = eff.textequiv_level
        emit_lines = level in ("line", "word", "glyph")
        emit_words = level in ("word", "glyph")
        if not emit_lines:
            # block-level fast path (the production 'extract' hot path):
            # no per-word structure is emitted, and the block's emitted
            # text IS btext (the "\n"/" " joins the generic walk below
            # performs word-by-word — _assemble_block never yields empty
            # word lists, so the shapes coincide exactly), so emission
            # reduces to ONE append + the conf aggregation — no duplicate
            # join work.  Byte-identical text/offsets/confs to the
            # generic walk (pinned by the kernel-parity suite and the
            # level-projection fuzz property); VERDICT r4 item 5: the
            # per-word Python walk was the largest remaining block-level
            # cost after r4's lazy emission.
            doc_parts.append(btext)
            pos += len(btext)
            lw = a_line_words
            bconf = 0.0
            if lw:
                wc = word_conf
                # explicit loop: identical left-to-right float summation,
                # no generator frame per line (round 6)
                acc = 0.0
                for words, _ in lw:
                    acc += sum(map(wc, words)) / len(words)
                bconf = acc / len(lw)
            main_confs.append(bconf)
            blocks.append(
                {
                    "block_id": block_id,
                    "kind": a_kind,
                    "order_idx": idx,
                    "char_start": b_start,
                    "char_end": pos,
                    "text": btext,
                    "conf": bconf,
                    "text_density": a_text_density,
                    "link_density": a_link_density,
                    "is_main": True,
                    "model": model,
                    "lines": [],
                }
            )
            prev_main = True
            continue
        for li, (words, wbits) in enumerate(a_line_words):
            if li > 0:
                doc_parts.append("\n")
                pos += 1
            l_start = pos
            words_out = []
            wconfs = []
            line_prefix = "%s_line%04d" % (block_id, li) if emit_lines else ""
            for wi, w in enumerate(words):
                sbits = wbits[wi] if wbits else 0
                if wi > 0:
                    doc_parts.append(" ")
                    pos += 1
                w_start = pos
                doc_parts.append(w)
                pos += len(w)
                c = word_conf(w)
                wconfs.append(c)
                if not emit_words:
                    continue
                word_id = "%s_word%04d" % (line_prefix, wi)
                glyphs = []
                if level == "glyph":
                    # symbol-level descent with ranked choices
                    # (recognize.py:816-856)
                    glyphs = [
                        {
                            "glyph_id": "%s_glyph%04d" % (word_id, gi),
                            "char_start": w_start + gi,
                            "char_end": w_start + gi + 1,
                            "text": ch,
                            "conf": glyph_conf(ch),
                            "choices": glyph_choices(ch, block_glyph_table),
                        }
                        for gi, ch in enumerate(w)
                    ]
                words_out.append(
                    {
                        "word_id": word_id,
                        "char_start": w_start,
                        "char_end": pos,
                        "text": w,
                        "conf": c,
                        "style": {
                            "bold": bool(sbits & 1),
                            "italic": bool(sbits & 2),
                            "monospace": bool(sbits & 4),
                        },
                        "glyphs": glyphs,
                    }
                )
            lconf = sum(wconfs) / len(wconfs) if wconfs else 0.0
            line_confs.append(lconf)
            if emit_lines:
                lines_out.append(
                    {
                        "line_id": line_prefix,
                        "char_start": l_start,
                        "char_end": pos,
                        "text": " ".join(words),
                        "conf": lconf,
                        "words": words_out,
                    }
                )
        bconf = sum(line_confs) / len(line_confs) if line_confs else 0.0
        main_confs.append(bconf)
        blocks.append(
            {
                "block_id": block_id,
                "kind": a_kind,
                "order_idx": idx,
                "char_start": b_start,
                "char_end": pos,
                "text": btext,
                "conf": bconf,
                "text_density": a_text_density,
                "link_density": a_link_density,
                "is_main": True,
                "model": model,
                "lines": lines_out,
            }
        )
        prev_main = True

    doc_text = None
    if not params.segment_only:
        # rstrip('\n\f') on the final recognized text (recognize.py:636)
        doc_text = "".join(doc_parts).rstrip("\n\f")
    doc_conf = sum(main_confs) / len(main_confs) if main_confs else 0.0
    return {
        "text": doc_text,
        "conf": doc_conf,
        "blocks": blocks,
        "features": list(params.features),
        "failed": False,
    }
