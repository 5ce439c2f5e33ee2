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
from operator import itemgetter

#: (word, style_bits) -> word, C-level, for the block-level conf
#: aggregation hot loop (measured ~1.25x over a tuple-unpacking genexpr)
_word_of = itemgetter(0)
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
    for words in line_words:
        for w, _ in words:
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


class _RawBlock:
    """Raw block under construction (hand-written slots class: the
    dataclass-generated __init__ with a default_factory profiled ~1.4x
    slower across the parser's ~40 constructions per document, round 6).
    ``parts`` holds (text, in_link, style_bits); ``btt`` is the
    bottom-to-top line order flag (common.py:131-134)."""

    __slots__ = ("kind", "rtl", "btt", "join", "boiler", "parts", "tag_count")

    def __init__(
        self,
        kind: str,
        rtl: bool = False,
        btt: bool = False,
        join: bool = False,
        boiler: bool = False,
    ) -> None:
        self.kind = kind
        self.rtl = rtl
        self.btt = btt
        self.join = join
        self.boiler = boiler
        self.parts = []
        self.tag_count = 0


# single-pass token scanner (replaces stdlib HTMLParser, which profiled at
# ~60% of kernel time; same event stream, lenient like a browser tokenizer).
# Alternation order: most common first (start tag, end tag) so the engine
# tries at most one extra branch per real tag — safe because every branch
# except the bogus catch-all is mutually exclusive on the 2nd/3rd char
# ('<a', '</', '<!--', '<![', '<!D'), and bogus stays last.
_TOKEN_RE = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:_-]*)([^>]*?)(/?)>"  # start tag (attrs, selfclose)
    r"|</\s*([a-zA-Z][a-zA-Z0-9:_-]*)[^>]*>"  # end tag
    r"|<!--.*?-->"  # comment
    r"|<!\[CDATA\[.*?\]\]>"  # cdata
    r"|<!DOCTYPE[^>]*>"  # doctype
    r"|<[^>]*>?",  # bogus markup -> dropped
    re.S | re.I,
)
_ATTR_RE = re.compile(
    r"([a-zA-Z][a-zA-Z0-9_:-]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
)


def _unquote_attr(v: str) -> str:
    if len(v) >= 2 and v[0] in "\"'" and v[-1] == v[0]:
        v = v[1:-1]
    return unescape(v) if "&" in v else v


#: shared read-only dict for attribute-free tags (never mutated — the
#: parser only ever .get()s from it)
_EMPTY_ATTRS: dict = {}


class _BlockParser:
    """Streaming DOM tokenizer -> flat list of raw blocks in document order.

    The analogue of Tesseract's single-pass layout analysis: one walk over
    the token stream yields every block with its classification inputs
    (recognize.py:486-492 runs all hierarchy levels off one iterator).
    """

    def __init__(self) -> None:
        self.blocks: list[_RawBlock] = []
        self._stack: list[_RawBlock] = []  # open block elements
        self._open_tags: list[str] = []  # open block tag names
        self._skip_depth = 0
        self._link_depth = 0
        self._boiler_depth = 0
        self._dir_stack: list[bool] = []  # rtl flags from dir= attrs
        self._dir_tags: list[str] = []
        # open b/i/code depths -> current style bits for text parts
        self._style_depth = {"b": 0, "i": 0, "code": 0}
        self._style_bits = 0

    # -- scanner -----------------------------------------------------------
    def feed(self, html: str) -> None:
        pos = 0
        n = len(html)
        lower = None
        # bound methods and module globals hoisted to locals: the loop body
        # runs ~160x per document, and LOAD_FAST beats attribute/global
        # lookups in exactly this kind of dispatch loop (round 6)
        search = _TOKEN_RE.search
        handle_data = self.handle_data
        handle_starttag = self.handle_starttag
        handle_startendtag = self.handle_startendtag
        handle_endtag = self.handle_endtag
        skip_content = _SKIP_CONTENT
        unesc = unescape
        while pos < n:
            m = search(html, pos)
            if m is None:
                chunk = html[pos:]
                if "&" in chunk:
                    chunk = unesc(chunk)
                handle_data(chunk)
                break
            start = m.start()
            if start > pos:
                chunk = html[pos:start]
                if "&" in chunk:
                    chunk = unesc(chunk)
                handle_data(chunk)
            pos = m.end()
            # one C call for all four groups instead of four lookups
            start_name, attrs_raw, selfclose, end_name = m.group(1, 2, 3, 4)
            if start_name is not None:
                tag = start_name.lower()
                if tag in skip_content:
                    # fast-forward past the raw content (script/style/...)
                    if lower is None:
                        lower = html.lower()
                    j = lower.find("</" + tag, pos)
                    if j < 0:
                        break
                    k = lower.find(">", j)
                    pos = n if k < 0 else k + 1
                    continue
                attrs = ()
                if attrs_raw and (
                    "dir" in attrs_raw
                    or "data-join" in attrs_raw
                    or "data-line-order" in attrs_raw
                ):
                    attrs = [
                        (a.lower(), _unquote_attr(v))
                        for a, v in _ATTR_RE.findall(attrs_raw)
                    ]
                if selfclose:
                    handle_startendtag(tag, attrs)
                else:
                    handle_starttag(tag, attrs)
                continue
            if end_name is not None:
                handle_endtag(end_name.lower())
            # comments / doctype / bogus markup: dropped

    def close(self) -> None:
        pass

    # -- helpers ----------------------------------------------------------
    def _rtl(self) -> bool:
        return self._dir_stack[-1] if self._dir_stack else False

    def _open_block(self, kind: str, attrs: dict) -> None:
        boiler = self._boiler_depth > 0
        if not attrs:
            # attribute-free fast path (the overwhelmingly common case:
            # feed passes () unless dir=/data-* appeared in the raw tag)
            blk = _RawBlock(
                kind="noise" if boiler else kind,
                rtl=self._rtl(),
                boiler=boiler,
            )
        else:
            blk = _RawBlock(
                kind="noise" if boiler else kind,
                rtl=self._rtl() or attrs.get("dir", "").lower() == "rtl",
                # textLineOrder bottom-to-top analogue (common.py:131-134)
                btt=attrs.get("data-line-order", "").lower()
                in ("btt", "bottom-to-top"),
                join="data-join" in attrs,
                boiler=boiler,
            )
            if attrs.get("dir", "").lower() == "ltr":
                blk.rtl = False
        self.blocks.append(blk)
        self._stack.append(blk)

    def _top(self) -> _RawBlock | None:
        return self._stack[-1] if self._stack else None

    def _implicit(self) -> _RawBlock:
        """Bare text outside any block opens an implicit paragraph
        (sparse_text mode analogue, recognize.py:736-750)."""
        blk = _RawBlock(
            kind="noise" if self._boiler_depth > 0 else "paragraph",
            rtl=self._rtl(),
            boiler=self._boiler_depth > 0,
        )
        self.blocks.append(blk)
        self._stack.append(blk)
        self._open_tags.append("#implicit")
        return blk

    def _close_implicit(self) -> None:
        if self._open_tags and self._open_tags[-1] == "#implicit":
            self._open_tags.pop()
            self._stack.pop()

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        cat = _TAG_CAT.get(tag, 0)
        if cat == _CAT_SKIP:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        # attrs is () for the overwhelmingly common attribute-free tag
        # (feed only parses attrs when dir/data-* appear): reuse one
        # read-only empty dict instead of building 200k+ throwaways, and
        # skip the dir check entirely when there are no attrs
        if attrs:
            a = dict(attrs)
            d = a.get("dir", "").lower()
            if d in ("rtl", "ltr"):
                self._dir_stack.append(d == "rtl")
                self._dir_tags.append(tag)
        else:
            a = _EMPTY_ATTRS
        if cat == 0:  # any other tag: counts toward text_density only
            stack = self._stack
            if stack:
                stack[-1].tag_count += 1
            return
        if cat == _CAT_BOILER:
            self._boiler_depth += 1
            self._close_implicit()
            return
        if cat == _CAT_VOID:
            self._close_implicit()
            self.blocks.append(
                _RawBlock(
                    kind="noise" if self._boiler_depth else _VOID_KIND[tag],
                    boiler=self._boiler_depth > 0,
                )
            )
            return
        if cat == _CAT_BR:
            stack = self._stack
            if stack:
                stack[-1].parts.append(("\n", False, 0))
            return
        if cat == _CAT_A:
            self._link_depth += 1
            stack = self._stack
            if stack:
                stack[-1].tag_count += 1
            return
        if cat == _CAT_STYLE:
            self._style_depth[tag] += 1
            self._style_bits |= _STYLE_BITS[tag]
            stack = self._stack
            if stack:
                stack[-1].tag_count += 1
            return
        # _CAT_BLOCK
        self._close_implicit()
        self._open_block(_BLOCK_KIND[tag], a)
        self._open_tags.append(tag)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        cat = _TAG_CAT.get(tag, 0)
        if cat == _CAT_BLOCK or cat == _CAT_STYLE:
            self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        cat = _TAG_CAT.get(tag, 0)
        if cat == _CAT_SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        # dir-stack pop must precede the boilerplate/<a> early returns:
        # a dir attribute on <nav>/<header>/<footer>/<aside>/<a> is pushed
        # on open and would otherwise leak RTL reversal past its close
        if self._dir_tags and self._dir_tags[-1] == tag:
            self._dir_tags.pop()
            self._dir_stack.pop()
        if cat == _CAT_BOILER:
            self._boiler_depth = max(0, self._boiler_depth - 1)
            return
        if cat == _CAT_A:
            self._link_depth = max(0, self._link_depth - 1)
            return
        if cat == _CAT_STYLE:
            d = self._style_depth
            if d[tag] > 0:
                d[tag] -= 1
                if d[tag] == 0:
                    self._style_bits &= ~_STYLE_BITS[tag]
            return
        if cat == _CAT_BLOCK:
            # close innermost matching open block (lenient like the parser)
            self._close_implicit()
            if self._open_tags and self._open_tags[-1] == tag:
                self._open_tags.pop()
                self._stack.pop()
            return

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        stack = self._stack
        top = stack[-1] if stack else None
        # isspace() == (strip() falsy) for non-empty strings, without
        # allocating the stripped copy of every TEXT run just to test it
        if not data or data.isspace():
            # keep a single separator between inline siblings, but never
            # open an implicit block on pure whitespace
            if top is not None and top.parts:
                top.parts.append((" ", False, 0))
            return
        if top is None:
            top = self._implicit()
        # normalize whitespace runs only when one exists (single C scan
        # beats an unconditional re.sub: most parts are already clean)
        if _WS_DIRTY_RE.search(data) is not None:
            data = _WS_RE.sub(" ", data)
        top.parts.append((data, self._link_depth > 0, self._style_bits))


# --------------------------------------------------------------------------
# assembly: raw blocks -> span hierarchy + canonical text
# --------------------------------------------------------------------------


def _assemble_block(raw: _RawBlock) -> dict:
    """One raw block -> lines/words with local canonical text.

    Lines split on <br>-induced '\\n' (textLineOrder analogue,
    recognize.py:735-780); words are whitespace tokens
    (recognize.py:782-814); RTL blocks reverse word order per line
    (common.py:138-151).
    """
    parts = raw.parts
    if not parts:
        # 14% of blocks (void/empty elements): the general path below
        # reduces to exactly this constant shape
        return {
            "kind": raw.kind,
            "rtl": raw.rtl,
            "join": raw.join,
            "line_words": [],
            "n_chars": 0,
            "link_density": 0.0,
            "text_density": 0.0,
        }
    if len(parts) == 1:
        # 79% of blocks carry a single coalesced text part: skip the
        # join and the accumulation loop (same arithmetic, one pass)
        text, in_link, sbits = parts[0]
        total_chars = len(text) - text.count(" ") - text.count("\n")
        link_chars = total_chars if in_link else 0
        any_style = bool(sbits)
    else:
        text = "".join(p for p, _, _ in parts)
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
        for part, _, sbits in raw.parts:
            if sbits:
                styled_ivs.append((pos, pos + len(part), sbits))
            pos += len(part)
    lines = []
    if not styled_ivs:
        for seg in text.split("\n"):
            words = [(w, 0) for w in seg.split()]
            if not words:
                continue
            if raw.rtl:
                words.reverse()
            lines.append(words)
    else:
        offset = 0
        for seg in text.split("\n"):
            words = []
            for m in _WORD_RE.finditer(seg):
                s = offset + m.start()
                e = offset + m.end()
                sbits = 0
                for ivs, ive, ivb in styled_ivs:
                    if ivs < e and s < ive:
                        sbits |= ivb
                words.append((m.group(0), sbits))
            offset += len(seg) + 1
            if not words:
                continue
            if raw.rtl:
                words.reverse()
            lines.append(words)
    if raw.btt:
        # bottom-to-top textLineOrder reverses line traversal
        # (common.py:131-134)
        lines.reverse()
    link_density = (link_chars / total_chars) if total_chars else 0.0
    text_density = total_chars / (1.0 + raw.tag_count)
    return {
        "kind": raw.kind,
        "rtl": raw.rtl,
        "join": raw.join,
        "line_words": lines,
        "n_chars": total_chars,
        "link_density": round(link_density, 6),
        "text_density": round(text_density, 6),
    }


def _block_canonical_text(line_words: list) -> str:
    # str.join over a LIST beats a generator here (join pre-sizes;
    # measured 1.4x on the bench corpus's block-shape distribution)
    return "\n".join([" ".join([w for w, _ in ws]) for ws in line_words])


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
        parser = _BlockParser()
        parser.feed(html)
        parser.close()
        raws = parser.blocks
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
        if not a["line_words"] and a["kind"] not in ("separator", "image"):
            continue
        assembled.append(a)

    blocks = []
    doc_parts: list[str] = []
    pos = 0  # running char offset into canonical doc text
    prev_main = False
    main_confs: list[float] = []

    for idx, a in enumerate(assembled):
        block_id = "block%04d" % idx
        # per-segment dynamic config (xpath_parameters/xpath_model
        # analogue): rules see the block's classification inputs (the
        # attrs dict is only built when a rule could read it)
        if params.block_rules or params.model_rules:
            attrs = {
                "kind": a["kind"],
                "n_chars": a["n_chars"],
                "link_density": a["link_density"],
                "text_density": a["text_density"],
                "rtl": a["rtl"],
                "join": a["join"],
            }
            eff, model, model_from_rule = _block_effective(params, attrs)
        else:
            eff, model, model_from_rule = params, params.model, False
        # in-kernel auto_model (recognize.py:266-277): '+'-joined candidates
        # are each scored on THIS block; the argmax (first on ties, like
        # np.argmax) becomes the block's model and its confusion table
        # drives glyph recognition below.  A model selected by a matched
        # model_rule is exempt: the reference returns after an xpath_model
        # match (recognize.py:258-262), using the joined tag verbatim —
        # auto_model only ever scores the preset model.
        block_glyph_table = glyph_table
        if eff.auto_model and not model_from_rule and "+" in model:
            cands = model.split("+")
            scores = [
                model_block_score(a["line_words"], _model_table(params, m))
                for m in cands
            ]
            best = max(range(len(cands)), key=lambda i: (scores[i], -i))
            model = cands[best]
            block_glyph_table = _model_table(params, model)
        is_main = classify_is_main(
            a["kind"], a["n_chars"], a["link_density"], eff
        )
        if eff.segment_only:
            is_main_out = is_main
            blocks.append(
                {
                    "block_id": block_id,
                    "kind": a["kind"],
                    "order_idx": idx,
                    "char_start": -1,
                    "char_end": -1,
                    "text": "",
                    "conf": 0.0,
                    "text_density": a["text_density"],
                    "link_density": a["link_density"],
                    "is_main": is_main_out,
                    "model": model,
                    "lines": [],
                }
            )
            continue
        btext = _block_canonical_text(a["line_words"])
        if not is_main:
            # lazy recognition: segment-only for non-main blocks
            blocks.append(
                {
                    "block_id": block_id,
                    "kind": a["kind"],
                    "order_idx": idx,
                    "char_start": -1,
                    "char_end": -1,
                    "text": btext,
                    "conf": 0.0,
                    "text_density": a["text_density"],
                    "link_density": a["link_density"],
                    "is_main": False,
                    "model": model,
                    "lines": [],
                }
            )
            continue

        # separator between main blocks: '\n' unless join relation
        # (common.py:166-175)
        if prev_main and not a["join"]:
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
            lw = a["line_words"]
            bconf = 0.0
            if lw:
                wc = word_conf
                bconf = sum(
                    sum(map(wc, map(_word_of, words))) / len(words)
                    for words in lw
                ) / len(lw)
            main_confs.append(bconf)
            blocks.append(
                {
                    "block_id": block_id,
                    "kind": a["kind"],
                    "order_idx": idx,
                    "char_start": b_start,
                    "char_end": pos,
                    "text": btext,
                    "conf": bconf,
                    "text_density": a["text_density"],
                    "link_density": a["link_density"],
                    "is_main": True,
                    "model": model,
                    "lines": [],
                }
            )
            prev_main = True
            continue
        for li, words in enumerate(a["line_words"]):
            if li > 0:
                doc_parts.append("\n")
                pos += 1
            l_start = pos
            words_out = []
            wconfs = []
            line_prefix = "%s_line%04d" % (block_id, li) if emit_lines else ""
            for wi, (w, sbits) in enumerate(words):
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
                        "text": " ".join(w for w, _ in words),
                        "conf": lconf,
                        "words": words_out,
                    }
                )
        bconf = sum(line_confs) / len(line_confs) if line_confs else 0.0
        main_confs.append(bconf)
        blocks.append(
            {
                "block_id": block_id,
                "kind": a["kind"],
                "order_idx": idx,
                "char_start": b_start,
                "char_end": pos,
                "text": btext,
                "conf": bconf,
                "text_density": a["text_density"],
                "link_density": a["link_density"],
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
