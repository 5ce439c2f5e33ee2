"""Named pipeline presets — the facade pattern.

The reference's 9 processor subclasses are parameter rewrites over one
shared recognition core: TesserocrSegment pins
``segmentation_level='region', textequiv_level='none'``
(/root/reference/ocrd_tesserocr/segment.py:17-24), segment-region /
segment-table / segment-line / segment-word pin their level pairs
(segment_region.py:19-24, segment_table.py:19-22, segment_line.py:19-22,
segment_word.py:19-22), and all delegate ``process_page_pcgts`` verbatim.

Here each preset is a frozen :class:`ExtractParams` over the one Arrow
kernel — a logical-plan rewrite by parameter substitution, planned jointly
by Catalyst when stages chain.
"""

from __future__ import annotations

from ..oracle import ExtractParams

#: full pipeline: clean -> segment -> recognize (the default recognize
#: processor, recognize.py:282-525)
RECOGNIZE = ExtractParams()

#: layout only, no text recognition (textequiv_level='none';
#: TesserocrSegment facade, segment.py:17-24)
SEGMENT = ExtractParams(
    segment_only=True, features=("cleaned", "segmented")
)

#: permissive main-content gate (sparse_text analogue: accept short and
#: link-adjacent blocks, recognize.py:736-750)
SPARSE = ExtractParams(
    min_paragraph_chars=1,
    max_link_density=1.0,
    features=("cleaned", "segmented", "recognized", "sparse"),
)

#: aggressive boilerplate strip (stricter gates; the crop facade analogue,
#: crop.py:29-41 - trim chrome around the outermost content)
STRICT_MAIN = ExtractParams(
    min_paragraph_chars=32,
    max_link_density=0.2,
    features=("cleaned", "cropped", "segmented", "recognized"),
)

#: the production extraction stage (north rule contract: canonical text +
#: char-offset spans per block).  Word/line detail never crosses the Arrow
#: boundary — at 10^12 docs the nested word structs are ~6x the payload of
#: the block level for zero query value in the main pipeline; consumers
#: needing word spans run the 'recognize' preset on the slice they care
#: about (exactly how the reference only descends to glyphs when
#: textequiv_level asks for it, recognize.py:806-856).
EXTRACT = ExtractParams(textequiv_level="block")

#: full descent to per-character glyphs with ranked TextEquiv choices
#: (textequiv_level='glyph' + ChoiceIterator cutoffs,
#: recognize.py:816-856; constants recognize.py:56-57)
GLYPH = ExtractParams(textequiv_level="glyph")

#: segmentation-level facades (segment_line.py:19-22, segment_word.py:19-22
#: pin their level pairs over the same core): the emission ladder
SEGMENT_LINE = ExtractParams(textequiv_level="line")
SEGMENT_WORD = ExtractParams(textequiv_level="word")

PRESETS: dict[str, ExtractParams] = {
    "extract": EXTRACT,
    "recognize": RECOGNIZE,
    "segment": SEGMENT,
    "segment_line": SEGMENT_LINE,
    "segment_word": SEGMENT_WORD,
    "sparse": SPARSE,
    "strict_main": STRICT_MAIN,
    "glyph": GLYPH,
}
