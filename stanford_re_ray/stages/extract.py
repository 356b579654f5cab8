"""S1 — HTML → text extraction (stateless ``map_batches`` stage).

FROZEN EXTRACTOR.  The per-row invariant from BASELINE.json is byte-identical
extracted text per url against this repo's own goldens, so this module must
never change behavior once goldens exist: it is a small, dependency-free HTML
stripper (no bs4/lxml — library upgrades would silently change bytes;
SURVEY.md §7.5 "Hard parts").

The reference itself consumes pre-extracted sentences (its Lucene IR is
stubbed; candidate sentences arrive as a TSV —
kbp/sf/evaluate/SimpleSlotFiller.java:106-152), so the extraction contract
here is defined by this implementation, versioned by ``EXTRACTOR_VERSION``.

Rules (v1):
  1. bytes → str as UTF-8, errors="replace".
  2. Drop <script>/<style>/<noscript>/<template> elements and <!-- comments -->.
  3. Block-level tags and <br> become newlines; every other tag becomes "".
  4. Unescape the named entities amp/lt/gt/quot/apos/nbsp (+ decimal and hex
     numeric references); nbsp becomes a plain space.
  5. Per line: collapse runs of whitespace to one space, strip; drop empty
     lines; join surviving lines with "\n".  No trailing newline.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

EXTRACTOR_VERSION = 1

_SCRIPTISH = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|table|tr|td|th|h1|h2|h3|h4|h5|h6|section|article|"
    "header|footer|nav|aside|main|blockquote|pre|hr|figure|figcaption|"
    "form|fieldset|dl|dt|dd|address|title|body|html|head"
)
_BLOCK = re.compile(r"</?(?:%s)\b[^>]*>" % _BLOCK_TAGS, re.IGNORECASE)
_ANY_TAG = re.compile(r"<[^>]*>")
_NUM_ENT = re.compile(r"&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});")
_NAMED_ENT = re.compile(r"&(amp|lt|gt|quot|apos|nbsp);")
_NAMED_MAP = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'", "nbsp": " "}
_WS_RUN = re.compile(r"[ \t\r\f\v ]+")


def _unescape_num(m: re.Match) -> str:
    body = m.group(1)
    try:
        cp = int(body[1:], 16) if body[0] in "xX" else int(body)
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            ch = chr(cp)
            return " " if ch == " " else ch
    except ValueError:
        pass
    return m.group(0)


def extract_text(html: bytes | str) -> str:
    """Extract visible text from one HTML document.  Pure + frozen."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", "replace")
    else:
        s = html
    s = _COMMENT.sub("", s)
    s = _SCRIPTISH.sub("", s)
    s = _BLOCK.sub("\n", s)
    s = _ANY_TAG.sub("", s)
    s = _NAMED_ENT.sub(lambda m: _NAMED_MAP[m.group(1)], s)
    s = _NUM_ENT.sub(_unescape_num, s)
    lines = []
    for line in s.split("\n"):
        line = _WS_RUN.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def extract_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` body: pages(url, warc_ts, html, text, lang) → docs.

    Drops the heavy ``html`` column immediately (SURVEY.md §4 memory
    pressure) and carries a stable content-addressed ``doc_id``.
    """
    import hashlib

    html_col = batch.column("html")
    texts = [extract_text(v) if v is not None else "" for v in html_col.to_pylist()]
    urls = batch.column("url").to_pylist()
    doc_ids = [hashlib.sha1(u.encode("utf-8")).hexdigest()[:16] for u in urls]
    out = pa.table(
        {
            "url": batch.column("url"),
            "doc_id": pa.array(doc_ids, pa.string()),
            "text": pa.array(texts, pa.string()),
            "lang": batch.column("lang"),
        }
    )
    return out


def filter_lang(batch: pa.Table, lang: str = "en") -> pa.Table:
    """Keep rows of one language (vectorized; cheap pre-filter before NLP)."""
    return batch.filter(pc.equal(batch.column("lang"), pa.scalar(lang)))
