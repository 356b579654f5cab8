"""Text-analysis operators for large-scale training-data pipelines.

All are stateless vectorized ``map_batches`` bodies over a ``documents``-like
table (``doc_id, text, ...``): language-ID (stopword/char n-gram heuristic),
quality scoring (length / punctuation / stopword ratios), token counting
(whitespace + a BPE-ish regex), and document fingerprinting (rolling hash).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- token counting --------------------------------------------------------

# explicit ASCII classes (not \w/\s): Python's re is Unicode-aware while
# the DuckDB oracle's RE2 is ASCII-only, so 'café' would tokenize
# differently under \w; the explicit classes agree byte-for-byte in both
# engines regardless of corpus (ADVICE r02).  \v is listed explicitly
# because RE2's \s excludes it while Python's ASCII \s includes it.
_BPE_RE = re.compile(r"[0-9A-Za-z_]+|[^0-9A-Za-z_ \t\n\r\f\v]")


def token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens (whitespace), n_bpe_tokens (word/punct regex),
    n_chars.  Whitespace tokens = Python ``str.split()`` semantics
    (equivalently DuckDB ``string_split_regex`` + empty filter)."""
    texts = batch.column("text").to_pylist()
    n_tok = [len(t.split()) if t else 0 for t in texts]
    n_bpe = [len(_BPE_RE.findall(t)) if t else 0 for t in texts]
    n_chars = [len(t) if t else 0 for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


# --- quality stats ---------------------------------------------------------

_STOPWORDS = frozenset(
    "the a an and or but of to in on at for with from by is are was were be "
    "been it its this that these those he she they them his her their".split()
)
_PUNCT = frozenset(".,;:!?'\"()[]{}-")


def quality_batch(batch: pa.Table) -> pa.Table:
    """Per-doc quality signals: digit/upper/punct counts (exact ints — safe
    for value-hash comparison) and stopword ratio."""
    texts = batch.column("text").to_pylist()
    n_digit, n_upper, n_punct, stop_ratio, mean_wlen = [], [], [], [], []
    for t in texts:
        t = t or ""
        n_digit.append(sum(c.isdigit() for c in t))
        n_upper.append(sum(c.isupper() for c in t))
        n_punct.append(sum(c in _PUNCT for c in t))
        words = t.lower().split()
        stop_ratio.append(
            round(sum(w in _STOPWORDS for w in words) / len(words), 6)
            if words else 0.0
        )
        mean_wlen.append(
            round(sum(len(w) for w in words) / len(words), 6) if words else 0.0
        )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_digits": pa.array(n_digit, pa.int64()),
            "n_upper": pa.array(n_upper, pa.int64()),
            "n_punct": pa.array(n_punct, pa.int64()),
            "stopword_ratio": pa.array(stop_ratio, pa.float64()),
            "mean_word_len": pa.array(mean_wlen, pa.float64()),
        }
    )


# --- language id -----------------------------------------------------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "was", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
    "fr": {"le", "la", "les", "et", "est", "une", "pour", "dans", "que", "pas"},
    "es": {"el", "los", "las", "es", "una", "para", "que", "con", "por", "del"},
}


class LangId:
    """Stopword-overlap language identifier (actor-pool pattern: marker
    tables compiled once per actor in __init__)."""

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def predict(self, text: str) -> str:
        words = set(text.lower().split()[:200])
        best, best_n = "unknown", 0
        for lang in sorted(self.markers):
            n = len(words & self.markers[lang])
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict(t or "") for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(preds, pa.string()),
            }
        )


# --- Gopher/C4-style quality filtering -------------------------------------

#: keep-rule thresholds (Gopher Table A1 / C4 heuristics, doc-level):
#: word-count window, mean-word-length window, repetition caps
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MAX_DUP_2GRAM_FRAC = 0.90
GOPHER_MAX_TOP_WORD_FRAC = 0.20


def gopher_quality_batch(batch: pa.Table) -> pa.Table:
    """Doc-level quality-filter signals in the Gopher/C4 family: word
    count, mean word length, duplicate-2-gram fraction (repetition), and
    top-word fraction — plus the combined boolean ``keep``.  Pure
    vectorizable per-doc stats; every float is rounded so the DuckDB
    oracle (q28) value-matches."""
    from collections import Counter

    texts = batch.column("text").to_pylist()
    n_words, mean_wlen, dup2, topw, keep = [], [], [], [], []
    for t in texts:
        ws = (t or "").split()
        n = len(ws)
        n_words.append(n)
        mw = round(sum(len(w) for w in ws) / n, 6) if n else 0.0
        mean_wlen.append(mw)
        if n >= 2:
            grams = [ws[i] + " " + ws[i + 1] for i in range(n - 1)]
            d2 = round(1.0 - len(set(grams)) / len(grams), 6)
        else:
            d2 = 0.0
        dup2.append(d2)
        tw = round(max(Counter(ws).values()) / n, 6) if n else 0.0
        topw.append(tw)
        keep.append(
            GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS
            and GOPHER_MIN_MEAN_WLEN <= mw <= GOPHER_MAX_MEAN_WLEN
            and d2 <= GOPHER_MAX_DUP_2GRAM_FRAC
            and tw <= GOPHER_MAX_TOP_WORD_FRAC
        )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len": pa.array(mean_wlen, pa.float64()),
            "dup_2gram_frac": pa.array(dup2, pa.float64()),
            "top_word_frac": pa.array(topw, pa.float64()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


# --- PII scrubbing ---------------------------------------------------------

# Patterns pinned to RE2-compatible, explicit-ASCII classes so the DuckDB
# oracle (q32) reproduces them byte-for-byte (same policy as the BPE
# tokenizer regex).
_EMAIL_RE = re.compile(
    r"[0-9A-Za-z._%+-]+@[0-9A-Za-z.-]+\.[A-Za-z][A-Za-z]+")
_PHONE_RE = re.compile(
    r"\+?[0-9][0-9 ()-]{7,}[0-9]")
_IP_RE = re.compile(
    r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}")


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    """Redact emails / phone-number-like runs / IPv4 literals — the
    standard pre-training PII pass — emitting the scrubbed text plus
    per-doc match counts.  Order matters and is fixed (email → ip →
    phone) so the oracle's nested regexp_replace chain matches exactly."""
    texts = batch.column("text").to_pylist()
    out_t, n_email, n_ip, n_phone = [], [], [], []
    for t in texts:
        t = t or ""
        n_email.append(len(_EMAIL_RE.findall(t)))
        t = _EMAIL_RE.sub("<EMAIL>", t)
        n_ip.append(len(_IP_RE.findall(t)))
        t = _IP_RE.sub("<IP>", t)
        n_phone.append(len(_PHONE_RE.findall(t)))
        t = _PHONE_RE.sub("<PHONE>", t)
        out_t.append(t)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text": pa.array(out_t, pa.string()),
        "n_email": pa.array(n_email, pa.int64()),
        "n_ip": pa.array(n_ip, pa.int64()),
        "n_phone": pa.array(n_phone, pa.int64()),
    })


# --- fingerprinting --------------------------------------------------------

_B = 1000003
_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str, window: int = 64) -> str:
    """Rolling (Rabin-Karp-style) document fingerprint: min of window
    hashes (a 1-permutation winnowing sketch), hex-encoded.

    Rolls over Unicode CODE POINTS, not utf-8 bytes: ``ord`` arithmetic
    is expressible exactly in the DuckDB oracle (q18) via
    ``ord(substring(text, i, 1))``, so cross-engine parity holds on any
    corpus — never let oracle parity depend on the corpus staying ASCII
    (the q25 lesson)."""
    if not text:
        return "0"
    cps = list(map(ord, text))
    n = len(cps)
    w = window if n > window else n
    h = 0
    for cp in cps[:w]:
        h = (h * _B + cp) % _MOD
    best = h
    if n > w:
        pw = pow(_B, w - 1, _MOD)
        for i in range(w, n):
            h = ((h - cps[i - w] * pw) * _B + cps[i]) % _MOD
            if h < best:
                best = h
    return f"{best:016x}"


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    fps = [rolling_fingerprint(t or "") for t in batch.column("text").to_pylist()]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(fps, pa.string()),
        }
    )
