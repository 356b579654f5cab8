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


# --- vectorized twin of rolling_fingerprint ---------------------------------
# The scalar loop above is the SPEC (and the DuckDB-oracle twin, q18); the
# numpy path below is bit-identical (pinned by tests/test_property.py and
# the q18 oracle) and ~3x faster single-core (min-of-K on the noisy host;
# per-char Python arithmetic was the dominant map cost of the fingerprint
# stage — NEXT_STEPS r03 item 3).
#
# Method: CHUNKED PREFIX HASH WITH CARRY CANCELLATION.  Concatenate all
# documents' code points; the polynomial hash of any in-document window
# [a, a+w) is (P[a+w] - P[a] * B^w) mod M where P is the prefix hash of
# the GLOBAL array — everything before a cancels, so chunking can ignore
# document boundaries entirely.  Slice the flat array into thousands of
# equal chunks and run the Horner recurrence down all chunks in lockstep
# (contiguous 2D rows — no gathers), giving LOCAL prefixes L.  The same
# cancellation then makes carries drop out of any window that stays
# inside one chunk:  P[cL+r] = C_c*B^r + L[r-1]  ⇒  for a window at
# chunk offset r,  H = L[r+w-1] - L[r-1]*B^w  — local values only, one
# broadcast 2D pass for ~99% of positions.  Only the w-1 window starts
# per chunk that straddle a boundary need the global carries C_c (a
# cheap ncols-step scalar stitch loop + a small gather pass).  Per-doc
# minima come from one np.minimum.reduceat over interleaved (start, end)
# boundaries, discarding the gap segments.
# (Two rejected designs, measured: a log-depth Hillis-Steele scan — 10x
# SLOWER than scalar, ~23 full-array sweeps of 10+ uint64 ops; and
# doc-lockstep with an active-prefix — parity at uniform lengths and
# pathological under length skew, one long doc forcing len(doc) tiny
# numpy calls.)
# All modular arithmetic is uint64 with 30/31-bit limb splitting (products
# of two <2^61 values need 122 bits); 2^61 ≡ 1 (mod M) makes the folds
# one-shift reductions.

_U = np.uint64
_M64 = _U(_MOD)
_MASK31 = _U((1 << 31) - 1)
_MASK30 = _U((1 << 30) - 1)
_S31 = _U(31)
_S30 = _U(30)
_S61 = _U(61)
_ONE = _U(1)


def _redmod(x: np.ndarray) -> np.ndarray:
    """Reduce uint64 values < 2^63 to [0, M) via 2^61 ≡ 1 folds."""
    x = (x & _M64) + (x >> _S61)          # < 2^61 + 3
    x = (x & _M64) + (x >> _S61)          # <= M + 1
    return np.where(x >= _M64, x - _M64, x)


def _mulmod(a: np.ndarray, b) -> np.ndarray:
    """(a * b) mod (2^61 - 1) for uint64 inputs already in [0, M)."""
    b = np.asarray(b, dtype=np.uint64)
    a_hi, a_lo = a >> _S31, a & _MASK31
    b_hi, b_lo = b >> _S31, b & _MASK31
    t1 = (a_hi * b_hi) << _ONE            # 2^62 ≡ 2; a_hi*b_hi < 2^60
    mid = a_hi * b_lo + a_lo * b_hi       # < 2^62
    t2 = (mid >> _S30) + ((mid & _MASK30) << _S31)   # mid * 2^31 mod M
    x = t1 + t2 + (a_lo * b_lo)           # < 2^63
    return _redmod(x)


_B64 = _U(_B)                              # _B < 2^31: small-scalar path


def _mulmod_b_lazy(a: np.ndarray) -> np.ndarray:
    """a * _B partially reduced to < 2^62, for a < 2^61 + 3 (lazy-reduced
    Horner state); _B < 2^31 so one limb suffices."""
    a_hi, a_lo = a >> _S31, a & _MASK31   # a_hi <= 2^30
    m = a_hi * _B64                       # < 2^50
    return (m >> _S30) + ((m & _MASK30) << _S31) + a_lo * _B64   # < 2^62


def _mulmod_b(a: np.ndarray) -> np.ndarray:
    """(a * _B) mod (2^61 - 1) for a in [0, M); _B < 2^31 so one limb."""
    return _redmod(_mulmod_b_lazy(a))


def _submod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.where(a >= b, a - b, a + _M64 - b)


def _pow_table(base: int, n: int) -> np.ndarray:
    """[base^0, ..., base^(n-1)] mod M by length-doubling."""
    p = np.ones(n, dtype=np.uint64)
    filled = 1
    while filled < n:
        step = min(filled, n - filled)
        p[filled:filled + step] = _mulmod(p[:step],
                                          _U(pow(base, filled, _MOD)))
        filled += step
    return p


#: below this many total code points the scalar loop wins (numpy setup
#: overhead); identical output either way
_VEC_MIN_CPS = 1 << 15
_N_CHUNKS = 16384


def _flat_window_hashes(cps: np.ndarray, n: int, w: int) -> np.ndarray:
    """Polynomial hash of EVERY w-length window of the flat code-point
    array: result[a] = hash(cps[a:a+w]) for all a where the window stays
    inside one document (entries whose window crosses a document boundary
    — or runs past n — are garbage; callers index only valid per-doc
    ranges).  The chunked carry-cancellation machine described above;
    shared by the min-fingerprint and the content-defined-chunking
    boundary rule."""
    # ---- local prefix hashes, chunk-parallel Horner ----------------------
    # transposed (clen, ncols) layout: every per-step slice is a contiguous
    # row; in-loop reduction is a LAZY single fold (h stays < 2^61 + 3,
    # which the limb math tolerates) — canonicalized once afterwards
    ncols = max(1, min(_N_CHUNKS, n // max(256, 2 * w)))
    clen = -(-n // ncols)
    pad = ncols * clen - n
    grid = np.ascontiguousarray(
        (np.concatenate([cps, np.zeros(pad, np.uint64)]) if pad
         else cps).reshape(ncols, clen).T)
    p_loc = np.empty((clen, ncols), dtype=np.uint64)
    h = np.zeros(ncols, dtype=np.uint64)
    for r in range(clen):
        x = _mulmod_b_lazy(h) + grid[r]             # cp < 2^21, sum < 2^62
        h = (x & _M64) + (x >> _S61)                # lazy: < 2^61 + 3
        p_loc[r] = h
    p_loc = _redmod(p_loc)                          # canonical, one pass
    del grid

    # ---- window hashes ---------------------------------------------------
    # H over flat window starts a = c*clen + r (chars a..a+w-1).  Same-chunk
    # (r <= clen-w): carries cancel — H = L[r+w-1] - L[r-1]*B^w, pure 2D
    # slices.  H_pad is laid out (ncols, clen) so flat index == a.
    pw_w = _U(pow(_B, w, _MOD))
    h_pad = np.empty((ncols, clen), dtype=np.uint64)
    hp = h_pad.reshape(-1)
    h2d = np.empty((clen - w + 1, ncols), dtype=np.uint64)
    h2d[0] = p_loc[w - 1]
    h2d[1:] = _submod(p_loc[w:], _mulmod(p_loc[:clen - w], pw_w))
    h_pad[:, :clen - w + 1] = h2d.T
    del h2d

    # straddlers (r > clen-w): need global carries C_c = P[c*clen]
    # (ncols-step scalar stitch; P[c*clen + r] = C_c*B^r + L[r-1])
    pow_clen = pow(_B, clen, _MOD)
    carries = np.empty(ncols, dtype=np.uint64)
    g = 0
    tail = p_loc[clen - 1]
    for c in range(ncols):
        carries[c] = g
        g = (g * pow_clen + int(tail[c])) % _MOD
    pow_row = _pow_table(_B, clen)
    pl_flat = p_loc.reshape(-1)                     # (r, c) -> r*ncols + c

    def p_at(k: np.ndarray) -> np.ndarray:
        # global prefix hash at flat char counts k (every k here has
        # k % clen >= 1: straddler starts/ends never sit on a boundary)
        c, r = k // clen, k % clen
        return _redmod(_mulmod(carries[c], pow_row[r])
                       + pl_flat[(r - 1) * ncols + c])

    str_r = np.arange(clen - w + 1, clen)
    a_str = (np.arange(ncols - 1)[:, None] * clen + str_r[None, :]).reshape(-1)
    a_str = a_str[a_str <= n - w]
    if len(a_str):
        hp[a_str] = _submod(p_at(a_str + w), _mulmod(p_at(a_str), pw_w))
    return hp


def rolling_fingerprints_vec(texts: list) -> list[str]:
    """Vectorized ``rolling_fingerprint`` over a list of texts — identical
    output (incl. the "0" for empty / None)."""
    w = 64
    cleaned = [(t or "") for t in texts]
    lens = np.array([len(t) for t in cleaned], dtype=np.int64)
    n = int(lens.sum())
    if n < _VEC_MIN_CPS:
        return [rolling_fingerprint(t) for t in cleaned]
    try:
        flat = "".join(cleaned).encode("utf-32-le")
    except UnicodeEncodeError:           # lone surrogates: scalar fallback
        return [rolling_fingerprint(t) for t in cleaned]
    cps = np.frombuffer(flat, dtype=np.uint32).astype(np.uint64)

    # docs shorter than the window have no rolling phase at all — scalar
    # (each is < 64 chars; exact same code path as the spec)
    out = ["0"] * len(cleaned)
    for i in np.flatnonzero((lens > 0) & (lens < w)):
        out[i] = rolling_fingerprint(cleaned[i])
    if not (lens >= w).any():
        return out                  # short-text batch: nothing to roll

    hp = _flat_window_hashes(cps, n, w)

    # ---- per-doc minima: one reduceat over interleaved (start, end) ------
    doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    big = np.flatnonzero(lens >= w)
    if len(big):
        s = doc_starts[big]
        e = s + lens[big] - (w - 1)
        idx = np.empty(2 * len(big), dtype=np.int64)
        idx[0::2] = s
        idx[1::2] = e
        if idx[-1] >= n - (w - 1):      # final segment runs to the end
            idx = idx[:-1]
        best = np.minimum.reduceat(hp[:n - (w - 1)], idx)[0::2]
        for i, v in zip(big, best):
            out[i] = f"{int(v):016x}"
    return out


#: cap on flat code points per vectorized chunk: ~8 transient uint64
#: arrays of this length ≈ 256 MiB peak, safely inside a worker heap even
#: at high per-node concurrency.
_FP_CHUNK_CPS = 4_000_000


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    fps: list[str] = []
    i = 0
    while i < len(texts):
        j, cps = i, 0
        while j < len(texts) and cps < _FP_CHUNK_CPS:
            cps += len(texts[j] or "")
            j += 1
        fps.extend(rolling_fingerprints_vec(texts[i:j]))
        i = j
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(fps, pa.string()),
        }
    )


def winnow_select_counts(texts: list, g: int = 8) -> np.ndarray:
    """Winnowing (the MOSS local fingerprint selection, Schleimer et
    al. 2003) over the same 64-cp Rabin-Karp window hashes as
    ``rolling_fingerprint``: every ``g``-window of consecutive hashes
    selects its RIGHTMOST minimum; the distinct selected positions are
    the document's local fingerprints (guarantee: any ≥ g+w−1 cp match
    between two documents shares a selected hash).  Returns an
    (n_docs, 2) int64 array of (n_hashes, n_selected) per text.

    Vector shape: one `_flat_window_hashes` pass over the concatenated
    batch (the q18 carry-cancellation machine), then a per-doc
    sliding-window min with rightmost-tie argmax — numpy throughout;
    sub-window docs fall back to the scalar spec hash (single window,
    one selection)."""
    w = 64
    cleaned = [(t or "") for t in texts]
    lens = np.array([len(t) for t in cleaned], dtype=np.int64)
    n = int(lens.sum())
    out = np.zeros((len(cleaned), 2), dtype=np.int64)
    if n == 0:
        return out

    # every non-empty doc shorter than w has exactly one window hash and
    # therefore exactly one selected position
    short = (lens > 0) & (lens < w)
    out[short] = [1, 1]

    big = np.flatnonzero(lens >= w)
    if not len(big):
        return out
    try:
        flat = "".join(cleaned).encode("utf-32-le")
    except UnicodeEncodeError:
        # lone surrogates: per-doc scalar spec (rare; correctness first)
        for i in big:
            cps = list(map(ord, cleaned[i]))
            h = 0
            hs = []
            pwv = pow(_B, w - 1, _MOD)
            for cp in cps[:w]:
                h = (h * _B + cp) % _MOD
            hs.append(h)
            for k in range(w, len(cps)):
                h = ((h - cps[k - w] * pwv) * _B + cps[k]) % _MOD
                hs.append(h)
            out[i] = [len(hs), _winnow_count(np.array(hs, np.uint64), g)]
        return out

    cps = np.frombuffer(flat, dtype=np.uint32).astype(np.uint64)
    hp = _flat_window_hashes(cps, n, w)
    doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    for i in big:
        s = int(doc_starts[i])
        hs = hp[s:s + int(lens[i]) - (w - 1)]
        out[i] = [len(hs), _winnow_count(hs, g)]
    return out


def _winnow_count(hs: np.ndarray, g: int) -> int:
    """Distinct positions selected by rightmost-min winnowing over the
    hash sequence ``hs`` with guarantee window ``g`` (single window of
    size len(hs) when shorter than g)."""
    S = len(hs)
    if S == 0:
        return 0
    if S <= g:
        return 1          # one window, one pick (its rightmost min)
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(hs, g)               # (S-g+1, g)
    m = wins.min(axis=1)
    rightmost = (g - 1) - np.argmax(wins[:, ::-1] == m[:, None], axis=1)
    picks = np.arange(S - g + 1, dtype=np.int64) + rightmost
    return int(np.unique(picks).size)


def winnow_selected_hashes(texts: list, g: int = 8) -> list:
    """Per-text list of DISTINCT winnow-selected window hashes (the
    actual MOSS fingerprints behind ``winnow_select_counts``'s
    n_selected): same 64-cp window hashes, same rightmost-min rule.
    Returns a list of sorted uint64 lists, one per text."""
    w = 64
    cleaned = [(t or "") for t in texts]
    lens = np.array([len(t) for t in cleaned], dtype=np.int64)
    n = int(lens.sum())
    out: list = [[] for _ in cleaned]
    if n == 0:
        return out

    def picks(hs: np.ndarray) -> np.ndarray:
        S = len(hs)
        if S == 0:
            return np.array([], np.uint64)
        if S <= g:
            m = hs.min()
            return np.array([m], np.uint64)
        from numpy.lib.stride_tricks import sliding_window_view

        wins = sliding_window_view(hs, g)
        m = wins.min(axis=1)
        rightmost = (g - 1) - np.argmax(wins[:, ::-1] == m[:, None],
                                        axis=1)
        sel = np.arange(S - g + 1, dtype=np.int64) + rightmost
        return hs[np.unique(sel)]

    def scalar_hashes(t: str) -> np.ndarray:
        cps = list(map(ord, t))
        wl = min(w, len(cps))
        h = 0
        for cp in cps[:wl]:
            h = (h * _B + cp) % _MOD
        hs = [h]
        if len(cps) > wl:
            pwv = pow(_B, wl - 1, _MOD)
            for k in range(wl, len(cps)):
                h = ((h - cps[k - wl] * pwv) * _B + cps[k]) % _MOD
                hs.append(h)
        return np.array(hs, np.uint64)

    short = np.flatnonzero((lens > 0) & (lens < w))
    for i in short:
        out[i] = sorted(set(picks(scalar_hashes(cleaned[i])).tolist()))
    big = np.flatnonzero(lens >= w)
    if not len(big):
        return out
    try:
        flat = "".join(cleaned).encode("utf-32-le")
    except UnicodeEncodeError:
        for i in big:
            out[i] = sorted(set(
                picks(scalar_hashes(cleaned[i])).tolist()))
        return out
    cps = np.frombuffer(flat, dtype=np.uint32).astype(np.uint64)
    hp = _flat_window_hashes(cps, n, w)
    doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    for i in big:
        s = int(doc_starts[i])
        hs = hp[s:s + int(lens[i]) - (w - 1)]
        out[i] = sorted(set(picks(hs).tolist()))
    return out
