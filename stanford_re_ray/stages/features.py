"""Feature-template engine — the FeatureFactory analog.

A pure function of (sentence annotations, subject span, object span) →
``list[str]`` sparse binary features, mirroring the reference's production
feature set (``scripts/config/base.conf:49-60``; implementations at
``kbp/sf/process/FeatureFactory.java:98-973``):

  arg_words, arg_cluster, arg_type, arg_order, surface_distance_binary,
  surface_distance_bins, adjacent_words, adjacent_clusters,
  entities_between_args, entity_counts_binary, entity_counts_bins,
  span_words_unigrams, span_clusters_unigrams.

The reference's dependency-path templates (``dependency_path_lowlevel``,
``dependency_path_words``, ``full_tree_path`` — FeatureFactory.java:654-973)
require a parser; this engine has a deterministic model-free NLP stack, so
they are replaced by a *surface-path surrogate*: the POS sequence and the
verb/preposition lemma sequence between the args (the information the
dependency path carries for adjacent-clause relations).  Feature strings are
whitespace-cleaned exactly like ``postProcessFeature``
(FeatureFactory.java:136-141).

The subject arg is de-lexicalized (its type is used, never its words) —
``doNotLexicalizeFirstArg``, kbp/sf/process/KBPProcess.java:63-64.
"""

from __future__ import annotations

import re

_WS = re.compile(r"\s+")


def _clean(f: str) -> str:
    return _WS.sub("_", f.strip())


def _dist_bin(d: int) -> str:
    if d <= 0:
        return "0"
    if d == 1:
        return "1"
    if d == 2:
        return "2"
    if d <= 5:
        return "3-5"
    if d <= 10:
        return "6-10"
    return "11+"


def featurize(
    tokens: list[str],
    lemmas: list[str],
    pos: list[str],
    ner: list[str],
    subj_span: tuple[int, int],
    obj_span: tuple[int, int],
    subj_type: str,
    obj_type: str,
    clusters: dict[str, str] | None = None,
) -> list[str]:
    """Create the sparse feature vector for one relation-mention candidate."""
    sb, se = subj_span
    ob, oe = obj_span
    feats: list[str] = []
    add = feats.append

    # arg_type (FeatureFactory.java:175-180)
    add(f"arg1_type={subj_type}")
    add(f"arg2_type={obj_type}")
    add(f"arg_types={subj_type}--{obj_type}")
    # arg_order (183-186)
    add(f"arg1_before_arg2={sb < ob}")

    # arg_words (345-351): first arg de-lexicalized
    obj_words = tokens[ob:oe]
    add(_clean(f"arg2_word={' '.join(w.lower() for w in obj_words)}"))
    add(_clean(f"arg2_head={obj_words[-1].lower() if obj_words else ''}"))
    # arg_POS (363-369)
    add(f"arg2_pos={'_'.join(pos[ob:oe])}")

    # surface distance (294-340 window features + distance bins)
    if se <= ob:
        between = range(se, ob)
        dist = ob - se
    elif oe <= sb:
        between = range(oe, sb)
        dist = sb - oe
    else:
        between = range(0, 0)
        dist = 0
    add(f"surface_distance_binary={dist <= 4}")
    add(f"surface_distance_bin={_dist_bin(dist)}")

    # adjacent_words (372-399): token immediately left/right of each arg
    def _tok(i: int) -> str:
        return tokens[i].lower() if 0 <= i < len(tokens) else "<PAD>"

    add(_clean(f"arg1_left={_tok(sb - 1)}"))
    add(_clean(f"arg1_right={_tok(se)}"))
    add(_clean(f"arg2_left={_tok(ob - 1)}"))
    add(_clean(f"arg2_right={_tok(oe)}"))

    # span words between args: unigrams + bigrams (493-522)
    bw = [lemmas[i] for i in between]
    # dict.fromkeys = order-preserving dedup: set() iteration order is
    # per-process hash-randomized (violates the determinism policy)
    for w in dict.fromkeys(bw):
        add(_clean(f"between_word={w}"))
    for a, b in zip(bw, bw[1:]):
        add(_clean(f"between_bigram={a}_{b}"))
    if not bw:
        add("between_empty=true")

    # surface-path surrogate for dependency_path_* (654-973): POS sequence
    # and verb/prep lemma path between the args, with direction
    direction = ">" if sb < ob else "<"
    pos_path = "_".join(pos[i] for i in between)
    add(_clean(f"surface_path={direction}:{pos_path}"))
    vp = [lemmas[i] for i in between if pos[i] in ("VB", "IN")]
    add(_clean(f"verb_prep_path={direction}:{'_'.join(vp)}"))
    verbs = [lemmas[i] for i in between if pos[i] == "VB"]
    for v in dict.fromkeys(verbs):
        add(_clean(f"verb_between={v}"))

    # pseudo-dependency path over shallow chunks (string twin of
    # the featurize_ids mid-section — FeatureFactory.java:654-973 family)
    lo_, hi_ = (between[0], between[-1] + 1) if between else (0, 0)
    chunks = chunk_path(tokens, lemmas, pos, lo_, hi_)
    if chunks:
        roles = [c[0] for c in chunks]
        units = [r + ":" + h for r, h, _ in chunks]
        add(_clean(f"dep_path={direction}:{'_'.join(roles)}"))
        add(_clean(f"dep_path_lowlevel={direction}:{'_'.join(units)}"))
        for r, h, p2 in chunks:
            add(_clean(f"word_in_dep_path={h}"))
            add(f"pos_in_dep_path={p2}")
        for a, b2 in zip(units, units[1:]):
            add(_clean(f"dep_path_2gram={a}_{b2}"))
        for k, (r, h, _p) in enumerate(chunks):
            if r != "V":
                continue
            left, right = roles[:k], roles[k + 1:]
            add(_clean(f"dep_path_to_verb_left={direction}:{'_'.join(left)}:{h}"))
            add(_clean(f"dep_path_to_verb_right={direction}:{h}:{'_'.join(right)}"))
            add(_clean(
                f"dep_path_to_verb_both={direction}:{'_'.join(left)}:{h}:{'_'.join(right)}"))
            first = roles[0] if k > 0 else "-"
            last = roles[-1] if k < len(chunks) - 1 else "-"
            add(_clean(f"dep_stub_left={first}:{h}"))
            add(_clean(f"dep_stub_right={h}:{last}"))
            add(_clean(f"dep_stub_both={first}:{h}:{last}"))
        if clusters:
            for _r, h, _p in chunks:
                c = clusters.get(h)
                if c is not None:
                    add(f"cluster_in_dep_path={c}")

    # entities_between_args / entity_counts (404-449)
    ents_between = 0
    k = min(se, oe)
    end = max(sb, ob)
    i = k
    while i < end:
        if ner[i] not in ("O",) and not (sb <= i < se) and not (ob <= i < oe):
            ents_between += 1
            tag = ner[i]
            while i < end and ner[i] == tag:
                i += 1
        else:
            i += 1
    add(f"entity_between_args={ents_between > 0}")
    add(f"entity_counts_bin={_dist_bin(ents_between)}")

    # arg2_number / arg2_date specials (524-563)
    if obj_type == "NUMBER":
        add(f"arg2_number_digits={sum(c.isdigit() for c in ' '.join(obj_words))}")
    if obj_type == "DATE":
        add(f"arg2_date_is_year={bool(re.fullmatch(r'(1[6-9]|20)dd'.replace('dd', r'[0-9][0-9]'), obj_words[0])) if obj_words else False}")

    # cluster features (354-360, 380-399, 505-522) when a word→cluster map
    # (the egw4-reut.512.clusters analog) is provided
    if clusters:
        for w in dict.fromkeys(bw):
            c = clusters.get(w)
            if c is not None:
                add(f"between_cluster={c}")
        c2 = clusters.get(obj_words[-1].lower()) if obj_words else None
        if c2 is not None:
            add(f"arg2_cluster={c2}")

    return feats


# ---------------------------------------------------------------------------
# String-free featurization (production path)
# ---------------------------------------------------------------------------
# Same template set as ``featurize`` above, but feature ids are computed by
# running crc32 over (template tag, value parts) without ever materializing
# the feature STRING: ~30 transient str allocations per pair (tens of
# millions per 100k pages) were a measured memory-bandwidth drag at high
# core counts.  Ids land in the same 2**18 space the scorer/trainer use.
# Feature IDENTITY differs from the string form — models must be trained
# and scored with the same featurizer (both paths are deterministic).

import zlib as _zlib

_D = 1 << 18


def _tag(name: str) -> int:
    return _zlib.crc32(name.encode())


_T_ARG1_TYPE = _tag("arg1_type=")
_T_ARG2_TYPE = _tag("arg2_type=")
_T_ARG_TYPES = _tag("arg_types=")
_T_ORDER = _tag("arg1_before_arg2=")
_T_ARG2_WORD = _tag("arg2_word=")
_T_ARG2_HEAD = _tag("arg2_head=")
_T_ARG2_POS = _tag("arg2_pos=")
_T_DIST_BIN = _tag("surface_distance_binary=")
_T_DIST_BINS = _tag("surface_distance_bin=")
_T_A1L = _tag("arg1_left=")
_T_A1R = _tag("arg1_right=")
_T_A2L = _tag("arg2_left=")
_T_A2R = _tag("arg2_right=")
_T_BETW = _tag("between_word=")
_T_BETW2 = _tag("between_bigram=")
_T_BETW_EMPTY = _tag("between_empty=true")
_T_SPATH = _tag("surface_path=")
_T_VPPATH = _tag("verb_prep_path=")
_T_VERB = _tag("verb_between=")
_T_ENT_BETW = _tag("entity_between_args=")
_T_ENT_BINS = _tag("entity_counts_bin=")
_T_NUM_DIGITS = _tag("arg2_number_digits=")
_T_DATE_YEAR = _tag("arg2_date_is_year=")
_T_BCLUST = _tag("between_cluster=")
_T_A2CLUST = _tag("arg2_cluster=")

# shallow-chunk pseudo-dependency templates (FeatureFactory.java:654-973:
# dependency_path, dependency_path_lowlevel, dependency_paths_to_verb,
# dependency_path_stubs_to_verb, verb_in_dependency_path,
# dependency_path_words, dependency_path_POS_unigrams,
# dependency_path_clusters, dependency_path n-grams — re-expressed over a
# deterministic shallow chunker instead of a statistical parser)
_T_DPATH = _tag("dep_path=")
_T_DPATH_LOW = _tag("dep_path_lowlevel=")
_T_DVERB_L = _tag("dep_path_to_verb_left=")
_T_DVERB_R = _tag("dep_path_to_verb_right=")
_T_DVERB_B = _tag("dep_path_to_verb_both=")
_T_DSTUB_L = _tag("dep_stub_left=")
_T_DSTUB_R = _tag("dep_stub_right=")
_T_DSTUB_B = _tag("dep_stub_both=")
_T_DWORD = _tag("word_in_dep_path=")
_T_DPOS = _tag("pos_in_dep_path=")
_T_DCLUST = _tag("cluster_in_dep_path=")
_T_DNGRAM = _tag("dep_path_2gram=")

_NOMINAL_POS = ("NN", "NNP", "PRP", "CD")

# --- hot-path id machinery --------------------------------------------------
# The pairs stage is the single most expensive map of the KG pipeline
# (~480µs/doc/core of ~1000µs/doc total), and ~38 feature ids are emitted
# per candidate pair.  Three identity-preserving shortcuts (crc32 is a
# streaming checksum: crc(part, tag) == crc chained over (tag, part), so
# every path below produces bit-identical ids to the generic _fid form —
# pinned by tests/test_featurize_identity.py):
#   1. constant-domain templates (arg order, distance bins, entity bins,
#      date-is-year) get their ids precomputed at import — no hashing at
#      batch time at all;
#   2. single-part templates go through a per-template dict keyed by the
#      part string (its hash is already cached on the str object) — one
#      probe instead of a varargs pack + tuple alloc + tuple hash;
#   3. multi-part templates keep the generic memoized _fid.

_crc = _zlib.crc32
_C_MAX = 1 << 16


def _cid(cache: dict, tag: int, part: str) -> int:
    """Single-part feature id via a per-template cache (see above)."""
    v = cache.get(part)
    if v is None:
        if len(cache) >= _C_MAX:
            cache.clear()
        v = cache[part] = _crc(part.encode("utf-8", "surrogatepass"),
                               tag) % _D
    return v


_C_ARG1_TYPE: dict = {}
_C_ARG2_TYPE: dict = {}
_C_ARG_TYPES: dict = {}          # keyed (subj_type, obj_type)
_C_ARG2_WORD: dict = {}
_C_ARG2_HEAD: dict = {}
_C_ARG2_POS: dict = {}
_C_A1L: dict = {}
_C_A1R: dict = {}
_C_A2L: dict = {}
_C_A2R: dict = {}
_C_BETW: dict = {}
_C_VERB: dict = {}
_C_NUMD: dict = {}
_C_BCLUST: dict = {}
_C_A2CLUST: dict = {}
_C_DWORD: dict = {}
_C_DPOS: dict = {}
_C_DCLUST: dict = {}


def chunk_path(tokens: list, lemmas: list, pos: list,
               lo: int, hi: int) -> list[tuple[str, str, str]]:
    """Deterministic shallow-chunk pseudo-dependency path over
    ``tokens[lo:hi]`` (the span between the two argument heads): maximal
    verb groups (VB runs, head = last verb's lemma), noun chunks
    (DT/JJ/nominal runs, head = last nominal's lemma), prepositions and
    conjunctions as single-link chunks.  Returns ``[(role, head_lemma,
    head_pos)]`` with roles V/N/P/C — the surrogate for the reference's
    shortest-dependency-path node sequence (FeatureFactory.java:654-700;
    no statistical parser in this engine, so chunk heads stand in for
    syntactic heads — the SURVEY §7.2 rule-based-surrogate posture)."""
    out: list[tuple[str, str, str]] = []
    i = lo
    while i < hi:
        p = pos[i]
        if p == "VB":
            j, head = i, i
            while j < hi and pos[j] == "VB":
                head = j
                j += 1
            out.append(("V", lemmas[head], pos[head]))
            i = j
        elif p in ("DT", "JJ") or p in _NOMINAL_POS:
            j, head = i, -1
            while j < hi and (pos[j] in ("DT", "JJ") or pos[j] in _NOMINAL_POS):
                if pos[j] in _NOMINAL_POS:
                    head = j
                j += 1
            if head >= 0:
                out.append(("N", lemmas[head], pos[head]))
            i = j
        elif p == "IN":
            out.append(("P", lemmas[i], "IN"))
            i += 1
        elif p == "CC":
            out.append(("C", lemmas[i], "CC"))
            i += 1
        else:
            i += 1
    return out


#: memo for the CLUSTER-INDEPENDENT dep-surrogate id sequence keyed on
#: (direction, chunks): between-span chunk paths are Zipfian (common
#: phrase shapes recur across pairs and sentences), and the whole ~10-id
#: emission is a pure function of the key — one dict probe replaces a
#: dozen _fid varargs calls on a hit.  Cluster features are NOT cached
#: (the clusters mapping's identity isn't part of the key by design —
#: caching them would make results depend on dict identity reuse).
_DEP_CACHE: dict = {}
_DEP_CACHE_MAX = 1 << 16

#: memo for the entire cluster-independent mid-section of
#: ``featurize_ids`` keyed on (direction, between-lemmas, between-POS)
#: — see the inline rationale there.  Value: (ids, chunk_heads,
#: deduped_between_lemmas).  Bounded per worker like the other caches.
_MID_CACHE: dict = {}
_MID_CACHE_MAX = 1 << 16


def _dep_ids_uncached(add, chunks, direction) -> None:
    roles = []
    units = []
    for r, h, _p in chunks:
        roles.append(r)
        units.append(r + ":" + h)
    add(_fid(_T_DPATH, direction, *roles))
    add(_fid(_T_DPATH_LOW, direction, *units))
    for _r, h, p2 in chunks:
        add(_cid(_C_DWORD, _T_DWORD, h))
        add(_cid(_C_DPOS, _T_DPOS, p2))
    for a, b2 in zip(units, units[1:]):
        add(_fid(_T_DNGRAM, a, "_", b2))
    n = len(chunks)
    for k, (r, h, _p) in enumerate(chunks):
        if r != "V":
            continue
        left = roles[:k]
        right = roles[k + 1:]
        add(_fid(_T_DVERB_L, direction, *left, h))
        add(_fid(_T_DVERB_R, direction, h, *right))
        add(_fid(_T_DVERB_B, direction, *left, h, *right))
        first = roles[0] if k > 0 else "-"
        last = roles[-1] if k < n - 1 else "-"
        add(_fid(_T_DSTUB_L, first, h))
        add(_fid(_T_DSTUB_R, h, last))
        add(_fid(_T_DSTUB_B, first, h, last))


#: memo for _fid: feature values are Zipfian (lemma/POS/role vocabularies),
#: so the same (template, parts) tuples recur constantly; Python interns
#: str hashes after first use, making the tuple lookup far cheaper than
#: re-running the crc chain + utf-8 encodes.  Bounded per worker process.
_FID_CACHE: dict = {}
_FID_CACHE_MAX = 1 << 17


def _fid(base: int, *parts: str) -> int:
    key = (base, parts)
    v = _FID_CACHE.get(key)
    if v is None:
        c = base
        for p in parts:
            c = _zlib.crc32(p.encode("utf-8", "surrogatepass"), c)
        v = c % _D
        if len(_FID_CACHE) >= _FID_CACHE_MAX:
            _FID_CACHE.clear()
        _FID_CACHE[key] = v
    return v


# constant-domain id tables (never hash at batch time; identity pinned by
# tests/test_featurize_identity.py)
_ID_ORDER_T = _fid(_T_ORDER, "T")
_ID_ORDER_F = _fid(_T_ORDER, "F")
_ID_DISTB_T = _fid(_T_DIST_BIN, "T")
_ID_DISTB_F = _fid(_T_DIST_BIN, "F")
_BINS = ("0", "1", "2", "3-5", "6-10", "11+")
_ID_DIST_BINS = {b: _fid(_T_DIST_BINS, b) for b in _BINS}
_ID_ENT_BETW_T = _fid(_T_ENT_BETW, "T")
_ID_ENT_BETW_F = _fid(_T_ENT_BETW, "F")
_ID_ENT_BINS = {b: _fid(_T_ENT_BINS, b) for b in _BINS}
_ID_DATE_T = _fid(_T_DATE_YEAR, "T")
_ID_DATE_F = _fid(_T_DATE_YEAR, "F")
_ID_BETW_EMPTY = _T_BETW_EMPTY % _D


def featurize_ids(
    tokens: list[str],
    lemmas: list[str],
    pos: list[str],
    ner: list[str],
    subj_span: tuple[int, int],
    obj_span: tuple[int, int],
    subj_type: str,
    obj_type: str,
    clusters: dict[str, str] | None = None,
) -> list[int]:
    """Hashed feature ids for one relation-mention candidate (same template
    coverage as ``featurize``; see module docstring for the contract).
    Bit-identical to the generic chained-crc form — the per-template
    caches and constant tables above are pure-speed rewrites."""
    sb, se = subj_span
    ob, oe = obj_span
    out: list[int] = []
    add = out.append

    add(_cid(_C_ARG1_TYPE, _T_ARG1_TYPE, subj_type))
    add(_cid(_C_ARG2_TYPE, _T_ARG2_TYPE, obj_type))
    tkey = (subj_type, obj_type)
    v = _C_ARG_TYPES.get(tkey)
    if v is None:
        v = _C_ARG_TYPES[tkey] = _fid(_T_ARG_TYPES, subj_type, "--",
                                      obj_type)
    add(v)
    add(_ID_ORDER_T if sb < ob else _ID_ORDER_F)

    obj_words = tokens[ob:oe]
    low_obj = [w.lower() for w in obj_words]
    if len(low_obj) == 1:
        add(_cid(_C_ARG2_WORD, _T_ARG2_WORD, low_obj[0]))
    else:
        add(_fid(_T_ARG2_WORD, *low_obj))
    add(_cid(_C_ARG2_HEAD, _T_ARG2_HEAD, low_obj[-1] if low_obj else ""))
    pos_obj = pos[ob:oe]
    if len(pos_obj) == 1:
        add(_cid(_C_ARG2_POS, _T_ARG2_POS, pos_obj[0]))
    else:
        add(_fid(_T_ARG2_POS, *pos_obj))

    if se <= ob:
        lo, hi, dist = se, ob, ob - se
    elif oe <= sb:
        lo, hi, dist = oe, sb, sb - oe
    else:
        lo, hi, dist = 0, 0, 0
    add(_ID_DISTB_T if dist <= 4 else _ID_DISTB_F)
    add(_ID_DIST_BINS[_dist_bin(dist)])

    n = len(tokens)
    add(_cid(_C_A1L, _T_A1L, tokens[sb - 1].lower() if sb > 0 else "<PAD>"))
    add(_cid(_C_A1R, _T_A1R, tokens[se].lower() if se < n else "<PAD>"))
    add(_cid(_C_A2L, _T_A2L, tokens[ob - 1].lower() if ob > 0 else "<PAD>"))
    add(_cid(_C_A2R, _T_A2R, tokens[oe].lower() if oe < n else "<PAD>"))

    direction = ">" if sb < ob else "<"
    # The whole mid-section — between unigrams/bigrams, surface path,
    # verb/prep path, verb unigrams, and the non-cluster dep-surrogate
    # family — is a pure function of (direction, between-lemmas,
    # between-POS): ``chunk_path`` never reads ``tokens``.  Phrase shapes
    # are Zipfian across pairs (the _DEP_CACHE rationale, one level up),
    # so a single two-tuple probe replaces ~40 per-pair id computations
    # on a hit.  Cluster-dependent ids stay OUT of the cache (same
    # policy as _DEP_CACHE): the cached entry carries the chunk heads
    # and deduped between-lemmas so cluster lookups run per call.
    mkey = (direction, tuple(lemmas[lo:hi]), tuple(pos[lo:hi]))
    ent = _MID_CACHE.get(mkey)
    if ent is None:
        bw, pos_bw = mkey[1], mkey[2]
        mids: list[int] = []
        madd = mids.append
        # order-preserving dedup (set iteration is hash-randomized per
        # process)
        uw = tuple(dict.fromkeys(bw)) if bw else ()
        for w in uw:
            # inlined _cid: this is the hottest single-part loop
            v = _C_BETW.get(w)
            if v is None:
                if len(_C_BETW) >= _C_MAX:
                    _C_BETW.clear()
                v = _C_BETW[w] = _crc(w.encode("utf-8", "surrogatepass"),
                                      _T_BETW) % _D
            madd(v)
        if len(bw) > 1:
            for a, b in zip(bw, bw[1:]):
                madd(_fid(_T_BETW2, a, "_", b))
        if not bw:
            madd(_ID_BETW_EMPTY)

        madd(_fid(_T_SPATH, direction, *pos_bw))
        vp: list[str] = []
        verbs: list[str] = []
        for p_, l_ in zip(pos_bw, bw):
            if p_ == "VB":
                vp.append(l_)
                verbs.append(l_)
            elif p_ == "IN":
                vp.append(l_)
        madd(_fid(_T_VPPATH, direction, *vp))
        for v_ in dict.fromkeys(verbs):
            madd(_cid(_C_VERB, _T_VERB, v_))

        # pseudo-dependency path over shallow chunks (FeatureFactory.java
        # :654-973 template family), cluster ids excluded
        chunks = chunk_path(tokens, lemmas, pos, lo, hi)
        heads = tuple(h for _r, h, _p in chunks)
        if chunks:
            dkey = (direction, tuple(chunks))
            ids = _DEP_CACHE.get(dkey)
            if ids is None:
                ids = []
                _dep_ids_uncached(ids.append, chunks, direction)
                if len(_DEP_CACHE) >= _DEP_CACHE_MAX:
                    _DEP_CACHE.clear()
                _DEP_CACHE[dkey] = ids
            mids.extend(ids)
        if len(_MID_CACHE) >= _MID_CACHE_MAX:
            _MID_CACHE.clear()
        ent = _MID_CACHE[mkey] = (mids, heads, uw)
    mids, heads, uw = ent
    out.extend(mids)
    if clusters:
        for h in heads:
            c = clusters.get(h)
            if c is not None:
                add(_cid(_C_DCLUST, _T_DCLUST, c))

    ents_between = 0
    i = min(se, oe)
    end = max(sb, ob)
    while i < end:
        if ner[i] != "O" and not (sb <= i < se) and not (ob <= i < oe):
            ents_between += 1
            tag = ner[i]
            while i < end and ner[i] == tag:
                i += 1
        else:
            i += 1
    add(_ID_ENT_BETW_T if ents_between > 0 else _ID_ENT_BETW_F)
    add(_ID_ENT_BINS[_dist_bin(ents_between)])

    if obj_type == "NUMBER":
        nd = sum(c.isdigit() for w in obj_words for c in w)
        add(_cid(_C_NUMD, _T_NUM_DIGITS, str(nd)))
    if obj_type == "DATE":
        is_year = bool(obj_words) and len(obj_words[0]) == 4 and \
            obj_words[0].isdigit()
        add(_ID_DATE_T if is_year else _ID_DATE_F)

    if clusters:
        for w in uw:
            c = clusters.get(w)
            if c is not None:
                add(_cid(_C_BCLUST, _T_BCLUST, c))
        if low_obj:
            c2 = clusters.get(low_obj[-1])
            if c2 is not None:
                add(_cid(_C_A2CLUST, _T_A2CLUST, c2))
    return out
