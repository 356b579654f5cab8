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
    for w in set(bw):
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
    for v in set(verbs):
        add(_clean(f"verb_between={v}"))

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
        for w in set(bw):
            c = clusters.get(w)
            if c is not None:
                add(f"between_cluster={c}")
        c2 = clusters.get(obj_words[-1].lower()) if obj_words else None
        if c2 is not None:
            add(f"arg2_cluster={c2}")

    return feats
