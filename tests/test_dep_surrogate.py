"""Shallow-chunk pseudo-dependency templates (the FeatureFactory.java
:654-973 dependency-path surrogate): chunking, head finding, and the
verb-linking templates on hand-built sentences."""

from stanford_re_ray.stages.features import (chunk_path, featurize,
                                             featurize_ids)


def _sent(words_pos):
    tokens = [w for w, _ in words_pos]
    pos = [p for _, p in words_pos]
    lemmas = [w.lower() for w, _ in words_pos]
    # crude verb lemma like nlp._lemma_of
    for i, p in enumerate(pos):
        if p == "VB" and lemmas[i].endswith("ed") and len(lemmas[i]) > 4:
            lemmas[i] = lemmas[i][:-2]
    ner = ["O"] * len(tokens)
    return tokens, lemmas, pos, ner


def test_chunk_path_verb_group_and_np_heads():
    # "Ann Smith was founded by the great Acme Corp" (nonsense but POS-real)
    tokens, lemmas, pos, _ = _sent([
        ("was", "VB"), ("founded", "VB"), ("by", "IN"),
        ("the", "DT"), ("great", "JJ"), ("board", "NN"),
    ])
    chunks = chunk_path(tokens, lemmas, pos, 0, len(tokens))
    # verb group collapses to ONE chunk headed by the last verb's lemma
    assert chunks[0] == ("V", "found", "VB")
    assert chunks[1] == ("P", "by", "IN")
    # noun chunk headed by the last nominal, determiner/adjective absorbed
    assert chunks[2] == ("N", "board", "NN")


def test_chunk_path_skips_headless_chunks():
    tokens, lemmas, pos, _ = _sent([("the", "DT"), ("great", "JJ")])
    assert chunk_path(tokens, lemmas, pos, 0, 2) == []


def test_dep_templates_distinguish_structure():
    """Two spans with the SAME word bag but different chunk structure must
    produce different dep-path features (the surface bag features alone
    cannot tell them apart)."""
    # "works for" (V P) vs "for works" (P V) — e.g. "the for works
    # department" word-salad; same bag, different order
    a = _sent([("works", "VB"), ("for", "IN")])
    b = _sent([("for", "IN"), ("works", "VB")])
    fa = set(featurize(a[0], a[1], a[2], a[3], (0, 0), (2, 2),
                       "PERSON", "ORGANIZATION"))
    fb = set(featurize(b[0], b[1], b[2], b[3], (0, 0), (2, 2),
                       "PERSON", "ORGANIZATION"))
    da = {f for f in fa if f.startswith("dep_path=")}
    db = {f for f in fb if f.startswith("dep_path=")}
    assert da and db and da != db


def test_verb_linking_templates_present():
    tokens, lemmas, pos, ner = _sent([
        ("Ann", "NNP"), ("works", "VB"), ("for", "IN"), ("Acme", "NNP"),
    ])
    feats = featurize(tokens, lemmas, pos, ner, (0, 1), (3, 4),
                      "PERSON", "ORGANIZATION")
    names = {f.split("=")[0] for f in feats}
    assert {"dep_path", "dep_path_lowlevel", "word_in_dep_path",
            "pos_in_dep_path", "dep_path_to_verb_left", "dep_stub_both"} \
        <= names
    # the hashed production path emits MORE ids than before (the dep
    # family) and stays deterministic
    ids1 = featurize_ids(tokens, lemmas, pos, ner, (0, 1), (3, 4),
                         "PERSON", "ORGANIZATION")
    ids2 = featurize_ids(tokens, lemmas, pos, ner, (0, 1), (3, 4),
                         "PERSON", "ORGANIZATION")
    assert ids1 == ids2
    assert len(ids1) >= len(feats) - 5  # template parity within reason
