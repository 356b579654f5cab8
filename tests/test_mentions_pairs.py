"""S3/S4: mention detection, pair generation semantics (distance cap,
overlap, dedupe, 150-token sentence cap), feature templates."""

from stanford_re_ray.fixtures import corpus_dictionaries
from stanford_re_ray.stages.features import featurize
from stanford_re_ray.stages.mentions import find_mentions
from stanford_re_ray.stages.nlp import annotate_document
from stanford_re_ray.stages.pairs import pairs_for_sentence

CD = corpus_dictionaries().compiled()


def _annot(text):
    return annotate_document(text, CD)[0]


def test_mentions_basic():
    r = _annot("John Smith was born in Paris in 1983.")
    ms = find_mentions(r["tokens"], r["pos"], r["ner"], r["antecedents"])
    surfaces = {(m.surface, m.ner, m.is_entity) for m in ms}
    assert ("John Smith", "PERSON", True) in surfaces
    assert ("Paris", "CITY", False) in surfaces
    assert ("1983", "DATE", False) in surfaces


def test_pronoun_mention_canonical():
    recs = annotate_document(
        "John Smith lives in Rome. He works as a professor at Acme Corporation.",
        CD,
    )
    r = recs[1]
    ms = find_mentions(r["tokens"], r["pos"], r["ner"], r["antecedents"])
    he = [m for m in ms if m.surface == "He"]
    assert he and he[0].canonical == "John Smith" and he[0].is_entity


def test_pairs_distance_and_dedupe():
    r = _annot("John Smith was born in Paris in 1983.")
    ps = pairs_for_sentence(r["tokens"], r["lemmas"], r["pos"], r["ner"],
                            r["antecedents"])
    keys = {(p["subj"], p["obj"]) for p in ps}
    assert ("John Smith", "Paris") in keys
    assert ("John Smith", "1983") in keys
    assert len(keys) == len(ps)  # deduped


def test_pairs_sentence_token_cap():
    long_sent = "John Smith saw " + " ".join(f"w{i}" for i in range(160)) + " in Paris."
    r = _annot(long_sent)
    assert pairs_for_sentence(r["tokens"], r["lemmas"], r["pos"], r["ner"],
                              r["antecedents"]) == []


def test_feature_templates():
    r = _annot("John Smith was born in Paris in 1983.")
    sb = (0, 2)
    ob = (r["tokens"].index("Paris"), r["tokens"].index("Paris") + 1)
    feats = featurize(r["tokens"], r["lemmas"], r["pos"], r["ner"],
                      sb, ob, "PERSON", "CITY")
    assert "arg1_type=PERSON" in feats
    assert "arg2_type=CITY" in feats
    assert "arg_types=PERSON--CITY" in feats
    assert "arg1_before_arg2=True" in feats
    assert "arg2_word=paris" in feats
    assert "between_word=born" in feats
    # subject arg is de-lexicalized (doNotLexicalizeFirstArg)
    assert not any(f.startswith("arg1_word") for f in feats)
    # whitespace-cleaned feature strings (postProcessFeature)
    assert all(" " not in f for f in feats)


def test_feature_cluster_templates():
    r = _annot("John Smith was born in Paris in 1983.")
    feats = featurize(r["tokens"], r["lemmas"], r["pos"], r["ner"],
                      (0, 2), (5, 6), "PERSON", "CITY",
                      clusters={"born": "7", "paris": "9"})
    assert "between_cluster=7" in feats
    assert "arg2_cluster=9" in feats


def test_nominal_org_coref_mention():
    """'the company' after an org mention resolves to the org and yields
    an ORGANIZATION coref mention."""
    from stanford_re_ray.stages.mentions import find_mentions
    from stanford_re_ray.stages.nlp import (DEFAULT_DICTIONARIES,
                                            annotate_document)

    cd = DEFAULT_DICTIONARIES.compiled()
    recs = annotate_document(
        "Giant Buying Corp hired Anna Smith. The company is large.", cd)
    second = recs[1]
    k = second["tokens"].index("company")
    assert second["antecedents"][k] == "Giant Buying Corp"
    ms = find_mentions(second["tokens"], second["pos"], second["ner"],
                       second["antecedents"])
    orgs = [m for m in ms if m.ner == "ORGANIZATION"]
    assert any(m.canonical == "Giant Buying Corp" for m in orgs)


def test_gold_scorer_memorizes(ray_session):
    import pyarrow as pa
    import ray

    from stanford_re_ray.stages.classify import (SCORE_SCALE, GoldScorer,
                                                 gold_lookup_from_triples)

    gold = pa.table({
        "subj": ["Ann Smith"], "pred": ["per:employee_of"],
        "obj": ["Acme Corp"],
    })
    ref = ray.put(gold_lookup_from_triples(gold))
    pairs = pa.table({
        "subj": ["Ann Smith", "Bo Kim"],
        "subj_type": ["PERSON", "PERSON"],
        "obj": ["Acme Corp", "Acme Corp"],
        "obj_type": ["ORGANIZATION", "ORGANIZATION"],
        "doc_id": ["d1", "d2"],
        "sent_idx": pa.array([0, 0], pa.int32()),
        "subj_begin": pa.array([0, 0], pa.int32()),
        "subj_end": pa.array([2, 2], pa.int32()),
        "obj_begin": pa.array([3, 3], pa.int32()),
        "obj_end": pa.array([5, 5], pa.int32()),
        "features": pa.array([[1], [2]], pa.list_(pa.int64())),
    })
    out = GoldScorer(ref)(pairs)
    assert out.num_rows == 1
    assert out.column("rel").to_pylist() == ["per:employee_of"]
    assert out.column("sum_q").to_pylist() == [SCORE_SCALE]


def test_doc_ner_stats(ray_session):
    import ray.data as rd

    from stanford_re_ray.fixtures import gen_corpus
    from stanford_re_ray.pipelines.kg import extract_stage, nlp_stage
    from stanford_re_ray.stages.nlp import doc_ner_stats

    fx = gen_corpus(10, per_lo=0, per_hi=20, org_lo=0, org_hi=10)
    sents = nlp_stage(extract_stage(rd.from_arrow(fx.pages)), fx.dicts)
    stats = doc_ner_stats(sents).to_pandas()
    assert set(stats.columns) == {"doc_id", "ner", "n"}
    assert (stats["n"] > 0).all()
    assert "PERSON" in set(stats["ner"])


# --- KB-fill alternate-value matching (RelationMentionAnnotator.java:104-205,
# 301-348, 407-466) ----------------------------------------------------------

def test_alternate_slot_values():
    from stanford_re_ray.stages.pairs import alternate_slot_values

    # date slot: bare year extracted only when the value carries more
    assert alternate_slot_values("August 4 1961", True, False) == ["1961"]
    assert alternate_slot_values("1961", True, False) == []
    assert alternate_slot_values("August 4 1961", False, False) == []
    # person slot: titles/suffixes stripped, middle name dropped
    assert alternate_slot_values("Dr. John Quincy Adams Jr.", False, True) \
        == ["John Adams"]
    assert alternate_slot_values("John Quincy Adams", False, True) \
        == ["John Adams"]
    # two tokens: nothing to drop
    assert alternate_slot_values("John Adams", False, True) == []
    # date AND person relation: both families
    assert alternate_slot_values("John Quincy Adams 1961 Story", True, True) \
        == ["1961", "John Story"]


def test_match_fill_in_tokens():
    from stanford_re_ray.stages.pairs import match_fill_in_tokens

    toks = "He was born on August 4 1961 in Hawaii".split()
    mask = [False] * len(toks)
    # full value present -> exact match, absorbed; alternate can't rematch
    out = match_fill_in_tokens(toks, mask, "August 4 1961", True, False)
    assert out == [(4, 7, True)]
    # only the year present -> alternate (non-exact) match
    toks2 = "He was born in 1961 in Hawaii".split()
    out2 = match_fill_in_tokens(toks2, [False] * len(toks2),
                                "August 4 1961", True, False)
    assert out2 == [(4, 5, False)]
    # entity mask blocks matches inside entity spans
    out3 = match_fill_in_tokens(toks2, [False] * 4 + [True] + [False] * 2,
                                "August 4 1961", True, False)
    assert out3 == []
    # person alternate: first+last matches when middle name absent in text
    toks4 = "The firm of John Smith closed".split()
    out4 = match_fill_in_tokens(toks4, [False] * len(toks4),
                                "John Quincy Smith", False, True)
    assert out4 == [(3, 5, False)]


def test_pairs_alternate_value_recovers_triple(ray_session):
    """A distant-supervision positive only recoverable via the year-only
    alternate: '1961' is NER-'O' so discovery finds no object mention at
    all; KB-fill matching must create the pair with the KB's canonical
    value so the labeler's exact lookup hits."""
    import pyarrow as pa

    from stanford_re_ray.stages.pairs import kb_fills_lookup, pairs_for_sentence

    tokens = "Barack Obama was born on 1961 in Honolulu".split()
    ner = ["PERSON", "PERSON", "O", "O", "O", "O", "O", "O"]
    pos = ["NNP", "NNP", "VBD", "VBN", "IN", "CD", "IN", "NNP"]
    lemmas = [t.lower() for t in tokens]
    antes = [""] * len(tokens)
    kb = pa.table({
        "entity_id": ["e1"],
        "entity_name": ["Barack Obama"],
        "rel": ["per:date_of_birth"],
        "slot_value": ["August 4 1961"],
    })
    fills = kb_fills_lookup(kb)
    assert fills == {"barack obama": [("August 4 1961", True, False)]}

    without = pairs_for_sentence(tokens, lemmas, pos, ner, antes, hashed=True)
    assert without == []    # no non-subject mention -> nothing to pair

    with_kb = pairs_for_sentence(tokens, lemmas, pos, ner, antes,
                                 hashed=True, kb_fills=fills)
    assert len(with_kb) == 1
    p = with_kb[0]
    assert p["subj"] == "Barack Obama"
    assert p["obj"] == "August 4 1961"   # normalized to the KB value
    assert (p["obj_begin"], p["obj_end"]) == (5, 6)
    assert p["obj_type"] == "MISC"       # no NER votes on the span
    assert p["features"]


def test_pairs_person_alternate_absorbs_discovery(ray_session):
    """First+last alternate: the matched span replaces the NER-discovered
    'John Smith' object for the same subject (absorption), and the pair
    carries the KB's full canonical value."""
    import pyarrow as pa

    from stanford_re_ray.stages.pairs import kb_fills_lookup, pairs_for_sentence

    tokens = "Acme Corp was founded by John Smith".split()
    ner = ["ORGANIZATION", "ORGANIZATION", "O", "O", "O", "PERSON", "PERSON"]
    pos = ["NNP", "NNP", "VBD", "VBN", "IN", "NNP", "NNP"]
    lemmas = [t.lower() for t in tokens]
    antes = [""] * len(tokens)
    kb = pa.table({
        "entity_id": ["e1"],
        "entity_name": ["Acme Corp"],
        "rel": ["org:founded_by"],
        "slot_value": ["John Quincy Smith"],
    })
    with_kb = pairs_for_sentence(tokens, lemmas, pos, ner, antes,
                                 hashed=True, kb_fills=kb_fills_lookup(kb))
    by_subj = {(p["subj"], p["obj"]): p for p in with_kb}
    # KB pair with the canonical value; voted NE type from the span
    kb_pair = by_subj[("Acme Corp", "John Quincy Smith")]
    assert (kb_pair["obj_begin"], kb_pair["obj_end"]) == (5, 7)
    assert kb_pair["obj_type"] == "PERSON"
    # the raw discovery pair for the same subject+span is absorbed
    assert ("Acme Corp", "John Smith") not in by_subj
    # the reverse-direction discovery pair (other subject) is unaffected
    assert ("John Smith", "Acme Corp") in by_subj
