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
