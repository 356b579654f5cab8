"""S2 NLP stack: tokenizer, ssplit, NER dictionaries, coref surrogate."""

from stanford_re_ray.fixtures import corpus_dictionaries
from stanford_re_ray.stages.nlp import (
    annotate_document,
    split_sentences,
    tokenize,
)

CD = corpus_dictionaries().compiled()


def test_ssplit_and_tokenize():
    text = "John Smith lives in Paris. He works hard.\nNew line here."
    sents = split_sentences(text)
    assert len(sents) == 3
    assert tokenize("John Smith was born in 1983.") == [
        "John", "Smith", "was", "born", "in", "1983", "."
    ]
    # URLs keep trailing punctuation out of the token
    assert tokenize("See http://a.example.com/x.") == [
        "See", "http://a.example.com/x", "."
    ]


def test_ner_dictionary_and_heuristics():
    recs = annotate_document(
        "Mary Johnson was born in Paris in 1984. "
        "She works as a professor at Acme Corporation.",
        CD,
    )
    s0, s1 = recs[0], recs[1]
    assert s0["ner"][:2] == ["PERSON", "PERSON"]
    assert s0["ner"][s0["tokens"].index("Paris")] == "CITY"
    assert s0["ner"][s0["tokens"].index("1984")] == "DATE"
    assert s1["ner"][s1["tokens"].index("professor")] == "TITLE"
    assert s1["ner"][s1["tokens"].index("Acme")] == "ORGANIZATION"


def test_coref_pronoun_topic_preference():
    recs = annotate_document(
        "Mary Johnson is married to David Johnson. She lives in Rome.",
        CD,
    )
    she = recs[1]
    assert she["antecedents"][0] == "Mary Johnson"  # topic, not recency


def test_coref_bare_surname_prefers_topic():
    recs = annotate_document(
        "Mary Johnson is married to David Johnson. Johnson lives in Rome.",
        CD,
    )
    s1 = recs[1]
    assert s1["ner"][0] == "PERSON"
    assert s1["antecedents"][0] == "Mary Johnson"


def test_long_doc_sentence_cap():
    text = " ".join(f"Sentence number {i}." for i in range(600))
    recs = annotate_document(text, CD, max_sentences=512)
    assert len(recs) <= 512


def test_actor_pool_mode_matches_task_mode(ray_session):
    """nlp_stage(mode='actors') — the CoreNLP-style actor pool — must
    produce exactly the rows of the default task-pool mode."""
    import ray.data as rd

    from stanford_re_ray.fixtures import corpus_dictionaries, gen_corpus
    from stanford_re_ray.pipelines.kg import extract_stage, nlp_stage

    corpus = gen_corpus(40, per_lo=0, per_hi=100, org_lo=0, org_hi=60)
    pages = rd.from_arrow(corpus.pages).repartition(4)
    d = corpus_dictionaries()

    def canon(ds):
        df = ds.to_pandas()
        df["tokens"] = df["tokens"].map(tuple)
        df["ner"] = df["ner"].map(tuple)
        return (df[["doc_id", "sent_idx", "text", "tokens", "ner"]]
                .sort_values(["doc_id", "sent_idx"])
                .reset_index(drop=True))

    tasks = canon(nlp_stage(extract_stage(pages), d, mode="tasks"))
    actors = canon(nlp_stage(extract_stage(pages), d, mode="actors",
                             concurrency=(1, 2)))
    import pandas as pd

    pd.testing.assert_frame_equal(tasks, actors)


def test_acronym_coref_links_to_full_org():
    """PostIRAnnotator acronym matching analog: a bare acronym of an org
    seen earlier in the doc antecedent-links to the full name."""
    from stanford_re_ray.stages.nlp import (DEFAULT_DICTIONARIES,
                                            annotate_document)

    cd = DEFAULT_DICTIONARIES.compiled()
    recs = annotate_document(
        "Giant Buying Corp announced a new plan. GBC said the plan works.",
        cd)
    second = recs[1]
    k = second["tokens"].index("GBC")
    assert second["ner"][k] == "ORGANIZATION"
    assert second["antecedents"][k] == "Giant Buying Corp"
    # an acronym with no in-doc expansion stays unlinked
    recs2 = annotate_document("GBC said the plan works.", cd)
    k2 = recs2[0]["tokens"].index("GBC")
    assert recs2[0]["antecedents"][k2] == ""


def test_approximate_org_name_matching():
    """A strictly-shorter org mention sharing the first token of a seen
    org links to the full name; non-prefix fragments do not."""
    from stanford_re_ray.stages.nlp import (DEFAULT_DICTIONARIES,
                                            annotate_document)

    cd = DEFAULT_DICTIONARIES.compiled()
    recs = annotate_document(
        "Giant Buying Corp opened a store. Giant Corp hired Anna Smith.",
        cd)
    second = recs[1]
    k = second["tokens"].index("Giant")
    assert second["antecedents"][k] == "Giant Buying Corp"
    # distinct org with a different first token must NOT link
    recs2 = annotate_document(
        "Giant Buying Corp opened a store. Micro Buying Corp did not.", cd)
    r2 = recs2[1]
    k2 = r2["tokens"].index("Micro")
    assert r2["antecedents"][k2] == ""
