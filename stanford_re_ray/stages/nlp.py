"""S2 — NLP annotation (tokenize / ssplit / pos-lite / lemma / NER / coref
surrogate) as a Ray **actor-pool** ``map_batches`` stage.

This replaces the reference's CoreNLP pipeline
(``tokenize, ssplit, pos, lemma, ner, regexner, parse, dcoref`` —
kbp/sf/common/Props.java:494, invoked SimpleSlotFiller.java:103,348-350) with
a deterministic, dependency-free, rule + dictionary stack: model-free so the
pipeline is bit-reproducible under any parallelism (SURVEY.md §7 build order
step 3).  The actor-pool *pattern* is the point: dictionaries are compiled
once per actor in ``__init__`` (the CoreNLP-model-load analog), batches are
annotated vectorized-per-sentence in ``__call__``.

Output schema: ``schema.SENTENCES`` — token-parallel list columns, the Arrow
mapping of CoreNLP's CoreMap (SURVEY.md §1.4).

NER tags emitted are the reference's 18-tag closed set
(kbp/sf/common/NERTag.java:8-27).  The coref surrogate writes a
representative antecedent per token (AntecedentAnnotation analog,
kbp/sf/ir/PostIRAnnotator.java:174-206): pronouns and bare surnames resolve
to the most recent full PERSON/ORGANIZATION mention in the document.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa

# ---------------------------------------------------------------------------
# Dictionaries (broadcast state; gazetteer analog of
# WorldKnowledgePostProcessor.java:27-55 + regexner)
# ---------------------------------------------------------------------------

_DEFAULT_ORG_SUFFIXES = (
    "Inc", "Inc.", "Corp", "Corp.", "Corporation", "Company", "Co", "Co.",
    "Ltd", "Ltd.", "LLC", "Group", "University", "Institute", "College",
    "Association", "Agency", "Ministry", "Committee", "Council", "Bank",
    "Foundation", "Laboratories", "Systems", "Technologies", "Industries",
    "Holdings", "Partners", "Media", "Networks", "Airlines", "Motors",
)

_PRONOUN_PER = {"he", "she", "him", "her", "his", "hers"}
_PRONOUN_ANY = {"it", "its", "they", "them", "their", "theirs"}
#: nominal org references resolvable to the last org ("the company ...")
_NOMINAL_ORG = {"company", "firm", "organization", "corporation", "group",
                "agency"}

_MONTHS = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5, "june": 6,
    "july": 7, "august": 8, "september": 9, "october": 10, "november": 11,
    "december": 12,
}

_PREPOSITIONS = {
    "in", "on", "at", "of", "by", "for", "with", "from", "to", "as",
    "into", "over", "under", "after", "before", "since", "until", "near",
}
_DETERMINERS = {"the", "a", "an", "this", "that", "these", "those"}
_CONJUNCTIONS = {"and", "or", "but", "nor"}
_BE_VERBS = {"is", "was", "are", "were", "be", "been", "being"}
_COMMON_VERBS = {
    "works", "worked", "founded", "born", "died", "married", "graduated",
    "joined", "leads", "led", "serves", "served", "lives", "lived",
    "headquartered", "based", "owns", "owned", "employs", "employed",
    "announced", "said", "visited", "met", "moved", "studied", "attended",
    "established", "created", "dissolved", "charged", "convicted", "practices",
    "holds", "held", "runs", "ran", "became", "remains", "acquired", "reported",
}

_TOKEN_RE = re.compile(
    r"https?://[^\s<>\"]*[^\s<>\".,;:!?)]"  # URLs (trailing punct excluded)
    r"|[A-Za-z]+(?:[.'’-][A-Za-z]+)*"  # words incl. inner dots/apostrophes/hyphens
    r"|\d{4}-\d{2}-\d{2}"           # ISO dates
    r"|\d+(?:[.,]\d+)*"             # numbers
    r"|[^\sA-Za-z0-9]"              # single punctuation
)
_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+(?=[A-Z\"'(\[])")
_YEAR_RE = re.compile(r"^(1[6-9]\d\d|20\d\d)$")
_NUM_RE = re.compile(r"^\d+(?:[.,]\d+)*$")
_URL_RE = re.compile(r"^https?://")
_ISO_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


@dataclass
class Dictionaries:
    """Closed-world NER dictionaries; tiny → broadcast once via ``ray.put``.

    Multi-word entries are matched longest-first over the token stream.
    Keys are case-sensitive surface tuples.
    """

    cities: set[str] = field(default_factory=set)
    countries: set[str] = field(default_factory=set)
    states: set[str] = field(default_factory=set)
    nationalities: set[str] = field(default_factory=set)
    titles: set[str] = field(default_factory=set)          # lowercase
    religions: set[str] = field(default_factory=set)
    ideologies: set[str] = field(default_factory=set)
    charges: set[str] = field(default_factory=set)         # lowercase
    causes_of_death: set[str] = field(default_factory=set) # lowercase
    first_names: set[str] = field(default_factory=set)
    org_names: set[str] = field(default_factory=set)       # full org surfaces
    #: gazetteer geo map (WorldKnowledgePostProcessor analog): city -> country
    city_to_country: dict[str, str] = field(default_factory=dict)
    org_suffixes: tuple[str, ...] = _DEFAULT_ORG_SUFFIXES

    def compiled(self) -> "_CompiledDicts":
        return _CompiledDicts(self)


class _CompiledDicts:
    """Per-actor compiled lookup structures (built once in actor __init__)."""

    def __init__(self, d: Dictionaries):
        self.d = d
        # phrase tables: tuple(tokens) -> NER tag, plus max phrase length
        self.phrases: dict[tuple[str, ...], str] = {}
        for names, tag in (
            (d.cities, "CITY"),
            (d.countries, "COUNTRY"),
            (d.states, "STATE_OR_PROVINCE"),
            (d.nationalities, "NATIONALITY"),
            (d.org_names, "ORGANIZATION"),
            (d.religions, "RELIGION"),
            (d.ideologies, "IDEOLOGY"),
        ):
            for name in names:
                self.phrases[tuple(name.split())] = tag
        self.lower_phrases: dict[tuple[str, ...], str] = {}
        for names, tag in (
            (d.titles, "TITLE"),
            (d.charges, "CRIMINAL_CHARGE"),
            (d.causes_of_death, "CAUSE_OF_DEATH"),
        ):
            for name in names:
                self.lower_phrases[tuple(name.lower().split())] = tag
        self.max_phrase = max(
            [len(k) for k in self.phrases] + [len(k) for k in self.lower_phrases] + [1]
        )
        # first-token prefilters: most positions can't start ANY phrase, so
        # one membership test replaces max_phrase tuple constructions
        self.phrase_firsts = {k[0] for k in self.phrases}
        self.lower_firsts = {k[0] for k in self.lower_phrases}
        self.first_names = set(d.first_names)
        self.org_suffixes = set(d.org_suffixes)


DEFAULT_DICTIONARIES = Dictionaries(
    # A small built-in world so the stack degrades gracefully on generic web
    # text; fixture corpora supply their own (closed) vocabularies.
    countries={"United States", "France", "Germany", "Japan", "Canada",
               "China", "India", "Brazil", "Russia", "Italy", "Spain",
               "Australia", "Kenya", "Mexico", "Egypt"},
    cities={"New York", "Paris", "Berlin", "Tokyo", "Toronto", "London",
            "Chicago", "Boston", "Seattle", "Madrid", "Rome", "Sydney"},
    states={"California", "Texas", "Ontario", "Bavaria", "Queensland"},
    nationalities={"American", "French", "German", "Japanese", "Canadian",
                   "Chinese", "Indian", "Brazilian", "Russian", "Italian"},
    titles={"president", "chief executive officer", "ceo", "chairman",
            "director", "professor", "senator", "minister", "engineer",
            "journalist", "economist", "lawyer", "spokesman"},
    religions={"Christianity", "Islam", "Judaism", "Buddhism", "Hinduism"},
    ideologies={"socialism", "conservatism", "liberalism"},
    charges={"fraud", "tax evasion", "embezzlement", "bribery", "perjury"},
    causes_of_death={"cancer", "heart attack", "stroke", "pneumonia"},
    first_names={"John", "Mary", "James", "Patricia", "Robert", "Jennifer",
                 "Michael", "Linda", "David", "Elizabeth", "William", "Barbara",
                 "Richard", "Susan", "Joseph", "Jessica", "Thomas", "Sarah",
                 "Charles", "Karen", "Anna", "Peter", "Laura", "Paul", "Emma"},
)


# ---------------------------------------------------------------------------
# Annotation core (pure functions; deterministic)
# ---------------------------------------------------------------------------

def split_sentences(text: str) -> list[str]:
    """Deterministic sentence splitter: newline = hard boundary, then split
    after [.!?] followed by whitespace + capital/opening quote."""
    out = []
    for block in text.split("\n"):
        block = block.strip()
        if not block:
            continue
        out.extend(p for p in _SENT_SPLIT_RE.split(block) if p.strip())
    return out


def tokenize(sentence: str) -> list[str]:
    return _TOKEN_RE.findall(sentence)


def _is_cap(tok: str) -> bool:
    return bool(tok) and tok[0].isupper() and any(c.isalpha() for c in tok)


def _approx_org_match(run: tuple, org_seen: list) -> str | None:
    """Approximate org-name matching (the RuleBasedNameMatcher /
    PostIRAnnotator approximate-reference analog): a STRICTLY-shorter org
    mention whose tokens are an ordered subsequence of a previously seen
    org name — sharing its FIRST token — refers to it
    ("Giant Corp" → "Giant Buying Corp"; "Stanford" → "Stanford
    University").  Most-recent match wins; first-token equality keeps
    precision ("Buying Corp" does NOT link)."""
    for full_tokens, full in org_seen:
        if len(run) >= len(full_tokens) or run[0] != full_tokens[0]:
            continue
        it = iter(full_tokens)
        if all(t in it for t in run):
            return full
    return None


#: token-level POS/lemma memos: the token vocabulary is Zipfian, so the
#: same strings recur constantly; bounded per worker process
_POS_CACHE: dict[str, str] = {}
_LEMMA_CACHE: dict[tuple[str, str], str] = {}
_TOK_CACHE_MAX = 1 << 17


def _pos_of_cached(tok: str, lower: str) -> str:
    v = _POS_CACHE.get(tok)
    if v is None:
        v = _pos_of(tok, lower)
        if len(_POS_CACHE) >= _TOK_CACHE_MAX:
            _POS_CACHE.clear()
        _POS_CACHE[tok] = v
    return v


def _lemma_of_cached(tok: str, pos: str) -> str:
    key = (tok, pos)
    v = _LEMMA_CACHE.get(key)
    if v is None:
        v = _lemma_of(tok, pos)
        if len(_LEMMA_CACHE) >= _TOK_CACHE_MAX:
            _LEMMA_CACHE.clear()
        _LEMMA_CACHE[key] = v
    return v


def _pos_of(tok: str, lower: str) -> str:
    if _NUM_RE.match(tok) or _YEAR_RE.match(tok):
        return "CD"
    if _ISO_DATE_RE.match(tok):
        return "CD"
    if not any(c.isalnum() for c in tok):
        return "."
    if lower in _DETERMINERS:
        return "DT"
    if lower in _PREPOSITIONS:
        return "IN"
    if lower in _CONJUNCTIONS:
        return "CC"
    if lower in _PRONOUN_PER or lower in _PRONOUN_ANY:
        return "PRP"
    if lower in _BE_VERBS or lower in _COMMON_VERBS:
        return "VB"
    if _is_cap(tok):
        return "NNP"
    if lower.endswith(("al", "ous", "ive", "ful", "less", "ic")):
        return "JJ"
    return "NN"


def _lemma_of(tok: str, pos: str) -> str:
    low = tok.lower()
    if pos == "VB":
        for suf in ("ied", "ed", "es", "s", "ing"):
            if low.endswith(suf) and len(low) - len(suf) >= 3:
                return low[: len(low) - len(suf)]
    elif pos == "NN" and low.endswith("s") and not low.endswith("ss") and len(low) > 3:
        return low[:-1]
    return low


#: token → regex-derived NER type (None when no regex matches).  The
#: regex stack runs once per DISTINCT token per worker instead of per
#: occurrence (Zipfian token stream — same memo pattern as POS/lemma).
_NERTYPE_CACHE: dict = {}


def _regex_ner_type(tok: str, lower: str):
    v = _NERTYPE_CACHE.get(tok, "")
    if v == "":
        if _URL_RE.match(tok):
            v = "URL"
        elif _ISO_DATE_RE.match(tok) or _YEAR_RE.match(tok):
            v = "DATE"
        elif lower in _MONTHS:
            v = "DATE"
        elif _NUM_RE.match(tok):
            v = "NUMBER"
        else:
            v = None
        if len(_NERTYPE_CACHE) >= _TOK_CACHE_MAX:
            _NERTYPE_CACHE.clear()
        _NERTYPE_CACHE[tok] = v
    return v


def _tag_ner(tokens: list[str], lowers: list[str], pos: list[str],
             cd: _CompiledDicts) -> list[str]:
    """Dictionary + rule NER over one sentence. Longest-match-first phrase
    tagging, then date/number/url regexes, then PERSON/ORG heuristics over
    untagged capitalized runs."""
    n = len(tokens)
    ner = ["O"] * n
    i = 0
    while i < n:
        # prefilter: no phrase starts with this token → skip the window scan
        if tokens[i] not in cd.phrase_firsts and \
                lowers[i] not in cd.lower_firsts:
            i += 1
            continue
        matched = 0
        for ln in range(min(cd.max_phrase, n - i), 0, -1):
            key = tuple(tokens[i:i + ln])
            tag = cd.phrases.get(key)
            if tag is None:
                tag = cd.lower_phrases.get(tuple(lowers[i:i + ln]))
            if tag is not None:
                for j in range(i, i + ln):
                    ner[j] = tag
                matched = ln
                break
        i += matched if matched else 1
    # regex-typed tokens (memoized per distinct token; "May 3 , 2001"
    # runs are absorbed by the NUMBER+DATE merge below)
    for i, tok in enumerate(tokens):
        if ner[i] != "O":
            continue
        t = _regex_ner_type(tok, lowers[i])
        if t is not None:
            ner[i] = t
    # merge Month + day/number + year into DATE runs
    for i in range(n):
        if ner[i] == "DATE" and lowers[i] in _MONTHS:
            j = i + 1
            while j < n and (ner[j] == "NUMBER" or tokens[j] == ","):
                if ner[j] == "NUMBER":
                    ner[j] = "DATE"
                j += 1
    # untagged capitalized runs -> PERSON / ORGANIZATION / MISC heuristics
    i = 0
    while i < n:
        if ner[i] == "O" and pos[i] == "NNP":
            j = i
            while j < n and ner[j] == "O" and pos[j] == "NNP":
                j += 1
            run = tokens[i:j]
            if run[-1].rstrip(".") in cd.org_suffixes or run[-1] in cd.org_suffixes:
                tag = "ORGANIZATION"
            elif len(run) >= 2:
                tag = "PERSON"  # multi-token capitalized run, no org suffix
            elif run[0] in cd.first_names:
                tag = "PERSON"
            elif run[0].isupper() and len(run[0]) >= 2:
                tag = "ORGANIZATION"  # bare acronym
            else:
                tag = "MISC"
            for k in range(i, j):
                ner[k] = tag
            i = j
        else:
            i += 1
    return ner


def annotate_document(text: str, cd: _CompiledDicts,
                      max_sentences: int = 512) -> list[dict]:
    """Annotate one document → list of sentence records (SENTENCES schema,
    minus doc ids).  Includes the coref surrogate: per-token antecedents.

    The per-document mention memory below is the PostIRAnnotator analog
    (kbp/sf/ir/PostIRAnnotator.java:97-206): last full PERSON name, last
    ORGANIZATION, surname → full-name map.
    """
    sents = split_sentences(text)[:max_sentences]
    out = []
    last_person = ""
    last_org = ""
    # topical antecedents: the most recent sentence-INITIAL person/org
    # mention.  Pronouns prefer the topic over pure recency (a Hobbs-style
    # subject-salience heuristic; the dcoref analog) — pure recency
    # mis-resolves "A is married to B. He ..." to B.
    topic_person = ""
    topic_org = ""
    surname_to_full: dict[str, str] = {}
    # acronym → full org name within the doc (PostIRAnnotator.java:65-206
    # CorpusStats acronym/approximate-name matching analog): "IBM" after
    # "International Business Machines" canonicalizes to the full name
    acronym_to_full: dict[str, str] = {}
    # (full_tokens, full_surface) of multi-token orgs, most recent first —
    # the approximate-name table ("Giant Corp" → "Giant Buying Corp")
    org_seen: list[tuple[tuple[str, ...], str]] = []
    for s_idx, sent in enumerate(sents):
        tokens = tokenize(sent)
        if not tokens:
            continue
        lowers = [t.lower() for t in tokens]
        pos = [_pos_of_cached(t, l) for t, l in zip(tokens, lowers)]
        ner = _tag_ner(tokens, lowers, pos, cd)
        lemmas = [_lemma_of_cached(t, p) for t, p in zip(tokens, pos)]
        ante = [""] * len(tokens)
        i = 0
        n = len(tokens)
        # bare surname re-tagging: a single capitalized token previously seen
        # as the last token of a full PERSON name becomes a PERSON mention
        # with the full name as its antecedent (PostIRAnnotator literal-match
        # analog, PostIRAnnotator.java:174-206)
        for k in range(n):
            if ner[k] == "MISC" and (
                tokens[k] in surname_to_full
                or topic_person.endswith(" " + tokens[k])
            ):
                solo = (k == 0 or ner[k - 1] != "MISC") and (
                    k + 1 >= n or ner[k + 1] != "MISC"
                )
                if solo:
                    ner[k] = "PERSON"
        while i < n:
            if ner[i] == "PERSON":
                j = i
                while j < n and ner[j] == "PERSON":
                    j += 1
                full = " ".join(tokens[i:j])
                if j - i >= 2:
                    last_person = full
                    surname_to_full[tokens[j - 1]] = full
                elif tokens[i] in surname_to_full or topic_person.endswith(
                    " " + tokens[i]
                ):
                    # bare surname: prefer the topical subject when its
                    # surname matches (spouses share surnames — recency
                    # alone resolves to the most recently mentioned family
                    # member, which is usually wrong)
                    if topic_person.endswith(" " + tokens[i]):
                        full = topic_person
                    else:
                        full = surname_to_full[tokens[i]]
                    for k in range(i, j):
                        ante[k] = full
                    last_person = full
                if i == 0:
                    topic_person = full
                i = j
            elif ner[i] == "ORGANIZATION":
                j = i
                while j < n and ner[j] == "ORGANIZATION":
                    j += 1
                org = " ".join(tokens[i:j])
                run = tuple(tokens[i:j])
                approx = _approx_org_match(run, org_seen)
                if approx is not None:
                    # shorter reference to an org already seen in-doc
                    # (approximate-name matching, PostIRAnnotator analog)
                    for k in range(i, j):
                        ante[k] = approx
                    last_org = approx
                elif j - i >= 2:
                    acr = "".join(w[0] for w in tokens[i:j]
                                  if w[:1].isupper()).upper()
                    if len(acr) >= 2:
                        acronym_to_full.setdefault(acr, org)
                    org_seen.insert(0, (run, org))
                    del org_seen[50:]  # bounded per doc
                    last_org = org
                elif tokens[i] in acronym_to_full:
                    # bare acronym of an org already seen in this doc:
                    # antecedent-link it to the full name
                    full = acronym_to_full[tokens[i]]
                    for k in range(i, j):
                        ante[k] = full
                    last_org = full
                else:
                    last_org = org
                if i == 0:
                    topic_org = last_org
                i = j
            else:
                low = lowers[i]
                if low in _PRONOUN_PER and (topic_person or last_person):
                    ante[i] = topic_person or last_person
                elif low in _PRONOUN_ANY and (topic_org or last_org):
                    ante[i] = topic_org or last_org
                elif (low in _NOMINAL_ORG and i > 0
                      and lowers[i - 1] == "the"
                      and (topic_org or last_org)):
                    # nominal antecedent: "the company" → last org
                    # (PostIRAnnotator approximate-reference analog)
                    ante[i] = topic_org or last_org
                i += 1
        out.append(
            {
                "sent_idx": s_idx,
                "text": sent,
                "tokens": tokens,
                "lemmas": lemmas,
                "pos": pos,
                "ner": ner,
                "antecedents": ante,
            }
        )
    return out


# ---------------------------------------------------------------------------
# The actor-pool stage
# ---------------------------------------------------------------------------

class NlpAnnotator:
    """Callable class for ``docs.map_batches(NlpAnnotator, concurrency=N,
    fn_constructor_kwargs={"dicts_ref": ref}, batch_format="pyarrow")``.

    ``__init__`` runs once per actor: fetches the broadcast ``Dictionaries``
    (``ray.put`` handle or a plain object for tests) and compiles lookup
    tables — the CoreNLP model-load analog.  ``__call__`` flat-maps docs →
    sentence rows.
    """

    def __init__(self, dicts_ref=None, max_sentences: int = 512):
        if dicts_ref is None:
            d = DEFAULT_DICTIONARIES
        elif isinstance(dicts_ref, Dictionaries):
            d = dicts_ref
        else:
            import ray

            d = ray.get(dicts_ref)
        self.cd = d.compiled()
        self.max_sentences = max_sentences

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        rows = {k: [] for k in ("doc_id", "url", "sent_idx", "text", "tokens",
                                "lemmas", "pos", "ner", "antecedents")}
        for did, url, text in zip(doc_ids, urls, texts):
            for rec in annotate_document(text or "", self.cd, self.max_sentences):
                rows["doc_id"].append(did)
                rows["url"].append(url)
                rows["sent_idx"].append(rec["sent_idx"])
                rows["text"].append(rec["text"])
                rows["tokens"].append(rec["tokens"])
                rows["lemmas"].append(rec["lemmas"])
                rows["pos"].append(rec["pos"])
                rows["ner"].append(rec["ner"])
                rows["antecedents"].append(rec["antecedents"])
        from ..schema import SENTENCES

        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "url": pa.array(rows["url"], pa.string()),
                "sent_idx": pa.array(rows["sent_idx"], pa.int32()),
                "text": pa.array(rows["text"], pa.string()),
                "tokens": pa.array(rows["tokens"], pa.list_(pa.string())),
                "lemmas": pa.array(rows["lemmas"], pa.list_(pa.string())),
                "pos": pa.array(rows["pos"], pa.list_(pa.string())),
                "ner": pa.array(rows["ner"], pa.list_(pa.string())),
                "antecedents": pa.array(rows["antecedents"], pa.list_(pa.string())),
            },
            schema=SENTENCES,
        )


def doc_ner_stats(sentences):
    """Per-doc NER tag histogram — the CorpusStats analog
    (PostIRAnnotator.java:65-120 computes per-document entity statistics
    before slot filling).  Map-side partial counts (one row per distinct
    (doc, tag) per batch) shuffle into a small groupby-sum: only
    histogram rows move, never token lists."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        from ..schema import str_lists

        cnt: Counter = Counter()
        for did, ner in zip(batch.column("doc_id").to_pylist(),
                            str_lists(batch, "ner")):
            for t in ner:
                if t != "O":
                    cnt[(did, t)] += 1
        keys = sorted(cnt)
        return pa.table({
            "doc_id": pa.array([k[0] for k in keys], pa.string()),
            "ner": pa.array([k[1] for k in keys], pa.string()),
            "n": pa.array([cnt[k] for k in keys], pa.int64()),
        })

    return (sentences.map_batches(partial, batch_format="pyarrow")
            .groupby(["doc_id", "ner"])
            .aggregate(Sum("n", alias_name="n")))
