"""Deterministic synthetic corpus generator (FIXTURES.md).

The reference has no unit tests; its harness is end-to-end scoring against
golden assessments (SURVEY.md §5).  This generator mirrors that: a closed
template world whose golden triples are computable by construction, so the
pipeline can be scored with P/R ≥ 0.95 (BASELINE.json correctness gate).

Everything is a pure function of the page / entity index — no RNG, no wall
clock, no dict-order dependence — so two runs (and two processes) generate
byte-identical corpora.

World model
-----------
- ``person i`` = FIRST[i % 20] + " " + LAST[i // 20]  (unique for i < 600)
- ``org j``   = BASE[j % 20] + " " + SUFFIX[j // 20]  (unique for j < 200)
- every entity carries a deterministic fact sheet (``person_facts`` /
  ``org_facts``) expressed through fixed sentence templates covering ~37 of
  the 41 relations;
- pages: subject chosen from the entity range; 2–6 fact sentences (+
  negative-template sentences, a >150-token sentence every ~50 pages,
  pronoun / bare-surname subject variants to exercise the coref surrogate);
- head-entity skew: the first entity of the range is the subject of 8% of
  pages (exercises the salting guardrails);
- gold = the facts actually expressed on generated pages, with normalized
  object values (Timex padding etc.);
- kb = ALL facts of the range's entities (the distant-supervision side);
- 2% non-English pages (must be filtered), ~1% malformed HTML.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from .stages.extract import extract_text
from .stages.nlp import Dictionaries

FIRST = ["John", "Mary", "James", "Patricia", "Robert", "Jennifer", "Michael",
         "Linda", "David", "Elizabeth", "William", "Barbara", "Richard",
         "Susan", "Joseph", "Jessica", "Thomas", "Sarah", "Charles", "Karen"]
LAST = ["Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
        "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
        "Wilson", "Anderson", "Taylor", "Moore", "Jackson", "Martin", "Lee",
        "Perez", "Thompson", "White", "Harris", "Sanchez", "Clark", "Ramirez",
        "Lewis", "Robinson", "Walker",
        # extension (append-only: earlier indices must never change) for
        # larger entity ranges in bench/scaling corpora
        "Young", "Allen", "King", "Wright", "Scott", "Torres", "Nguyen",
        "Hill", "Flores", "Green", "Adams", "Nelson", "Baker", "Hall",
        "Rivera", "Campbell", "Mitchell", "Carter", "Roberts", "Gomez"]
ORG_BASE = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne",
            "Cyberdyne", "Tyrell", "Wonka", "Duff", "Hooli", "Vandelay",
            "Sterling", "Monarch", "Zenith", "Apex", "Vertex", "Orion",
            "Atlas", "Nimbus"]
ORG_SUFFIX = ["Corporation", "Industries", "Systems", "Group", "University",
              "Institute", "Bank", "Foundation", "Technologies", "Holdings",
              # append-only extension (see LAST)
              "Partners", "Networks", "Laboratories", "Media", "Airlines"]
CITIES = [("Paris", "", "France"), ("Berlin", "", "Germany"),
          ("Tokyo", "", "Japan"), ("Toronto", "Ontario", "Canada"),
          ("Chicago", "Illinois", "United States"),
          ("Boston", "Massachusetts", "United States"),
          ("Seattle", "Washington", "United States"), ("Madrid", "", "Spain"),
          ("Rome", "", "Italy"), ("Sydney", "", "Australia"),
          ("Austin", "Texas", "United States"),
          ("Denver", "Colorado", "United States"), ("Lyon", "", "France"),
          ("Munich", "Bavaria", "Germany"), ("Osaka", "", "Japan")]
COUNTRIES = ["France", "Germany", "Japan", "Canada", "United States", "Spain",
             "Italy", "Australia"]
STATES = ["Ontario", "Illinois", "Massachusetts", "Washington", "Texas",
          "Colorado", "Bavaria", "California", "Oregon", "Florida"]
NATIONALITIES = ["French", "German", "Japanese", "Canadian", "American",
                 "Spanish", "Italian", "Australian"]
TITLES = ["professor", "journalist", "economist", "engineer", "lawyer",
          "senator", "minister", "director", "chairman", "spokesman"]
RELIGIONS = ["Christianity", "Islam", "Judaism", "Buddhism", "Hinduism"]
IDEOLOGIES = ["socialism", "conservatism", "liberalism"]
CHARGES = ["fraud", "tax evasion", "embezzlement", "bribery", "perjury"]
CAUSES = ["cancer", "heart attack", "stroke", "pneumonia"]


def person_name(i: int) -> str:
    return f"{FIRST[i % 20]} {LAST[i // 20]}"


def org_name(j: int) -> str:
    return f"{ORG_BASE[j % 20]} {ORG_SUFFIX[j // 20]}"


def year_norm(y: int) -> str:
    return f"{y}-XX-XX"


@dataclass(frozen=True)
class Fact:
    pred: str
    obj_surface: str
    obj_norm: str
    obj_type: str


@dataclass(frozen=True)
class FactSentence:
    """One template instantiation: the sentence text + the (subj-rooted and
    other-rooted) triples it expresses."""

    text: str
    # (subj_name, subj_type, fact) — subj may differ from the page subject
    # for inverse relations (children/parents, org members, ...)
    facts: tuple[tuple[str, str, Fact], ...]


def _fs(text, *facts):
    return FactSentence(text, tuple(facts))


def person_sentences(i: int, org_lo: int, org_hi: int,
                     per_lo: int, per_hi: int) -> list[FactSentence]:
    """The fact sheet of person ``i`` as template sentences.  Related
    entities stay inside [lo, hi) ranges so train/test splits are closed."""
    p = person_name(i)
    n_per = per_hi - per_lo
    n_org = org_hi - org_lo
    city_b, state_b, country_b = CITIES[i % 15]
    city_r = CITIES[(i + 7) % 15][0]
    year_b = 1940 + (i % 60)
    employer = org_name(org_lo + (i % max(1, min(n_org, 40))))
    school = org_name(org_lo + (80 + i % 20) % n_org)
    title = TITLES[i % 10]
    spouse = person_name(per_lo + ((i - per_lo) ^ 1) % n_per)
    sibling = person_name(per_lo + ((i - per_lo) + 17) % n_per)
    child = person_name(per_lo + ((i - per_lo) + 41) % n_per)
    cousin = person_name(per_lo + ((i - per_lo) + 29) % n_per)
    state_r = STATES[i % 10]
    country_o = COUNTRIES[i % 8]
    country_r = COUNTRIES[(i + 3) % 8]
    age = 25 + (i % 60)
    out = [
        _fs(f"{p} was born in {city_b} in {year_b}.",
            (p, "PERSON", Fact("per:city_of_birth", city_b, city_b, "CITY")),
            (p, "PERSON", Fact("per:date_of_birth", str(year_b),
                               year_norm(year_b), "DATE"))),
        _fs(f"{p} works as a {title} at {employer}.",
            (p, "PERSON", Fact("per:title", title, title, "TITLE")),
            (p, "PERSON", Fact("per:employee_of", employer, employer,
                               "ORGANIZATION"))),
        _fs(f"{p} lives in {city_r}.",
            (p, "PERSON", Fact("per:cities_of_residence", city_r, city_r,
                               "CITY"))),
        _fs(f"{p} is married to {spouse}.",
            (p, "PERSON", Fact("per:spouse", spouse, spouse, "PERSON")),
            (spouse, "PERSON", Fact("per:spouse", p, p, "PERSON"))),
        _fs(f"{p} graduated from {school}.",
            (p, "PERSON", Fact("per:schools_attended", school, school,
                               "ORGANIZATION"))),
        _fs(f"{p} is a citizen of {country_o}.",
            (p, "PERSON", Fact("per:origin", country_o, country_o,
                               "COUNTRY"))),
        _fs(f"{p} has lived in {country_r} for many years.",
            (p, "PERSON", Fact("per:countries_of_residence", country_r,
                               country_r, "COUNTRY"))),
        _fs(f"{p} moved to {state_r}.",
            (p, "PERSON", Fact("per:stateorprovinces_of_residence", state_r,
                               state_r, "STATE_OR_PROVINCE"))),
        _fs(f"{p} is {age} years old.",
            (p, "PERSON", Fact("per:age", str(age), str(age), "NUMBER"))),
        _fs(f"{p} is the sister of {sibling}.",
            (p, "PERSON", Fact("per:siblings", sibling, sibling, "PERSON")),
            (sibling, "PERSON", Fact("per:siblings", p, p, "PERSON"))),
        _fs(f"{p} is the son of {child}.",
            (p, "PERSON", Fact("per:parents", child, child, "PERSON")),
            (child, "PERSON", Fact("per:children", p, p, "PERSON"))),
        _fs(f"{p} is the grandfather of {cousin}.",
            (p, "PERSON", Fact("per:other_family", cousin, cousin, "PERSON")),
            (cousin, "PERSON", Fact("per:other_family", p, p, "PERSON"))),
    ]
    if i % 4 == 0:
        state_b2 = STATES[(i // 4) % 10]
        out.append(_fs(f"{p} was born in {state_b2}.",
                       (p, "PERSON",
                        Fact("per:stateorprovince_of_birth", state_b2,
                             state_b2, "STATE_OR_PROVINCE"))))
    if i % 4 == 1:
        out.append(_fs(f"{p} was born in {country_b or COUNTRIES[i % 8]}.",
                       (p, "PERSON",
                        Fact("per:country_of_birth",
                             country_b or COUNTRIES[i % 8],
                             country_b or COUNTRIES[i % 8], "COUNTRY"))))
    if i % 3 == 0:
        city_d = CITIES[(i + 5) % 15][0]
        year_d = year_b + 50
        cause = CAUSES[i % 4]
        out.append(_fs(f"{p} died in {city_d}.",
                       (p, "PERSON", Fact("per:city_of_death", city_d, city_d,
                                          "CITY"))))
        out.append(_fs(f"{p} died of {cause} in {year_d}.",
                       (p, "PERSON", Fact("per:cause_of_death", cause, cause,
                                          "CAUSE_OF_DEATH")),
                       (p, "PERSON", Fact("per:date_of_death", str(year_d),
                                          year_norm(year_d), "DATE"))))
    if i % 7 == 0:
        charge = CHARGES[i % 5]
        out.append(_fs(f"{p} faces charges of {charge}.",
                       (p, "PERSON", Fact("per:charges", charge, charge,
                                          "CRIMINAL_CHARGE"))))
    if i % 6 == 3:
        rel = RELIGIONS[i % 5]
        out.append(_fs(f"{p} practices {rel}.",
                       (p, "PERSON", Fact("per:religion", rel, rel,
                                          "RELIGION"))))
    if i % 5 == 2:
        out.append(_fs(f"{p} is a member of {org_name(org_lo + (i + 9) % n_org)}.",
                       (p, "PERSON",
                        Fact("per:member_of",
                             org_name(org_lo + (i + 9) % n_org),
                             org_name(org_lo + (i + 9) % n_org),
                             "ORGANIZATION"))))
    return out


def org_sentences(j: int, org_lo: int, org_hi: int,
                  per_lo: int, per_hi: int) -> list[FactSentence]:
    o = org_name(j)
    n_per = per_hi - per_lo
    n_org = org_hi - org_lo
    founder = person_name(per_lo + (3 * (j - org_lo) + 1) % n_per)
    ceo = person_name(per_lo + (3 * (j - org_lo) + 2) % n_per)
    city_h, state_h, country_h = CITIES[j % 15]
    year_f = 1900 + (j % 100)
    employees = 10000 + 37 * j
    website = f"http://www.{ORG_BASE[j % 20].lower()}{j}.example.com"
    member_of = org_name(org_lo + ((j - org_lo) + 3) % n_org)
    out = [
        _fs(f"{o} was founded by {founder} in {year_f}.",
            (o, "ORGANIZATION", Fact("org:founded_by", founder, founder,
                                     "PERSON")),
            (o, "ORGANIZATION", Fact("org:founded", str(year_f),
                                     year_norm(year_f), "DATE"))),
        _fs(f"{o} is headquartered in {city_h}.",
            (o, "ORGANIZATION", Fact("org:city_of_headquarters", city_h,
                                     city_h, "CITY"))),
        _fs(f"{o} is based in {country_h}.",
            (o, "ORGANIZATION", Fact("org:country_of_headquarters", country_h,
                                     country_h, "COUNTRY"))),
        _fs(f"{o} employs {employees} people.",
            (o, "ORGANIZATION", Fact("org:number_of_employees/members",
                                     str(employees), str(employees),
                                     "NUMBER"))),
        _fs(f"{ceo} is the chief executive officer of {o}.",
            (o, "ORGANIZATION", Fact("org:top_members/employees", ceo, ceo,
                                     "PERSON")),
            (ceo, "PERSON", Fact("per:title", "chief executive officer",
                                 "chief executive officer", "TITLE")),
            (ceo, "PERSON", Fact("per:employee_of", o, o, "ORGANIZATION"))),
        _fs(f"The website of {o} is {website}.",
            (o, "ORGANIZATION", Fact("org:website", website,
                                     website.replace("http://", "").lower(),
                                     "URL"))),
        _fs(f"{o} is a member of {member_of}.",
            (o, "ORGANIZATION", Fact("org:member_of", member_of, member_of,
                                     "ORGANIZATION")),
            (member_of, "ORGANIZATION", Fact("org:members", o, o,
                                             "ORGANIZATION"))),
    ]
    if j % 5 == 0 and j + 1 < org_hi:
        sub = org_name(j + 1)
        out.append(_fs(f"{sub} is a subsidiary of {o}.",
                       (o, "ORGANIZATION", Fact("org:subsidiaries", sub, sub,
                                                "ORGANIZATION")),
                       (sub, "ORGANIZATION", Fact("org:parents", o, o,
                                                  "ORGANIZATION"))))
    if j % 4 == 1:
        st = STATES[j % 10]
        out.append(_fs(f"{o} is headquartered in {st}.",
                       (o, "ORGANIZATION",
                        Fact("org:stateorprovince_of_headquarters", st, st,
                             "STATE_OR_PROVINCE"))))
    if j % 6 == 2:
        yd = 2000 + (j % 20)
        out.append(_fs(f"{o} was dissolved in {yd}.",
                       (o, "ORGANIZATION", Fact("org:dissolved", str(yd),
                                                year_norm(yd), "DATE"))))
    if j % 6 == 3:
        ide = IDEOLOGIES[j % 3]
        out.append(_fs(f"{o} promotes {ide}.",
                       (o, "ORGANIZATION",
                        Fact("org:political/religious_affiliation", ide, ide,
                             "IDEOLOGY"))))
    if j % 7 == 4:
        holder = person_name(per_lo + (5 * (j - org_lo) + 4) % n_per)
        out.append(_fs(f"The shares of {o} are held by {holder}.",
                       (o, "ORGANIZATION", Fact("org:shareholders", holder,
                                                holder, "PERSON"))))
    return out


# Negative templates draw objects from OUT-OF-WORLD vocab (no entity below
# appears in any fact sheet), so distant supervision never mislabels them:
# a negative sentence whose (subj, obj) collides with a KB fact would teach
# the classifier that "visited" implies residence.
_NEG_CITIES = ["Oslo", "Cairo", "Lima", "Quito", "Accra"]
_NEG_PEOPLE = ["Alan Turing", "Ada Lovelace", "Grace Hopper", "Niels Bohr"]
_NEG_ORGS = ["Northwind Council", "Evergreen Committee", "Redwood Agency"]
_NEGATIVE_TEMPLATES = [
    "{p} visited {city} last week.",
    "{p} met {p2} at a conference.",
    "{o} announced a new product.",
    "{p} said that {o} will expand soon.",
]


@dataclass
class Corpus:
    pages: pa.Table
    kb: pa.Table
    gold: pa.Table
    dicts: Dictionaries
    clusters: dict[str, str] = field(default_factory=dict)


def corpus_dictionaries() -> Dictionaries:
    return Dictionaries(
        cities={c for c, _, _ in CITIES},
        countries=set(COUNTRIES),
        states=set(STATES),
        nationalities=set(NATIONALITIES),
        titles=set(TITLES) | {"chief executive officer"},
        religions=set(RELIGIONS),
        ideologies=set(IDEOLOGIES),
        charges=set(CHARGES),
        causes_of_death=set(CAUSES),
        first_names=set(FIRST),
        city_to_country={c: country for c, _, country in CITIES},
    )


def corpus_clusters() -> dict[str, str]:
    """word → cluster-id map in the format of the missing
    egw4-reut.512.clusters blob (loader FeatureFactory.java:65-78)."""
    import zlib

    words: set[str] = set()
    for lst in (FIRST, LAST, ORG_BASE, ORG_SUFFIX, COUNTRIES, STATES,
                NATIONALITIES, TITLES, RELIGIONS, IDEOLOGIES, CHARGES, CAUSES):
        for w in lst:
            words.update(w.lower().split())
    for c, _, _ in CITIES:
        words.add(c.lower())
    words.update("born works lives married graduated citizen moved died "
                 "faces practices member founded headquartered based employs "
                 "website shares held dissolved promotes".split())
    return {w: str(zlib.crc32(w.encode()) % 64) for w in sorted(words)}


def _page_html(page_id: int, sentences: list[str], malformed: bool) -> bytes:
    body = "".join(f"<p>{s}</p>" for s in sentences)
    head = (f"<html><head><title>article {page_id}</title>"
            f"<style>p{{margin:0}}</style>"
            f"<script>var t={page_id};</script></head>")
    trailer = "" if malformed else "</body></html>"
    html = (f"{head}<body><h1>daily report &amp; notes {page_id}</h1>"
            f"{body}<!-- tracker {page_id} -->{trailer}")
    return html.encode("utf-8")


def _page_record(
    p: int,
    per_lo: int,
    per_hi: int,
    org_lo: int,
    org_hi: int,
    base_url: str,
    fill_text: bool = True,
) -> tuple[dict, list[FactSentence]]:
    """One page's row + the fact sentences it expresses — a pure function
    of the page index (the unit of distributed generation)."""
    n_per = per_hi - per_lo
    n_org = org_hi - org_lo
    url = f"{base_url}/{per_lo}/{p}"
    if p % 50 == 13:
        lang = "de" if p % 100 == 13 else "fr"
        sents = ["Dies ist ein Beispieltext ohne Inhalt.",
                 "Der Bericht folgt morgen."]
        html = _page_html(p, sents, malformed=False)
        return (
            {"url": url, "warc_ts": 1577836800_000000 + p * 3600_000000,
             "html": html, "text": extract_text(html) if fill_text else "",
             "lang": lang},
            [],
        )
    # subject selection: 8% head entity, 20% orgs, rest spread
    if p % 100 < 8:
        subject_kind, idx = "per", per_lo
    elif p % 5 == 4:
        subject_kind, idx = "org", org_lo + (p * 7) % n_org
    else:
        subject_kind, idx = "per", per_lo + (p * 13) % n_per
    if subject_kind == "per":
        facts = person_sentences(idx, org_lo, org_hi, per_lo, per_hi)
        subj_name = person_name(idx)
        pronoun = "He" if idx % 2 == 0 else "She"
        surname = subj_name.split()[-1]
    else:
        facts = org_sentences(idx, org_lo, org_hi, per_lo, per_hi)
        subj_name = org_name(idx)
        pronoun = "It"
        surname = None
    k = 2 + (p % 5)
    chosen = [facts[(p + m) % len(facts)] for m in range(min(k, len(facts)))]
    # dedupe template picks while preserving order
    seen_t: set[str] = set()
    chosen = [c for c in chosen if not (c.text in seen_t or seen_t.add(c.text))]
    sents: list[str] = []
    for s_i, fs in enumerate(chosen):
        text = fs.text
        # subject-surface variants after the first sentence (coref probe)
        if s_i > 0 and text.startswith(subj_name):
            v = (p + s_i) % 3
            if v == 1:
                text = pronoun + text[len(subj_name):]
            elif v == 2 and surname:
                text = surname + text[len(subj_name):]
        sents.append(text)
    # negative sentence
    if p % 3 == 0:
        neg = _NEGATIVE_TEMPLATES[p % 4].format(
            p=subj_name if subject_kind == "per" else person_name(per_lo + (p + 23) % n_per),
            p2=_NEG_PEOPLE[p % 4],
            o=_NEG_ORGS[p % 3],
            city=_NEG_CITIES[p % 5],
        )
        sents.append(neg)
    # >150-token sentence: must be dropped by the featurizer cap
    if p % 50 == 7:
        sents.append(" ".join(f"w{z}" for z in range(160)) + ".")
    html = _page_html(p, sents, malformed=(p % 97 == 96))
    return (
        {"url": url, "warc_ts": 1577836800_000000 + p * 3600_000000,
         "html": html, "text": extract_text(html) if fill_text else "",
         "lang": "en"},
        chosen,
    )


def gen_pages_dataset(
    n_pages: int,
    per_lo: int = 0,
    per_hi: int = 200,
    org_lo: int = 0,
    org_hi: int = 100,
    base_url: str = "https://fixture.example",
    fill_text: bool = False,
    blocks: int | None = None,
):
    """Distributed deterministic pages generation: ``rd.range(n)`` →
    map_batches over page indices — the same rows ``gen_corpus`` builds,
    but generated in parallel across the cluster (for large bench/scaling
    corpora).  ``fill_text=False`` skips the golden text column (the
    pipeline recomputes extraction anyway)."""
    import ray.data as rd

    def build(batch: pa.Table) -> pa.Table:
        rows = [
            _page_record(int(p), per_lo, per_hi, org_lo, org_hi, base_url,
                         fill_text)[0]
            for p in batch.column("id").to_pylist()
        ]
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                    pa.timestamp("us")),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
                "text": pa.array([r["text"] for r in rows], pa.string()),
                "lang": pa.array([r["lang"] for r in rows], pa.string()),
            }
        )

    ds = rd.range(n_pages, override_num_blocks=blocks)
    return ds.map_batches(build, batch_format="pyarrow")


def gen_corpus(
    n_pages: int,
    per_lo: int = 0,
    per_hi: int = 200,
    org_lo: int = 0,
    org_hi: int = 100,
    base_url: str = "https://fixture.example",
) -> Corpus:
    """Generate a deterministic corpus over entity index ranges.

    Train/test disjointness: use non-overlapping [per_lo, per_hi) /
    [org_lo, org_hi) ranges for the two corpora.
    """
    urls, tss, htmls, texts, langs = [], [], [], [], []
    gold: dict[tuple[str, str, str], dict] = {}
    kb_facts: set[tuple[str, str, str, str]] = set()

    # KB: every fact of every entity in range (distant-supervision side)
    for i in range(per_lo, per_hi):
        for fs in person_sentences(i, org_lo, org_hi, per_lo, per_hi):
            for subj, stype, f in fs.facts:
                kb_facts.add((subj, f.pred, f.obj_surface, stype))
    for j in range(org_lo, org_hi):
        for fs in org_sentences(j, org_lo, org_hi, per_lo, per_hi):
            for subj, stype, f in fs.facts:
                kb_facts.add((subj, f.pred, f.obj_surface, stype))

    for p in range(n_pages):
        row, chosen = _page_record(p, per_lo, per_hi, org_lo, org_hi,
                                   base_url, fill_text=True)
        url = row["url"]
        urls.append(row["url"])
        tss.append(row["warc_ts"])
        htmls.append(row["html"])
        texts.append(row["text"])
        langs.append(row["lang"])
        # gold bookkeeping: sent_idx offset +1 because the extracted text's
        # first line is the <h1> boilerplate (it contains no sentences the
        # splitter keeps separate... it is its own line => sentence 0)
        for s_i, fs in enumerate(chosen):
            for subj, stype, f in fs.facts:
                key = (subj, f.pred, f.obj_norm.lower())
                if key not in gold:
                    gold[key] = {
                        "subj": subj,
                        "subj_type": stype,
                        "pred": f.pred,
                        "obj": f.obj_norm,
                        "obj_type": f.obj_type,
                        "doc_id": url,
                        "sent_idx": s_i + 1,
                    }

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    kb_rows = sorted(kb_facts)
    kb = pa.table(
        {
            "entity_id": pa.array(
                [f"E{n:06d}" for n in range(len(kb_rows))], pa.string()
            ),
            "entity_name": pa.array([s for s, _, _, _ in kb_rows], pa.string()),
            "rel": pa.array([r for _, r, _, _ in kb_rows], pa.string()),
            "slot_value": pa.array([v for _, _, v, _ in kb_rows], pa.string()),
        }
    )
    gold_rows = sorted(gold.values(), key=lambda d: (d["subj"], d["pred"], d["obj"]))
    gold_tbl = pa.table(
        {
            "subj": pa.array([g["subj"] for g in gold_rows], pa.string()),
            "subj_type": pa.array([g["subj_type"] for g in gold_rows], pa.string()),
            "pred": pa.array([g["pred"] for g in gold_rows], pa.string()),
            "obj": pa.array([g["obj"] for g in gold_rows], pa.string()),
            "obj_type": pa.array([g["obj_type"] for g in gold_rows], pa.string()),
            "doc_id": pa.array([g["doc_id"] for g in gold_rows], pa.string()),
            "sent_idx": pa.array([g["sent_idx"] for g in gold_rows], pa.int32()),
        }
    )
    return Corpus(pages=pages, kb=kb, gold=gold_tbl,
                  dicts=corpus_dictionaries(), clusters=corpus_clusters())
