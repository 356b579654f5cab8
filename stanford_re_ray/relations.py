"""Closed schema vocabularies of the KBP slot-filling data model.

Transcribed (values only, not code) from the reference's enum-driven schema:

- 18 NER tags: ``kbp/slotfilling/common/NERTag.java:8-27``
- 41 relations with subject type / cardinality / valid object NER types /
  valid object POS prefixes / training prior:
  ``kbp/slotfilling/common/RelationType.java:15-59``
- ``plausibleOverlappingRelations`` compatibility table:
  ``RelationType.java:265-291``
- ``slotTypeToRelations`` (derived): ``RelationType.java:292-300``

These are plain Python data (frozen dataclasses + dicts).  In pipelines they
are broadcast once via ``ray.put`` (they are tiny) and columns carrying them
are dictionary-encoded strings, never Python enums inside Arrow blocks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- NER tags (NERTag.java:8-27) -------------------------------------------

NER_TAGS: dict[str, str] = {
    # canonical name -> short serialized name
    "CAUSE_OF_DEATH": "COD",
    "CITY": "CIT",
    "COUNTRY": "CRY",
    "CRIMINAL_CHARGE": "CC",
    "DATE": "DT",
    "IDEOLOGY": "IDY",
    "LOCATION": "LOC",
    "MISC": "MSC",
    "MODIFIER": "MOD",
    "NATIONALITY": "NAT",
    "NUMBER": "NUM",
    "ORGANIZATION": "ORG",
    "PERSON": "PER",
    "RELIGION": "REL",
    "STATE_OR_PROVINCE": "ST",
    "TITLE": "TIT",
    "URL": "URL",
    "DURATION": "DUR",
}

#: Only PERSON / ORGANIZATION can be subjects (NERTag.isEntityType,
#: NERTag.java:87-89).
ENTITY_TYPES = ("PERSON", "ORGANIZATION")

#: Tag used for the "no relation" class in classifiers
#: (reference uses RelationMention.UNRELATED / the NIL label).
NO_RELATION = "_NR"


@dataclass(frozen=True)
class Relation:
    """One KBP relation's metadata (RelationType.java:15-59)."""

    name: str                      # canonical 2010 name, e.g. "per:spouse"
    subject_type: str              # PERSON | ORGANIZATION
    cardinality: str               # "SINGLE" | "LIST"
    object_types: frozenset[str]   # valid object NER tags
    pos_prefixes: frozenset[str]   # valid object POS prefixes
    prior: float                   # empirical training prior

    @property
    def is_single(self) -> bool:
        return self.cardinality == "SINGLE"


def _rel(name, subj, card, objs, pos, prior):
    return Relation(name, subj, card, frozenset(objs), frozenset(pos), prior)


#: The 41 relations, in the reference's declaration order
#: (RelationType.java:16-58).
RELATIONS: tuple[Relation, ...] = (
    _rel("per:alternate_names", "PERSON", "LIST", ["PERSON", "MISC"], ["NNP"], 0.0353027270308107100),
    _rel("per:children", "PERSON", "LIST", ["PERSON"], ["NNP"], 0.0058428110284504410),
    _rel("per:cities_of_residence", "PERSON", "LIST", ["CITY", "LOCATION"], ["NNP"], 0.0136105679675116560),
    _rel("per:city_of_birth", "PERSON", "SINGLE", ["CITY", "LOCATION", "STATE_OR_PROVINCE"], ["NNP"], 0.0358146961159769100),
    _rel("per:city_of_death", "PERSON", "SINGLE", ["CITY", "LOCATION", "STATE_OR_PROVINCE"], ["NNP"], 0.0102003332137774650),
    _rel("per:countries_of_residence", "PERSON", "LIST", ["COUNTRY", "LOCATION"], ["NNP"], 0.0107788293552082020),
    _rel("per:country_of_birth", "PERSON", "SINGLE", ["COUNTRY", "LOCATION", "NATIONALITY"], ["NNP"], 0.0223444134627622040),
    _rel("per:country_of_death", "PERSON", "SINGLE", ["COUNTRY", "LOCATION", "NATIONALITY"], ["NNP"], 0.0060626395621941200),
    _rel("per:employee_of", "PERSON", "LIST", ["ORGANIZATION", "COUNTRY", "STATE_OR_PROVINCE"], ["NNP"], 0.0335281901169719200),
    _rel("per:member_of", "PERSON", "LIST", ["ORGANIZATION"], ["NNP"], 0.0521716745149309900),
    _rel("per:origin", "PERSON", "LIST", ["NATIONALITY", "COUNTRY", "LOCATION"], ["NNP"], 0.0069795559463618380),
    _rel("per:other_family", "PERSON", "LIST", ["PERSON"], ["NNP"], 2.7478566717959990e-5),
    _rel("per:parents", "PERSON", "LIST", ["PERSON"], ["NNP"], 0.0032222235077692030),
    _rel("per:schools_attended", "PERSON", "LIST", ["ORGANIZATION"], ["NNP"], 0.0054696810172276150),
    _rel("per:siblings", "PERSON", "LIST", ["PERSON"], ["NNP"], 1.0e-99),
    _rel("per:spouse", "PERSON", "LIST", ["PERSON"], ["NNP"], 0.0164075968113292680),
    _rel("per:stateorprovince_of_birth", "PERSON", "SINGLE", ["STATE_OR_PROVINCE", "LOCATION", "COUNTRY"], ["NNP"], 0.0165825918941120660),
    _rel("per:stateorprovince_of_death", "PERSON", "SINGLE", ["STATE_OR_PROVINCE", "LOCATION", "COUNTRY"], ["NNP"], 0.0050083303444366030),
    _rel("per:stateorprovinces_of_residence", "PERSON", "LIST", ["STATE_OR_PROVINCE", "LOCATION", "COUNTRY"], ["NNP"], 0.0066787379528178550),
    _rel("per:age", "PERSON", "SINGLE", ["NUMBER", "DURATION"], ["CD", "NN"], 0.0483159977322951300),
    _rel("per:date_of_birth", "PERSON", "SINGLE", ["DATE"], ["CD", "NN"], 0.0743584477791533200),
    _rel("per:date_of_death", "PERSON", "SINGLE", ["DATE"], ["CD", "NN"], 0.0189819046406960460),
    _rel("per:cause_of_death", "PERSON", "SINGLE", ["CAUSE_OF_DEATH"], ["NN"], 1.0123682475037891e-5),
    _rel("per:charges", "PERSON", "LIST", ["CRIMINAL_CHARGE"], ["NN"], 3.8614617440501670e-4),
    _rel("per:religion", "PERSON", "SINGLE", ["RELIGION"], ["NN"], 7.6650738739572610e-4),
    _rel("per:title", "PERSON", "LIST", ["TITLE", "ORGANIZATION", "MODIFIER"], ["NN"], 0.0334283995325751200),
    _rel("org:alternate_names", "ORGANIZATION", "LIST", ["ORGANIZATION", "MISC"], ["NNP"], 0.0552058867767352000),
    _rel("org:city_of_headquarters", "ORGANIZATION", "SINGLE", ["CITY", "LOCATION", "STATE_OR_PROVINCE"], ["NNP"], 0.0555949254318473740),
    _rel("org:country_of_headquarters", "ORGANIZATION", "SINGLE", ["COUNTRY", "LOCATION", "NATIONALITY"], ["NNP"], 0.0580217167451493100),
    _rel("org:founded_by", "ORGANIZATION", "LIST", ["PERSON", "ORGANIZATION"], ["NNP"], 0.0050806423621154450),
    _rel("org:member_of", "ORGANIZATION", "LIST", ["ORGANIZATION", "LOCATION", "COUNTRY", "STATE_OR_PROVINCE"], ["NNP"], 0.0396298781687126140),
    _rel("org:members", "ORGANIZATION", "LIST", ["ORGANIZATION", "COUNTRY"], ["NNP"], 0.0012220730987724312),
    _rel("org:parents", "ORGANIZATION", "LIST", ["ORGANIZATION", "LOCATION", "COUNTRY", "STATE_OR_PROVINCE"], ["NNP"], 0.0550048593675880200),
    _rel("org:political/religious_affiliation", "ORGANIZATION", "LIST", ["IDEOLOGY", "RELIGION"], ["NN", "JJ"], 0.0059266929689578970),
    _rel("org:shareholders", "ORGANIZATION", "LIST", ["PERSON", "ORGANIZATION"], ["NNP"], 1.1569922828614734e-5),
    _rel("org:stateorprovince_of_headquarters", "ORGANIZATION", "SINGLE", ["STATE_OR_PROVINCE", "LOCATION", "COUNTRY"], ["NNP"], 0.0312619314829170100),
    _rel("org:subsidiaries", "ORGANIZATION", "LIST", ["ORGANIZATION"], ["NNP"], 0.0162412791706679320),
    _rel("org:top_members/employees", "ORGANIZATION", "LIST", ["PERSON"], ["NNP"], 0.0907168724184609800),
    _rel("org:dissolved", "ORGANIZATION", "SINGLE", ["DATE"], ["CD", "NN"], 0.0023877428237553656),
    _rel("org:founded", "ORGANIZATION", "SINGLE", ["DATE"], ["CD", "NN"], 0.0796314401082944800),
    _rel("org:number_of_employees/members", "ORGANIZATION", "SINGLE", ["NUMBER"], ["CD", "NN"], 0.0366274831946870950),
    _rel("org:website", "ORGANIZATION", "SINGLE", ["URL"], ["NNP"], 0.0051544006201478640),
)

RELATION_BY_NAME: dict[str, Relation] = {r.name: r for r in RELATIONS}
RELATION_NAMES: tuple[str, ...] = tuple(r.name for r in RELATIONS)

#: slot NER tag -> relations accepting it as object (RelationType.java:292-300)
SLOT_TYPE_TO_RELATIONS: dict[str, frozenset[str]] = {
    tag: frozenset(r.name for r in RELATIONS if tag in r.object_types)
    for tag in NER_TAGS
}

# --- plausibleOverlappingRelations (RelationType.java:265-291) --------------
# rel -> set of other relations that may legitimately co-occur for the same
# (subject, object) pair.  The table below is the reference's asymmetric map;
# ``plausibly_cooccurs`` symmetrizes it exactly like
# RelationType.plausiblyCooccursWith does.

_POR: dict[str, tuple[str, ...]] = {
    "per:stateorprovince_of_death": ("per:stateorprovinces_of_residence",),
    "per:stateorprovince_of_birth": ("per:stateorprovinces_of_residence", "per:stateorprovince_of_death"),
    "per:spouse": ("per:title", "per:stateorprovince_of_birth"),
    "per:schools_attended": ("per:stateorprovinces_of_residence", "per:stateorprovince_of_birth"),
    "per:parents": ("per:spouse",),
    "per:member_of": ("per:stateorprovinces_of_residence", "per:stateorprovince_of_death", "per:stateorprovince_of_birth", "per:spouse", "per:schools_attended", "per:origin"),
    "per:employee_of": ("per:stateorprovinces_of_residence", "per:stateorprovince_of_death", "per:stateorprovince_of_birth", "per:schools_attended", "per:member_of"),
    "per:date_of_birth": ("per:date_of_death",),
    "per:country_of_death": ("per:stateorprovince_of_birth", "per:member_of", "per:employee_of"),
    "per:country_of_birth": ("per:stateorprovince_of_birth", "per:schools_attended", "per:member_of", "per:employee_of", "per:country_of_death"),
    "per:countries_of_residence": ("per:stateorprovince_of_birth", "per:schools_attended", "per:member_of", "per:employee_of", "per:country_of_death", "per:country_of_birth"),
    "per:city_of_death": ("per:stateorprovince_of_death", "per:stateorprovince_of_birth", "per:schools_attended", "per:member_of", "per:employee_of", "per:country_of_death", "per:country_of_birth"),
    "per:city_of_birth": ("per:stateorprovince_of_death", "per:stateorprovince_of_birth", "per:spouse", "per:schools_attended", "per:member_of", "per:employee_of", "per:country_of_birth", "per:countries_of_residence", "per:city_of_death"),
    "per:cities_of_residence": ("per:stateorprovinces_of_residence", "per:stateorprovince_of_birth", "per:schools_attended", "per:member_of", "per:employee_of", "per:city_of_death", "per:city_of_birth"),
    "per:children": ("per:spouse", "per:parents", "per:city_of_death"),
    "per:alternate_names": ("per:stateorprovince_of_birth", "per:spouse", "per:parents", "per:origin", "per:member_of", "per:country_of_birth", "per:city_of_death", "per:city_of_birth", "per:children"),
    "org:subsidiaries": ("org:top_members/employees",),
    "org:stateorprovince_of_headquarters": ("org:top_members/employees", "org:subsidiaries"),
    "org:parents": ("org:top_members/employees", "org:stateorprovince_of_headquarters"),
    "org:member_of": ("org:top_members/employees", "org:subsidiaries", "org:stateorprovince_of_headquarters", "org:political/religious_affiliation", "org:parents", "org:members"),
    "org:founded_by": ("org:top_members/employees", "org:subsidiaries", "org:stateorprovince_of_headquarters", "org:political/religious_affiliation", "org:parents"),
    "org:founded": ("org:number_of_employees/members",),
    "org:dissolved": ("org:number_of_employees/members", "org:founded"),
    "org:country_of_headquarters": ("org:top_members/employees", "org:subsidiaries", "org:stateorprovince_of_headquarters", "org:parents", "org:members", "org:member_of", "org:founded_by"),
    "org:city_of_headquarters": ("org:top_members/employees", "org:subsidiaries", "org:stateorprovince_of_headquarters", "org:parents", "org:member_of", "org:founded_by", "org:country_of_headquarters"),
    "org:alternate_names": ("org:top_members/employees", "org:stateorprovince_of_headquarters", "org:political/religious_affiliation", "org:founded_by", "org:country_of_headquarters", "org:city_of_headquarters"),
}

PLAUSIBLE_OVERLAPPING: dict[str, frozenset[str]] = {
    r.name: frozenset(_POR.get(r.name, ())) for r in RELATIONS
}


def plausibly_cooccurs(rel_a: str, rel_b: str) -> bool:
    """Whether two relations may co-occur on the same (subj, obj) pair.

    Symmetric closure of the table, matching
    ``RelationType.plausiblyCooccursWith``.
    """
    if rel_a == rel_b:
        return True
    return rel_b in PLAUSIBLE_OVERLAPPING[rel_a] or rel_a in PLAUSIBLE_OVERLAPPING[rel_b]


def subject_type_for_relation(rel: str) -> str:
    """Entity-type coercion by relation prefix (FeatureFactory.findTrueNERTag,
    FeatureFactory.java:620-636): org:* => ORGANIZATION, per:* => PERSON."""
    return "ORGANIZATION" if rel.startswith("org:") else "PERSON"


# --- official output surface renames (OfficialOutputWriter.java:144-198) ----
# 2013 merges; keyed by canonical name.  Used only by the official-format
# writer; the engine's internal predicate column always carries canonical
# names.
OFFICIAL_2013_RENAMES: dict[str, str] = {
    "per:member_of": "per:employee_or_member_of",
    "per:employee_of": "per:employee_or_member_of",
    "per:stateorprovince_of_birth": "per:stateorprovince_of_birth",
    "org:political/religious_affiliation": "org:political_religious_affiliation",
    "org:top_members/employees": "org:top_members_employees",
    "org:number_of_employees/members": "org:number_of_employees_members",
}


def official_relation_name(rel: str, year: int = 2013) -> str:
    if year >= 2013:
        return OFFICIAL_2013_RENAMES.get(rel, rel)
    return rel
