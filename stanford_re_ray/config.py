"""Pipeline configuration + stage registry — the user-extension surface.

The reference's knobs are ``@Option`` statics populated from
properties/HOCON (kbp/sf/common/Props.java, 518 lines; SlotfillingSystem
.exec — SURVEY.md §2.12); its model registry constructs classifiers by
reflection (ModelType.java:12-92), and annotators/post-processors compose
via lists (KBPProcess.java:180-190, SlotfillPostProcessor.and()).

Here: one dataclass holding the semantics knobs the reference exposes
(feature set, caps, thresholds, sampling ratios, consistency toggles), a
``STAGE_REGISTRY`` mapping stage names to callables so users can insert /
replace stages by name, and a scorer registry for the model zoo.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class PipelineConfig:
    # S1 extract
    lang: str = "en"                       # language filter ("" = keep all)
    # S2 NLP
    max_sentences_per_doc: int = 512
    nlp_mode: str = "tasks"                # "tasks" | "actors"
    nlp_concurrency: Any = None            # actor-pool bounds when "actors"
    # S3/S4 mentions + pairs (reference caps)
    max_pair_distance: int = 25            # RelationMentionAnnotator.closeEnough
    max_sent_tokens: int = 150             # PreFeaturizerAnnotator.java:99
    use_cluster_features: bool = True
    # S5 classify
    keep_threshold: float = 0.5            # OneVsAll p>0.5 keep rule
    use_rules: bool = False                # TokenRegex-style additions
    sentence_competition: bool = False     # RelationFilter (off by default,
                                           # Props.java:289-295)
    #: RelationFilter component chain applied per (doc, subject) scope
    #: between scoring and bag formation, in order; any of "coref",
    #: "per_reltype", "cross_reltype" (RelationFilter.java:297-480).
    #: Empty = filter disabled (the reference default).
    relation_filter_components: tuple = ()
    # training (KBPTrainer knobs)
    negative_subsample: float = 0.10       # Props.java:148-149
    feature_count_threshold: int = 5       # Props.java:146-147
    epochs: int = 150
    # S7 consistency
    enforce_cardinality: bool = True
    enforce_incompatibilities: bool = True
    max_slot_len: int = 80                 # SanityCheckFilter
    entailment: bool = False               # pass-2 chain (entailment closure
                                           # + global filters) — OFF by
                                           # default: the fork short-circuits
                                           # pass 2 (SimpleSlotFiller);
                                           # InferentialSlotFiller turns it on
    gibbs_objective: str = "top"           # "top" (default — skips Gibbs,
                                           # Props.java GibbsObjective) |
                                           # "sum" (sampled Σ-score filter)
    gibbs_mixing_time: int = 1000          # Props.java:249-250
    # S8 graph
    n_salt: int = 1                        # canonicalization skew salting
    max_cluster: int = 150                 # TEST_GRAPH_MAXSIZE analog
    symmetrize: bool = False
    add_inverses: bool = False
    # shuffles
    n_buckets: int | None = None           # explicit bucket count wins;
    est_rows: int | None = None            # else size-derived from this
                                           # row estimate (resolve_n_buckets;
                                           # bare default 64)
    # official output
    year: int = 2013
    run_id: str = "ray_kg_1"


#: stage name → callable factory; users may replace or extend
#: (the ModelType / annotator-list registry analog).  Values are the
#: module-level functions so a replacement only needs the same signature.
def _default_registry() -> dict[str, Callable]:
    from .pipelines import kg

    return {
        "extract": kg.extract_stage,
        "nlp": kg.nlp_stage,
        "pairs": kg.pairs_stage,
        "score": kg.score_stage,
        "bags": kg.bag_stage,
        "consistency": kg.consistency_stage,
        "nodes": kg.nodes_stage,
        "edges": kg.edges_stage,
    }


STAGE_REGISTRY: dict[str, Callable] = {}


def get_stage(name: str) -> Callable:
    if not STAGE_REGISTRY:
        STAGE_REGISTRY.update(_default_registry())
    return STAGE_REGISTRY[name]


def register_stage(name: str, fn: Callable) -> None:
    """Replace / add a pipeline stage by name (user-extension hook)."""
    if not STAGE_REGISTRY:
        STAGE_REGISTRY.update(_default_registry())
    STAGE_REGISTRY[name] = fn


#: scorer registry — the ModelType enum analog.  "lr" is the default
#: (LR_INC, Props.java:144-145); "rules" is the TOKENREGEX analog;
#: "ensemble" combines both (EnsembleRelationExtractor analog).
SCORER_REGISTRY: dict[str, str] = {
    "lr": "stanford_re_ray.stages.classify:MentionScorer",
    "rules": "stanford_re_ray.stages.rules:RuleExtractor",
    "hoffmann": "stanford_re_ray.stages.classify:HoffmannScorer",
}
