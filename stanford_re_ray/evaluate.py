"""Scoring harness — the CustomSFScore analog
(kbp/sf/evaluate/CustomSFScore.java:159-230; judgement codes at 37-40).

Scores emitted triples against golden triples with ``anydoc=true``
semantics (CustomSFScore.java:184-185): a guess is CORRECT if
``(subj, pred, normalized obj)`` matches a gold row, regardless of the
provenance document.  Precision over guesses, recall over gold keys.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa


@dataclass
class Score:
    precision: float
    recall: float
    f1: float
    n_guess: int
    n_gold: int
    n_correct: int
    false_positives: list[tuple]
    false_negatives: list[tuple]


def _key_set(tbl: pa.Table) -> set[tuple[str, str, str]]:
    return {
        (s, p, o.lower())
        for s, p, o in zip(
            tbl.column("subj").to_pylist(),
            tbl.column("pred").to_pylist(),
            tbl.column("obj").to_pylist(),
        )
    }


def score_triples(guess: pa.Table, gold: pa.Table) -> Score:
    g = _key_set(guess)
    d = _key_set(gold)
    correct = g & d
    p = len(correct) / max(1, len(g))
    r = len(correct) / max(1, len(d))
    f1 = 2 * p * r / max(1e-12, p + r)
    return Score(
        precision=p,
        recall=r,
        f1=f1,
        n_guess=len(g),
        n_gold=len(d),
        n_correct=len(correct),
        false_positives=sorted(g - d)[:50],
        false_negatives=sorted(d - g)[:50],
    )
