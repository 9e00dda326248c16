"""Conformance scoring: triple precision/recall vs expected graph.

The north_rule gate is P/R >= 0.95 vs the reference's emitted triples. The
reference's extraction is LLM-backed (no network here), so per SURVEY.md §5
both sides run the deterministic extractor: the *expected* side is a pure
in-memory re-computation (this module) over the closed-form raw truth
triples of the synthetic corpus; the *actual* side is the full distributed
pipeline. The canonicalization functions are shared, so the gate measures
the distributed dataflow (chunking, dedup shuffles, salted groupby,
broadcast rewrite), not the normalizer.
"""

from __future__ import annotations

from collections import defaultdict

from kg_gen_ray.stages.canonicalize import choose_representative, normalize_label


def expected_canonical(raw_triples: set) -> set:
    """Pure in-memory canonicalization of a raw (subj, pred, obj) set —
    the same semantics as the distributed flow in
    :mod:`kg_gen_ray.stages.canonicalize` + :mod:`kg_gen_ray.stages.rewrite`.
    """
    entities = {s for s, _, _ in raw_triples} | {o for _, _, o in raw_triples}
    preds = {p for _, p, _ in raw_triples}

    def alias(labels):
        groups = defaultdict(list)
        for lbl in labels:
            groups[normalize_label(lbl)].append(lbl)
        out = {}
        for members in groups.values():
            rep = choose_representative(members)
            for m in members:
                out[m] = rep
        return out

    ea = alias(entities)
    pa_ = alias(preds)
    return {(ea[s], pa_[p], ea[o]) for s, p, o in raw_triples}


def precision_recall(actual: set, expected: set) -> dict:
    tp = len(actual & expected)
    precision = tp / len(actual) if actual else 1.0
    recall = tp / len(expected) if expected else 1.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "n_actual": len(actual), "n_expected": len(expected), "tp": tp}
