"""TREC-style retrieval evaluation — qrels scoring (MAP, P@k, nDCG@k).

The reference bundles TREC adhoc qrels as its regression artifacts
(``dumpindex/qrels.trec9.adhoc`` etc., format ``topic 0 docno rel`` /
``topic docno rel``, SURVEY.md §5); this module reads that format and scores
a run (the ``trec_eval`` role)."""

from __future__ import annotations

import math
from collections import defaultdict


def parse_qrels(lines) -> dict[str, dict[str, int]]:
    """``topic [iter] docno rel`` lines → {qid: {docno: rel}}."""
    out: dict[str, dict[str, int]] = defaultdict(dict)
    for line in lines:
        parts = line.split()
        if len(parts) == 4:
            qid, _it, docno, rel = parts
        elif len(parts) == 3:
            qid, docno, rel = parts
        else:
            continue
        out[qid][docno] = int(rel)
    return dict(out)


def evaluate_run(
    run: dict[str, list[str]], qrels: dict[str, dict[str, int]], k: int = 10
) -> dict[str, float]:
    """run = {qid: ranked docnos}. Returns MAP, P@k, nDCG@k averaged over
    topics present in both."""
    aps, pks, ndcgs = [], [], []
    for qid, ranked in run.items():
        rels = qrels.get(qid)
        if rels is None:
            continue
        n_rel = sum(1 for r in rels.values() if r > 0)
        hits = 0
        ap = 0.0
        for i, docno in enumerate(ranked):
            if rels.get(docno, 0) > 0:
                hits += 1
                ap += hits / (i + 1)
        aps.append(ap / n_rel if n_rel else 0.0)
        pks.append(sum(1 for d in ranked[:k] if rels.get(d, 0) > 0) / k)
        dcg = sum(
            (2 ** rels.get(d, 0) - 1) / math.log2(i + 2)
            for i, d in enumerate(ranked[:k])
        )
        ideal = sorted((r for r in rels.values() if r > 0), reverse=True)[:k]
        idcg = sum((2 ** r - 1) / math.log2(i + 2) for i, r in enumerate(ideal))
        ndcgs.append(dcg / idcg if idcg else 0.0)
    n = len(aps) or 1
    return {
        "map": sum(aps) / n,
        f"p_at_{k}": sum(pks) / n,
        f"ndcg_at_{k}": sum(ndcgs) / n,
        "topics": len(aps),
    }
