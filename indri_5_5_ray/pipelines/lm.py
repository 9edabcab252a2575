"""Language-model retrieval — Indri's DEFAULT scoring path.

``#combine(t1 … tn)`` over bag-of-words = WeightedAndNode with weights 1/n →
the document score is the MEAN of per-child log-probabilities
(ref:src/InferenceNetworkBuilder.cpp:891, ref:src/WeightedAndNode.cpp).
Duplicated query terms are separate children (no qtf collapsing in the
default path), so a duplicate contributes its log twice.

Smoothing functions (ref:src/TermScoreFunctionFactory.cpp:42-78):

* dirichlet (default, mu=2500):  log((tf + mu·P(t|C)) / (dl + mu))
  (ref:include/indri/DirichletTermScoreFunction.hpp:44-47)
* jelinek-mercer (lambda=0.4):   log((1-λ)·tf/dl + λ·P(t|C))
  (ref:include/indri/JelinekMercerTermScoreFunction.hpp)

with P(t|C) = cf/|C|, |C| = total term count including stopped slots, and
zero-cf terms given P = 1/(2·|C|) (ref:src/TermScoreFunctionFactory.cpp:52-53).
Candidates are docs matching ≥1 query term (the DAAT union,
ref:src/InferenceNetwork.cpp:285-332) — absent terms contribute their
background probability to candidate docs.  Tie-break identical to BM25:
score desc → doc_id desc.
"""

from __future__ import annotations

import numpy as np

from ..config import IndexConfig
from ..stages.ingest import TermProcessor
from ..tokenizer import tokenize
from .query import IndexReader, _topk


def process_query_lm(text: str, cfg: IndexConfig,
                     proc: TermProcessor | None = None) -> list[str]:
    """Query text → child term list (duplicates preserved, stopped dropped)."""
    proc = proc or TermProcessor(cfg)
    out = []
    for raw in tokenize(text, cfg.tokenizer):
        term = proc.process(raw)
        if term is not None:
            out.append(term)
    return out


class LMScorer:
    """Dirichlet / Jelinek-Mercer #combine scorer (exhaustive union DAAT)."""

    _METHODS = ("dirichlet", "jm", "linear", "jelinek-mercer", "two",
                "two-stage", "twostage")

    def __init__(self, reader: IndexReader, method: str = "dirichlet",
                 mu: float = 2500.0, lam: float = 0.4):
        if method not in self._METHODS:
            raise ValueError(f"unknown smoothing method {method!r} "
                             f"(one of {self._METHODS})")
        self.r = reader
        self.method = method
        self.mu = mu
        self.lam = lam

    def score(self, terms: list[str], k: int = 1000,
              doc_range: tuple[int, int] | None = None
              ) -> tuple[np.ndarray, np.ndarray]:
        if not terms:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        # #combine = WeightedAnd with weights 1 then a mean — keep the
        # sum-then-divide order so scores are bitwise-stable vs the oracles
        return self.score_weighted([(t, 1.0) for t in terms], k,
                                   mean_of=len(terms), doc_range=doc_range)

    def score_weighted(self, term_weights: list[tuple[str, float]],
                       k: int = 1000, mean_of: int | None = None,
                       doc_range: tuple[int, int] | None = None
                       ) -> tuple[np.ndarray, np.ndarray]:
        """#weight-style scorer: Σ w_i · log P(t_i|d) over the DAAT union
        (weights as given — normalize upstream; ``mean_of=n`` divides the
        accumulated sum by n afterwards, the #combine mean).

        ``doc_range=(lo, hi)`` scores only that docID slice — the
        doc-partitioned scatter: statistics stay COLLECTION-global (so
        shard scores are identical to a global run), but postings reads
        are range-pruned and doc lengths load only the shard's slice."""
        if not term_weights:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        r = self.r
        uniq_terms = list(dict.fromkeys(t for t, _ in term_weights))
        stats = r.term_stats(uniq_terms)
        total = float(r.total_terms)
        # background model probability per term; zero-cf terms get 1/(2|C|)
        p_c = {
            t: (stats[t][0] / total if t in stats and stats[t][0] > 0 else 1.0 / (2.0 * total))
            for t in uniq_terms
        }
        rows = r.term_rows([t for t in uniq_terms if t in stats], doc_range)
        term_postings = decode_term_postings(rows)
        if not term_postings:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        cand = np.unique(np.concatenate([d for d, _ in term_postings.values()]))
        if doc_range is not None:
            cand = cand[(cand >= doc_range[0]) & (cand < doc_range[1])]
        cand = cand[r.keep_mask(cand)]
        if not len(cand):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        if doc_range is None:
            dl = r.doc_lens()[cand].astype(np.float64)
        else:
            dl = r.doc_lens_range(doc_range[0], doc_range[1])[
                cand - doc_range[0]].astype(np.float64)
        acc = np.zeros(len(cand), dtype=np.float64)
        for term, w in term_weights:  # children in query order, dups included
            tf = np.zeros(len(cand), dtype=np.float64)
            tp = term_postings.get(term)
            if tp is not None:
                d, t = tp
                # deleted docs were filtered out of cand but not out of the
                # postings — only assign where the posting doc survives
                pos = np.searchsorted(cand, d)
                pos_c = np.minimum(pos, len(cand) - 1)
                hit = cand[pos_c] == d
                tf[pos_c[hit]] = t[hit].astype(np.float64)
            bg = self.mu * p_c[term]
            if self.method == "dirichlet":
                child = np.log((tf + bg) / (dl + self.mu))
            elif self.method in ("two", "two-stage", "twostage"):
                # two-stage smoothing: dirichlet inner, JM outer
                # (ref:include/indri/TwoStageTermScoreFunction.hpp:39-48)
                dirichlet = (tf + bg) / (dl + self.mu)
                child = np.log((1.0 - self.lam) * dirichlet + self.lam * p_c[term])
            else:  # jelinek-mercer
                child = np.log((1.0 - self.lam) * tf / dl + self.lam * p_c[term])
            acc += child if w == 1.0 else w * child
        if mean_of:
            acc /= mean_of
        return _topk(cand, acc, k)


def decode_term_postings(rows) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """term_rows table → {term: (doc_ids, tfs)} — one decode pass in row
    order (shared by the LM scorers and RM3)."""
    from ..codec import decode_doc_tf_batch

    if not rows.num_rows:
        return {}
    row_terms = rows.column("term").to_pylist()
    payloads = rows.column("postings").to_pylist()
    offs = rows.column("block_offset").to_pylist()
    lens = rows.column("block_length").to_pylist()
    ndocs = rows.column("block_n_docs").to_pylist()
    parts: dict[str, tuple[list, list]] = {}
    for ri, rt in enumerate(row_terms):
        d, tf = decode_doc_tf_batch(payloads[ri], offs[ri], lens[ri], ndocs[ri])
        e = parts.setdefault(rt, ([], []))
        e[0].append(d)
        e[1].append(tf)
    return {t: (np.concatenate(a), np.concatenate(b))
            for t, (a, b) in parts.items()}
