"""Element-level (per-extent) retrieval and the INEX result surface.

The reference's ``runQuery`` returns ``ScoredExtentResult{score, document,
begin, end}`` (ref:include/indri/ScoredExtentResult.hpp:30-46): under an
extent restriction ``#op[f](...)`` every extent of ``f`` is scored
separately (ExtentRestrictionNode, ref:src/ExtentRestrictionNode.cpp;
built at ref:src/InferenceNetworkBuilder.cpp:152), under fixed-passage
retrieval every sliding window is (FixedPassageNode, ref:src/
InferenceNetworkBuilder.cpp:170), and a plain document query carries
``begin = end = 0`` (the two-argument ScoredExtentResult constructor,
ref:include/indri/ScoredExtentResult.hpp:60-82).

:class:`~.indriql.StructuredQueryEngine` collapses per-extent scores to
document scores (union of extents / best passage per doc — documented at
``indriql.py`` module docstring); this module is the per-extent surface
on the same index data:

* :func:`run_extents` ranks ``(doc, begin, end)`` triples with the
  reference's exact tie order ``score desc → doc desc → begin desc →
  end desc`` (``ScoredExtentResult::score_greater``,
  ref:include/indri/ScoredExtentResult.hpp:31-46);
* :func:`element_paths` maps result extents to INEX element paths
  (``/sec[1]/p[1]/title[1]``) with the reference's greedy leaf descent
  and same-type sibling numbering (ref:src/DocumentStructure.cpp:261-330
  ``findLeaf``/``path``, served by ref:src/LocalQueryServer.cpp:443-488
  ``pathNames``);
* :func:`format_inex` emits the ``<inex-submission>`` XML of runquery's
  ``-inex`` mode (ref:runquery/IndriRunQuery.cpp:467-478 result blocks,
  :504-521 topic wrapper, :731-745/774-776 submission envelope).

Smoothing statistics are IDENTICAL to the document-level engine: a term
under ``#op[f]`` draws its background from the term's collection
frequency *within the field context* over the field's total length (the
ContextCountAccumulator pair, ref:src/ContextCountAccumulator.cpp:90-131)
— only the foreground count and the smoothing length become per-extent.
Single-extent documents therefore score bit-identically to the document
path (asserted in tests/test_extents.py).

Scale: evaluation is per-candidate-document over the DAAT union, the
same shape as the document-level engine; at corpus scale it shards by
doc-range through ``pipelines.run`` exactly like every other query (the
statistics are collection-global and extent data reads are range-pruned
by ``IndexReader.field_extents``).

Scope: the inner tree may use terms, wildcards, ``#syn``/``#wsyn``,
``#band``, ``#odN``/``#N``/``#uwN``, ``#combine``/``#weight``/``#wsum``/
``#max``/``#or``/``#not``, ``#prior``, ``#filreq``/``#filrej``, and the
support-path shape ``#max(#combine[.path](terms))`` (the NEXI
``about(.//f, terms)`` clause — each outer extent scores as the best
anchored path extent, MaxNode semantics) and numeric/date predicates
(the arithmetic clause — count = satisfying field extents contained in
the evaluation extent).  Other nested extent restrictions and passages
inside an element-level root raise ``ValueError`` (the document-level
engine covers those shapes).
"""
from __future__ import annotations

import numpy as np

from .indriql import (
    Node,
    StructuredQueryEngine,
    _NUM_PREDS,
    ordered_window_extents,
    parse_query,
    unordered_window_extents,
)

__all__ = ["run_extents", "run_extents_wildcard", "run_extents_path",
           "run_nested_extents", "element_paths", "format_inex"]


def _as_engine(reader_or_engine, method: str, mu: float, lam: float
               ) -> StructuredQueryEngine:
    if isinstance(reader_or_engine, StructuredQueryEngine):
        return reader_or_engine
    return StructuredQueryEngine(reader_or_engine, method=method, mu=mu,
                                 lam=lam)


def _ensure_full_postings(eng: StructuredQueryEngine, *nodes: Node) -> None:
    """Fetch (or reuse the engine memo for) the FULL positional postings of
    every leaf term under ``nodes`` and install them as ``eng._postings``
    — the shared prelude of every element-retrieval entry point (same memo
    key convention as ``StructuredQueryEngine.run``)."""
    leafs: set[str] = set()
    for node in nodes:
        eng._leaf_terms(node, leafs)
    terms_key = tuple(sorted(leafs))
    cached = eng._postings_memo.get((terms_key,) + (True,))
    if cached is None:
        if len(eng._postings_memo) > 8:
            eng._postings_memo.clear()
        cached = eng._fetch_postings(list(terms_key), None,
                                     need_positions=True)
        eng._postings_memo[(terms_key,) + (True,)] = cached
    eng._postings = cached



def _csr_gather(csr, cand: np.ndarray):
    """Gather a field CSR's per-doc runs for the (sorted) candidate docs:
    ``(kept_mask_over_cand, lens, flat_row_index)`` — ``None`` when the
    field has no extents at all.  One helper so the empty-array guard and
    the ragged-gather arithmetic exist exactly once."""
    fdocs, fstarts = csr[0], csr[1]
    if not len(fdocs):
        return None
    didx = np.searchsorted(fdocs, cand)
    has = (didx < len(fdocs)) & (
        fdocs[np.minimum(didx, len(fdocs) - 1)] == cand)
    di = didx[has]
    lens = fstarts[di + 1] - fstarts[di]
    total = int(lens.sum())
    out_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    gather = (np.arange(total, dtype=np.int64)
              - np.repeat(out_starts, lens)
              + np.repeat(fstarts[di], lens))
    return has, lens, gather


def _gather_candidates(eng: StructuredQueryEngine, nodes,
                       doc_range: tuple[int, int] | None = None
                       ) -> np.ndarray:
    """Shared candidate prelude of every element-retrieval entry point:
    fetch full postings, union the nodes' candidate docs, slice to the
    optional docID range (the doc-partitioned scatter; statistics stay
    collection-global) and apply the deletion mask.  Empty result = no
    candidates (callers return their empties tuple)."""
    _ensure_full_postings(eng, *nodes)
    parts: list[np.ndarray] = []
    for n in nodes:
        eng._cand_docs(n, parts)
    parts = [p for p in parts if len(p)]
    if not parts:
        return np.empty(0, np.int64)
    cand = np.unique(np.concatenate(parts))
    if doc_range is not None:
        cand = cand[(cand >= doc_range[0]) & (cand < doc_range[1])]
    return cand[eng.r.keep_mask(cand)]


def run_extents(reader, query: str, k: int = 1000, method: str = "dirichlet",
                mu: float = 2500.0, lam: float = 0.4, strict: bool = True,
                doc_range: tuple[int, int] | None = None
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Element-level retrieval: ``(doc_ids, begins, ends, scores)`` of the
    top-``k`` scored extents under ``query``.

    ``#op[f](...)`` roots score every extent of ``f`` per candidate doc;
    ``#op[passageN:M](...)`` roots score every sliding window; any other
    query falls back to document scoring with ``begin = end = 0``
    (matching the reference's doc-level ScoredExtentResult).  ``reader``
    may be an :class:`IndexReader` or an already-constructed
    :class:`StructuredQueryEngine` (statistics memos then carry over).

    ``strict=False`` downgrades an element-unsupported inner tree (see
    module scope notes) to DOCUMENT results instead of raising — the
    CLI's inex/plain output modes use this so every accepted query still
    prints, just without element granularity.

    ``doc_range=(lo, hi)`` restricts CANDIDATES to a docID slice (the
    doc-partitioned scatter, same contract as
    ``StructuredQueryEngine.run``): statistics stay collection-global
    (postings are fetched in full, like the structured shard default),
    so a sharded merge is rank-identical to a global run."""
    eng = _as_engine(reader, method, mu, lam)
    root = parse_query(query)
    try:
        if root.op == "ctx" and not root.term.startswith("."):
            return _run_extent_root(eng, root.term, root.children[0], k,
                                    doc_range)
        if root.op == "passage":
            return _run_extent_root(eng, None, root, k, doc_range)
    except ValueError:
        if strict:
            raise
    ids, scores = eng.run(query, k=k, doc_range=doc_range)
    zero = np.zeros(len(ids), dtype=np.int64)
    return ids, zero, zero.copy(), scores


def _run_extent_root(eng: StructuredQueryEngine, field: str | None,
                     node: Node, k: int,
                     doc_range: tuple[int, int] | None = None):
    """Shared field-extent / passage-window evaluation.  ``field=None`` =
    passage mode (``node`` is the passage node, stats collection-global);
    else ``node`` is the inner scored tree and stats are field-context."""
    if field is not None:
        inner = node
    else:
        width, stride = node.n, int(node.weights[0])
        if width <= 0 or stride <= 0:
            raise ValueError("passage width/stride must be positive")
        inner = node.children[0]
    empties = (np.empty(0, np.int64), np.empty(0, np.int64),
               np.empty(0, np.int64), np.empty(0, np.float64))
    cand = _gather_candidates(eng, (inner,), doc_range)
    if not len(cand):
        return empties
    # per-candidate extents → flat (edoc, eb, ee) with per-doc offsets,
    # gathered vectorized from the field CSR (no per-doc Python)
    if field is not None:
        csr = eng._field_csr(field)
        g = _csr_gather(csr, cand)
        if g is None:
            return empties
        has, lens, gather = g
        cand = cand[has]
        if not len(cand):
            return empties
        eb_all = csr[2][gather]
        ee_all = csr[3][gather]
        # zero-length extents are skipped, never scored ("this field has
        # no text in it", ref:src/ExtentRestrictionNode.cpp:73-74 and
        # src/ExtentEnforcementNode.cpp:61-62)
        nz = ee_all > eb_all
        ecand = np.repeat(np.arange(len(cand), dtype=np.int64), lens)[nz]
        eb = eb_all[nz]
        ee = ee_all[nz]
        n_per = np.bincount(ecand, minlength=len(cand)).astype(np.int64)
        ext_start = np.zeros(len(cand) + 1, dtype=np.int64)
        np.cumsum(n_per, out=ext_start[1:])
        edoc = np.repeat(cand, n_per)
        if not len(eb):
            return empties
        ev = _ExtentEval(eng, field, cand, ext_start, eb, ee)
        beliefs = ev.belief(inner)
        keep = ev.matches(inner) & (beliefs > -np.inf)
        edoc, eb, ee, beliefs = (edoc[keep], eb[keep], ee[keep],
                                 beliefs[keep])
        order = np.lexsort((-ee, -eb, -edoc, -beliefs))[:k]
        return edoc[order], eb[order], ee[order], beliefs[order]
    # passage mode: sliding windows per doc, enumerated vectorized
    if doc_range is not None:  # shard workers hold O(span) dls only
        dl = eng.r.doc_lens_range(doc_range[0], doc_range[1])[
            cand - doc_range[0]].astype(np.int64)
    else:
        dl = eng.r.doc_lens()[cand].astype(np.int64)
    # windows start strictly inside the doc — the document path's
    # `valid = dl > start` guard (indriql._belief passage branch):
    # n_windows = ceil(dl / stride)
    n_per = (dl + stride - 1) // stride
    if not int(n_per.sum()):
        return empties
    ext_start = np.zeros(len(cand) + 1, dtype=np.int64)
    np.cumsum(n_per, out=ext_start[1:])
    total = int(n_per.sum())
    win_idx = (np.arange(total, dtype=np.int64)
               - np.repeat(ext_start[:-1], n_per))
    eb = win_idx * stride
    ee = np.minimum(eb + width, np.repeat(dl, n_per))
    edoc = np.repeat(cand, n_per)
    ev = _ExtentEval(eng, field, cand, ext_start, eb, ee)
    beliefs = ev.belief(inner)
    # extents where the scored tree has NO match are skipped, not
    # background-scored (ExtentRestrictionNode/FixedPassageNode gate every
    # extent on _child->hasMatch, ref:src/ExtentRestrictionNode.cpp:58-69,
    # ref:src/FixedPassageNode.cpp:52-59)
    keep = ev.matches(inner) & (beliefs > -np.inf)
    edoc, eb, ee, beliefs = edoc[keep], eb[keep], ee[keep], beliefs[keep]
    # ScoredExtentResult::score_greater: score desc, doc desc, begin desc,
    # end desc (ref:include/indri/ScoredExtentResult.hpp:31-46)
    order = np.lexsort((-ee, -eb, -edoc, -beliefs))[:k]
    return edoc[order], eb[order], ee[order], beliefs[order]


class _ExtentEval:
    """Belief recursion over a flat extent set.  Combiner arithmetic
    mirrors ``StructuredQueryEngine._belief`` expression for expression
    (pinned by the single-extent ≡ document-path identity test); counts
    and smoothing lengths are per-extent."""

    def __init__(self, eng: StructuredQueryEngine, field: str | None,
                 cand: np.ndarray, ext_start: np.ndarray,
                 eb: np.ndarray, ee: np.ndarray,
                 wild: tuple | None = None):
        self.eng = eng
        self.field = field
        self.cand = cand
        self.cand_list = cand.tolist()
        self.ext_start = ext_start
        self.eb = eb
        self.ee = ee
        self.n_ext = len(eb)
        self.eidx = np.repeat(np.arange(len(cand), dtype=np.int64),
                              np.diff(ext_start))  # extent → cand index
        self.dl_ext = (ee - eb).astype(np.float64)
        self.rfields = (field,) if field is not None else ()
        # FieldWildcard ctx: (docs, S, enc_ub, enc_ue, total) — encoded
        # outermost extents of every context field
        self.wild = wild
        if wild is not None:
            self.total = wild[4]  # _belief_from_counts floors total ≤ 0
        elif field is not None:
            st = eng.r.field_stats(field)
            self.total = float(st["total_len"]) if st else 0.0
        else:
            self.total = None  # collection-global
        self._count_memo: dict[int, np.ndarray] = {}

    # -- counts ------------------------------------------------------------

    def counts(self, node: Node) -> np.ndarray:
        hit = self._count_memo.get(id(node))
        if hit is None:
            hit = self._counts_uncached(node)
            self._count_memo[id(node)] = hit
        return hit

    def _counts_uncached(self, node: Node) -> np.ndarray:
        eng = self.eng
        if node.op == "term":
            term = eng._node_term(node)
            tp = eng._postings.get(term) if term else None
            if tp is None:
                return np.zeros(self.n_ext, dtype=np.float64)
            if tp[2] is not None:
                return self._term_counts_from_postings(tp)
            return self._position_counts(eng._positions_map(node))
        if node.op in ("wildcard", "syn"):
            return self._position_counts(eng._positions_map(node))
        if node.op == "wsyn":
            w = np.asarray(node.weights, dtype=np.float64)
            if w.sum() == 0:
                raise ValueError("#wsyn weights sum to zero")
            w = w / w.sum()
            return np.sum([wi * self.counts(c)
                           for wi, c in zip(w, node.children)], axis=0)
        if node.op == "band":
            present = np.ones(self.n_ext, dtype=bool)
            for c in node.children:
                present &= self.counts(c) > 0
            return present.astype(np.float64)
        if node.op in ("od", "uw"):
            return self._window_counts(node)
        if node.op in _NUM_PREDS:
            # numeric/date predicate (the NEXI arithmetic clause,
            # wrapped in #max by the grammar): count = satisfying field
            # extents CONTAINED in the evaluation extent (the scored
            # list node's contextual matches,
            # ref:src/FieldBetweenNode.cpp:53-57 + ListBeliefNode
            # containment)
            data = eng._field_data(node.term)
            counts = np.zeros(self.n_ext, dtype=np.float64)
            for i, did in enumerate(self.cand_list):
                ext = data.get(did)
                if ext is None:
                    continue
                mask = eng._pred_mask(node, ext[2])
                if not mask.any():
                    continue
                pb, pe = ext[0][mask], ext[1][mask]
                for j in range(int(self.ext_start[i]),
                               int(self.ext_start[i + 1])):
                    counts[j] = float(np.sum((pb >= self.eb[j])
                                             & (pe <= self.ee[j])))
            return counts
        raise ValueError(
            f"element-level retrieval does not support #{node.op} as a "
            f"count node (use the document-level engine)")

    def _term_counts_from_postings(self, tp) -> np.ndarray:
        """Vectorized per-extent occurrence counts of a plain term straight
        from its flat positions stream (no per-doc Python): encode
        positions and extent bounds by candidate index, then two
        searchsorteds over the whole extent set."""
        d, _tf, flat, starts = tp
        cidx = np.searchsorted(self.cand, d)
        valid = (cidx < len(self.cand)) & (
            self.cand[np.minimum(cidx, len(self.cand) - 1)] == d)
        max_pos = int(flat.max()) if len(flat) else 0
        S = max(int(self.ee.max()) if self.n_ext else 0, max_pos) + 2
        tfs = np.diff(starts)
        pos_ok = np.repeat(valid, tfs)
        encp = np.repeat(cidx, tfs)[pos_ok] * S + flat[pos_ok]
        lo = np.searchsorted(encp, self.eidx * S + self.eb)
        hi = np.searchsorted(encp, self.eidx * S + self.ee)
        return (hi - lo).astype(np.float64)

    def _position_counts(self, pm: dict[int, np.ndarray]) -> np.ndarray:
        """Occurrences inside each extent: two searchsorteds per candidate
        doc over its (sorted) position list."""
        counts = np.zeros(self.n_ext, dtype=np.float64)
        for i, did in enumerate(self.cand_list):
            pl = pm.get(did)
            if pl is None or not len(pl):
                continue
            sl = slice(self.ext_start[i], self.ext_start[i + 1])
            counts[sl] = (np.searchsorted(pl, self.ee[sl])
                          - np.searchsorted(pl, self.eb[sl]))
        return counts

    def _window_counts(self, node: Node) -> np.ndarray:
        """#odN/#uwN occurrences CONTAINED in each extent (window.begin ≥
        extent.begin and window.end ≤ extent.end — the same
        ExtentInsideNode containment the document path applies,
        ref:src/ExtentInsideNode.cpp:54-73)."""
        pos_maps = [self.eng._positions_map(c) for c in node.children]
        counts = np.zeros(self.n_ext, dtype=np.float64)
        for i, did in enumerate(self.cand_list):
            pls = []
            ok = True
            for pm in pos_maps:
                pl = pm.get(did)
                if pl is None:
                    ok = False
                    break
                pls.append(pl)
            if not ok:
                continue
            if node.op == "od":
                begins, ends = ordered_window_extents(pls, node.n)
            else:
                begins, ends = unordered_window_extents(pls, node.n)
            if not len(begins):
                continue
            wb = np.asarray(begins, dtype=np.int64)
            we = np.asarray(ends, dtype=np.int64)
            for j in range(int(self.ext_start[i]),
                           int(self.ext_start[i + 1])):
                counts[j] = float(np.sum((wb >= self.eb[j])
                                         & (we <= self.ee[j])))
        return counts

    # -- FieldWildcard-context statistics ----------------------------------

    def _wild_doc_enc(self, did: int):
        """(i·S base, S, ub, ue) for one doc, or None when it carries no
        context extents."""
        docs, S, ub, ue, _total = self.wild
        i = int(np.searchsorted(docs, did))
        if i >= len(docs) or int(docs[i]) != did:
            return None
        return i * S, S, ub, ue

    def _wild_positions_cf(self, pm: dict[int, np.ndarray],
                           count: bool = True):
        """Occurrences of a position map inside the wildcard context
        (count=True → total float; count=False → set of docs with ≥1)."""
        tot = 0.0
        present: set[int] = set()
        for did, pl in pm.items():
            enc = self._wild_doc_enc(did)
            if enc is None:
                continue
            base, S, ub, ue = enc
            encp = base + pl[pl < S]
            inside = (np.searchsorted(ub, encp, side="right")
                      - np.searchsorted(ue, encp, side="right")) == 1
            if count:
                tot += float(inside.sum())
            elif inside.any():
                present.add(did)
        return tot if count else present

    def _wild_term_cf(self, tp) -> float:
        """Vectorized term occurrences within the wildcard context (the
        per-doc pm loop costs O(matching docs) Python at corpus scale)."""
        d, _tf, flat, starts = tp
        docs, S, ub, ue, _total = self.wild
        if flat is None or not len(flat) or not len(docs):
            return 0.0
        didx = np.searchsorted(docs, d)
        has = (didx < len(docs)) & (
            docs[np.minimum(didx, len(docs) - 1)] == d)
        tfs = np.diff(starts)
        pos_ok = np.repeat(has, tfs) & (flat < S)
        encp = np.repeat(didx, tfs)[pos_ok] * S + flat[pos_ok]
        inside = (np.searchsorted(ub, encp, side="right")
                  - np.searchsorted(ue, encp, side="right")) == 1
        return float(inside.sum())

    def _wild_cf(self, node: Node) -> float:
        """Collection occurrence count of a node WITHIN the wildcard
        context — positions (or windows) contained in an outermost field
        extent, each counted once (ref:src/ContextCountAccumulator.cpp:
        99-140), summed over every doc the node matches."""
        eng = self.eng
        if node.op == "term":
            term = eng._node_term(node)
            tp = eng._postings.get(term) if term else None
            return self._wild_term_cf(tp) if tp is not None else 0.0
        if node.op in ("syn", "wildcard"):
            return self._wild_positions_cf(eng._positions_map(node))
        if node.op == "wsyn":
            w = np.asarray(node.weights, dtype=np.float64)
            if w.sum() == 0:
                raise ValueError("#wsyn weights sum to zero")
            w = w / w.sum()
            return float(sum(wi * self._wild_cf(c)
                             for wi, c in zip(w, node.children)))
        if node.op in ("od", "uw"):
            pos_maps = [eng._positions_map(c) for c in node.children]
            docs_common = set(pos_maps[0])
            for pm in pos_maps[1:]:
                docs_common &= set(pm)
            tot = 0.0
            for did in docs_common:
                enc = self._wild_doc_enc(did)
                if enc is None:
                    continue
                base, S, ub, ue = enc
                pls = [pm[did] for pm in pos_maps]
                if node.op == "od":
                    begins, ends = ordered_window_extents(pls, node.n)
                else:
                    begins, ends = unordered_window_extents(pls, node.n)
                for wb, we in zip(begins, ends):
                    if wb >= S:  # past every extent end: outside, and an
                        continue  # encode would bleed into the next doc
                    i = int(np.searchsorted(ub, base + wb,
                                            side="right")) - 1
                    if i >= 0 and base + we <= ue[i]:
                        tot += 1.0
            return tot
        if node.op == "band":
            # 1 per doc where EVERY member occurs within the context
            doc_sets = [self._wild_positions_cf(eng._positions_map(c),
                                                count=False)
                        for c in node.children]
            return float(len(set.intersection(*doc_sets))) if doc_sets else 0.0
        raise ValueError(
            f"FieldWildcard-context statistics for #{node.op} are not "
            f"supported")

    # -- path-restricted support clauses (#max over [.path]) ---------------

    @staticmethod
    def _is_max_path(node: Node) -> bool:
        """``#max(#op[.path](...))`` — the translation of a NEXI support
        path ``about(.//title, terms)``; every child a path-ctx node."""
        return (node.op == "max" and bool(node.children)
                and all(c.op == "ctx" and c.term.startswith(".")
                        for c in node.children))

    def _max_path_belief(self, node: Node) -> np.ndarray:
        """Per-OUTER-extent MaxNode over path-restricted inner scores: for
        each outer extent E, the inner ExtentRestriction scores the
        subtree at every path-matching extent anchored at E (zero-length
        and no-match path extents skipped, ref:src/ExtentRestrictionNode.
        cpp:58-74) and MaxNode keeps the best — extents with NO surviving
        inner result produce no result at all (-inf here; MaxNode returns
        an empty list, ref:include/indri/MaxNode.hpp:75-98).  Statistics
        reuse the document engine's memoized node counts (rfields =
        (outer field, path)), so values match the doc path exactly."""
        eng = self.eng
        if self.field is None:
            raise ValueError(
                "path-restricted clauses need a field-restriction root")
        out = np.full(self.n_ext, -np.inf)
        fdocs, fstarts, fb, fe, fo, fp = eng._field_csr(self.field)
        for ctx_node in node.children:
            spec = ctx_node.term
            sub = ctx_node.children[0]
            subs = sub.children if sub.op in ("combine", "weight") \
                else [sub]
            if sub.op == "weight" or not all(c.op == "term" for c in subs):
                raise ValueError(
                    "element-level path support clauses accept plain "
                    "#combine term lists only")
            terms = [eng._node_term(c) for c in subs]
            rfields = (self.field, spec)
            from .indriql import _ctx_field_name

            ctx_field = _ctx_field_name(spec)
            st = eng.r.field_stats(ctx_field)
            total = float(st["total_len"]) if st else 0.0
            cfs = [eng._node_global_cf(c, rfields) for c in subs]
            for i, did in enumerate(self.cand_list):
                ri = int(np.searchsorted(fdocs, did))
                if ri >= len(fdocs) or int(fdocs[ri]) != did:
                    continue
                fsl = slice(int(fstarts[ri]), int(fstarts[ri + 1]))
                b_doc, e_doc = fb[fsl], fe[fsl]
                nz = np.nonzero(e_doc > b_doc)[0]
                sl0 = int(self.ext_start[i])
                for jj, src in enumerate(nz.tolist()):
                    outer = (b_doc[src:src + 1], e_doc[src:src + 1],
                             None, 0,
                             fo[fsl][src:src + 1] if fo is not None
                             else None,
                             fp[fsl][src:src + 1] if fp is not None
                             else None)
                    m = eng._eval_path(did, spec, outer)
                    if m is None:
                        continue
                    pbs, pes = m[0], m[1]
                    best = -np.inf
                    for pb, pe in zip(pbs.tolist(), pes.tolist()):
                        if pe <= pb:
                            continue
                        cs = []
                        for t in terms:
                            tp = eng._postings.get(t) if t else None
                            c = 0.0
                            if tp is not None:
                                pos_d = np.searchsorted(tp[0], did)
                                if (pos_d < len(tp[0])
                                        and tp[0][pos_d] == did
                                        and tp[2] is not None):
                                    run = tp[2][tp[3][pos_d]:
                                                tp[3][pos_d + 1]]
                                    c = float(np.searchsorted(run, pe)
                                              - np.searchsorted(run, pb))
                            cs.append(c)
                        if not any(c > 0 for c in cs):
                            continue  # inner hasMatch gate
                        kids = [eng._belief_from_counts(
                            np.asarray([c]), np.asarray([float(pe - pb)]),
                            cf, total)
                            for c, cf in zip(cs, cfs)]
                        best = max(best, float(np.mean(kids, axis=0)[0]))
                    j = sl0 + jj
                    out[j] = max(out[j], best)
        return out

    # -- matches -----------------------------------------------------------

    def matches(self, node: Node) -> np.ndarray:
        """Per-extent hasMatch: OR over the scored tree's count leaves
        (ref:src/WeightedAndNode.cpp:309-328 belief OR;
        ref:src/ListBeliefNode.cpp:158-186 leaf containment; priors carry
        no match list).  Counts are memoized, so the belief pass already
        paid for them."""
        if self._is_max_path(node):
            # the Max yields a result only where some anchored path extent
            # survived — the belief pass computed exactly that
            return self.belief(node) > -np.inf
        if node.op in self._COUNT_OPS or node.op in _NUM_PREDS:
            return self.counts(node) > 0
        if node.op == "prior":
            return np.zeros(self.n_ext, dtype=bool)
        if node.op in ("filreq", "filrej"):
            return self.matches(node.children[1])
        if node.op == "not":
            return self.matches(node.children[0])
        kids = [self.matches(c) for c in node.children]
        if not kids:
            return np.zeros(self.n_ext, dtype=bool)
        return np.any(kids, axis=0)

    # -- beliefs -----------------------------------------------------------

    _COUNT_OPS = frozenset({"term", "wildcard", "syn", "wsyn", "band",
                            "od", "uw"})

    def belief(self, node: Node) -> np.ndarray:
        eng = self.eng
        if self._is_max_path(node):
            hit = self._count_memo.get(("maxpath", id(node)))
            if hit is None:
                hit = self._max_path_belief(node)
                self._count_memo[("maxpath", id(node))] = hit
            return hit
        if node.op in self._COUNT_OPS or node.op in _NUM_PREDS:
            c = self.counts(node)
            # node statistics mirror the document path (indriql._belief):
            # a plain unrestricted term reads the dictionary, everything
            # else (and any field restriction) sweeps its own candidates;
            # a FieldWildcard context counts within the outermost field
            # extents (ContextCountAccumulator semantics)
            if self.wild is not None:
                cf = self._wild_cf(node)
            elif node.op == "term" and not self.rfields:
                cf = eng._term_cf(node)
            else:
                cf = eng._node_global_cf(node, self.rfields)
            return eng._belief_from_counts(c, self.dl_ext, cf, self.total)
        if node.op == "prior":
            per_doc = eng._belief(node, self.cand,
                                  np.zeros(len(self.cand)))
            return np.repeat(per_doc, np.diff(self.ext_start))
        if node.op in ("filreq", "filrej"):
            fcounts = eng._node_counts(node.children[0], eng._postings,
                                       self.cand, self.rfields)
            b = self.belief(node.children[1])
            mask = fcounts > 0 if node.op == "filreq" else fcounts == 0
            return np.where(np.repeat(mask, np.diff(self.ext_start)),
                            b, -np.inf)
        if node.op in ("restrict", "ctx", "passage", "any"):
            raise ValueError(
                f"element-level retrieval does not support nested "
                f"#{node.op} (use the document-level engine)")
        kids = [self.belief(c) for c in node.children]
        if node.op in ("combine", "weight") and any(
                self._is_max_path(c) for c in node.children):
            # a support-path child yields NO result for extents with no
            # surviving anchored path — the reference combiner then
            # normalizes over the children that DID score (sumWeight sums
            # |w|·childResults.size(), ref:src/WeightedAndNode.cpp:
            # 248-278); extents where no child scored yield nothing
            wts = (node.weights if node.op == "weight"
                   else [1.0] * len(kids))
            pres = [(k > -np.inf) if self._is_max_path(c)
                    else np.ones(self.n_ext, dtype=bool)
                    for k, c in zip(kids, node.children)]
            num = sum(w * np.where(p, k, 0.0)
                      for w, k, p in zip(wts, kids, pres))
            den = sum(abs(w) * p for w, p in zip(wts, pres))
            safe = den > 0
            out = np.full(self.n_ext, -np.inf)
            out[safe] = num[safe] / den[safe]
            return out
        if node.op == "combine":
            return np.mean(kids, axis=0)
        if node.op == "weight":
            w = np.asarray(node.weights, dtype=np.float64)
            w = w / w.sum()
            return np.tensordot(w, np.stack(kids), axes=1)
        if node.op == "wsum":
            w = np.asarray(node.weights, dtype=np.float64)
            w = w / w.sum()
            probs = np.stack([np.exp(kk) for kk in kids])
            return np.log(np.tensordot(w, probs, axes=1))
        if node.op == "max":
            return np.max(kids, axis=0)
        if node.op == "or_":
            cap = np.nextafter(1.0, 0.0)
            log1m = np.sum([np.log1p(-np.minimum(np.exp(kk), cap))
                            for kk in kids], axis=0)
            return np.log1p(-np.exp(log1m))
        if node.op == "not":
            return np.log1p(-np.minimum(np.exp(kids[0]),
                                        np.nextafter(1.0, 0.0)))
        raise ValueError(f"unknown op {node.op}")


def _collapse_outermost(dn: np.ndarray, bn: np.ndarray, en: np.ndarray
                        ) -> tuple[np.ndarray, int, np.ndarray, np.ndarray]:
    """Doc-major nonzero extents → doc-index-ENCODED OUTERMOST extents
    ``(docs, S, enc_ub, enc_ue)``: sort (begin asc, end desc); under the
    reference's nesting-only invariant an extent is nested iff some
    earlier extent's end reaches past it — the global cumulative max
    works because doc ``i``'s encodes are < ``(i+1)·S`` ≤ any encode of
    doc ``i+1``.  The ContextCountAccumulator occurrence walk counts a
    position once iff it falls in one of these (ref:src/
    ContextCountAccumulator.cpp:99-143); shared by the FieldWildcard and
    path-chain contexts so the collapse invariant exists exactly once."""
    docs = np.unique(dn)
    S = int(en.max()) + 2
    didx = np.searchsorted(docs, dn)
    enc_b = didx * S + bn
    enc_e = didx * S + en
    order = np.lexsort((-enc_e, enc_b))
    enc_b, enc_e = enc_b[order], enc_e[order]
    run = np.maximum.accumulate(enc_e)
    keep = np.ones(len(enc_b), dtype=bool)
    keep[1:] = enc_e[1:] > run[:-1]
    return docs, S, enc_b[keep], enc_e[keep]


def _build_wild_context(eng: StructuredQueryEngine,
                        fields: tuple[str, ...] | None = None
                        ) -> tuple:
    """The FieldWildcard context, doc-index-ENCODED and memoized per
    fields tuple: ``(docs, S, enc_ub, enc_ue, total)`` — the OUTERMOST
    nonzero extents of every context field per doc (nested extents
    collapse into their outer per the reference's no-overlap invariant;
    an occurrence counts ONCE when contained in any context extent,
    ref:src/ContextCountAccumulator.cpp:99-140) plus the summed context
    size (every field extent's raw length, nested double-counted — the
    contextSize accumulation, ref :120-131 = Σ fieldTermCount).  Doc
    ``docs[i]``'s intervals occupy encoded values in ``[i·S, (i+1)·S)``;
    built fully vectorized from the field CSRs."""
    # reader-level memo: the context is immutable per index and readers
    # outlive per-query engines
    memo = eng.r.__dict__.setdefault("_wild_ctx_cache", {})
    key = (fields if fields is not None
           else tuple(eng.r.cfg.fields or ()))
    hit = memo.get(key)
    if hit is not None:
        return hit
    total = 0.0
    doc_parts, b_parts, e_parts = [], [], []
    for fname in key:
        st = eng.r.field_stats(fname)
        if st:
            total += float(st["total_len"])
        fdocs, fstarts, fb, fe = eng._field_csr(fname)[:4]
        if len(fdocs):
            doc_parts.append(np.repeat(fdocs, np.diff(fstarts)))
            b_parts.append(fb)
            e_parts.append(fe)
    empty = (np.empty(0, np.int64), 1, np.empty(0, np.int64),
             np.empty(0, np.int64), total)
    if not doc_parts:
        memo[key] = empty
        return empty
    all_doc = np.concatenate(doc_parts)
    all_b = np.concatenate(b_parts)
    all_e = np.concatenate(e_parts)
    nz = all_e > all_b
    all_doc, all_b, all_e = all_doc[nz], all_b[nz], all_e[nz]
    if not len(all_doc):
        memo[key] = empty
        return empty
    out = _collapse_outermost(all_doc, all_b, all_e) + (total,)
    memo[key] = out
    return out


def run_extents_wildcard(reader, query: str, k: int = 1000,
                         method: str = "dirichlet", mu: float = 2500.0,
                         lam: float = 0.4,
                         doc_range: tuple[int, int] | None = None,
                         fields: tuple[str, ...] | None = None
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                    np.ndarray]:
    """Element retrieval under the FieldWildcard restriction — the NEXI
    bare-term-list (INEX CO) result surface: every extent of EVERY
    indexed field is scored separately (the grammar wraps a bare term
    list in ``ExtentRestriction(c, FieldWildcard)``,
    ref:src/nexilang.g:214-222, and the annotator assigns the wildcard
    node as each scorer's statistics context,
    ref:include/indri/ExtentRestrictionModelAnnotatorCopier.hpp:70-76).
    ``query`` is the INNER scored tree in this dialect (e.g.
    ``#combine(a b)``).  Backgrounds draw from occurrences within ANY
    field extent over the summed field context size; foregrounds and
    smoothing lengths are per-extent; the hasMatch gate applies.  A doc
    whose extents are all zero-length (or that carries no fields)
    contributes nothing.

    ``fields`` restricts the element set to an explicit field list — the
    NEXI alternative-list target ``//(a|b)[...]`` (ExtentOr restriction,
    same ContextCountAccumulator statistics over only those fields);
    None = every indexed field (FieldWildcard)."""
    eng = _as_engine(reader, method, mu, lam)
    inner = parse_query(query)
    empties = (np.empty(0, np.int64), np.empty(0, np.int64),
               np.empty(0, np.int64), np.empty(0, np.float64))
    cand = _gather_candidates(eng, (inner,), doc_range)
    if not len(cand):
        return empties
    wild = _build_wild_context(eng, fields)
    fields = (fields if fields is not None
              else tuple(eng.r.cfg.fields or ()))
    # element enumeration, vectorized: gather every field's nonzero
    # extents for the candidate docs from the field CSRs, then one
    # lexsort groups them per doc in (begin asc, end desc) order
    doc_parts, b_parts, e_parts = [], [], []
    for fname in fields:
        csr = eng._field_csr(fname)
        g = _csr_gather(csr, cand)
        if g is None:
            continue
        has, lens, gather = g
        if not len(gather):
            continue
        fb = csr[2][gather]
        fe = csr[3][gather]
        nz = fe > fb  # zero-length skip (ExtentRestrictionNode:73-74)
        doc_parts.append(np.repeat(cand[has], lens)[nz])
        b_parts.append(fb[nz])
        e_parts.append(fe[nz])
    if not doc_parts:
        return empties
    all_doc = np.concatenate(doc_parts)
    all_b = np.concatenate(b_parts)
    all_e = np.concatenate(e_parts)
    if not len(all_doc):
        return empties
    order = np.lexsort((-all_e, all_b, all_doc))
    all_doc, all_b, all_e = all_doc[order], all_b[order], all_e[order]
    cand = np.unique(all_doc)
    n_per = np.searchsorted(all_doc, cand, side="right") \
        - np.searchsorted(all_doc, cand, side="left")
    ext_start = np.zeros(len(cand) + 1, dtype=np.int64)
    np.cumsum(n_per, out=ext_start[1:])
    eb, ee, edoc = all_b, all_e, all_doc
    ev = _ExtentEval(eng, None, cand, ext_start, eb, ee, wild=wild)
    beliefs = ev.belief(inner)
    keep = ev.matches(inner) & (beliefs > -np.inf)
    edoc, eb, ee, beliefs = edoc[keep], eb[keep], ee[keep], beliefs[keep]
    order = np.lexsort((-ee, -eb, -edoc, -beliefs))[:k]
    return edoc[order], eb[order], ee[order], beliefs[order]


# ---------------------------------------------------------------------------
# NEXI path targets — NestedExtentInsideNode chains
# ---------------------------------------------------------------------------


def _step_flat_extents(eng: StructuredQueryEngine,
                       step: tuple[str, ...] | None
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Global flat ``(docs, begins, ends)`` of one path STEP — the extents
    of every field the step names (``None`` = every indexed field, the
    ``*`` wildcard step), doc-major, (begin asc, end desc) within a doc —
    the begin-sorted order NestedExtentInsideNode's sweep expects
    (ref:src/NestedExtentInsideNode.cpp:53-61).  Zero-length extents are
    KEPT: the node emits a contained zero-length inner (its containment
    test is weak, ref:include/indri/Extent.hpp ``contains``); scoring
    skips them later (ref:src/ExtentRestrictionNode.cpp:73-74).
    Memoized on the reader (immutable per index); the key carries the
    engine's pruned doc range like ``_field_csr``'s does, so a
    range-pruned build could never be served to a global query."""
    names = step if step is not None else tuple(eng.r.cfg.fields or ())
    memo = eng.r.__dict__.setdefault("_step_flat_cache", {})
    key = (names, eng._field_range)
    hit = memo.get(key)
    if hit is not None:
        return hit
    doc_parts, b_parts, e_parts = [], [], []
    for fname in names:
        fdocs, fstarts, fb, fe = eng._field_csr(fname)[:4]
        if len(fdocs):
            doc_parts.append(np.repeat(fdocs, np.diff(fstarts)))
            b_parts.append(fb)
            e_parts.append(fe)
    if not doc_parts:
        z = np.empty(0, np.int64)
        out = (z, z.copy(), z.copy())
    else:
        d = np.concatenate(doc_parts)
        b = np.concatenate(b_parts)
        e = np.concatenate(e_parts)
        order = np.lexsort((-e, b, d))
        out = (d[order], b[order], e[order])
    memo[key] = out
    return out


def _contained_in_step(din: np.ndarray, bi: np.ndarray, ei: np.ndarray,
                       dout: np.ndarray, bo: np.ndarray, eo: np.ndarray
                       ) -> np.ndarray:
    """Vectorized NestedExtentInsideNode sweep (ref:src/
    NestedExtentInsideNode.cpp:47-103): an inner extent survives iff SOME
    outer extent of the same doc has ``begin ≤ inner.begin`` and ``end ≥
    inner.end`` (the node's active-set scan checks the max end among
    begin-≤ outers).  That max is a cumulative max over the begin-sorted
    outer list; doc-encoding makes the whole test one searchsorted.  A
    previous doc's cumulative max is ≤ ``d'·S + (S−2) < d·S`` ≤ any inner
    encode of doc ``d``, so cross-doc bleed can never satisfy the test."""
    out = np.zeros(len(din), dtype=bool)
    if not len(din) or not len(dout):
        return out
    S = int(max(ei.max(), eo.max())) + 2
    enc_ob = dout * S + bo
    cummax_e = np.maximum.accumulate(dout * S + eo)
    pos = np.searchsorted(enc_ob, din * S + bi, side="right") - 1
    ok = pos >= 0
    out[ok] = cummax_e[pos[ok]] >= (din[ok] * S + ei[ok])
    return out


def _nested_chain_global(eng: StructuredQueryEngine, steps: tuple) -> tuple:
    """INNERMOST extents of a NEXI path chain ``//s1//s2//…//sn`` plus
    their statistics context, memoized on the reader per steps key.

    Extents: the chain lowers to nested NestedExtentInsideNodes — the
    top node pairs ``(…((sn in s(n-1)) in s(n-2))…) in s1`` (field-built
    ExtentInsides take the nested node,
    ref:src/InferenceNetworkBuilder.cpp:230-247) and every level keeps
    an inner extent iff SOME extent of that step contains it.  Because
    each level tests the same INNERMOST extent, the chain is a
    conjunction of per-step containments: an ``sn`` extent survives iff
    each of ``s1…s(n-1)`` has an extent containing it — the steps need
    NOT nest among one another, a property of the nested lowering (NOT
    XPath semantics; pinned by test).

    Context: the annotator assigns the chain node itself as the scored
    clause's statistics context (ref:include/indri/
    ExtentRestrictionModelAnnotatorCopier.hpp:59-66), so backgrounds are
    ContextCountAccumulator counts over the surviving extent LIST — an
    occurrence counts once per position within any (outermost-collapsed)
    surviving extent; context size = Σ raw extent lengths, nested
    double-counted (ref:src/ContextCountAccumulator.cpp:99-143).

    Returns ``(docs_flat, begins, ends, ctx)``; ``ctx`` has the
    :func:`_build_wild_context` 5-tuple shape over the surviving set.
    The memo key carries the engine's pruned doc range (like
    ``_field_csr``'s) so a range-pruned build could never be served to a
    global query on the same reader."""
    memo = eng.r.__dict__.setdefault("_chain_ctx_cache", {})
    key = (steps, eng._field_range)
    hit = memo.get(key)
    if hit is not None:
        return hit
    d, b, e = _step_flat_extents(eng, steps[-1])
    for step in steps[:-1]:
        if not len(d):
            break
        do, bo, eo = _step_flat_extents(eng, step)
        keep = _contained_in_step(d, b, e, do, bo, eo)
        d, b, e = d[keep], b[keep], e[keep]
    total = float((e - b).sum())
    nz = e > b
    dn, bn, en = d[nz], b[nz], e[nz]
    if not len(dn):
        ctx = (np.empty(0, np.int64), 1, np.empty(0, np.int64),
               np.empty(0, np.int64), total)
    else:
        ctx = _collapse_outermost(dn, bn, en) + (total,)
    out = (d, b, e, ctx)
    memo[key] = out
    return out


def _flat_gather(cand: np.ndarray, d: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Doc-major flat extent docs → per-candidate gather: ``(ext_start
    aligned to cand, flat_row_index)``; candidates without extents get
    empty slices.  The flat-array sibling of :func:`_csr_gather`."""
    lo = np.searchsorted(d, cand, side="left")
    hi = np.searchsorted(d, cand, side="right")
    lens = (hi - lo).astype(np.int64)
    ext_start = np.zeros(len(cand) + 1, dtype=np.int64)
    np.cumsum(lens, out=ext_start[1:])
    total = int(ext_start[-1])
    gather = (np.arange(total, dtype=np.int64)
              - np.repeat(ext_start[:-1], lens)
              + np.repeat(lo, lens))
    return ext_start, gather


def run_extents_path(reader, steps, query: str, k: int = 1000,
                     method: str = "dirichlet", mu: float = 2500.0,
                     lam: float = 0.4,
                     doc_range: tuple[int, int] | None = None
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray]:
    """Element retrieval under a NEXI PATH target ``//s1//…//sn[c]`` —
    one result per surviving innermost extent (begin/end = that extent;
    the root restriction emits the field extent,
    ref:src/ExtentRestrictionNode.cpp:48-99), the clause scored per
    extent with ContextCountAccumulator statistics over the chain's
    surviving extent list (:func:`_nested_chain_global`).  ``steps`` is
    one tuple of field names per path step, outermost first; ``None`` =
    the ``*`` wildcard step.  Zero-length extents and extents where the
    clause has no match are skipped (the hasMatch gate); ``doc_range``
    restricts candidates only (statistics stay collection-global), so a
    sharded merge is rank-identical to a global run."""
    eng = _as_engine(reader, method, mu, lam)
    inner = parse_query(query)
    empties = (np.empty(0, np.int64), np.empty(0, np.int64),
               np.empty(0, np.int64), np.empty(0, np.float64))
    cand = _gather_candidates(eng, (inner,), doc_range)
    if not len(cand):
        return empties
    d, b, e, ctx = _nested_chain_global(eng, tuple(steps))
    nz = e > b
    d, b, e = d[nz], b[nz], e[nz]
    if not len(d):
        return empties
    ext_start, gather = _flat_gather(cand, d)
    lens = np.diff(ext_start)
    cand = cand[lens > 0]
    if not len(cand):
        return empties
    eb, ee = b[gather], e[gather]
    ext_start = np.zeros(len(cand) + 1, dtype=np.int64)
    np.cumsum(lens[lens > 0], out=ext_start[1:])
    edoc = np.repeat(cand, lens[lens > 0])
    ev = _ExtentEval(eng, None, cand, ext_start, eb, ee, wild=ctx)
    beliefs = ev.belief(inner)
    keep = ev.matches(inner) & (beliefs > -np.inf)
    edoc, eb, ee, beliefs = edoc[keep], eb[keep], ee[keep], beliefs[keep]
    order = np.lexsort((-ee, -eb, -edoc, -beliefs))[:k]
    return edoc[order], eb[order], ee[order], beliefs[order]


def _spec_flat(eng: StructuredQueryEngine, spec) -> tuple:
    """Two-restriction side spec → ``(flat (d, b, e) global extents,
    _ExtentEval kwargs)``.  Specs: ``("field", name)`` (plain field —
    field-context statistics), ``("ctx", names_or_None)`` (alternative
    list / ``*`` wildcard — ContextCountAccumulator statistics over
    those fields, :func:`_build_wild_context`), ``("path", steps)``
    (NestedExtentInside chain — :func:`_nested_chain_global`).  A bare
    string is ``("field", str)`` shorthand."""
    if isinstance(spec, str):
        spec = ("field", spec)
    kind = spec[0]
    if kind == "field":
        memo = eng.r.__dict__.setdefault("_field_flat_cache", {})
        key = (spec[1], eng._field_range)
        hit = memo.get(key)
        if hit is None:
            fdocs, fstarts, fb, fe = eng._field_csr(spec[1])[:4]
            d = (np.repeat(fdocs, np.diff(fstarts)) if len(fdocs)
                 else np.empty(0, np.int64))
            hit = memo[key] = (d, fb, fe)
        return hit + ({"field": spec[1], "wild": None},)
    if kind == "ctx":
        d, b, e = _step_flat_extents(eng, spec[1])
        return d, b, e, {"field": None,
                         "wild": _build_wild_context(eng, spec[1])}
    if kind == "path":
        d, b, e, ctx = _nested_chain_global(eng, tuple(spec[1]))
        return d, b, e, {"field": None, "wild": ctx}
    raise ValueError(f"unknown restriction spec {spec!r}")


def run_nested_extents(reader, a_spec, c1_query: str, b_spec,
                       c2_query: str, k: int = 1000,
                       method: str = "dirichlet", mu: float = 2500.0,
                       lam: float = 0.4
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray]:
    """The NEXI two-restriction form ``//a[c1]//b[c2]`` — the
    ContextInclusionAnd + ExtentEnforcement pair the grammar builds
    (ref:src/nexilang.g:195-203): for every NONZERO-length ``a`` extent
    ``E`` of a candidate document, ``c1`` scores at ``E`` and the
    enforced child scores every ``b`` extent inside ``E``; each
    ``(E, b)`` pair yields one result with score ``score_c1(E) +
    score_c2(b)`` (the inclusion node SUMS the non-preserve children's
    log-beliefs onto each preserved result,
    ref:src/ContextInclusionAndNode.cpp:223-254) and extent = the ``b``
    extent (preserved through the enforcement,
    ref:src/ExtentEnforcementNode.cpp:48-80).

    The enforcement loop skips zero-length ``a`` extents but does NOT
    hasMatch-gate ``c1``; the inner ExtentRestriction gates ``b`` extents
    on ``c2``'s matches and skips zero-length ones
    (ref:src/ExtentRestrictionNode.cpp:58-74).  A ``b`` extent inside two
    nested ``a`` extents is scored once per enclosing ``E``, exactly like
    the reference's per-extent child walk.

    ``a_spec`` / ``b_spec`` take any :func:`_spec_flat` form — a plain
    field name, an alternative list / wildcard ``("ctx", names_or_None)``
    or (``b`` side, from the grammar) a path ``("path", steps)``; the
    enforcement side is always a bare field/wildcard/list because the
    grammar encloses with the FIRST restriction's last FIELD (its path
    prefix dangles, ref:src/nexilang.g:159-183).  Statistics: ``c1``
    draws backgrounds from the ``a`` spec's context, ``c2`` from ``b``'s
    (ExtentEnforcement subclasses ExtentRestriction, so the smoothing
    annotation assigns each clause its restriction's extent-source
    context, ref:include/indri/ExtentRestrictionModelAnnotatorCopier.
    hpp:59-66)."""
    eng = _as_engine(reader, method, mu, lam)
    c1 = parse_query(c1_query)
    c2 = parse_query(c2_query)
    empties = (np.empty(0, np.int64), np.empty(0, np.int64),
               np.empty(0, np.int64), np.empty(0, np.float64))
    cand = _gather_candidates(eng, (c1, c2))
    if not len(cand):
        return empties
    ad, ab_g, ae_g, akw = _spec_flat(eng, a_spec)
    bd, bb_g, be_g, bkw = _spec_flat(eng, b_spec)
    # zero-length a extents are skipped by the enforcement loop; a
    # zero-length b extent is skipped by the inner restriction — drop
    # both up front (neither can produce a result)
    nza = ae_g > ab_g
    ad, ab_g, ae_g = ad[nza], ab_g[nza], ae_g[nza]
    nzb = be_g > bb_g
    bd, bb_g, be_g = bd[nzb], bb_g[nzb], be_g[nzb]
    # candidates need ≥1 (nonzero) a extent and ≥1 b extent
    has_a = (np.searchsorted(ad, cand, side="right")
             > np.searchsorted(ad, cand, side="left"))
    has_b = (np.searchsorted(bd, cand, side="right")
             > np.searchsorted(bd, cand, side="left"))
    cand = cand[has_a & has_b]
    if not len(cand):
        return empties
    a_start, a_gather = _flat_gather(cand, ad)
    b_start, b_gather = _flat_gather(cand, bd)
    ab, ae = ab_g[a_gather], ae_g[a_gather]
    bb, be = bb_g[b_gather], be_g[b_gather]
    if not len(ab) or not len(bb):
        return empties
    s1 = _ExtentEval(eng, akw["field"], cand, a_start, ab, ae,
                     wild=akw["wild"]).belief(c1)
    ev_b = _ExtentEval(eng, bkw["field"], cand, b_start, bb, be,
                       wild=bkw["wild"])
    s2 = ev_b.belief(c2)
    m2 = ev_b.matches(c2)
    out_d, out_b, out_e, out_s = [], [], [], []
    for i, did in enumerate(cand.tolist()):
        asl = slice(int(a_start[i]), int(a_start[i + 1]))
        bsl = slice(int(b_start[i]), int(b_start[i + 1]))
        for ai in range(asl.start, asl.stop):
            inside = ((bb[bsl] >= ab[ai]) & (be[bsl] <= ae[ai])
                      & m2[bsl])
            for bj in np.nonzero(inside)[0] + bsl.start:
                out_d.append(did)
                out_b.append(int(bb[bj]))
                out_e.append(int(be[bj]))
                out_s.append(float(s1[ai]) + float(s2[bj]))
    if not out_d:
        return empties
    edoc = np.asarray(out_d, dtype=np.int64)
    eb = np.asarray(out_b, dtype=np.int64)
    ee = np.asarray(out_e, dtype=np.int64)
    sc = np.asarray(out_s, dtype=np.float64)
    order = np.lexsort((-ee, -eb, -edoc, -sc))[:k]
    return edoc[order], eb[order], ee[order], sc[order]


# ---------------------------------------------------------------------------
# INEX element paths
# ---------------------------------------------------------------------------


def _find_leaf(nodes, children, b: int, e: int) -> int:
    """The reference's greedy containing-leaf descent
    (ref:src/DocumentStructure.cpp:261-286): start at the FIRST top-level
    node, follow the first child whose extent contains ``[b, e]``, repeat.
    Returns 0 (no element) when the walk finds no containing node — the
    reference reads uninitialized tree memory in that case; path "" is our
    defined behavior."""
    top = children.get(0, [])
    if not top:
        return 0
    root = top[0]
    leaf = 0
    if nodes[root][1] <= b and nodes[root][2] >= e:
        leaf = root
    kids = children.get(root, [])
    i = 0
    while i < len(kids):
        c = kids[i]
        if nodes[c][1] <= b and nodes[c][2] >= e:
            leaf = c
            kids = children.get(c, [])
            i = 0
        else:
            i += 1
    return leaf


def _node_path(nodes, children, leaf: int) -> str:
    """``/tag[k]`` chain root→leaf, ``k`` = 1-based position among
    SAME-TYPE siblings under the same parent
    (ref:src/DocumentStructure.cpp:289-330 ``_constructNodePath``)."""
    if leaf <= 0:
        return ""
    chain = []
    cur = leaf
    while cur > 0:
        chain.append(cur)
        cur = nodes[cur][3]
    chain.reverse()
    parts = []
    for node in chain:
        fname, _b, _e, parent = nodes[node]
        same = [s for s in children.get(parent, [])
                if nodes[s][0] == fname]
        parts.append(f"/{fname}[{same.index(node) + 1}]")
    return "".join(parts)


def element_paths(reader, doc_ids, begins, ends) -> list[str]:
    """INEX element paths for result extents — the ``pathNames`` gather
    (ref:src/LocalQueryServer.cpp:443-488): per result, the deepest tag
    node containing the extent, printed as ``/tag[k]`` steps.  Documents
    without tag-tree data (or extents outside the first top-level tree)
    yield ``""`` exactly like the reference's unloaded-structure branch.

    Tag trees are fetched with doc-PRUNED ``field_extents`` reads for the
    result docs only — never the whole-corpus per-field dictionaries (a
    result page touches k docs; the reference likewise loads one doc's
    term-list fields at a time, ref:src/LocalQueryServer.cpp:460-468)."""
    eng = _as_engine(reader, "dirichlet", 2500.0, 0.4)
    ids = np.asarray(doc_ids).tolist()
    uniq = sorted(set(int(d) for d in ids))
    if not uniq:
        return []
    structs: dict[int, tuple | None] = {d: None for d in uniq}
    nodes_by_doc: dict[int, dict[int, tuple[str, int, int, int]]] = {
        d: {} for d in uniq}
    no_tree = False
    broken: set[int] = set()
    for fname in tuple(eng.r.cfg.fields or ()):
        try:
            t = eng.r.field_extents(fname, doc_ids=uniq)
        except FileNotFoundError:
            t = None
        if t is None or not t.num_rows:
            continue
        if "ordinals" not in t.column_names:
            no_tree = True
            break
        for did, bs, es, os_, ps_ in zip(
                t.column("doc_id").to_pylist(),
                t.column("begins").to_pylist(),
                t.column("ends").to_pylist(),
                t.column("ordinals").to_pylist(),
                t.column("parent_ordinals").to_pylist()):
            nd = nodes_by_doc.get(int(did))
            if nd is None:
                continue
            if os_ is None or ps_ is None:
                # pre-ordinal row (index extended across the ordinal
                # boundary): this doc has no usable tree → path ""
                broken.add(int(did))
                continue
            for b, e, o, p in zip(bs, es, os_, ps_):
                nd[int(o)] = (fname, int(b), int(e), int(p))
    if not no_tree:
        for d, nodes in nodes_by_doc.items():
            if not nodes or d in broken:
                continue
            children: dict[int, list[int]] = {}
            for o in sorted(nodes):
                children.setdefault(nodes[o][3], []).append(o)
            structs[d] = (nodes, children)
    out = []
    for did, b, e in zip(
            ids, np.asarray(begins).tolist(), np.asarray(ends).tolist()):
        struct = structs.get(int(did))
        if struct is None:
            out.append("")
            continue
        nodes, children = struct
        out.append(_node_path(nodes, children,
                              _find_leaf(nodes, children, int(b), int(e))))
    return out


# ---------------------------------------------------------------------------
# INEX submission formatting
# ---------------------------------------------------------------------------


def format_inex(topics: list[tuple[str, list[tuple[str, str, float]]]],
                participant_id: str = "1", run_id: str = "indri",
                task: str = "CO.Thorough", query_type: str = "automatic",
                topic_part: str = "T", description: str = "") -> str:
    """``<inex-submission>`` XML for ``topics = [(topic_id, [(docno, path,
    score), ...]), ...]`` — byte-shape of the reference's -inex output:
    envelope ref:runquery/IndriRunQuery.cpp:739-745/774-776, topic block
    :506-511/516-518, result block :467-478.  Scores print with C++
    default stream precision (6 significant digits)."""
    lines = [
        f'<inex-submission participant-id="{participant_id}" '
        f'run-id="{run_id}" task="{task}" query="{query_type}" '
        f'topic-part="{topic_part}">',
        "  <description>",
        description,
        "  </description>",
    ]
    for topic_id, results in topics:
        lines.append(f'  <topic topic-id="{topic_id}">')
        lines.append("    <collections>")
        lines.append("      <collection>ieee</collection>")
        lines.append("    </collections>")
        for docno, path, score in results:
            lines.append("    <result>")
            lines.append(f"      <file>{docno}</file>")
            lines.append(f"      <path>{path}</path>")
            lines.append(f"      <rsv>{score:g}</rsv>")
            lines.append("    </result>")
        lines.append("  </topic>")
    lines.append("</inex-submission>")
    return "\n".join(lines) + "\n"
