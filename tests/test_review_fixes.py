"""Regression tests for the code-review findings."""

from __future__ import annotations

import numpy as np
import pytest


def test_empty_and_overlong_terms_get_termid0_semantics():
    """ref:src/MemoryIndex.cpp:559-570 — empty words and words ≥
    MAX_KEY_LENGTH-1 bytes emit termID 0: the position slot counts toward
    dl but no posting exists."""
    from indri_5_5_ray.config import IndexConfig
    from indri_5_5_ray.stages.ingest import TermProcessor

    proc = TermProcessor(IndexConfig(stemmer=None))
    assert proc.process("") is None
    assert proc.process("a" * 511) is None
    assert proc.process("a" * 510) == "a" * 510
    # the "'''" token normalizes to empty → dropped from postings
    assert proc.process_raw(b"'") is None


def test_row_cache_eviction_keeps_current_terms(built_index):
    from indri_5_5_ray.pipelines.query import IndexReader

    out, _ = built_index
    r = IndexReader(out)
    t1 = r.term_rows(["merge"])  # populate 'merge'
    assert t1.num_rows
    # force the eviction branch with dummy entries
    import pyarrow as pa

    from indri_5_5_ray.stages.postings import POSTINGS_SCHEMA

    empty = POSTINGS_SCHEMA.empty_table()
    for i in range(8200):
        r._row_cache[f"__dummy{i}"] = empty
    # cached 'merge' + missing 'token': must not KeyError, and must keep both
    t2 = r.term_rows(["merge", "token"])
    assert set(t2.column("term").to_pylist()) >= {"merge", "token"}
    assert "merge" in r._row_cache and "token" in r._row_cache


def test_resume_rejects_config_change(small_corpus_dir, tmp_path):
    """A config change must invalidate previously-ingested chunk lineage."""
    import json
    from pathlib import Path

    from indri_5_5_ray.config import IndexConfig
    from indri_5_5_ray.pipelines.build import build_index
    from indri_5_5_ray.state.lineage import all_records

    out = str(tmp_path / "idx")
    cfg1 = IndexConfig(stemmer=None, max_chunk_docs=64, n_buckets=4, dedup_key=None)
    build_index(small_corpus_dir, out, cfg1, resume=False)
    # simulate crash after ingest, then resume with a DIFFERENT stemmer
    (Path(out) / "manifest.json").unlink()
    import shutil

    shutil.rmtree(Path(out) / "postings")
    shutil.rmtree(Path(out) / "dictionary")
    cfg2 = IndexConfig(stemmer="porter", max_chunk_docs=64, n_buckets=4, dedup_key=None)
    m = build_index(small_corpus_dir, out, cfg2, resume=True)
    # chunks were re-ingested under the new config (no stale kstem/None mix):
    # porter vocabulary present
    import pyarrow.parquet as pq

    vocab = set(pq.read_table(f"{out}/dictionary", columns=["term"]).column("term").to_pylist())
    assert "merg" in vocab  # porter stem — proves re-ingest happened


def test_sharded_dense_memory_is_span_sized(built_index):
    """doc_range scoring must not allocate over the full doc space."""
    from indri_5_5_ray.pipelines.query import BM25Scorer, IndexReader, process_query

    out, _ = built_index
    r = IndexReader(out)
    sc = BM25Scorer(r)
    terms = process_query("merge token", r.cfg)
    full_ids, full_scores = sc.score_exhaustive(terms, k=1000)
    lo, hi = 100, 164
    part_ids, part_scores = sc.score_exhaustive(terms, k=1000, doc_range=(lo, hi))
    assert ((part_ids >= lo) & (part_ids < hi)).all()
    full = dict(zip(full_ids.tolist(), full_scores.tolist()))
    for d, s in zip(part_ids.tolist(), part_scores.tolist()):
        assert full[d] == s


def test_topk_nan_scores_fall_back_to_full_sort():
    """A NaN at the argpartition boundary must not wipe the result set —
    finite-scored docs still rank (score desc, doc_id desc), NaNs last."""
    from indri_5_5_ray.pipelines.query import _topk

    n = 100
    ids = np.arange(n, dtype=np.int64)
    scores = np.linspace(1.0, 2.0, n)
    scores[90:] = np.nan  # NaNs occupy the top of an argpartition
    top_ids, top_s = _topk(ids, scores, k=5)
    assert len(top_ids) == 5
    assert not np.isnan(top_s).any()
    assert list(top_ids) == [89, 88, 87, 86, 85]


def test_topk_prune_matches_full_sort_with_ties():
    """Pruned top-k == full lexsort top-k, including boundary ties broken
    by doc_id desc (fuzz over random tie-heavy inputs)."""
    from indri_5_5_ray.pipelines.query import _topk

    rng = np.random.default_rng(11)
    for _ in range(50):
        n = int(rng.integers(10, 3000))
        ids = rng.permutation(n).astype(np.int64)
        scores = rng.integers(0, 7, n).astype(np.float64)  # heavy ties
        k = int(rng.integers(1, 50))
        got_i, got_s = _topk(ids, scores, k)
        order = np.lexsort((-ids, -scores))[:k]
        assert np.array_equal(got_i, ids[order])
        assert np.array_equal(got_s, scores[order])


def test_blockmax_sparse_docid_space(small_corpus_dir, tmp_path):
    """A segment built at a huge doc_id base (sparse doc-id space) must
    score identically to exhaustive — the capped cell width keeps the dense
    accumulator cell-sized, never corpus-span-sized."""
    from indri_5_5_ray.config import IndexConfig
    from indri_5_5_ray.pipelines.build import build_index
    from indri_5_5_ray.pipelines.query import (BM25Scorer, IndexReader,
                                               process_query)

    out = str(tmp_path / "sparse_idx")
    cfg = IndexConfig(max_chunk_docs=64, n_buckets=4, dedup_key=None)
    build_index(small_corpus_dir, out, cfg, resume=False,
                doc_id_base=50_000_000)
    r = IndexReader(out)
    sc = BM25Scorer(r)
    terms = process_query("merge buffer token", r.cfg)
    ids_b, s_b = sc.score_blockmax(terms, k=10)
    ids_e, s_e = sc.score_exhaustive(terms, k=10)
    assert len(ids_b) and (ids_b >= 50_000_000).all()
    assert np.array_equal(ids_b, ids_e) and np.array_equal(s_b, s_e)


def test_term_payloads_row_aligned(built_index):
    """term_payloads must align row-for-row with term_rows for the same
    term list (single reader: cached; multi reader: re-extracted)."""
    from indri_5_5_ray.pipelines.query import IndexReader
    from indri_5_5_ray.pipelines.repository import MultiIndexReader

    out, _ = built_index
    for reader in (IndexReader(out), MultiIndexReader([out])):
        terms = ["merge", "token", "buffer"]
        rows = reader.term_rows(terms)
        pl = reader.term_payloads(terms)
        want = rows.column("postings").to_pylist()
        assert pl == want


def test_point_read_multi_index_reader(built_index):
    """Regression: _doc_texts moved onto reader._point_read, which
    MultiIndexReader (documented IndexReader-compatible) lacked."""
    from indri_5_5_ray.pipelines.query import IndexReader
    from indri_5_5_ray.pipelines.repository import MultiIndexReader

    out, _ = built_index
    single = IndexReader(out)
    multi = MultiIndexReader([out])
    ids = single.docnos([0, 5, 17])
    t1 = single._point_read("docs", [0, 5, 17], ["doc_id", "dl"])
    t2 = multi._point_read("docs", [0, 5, 17], ["doc_id", "dl"])
    assert t1.sort_by("doc_id").equals(t2.sort_by("doc_id"))
    assert len(ids) == 3
