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
