"""Parallel chunk planning ≡ serial (sources/corpus.py plan_chunks).

The footer scan fans out as Ray tasks on many-file corpora; the resulting
plan (file order, row ranges, doc_id bases) must be IDENTICAL to the
serial scan's — doc_id assignment is the engine's ingest-order contract
(ref:src/MemoryIndex.cpp:550)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from indri_5_5_ray.sources.corpus import plan_chunks


def _write_files(tmp_path, n_files: int) -> str:
    d = tmp_path / "many"
    d.mkdir()
    for i in range(n_files):
        rows = 5 + (i % 37)  # varied sizes, some multi-row-group
        t = pa.table({
            "repo": pa.array([f"r{i}"] * rows),
            "path": pa.array([f"p{j}" for j in range(rows)]),
            "commit": pa.array(["c"] * rows),
            "lang": pa.array(["py"] * rows),
            "content": pa.array([f"x {i} {j}" for j in range(rows)]),
        })
        pq.write_table(t, d / f"f-{i:05d}.parquet",
                       row_group_size=7 if i % 3 else 4)
    return str(d)


def test_parallel_plan_identical(tmp_path, ray_session):
    corpus = _write_files(tmp_path, 60)
    serial = plan_chunks(corpus, max_chunk_docs=16, parallel=False)
    fanned = plan_chunks(corpus, max_chunk_docs=16, parallel=True)
    assert fanned == serial
    assert len(serial) > 60  # multi-chunk files exist
    # bases are the ingest-order prefix sum
    total = 0
    by_file: dict[str, int] = {}
    for c in serial:
        by_file.setdefault(c.file_path, c.doc_id_base)
    for fp in sorted(by_file):
        assert by_file[fp] == total
        total += sum(ch.row_end - ch.row_start
                     for ch in serial if ch.file_path == fp)


def test_auto_threshold_uses_serial_below_min(tmp_path, ray_session):
    """Small corpora must not pay task fan-out: parallel=None stays serial
    below _PLAN_PARALLEL_MIN (observable only via identical results here,
    pinned so the threshold isn't accidentally dropped to 0)."""
    from indri_5_5_ray.sources import corpus as corpus_mod

    assert corpus_mod._PLAN_PARALLEL_MIN >= 64
    d = _write_files(tmp_path, 5)
    assert plan_chunks(d, max_chunk_docs=16) == plan_chunks(
        d, max_chunk_docs=16, parallel=False)
