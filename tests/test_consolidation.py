"""Reducer fan-in bounding: with many ingest chunks, the merge must read
O(consolidated files), not O(chunks) — the per-reducer dataset discovery +
footer reads are what dominate at 10⁵+ chunks (see
pipelines.build._consolidate_partials)."""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from indri_5_5_ray.config import IndexConfig
from indri_5_5_ray.pipelines.build import _consolidate_partials
from indri_5_5_ray.stages.postings import PARTIALS_SCHEMA, MergeWorker

N_CHUNKS = 5000
N_BUCKETS = 4


def _write_partials(out_dir) -> None:
    (out_dir / "partials").mkdir(parents=True)
    for i in range(N_CHUNKS):
        term = f"t{i % 20:03d}"
        bucket = i % N_BUCKETS
        t = pa.table(
            {
                "term": pa.array([term], pa.string()),
                "bucket": pa.array([bucket], pa.int32()),
                "salt": pa.array([0], pa.int64()),
                "first_doc": pa.array([i], pa.int64()),
                "last_doc": pa.array([i], pa.int64()),
                "doc_ids": pa.array([[i]], pa.list_(pa.int64())),
                "tfs": pa.array([[1 + i % 3]], pa.list_(pa.int32())),
                "dls": pa.array([[10]], pa.list_(pa.int32())),
                "pos_bytes": pa.array([b""], pa.large_binary()),
                "pos_byte_lens": pa.array([[]], pa.list_(pa.int32())),
            },
            schema=PARTIALS_SCHEMA,
        )
        pq.write_table(t, out_dir / "partials" / f"partials-{i:06d}.parquet")


def _merge_bucket0(out_dir: str, partials_dir: str | None, tag: str):
    cfg = IndexConfig(store_positions=False, n_buckets=N_BUCKETS,
                      salt_docs_per_group=10**9)
    w = MergeWorker(out_dir, cfg.to_dict(), plan_fingerprint=tag,
                    partials_dir=partials_dir)
    t0 = time.perf_counter()
    w(pa.table({"bucket": pa.array([0, 1], pa.int32())}))
    wall = time.perf_counter() - t0
    got = pq.read_table(f"{out_dir}/postings/postings-00000.parquet")
    return wall, got.sort_by([("term", "ascending"), ("salt", "ascending")])


def test_consolidation_bounds_reducer_fan_in(tmp_path, monkeypatch):
    out = tmp_path / "idx"
    _write_partials(out)
    out_str = str(out)

    # raw: every reducer opens all N_CHUNKS files
    t_raw, merged_raw = _merge_bucket0(out_str, None, "raw")

    monkeypatch.setenv("INDRI55_MAX_REDUCER_FILES", "64")
    cfg = IndexConfig(store_positions=False, n_buckets=N_BUCKETS)
    src = _consolidate_partials(out_str, cfg)
    assert src.endswith("partials_c")
    n_consolidated = len(list((out / "partials_c").glob("*.parquet")))
    # the reducer-visible file count is bounded by the threshold (±1 group)
    assert n_consolidated <= 65, n_consolidated

    t_cons, merged_cons = _merge_bucket0(out_str, src, "cons")

    # identical merge output (same postings bytes, stats, blocks)
    assert merged_raw.equals(merged_cons)
    # wall-time scales with the bucket's data, not the chunk count: reading
    # ~64 consolidated files must beat reading 5000 footers
    assert t_cons < t_raw, (t_cons, t_raw)

    # idempotent resume: a second call skips via lineage records
    t0 = time.perf_counter()
    src2 = _consolidate_partials(out_str, cfg)
    assert src2 == src
    assert time.perf_counter() - t0 < t_raw


def test_consolidation_noop_below_threshold(tmp_path, monkeypatch):
    out = tmp_path / "idx"
    (out / "partials").mkdir(parents=True)
    t = PARTIALS_SCHEMA.empty_table()
    pq.write_table(t, out / "partials" / "partials-000000.parquet")
    monkeypatch.setenv("INDRI55_MAX_REDUCER_FILES", "64")
    cfg = IndexConfig(store_positions=False, n_buckets=N_BUCKETS)
    src = _consolidate_partials(str(out), cfg)
    assert src.endswith("partials")
