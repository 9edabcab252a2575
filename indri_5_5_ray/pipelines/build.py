"""Index build orchestration — the Ray-Data pipeline.

Phases (SURVEY.md §7.2):

0. chunk planning — deterministic resumable work items with sequential docID
   bases (ingest-order docIDs like ``MemoryIndex::addDocument``
   ref:src/MemoryIndex.cpp:550, made deterministic under parallelism);
1. optional exact-dedup scan — (doc_id, key) pairs → groupby(key) → losers
   written doc_id-sorted for range-pruned lookup in ingest (the reference's
   ingest-time docno dedup, ref:src/IndexEnvironment.cpp:388-404);
2. ingest — actor-pool map_batches over work items (stemmer state per actor),
   side outputs docs/ + partials/ parquet per chunk + lineage records;
3. postings merge — ``groupby(bucket).map_groups`` shuffle of partial runs →
   delta+vbyte block-encoded posting lists with block-max metadata (the
   ``IndexWriter`` k-way merge, ref:src/IndexWriter.cpp:810-879);
4. dictionary + global statistics aggregates → manifest.json (completion
   marker; stats are GLOBAL as required for rank-identity,
   ref:src/QueryEnvironment.cpp:957-970).

Reruns skip ingest chunks whose lineage records match (kill-and-resume safe);
the merge restarts from persisted partials.
"""

from __future__ import annotations

import json
import shutil
import time
from dataclasses import asdict
from pathlib import Path

import pyarrow as pa
import ray
import ray.data

from ..config import IndexConfig
from ..sources.corpus import Chunk, plan_chunks, read_chunk
from ..stages.ingest import IngestWorker
from ..stages.postings import merge_bucket

def _ingest_concurrency() -> tuple[int, int]:
    """Actor-pool size tracks the cluster CPU count (one CPU per actor)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(2, cpus))


def _dedup_losers(chunk_dicts: list[dict], cfg: IndexConfig, out_dir: str) -> str | None:
    """Phase 1: find duplicate doc_ids to drop (keep first arrival = min
    doc_id, mirroring the reference's keep-first ingest dedup)."""
    key = cfg.dedup_key

    def scan(batch: pa.Table) -> pa.Table:
        import hashlib

        out_ids, out_keys = [], []
        for item in batch.to_pylist():
            chunk = Chunk(**{k: item[k] for k in ("file_path", "row_start", "row_end", "doc_id_base")})
            if key == "sha256":
                t = read_chunk(chunk, columns=["content"])
                ks = [hashlib.sha256(c.encode("utf-8")).hexdigest()
                      for c in t.column("content").to_pylist()]
            else:
                t = read_chunk(chunk, columns=["repo", "path", "commit"])
                ks = [f"{r}/{p}@{c}" for r, p, c in zip(
                    t.column("repo").to_pylist(), t.column("path").to_pylist(),
                    t.column("commit").to_pylist())]
            out_ids.extend(range(chunk.doc_id_base, chunk.doc_id_base + len(ks)))
            out_keys.extend(ks)
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()), "key": pa.array(out_keys)})

    def keep_losers(group: pa.Table) -> pa.Table:
        if "doc_id" not in group.column_names:  # empty reduce partition
            return pa.table({"doc_id": pa.array([], pa.int64())})
        ids = group.column("doc_id").to_numpy()
        if len(ids) <= 1:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        keep = ids.min()
        return pa.table({"doc_id": pa.array(sorted(int(i) for i in ids if i != keep), pa.int64())})

    import pyarrow.parquet as _pq

    from ..state import lineage as _lineage

    losers_dir = f"{out_dir}/dedup_losers"
    fingerprint = f"{key}:{len(chunk_dicts)}:{chunk_dicts[-1]['doc_id_base'] if chunk_dicts else 0}"

    def _count_rows() -> int:
        return sum(
            _pq.read_metadata(f).num_rows for f in Path(losers_dir).glob("*.parquet")
        )

    if _lineage.is_done(out_dir, "dedup", "all", fingerprint) and Path(losers_dir).exists():
        return losers_dir if _count_rows() else None

    t0 = time.perf_counter()
    shutil.rmtree(losers_dir, ignore_errors=True)
    ds = ray.data.from_items(chunk_dicts)
    pairs = ds.map_batches(scan, batch_size=1, batch_format="pyarrow")
    losers = pairs.groupby("key").map_groups(keep_losers, batch_format="pyarrow")
    # doc_id-sorted output → ingest workers range-prune their losers lookup
    losers.sort("doc_id").write_parquet(losers_dir)
    n = _count_rows()
    _lineage.write_record(
        out_dir, "dedup", "all", fingerprint, rows=n, bytes_written=0,
        wall_ms=(time.perf_counter() - t0) * 1000,
    )
    return losers_dir if n else None


def build_index(
    corpus: str | list[str],
    out_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = True,
) -> dict:
    """Build a full index from a Parquet corpus directory. Returns the manifest."""
    cfg = cfg or IndexConfig()
    out = Path(out_dir)
    manifest_path = out / "manifest.json"
    if manifest_path.exists():
        if resume:
            return json.loads(manifest_path.read_text())
        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)
    if not resume:
        for sub in ("docs", "partials", "postings", "lineage", "dedup_losers"):
            shutil.rmtree(out / sub, ignore_errors=True)

    t_start = time.perf_counter()
    chunks = plan_chunks(corpus, max_chunk_docs=cfg.max_chunk_docs)
    chunk_dicts = [asdict(c) for c in chunks]
    timings: dict[str, float] = {}

    # -- phase 1: dedup scan ------------------------------------------------
    t0 = time.perf_counter()
    losers_path = _dedup_losers(chunk_dicts, cfg, str(out)) if cfg.dedup_key else None
    timings["dedup_s"] = time.perf_counter() - t0

    # -- phase 2: ingest (tokenize/stem/partial postings) -------------------
    t0 = time.perf_counter()
    items = ray.data.from_items(chunk_dicts)
    records = items.map_batches(
        IngestWorker,
        batch_size=1,
        batch_format="pyarrow",
        concurrency=_ingest_concurrency(),
        num_cpus=1,
        fn_constructor_kwargs={
            "out_dir": str(out),
            "cfg_dict": cfg.to_dict(),
            "losers_path": losers_path,
        },
    ).take_all()
    timings["ingest_s"] = time.perf_counter() - t0

    # -- phase 3: postings merge (the groupby-term shuffle) -----------------
    t0 = time.perf_counter()
    partials = ray.data.read_parquet(f"{out}/partials")
    store_positions = cfg.store_positions
    target = cfg.target_block_bytes

    def _merge(group: pa.Table) -> pa.Table:
        return merge_bucket(group, store_positions, target)

    merged = partials.groupby("bucket").map_groups(_merge, batch_format="pyarrow")
    postings_dir = f"{out}/postings"
    merged.write_parquet(postings_dir)
    timings["merge_s"] = time.perf_counter() - t0

    # -- phase 4: dictionary + global stats → manifest ----------------------
    t0 = time.perf_counter()
    post_stats = ray.data.read_parquet(
        postings_dir, columns=["term", "cf", "df", "max_dl", "min_dl"]
    )
    from ray.data.aggregate import Max, Min, Sum

    dictionary = post_stats.groupby("term").aggregate(
        Sum("cf", alias_name="cf"),
        Sum("df", alias_name="df"),
        Max("max_dl", alias_name="max_dl"),
        Min("min_dl", alias_name="min_dl"),
    )
    dictionary.write_parquet(f"{out}/dictionary")

    # global corpus statistics come straight from the committed lineage
    # records (no extra pass over the data); unique_terms from the written
    # dictionary's parquet footers (driver-side metadata only)
    import pyarrow.parquet as _pq

    doc_count = sum(r.get("kept_docs", 0) for r in records)
    total_terms = sum(r.get("total_term_slots", 0) for r in records)
    max_doc_id = max(c.doc_id_base + (c.row_end - c.row_start) for c in chunks) - 1
    unique_terms = sum(
        _pq.read_metadata(f).num_rows for f in Path(f"{out}/dictionary").glob("*.parquet")
    )
    timings["stats_s"] = time.perf_counter() - t0
    timings["total_s"] = time.perf_counter() - t_start

    manifest = {
        "format_version": 1,
        "config": cfg.to_dict(),
        "doc_count": int(doc_count),
        "total_terms": int(total_terms),
        "max_doc_id": int(max_doc_id),
        "unique_terms": int(unique_terms),
        "n_chunks": len(chunks),
        "n_ingested": sum(1 for r in records if r.get("status") == "ok"),
        "timings": {k: round(v, 3) for k, v in timings.items()},
    }
    tmp = manifest_path.with_suffix(".tmp")
    tmp.write_text(json.dumps(manifest, indent=2))
    tmp.replace(manifest_path)
    return manifest
