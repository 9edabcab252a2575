"""Offline N-way index merge — the ``Repository::merge`` analogue.

The reference merges independent repositories by validating compatible
configurations, rebasing docIDs by each repo's ``documentMaximum``, and
running the IndexWriter k-way merge over all source indexes
(ref:src/Repository.cpp:1365-1483, rebase ref:src/IndexWriter.cpp:308-317;
the ``dumpindex merge`` command, ref:dumpindex/dumpindex.cpp).

Ray shape: phase A rewrites each source index's persisted partials and doc
tables with its docID offset (vectorized arrow arithmetic, one task per
source file — embarrassingly parallel); phase B is the standard per-bucket
MergeWorker over the combined partials.  Configs must match (same
tokenization pipeline), like the reference's stemmer/field validation.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..config import IndexConfig
from ..stages.postings import MergeWorker


def _rebase_partials_file(src: str, dst: str, offset: int, salt_span: int) -> int:
    t = pq.read_table(src)
    if offset:
        doc_ids = t.column("doc_ids")
        new_doc_ids = pa.chunked_array(
            [
                pa.ListArray.from_arrays(
                    c.offsets,
                    pa.array(c.flatten().to_numpy(zero_copy_only=False) + offset,
                             pa.int64()),
                )
                for c in doc_ids.chunks
            ]
        )
        first = pa.array(t.column("first_doc").to_numpy() + offset, pa.int64())
        last = pa.array(t.column("last_doc").to_numpy() + offset, pa.int64())
        salt = pa.array((t.column("first_doc").to_numpy() + offset) // salt_span,
                        pa.int64())
        t = (
            t.set_column(t.schema.get_field_index("doc_ids"), "doc_ids", new_doc_ids)
            .set_column(t.schema.get_field_index("first_doc"), "first_doc", first)
            .set_column(t.schema.get_field_index("last_doc"), "last_doc", last)
            .set_column(t.schema.get_field_index("salt"), "salt", salt)
        )
    pq.write_table(t, dst, row_group_size=max(256, t.num_rows // 32))
    return t.num_rows


def _rebase_docs_file(src: str, dst: str, offset: int) -> int:
    t = pq.read_table(src)
    if offset:
        t = t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            pa.array(t.column("doc_id").to_numpy() + offset, pa.int64()),
        )
    if "content" in t.column_names:
        # keep the content docstore's point-read layout (256-row groups,
        # stages/ingest.py) through index merges
        pq.write_table(t, dst, row_group_size=256)
    else:
        pq.write_table(t, dst)
    return t.num_rows


def merge_indexes(index_dirs: list[str], out_dir: str,
                  resume: bool = True) -> dict:
    """Merge N compatible indexes into one (docIDs rebased in input order)."""
    manifests = [json.loads((Path(d) / "manifest.json").read_text()) for d in index_dirs]
    cfgs = [m["config"] for m in manifests]
    for c in cfgs[1:]:  # compatibility validation (like the reference's
        # stemmer/field check, ref:src/Repository.cpp:1365-1483) — layout
        # parameters must match too, or partials land in unmergeable buckets
        for key in ("tokenizer", "stemmer", "stopwords", "fields",
                    "numeric_fields", "date_fields", "store_positions",
                    "store_direct", "store_content", "n_buckets",
                    "salt_docs_per_group", "target_block_bytes"):
            if c.get(key) != cfgs[0].get(key):
                raise ValueError(f"incompatible indexes: {key} differs")
    cfg = IndexConfig.from_dict(cfgs[0])

    out = Path(out_dir)
    manifest_path = out / "manifest.json"
    if manifest_path.exists():
        if resume:
            return json.loads(manifest_path.read_text())
        shutil.rmtree(out)
    elif out.exists():
        # an interrupted previous merge left no manifest: its outputs may
        # belong to a DIFFERENT source set (and its lineage records could
        # make merge buckets skip as already-done) — start fully clean
        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "partials").mkdir(exist_ok=True)
    (out / "docs").mkdir(exist_ok=True)

    # docID rebase offsets: cumulative documentMaximum (ref:IndexWriter.cpp:308-317)
    offsets = []
    base = 0
    for m in manifests:
        offsets.append(base)
        base += m["max_doc_id"] + 1

    salt_span = cfg.salt_docs_per_group

    @ray.remote(num_cpus=1)
    def rebase_task(kind: str, src: str, dst: str, offset: int) -> int:
        if kind == "partials":
            return _rebase_partials_file(src, dst, offset, salt_span)
        return _rebase_docs_file(src, dst, offset)

    tasks = []
    for i, d in enumerate(index_dirs):
        for f in sorted(Path(d, "partials").glob("*.parquet")):
            tasks.append(rebase_task.remote(
                "partials", str(f), str(out / "partials" / f"src{i}-{f.name}"),
                offsets[i]))
        # docs + any doc_id-keyed sidecar data (forward index, field extents)
        for sub in ("docs", "direct", "fields"):
            src_dir = Path(d, sub)
            if not src_dir.exists():
                continue
            (out / sub).mkdir(exist_ok=True)
            for f in sorted(src_dir.glob("*.parquet")):
                tasks.append(rebase_task.remote(
                    "docs", str(f), str(out / sub / f"src{i}-{f.name}"),
                    offsets[i]))
    ray.get(tasks)

    # deleted lists ride along, rebased, so previously deleted docs stay
    # deleted in the merged index (the repository's compact path is the one
    # that physically drops them)
    del_parts = []
    for i, d in enumerate(index_dirs):
        p = Path(d) / "deleted.parquet"
        if p.exists():
            ids = pq.read_table(p, columns=["doc_id"]).column("doc_id").to_numpy()
            if len(ids):
                del_parts.append(ids.astype(np.int64) + offsets[i])
    if del_parts:
        merged_del = np.unique(np.concatenate(del_parts))
        pq.write_table(
            pa.table({"doc_id": pa.array(merged_del, pa.int64())}),
            out / "deleted.parquet")

    # phase B: the standard bucketed merge over combined partials
    cfg_dict = cfg.to_dict()
    plan_fp = "merge:" + ":".join(str(m["max_doc_id"]) for m in manifests)

    @ray.remote(num_cpus=1)
    def merge_task(bucket: int) -> dict:
        t = MergeWorker(str(out), cfg_dict, plan_fp)(
            pa.table({"bucket": pa.array([bucket], pa.int32())})
        )
        return t.to_pylist()[0]

    merge_records = ray.get([merge_task.remote(b) for b in range(cfg.n_buckets)])

    manifest = {
        "format_version": 1,
        "config": cfg_dict,
        "doc_count": sum(m["doc_count"] for m in manifests),
        "total_terms": sum(m["total_terms"] for m in manifests),
        "max_doc_id": base - 1,
        "unique_terms": sum(r.get("n_terms", 0) for r in merge_records),
        "merged_from": [str(d) for d in index_dirs],
        "n_chunks": sum(m.get("n_chunks", 0) for m in manifests),
        "n_ingested": sum(m.get("n_ingested", 0) for m in manifests),
        "timings": {},
    }
    tmp = manifest_path.with_suffix(".tmp")
    tmp.write_text(json.dumps(manifest, indent=2))
    tmp.replace(manifest_path)
    return manifest
