"""Per-partition lineage records → checkpoint-resumable builds.

The reference recovers by deleting documents past the last checkpointed
manifest and re-ingesting (ref:src/Repository.cpp:1198-1215,
ref:buildindex/IndriBuildIndex.cpp:611-669).  Here every ingest chunk writes
its outputs under deterministic names derived from its doc-id range and then
commits a lineage record; a rerun skips chunks whose record matches.  The
final ``manifest.json`` is the completion marker for the whole build.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path


def lineage_path(out_dir: str, stage: str, partition_id: str) -> Path:
    return Path(out_dir) / "lineage" / f"{stage}-{partition_id}.json"


def write_record(
    out_dir: str,
    stage: str,
    partition_id: str,
    input_fingerprint: str,
    rows: int,
    bytes_written: int,
    wall_ms: float,
    status: str = "ok",
    extra: dict | None = None,
) -> dict:
    rec = {
        "stage": stage,
        "partition_id": partition_id,
        "input_fingerprint": input_fingerprint,
        "rows": rows,
        "bytes": bytes_written,
        "wall_ms": round(wall_ms, 3),
        "status": status,
        "ts": time.time(),
    }
    if extra:
        rec.update(extra)
    p = lineage_path(out_dir, stage, partition_id)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps(rec))
    os.replace(tmp, p)  # atomic commit
    return rec


def read_record(out_dir: str, stage: str, partition_id: str) -> dict | None:
    p = lineage_path(out_dir, stage, partition_id)
    if not p.exists():
        return None
    try:
        return json.loads(p.read_text())
    except (json.JSONDecodeError, OSError):
        return None


def is_done(out_dir: str, stage: str, partition_id: str, input_fingerprint: str) -> bool:
    rec = read_record(out_dir, stage, partition_id)
    return (
        rec is not None
        and rec.get("status") == "ok"
        and rec.get("input_fingerprint") == input_fingerprint
    )


def all_records(out_dir: str) -> list[dict]:
    d = Path(out_dir) / "lineage"
    if not d.exists():
        return []
    out = []
    for p in sorted(d.glob("*.json")):
        try:
            out.append(json.loads(p.read_text()))
        except (json.JSONDecodeError, OSError):
            pass
    return out
