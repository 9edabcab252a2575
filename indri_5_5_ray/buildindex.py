"""Index-build app — the ``IndriBuildIndex`` analogue and the natural
``ray job submit`` entrypoint for cluster builds.

Usage (flags use the reference's ``-key=value`` command-line style,
ref:buildindex/IndriBuildIndex.cpp:29-181):

    python -m indri_5_5_ray.buildindex -index=/out/dir \\
        -corpus.path=/data/corpus [-corpus.path=...] \\
        [-corpus.class=parquet|trectext|trecweb|html|warc|mbox|<registered>] \\
        [-corpus.annotations=/path/annotations.parquet] \\
        [-stemmer.name=krovetz|porter|none|arabic_*] \\
        [-stopper.word=the -stopper.word=a ...] \\
        [-field.name=title -field.numeric=price -field.date=date ...] \\
        [-storeDocs=true] [-storePositions=false] [-storeDirect=true] \\
        [-dedup=docno|sha256|none] [-norestart]

    # on a cluster (the north-rule invocation):
    ray job submit --working-dir . -- \\
        python -m indri_5_5_ray.buildindex -index=... -corpus.path=...

``-corpus.class`` other than ``parquet`` first converts the raw files
into the standard corpus parquet shape under ``<index>/converted`` via
the file-class readers (TREC/WARC/Mbox/HTML + registry), exactly like
the reference's FileClassEnvironmentFactory chain; the build then runs
the normal resumable pipeline.  Re-running with the same ``-index``
RESUMES from per-chunk lineage (the reference's checkpointed
IndriBuildIndex behaviour); pass ``-norestart`` to wipe and rebuild.

Prints the manifest as one JSON line on success.  As a script entrypoint
this module owns its (guarded) ``ray.init``; library code never does.
"""

from __future__ import annotations

import json
import sys


def parse_args(argv: list[str]) -> dict:
    """Parse ``-key=value`` flags (repeatable keys accumulate)."""
    repeatable = {"corpus.path", "stopper.word", "field.name",
                  "field.numeric", "field.date"}
    out: dict = {k: [] for k in repeatable}
    for a in argv:
        if a == "-norestart":
            out["norestart"] = True
            continue
        if not a.startswith("-") or "=" not in a:
            raise SystemExit(f"unrecognized argument {a!r} "
                             "(expected -key=value)\n\n" + __doc__)
        k, v = a[1:].split("=", 1)
        if k in repeatable:
            out[k].append(v)
        else:
            out[k] = v
    if not out.get("index"):
        raise SystemExit("-index=DIR is required\n\n" + __doc__)
    if not out["corpus.path"]:
        raise SystemExit("at least one -corpus.path=PATH is required\n\n"
                         + __doc__)
    return out


def _to_bool(v: str) -> bool:
    return v.lower() in ("1", "true", "yes", "on")


def _convert_corpus(corpus_paths: list[str], file_class: str,
                    index_dir: str) -> str:
    """Idempotent file-class conversion: raw archives → the standard corpus
    parquet shape under ``<index>/converted``.  A marker records the input
    fingerprint (class + paths + sizes + mtimes); a rerun with unchanged
    inputs SKIPS conversion — a resumed build then reuses byte-identical
    corpus files, keeping the per-chunk lineage fingerprints stable — and
    any other state wipes the directory first (``write_parquet`` APPENDS
    into an existing dir, which would silently double every document)."""
    import hashlib
    import os
    import shutil
    from pathlib import Path

    from .sources.trectext import dataset_to_corpus, read_tagged

    conv = Path(index_dir) / "converted"
    marker = conv / "_converted.json"  # corpus_files only globs *.parquet
    files: list[str] = []
    for p in corpus_paths:
        pp = Path(p)
        files.extend(sorted(str(f) for f in pp.rglob("*") if f.is_file())
                     if pp.is_dir() else [str(pp)])
    fp = hashlib.md5("\n".join(
        f"{f}:{os.path.getsize(f)}:{os.stat(f).st_mtime_ns}" for f in files
    ).encode()).hexdigest()
    sig = {"file_class": file_class, "fingerprint": fp}
    if marker.exists():
        try:
            if json.loads(marker.read_text()) == sig:
                return str(conv)
        except (ValueError, OSError):
            pass
        # CHANGED raw corpus: a stale manifest would otherwise make
        # build_index(resume=True) short-circuit to the OLD corpus's
        # index (and stale per-chunk side files would poison a re-merge),
        # so invalidate the build artifacts — and ONLY them: the raw
        # corpus itself (or any user file) may live under index_dir
        from .pipelines.build import wipe_build_artifacts

        wipe_build_artifacts(index_dir)
    shutil.rmtree(conv, ignore_errors=True)
    ds = read_tagged(corpus_paths if len(corpus_paths) > 1
                     else corpus_paths[0], file_class=file_class)
    out = dataset_to_corpus(ds, file_class, str(conv))
    marker.write_text(json.dumps(sig))
    return out


def run(args: dict) -> dict:
    from .config import IndexConfig
    from .pipelines.build import build_index

    index_dir = args["index"]
    corpus_paths: list[str] = list(args["corpus.path"])
    file_class = args.get("corpus.class", "parquet")
    if args.get("norestart"):
        # wipe the build artifacts (and the conversion cache, so a fresh
        # run re-converts) BEFORE the conversion step — never the whole
        # index dir: the raw corpus or user files may live under it
        import shutil
        from pathlib import Path

        from .pipelines.build import wipe_build_artifacts

        wipe_build_artifacts(index_dir)
        shutil.rmtree(Path(index_dir) / "converted", ignore_errors=True)
    if file_class != "parquet":
        corpus_paths = [_convert_corpus(corpus_paths, file_class, index_dir)]

    stemmer = args.get("stemmer.name", "krovetz")
    cfg = IndexConfig(
        stemmer=None if stemmer in ("none", "") else stemmer,
        stopwords=tuple(args["stopper.word"]),
        store_positions=_to_bool(args.get("storePositions", "true")),
        store_content=_to_bool(args.get("storeDocs", "false")),
        store_direct=_to_bool(args.get("storeDirect", "false")),
        fields=tuple(args["field.name"]),
        numeric_fields=tuple(args["field.numeric"]),
        date_fields=tuple(args["field.date"]),
        offset_annotations=args.get("corpus.annotations"),
        dedup_key=(None if args.get("dedup", "docno") == "none"
                   else args.get("dedup", "docno")),
    )
    return build_index(corpus_paths if len(corpus_paths) > 1
                       else corpus_paths[0], index_dir, cfg,
                       resume=not args.get("norestart", False))


def main(argv: list[str]) -> None:
    args = parse_args(argv)
    import ray

    if not ray.is_initialized():
        # no explicit address: ray.init resolves RAY_ADDRESS, so the same
        # invocation runs standalone (local) and under ray job submit
        # (cluster) unchanged
        ray.init(include_dashboard=False, ignore_reinit_error=True)
    manifest = run(args)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main(sys.argv[1:])
