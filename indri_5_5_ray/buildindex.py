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


def run(args: dict) -> dict:
    from .config import IndexConfig
    from .pipelines.build import build_index

    index_dir = args["index"]
    corpus_paths: list[str] = list(args["corpus.path"])
    file_class = args.get("corpus.class", "parquet")
    if file_class != "parquet":
        from .sources.trectext import dataset_to_corpus, read_tagged

        ds = read_tagged(corpus_paths if len(corpus_paths) > 1
                         else corpus_paths[0], file_class=file_class)
        corpus_paths = [dataset_to_corpus(ds, file_class,
                                          f"{index_dir}/converted")]

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
