"""Corpus sources: the (repo, path, commit, lang, content) Parquet table.

Three producers:

* ``plan_chunks`` — deterministic work-item planning over a Parquet corpus
  directory: files in sorted path order, row-group-aligned chunks, sequential
  ``doc_id`` bases.  This reproduces the reference's sequential ingest-order
  docID assignment (``MemoryIndex::addDocument`` ref:src/MemoryIndex.cpp:550)
  deterministically under parallelism: doc_id = rows-before-file + row offset.
* ``synthetic_corpus`` — seeded code-like corpus per FIXTURES.md §1: keyword
  skew, shared license header on ~30% of rows, UTF-8/acronym/number tokens,
  exact-duplicate contents for dedup.
* ``corpus_from_documents`` — deterministic mapping of the driver's
  ``documents`` table into the corpus shape (repo=source, path=doc_<id>.txt,
  commit=md5(text), content=text) so DuckDB oracles over the ``documents``
  view can replicate corpus-derived results.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)


# ---------------------------------------------------------------------------
# chunk planning (ingest work items)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Chunk:
    """One resumable unit of ingest work: a row range of one parquet file."""

    file_path: str
    row_start: int      # row offset within the file
    row_end: int        # exclusive
    doc_id_base: int    # global doc_id of row_start

    @property
    def chunk_id(self) -> str:
        return f"{self.doc_id_base:012d}-{self.doc_id_base + self.row_end - self.row_start:012d}"


def corpus_files(corpus: str | list[str]) -> list[str]:
    if isinstance(corpus, (list, tuple)):
        return sorted(str(p) for p in corpus)
    p = Path(corpus)
    if p.is_file():
        return [str(p)]
    return sorted(str(f) for f in p.rglob("*.parquet"))


def _footer_rg_sizes(fp: str) -> list[int]:
    """Row-group sizes from one parquet footer."""
    md = pq.read_metadata(fp)
    return [md.row_group(i).num_rows for i in range(md.num_row_groups)]


def _chunks_for_file(fp: str, rg_sizes: list[int], base: int,
                     max_chunk_docs: int) -> list[Chunk]:
    """One file's chunks given its row-group sizes and global base —
    pure function, so the footer scan can run anywhere."""
    chunks: list[Chunk] = []
    row = 0
    pending = 0
    pending_start = 0
    for n in rg_sizes:
        if n > 4 * max_chunk_docs:
            if pending:
                chunks.append(Chunk(fp, pending_start, pending_start + pending, base + pending_start))
                pending = 0
            # slice the big row group
            s = row
            while s < row + n:
                e = min(s + max_chunk_docs, row + n)
                chunks.append(Chunk(fp, s, e, base + s))
                s = e
            row += n
            pending_start = row
            continue
        if pending == 0:
            pending_start = row
        pending += n
        row += n
        if pending >= max_chunk_docs:
            chunks.append(Chunk(fp, pending_start, pending_start + pending, base + pending_start))
            pending = 0
            pending_start = row
    if pending:
        chunks.append(Chunk(fp, pending_start, pending_start + pending, base + pending_start))
    return chunks


# below this many files the footer scan stays a serial driver loop — the
# per-file footer read is ~100 µs, so task fan-out only pays off when the
# corpus has enough files that the scan would otherwise be the build's
# serial prefix (10⁵-10⁶ files at web scale = minutes before the first task)
_PLAN_PARALLEL_MIN = 512
_PLAN_SCAN_BATCH = 256  # files per footer-scan task


def plan_chunks(corpus: str | list[str], max_chunk_docs: int = 4096,
                parallel: bool | None = None) -> list[Chunk]:
    """Deterministic chunk plan. Row-group aligned where possible; row groups
    larger than 4× the target are sliced (small-scale parallelism).

    The footer scan fans out as Ray tasks when the corpus has many files
    (``parallel=None`` auto-enables at ≥ ``_PLAN_PARALLEL_MIN`` files with
    Ray initialised); the doc_id bases are then a prefix sum over per-file
    row counts, so the plan is IDENTICAL to the serial scan's by
    construction (pytest-pinned).  Chunk assembly itself is pure in-memory
    arithmetic and stays on the driver."""
    files = corpus_files(corpus)
    use_parallel = (len(files) >= _PLAN_PARALLEL_MIN
                    if parallel is None else parallel)
    if use_parallel:
        import ray

        if not ray.is_initialized():
            use_parallel = False
    if use_parallel:
        import ray

        scan = ray.remote(num_cpus=0.5)(
            lambda fps: [_footer_rg_sizes(fp) for fp in fps])
        batches = [files[i:i + _PLAN_SCAN_BATCH]
                   for i in range(0, len(files), _PLAN_SCAN_BATCH)]
        nested = ray.get([scan.remote(b) for b in batches])
        sizes_by_file = [s for part in nested for s in part]
    else:
        sizes_by_file = [_footer_rg_sizes(fp) for fp in files]
    chunks: list[Chunk] = []
    base = 0
    for fp, rg_sizes in zip(files, sizes_by_file):
        chunks.extend(_chunks_for_file(fp, rg_sizes, base, max_chunk_docs))
        base += sum(rg_sizes)
    return chunks


def read_chunk(chunk: Chunk, columns: list[str] | None = None) -> pa.Table:
    """Read one chunk's rows (column-pruned)."""
    f = pq.ParquetFile(chunk.file_path)
    # find covering row groups
    start, end = chunk.row_start, chunk.row_end
    covered = []
    row = 0
    for i in range(f.num_row_groups):
        n = f.metadata.row_group(i).num_rows
        if row + n > start and row < end:
            covered.append((i, row))
        row += n
        if row >= end:
            break
    # single-threaded read: worker tasks are already one-per-CPU; letting
    # pyarrow fan out its own thread pool oversubscribes the node
    tables = [f.read_row_group(i, columns=columns, use_threads=False) for i, _ in covered]
    t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    first_covered_row = covered[0][1]
    return t.slice(start - first_covered_row, end - start)


# ---------------------------------------------------------------------------
# synthetic corpus (FIXTURES.md §1)
# ---------------------------------------------------------------------------

_LANGS = ["c", "cpp", "py", "java", "go", "js", "md", "txt"]

_KEYWORDS = {
    "c": ["int", "char", "void", "return", "if", "else", "for", "while", "struct",
          "static", "const", "sizeof", "include", "define"],
    "py": ["def", "return", "if", "else", "for", "while", "class", "import",
           "from", "self", "None", "True", "False", "lambda"],
    "java": ["public", "private", "static", "void", "class", "return", "new",
             "int", "String", "final", "import", "extends"],
    "go": ["func", "return", "if", "else", "for", "range", "struct", "var",
           "package", "import", "defer", "chan"],
    "js": ["function", "return", "if", "else", "for", "while", "const", "let",
           "var", "new", "class", "export"],
}
_KEYWORDS["cpp"] = _KEYWORDS["c"] + ["namespace", "template", "class", "virtual"]
_KEYWORDS["md"] = ["the", "and", "is", "of", "to", "a", "in", "that", "it", "for"]
_KEYWORDS["txt"] = _KEYWORDS["md"]

LICENSE_HEADER = (
    "Copyright (c) 2004 Example Project Contributors. All Rights Reserved. "
    "Use of this software is subject to the terms of the license agreement "
    "set forth in the LICENSE file included with this distribution and "
    "available at http://www.example.org/license.html"
)

_IDENT_PARTS = [
    "get", "set", "index", "build", "merge", "token", "stream", "batch", "shard",
    "buffer", "writer", "reader", "count", "total", "offset", "length", "hash",
    "table", "node", "query", "score", "rank", "doc", "term", "posting", "block",
]

_COMMENT_WORDS = [
    "computes", "returns", "the", "value", "for", "given", "input", "when",
    "buffer", "overflow", "happens", "retry", "U.S.A.", "don't", "naïve",
    "café", "Zürich", "résumé", "running", "flies", "indexed", "normalization",
    "e.g.", "i.e.", "TODO", "FIXME", "x86-64", "IPv6", "3.14", "-42",
]


def synthetic_corpus(n_rows: int, seed: int = 42, dup_fraction: float = 0.02) -> pa.Table:
    """Deterministic code-like corpus (FIXTURES.md §1)."""
    rng = random.Random(seed)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_rows):
        lang = _LANGS[rng.randrange(len(_LANGS))]
        repo = f"org{rng.randrange(64):04d}/proj{rng.randrange(16)}"
        path = (
            f"src/{rng.choice(_IDENT_PARTS)}/{rng.choice(_IDENT_PARTS)}"
            f"_{rng.choice(_IDENT_PARTS)}{i}.{lang}"
        )
        commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
        if dup_fraction > 0 and i > 10 and rng.random() < dup_fraction:
            content = contents[rng.randrange(len(contents))]  # exact duplicate
        else:
            parts = []
            if rng.random() < 0.30:
                parts.append(LICENSE_HEADER)
            kw = _KEYWORDS.get(lang, _KEYWORDS["txt"])
            n_lines = rng.randrange(5, 60)
            for _ in range(n_lines):
                line = []
                for _ in range(rng.randrange(3, 12)):
                    r = rng.random()
                    if r < 0.45:
                        line.append(kw[rng.randrange(len(kw))])
                    elif r < 0.75:
                        line.append(
                            rng.choice(_IDENT_PARTS) + "_" + rng.choice(_IDENT_PARTS)
                        )
                    elif r < 0.85:
                        line.append(str(rng.randrange(10000)))
                    else:
                        line.append(rng.choice(_COMMENT_WORDS))
                parts.append(" ".join(line))
            content = "\n".join(parts)
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(content)
    return pa.table(
        {"repo": repos, "path": paths, "commit": commits, "lang": langs,
         "content": contents},
        schema=CORPUS_SCHEMA,
    )


def write_synthetic_corpus(
    out_dir: str, n_rows: int, seed: int = 42, rows_per_file: int = 10000
) -> list[str]:
    """Write the synthetic corpus as multiple parquet files (sharded)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = []
    start = 0
    shard = 0
    while start < n_rows:
        n = min(rows_per_file, n_rows - start)
        t = synthetic_corpus(n, seed=seed + shard)
        fp = out / f"corpus-{shard:05d}.parquet"
        pq.write_table(t, fp)
        files.append(str(fp))
        start += n
        shard += 1
    return files


# ---------------------------------------------------------------------------
# documents-table mapping (for DuckDB-oracle-checkable pipelines)
# ---------------------------------------------------------------------------


def corpus_from_documents(sf_dir: str) -> pa.Table:
    """Map the driver's documents table into the corpus shape, 1:1 and
    SQL-reproducible (commit = md5(text), docno = source/doc_<id>.txt@commit)."""
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = t.column("text").to_pylist()
    ids = t.column("doc_id").to_pylist()
    sources = t.column("source").to_pylist()
    langs = t.column("lang").to_pylist()
    return pa.table(
        {
            "repo": sources,
            "path": [f"doc_{i}.txt" for i in ids],
            "commit": [hashlib.md5(x.encode()).hexdigest() for x in texts],
            "lang": langs,
            "content": texts,
        },
        schema=CORPUS_SCHEMA,
    )


def corpus_from_documents_tagged(sf_dir: str) -> pa.Table:
    """documents table → tagged corpus for FIELD indexing, SQL-reproducibly:

    ``<title> first-8-tokens </title> text <size> n_chars </size>``

    The title repeats the first 8 ``[a-z0-9]+`` tokens of lower(text), so a
    DuckDB oracle can rebuild the exact token stream (title tokens + text
    tokens + the n_chars token) and the title extent is [0, min(8, L));
    ``size`` is a numeric field whose value is n_chars."""
    import re as _re

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = t.column("text").to_pylist()
    ids = t.column("doc_id").to_pylist()
    sources = t.column("source").to_pylist()
    langs = t.column("lang").to_pylist()
    n_chars = t.column("n_chars").to_pylist()
    contents = []
    for text, nc in zip(texts, n_chars):
        title = " ".join(_re.findall(r"[a-z0-9]+", text.lower())[:8])
        contents.append(f"<title> {title} </title> {text} <size> {nc} </size>")
    return pa.table(
        {
            "repo": sources,
            "path": [f"doc_{i}.txt" for i in ids],
            "commit": [hashlib.md5(x.encode()).hexdigest() for x in texts],
            "lang": langs,
            "content": contents,
        },
        schema=CORPUS_SCHEMA,
    )


def corpus_from_documents_annotated(sf_dir: str) -> tuple[pa.Table, pa.Table]:
    """documents table → (corpus, annotations): the SAME token stream as
    :func:`corpus_from_documents_tagged` but with the title extent supplied
    as an OFFSET-ANNOTATION side table (docno, field, begin, end) instead
    of inline ``<title>`` tags — the OffsetAnnotationAnnotator ingest join
    (ref:src/OffsetAnnotationAnnotator.cpp).  An index built from this pair
    must be query-for-query identical to the inline-tagged one, so the
    tagged corpus's SQL oracles check the annotation path verbatim."""
    import re as _re

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = t.column("text").to_pylist()
    ids = t.column("doc_id").to_pylist()
    sources = t.column("source").to_pylist()
    langs = t.column("lang").to_pylist()
    n_chars = t.column("n_chars").to_pylist()
    contents, ann_docno, ann_begin, ann_end = [], [], [], []
    for i, (text, nc, src) in enumerate(zip(texts, n_chars, sources)):
        toks = _re.findall(r"[a-z0-9]+", text.lower())[:8]
        title = " ".join(toks)
        contents.append(f"{title} {text} <size> {nc} </size>")
        commit = hashlib.md5(text.encode()).hexdigest()
        ann_docno.append(f"{src}/doc_{ids[i]}.txt@{commit}")
        ann_begin.append(0)
        ann_end.append(len(toks))
    corpus = pa.table(
        {
            "repo": sources,
            "path": [f"doc_{i}.txt" for i in ids],
            "commit": [hashlib.md5(x.encode()).hexdigest() for x in texts],
            "lang": langs,
            "content": contents,
        },
        schema=CORPUS_SCHEMA,
    )
    annotations = pa.table({
        "docno": pa.array(ann_docno, pa.string()),
        "field": pa.array(["title"] * len(ann_docno), pa.string()),
        "begin": pa.array(ann_begin, pa.int64()),
        "end": pa.array(ann_end, pa.int64()),
    })
    return corpus, annotations


def corpus_from_documents_nested(sf_dir: str) -> pa.Table:
    """documents table → NESTED tagged corpus for tag-tree (path
    restriction) indexing, SQL-reproducibly.  The token stream is the same
    as :func:`corpus_from_documents_tagged` (title tokens + text tokens +
    n_chars), but the tag TREE varies by ``doc_id % 3``:

    * ``0``: ``<sec><p><title>t</title></p> text </sec>`` — title child of
      p, descendant of sec
    * ``1``: ``<sec><title>t</title> text </sec>`` — title child of sec
    * ``2``: ``<title>t</title> <sec> text </sec>`` — title OUTSIDE sec

    so a DuckDB oracle can select the matching relation with
    ``doc_id % 3``."""
    import re as _re

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = t.column("text").to_pylist()
    ids = t.column("doc_id").to_pylist()
    sources = t.column("source").to_pylist()
    langs = t.column("lang").to_pylist()
    n_chars = t.column("n_chars").to_pylist()
    contents = []
    for did, text, nc in zip(ids, texts, n_chars):
        title = " ".join(_re.findall(r"[a-z0-9]+", text.lower())[:8])
        mod = int(did) % 3
        if mod == 0:
            c = f"<sec><p><title> {title} </title></p> {text} </sec> <size> {nc} </size>"
        elif mod == 1:
            c = f"<sec><title> {title} </title> {text} </sec> <size> {nc} </size>"
        else:
            c = f"<title> {title} </title> <sec> {text} </sec> <size> {nc} </size>"
        contents.append(c)
    return pa.table(
        {
            "repo": sources,
            "path": [f"doc_{i}.txt" for i in ids],
            "commit": [hashlib.md5(x.encode()).hexdigest() for x in texts],
            "lang": langs,
            "content": contents,
        },
        schema=CORPUS_SCHEMA,
    )


def corpus_from_documents_multisec(sf_dir: str) -> pa.Table:
    """documents table → tagged corpus with TWO ``<sec>`` extents per doc
    for element-level (per-extent) retrieval oracles, SQL-reproducibly:

    ``<title> tt </title> <sec> h1 </sec> <sec> h2 </sec> <size> nc </size>``

    where ``tt`` = first 8 ``[a-z0-9]+`` tokens of ``lower(text)``, ``h1``
    = the first ``ceil(n/2)`` text tokens, ``h2`` the rest — so with ``m =
    len(tt)`` the sec extents are ``[m, m+ceil(n/2))`` and ``[m+ceil(n/2),
    m+n)`` and a DuckDB oracle can slice both halves from the token list
    (the token stream ``tt || t0 || [n_chars]`` is identical to
    :func:`corpus_from_documents_tagged`)."""
    import re as _re

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = t.column("text").to_pylist()
    ids = t.column("doc_id").to_pylist()
    sources = t.column("source").to_pylist()
    langs = t.column("lang").to_pylist()
    n_chars = t.column("n_chars").to_pylist()
    contents = []
    for text, nc in zip(texts, n_chars):
        toks = _re.findall(r"[a-z0-9]+", text.lower())
        title = " ".join(toks[:8])
        h = (len(toks) + 1) // 2
        h1, h2 = " ".join(toks[:h]), " ".join(toks[h:])
        contents.append(
            f"<title> {title} </title> <sec> {h1} </sec> <sec> {h2} </sec>"
            f" <size> {nc} </size>")
    return pa.table(
        {
            "repo": sources,
            "path": [f"doc_{i}.txt" for i in ids],
            "commit": [hashlib.md5(x.encode()).hexdigest() for x in texts],
            "lang": langs,
            "content": contents,
        },
        schema=CORPUS_SCHEMA,
    )


_MONTH_NAMES = ["january", "february", "march", "april", "may", "june",
                "july", "august", "september", "october", "november",
                "december"]


def corpus_from_documents_dated(sf_dir: str) -> pa.Table:
    """documents table → tagged corpus with a DATE field, SQL-reproducibly:

    ``<title> t </title> text <size> nc </size> <when> D Month YYYY </when>``

    where D = 1 + doc_id % 28, month index = doc_id % 12, year = 2000 +
    doc_id % 5 — so a DuckDB oracle can rebuild both the token stream
    (title + text + nc + the three date tokens) and the field's day-serial
    value with ``make_date``."""
    import re as _re

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = t.column("text").to_pylist()
    ids = t.column("doc_id").to_pylist()
    sources = t.column("source").to_pylist()
    langs = t.column("lang").to_pylist()
    n_chars = t.column("n_chars").to_pylist()
    contents = []
    for did, text, nc in zip(ids, texts, n_chars):
        title = " ".join(_re.findall(r"[a-z0-9]+", text.lower())[:8])
        d = 1 + int(did) % 28
        mo = _MONTH_NAMES[int(did) % 12]
        yr = 2000 + int(did) % 5
        contents.append(
            f"<title> {title} </title> {text} <size> {nc} </size>"
            f" <when> {d} {mo} {yr} </when>")
    return pa.table(
        {
            "repo": sources,
            "path": [f"doc_{i}.txt" for i in ids],
            "commit": [hashlib.md5(x.encode()).hexdigest() for x in texts],
            "lang": langs,
            "content": contents,
        },
        schema=CORPUS_SCHEMA,
    )
