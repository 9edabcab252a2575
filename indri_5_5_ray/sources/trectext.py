"""TREC-text corpus reader — the ``TaggedDocumentIterator`` analogue.

The reference splits ``<DOC>…</DOC>`` streams into UnparsedDocuments and
pulls ``<DOCNO>`` as the document key (ref:src/TaggedDocumentIterator.cpp,
file-class registry ref:src/FileClassEnvironmentFactory.cpp:105-299,
'trectext' class).  Here the same split runs as a Ray Data ``flat_map`` over
a dataset of file paths (one task per file — the natural parallel unit), and
``trectext_to_corpus`` materializes the result in the engine's standard
corpus shape so the normal build pipeline consumes it.
"""

from __future__ import annotations

import hashlib
import re
from pathlib import Path

import pyarrow as pa
import ray.data

_DOC_RE = re.compile(r"<DOC>(.*?)</DOC>", re.DOTALL)
_DOCNO_RE = re.compile(r"<DOCNO>\s*(.*?)\s*</DOCNO>", re.DOTALL)
_TEXT_RE = re.compile(r"<TEXT>(.*?)</TEXT>", re.DOTALL)


def parse_trectext(data: str, source: str = "") -> list[tuple[str, str]]:
    """One TREC-text stream → [(docno, content)].

    Content = concatenation of ``<TEXT>`` sections; if a document has none,
    the whole body minus the DOCNO line (the reference's include-tags
    default for trectext).  Documents missing ``<DOCNO>`` get a synthetic
    key scoped by ``source`` (the file path) — a bare per-stream counter
    would collide across files and the build's docno dedup would silently
    drop real documents."""
    out = []
    for m in _DOC_RE.finditer(data):
        body = m.group(1)
        docno_m = _DOCNO_RE.search(body)
        docno = (docno_m.group(1) if docno_m
                 else f"{source}#doc{len(out)}" if source else f"doc{len(out)}")
        texts = _TEXT_RE.findall(body)
        if texts:
            content = "\n".join(t.strip() for t in texts)
        else:
            content = _DOCNO_RE.sub("", body).strip()
        out.append((docno, content))
    return out


def read_trectext(paths: list[str] | str) -> ray.data.Dataset:
    """Dataset of (docno, content) rows from TREC-text files."""
    if isinstance(paths, str):
        p = Path(paths)
        paths = [str(p)] if p.is_file() else sorted(str(f) for f in p.rglob("*") if f.is_file())

    def parse_file(row: dict) -> list[dict]:
        data = Path(row["path"]).read_text(errors="replace")
        return [{"docno": d, "content": c}
                for d, c in parse_trectext(data, source=row["path"])]

    return ray.data.from_items([{"path": p} for p in paths]).flat_map(parse_file)


def dataset_to_corpus(ds: ray.data.Dataset, repo: str, out_dir: str,
                      rows_per_file: int = 10000) -> str:
    """Write a (docno, content, …) dataset in the standard corpus parquet
    shape (repo=<label>, path=docno, commit=sha1(docno)) — the ONE bridge
    every reader (trectext, WARC, mbox, custom file classes) shares into
    the build pipeline."""

    def to_corpus(batch: pa.Table) -> pa.Table:
        docnos = batch.column("docno").to_pylist()
        return pa.table(
            {
                "repo": pa.array([repo] * len(docnos), pa.string()),
                "path": batch.column("docno"),
                "commit": pa.array(
                    [hashlib.sha1(d.encode()).hexdigest() for d in docnos], pa.string()
                ),
                "lang": pa.array(["txt"] * len(docnos), pa.string()),
                "content": batch.column("content"),
            }
        )

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    ds.map_batches(to_corpus, batch_format="pyarrow").write_parquet(
        str(out), min_rows_per_file=rows_per_file
    )
    return str(out)


def trectext_to_corpus(paths: list[str] | str, out_dir: str,
                       rows_per_file: int = 10000) -> str:
    """Convert TREC-text input into the standard corpus parquet shape
    (repo='trec', path=docno, commit=sha1(docno)) for the build pipeline."""
    return dataset_to_corpus(read_trectext(paths), "trec", out_dir,
                             rows_per_file)


_DOCHDR_RE = re.compile(r"<DOCHDR>.*?</DOCHDR>", re.DOTALL)


def parse_trecweb(data: str) -> list[tuple[str, str]]:
    """One TREC-web stream → [(docno, content)] — like trectext but the
    ``<DOCHDR>`` (HTTP headers/URL) section is stripped and the remaining
    body keeps its HTML markup for the tokenizer's tag handling
    (file-class 'trecweb', ref:src/FileClassEnvironmentFactory.cpp:105-299)."""
    out = []
    for m in _DOC_RE.finditer(data):
        body = m.group(1)
        docno_m = _DOCNO_RE.search(body)
        docno = docno_m.group(1) if docno_m else f"doc{len(out)}"
        body = _DOCHDR_RE.sub("", body)
        content = _DOCNO_RE.sub("", body).strip()
        out.append((docno, content))
    return out


# --- html file class ---------------------------------------------------
# tag-spec depth per the reference's html file class
# (ref:src/FileClassEnvironmentFactory.cpp:105-299: exclude script/style,
# index structural tags) and HTMLParser's URL extraction
# (ref:src/HTMLParser.cpp:1-462: absolute hrefs harvested from anchors).

HTML_EXCLUDE_TAGS = ("script", "style")
# tags worth indexing as fields when building with cfg.fields — the
# reference's html index-tag list (title/heading/anchor structure)
HTML_INDEX_TAGS = ("title", "h1", "h2", "h3", "h4", "a", "b", "i")

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_ABS_URL_RE = re.compile(
    r"""(?:href|src)\s*=\s*["']?(https?://[^"'\s>]+)""", re.IGNORECASE)


def parse_html(data: str,
               exclude_tags: tuple[str, ...] = HTML_EXCLUDE_TAGS
               ) -> tuple[str, list[str]]:
    """One HTML document → (cleaned content, absolute URLs).

    Comments and the full content of excluded tags (script/style by
    default) are dropped BEFORE tokenization — the reference's exclude-tag
    handling; absolute ``href``/``src`` URLs are extracted first (the
    HTMLParser URL harvest, ref:src/HTMLParser.cpp) so links inside later-
    excluded regions still count.  Remaining markup is kept: the tokenizer
    skips tags, and the build config may index any of HTML_INDEX_TAGS as
    fields."""
    urls = _ABS_URL_RE.findall(data)
    data = _COMMENT_RE.sub(" ", data)
    for t in exclude_tags:
        data = re.sub(rf"<{t}\b.*?(?:</{t}\s*>|\Z)", " ", data,
                      flags=re.IGNORECASE | re.DOTALL)
    return data, urls


# binary document classes (ref:src/FileClassEnvironmentFactory.cpp:237-283
# registers "doc"/"ppt"/"pdf" backed by PDFDocumentExtractor /
# OfficeDocumentExtractor).  This container ships no PDF/Office codecs, so
# the DECODE step is a documented stub: the Ray-side plumbing (one row per
# file, bytes read on the worker, decoder probed per extractor) is real and
# tested; the text extraction raises NotImplementedError naming the decoder
# to install.  Probe order mirrors commonly-available pure-Python decoders.
_BINARY_EXTRACTORS: dict[str, tuple[str, ...]] = {
    "pdf": ("pypdf", "pdfminer.high_level"),
    "doc": ("docx",),
    "ppt": ("pptx",),
}


def _extract_binary(data: bytes, file_class: str) -> str:
    """bytes → extracted text for a binary file class; raises
    NotImplementedError when no decoder module is importable (this
    container), keeping the failure explicit per stub policy."""
    import importlib

    for mod in _BINARY_EXTRACTORS[file_class]:
        try:
            importlib.import_module(mod)
        except ImportError:
            continue
        raise NotImplementedError(
            f"decoder module {mod!r} is importable but the {file_class} "
            "extraction path is not wired in this build")
    raise NotImplementedError(
        f"file class {file_class!r} needs one of "
        f"{_BINARY_EXTRACTORS[file_class]} installed; this environment "
        "ships no PDF/Office codecs (documented stub — "
        "ref:src/FileClassEnvironmentFactory.cpp:237-283)")


def _read_binary_class(paths: list[str], file_class: str) -> ray.data.Dataset:
    """Dataset plumbing for the binary classes: one (docno, content) row per
    file, bytes read and decoded on the WORKER (flat_map), docno = path —
    the same shape the text classes produce, so a decoder drop-in needs no
    pipeline changes."""

    def parse_file(row: dict) -> list[dict]:
        data = Path(row["path"]).read_bytes()
        return [{"docno": row["path"],
                 "content": _extract_binary(data, file_class)}]

    return ray.data.from_items([{"path": p} for p in paths]).flat_map(parse_file)


# custom file classes: name → parse fn (file text → [(docno, content)]),
# the IndexEnvironment::addFileClass seam (ref:src/IndexEnvironment.cpp:192-208,
# spec struct ref:src/FileClassEnvironmentFactory.cpp:105-299)
_FILE_CLASSES: dict = {}


def add_file_class(name: str, parse_fn) -> None:
    """Register a custom file class for :func:`read_tagged`.

    ``parse_fn`` receives one file's text and returns ``[(docno, content)]``.
    Must be importable at the worker (Ray ships it by reference)."""
    if name in ("trectext", "trecweb", "html", "warc", "mbox",
                "pdf", "doc", "ppt"):
        raise ValueError(f"cannot shadow built-in file class {name!r}")
    _FILE_CLASSES[name] = parse_fn


def read_tagged(paths: list[str] | str, file_class: str = "trectext") -> ray.data.Dataset:
    """Dataset of (docno, content[, urls]) rows for a registered file class
    ('trectext' | 'trecweb' | 'html' — html treats each FILE as one doc
    keyed by its path, cleans it through :func:`parse_html` and carries the
    extracted absolute URLs in a ``urls`` column — or a name registered via
    :func:`add_file_class`)."""
    if isinstance(paths, str):
        p = Path(paths)
        paths = [str(p)] if p.is_file() else sorted(str(f) for f in p.rglob("*") if f.is_file())
    if file_class == "trectext":
        return read_trectext(paths)
    if file_class in ("warc", "mbox"):
        from .webarchive import read_mbox, read_warc

        return read_warc(paths) if file_class == "warc" else read_mbox(paths)
    if file_class in _BINARY_EXTRACTORS:
        return _read_binary_class(paths, file_class)
    custom = _FILE_CLASSES.get(file_class)

    def parse_file(row: dict) -> list[dict]:
        data = Path(row["path"]).read_text(errors="replace")
        if file_class == "trecweb":
            return [{"docno": d, "content": c} for d, c in parse_trecweb(data)]
        if file_class == "html":
            content, urls = parse_html(data)
            return [{"docno": row["path"], "content": content,
                     "urls": " ".join(urls)}]
        if custom is not None:
            return [{"docno": d, "content": c} for d, c in custom(data)]
        raise ValueError(f"unknown file class {file_class!r}")

    return ray.data.from_items([{"path": p} for p in paths]).flat_map(parse_file)
