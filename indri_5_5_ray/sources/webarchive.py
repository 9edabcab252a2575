"""WARC and Mbox corpus readers — the ``WARCDocumentIterator`` /
``MboxDocumentIterator`` analogues.

Semantics pinned to the reference:

* WARC (ref:src/WARCDocumentIterator.cpp:103-320): gzip or plain input; the
  FIRST record must be ``WARC-Type: warcinfo`` (else the file is rejected),
  and its record id becomes the file UUID.  Only ``response`` records become
  documents.  Header lines are ``key: value`` pairs read until Content-Length
  has been seen AND an empty line arrives (tolerates the slightly malformed
  clueweb headers the same way); the body is exactly Content-Length bytes
  with embedded NULs replaced by spaces (:166-173).  docno = ``WARC-TREC-ID``
  when present, else ``{fileUUID}-{recordUUID}`` (:281-283); the record's
  ``WARC-Target-URI`` plus the HTTP response headers (body up to the first
  blank line, :303-320) form the ``dochdr`` metadata and the text is what
  follows them.
* Mbox (ref:src/MboxDocumentIterator.cpp:88-224): per message, header lines
  are scanned until an empty line; the interesting fields (From:→author,
  To:→recipient, Subject:→subject, Cc:→copied, Date:→date, :108-114) join
  tab-continuation lines with newlines (:141-152), are kept as metadata AND
  prepended to the indexed content (``_copyMetadata`` writes them into the
  document buffer, :56-76 — each value skips the field prefix plus one
  character); body lines accumulate until any line starting with ``From``
  (:172-183 — the envelope separator, a quirk that also stops at body lines
  starting with "From"); docno = the subject with whitespace replaced by
  ``_`` (``cleanDocno``, ref:include/indri/DocumentIterator.hpp:42-49).

Both run as Ray Data ``flat_map`` over file paths (one task per archive —
the natural parallel unit; WARC files are independently splittable only at
record boundaries, which member-gzip archives don't expose to a blind byte
splitter, so file granularity is the safe default) and convert to the
engine's standard corpus parquet shape for the normal build pipeline.
"""

from __future__ import annotations

import gzip
import re
from pathlib import Path

import pyarrow as pa
import ray.data

_URN_UUID = re.compile(r"<?urn:uuid:([^>]*)>?\s*$")


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def iter_warc_records(data: bytes):
    """Raw WARC bytes → (headers dict {lower key: value}, content bytes)
    per record.  Header reading mirrors the reference: skip anything until
    Content-Length has been parsed AND an empty line ends the block."""
    pos = 0
    n = len(data)
    while pos < n:
        headers: dict[str, str] = {}
        content_length = 0
        done = False
        # header block: ends at the first blank line AFTER a Content-Length
        # header was seen (stray blank lines before it are tolerated, the
        # reference's clueweb workaround); an explicit zero/unparsable
        # Content-Length still ENDS the record here — the reference would
        # merge it into the next record's headers, which silently
        # misattributes that record
        while pos < n and not done:
            nl = data.find(b"\n", pos)
            if nl < 0:
                return
            line = data[pos:nl].rstrip(b"\r\n")
            pos = nl + 1
            if not line:
                done = "content-length" in headers
                continue
            colon = line.find(b":")
            if colon >= 0:
                key = line[:colon].decode("latin-1").strip().lower()
                value = line[colon + 1:].decode("latin-1").strip()
                headers[key] = value
                if key == "content-length":
                    try:
                        content_length = int(value)
                    except ValueError:
                        content_length = 0
        if not done:
            return
        content = data[pos:pos + content_length]
        pos += content_length
        # NULs become spaces, exactly like the reference's readContent
        if b"\x00" in content:
            content = content.replace(b"\x00", b" ")
        yield headers, content


def _record_uuid(headers: dict[str, str]) -> str:
    rid = headers.get("warc-record-id", "")
    m = _URN_UUID.match(rid)
    return m.group(1) if m else rid.strip("<>")


def parse_warc(data: bytes) -> list[dict]:
    """One WARC archive (gzipped or plain) → document dicts
    ``{docno, content, url, dochdr}``.

    Raises ValueError when the first record is not ``warcinfo`` — the
    reference treats such a file as partial/broken."""
    data = _maybe_gunzip(data)
    records = iter_warc_records(data)
    first = next(records, None)
    if first is None or first[0].get("warc-type") != "warcinfo":
        raise ValueError("Bad WARC file.")
    file_uuid = _record_uuid(first[0])
    out: list[dict] = []
    for headers, content in records:
        if headers.get("warc-type") != "response":
            continue  # request/metadata/... records are skipped
        uuid = _record_uuid(headers)
        trec_id = headers.get("warc-trec-id", "")
        docno = trec_id if trec_id else f"{file_uuid}-{uuid}"
        uri = headers.get("warc-target-uri", "")
        # HTTP headers end at the EARLIEST blank line (CRLF-CRLF or LF-LF,
        # whichever comes first — LF-terminated headers with a CRLF pair
        # later in the body must not swallow body text); remainder is text
        cuts = [(content.find(sep), sep) for sep in (b"\r\n\r\n", b"\n\n")]
        cuts = [(c, sep) for c, sep in cuts if c >= 0]
        if cuts:
            cut, sep = min(cuts)
            http_headers = content[:cut]
            text = content[cut + len(sep):]
        else:
            http_headers = b""
            text = content
        out.append({
            "docno": docno,
            "content": text.decode("utf-8", errors="replace"),
            "url": uri,
            "dochdr": (uri + "\n"
                       + http_headers.decode("latin-1", errors="replace")),
        })
    return out


_MBOX_FIELDS = (
    ("From:", "author"),
    ("To:", "recipient"),
    ("Subject:", "subject"),
    ("Cc:", "copied"),
    ("Date:", "date"),
)


def parse_mbox(data: str) -> list[dict]:
    """One mbox stream → document dicts ``{docno, content, author,
    recipient, subject, copied, date}`` (missing fields empty)."""
    lines = data.split("\n")
    if lines and lines[-1] == "":
        lines.pop()  # a trailing newline is a line TERMINATOR, not a line
    i = 0
    n = len(lines)
    out: list[dict] = []
    while i < n:
        meta = {tag: "" for _, tag in _MBOX_FIELDS}
        head_parts: list[str] = []
        # header block: until an empty line (EOF ends the message list)
        saw_any = False
        while i < n:
            line = lines[i]
            i += 1
            if line == "":
                break
            saw_any = True
            for field, tag in _MBOX_FIELDS:
                if line.startswith(field):
                    # skip the field prefix plus one character, like
                    # _copyMetadata's `headerLine + ignoreBytes + 1`
                    value = line[len(field) + 1:]
                    # tab-continuation lines joined with newlines
                    while i < n and lines[i].startswith("\t"):
                        value += "\n" + lines[i]
                        i += 1
                    meta[tag] = value
                    head_parts.append(value)
                    break
        if not saw_any and i >= n:
            break
        # body: until a line starting with "From" (the envelope separator;
        # the reference also stops at body lines starting with "From")
        body_parts: list[str] = []
        while i < n:
            line = lines[i]
            if line.startswith("From"):
                i += 1  # the From line itself is consumed, not kept
                break
            body_parts.append(line)
            i += 1
        content = "".join(p + "\n" for p in head_parts) \
            + "".join(p + "\n" for p in body_parts)
        if not (saw_any or body_parts):
            continue
        docno = re.sub(r"\s", "_", meta["subject"])
        out.append({"docno": docno, "content": content, **meta})
    return out


def _expand(paths: list[str] | str) -> list[str]:
    if isinstance(paths, str):
        p = Path(paths)
        return [str(p)] if p.is_file() else sorted(
            str(f) for f in p.rglob("*") if f.is_file())
    return list(paths)


def read_warc(paths: list[str] | str) -> ray.data.Dataset:
    """Dataset of (docno, content, url, dochdr) rows from WARC archives."""
    def parse_file(row: dict) -> list[dict]:
        return parse_warc(Path(row["path"]).read_bytes())

    return ray.data.from_items(
        [{"path": p} for p in _expand(paths)]).flat_map(parse_file)


def read_mbox(paths: list[str] | str) -> ray.data.Dataset:
    """Dataset of (docno, content, author, recipient, subject, copied,
    date) rows from mbox mailboxes."""
    def parse_file(row: dict) -> list[dict]:
        return parse_mbox(Path(row["path"]).read_text(errors="replace"))

    return ray.data.from_items(
        [{"path": p} for p in _expand(paths)]).flat_map(parse_file)


def archive_to_corpus(paths: list[str] | str, out_dir: str,
                      file_class: str = "warc",
                      rows_per_file: int = 10000) -> str:
    """Convert WARC/mbox input into the standard corpus parquet shape
    (repo=file_class, path=docno, commit=sha1(docno)) so the normal build
    pipeline consumes it — the shared dataset_to_corpus bridge."""
    if file_class not in ("warc", "mbox"):
        raise ValueError(f"unknown archive file class {file_class!r} "
                         "(expected 'warc' or 'mbox')")
    from .trectext import dataset_to_corpus

    ds = read_warc(paths) if file_class == "warc" else read_mbox(paths)
    return dataset_to_corpus(ds, file_class, out_dir, rows_per_file)
