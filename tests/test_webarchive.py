"""WARC / Mbox iterators (sources/webarchive.py) vs the reference's
semantics (ref:src/WARCDocumentIterator.cpp, ref:src/MboxDocumentIterator.cpp):
warcinfo-first validation, response-only selection, TREC-ID/uuid docnos,
Content-Length byte-exact bodies with NUL replacement, gzip transparency;
mbox header capture with tab continuation, From-line body termination, and
subject-derived docnos."""

from __future__ import annotations

import gzip

import pytest

from indri_5_5_ray.sources.webarchive import (
    archive_to_corpus,
    parse_mbox,
    parse_warc,
    read_mbox,
    read_warc,
)


def _warc_record(headers: dict[str, str], body: bytes) -> bytes:
    lines = [b"WARC/0.18"]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode())
    lines.append(f"Content-Length: {len(body)}".encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _sample_warc() -> bytes:
    info = _warc_record(
        {"WARC-Type": "warcinfo",
         "WARC-Record-ID": "<urn:uuid:file-0001>"},
        b"software: synthetic\r\n")
    resp1_body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                  b"hello warc world\n\nsecond paragraph kept\x00intact")
    resp1 = _warc_record(
        {"WARC-Type": "response",
         "WARC-Record-ID": "<urn:uuid:rec-0001>",
         "WARC-Target-URI": "http://example.com/a"},
        resp1_body)
    req = _warc_record(
        {"WARC-Type": "request",
         "WARC-Record-ID": "<urn:uuid:rec-0002>",
         "WARC-Target-URI": "http://example.com/a"},
        b"GET /a HTTP/1.1\r\n\r\n")
    resp2 = _warc_record(
        {"WARC-Type": "response",
         "WARC-Record-ID": "<urn:uuid:rec-0003>",
         "WARC-TREC-ID": "clueweb09-en0000-00-00001",
         "WARC-Target-URI": "http://example.com/b"},
        b"HTTP/1.1 200 OK\r\n\r\nbeta document body")
    return info + resp1 + req + resp2


def test_parse_warc_documents_and_docnos():
    docs = parse_warc(_sample_warc())
    assert len(docs) == 2  # the request record is skipped
    a, b = docs
    # no TREC id → fileUUID-recordUUID (ref :281-283)
    assert a["docno"] == "file-0001-rec-0001"
    assert a["url"] == "http://example.com/a"
    # body = content after the HTTP headers; NUL became a space
    assert a["content"] == "hello warc world\n\nsecond paragraph kept intact"
    assert a["dochdr"].startswith("http://example.com/a\n")
    assert "Content-Type: text/html" in a["dochdr"]
    # TREC id wins when present
    assert b["docno"] == "clueweb09-en0000-00-00001"
    assert b["content"] == "beta document body"


def test_parse_warc_gzip_transparent():
    plain = parse_warc(_sample_warc())
    gz = parse_warc(gzip.compress(_sample_warc()))
    assert gz == plain


def test_parse_warc_rejects_non_warcinfo_first():
    body = _sample_warc()
    # strip the leading warcinfo record: find the second "WARC/0.18"
    second = body.index(b"WARC/0.18", 1)
    with pytest.raises(ValueError, match="Bad WARC file"):
        parse_warc(body[second:])


MBOX = (
    "From alice@example.com Thu Jan  1 00:00:00 2004\n"
    "From: alice@example.com\n"
    "To: bob@example.com\n"
    "Subject: merge results\n"
    "\tpart two\n"
    "X-Mailer: synthetic\n"
    "\n"
    "body line one\n"
    "body line two\n"
    "From bob@example.com Thu Jan  1 00:05:00 2004\n"
    "From: bob@example.com\n"
    "Date: Thu, 1 Jan 2004\n"
    "Subject: reply here\n"
    "\n"
    "reply body\n"
)


def test_parse_mbox_messages():
    docs = parse_mbox(MBOX)
    assert len(docs) == 2
    m1, m2 = docs
    # docno = subject, whitespace → '_' (cleanDocno); tab continuation
    # joined with a newline first
    assert m1["docno"] == "merge_results\n\tpart_two".replace("\n", "_").replace("\t", "_")
    assert m1["author"] == "alice@example.com"
    assert m1["recipient"] == "bob@example.com"
    # interesting header values are PREPENDED to the content (ref :56-76)
    assert m1["content"].startswith(
        "alice@example.com\nbob@example.com\nmerge results\n\tpart two\n")
    assert "body line one\nbody line two\n" in m1["content"]
    # body stopped at the next From line; message 2 parsed after it
    assert "reply body" not in m1["content"]
    assert m2["docno"] == "reply_here"
    assert m2["date"] == "Thu, 1 Jan 2004"
    assert m2["content"].endswith("reply body\n")


def test_mbox_body_stops_at_any_from_line():
    """The reference stops the body at ANY line starting with 'From' —
    a preserved quirk, asserted so it isn't 'fixed' silently."""
    data = ("From x Thu\n"
            "Subject: q\n"
            "\n"
            "keep this\n"
            "From here on this is lost\n"
            "also lost\n")
    docs = parse_mbox(data)
    assert len(docs) >= 1
    assert docs[0]["content"].endswith("keep this\n")
    assert "lost" not in docs[0]["content"]


def test_read_and_corpus_bridge(tmp_path):
    w = tmp_path / "a.warc.gz"
    w.write_bytes(gzip.compress(_sample_warc()))
    m = tmp_path / "a.mbox"
    m.write_text(MBOX)
    assert read_warc([str(w)]).count() == 2
    assert read_mbox([str(m)]).count() == 2
    out = archive_to_corpus([str(w)], str(tmp_path / "corpus"), "warc")
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert t.num_rows == 2
    assert set(t.column_names) == {"repo", "path", "commit", "lang", "content"}
    assert set(t.column("path").to_pylist()) == {
        "file-0001-rec-0001", "clueweb09-en0000-00-00001"}


def test_read_tagged_dispatches_warc_mbox(tmp_path):
    from indri_5_5_ray.sources.trectext import add_file_class, read_tagged

    w = tmp_path / "a.warc"
    w.write_bytes(_sample_warc())
    assert read_tagged(str(w), file_class="warc").count() == 2
    m = tmp_path / "a.mbox"
    m.write_text(MBOX)
    assert read_tagged(str(m), file_class="mbox").count() == 2
    with pytest.raises(ValueError, match="cannot shadow"):
        add_file_class("warc", lambda s: [])


def test_warc_lf_headers_with_crlf_in_body():
    """HTTP header split must take the EARLIEST blank line: LF-terminated
    headers with a CRLF-CRLF later in the body must not move body text
    into dochdr."""
    body = b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\nline one\r\n\r\nline two"
    data = (_warc_record({"WARC-Type": "warcinfo",
                          "WARC-Record-ID": "<urn:uuid:f>"}, b"x")
            + _warc_record({"WARC-Type": "response",
                            "WARC-Record-ID": "<urn:uuid:r>",
                            "WARC-Target-URI": "http://e/x"}, body))
    docs = parse_warc(data)
    assert docs[0]["content"] == "line one\r\n\r\nline two"
    assert "line one" not in docs[0]["dochdr"]


def test_warc_zero_length_record_does_not_swallow_next():
    """A Content-Length: 0 record must terminate at its blank line instead
    of merging the following record's headers into itself."""
    zero = (b"WARC/0.18\r\nWARC-Type: revisit\r\n"
            b"WARC-Record-ID: <urn:uuid:z>\r\nContent-Length: 0\r\n\r\n")
    data = (_warc_record({"WARC-Type": "warcinfo",
                          "WARC-Record-ID": "<urn:uuid:f>"}, b"x")
            + zero
            + _warc_record({"WARC-Type": "response",
                            "WARC-Record-ID": "<urn:uuid:r>",
                            "WARC-Target-URI": "http://e/y"},
                           b"HTTP/1.1 200 OK\r\n\r\nreal body"))
    docs = parse_warc(data)
    assert len(docs) == 1
    assert docs[0]["docno"] == "f-r"
    assert docs[0]["content"] == "real body"


def test_archive_to_corpus_rejects_unknown_class(tmp_path):
    with pytest.raises(ValueError, match="unknown archive file class"):
        archive_to_corpus([], str(tmp_path / "c"), file_class="trectext")


def test_warc_mixed_lf_crlf_header_split():
    """The reference's newline counter treats \\n\\r\\n as TWO newlines
    (ADVICE r4): records with mixed line endings must split there, not at
    a later uniform pair."""
    body = b"HTTP/1.1 200 OK\nX: y\n\r\nactual body text"
    data = (_warc_record({"WARC-Type": "warcinfo",
                          "WARC-Record-ID": "<urn:uuid:f>"}, b"x")
            + _warc_record({"WARC-Type": "response",
                            "WARC-Record-ID": "<urn:uuid:r>",
                            "WARC-Target-URI": "http://e/m"}, body))
    docs = parse_warc(data)
    assert docs[0]["content"] == "actual body text"
    assert "X: y" in docs[0]["dochdr"]
    # and \r\n\n likewise
    body2 = b"HTTP/1.1 200 OK\r\n\nsecond body"
    data2 = (_warc_record({"WARC-Type": "warcinfo",
                           "WARC-Record-ID": "<urn:uuid:f>"}, b"x")
             + _warc_record({"WARC-Type": "response",
                             "WARC-Record-ID": "<urn:uuid:r2>",
                             "WARC-Target-URI": "http://e/n"}, body2))
    assert parse_warc(data2)[0]["content"] == "second body"


def test_warc_multi_member_gzip_streams(tmp_path):
    """A .warc.gz with one gzip MEMBER per record (the standard layout)
    parses identically to the plain archive, and the reader streams: peak
    traced allocation while iterating a ~24 MB-decompressed archive stays
    a small multiple of the LARGEST RECORD, far under the archive size."""
    import tracemalloc

    from indri_5_5_ray.sources.webarchive import iter_warc_documents

    rec_body = (b"HTTP/1.1 200 OK\r\n\r\n" + b"payload line\n" * 8000)  # ~100 KB
    members = [gzip.compress(_warc_record(
        {"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:uuid:f>"}, b"x"))]
    for i in range(240):
        members.append(gzip.compress(_warc_record(
            {"WARC-Type": "response",
             "WARC-Record-ID": f"<urn:uuid:r{i:04d}>",
             "WARC-Target-URI": f"http://e/{i}"}, rec_body)))
    p = tmp_path / "multi.warc.gz"
    p.write_bytes(b"".join(members))

    decompressed_size = (len(rec_body) + 200) * 240  # ~24 MB
    tracemalloc.start()
    n = 0
    with open(p, "rb") as f:
        for doc in iter_warc_documents(f):
            assert doc["content"].endswith("payload line\n")
            n += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 240
    # streaming bound: a handful of records buffered, never the archive
    assert peak < decompressed_size / 4, (peak, decompressed_size)

    # semantics unchanged vs the single-blob path
    docs_stream = None
    with open(p, "rb") as f:
        docs_stream = list(iter_warc_documents(f))
    plain = b"".join(gzip.decompress(m) for m in members)
    assert docs_stream == parse_warc(plain)


def test_mbox_subjectless_docno_unique(tmp_path):
    """Documented divergence: read_mbox synthesizes {filename}#{ordinal}
    docnos for subjectless messages so distinct messages never collapse to
    one identity in the corpus bridge; string-level parse_mbox keeps the
    reference's empty docno."""
    data = ("From a Thu\n"
            "From: a@example.com\n"
            "\n"
            "first body\n"
            "From b Thu\n"
            "From: b@example.com\n"
            "\n"
            "second body\n")
    # string API: reference semantics (empty docno)
    docs = parse_mbox(data)
    assert [d["docno"] for d in docs] == ["", ""]
    # file API: unique synthesized docnos
    p = tmp_path / "nosubj.mbox"
    p.write_text(data)
    rows = read_mbox([str(p)]).take_all()
    assert sorted(r["docno"] for r in rows) == [
        "nosubj.mbox#0", "nosubj.mbox#1"]
