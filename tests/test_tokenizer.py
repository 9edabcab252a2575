"""Tokenizer/normalizer unit vectors (FIXTURES.md §7).

Each vector pins a rule from ref:src/TextTokenizer.l:46-61 +
ref:src/NormalizationTransformation.cpp:59-88 +
ref:src/UTF8CaseNormalizationTransformation.cpp.
"""

from __future__ import annotations

import pytest

from indri_5_5_ray.tokenizer import normalize_token, tokenize, tokenize_bytes

VECTORS = [
    # acronyms: [A-Z0-9]"."([A-Z0-9]".")* then trailing '.' stripped, then
    # normalization deletes remaining periods
    ("U.S.A.", ["usa"]),
    # without the final dot, the acronym rule consumes only "U.S." and the
    # word rule takes "A" (flex maximal munch)
    ("U.S.A", ["us", "a"]),
    ("I.B.M. stock", ["ibm", "stock"]),
    # apostrophes kept by tokenizer, stripped by normalizer
    ("don't", ["dont"]),
    ("o'clock", ["oclock"]),
    # negative numbers: period removed by the normalizer ("-3.14" → "-314")
    ("-3.14", ["-314"]),
    ("-42", ["-42"]),
    ("x - y", ["x", "y"]),
    # trailing punctuation stripped from ASCII tokens
    ("end.", ["end"]),
    ("wait...", ["wait"]),
    # trailing-punct strip keeps first char (loop bound i>0) → token "'",
    # then the normalizer deletes apostrophes → empty term slot (faithful:
    # the reference indexes the empty string in this case)
    ("'''", [""]),
    # numbers and mixed identifiers
    ("3.14", ["3", "14"]),      # "3." via acronym rule (strip '.'), then "14"
    ("x86-64", ["x86", "-64"]),
    ("foo_bar", ["foo", "bar"]),
    ("snake_case_name", ["snake", "case", "name"]),
    # markup zapping
    ("<b>bold</b>", ["bold"]),
    ("<!-- gone --> kept", ["kept"]),
    ("<!DOCTYPE html> x", ["x"]),
    ("<?xml version='1.0'?> y", ["y"]),   # note: '?>' tail consumed by rule
    ("<% server %> z", ["z"]),
    ("&amp; &#38; &#x26; q", ["q"]),
    ("a < b > c", ["a", "b", "c"]),
    # case normalization
    ("MixedCase WORD", ["mixedcase", "word"]),
    # UTF-8: letters join, case map applies
    ("naïve CAFÉ", ["naïve", "café"]),
    ("Zürich", ["zürich"]),
    # empty input
    ("", []),
]


@pytest.mark.parametrize("text,expected", VECTORS, ids=[v[0][:20] or "empty" for v in VECTORS])
def test_vectors(text, expected):
    assert tokenize(text) == expected


def test_maximal_munch_acronym_vs_word():
    # flex longest-match: at "U" the acronym rule wins with "U.S.A." over "U"
    assert tokenize_bytes(b"U.S.A.") == [b"U.S.A"]
    # "ABC" has no dot after first char: word rule
    assert tokenize_bytes(b"ABC.DEF") == [b"ABC", b"DEF"]
    # "A.BCD": acronym matches "A." only
    assert tokenize_bytes(b"A.BCD") == [b"A", b"BCD"]


def test_mixed_ascii_utf8_run():
    # rule8 charset [a-zA-Z0-9'] vs rule10 [a-zA-Z0-9 0x80-FD]: longest wins
    # "don'" (4) beats "don" (3) → ASCII token, whose trailing apostrophe is
    # then stripped by processASCIIToken; "ét" continues as a UTF-8 token
    raw = "don'ét".encode("utf-8")
    assert tokenize_bytes(raw) == [b"don", "ét".encode("utf-8")]


def test_utf8_currency_and_whitespace():
    # currency symbols are emitted alone; the preceding pending token is
    # flushed via the unguarded extent write (may produce empty terms —
    # faithful to ref:src/TextTokenizer.l:448-462)
    toks = tokenize_bytes("a€5".encode("utf-8"))
    assert toks == [b"a", "€".encode("utf-8"), b"5"]
    # consecutive non-breaking spaces inside a UTF-8 run emit empty slots
    toks = tokenize_bytes("a  b".encode("utf-8"))
    assert toks == [b"a", b"", b"b"]


def test_normalize_acronym_periods_and_case():
    assert normalize_token(b"U.S.A") == b"usa"
    assert normalize_token(b"don't") == b"dont"
    assert normalize_token(b"lower") == b"lower"  # untouched fast path
    assert normalize_token("CAFÉ".encode()) == "café".encode()


def test_stopped_positions_count_in_doc_length():
    # dl counts every token slot, including later-stopped ones
    # (ref:src/MemoryIndex.cpp:617,647-648) — positions are ordinals
    toks = tokenize("the quick the dead")
    assert len(toks) == 4
    assert toks == ["the", "quick", "the", "dead"]


# ---------------------------------------------------------------------------
# two-pass fast scan ≡ one-pass scanner (the ingest hot-path refactor)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

from indri_5_5_ray.tokenizer import (
    _tokenize_bytes_scanner,
    expand_raw,
    scan_raw,
    tokenize_bytes_char,
)

_TRICKY_PIECES = [
    b"<!--", b"-->", b"<!DOCTYPE x>", b"<%x%>", b"<?xml v?>", b"<tag a=1>",
    b"</tag>", b"<", b">", b"&amp;", b"&#x1F;", b"&#10;", b"&nope", b";",
    b"U.S.A.", b"-3.14", b"-", b"don't", b"'", b"caf\xc3\xa9", b"'\xc3\xa9'",
    b"a'b\xc3\xa9c", b"\xe4\xb8\xad\xe6\x96\x87", b"\x80", b"\xfe", b"$",
    b"\xc2\xa3", b"A.", b"9.5", b" ", b"\n", b"x",
]


@settings(max_examples=400, deadline=None)
@given(st.lists(st.sampled_from(_TRICKY_PIECES), max_size=30))
def test_fast_scan_equals_scanner(pieces):
    data = b"".join(pieces)
    assert tokenize_bytes(data) == _tokenize_bytes_scanner(data)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_fast_scan_equals_scanner_random_bytes(data):
    assert tokenize_bytes(data) == _tokenize_bytes_scanner(data)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(_TRICKY_PIECES), max_size=20))
def test_scan_raw_expand_composition(pieces):
    """tokenize_bytes ≡ flatten(expand_raw over scan_raw) — the contract the
    vectorized ingest kernel relies on (expansion applied per unique)."""
    data = b"".join(pieces)
    composed = [t for raw in scan_raw(data) for t in expand_raw(raw)]
    assert composed == tokenize_bytes(data)


def test_char_mode_still_matches_scanner_semantics():
    data = "int x = 3; 中文 café U.S.A. <tag>zap</tag> &amp; done".encode()
    toks = tokenize_bytes_char(data)
    # every char token is a single character; tags/entities zapped
    assert b"tag" not in toks and b"amp" not in toks
    assert all(len(t.decode("utf-8")) == 1 for t in toks if t)


_CHUNK_PIECES = [b"A.", b"-1", b".5", b"ab", b"Z", b"9", b"'", b" ", b"-",
                 b".", b"<t>", b"&x;", b"\xc3\xa9", b"\xff", b"U.S.A.",
                 b"-12.5", b"1.2.3", b"code.method(x)"]


@given(st.lists(st.lists(st.sampled_from(_CHUNK_PIECES), max_size=12),
                max_size=6))
@settings(max_examples=300, deadline=None)
def test_scan_raw_chunk_matches_scan_raw(doc_pieces):
    """The vectorized whole-chunk scanner is byte-for-byte the per-doc
    scan_raw: same tokens in order, same per-doc counts."""
    from indri_5_5_ray.tokenizer import scan_raw, scan_raw_chunk

    docs = [b"".join(p) for p in doc_pieces]
    arr, lens = scan_raw_chunk(docs)
    got = [v.as_py() for v in arr]
    want, want_lens = [], []
    for d in docs:
        w = scan_raw(d)
        want += w
        want_lens.append(len(w))
    assert got == want
    assert lens.tolist() == want_lens


def test_scan_raw_chunk_int64_fallback_identical(monkeypatch):
    """Chunks whose joined bytes reach 2^31 must fall back to int64 index
    math; force the fallback by lowering the limit and assert the token
    stream is identical to the int32 fast path."""
    import numpy as np

    from indri_5_5_ray import tokenizer as tok

    docs = [b"alpha beta-7 gamma.delta 3.14 -42 eps!",
            b"<tag>zap me</tag> plain words",
            b"u.s.a. acronym chain x",
            "unicode café mix".encode()]
    fast_tokens, fast_lens = tok.scan_raw_chunk(docs)
    monkeypatch.setattr(tok, "_INT32_LIMIT", 8)  # every chunk overflows now
    slow_tokens, slow_lens = tok.scan_raw_chunk(docs)
    assert fast_tokens.to_pylist() == slow_tokens.to_pylist()
    assert np.array_equal(fast_lens, slow_lens)
