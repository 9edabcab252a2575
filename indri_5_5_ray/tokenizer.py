"""Indri "word" tokenizer + normalization chain, re-implemented from the rules.

Semantics replicated (rank-identity contract, SURVEY.md §7.0):

* flex rule set ref:src/TextTokenizer.l:46-61 — comment/markup/entity zapping,
  tag events, acronym tokens ``[A-Z0-9].([A-Z0-9].)*``, ASCII tokens
  ``[a-zA-Z0-9']+``, negative numbers ``-[0-9]+(.[0-9]+)?``, UTF-8 runs
  ``[a-zA-Z0-9\\x80-\\xFD]+`` re-tokenized by Unicode character class
  (ref:src/TextTokenizer.l:372-528), with flex *maximal munch* (longest match
  wins; ties → earliest rule);
* trailing ASCII punctuation stripped from ASCII tokens, first char kept
  (``processASCIIToken``, ref:src/TextTokenizer.l:530-555);
* ``NormalizationTransformation``: terms containing ``[A-Z.']`` get periods
  and apostrophes deleted then ASCII A-Z lowercased
  (ref:src/NormalizationTransformation.cpp:59-88; acronym exception list is
  empty by default);
* ``UTF8CaseNormalizationTransformation``: terms containing bytes >0x7F are
  decoded and downcased via the explicit case-pair table
  (ref:src/UTF8CaseNormalizationTransformation.cpp:41-112, table extracted to
  data/utf8_tables.py);
* chain order = tokenize → normalize → utf8-case → stop → stem, per
  ``Repository::_buildChain`` ref:src/Repository.cpp:137-177.

Tokenization operates on UTF-8 *bytes* (as flex does); positions are token
ordinals.  Stopping sets a term slot to None but keeps the position — document
length counts stopped slots (ref:src/MemoryIndex.cpp:617,647-648).
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np

from .data.utf8_tables import CASE_PAIRS, CLASS_INTERVALS

# ---------------------------------------------------------------------------
# unicode tables
# ---------------------------------------------------------------------------

# interval lookup instead of a ~98k-entry codepoint dict: workers import this
# module once per process, and at 32-way cold start the dict build + first-
# touch convoys on memory bandwidth.  The raw table is unsorted and
# overlapping with last-writer-wins semantics (it was applied in order into a
# dict), so flatten it once into sorted disjoint intervals via a numpy sweep,
# then bisect (the hot callers memoize, and only high-byte runs get here).
import bisect as _bisect


def _flatten_intervals() -> tuple[list[int], list[int], list[int]]:
    import numpy as _np

    starts = _np.array([s for s, _e, _c in CLASS_INTERVALS], _np.int64)
    ends = _np.array([e for _s, e, _c in CLASS_INTERVALS], _np.int64)
    cls = _np.array([c for _s, _e, c in CLASS_INTERVALS], _np.int64)
    bounds = _np.unique(_np.concatenate((starts, ends + 1)))
    seg_starts = bounds[:-1]
    # covering interval with the LARGEST list index wins (dict overwrite)
    cover = (starts[None, :] <= seg_starts[:, None]) & (
        ends[None, :] >= seg_starts[:, None])
    idx = _np.where(
        cover.any(axis=1),
        cover.shape[1] - 1 - _np.argmax(cover[:, ::-1], axis=1), -1)
    seg_cls = _np.where(idx >= 0, cls[_np.maximum(idx, 0)], 0)
    # merge adjacent segments with equal class, drop class-0 segments
    out_s, out_e, out_c = [], [], []
    for i in range(len(seg_starts)):
        c = int(seg_cls[i])
        if c == 0:
            continue
        s, e = int(seg_starts[i]), int(bounds[i + 1]) - 1
        if out_c and out_c[-1] == c and out_e[-1] == s - 1:
            out_e[-1] = e
        else:
            out_s.append(s)
            out_e.append(e)
            out_c.append(c)
    return out_s, out_e, out_c


_CI_STARTS, _CI_ENDS, _CI_CLS = _flatten_intervals()


class _ClassMap:
    """dict-like codepoint → CharClass id via interval bisect (0 = none)."""

    __slots__ = ()

    @staticmethod
    def get(cp: int, default: int = 0) -> int:
        i = _bisect.bisect_right(_CI_STARTS, cp) - 1
        if i >= 0 and cp <= _CI_ENDS[i]:
            return _CI_CLS[i]
        return default


_CLASS_MAP = _ClassMap()

_CASE_MAP: dict[int, int] = {}
for _upper, _lower in CASE_PAIRS:
    _CASE_MAP.setdefault(_upper, _lower)

# CharClass ids (ref:include/indri/UTF8Transcoder.hpp:34-48)
_APOSTROPHE, _PERCENT, _CONTROL, _CURRENCY = 1, 2, 3, 4
_SYMBOL, _LETTER, _DIGIT, _PUNCT = 5, 6, 7, 8
_WHITESPACE, _DECIMAL, _HYPHEN, _THOUSAND = 9, 10, 11, 12

# ---------------------------------------------------------------------------
# the scanner
# ---------------------------------------------------------------------------

# Alternation ordered to reproduce flex maximal munch for this rule set (see
# module docstring); verified against the rule-interaction analysis in
# tests/test_tokenizer.py.
_SCANNER = re.compile(
    rb"(?s)"
    rb"(?P<comment><!--(?:.*?-->|.*))"          # <!-- ... -->   (ZAP)
    rb"|(?P<bang><![^-][^>]*>)"                  # <!DOCTYPE ...> (ZAP)
    rb"|(?P<pct><%[^%>]+%>)"                     # <% ... %>      (ZAP)
    rb"|(?P<xml><\?xml[^>]*>)"                   # <?xml ...>     (ZAP)
    rb"|(?P<tag><[a-zA-Z/][^>]*>)"               # tag event (no term)
    rb"|(?P<entity>&(?:[a-zA-Z]+|#(?:[0-9]+|[xX][a-fA-F0-9]+));)"  # &x; (ZAP)
    rb"|(?P<acronym>(?:[A-Z0-9]\.)+)"            # U.S.A.
    rb"|(?P<word>[a-zA-Z0-9'\x80-\xFD]+)"        # ASCII/UTF-8 token run
    rb"|(?P<negnum>-[0-9]+(?:\.[0-9]+)?)"        # -3.14
)

_ASCII_PUNCT = frozenset(
    b"!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
)

_HIGH = re.compile(rb"[\x80-\xFD]")
_QUOTE_RUN = re.compile(rb"[a-zA-Z0-9']+")
_UTF8_RUN = re.compile(rb"[a-zA-Z0-9\x80-\xFD]+")


def _strip_trailing_punct(tok: bytes) -> bytes:
    """processASCIIToken: drop trailing punct bytes, always keep byte 0
    (ref:src/TextTokenizer.l:530-545, loop bound ``i > 0``)."""
    n = len(tok)
    while n > 1 and tok[n - 1] in _ASCII_PUNCT:
        n -= 1
    return tok[:n]


def _decode_utf8_chars(data: bytes) -> list[tuple[int, int, int]]:
    """Decode a byte run → [(codepoint, byte_offset, byte_len)].

    Mirrors ``UTF8Transcoder::utf8_decode`` (ref:src/UTF8Transcoder.cpp:150-292):
    malformed lead/continuation bytes are skipped without emitting a char.
    """
    out = []
    i, n = 0, len(data)
    while i < n:
        b0 = data[i]
        if b0 < 0x80:
            out.append((b0, i, 1))
            i += 1
            continue
        if b0 >= 0xFC:
            seq = 6
        elif b0 >= 0xF8:
            seq = 5
        elif b0 >= 0xF0:
            seq = 4
        elif b0 >= 0xE0:
            seq = 3
        elif b0 >= 0xC0:
            seq = 2
        else:  # stray continuation byte
            i += 1
            continue
        if i + seq > n or any(not (0x80 <= data[i + k] < 0xC0) for k in range(1, seq)):
            i += 1
            continue
        masks = {2: 0x1F, 3: 0x0F, 4: 0x07, 5: 0x03, 6: 0x01}
        cp = b0 & masks[seq]
        for k in range(1, seq):
            cp = (cp << 6) | (data[i + k] & 0x3F)
        out.append((cp, i, seq))
        i += seq
    return out


def _utf8_word_tokens(run: bytes) -> list[bytes]:
    """Word-mode re-tokenization of a UTF-8 run by character class.

    Port of ``processUTF8Token`` (ref:src/TextTokenizer.l:372-528): letters /
    digits / apostrophes / decimal separators extend the token; percent,
    punctuation, thousands separators and hyphens extend the extent but mark a
    boundary (``no_letter``); currency symbols are emitted alone; control /
    symbol / whitespace / unclassified characters flush the token.
    """
    chars = _decode_utf8_chars(run)
    tokens: list[bytes] = []
    if not chars:
        return tokens
    offset = chars[0][1]
    extent = 0
    token_len = 0
    no_letter = False

    for idx, (cp, coff, clen) in enumerate(chars):
        cls = _CLASS_MAP.get(cp, 0)
        # byte-gap check (skipped malformed bytes OR punctuation that advanced
        # ``extent`` past ``token_len``) — flushes the pending token; this is
        # the path that actually terminates tokens at punctuation in word mode
        # (ref:src/TextTokenizer.l:427-443)
        if idx != 0 and offset + token_len != coff:
            if token_len > 0:
                tokens.append(run[offset : offset + token_len])
            extent = 0
            token_len = 0
            no_letter = False
            offset = coff
        if cls == _CURRENCY:
            # writes the pending *extent* (may be empty — faithful to the
            # unguarded writeToken, ref:src/TextTokenizer.l:448-462)
            tokens.append(run[offset : offset + extent])
            offset += extent
            tokens.append(run[offset : offset + clen])
            offset += clen
            token_len = 0
            extent = 0
            no_letter = False
        elif cls in (_APOSTROPHE, _DECIMAL, _LETTER, _DIGIT):
            if no_letter:  # unreachable in practice (gap check fires first)
                tokens.append(run[offset : offset + token_len])
                offset += extent
                extent = 0
                token_len = 0
                no_letter = False
            extent += clen
            token_len += clen
        elif cls in (_PERCENT, _PUNCT, _THOUSAND, _HYPHEN):
            no_letter = True
            extent += clen
        else:  # control, symbol, whitespace, unclassified: unguarded write —
            # consecutive such chars emit empty terms, as the reference does
            # (ref:src/TextTokenizer.l:496-509)
            tokens.append(run[offset : offset + token_len])
            offset += extent + clen
            extent = 0
            token_len = 0
            no_letter = False
    if token_len > 0:
        tokens.append(run[offset : offset + token_len])
    return tokens


def _split_mixed_run(run: bytes) -> list[tuple[bytes, bool]]:
    """Maximal munch between the ASCII rule charset [a-zA-Z0-9'] and the UTF-8
    rule charset [a-zA-Z0-9 0x80-0xFD] for runs containing both ``'`` and high
    bytes (the only case where the union regex over-merges).  Returns
    [(sub_run, is_ascii_rule)]."""
    out = []
    i, n = 0, len(run)
    while i < n:
        m_a = _QUOTE_RUN.match(run, i)
        m_u = _UTF8_RUN.match(run, i)
        len_a = (m_a.end() - i) if m_a else 0
        len_u = (m_u.end() - i) if m_u else 0
        if len_a >= len_u and len_a > 0:  # tie → earlier flex rule (ASCII)
            out.append((run[i : i + len_a], True))
            i += len_a
        else:
            out.append((run[i : i + len_u], False))
            i += len_u
    return out


# group indexes in _SCANNER (1-based): 1 comment, 2 bang, 3 pct, 4 xml,
# 5 tag, 6 entity, 7 acronym, 8 word, 9 negnum
_G_ACRONYM, _G_WORD, _G_NEGNUM = 7, 8, 9

# ---------------------------------------------------------------------------
# two-pass fast scan (the ingest hot path)
# ---------------------------------------------------------------------------
#
# The zap rules (comment/bang/pct/xml/tag/entity) all begin at ``<`` or ``&``,
# and no token rule's charset contains either byte (word: [a-zA-Z0-9'\x80-\xFD],
# acronym: [A-Z0-9.], negnum: [-0-9.]).  The two rule families therefore never
# compete for a start position in the one-pass scanner, so zapping first
# (replacing each zap match with a single space, which no token rule consumes)
# and then extracting tokens with a group-free ``findall`` (C-speed, returns
# the matched bytes directly) yields the identical token stream — property-
# tested against ``_tokenize_bytes_scanner`` in tests/test_tokenizer.py.
_ZAP = re.compile(
    rb"(?s)"
    rb"<!--(?:.*?-->|.*)"
    rb"|<![^-][^>]*>"
    rb"|<%[^%>]+%>"
    rb"|<\?xml[^>]*>"
    rb"|<[a-zA-Z/][^>]*>"
    rb"|&(?:[a-zA-Z]+|#(?:[0-9]+|[xX][a-fA-F0-9]+));"
)
# same alternation order as _SCANNER's token rules (acronym, word, negnum):
# Python's leftmost-first alternation reproduces flex maximal munch for these
# three because their start-charsets make the ordering decisive (see
# _SCANNER's docstring analysis).
_TOKEN_FINDALL = re.compile(
    rb"(?:[A-Z0-9]\.)+"
    rb"|[a-zA-Z0-9'\x80-\xFD]+"
    rb"|-[0-9]+(?:\.[0-9]+)?"
)


def scan_raw(content: bytes) -> list[bytes]:
    """Raw rule matches (pre-expansion): zap pass + token findall.

    Returns the per-rule match bytes; callers expand each match to final
    token slots with :func:`expand_raw` (1:1 for ASCII matches, 1:N for
    UTF-8 runs).  Which rule produced a match is recoverable from the bytes
    alone: only negnum starts with ``-``, only acronym contains ``.``."""
    if content.find(b"<") >= 0 or content.find(b"&") >= 0:
        content = _ZAP.sub(b" ", content)
    return _TOKEN_FINDALL.findall(content)


# --- vectorized chunk scan (the parallel-ingest hot path) -------------------
#
# Exact numpy re-implementation of the three-rule leftmost-first alternation
# above, operating on a whole CHUNK's bytes at once and emitting an Arrow
# binary array directly — no per-token Python objects, which is what makes
# wide ingest memory-bandwidth-friendly.  Differentially tested against
# scan_raw (hypothesis + corpus) in tests/test_tokenizer.py.
#
# Derivation of the vector rules from the scanner's semantics:
# * '-' is in no other rule's charset, so EVERY '-' followed by a digit is a
#   reachable scan position → all negnum spans are unambiguous and computed
#   first (digits, then one optional '.'+digits fraction, greedy).
# * word runs never contain '-' or '.', so after masking negnum cover, the
#   remaining word-char runs are exactly the maximal runs the scanner sees.
# * an acronym ((?:[A-Z0-9]\.)+) can only begin where a word rule would not
#   have consumed the position first — i.e. at an effective word-run START
#   whose run length is 1 (the dot ends the run) with an acronym-unit char
#   and a '.' next; chains continue at stride 2 over such units.
# one fused class-bit table → a single 256-entry gather per chunk instead of
# one boolean lookup pass per class
_CLS_W, _CLS_U, _CLS_DIG, _CLS_DOT, _CLS_DASH = 1, 2, 4, 8, 16
_CLS_TABLE = np.zeros(256, dtype=np.uint8)
for _c in range(256):
    if (0x61 <= _c <= 0x7A or 0x41 <= _c <= 0x5A or 0x30 <= _c <= 0x39
            or _c == 0x27 or 0x80 <= _c <= 0xFD):
        _CLS_TABLE[_c] |= _CLS_W
    if 0x41 <= _c <= 0x5A or 0x30 <= _c <= 0x39:
        _CLS_TABLE[_c] |= _CLS_U
    if 0x30 <= _c <= 0x39:
        _CLS_TABLE[_c] |= _CLS_DIG
_CLS_TABLE[0x2E] |= _CLS_DOT
_CLS_TABLE[0x2D] |= _CLS_DASH
_U_TABLE = (_CLS_TABLE & _CLS_U).astype(bool)  # per-start lookups


# int32 gather is safe only below this; tests lower it to force (and so
# actually exercise) the int64 fallback without multi-GB inputs
_INT32_LIMIT = 2**31


def scan_raw_chunk(contents: list[bytes]) -> tuple["object", np.ndarray]:
    """Scan a whole chunk of documents in one vectorized pass.

    Returns ``(tokens, raw_lens)`` where ``tokens`` is a
    ``pyarrow.LargeBinaryArray`` of the raw scan matches of every document
    in order (identical to concatenating ``scan_raw(doc)``) and
    ``raw_lens[i]`` is document i's match count.  Documents are joined with
    a single space (in no rule's charset, so no match can span a join)."""
    import pyarrow as pa

    parts = []
    for data in contents:
        if data.find(b"<") >= 0 or data.find(b"&") >= 0:
            data = _ZAP.sub(b" ", data)
        parts.append(data)
    n_docs = len(parts)
    buf = b" ".join(parts)
    a = np.frombuffer(buf, dtype=np.uint8)
    n = len(a)
    empty_tokens = pa.array([], type=pa.large_binary())
    if n == 0:
        return empty_tokens, np.zeros(n_docs, np.int64)
    cls = _CLS_TABLE[a]
    W = (cls & _CLS_W).astype(bool)
    DIG = (cls & _CLS_DIG).astype(bool)
    dot = (cls & _CLS_DOT).astype(bool)

    # negnum: '-' digits+ ('.' digits+)?  — greedy, fraction only if a digit
    # follows the dot
    nn_s = np.flatnonzero((cls[:-1] & _CLS_DASH).astype(bool) & DIG[1:])
    if len(nn_s):
        # digit-run end for positions p: first non-digit at or after p
        nond = np.flatnonzero(~DIG)

        def dig_end(p: np.ndarray) -> np.ndarray:
            j = np.searchsorted(nond, p)
            out = np.full(len(p), n, dtype=np.int64)
            ok = j < len(nond)
            out[ok] = nond[j[ok]]
            return out

        e1 = dig_end(nn_s + 1)
        frac = (e1 + 1 < n) & dot[np.minimum(e1, n - 1)] \
            & DIG[np.minimum(e1 + 1, n - 1)]
        nn_e = e1.copy()
        if frac.any():
            nn_e[frac] = dig_end(e1[frac] + 1)
        cover = np.zeros(n + 1, dtype=np.int8)
        np.add.at(cover, nn_s, 1)
        np.add.at(cover, nn_e, -1)
        covered = np.cumsum(cover[:-1], dtype=np.int8) > 0
        effW = W & ~covered
    else:
        nn_e = nn_s
        effW = W
    shifted = np.empty(n, dtype=bool)
    shifted[0] = False
    shifted[1:] = effW[:-1]
    rs = np.flatnonzero(effW & ~shifted)
    shifted[:-1] = effW[1:]
    shifted[-1] = False
    re_ = np.flatnonzero(effW & ~shifted) + 1

    # acronym chains over len-1 unit runs with a dot next
    u_mask = (re_ - rs == 1) & _U_TABLE[a[rs]] & (rs + 1 < n) \
        & dot[np.minimum(rs + 1, n - 1)]
    q = rs[u_mask]
    if len(q):
        brk = np.flatnonzero(np.diff(q) != 2)
        g_first = np.concatenate(([0], brk + 1))
        g_last = np.concatenate((brk, [len(q) - 1]))
        acr_s = q[g_first]
        acr_e = q[g_last] + 2
        # acronym chains cover whole len-1 runs: membership test on the run
        # starts via searchsorted (no full-array paint)
        pos = np.searchsorted(acr_s, rs, side="right") - 1
        pos_c = np.maximum(pos, 0)
        keep = ~((pos >= 0) & (rs < acr_e[pos_c]))
        w_s, w_e = rs[keep], re_[keep]
    else:
        acr_s = acr_e = np.empty(0, np.int64)
        w_s, w_e = rs, re_

    s_all = np.concatenate((nn_s, acr_s, w_s))
    e_all = np.concatenate((nn_e, acr_e, w_e))
    if not len(s_all):
        return empty_tokens, np.zeros(n_docs, np.int64)
    order = np.argsort(s_all, kind="stable")  # starts are unique
    s_all, e_all = s_all[order], e_all[order]

    # arrow binary array straight from the chunk buffer (one gather).
    # int32 index math is the fast path; like _accumulate_chunk's slot_dt
    # selection, fall back to int64 when either the joined buffer or the
    # total token bytes could reach 2^31 (large-web-doc chunks) — int32
    # would silently wrap and gather garbage
    lens64 = e_all - s_all
    offsets = np.zeros(len(s_all) + 1, dtype=np.int64)
    np.cumsum(lens64, out=offsets[1:])
    total = int(offsets[-1])
    idx_dt = (np.int32 if (total < _INT32_LIMIT and n < _INT32_LIMIT)
              else np.int64)
    lens = lens64.astype(idx_dt, copy=False)
    starts = s_all.astype(idx_dt)
    off = offsets[:-1].astype(idx_dt)
    idx = np.arange(total, dtype=idx_dt)
    idx -= np.repeat(off - starts, lens)
    values = a[idx]
    tokens = pa.Array.from_buffers(
        pa.large_binary(), len(s_all),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(values.tobytes())],
    )

    # per-doc counts: doc i spans [doc_off[i], doc_off[i] + len(part_i))
    doc_off = np.zeros(n_docs, dtype=np.int64)
    if n_docs > 1:
        part_lens = np.fromiter((len(p) for p in parts), dtype=np.int64,
                                count=n_docs)
        np.cumsum(part_lens[:-1] + 1, out=doc_off[1:])
    doc_idx = np.searchsorted(doc_off, s_all, side="right") - 1
    raw_lens = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    return tokens, raw_lens


def expand_raw(tok: bytes) -> list[bytes] | tuple[bytes]:
    """One raw scan match → its final token slot bytes (pre-normalization).

    Mirrors the per-match branch of the one-pass scanner: acronym/negnum and
    pure-ASCII word runs strip trailing punctuation (1 slot); UTF-8 runs
    re-tokenize by character class (N slots, possibly empty tokens which
    later become termID-0 slots)."""
    if tok[0] == 0x2D or b"." in tok:  # negnum / acronym (word has no '-'/'.')
        return (_strip_trailing_punct(tok),)
    if _HIGH.search(tok) is None:
        n = len(tok)
        while n > 1 and tok[n - 1] in _ASCII_PUNCT:
            n -= 1
        return (tok[:n],)
    if b"'" not in tok:
        return _utf8_word_tokens(tok)
    out: list[bytes] = []
    for sub, is_ascii in _split_mixed_run(tok):
        if is_ascii:
            out.append(_strip_trailing_punct(sub))
        else:
            out.extend(_utf8_word_tokens(sub))
    return out


def _utf8_char_tokens(run: bytes) -> list[bytes]:
    """Char-mode re-tokenization of a UTF-8 run: one token per character,
    skipping unclassified/control/symbol/whitespace characters
    (ref:src/TextTokenizer.l:412-421 — ``cls != 0 && != 3 && != 5 && != 9``)."""
    return [
        run[off : off + ln]
        for cp, off, ln in _decode_utf8_chars(run)
        if _CLASS_MAP.get(cp, 0) not in (0, _CONTROL, _SYMBOL, _WHITESPACE)
    ]


def _ascii_char_tokens(tok: bytes) -> list[bytes]:
    """Char-mode ASCII token: trailing punct stripped, then one token per
    byte (ref:src/TextTokenizer.l:549-554)."""
    stripped = _strip_trailing_punct(tok)
    return [stripped[i : i + 1] for i in range(len(stripped))]


def tokenize_bytes_char(content: bytes) -> list[bytes]:
    """"char" tokenizer mode (CJK-friendly): every character is its own
    token (ref:src/TextTokenizer.l:412-421,549-554); the scanner rules and
    zapping are identical to word mode."""
    tokens: list[bytes] = []
    high_search = _HIGH.search
    for tok in scan_raw(content):
        if tok[0] == 0x2D or b"." in tok or high_search(tok) is None:
            tokens.extend(_ascii_char_tokens(tok))  # acronym/negnum/ASCII word
        elif b"'" not in tok:
            tokens.extend(_utf8_char_tokens(tok))
        else:
            for sub, is_ascii in _split_mixed_run(tok):
                if is_ascii:
                    tokens.extend(_ascii_char_tokens(sub))
                else:
                    tokens.extend(_utf8_char_tokens(sub))
    return tokens


def _tokenize_bytes_scanner(content: bytes) -> list[bytes]:
    """One-pass word-mode scanner — the original flex-order implementation,
    retained as the reference for the two-pass fast scan's equivalence
    property tests (tests/test_tokenizer.py)."""
    tokens: list[bytes] = []
    append = tokens.append
    high_search = _HIGH.search
    for m in _SCANNER.finditer(content):
        kind = m.lastindex
        if kind == _G_WORD:  # the hot branch
            run = m.group()
            if high_search(run) is None:
                n = len(run)
                while n > 1 and run[n - 1] in _ASCII_PUNCT:
                    n -= 1
                append(run[:n])
            elif b"'" not in run:
                tokens.extend(_utf8_word_tokens(run))
            else:
                for sub, is_ascii in _split_mixed_run(run):
                    if is_ascii:
                        append(_strip_trailing_punct(sub))
                    else:
                        tokens.extend(_utf8_word_tokens(sub))
        elif kind == _G_ACRONYM or kind == _G_NEGNUM:
            append(_strip_trailing_punct(m.group()))
        # comment/bang/pct/xml/tag/entity → no term emitted
    return tokens


def tokenize_bytes(content: bytes, mode: str = "word") -> list[bytes]:
    """Tokenize document bytes → raw token list (pre-normalization)."""
    if mode == "char":
        return tokenize_bytes_char(content)
    tokens: list[bytes] = []
    append = tokens.append
    high_search = _HIGH.search
    for tok in scan_raw(content):
        # inline fast path for the common ASCII cases (≡ expand_raw)
        if tok[0] == 0x2D or b"." in tok:
            append(_strip_trailing_punct(tok))
        elif high_search(tok) is None:
            n = len(tok)
            while n > 1 and tok[n - 1] in _ASCII_PUNCT:
                n -= 1
            append(tok[:n])
        else:
            tokens.extend(expand_raw(tok))
    return tokens


def tokenize_with_offsets(content: bytes,
                          mode: str = "word") -> list[tuple[bytes, int, int]]:
    """Token SLOTS with byte extents ``[(token, begin, end)]`` in the
    original byte space — the same slot stream as ``tokenize_bytes`` for the
    given mode (property-tested in tests/test_snippets.py), which is also
    the index's position space (every slot counts in dl, including word
    mode's empty/termID-0 ones).

    This is the ``ParsedDocument::positions`` analogue the snippet builder
    needs (ref:src/SnippetBuilder.cpp:370-383 maps token positions to byte
    offsets).  Zap regions are blanked IN PLACE with equal-length space runs
    (a space run and a single space are equally token-neutral) so match
    spans index directly into the raw document bytes."""
    if content.find(b"<") >= 0 or content.find(b"&") >= 0:
        blanked = _ZAP.sub(lambda m: b" " * (m.end() - m.start()), content)
    else:
        blanked = content
    if mode == "char":
        return _char_slots(blanked)
    slots: list[tuple[bytes, int, int]] = []
    for m in _TOKEN_FINDALL.finditer(blanked):
        raw = m.group()
        base = m.start()
        if raw[0] == 0x2D or b"." in raw:  # negnum / acronym
            s = _strip_trailing_punct(raw)
            slots.append((s, base, base + len(s)))
            continue
        if _HIGH.search(raw) is None:  # pure-ASCII word
            n = len(raw)
            while n > 1 and raw[n - 1] in _ASCII_PUNCT:
                n -= 1
            slots.append((raw[:n], base, base + n))
            continue
        # UTF-8 / mixed run: pieces tile the run contiguously; sub-tokens of
        # a UTF-8 piece are ordered contiguous slices (gaps where characters
        # were skipped), so a sequential find recovers each slice's offset
        pieces = _split_mixed_run(raw) if b"'" in raw else [(raw, False)]
        pcur = 0
        for sub, is_ascii in pieces:
            poff = pcur
            pcur += len(sub)
            if is_ascii:
                s = _strip_trailing_punct(sub)
                slots.append((s, base + poff, base + poff + len(s)))
                continue
            scur = 0
            for tok in _utf8_word_tokens(sub):
                if tok:
                    at = sub.find(tok, scur)
                    if at < 0:  # defensive: never expected (slices are ordered)
                        at = scur
                    slots.append((tok, base + poff + at, base + poff + at + len(tok)))
                    scur = at + len(tok)
                else:  # empty slot (termID-0): zero-width at the cursor
                    slots.append((tok, base + poff + scur, base + poff + scur))
    return slots


def _char_slots(blanked: bytes) -> list[tuple[bytes, int, int]]:
    """"char"-mode slot stream with byte extents — one slot per kept
    character, mirroring :func:`tokenize_bytes_char` branch for branch."""
    slots: list[tuple[bytes, int, int]] = []

    def ascii_piece(piece: bytes, base: int) -> None:
        stripped = _strip_trailing_punct(piece)
        for i in range(len(stripped)):
            slots.append((stripped[i:i + 1], base + i, base + i + 1))

    def utf8_piece(piece: bytes, base: int) -> None:
        for cp, off, ln in _decode_utf8_chars(piece):
            if _CLASS_MAP.get(cp, 0) not in (0, _CONTROL, _SYMBOL, _WHITESPACE):
                slots.append((piece[off:off + ln], base + off, base + off + ln))

    for m in _TOKEN_FINDALL.finditer(blanked):
        raw = m.group()
        base = m.start()
        if raw[0] == 0x2D or b"." in raw or _HIGH.search(raw) is None:
            ascii_piece(raw, base)
        elif b"'" not in raw:
            utf8_piece(raw, base)
        else:
            pcur = 0
            for sub, is_ascii in _split_mixed_run(raw):
                (ascii_piece if is_ascii else utf8_piece)(sub, base + pcur)
                pcur += len(sub)
    return slots


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

_NEEDS_NORM = re.compile(rb"[A-Z.']")
_STRIP = re.compile(rb"[.']")
_ASCII_LOWER = bytes.maketrans(
    bytes(range(ord("A"), ord("Z") + 1)), bytes(range(ord("a"), ord("z") + 1))
)


def normalize_token(tok: bytes) -> bytes:
    """NormalizationTransformation + UTF8CaseNormalization for one term."""
    if _NEEDS_NORM.search(tok):
        tok = _STRIP.sub(b"", tok)
        tok = tok.translate(_ASCII_LOWER)
    if _HIGH.search(tok):
        chars = _decode_utf8_chars(tok)
        cps = [_CASE_MAP.get(cp, cp) for cp, _, _ in chars]
        tok = "".join(chr(c) for c in cps).encode("utf-8", errors="ignore")
    return tok


@lru_cache(maxsize=262144)
def _normalize_cached(tok: bytes) -> str:
    return normalize_token(tok).decode("utf-8", errors="replace")


def tokenize(content: str | bytes, mode: str = "word") -> list[str]:
    """Full tokenize + normalize chain → list of term strings.

    Stopping/stemming are applied by the caller (they are configurable).
    Positions are list indices; stopped terms later become None in-place.
    """
    data = content.encode("utf-8") if isinstance(content, str) else content
    return [_normalize_cached(t) for t in tokenize_bytes(data, mode)]
