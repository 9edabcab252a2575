"""Tagged-text field extraction — the TaggedTextParser analogue.

The reference tokenizer emits tag EVENTS alongside terms
(ref:src/TextTokenizer.l:63-101 ``<tag>`` rules → ``writeTag``), and
``TaggedTextParser`` matches open/close events into a TagExtent tree whose
extents are TOKEN positions (ref:src/TaggedTextParser.cpp:186-279); numeric
and date annotators then parse the covered text into an INT64 ``number``
(ref:src/NumericFieldAnnotator.cpp:56-76, ref:src/DateFieldAnnotator.cpp,
ref:src/DateParse.cpp).

Here the same happens in one pass per document: ``tokenize_bytes_events``
returns tokens plus (tag, is_close, token_pos) events, and
``extract_extents`` stack-matches them per tag name (nesting supported,
unclosed tags close at document end, stray closes ignored — the reference's
``_findTag``/mismatch handling).  Numbers: a numeric field's value is parsed
from the raw token bytes inside the extent (first integer-looking token); a
date field's value is days since 1970-01-01 (the reference uses a Julian-day
style serial from DateParse — any monotone day number preserves every
comparison the date operators make, which is the observable contract).
"""

from __future__ import annotations

import datetime
import re

from .tokenizer import _SCANNER, _G_ACRONYM, _G_NEGNUM, _G_WORD, _HIGH, \
    _ASCII_PUNCT, _ZAP, _TOKEN_FINDALL, _strip_trailing_punct, \
    _split_mixed_run, _utf8_word_tokens, expand_raw

_TAG_NAME = re.compile(rb"<(/?)([a-zA-Z][a-zA-Z0-9_.-]*)")

# group index of the tag alternative in the shared scanner (see tokenizer.py)
_G_TAG = 5

# per-unique-raw-match expansion memo (same idea as the ingest word path's
# per-chunk uniques): expansion is pure, the vocabulary is small relative
# to the token stream, and the common ASCII case is a single dict hit
_EXPAND_MEMO: dict[bytes, tuple] = {}


def _expand_cached(tok: bytes) -> tuple:
    r = _EXPAND_MEMO.get(tok)
    if r is None:
        # small cap: a chunk's working vocabulary is tens of thousands of
        # uniques, and this memo exists per ingest WORKER process — a large
        # ceiling would multiply across the fleet
        if len(_EXPAND_MEMO) > 100_000:
            _EXPAND_MEMO.clear()
        r = tuple(expand_raw(tok))
        _EXPAND_MEMO[tok] = r
    return r


def tokenize_bytes_events(
    content: bytes,
) -> tuple[list[bytes], list[tuple[str, bool, int]]]:
    """Tokenize document bytes → (raw tokens, tag events).

    Events are ``(tag_name_lower, is_close, token_position)`` in document
    order; the token position is the index the NEXT token would get (flex
    fires the tag rule between tokens, so an open tag's position is the first
    covered token and a close tag's position is one past the last covered
    token).

    Fast path: the document is segmented at ``_ZAP`` matches (whose
    alternation order mirrors ``_SCANNER``'s zap+tag rules exactly — no
    token can cross a zap span), each segment is tokenized with the
    C-speed group-free ``findall``, and matches expand to final token
    slots through the memoized :func:`expand_raw` — equivalent to the
    per-match scanner loop (property-tested against
    :func:`_tokenize_bytes_events_scanner`)."""
    tokens: list[bytes] = []
    events: list[tuple[str, bool, int]] = []
    extend = tokens.extend
    if content.find(b"<") < 0 and content.find(b"&") < 0:
        for raw in _TOKEN_FINDALL.findall(content):
            extend(_expand_cached(raw))
        return tokens, events
    last = 0
    for m in _ZAP.finditer(content):
        start = m.start()
        if start > last:
            for raw in _TOKEN_FINDALL.findall(content[last:start]):
                extend(_expand_cached(raw))
        last = m.end()
        g = m.group()
        if g[0] == 0x3C:  # '<': the tag-form alternative fires events
            tm = _TAG_NAME.match(g)
            if tm:
                events.append(
                    (tm.group(2).decode("ascii").lower(), tm.group(1) == b"/",
                     len(tokens))
                )
    if last < len(content):
        for raw in _TOKEN_FINDALL.findall(content[last:]):
            extend(_expand_cached(raw))
    return tokens, events


def _tokenize_bytes_events_scanner(
    content: bytes,
) -> tuple[list[bytes], list[tuple[str, bool, int]]]:
    """Reference implementation: the one-pass per-match scanner loop
    (kept as the property-test anchor for the fast path above)."""
    tokens: list[bytes] = []
    events: list[tuple[str, bool, int]] = []
    append = tokens.append
    high_search = _HIGH.search
    for m in _SCANNER.finditer(content):
        kind = m.lastindex
        if kind == _G_WORD:  # the hot branch (same as tokenize_bytes)
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
        elif kind == _G_TAG:
            tm = _TAG_NAME.match(m.group())
            if tm:
                events.append(
                    (tm.group(2).decode("ascii").lower(), tm.group(1) == b"/",
                     len(tokens))
                )
        # comment/bang/pct/xml/entity → nothing
    return tokens, events


_INT_TOKEN = re.compile(rb"-?[0-9]+$")

_MONTHS = {m.lower(): i + 1 for i, m in enumerate(
    ["January", "February", "March", "April", "May", "June", "July",
     "August", "September", "October", "November", "December"])}
_MONTHS.update({m[:3]: v for m, v in list(_MONTHS.items())})

_EPOCH = datetime.date(1970, 1, 1).toordinal()


def date_to_days(text: str) -> int | None:
    """Date string → days since 1970-01-01 (DateParse analogue,
    ref:src/DateParse.cpp:70-115: accepts ``YYYY-MM-DD``, ``MM/DD/YYYY``,
    ``DD Month YYYY`` and ``Month DD YYYY``)."""
    t = text.strip().lower()
    try:
        m = re.fullmatch(r"(\d{4})-(\d{1,2})-(\d{1,2})", t)
        if m:
            y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
            return datetime.date(y, mo, d).toordinal() - _EPOCH
        m = re.fullmatch(r"(\d{1,2})/(\d{1,2})/(\d{4})", t)
        if m:
            mo, d, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
            return datetime.date(y, mo, d).toordinal() - _EPOCH
        m = re.fullmatch(r"(\d{1,2})\s+([a-z]+)\s+(\d{4})", t)
        if m and m.group(2) in _MONTHS:
            return datetime.date(
                int(m.group(3)), _MONTHS[m.group(2)], int(m.group(1))
            ).toordinal() - _EPOCH
        m = re.fullmatch(r"([a-z]+)\s+(\d{1,2})\s+(\d{4})", t)
        if m and m.group(1) in _MONTHS:
            return datetime.date(
                int(m.group(3)), _MONTHS[m.group(1)], int(m.group(2))
            ).toordinal() - _EPOCH
    except ValueError:
        return None
    return None


def load_annotation_table(path: str) -> dict[str, list[tuple[str, int, int]]]:
    """Offset-annotation side table → docno-keyed (field, begin, end) rows
    in TOKEN positions — the load shared by build-time ingest
    (stages/ingest.py IngestWorker) and modify-time field addition
    (pipelines/modify.py)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["docno", "field", "begin", "end"])
    anns: dict[str, list[tuple[str, int, int]]] = {}
    for dn, f, b, e in zip(t.column("docno").to_pylist(),
                           t.column("field").to_pylist(),
                           t.column("begin").to_pylist(),
                           t.column("end").to_pylist()):
        anns.setdefault(dn, []).append((f, int(b), int(e)))
    return anns


def merge_annotation_events(
    events: list[tuple[str, bool, int]],
    annotations: list[tuple[str, int, int]],
    n_tokens: int,
) -> list[tuple[str, bool, int]]:
    """Offset annotations merged into a document's tag-event stream as
    synthetic open/close events — the reference's side-file annotation join
    (ref:src/OffsetAnnotationAnnotator.cpp, applied per document at
    ref:src/IndexEnvironment.cpp:88-129).  ``annotations`` rows are
    (field, begin, end) in TOKEN positions, clipped to [0, n_tokens];
    at equal positions document tags keep their original relative order
    and annotations sort after them (stable, input order)."""
    if not annotations:
        return events
    rows: list[tuple[int, int, int, str, bool]] = [
        (pos, 0, i, name, is_close)
        for i, (name, is_close, pos) in enumerate(events)
    ]
    for j, (name, b, e) in enumerate(annotations):
        b = max(0, min(int(b), n_tokens))
        e = max(b, min(int(e), n_tokens))
        rows.append((b, 1, j * 2, name, False))
        rows.append((e, 1, j * 2 + 1, name, True))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    return [(name, is_close, pos) for pos, _src, _seq, name, is_close in rows]


def extract_extents_tree(
    events: list[tuple[str, bool, int]],
    n_tokens: int,
    fields: tuple[str, ...],
    numeric_fields: tuple[str, ...] = (),
    date_fields: tuple[str, ...] = (),
    raw_tokens: list[bytes] | None = None,
) -> dict[str, list[tuple[int, int, int, int, int]]]:
    """Tag events → per-field ``[(begin, end, number, ordinal,
    parent_ordinal)]`` with the document's tag TREE.

    Matching as in :func:`extract_extents`.  Ordinals are assigned over ALL
    indexed extents of the doc sorted by (begin asc, end desc, open order)
    — the reference's per-document numbering
    (ref:src/MemoryIndex.cpp:341-358, ref:include/indri/TagExtent.hpp:56-67
    ``LessTagExtent``); ``parent_ordinal`` is the nearest enclosing indexed
    extent, 0 at the root (ref:include/indri/TagList.hpp:124-135 — for
    well-formed nesting the containment stack reproduces the reference's
    open-order parent chain)."""
    want = set(fields)
    numeric = set(numeric_fields)
    dates = set(date_fields)
    stacks: dict[str, list[tuple[int, int]]] = {}
    closed: list[tuple[str, int, int, int]] = []  # (name, begin, end, open_seq)
    for seq, (name, is_close, pos) in enumerate(events):
        if name not in want:
            continue
        if not is_close:
            stacks.setdefault(name, []).append((pos, seq))
        else:
            stack = stacks.get(name)
            if stack:
                begin, sq = stack.pop()
                closed.append((name, begin, pos, sq))
    for name, stack in stacks.items():
        for begin, sq in stack:
            closed.append((name, begin, n_tokens, sq))
    order = sorted(range(len(closed)),
                   key=lambda i: (closed[i][1], -closed[i][2], closed[i][3]))
    ordinal = [0] * len(closed)
    parent = [0] * len(closed)
    chain: list[tuple[int, int]] = []  # (end, ordinal) of enclosing extents
    for rank, i in enumerate(order):
        b, e = closed[i][1], closed[i][2]
        ordinal[i] = rank + 1
        while chain and chain[-1][0] <= b:
            chain.pop()
        parent[i] = chain[-1][1] if chain else 0
        chain.append((e, rank + 1))
    by_field: dict[str, list[int]] = {}
    for i, (name, _, _, _) in enumerate(closed):
        by_field.setdefault(name, []).append(i)
    result: dict[str, list[tuple[int, int, int, int, int]]] = {}
    for name, idxs in by_field.items():
        idxs.sort(key=lambda i: (closed[i][1], closed[i][2]))
        rows = []
        for i in idxs:
            begin, end = closed[i][1], closed[i][2]
            number = 0
            if raw_tokens is not None and (name in numeric or name in dates):
                covered = raw_tokens[begin:end]
                if name in numeric:
                    for tok in covered:
                        if _INT_TOKEN.match(tok):
                            number = int(tok)
                            break
                else:
                    days = date_to_days(
                        b" ".join(covered).decode("utf-8", errors="replace")
                    )
                    number = days if days is not None else 0
            rows.append((begin, end, number, ordinal[i], parent[i]))
        result[name] = rows
    return result


def extract_extents(
    events: list[tuple[str, bool, int]],
    n_tokens: int,
    fields: tuple[str, ...],
    numeric_fields: tuple[str, ...] = (),
    date_fields: tuple[str, ...] = (),
    raw_tokens: list[bytes] | None = None,
) -> dict[str, list[tuple[int, int, int]]]:
    """Tag events → per-field extent lists ``[(begin, end, number)]``.

    Stack-matched per tag name (nested same-name tags close innermost-first);
    an unclosed open tag extends to the document end; a close without an open
    is dropped.  Extents are emitted in BEGIN order.  ``number`` is 0 unless
    the field is declared numeric (integer parse of the covered raw tokens)
    or date (day-serial of the covered text)."""
    tree = extract_extents_tree(events, n_tokens, fields, numeric_fields,
                                date_fields, raw_tokens)
    return {name: [(b, e, n) for b, e, n, _, _ in rows]
            for name, rows in tree.items()}
