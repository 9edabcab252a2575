"""Query-biased snippets (ref:src/SnippetBuilder.cpp) + the offset-aware
tokenizer that feeds them."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from indri_5_5_ray.config import IndexConfig
from indri_5_5_ray.pipelines.snippets import (
    SnippetBuilder,
    _best_region,
    _build_regions,
    _sanitize,
    build_snippets,
    collect_raw_scorers,
)
from indri_5_5_ray.pipelines.indriql import parse_query
from indri_5_5_ray.tokenizer import (
    expand_raw,
    scan_raw,
    tokenize_with_offsets,
)

# ---------------------------------------------------------------------------
# tokenize_with_offsets ≡ scan_raw + expand_raw (the index position space)
# ---------------------------------------------------------------------------

_SAMPLES = [
    b"plain words only",
    b"Trailing, punct! and's apostrophes' here.",
    b"<b>tag</b> soup &amp; entities <!-- comment --> end",
    b"acronym U.S.A. and negnum -3.14 mixed",
    "unicode café naïve مدرسة text".encode(),
    "mixed'quote café's run".encode(),
    b"",
    b"<only><tags></tags>",
]


@pytest.mark.parametrize("content", _SAMPLES)
def test_offsets_match_slot_stream(content):
    slots = tokenize_with_offsets(content)
    expected = [s for m in scan_raw(content) for s in expand_raw(m)]
    assert [t for t, _b, _e in slots] == expected
    for t, b, e in slots:
        assert content[b:e] == t  # spans index the ORIGINAL bytes


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(max_codepoint=0x2FF), max_size=80))
def test_offsets_match_slot_stream_prop(s):
    content = s.encode("utf-8")
    slots = tokenize_with_offsets(content)
    expected = [t for m in scan_raw(content) for t in expand_raw(m)]
    assert [t for t, _b, _e in slots] == expected
    for t, b, e in slots:
        assert content[b:e] == t


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(max_codepoint=0x9FFF), max_size=60))
def test_char_mode_offsets_match_slot_stream_prop(s):
    from indri_5_5_ray.tokenizer import tokenize_bytes_char

    content = s.encode("utf-8")
    slots = tokenize_with_offsets(content, mode="char")
    assert [t for t, _b, _e in slots] == tokenize_bytes_char(content)
    for t, b, e in slots:
        assert content[b:e] == t


# ---------------------------------------------------------------------------
# sanitize (ref :204-269)
# ---------------------------------------------------------------------------


def test_sanitize_strips_tags_and_collapses_space():
    t = b"a  <b>bold</b>\n\tx"
    assert _sanitize(t, 0, len(t)) == b"a bold x"


def test_sanitize_skips_comment_style_script():
    t = b"a<!-- hidden -->b<style x>c{}</style >d<script>e()</script>f"
    assert _sanitize(t, 0, len(t)) == b"abdf"


def test_sanitize_unterminated_tag_stops_at_region_end():
    t = b"keep <unclosed tag runs off"
    assert _sanitize(t, 0, 12) == b"keep "


# ---------------------------------------------------------------------------
# region selection (ref :101-198)
# ---------------------------------------------------------------------------


def test_best_region_prefers_unique_node_coverage():
    # node 0 appears early twice; a later window covers nodes 0+1 → wins
    extents = [(0, 1, 0), (2, 3, 0), (40, 41, 0), (43, 44, 1)]
    r = _best_region(extents, [], 100, 10)
    assert (r.begin, r.end) == (40, 44)
    assert r.extents == [(40, 41), (43, 44)]


def test_best_region_tie_goes_to_earliest():
    extents = [(0, 1, 0), (50, 51, 0)]
    r = _best_region(extents, [], 100, 10)
    assert (r.begin, r.end) == (0, 1)


def test_best_region_respects_skips_and_doc_end():
    extents = [(0, 1, 0), (50, 51, 0)]
    skips = [type("R", (), {"begin": 0, "end": 1})()]
    r = _best_region(extents, skips, 100, 10)
    assert (r.begin, r.end) == (50, 51)
    # extents at/after positionCount never count
    r2 = _best_region([(10, 11, 0)], [], 5, 10)
    assert (r2.begin, r2.end) == (0, 0)


def test_build_regions_pads_by_half_match_width():
    regions = _build_regions([(20, 21, 0)], 100, 10, 50)
    assert len(regions) == 1
    assert (regions[0].begin, regions[0].end) == (15, 26)


# ---------------------------------------------------------------------------
# full build (ref :337-399)
# ---------------------------------------------------------------------------


def _slots(text: bytes):
    return [(b, e) for _t, b, e in tokenize_with_offsets(text)]


def test_build_uppercases_match_text_mode():
    text = b"alpha beta gamma delta"
    positions = _slots(text)
    snip = SnippetBuilder(html=False).build(text, positions, [(1, 2, 0)])
    assert "BETA" in snip and "beta" not in snip
    assert "alpha" in snip  # context kept, unhighlighted


def test_build_html_mode_uses_strong():
    text = b"alpha beta gamma"
    snip = SnippetBuilder(html=True).build(text, _slots(text), [(1, 2, 0)])
    assert "<strong>beta</strong>" in snip


def test_build_leading_and_trailing_ellipsis():
    words = b" ".join(b"w%03d" % i for i in range(200))
    positions = _slots(words)
    snip = SnippetBuilder(html=False).build(words, positions, [(100, 101, 0)])
    assert snip.startswith("...")  # region does not start at doc begin
    assert "W100" in snip
    assert snip.rstrip("\n").endswith("...")  # nor end at doc end


def test_build_no_extents_empty():
    assert SnippetBuilder().build(b"abc", [(0, 3)], []) == ""


def test_text_mode_linebreaks_near_50_chars():
    words = b" ".join(b"word%02d" % i for i in range(40))
    positions = _slots(words)
    extents = [(i, i + 1, 0) for i in range(0, 8)]
    snip = SnippetBuilder(html=False).build(words, positions, extents)
    lines = snip.split("\n")
    assert len(lines) > 1
    assert all(len(ln) <= 60 for ln in lines)  # 50 + one word overshoot


# ---------------------------------------------------------------------------
# scorer collection + end-to-end over a real index
# ---------------------------------------------------------------------------


def test_collect_raw_scorers_recurses_beliefs_only():
    root = parse_query("#combine(alpha #od2(beta gamma) #syn(x y))")
    ops = [n.op for n in collect_raw_scorers(root)]
    assert ops == ["term", "od", "syn"]


@pytest.fixture(scope="module")
def snippet_index(ray_session, tmp_path_factory):
    from indri_5_5_ray.pipelines.build import build_index
    from indri_5_5_ray.pipelines.query import IndexReader

    base = tmp_path_factory.mktemp("snip")
    docs = [
        "the merge buffer holds tokens before a flush happens in the engine "
        + "filler " * 80,
        "buffer management is unrelated to merging here " + "pad " * 60,
        "nothing relevant at all " + "noise " * 50,
    ]
    t = pa.table({
        "repo": ["r"] * 3,
        "path": [f"d{i}" for i in range(3)],
        "commit": ["c" * 40] * 3,
        "lang": ["txt"] * 3,
        "content": docs,
    })
    pq.write_table(t, str(base / "c.parquet"))
    cfg = IndexConfig(stemmer="none", stopwords=(), store_content=True,
                      n_buckets=2)
    build_index(str(base), str(base / "idx"), cfg)
    return IndexReader(str(base / "idx"))


def test_build_snippets_end_to_end(snippet_index):
    snips = build_snippets(snippet_index, "merge buffer", [0, 1, 2])
    assert "MERGE" in snips[0] and "BUFFER" in snips[0]
    assert "BUFFER" in snips[1]
    assert snips[2] == ""  # no match → empty (ref :345-346)


def test_build_snippets_window_query_highlights_phrase(snippet_index):
    snips = build_snippets(snippet_index, "#od1(merge buffer)", [0, 1])
    assert "MERGE BUFFER" in snips[0]
    # doc 1 has both words but never adjacent in order → no window match
    assert snips[1] == ""


def test_build_snippets_wildcard_query(snippet_index):
    # wildcard expands once per query (syn rewrite), then highlights every
    # expansion's occurrences
    snips = build_snippets(snippet_index, "merg*", [0, 1])
    assert "MERGE" in snips[0]
    assert "MERGING" in snips[1]


def test_build_snippets_char_mode_index(ray_session, tmp_path):
    # CJK corpus indexed with tokenizer='char': positions are per character
    from indri_5_5_ray.pipelines.build import build_index
    from indri_5_5_ray.pipelines.query import IndexReader

    t = pa.table({
        "repo": ["r"], "path": ["a"], "commit": ["c" * 40], "lang": ["txt"],
        "content": ["前文 检索引擎测试 后文"],
    })
    pq.write_table(t, str(tmp_path / "c.parquet"))
    build_index(str(tmp_path), str(tmp_path / "idx"),
                IndexConfig(tokenizer="char", stemmer=None,
                            store_content=True, n_buckets=2))
    r = IndexReader(str(tmp_path / "idx"))
    snip = build_snippets(r, "引擎", [0])[0]
    assert "引擎" in snip.upper() or "引擎" in snip  # matched slots present
    assert snip != ""


def test_build_snippets_stemmed_query_highlights_surface_forms(
        ray_session, tmp_path):
    # extents come from INDEX positions of the processed (stemmed) term, so
    # the highlighted bytes are the document's surface forms
    from indri_5_5_ray.pipelines.build import build_index
    from indri_5_5_ray.pipelines.query import IndexReader

    t = pa.table({
        "repo": ["r"], "path": ["a"], "commit": ["c" * 40], "lang": ["txt"],
        "content": ["we are merging the buffers while merges continue"],
    })
    pq.write_table(t, str(tmp_path / "c.parquet"))
    build_index(str(tmp_path), str(tmp_path / "idx"),
                IndexConfig(stemmer="krovetz", store_content=True,
                            n_buckets=2))
    r = IndexReader(str(tmp_path / "idx"))
    snip = build_snippets(r, "merge buffer", [0])[0]
    assert "MERGING" in snip and "MERGES" in snip and "BUFFERS" in snip


def test_cli_runquery_prints_snippets_and_documents(snippet_index, tmp_path,
                                                    capsys):
    from indri_5_5_ray.cli import cmd_runquery

    qf = tmp_path / "q.txt"
    qf.write_text("q1\tmerge buffer\n")
    cmd_runquery(snippet_index, str(qf), "2", "bm25", "true", "true")
    out = capsys.readouterr().out.splitlines()
    assert out[0].startswith("q1 Q0 ")
    assert "merge buffer" in out[1]  # printDocuments: raw text
    assert "MERGE" in "".join(out[2:])  # printSnippets: highlighted


def test_build_snippets_requires_docstore(ray_session, tmp_path):
    from indri_5_5_ray.pipelines.build import build_index
    from indri_5_5_ray.pipelines.query import IndexReader

    t = pa.table({
        "repo": ["r"], "path": ["d0"], "commit": ["c" * 40],
        "lang": ["txt"], "content": ["just words"],
    })
    pq.write_table(t, str(tmp_path / "c.parquet"))
    build_index(str(tmp_path), str(tmp_path / "idx"),
                IndexConfig(stemmer="none", n_buckets=2))
    r = IndexReader(str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="store_content"):
        build_snippets(r, "words", [0])
