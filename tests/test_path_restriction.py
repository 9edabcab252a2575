"""Tag-tree nesting operators: per-doc ordinals/parent ordinals at ingest
(``extract_extents_tree``) and the ``[.path]`` extent restriction — child
``/f``, descendant ``//f``, parent ``\\f`` and inside ``{f`` steps
(ref:src/indrilang.g:690-741, ref:src/ExtentChildNode.cpp,
ref:src/ExtentParentNode.cpp, ref:src/ExtentDescendantNode.cpp) — checked
against hand-computed dirichlet beliefs."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

MU = 2500.0

DOCS = [
    "<sec><title>alpha beta</title> gamma <p>alpha</p></sec>",
    "<title>alpha</title> <sec>beta gamma</sec>",
    "<sec><p><title>alpha</title></p> beta</sec>",
    "alpha beta",
]
DL = [4, 3, 2, 2]
TITLE_LEN = {0: 2, 1: 1, 2: 1, 3: 0}
TITLE_TOTAL = 4.0
P_LEN = {0: 1, 1: 0, 2: 1, 3: 0}
P_TOTAL = 2.0


def _dir(c, dl, cf, total):
    p_c = cf / total if cf > 0 else 1.0 / (2.0 * total)
    return math.log((c + MU * p_c) / (dl + MU))


def test_extract_extents_tree_ordinals():
    from indri_5_5_ray.fields import extract_extents_tree, tokenize_bytes_events

    toks, events = tokenize_bytes_events(DOCS[0].encode())
    tree = extract_extents_tree(events, len(toks), ("sec", "title", "p"))
    # global ordinals: begin asc, end desc, open order
    assert tree["sec"] == [(0, 4, 0, 1, 0)]
    assert tree["title"] == [(0, 2, 0, 2, 1)]
    assert tree["p"] == [(3, 4, 0, 3, 1)]

    toks2, events2 = tokenize_bytes_events(DOCS[2].encode())
    tree2 = extract_extents_tree(events2, len(toks2), ("sec", "title", "p"))
    # identical spans (p and title both cover token 0): open order breaks
    # the tie, so p is the title's parent, sec the p's parent
    assert tree2["sec"] == [(0, 2, 0, 1, 0)]
    assert tree2["p"] == [(0, 1, 0, 2, 1)]
    assert tree2["title"] == [(0, 1, 0, 3, 2)]


@pytest.fixture(scope="module")
def nested_index(tmp_path_factory):
    from indri_5_5_ray.config import IndexConfig
    from indri_5_5_ray.pipelines.build import build_index

    d = tmp_path_factory.mktemp("nestidx")
    corpus = d / "corpus"
    corpus.mkdir()
    t = pa.table({
        "repo": ["r"] * len(DOCS),
        "path": [f"d{i}.txt" for i in range(len(DOCS))],
        "commit": [f"c{i}" for i in range(len(DOCS))],
        "lang": ["txt"] * len(DOCS),
        "content": DOCS,
    })
    pq.write_table(t, corpus / "corpus.parquet")
    out = str(d / "idx")
    cfg = IndexConfig(stemmer=None, dedup_key=None, n_buckets=4,
                      max_chunk_docs=64, fields=("sec", "title", "p"))
    build_index(str(corpus), out, cfg, resume=False)
    return out


def _engine(nested_index):
    from indri_5_5_ray.pipelines.indriql import StructuredQueryEngine
    from indri_5_5_ray.pipelines.query import IndexReader

    return StructuredQueryEngine(IndexReader(nested_index))


def _scores(eng, q, k=10) -> dict[int, float]:
    ids, sc = eng.run(q, k=k)
    return dict(zip(ids.tolist(), sc.tolist()))


def test_ordinals_stored(nested_index):
    from indri_5_5_ray.pipelines.query import IndexReader

    t = IndexReader(nested_index).field_extents("title")
    assert "ordinals" in t.column_names and "parent_ordinals" in t.column_names
    by_doc = {d: (o, p) for d, o, p in zip(
        t.column("doc_id").to_pylist(), t.column("ordinals").to_pylist(),
        t.column("parent_ordinals").to_pylist())}
    assert by_doc[0] == ([2], [1])   # title child of sec
    assert by_doc[1] == ([1], [0])   # top-level title
    assert by_doc[2] == ([3], [2])   # title child of p (inside sec)


def test_child_restriction(nested_index):
    eng = _engine(nested_index)
    got = _scores(eng, "#combine[sec](#combine[./title](alpha))")
    # title extents that are tree CHILDREN of a sec extent: only doc 0
    # (doc 2's title's parent is p); cf = 1, context = title field stats
    cnt = {0: 1, 1: 0, 2: 0, 3: 0}
    want = {d: _dir(cnt[d], TITLE_LEN[d], 1.0, TITLE_TOTAL) for d in cnt}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=0, abs=1e-12)


def test_descendant_restriction(nested_index):
    eng = _engine(nested_index)
    got = _scores(eng, "#combine[sec](#combine[.//title](alpha))")
    # descendants: docs 0 and 2 (doc 1's title is OUTSIDE its sec)
    cnt = {0: 1, 1: 0, 2: 1, 3: 0}
    want = {d: _dir(cnt[d], TITLE_LEN[d], 2.0, TITLE_TOTAL) for d in cnt}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=0, abs=1e-12)


def test_inside_restriction_matches_descendant_here(nested_index):
    eng = _engine(nested_index)
    got = _scores(eng, "#combine[sec](#combine[.{title](alpha))")
    want = _scores(eng, "#combine[sec](#combine[.//title](alpha))")
    assert got == want


def test_parent_restriction(nested_index):
    eng = _engine(nested_index)
    got = _scores(eng, "#combine[title](#combine[.\\p](alpha))")
    # p extents that are the tree PARENT of a title extent: doc 2's p
    # (doc 0's title's parent is sec); context = p field stats
    cnt = {0: 0, 1: 0, 2: 1, 3: 0}
    want = {d: _dir(cnt[d], P_LEN[d], 1.0, P_TOTAL) for d in cnt}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=0, abs=1e-12)


def test_path_without_context_raises(nested_index):
    eng = _engine(nested_index)
    with pytest.raises(ValueError, match="outer context"):
        eng.run("#combine[./title](alpha)", k=5)


def test_window_inside_path_restriction(nested_index):
    """#odN under a [.path] context: window extents must be contained in
    the path-matched extents (ExtentRestriction over a window node)."""
    eng = _engine(nested_index)
    got = _scores(eng, "#combine[sec](#combine[./title](#od1(alpha beta)))")
    # adjacent 'alpha beta' inside a title that is a CHILD of sec: doc 0
    # only (doc 1's title is outside sec and holds only 'alpha'; doc 2's
    # title is a child of p)
    cnt = {0: 1, 1: 0, 2: 0, 3: 0}
    want = {d: _dir(cnt[d], TITLE_LEN[d], 1.0, TITLE_TOTAL) for d in cnt}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=0, abs=1e-12)


def test_path_restriction_sharded(nested_index):
    """Path-restricted queries through the doc-partitioned scatter match
    the single-process run bitwise (field caches + tree walks per shard)."""
    import numpy as np

    from indri_5_5_ray.pipelines.run import run_queries_sharded

    eng = _engine(nested_index)
    q = "#combine[sec](#combine[.//title](alpha))"
    ids, sc = eng.run(q, k=10)
    t = run_queries_sharded(nested_index, [("1", q)], k=10, n_shards=2,
                            concurrency=2, kind="structured")
    assert t.column("doc_id").to_pylist() == ids.tolist()
    np.testing.assert_array_equal(t.column("score").to_numpy(), sc)
