"""Offset-annotation side-file join at ingest (the reference's
OffsetAnnotationAnnotator, ref:src/OffsetAnnotationAnnotator.cpp applied at
ref:src/IndexEnvironment.cpp:88-129): an annotated build must be
indistinguishable from a build whose tags were inline in the documents."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# inline-tagged documents ...
TAGGED = [
    "<anno>alpha beta</anno> alpha gamma",
    "beta <anno>gamma delta</anno> delta",
    "alpha beta no tags here",
    "<title>alpha <anno>alpha epsilon</anno></title> tail",
]
# ... and the same corpus with <anno> supplied as offset annotations
PLAIN = [
    "alpha beta alpha gamma",
    "beta gamma delta delta",
    "alpha beta no tags here",
    "<title>alpha alpha epsilon</title> tail",
]
ANNOS = [  # (doc index, begin, end) in token positions
    (0, 0, 2),
    (1, 1, 3),
    (3, 1, 3),
]


def _build(tmp_path, name, contents, offset_annotations=None):
    from indri_5_5_ray.config import IndexConfig
    from indri_5_5_ray.pipelines.build import build_index

    corpus = tmp_path / f"corpus_{name}"
    corpus.mkdir()
    t = pa.table({
        "repo": ["r"] * len(contents),
        "path": [f"d{i}.txt" for i in range(len(contents))],
        "commit": [f"c{i}" for i in range(len(contents))],
        "lang": ["txt"] * len(contents),
        "content": contents,
    })
    pq.write_table(t, corpus / "corpus.parquet")
    out = str(tmp_path / f"idx_{name}")
    cfg = IndexConfig(
        stemmer=None, dedup_key=None, n_buckets=4, max_chunk_docs=64,
        fields=("title", "anno"), offset_annotations=offset_annotations,
    )
    manifest = build_index(str(corpus), out, cfg, resume=False)
    return out, manifest


@pytest.fixture(scope="module")
def indexes(tmp_path_factory):
    d = tmp_path_factory.mktemp("annoidx")
    ann_path = str(d / "annotations.parquet")
    pq.write_table(pa.table({
        "docno": [f"r/d{i}.txt@c{i}" for i, _b, _e in ANNOS],
        "field": ["anno"] * len(ANNOS),
        "begin": [b for _i, b, _e in ANNOS],
        "end": [e for _i, _b, e in ANNOS],
    }), ann_path)
    inline = _build(d, "inline", TAGGED)
    annotated = _build(d, "annotated", PLAIN, offset_annotations=ann_path)
    return inline, annotated


def test_annotated_equals_inline(indexes):
    from indri_5_5_ray.pipelines.indriql import StructuredQueryEngine
    from indri_5_5_ray.pipelines.query import IndexReader

    (inline_dir, m_in), (anno_dir, m_an) = indexes
    assert m_in["field_stats"]["anno"] == m_an["field_stats"]["anno"]

    eng_in = StructuredQueryEngine(IndexReader(inline_dir))
    eng_an = StructuredQueryEngine(IndexReader(anno_dir))
    for q in ("alpha.anno", "#combine[anno](alpha)", "#any:anno",
              "#combine(beta.(anno) gamma)",
              "#combine[anno](#od2(alpha beta))"):
        ids_i, s_i = eng_in.run(q, k=10)
        ids_a, s_a = eng_an.run(q, k=10)
        assert ids_i.tolist() == ids_a.tolist(), q
        np.testing.assert_array_equal(s_i, s_a)


def test_annotation_tree_nesting(indexes):
    """The annotated extent nests under the inline <title> extent exactly
    as an inline <anno> tag would (parent ordinals via the merged event
    stream)."""
    from indri_5_5_ray.pipelines.query import IndexReader

    (inline_dir, _), (anno_dir, _) = indexes
    for d in (inline_dir, anno_dir):
        t = IndexReader(d).field_extents("anno")
        rows = {did: (bs, es, ps) for did, bs, es, ps in zip(
            t.column("doc_id").to_pylist(),
            t.column("begins").to_pylist(),
            t.column("ends").to_pylist(),
            t.column("parent_ordinals").to_pylist())}
        assert rows[0] == ([0], [2], [0])
        assert rows[1] == ([1], [3], [0])
        # doc 3: <anno> sits inside <title> (parent ordinal 1)
        assert rows[3] == ([1], [3], [1])
