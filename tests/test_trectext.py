"""TREC-text reader → corpus → index end-to-end."""

from __future__ import annotations

import pytest

TREC_SAMPLE = """
<DOC>
<DOCNO> WSJ870324-0001 </DOCNO>
<HL> Some headline </HL>
<TEXT>
The quick brown fox jumps over the lazy dog.
</TEXT>
</DOC>
<DOC>
<DOCNO>WSJ870324-0002</DOCNO>
<TEXT>
First text section here.
</TEXT>
<TEXT>
Second text section here.
</TEXT>
</DOC>
<DOC>
<DOCNO>NOTEXT-1</DOCNO>
Body without a TEXT tag at all.
</DOC>
"""


def test_parse_trectext():
    from indri_5_5_ray.sources.trectext import parse_trectext

    docs = parse_trectext(TREC_SAMPLE)
    assert [d for d, _ in docs] == ["WSJ870324-0001", "WSJ870324-0002", "NOTEXT-1"]
    assert docs[0][1] == "The quick brown fox jumps over the lazy dog."
    assert "First text section" in docs[1][1] and "Second text section" in docs[1][1]
    assert "Body without a TEXT tag" in docs[2][1]
    assert "<HL>" not in docs[0][1]  # TEXT extraction drops other fields


def test_trectext_to_index(tmp_path):
    from indri_5_5_ray.config import IndexConfig
    from indri_5_5_ray.pipelines.build import build_index
    from indri_5_5_ray.pipelines.query import BM25Scorer, IndexReader, process_query
    from indri_5_5_ray.sources.trectext import read_trectext, trectext_to_corpus

    f = tmp_path / "sample.trectext"
    f.write_text(TREC_SAMPLE)
    ds = read_trectext(str(f))
    assert ds.count() == 3

    corpus = trectext_to_corpus(str(f), str(tmp_path / "corpus"))
    out = str(tmp_path / "idx")
    build_index(corpus, out, IndexConfig(max_chunk_docs=32, n_buckets=2,
                                         dedup_key=None), resume=False)
    r = IndexReader(out)
    ids, scores = BM25Scorer(r).score_exhaustive(
        process_query("quick fox", r.cfg), k=3)
    assert len(ids) >= 1
    assert r.docnos(ids.tolist())[0] == "trec/WSJ870324-0001@" + __import__("hashlib").sha1(b"WSJ870324-0001").hexdigest()
