"""Porter stemmer vectors — canonical examples from the 1980 paper, with
full-algorithm (all steps) expected outputs — plus the porter index config."""

from __future__ import annotations

import pytest

from indri_5_5_ray.porter import porter_stem

VECTORS = {
    # step 1a/1b
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2 (+ later steps where they fire)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # guards
    "at": "at", "by": "by",
}


@pytest.mark.parametrize("word,expected", sorted(VECTORS.items()), ids=sorted(VECTORS))
def test_porter_vectors(word, expected):
    assert porter_stem(word) == expected


def test_porter_index_config(small_corpus_dir, tmp_path):
    """stemmer='porter' builds and queries; vocabulary differs from kstem."""
    import pyarrow.parquet as pq

    from indri_5_5_ray.config import IndexConfig
    from indri_5_5_ray.pipelines.build import build_index
    from indri_5_5_ray.pipelines.query import BM25Scorer, IndexReader, process_query

    cfg = IndexConfig(stemmer="porter", max_chunk_docs=64, n_buckets=4,
                      dedup_key="sha256")
    out = str(tmp_path / "porter_idx")
    build_index(small_corpus_dir, out, cfg, resume=False)
    vocab = set(pq.read_table(f"{out}/dictionary", columns=["term"]).column("term").to_pylist())
    assert "merg" in vocab          # porter: merge → merg
    assert "merge" not in vocab
    r = IndexReader(out)
    terms = process_query("merging buffers", r.cfg)
    assert ("merg", 1) in terms     # query side stems identically
    ids, scores = BM25Scorer(r).score_exhaustive(terms, k=5)
    assert len(ids)
