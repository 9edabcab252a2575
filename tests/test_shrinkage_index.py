"""ShrinkageScorer.score() over a real (tiny) tagged index — the
end-to-end seams the hand-math pins in test_shrinkage.py can't cover:
out-of-vocabulary terms, ranked output, and candidate-only structure
loading."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from indri_5_5_ray.pipelines.query import IndexReader
from indri_5_5_ray.pipelines.shrinkage import ShrinkageScorer

RULES = ("parentWeight:0.1,docWeight:0.2", "field:title,weight:0.3")


@pytest.fixture(scope="module")
def nested_index(tmp_path_factory):
    docs = [
        "<sec><title> alpha beta </title> alpha gamma delta </sec>",
        "<sec><title> beta gamma </title> beta beta epsilon </sec>",
        "<sec><title> alpha epsilon </title> gamma gamma gamma </sec>",
        "<sec><title> delta zeta </title> alpha beta gamma delta </sec>",
        "<sec><title> zeta zeta </title> epsilon zeta alpha </sec>",
    ]
    t = pa.table(
        {
            "repo": ["r"] * len(docs),
            "path": [f"d{i}.txt" for i in range(len(docs))],
            "commit": [f"{i:040d}" for i in range(len(docs))],
            "lang": ["text"] * len(docs),
            "content": docs,
        }
    )
    root = tmp_path_factory.mktemp("shrnested")
    corpus = root / "corpus"
    corpus.mkdir()
    pq.write_table(t, corpus / "corpus.parquet")

    from indri_5_5_ray.config import IndexConfig
    from indri_5_5_ray.pipelines.build import build_index

    cfg = IndexConfig(stemmer=None, dedup_key=None, n_buckets=2,
                      max_chunk_docs=4, fields=("sec", "title"))
    out = str(root / "index")
    build_index(str(corpus), out, cfg)
    return out


def _scorer(nested_index):
    return ShrinkageScorer(IndexReader(nested_index), rules=RULES,
                           method="linear", lam=0.4)


def test_oov_term_scores_without_crash(nested_index):
    """An out-of-vocabulary term takes the engine's zero-cf floor
    (1/(2·total), indriql._belief_from_counts) instead of log(0)."""
    sc = _scorer(nested_index)
    ids, scores = sc.score([("alpha", 1), ("zzznotindexed", 1)], k=10)
    assert len(ids) > 0
    assert np.isfinite(scores).all()
    # the OOV term shifts every candidate by the same default belief, so
    # the ranking equals the single-term ranking over the same candidates
    ids1, _ = sc.score([("alpha", 1)], k=10)
    assert ids.tolist() == ids1.tolist()


def test_output_ranked_score_desc_doc_desc(nested_index):
    sc = _scorer(nested_index)
    ids, scores = sc.score([("alpha", 1), ("beta", 1)], k=10)
    assert len(ids) >= 3
    order = np.lexsort((-ids, -scores))
    assert ids.tolist() == ids[order].tolist()
    assert scores.tolist() == scores[order].tolist()
    # truncation keeps the top of the same ordering
    ids2, scores2 = sc.score([("alpha", 1), ("beta", 1)], k=2)
    assert ids2.tolist() == ids.tolist()[:2]
    assert scores2.tolist() == scores.tolist()[:2]


def test_structures_loaded_for_candidates_only(nested_index):
    """'epsilon' misses docs 0 and 3: the scorer must not build their tag
    trees (O(candidates) loading, memoized across queries)."""
    sc = _scorer(nested_index)
    ids, _ = sc.score([("epsilon", 1)], k=10)
    assert 0 < len(ids) < 5
    assert set(sc._structs) == {int(d) for d in ids}
    # second query over a superset loads only the missing docs
    ids2, _ = sc.score([("alpha", 1)], k=10)
    assert set(sc._structs) == {int(d) for d in ids} | {int(d) for d in ids2}


def test_run_nexi_shrinkage_path_ranked(nested_index):
    from indri_5_5_ray.pipelines.nexi import run_nexi

    reader = IndexReader(nested_index)
    ids, scores = run_nexi(reader, "alpha beta", shrinkage=True,
                           shrinkage_rules=RULES, k=10)
    assert len(ids) > 0
    assert (np.diff(scores) <= 1e-12).all()
