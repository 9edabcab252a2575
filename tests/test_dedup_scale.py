"""Scale-shape guards for the near-dup operators: a mass-duplicated content
group must be pre-collapsed (one representative) before pair generation, and
the member expansion must reproduce the exact all-pairs answer."""

from __future__ import annotations

import time

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def dup_heavy_dir(tmp_path_factory):
    """documents.parquet with one 1000-copy content group + distinct docs
    (some with UPPERCASE text to pin the lowercase tokenization)."""
    d = tmp_path_factory.mktemp("dupheavy")
    texts, ids = [], []
    boiler = "copyright header all rights reserved use subject to license terms apply"
    for i in range(1000):
        ids.append(i)
        texts.append(boiler)
    extras = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",     # near-dup of prev
        "ALPHA BETA GAMMA DELTA EPSILON ZETA ETA THETA",    # case variant
        "one two",                                          # < 3 tokens: no shingles
        "completely different words here nothing shared at all",
    ]
    for k, t in enumerate(extras):
        ids.append(1000 + k)
        texts.append(t)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def _oracle_jaccard(sf_dir: str, tau: float = 0.2):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(f"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                      FROM documents),
        sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
               FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
                     FROM toks WHERE len(t) >= 3)),
        sizes AS (SELECT doc_id, count(*)::DOUBLE AS n FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS c
                  FROM sh a JOIN sh b USING (shingle)
                  WHERE a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b, round(c / (sa.n + sb.n - c), 6) AS jaccard
        FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(c / (sa.n + sb.n - c), 6) >= {tau}
        ORDER BY doc_a, doc_b
    """).df()


def test_ngram_jaccard_mass_dup_bounded_and_exact(dup_heavy_dir):
    from indri_5_5_ray.functions.dedup import ngram_jaccard_pairs

    t0 = time.perf_counter()
    got = ngram_jaccard_pairs(dup_heavy_dir).to_pandas()
    wall = time.perf_counter() - t0
    # 1000-copy group → C(1000,2) = 499500 intra pairs + cross pairs; the
    # pre-collapse means pair GENERATION saw one representative, so this
    # finishes in seconds, not the quadratic reducer's minutes
    assert wall < 120
    want = _oracle_jaccard(dup_heavy_dir)
    got = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    want = want.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(got) == len(want) >= 499500
    assert (got["doc_a"].to_numpy() == want["doc_a"].to_numpy()).all()
    assert (got["doc_b"].to_numpy() == want["doc_b"].to_numpy()).all()
    assert (got["jaccard"].to_numpy() == want["jaccard"].to_numpy()).all()


def test_lsh_candidates_mass_dup(dup_heavy_dir):
    from indri_5_5_ray.functions.dedup import lsh_candidate_pairs

    got = lsh_candidate_pairs(dup_heavy_dir).to_pandas()
    # all 1000 identical docs are mutual candidates
    intra = got[(got.doc_a < 1000) & (got.doc_b < 1000)]
    assert len(intra) == 1000 * 999 // 2
    # case variant (1002) shares signatures with 1000 (identical after lower)
    assert ((got.doc_a == 1000) & (got.doc_b == 1002)).any()
    # pairs are unique
    assert not got.duplicated(["doc_a", "doc_b"]).any()
