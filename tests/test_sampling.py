"""Sampling + contamination operators (functions/sampling.py): determinism,
quota bounds, and brute-force agreement on the sf0.001 testdata."""

from __future__ import annotations

import hashlib

import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from indri_5_5_ray.functions import sampling

SF = "/root/testdata/sf0.001"


def _docs_table():
    return pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "lang"])


def test_sample_hash_deterministic_and_exact():
    got = {r["doc_id"] for r in sampling.sample_hash(SF).take_all()}
    again = {r["doc_id"] for r in sampling.sample_hash(SF).take_all()}
    assert got == again  # content-keyed: stable across runs
    t = _docs_table()
    want = {
        int(d) for d, x in zip(t.column("doc_id").to_pylist(),
                               t.column("text").to_pylist())
        if int(hashlib.md5(x.encode()).hexdigest()[:8], 16) % 100 < 10
    }
    assert got == want


def test_sample_hash_rate_monotone():
    n5 = sampling.sample_hash(SF, rate_pct=5).count()
    n20 = sampling.sample_hash(SF, rate_pct=20).count()
    total = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert n5 <= n20 <= total
    # a 20% hash sample of a uniform corpus lands loosely around 20%
    assert 0.05 * total < n20 < 0.45 * total


def test_mixture_sample_rates_exact_and_clamped():
    """Brute-force the integer rate table and the md5 keep rule; a weight
    large enough to clamp must keep EVERY doc of that language."""
    import re

    budget, weights = 8000, {"en": 10, "zh": 60, "fr": 15, "de": 10, "es": 5}
    t = _docs_table()
    tok = {}
    for lg, x in zip(t.column("lang").to_pylist(),
                     t.column("text").to_pylist()):
        tok[lg] = tok.get(lg, 0) + len(re.findall(r"[a-z0-9]+", x.lower()))
    ppm = {lg: min(1_000_000, (1_000_000 * budget * w) // (100 * tok[lg]))
           for lg, w in weights.items() if tok.get(lg)}
    assert ppm["zh"] == 1_000_000  # the over-weighted domain clamps
    want = {
        int(d)
        for d, lg, x in zip(t.column("doc_id").to_pylist(),
                            t.column("lang").to_pylist(),
                            t.column("text").to_pylist())
        if int(hashlib.md5(x.encode()).hexdigest()[:8], 16) % 1_000_000
        < ppm.get(lg, 0)
    }
    out = sampling.mixture_sample(SF, budget, weights).take_all()
    assert {r["doc_id"] for r in out} == want
    # clamped language: every zh doc survives
    zh_all = sum(lg == "zh" for lg in t.column("lang").to_pylist())
    assert sum(r["lang"] == "zh" for r in out) == zh_all
    # unweighted languages are dropped entirely
    none = sampling.mixture_sample(SF, budget, {"en": 100}).take_all()
    assert {r["lang"] for r in none} == {"en"}


def test_quota_sample_bounds_and_order():
    rows = sampling.quota_sample(SF, per_key=7).take_all()
    by_lang: dict[str, list[dict]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    t = _docs_table()
    df = pl.from_arrow(t)
    lang_counts = dict(df.group_by("lang").len().iter_rows())
    for lang, grp in by_lang.items():
        assert len(grp) == min(7, lang_counts[lang])
        assert sorted(r["rk"] for r in grp) == list(range(1, len(grp) + 1))
    # rank order == md5-hex order with doc_id tie-break (brute force)
    hk = {int(d): hashlib.md5(x.encode()).hexdigest()[:16]
          for d, x in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist())}
    for lang, grp in by_lang.items():
        want = sorted(
            (int(d) for d, l in zip(t.column("doc_id").to_pylist(),
                                    t.column("lang").to_pylist()) if l == lang),
            key=lambda d: (hk[d], d))[:len(grp)]
        got = [r["doc_id"] for r in sorted(grp, key=lambda r: r["rk"])]
        assert got == want


def test_quota_sample_deep_combine_multi_pass():
    """A tiny combine_batch forces the combine tree ≥2 passes deep; the
    result must be identical to the single-pass (default) plan — top-N of
    top-Ns ≡ top-N at any tree depth."""
    want = sorted(
        (r["lang"], r["doc_id"], r["rk"])
        for r in sampling.quota_sample(SF, per_key=3).take_all())
    # combine_batch must exceed a partial block's row count (≤ 15 here) so
    # each combine batch bundles several blocks — that is what shrinks; it
    # is small enough that one pass cannot finish, forcing a ≥2-level tree
    got_ds = sampling.quota_sample(SF, per_key=3, combine_batch=24,
                                   partial_batch=32)
    got = sorted((r["lang"], r["doc_id"], r["rk"]) for r in got_ds.take_all())
    assert sampling.quota_sample_combine_passes() >= 2
    assert got == want


@pytest.mark.parametrize("modulus", [29, 400])
def test_contamination_screen_flags_real_overlaps_only(modulus):
    rows = sampling.contamination_screen(SF, modulus=modulus).take_all()
    t = _docs_table()
    # brute-force 3-gram shingle sets per doc
    import re

    def shingles(text: str) -> set[str]:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    sh = {int(d): shingles(x)
          for d, x in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist())}
    bench = set().union(*(s for d, s in sh.items() if d % modulus == 0))
    want = {d: len(s & bench) for d, s in sh.items()
            if d % modulus != 0 and s & bench}
    got = {r["doc_id"]: r["n_hits"] for r in rows}
    assert got == want
    assert all(d % modulus != 0 for d in got)  # benchmark docs never flagged


def test_line_stats_and_gopher_filter_brute_force():
    """textstats.line_stats / gopher_filter vs a per-doc Python recompute."""
    import re

    from indri_5_5_ray.functions import textstats

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))

    got_ls = {r["doc_id"]: r for r in textstats.line_stats(SF).take_all()}
    got_gf = {r["doc_id"]: r for r in textstats.gopher_filter(SF).take_all()}
    passed = set()
    for d, x in docs.items():
        lines = x.split("\n")
        nl, nu = len(lines), len(set(lines))
        r = got_ls[d]
        assert (r["n_lines"], r["n_unique_lines"]) == (nl, nu)
        assert r["dup_line_frac"] == pytest.approx((nl - nu) / nl, abs=1e-6)
        toks = re.findall(r"[a-z0-9]+", x.lower())
        if toks:
            mean = sum(len(w) for w in toks) / len(toks)
            dupf = (nl - nu) / nl
            if 50 <= len(toks) <= 100_000 and 3 <= mean <= 10 and dupf < 0.3:
                passed.add(d)
                assert got_gf[d]["n_tokens"] == len(toks)
    assert set(got_gf) == passed
    assert passed  # thresholds keep a non-trivial subset at sf0.001


def test_repetition_stats_brute_force():
    """textstats.repetition_stats vs a per-doc Python recompute of the
    top-bigram token fraction."""
    import re
    from collections import Counter

    from indri_5_5_ray.functions import textstats

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = {r["doc_id"]: r["top_bigram_frac"]
           for r in textstats.repetition_stats(SF).take_all()}
    for d, x in zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()):
        toks = re.findall(r"[a-z0-9]+", x.lower())
        if len(toks) < 2:
            want = 0.0
        else:
            m = max(Counter(zip(toks, toks[1:])).values())
            want = round(2.0 * m / len(toks), 6)
        assert got[d] == pytest.approx(want, abs=1e-9), d
    assert len(got) == t.num_rows
    assert any(v > 0 for v in got.values())  # signal is non-trivial here


def test_read_spread_splits_single_row_group(tmp_path):
    """A one-row-group parquet cannot be split inside Ray's reader, so
    operator pipelines over it run as ONE task; read_spread must repartition
    small inputs to cluster width so map stages parallelize."""
    import pyarrow as pa

    from indri_5_5_ray.functions.textstats import read_spread

    p = tmp_path / "one_rg.parquet"
    tbl = pa.table({"doc_id": pa.array(range(5000), pa.int64()),
                    "text": pa.array(["word " * 30] * 5000)})
    pq.write_table(tbl, p, row_group_size=5000)  # ONE row group
    ds = read_spread(str(p), ["doc_id", "text"])
    n_blocks = ds.materialize().num_blocks()
    assert n_blocks > 1
    assert ds.count() == 5000


def test_shuffle_pack_brute_force_and_determinism():
    """shuffle_pack equals the single-process md5-ordered greedy packing;
    the order is a real permutation (not doc_id order) and reruns agree."""
    import re

    from indri_5_5_ray.functions.sampling import shuffle_pack

    t = _docs_table()
    rows = sorted(
        ((hashlib.md5(str(d).encode()).hexdigest()[:16], int(d),
          len(re.findall(r"[a-z0-9]+", x.lower())))
         for d, x in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist())))
    run = 0
    want = {}
    for _, d, n in rows:
        want[d] = run // 2048
        run += n
    got = {r["doc_id"]: r["shard_id"]
           for r in shuffle_pack(SF, budget=2048).take_all()}
    assert got == want
    again = {r["doc_id"]: r["shard_id"]
             for r in shuffle_pack(SF, budget=2048).take_all()}
    assert got == again
    # the hash order genuinely permutes: doc_id order would put the lowest
    # ids in shard 0, which the md5 order must not reproduce
    doc_order = sorted(want)
    by_hash_first = [d for _, d, _ in rows[:len(doc_order) // 4]]
    assert by_hash_first != doc_order[:len(doc_order) // 4]


def test_pack_shards_prefix_sum_brute_force():
    """sampling.pack_shards vs a sequential recompute: shard_id must equal
    the exclusive running token count // budget in doc_id order, across
    block boundaries (the distributed prefix sum's offsets)."""
    import re

    from indri_5_5_ray.functions import sampling

    t = _docs_table()
    got = sorted((r["doc_id"], r["n_tokens"], r["shard_id"])
                 for r in sampling.pack_shards(SF, budget=512).take_all())
    docs = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()))
    cum = 0
    want = []
    for d, x in docs:
        n = len(re.findall(r"[a-z0-9]+", x.lower()))
        want.append((d, n, cum // 512))
        cum += n
    assert got == want
    assert want[-1][2] > 0  # more than one shard → offsets actually used


def test_pack_shards_tiny_corpus_and_unsorted_input(tmp_path):
    """A corpus smaller than the spread width yields empty blocks that must
    be dropped, not crash assign; an unsorted doc_id column must raise."""
    import pyarrow as pa

    d = tmp_path / "tiny"
    d.mkdir()
    tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                    "text": pa.array([f"word{i} " * (i + 1) for i in range(5)])})
    pq.write_table(tbl, d / "documents.parquet")
    rows = sorted((r["doc_id"], r["n_tokens"], r["shard_id"])
                  for r in sampling.pack_shards(str(d), budget=4).take_all())
    # exclusive cumsum of n_tokens [1,2,3,4,5] → offsets [0,1,3,6,10] // 4
    assert rows == [(0, 1, 0), (1, 2, 0), (2, 3, 0), (3, 4, 1), (4, 5, 2)]

    # a mildly unsorted tiny file can still be VALID: single-row blocks
    # with disjoint ranges range-sort back into doc_id order.  Descending
    # ids make every multi-row block internally unsorted → must raise.
    d2 = tmp_path / "unsorted"
    d2.mkdir()
    ids = list(range(39, -1, -1))
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(["w x y"] * 40)}),
                   d2 / "documents.parquet")
    with pytest.raises(ValueError, match="doc_id-sorted"):
        sampling.pack_shards(str(d2), budget=4).take_all()


def test_pack_sequences_oracle_and_invariants(tmp_path, ray_entry_mod):
    """pack_sequences == the registered DuckDB oracle on sf0.001 (the
    entry sits past the driver's 50-slot window, so the hash-grade
    compare lives here), plus structural invariants: full sequences tile
    exactly seq_len tokens, spans within a doc are contiguous, and a
    doc longer than seq_len splits across sequences."""
    import duckdb

    from indri_5_5_ray.functions import sampling

    sf = "/root/testdata/sf0.001"
    got = (sampling.pack_sequences(sf, seq_len=512).to_pandas()
           .sort_values(["seq_id", "doc_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(
        ray_entry_mod.oracle_sql()["pack_sequences"]).fetch_df()
    assert got.shape == want.shape
    for c in got.columns:
        assert (got[c].values == want[c].values).all(), c

    lengths = (got.tok_end - got.tok_start).groupby(got.seq_id).sum()
    assert (lengths.iloc[:-1] == 512).all()
    assert 0 < lengths.iloc[-1] <= 512

    # a giant doc splits: 3 docs, the middle one 1200 tokens
    d = tmp_path / "giant"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([5, 9, 11], pa.int64()),
        "text": pa.array(["alpha beta", "tok " * 1200, "omega"]),
    }), d / "documents.parquet")
    rows = (sampling.pack_sequences(str(d), seq_len=512).to_pandas()
            .sort_values(["seq_id", "doc_id"]).values.tolist())
    # offsets: doc5 [0,2), doc9 [2,1202), doc11 [1202,1203)
    assert rows == [
        [0, 5, 0, 2, 0],
        [0, 9, 0, 510, 2],
        [1, 9, 510, 1022, 0],
        [2, 9, 1022, 1200, 0],
        [2, 11, 0, 1, 178],
    ]


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_pack_sequences_property(tmp_path_factory, data):
    """Vectorized overlap expansion == a plain-Python reference packer on
    random sparse-doc-id corpora and random sequence lengths."""
    from indri_5_5_ray.functions import sampling

    n_docs = data.draw(st.integers(1, 12))
    ids = sorted(data.draw(st.sets(st.integers(0, 500), min_size=n_docs,
                                   max_size=n_docs)))
    counts = [data.draw(st.integers(0, 40)) for _ in ids]
    L = data.draw(st.integers(1, 17))

    d = tmp_path_factory.mktemp("seqprop")
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["tok " * n for n in counts]),
    }), d / "documents.parquet")
    got = sorted(map(tuple, sampling.pack_sequences(str(d), seq_len=L)
                 .to_pandas().values.tolist()))

    want = []
    p = 0
    for doc, n in zip(ids, counts):
        if n:
            for seq in range(p // L, (p + n - 1) // L + 1):
                want.append((seq, doc, max(seq * L - p, 0),
                             min((seq + 1) * L - p, n), max(p - seq * L, 0)))
        p += n
    assert got == sorted(want)
