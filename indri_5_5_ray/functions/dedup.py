"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The reference only has exact ingest-time dedup
(ref:src/IndexEnvironment.cpp:388-404, SURVEY.md §2.8); near-dup operators
are the training-data-pipeline extension, built Ray-Data-first:

* exact      — hash-partition on content hash, keep-first (groupby shuffle);
* n-gram Jaccard — shingle explode → groupby(shingle) pair generation →
  groupby(pair) count (exact verify path; at 100 TB run it only on LSH
  candidates);
* MinHash+LSH — md5-based minhash signatures (deterministic & SQL-
  reproducible), banded into buckets, candidate pairs from bucket groupby;
* SimHash    — 60-bit fingerprints from md5 token hashes (60 bits so the
  value stays SQL-reproducible via DuckDB's 15-hex-digit BIGINT cast).

All hashing is md5-based so every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import polars as pl
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from .textstats import tokens_expr

NGRAM_N = 3
NUM_PERMS = 16
LSH_BANDS = 4  # 4 bands × 4 rows


def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(sf_dir: str) -> ray.data.Dataset:
    """(content_hash, rep_doc_id, n_copies) — keep-first exact dedup."""

    def add_hash(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        out = df.select(
            pl.col("doc_id"),
            pl.col("text").map_elements(
                lambda s: hashlib.md5(s.encode()).hexdigest(), return_dtype=pl.String
            ).alias("content_hash"),
        )
        return out.to_arrow()

    from ray.data.aggregate import Count, Min

    return (
        _docs(sf_dir)
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="rep_doc_id"), Count(alias_name="n_copies"))
    )


def dedup_keep_first(sf_dir: str) -> ray.data.Dataset:
    """doc_ids surviving exact dedup (min doc_id per content group)."""
    groups = exact_dup_groups(sf_dir)

    def pick(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("rep_doc_id")})

    return groups.map_batches(pick, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------


def _doc_shingles(batch: pa.Table) -> pl.DataFrame:
    """(doc_id, shingle) distinct word n-grams per doc (polars-vectorized)."""
    df = pl.from_arrow(batch).with_columns(
        tokens_expr().alias("toks")
    )
    ex = df.select("doc_id", "toks").explode("toks")
    # window shift within doc to build n-grams
    ex = ex.with_columns(
        *[
            pl.col("toks").shift(-i).over("doc_id").alias(f"t{i}")
            for i in range(1, NGRAM_N)
        ]
    )
    ex = ex.drop_nulls()
    ex = ex.with_columns(
        pl.concat_str(
            [pl.col("toks")] + [pl.col(f"t{i}") for i in range(1, NGRAM_N)],
            separator=" ",
        ).alias("shingle")
    )
    return ex.select("doc_id", "shingle").unique()


def doc_shingles(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, shingle) dataset. NOTE: batches must not split documents —
    read_parquet blocks keep rows contiguous, and the shift window is keyed
    by doc_id, so document boundaries are safe regardless."""

    def f(batch: pa.Table) -> pa.Table:
        return _doc_shingles(batch).to_arrow()

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(sf_dir: str, tau: float = 0.2) -> ray.data.Dataset:
    """(doc_a, doc_b, jaccard) for pairs with 3-gram Jaccard ≥ tau.

    shuffle plan: explode shingles → groupby(shingle) emits co-occurrence
    pairs → groupby(pair) counts intersections → broadcast per-doc shingle
    counts for the union term.  At 100 TB this exact join runs AFTER MinHash
    LSH candidate pruning (see lsh_candidate_pairs); here it doubles as the
    oracle-checkable exact path."""
    sh = doc_shingles(sf_dir)

    # per-doc shingle counts: small table → collected and broadcast
    from ray.data.aggregate import Count

    sizes_ds = sh.groupby("doc_id").aggregate(Count(alias_name="n_shingles"))
    sizes_tbl = sizes_ds.to_arrow_refs()
    import ray as _ray

    sizes = {}
    for ref in sizes_tbl:
        t = _ray.get(ref)
        if "doc_id" not in t.column_names:  # empty block
            continue
        for did, n in zip(t.column("doc_id").to_pylist(), t.column("n_shingles").to_pylist()):
            sizes[did] = n
    sizes_ref = _ray.put(sizes)

    def pairs_of_group(group: pa.Table) -> pa.Table:
        if "doc_id" not in group.column_names:  # empty reduce partition
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        ids = sorted(group.column("doc_id").to_pylist())
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())})

    pair_counts = (
        sh.groupby("shingle")
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="inter"))
    )

    def jaccard(batch: pa.Table) -> pa.Table:
        s = _ray.get(sizes_ref)
        df = pl.from_arrow(batch)
        if df.height == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        na = np.array([s[x] for x in df["doc_a"].to_list()], dtype=np.float64)
        nb = np.array([s[x] for x in df["doc_b"].to_list()], dtype=np.float64)
        inter = df["inter"].to_numpy().astype(np.float64)
        j = np.round(inter / (na + nb - inter), 6)
        out = df.with_columns(pl.Series("jaccard", j)).drop("inter")
        return out.filter(pl.col("jaccard") >= tau).to_arrow()

    return pair_counts.map_batches(jaccard, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_of_shingles(shingles: list[str]) -> list[str]:
    """NUM_PERMS md5-based minhashes (hex-string min — SQL-reproducible)."""
    out = []
    for p in range(NUM_PERMS):
        prefix = f"{p}:".encode()
        out.append(min(hashlib.md5(prefix + s.encode()).hexdigest() for s in shingles))
    return out


def minhash_signatures(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, perm, minhash) — md5-permutation MinHash signatures."""

    def f(batch: pa.Table) -> pa.Table:
        sh = _doc_shingles(batch)
        rows_doc, rows_perm, rows_hash = [], [], []
        for did, group in sh.group_by("doc_id"):
            shingles = group["shingle"].to_list()
            for p, h in enumerate(_minhash_of_shingles(shingles)):
                rows_doc.append(did[0] if isinstance(did, tuple) else did)
                rows_perm.append(p)
                rows_hash.append(h)
        return pa.table(
            {
                "doc_id": pa.array(rows_doc, pa.int64()),
                "perm": pa.array(rows_perm, pa.int32()),
                "minhash": pa.array(rows_hash, pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def lsh_candidate_pairs(sf_dir: str) -> ray.data.Dataset:
    """(doc_a, doc_b) candidate near-dup pairs from banded MinHash buckets.

    Band key = md5(band || concatenated minhashes of the band's rows);
    pairs sharing any bucket, deduplicated. The scale path for near-dup:
    only candidates proceed to exact Jaccard verification."""

    def bucketize(batch: pa.Table) -> pa.Table:
        sh = _doc_shingles(batch)
        docs, keys = [], []
        rows_per_band = NUM_PERMS // LSH_BANDS
        for did, group in sh.group_by("doc_id"):
            did = did[0] if isinstance(did, tuple) else did
            sig = _minhash_of_shingles(group["shingle"].to_list())
            for band in range(LSH_BANDS):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                key = hashlib.md5((f"{band}|" + "|".join(chunk)).encode()).hexdigest()
                docs.append(did)
                keys.append(key)
        return pa.table(
            {"doc_id": pa.array(docs, pa.int64()), "bucket": pa.array(keys, pa.string())}
        )

    buckets = _docs(sf_dir).map_batches(bucketize, batch_format="pyarrow")

    def pairs_of_bucket(group: pa.Table) -> pa.Table:
        if "doc_id" not in group.column_names:  # empty reduce partition
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        ids = sorted(set(group.column("doc_id").to_pylist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())})

    pairs = buckets.groupby("bucket").map_groups(pairs_of_bucket, batch_format="pyarrow")
    # dedup pairs that shared several buckets
    from ray.data.aggregate import Count

    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_buckets"))
        .drop_columns(["n_buckets"])
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 hex digits → reproducible as a DuckDB BIGINT cast


def simhash_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, simhash) 60-bit SimHash over tf-weighted md5 token hashes."""

    def f(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            tokens_expr().alias("toks")
        )
        ex = (
            df.select("doc_id", "toks")
            .explode("toks")
            .drop_nulls()  # zero-token docs explode to a null row
            .group_by(["doc_id", "toks"])
            .agg(pl.len().alias("tf"))
        )
        doc_ids_out, fp_out = [], []
        for did, group in ex.group_by("doc_id"):
            did = did[0] if isinstance(did, tuple) else did
            acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
            for tok, tf in zip(group["toks"].to_list(), group["tf"].to_list()):
                hv = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
                bits = (hv >> np.arange(SIMHASH_BITS)) & 1
                acc += np.where(bits == 1, tf, -tf)
            fp = int(((acc > 0).astype(np.int64) << np.arange(SIMHASH_BITS)).sum())
            doc_ids_out.append(did)
            fp_out.append(fp)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids_out, pa.int64()),
                "simhash": pa.array(fp_out, pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")
