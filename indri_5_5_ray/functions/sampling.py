"""Sampling + benchmark-contamination operators for training-data curation.

Three pipeline stages a 100 TB curation run needs alongside dedup:

- :func:`sample_hash` — deterministic content-hash Bernoulli sampling.  Every
  worker makes the same keep/drop decision from the document bytes alone, so
  the sample is stable across reruns, resumable partitions, and cluster
  sizes; no RNG state is shared or shipped.
- :func:`quota_sample` — per-key (language) quota sampling: the first
  ``per_key`` docs per key in deterministic content-hash order.  Map-side
  partial top-N per batch, then a tiny per-key final — never a full shuffle.
- :func:`contamination_screen` — flags corpus documents sharing a word
  n-gram with a benchmark/eval set (the train-test contamination check,
  e.g. GPT-3 appendix C / Dodge et al. 2021 "Documenting Large Webtext
  Corpora"): the benchmark side is small by construction, so its distinct
  shingle set is broadcast once (``ray.put``) and the screen is a map-side
  semi-join — no shuffle touches the corpus.

All three have exact DuckDB oracles (md5 / window-function SQL) registered in
``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import polars as pl
import pyarrow as pa
import ray
import ray.data

from .dedup import _doc_shingles
from .textstats import read_spread


# per-worker-process memo for the broadcast benchmark shingle Series
_BENCH_MEMO: dict = {}


def _md5_hex16(texts: list[bytes]) -> np.ndarray:
    """First 16 hex chars of md5 per text (object array of str).  md5 parity
    with DuckDB's ``md5()`` makes hash order reproducible in SQL."""
    return np.array([hashlib.md5(t).hexdigest()[:16] for t in texts],
                    dtype=object)


def _text_bytes(batch: pa.Table) -> list[bytes]:
    # utf-8 bytes straight from arrow, no str round trip
    return batch.column("text").cast(pa.large_binary()).to_pylist()


def _mod_filter(batch: pa.Table, modulus: int, keep_zero: bool) -> pa.Table:
    """Keep rows with doc_id % modulus == 0 (benchmark split) or != 0
    (corpus split) — map-side, so the split never needs a planner filter."""
    mod = batch.column("doc_id").to_numpy() % modulus
    return batch.filter(pa.array((mod == 0) if keep_zero else (mod != 0)))


def sample_hash(sf_dir: str, rate_pct: int = 10) -> ray.data.Dataset:
    """(doc_id, lang, n_chars) for docs whose md5(text) lands under
    ``rate_pct``% — a deterministic Bernoulli sample keyed by content.

    Map-only: each batch decides independently from the document bytes, so
    the operator streams at any scale and a resumed run re-selects exactly
    the same sample."""

    def f(batch: pa.Table) -> pa.Table:
        h8 = np.array(
            [int(hashlib.md5(t).hexdigest()[:8], 16)
             for t in _text_bytes(batch)],
            dtype=np.int64)
        keep = (h8 % 100) < rate_pct
        return batch.select(["doc_id", "lang", "n_chars"]).filter(
            pa.array(keep))

    return read_spread(f"{sf_dir}/documents.parquet",
                       ["doc_id", "lang", "n_chars", "text"]).map_batches(
        f, batch_format="pyarrow")


# default mixture for the driver entry: zh is deliberately over-weighted so
# its rate CLAMPS at 1.0 (the "not enough data in this domain" branch)
MIXTURE_WEIGHTS: dict[str, int] = {"en": 10, "zh": 60, "fr": 15, "de": 10,
                                   "es": 5}


def mixture_sample(sf_dir: str, budget_tokens: int = 8000,
                   weights: dict[str, int] | None = None) -> ray.data.Dataset:
    """(doc_id, lang, n_tokens) — deterministic domain-mixture sample: each
    language is down-sampled so its expected OUTPUT token mass approaches
    ``budget_tokens × weight%`` (the static domain-reweighting step of a
    training-data pipeline, à la The Pile / CCNet mixture tables; rates
    clamp at 1.0 — no upsampling/repetition).

    Two streaming passes: (1) per-language token totals via map-side
    partial sums — the driver combines only ``#langs × #batches`` tiny
    rows; (2) a map-only filter keeping a doc iff
    ``md5(text) mod 1e6 < rate_ppm[lang]``.  Rates are computed in EXACT
    integer arithmetic (``min(1e6, 1e6·budget·w // (100·tokens))``) so the
    DuckDB oracle reproduces them bit-for-bit; the content-hash keep
    decision makes the sample stable across reruns, resume, and cluster
    sizes, like :func:`sample_hash`.  Languages without a weight are
    dropped (weight 0)."""
    weights = MIXTURE_WEIGHTS if weights is None else weights
    src = read_spread(f"{sf_dir}/documents.parquet",
                      ["doc_id", "lang", "text"])

    def partial_tokens(batch: pa.Table) -> pa.Table:
        from .textstats import token_count_expr

        if batch.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "tok": pa.array([], pa.int64())})
        return (pl.from_arrow(batch)
                .with_columns(token_count_expr().cast(pl.Int64).alias("n"))
                .group_by("lang").agg(pl.col("n").sum().alias("tok"))
                .to_arrow())

    totals: dict[str, int] = {}
    for row in src.map_batches(partial_tokens,
                               batch_format="pyarrow").take_all():
        totals[row["lang"]] = totals.get(row["lang"], 0) + int(row["tok"])
    rate_ppm = {
        lang: min(1_000_000,
                  (1_000_000 * budget_tokens * w) // (100 * totals[lang]))
        for lang, w in weights.items() if totals.get(lang)
    }

    def keep(batch: pa.Table) -> pa.Table:
        from .textstats import token_count_expr

        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "lang": pa.array([], pa.string()),
                          "n_tokens": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        u = np.array([int(hashlib.md5(t).hexdigest()[:8], 16)
                      for t in _text_bytes(batch)],
                     dtype=np.int64) % 1_000_000
        ppm = np.array([rate_ppm.get(l, 0)
                        for l in batch.column("lang").to_pylist()],
                       dtype=np.int64)
        mask = u < ppm
        if not mask.any():
            return empty
        return (pl.from_arrow(batch)
                .with_columns(token_count_expr().cast(pl.Int64)
                              .alias("n_tokens"))
                .filter(pl.Series(mask))
                .select("doc_id", "lang", "n_tokens")
                .to_arrow())

    return src.map_batches(keep, batch_format="pyarrow")


def quota_sample(sf_dir: str, per_key: int = 50, combine_batch: int = 4096,
                 partial_batch: int | None = None) -> ray.data.Dataset:
    """(lang, doc_id, rk) — the first ``per_key`` docs per language in
    deterministic md5(text) order (doc_id tie-break), rk = 1-based rank.

    Shuffle plan: each batch keeps at most ``per_key`` candidates per key
    (map-side partial top-N), then a DEEP combine tree: combine passes
    (each re-reducing ``combine_batch``-row bundles; top-N of top-Ns ≡
    top-N) repeat until the surviving partial count fits one combine batch
    — at extreme partial counts (10⁵+ chunks × many keys) one pass is not
    enough, and each pass shrinks the set by ~combine_batch/(per_key ×
    n_keys).  Inter-pass counts run over the tiny materialized partials
    (bounded by passes × survivors, never the corpus); only the final
    survivors reach the per-key groupby.  The number of combine passes of
    the calling THREAD's last call is recorded in
    ``quota_sample_combine_passes()`` (test hook; thread-local so
    concurrent drivers in one process can't race it)."""

    def _reduce(df: pl.DataFrame) -> pa.Table:
        # the ONE definition of the quota order: (hk asc, doc_id asc) per key
        return (df.sort(["hk", "doc_id"])
                  .group_by("lang", maintain_order=True)
                  .head(per_key)
                  .to_arrow())

    def partial(batch: pa.Table) -> pa.Table:
        return _reduce(
            pl.from_arrow(batch.select(["doc_id", "lang"])).with_columns(
                pl.Series("hk", _md5_hex16(_text_bytes(batch)),
                          dtype=pl.Utf8)))

    def combine(batch: pa.Table) -> pa.Table:
        return _reduce(pl.from_arrow(batch))

    def final(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort(["hk", "doc_id"]).head(per_key)
        return (df.with_columns(
                    pl.int_range(1, df.height + 1, dtype=pl.Int64).alias("rk"))
                  .select(["lang", "doc_id", "rk"])
                  .to_arrow())

    # partial_batch: smaller map batches → more partial survivors → deeper
    # combine tree (the knob the multi-pass test turns; None = Ray default)
    ds = read_spread(f"{sf_dir}/documents.parquet",
                     ["doc_id", "lang", "text"]).map_batches(
        partial, batch_format="pyarrow",
        **({"batch_size": partial_batch} if partial_batch else {})
    ).materialize()
    passes = 0
    n = ds.count()
    while n > combine_batch:
        ds = ds.map_batches(combine, batch_format="pyarrow",
                            batch_size=combine_batch).materialize()
        passes += 1
        n_prev, n = n, ds.count()
        if n >= n_prev:
            # all survivors are distinct-key heads — no pass can shrink this
            break
    _QUOTA_TLS.passes = passes
    return ds.groupby("lang").map_groups(final, batch_format="pyarrow")


# thread-local test hook (ADVICE r4: a mutable attribute on the function
# object raced across concurrent quota_sample calls in one driver)
import threading as _threading  # noqa: E402

_QUOTA_TLS = _threading.local()


def quota_sample_combine_passes() -> int:
    """Combine passes of THIS thread's most recent quota_sample call
    (-1 when the thread has not run one)."""
    return getattr(_QUOTA_TLS, "passes", -1)


def benchmark_shingles(sf_dir: str, modulus: int = 97) -> set[str]:
    """Distinct word 3-grams of the synthetic benchmark split
    (``doc_id % modulus == 0`` — a deterministic stand-in for an external
    eval set).  Small by construction (1/modulus of the corpus), gathered to
    the driver once for broadcast."""
    ds = read_spread(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def sh(batch: pa.Table) -> pa.Table:
        batch = _mod_filter(batch, modulus, keep_zero=True)
        return (_doc_shingles(batch).select("shingle").unique().to_arrow())

    parts = ds.map_batches(sh, batch_format="pyarrow").take_all()
    return {r["shingle"] for r in parts}


def contamination_screen(sf_dir: str, modulus: int = 97) -> ray.data.Dataset:
    """(doc_id, n_hits) — non-benchmark docs sharing ≥1 word 3-gram with the
    benchmark split, with the count of distinct shared shingles.

    The benchmark shingle set is broadcast (``ray.put`` once, fetched once
    per worker process and memoized), so the corpus side is a pure map on
    warm task workers — no actor-pool spawn, no shuffle, no corpus
    materialization."""
    bench_ref = ray.put(sorted(benchmark_shingles(sf_dir, modulus)))

    def screen(batch: pa.Table) -> pa.Table:
        # one object-store fetch + one polars Series per worker process,
        # reused across every batch and invocation (warm Ray workers)
        key = bench_ref.hex()
        bench = _BENCH_MEMO.get(key)
        if bench is None:
            while len(_BENCH_MEMO) >= 2:  # bounded; two interleaved screens
                _BENCH_MEMO.pop(next(iter(_BENCH_MEMO)))  # must not thrash
            bench = pl.Series("shingle", ray.get(bench_ref), dtype=pl.Utf8)
            _BENCH_MEMO[key] = bench
        sh = _doc_shingles(_mod_filter(batch, modulus, keep_zero=False))
        hits = (sh.filter(pl.col("shingle").is_in(bench))
                  .group_by("doc_id")
                  .agg(pl.len().cast(pl.Int64).alias("n_hits")))
        return hits.sort("doc_id").to_arrow()

    ds = read_spread(f"{sf_dir}/documents.parquet", ["doc_id", "text"])
    return ds.map_batches(screen, batch_format="pyarrow")


def _doc_token_counts(sf_dir: str) -> ray.data.Dataset:
    """Materialized (doc_id, n_tokens) over the documents table."""

    def counts(batch: pa.Table) -> pa.Table:
        from .textstats import token_count_expr

        df = pl.from_arrow(batch)
        return df.select(
            "doc_id",
            token_count_expr().cast(pl.Int64).alias("n_tokens"),
        ).to_arrow()

    return read_spread(f"{sf_dir}/documents.parquet",
                       ["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow").materialize()


def _docid_key(t: pa.Table) -> tuple[int, int, bool]:
    d = t.column("doc_id").to_numpy()
    is_sorted = bool(np.all(np.diff(d) > 0)) if len(d) > 1 else True
    return int(d.min()), int(d.max()), is_sorted


def pack_shards(sf_dir: str, budget: int = 2048) -> ray.data.Dataset:
    """(doc_id, n_tokens, shard_id) — greedy sequential packing of documents
    into ~``budget``-token training shards: shard_id = exclusive running
    token count (doc_id order) // budget.  The step that turns a curated
    corpus into fixed-token-budget shards for sequence packing; a document
    is assigned by its START offset, so shards hold ≈budget tokens and a
    doc larger than the budget takes whole shards by itself.

    Shape: a DISTRIBUTED PREFIX SUM — pass 1 maps per-block (doc_id,
    n_tokens) partials and brings only per-block (doc range, token
    subtotal) triples to the driver (O(#blocks), never rows); blocks are
    put in doc_id order BY THEIR RANGES — Ray's streaming executor does
    not guarantee block delivery order (``preserve_order`` is off), but
    each block is a contiguous row range of the doc_id-sorted input, so
    range-sorting reconstructs the global order (overlapping ranges raise:
    they would mean the input was not doc_id-sorted).  An exclusive scan
    gives each block's starting offset; pass 2 re-maps each materialized
    block with its offset.  Nothing shuffles.
    """

    counted = _doc_token_counts(sf_dir)
    return _prefix_sum_pack(
        counted.to_arrow_refs(), budget, _docid_key, (),
        "pack_shards requires a doc_id-sorted input (ranges overlap "
        "or a block is internally unsorted)")


def _block_token_offsets(refs: list, block_key, err: str):
    """Driver-side scan shared by the packers: per-block (key range, token
    subtotal) triples (O(#blocks), never rows), blocks put in global order
    by their DISJOINT key ranges — overlap or intra-block disorder raises
    ``ValueError(err)`` — then an exclusive scan of token subtotals.
    Returns ``(order, offsets)`` over the indices of real blocks (empty /
    schema-less blocks are dropped; real blocks must carry ``doc_id`` and
    ``n_tokens`` — see _prefix_sum_pack's CONTRACT note)."""

    @ray.remote
    def block_stats(t: pa.Table):
        import pyarrow.compute as pc

        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return None
        lo, hi, is_sorted = block_key(t)
        return (lo, hi, int(pc.sum(t.column("n_tokens")).as_py() or 0),
                is_sorted)

    stats = ray.get([block_stats.remote(r) for r in refs])
    order = sorted((i for i in range(len(refs)) if stats[i] is not None),
                   key=lambda i: stats[i][0])
    prev_max = None
    for i in order:
        lo, hi, _, is_sorted = stats[i]
        if (prev_max is not None and lo <= prev_max) or not is_sorted:
            raise ValueError(err)
        prev_max = hi
    offsets = np.concatenate(
        ([0], np.cumsum([stats[i][2] for i in order])[:-1])) \
        if order else np.array([])
    return order, offsets


def _prefix_sum_pack(refs: list, budget: int, block_key, drop_cols: tuple,
                     err: str) -> ray.data.Dataset:
    """Shared distributed-prefix-sum packer behind :func:`pack_shards` and
    :func:`shuffle_pack`: per-block (key range, token subtotal) triples to
    the driver (O(#blocks), never rows), blocks put in global order by
    their DISJOINT key ranges, exclusive scan, per-block offset re-map.

    ``block_key(t) -> (lo_key, hi_key, is_sorted)`` extracts one block's
    key range and whether the block is internally key-sorted; overlap OR
    intra-block disorder raises ``ValueError(err)`` — the running offset
    is undefined either way.  Empty blocks (a corpus narrower than the
    spread width, or an empty sort partition — they may lack even the
    mapped schema) are dropped.

    CONTRACT: real blocks must carry ``doc_id`` and ``n_tokens`` columns
    — the ``"doc_id" not in column_names`` test below is how schema-less
    empty blocks are recognized, so a caller keying on a different id
    column would see every block silently classified empty; add the
    column names as parameters before adding such a caller."""

    order, offsets = _block_token_offsets(refs, block_key, err)

    @ray.remote
    def assign(t: pa.Table, offset: int) -> pa.Table:
        n = t.column("n_tokens").to_numpy()
        excl = offset + np.concatenate(([0], np.cumsum(n)[:-1]))
        out = t.drop_columns(list(drop_cols)) if drop_cols else t
        return out.append_column(
            "shard_id", pa.array(excl // budget, pa.int64()))

    out_refs = [assign.remote(refs[i], int(o))
                for i, o in zip(order, offsets)]
    if not out_refs:  # no real blocks at all
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "shard_id": pa.array([], pa.int64())}))
    return ray.data.from_arrow_refs(out_refs)


def pack_sequences(sf_dir: str, seq_len: int = 512) -> ray.data.Dataset:
    """(seq_id, doc_id, tok_start, tok_end, seq_off) — concatenate the
    corpus token stream in doc_id order and split it into fixed-length
    training sequences of ``seq_len`` tokens: the final "chunk into
    context windows" step of LLM data prep.  Unlike :func:`pack_shards`
    (which ASSIGNS whole docs to budgeted shards), documents SPLIT
    across sequence boundaries: each output row says that sequence
    ``seq_id`` carries doc ``doc_id``'s tokens ``[tok_start, tok_end)``
    starting at in-sequence position ``seq_off``.  Zero-token docs emit
    no rows; the final sequence is ragged (shorter than ``seq_len``).

    Shape: the :func:`pack_shards` distributed prefix sum — per-block
    (doc range, token subtotal) triples to the driver (O(#blocks), never
    rows), range-ordered with overlap/disorder detection, exclusive
    scan — then a map-only per-block emit: a doc at global offset ``p``
    with ``n`` tokens overlaps sequences ``p // L .. (p+n-1) // L``, and
    the per-doc expansion is one vectorized ``np.repeat`` (no Python
    loop over docs).  Nothing shuffles."""
    counted = _doc_token_counts(sf_dir)
    refs = counted.to_arrow_refs()
    order, offsets = _block_token_offsets(
        refs, _docid_key,
        "pack_sequences requires a doc_id-sorted input (ranges overlap "
        "or a block is internally unsorted)")

    _empty = pa.table({"seq_id": pa.array([], pa.int64()),
                       "doc_id": pa.array([], pa.int64()),
                       "tok_start": pa.array([], pa.int64()),
                       "tok_end": pa.array([], pa.int64()),
                       "seq_off": pa.array([], pa.int64())})

    @ray.remote
    def emit(t: pa.Table, offset: int) -> pa.Table:
        n = t.column("n_tokens").to_numpy().astype(np.int64)
        d = t.column("doc_id").to_numpy()
        p = offset + np.concatenate(([0], np.cumsum(n)[:-1]))
        nz = n > 0
        d, n, p = d[nz], n[nz], p[nz]
        if not len(d):
            return _empty
        s0 = p // seq_len
        k = (p + n - 1) // seq_len - s0 + 1
        tot = int(k.sum())
        starts = np.concatenate(([0], np.cumsum(k)[:-1]))
        # row r belongs to doc j with local sequence index r - starts[j]
        j = np.repeat(np.arange(len(d)), k)
        seq = s0[j] + (np.arange(tot) - starts[j])
        p_r, n_r = p[j], n[j]
        return pa.table({
            "seq_id": pa.array(seq, pa.int64()),
            "doc_id": pa.array(d[j], pa.int64()),
            "tok_start": pa.array(np.maximum(seq * seq_len - p_r, 0),
                                  pa.int64()),
            "tok_end": pa.array(np.minimum((seq + 1) * seq_len - p_r, n_r),
                                pa.int64()),
            "seq_off": pa.array(np.maximum(p_r - seq * seq_len, 0),
                                pa.int64()),
        })

    out_refs = [emit.remote(refs[i], int(o)) for i, o in zip(order, offsets)]
    if not out_refs:
        return ray.data.from_arrow(_empty)
    return ray.data.from_arrow_refs(out_refs)


def shuffle_pack(sf_dir: str, budget: int = 2048) -> ray.data.Dataset:
    """(doc_id, n_tokens, shard_id) — like :func:`pack_shards` but over a
    DETERMINISTIC GLOBAL SHUFFLE of the corpus: documents are ordered by
    ``md5(doc_id)`` (doc_id tie-break) before the greedy token packing, so
    neighbouring training shards hold decorrelated documents instead of
    ingest-adjacent ones — the shuffle step before sequence packing, made
    reproducible (reruns, resumes and cluster sizes all produce the same
    order, unlike ``random_shuffle``).

    Shape: the shuffle is one Ray range-partitioned sort on the hash key
    — inherent to the semantics: a global permutation must move every
    row once — then the SAME distributed prefix sum as ``pack_shards``:
    per-block (key range, token subtotal) triples to the driver
    (O(#blocks), never rows), exclusive scan, per-block offset re-map.
    Key-range overlap across sorted blocks raises instead of mis-packing.
    """

    def keyed(batch: pa.Table) -> pa.Table:
        from .textstats import token_count_expr

        df = pl.from_arrow(batch)
        skey = _md5_hex16([str(d).encode()
                           for d in batch.column("doc_id").to_pylist()])
        return (df.select(
            "doc_id",
            token_count_expr().cast(pl.Int64).alias("n_tokens"),
        ).with_columns(pl.Series("skey", skey, dtype=pl.String)).to_arrow())

    shuffled = (read_spread(f"{sf_dir}/documents.parquet", ["doc_id", "text"])
                .map_batches(keyed, batch_format="pyarrow")
                .sort(["skey", "doc_id"]).materialize())

    def shuffle_key(t: pa.Table) -> tuple[tuple, tuple, bool]:
        last = t.num_rows - 1
        k0 = (t.column("skey")[0].as_py(), int(t.column("doc_id")[0].as_py()))
        k1 = (t.column("skey")[last].as_py(),
              int(t.column("doc_id")[last].as_py()))
        # Ray's sort emits sorted blocks; assert the invariant anyway —
        # a silently unsorted block would mis-pack every later shard
        df = pl.from_arrow(t.select(["skey", "doc_id"]))
        ok = bool(df.select(
            ((pl.col("skey") > pl.col("skey").shift(1))
             | ((pl.col("skey") == pl.col("skey").shift(1))
                & (pl.col("doc_id") > pl.col("doc_id").shift(1))))
            .fill_null(True).all()).item())
        return k0, k1, ok

    return _prefix_sum_pack(
        shuffled.to_arrow_refs(), budget, shuffle_key, ("skey",),
        "shuffle_pack: sorted block key ranges overlap or a block is "
        "internally unsorted")
