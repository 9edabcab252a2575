"""Event-stream operators over the ``events`` table (ts, user_id,
event_type, value).

The reference is batch-only (SURVEY.md §2.11: no windows/watermarks); these
are the training-data-pipeline time-series extensions, built with the
canonical Ray shapes:

* tumbling windows — map-side partial aggregation per batch (bucket by
  truncated timestamp), small groupby finalize;
* sessionization / rollups / as-of — ONE user-keyed exchange, grouped by
  a bytes-scaled USER BUCKET (``user_id % n``), never by user_id itself:
  Ray's map_groups dispatches one Python call per group, so per-user
  groups cost one interpreter round-trip per user (measured 70 s for 1M
  events / 200k users); per-bucket groups amortize that into one
  vectorized polars/numpy kernel over ~thousands of users (the same
  coarse-group idiom as the span-dedup exchanges in dedup.py).

Timestamps are emitted as epoch seconds (int64) so DuckDB oracles compare
exactly.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

SESSION_GAP_S = 1800  # 30 min


def _events(sf_dir: str, columns: list[str] | None = None
            ) -> ray.data.Dataset:
    from .textstats import read_spread

    return read_spread(f"{sf_dir}/events.parquet", columns=columns)


def _user_buckets(sf_dir: str) -> int:
    """User-bucket count for the keyed exchanges, sized by input bytes
    (~16 MB per bucket, floor 64): one reduce group is one bucket."""
    import os

    try:
        size = os.path.getsize(f"{sf_dir}/events.parquet")
    except OSError:
        return 64
    return max(64, int(size // (16 << 20)))


def tumbling_counts(sf_dir: str) -> ray.data.Dataset:
    """(hour_start, event_type, n_events, sum_value) — 1-hour tumbling
    windows; hour_start = epoch seconds, sum_value rounded to 6 decimals."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        out = (
            df.with_columns(
                (pl.col("ts").dt.epoch("s") // 3600 * 3600).alias("hour_start")
            )
            .group_by(["hour_start", "event_type"])
            .agg(pl.len().alias("n_events"), pl.col("value").sum().alias("sum_value"))
        )
        return out.to_arrow()

    parts = _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow")
    agg = parts.groupby(["hour_start", "event_type"]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        if df.height == 0 or "hour_start" not in df.columns:
            return pa.table({"hour_start": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64()),
                             "sum_value": pa.array([], pa.float64())})
        return df.with_columns(pl.col("sum_value").round(6)).to_arrow()

    return agg.map_batches(finish, batch_format="pyarrow")


def sessionize(sf_dir: str, gap_s: int = SESSION_GAP_S) -> ray.data.Dataset:
    """(user_id, session_start, n_events, duration_s) — gap-based sessions
    per user; session_start = epoch seconds of the first event.

    One user-bucketed exchange; the per-bucket kernel sorts by
    (user_id, ts) and splits sessions with one vectorized boundary scan
    (user change OR gap) over the whole bucket — no per-user dispatch."""
    n_ub = _user_buckets(sf_dir)

    def prep(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return (df.with_columns(
                    pl.col("ts").dt.epoch("s").alias("ts_s"),
                    (pl.col("user_id") % n_ub).cast(pl.Int32).alias("ub"))
                .select("user_id", "ts_s", "ub").to_arrow())

    def sessions_of_bucket(group: pa.Table) -> pa.Table:
        if "user_id" not in group.column_names or group.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "session_start": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "duration_s": pa.array([], pa.int64())})
        df = pl.from_arrow(group).sort(["user_id", "ts_s"])
        ts = df["ts_s"].to_numpy()
        uid = df["user_id"].to_numpy()
        new_sess = np.ones(len(ts), dtype=bool)
        new_sess[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_s)
        starts = np.nonzero(new_sess)[0]
        ends = np.concatenate((starts[1:], [len(ts)]))
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_start": pa.array(ts[starts], pa.int64()),
                "n_events": pa.array((ends - starts).astype(np.int64), pa.int64()),
                "duration_s": pa.array(ts[ends - 1] - ts[starts], pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["user_id", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(sessions_of_bucket, batch_format="pyarrow")
    )


def user_activity(sf_dir: str) -> ray.data.Dataset:
    """(user_id, n_events, n_types, first_ts, last_ts) relational rollup.

    One user-bucketed ``groupby.map_groups`` computes all five columns —
    no driver-side collection or join; the per-bucket kernel is a single
    vectorized polars group_by over ~thousands of users (per-user groups
    would cost one Python dispatch per user)."""
    ds = _events(sf_dir, ["user_id", "event_type", "ts"])
    n_ub = _user_buckets(sf_dir)

    def prep(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.with_columns(
            pl.col("ts").dt.epoch("s").alias("ts_s"),
            (pl.col("user_id") % n_ub).cast(pl.Int32).alias("ub"),
        ).select("user_id", "event_type", "ts_s", "ub").to_arrow()

    def rollup(group: pa.Table) -> pa.Table:
        if "user_id" not in group.column_names or group.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_types": pa.array([], pa.int64()),
                             "first_ts": pa.array([], pa.int64()),
                             "last_ts": pa.array([], pa.int64())})
        df = pl.from_arrow(group)
        out = (
            df.group_by("user_id")
            .agg(
                pl.len().alias("n_events"),
                pl.col("event_type").n_unique().cast(pl.Int64).alias("n_types"),
                pl.col("ts_s").min().alias("first_ts"),
                pl.col("ts_s").max().alias("last_ts"),
            )
            .sort("user_id")
        )
        return out.to_arrow()

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(rollup, batch_format="pyarrow")
    )


def hopping_counts(sf_dir: str, window_s: int = 3600,
                   hop_s: int = 900) -> ray.data.Dataset:
    """(window_start, event_type, n_events, sum_value) — HOPPING (sliding)
    windows of ``window_s`` advancing every ``hop_s``: each event lands in
    ``window_s // hop_s`` overlapping windows.

    Same partial+final shape as :func:`tumbling_counts` — the fan-out by
    window membership happens map-side (a small cross join with the offset
    list inside the batch), so the shuffle moves pre-aggregated
    (window, type) rows, multiplied only by the overlap factor."""
    # a timestamp is covered by ceil(window_s / hop_s) hop-aligned starts at
    # most; fan out that many candidates and keep the contained ones (when
    # hop_s divides window_s the filter is vacuous, but e.g. window 3600 /
    # hop 1000 needs 4 candidates of which the oldest may fall out)
    k = -(-window_s // hop_s)

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        base = df.with_columns(
            pl.col("ts").dt.epoch("s").alias("ts_s"),
            (pl.col("ts").dt.epoch("s") // hop_s * hop_s).alias("hop_start"),
        ).select("ts_s", "hop_start", "event_type", "value")
        offs = pl.DataFrame({"j": list(range(k))})
        out = (
            base.join(offs, how="cross")
            .with_columns(
                (pl.col("hop_start") - pl.col("j") * hop_s).alias("window_start"))
            .filter((pl.col("ts_s") >= pl.col("window_start"))
                    & (pl.col("ts_s") < pl.col("window_start") + window_s))
            .group_by(["window_start", "event_type"])
            .agg(pl.len().alias("n_events"),
                 pl.col("value").sum().alias("sum_value"))
        )
        return out.to_arrow()

    parts = _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow")
    agg = parts.groupby(["window_start", "event_type"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        if df.height == 0 or "window_start" not in df.columns:
            return pa.table({"window_start": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64()),
                             "sum_value": pa.array([], pa.float64())})
        return df.with_columns(pl.col("sum_value").round(6)).to_arrow()

    return agg.map_batches(finish, batch_format="pyarrow")


def asof_join_events(sf_dir: str, left_type: str = "click",
                     right_type: str = "view") -> ray.data.Dataset:
    """(event_id, user_id, ts_s, prev_view_value) — as-of join: each
    ``left_type`` event gets the value of the latest STRICTLY-PRECEDING
    ``right_type`` event of the same user (ordering key (ts, event_id), so
    ties are deterministic); INNER semantics — left events with no prior
    match are dropped (keeps the output NULL-free for exact comparison).

    Ray shape: one user-BUCKETED exchange (the same shape as sessionize),
    then a vectorized sort + forward-fill/shift ``over(user_id)`` across
    the whole bucket — no driver-side state, no per-user Python dispatch;
    per-group memory is one bucket's filtered events."""
    ds = _events(sf_dir,
                 ["event_id", "user_id", "event_type", "ts", "value"])
    n_ub = _user_buckets(sf_dir)

    def prep(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return (
            df.filter(pl.col("event_type").is_in([left_type, right_type]))
            .with_columns(
                pl.col("ts").dt.epoch("s").alias("ts_s"),
                (pl.col("user_id") % n_ub).cast(pl.Int32).alias("ub"))
            .select("event_id", "user_id", "event_type", "ts_s", "value",
                    "ub")
            .to_arrow()
        )

    def per_user(group: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64()),
                          "ts_s": pa.array([], pa.int64()),
                          "prev_view_value": pa.array([], pa.float64())})
        if "user_id" not in group.column_names or group.num_rows == 0:
            return empty
        df = (
            pl.from_arrow(group)
            .sort(["user_id", "ts_s", "event_id"])
            .with_columns(
                pl.when(pl.col("event_type") == right_type)
                .then(pl.col("value")).otherwise(None)
                .alias("rv"))
            .with_columns(
                pl.col("rv").forward_fill().shift(1).over("user_id")
                .round(6).alias("prev_view_value"))
            .filter((pl.col("event_type") == left_type)
                    & pl.col("prev_view_value").is_not_null())
            .select("event_id", "user_id", "ts_s", "prev_view_value")
        )
        return df.to_arrow().cast(empty.schema)

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_user, batch_format="pyarrow")
    )
