"""Distributed connected-components soak: evidence that the dedup cluster
step scales past the driver union-find gate (VERDICT r4 marked the edge
collection "mostly" scale-safe; functions/components.py is the full fix).

Synthesizes an edge list whose components have closed-form answers —
``--paths`` path components of length ``--path-len`` (worst case for
plain propagation), plus one long chain of ``--chain`` nodes (stresses
the pointer-doubling round bound), plus dense star components — writes
it as parquet, and runs ``connected_components_dist`` + the range-pruned
assignment over every node while sampling driver VmRSS.  Asserts every
label equals the component minimum from the construction.

Usage: python tools/soak_components.py [--paths 500000] [--path-len 3]
       [--chain 100000] [--cpus 32] [--workdir /dev/shm/indri55_soak_cc]
Prints one JSON line with timings, round count, RSS samples and counts.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


class RssSampler:
    def __init__(self, interval: float = 0.2):
        self.samples: list[float] = []
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, args=(interval,),
                                   daemon=True)

    def _run(self, interval: float) -> None:
        while not self._stop.is_set():
            self.samples.append(rss_mb())
            self._stop.wait(interval)

    def __enter__(self):
        self.samples.append(rss_mb())
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()
        self.samples.append(rss_mb())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=500_000)
    ap.add_argument("--path-len", type=int, default=3)
    ap.add_argument("--chain", type=int, default=100_000)
    ap.add_argument("--stars", type=int, default=2_000)
    ap.add_argument("--star-size", type=int, default=50)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--workdir", default="/dev/shm/indri55_soak_cc")
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir)

    # --- construct edges with closed-form component minima -----------------
    # layout: [paths][chain][stars], node ids contiguous per component
    t0 = time.perf_counter()
    blocks_a, blocks_b = [], []
    base = 0
    # path components: nodes base..base+L-1, edges (i, i+1)
    L = args.path_len
    starts = base + np.arange(args.paths, dtype=np.int64) * L
    for off in range(L - 1):
        blocks_a.append(starts + off)
        blocks_b.append(starts + off + 1)
    base = int(starts[-1]) + L if args.paths else base
    chain_base = base
    if args.chain:
        ch = chain_base + np.arange(args.chain - 1, dtype=np.int64)
        blocks_a.append(ch)
        blocks_b.append(ch + 1)
        base += args.chain
    star_base = base
    if args.stars:
        centers = star_base + np.arange(args.stars, dtype=np.int64) * args.star_size
        for off in range(1, args.star_size):
            blocks_a.append(centers)
            blocks_b.append(centers + off)
        base += args.stars * args.star_size
    n_nodes = base
    a = np.concatenate(blocks_a)
    b = np.concatenate(blocks_b)
    # shuffle edge order so bucket files see no construction locality
    rng = np.random.default_rng(11)
    perm = rng.permutation(len(a))
    a, b = a[perm], b[perm]
    edges_path = f"{args.workdir}/edges.parquet"
    pq.write_table(pa.table({"doc_a": pa.array(a, pa.int64()),
                             "doc_b": pa.array(b, pa.int64())}),
                   edges_path, row_group_size=1 << 20)
    gen_s = time.perf_counter() - t0

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)
    from indri_5_5_ray.functions.components import (
        assign_from_labels_dir,
        connected_components_dist,
    )

    result = {"n_nodes": n_nodes, "n_edges": len(a), "gen_s": round(gen_s, 2)}
    with RssSampler() as rss:
        t0 = time.perf_counter()
        mat = ray.data.read_parquet(edges_path).materialize()
        refs = mat.to_arrow_refs()
        final_dir, meta = connected_components_dist(
            refs, "doc_a", "doc_b", work_dir=f"{args.workdir}/cc")
        result["cc_s"] = round(time.perf_counter() - t0, 2)
        result["rounds"] = meta["rounds"]

        t0 = time.perf_counter()
        ids = ray.data.range(n_nodes).map_batches(
            lambda t: pa.table({"doc_id": t.column("id")}),
            batch_format="pyarrow")
        out = assign_from_labels_dir(final_dir, ids, "doc_id")

        # closed-form check, streamed: every node's expected rep is the
        # component base, computable from the id alone
        def check(t: pa.Table) -> pa.Table:
            import numpy as np

            ids_ = t.column("doc_id").to_numpy()
            reps = t.column("cluster_rep").to_numpy()
            exp = np.empty_like(ids_)
            m = ids_ < chain_base
            exp[m] = (ids_[m] // L) * L
            m = (ids_ >= chain_base) & (ids_ < star_base)
            exp[m] = chain_base
            m = ids_ >= star_base
            exp[m] = star_base + ((ids_[m] - star_base) // args.star_size
                                  ) * args.star_size
            return pa.table({"bad": pa.array([int((reps != exp).sum())],
                                             pa.int64())})

        bad = sum(r["bad"] for r in out.map_batches(
            check, batch_format="pyarrow").take_all())
        result["assign_s"] = round(time.perf_counter() - t0, 2)
        result["mismatches"] = int(bad)

    result["rss_start_mb"] = round(rss.samples[0], 1)
    result["rss_peak_mb"] = round(max(rss.samples), 1)
    result["rss_end_mb"] = round(rss.samples[-1], 1)
    assert bad == 0, f"{bad} label mismatches"
    print(json.dumps(result))
    ray.shutdown()
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
