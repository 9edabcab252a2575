"""Distributed connected components (functions/components.py): label
equivalence against a reference union-find on adversarial graph shapes,
round-count bound (pointer doubling), and route equivalence through
``near_dup_clusters`` when the driver-edge gate is forced to 0."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray


def _ref_components(edges: list[tuple[int, int]], nodes: set[int]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in nodes}


def _run_dist(edges: list[tuple[int, int]], all_ids: list[int],
              n_buckets: int = 5) -> tuple[dict[int, int], dict]:
    from indri_5_5_ray.functions.components import (
        assign_from_labels_dir,
        connected_components_dist,
    )

    t = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                  "b": pa.array([e[1] for e in edges], pa.int64())})
    # split the edge list into several refs to exercise the scatter
    refs = [ray.put(t.slice(i, 3)) for i in range(0, max(1, t.num_rows), 3)]
    final_dir, meta = connected_components_dist(
        refs, "a", "b", n_buckets=n_buckets, n_ranges=4)
    ids_ds = ray.data.from_arrow(pa.table({"id": pa.array(all_ids, pa.int64())}))
    out = assign_from_labels_dir(final_dir, ids_ds, "id").to_pandas()
    return dict(zip(out["id"], out["cluster_rep"])), meta


GRAPHS = {
    "empty": ([], [0, 1, 2]),
    "one_edge": ([(5, 9)], [1, 5, 9]),
    "self_loops": ([(3, 3), (4, 7)], [3, 4, 7]),
    "clique": ([(i, j) for i in range(8) for j in range(i + 1, 8)],
               list(range(10))),
    "two_chains": ([(i, i + 1) for i in range(0, 40)]
                   + [(i, i + 1) for i in range(100, 160)],
                   list(range(0, 45)) + list(range(100, 165))),
    "star": ([(50, i) for i in range(51, 80)], list(range(45, 85))),
    "sparse_ids": ([(10**9, 10**9 + 7), (10**9 + 7, 3)],
                   [3, 10**9, 10**9 + 7, 12]),
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_dist_matches_union_find(name):
    edges, ids = GRAPHS[name]
    expected = _ref_components(edges, set(ids))
    got, _ = _run_dist(edges, ids)
    assert got == {i: expected.get(i, i) for i in ids}


def test_long_chain_rounds_logarithmic():
    """A 512-node path is the worst case for plain neighbor propagation
    (O(n) rounds); pointer doubling must finish in far fewer."""
    edges = [(i, i + 1) for i in range(512)]
    ids = list(range(513))
    got, meta = _run_dist(edges, ids, n_buckets=7)
    assert got == {i: 0 for i in ids}
    assert meta["rounds"] <= 20  # observed ~log2(512)+2; 512 for plain


def test_random_graph_matches_union_find():
    rng = np.random.default_rng(7)
    n = 400
    edges = [(int(a), int(b))
             for a, b in rng.integers(0, n, size=(300, 2)) if a != b]
    ids = list(range(n))
    expected = _ref_components(edges, set(ids))
    got, _ = _run_dist(edges, ids)
    assert got == {i: expected.get(i, i) for i in ids}


@pytest.fixture(scope="module")
def near_dup_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cc_neardup")
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "alpha beta gamma delta epsilon zeta eta theta",   # exact dup of 0
        "one two",
        "completely different words here nothing shared at all",
        "alpha beta gamma delta epsilon zeta kappa iota",  # near-dup of 1
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "lang": pa.array(["en"] * len(texts)),
                  "text": pa.array(texts)}),
        f"{d}/documents.parquet")
    return str(d)


def test_near_dup_clusters_routes_identically(near_dup_dir, monkeypatch):
    from indri_5_5_ray.functions import dedup

    base = dedup.near_dup_clusters(near_dup_dir, tau=0.3).to_pandas()
    base = base.sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(dedup, "_CC_DRIVER_EDGES", 0)
    dist = dedup.near_dup_clusters(near_dup_dir, tau=0.3).to_pandas()
    dist = dist.sort_values("doc_id").reset_index(drop=True)
    assert base.equals(dist)
    # sanity: the fixture really clusters (0,1,2,5) and leaves singletons
    reps = dict(zip(base["doc_id"], base["cluster_rep"]))
    assert reps[0] == reps[1] == reps[2] == reps[5] == 0
    assert reps[3] == 3 and reps[4] == 4
