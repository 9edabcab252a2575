"""Local stand-in for the driver's correctness gate.

Runs every queries()[name](sf_dir) and compares against oracle_sql()[name]
via DuckDB: row count, sorted column names, and order-insensitive value
equality (exact for ints/strings, tolerant for floats)."""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str]) -> int:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"[ERROR] {name}: ray side raised: {e!r}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        try:
            want = normalize(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"[ERROR] {name}: oracle raised: {e!r}")
            failures += 1
            continue
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} != {len(want)}")
            ok = False
        else:
            import numpy as np

            for c in got.columns:
                if np.issubdtype(got[c].dtype, np.floating) or np.issubdtype(
                    want[c].dtype, np.floating
                ):
                    if not np.allclose(
                        got[c].astype(float), want[c].astype(float), rtol=0, atol=1e-9
                    ):
                        bad = (~np.isclose(got[c].astype(float), want[c].astype(float),
                                           rtol=0, atol=1e-9)).sum()
                        print(f"[FAIL] {name}: column {c}: {bad} mismatched floats")
                        ok = False
                else:
                    if not (got[c].astype(str).values == want[c].astype(str).values).all():
                        bad = (got[c].astype(str).values != want[c].astype(str).values).sum()
                        print(f"[FAIL] {name}: column {c}: {bad} mismatches")
                        print("  got :", got[got[c].astype(str).values != want[c].astype(str).values].head(3).to_dict("records"))
                        print("  want:", want[got[c].astype(str).values != want[c].astype(str).values].head(3).to_dict("records"))
                        ok = False
        if ok:
            print(f"[OK]   {name}: {len(got)} rows")
        else:
            failures += 1
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    raise SystemExit(main(sf, only))
