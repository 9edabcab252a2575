"""Document priors — the ``makeprior`` + ``#prior(name)`` path.

The reference builds per-document log-prior tables offline (``makeprior/``,
``PriorFactory`` ref:src/PriorFactory.cpp) and applies them at query time via
``PriorNode`` (ref:src/InferenceNetworkBuilder.cpp:788,
``PriorListIterator`` ref:src/Repository.cpp:506-514).

Here a prior is a parquet table ``priors/<name>.parquet`` (doc_id,
log_prior) under the index directory, built by a Ray pipeline over the doc
table; ``StructuredQueryEngine`` resolves ``#prior(name)`` to a per-doc
log-prior belief (documents absent from the table get log(1/N)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def build_length_prior(index_dir: str, name: str = "length") -> str:
    """Example prior: P(d) ∝ dl (longer docs more likely a priori) — the
    LengthPrior of the reference (ref:include/indri/QuerySpec.hpp:3222).
    Built distributed over the docs table."""
    ds = ray.data.read_parquet(f"{index_dir}/docs", columns=["doc_id", "dl"])
    from ray.data.aggregate import Sum

    total = ds.aggregate(Sum("dl", alias_name="total"))["total"]

    def f(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy().astype(np.float64)
        lp = np.log(np.maximum(dl, 1.0) / float(total))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "log_prior": pa.array(lp, pa.float64())})

    out_dir = f"{index_dir}/priors"
    import os

    os.makedirs(out_dir, exist_ok=True)
    t = ds.map_batches(f, batch_format="pyarrow")
    tables = [ray.get(r) for r in t.to_arrow_refs()]
    tables = [x for x in tables if x.num_rows]
    pq.write_table(pa.concat_tables(tables).sort_by("doc_id"),
                   f"{out_dir}/{name}.parquet")
    return f"{out_dir}/{name}.parquet"


def write_prior_table(index_dir: str, name: str, doc_ids, log_priors) -> str:
    """Write an externally-supplied prior (the makeprior ingestion path)."""
    import os

    out_dir = f"{index_dir}/priors"
    os.makedirs(out_dir, exist_ok=True)
    t = pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "log_prior": pa.array(log_priors, pa.float64())})
    pq.write_table(t.sort_by("doc_id"), f"{out_dir}/{name}.parquet")
    return f"{out_dir}/{name}.parquet"


def load_prior(index_dir: str, name: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{index_dir}/priors/{name}.parquet")
    return t.column("doc_id").to_numpy(), t.column("log_prior").to_numpy()
