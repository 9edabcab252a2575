"""PII detection / redaction over the ``documents`` table.

The standard curation stage the big open pipelines run before training
(Dolma's and BigScience ROOTS' PII taggers): find emails, phone numbers
and IP addresses, count them per document, and rewrite the text with
typed placeholder tokens.  The reference engine predates this concern —
there is no analogue to cite — so the operator family follows the public
pipeline shape instead: rule-based regex taggers, vectorized per batch.

Scale shape: both operators are MAP-ONLY (one vectorized polars regex
pass per batch, column-pruned read, no shuffle) — the cheapest possible
plan; redaction rewrites the text column in place of the read batch and
never materializes the corpus anywhere.

The patterns are deliberately written in the common subset of the rust
regex dialect (polars) and RE2 (DuckDB) — no backrefs, no lookaround —
so the exact SQL oracle runs the SAME expressions via
``regexp_extract_all`` / ``regexp_replace(..., 'g')`` and the driver
hash-checks redacted text byte-for-byte (dialect agreement is also
pinned by pytest on adversarial edge strings).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import ray.data

from .textstats import _docs

# order matters for redaction (emails contain no phone/IP substrings the
# later passes could double-redact, but keep the canonical order anyway)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (regex, placeholder)
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    "ip": (r"\b(?:\d{1,3}\.)(?:\d{1,3}\.)(?:\d{1,3}\.)\d{1,3}\b", "[IP]"),
}


def pii_stats(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_emails, n_phones, n_ips, n_pii) per-document PII match
    counts — map-only, one compiled-regex count pass per pattern."""

    def f(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        out = df.select(
            "doc_id",
            *[pl.col("text").str.count_matches(rx).cast(pl.Int64)
              .alias(f"n_{name}s")
              for name, (rx, _) in PII_PATTERNS.items()],
        )
        return out.with_columns(
            sum(pl.col(f"n_{name}s") for name in PII_PATTERNS)
            .alias("n_pii")).to_arrow()

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def redact_pii(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, text) with every PII match replaced by its typed
    placeholder (``[EMAIL]``/``[PHONE]``/``[IP]``), applied in
    PII_PATTERNS order — map-only text rewrite, nothing shuffles."""

    def f(batch: pa.Table) -> pa.Table:
        expr = pl.col("text")
        for _, (rx, token) in PII_PATTERNS.items():
            expr = expr.str.replace_all(rx, token)
        return (pl.from_arrow(batch)
                .select("doc_id", expr.alias("text")).to_arrow())

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")
