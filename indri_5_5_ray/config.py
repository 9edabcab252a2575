"""Build/query configuration.

Defaults mirror the reference's pinned constants:

* BM25 okapi k1=1.2 b=0.75 k3=7 (ref:src/TermScoreFunctionFactory.cpp:90-92)
* posting block target 4096 B (ref:src/IndexWriter.cpp:527)
* stopwords default OFF (reference stops only when a stopper section is
  configured; the 418-word fixture list ref:buildindex/stopwords is bundled)
* Krovetz stemming default ON (typical Indri configuration; toggle for the
  SQL-oracle-checkable no-stem pipelines)
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    stemmer: str | None = "krovetz"       # None|"krovetz"|"porter"|registered name
    tokenizer: str = "word"                # "word" | "char" (CJK per-char,
                                           # ref:src/TextTokenizer.l:412-421)
    stopwords: tuple[str, ...] = ()        # empty = no stopping
    store_positions: bool = True
    store_content: bool = False   # docstore: keep original content in docs/
    store_direct: bool = False    # forward index: per-doc (term, tf, positions)
                                  # lists (TermList analogue,
                                  # ref:include/indri/TermList.hpp:105-131)
    # field (tag) indexing — the reference's <field> specs
    # (ref:src/Repository.cpp:114-131): names to index, plus which of them
    # carry numeric / date values (ref:src/NumericFieldAnnotator.cpp,
    # ref:src/DateFieldAnnotator.cpp)
    fields: tuple[str, ...] = ()
    numeric_fields: tuple[str, ...] = ()
    date_fields: tuple[str, ...] = ()
    # offset-annotation side table (the reference's OffsetAnnotationAnnotator,
    # ref:src/OffsetAnnotationAnnotator.cpp, applied at
    # ref:src/IndexEnvironment.cpp:88-129): parquet with columns
    # (docno, field, begin, end) in TOKEN positions, joined broadcast-style
    # at ingest; annotated fields must also be listed in ``fields``
    offset_annotations: str | None = None
    dedup_key: str | None = "docno"        # None | "docno" | "sha256"
    target_block_bytes: int = 4096         # ref:src/IndexWriter.cpp:527
    n_buckets: int = 32                    # term-hash partition dirs for pruning
    salt_docs_per_group: int = 1 << 22     # split posting lists by doc range
    max_chunk_docs: int = 4096             # build work-item granularity
    # BM25 okapi defaults (ref:src/TermScoreFunctionFactory.cpp:90-92)
    k1: float = 1.2
    b: float = 0.75
    k3: float = 7.0

    def to_dict(self) -> dict:
        return {
            "stemmer": self.stemmer,
            "tokenizer": self.tokenizer,
            "stopwords": list(self.stopwords),
            "store_positions": self.store_positions,
            "store_content": self.store_content,
            "store_direct": self.store_direct,
            "fields": list(self.fields),
            "numeric_fields": list(self.numeric_fields),
            "date_fields": list(self.date_fields),
            "offset_annotations": self.offset_annotations,
            "dedup_key": self.dedup_key,
            "target_block_bytes": self.target_block_bytes,
            "n_buckets": self.n_buckets,
            "salt_docs_per_group": self.salt_docs_per_group,
            "max_chunk_docs": self.max_chunk_docs,
            "k1": self.k1,
            "b": self.b,
            "k3": self.k3,
        }

    @staticmethod
    def from_dict(d: dict) -> "IndexConfig":
        d = dict(d)
        d["stopwords"] = tuple(d.get("stopwords", ()))
        for k in ("fields", "numeric_fields", "date_fields"):
            d[k] = tuple(d.get(k, ()))
        return IndexConfig(**d)
