"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real decode libraries (PIL/ffmpeg/torchaudio) are not in this container, so
the decode kernels are STUBS behind ``use_real_decoder`` — raising
NotImplementedError when a real decoder is requested — while everything
Ray-side is real and tested: schema, actor-pool stage shape, per-batch
byte-payload handling, small-batch sizing for large binaries, and the
deterministic fake feature extraction used to validate the plumbing.

At 100 TB: payloads stay in Arrow binary columns (zero-copy through the
object store); ``batch_size`` must be sized so batch_bytes × concurrency
fits worker heaps (e.g. 8 for ~10 MB images); decode stages are actor pools
because decoders hold codecs/models loaded once in ``__init__``.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import ray.data

MULTIMODAL_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),        # typed metadata (fake but structured)
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)

N_FEATURES = 16


def synth_media_table(sf_dir: str) -> pa.Table:
    """Deterministic fake media table derived from the documents table:
    payload = zlib(text bytes) (binary, varied length), metadata from sizes."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    kinds = ["image", "audio", "video"]
    payloads, kind_col, w, h, sr = [], [], [], [], []
    for did, text in zip(ids, t.column("text").to_pylist()):
        data = zlib.compress(text.encode("utf-8"))
        payloads.append(data)
        kind_col.append(kinds[did % 3])
        w.append(64 + (did % 8) * 32)
        h.append(64 + (did % 5) * 32)
        sr.append(16000 if did % 3 == 1 else 0)
    return pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_col, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "sample_rate": pa.array(sr, pa.int32()),
        },
        schema=MULTIMODAL_SCHEMA,
    )


class MediaFeatureExtractor:
    """Actor-pool decode/feature stage.

    ``__init__`` is where a real deployment loads codecs/models ONCE per
    actor; ``__call__`` processes one Arrow batch of binary payloads.
    """

    def __init__(self, use_real_decoder: bool = False):
        if use_real_decoder:
            raise NotImplementedError(
                "real image/audio decoders are not available in this "
                "environment; the deterministic fake decoder validates the "
                "pipeline plumbing"
            )
        self.use_real_decoder = use_real_decoder

    @staticmethod
    def _features(payload: bytes) -> np.ndarray:
        """Deterministic fake 'decode': 16-bin byte histogram, normalized."""
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float64)
        total = hist.sum()
        return hist / total if total else hist

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._features(p) for p in payloads]) if payloads else np.zeros((0, N_FEATURES))
        checks = [
            int.from_bytes(hashlib.md5(p).digest()[:8], "little", signed=False) >> 1
            for p in payloads
        ]
        return pa.table(
            {
                "item_id": batch.column("item_id"),
                "kind": batch.column("kind"),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "checksum": pa.array(checks, pa.int64()),
                "features": pa.array(
                    [row.tolist() for row in feats], pa.list_(pa.float64(), N_FEATURES)
                ),
            }
        )


def media_features(sf_dir: str, concurrency: tuple[int, int] = (1, 4),
                   batch_size: int = 64) -> ray.data.Dataset:
    """The multimodal pipeline: binary table → actor-pool feature extraction.

    Small batch_size is deliberate: binary payloads are large, so batch
    bytes × concurrency is the real memory knob (not row count)."""
    tbl = synth_media_table(sf_dir)
    ds = ray.data.from_arrow(tbl)
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def media_stats(sf_dir: str) -> ray.data.Dataset:
    """(kind, n_items, total_bytes) — aggregate over the media table."""
    from ray.data.aggregate import Count, Sum

    feats = media_features(sf_dir)
    return feats.groupby("kind").aggregate(
        Count(alias_name="n_items"), Sum("n_bytes", alias_name="total_bytes")
    )
