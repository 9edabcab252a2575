"""Multimodal column plumbing: binary payloads + typed metadata.

Image and audio payloads are REAL decodable formats parsed with the
standard library — P6 netpbm images (header + raw RGB triples) and RIFF
WAV PCM16 audio (the ``wave`` module) — so the decode stage genuinely
decodes: per-channel pixel statistics for images, sample-rate/RMS/zero-
crossing statistics for audio.  External-codec formats (JPEG/MP3/MP4 —
PIL/ffmpeg are not in this container) stay behind ``use_real_decoder``
raising NotImplementedError; video payloads remain opaque and take the
byte-histogram fallback.

At 100 TB: payloads stay in Arrow binary columns (zero-copy through the
object store); ``batch_size`` must be sized so batch_bytes × concurrency
fits worker heaps (e.g. 8 for ~10 MB images); decode stages are actor pools
because decoders hold codecs/models loaded once in ``__init__``.
"""

from __future__ import annotations

import hashlib
import io
import os
import wave

import numpy as np
import pyarrow as pa
import ray.data

MULTIMODAL_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.large_binary()),
        ("n_bytes", pa.int64()),      # len(payload), column-pruned stats
        ("width", pa.int32()),        # typed metadata (fake but structured)
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)

N_FEATURES = 16


def _keystream(seed: str, n: int, tag: str = "") -> bytes:
    """Deterministic byte stream: concatenated ``md5(f"{seed}:{i}{tag}")``
    digests, truncated to ``n``.  Block inputs are plain ASCII strings so a
    SQL oracle (DuckDB ``md5(VARCHAR)``) reproduces every byte —
    ``string_agg(md5(seed || ':' || i || tag), '' ORDER BY i)`` is the hex
    of this stream."""
    blocks = []
    counter = 0
    while len(blocks) * 16 < n:
        blocks.append(hashlib.md5(f"{seed}:{counter}{tag}".encode()).digest())
        counter += 1
    return b"".join(blocks)[:n]


def make_ppm(width: int, height: int, seed: str) -> bytes:
    """Deterministic P6 netpbm image: header + raw RGB bytes derived from
    an md5 keystream (a REAL image format, stdlib-decodable)."""
    pixels = _keystream(seed, width * height * 3)
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def make_wav(sample_rate: int, n_samples: int, seed: str) -> bytes:
    """Deterministic mono PCM16 WAV (a REAL audio container, stdlib-
    decodable): samples from an md5 keystream."""
    frames = _keystream(seed, n_samples * 2, tag="a")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def make_opaque(n: int, seed: str) -> bytes:
    """Deterministic opaque payload (an md5 keystream) — stands in for
    video, whose containers have no stdlib codec."""
    return _keystream(seed, n, tag="v")


def _synth_media_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) batch → media rows.  Payload sizes are pure functions
    of doc_id so ``media_stats`` has an exact SQL oracle over ``documents``:
    image = 9 + len(str(w)) + len(str(h)) + 3wh  (P6 header + RGB),
    audio = 44 + 2n  (RIFF/WAVE PCM16 header + samples),
    video = 64 + (doc_id % 7) * 17  (opaque keystream)."""
    kinds = ["image", "audio", "video"]
    payloads, kind_col, w, h, sr = [], [], [], [], []
    ids = batch.column("doc_id").to_pylist()
    for did, text in zip(ids, batch.column("text").to_pylist()):
        kind = kinds[did % 3]
        seed = hashlib.md5(text.encode("utf-8")).hexdigest()
        if kind == "image":
            iw, ih = 8 + (did % 8) * 4, 8 + (did % 5) * 4
            payloads.append(make_ppm(iw, ih, seed))
            w.append(iw)
            h.append(ih)
            sr.append(0)
        elif kind == "audio":
            rate, n = 16000, 400 + (did % 100) * 8
            payloads.append(make_wav(rate, n, seed))
            w.append(0)
            h.append(0)
            sr.append(rate)
        else:
            payloads.append(make_opaque(64 + (did % 7) * 17, seed))
            w.append(0)
            h.append(0)
            sr.append(0)
        kind_col.append(kind)
    return pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_col, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "sample_rate": pa.array(sr, pa.int32()),
        },
        schema=MULTIMODAL_SCHEMA,
    )


def synth_media_table(sf_dir: str) -> pa.Table:
    """Deterministic media table derived from the documents table (driver-
    side convenience for tests; the pipelines stream via
    :func:`ensure_media_table`): image items carry REAL P6 netpbm payloads,
    audio items REAL WAV PCM16 payloads (both stdlib-decodable); video
    items stay opaque (md5 keystream — no stdlib codec exists) and take
    the histogram fallback."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return _synth_media_batch(t)


# bump when MULTIMODAL_SCHEMA / _synth_media_batch change shape: the cache
# key carries it, so tables written by an older code version are never reused
_MEDIA_TABLE_VERSION = "v3"


def ensure_media_table(sf_dir: str) -> str:
    """Materialize the synthetic media table as PARQUET once per corpus
    (content-keyed via :mod:`indri_5_5_ray.cachedir` — documents mtime +
    size + schema version) so the media pipelines READ a real table and
    stream — generation itself is a Ray pipeline (map_batches over the
    documents read), not a driver loop."""
    from ..cachedir import ensure_cached_dir, source_key

    src = f"{sf_dir}/documents.parquet"

    def build(tmp: str) -> None:
        from .textstats import read_spread

        ds = read_spread(src, columns=["doc_id", "text"])
        # modest batch size: payload bytes, not rows, are the memory knob
        ds.map_batches(_synth_media_batch, batch_format="pyarrow",
                       batch_size=512).write_parquet(tmp)

    return ensure_cached_dir("/tmp/indri55_media",
                             source_key(src, _MEDIA_TABLE_VERSION), build)


class MediaFeatureExtractor:
    """Actor-pool decode/feature stage.

    ``__init__`` is where a real deployment loads codecs/models ONCE per
    actor; ``__call__`` processes one Arrow batch of binary payloads.
    """

    def __init__(self, use_real_decoder: bool = False):
        if use_real_decoder:
            raise NotImplementedError(
                "external-codec decoders (JPEG/MP3/MP4 via PIL/ffmpeg) are "
                "not available in this environment; P6 netpbm and WAV PCM16 "
                "payloads ARE decoded for real with the standard library"
            )
        self.use_real_decoder = use_real_decoder

    @staticmethod
    def _decode_ppm(payload: bytes) -> np.ndarray:
        """P6 netpbm → [w, h, mean/std per RGB channel, min, max, …pad]."""
        # header: P6 <ws> width <ws> height <ws> maxval <single ws> pixels
        parts = payload.split(maxsplit=4)
        width, height = int(parts[1]), int(parts[2])
        header_len = len(payload) - width * height * 3
        px = np.frombuffer(payload, dtype=np.uint8, offset=header_len)
        px = px.reshape(height, width, 3).astype(np.float64)
        out = np.zeros(N_FEATURES, dtype=np.float64)
        out[0], out[1] = width, height
        out[2:5] = px.mean(axis=(0, 1))
        out[5:8] = px.std(axis=(0, 1))
        out[8], out[9] = float(px.min()), float(px.max())
        return out

    @staticmethod
    def _decode_wav(payload: bytes) -> np.ndarray:
        """RIFF WAV PCM16 → [rate, n, rms, mean, min, max, zero-crossings,
        …pad] via the stdlib wave module."""
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            frames = w.readframes(n)
        x = np.frombuffer(frames, dtype=np.int16).astype(np.float64)
        out = np.zeros(N_FEATURES, dtype=np.float64)
        out[0], out[1] = rate, len(x)
        if len(x):
            out[2] = float(np.sqrt(np.mean(x * x)))
            out[3] = float(x.mean())
            out[4], out[5] = float(x.min()), float(x.max())
            out[6] = float((np.signbit(x[1:]) != np.signbit(x[:-1])).sum())
        return out

    @staticmethod
    def _features(payload: bytes, kind: str = "") -> np.ndarray:
        """Dispatch on the KIND column (payload magic alone is ambiguous —
        AVI video is also a RIFF container): image → P6 decode, audio →
        WAV decode, anything else (or an unexpected payload for its kind)
        → the normalized 16-bin byte histogram."""
        if kind == "image" and payload[:2] == b"P6":
            return MediaFeatureExtractor._decode_ppm(payload)
        if kind == "audio" and payload[:4] == b"RIFF":
            return MediaFeatureExtractor._decode_wav(payload)
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float64)
        total = hist.sum()
        return hist / total if total else hist

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        feats = (np.stack([self._features(p, k)
                           for p, k in zip(payloads, kinds)])
                 if payloads else np.zeros((0, N_FEATURES)))
        # integrity checksum over the payload's lowercase-hex rendering
        # (not the raw bytes): DuckDB's md5() only accepts VARCHAR, so the
        # hex form is what the SQL oracle can hash — `md5_number_upper(hex)`
        # equals the little-endian first-8-digest-bytes below
        checks = [
            int.from_bytes(hashlib.md5(p.hex().encode()).digest()[:8],
                           "little", signed=False) >> 1
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
    """The multimodal pipeline: binary parquet table → actor-pool feature
    extraction.  Reads the written media table (columns pruned to what the
    extractor needs) so the whole pipeline streams.

    Small batch_size is deliberate: binary payloads are large, so batch
    bytes × concurrency is the real memory knob (not row count)."""
    media_dir = ensure_media_table(sf_dir)
    ds = ray.data.read_parquet(media_dir,
                               columns=["item_id", "kind", "payload"])
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def media_features_flat(sf_dir: str) -> ray.data.Dataset:
    """:func:`media_features` with the fixed-size feature vector flattened
    to ``f0..f15`` scalar columns, each floor-pinned to 6 decimals
    (``floor(x·10⁶)/10⁶`` — identical on both sides regardless of the
    engines' round-half rules).  This is the driver-checked shape: every
    value is reproducible in SQL because the synthetic payloads are md5
    keystreams over ASCII block inputs (see :func:`_keystream`) and the
    checksum hashes the payload's hex form."""

    def flatten(batch: pa.Table) -> pa.Table:
        feats = batch.column("features")
        mat = (np.asarray(feats.combine_chunks().flatten(), dtype=np.float64)
               .reshape(-1, N_FEATURES)
               if batch.num_rows else np.zeros((0, N_FEATURES)))
        mat = np.floor(mat * 1e6) / 1e6
        cols = {
            "item_id": batch.column("item_id"),
            "kind": batch.column("kind"),
            "n_bytes": batch.column("n_bytes"),
            "checksum": batch.column("checksum"),
        }
        for j in range(N_FEATURES):
            cols[f"f{j}"] = pa.array(mat[:, j], pa.float64())
        return pa.table(cols)

    return media_features(sf_dir).map_batches(flatten, batch_format="pyarrow")


def media_stats(sf_dir: str) -> ray.data.Dataset:
    """(kind, n_items, total_bytes) — aggregate over the media table.
    Column-pruned read (kind + n_bytes only; payloads never leave disk) →
    small groupby; payload sizes are doc_id-derived so the DuckDB oracle
    reproduces them from the documents view (see _synth_media_batch)."""
    from ray.data.aggregate import Count, Sum

    media_dir = ensure_media_table(sf_dir)
    ds = ray.data.read_parquet(media_dir, columns=["kind", "n_bytes"])
    return ds.groupby("kind").aggregate(
        Count(alias_name="n_items"), Sum("n_bytes", alias_name="total_bytes")
    )
