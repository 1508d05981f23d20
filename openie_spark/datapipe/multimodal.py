"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature kernels run as Arrow-batched ``mapInPandas`` — the
REAL production shape (schema, batch iteration, per-worker codec
reuse, narrow partitioning). The codec itself is swapped: this
container has no image/audio libraries, so ``decode_real`` raises
NotImplementedError behind a try-import, and the default featurizer is
a deterministic fake (16-bin byte histogram) that exercises every
Spark-side moving part and stays oracle-checkable (frame counts /
sizes derive from octet lengths the SQL oracle can recompute).

    media(media_id, kind, payload binary, meta struct)
      → media_features(media_id, kind, n_bytes, feature array<double>)
      → media_frames(media_id, frame_idx, n_bytes)   [video only]
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ("image", "audio", "video")
FRAME_BYTES = 64
FRAME_STRIDE = 4        # sample every 4th frame
HIST_BINS = 16


def derive_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from documents: payload = utf-8 bytes
    of text (an opaque stand-in blob), kind cycles by doc_id, typed
    metadata derived from doc_id."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3).cast("int") + 1
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def decode_real(payload: bytes, kind: str):
    """Real codec hook — wire PIL / torchaudio / pyav here on a
    cluster image that has them."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "use the deterministic featurizer (byte histogram)")
    raise NotImplementedError("real decode path not wired")


def media_features(media: DataFrame) -> DataFrame:
    """Byte-histogram 'features' per blob: HIST_BINS-dim l1-normalized
    vector plus the raw integer bin counts (``hist``). Batched numpy
    inside mapInPandas — the identical plumbing a CLIP/wav2vec
    featurizer would use. The integer counts exist so downstream
    engines (and the DuckDB oracle) can compare exactly without
    float-rounding concerns; ``media_features_flat`` is the exploded
    canonical form."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats, hists = [], []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * HIST_BINS)
                    hists.append([0] * HIST_BINS)
                    continue
                hist = np.bincount(arr >> 4, minlength=HIST_BINS)
                hists.append([int(x) for x in hist])
                feats.append(list(np.round(hist.astype(np.float64) / hist.sum(), 6)))
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "feature": feats,
                "hist": hists,
            })
            yield out

    return media.mapInPandas(
        run,
        "media_id long, kind string, n_bytes long, "
        "feature array<double>, hist array<long>")


def media_features_flat(media: DataFrame) -> DataFrame:
    """Exploded histogram rows (media_id, kind, n_bytes, bin_idx, n) —
    scalar columns only, so any engine (and the driver's canonicalizer)
    can sort/hash the result."""
    return media_features(media).select(
        "media_id", "kind", "n_bytes",
        F.posexplode("hist").alias("bin_idx", "n"),
    )


def frame_sample(media: DataFrame) -> DataFrame:
    """Video frame sampling: fixed-size FRAME_BYTES frames, every
    FRAME_STRIDEth kept. Emits (media_id, frame_idx, n_bytes) — byte
    content stays in the engine; the oracle recomputes counts from
    octet lengths."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = (len(raw) + FRAME_BYTES - 1) // FRAME_BYTES
                for fi in range(0, n_frames, FRAME_STRIDE):
                    chunk = raw[fi * FRAME_BYTES:(fi + 1) * FRAME_BYTES]
                    rows.append((int(mid), fi, len(chunk)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "n_bytes"])

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, "media_id long, frame_idx int, n_bytes int")
