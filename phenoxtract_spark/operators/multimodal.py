"""Multimodal column plumbing (SURVEY §7.2 step 9).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct.  The Spark-side machinery — schema, partition-preserving
``mapInPandas`` over Arrow batches, UDF signatures, batch shapes — is real
and tested; the actual codec calls are STUBBED (decode libs are not in this
container) behind ``DecoderStub``: a clearly-marked deterministic fake that
produces shape-correct features, or ``NotImplementedError`` in strict mode.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


class DecoderStub:
    """STUB for image/audio decode: the real implementation would call
    PIL/ffmpeg/torchaudio here.  ``fake=True`` yields a deterministic
    md5-derived feature vector (shape-correct, reproducible); ``fake=False``
    raises NotImplementedError, documenting the integration point."""

    def __init__(self, fake: bool = True, dim: int = FEATURE_DIM):
        self.fake, self.dim = fake, dim

    def features(self, payload: bytes) -> list[float]:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires PIL/ffmpeg; not available in this environment"
            )
        digest = hashlib.md5(payload or b"").digest()
        return [digest[i] / 255.0 for i in range(self.dim)]


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from the documents fixture: payload = utf-8 bytes
    of the text (a stand-in for real image bytes), meta filled from what a
    container-level probe would report."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, decoder: DecoderStub | None = None,
                     batch_hint: int = 1024) -> DataFrame:
    """Feature extraction over Arrow batches via ``mapInPandas`` —
    partition-preserving (no shuffle), constant memory per batch.  At 100 TB
    this is the pattern: payloads never leave their partition; only the
    fixed-width features flow downstream."""
    decoder = decoder or DecoderStub()
    # capture plain values, not the DecoderStub instance: a closure pickles
    # by value, so workers never need to import phenoxtract_spark
    fake, dim = decoder.fake, decoder.dim

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def feats(payload):
            if not fake:
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg; not available here"
                )
            digest = hashlib.md5(payload or b"").digest()
            return [digest[i] / 255.0 for i in range(dim)]

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "feature": payloads.map(feats),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: per media row, the timestamps (ms) a real
    decoder would extract — demonstrates the explode-to-frames shape without
    the codec.  Returns (media_id, frame_ts_ms)."""
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  fake: bool = True) -> DataFrame:
    """Image resize over Arrow batches via ``mapInPandas`` — the same
    partition-preserving shape as :func:`extract_features` (payloads never
    cross a partition boundary; output size is width×height×3 regardless of
    input size, so downstream stages see fixed-cost rows).

    The codec is STUBBED like everything in this module: ``fake=True``
    emits a deterministic pseudo-bitmap (md5 keystream over the payload,
    exactly ``width*height*3`` bytes — shape-correct and reproducible so
    the plumbing is value-testable); ``fake=False`` raises
    ``NotImplementedError`` where PIL's ``Image.resize`` would run.
    Returns (media_id, width, height, n_bytes, payload).
    """
    w, h = int(width), int(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        target = w * h * 3

        def resize(payload):
            if not fake:
                raise NotImplementedError(
                    "image resize requires PIL; not available in this environment"
                )
            out = bytearray()
            counter = 0
            seed = hashlib.md5(payload or b"").digest()
            while len(out) < target:
                out.extend(hashlib.md5(seed + counter.to_bytes(4, "big")).digest())
                counter += 1
            return bytes(out[:target])

        for pdf in batches:
            resized = pdf["payload"].map(resize)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w,
                    "height": h,
                    "n_bytes": resized.map(len),
                    "payload": resized,
                }
            )

    out = media.mapInPandas(run, schema=RESIZED_SCHEMA)
    return out.withColumn("width", F.col("width").cast("int")).withColumn(
        "height", F.col("height").cast("int")
    )


AUDIO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_frame_energy(media: DataFrame, frame_samples: int = 256,
                       fake: bool = True) -> DataFrame:
    """Audio framing + per-frame RMS energy over Arrow batches via
    ``mapInPandas`` — the audio member of the multimodal family
    (image=resize, video=frame_sample, audio=this).

    ``fake=True`` interprets the payload as raw little-endian PCM16 (the
    fixture payloads are arbitrary bytes, which IS valid PCM) — the
    framing and energy math is real vectorized numpy, not a stub;
    ``fake=False`` marks where a compressed-container decode
    (ffmpeg/torchaudio) would run and raises ``NotImplementedError``.

    Partition-preserving like every operator here: payloads never cross a
    partition boundary; only (media_id, frame_idx, n_samples, rms) rows
    flow downstream — bounded width whatever the audio length.
    Returns one row per frame; rms rounded to 4dp for reproducibility.
    """
    fs = int(frame_samples)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, ns, rms = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "compressed audio decode requires ffmpeg/torchaudio; "
                        "not available in this environment"
                    )
                b = bytes(payload or b"")
                if len(b) % 2:
                    b = b[:-1]
                x = np.frombuffer(b, dtype="<i2").astype(np.float64)
                for i in range(0, x.size, fs):
                    fr = x[i : i + fs]
                    ids.append(mid)
                    idxs.append(i // fs)
                    ns.append(int(fr.size))
                    rms.append(round(float(np.sqrt(np.mean(fr * fr))), 4))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "n_samples": ns, "rms": rms}
            )

    return media.mapInPandas(run, schema=AUDIO_FRAMES_SCHEMA)


PATCH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("patch_row", T.LongType()),
        T.StructField("patch_col", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("patch_md5", T.StringType()),
    ]
)


def extract_patches(media: DataFrame, width: int = 32, height: int = 32,
                    patch: int = 8, fake: bool = True) -> DataFrame:
    """ViT-style patch grid over Arrow batches: decode to a width×height×3
    bitmap (md5-keystream fake, same scheme as :func:`resize_images`;
    ``fake=False`` raises where a real codec would run), slice into
    ``patch``×``patch`` tiles row-major, one output row per tile with its
    content digest.  (height//patch)×(width//patch) fixed-cost rows per
    image — the tokenization step a multimodal training pipeline runs
    between decode and embedding.  Partition-preserving ``mapInPandas``:
    payloads never cross a partition boundary, and output size is
    independent of input size."""
    w, h, p = int(width), int(height), int(patch)
    if w % p or h % p:
        raise ValueError("patch must divide width and height")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        target = w * h * 3

        def bitmap(payload):
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL; not available in this environment"
                )
            out = bytearray()
            counter = 0
            seed = hashlib.md5(payload or b"").digest()
            while len(out) < target:
                out.extend(hashlib.md5(seed + counter.to_bytes(4, "big")).digest())
                counter += 1
            return bytes(out[:target])

        for pdf in batches:
            ids, prs, pcs, nbs, digs = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                bm = bitmap(payload)
                for pr in range(h // p):
                    for pc in range(w // p):
                        tile = b"".join(
                            bm[
                                ((pr * p + r) * w + pc * p) * 3
                                : ((pr * p + r) * w + pc * p + p) * 3
                            ]
                            for r in range(p)
                        )
                        ids.append(mid)
                        prs.append(pr)
                        pcs.append(pc)
                        nbs.append(len(tile))
                        digs.append(hashlib.md5(tile).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "patch_row": prs,
                    "patch_col": pcs,
                    "n_bytes": nbs,
                    "patch_md5": digs,
                }
            )

    return media.mapInPandas(run, schema=PATCH_SCHEMA)
