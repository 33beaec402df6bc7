"""Multimodal column plumbing (SURVEY §7.2 step 9).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct.  The Spark-side machinery — schema, partition-preserving
``mapInPandas`` over Arrow batches, UDF signatures, batch shapes — is real
and tested.  COMPRESSED codec calls whose decode libs are not in this
container (JPEG/MP3/H.264) are STUBBED behind ``DecoderStub``: a
clearly-marked deterministic fake that produces shape-correct features, or
``NotImplementedError`` in strict mode.  Every format expressible with
the stdlib, however, has a REAL codec in this module, one per modality:
image = 24-bit BMP + binary PPM + 8-bit PNG (deflate + the full 5-filter
unfilter matrix via stdlib ``zlib``, round 12;
``multimodal_image_roundtrip`` / ``multimodal_png_roundtrip``: encode →
decode → NN-resize), audio = RIFF/WAVE PCM16 (``multimodal_wav_energy``:
encode → chunk-walk parse → framed Σx² energy), video = YUV4MPEG2 C444
(``multimodal_y4m_luma``: encode → FRAME-walk parse → sampled luma sums).
All run genuinely unstubbed and are oracle-checked bit-exact against
arithmetic DuckDB twins of the md5 keystream that seeds the
pixels/samples/planes.
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


# ---------------------------------------------------------------------------
# real pure-stdlib image codecs: uncompressed 24-bit BMP + binary PPM
# (P6) from round 4, and 8-bit truecolor PNG from round 12 (deflate via
# stdlib zlib + the per-scanline filter matrix — a genuinely COMPRESSED
# format decoded for real).  All formats are fully public (Windows
# BITMAPINFOHEADER layout; netpbm; RFC 2083) — so the image path runs
# end-to-end UNSTUBBED in this container: encode → decode →
# nearest-neighbor resize, with a DuckDB oracle recomputing the result
# arithmetically from the md5 keystream that seeds the pixels.  Codecs
# with no stdlib decode path (JPEG/MP3/H.264) remain honestly stubbed
# above.
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode row-major top-down RGB bytes as an uncompressed 24-bit BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB, bottom-up rows, BGR byte
    order, rows zero-padded to 4-byte boundaries)."""
    import struct

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    row_out = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_out - width * 3)
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        row = rgb[r * width * 3 : (r + 1) * width * 3]
        # RGB -> BGR per pixel
        bgr = bytearray(row)
        bgr[0::3], bgr[2::3] = row[2::3], row[0::3]
        body += bgr + pad
    data_off = 14 + 40
    file_size = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an uncompressed 24-bit BMP to (width, height, row-major
    top-down RGB bytes).  Handles bottom-up (positive height) and top-down
    (negative height) layouts and row padding; rejects anything that is not
    24bpp BI_RGB (the scope of this stdlib codec)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only 24bpp BI_RGB supported by the stdlib codec")
    top_down = height < 0
    height = abs(height)
    row_in = (width * 3 + 3) & ~3
    rgb = bytearray(width * height * 3)
    for out_r in range(height):
        src_r = out_r if top_down else height - 1 - out_r
        start = data_off + src_r * row_in
        row = payload[start : start + width * 3]
        if len(row) < width * 3:
            raise ValueError("truncated BMP pixel data")
        # BGR -> RGB
        dst = memoryview(rgb)[out_r * width * 3 : (out_r + 1) * width * 3]
        dst[0::3], dst[1::3], dst[2::3] = row[2::3], row[1::3], row[0::3]
    return width, height, bytes(rgb)


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Decode binary PPM (P6, maxval 255) to (width, height, RGB bytes).
    Header tokens may be separated by arbitrary whitespace and ``#``
    comments per the netpbm spec."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    pos += 1  # single whitespace after maxval
    rgb = payload[pos : pos + width * height * 3]
    if len(rgb) < width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, bytes(rgb)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    # PNG spec section 9.4: a=left, b=up, c=upper-left
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, rgb: bytes,
               row_filter: int | str = 0) -> bytes:
    """REAL PNG encode via stdlib ``zlib`` (converting the last stubbed
    image codec to a genuine one — deflate + per-scanline filtering is
    the whole format for 8-bit truecolor): signature, IHDR (bit depth 8,
    color type 2 RGB, no interlace), one zlib-deflated IDAT of filtered
    scanlines, IEND — every chunk CRC32'd.  ``row_filter`` is a fixed
    filter id 0-4 applied to every scanline, or ``"cycle"`` to rotate
    0→4 per row so ONE file exercises the decoder's whole unfilter
    matrix (None/Sub/Up/Average/Paeth).  Deterministic bytes: fixed
    deflate level, no ancillary chunks, no timestamps."""
    import struct
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    bpp = 3
    stride = width * bpp
    prior = bytes(stride)
    raw = bytearray()
    for r in range(height):
        row = rgb[r * stride:(r + 1) * stride]
        ft = (r % 5) if row_filter == "cycle" else int(row_filter)
        if not 0 <= ft <= 4:
            raise ValueError(f"PNG filter type {ft} out of range 0-4")
        raw.append(ft)
        if ft == 0:
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[x] - (row[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((row[x] - prior[x]) & 0xFF for x in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (row[x] - ((row[x - bpp] if x >= bpp else 0) + prior[x]) // 2)
                & 0xFF
                for x in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (row[x] - _paeth(row[x - bpp] if x >= bpp else 0, prior[x],
                                 prior[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(stride)
            )
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Strict PNG decode via stdlib ``zlib``: chunk walk with CRC32
    verification on EVERY chunk, IHDR first, IDAT segments concatenated
    then inflated once, and the full 5-filter unfilter matrix
    (None/Sub/Up/Average/Paeth) applied per scanline.  Scope: bit depth
    8, color types 2 (RGB) and 6 (RGBA — alpha dropped, matching the
    ``decode_image`` RGB contract), no interlace (Adam7 rejected
    loudly).  Truncation, bad CRC, trailing garbage, wrong inflated
    size, and out-of-range filter ids all raise — never a silent
    clamp."""
    import struct
    import zlib

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    off, n = 8, len(payload)
    ihdr = None
    idat = bytearray()
    ended = False
    while off < n:
        if off + 8 > n:
            raise ValueError(f"truncated chunk header at offset {off}")
        clen, ctype = struct.unpack_from(">I4s", payload, off)
        data_start = off + 8
        crc_end = data_start + clen + 4
        if crc_end > n:
            raise ValueError(f"truncated {ctype.decode('latin-1')} chunk at offset {off}")
        data = payload[data_start:data_start + clen]
        crc = struct.unpack_from(">I", payload, data_start + clen)[0]
        if crc != zlib.crc32(ctype + data):
            raise ValueError(f"CRC mismatch in {ctype.decode('latin-1')} chunk")
        if ctype == b"IHDR":
            if ihdr is not None:
                raise ValueError("duplicate IHDR chunk")
            ihdr = data
        elif ihdr is None:
            raise ValueError(f"{ctype.decode('latin-1')} chunk before IHDR")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            ended = True
            off = crc_end
            break
        # ancillary chunks (lowercase first letter) are skipped; other
        # unknown CRITICAL chunks would change the pixel meaning
        elif not ctype[0] & 0x20:
            raise ValueError(f"unsupported critical chunk {ctype.decode('latin-1')}")
        off = crc_end
    if not ended:
        raise ValueError("missing IEND chunk")
    if off != n:
        raise ValueError(f"{n - off} trailing bytes after IEND")
    if ihdr is None or len(ihdr) != 13:
        raise ValueError(
            f"IHDR must be exactly 13 bytes, got "
            f"{'none' if ihdr is None else len(ihdr)}"
        )
    if not idat:
        raise ValueError("no IDAT chunk")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color not in (2, 6):
        raise ValueError(
            f"unsupported PNG: bit depth {depth}, color type {color} "
            f"(stdlib codec scope is 8-bit RGB/RGBA)"
        )
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlaced PNG not supported")
    bpp = 3 if color == 2 else 4
    stride = width * bpp
    # decompressobj instead of zlib.decompress: the one-shot form
    # silently ignores bytes after the deflate end-of-stream, so a
    # corrupt (or smuggled-payload) IDAT tail would pass the "strict"
    # decoder whenever the inflated prefix had the right size
    infl = zlib.decompressobj()
    try:
        raw = infl.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT deflate stream: {exc}") from exc
    if not infl.eof:
        raise ValueError("IDAT deflate stream truncated")
    if infl.unused_data:
        raise ValueError(
            f"{len(infl.unused_data)} trailing bytes after the IDAT "
            f"deflate stream"
        )
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"inflated IDAT size {len(raw)} != expected {(stride + 1) * height}"
        )
    prior = bytearray(stride)
    out = bytearray(width * height * 3)
    for r in range(height):
        base = r * (stride + 1)
        ft = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if ft == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + (left + prior[x]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                ul = prior[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, prior[x], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"PNG filter type {ft} out of range on row {r}")
        dst = r * width * 3
        if bpp == 3:
            out[dst:dst + stride] = line
        else:  # RGBA: drop alpha
            for px in range(width):
                out[dst + px * 3:dst + px * 3 + 3] = line[px * 4:px * 4 + 3]
        prior = line
    return width, height, bytes(out)


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Dispatch on magic bytes: BMP (``BM``), PPM (``P6``), or PNG."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    raise ValueError("unsupported image format for the stdlib codec")


def nn_resize(width: int, height: int, rgb: bytes,
              out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of row-major RGB bytes: output pixel (r, c)
    samples source pixel (r*height//out_h, c*width//out_w) — integer floor
    mapping, reproducible in plain SQL."""
    import numpy as np

    a = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    ri = (np.arange(out_h) * height) // out_h
    ci = (np.arange(out_w) * width) // out_w
    return a[np.ix_(ri, ci)].tobytes()


def md5_keystream(seed_hex: str, n: int) -> bytes:
    """Deterministic byte stream: block i = md5(seed_hex + '-' + str(i))
    digest.  Seeded by a HEX STRING so DuckDB (whose md5() is
    VARCHAR-only) can recompute any byte with string functions."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"{seed_hex}-{i}".encode()).digest()
        i += 1
    return bytes(out[:n])


def _synthetic_image_media(df: DataFrame, id_col: str, text_col: str,
                           width: int, height: int, encode_fn) -> DataFrame:
    """Shared builder for the real-codec media tables: pixel bytes come
    from the md5 keystream seeded by md5(text), then pass through the
    given REAL encoder, so everything downstream exercises the true
    decode path.  Partition-preserving ``mapInPandas``; one place for
    the schema and the keystream contract so the BMP/PNG twins cannot
    drift (the r12 review's dedup finding)."""
    w, h = int(width), int(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_fn(
                    w, h,
                    md5_keystream(
                        hashlib.md5(t.encode("utf-8")).hexdigest(), w * h * 3
                    ),
                )
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads,
                                "width": w, "height": h})

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])
    # the encoder chain is CPU-dense per ROW (md5 keystream + real
    # codec), so a small input packed into 1-2 scan splits serializes
    # it on one task — fan out to cluster parallelism (no-op at scale,
    # where inputs arrive with >= parallelism splits; guide §2.6)
    from ..session import fan_out

    base = fan_out(
        df.select(F.col(id_col).cast("long").alias(id_col), text_col)
    )
    out = base.mapInPandas(run, schema=schema)
    return out.withColumn("width", F.col("width").cast("int")).withColumn(
        "height", F.col("height").cast("int")
    )


def synthetic_bmp_media(df: DataFrame, id_col: str, text_col: str,
                        width: int = 24, height: int = 16) -> DataFrame:
    """Media table of REAL BMP files over the shared keystream builder."""
    return _synthetic_image_media(df, id_col, text_col, width, height,
                                  encode_bmp)


def synthetic_png_media(df: DataFrame, id_col: str, text_col: str,
                        width: int = 24, height: int = 16,
                        row_filter: int | str = "cycle") -> DataFrame:
    """PNG twin of ``synthetic_bmp_media``: the same keystream pixels
    pass through the REAL stdlib-zlib PNG encoder.  The default
    ``row_filter="cycle"`` rotates filters 0→4 across scanlines, so
    every registry run decodes all five PNG filter types."""

    def enc(w, h, rgb):
        return encode_png(w, h, rgb, row_filter=row_filter)

    return _synthetic_image_media(df, id_col, text_col, width, height, enc)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_w", T.LongType()),
        T.StructField("src_h", T.LongType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def image_roundtrip_stats(media: DataFrame, out_w: int = 8,
                          out_h: int = 8) -> DataFrame:
    """UNSTUBBED image pipeline: real decode (BMP/PPM stdlib codec) →
    real nearest-neighbor resize → exact per-channel integer pixel sums.
    Integer sums (not rounded means) so the oracle compare is bit-exact
    under the integer-exact harness.  Partition-preserving
    ``mapInPandas``: payloads never cross a partition boundary and only
    8 small columns flow downstream regardless of image size."""
    ow, oh = int(out_w), int(out_h)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in ("media_id", "src_w", "src_h", "out_w",
                                    "out_h", "sum_r", "sum_g", "sum_b")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rgb = decode_image(bytes(payload))
                small = np.frombuffer(
                    nn_resize(w, h, rgb, ow, oh), dtype=np.uint8
                ).reshape(oh, ow, 3).astype(np.int64)
                sums = small.sum(axis=(0, 1))
                rows["media_id"].append(mid)
                rows["src_w"].append(w)
                rows["src_h"].append(h)
                rows["out_w"].append(ow)
                rows["out_h"].append(oh)
                rows["sum_r"].append(int(sums[0]))
                rows["sum_g"].append(int(sums[1]))
                rows["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# real pure-stdlib audio codec (round 4): WAV (RIFF) PCM16.  Same principle
# as the BMP path above — the container format is fully public and simple,
# so the audio modality runs genuinely unstubbed end-to-end: encode → parse
# → frame → exact integer energy, with an arithmetic DuckDB oracle.
# ---------------------------------------------------------------------------


def encode_wav(pcm: bytes, sample_rate: int = 16000, channels: int = 1) -> bytes:
    """Encode little-endian PCM16 bytes as a canonical RIFF/WAVE file
    (fmt chunk type 1 = uncompressed PCM, 16 bits/sample)."""
    import struct

    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a RIFF/WAVE file to (sample_rate, channels, PCM16 bytes).
    Walks the chunk list (so extra chunks like LIST/INFO are skipped);
    rejects non-PCM16 encodings (the scope of this stdlib codec)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, fmt_code, data = 12, None, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > len(payload):
            # fail loudly like decode_bmp/decode_y4m: a clamped slice would
            # silently return fewer PCM samples than the chunk declares
            raise ValueError(
                f"truncated chunk {cid!r}: declares {size} bytes, "
                f"{len(payload) - pos - 8} remain"
            )
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if fmt_code != 1 or bits != 16:
        raise ValueError("only uncompressed PCM16 supported by the stdlib codec")
    return rate, channels, data


WAV_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sumsq", T.LongType()),
    ]
)


def synthetic_wav_media(df: DataFrame, id_col: str, text_col: str,
                        n_samples: int = 512,
                        sample_rate: int = 16000) -> DataFrame:
    """Media table whose payloads are REAL WAV files: PCM16 samples from
    the md5 keystream seeded by md5(text), through the actual RIFF
    encoder.  Partition-preserving ``mapInPandas``."""
    ns, sr = int(n_samples), int(sample_rate)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav(
                    md5_keystream(
                        hashlib.md5(t.encode("utf-8")).hexdigest(), ns * 2
                    ),
                    sample_rate=sr,
                )
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    # the encoder chain is CPU-dense per ROW (md5 keystream + real
    # codec), so a small input packed into 1-2 scan splits serializes
    # it on one task — fan out to cluster parallelism (no-op at scale,
    # where inputs arrive with >= parallelism splits; guide §2.6)
    from ..session import fan_out

    base = fan_out(
        df.select(F.col(id_col).cast("long").alias(id_col), text_col)
    )
    return base.mapInPandas(run, schema=schema)


def wav_frame_energy(media: DataFrame, frame_samples: int = 256) -> DataFrame:
    """UNSTUBBED audio pipeline: real RIFF parse → PCM16 framing → exact
    per-frame integer energy Σx² (bounded by frame·32768² ≪ 2^53, so the
    value is integer-exact in both engines — no float rounding to align).
    One row per frame; partition-preserving ``mapInPandas``."""
    fs = int(frame_samples)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in ("media_id", "sample_rate", "frame_idx",
                                    "n_samples", "sumsq")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, _ch, pcm = decode_wav(bytes(payload))
                x = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                for i in range(0, x.size, fs):
                    fr = x[i : i + fs]
                    rows["media_id"].append(mid)
                    rows["sample_rate"].append(rate)
                    rows["frame_idx"].append(i // fs)
                    rows["n_samples"].append(int(fr.size))
                    rows["sumsq"].append(int((fr * fr).sum()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=WAV_ENERGY_SCHEMA)


# ---------------------------------------------------------------------------
# real pure-stdlib video container (round 4): YUV4MPEG2 (.y4m), C444.
# Completes the modality set — image (BMP/PPM), audio (WAV), video (Y4M)
# all run genuinely unstubbed on their uncompressed public containers;
# only COMPRESSED codecs remain stubbed.
# ---------------------------------------------------------------------------


def encode_y4m(width: int, height: int, frames: list[bytes],
               fps: tuple[int, int] = (25, 1)) -> bytes:
    """Encode planar C444 YUV frames (each exactly 3·width·height bytes:
    Y then U then V plane) as a YUV4MPEG2 stream."""
    for fr in frames:
        if len(fr) != 3 * width * height:
            raise ValueError("each C444 frame must be 3*width*height bytes")
    head = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A0:0 C444\n"
    return head.encode() + b"".join(b"FRAME\n" + fr for fr in frames)


def decode_y4m(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Parse a YUV4MPEG2 stream to (width, height, [C444 frames]).  Reads
    the tagged stream header (W/H/C required for sizing), then walks
    FRAME markers (frame-level params after FRAME are allowed and
    skipped).  Rejects non-C444 colorspaces (the scope of this stdlib
    codec — subsampled layouts change plane sizes)."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    width = height = None
    colorspace = "C420jpeg"  # y4m default when the C tag is absent
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok.decode()
    if width is None or height is None:
        raise ValueError("missing W/H in stream header")
    if colorspace != "C444":
        raise ValueError("only C444 supported by the stdlib codec")
    frame_bytes = 3 * width * height
    frames, pos = [], nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt stream: expected FRAME marker")
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or len(payload) < fnl + 1 + frame_bytes:
            raise ValueError("truncated frame")
        frames.append(payload[fnl + 1 : fnl + 1 + frame_bytes])
        pos = fnl + 1 + frame_bytes
    return width, height, frames


Y4M_LUMA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("luma_sum", T.LongType()),
    ]
)


def synthetic_y4m_media(df: DataFrame, id_col: str, text_col: str,
                        width: int = 16, height: int = 8,
                        n_frames: int = 6) -> DataFrame:
    """Media table whose payloads are REAL .y4m streams: C444 planes from
    the md5 keystream seeded by md5(text), through the actual encoder."""
    w, h, nf = int(width), int(height), int(n_frames)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fb = 3 * w * h
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                ks = md5_keystream(
                    hashlib.md5(t.encode("utf-8")).hexdigest(), nf * fb
                )
                payloads.append(
                    encode_y4m(w, h, [ks[i * fb : (i + 1) * fb] for i in range(nf)])
                )
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    # the encoder chain is CPU-dense per ROW (md5 keystream + real
    # codec), so a small input packed into 1-2 scan splits serializes
    # it on one task — fan out to cluster parallelism (no-op at scale,
    # where inputs arrive with >= parallelism splits; guide §2.6)
    from ..session import fan_out

    base = fan_out(
        df.select(F.col(id_col).cast("long").alias(id_col), text_col)
    )
    return base.mapInPandas(run, schema=schema)


def synthetic_y4m_shot_media(df: DataFrame, id_col: str, text_col: str,
                             width: int = 16, height: int = 8,
                             n_frames: int = 12, shot_len: int = 3) -> DataFrame:
    """REAL .y4m streams with PLANTED shot structure: frame ``f``'s luma
    plane is the CONSTANT byte ``b(shot) = first md5 byte of
    '<seed>-shot-<f // shot_len>'`` (seed = md5(text)), chroma planes a
    constant 128 — so within a shot the frame-to-frame luma delta is
    exactly 0 and across a cut it is ``|b(s+1) - b(s)| · width · height``,
    the ground truth :func:`shot_boundaries` detects.  Same real-encoder
    ``mapInPandas`` contract as :func:`synthetic_y4m_media`."""
    w, h, nf, sl = int(width), int(height), int(n_frames), int(shot_len)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        plane = w * h
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                seed = hashlib.md5(t.encode("utf-8")).hexdigest()
                frames = []
                for f in range(nf):
                    b = int(
                        hashlib.md5(f"{seed}-shot-{f // sl}".encode()).hexdigest()[:2],
                        16,
                    )
                    frames.append(bytes([b]) * plane + bytes([128]) * (2 * plane))
                payloads.append(encode_y4m(w, h, frames))
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    # the encoder chain is CPU-dense per ROW (md5 keystream + real
    # codec), so a small input packed into 1-2 scan splits serializes
    # it on one task — fan out to cluster parallelism (no-op at scale,
    # where inputs arrive with >= parallelism splits; guide §2.6)
    from ..session import fan_out

    base = fan_out(
        df.select(F.col(id_col).cast("long").alias(id_col), text_col)
    )
    return base.mapInPandas(run, schema=schema)


def shot_boundaries(luma: DataFrame, threshold_per_pixel: int = 8) -> DataFrame:
    """Shot-boundary detection over a per-frame luma relation (the
    output of :func:`y4m_luma_stats` at stride 1): a CUT is a
    frame-to-frame luma-sum delta exceeding ``threshold_per_pixel``
    per pixel — the classic integer luma-difference detector — and
    consecutive frames between cuts group into shots via a running sum
    of cut flags.  Returns (media_id, shot_id, start_frame, end_frame,
    n_frames), one row per detected shot.

    Plan: the codec pass is partition-local Python; everything here is
    two window passes + one groupBy, all partitioned by media_id — the
    same gaps-and-islands shape as :func:`vad_segments`, so the 100 TB
    posture is per-media parallelism with no payload shuffle."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    thr = F.col("width") * F.col("height") * F.lit(int(threshold_per_pixel))
    prev = F.lag("luma_sum").over(w)
    flagged = luma.withColumn(
        "_cut",
        F.when(prev.isNotNull() & (F.abs(F.col("luma_sum") - prev) > thr),
               F.lit(1)).otherwise(F.lit(0)),
    )
    shots = flagged.withColumn(
        "shot_id",
        F.sum("_cut").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"),
    )
    return (
        shots.groupBy("media_id", "shot_id")
        .agg(
            F.min("frame_idx").cast("bigint").alias("start_frame"),
            F.max("frame_idx").cast("bigint").alias("end_frame"),
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        )
    )


def y4m_luma_stats(media: DataFrame, stride: int = 2) -> DataFrame:
    """UNSTUBBED video pipeline: real YUV4MPEG2 parse → frame sampling
    every ``stride``-th frame (the frame_sample_plan semantics, now on
    real frames) → exact integer luma-plane sums.  One row per sampled
    frame; partition-preserving ``mapInPandas``."""
    st = int(stride)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "width", "height",
                                    "frame_idx", "luma_sum")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = decode_y4m(bytes(payload))
                for idx in range(0, len(frames), st):
                    rows["media_id"].append(mid)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["frame_idx"].append(idx)
                    rows["luma_sum"].append(sum(frames[idx][: w * h]))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=Y4M_LUMA_SCHEMA)


PCM_RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate_out", T.LongType()),
        T.StructField("n_out", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("sumsq", T.LongType()),
    ]
)


def pcm_resample_stats(media: DataFrame) -> DataFrame:
    """UNSTUBBED audio DSP: real RIFF parse → 2× linear-interpolation
    upsample in INTEGER arithmetic → exact Σ|y| and Σy² of the resampled
    signal.  y[2i] = x[i]; y[2i+1] = ⌊(x[i] + x[i+1]) / 2⌋ (floor — the
    same value both numpy ``//`` and SQL ``floor(Σ/2.0)`` produce, so the
    oracle replays the interpolation bit-exactly); the final odd sample
    clamps to x[n−1].  This is the sample-rate-conversion step an audio
    training pipeline runs before feature extraction; partition-preserving
    ``mapInPandas``, payloads never shuffle, 5 scalar columns out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in ("media_id", "sample_rate_out", "n_out",
                                    "sum_abs", "sumsq")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, _ch, pcm = decode_wav(bytes(payload))
                x = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                y = np.empty(2 * x.size, dtype=np.int64)
                y[0::2] = x
                if x.size:
                    y[1:-1:2] = (x[:-1] + x[1:]) // 2
                    y[-1] = x[-1]
                rows["media_id"].append(mid)
                rows["sample_rate_out"].append(2 * rate)
                rows["n_out"].append(int(y.size))
                rows["sum_abs"].append(int(np.abs(y).sum()))
                rows["sumsq"].append(int((y * y).sum()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=PCM_RESAMPLE_SCHEMA)


IMAGE_POOL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("possum", T.LongType()),
    ]
)


def image_meanpool_stats(media: DataFrame) -> DataFrame:
    """UNSTUBBED image downsampling: real BMP/PPM decode → exact 2×2
    integer mean-pool (⌊Σ₄/4⌋ per output pixel per channel — true
    average-pool downsampling, not the nearest-neighbor pick of
    ``nn_resize``) → per-channel pooled sums plus a position-weighted
    checksum Σ (idx+1)·val over the row-major pooled tensor, which pins
    the LAYOUT (any transposed/flipped pooling changes it) where plain
    sums would not.  Partition-preserving ``mapInPandas``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in ("media_id", "out_w", "out_h", "sum_r",
                                    "sum_g", "sum_b", "possum")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rgb = decode_image(bytes(payload))
                a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(np.int64)
                # crop to even dims first (as image_ahash crops to its 8×8
                # grid): the four strided slices below have unequal shapes
                # on an odd width/height and numpy raises in the executor
                h2, w2 = h // 2 * 2, w // 2 * 2
                a = a[:h2, :w2]
                pooled = (
                    a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]
                ) // 4
                idx = np.arange(pooled.size, dtype=np.int64).reshape(pooled.shape)
                sums = pooled.sum(axis=(0, 1))
                rows["media_id"].append(mid)
                rows["out_w"].append(w // 2)
                rows["out_h"].append(h // 2)
                rows["sum_r"].append(int(sums[0]))
                rows["sum_g"].append(int(sums[1]))
                rows["sum_b"].append(int(sums[2]))
                rows["possum"].append(int(((idx + 1) * pooled).sum()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=IMAGE_POOL_SCHEMA)


def vad_segments(frame_energy: DataFrame, media_col: str = "media_id",
                 frame_col: str = "frame_idx",
                 energy_col: str = "sumsq") -> DataFrame:
    """Energy-threshold voice-activity detection over a per-frame energy
    relation (the output of :func:`wav_frame_energy`): a frame is ACTIVE
    iff its energy exceeds the recording's mean frame energy — computed
    in exact integer arithmetic as ``energy·n_frames > total_energy``
    (no float mean, no tie ambiguity) — and consecutive active frames
    merge into maximal segments via the gaps-and-islands difference of
    frame index and per-media active rank.

    Plan shape: ONE window pass per media for the stats (the relation is
    already per-frame, media-partitioned), one more for the island rank,
    one groupBy for the segments — all partitioned by media id, so the
    pass distributes over recordings regardless of corpus size.  Returns
    (media_id, seg_idx, start_frame, end_frame, n_frames, seg_sumsq)."""
    from pyspark.sql.window import Window

    wm = Window.partitionBy(media_col)
    stats = frame_energy.select(
        F.col(media_col).alias("media_id"),
        F.col(frame_col).cast("bigint").alias("frame_idx"),
        F.col(energy_col).cast("bigint").alias("e"),
        F.count(F.lit(1)).over(wm).cast("bigint").alias("_n"),
        F.sum(energy_col).over(wm).cast("bigint").alias("_tot"),
    )
    active = stats.filter(F.col("e") * F.col("_n") > F.col("_tot"))
    wr = Window.partitionBy("media_id").orderBy("frame_idx")
    isl = active.withColumn(
        "_island", F.col("frame_idx") - F.row_number().over(wr)
    )
    segs = isl.groupBy("media_id", "_island").agg(
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum("e").cast("bigint").alias("seg_sumsq"),
    )
    ws = Window.partitionBy("media_id").orderBy("start_frame")
    return segs.select(
        "media_id",
        F.row_number().over(ws).cast("bigint").alias("seg_idx"),
        "start_frame", "end_frame", "n_frames", "seg_sumsq",
    )


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ahash_hi", T.LongType()),
        T.StructField("ahash_lo", T.LongType()),
        T.StructField("n_ones", T.LongType()),
    ]
)


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) over the real image decode path —
    the classic near-duplicate-image fingerprint: grayscale, reduce to
    an 8×8 grid, threshold each cell against the image mean, pack the
    64 bits.  Everything integer-exact so the oracle can replay it from
    the keystream: grayscale = ⌊(r+g+b)/3⌋ per pixel, cells are
    (h/8 × w/8) block SUMS (equal-area blocks make the sum threshold
    equivalent to the mean threshold), bit = cell·64 > total (strict —
    the VAD/seasonal integer-mean trick, no float mean anywhere), bits
    packed row-major into two 32-bit halves (sign-safe in both engines'
    BIGINT).  Near-dup pairing is then a Hamming-band bucket join, same
    shape as simhash.  Partition-preserving ``mapInPandas``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in ("media_id", "ahash_hi", "ahash_lo",
                                    "n_ones")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rgb = decode_image(bytes(payload))
                a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
                gs = a.astype(np.int64).sum(axis=2) // 3
                bh, bw = h // 8, w // 8
                cells = gs[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).sum(
                    axis=(1, 3)
                )
                tot = int(cells.sum())
                bits = (cells.flatten() * 64 > tot).astype(np.int64)
                hi = int(sum(int(b) << (31 - i) for i, b in enumerate(bits[:32])))
                lo = int(sum(int(b) << (31 - i) for i, b in enumerate(bits[32:])))
                rows["media_id"].append(mid)
                rows["ahash_hi"].append(hi)
                rows["ahash_lo"].append(lo)
                rows["n_ones"].append(int(bits.sum()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=AHASH_SCHEMA)


def ahash_banded_pairs(hashes: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate IMAGE pairs from aHash fingerprints, banded exactly
    like simhash: the 64 bits split into four 16-bit bands, candidates
    form ONLY on an exact band match (Σ|bucket|² cost, never all-pairs),
    then the exact Hamming distance verifies
    (bit_count(hi⊕hi') + bit_count(lo⊕lo')).  By pigeonhole a pair
    differing in ≤ 3 bits cannot differ in all 4 bands, so candidate
    generation is EXACT for distance ≤ 3 and probabilistic above — the
    same recall/cost dial as the text simhash operator, stated rather
    than hidden.  Pairs emit once (min id < max id).
    Returns (id_a, id_b, hamming)."""
    h = hashes.select(
        F.col("media_id").alias("id"),
        F.col("ahash_hi").alias("hi"), F.col("ahash_lo").alias("lo"),
    )
    bands = h.select(
        "id", "hi", "lo",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"),
                         F.shiftright("hi", 16).alias("key")),
                F.struct(F.lit(1).alias("band"),
                         (F.col("hi") % 65536).alias("key")),
                F.struct(F.lit(2).alias("band"),
                         F.shiftright("lo", 16).alias("key")),
                F.struct(F.lit(3).alias("band"),
                         (F.col("lo") % 65536).alias("key")),
            )
        ).alias("b"),
    ).select("id", "hi", "lo", F.col("b.band").alias("band"),
             F.col("b.key").alias("key"))
    a = bands.select(F.col("id").alias("id_a"), F.col("hi").alias("_ha"),
                     F.col("lo").alias("_la"), "band", "key")
    b = bands.select(F.col("id").alias("id_b"), F.col("hi").alias("_hb"),
                     F.col("lo").alias("_lb"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ha", "_la", "_hb", "_lb")
        .distinct()
    )
    ham = (
        F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
        + F.bit_count(F.col("_la").bitwiseXOR(F.col("_lb")))
    ).cast("bigint")
    return cand.select(
        "id_a", "id_b", ham.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
