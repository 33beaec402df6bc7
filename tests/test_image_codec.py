"""Unit tests for the pure-stdlib BMP/PPM codec (round 4) — the unstubbed
image path behind ``multimodal_image_roundtrip``."""

import hashlib
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from phenoxtract_spark.operators import multimodal as mm


@pytest.mark.parametrize("w,h", [(3, 2), (24, 16), (5, 7), (1, 1), (4, 1)])
def test_bmp_roundtrip(w, h):
    # (3,2) and (5,7) exercise row padding; (24,16) is the registered shape
    rgb = mm.md5_keystream(f"seed-{w}x{h}", w * h * 3)
    w2, h2, rgb2 = mm.decode_bmp(mm.encode_bmp(w, h, rgb))
    assert (w2, h2, rgb2) == (w, h, rgb)


def test_bmp_top_down_layout():
    # negative height = top-down rows per the BMP spec
    import struct

    rgb = mm.md5_keystream("td", 4 * 2 * 3)
    bmp = bytearray(mm.encode_bmp(4, 2, rgb))
    # flip to top-down: negate height and swap the two stored rows
    struct.pack_into("<i", bmp, 22, -2)
    row = 4 * 3  # no padding at w=4
    off = struct.unpack_from("<I", bmp, 10)[0]
    bmp[off : off + row], bmp[off + row : off + 2 * row] = (
        bmp[off + row : off + 2 * row],
        bmp[off : off + row],
    )
    assert mm.decode_bmp(bytes(bmp)) == (4, 2, rgb)


def test_bmp_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError):
        mm.decode_bmp(b"nope")
    bad = bytearray(mm.encode_bmp(2, 2, bytes(12)))
    bad[28] = 8  # 8bpp
    with pytest.raises(ValueError):
        mm.decode_bmp(bytes(bad))


def test_ppm_roundtrip_with_comments():
    rgb = mm.md5_keystream("ppm", 3 * 2 * 3)
    payload = b"P6\n# comment line\n 3  2 # trailing\n255\n" + rgb
    assert mm.decode_ppm(payload) == (3, 2, rgb)
    assert mm.decode_image(payload) == (3, 2, rgb)
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P5\n1 1\n255\n\x00")


def test_nn_resize_matches_floor_mapping():
    w, h, ow, oh = 24, 16, 8, 8
    rgb = mm.md5_keystream("abc", w * h * 3)
    small = mm.nn_resize(w, h, rgb, ow, oh)
    assert len(small) == ow * oh * 3
    for r in (0, 3, 7):
        for c in (0, 5):
            for k in range(3):
                src = ((r * h // oh) * w + (c * w // ow)) * 3 + k
                assert small[(r * ow + c) * 3 + k] == rgb[src]
    # identity resize is a no-op
    assert mm.nn_resize(w, h, rgb, w, h) == rgb


def test_keystream_duckdb_parity():
    import duckdb

    seed = hashlib.md5(b"hello world").hexdigest()
    ks = mm.md5_keystream(seed, 48)
    con = duckdb.connect()
    for pos in (0, 15, 16, 37, 47):
        v = con.execute(
            f"SELECT ('0x' || substr(md5('{seed}-' || CAST({pos}//16 AS VARCHAR)),"
            f" ({pos}%16)*2+1, 2))::BIGINT"
        ).fetchone()[0]
        assert v == ks[pos]


def test_image_roundtrip_stats_spark(spark):
    df = spark.createDataFrame(
        [(1, "first doc"), (2, "second doc")], "doc_id bigint, text string"
    )
    media = mm.synthetic_bmp_media(df, "doc_id", "text", width=24, height=16)
    rows = {r["media_id"]: r for r in mm.image_roundtrip_stats(media, 8, 8).collect()}
    assert set(rows) == {1, 2}
    for doc_id, text in [(1, "first doc"), (2, "second doc")]:
        seed = hashlib.md5(text.encode()).hexdigest()
        rgb = mm.md5_keystream(seed, 24 * 16 * 3)
        small = mm.nn_resize(24, 16, rgb, 8, 8)
        expect = [sum(small[k::3]) for k in range(3)]
        r = rows[doc_id]
        assert (r["src_w"], r["src_h"], r["out_w"], r["out_h"]) == (24, 16, 8, 8)
        assert [r["sum_r"], r["sum_g"], r["sum_b"]] == expect


# --- PNG (stdlib zlib deflate + 5-filter matrix, round 12) -----------------


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, "cycle"])
def test_png_roundtrip_every_filter(ft):
    rgb = mm.md5_keystream(f"png-{ft}", 24 * 16 * 3)
    w, h, out = mm.decode_png(mm.encode_png(24, 16, rgb, row_filter=ft))
    assert (w, h, out) == (24, 16, rgb)


@pytest.mark.parametrize("w,h", [(1, 1), (7, 5), (4, 1), (1, 6)])
def test_png_roundtrip_odd_shapes(w, h):
    # edge pixels exercise the left/upper-left = 0 boundary of
    # Sub/Average/Paeth
    rgb = mm.md5_keystream(f"png-{w}x{h}", w * h * 3)
    assert mm.decode_png(mm.encode_png(w, h, rgb, "cycle")) == (w, h, rgb)


def test_png_encode_is_deterministic_and_dispatches():
    rgb = mm.md5_keystream("png-det", 8 * 8 * 3)
    p = mm.encode_png(8, 8, rgb, "cycle")
    assert p == mm.encode_png(8, 8, rgb, "cycle")
    assert p[:8] == mm.PNG_MAGIC
    assert mm.decode_image(p) == (8, 8, rgb)


def test_png_rgba_decodes_with_alpha_dropped():
    # hand-build a color-type-6 file: 2x2, filter 0 scanlines
    import struct
    import zlib

    rgba = bytes(range(16))  # 2*2*4
    raw = b"\x00" + rgba[:8] + b"\x00" + rgba[8:]
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)
    p = (mm.PNG_MAGIC + mm._png_chunk(b"IHDR", ihdr)
         + mm._png_chunk(b"IDAT", zlib.compress(raw))
         + mm._png_chunk(b"IEND", b""))
    w, h, rgb = mm.decode_png(p)
    assert (w, h) == (2, 2)
    # alpha bytes (3, 7, 11, 15) dropped
    assert rgb == bytes([0, 1, 2, 4, 5, 6, 8, 9, 10, 12, 13, 14])


def test_png_strict_errors():
    import struct
    import zlib

    rgb = mm.md5_keystream("png-err", 6 * 4 * 3)
    good = mm.encode_png(6, 4, rgb)
    with pytest.raises(ValueError, match="not a PNG payload"):
        mm.decode_png(b"XX" + good)
    # flip a byte inside the IDAT data -> chunk CRC mismatch
    bad = bytearray(good)
    bad[8 + 25 + 12] ^= 0xFF  # inside IDAT (IHDR chunk is 25 bytes)
    with pytest.raises(ValueError, match="CRC mismatch"):
        mm.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_png(good[:-6])
    with pytest.raises(ValueError, match="trailing bytes"):
        mm.decode_png(good + b"junk")
    # Adam7 interlace rejected loudly
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    p = (mm.PNG_MAGIC + mm._png_chunk(b"IHDR", ihdr)
         + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
         + mm._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="Adam7"):
        mm.decode_png(p)
    # 16-bit depth out of scope
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    p16 = (mm.PNG_MAGIC + mm._png_chunk(b"IHDR", ihdr16)
           + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
           + mm._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="bit depth 16"):
        mm.decode_png(p16)
    # inflated size mismatch (one scanline short)
    ihdr2 = struct.pack(">IIBBBBB", 2, 3, 8, 2, 0, 0, 0)
    p2 = (mm.PNG_MAGIC + mm._png_chunk(b"IHDR", ihdr2)
          + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
          + mm._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflated IDAT size"):
        mm.decode_png(p2)
    # the r12 review's strict-contract escapes — ALL must be ValueError:
    # garbage after the deflate end-of-stream inside a CRC-valid IDAT
    ihdr3 = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    p3 = (mm.PNG_MAGIC + mm._png_chunk(b"IHDR", ihdr3)
          + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 14) + b"XX")
          + mm._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="trailing bytes after the IDAT"):
        mm.decode_png(p3)
    # short IHDR (12 bytes) -> ValueError, not struct.error
    p4 = (mm.PNG_MAGIC + mm._png_chunk(b"IHDR", ihdr3[:12])
          + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
          + mm._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IHDR must be exactly 13"):
        mm.decode_png(p4)
    # zero IDAT chunks -> ValueError, not zlib.error
    p5 = (mm.PNG_MAGIC + mm._png_chunk(b"IHDR", ihdr3)
          + mm._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="no IDAT chunk"):
        mm.decode_png(p5)
    # corrupt deflate stream -> ValueError, not zlib.error
    p6 = (mm.PNG_MAGIC + mm._png_chunk(b"IHDR", ihdr3)
          + mm._png_chunk(b"IDAT", b"\xff\xff\xff\xff")
          + mm._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="corrupt IDAT deflate"):
        mm.decode_png(p6)
    # truncated chunk whose type bytes are not valid UTF-8 -> still the
    # intended truncation ValueError (latin-1 message rendering)
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_png(mm.PNG_MAGIC + struct.pack(">I", 99) + b"\xff\xfe\xfd\xfc")


def test_png_ancillary_chunks_skipped_critical_rejected():
    import struct
    import zlib

    rgb = mm.md5_keystream("png-anc", 4 * 3 * 3)
    good = mm.encode_png(4, 3, rgb)
    # splice a tEXt ancillary chunk between IHDR and IDAT: decoder must
    # skip it (lowercase first letter = safe to ignore per the spec)
    ihdr_end = 8 + 25
    text = mm._png_chunk(b"tEXt", b"Comment\x00hello")
    with_anc = good[:ihdr_end] + text + good[ihdr_end:]
    assert mm.decode_png(with_anc) == (4, 3, rgb)
    # an unknown CRITICAL chunk (uppercase first letter) must reject
    crit = mm._png_chunk(b"CrIt", b"\x01\x02")
    with pytest.raises(ValueError, match="unsupported critical chunk"):
        mm.decode_png(good[:ihdr_end] + crit + good[ihdr_end:])


def test_png_media_matches_bmp_twin_spark(spark):
    """The PNG path must produce byte-identical pixels to the BMP path
    for the same keystream — so ahash/meanpool/roundtrip stats agree
    between the two container formats."""
    df = spark.createDataFrame(
        [(1, "first doc"), (2, "second doc")], "doc_id bigint, text string"
    )
    bmp = mm.synthetic_bmp_media(df, "doc_id", "text", width=24, height=16)
    png = mm.synthetic_png_media(df, "doc_id", "text", width=24, height=16)
    for op in (lambda m: mm.image_roundtrip_stats(m, 8, 8),
               mm.image_ahash, mm.image_meanpool_stats):
        a = sorted(map(tuple, op(bmp).collect()))
        b = sorted(map(tuple, op(png).collect()))
        assert a == b and len(a) == 2


# --- WAV (RIFF/PCM16) ------------------------------------------------------


def test_wav_roundtrip_and_chunk_walk():
    pcm = mm.md5_keystream("wav", 1024)
    wav = mm.encode_wav(pcm, sample_rate=8000)
    assert mm.decode_wav(wav) == (8000, 1, pcm)
    # extra chunk before data must be skipped by the chunk walk
    import struct

    head, rest = wav[:12], wav[12:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    assert mm.decode_wav(head + extra + rest) == (8000, 1, pcm)
    # odd-sized chunks are word-aligned
    odd = b"junk" + struct.pack("<I", 3) + b"abc\x00"
    assert mm.decode_wav(head + odd + rest) == (8000, 1, pcm)


def test_wav_rejects_truncated_data_chunk():
    """ADVICE r4: a data chunk whose declared size exceeds the remaining
    bytes must raise (like decode_bmp/decode_y4m), not silently clamp."""
    pcm = mm.md5_keystream("trunc", 256)
    wav = mm.encode_wav(pcm, sample_rate=8000)
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_wav(wav[:-10])  # cut mid-data
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_wav(wav[: len(wav) - len(pcm) + 4])  # header + partial data


def test_wav_rejects_non_pcm16():
    import struct

    wav = bytearray(mm.encode_wav(mm.md5_keystream("x", 64)))
    struct.pack_into("<H", wav, 12 + 8, 3)  # fmt code 3 = IEEE float
    with pytest.raises(ValueError):
        mm.decode_wav(bytes(wav))
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFFxxxxNOPE")


def test_wav_frame_energy_spark(spark):
    import numpy as np

    df = spark.createDataFrame([(1, "audio doc")], "doc_id bigint, text string")
    media = mm.synthetic_wav_media(df, "doc_id", "text", n_samples=512)
    rows = sorted(
        mm.wav_frame_energy(media, frame_samples=256).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 1]
    assert all(r["n_samples"] == 256 and r["sample_rate"] == 16000 for r in rows)
    import hashlib

    seed = hashlib.md5(b"audio doc").hexdigest()
    x = np.frombuffer(mm.md5_keystream(seed, 1024), dtype="<i2").astype(np.int64)
    for r in rows:
        fr = x[r["frame_idx"] * 256 : (r["frame_idx"] + 1) * 256]
        assert r["sumsq"] == int((fr * fr).sum())


# --- Y4M (YUV4MPEG2 C444) --------------------------------------------------


def test_y4m_roundtrip_and_frame_params():
    w, h, nf = 6, 4, 3
    fb = 3 * w * h
    ks = mm.md5_keystream("vid", nf * fb)
    frames = [ks[i * fb : (i + 1) * fb] for i in range(nf)]
    y4m = mm.encode_y4m(w, h, frames)
    assert mm.decode_y4m(y4m) == (w, h, frames)
    # frame-level params after FRAME are allowed and skipped
    with_params = y4m.replace(b"FRAME\n", b"FRAME Ip\n", 1)
    assert mm.decode_y4m(with_params) == (w, h, frames)


def test_y4m_rejects_subsampled_and_corrupt():
    ks = mm.md5_keystream("v", 3 * 4 * 2)
    y4m = mm.encode_y4m(4, 2, [ks])
    with pytest.raises(ValueError):
        mm.decode_y4m(y4m.replace(b"C444", b"C420jpeg"))
    with pytest.raises(ValueError):
        mm.decode_y4m(y4m[:-5])  # truncated frame
    with pytest.raises(ValueError):
        mm.decode_y4m(b"MPEG4 nope\n")


def test_y4m_luma_stats_spark(spark):
    df = spark.createDataFrame([(7, "video doc")], "doc_id bigint, text string")
    media = mm.synthetic_y4m_media(df, "doc_id", "text", width=16, height=8, n_frames=6)
    rows = sorted(
        mm.y4m_luma_stats(media, stride=2).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    import hashlib

    seed = hashlib.md5(b"video doc").hexdigest()
    ks = mm.md5_keystream(seed, 6 * 384)
    for r in rows:
        assert r["luma_sum"] == sum(ks[r["frame_idx"] * 384 : r["frame_idx"] * 384 + 128])


def test_image_ahash_known_pattern(spark):
    """A left-dark / right-bright 24x16 image hashes to bit pattern
    00001111 per 8-bit row: hi = lo = 0x0F0F0F0F, n_ones = 32; a uniform
    image has NO cell strictly above the mean -> all-zero hash."""
    from phenoxtract_spark.operators import multimodal

    half = bytes()
    for r in range(16):
        row = b"\x10\x10\x10" * 12 + b"\xf0\xf0\xf0" * 12
        half += row
    img = multimodal.encode_bmp(24, 16, half)
    flat = b"\x40\x40\x40" * (24 * 16)
    uni = multimodal.encode_bmp(24, 16, flat)
    df = spark.createDataFrame(
        [(1, bytearray(img)), (2, bytearray(uni))],
        "media_id bigint, payload binary",
    )
    out = {r["media_id"]: r for r in multimodal.image_ahash(df).collect()}
    assert out[1]["ahash_hi"] == 0x0F0F0F0F
    assert out[1]["ahash_lo"] == 0x0F0F0F0F
    assert out[1]["n_ones"] == 32
    assert (out[2]["ahash_hi"], out[2]["ahash_lo"], out[2]["n_ones"]) == (0, 0, 0)


def test_ahash_banded_pairs_pigeonhole_and_verify(spark):
    """Identical hashes pair at distance 0; a 2-bit difference (<= 3)
    MUST be caught (pigeonhole: 4 bands); a pair differing in all four
    bands produces no candidate even if (hypothetically) close; the
    verify threshold drops far pairs that banded together."""
    from phenoxtract_spark.operators import multimodal

    rows = [
        (1, 0x0F0F0F0F, 0x0F0F0F0F),
        (2, 0x0F0F0F0F, 0x0F0F0F0F),          # identical -> hamming 0
        (3, 0x0F0F0F0E, 0x0F0F0F0D),          # 1+1 bits off vs 1 -> 2
        (4, 0x1F0F0F0F, 0x0F0F0F0F),          # 1 bit off band 0 -> 1
        (5, 0xF0F0F0F0, 0x70707070),          # differs everywhere
    ]
    df = spark.createDataFrame(
        rows, "media_id bigint, ahash_hi bigint, ahash_lo bigint"
    )
    out = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           multimodal.ahash_banded_pairs(df, max_hamming=6).collect()}
    assert out[(1, 2)] == 0
    assert out[(1, 3)] == 2 and out[(2, 3)] == 2
    assert out[(1, 4)] == 1
    assert not any(5 in k for k in out)
