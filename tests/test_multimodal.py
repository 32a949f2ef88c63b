"""Multimodal metadata decode: real pure-Python header parsers
(PNG/JPEG/GIF/WAV) + the synthesize→parse→oracle roundtrip.

Reference has no multimodal surface (SURVEY §2.3 north-star scope);
the parsers implement the public container layouts (PNG spec IHDR,
JPEG ISO/IEC 10918 marker segments, GIF89a block stream, RIFF/WAVE
chunks) from their published byte offsets.
"""

from __future__ import annotations

import hashlib

import pytest

from dataframeutils_spark.operators import multimodal as M
from tests.conftest import assert_matches_oracle


def test_png_synthesize_parse_roundtrip():
    b = M.synthesize_png(37, 101)
    md5, w, h, n = M._real_decode("image", b)
    assert (w, h, n) == (37, 101, 1)
    assert md5 == hashlib.md5(b).hexdigest()


def test_wav_synthesize_parse_roundtrip():
    b = M.synthesize_wav(11025, 2, 333)
    _, rate, ch, n = M._real_decode("audio", b)
    assert (rate, ch, n) == (11025, 2, 333)


def test_wav_parse_survives_extra_chunks():
    """Real-world WAVs carry LIST/INFO chunks before data — the chunk
    walk must skip them, including the odd-size word-alignment pad."""
    b = M.synthesize_wav(8000, 1, 10)
    # splice a 5-byte (odd) LIST chunk between fmt and data
    fmt_end = b.index(b"data")
    spliced = b[:fmt_end] + b"LIST" + (5).to_bytes(4, "little") + b"INFOx\x00" + b[fmt_end:]
    _, rate, ch, n = M._real_decode("audio", spliced)
    assert (rate, ch, n) == (8000, 1, 10)


def test_jpeg_sof_scan():
    """Marker-walk vector: SOI + APP0(JFIF) + DQT + SOF0(160x120) —
    the parser must skip the variable-length segments and read the
    big-endian dims after SOF0's precision byte."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes(64)
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + (120).to_bytes(2, "big")  # height
        + (160).to_bytes(2, "big")  # width
        + b"\x03" + bytes(9)
    )
    b = b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"
    _, w, h, n = M._real_decode("image", b)
    assert (w, h, n) == (160, 120, 1)


def test_jpeg_progressive_sof2_and_missing_sof():
    sof2 = (
        b"\xff\xc2"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + (7).to_bytes(2, "big")
        + (9).to_bytes(2, "big")
        + b"\x03" + bytes(9)
    )
    _, w, h, _ = M._real_decode("image", b"\xff\xd8" + sof2 + b"\xff\xd9")
    assert (w, h) == (9, 7)
    with pytest.raises(ValueError, match="no SOF"):
        M._parse_jpeg(b"\xff\xd8\xff\xd9")


def test_gif_parses_canvas_and_counts_frames():
    """Two-frame GIF89a with a global color table and a graphic-control
    extension per frame — frame count = image descriptors walked."""
    lsd = (5).to_bytes(2, "little") + (3).to_bytes(2, "little") + bytes([0x80, 0, 0])
    gct = bytes(6)  # 2-entry global table, 3 bytes each
    gce = b"\x21\xf9\x04" + bytes(4) + b"\x00"
    img = (
        b"\x2c" + bytes(4)
        + (5).to_bytes(2, "little") + (3).to_bytes(2, "little")
        + b"\x00"  # no local color table
        + b"\x02"  # LZW min code size
        + b"\x02\x4c\x01" + b"\x00"  # one 2-byte data sub-block + terminator
    )
    b = b"GIF89a" + lsd + gct + gce + img + gce + img + b"\x3b"
    _, w, h, n = M._real_decode("image", b)
    assert (w, h, n) == (5, 3, 2)


def test_unknown_container_raises():
    with pytest.raises(NotImplementedError, match="PNG/JPEG/GIF/WAV"):
        M._real_decode("video", b"\x00\x01\x02\x03not-a-container")


def test_real_media_metadata_matches_oracle(spark, ddb):
    """End-to-end exact check, same shape as the driver gate: synthesize
    valid containers, parse with the real codecs, compare against the
    SQL oracle that predicts the embedded header fields."""
    from dataframeutils_spark import driver

    out = driver.q_multimodal_real_meta(spark, "/root/testdata/sf0.001")
    assert_matches_oracle(out, ddb, M.real_decode_metadata_sql())


def test_png_pixel_roundtrip_and_filters():
    """decode_png_pixels must invert synthesize_png exactly, and the
    unfilter logic must handle real filter types (a Sub/Up/Paeth-
    filtered encoding of the same raster decodes to identical pixels)."""
    import struct
    import zlib

    import numpy as np

    from dataframeutils_spark.operators import multimodal as M

    w, h = 13, 9
    b = M.synthesize_png(w, h)
    gw, gh, img = M.decode_png_pixels(b)
    expect = np.array(
        [[(7 * x + 13 * y) % 251 for x in range(w)] for y in range(h)],
        dtype=np.int64,
    )
    assert (gw, gh) == (w, h) and (img == expect).all()

    # re-encode the same raster with filter 2 (Up) on every row
    rows = [bytes(int(v) for v in expect[0])]
    raster = b"\x02" + bytes(
        int(expect[0][x]) % 256 for x in range(w)
    )  # row 0: prev = zeros → Up == None
    for y in range(1, h):
        diff = bytes((int(expect[y][x]) - int(expect[y - 1][x])) % 256 for x in range(w))
        raster += b"\x02" + diff

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    b2 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )
    _, _, img2 = M.decode_png_pixels(b2)
    assert (img2 == expect).all()


def test_resize_real_pixel_sums(spark, ddb):
    from dataframeutils_spark.operators import multimodal as M

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.real_media_table(docs)
    got = sorted(
        tuple(r) for r in M.resize_images_real(media, 16, 16).collect()
    )
    want = sorted(tuple(t) for t in ddb.execute(M.resize_real_sql()).fetchall())
    assert got == want and len(got) > 0


def test_image_features_recovers_gradient_stats(spark):
    from dataframeutils_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [(0, "image", bytearray(mm.synthesize_png(5, 3)))],
        "media_id long, media_type string, content binary",
    )
    r = mm.image_features(media).collect()[0]
    import numpy as np

    img = np.array([[(7 * x + 13 * y) % 251 for x in range(5)] for y in range(3)])
    assert (r["src_w"], r["src_h"]) == (5, 3)
    assert r["px_min"] == img.min() and r["px_max"] == img.max()
    assert abs(r["px_mean"] - img.mean()) < 1e-12
    hist = np.bincount(img.ravel() // 64, minlength=4)[:4]
    assert [r["hist_0"], r["hist_1"], r["hist_2"], r["hist_3"]] == hist.tolist()
    assert r["hist_0"] + r["hist_1"] + r["hist_2"] + r["hist_3"] == 15


def test_gif_lzw_roundtrip_width_boundaries():
    """The codec pair must roundtrip across every code-width boundary
    (standard giflib late-change schedule on both sides), including
    boundary-adjacent lengths and the 4096 dictionary reset."""
    import random

    from dataframeutils_spark.operators import multimodal as M

    r = bytes(M._gif_gradient_pixel(x, y, 0) for y in range(19) for x in range(14))
    assert M._lzw_decode_gif(M._lzw_encode_gif(r)) == r
    rng = random.Random(11)
    for n in [1, 2, 255, 256, 257, 266, 511, 512, 1023, 5000]:
        data = bytes(rng.randrange(256) for _ in range(n))
        assert M._lzw_decode_gif(M._lzw_encode_gif(data)) == data, n
    big = bytes(rng.randrange(256) for _ in range(120_000))  # forces 4096 reset
    assert M._lzw_decode_gif(M._lzw_encode_gif(big)) == big


def _lzw_encode_gif_bytes_keyed(data: bytes, min_code_size: int = 8) -> bytes:
    """The pre-r14 byte-keyed reference encoder, kept verbatim so the
    int-keyed hot-loop rewrite is pinned BYTE-IDENTICAL (not merely
    roundtrip-compatible — a schedule drift that both sides shared
    would survive a roundtrip test)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = 0
    nacc = 0
    width = min_code_size + 1
    next_code = end + 1

    def emit(code: int) -> None:
        nonlocal acc, nacc, width
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
        if next_code >= (1 << width) and width < 12:
            width += 1

    table = {bytes([i]): i for i in range(clear)}
    emit(clear)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        else:
            table[wc] = next_code
            next_code += 1
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(end)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_lzw_encode_matches_bytes_keyed_reference():
    """The int-keyed encoder must emit byte-identical streams to the
    byte-keyed reference on every shape: gradient rasters, empty,
    single byte, repetitive data forcing the 4096 dictionary reset,
    random data, and a sub-8-bit code size."""
    import random

    from dataframeutils_spark.operators import multimodal as M

    rng = random.Random(1234)
    cases = [
        b"",
        b"\x00",
        b"\xff" * 3,
        bytes(M._gif_gradient_pixel(x, y, f) for f in range(4)
              for y in range(33) for x in range(29)),
        bytes(rng.randrange(4) for _ in range(30_000)),   # reset, low entropy
        bytes(rng.randrange(256) for _ in range(20_000)),  # reset, high entropy
        b"\xaa" * 50_000,                                  # reset, constant
    ]
    for i, d in enumerate(cases):
        assert M._lzw_encode_gif(d) == _lzw_encode_gif_bytes_keyed(d), i
    small = bytes(rng.randrange(4) for _ in range(5_000))
    assert M._lzw_encode_gif(small, min_code_size=2) == _lzw_encode_gif_bytes_keyed(
        small, min_code_size=2
    )


# Two REAL externally-encoded GIFs (not produced by this repo), embedded
# verbatim so format compliance is tested against independent encoders and
# self-consistency of the codec pair can never mask a width-schedule bug
# again. Sources: an 8x8 256-grey GIF87a shipped in gsutil's test data and
# the 14x11 2-color GIF89a Tk icon from CPython's idlelib (both tiny,
# redistributable test assets). Expected pixel sums verified by hand from
# the palettes: test.gif is all-white (64*255); tk.gif has 62 red pixels
# (grey (255+0+0)//3 = 85) on a 0xc0c0c0 field (85*62 + 192*92 = 22934).
_EXT_GIF_WHITE_8X8 = bytes.fromhex(
    "47494638376108000800e70000"  # header, 8x8, 256-entry GCT flags
    + "".join(f"{i:02x}" * 3 for i in range(256))  # greyscale identity GCT
    + "2c000000000800080000080f00ff091c48b0a0c18308132a4c1810003b"
)
_EXT_GIF_TK_14X11 = bytes.fromhex(
    "4749463839610e000b00f00100ff0000c0c0c021f90405000001002c000000000e00"
    "0b0000021f0c8e10bbe9da126bd14c6aa0655a9dfb591ec88d5328695bf6755dc55d"
    "5701003b"
)


def test_gif_decode_externally_encoded_streams():
    import numpy as np

    from dataframeutils_spark.operators import multimodal as M

    w, h, frames = M.decode_gif_frames(_EXT_GIF_WHITE_8X8)
    assert (w, h, len(frames)) == (8, 8, 1)
    assert frames[0].shape == (8, 8) and (frames[0] == 255).all()

    w, h, frames = M.decode_gif_frames(_EXT_GIF_TK_14X11)
    assert (w, h, len(frames)) == (14, 11, 1)
    f0 = frames[0]
    assert f0.shape == (11, 14)
    assert sorted(np.unique(f0).tolist()) == [85, 192]  # red + silver only
    assert int(f0.sum()) == 22934 and int((f0 == 85).sum()) == 62

    # re-encoding the decoded indices with the repo encoder must yield a
    # stream the (externally-validated) decoder reads back identically
    idx = np.where(f0 == 85, 0, 1).astype(np.uint8)  # palette: 0=red 1=silver
    enc = M._lzw_encode_gif(idx.tobytes(), min_code_size=2)
    assert M._lzw_decode_gif(enc, min_code_size=2) == idx.tobytes()


def test_gif_decode_system_corpus():
    """Every real non-repo GIF present on the machine must decode —
    width-schedule non-compliance shows up as 'code beyond table'
    errors on externally encoded streams, so plain decode success over
    a diverse corpus (large multi-boundary rasters, interlaced frames,
    local palettes, extension blocks) is the compliance signal."""
    import glob
    import os

    from dataframeutils_spark.operators import multimodal as M

    paths = sorted(
        set(
            glob.glob("/usr/share/tcltk/tk8.6/images/*.gif")
            + glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif")
        )
    )
    if len(paths) < 3:
        import pytest

        pytest.skip("system GIF corpus not present")
    for p in paths:
        with open(p, "rb") as fh:
            w, h, frames = M.decode_gif_frames(fh.read())
        assert frames and all(f.size > 0 for f in frames), os.path.basename(p)


def test_gif_synthesize_decode_all_frames():
    import numpy as np

    from dataframeutils_spark.operators import multimodal as M

    for (w, h, nf) in [(8, 8, 2), (14, 19, 5), (32, 32, 6), (25, 9, 1)]:
        for interlaced in (False, True):
            b = M.synthesize_gif(w, h, nf, interlaced=interlaced)
            W, H, frames = M.decode_gif_frames(b)
            assert (W, H, len(frames)) == (w, h, nf)
            for f, img in enumerate(frames):
                want = np.fromfunction(
                    lambda y, x: (7 * x + 13 * y + 11 * f) % 251, (h, w)
                )
                # interlace must be transparent after de-interlacing
                assert (img == want).all(), (w, h, f, interlaced)
            # the metadata header walk must agree with the pixel decoder
            assert M._parse_gif(b) == (w, h, nf)


def test_wav_sample_decode_roundtrip():
    import numpy as np

    from dataframeutils_spark.operators import multimodal as M

    for (rate, nch, n) in [(8000, 1, 256), (11025, 2, 997), (15999, 2, 2048)]:
        b = M.synthesize_wav(rate, nch, n)
        r, c, samples = M.decode_wav_samples(b)
        assert (r, c) == (rate, nch) and samples.shape == (n, nch)
        want = np.array(
            [(i * 257) % 32768 - 16384 for i in range(n * nch)], dtype=np.int16
        ).reshape(n, nch)
        assert (samples == want).all()
    # odd-length chunk word alignment must not desync the walk
    raw = bytearray(M.synthesize_wav(8000, 1, 16))
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOX" + b"\x00"  # padded
    aligned = raw[:12] + extra + raw[12:]
    r, c, samples = M.decode_wav_samples(bytes(aligned))
    assert (r, c, samples.shape) == (8000, 1, (16, 1))


def test_audio_features_matches_oracle(spark, ddb):
    from dataframeutils_spark.operators import multimodal as M

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.wav_audio_table(docs)
    got = sorted(tuple(r) for r in M.audio_features(media).collect())
    want = sorted(tuple(t) for t in ddb.execute(M.audio_features_sql()).fetchall())
    assert got == want and len(got) == 500


def test_audio_window_features_matches_oracle(spark, ddb):
    from dataframeutils_spark.operators import multimodal as M

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.wav_audio_table(docs)
    got = sorted(tuple(r) for r in M.audio_window_features(media, window=512).collect())
    want = sorted(
        tuple(t)
        for t in ddb.execute(M.audio_window_features_sql(window=512)).fetchall()
    )
    assert got == want and len(got) > 500  # window fan-out
    # short tail windows must be partial, not padded
    assert any(r[2] < 512 for r in got)


def test_gif_frame_stats_matches_oracle(spark, ddb):
    from dataframeutils_spark.operators import multimodal as M

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.gif_media_table(docs)
    got = sorted(tuple(r) for r in M.gif_frame_stats(media, every_k=2).collect())
    want = sorted(
        tuple(t) for t in ddb.execute(M.gif_frame_stats_sql(every_k=2)).fetchall()
    )
    assert got == want and len(got) > len(set(r[0] for r in got))  # multi-frame fan-out


def test_mp4_parser_on_hand_built_spec_vector():
    """Per the GIF width-schedule lesson: no MP4 files or independent
    parsers exist in this environment, so the box walker is validated
    against a byte vector assembled HERE with offsets from ISO/IEC
    14496-12 — version-1 tkhd, an audio track (0x0 presentation size)
    BEFORE the video track, a multi-entry stts, and a 64-bit largesize
    box — none of which the repo synthesizer emits."""
    import struct

    from dataframeutils_spark.operators import multimodal as M

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    # audio tkhd: version 0, width/height 0 -> must be skipped
    tkhd_audio = box(
        b"tkhd",
        bytes(4) + struct.pack(">IIIII", 0, 0, 1, 0, 0) + bytes(8)
        + struct.pack(">HHHH", 0, 0, 0x0100, 0) + matrix
        + struct.pack(">II", 0, 0),
    )
    # video tkhd: VERSION 1 layout (64-bit times/duration)
    tkhd_video = box(
        b"tkhd",
        b"\x01" + bytes(3)
        + struct.pack(">QQIIQ", 0, 0, 2, 0, 0)  # ctime mtime id res dur
        + bytes(8) + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
        + struct.pack(">II", 640 << 16, 360 << 16),
    )
    # stts with three entries: 100 + 23 + 2 = 125 frames
    stts = box(
        b"stts",
        bytes(4) + struct.pack(">I", 3)
        + struct.pack(">II", 100, 1)
        + struct.pack(">II", 23, 2)
        + struct.pack(">II", 2, 1),
    )
    stbl = box(b"stbl", stts)
    trak_v = box(b"trak", tkhd_video + box(b"mdia", box(b"minf", stbl)))
    trak_a = box(b"trak", tkhd_audio)
    moov_payload = trak_a + trak_v
    # moov as a LARGESIZE box (size==1 + 64-bit length)
    moov = (
        struct.pack(">I", 1) + b"moov"
        + struct.pack(">Q", 16 + len(moov_payload)) + moov_payload
    )
    b = box(b"ftyp", b"isom" + bytes(4)) + moov
    assert M._parse_mp4(b) == (640, 360, 125)
    md5, w, h, n = M._real_decode("video", b)
    assert (w, h, n) == (640, 360, 125)


def test_mp4_synthesize_parse_roundtrip_and_oracle(spark, ddb):
    from dataframeutils_spark.operators import multimodal as M

    assert M._parse_mp4(M.synthesize_mp4(320, 240, 750)) == (320, 240, 750)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.mp4_media_table(docs)
    got = sorted(tuple(r) for r in M.mp4_meta(media).collect())
    want = sorted(tuple(t) for t in ddb.execute(M.mp4_meta_sql()).fetchall())
    assert got == want and len(got) == 500


def test_avi_parser_on_hand_built_spec_vector():
    """Container-walk conformance on a RIFF/AVI assembled BYTE BY BYTE
    here, independently of synthesize_avi — per the MSDN 'AVI RIFF File
    Reference' layout. The single '00dc' payload is a real baseline
    JPEG; a mutated avih frame count must raise (desync guard), and an
    odd-length chunk must be word-aligned correctly."""
    import struct

    import numpy as np

    from dataframeutils_spark.operators import multimodal as M
    from dataframeutils_spark.operators.jpeg import synthesize_jpeg

    jpg = synthesize_jpeg(16, 8, 5)
    # force the odd-length pad path with a junk chunk of length 3
    junk = b"JUNK" + struct.pack("<I", 3) + b"xyz" + b"\x00"
    avih = struct.pack(
        "<10I4I", 40_000, 0, 0, 0x10, 1, 0, 1, len(jpg), 16, 8, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0, 1, len(jpg), 0, 0)
        + struct.pack("<4h", 0, 0, 16, 8)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, 16, 8, 1, 24, b"MJPG", 384, 0, 0, 0, 0)

    def chunk(cid, payload):
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", jpg))
    idx1 = chunk(b"idx1", b"00dc" + struct.pack("<III", 0x10, 4, len(jpg)))
    body = b"AVI " + hdrl + junk + movi + idx1
    b = b"RIFF" + struct.pack("<I", len(body)) + body

    w, h, frames = M.decode_avi_frames(b)
    assert (w, h) == (16, 8) and len(frames) == 1
    exp = np.fromfunction(
        lambda y, x: (11 * (x // 8) + 17 * (y // 8) + 5) % 256, (8, 16)
    ).astype(np.uint8)
    assert (frames[0] == exp).all()

    # desync guard: declare 2 frames while movi carries 1
    bad = bytearray(b)
    off = b.index(b"avih") + 8
    bad[off + 16 : off + 20] = struct.pack("<I", 2)
    with pytest.raises(ValueError, match="desync"):
        M.decode_avi_frames(bytes(bad))
    with pytest.raises(ValueError, match="RIFF/AVI"):
        M.decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")


def test_avi_synthesize_decode_all_frames():
    """Full roundtrip on awkward geometries (edge blocks, 1-block
    canvas, shift wraparound): every frame of the synthesized MJPEG AVI
    must decode to the exact block gradient."""
    import numpy as np

    from dataframeutils_spark.operators import multimodal as M

    for (w, h, nf, s) in [(9, 9, 2, 0), (17, 25, 4, 250), (8, 8, 3, 255)]:
        W, H, frames = M.decode_avi_frames(M.synthesize_avi(w, h, nf, s))
        assert (W, H) == (w, h) and len(frames) == nf
        for f, img in enumerate(frames):
            exp = np.fromfunction(
                lambda y, x: (11 * (x // 8) + 17 * (y // 8) + s + 29 * f) % 256,
                (h, w),
            ).astype(np.uint8)
            assert (img == exp).all(), (w, h, f)


def test_avi_frame_stats_matches_oracle(spark, ddb):
    from dataframeutils_spark.operators import multimodal as M

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.avi_media_table(docs)
    got = sorted(tuple(r) for r in M.avi_frame_stats(media, every_k=2).collect())
    want = sorted(
        tuple(t) for t in ddb.execute(M.avi_frame_stats_sql(every_k=2)).fetchall()
    )
    assert got == want and len(got) > len(set(r[0] for r in got))  # multi-frame fan-out


def test_mp4_frame_index_general_chunking_hand_built():
    """The sample-offset resolution must implement the GENERAL ISO
    14496-12 algorithm, not the fixture's one-chunk shortcut: a
    hand-built stbl with two stsc runs (2 samples/chunk then 3) over
    three chunks at non-contiguous offsets must resolve each sample to
    chunk_offset + intra-chunk size prefix sum."""
    import struct

    from dataframeutils_spark.operators import multimodal as M

    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    sizes = [10, 20, 30, 40, 50, 60, 70]  # 7 samples
    # chunks at arbitrary offsets: c1 has s0,s1; c2 has s2,s3; c3 has s4..s6
    stsc = box(b"stsc", bytes(4) + struct.pack(">I", 2)
               + struct.pack(">III", 1, 2, 1)
               + struct.pack(">III", 3, 3, 1))
    stsz = box(b"stsz", bytes(4) + struct.pack(">II", 0, 7)
               + b"".join(struct.pack(">I", s) for s in sizes))
    stco = box(b"stco", bytes(4) + struct.pack(">I", 3)
               + struct.pack(">III", 1000, 2000, 5000))
    stss = box(b"stss", bytes(4) + struct.pack(">I", 2)
               + struct.pack(">II", 1, 5))
    stbl = box(b"stbl", stsc + stsz + stco + stss)
    b = box(b"moov", box(b"trak", box(b"mdia", box(b"minf", stbl))))
    got = M.parse_mp4_frame_index(b)
    want = [
        (0, 1000, 10, True), (1, 1010, 20, False),
        (2, 2000, 30, False), (3, 2030, 40, False),
        (4, 5000, 50, True), (5, 5050, 60, False), (6, 5110, 70, False),
    ]
    assert got == want


def test_mp4_frame_index_roundtrip_and_oracle(spark, ddb):
    """Synthesizer → parser roundtrip (offsets point at the real mdat
    payload bytes) and the exact DuckDB oracle on the driver fixture."""
    from dataframeutils_spark.operators import multimodal as M

    b = M.synthesize_mp4_indexed(320, 240, 19, 77)
    idx = M.parse_mp4_frame_index(b)
    assert len(idx) == 19
    for f, (sample, ofs, size, sync) in enumerate(idx):
        assert sample == f
        assert size == 64 + (77 + 17 * f) % 191
        assert sync == (f % 8 == 0)
        assert b[ofs : ofs + size] == bytes([(77 + f) % 256]) * size

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.mp4_indexed_media_table(docs)
    got = sorted(tuple(r) for r in M.mp4_frame_index(media).collect())
    want = sorted(tuple(t) for t in ddb.execute(M.mp4_frame_index_sql()).fetchall())
    assert got == want and len(got) > 500


def test_mp4_frame_index_selects_video_trak_on_multitrack():
    """Code-review regression: real files commonly mux the audio trak
    FIRST — the parser must select the trak whose hdlr handler is
    'vide' (with backtracking past traks that lack the path), not
    blindly descend the first trak."""
    import struct

    from dataframeutils_spark.operators import multimodal as M

    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    def trak(handler, sizes, chunk_ofs, syncs):
        hdlr = box(b"hdlr", bytes(4) + bytes(4) + handler + bytes(12) + b"\x00")
        stsz = box(b"stsz", bytes(4) + struct.pack(">II", 0, len(sizes))
                   + b"".join(struct.pack(">I", s) for s in sizes))
        stsc = box(b"stsc", bytes(4) + struct.pack(">IIII", 1, 1, len(sizes), 1))
        stco = box(b"stco", bytes(4) + struct.pack(">II", 1, chunk_ofs))
        stss = box(b"stss", bytes(4) + struct.pack(">I", len(syncs))
                   + b"".join(struct.pack(">I", s) for s in syncs))
        stbl = box(b"stbl", stsc + stsz + stco + stss)
        return box(b"trak", box(b"mdia", hdlr + box(b"minf", stbl)))

    audio = trak(b"soun", [111, 222, 333], 9000, [1, 2, 3])
    video = trak(b"vide", [10, 20], 4000, [1])
    b = box(b"moov", audio + video)
    got = M.parse_mp4_frame_index(b)
    assert got == [(0, 4000, 10, True), (1, 4010, 20, False)]

    # and with no video trak at all, fall back to the first sample table
    b2 = box(b"moov", trak(b"soun", [5, 6], 100, [2]))
    assert M.parse_mp4_frame_index(b2) == [(0, 100, 5, False), (1, 105, 6, True)]


def test_webm_frame_index_roundtrip_and_oracle(spark, ddb):
    """WebM synthesizer → EBML walker roundtrip (offsets point at the
    real SimpleBlock payload bytes across multiple Clusters) and the
    exact DuckDB oracle on the driver fixture — the mp4_frame_index
    test, EBML container."""
    from dataframeutils_spark.operators import multimodal as M

    b = M.synthesize_webm_indexed(320, 240, 29, 77)  # 3 Clusters (12/cluster)
    idx = M.parse_webm_frame_index(b)
    assert len(idx) == 29
    for f, (frame, ofs, size, key) in enumerate(idx):
        assert frame == f
        assert size == 64 + (77 + 17 * f) % 191
        assert key == (f % 8 == 0)
        assert b[ofs : ofs + size] == bytes([(77 + f) % 256]) * size

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.webm_indexed_media_table(docs)
    got = sorted(tuple(r) for r in M.webm_frame_index(media).collect())
    want = sorted(tuple(t) for t in ddb.execute(M.webm_frame_index_sql()).fetchall())
    assert got == want and len(got) > 500


def test_webm_parser_on_hand_built_general_ebml():
    """The walker must be a general EBML parser, not a synthesizer
    inverse: minimal-width size varints (not the synthesizer's fixed
    widths), a Void element between blocks, SeekHead before Info, and a
    3-byte cluster size all parse; frame numbering follows storage
    order across clusters."""
    from dataframeutils_spark.operators import multimodal as M

    def vint(val, width):  # EBML size varint
        return ((1 << (7 * width)) | val).to_bytes(width, "big")

    def block(track, ts, flags, payload):
        inner = bytes([0x80 | track]) + ts.to_bytes(2, "big") + bytes([flags]) + payload
        return b"\xa3" + vint(len(inner), 1) + inner  # 1-byte size varint

    # minimal EBML header: just DocType "webm" inside
    doctype = b"\x42\x82" + vint(4, 1) + b"webm"
    ebml = b"\x1a\x45\xdf\xa3" + vint(len(doctype), 1) + doctype
    void = b"\xec" + vint(3, 1) + b"\x00\x00\x00"
    seekhead = b"\x11\x4d\x9b\x74" + vint(0, 1)
    c1_payload = (
        b"\xe7" + vint(1, 1) + b"\x00"  # Timestamp, 1-byte value
        + block(1, 0, 0x80, b"KEYF1")
        + void
        + block(1, 40, 0x00, b"d2")
    )
    c2_payload = b"\xe7" + vint(1, 1) + b"\x50" + block(1, 0, 0x80, b"k3x")
    seg_payload = (
        seekhead
        + b"\x1f\x43\xb6\x75" + vint(len(c1_payload), 1) + c1_payload
        + b"\x1f\x43\xb6\x75" + vint(len(c2_payload), 3) + c2_payload
    )
    b = ebml + b"\x18\x53\x80\x67" + vint(len(seg_payload), 2) + seg_payload
    got = M.parse_webm_frame_index(b)
    assert [(f, b[o : o + s], k) for f, o, s, k in got] == [
        (0, b"KEYF1", True),
        (1, b"d2", False),
        (2, b"k3x", True),
    ]


def test_webm_parser_rejects_lacing_blockgroup_unknown_size():
    """Failure modes are rejected BY NAME, never silently mis-indexed:
    lacing bits, BlockGroup/Block, unknown-size elements, and a child
    overrunning its parent."""
    import pytest

    from dataframeutils_spark.operators import multimodal as M

    def vint(val, width):
        return ((1 << (7 * width)) | val).to_bytes(width, "big")

    doctype = b"\x42\x82" + vint(4, 1) + b"webm"
    ebml = b"\x1a\x45\xdf\xa3" + vint(len(doctype), 1) + doctype

    def seg(cluster_payload):
        c = b"\x1f\x43\xb6\x75" + vint(len(cluster_payload), 1) + cluster_payload
        return ebml + b"\x18\x53\x80\x67" + vint(len(c), 2) + c

    laced = b"\x81" + b"\x00\x00" + b"\x02" + b"xx"  # lacing bits 0b10
    with pytest.raises(ValueError, match="laced"):
        M.parse_webm_frame_index(seg(b"\xa3" + vint(len(laced), 1) + laced))

    bg = b"\xa0" + vint(2, 1) + b"\x00\x00"
    with pytest.raises(ValueError, match="BlockGroup"):
        M.parse_webm_frame_index(seg(bg))

    # unknown-size element (all size bits set)
    unk = ebml + b"\x18\x53\x80\x67" + b"\xff"
    with pytest.raises(ValueError, match="unknown-size"):
        M.parse_webm_frame_index(unk)

    # child claims more bytes than its parent holds
    bad = b"\xa3" + vint(200, 1) + b"\x81\x00\x00\x00"
    with pytest.raises(ValueError, match="overruns"):
        M.parse_webm_frame_index(seg(bad))

    with pytest.raises(ValueError, match="Segment"):
        M.parse_webm_frame_index(ebml)


def test_image_dhash_matches_oracle_and_catches_rescaled_dups(spark, ddb):
    """dHash over the REAL PNG decode path matches the gradient-formula
    oracle per image, and the dedup groups collapse genuinely
    re-scaled copies (same perceptual hash, different dimensions) that
    byte-level dedup cannot."""
    from dataframeutils_spark.operators import multimodal as M

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.real_media_table(docs)
    got = sorted(tuple(r) for r in M.image_dhash(media).collect())
    want = sorted(tuple(t) for t in ddb.execute(M.image_dhash_sql()).fetchall())
    assert got == want and len(got) > 100

    groups = M.image_dhash_dedup(media).collect()
    gw = sorted(tuple(r) for r in groups)
    ww = sorted(tuple(t) for t in ddb.execute(M.image_dhash_dedup_sql()).fetchall())
    assert gw == ww
    # the fixture produces at least one group of re-scaled (different
    # (w, h)) images sharing the perceptual hash
    assert any(r["n_distinct_dims"] > 1 for r in groups)


def test_image_dhash_rescale_invariance_and_sensitivity():
    """The property the hash exists for: a nearest-resampled copy of
    the same gradient content keeps the same dHash, while different
    content (shifted gradient) changes it."""
    import numpy as np

    from dataframeutils_spark.operators import multimodal as M

    base = M.decode_png_pixels(M.synthesize_png(48, 40))[2]
    # exact 2x pixel-replication upscale: floor-of-floor index
    # composition makes the dHash sampling grid hit identical source
    # pixels (floor(floor(96x/9)/2) == floor(48x/9))
    up = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    assert M._dhash_bands(base) == M._dhash_bands(up)
    shifted = (base.astype(np.int64) + np.arange(48)[None, ::-1] * 5) % 251
    assert M._dhash_bands(shifted) != M._dhash_bands(base)
    # RGB path: grey content in 3 channels hashes like its luma plane
    rgb = np.stack([base, base, base], axis=2)
    assert M._dhash_bands(rgb) == M._dhash_bands(base)


def test_image_hamming_pairs_pigeonhole_completeness(spark, ddb):
    """At max_dist ≤ 3 over 4 bands, the banded subquadratic path must
    return EXACTLY the brute-force pair set (pigeonhole: ≤ 3 differing
    bits leave ≥ 1 of 4 bands equal). The oracle IS the brute force."""
    from dataframeutils_spark.operators import multimodal as M

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.real_media_table(docs)
    # uncapped engine path ≡ brute-force oracle (the pigeonhole claim)
    got = sorted(
        tuple(r)
        for r in M.image_hamming_pairs(media, max_dist=3, bucket_cap=None).collect()
    )
    want = sorted(
        tuple(t)
        for t in ddb.execute(M.image_hamming_pairs_sql(bucket_cap=None)).fetchall()
    )
    assert got == want and len(got) > 0
    # default (capped) engine path ≡ capped oracle EXACTLY — even
    # though this gradient fixture's hot buckets (max occupancy 100)
    # overflow DEFAULT_IMG_BUCKET_CAP=64, the deterministic hash-order
    # cap keeps the same entries in both engines; the capped set is a
    # strict, bounded subset of brute force (graceful recall trade)
    got_cap = sorted(
        tuple(r) for r in M.image_hamming_pairs(media, max_dist=3).collect()
    )
    want_cap = sorted(
        tuple(t) for t in ddb.execute(M.image_hamming_pairs_sql()).fetchall()
    )
    assert got_cap == want_cap
    assert set(got_cap) < set(got)
    # negative control: at distance 4 the guarantee genuinely breaks —
    # a pair with exactly one differing bit per band shares no band,
    # so the band join misses it while brute force finds it
    h = [(1, 0, 0, 0, 0), (2, 1, 1 << 7, 1 << 3, 1 << 11)]
    import itertools

    def brute(pairs, d):
        out = []
        for (ia, *a), (ib, *b) in itertools.combinations(pairs, 2):
            ham = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
            if ham <= d:
                out.append((ia, ib, ham))
        return out

    assert brute(h, 4) == [(1, 2, 4)]  # brute force finds it...
    shared = any(a == b for a, b in zip(h[0][1:], h[1][1:]))
    assert not shared  # ...but no band matches: banded recall < 1 at d=4


def test_image_hamming_pairs_size_guard(spark):
    """The legacy max_rows refusal is still available (opt-in) for the
    uncapped path; the DEFAULT path no longer needs or runs it."""
    from dataframeutils_spark.operators import multimodal as M

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.real_media_table(docs)
    import pytest

    with pytest.raises(ValueError, match="max_rows"):
        M.image_hamming_pairs(media, bucket_cap=None, max_rows=3)


def test_image_hamming_pairs_occupancy_cap_degrades_gracefully(spark, ddb):
    """Replica-clique corpus (the hot-bucket pathology): every image
    duplicated 3× lands whole cliques in one dHash bucket per band.
    The capped path must (a) run without refusing, (b) return a
    BOUNDED subset of the uncapped pair set, and (c) match the capped
    DuckDB oracle exactly — the cap is a deterministic portable-hash
    order, not a random sample."""
    from dataframeutils_spark.operators import multimodal as M

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 20")
    )
    # same text → same md5 → identical synthesized PNG; keep id parity
    # (even ids are images) so each even doc becomes a clique of 3
    dup = (
        docs.union(docs.selectExpr("doc_id + 1000 AS doc_id", "text"))
        .union(docs.selectExpr("doc_id + 2000 AS doc_id", "text"))
    )
    media = M.real_media_table(dup)
    capped = sorted(
        tuple(r)
        for r in M.image_hamming_pairs(media, max_dist=3, bucket_cap=2).collect()
    )
    uncapped = sorted(
        tuple(r)
        for r in M.image_hamming_pairs(
            media, max_dist=3, bucket_cap=None
        ).collect()
    )
    ddb.execute(
        "CREATE OR REPLACE VIEW docs_dup AS "
        "SELECT doc_id, text FROM documents WHERE doc_id < 20 "
        "UNION ALL SELECT doc_id + 1000, text FROM documents WHERE doc_id < 20 "
        "UNION ALL SELECT doc_id + 2000, text FROM documents WHERE doc_id < 20"
    )
    want = sorted(
        tuple(t)
        for t in ddb.execute(
            M.image_hamming_pairs_sql(table="docs_dup", bucket_cap=2)
        ).fetchall()
    )
    assert capped == want
    # every clique of 3 identical hashes collapses to the ≤ cap²/2 = 1
    # surviving pair — strictly fewer pairs than the uncapped join, and
    # a strict subset of it (recall bounded, never wrong pairs)
    assert 0 < len(capped) < len(uncapped)
    assert set(capped) <= set(uncapped)


def test_audio_fingerprint_matches_oracle_and_groups_resampled(spark, ddb):
    """The windowed-energy fingerprint over the REAL WAV decode path
    matches the sawtooth-formula oracle per clip, and the dedup groups
    collapse re-sampled copies (same signal content at different
    sample rates)."""
    from dataframeutils_spark.operators import multimodal as M

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.real_media_table(docs)
    got = sorted(tuple(r) for r in M.audio_fingerprint(media).collect())
    want = sorted(tuple(t) for t in ddb.execute(M.audio_fingerprint_sql()).fetchall())
    assert got == want and len(got) > 100

    groups = M.audio_fingerprint_dedup(media).collect()
    gw = sorted(tuple(r) for r in groups)
    ww = sorted(
        tuple(t) for t in ddb.execute(M.audio_fingerprint_dedup_sql()).fetchall()
    )
    assert gw == ww
    assert any(r["n_distinct_rates"] > 1 for r in groups)


def test_audio_fingerprint_gain_invariance_and_sensitivity():
    """The property the fingerprint exists for: scaling the signal
    (gain change) preserves the delta-sign bits; different content
    (reversed signal) changes them. Short clips (< 32 samples, empty
    windows) must not crash or depend on NULL-vs-0 semantics."""
    import numpy as np

    from dataframeutils_spark.operators import multimodal as M

    sig = np.array(
        [(i * 257) % 32768 - 16384 for i in range(300)], dtype=np.int16
    ).reshape(-1, 1)
    fp = M._audio_fp(sig)
    assert M._audio_fp(sig // 2) == fp  # gain-scaled copy
    assert M._audio_fp(sig[::-1]) != fp  # reversed content
    short = sig[:20]
    assert isinstance(M._audio_fp(short), int)  # empty windows ok
