"""Baseline-JPEG codec tests. Besides the oracle parity the driver
gate re-checks, the codec is validated against INDEPENDENT
implementations so self-consistency can't mask non-compliance (the
lesson from the GIF width-schedule episode): repo-encoded streams must
decode EXACTLY under Java ImageIO (Spark's `image` data source — an
unrelated JPEG implementation), and real-world libjpeg-encoded photos
must decode under the repo decoder to within IDCT/chroma-upsampling
tolerance of ImageIO's output."""
import glob
import os

import numpy as np
import pytest

from dataframeutils_spark.operators import jpeg as J
from dataframeutils_spark.operators import multimodal as M


def _gradient(w, h, s):
    return np.fromfunction(
        lambda y, x: (11 * (x // 8) + 17 * (y // 8) + s) % 256, (h, w)
    )


def test_jpeg_roundtrip_exact():
    """Block-constant rasters survive JPEG exactly (DC-only blocks,
    q00=8) — the encoder's own decoder must reproduce them
    bit-for-bit, including non-multiple-of-8 edge padding and DC
    categories through the full +-255 diff range."""
    for (w, h, s) in [(8, 8, 0), (9, 9, 250), (16, 24, 7), (23, 17, 100),
                      (57, 41, 200), (64, 64, 33), (56, 9, 128)]:
        b = J.synthesize_jpeg(w, h, s)
        W, H, img = J.decode_jpeg_pixels(b)
        assert (W, H) == (w, h) and img.shape == (h, w)
        assert (img == _gradient(w, h, s)).all(), (w, h, s)


def test_jpeg_metadata_parser_agrees():
    b = J.synthesize_jpeg(23, 17, 5)
    assert M._parse_jpeg(b) == (23, 17, 1)


def test_jpeg_lossless_sof_raises():
    """Unsupported SOF processes must raise with the marker named, not
    mis-decode. Build a minimal SOF3 (lossless) header to check."""
    b = bytes.fromhex("ffd8" "ffc3" "000b" "08" "0010" "0010" "01" "011100")
    with pytest.raises(NotImplementedError, match="0xc3"):
        J.decode_jpeg_pixels(b)


def test_jpeg_progressive_matches_imageio(spark):
    """Progressive (SOF2) decode — spectral selection, successive
    approximation, EOB runs — cross-validated against ImageIO on the
    real progressive files shipped on the machine. Both are grayscale
    or 4:4:4, so agreement must be within +-2 everywhere and +-1 for
    99.9%+ (pure IDCT rounding, no upsampling policy in play)."""
    paths = [
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
        "multi-channel/grayscale.jpg",
        "/usr/share/doc/nodejs/thin-white-stripe.jpg",
        "/usr/share/doc/nodejs/full-white-stripe.jpg",
    ]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        pytest.skip("progressive samples not present")
    for p in paths:
        ext = _imageio_decode(spark, p).astype(int)
        with open(p, "rb") as fh:
            W, H, mine = J.decode_jpeg_pixels(fh.read())
        diff = np.abs(mine.astype(int) - ext)
        assert diff.max() <= 2 and (diff <= 1).mean() > 0.999, p


def test_jpeg_decodes_real_baseline_corpus():
    """Every real baseline JPEG on the machine must decode: Huffman or
    width/dequant bugs desync the entropy stream within a few MCUs and
    throw, so decode success over real photos (4:2:0 kittens, 4:4:4
    diagrams) is the compliance floor; the pixel-level check against
    ImageIO below is the ceiling."""
    paths = sorted(
        glob.glob(
            "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/*.jpg"
        )
    )
    if not paths:
        pytest.skip("spark sample images not present")
    for p in paths:
        with open(p, "rb") as fh:
            W, H, img = J.decode_jpeg_pixels(fh.read())
        assert img.shape == (H, W, 3) and 20 < img.mean() < 235, p


def _imageio_decode(spark, path):
    row = spark.read.format("image").load(path).select("image.*").collect()[0]
    a = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
        row.height, row.width, row.nChannels
    )
    return a[..., ::-1] if row.nChannels == 3 else a[..., 0]


def test_jpeg_encoder_exact_under_imageio(spark, tmp_path):
    """Cross-decoder conformance: Java ImageIO (independent codebase)
    must reproduce repo-encoded pixels EXACTLY — block-constant
    rasters are decoder-invariant, so any deviation is an encoder
    format bug, not a tolerance issue."""
    for (w, h, s) in [(23, 17, 100), (57, 41, 7), (64, 64, 200)]:
        p = tmp_path / f"g{w}x{h}.jpg"
        p.write_bytes(J.synthesize_jpeg(w, h, s))
        ext = _imageio_decode(spark, str(p))
        if ext.ndim == 3:
            ext = ext[..., 0]
        assert (ext == _gradient(w, h, s)).all(), (w, h, s)


def test_jpeg_decoder_matches_imageio_on_real_photo(spark):
    """Pixel-level agreement with ImageIO on a real libjpeg-encoded
    4:2:0 photo: 99%+ of RGB samples within +-2 (remaining tail is
    chroma upsampling policy — nearest here vs fancy in ImageIO; on
    4:4:4 inputs agreement is within +-1 everywhere)."""
    p = (
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/"
        "29.5.a_b_EGDP022204.jpg"
    )
    if not os.path.exists(p):
        pytest.skip("spark sample images not present")
    ext = _imageio_decode(spark, p).astype(int)
    with open(p, "rb") as fh:
        W, H, mine = J.decode_jpeg_pixels(fh.read())
    diff = np.abs(mine.astype(int) - ext)
    assert diff.mean() < 1.0 and (diff <= 2).mean() > 0.99


def test_jpeg_block_stats_matches_oracle(spark, ddb):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = M.jpeg_media_table(docs)
    got = sorted(tuple(r) for r in M.jpeg_block_stats(media).collect())
    want = sorted(tuple(t) for t in ddb.execute(M.jpeg_block_stats_sql()).fetchall())
    assert got == want and len(got) > 0
