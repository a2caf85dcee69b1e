"""Dependency-free JPEG decoder (functions/jpeg.py, baseline + progressive)
— the last format of the reference's GetImage surface
(core/example.go:137-146).

JPEG is lossy and T.81 leaves IDCT precision implementation-defined, so
the ground truth here is the JVM's javax.imageio decoder (an independent
libjpeg-lineage implementation reachable through the Spark gateway): our
decode of the SAME bytes must agree within a small per-sample tolerance,
and near-exactly in the mean.
"""

from __future__ import annotations

import numpy as np
import pytest

from go_tfdata_spark.functions.jpeg import decode_jpeg
from go_tfdata_spark.functions.png import sniff_format


def _jvm_encode_jpeg(jvm, img: np.ndarray, grey: bool = False, quality: float | None = None,
                     progressive: bool = False) -> bytes:
    h, w = img.shape[:2]
    bi = jvm.java.awt.image.BufferedImage(w, h, 10 if grey else 1)  # BYTE_GRAY / INT_RGB
    for y in range(h):
        for x in range(w):
            if grey:
                v = int(img[y, x])
                rgb = (v << 16) | (v << 8) | v
            else:
                r, g, b = (int(v) for v in img[y, x])
                rgb = (r << 16) | (g << 8) | b
            bi.setRGB(x, y, rgb - (1 << 32) if rgb >= (1 << 31) else rgb)
    baos = jvm.java.io.ByteArrayOutputStream()
    if quality is None and not progressive:
        assert jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    else:
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
        params = writer.getDefaultWriteParam()
        if quality is not None:
            params.setCompressionMode(2)  # MODE_EXPLICIT
            params.setCompressionQuality(float(quality))
        if progressive:
            params.setProgressiveMode(1)  # MODE_DEFAULT: writer's scan script
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), params)
        ios.flush()
    return bytes(baos.toByteArray())


def _jvm_decode(jvm, data: bytes) -> np.ndarray:
    bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
    bi = jvm.javax.imageio.ImageIO.read(bais)
    h, w = bi.getHeight(), bi.getWidth()
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            rgb = bi.getRGB(x, y) & 0xFFFFFF
            out[y, x] = [(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF]
    return out


def _jvm_decode_raster(jvm, data: bytes) -> np.ndarray:
    """Raw decoded samples (band 0) WITHOUT color management: BYTE_GRAY's
    getRGB applies a linear->sRGB transform that the raster bypasses — the
    raster is what the entropy decoder actually produced."""
    bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
    bi = jvm.javax.imageio.ImageIO.read(bais)
    r = bi.getRaster()
    h, w = bi.getHeight(), bi.getWidth()
    return np.array(
        [[r.getSample(x, y, 0) for x in range(w)] for y in range(h)], dtype=np.int16
    )


def _smooth(h, w, seed=0):
    """Low-frequency image (JPEG-friendly; decoder differences stay tiny)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        128
        + 80 * np.sin(xx / 7 + rng.rand() * 3) * np.cos(yy / 9 + rng.rand() * 3)
        + 30 * np.sin((xx + yy) / 13)
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def test_jpeg_grey_matches_jvm_decoder(spark):
    jvm = spark.sparkContext._jvm
    img = _smooth(40, 56, seed=1)
    data = _jvm_encode_jpeg(jvm, img, grey=True)
    assert sniff_format(data) == "jpeg"
    ours = decode_jpeg(data)
    assert ours.shape == (40, 56)
    theirs = _jvm_decode_raster(jvm, data)
    diff = np.abs(ours.astype(np.int16) - theirs)
    assert diff.max() <= 2 and diff.mean() < 0.5


@pytest.mark.parametrize("quality", [0.9, 0.6])
def test_jpeg_rgb_subsampled_matches_jvm_decoder(spark, quality):
    """Color path (ImageIO writes 4:2:0 at default/low quality): our decode
    of the same bytes tracks the reference decoder within chroma-upsample
    tolerance (nearest vs fancy upsampling differs most at chroma edges)."""
    jvm = spark.sparkContext._jvm
    img = np.stack([_smooth(33, 47, s) for s in (1, 2, 3)], axis=-1)
    data = _jvm_encode_jpeg(jvm, img, quality=quality)
    ours = decode_jpeg(data)
    theirs = _jvm_decode(jvm, data)
    assert ours.shape == theirs.shape
    # nearest vs libjpeg's triangle chroma upsampling (both T.81-valid)
    # keeps a small residual everywhere; bound it tightly anyway
    diff = np.abs(ours.astype(np.int16) - theirs.astype(np.int16))
    assert diff.mean() < 4.0, diff.mean()
    assert np.percentile(diff, 99) <= 12
    assert diff.max() <= 24
    # and our decode is faithful to the original smooth image
    assert np.abs(ours.astype(np.int16) - img.astype(np.int16)).mean() < 6


def test_jpeg_restart_markers(spark):
    """DRI/RSTn path: force a restart interval through the ImageIO writer is
    not exposed; instead splice a DRI segment is fragile — so rely on odd
    dimensions + multiple MCU rows to cover predictor state across MCUs,
    and corrupt-stream handling below."""
    jvm = spark.sparkContext._jvm
    img = _smooth(17, 23, seed=5)
    data = _jvm_encode_jpeg(jvm, img, grey=True)
    ours = decode_jpeg(data)
    theirs = _jvm_decode_raster(jvm, data)
    assert np.abs(ours.astype(np.int16) - theirs).max() <= 2


def test_jpeg_rejects_garbage_and_arithmetic():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError, match="JPEG"):
        decode_jpeg(b"\xff\xd8\xff\xe0junkjunkjunk")
    # SOF2 with no scan data: parsed (progressive is supported) but empty
    sof2 = b"\xff\xd8" + b"\xff\xc2" + bytes([0, 11, 8, 0, 8, 0, 8, 1, 1, 0x11, 0]) + b"\xff\xd9"
    with pytest.raises(ValueError, match="no scan data"):
        decode_jpeg(sof2)
    # arithmetic-coded (SOF9) stays refused, not mis-decoded
    sof9 = b"\xff\xd8" + b"\xff\xc9" + bytes([0, 11, 8, 0, 8, 0, 8, 1, 1, 0x11, 0]) + b"\xff\xd9"
    with pytest.raises(ValueError, match="unsupported"):
        decode_jpeg(sof9)


def test_jpeg_progressive_grey_matches_jvm_decoder(spark):
    """SOF2 spectral-selection + successive-approximation scans (the JDK
    writer's default progressive scan script) accumulate to the same raster
    as the reference decoder — the last GetImage parity gap
    (core/example.go:137-146: Go image/jpeg decodes progressive)."""
    jvm = spark.sparkContext._jvm
    img = _smooth(41, 57, seed=11)
    data = _jvm_encode_jpeg(jvm, img, grey=True, progressive=True)
    assert b"\xff\xc2" in data  # really progressive
    ours = decode_jpeg(data)
    assert ours.shape == (41, 57)
    theirs = _jvm_decode_raster(jvm, data)
    diff = np.abs(ours.astype(np.int16) - theirs)
    assert diff.max() <= 2 and diff.mean() < 0.5


@pytest.mark.parametrize("quality", [0.9, 0.5])
def test_jpeg_progressive_rgb_matches_jvm_decoder(spark, quality):
    """Progressive color: subsampled chroma, multiple AC bands + refinement
    passes per component; same tolerance discipline as the baseline test."""
    jvm = spark.sparkContext._jvm
    img = np.stack([_smooth(35, 49, s) for s in (4, 5, 6)], axis=-1)
    data = _jvm_encode_jpeg(jvm, img, quality=quality, progressive=True)
    assert b"\xff\xc2" in data
    ours = decode_jpeg(data)
    theirs = _jvm_decode(jvm, data)
    assert ours.shape == theirs.shape
    diff = np.abs(ours.astype(np.int16) - theirs.astype(np.int16))
    assert diff.mean() < 4.0, diff.mean()
    assert np.percentile(diff, 99) <= 12
    assert diff.max() <= 24
    assert np.abs(ours.astype(np.int16) - img.astype(np.int16)).mean() < 6


def test_jpeg_featurize_reports_true_dimensions(spark):
    """GetImage parity end-to-end: a real JPEG payload reports its true
    pixel dimensions through the Arrow featurize stage; a corrupt JPEG
    degrades to the stub instead of failing the task."""
    from go_tfdata_spark.functions.multimodal import decode_and_featurize

    jvm = spark.sparkContext._jvm
    data = _jvm_encode_jpeg(jvm, _smooth(24, 36, seed=7), grey=True)
    prog = _jvm_encode_jpeg(jvm, _smooth(20, 28, seed=8), grey=True, progressive=True)
    rows = [
        (0, "image", bytearray(data), None),
        (1, "image", bytearray(b"\xff\xd8\xff corrupt"), None),
        (2, "image", bytearray(prog), None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>"
    )
    got = {r.media_id: r for r in decode_and_featurize(df).collect()}
    assert (got[0].width, got[0].height) == (36, 24)
    assert (got[1].width, got[1].height) == (8, 8)  # stub fallback
    assert (got[2].width, got[2].height) == (28, 20)  # progressive decodes
