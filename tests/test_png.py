"""Dependency-free PNG/PPM codec (functions/png.py) — the real-image half
of the reference's AddImage/GetImage surface (core/example.go:131-146).

Cross-validated against the JVM's javax.imageio (an independent PNG
implementation reachable through the Spark gateway), not just round-tripped
against itself.
"""

from __future__ import annotations

import numpy as np
import pytest

from go_tfdata_spark.functions.png import (
    decode_image,
    decode_png,
    decode_ppm,
    encode_png,
    encode_ppm,
    sniff_format,
)


def _img(h, w, ch=None, seed=0):
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("ch", [None, 2, 3, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_channels(ch, ftype):
    img = _img(13, 17, ch, seed=ftype)
    back = decode_png(encode_png(img, filter_type=ftype))
    np.testing.assert_array_equal(back, img)


def test_png_chunk_crc_and_signature_guard():
    img = _img(4, 4, 3)
    data = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + bytes(data)[4:])
    data[40] ^= 0xFF  # flip a byte inside IDAT -> chunk CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_matches_jvm_imageio(spark):
    """Decode a PNG produced by an INDEPENDENT encoder (javax.imageio) and
    have that encoder decode ours — byte-exact pixels both directions."""
    jvm = spark.sparkContext._jvm
    h, w = 9, 11
    img = _img(h, w, 3, seed=42)
    # JVM-side encode: BufferedImage TYPE_INT_RGB -> PNG bytes
    bi = jvm.java.awt.image.BufferedImage(w, h, 1)  # 1 = TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            rgb = (r << 16) | (g << 8) | b
            bi.setRGB(x, y, rgb - (1 << 32) if rgb >= (1 << 31) else rgb)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "png", baos)
    jvm_png = bytes(baos.toByteArray())
    np.testing.assert_array_equal(decode_png(jvm_png), img)
    # Our encode -> JVM decode
    ours = encode_png(img, filter_type=4)
    bais = jvm.java.io.ByteArrayInputStream(bytearray(ours))
    bi2 = jvm.javax.imageio.ImageIO.read(bais)
    got = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            rgb = bi2.getRGB(x, y) & 0xFFFFFF
            got[y, x] = [(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF]
    np.testing.assert_array_equal(got, img)


def test_ppm_roundtrip_and_comment_header():
    rgb = _img(5, 7, 3)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(rgb)), rgb)
    grey = _img(6, 4)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(grey)), grey)
    # whitespace/comment-laced header is legal NetPBM
    hand = b"P6\n# a comment\n 3\n2 \n255\n" + bytes(range(18))
    assert decode_ppm(hand).shape == (2, 3, 3)


def test_sniff_and_decode_dispatch():
    img = _img(3, 3, 3)
    assert sniff_format(encode_png(img)) == "png"
    assert sniff_format(encode_ppm(img)) == "ppm"
    assert sniff_format(b"\xff\xd8\xff\xe0junk") == "jpeg"
    assert sniff_format(b"GIF89ajunk") == "gif"
    assert sniff_format(b"plain text") is None
    np.testing.assert_array_equal(decode_image(encode_png(img)), img)
    # jpeg now routes to the real baseline decoder; garbage still raises
    with pytest.raises(ValueError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0junk")


def test_decode_and_featurize_reports_true_png_dimensions(spark):
    """T7 end-to-end: PNG payloads in a media table come back with their
    REAL pixel dimensions through the Arrow plumbing (stub only for formats
    the container cannot decode)."""
    from go_tfdata_spark.functions.multimodal import decode_and_featurize

    rows = [
        (0, "image", bytearray(encode_png(_img(24, 32, 3, seed=1))), None),
        (1, "image", bytearray(encode_ppm(_img(10, 20, 3, seed=2))), None),
        (2, "image", bytearray(b"\xff\xd8\xff not really jpeg"), None),  # -> stub
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    got = {r.media_id: r for r in decode_and_featurize(df).collect()}
    assert (got[0].width, got[0].height) == (32, 24)
    assert (got[1].width, got[1].height) == (20, 10)
    assert (got[2].width, got[2].height) == (8, 8)  # deterministic stub grid
    assert all(len(got[i].feature) == 16 for i in range(3))
