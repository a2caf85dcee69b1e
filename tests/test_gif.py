"""Dependency-free GIF codec (functions/gif.py) — the LZW half of the
reference's GetImage surface (core/example.go:137-146 decodes JPEG/PNG/GIF).

Cross-validated against the JVM's javax.imageio GIF reader/writer (an
independent implementation reachable through the Spark gateway), not just
round-tripped against itself.
"""

from __future__ import annotations

import numpy as np
import pytest

from go_tfdata_spark.functions.gif import decode_gif, encode_gif
from go_tfdata_spark.functions.png import decode_image, sniff_format


def _indexed(h, w, ncolors, seed=0):
    """Random image drawn from a small fixed palette (GIF-representable)."""
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.randint(0, ncolors, size=(h, w))
    return palette[idx]


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (33, 47), (64, 64)])
def test_gif_roundtrip(shape, interlace):
    img = _indexed(*shape, ncolors=min(11, shape[0] * shape[1]), seed=shape[0])
    back = decode_gif(encode_gif(img, interlace=interlace))
    np.testing.assert_array_equal(back, img)


def test_gif_roundtrip_grey_and_many_colors():
    rng = np.random.RandomState(9)
    grey = rng.randint(0, 256, size=(21, 34), dtype=np.uint8)
    back = decode_gif(encode_gif(grey))
    np.testing.assert_array_equal(back, np.repeat(grey[:, :, None], 3, axis=2))
    # 256 distinct colors exercises the full code-width ramp (3 -> 9 bits)
    img = _indexed(48, 48, 256, seed=5)
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)
    with pytest.raises(ValueError, match="256"):
        encode_gif(rng.randint(0, 256, size=(40, 40, 3), dtype=np.uint8))


def test_gif_long_run_triggers_dictionary_clear():
    """>4096 dictionary entries forces a mid-stream CLEAR + table reset."""
    rng = np.random.RandomState(2)
    img = _indexed(120, 120, 4, seed=2)
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_gif_transparency_leaves_background():
    img = _indexed(6, 8, 3, seed=1)
    data = encode_gif(img, transparent_idx=0)
    out = decode_gif(data)
    # transparent pixels keep the background (index 0 of the color table,
    # since bg_idx=0): they decode to the palette color AT index 0 anyway
    # here, so equality still holds — the GCE parse path is what's covered.
    np.testing.assert_array_equal(out.shape, img.shape)


def test_gif_matches_jvm_imageio(spark):
    """Our decoder vs javax.imageio on the SAME bytes (both directions)."""
    jvm = spark.sparkContext._jvm
    h, w = 23, 31
    img = _indexed(h, w, 17, seed=7)

    def jvm_decode(data: bytes) -> np.ndarray:
        bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
        bi = jvm.javax.imageio.ImageIO.read(bais)
        got = np.zeros((bi.getHeight(), bi.getWidth(), 3), dtype=np.uint8)
        for y in range(bi.getHeight()):
            for x in range(bi.getWidth()):
                rgb = bi.getRGB(x, y) & 0xFFFFFF
                got[y, x] = [(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF]
        return got

    # ours encode -> JVM decode
    ours = encode_gif(img)
    np.testing.assert_array_equal(jvm_decode(ours), img)
    # JVM encode (TYPE_INT_RGB quantized by its writer) -> both decoders agree
    bi = jvm.java.awt.image.BufferedImage(w, h, 1)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            rgb = (r << 16) | (g << 8) | b
            bi.setRGB(x, y, rgb - (1 << 32) if rgb >= (1 << 31) else rgb)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "gif", baos)
    jvm_gif = bytes(baos.toByteArray())
    np.testing.assert_array_equal(decode_gif(jvm_gif), jvm_decode(jvm_gif))


def test_gif_dispatch_and_featurize(spark):
    """sniff_format routes gif to the REAL decoder end-to-end: a GIF payload
    reports its true pixel dimensions through decode_and_featurize."""
    from go_tfdata_spark.functions.multimodal import decode_and_featurize

    img = _indexed(18, 26, 9, seed=3)
    data = encode_gif(img)
    assert sniff_format(data) == "gif"
    np.testing.assert_array_equal(decode_image(data), img)
    df = spark.createDataFrame(
        [(0, "image", bytearray(data), None)],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    row = decode_and_featurize(df).collect()[0]
    assert (row.width, row.height) == (26, 18)
    assert len(row.feature) == 16
