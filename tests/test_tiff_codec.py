"""TIFF codec ground truth — baseline TIFF 6.0 from the public spec.

TIFF is lossless, so encoder/decoder equality is exact across every
(compression x byte order x predictor x strip layout) combination; the
decoder additionally proves itself on HAND-ASSEMBLED streams (palette
images, WhiteIsZero polarity) the encoder never emits.  The LZW here is
the TIFF variant — MSB-first packing with the spec's EARLY code-width
change — which the tests distinguish from GIF's late-change LZW.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from foglamp_filter_python35_spark.functions import multimodal as mm
from foglamp_filter_python35_spark.functions import tiff as T

try:
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_exact_all_variants(compression, big_endian):
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(50, 37, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(33, 41), dtype=np.uint8)
    for img in (rgb, gray):
        want = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
        preds = (False, True) if compression != "none" else (False,)
        for predictor in preds:
            for rps in (None, 7):
                payload = T.encode_tiff(
                    img,
                    compression=compression,
                    big_endian=big_endian,
                    predictor=predictor,
                    rows_per_strip=rps,
                )
                assert np.array_equal(T._tiff_pixels(payload), want)


@pytest.mark.slow
def test_lzw_width_growth_and_early_change():
    """256x256 noise pushes the TIFF-LZW table through every code width
    to the 12-bit cap and across a CLEAR reset; smooth gradients under
    predictor+LZW must actually compress (i.e., the dictionary is
    real, not a byte copier)."""
    rng = np.random.default_rng(2)
    big = rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8)
    assert np.array_equal(T._tiff_pixels(T.encode_tiff(big, compression="lzw")), big)
    smooth = np.tile(np.arange(64, dtype=np.uint8) * 4, (48, 1))
    smooth3 = np.stack([smooth, smooth // 2, 255 - smooth], axis=-1)
    payload = T.encode_tiff(smooth3, compression="lzw", predictor=True)
    assert len(payload) < smooth3.size // 2
    assert np.array_equal(T._tiff_pixels(payload), smooth3)


def test_tiff_lzw_differs_from_gif_lzw():
    """The two LZW variants in this repo are NOT interchangeable: TIFF
    packs MSB-first with early change, GIF LSB-first with late change.
    Feeding one's output to the other must fail or mis-decode, never
    silently agree — guards against 'unifying' them incorrectly."""
    from foglamp_filter_python35_spark.functions import gif as G

    data = bytes(np.random.default_rng(3).integers(0, 8, size=500, dtype=np.uint8))
    tiff_stream = T._lzw_encode_tiff(data)
    try:
        via_gif = bytes(G._lzw_decode(8, tiff_stream, len(data)))
        assert via_gif != data
    except ValueError:
        pass


def _hand_ifd(bo, entries, pixel_data):
    """Minimal single-strip IFD writer for decoder-only shapes."""
    n = len(entries) + 2
    ifd_size = 2 + 12 * n + 4
    tail = bytearray()
    tail_base = 8 + ifd_size

    def field(typ, values):
        fmt = {3: "H", 4: "I"}[typ]
        packed = struct.pack(bo + str(len(values)) + fmt, *values)
        if len(packed) <= 4:
            return packed.ljust(4, b"\x00")
        off = tail_base + len(tail)
        tail.extend(packed)
        return struct.pack(bo + "I", off)

    rows = [(t, typ, len(v), field(typ, v)) for t, typ, v in entries]
    strip_off = tail_base + len(tail)
    rows.append((273, 4, 1, field(4, [strip_off])))
    rows.append((279, 4, 1, field(4, [len(pixel_data)])))
    rows.sort(key=lambda r: r[0])
    out = bytearray(b"MM\x00*" if bo == ">" else b"II*\x00")
    out += struct.pack(bo + "I", 8) + struct.pack(bo + "H", n)
    for tag, typ, count, f in rows:
        out += struct.pack(bo + "HHI", tag, typ, count) + f
    out += struct.pack(bo + "I", 0) + tail + pixel_data
    return bytes(out)


def test_hand_assembled_palette_tiff():
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    cmap = [0] * 768
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (17, 34, 51)]
    for i, (r, g, b) in enumerate(colors):
        cmap[i] = r << 8
        cmap[256 + i] = g << 8
        cmap[512 + i] = b << 8
    payload = _hand_ifd(
        "<",
        [
            (256, 4, [2]),
            (257, 4, [2]),
            (258, 3, [8]),
            (259, 3, [1]),
            (262, 3, [3]),
            (277, 3, [1]),
            (278, 4, [2]),
            (320, 3, cmap),
        ],
        idx.tobytes(),
    )
    px = T._tiff_pixels(payload)
    assert px.tolist() == [[list(c) for c in colors[:2]],
                           [list(c) for c in colors[2:]]]


def test_hand_assembled_white_is_zero():
    gray = np.array([[0, 255], [128, 64]], dtype=np.uint8)
    payload = _hand_ifd(
        ">",
        [
            (256, 4, [2]),
            (257, 4, [2]),
            (258, 3, [8]),
            (259, 3, [1]),
            (262, 3, [0]),  # WhiteIsZero: inverted polarity
            (277, 3, [1]),
            (278, 4, [2]),
        ],
        gray.tobytes(),
    )
    px = T._tiff_pixels(payload)
    assert np.array_equal(px[:, :, 0], 255 - gray)


def test_decode_media_and_resize_dispatch(spark):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    for payload in (
        T.encode_tiff(img, compression="lzw"),
        T.encode_tiff(img, big_endian=True),
    ):
        m = mm.decode_media(payload)
        assert m["kind"] == "image/tiff"
        assert (m["width"], m["height"]) == (10, 12)
    small = T.decode_tiff(mm.resize_media(T.encode_tiff(img), 5, 6))
    assert (small["width"], small["height"]) == (5, 6)
    # unsupported compression degrades with the reason recorded
    bad = bytearray(T.encode_tiff(img))
    # patch the compression tag value (type SHORT, tag 259) to 4 (G4 fax)
    i = bad.find(struct.pack("<HH", 259, 3))
    bad[i + 8] = 4
    out = mm.decode_media(bytes(bad))
    assert out["kind"] == "opaque"
    assert "unsupported TIFF compression 4" in out["decode_error"]
    # Arrow kernel end-to-end
    df = spark.createDataFrame(
        [(1, T.encode_tiff(img, compression="packbits"))],
        "doc_id long, payload binary",
    )
    row = mm.extract_media_meta(df).collect()[0]
    assert row.kind == "image/tiff" and (row.width, row.height) == (10, 12)


if _HAVE_HYPOTHESIS:

    @settings(max_examples=25, deadline=None)
    @given(
        h=hst.integers(min_value=1, max_value=24),
        w=hst.integers(min_value=1, max_value=24),
        seed=hst.integers(min_value=0, max_value=2**31),
        compression=hst.sampled_from(["none", "packbits", "lzw"]),
        big_endian=hst.booleans(),
    )
    def test_roundtrip_property(h, w, seed, compression, big_endian):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = T.encode_tiff(
            img, compression=compression, big_endian=big_endian
        )
        assert np.array_equal(T._tiff_pixels(payload), img)
