"""GIF codec ground truth — from-spec LZW + container, stdlib + numpy.

GIF is LOSSLESS for <= 256-color content, so encoder/decoder equality
is exact, and the decoder additionally proves itself on HAND-ASSEMBLED
streams (partial frames at an offset, transparency) that the encoder
never emits — the decode paths are not a closed loop with the encoder.
"""

from __future__ import annotations

import numpy as np
import pytest

from foglamp_filter_python35_spark.functions import gif as G
from foglamp_filter_python35_spark.functions import multimodal as mm

try:
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


def _paletted(h, w, n_colors, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, size=(h, w))]


@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_exact(interlace):
    img = _paletted(40, 33, 6, seed=1)
    out, frames = G.gif_frames(G.encode_gif(img, interlace=interlace))
    assert len(frames) == 1
    assert np.array_equal(out, img)


def test_256_colors_hits_code_growth_and_table_reset():
    """128x128 with 256 distinct colors drives the LZW code width
    through every size to the 12-bit cap and across a CLEAR reset."""
    rng = np.random.default_rng(2)
    base = rng.integers(0, 256, size=(128, 128), dtype=np.uint8)
    img = np.stack([base, base // 2, 255 - base], axis=-1)
    out, _ = G.gif_frames(G.encode_gif(img))
    assert np.array_equal(out, img)


def test_multiframe_animation_composites_in_order():
    f1 = np.zeros((16, 16, 3), np.uint8)
    f1[:, :8] = (255, 0, 0)
    f2 = np.zeros((16, 16, 3), np.uint8)
    f2[:, 8:] = (0, 0, 255)
    payload = G.encode_gif([f1, f2], delay_cs=10)
    canvas, frames = G.gif_frames(payload)
    assert [np.array_equal(a, b) for a, b in zip(frames, (f1, f2))] == [True, True]
    assert np.array_equal(canvas, f2)
    meta = G.decode_gif(payload)
    assert meta["kind"] == "image/gif"
    assert meta["n_frames"] == 2
    assert (meta["width"], meta["height"]) == (16, 16)


def test_hand_assembled_partial_frame_with_transparency():
    """Decoder-only features the encoder never emits: a second frame at
    a (left, top) offset whose transparent pixels leave the canvas
    untouched (GIF89a GCE transparency + draw-over compositing)."""
    # palette: 0=black 1=red 2=green 3=blue; screen 8x8
    gct = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    out = bytearray(b"GIF89a")
    out += (8).to_bytes(2, "little") + (8).to_bytes(2, "little")
    out += bytes([0x80 | 1, 0, 0]) + gct  # field=1 -> 4 entries

    def image(left, top, w, h, indices):
        seg = bytearray(b"\x2c")
        seg += left.to_bytes(2, "little") + top.to_bytes(2, "little")
        seg += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        seg += b"\x00"  # no local table, no interlace
        lzw = G._lzw_encode(2, indices)
        seg += bytes([2])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            seg += bytes([len(chunk)]) + chunk
        seg += b"\x00"
        return seg

    out += image(0, 0, 8, 8, [1] * 64)  # frame 1: all red
    # GCE: transparency on, transparent index 0
    out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])
    # frame 2 at (2,2), 4x4: checkerboard of transparent(0) / green(2)
    idx = [(0 if (r + c) % 2 else 2) for r in range(4) for c in range(4)]
    out += image(2, 2, 4, 4, idx)
    out += b"\x3b"

    canvas, frames = G.gif_frames(bytes(out))
    assert len(frames) == 2
    expect = np.zeros((8, 8, 3), np.uint8)
    expect[:] = (255, 0, 0)
    for r in range(4):
        for c in range(4):
            if (r + c) % 2 == 0:
                expect[2 + r, 2 + c] = (0, 255, 0)
    assert np.array_equal(canvas, expect)


def test_disposal_methods_restore_background_and_previous():
    """GCE disposal 2 clears the frame rect to the logical-screen
    background color after display; disposal 3 restores the pre-render
    canvas — the next frame must composite onto the restored state, not
    draw-over (GIF89a spec, Graphic Control Extension)."""
    # palette: 0=black 1=red 2=green 3=blue; screen 8x8, background=3
    gct = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    out = bytearray(b"GIF89a")
    out += (8).to_bytes(2, "little") + (8).to_bytes(2, "little")
    out += bytes([0x80 | 1, 3, 0]) + gct  # bg_index=3 (blue)

    def image(left, top, w, h, indices):
        seg = bytearray(b"\x2c")
        seg += left.to_bytes(2, "little") + top.to_bytes(2, "little")
        seg += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        seg += b"\x00"
        lzw = G._lzw_encode(2, indices)
        seg += bytes([2])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            seg += bytes([len(chunk)]) + chunk
        seg += b"\x00"
        return seg

    def gce(disposal):
        return bytes([0x21, 0xF9, 4, (disposal & 7) << 2, 0, 0, 0, 0])

    # frame 1 (disposal 2): all red -> cleared to bg blue afterwards
    out += gce(2)
    out += image(0, 0, 8, 8, [1] * 64)
    # frame 2 (disposal 3): 2x2 green at (0,0) -> restored afterwards
    out += gce(3)
    out += image(0, 0, 2, 2, [2] * 4)
    # frame 3: 1x1 red at (4,4), default disposal
    out += image(4, 4, 1, 1, [1])
    out += b"\x3b"

    canvas, frames = G.gif_frames(bytes(out))
    assert len(frames) == 3
    red, green, blue = (255, 0, 0), (0, 255, 0), (0, 0, 255)
    all_red = np.zeros((8, 8, 3), np.uint8)
    all_red[:] = red
    assert np.array_equal(frames[0], all_red)
    # disposal 2 on frame 1: frame 2 composites onto a BLUE canvas
    f2 = np.zeros((8, 8, 3), np.uint8)
    f2[:] = blue
    f2[:2, :2] = green
    assert np.array_equal(frames[1], f2)
    # disposal 3 on frame 2: its region reverts to blue before frame 3
    f3 = np.zeros((8, 8, 3), np.uint8)
    f3[:] = blue
    f3[4, 4] = red
    assert np.array_equal(frames[2], f3)
    # the returned canvas is the last DISPLAYED state
    assert np.array_equal(canvas, frames[2])


def test_disposal_2_composes_with_transparency():
    """A frame can be BOTH transparent-masked and disposal-2: its
    transparent pixels leave the canvas untouched while displayed, and
    after display the whole frame RECT (not just drawn pixels) clears
    to the background color."""
    gct = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    out = bytearray(b"GIF89a")
    out += (4).to_bytes(2, "little") + (4).to_bytes(2, "little")
    out += bytes([0x80 | 1, 3, 0]) + gct  # bg = blue

    def image(left, top, w, h, indices):
        seg = bytearray(b"\x2c")
        seg += left.to_bytes(2, "little") + top.to_bytes(2, "little")
        seg += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        seg += b"\x00"
        lzw = G._lzw_encode(2, indices)
        seg += bytes([2])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            seg += bytes([len(chunk)]) + chunk
        seg += b"\x00"
        return seg

    out += image(0, 0, 4, 4, [1] * 16)  # frame 1: all red, no GCE
    # frame 2 GCE: transparency ON (index 0) AND disposal 2
    out += bytes([0x21, 0xF9, 4, (2 << 2) | 0x01, 0, 0, 0, 0])
    # frame 2 at (1,1) 2x2: [green, transparent; transparent, green]
    out += image(1, 1, 2, 2, [2, 0, 0, 2])
    # frame 3: single black pixel at (0,0), default disposal
    out += image(0, 0, 1, 1, [0])
    out += b"\x3b"

    canvas, frames = G.gif_frames(bytes(out))
    red, green, blue = (255, 0, 0), (0, 255, 0), (0, 0, 255)
    f2 = np.zeros((4, 4, 3), np.uint8)
    f2[:] = red
    f2[1, 1] = green
    f2[2, 2] = green  # transparent holes keep red underneath
    assert np.array_equal(frames[1], f2)
    # after display the whole 2x2 rect clears to bg blue, including
    # the pixels transparency never drew
    f3 = np.zeros((4, 4, 3), np.uint8)
    f3[:] = red
    f3[1:3, 1:3] = blue
    f3[0, 0] = (0, 0, 0)
    assert np.array_equal(frames[2], f3)
    assert np.array_equal(canvas, frames[2])


def test_decode_media_and_resize_dispatch(spark):
    img = _paletted(12, 10, 4, seed=3)
    payload = G.encode_gif(img)
    m = mm.decode_media(payload)
    assert m["kind"] == "image/gif"
    assert (m["width"], m["height"]) == (10, 12)
    small = G.decode_gif(mm.resize_media(payload, 5, 6))
    assert (small["width"], small["height"]) == (5, 6)
    # corrupt: flagged opaque degrade, never an exception
    bad = mm.decode_media(payload[:-6])
    assert bad["kind"] == "opaque" and bad["decode_error"]
    # Arrow kernel end-to-end
    df = spark.createDataFrame(
        [(1, payload), (2, b"not-a-gif")], "doc_id long, payload binary"
    )
    out = {r.doc_id: r for r in mm.extract_media_meta(df).collect()}
    assert out[1].kind == "image/gif"
    assert (out[1].width, out[1].height) == (10, 12)
    assert out[2].kind == "opaque"


def test_encoder_rejects_too_many_colors():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert np.unique(img.reshape(-1, 3), axis=0).shape[0] > 256
    with pytest.raises(ValueError, match="256 distinct colors"):
        G.encode_gif(img)


if _HAVE_HYPOTHESIS:

    @settings(max_examples=30, deadline=None)
    @given(
        h=hst.integers(min_value=1, max_value=20),
        w=hst.integers(min_value=1, max_value=20),
        n_colors=hst.integers(min_value=1, max_value=8),
        seed=hst.integers(min_value=0, max_value=2**31),
        interlace=hst.booleans(),
    )
    def test_roundtrip_property(h, w, n_colors, seed, interlace):
        img = _paletted(h, w, n_colors, seed=seed)
        out, _ = G.gif_frames(G.encode_gif(img, interlace=interlace))
        assert np.array_equal(out, img)


def test_sample_gif_frames_even_spacing():
    """The GIF twin of sample_y4m_frames: evenly-spaced composited
    frames as raw RGB bytes."""
    frames = []
    for i in range(6):
        f = np.zeros((4, 4, 3), np.uint8)
        f[:] = (i * 40, 0, 255 - i * 40)
        frames.append(f)
    payload = G.encode_gif(frames)
    got = G.sample_gif_frames(payload, 3)
    assert [i for i, _ in got] == [0, 2, 4]
    for i, raw in got:
        assert np.array_equal(
            np.frombuffer(raw, np.uint8).reshape(4, 4, 3), frames[i]
        )
    # k >= n degrades to every frame once
    assert [i for i, _ in G.sample_gif_frames(payload, 99)] == list(range(6))
    assert G.sample_gif_frames(payload, 0) == []
