"""Real (stdlib-only) media decoders — VERDICT missing-item #2, halved.

The env-blocked part of X5 was "no codec libraries"; that only blocks
COMPRESSED formats.  These tests synthesize genuine WAV (stdlib
``wave``) and BMP (``struct``) payloads with known ground truth and
assert the decoders recover it exactly — real pixel/sample math, not
digest arithmetic — then run the mixed-corpus Arrow kernel
(``extract_media_meta``) end-to-end through mapInPandas.
"""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest

from foglamp_filter_python35_spark.functions import multimodal as mm


def _wav_bytes(
    freq: float = 440.0,
    sample_rate: int = 8000,
    n_frames: int = 4000,
    amplitude: float = 0.5,
    n_channels: int = 1,
) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = bytearray()
        for i in range(n_frames):
            v = int(amplitude * 32767 * math.sin(2 * math.pi * freq * i / sample_rate))
            frames += struct.pack("<h", v) * n_channels
        w.writeframes(bytes(frames))
    return buf.getvalue()


def _bmp_bytes(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal uncompressed 24-bit bottom-up BMP filled with one color."""
    row = bytes((rgb[2], rgb[1], rgb[0])) * width  # BGR on disk
    row += b"\x00" * ((4 - len(row) % 4) % 4)
    pixels = row * height
    data_offset = 14 + 40
    file_size = data_offset + len(pixels)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + info + pixels


def test_decode_wav_recovers_ground_truth():
    payload = _wav_bytes(freq=440.0, sample_rate=8000, n_frames=4000, amplitude=0.5)
    m = mm.decode_wav(payload)
    assert m["kind"] == "audio/wav"
    assert m["n_channels"] == 1
    assert m["sample_rate"] == 8000
    assert m["n_frames"] == 4000
    assert m["duration_ms"] == 500
    # a 0.5-amplitude sine: peak ~0.5, RMS ~0.5/sqrt(2) ~0.354
    assert abs(m["peak"] - 0.5) < 0.01
    assert abs(m["rms"] - 0.5 / math.sqrt(2)) < 0.01


def test_decode_wav_stereo_and_8bit():
    stereo = mm.decode_wav(_wav_bytes(n_channels=2, n_frames=800))
    assert stereo["n_channels"] == 2 and stereo["n_frames"] == 800
    # 8-bit unsigned silence: 128 everywhere -> peak 0
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(4000)
        w.writeframes(bytes([128]) * 1000)
    silent = mm.decode_wav(buf.getvalue())
    assert silent["peak"] == 0.0 and silent["rms"] == 0.0


def _wav_wide(sample_width: int, values: list[int]) -> bytes:
    """PCM WAV with explicit signed sample values at a given width."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sample_width)
        w.setframerate(8000)
        frames = b"".join(
            v.to_bytes(sample_width, "little", signed=True) for v in values
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_wav_24_and_32_bit():
    # 24-bit: half scale positive, half scale negative — peak 0.5 exactly,
    # sign extension exercised on the negative sample
    half24 = 1 << 22
    m = mm.decode_wav(_wav_wide(3, [half24, -half24, 0, 0]))
    assert m["n_frames"] == 4
    assert abs(m["peak"] - 0.5) < 1e-6
    assert abs(m["rms"] - 0.5 / math.sqrt(2)) < 1e-6
    # 32-bit: full-scale negative -> peak 1.0
    m32 = mm.decode_wav(_wav_wide(4, [-(1 << 31), 0]))
    assert abs(m32["peak"] - 1.0) < 1e-9
    # the mixed-corpus dispatcher takes these too
    assert mm.decode_media(_wav_wide(3, [1, 2, 3]))["kind"] == "audio/wav"


def test_decode_bmp_recovers_dimensions_and_channel_means():
    m = mm.decode_bmp(_bmp_bytes(7, 5, (200, 100, 50)))  # odd width: padding path
    assert m["kind"] == "image/bmp"
    assert (m["width"], m["height"]) == (7, 5)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == (200.0, 100.0, 50.0)


def test_decode_bmp_rejects_compressed_or_foreign():
    with pytest.raises(ValueError):
        mm.decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    # RLE-compressed BMP header (compression=1) must refuse, not misparse
    bad = bytearray(_bmp_bytes(4, 4, (1, 2, 3)))
    struct.pack_into("<I", bad, 30, 1)
    with pytest.raises(ValueError):
        mm.decode_bmp(bytes(bad))


def test_decode_media_dispatches_and_degrades():
    wav, bmp, blob = _wav_bytes(n_frames=80), _bmp_bytes(3, 3, (9, 9, 9)), b"not-media"
    assert mm.decode_media(wav)["kind"] == "audio/wav"
    assert mm.decode_media(bmp)["kind"] == "image/bmp"
    opaque = mm.decode_media(blob)
    assert opaque["kind"] == "opaque"
    # fabricated stats stay NESTED under 'pseudo', never in the real
    # width/height columns (r9 ADVICE: aggregates must not mix them)
    assert "width" not in opaque and "height" not in opaque
    assert set(opaque["pseudo"]) >= {"width", "height", "n_frames"}
    assert opaque["decode_error"] == "unrecognized container (no magic-byte match)"
    # corrupt RIFF container: opaque fallback carrying the reason,
    # never an exception (reference degrade contract, C6)
    corrupt = mm.decode_media(b"RIFF\x00\x00\x00\x00WAVEgarbage")
    assert corrupt["kind"] == "opaque"
    assert corrupt["decode_error"] and "Error" in corrupt["decode_error"]


def test_extract_media_meta_kernel_on_mixed_corpus(spark):
    import numpy as np

    rows = [
        (1, _wav_bytes(sample_rate=8000, n_frames=2000)),
        (2, _bmp_bytes(16, 8, (10, 20, 30))),
        (3, b"plain text payload"),
        (4, mm.encode_png(np.full((4, 6, 3), 77, dtype=np.uint8))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in mm.extract_media_meta(df).collect()}
    assert out[1].kind == "audio/wav"
    assert (out[1].sample_rate, out[1].duration_ms) == (8000, 250)
    assert out[1].width is None  # audio has no pixel dims
    assert out[1].decode_error is None
    assert out[2].kind == "image/bmp"
    assert (out[2].width, out[2].height) == (16, 8)
    assert out[2].sample_rate is None
    assert out[3].kind == "opaque"
    assert out[3].n_bytes == len(b"plain text payload")
    # opaque rows: NULL media properties + machine-auditable reason
    assert out[3].width is None and out[3].duration_ms is None
    assert "unrecognized container" in out[3].decode_error
    assert out[4].kind == "image/png"
    assert (out[4].width, out[4].height) == (6, 4)
    # plan shape: Arrow kernel, never row-at-a-time Python
    plan = mm.extract_media_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def _y4m_bytes(width=8, height=6, n_frames=5, fps="10:1"):
    """Genuine YUV4MPEG2 420 payload: frame i's luma plane is all i*10."""
    head = f"YUV4MPEG2 W{width} H{height} F{fps} Ip A1:1 C420\n".encode()
    body = b""
    for i in range(n_frames):
        y = bytes([i * 10]) * (width * height)
        uv = bytes([128]) * (width * height // 2)
        body += b"FRAME\n" + y + uv
    return head + body


def test_encode_decode_bmp_round_trip():
    import numpy as np

    rgb = np.zeros((5, 7, 3), dtype=np.uint8)
    rgb[:, :, 0] = 200
    rgb[:, :, 1] = 100
    rgb[:, :, 2] = 50
    m = mm.decode_bmp(mm.encode_bmp(rgb))
    assert (m["width"], m["height"]) == (7, 5)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == (200.0, 100.0, 50.0)


def test_resize_bmp_real_pixels():
    import numpy as np

    # left half red, right half blue — resize must preserve the split
    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    rgb[:, :4, 0] = 255
    rgb[:, 4:, 2] = 255
    small = mm.resize_bmp(mm.encode_bmp(rgb), 4, 4)
    m = mm.decode_bmp(small)
    assert (m["width"], m["height"]) == (4, 4)
    # halves average to half-intensity red + half-intensity blue
    assert abs(m["mean_r"] - 127.5) < 1 and abs(m["mean_b"] - 127.5) < 1
    assert m["mean_g"] == 0.0
    # upscale keeps the solid means exactly (nearest neighbor)
    big = mm.decode_bmp(mm.resize_bmp(mm.encode_bmp(rgb), 16, 10))
    assert (big["width"], big["height"]) == (16, 10)
    assert big["mean_g"] == 0.0


def test_decode_y4m_ground_truth():
    m = mm.decode_y4m(_y4m_bytes(width=8, height=6, n_frames=5, fps="10:1"))
    assert m["kind"] == "video/y4m"
    assert (m["width"], m["height"], m["n_frames"]) == (8, 6, 5)
    assert m["duration_ms"] == 500  # 5 frames at 10 fps
    assert m["luma_means"] == [0.0, 10.0, 20.0, 30.0, 40.0]


def test_sample_y4m_frames_even_spacing():
    payload = _y4m_bytes(width=4, height=4, n_frames=10)
    got = mm.sample_y4m_frames(payload, k=3)
    assert [idx for idx, _ in got] == [0, 3, 6]
    # each sampled Y plane is the real frame buffer (frame i == i*10)
    for idx, y in got:
        assert set(y) == {idx * 10} and len(y) == 16
    # k > n_frames degrades to every frame once
    assert [i for i, _ in mm.sample_y4m_frames(payload, k=99)] == list(range(10))


def test_decode_media_dispatches_y4m():
    m = mm.decode_media(_y4m_bytes())
    assert m["kind"] == "video/y4m" and "luma_means" not in m
    degraded = mm.decode_media(b"YUV4MPEG2 corrupt\nFRAME")
    assert degraded["kind"] == "opaque" and degraded["decode_error"]


# --- PNG: the round-10 codec.  zlib inflate IS PNG's compression, so a
# complete non-interlaced decoder needs only stdlib zlib + the 5
# per-row unfilters.


def _png_with_filters(pixels, filters):
    """Build a real PNG applying a chosen filter type per row — the
    forward direction of the spec's filter math, written independently
    of the decoder so the test is a genuine cross-check."""
    import zlib

    import numpy as np

    h, w, ch = pixels.shape
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(int)
    raw = b""
    prev = np.zeros(stride, dtype=int)
    for r, f in enumerate(filters):
        cur = flat[r]
        left = np.concatenate([np.zeros(ch, dtype=int), cur[:-ch]])
        if f == 0:
            enc = cur % 256
        elif f == 1:
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            enc = (cur - (left + prev) // 2) % 256
        elif f == 4:
            enc = np.zeros(stride, dtype=int)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) % 256
        raw += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = cur

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_round_trip_matches_bmp_twin():
    import numpy as np

    rgb = np.zeros((5, 7, 3), dtype=np.uint8)
    rgb[:, :, 0] = 200
    rgb[:, :, 1] = 100
    rgb[:, :, 2] = 50
    png_m = mm.decode_png(mm.encode_png(rgb))
    bmp_m = mm.decode_bmp(mm.encode_bmp(rgb))
    assert png_m["kind"] == "image/png"
    assert (png_m["width"], png_m["height"]) == (bmp_m["width"], bmp_m["height"])
    for k in ("mean_r", "mean_g", "mean_b"):
        assert png_m[k] == bmp_m[k]


def test_png_all_five_filter_types_unfilter_exactly():
    import numpy as np

    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    payload = _png_with_filters(pixels, filters=[0, 1, 2, 3, 4])
    got = mm._png_pixels(payload)
    assert np.array_equal(got, pixels)


def test_png_grayscale_and_rgba():
    import numpy as np

    gray = np.full((3, 4, 1), 99, dtype=np.uint8)
    m = mm.decode_png(mm.encode_png(gray))
    assert (m["width"], m["height"]) == (4, 3)
    assert m["mean_r"] == m["mean_g"] == m["mean_b"] == 99.0
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[:, :, 1] = 255  # pure green, alpha 0
    m = mm.decode_png(mm.encode_png(rgba))
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == (0.0, 255.0, 0.0)


def test_png_rejects_unsupported_and_degrades_via_decode_media():
    import zlib

    # palette PNG (color type 3): refuse, don't misparse
    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    pal = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        mm.decode_png(pal)
    degraded = mm.decode_media(pal)
    assert degraded["kind"] == "opaque"
    assert "color_type=3" in degraded["decode_error"]
    # truncated IDAT: opaque with reason, never an exception
    import numpy as np

    good = mm.encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    assert mm.decode_media(good[:40])["kind"] == "opaque"


def test_resize_png_real_pixels_and_resize_media_dispatch():
    import numpy as np

    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    rgb[:, :4, 0] = 255
    rgb[:, 4:, 2] = 255
    small = mm.resize_media(mm.encode_png(rgb), 4, 4)
    m = mm.decode_png(small)
    assert (m["width"], m["height"]) == (4, 4)
    assert abs(m["mean_r"] - 127.5) < 1 and abs(m["mean_b"] - 127.5) < 1
    assert m["mean_g"] == 0.0
    # same array through the BMP path gives the same resized means
    bm = mm.decode_bmp(mm.resize_media(mm.encode_bmp(rgb), 4, 4))
    assert (bm["mean_r"], bm["mean_g"], bm["mean_b"]) == (
        m["mean_r"],
        m["mean_g"],
        m["mean_b"],
    )
    with pytest.raises(ValueError):
        mm.resize_media(b"not-an-image", 4, 4)


def _top_down_bmp(rgb_top_down) -> bytes:
    """24-bit BMP with NEGATIVE height: rows stored top-down on disk."""
    import numpy as np

    arr = np.ascontiguousarray(rgb_top_down, dtype=np.uint8)
    h, w, _ = arr.shape
    bgr = arr[:, :, ::-1]  # keep top-down row order, RGB -> BGR
    pad = (4 - (w * 3) % 4) % 4
    rows = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    data_offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", data_offset + len(rows), 0, 0, data_offset
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    return header + info + rows


try:
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:

    @settings(max_examples=40, deadline=None)
    @given(
        h=hst.integers(1, 9),
        w=hst.integers(1, 9),
        ch=hst.sampled_from([1, 2, 3, 4]),
        seed=hst.integers(0, 2**31 - 1),
        data=hst.data(),
    )
    def test_png_round_trip_property(h, w, ch, seed, data):
        """encode -> decode is the identity for every channel count the
        codec claims, and the independently-written forward filters
        (all 5 types, arbitrary per-row mix) unfilter exactly."""
        import numpy as np

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        got = mm._png_pixels(mm.encode_png(px))
        assert np.array_equal(got, px)
        if ch == 3:  # the filter builder emits truecolor
            filters = data.draw(
                hst.lists(
                    hst.integers(0, 4), min_size=h, max_size=h
                )
            )
            got_f = mm._png_pixels(_png_with_filters(px, filters))
            assert np.array_equal(got_f, px)


def test_resize_bmp_honors_top_down_storage():
    """r9 ADVICE (medium): a negative-height BMP must not come out of
    resize vertically mirrored."""
    import numpy as np

    rgb = np.zeros((8, 4, 3), dtype=np.uint8)
    rgb[:4, :, 0] = 255  # top half red
    rgb[4:, :, 2] = 255  # bottom half blue
    resized = mm.resize_bmp(_top_down_bmp(rgb), 4, 8)
    top_down_px = mm._bmp_rgb_rows(resized)
    # top rows stay red, bottom rows stay blue
    assert (top_down_px[0] == [255, 0, 0]).all()
    assert (top_down_px[-1] == [0, 0, 255]).all()
    # and the bottom-up twin produces the identical pixel array
    bottom_up = mm.resize_bmp(mm.encode_bmp(rgb), 4, 8)
    assert np.array_equal(mm._bmp_rgb_rows(bottom_up), top_down_px)


def test_y4m_truncated_final_frame_raises_everywhere():
    """ADVICE r10: a truncated final frame must raise from the shared
    frame walk, not silently yield a short Y-plane to the sampler."""
    import pytest

    full = _y4m_bytes(width=4, height=4, n_frames=3)
    truncated = full[:-5]  # chop the tail of the last frame's payload
    with pytest.raises(ValueError, match="truncated y4m final frame"):
        mm.sample_y4m_frames(truncated, k=3)
    with pytest.raises(ValueError, match="truncated y4m final frame"):
        mm.decode_y4m(truncated)
    # decode_media contains it on the flagged opaque path
    degraded = mm.decode_media(truncated)
    assert degraded["kind"] == "opaque"
    assert "truncated y4m final frame" in degraded["decode_error"]


def _mixed_pointer_corpus(spark, tmp_path):
    """Mixed real-media corpus packed into shard files, returning both
    the inline (doc_id, payload) frame and the checkpointed pointer
    frame over the same bytes."""
    import numpy as np

    from foglamp_filter_python35_spark.functions import jpeg as J

    from foglamp_filter_python35_spark.functions import gif as G
    from foglamp_filter_python35_spark.functions import tiff as TF

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    few = (rng.integers(0, 5, size=(9, 7, 1)) * 50).astype(np.uint8).repeat(
        3, axis=2
    )
    rows = [
        (1, _wav_bytes(sample_rate=8000, n_frames=2000)),
        (2, _bmp_bytes(16, 8, (10, 20, 30))),
        (3, b"plain text payload"),
        (4, mm.encode_png(rgb)),
        (5, J.encode_jpeg(rgb, quality=90)),
        (6, _y4m_bytes(width=8, height=6, n_frames=3)),
        (7, J.encode_jpeg_progressive(rgb, quality=90)),
        (8, G.encode_gif(few)),
        (9, TF.encode_tiff(rgb, compression="lzw")),
    ]
    inline = spark.createDataFrame(rows, "doc_id long, payload binary")
    ptrs = mm.pack_payload_shards(
        inline, str(tmp_path / "shards"), text_col="payload"
    ).localCheckpoint()
    return inline, ptrs


def test_media_meta_ptr_matches_inline(spark, tmp_path):
    """extract_media_meta_ptr is the pointer twin of extract_media_meta:
    identical real-decode output (PNG/JPEG/WAV/BMP/y4m + opaque), with
    payload bytes packed binary-exact into shards (pack_payload_shards
    must NOT round binary columns through str())."""
    inline, ptrs = _mixed_pointer_corpus(spark, tmp_path)
    got_inline = sorted(map(tuple, mm.extract_media_meta(inline).collect()))
    got_ptr = sorted(map(tuple, mm.extract_media_meta_ptr(ptrs).collect()))
    assert got_ptr == got_inline
    kinds = {r[0]: r[1] for r in got_ptr}
    assert kinds == {
        1: "audio/wav",
        2: "image/bmp",
        3: "opaque",
        4: "image/png",
        5: "image/jpeg",
        6: "video/y4m",
        7: "image/jpeg",
        8: "image/gif",
        9: "image/tiff",
    }
    # pointer-path invariant: the kernel's input plan carries only the
    # 4 pointer columns — no binary column exists anywhere in it
    plan = (
        mm.extract_media_meta_ptr(ptrs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "payload#" not in plan


def test_resize_media_ptr_real_pixels_and_degrade(spark, tmp_path):
    """resize_media_ptr decodes + resamples + re-encodes for real on
    BMP/PNG/JPEG pointers and degrades row-wise (NULL payload) for
    containers resize_media cannot handle."""
    _, ptrs = _mixed_pointer_corpus(spark, tmp_path)
    out = {r.doc_id: r for r in mm.resize_media_ptr(ptrs, 6, 4).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7, 8, 9}
    # resizable containers: output decodes in its own container at 6x4
    # (progressive JPEG re-encodes through the baseline encoder)
    for doc_id, kind in (
        (2, "image/bmp"),
        (4, "image/png"),
        (5, "image/jpeg"),
        (7, "image/jpeg"),
        (8, "image/gif"),
        (9, "image/tiff"),
    ):
        m = mm.decode_media(bytes(out[doc_id].resized_payload))
        assert m["kind"] == kind
        assert (m["width"], m["height"]) == (6, 4)
    # non-image containers degrade per-row, not per-batch
    for doc_id in (1, 3, 6):
        assert out[doc_id].resized_payload is None
    # quality parameter reaches the JPEG re-encode
    hi = {r.doc_id: r for r in mm.resize_media_ptr(ptrs, 6, 4, quality=100).collect()}
    assert bytes(hi[5].resized_payload) != bytes(out[5].resized_payload)
    assert bytes(hi[4].resized_payload) == bytes(out[4].resized_payload)


# ------------------------------------------ G.711 / AU / AIFF decoders


def _g711_compress(samples, expand_table):
    """Test-side compressor: nearest code under the module's own
    expansion table (an independent inverse check, not a copied spec
    table)."""
    import numpy as np

    codes = np.arange(256, dtype=np.uint8)
    expanded = expand_table(bytes(codes)).astype(np.int64)
    order = np.argsort(expanded)
    idx = np.searchsorted(expanded[order], samples)
    idx = np.clip(idx, 0, 255)
    lo = expanded[order][np.maximum(idx - 1, 0)]
    hi = expanded[order][idx]
    pick = np.where(np.abs(samples - lo) <= np.abs(hi - samples),
                    np.maximum(idx - 1, 0), idx)
    return bytes(codes[order][pick].tolist())


def test_g711_expansion_spec_points():
    import numpy as np

    ulaw = mm._g711_ulaw_to_linear(bytes([0xFF, 0x7F, 0x80, 0x00]))
    # 0xFF/0x7F are +0/-0 (the wire code is the COMPLEMENT of
    # sign|exp|mant, so all-ones is silence); 0x80 is the most
    # positive, 0x00 the most negative
    assert ulaw[0] == 0 and ulaw[1] == 0
    assert ulaw[2] == 8031 << 2 and ulaw[3] == -(8031 << 2)
    alaw = mm._g711_alaw_to_linear(bytes([0xD5, 0x55, 0xAA, 0x2A]))
    # A-law has no true zero: 0xD5/0x55 are +8/-8; 0xAA/0x2A are +/-max
    assert alaw[0] == 8 and alaw[1] == -8
    assert alaw[2] == 32256 and alaw[3] == -32256
    # every code expands to a distinct value except the mu-law dual zero
    assert len(set(mm._g711_ulaw_to_linear(bytes(range(256))).tolist())) == 255
    assert len(set(mm._g711_alaw_to_linear(bytes(range(256))).tolist())) == 256


def _riff_g711(tag, data, rate=8000):
    fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, 8)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


@pytest.mark.parametrize(
    "tag,expand", [(7, "_g711_ulaw_to_linear"), (6, "_g711_alaw_to_linear")]
)
def test_g711_wav_sine_statistics(tag, expand):
    """Compress a known sine with the table inverse, decode through the
    WAV path, and require the companded stats to match the PCM
    reference within companding error."""
    import numpy as np

    n = 8000
    pcm = (0.5 * 32124 * np.sin(2 * math.pi * 440 * np.arange(n) / 8000)).astype(
        np.int64
    )
    data = _g711_compress(pcm, getattr(mm, expand))
    m = mm.decode_wav(_riff_g711(tag, data))
    assert m["kind"] == "audio/wav"
    assert (m["sample_rate"], m["n_frames"], m["duration_ms"]) == (8000, n, 1000)
    ref_rms = float(np.sqrt(np.mean((pcm / 32768.0) ** 2)))
    assert abs(m["rms"] - ref_rms) / ref_rms < 0.02  # companding error bound
    assert abs(m["peak"] - 0.5 * 32124 / 32768.0) < 0.02
    # decode_media dispatches the same bytes
    assert mm.decode_media(_riff_g711(tag, data))["kind"] == "audio/wav"


def test_au_decodes_pcm_and_g711():
    import numpy as np

    n = 4000
    pcm = (0.25 * 32767 * np.sin(2 * math.pi * 220 * np.arange(n) / 8000)).astype(
        np.int16
    )
    hdr = b".snd" + struct.pack(">IIIII", 24, 2 * n, 3, 8000, 1)
    m = mm.decode_au(hdr + pcm.astype(">i2").tobytes())
    assert m["kind"] == "audio/basic"
    assert (m["sample_rate"], m["n_frames"], m["duration_ms"]) == (8000, n, 500)
    assert abs(m["peak"] - 0.25) < 0.01
    # mu-law AU of the same sine
    data = _g711_compress(pcm.astype(np.int64), mm._g711_ulaw_to_linear)
    hdr = b".snd" + struct.pack(">IIIII", 24, len(data), 1, 8000, 1)
    mu = mm.decode_au(hdr + data)
    assert abs(mu["peak"] - m["peak"]) < 0.02
    # dispatch + degrade
    assert mm.decode_media(hdr + data)["kind"] == "audio/basic"
    bad = mm.decode_media(b".snd" + struct.pack(">IIIII", 24, 4, 99, 8000, 1) + b"abcd")
    assert bad["kind"] == "opaque" and "unsupported AU encoding" in bad["decode_error"]


def test_au_decodes_24bit_linear_pcm():
    """AU encoding 4 is 24-bit big-endian linear PCM — 3-byte samples,
    sign-extended, full scale 2^23 (the docstring's 8/16/24/32 claim)."""
    import numpy as np

    n = 4000
    full = float(1 << 23)
    pcm = (0.25 * (full - 1) * np.sin(
        2 * math.pi * 220 * np.arange(n) / 8000
    )).astype(np.int64)
    raw = bytearray()
    for v in pcm:
        raw += int(v & 0xFFFFFF).to_bytes(3, "big")
    hdr = b".snd" + struct.pack(">IIIII", 24, len(raw), 4, 8000, 1)
    m = mm.decode_au(hdr + bytes(raw))
    assert m["kind"] == "audio/basic"
    assert (m["sample_rate"], m["n_frames"], m["duration_ms"]) == (8000, n, 500)
    assert abs(m["peak"] - 0.25) < 0.01
    # sign extension: a single full-negative sample peaks at 1.0
    neg = b".snd" + struct.pack(">IIIII", 24, 3, 4, 8000, 1) + b"\x80\x00\x00"
    assert abs(mm.decode_au(neg)["peak"] - 1.0) < 1e-9


def _float80(value: int) -> bytes:
    exp = value.bit_length() - 1
    mant = value << (63 - exp)
    return struct.pack(">HQ", 16383 + exp, mant)


def test_aiff_decodes_16bit_pcm():
    import numpy as np

    n = 6000
    pcm = (0.4 * 32767 * np.sin(2 * math.pi * 330 * np.arange(n) / 12000)).astype(
        ">i2"
    )
    comm = struct.pack(">hLh", 1, n, 16) + _float80(12000)
    ssnd = struct.pack(">II", 0, 0) + pcm.tobytes()
    body = b"AIFF"
    body += b"COMM" + struct.pack(">I", len(comm)) + comm
    body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    payload = b"FORM" + struct.pack(">I", len(body)) + body
    m = mm.decode_aiff(payload)
    assert m["kind"] == "audio/aiff"
    assert (m["sample_rate"], m["n_frames"], m["duration_ms"]) == (12000, n, 500)
    assert abs(m["peak"] - 0.4) < 0.01
    assert mm.decode_media(payload)["kind"] == "audio/aiff"
    # AIFC (compressed) refuses -> opaque degrade with reason
    aifc = payload.replace(b"AIFF", b"AIFC", 1)
    out = mm.decode_media(aifc)
    assert out["kind"] == "opaque" and "AIFC" in out["decode_error"]


# ----------------------------------------------------- netpbm (PGM/PPM)


def test_pnm_roundtrip_and_variants():
    import numpy as np

    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    # raw P6 round-trips exactly
    assert np.array_equal(mm._pnm_pixels(mm.encode_pnm(rgb)), rgb)
    # plain P3 round-trips exactly too
    assert np.array_equal(mm._pnm_pixels(mm.encode_pnm(rgb, plain=True)), rgb)
    # header comments and arbitrary whitespace are legal
    weird = b"P6 # comment\n# another\n 7\t9 # dims\n255\n" + rgb.tobytes()
    assert np.array_equal(mm._pnm_pixels(weird), rgb)
    # grayscale P5 expands to 3 identical channels, maxval rescales
    g = rng.integers(0, 16, size=(4, 5), dtype=np.uint8)
    p5 = b"P5\n5 4\n15\n" + g.tobytes()
    px = mm._pnm_pixels(p5)
    assert np.array_equal(px[:, :, 0], (g.astype(np.int64) * 255 // 15))
    assert np.array_equal(px[:, :, 0], px[:, :, 2])
    # dispatch + resize + degrade
    m = mm.decode_media(mm.encode_pnm(rgb))
    assert m["kind"] == "image/x-portable-pixmap"
    assert (m["width"], m["height"]) == (7, 9)
    small = mm.decode_media(mm.resize_media(mm.encode_pnm(rgb), 3, 4))
    assert (small["width"], small["height"]) == (3, 4)
    bad = mm.decode_media(mm.encode_pnm(rgb)[:-5])
    assert bad["kind"] == "opaque" and "truncated PNM" in bad["decode_error"]
    # "P2..." as ordinary text must not be misdetected as an image
    assert mm.decode_media(b"P2P is a protocol")["kind"] == "opaque"


def test_pnm_plain_raster_comments_are_stripped():
    """'#' comments are legal anywhere in PLAIN (P2/P3) netpbm files,
    including inside the pixel raster — they must not be parsed as
    sample values."""
    import numpy as np

    g = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    toks = [str(v) for v in g.flatten()]
    head, tail = " ".join(toks[:6]), " ".join(toks[6:])
    p2 = f"P2\n4 3\n255\n{head} # mid-raster comment 999\n{tail}\n".encode()
    px = mm._pnm_pixels(p2)
    assert np.array_equal(px[:, :, 0], g)
    # P3 with a comment splitting an RGB triple
    rgb = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
    p3 = b"P3\n2 1\n255\n10 20 # r g then comment\n30 40 50 60\n"
    assert np.array_equal(mm._pnm_pixels(p3), rgb)


def test_au_24bit_misaligned_buffer_is_a_decode_error():
    """r12 ADVICE: a truncated 24-bit AU buffer must raise (and degrade
    to opaque+decode_error through decode_media), matching the
    np.frombuffer strictness of the 16/32-bit paths — not silently
    decode with an understated n_frames."""
    good = b"\x00\x10\x00" * 4
    hdr = b".snd" + struct.pack(">IIIII", 24, len(good) + 2, 4, 8000, 1)
    truncated = hdr + good + b"\x00\x10"  # 14 bytes: not a multiple of 3
    with pytest.raises(ValueError, match="multiple of 3"):
        mm.decode_au(truncated)
    m = mm.decode_media(truncated)
    assert m["kind"] == "opaque" and "multiple of 3" in m["decode_error"]
    # the aligned prefix still decodes
    ok = mm.decode_au(
        b".snd" + struct.pack(">IIIII", 24, len(good), 4, 8000, 1) + good
    )
    assert ok["n_frames"] == 4
