"""GIF codec — stdlib + numpy only, no codec library.

GIF87a/89a from the public spec (W3C/CompuServe GIF89a specification):

* decode: logical screen descriptor, global AND local color tables,
  interlaced and sequential images, multi-frame (animated) streams,
  graphic-control / comment / application / plain-text extensions
  (sub-block chains), and the variable-code-width LZW decompressor
  (LSB-first packing, CLEAR/END codes, code width growth to the 12-bit
  cap, deferred-clear tolerant).  Frames after the first composite
  onto the canvas at their own (left, top) offset with full GCE
  disposal semantics: 0/1 leave the region in place, 2 restores the
  region to the logical-screen background color after display, 3
  restores the pre-render canvas.  Transparent pixels (GCE flag) leave
  the canvas untouched.
* encode (ground truth for the decoder tests): global palette built
  from the frames' distinct colors (<= 256, else ValueError), optional
  interlacing, multi-frame output with per-frame GCE delays, real LZW
  compression with code-width growth and table-full CLEAR resets.
  Palette images round-trip EXACTLY — GIF is lossless for <= 256-color
  content, so encoder/decoder equality is a strong spec check on both.

Pure function layer — no Spark imports; ``multimodal.decode_media``
dispatches on the GIF87a/GIF89a magic and ``resize_media`` re-encodes
through :func:`resize_gif`.
"""

from __future__ import annotations

import numpy as np

_MAGICS = (b"GIF87a", b"GIF89a")

# ------------------------------------------------------------------ LZW


class _LSBReader:
    """LSB-first bit reader over the concatenated image sub-blocks."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read(self, n: int) -> int:
        while self._n < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated GIF LZW stream")
            self._acc |= self.data[self.pos] << self._n
            self._n += 8
            self.pos += 1
        v = self._acc & ((1 << n) - 1)
        self._acc >>= n
        self._n -= n
        return v


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> list[int]:
    """GIF LZW: variable code width starting at min+1, growing when the
    table fills the current width, capped at 12 bits; CLEAR resets."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"invalid LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    reader = _LSBReader(data)
    out: list[int] = []

    def fresh() -> list[tuple[int, ...] | None]:
        return [(i,) for i in range(clear)] + [None, None]

    table = fresh()
    code_size = min_code_size + 1
    prev: tuple[int, ...] | None = None
    while len(out) < n_expected:
        code = reader.read(code_size)
        if code == clear:
            table = fresh()
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError("invalid first LZW code")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table):
            entry = prev + (prev[0],)  # the KwKwK special case
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out[:n_expected]


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """The matching compressor: emits CLEAR up front, grows the code
    width in step with the decoder's table, and resets via CLEAR when
    the table hits the 4096-entry cap."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    nxt = end + 1
    emit(clear, code_size)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if nxt < 4096:
            table[wk] = nxt
            nxt += 1
            # the decoder's table lags this one by ONE entry (it builds
            # each entry only after reading the next code), so it
            # widens at len == 2^size exactly when nxt reaches
            # 2^size + 1 here — widening at nxt == 2^size would emit
            # the next code one bit wider than the decoder reads it
            if nxt == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            nxt = end + 1
            code_size = min_code_size + 1
        w = (int(k),)
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------ container


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Read a sub-block chain (len-prefixed <=255-byte chunks, 0-end)."""
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos : pos + n])
        if len(chunks[-1]) != n:
            raise ValueError("truncated GIF sub-block")
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [
        r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
    ]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def gif_frames(payload: bytes) -> tuple[np.ndarray, list[np.ndarray]]:
    """Decode every frame, compositing onto the logical screen with
    GCE disposal semantics (0/1 keep, 2 restore-to-background, 3
    restore-to-previous); returns (last_displayed_canvas, [per-frame
    canvas copies]) as (h, w, 3) uint8 arrays."""
    if payload[:6] not in _MAGICS:
        raise ValueError("not a GIF payload")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        if gct.shape[0] != n:
            raise ValueError("truncated global color table")
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < gct.shape[0]:
        canvas[:] = gct[bg_index]
    bg_rgb = (
        gct[bg_index]
        if gct is not None and bg_index < gct.shape[0]
        else np.zeros(3, dtype=np.uint8)
    )
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(payload):
            raise ValueError("GIF missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            body, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                transparent = body[3] if body[0] & 0x01 else None
                disposal = (body[0] >> 2) & 0x07
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        # image descriptor
        il = int.from_bytes(payload[pos : pos + 2], "little")
        it = int.from_bytes(payload[pos + 2 : pos + 4], "little")
        iw = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        ih = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        iflags = payload[pos + 8]
        pos += 9
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                payload[pos : pos + 3 * n], np.uint8
            ).reshape(-1, 3)
            if pal.shape[0] != n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image with no color table")
        if il + iw > w or it + ih > h:
            raise ValueError("GIF frame exceeds logical screen")
        min_code = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = np.array(
            _lzw_decode(min_code, data, iw * ih), dtype=np.int64
        ).reshape(ih, iw)
        if idx.size and int(idx.max()) >= pal.shape[0]:
            raise ValueError("GIF pixel index outside color table")
        if iflags & 0x40:
            idx = _deinterlace(idx)
        rgb = pal[idx]
        region = canvas[it : it + ih, il : il + iw]
        # disposal applies AFTER the frame is displayed: 3 needs the
        # pre-render region saved now, 2 clears the region to the
        # logical-screen background before the next frame draws
        prev_region = region.copy() if disposal == 3 else None
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            region[:] = bg_rgb
        elif disposal == 3:
            region[:] = prev_region
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image")
    # frames[-1] is the last DISPLAYED canvas; `canvas` itself may have
    # had the final frame's disposal applied (spec-correct but never
    # shown), so the displayed state is the useful return
    return frames[-1], frames


def decode_gif(payload: bytes) -> dict:
    """Same output shape as the other image decoders: logical-screen
    dims + first-frame channel means, plus the frame count."""
    _, frames = gif_frames(payload)
    first = frames[0].astype(np.float64)
    return {
        "kind": "image/gif",
        "width": first.shape[1],
        "height": first.shape[0],
        "n_channels": 3,
        "n_frames": len(frames),
        "mean_r": float(first[:, :, 0].mean()),
        "mean_g": float(first[:, :, 1].mean()),
        "mean_b": float(first[:, :, 2].mean()),
    }


# -------------------------------------------------------------- encoder


def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, dict]:
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if colors.shape[0] > 256:
        raise ValueError(
            f"GIF encoder needs <= 256 distinct colors, got {colors.shape[0]}"
        )
    lookup = {tuple(c): i for i, c in enumerate(colors)}
    return colors, lookup


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    interlace: bool = False,
    delay_cs: int = 4,
) -> bytes:
    """(h, w, 3) uint8 array or a list of same-shaped arrays -> GIF89a
    bytes (multi-frame input becomes an animation with ``delay_cs``
    hundredths of a second per frame).  Lossless for <= 256 colors."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all GIF frames must be (h, w, 3) and same-sized")
    palette, lookup = _build_palette(frames)
    # color-table size field: 2^(field+1) entries, >= palette size
    field = max(1, (max(2, palette.shape[0]) - 1).bit_length() - 1)
    n_entries = 2 << field
    table = np.zeros((n_entries, 3), dtype=np.uint8)
    table[: palette.shape[0]] = palette

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | field, 0, 0])  # GCT present, bg 0, no aspect
    out += table.tobytes()

    min_code = max(2, field + 1)
    for f in frames:
        if len(frames) > 1:  # GCE with per-frame delay
            out += bytes([0x21, 0xF9, 4, 0])
            out += delay_cs.to_bytes(2, "little") + bytes([0, 0])
        out += b"\x2c" + bytes(4)  # image at (0, 0)
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0x00])
        idx = np.array(
            [lookup[tuple(px)] for px in f.reshape(-1, 3)], dtype=np.int64
        ).reshape(h, w)
        if interlace:
            order = [
                r
                for start, step in _INTERLACE_PASSES
                for r in range(start, h, step)
            ]
            idx = idx[order]
        lzw = _lzw_encode(min_code, idx.reshape(-1).tolist())
        out += bytes([min_code])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def sample_gif_frames(payload: bytes, k: int) -> list[tuple[int, bytes]]:
    """REAL frame sampling from an animated GIF: ``k`` evenly-spaced
    (frame_idx, raw RGB bytes) pairs of the composited canvas — the
    GIF twin of :func:`multimodal.sample_y4m_frames`.  Unlike y4m,
    frames cannot be sliced by offset (each depends on LZW state and
    the compositing history), so the walk decodes sequentially."""
    _, frames = gif_frames(payload)
    n = len(frames)
    if n == 0 or k <= 0:
        return []
    want = (
        list(range(n)) if k >= n else sorted({(i * n) // k for i in range(k)})
    )
    return [(i, frames[i].tobytes()) for i in want]


def resize_gif(payload: bytes, width: int, height: int) -> bytes:
    """decode first frame -> nearest-neighbor -> re-encode (single
    frame).  Lossless beyond the resample when the source palette fits
    (it always does: resampling cannot add colors)."""
    _, frames = gif_frames(payload)
    src = frames[0]
    ys = (np.arange(height) * src.shape[0]) // height
    xs = (np.arange(width) * src.shape[1]) // width
    return encode_gif(src[ys][:, xs])
