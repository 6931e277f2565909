"""TIFF codec — stdlib + numpy only, no codec library.

Baseline TIFF 6.0 from the public spec, both byte orders:

* decode: II/MM headers, IFD walk (BYTE/SHORT/LONG entry types, inline
  or offset-stored values), strip assembly via StripOffsets /
  StripByteCounts / RowsPerStrip, compressions 1 (none), 5 (TIFF-LZW:
  MSB-first packing, fixed 8-bit roots, CLEAR=256/EOI=257, and the
  spec's EARLY code-width change — one code sooner than GIF's LZW),
  32773 (PackBits), the horizontal-differencing predictor (tag 317,
  value 2), and photometric interpretations 0/1 (grayscale, either
  polarity), 2 (RGB, with extra samples dropped), 3 (palette via the
  16-bit ColorMap).  8 bits per sample; anything else refuses with a
  reason and degrades through ``decode_media``'s flagged opaque path.
* encode (decoder ground truth): grayscale or RGB, II or MM byte
  order, compression none/PackBits/LZW, optional predictor 2, multiple
  strips.  TIFF is lossless, so round-trips are exact.

Pure function layer — no Spark imports; ``multimodal.decode_media``
dispatches on the II*/MM* magic and ``resize_media`` re-encodes
through :func:`resize_tiff`.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- TIFF LZW


def _lzw_decode_tiff(data: bytes, n_expected: int) -> bytes:
    """TIFF-LZW (spec section 13): MSB-first bit packing, roots 0..255,
    CLEAR=256, EOI=257, and the early code-width change — the width
    grows when the NEXT table index would need it (at table length
    2^w - 1, one code earlier than GIF)."""
    clear, eoi = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset() -> None:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.extend((b"", b""))  # CLEAR / EOI placeholders

    reset()
    width = 9
    acc = n = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < n_expected:
        while n < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            n += 8
            pos += 1
        code = (acc >> (n - width)) & ((1 << width) - 1)
        n -= width
        if code == clear:
            reset()
            width = 9
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("invalid first TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # EARLY change: the encoder widens when ITS next-code
            # counter hits 2^w - 1; this table lags the encoder's by
            # one entry, so the matching stream position is 2^w - 2
            # (one code earlier than GIF's late change — the TIFF
            # spec's documented historical quirk)
            if len(table) + 2 == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_expected])


def _lzw_encode_tiff(data: bytes) -> bytes:
    clear, eoi = 256, 257
    out = bytearray()
    acc = n = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n
        acc = (acc << width) | code
        n += width
        while n >= 8:
            out.append((acc >> (n - 8)) & 0xFF)
            n -= 8
        acc &= (1 << n) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(clear, width)
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = nxt
        nxt += 1
        # the decoder's table lags one entry AND changes early, so the
        # two offsets cancel: widen when nxt reaches 2^width - 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        elif nxt == 4094:
            emit(clear, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- PackBits


def _packbits_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < n_expected and pos < len(data):
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n + 1 bytes
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257 - n times
            if pos >= len(data):
                raise ValueError("truncated PackBits stream")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: noop
    if len(out) < n_expected:
        raise ValueError("truncated PackBits stream")
    return bytes(out[:n_expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal stretch up to the next >=3 repeat
        j = i + 1
        while (
            j < len(data)
            and j - i < 128
            and not (j + 2 < len(data) and data[j] == data[j + 1] == data[j + 2])
        ):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


# ------------------------------------------------------------ container

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}


def _read_ifd(payload: bytes, bo: str) -> dict[int, list[int]]:
    ifd_off = struct.unpack_from(bo + "I", payload, 4)[0]
    n = struct.unpack_from(bo + "H", payload, ifd_off)[0]
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ = struct.unpack_from(bo + "HH", payload, base)
        count = struct.unpack_from(bo + "I", payload, base + 4)[0]
        if typ not in _TYPE_SIZE:
            continue  # rationals etc. — not needed for pixel decode
        size = _TYPE_SIZE[typ] * count
        off = (
            base + 8
            if size <= 4
            else struct.unpack_from(bo + "I", payload, base + 8)[0]
        )
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(
            struct.unpack_from(bo + str(count) + fmt, payload, off)
        )
    return tags


def _tiff_pixels(payload: bytes) -> np.ndarray:
    """TIFF -> top-down (h, w, 3) uint8 RGB."""
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    t = _read_ifd(payload, bo)
    try:
        w = t[256][0]
        h = t[257][0]
        offsets = t[273]
        counts = t[279]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from exc
    spp = t.get(277, [1])[0]
    bits = t.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"only 8-bit TIFF samples supported, got {bits}")
    comp = t.get(259, [1])[0]
    photo = t.get(262, [1])[0]
    pred = t.get(317, [1])[0]
    rps = t.get(278, [h])[0] or h
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")

    row_bytes = w * spp
    raw = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        strip_rows = min(rps, h - i * rps)
        expected = strip_rows * row_bytes
        chunk = payload[off : off + cnt]
        if len(chunk) != cnt:
            raise ValueError("truncated TIFF strip")
        if comp == 1:
            if len(chunk) < expected:
                raise ValueError("short uncompressed TIFF strip")
            raw += chunk[:expected]
        elif comp == 5:
            raw += _lzw_decode_tiff(chunk, expected)
        elif comp == 32773:
            raw += _packbits_decode(chunk, expected)
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
    px = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, spp)
    if pred == 2:  # horizontal differencing, per sample plane
        px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
    elif pred != 1:
        raise ValueError(f"unsupported TIFF predictor {pred}")

    if photo == 2:  # RGB (+ ignored extra samples)
        if spp < 3:
            raise ValueError("RGB TIFF with fewer than 3 samples")
        return np.ascontiguousarray(px[:, :, :3])
    if photo in (0, 1):  # grayscale, either polarity
        g = px[:, :, 0]
        if photo == 0:
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    if photo == 3:  # palette via 16-bit ColorMap (R.. G.. B.. planes)
        cmap = t.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF missing ColorMap")
        cm = (np.array(cmap[: 3 * 256], dtype=np.uint32) >> 8).astype(
            np.uint8
        ).reshape(3, 256)
        return np.stack(
            [cm[0][px[:, :, 0]], cm[1][px[:, :, 0]], cm[2][px[:, :, 0]]],
            axis=2,
        )
    raise ValueError(f"unsupported TIFF photometric {photo}")


def decode_tiff(payload: bytes) -> dict:
    """Same output shape as the other image decoders."""
    px = _tiff_pixels(payload)
    means = px.astype(np.float64).mean(axis=(0, 1))
    return {
        "kind": "image/tiff",
        "width": px.shape[1],
        "height": px.shape[0],
        "n_channels": 3,
        "mean_r": float(means[0]),
        "mean_g": float(means[1]),
        "mean_b": float(means[2]),
    }


# -------------------------------------------------------------- encoder


def encode_tiff(
    rgb_rows: np.ndarray,
    compression: str = "none",
    big_endian: bool = False,
    predictor: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) grayscale -> TIFF bytes.
    ``compression``: "none" | "packbits" | "lzw"."""
    arr = np.ascontiguousarray(rgb_rows, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else 3
    bo = ">" if big_endian else "<"
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    if predictor and compression == "none":
        raise ValueError("predictor only makes sense with compression")
    rps = rows_per_strip or h

    plane = arr.reshape(h, w, spp)
    if predictor:
        # horizontal differencing per row: first column unchanged,
        # the rest stores deltas (mod 256)
        plane = np.diff(
            plane.astype(np.int16),
            axis=1,
            prepend=np.zeros((h, 1, spp), dtype=np.int16),
        ).astype(np.uint8)
    strips = []
    for y0 in range(0, h, rps):
        raw = plane[y0 : y0 + rps].tobytes()
        if compression == "packbits":
            strips.append(_packbits_encode(raw))
        elif compression == "lzw":
            strips.append(_lzw_encode_tiff(raw))
        else:
            strips.append(raw)

    entries: list[tuple[int, int, list[int]]] = [  # (tag, type, values)
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [8] * spp),
        (259, 3, [comp_id]),
        (262, 3, [1 if gray else 2]),
        (277, 3, [spp]),
        (278, 4, [rps]),
    ]
    if predictor:
        entries.append((317, 3, [2]))

    # layout: header(8) | IFD | out-of-line values | strips
    n_entries = len(entries) + 2  # + StripOffsets + StripByteCounts
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    tail = bytearray()
    tail_base = ifd_off + ifd_size

    def value_field(typ: int, values: list[int]) -> bytes:
        fmt = {3: "H", 4: "I"}[typ]
        size = _TYPE_SIZE[typ] * len(values)
        packed = struct.pack(bo + str(len(values)) + fmt, *values)
        if size <= 4:
            return packed.ljust(4, b"\x00")
        off = tail_base + len(tail)
        tail.extend(packed)
        return struct.pack(bo + "I", off)

    # strip placement comes after all out-of-line values; two passes
    # would be needed to know the exact offsets, so reserve the strip
    # offsets LAST in the tail: compute after other values are placed.
    fields = []
    for tag, typ, values in entries:
        fields.append((tag, typ, len(values), value_field(typ, values)))
    n_strips = len(strips)
    counts_field = value_field(4, [len(s) for s in strips])
    fields.append((279, 4, n_strips, counts_field))
    # now strip data begins after tail once offsets are appended
    offsets_size = 4 * n_strips
    strips_base = tail_base + len(tail) + (offsets_size if n_strips > 1 else 0)
    offs = []
    acc = strips_base
    for s in strips:
        offs.append(acc)
        acc += len(s)
    offsets_field = value_field(4, offs)
    fields.append((273, 4, n_strips, offsets_field))
    fields.sort(key=lambda f: f[0])  # spec: IFD entries ascending by tag

    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00")
    out += struct.pack(bo + "I", ifd_off)
    out += struct.pack(bo + "H", n_entries)
    for tag, typ, count, field in fields:
        out += struct.pack(bo + "HHI", tag, typ, count) + field
    out += struct.pack(bo + "I", 0)  # no next IFD
    out += tail
    for s in strips:
        out += s
    return bytes(out)


def resize_tiff(payload: bytes, width: int, height: int) -> bytes:
    """decode -> nearest-neighbor -> re-encode (uncompressed RGB)."""
    px = _tiff_pixels(payload)
    ys = (np.arange(height) * px.shape[0]) // height
    xs = (np.arange(width) * px.shape[1]) // width
    return encode_tiff(px[ys][:, xs])
