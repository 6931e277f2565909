"""X5 — multimodal columns: opaque binary payloads + typed metadata.

Design for 100 TB:

* media bytes live in a ``binary`` column ONLY at small payload sizes; at
  scale the column is a *pointer struct* (uri, offset, length) into bulk
  object storage (``pack_payload_shards`` writes the shards,
  ``extract_features_ptr`` / ``sample_frames_ptr`` range-fetch inside
  their Arrow kernels), so payload bytes never enter a plan, a shuffle,
  or the driver — the ``payload_meta`` struct carries both forms.
* decode / feature-extract / resize / frame-sample are Arrow-batched
  ``mapInPandas`` operators: schema-stable, 1->N capable (frame
  sampling), partition-parallel.
* codec boundary (rounds 9-10): media decodes FOR REAL with zero
  external libs — ``decode_wav`` (stdlib ``wave`` + numpy,
  8/16/24/32-bit PCM), ``decode_bmp`` (``struct`` header parse + numpy
  pixel means), ``decode_png`` (stdlib ``zlib`` inflate + per-row
  unfilter — PNG's "compression" IS zlib), BASELINE JPEG (``jpeg.py``,
  a from-spec Huffman + DCT codec, round-trip ground-truth tested),
  and ``decode_y4m``, dispatched by magic bytes in ``decode_media``
  and served Arrow-batched by ``extract_media_meta``.  Round 11
  added progressive (SOF2) JPEG to ``jpeg.py`` — spectral selection +
  successive approximation per T.81 Annex G, plus DRI/RSTm restart
  intervals — a full GIF87a/89a codec (``gif.py``: from-spec LZW,
  interlace, animation frames, transparency), G.711 mu-law/A-law WAV
  (from-spec companding expansion), and the AU and AIFF audio
  containers (manual big-endian chunk walks incl. the 80-bit extended
  sample rate), and baseline TIFF 6.0 (``tiff.py``: both byte orders,
  none/PackBits/TIFF-LZW with the early-change quirk, predictor 2,
  gray/RGB/palette).  Arithmetic-coded JPEG, H.264 and MP3 remain out
  of scope —
  ``decode_image`` raises NotImplementedError by contract, and
  ``pseudo_decode`` provides a deterministic stand-in (derived from
  the payload's md5) so the Spark-side plumbing — schema, batching,
  UDF signature, fan-out — is fully real and tested either way.
  Degraded rows are flagged ``kind='opaque'`` with a ``decode_error``
  reason; fabricated pseudo stats never share columns with measured
  ones.  The catalog's oracle-gated queries stay on the deterministic
  pseudo path (DuckDB twins must reproduce the values); the real
  decoders share the identical kernel shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text", mime: str = "application/octet-stream"
) -> DataFrame:
    """Materialize an opaque binary payload + metadata struct.

    (Test corpus has no real media, so the payload is the UTF-8 bytes of
    the text — the engine treats it as opaque, which is the point.)
    """
    payload = F.col(text_col).cast("binary")
    return docs.withColumn("payload", payload).withColumn(
        "payload_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.concat(F.lit("mem://documents/"), F.col("doc_id")).alias("uri"),
            F.lit(0).cast("bigint").alias("offset"),
        ),
    )


POINTER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("uri", StringType()),
        StructField("offset", LongType()),
        StructField("length", LongType()),
    ]
)


def pack_payload_shards(
    docs: DataFrame, shard_dir: str, text_col: str = "text"
) -> DataFrame:
    """WebDataset-style payload packing: each partition concatenates its
    payload bytes into ONE shard file and emits (uri, offset, length)
    pointer rows — the 100 TB media layout where bytes live in bulk
    object storage and only ~60-byte pointers ever enter a shuffle.

    This is the ingest-side boundary job: run it once (materialize the
    pointer table), then every downstream operator fetches bytes
    executor-side inside its Arrow kernel via :func:`fetch_payloads`.
    Shard files are named by (partition id, task attempt id): a retried
    or speculative attempt writes its OWN file, and since the pointer
    rows Spark commits are the ones emitted by the committed attempt,
    they always reference that attempt's bytes — no reliance on
    deterministic input order, no window where a re-run rewrites a file
    another attempt's committed offsets point into.  Losing attempts
    leave orphan shards; they are unreferenced (harmless) and
    :func:`vacuum_payload_shards` drops any shard whose uri no longer
    appears in the pointer table.  In production the uri scheme would be s3://... range reads
    instead of local files.
    """
    import os  # noqa: PLC0415

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext  # noqa: PLC0415

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(shard_dir, exist_ok=True)
        path = os.path.join(
            shard_dir, f"shard-{pid:05d}-{ctx.taskAttemptId()}.bin"
        )
        uri = "file://" + path
        offset = 0
        with open(path, "wb") as fh:
            for pdf in batches:
                ids, offs, lens = [], [], []
                for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                    # binary columns pack as-is (real media payloads);
                    # anything else is utf-8 text
                    data = (
                        bytes(text)
                        if isinstance(text, (bytes, bytearray))
                        else str(text).encode("utf-8")
                    )
                    fh.write(data)
                    ids.append(int(doc_id))
                    offs.append(offset)
                    lens.append(len(data))
                    offset += len(data)
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "uri": pd.Series([uri] * len(ids), dtype="object"),
                        "offset": pd.Series(offs, dtype="int64"),
                        "length": pd.Series(lens, dtype="int64"),
                    }
                )

    return docs.select("doc_id", text_col).mapInPandas(run, POINTER_SCHEMA)


def vacuum_payload_shards(pointers: DataFrame, shard_dir: str) -> list[str]:
    """Drop orphan shard files left by losing/speculative task attempts.

    :func:`pack_payload_shards` names shard files by (partition id, task
    attempt id), so a retried attempt's file is never referenced by the
    committed pointer rows — harmless, but it leaks storage over a
    long-running ingest with retries (r12 ADVICE).  This pass deletes
    every ``shard-*.bin`` in ``shard_dir`` whose uri does not appear in
    the pointer table, returning the deleted paths.

    Scale note: the referenced-uri set is one row per committed task
    attempt (O(partitions), ~60 bytes each — millions of shards collect
    in MBs), so the distinct+collect is driver-safe at 100 TB; the
    directory listing, not the pointer scan, is the large side and stays
    a local/object-store LIST.  Run it only AFTER the pointer table is
    fully committed — vacuuming concurrently with an ingest would race
    writers whose pointers are not yet visible.
    """
    import glob as _glob  # noqa: PLC0415
    import os  # noqa: PLC0415

    referenced = {
        row["uri"].removeprefix("file://")
        for row in pointers.select("uri").distinct().collect()
    }
    deleted: list[str] = []
    for path in sorted(_glob.glob(os.path.join(shard_dir, "shard-*.bin"))):
        if path not in referenced:
            os.remove(path)
            deleted.append(path)
    return deleted


def fetch_payloads(pdf: pd.DataFrame) -> pd.Series:
    """Executor-side range fetch for a pointer batch: one open() per
    distinct shard uri in the batch, seek+read per row.  Runs INSIDE the
    Arrow kernel, so payload bytes exist only within the task that
    consumes them — they never enter the plan, a shuffle, or the
    driver."""
    out = pd.Series([None] * len(pdf), dtype="object", index=pdf.index)
    for uri, grp in pdf.groupby("uri", sort=False):
        path = str(uri).removeprefix("file://")
        with open(path, "rb") as fh:
            for idx, off, ln in zip(grp.index, grp["offset"], grp["length"]):
                fh.seek(int(off))
                out[idx] = fh.read(int(ln))
    return out


def decode_image(payload: bytes) -> "object":
    """Decoder boundary for formats still out of scope:
    arithmetic-coded JPEG, H.264, MP3 (each needs machinery this repo
    hasn't built).  Everything else decodes FOR REAL with zero codec
    libraries: :func:`decode_wav` (stdlib ``wave``), :func:`decode_bmp`
    (``struct`` + numpy), :func:`decode_png` (stdlib ``zlib`` inflate +
    per-row unfilter), baseline AND progressive JPEG (:mod:`.jpeg` — a
    from-spec Huffman + DCT codec), GIF87a/89a (:mod:`.gif` — from-spec
    LZW), :func:`decode_y4m`, with magic-byte dispatch in
    :func:`decode_media`."""
    raise NotImplementedError(
        "arithmetic-coded JPEG, H.264 and MP3 are out of scope; "
        "decode_media handles WAV/BMP/PNG/JPEG(SOF0+SOF2)/GIF/y4m for "
        "real, and pseudo_decode provides the deterministic stand-in"
    )


def _g711_ulaw_to_linear(data: bytes) -> "object":
    """ITU-T G.711 mu-law expansion (from the spec's segment layout):
    byte -> 14-bit magnitude scaled to 16-bit.  Vectorized via a
    256-entry table built from the formula, not hardcoded."""
    import numpy as np  # noqa: PLC0415

    b = ~np.arange(256, dtype=np.int32) & 0xFF
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = ((((mant << 1) + 33) << exp) - 33) << 2
    table = np.where(b & 0x80, -mag, mag).astype(np.int16)
    return table[np.frombuffer(data, dtype=np.uint8)]


def _g711_alaw_to_linear(data: bytes) -> "object":
    """ITU-T G.711 A-law expansion (even bits inverted on the wire;
    sign bit 1 = positive; no true zero)."""
    import numpy as np  # noqa: PLC0415

    b = np.arange(256, dtype=np.int32) ^ 0x55
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = (mant << 4) + 8
    mag = np.where(exp > 0, (mag + 0x100) << np.maximum(exp - 1, 0), mag)
    table = np.where(b & 0x80, mag, -mag).astype(np.int16)
    return table[np.frombuffer(data, dtype=np.uint8)]


def _audio_stats(samples, full_scale: float) -> tuple[float, float]:
    import numpy as np  # noqa: PLC0415

    if not samples.size:
        return 0.0, 0.0
    s = samples.astype(np.float64)
    return (
        float(np.abs(s).max() / full_scale),
        float(np.sqrt(np.mean(s**2)) / full_scale),
    )


def _wav_g711(payload: bytes) -> dict:
    """Manual RIFF walk for the G.711 companded WAV formats the stdlib
    ``wave`` module refuses (fmt tag 6 = A-law, 7 = mu-law)."""
    import struct  # noqa: PLC0415

    pos, end = 12, len(payload)
    fmt = data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, n_channels, sample_rate = fmt[0], fmt[1], fmt[2]
    if tag == 7:
        samples = _g711_ulaw_to_linear(data)
    elif tag == 6:
        samples = _g711_alaw_to_linear(data)
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")
    n_frames = len(data) // max(1, n_channels)
    peak, rms = _audio_stats(samples, 32768.0)
    return {
        "kind": "audio/wav",
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        "duration_ms": int(round(1000.0 * n_frames / sample_rate))
        if sample_rate
        else 0,
        "peak": peak,
        "rms": rms,
    }


def decode_wav(payload: bytes) -> dict:
    """REAL audio decode of a WAV payload — pure stdlib ``wave`` plus
    numpy over the sample buffer, no external codec.  Handles 8-bit
    unsigned and 16/24/32-bit signed integer PCM (24-bit is the packed
    3-bytes-per-sample studio format — assembled with numpy shifts and
    sign-extended), plus the G.711 companded telephony formats (mu-law
    fmt tag 7, A-law tag 6) via a from-spec expansion.  Returns typed
    media properties + signal stats (peak/RMS), i.e. the same work a
    feature-extraction pass does on real audio at 100 TB."""
    import io  # noqa: PLC0415
    import wave  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    try:
        with wave.open(io.BytesIO(payload)) as w:
            n_channels = w.getnchannels()
            sample_rate = w.getframerate()
            sample_width = w.getsampwidth()
            n_frames = w.getnframes()
            pcm = w.readframes(n_frames)
    except wave.Error as exc:
        if "unknown format" in str(exc):
            return _wav_g711(payload)  # G.711 or an explicit refusal
        raise
    if sample_width == 2:
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
        full_scale = 32768.0
    elif sample_width == 1:  # 8-bit WAV is unsigned, midpoint 128
        samples = np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0
        full_scale = 128.0
    elif sample_width == 3:  # 24-bit packed little-endian signed
        b = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        raw = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = np.where(raw >= 1 << 23, raw - (1 << 24), raw).astype(
            np.float64
        )
        full_scale = float(1 << 23)
    elif sample_width == 4:
        samples = np.frombuffer(pcm, dtype="<i4").astype(np.float64)
        full_scale = float(1 << 31)
    else:
        raise ValueError(f"unsupported PCM sample width {sample_width}")
    peak = float(np.abs(samples).max() / full_scale) if samples.size else 0.0
    rms = (
        float(np.sqrt(np.mean(samples**2)) / full_scale)
        if samples.size
        else 0.0
    )
    return {
        "kind": "audio/wav",
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        "duration_ms": int(round(1000.0 * n_frames / sample_rate))
        if sample_rate
        else 0,
        "peak": peak,
        "rms": rms,
    }


def decode_au(payload: bytes) -> dict:
    """REAL decode of a Sun/NeXT AU (``audio/basic``) payload — the
    big-endian header is six u32 fields; sample encodings cover G.711
    mu-law/A-law and 8/16/24/32-bit linear PCM."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if payload[:4] != b".snd":
        raise ValueError("not an AU payload")
    off, size, enc, sample_rate, n_channels = struct.unpack_from(
        ">IIIII", payload, 4
    )
    if off < 24 or off > len(payload):
        raise ValueError("corrupt AU header")
    data = payload[off : off + size] if size != 0xFFFFFFFF else payload[off:]
    if enc == 1:
        samples, width, full = _g711_ulaw_to_linear(data), 1, 32768.0
    elif enc == 27:
        samples, width, full = _g711_alaw_to_linear(data), 1, 32768.0
    elif enc == 2:
        samples = np.frombuffer(data, dtype=np.int8)
        width, full = 1, 128.0
    elif enc == 3:
        samples = np.frombuffer(data, dtype=">i2")
        width, full = 2, 32768.0
    elif enc == 4:  # 24-bit packed big-endian signed (AU is network order)
        if len(data) % 3:
            # match the np.frombuffer strictness of the 16/32-bit paths:
            # a truncated buffer is a decode error, not a silently
            # shorter clip (r12 ADVICE)
            raise ValueError(
                f"AU 24-bit data not a multiple of 3 bytes ({len(data)})"
            )
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        raw = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        samples = np.where(raw >= 1 << 23, raw - (1 << 24), raw)
        width, full = 3, float(1 << 23)
    elif enc == 5:
        samples = np.frombuffer(data, dtype=">i4")
        width, full = 4, float(1 << 31)
    else:
        raise ValueError(f"unsupported AU encoding {enc}")
    n_frames = len(data) // max(1, width * n_channels)
    peak, rms = _audio_stats(samples, full)
    return {
        "kind": "audio/basic",
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        "duration_ms": int(round(1000.0 * n_frames / sample_rate))
        if sample_rate
        else 0,
        "peak": peak,
        "rms": rms,
    }


def _float80_to_int(b: bytes) -> int:
    """IEEE 754 80-bit extended float -> int (AIFF sample rates are
    whole numbers stored in this format; parsed from the spec layout:
    1 sign + 15 exponent bits, then a 64-bit mantissa with an explicit
    integer bit)."""
    import struct  # noqa: PLC0415

    se, mant = struct.unpack(">HQ", b)
    sign = -1 if se & 0x8000 else 1
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0
    return sign * int(mant * 2.0 ** (exp - 16383 - 63))


def decode_aiff(payload: bytes) -> dict:
    """REAL decode of an AIFF payload — manual FORM/COMM/SSND chunk
    walk (the stdlib ``aifc`` module is removed in Python 3.13, so the
    parse is done from the spec: big-endian chunks, the sample rate as
    an 80-bit extended float, big-endian signed PCM in SSND)."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if payload[:4] != b"FORM":
        raise ValueError("not an AIFF payload")
    form = payload[8:12]
    if form == b"AIFC":
        raise ValueError("AIFC compressed AIFF unsupported")
    if form != b"AIFF":
        raise ValueError("not an AIFF payload")
    pos, end = 12, len(payload)
    comm = ssnd = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from(">I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"COMM":
            n_channels, n_frames, bits = struct.unpack_from(">hLh", body, 0)
            comm = (n_channels, n_frames, bits, _float80_to_int(body[8:18]))
        elif cid == b"SSND":
            data_off = struct.unpack_from(">I", body, 0)[0]
            ssnd = body[8 + data_off :]
        pos += 8 + size + (size & 1)
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    n_channels, n_frames, bits, sample_rate = comm
    if bits == 16:
        samples = np.frombuffer(ssnd, dtype=">i2")
        full = 32768.0
    elif bits == 8:
        samples = np.frombuffer(ssnd, dtype=np.int8)  # AIFF 8-bit is signed
        full = 128.0
    elif bits == 32:
        samples = np.frombuffer(ssnd, dtype=">i4")
        full = float(1 << 31)
    else:
        raise ValueError(f"unsupported AIFF bit depth {bits}")
    peak, rms = _audio_stats(samples, full)
    return {
        "kind": "audio/aiff",
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        "duration_ms": int(round(1000.0 * n_frames / sample_rate))
        if sample_rate
        else 0,
        "peak": peak,
        "rms": rms,
    }


def _pnm_pixels(payload: bytes) -> "object":
    """netpbm (PGM P2/P5, PPM P3/P6) -> (h, w, 3) uint8 RGB.  Header
    tokens may be separated by any whitespace and ``#`` comments; raw
    variants carry binary samples after a single whitespace byte."""
    import numpy as np  # noqa: PLC0415

    magic = payload[:2]
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ValueError("not a PGM/PPM payload")
    # tokenize the header: magic, width, height, maxval
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PNM header")
        c = payload[pos]
        if c == ord(b"#"):
            pos = payload.index(b"\n", pos) + 1
        elif c in b" \t\r\n":
            pos += 1
        else:
            end = pos
            while end < len(payload) and payload[end] not in b" \t\r\n#":
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
    w, h, maxval = tokens
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PNM maxval {maxval}")
    spp = 3 if magic in (b"P3", b"P6") else 1
    n = w * h * spp
    if magic in (b"P5", b"P6"):  # raw: exactly one whitespace then data
        pos += 1
        data = np.frombuffer(payload[pos : pos + n], dtype=np.uint8)
    else:  # plain: ascii sample values ('#' comments are legal mid-raster)
        raster = payload[pos:]
        if b"#" in raster:
            import re  # noqa: PLC0415

            raster = re.sub(rb"#[^\n]*", b" ", raster)
        data = np.array(raster.split()[:n], dtype=np.int64)
    if data.size != n:
        raise ValueError("truncated PNM pixel data")
    if maxval != 255:
        data = (data.astype(np.int64) * 255) // maxval
    px = data.astype(np.uint8).reshape(h, w, spp)
    return px if spp == 3 else np.repeat(px, 3, axis=2)


def decode_pnm(payload: bytes) -> dict:
    """Same output shape as the other image decoders."""
    import numpy as np  # noqa: PLC0415

    px = _pnm_pixels(payload)
    means = px.astype(np.float64).mean(axis=(0, 1))
    return {
        "kind": "image/x-portable-pixmap"
        if payload[:2] in (b"P3", b"P6")
        else "image/x-portable-graymap",
        "width": px.shape[1],
        "height": px.shape[0],
        "n_channels": 3,
        "mean_r": float(means[0]),
        "mean_g": float(means[1]),
        "mean_b": float(means[2]),
    }


def encode_pnm(rgb_rows: "object", plain: bool = False) -> bytes:
    """(h, w, 3) uint8 -> PPM (P6 raw, or P3 plain ascii)."""
    import numpy as np  # noqa: PLC0415

    arr = np.ascontiguousarray(rgb_rows, dtype=np.uint8)
    h, w = arr.shape[:2]
    if plain:
        body = "\n".join(
            " ".join(str(v) for v in row) for row in arr.reshape(h, -1)
        )
        return f"P3\n{w} {h}\n255\n{body}\n".encode()
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def resize_pnm(payload: bytes, width: int, height: int) -> bytes:
    import numpy as np  # noqa: PLC0415

    px = _pnm_pixels(payload)
    ys = (np.arange(height) * px.shape[0]) // height
    xs = (np.arange(width) * px.shape[1]) // width
    return encode_pnm(px[ys][:, xs])


def decode_bmp(payload: bytes) -> dict:
    """REAL image decode of an uncompressed 24/32-bit BMP — ``struct``
    over the BITMAPFILEHEADER/BITMAPINFOHEADER plus numpy over the
    (4-byte row-padded, bottom-up) pixel array.  Returns dimensions and
    channel means: genuine pixel math, no codec library."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"only uncompressed 24/32-bit BMP decodable here (bpp={bpp},"
            f" compression={compression})"
        )
    n_ch = bpp // 8
    abs_h = abs(height)
    row_stride = (width * n_ch + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * abs_h, offset=data_offset
    ).reshape(abs_h, row_stride)[:, : width * n_ch]
    rows = px.reshape(abs_h, width, n_ch)
    if height > 0:  # positive height = bottom-up storage
        rows = rows[::-1]
    means = rows.astype(np.float64).mean(axis=(0, 1))  # BGR(A) order
    return {
        "kind": "image/bmp",
        "width": width,
        "height": abs_h,
        "mean_r": float(means[2]),
        "mean_g": float(means[1]),
        "mean_b": float(means[0]),
    }


def encode_bmp(rgb_rows: "object") -> bytes:
    """Inverse of :func:`decode_bmp`: numpy (h, w, 3) uint8 RGB array ->
    uncompressed 24-bit bottom-up BMP bytes."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    arr = np.ascontiguousarray(rgb_rows, dtype=np.uint8)
    h, w, _ = arr.shape
    bgr = arr[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
    pad = (4 - (w * 3) % 4) % 4
    if pad:
        rows = b"".join(
            bgr[r].tobytes() + b"\x00" * pad for r in range(h)
        )
    else:
        rows = bgr.tobytes()
    data_offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", data_offset + len(rows), 0, 0, data_offset
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    return header + info + rows


def _bmp_rgb_rows(payload: bytes) -> "object":
    """Top-down (h, w, 3) uint8 RGB pixel array from an uncompressed
    24/32-bit BMP, honoring the signed-height convention (positive
    height = bottom-up rows on disk, negative = already top-down)."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    decode_bmp(payload)  # validates container
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    src_w, signed_h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<HH", payload, 26)[1]
    n_ch = bpp // 8
    src_h = abs(signed_h)
    stride = (src_w * n_ch + 3) & ~3
    px = np.frombuffer(
        payload, dtype=np.uint8, count=stride * src_h, offset=data_offset
    ).reshape(src_h, stride)[:, : src_w * n_ch].reshape(src_h, src_w, n_ch)
    if signed_h > 0:  # bottom-up storage -> flip to top-down
        px = px[::-1]
    return px[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped


def _nearest_resize(rgb: "object", width: int, height: int) -> "object":
    import numpy as np  # noqa: PLC0415

    src_h, src_w = rgb.shape[:2]
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    return rgb[ys][:, xs, :3]


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize for uncompressed BMP: nearest-neighbor via
    numpy index sampling, re-encoded as 24-bit BMP.  The real-math twin
    of the catalog's deterministic ``resize`` stand-in — same kernel
    shape, actual pixels."""
    return encode_bmp(_nearest_resize(_bmp_rgb_rows(payload), width, height))


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_pixels(payload: bytes) -> "object":
    """REAL PNG decode, stdlib-only: chunk walk + ``zlib`` inflate +
    per-row unfilter (all 5 filter types per the PNG spec §9), returning
    a top-down (h, w, channels) uint8 array.  Supports the
    overwhelmingly common case — 8-bit, non-interlaced, color types
    0/2/4/6 (gray, RGB, gray+alpha, RGBA); palette and 16-bit raise.
    Filters Sub/Up are vectorized (per-lane cumsum / row add);
    Average/Paeth carry a left-pixel dependency so those rows unfilter
    byte-sequentially — acceptable because this runs inside an Arrow
    kernel, partition-parallel across the corpus."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"only 8-bit non-interlaced gray/RGB(A) PNG decodable here "
            f"(depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG pixel data size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        base = r * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1)
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 1:  # Sub: per-lane running sum mod 256
            cur = line.copy()
            for o in range(ch):
                lane = cur[o::ch]
                lane[:] = np.cumsum(lane, dtype=np.uint64) & 0xFF
        elif ftype == 2:  # Up: uint8 add wraps mod 256
            cur = line + prev
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = cur
        prev = cur
    return out.reshape(h, w, ch)


def decode_png(payload: bytes) -> dict:
    """REAL image decode of an 8-bit non-interlaced PNG — the last
    feasible stdlib codec (zlib inflate IS the PNG compression; only
    DCT formats like JPEG genuinely need an external library).  Same
    output shape as :func:`decode_bmp`: dimensions + channel means."""
    import numpy as np  # noqa: PLC0415

    px = _png_pixels(payload)
    h, w, ch = px.shape
    means = px.astype(np.float64).mean(axis=(0, 1))
    if ch >= 3:
        mean_r, mean_g, mean_b = means[0], means[1], means[2]
    else:  # grayscale (with or without alpha): replicate the luma
        mean_r = mean_g = mean_b = means[0]
    return {
        "kind": "image/png",
        "width": w,
        "height": h,
        "mean_r": float(mean_r),
        "mean_g": float(mean_g),
        "mean_b": float(mean_b),
    }


def encode_png(rgb_rows: "object") -> bytes:
    """Inverse of :func:`decode_png`: numpy (h, w, 3) uint8 RGB array ->
    8-bit truecolor PNG (filter type 0 rows, one zlib-deflated IDAT)."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    arr = np.ascontiguousarray(rgb_rows, dtype=np.uint8)
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """REAL PNG resize: decode -> nearest-neighbor -> re-encode as
    truecolor PNG (gray expands to RGB, alpha drops — matching
    :func:`resize_bmp`'s 24-bit output contract)."""
    import numpy as np  # noqa: PLC0415

    px = _png_pixels(payload)
    ch = px.shape[2]
    if ch == 1:
        rgb = np.repeat(px, 3, axis=2)
    elif ch == 2:  # gray+alpha -> replicate luma
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    else:
        rgb = px[:, :, :3]
    return encode_png(_nearest_resize(rgb, width, height))


def resize_media(
    payload: bytes, width: int, height: int, quality: int = 90
) -> bytes:
    """Magic-byte resize dispatch: BMP, PNG, and baseline JPEG resize
    on actual pixels, re-encoded in their own container; anything else
    raises (the caller decides whether to degrade, as
    :func:`decode_media` does).

    ``quality`` applies to JPEG only: the round-trip re-encodes through
    the lossy codec, so output bytes are NOT a pure resample of the
    input — expect quantization loss on top of the resize even at
    quality 100.  BMP and PNG are lossless containers and ignore it.
    """
    if payload[:2] == b"BM":
        return resize_bmp(payload, width, height)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from foglamp_filter_python35_spark.functions import (  # noqa: PLC0415
            gif as _gif,
        )

        return _gif.resize_gif(payload, width, height)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from foglamp_filter_python35_spark.functions import (  # noqa: PLC0415
            tiff as _tiff,
        )

        return _tiff.resize_tiff(payload, width, height)
    if payload[:2] in (b"P2", b"P3", b"P5", b"P6") and payload[2:3] in (
        b" ",
        b"\t",
        b"\r",
        b"\n",
        b"#",
    ):
        return resize_pnm(payload, width, height)
    if payload[:8] == _PNG_SIG:
        return resize_png(payload, width, height)
    if payload[:2] == b"\xff\xd8":
        from foglamp_filter_python35_spark.functions import (  # noqa: PLC0415
            jpeg as _jpeg,
        )

        return _jpeg.resize_jpeg(payload, width, height, quality=quality)
    raise ValueError("resize_media handles BMP, GIF, TIFF, PNG and JPEG only")


def _y4m_header(payload: bytes) -> tuple[int, int, int, dict, int]:
    """Shared YUV4MPEG2 header parse (decode_y4m + sample_y4m_frames):
    returns (width, height, frame_bytes, params, body_offset)."""
    nl = payload.index(b"\n")
    head = payload[:nl].decode("ascii", "strict").split(" ")
    if head[0] != "YUV4MPEG2":
        raise ValueError("not a y4m payload")
    params = {t[0]: t[1:] for t in head[1:] if t}
    width, height = int(params["W"]), int(params["H"])
    chroma = params.get("C", "420")
    if chroma.startswith("420"):
        frame_bytes = width * height * 3 // 2
    elif chroma.startswith("422"):
        frame_bytes = width * height * 2
    elif chroma.startswith("444"):
        frame_bytes = width * height * 3
    else:
        raise ValueError(f"unsupported y4m chroma {chroma}")
    return width, height, frame_bytes, params, nl + 1


def _y4m_frames(
    payload: bytes, body_offset: int, frame_bytes: int
) -> "Iterator[tuple[int, int]]":
    """Single walk over the frame markers: yields (frame_idx,
    plane_offset) per frame, validating each ``FRAME`` marker."""
    pos, idx = body_offset, 0
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt y4m frame marker")
        if fnl + 1 + frame_bytes > len(payload):
            raise ValueError("truncated y4m final frame")
        yield idx, fnl + 1
        idx += 1
        pos = fnl + 1 + frame_bytes


def decode_y4m(payload: bytes) -> dict:
    """REAL video decode of a YUV4MPEG2 (y4m) payload — the standard
    UNCOMPRESSED video container: an ASCII header (``YUV4MPEG2 W.. H..
    F<num>:<den> ...``) followed by ``FRAME\\n`` + raw planar YUV per
    frame.  No codec involved; frame count and per-frame luma are plain
    buffer math."""
    import numpy as np  # noqa: PLC0415

    width, height, frame_bytes, params, pos = _y4m_header(payload)
    num, den = (params.get("F") or "25:1").split(":")
    n_frames, luma_means = 0, []
    for _idx, y_off in _y4m_frames(payload, pos, frame_bytes):
        y = np.frombuffer(
            payload, dtype=np.uint8, count=width * height, offset=y_off
        )
        luma_means.append(float(y.mean()))
        n_frames += 1
    fps = float(num) / float(den)
    return {
        "kind": "video/y4m",
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "duration_ms": int(round(1000.0 * n_frames / fps)) if fps else 0,
        "fps": fps,
        "luma_means": luma_means,
    }


def sample_y4m_frames(payload: bytes, k: int) -> list[tuple[int, bytes]]:
    """REAL frame sampling: ``k`` evenly-spaced (frame_idx, Y-plane
    bytes) pairs from a y4m payload — what ``sample_frames`` stands in
    for, executed on actual video data.  ONE walk over the payload:
    frame offsets are collected while counting, then the selected Y
    planes are sliced by offset — no second decode pass."""
    width, height, frame_bytes, _params, body = _y4m_header(payload)
    offsets = [off for _idx, off in _y4m_frames(payload, body, frame_bytes)]
    n = len(offsets)
    if n == 0 or k <= 0:
        return []
    # k >= n degrades to every frame once; else evenly spaced indices
    want = (
        list(range(n))
        if k >= n
        else sorted({(i * n) // k for i in range(k)})
    )
    return [
        (i, payload[offsets[i] : offsets[i] + width * height]) for i in want
    ]


def decode_media(payload: bytes) -> dict:
    """Magic-byte dispatch: real decode where the container needs no
    entropy codec (RIFF/WAVE, BM, PNG, YUV4MPEG2), flagged
    ``kind='opaque'`` fallback for everything else — so one kernel
    serves mixed corpora and the env-blocked boundary is explicit per
    row, not per job.  Opaque rows carry a ``decode_error`` reason (the
    engine twin of the reference's logged error + pass-through degrade,
    python35_filter.cpp:263-301) and keep the deterministic pseudo
    stats NESTED under ``pseudo`` — never in the real width/height/...
    fields, so aggregates can't silently mix fabricated and measured
    pixel stats."""
    err = None
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return decode_wav(payload)
        if payload[:4] == b".snd":
            return decode_au(payload)
        if payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
            return decode_aiff(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:8] == _PNG_SIG:
            return decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            from foglamp_filter_python35_spark.functions import (  # noqa: PLC0415
                jpeg as _jpeg,
            )

            return _jpeg.decode_jpeg(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from foglamp_filter_python35_spark.functions import (  # noqa: PLC0415
                gif as _gif,
            )

            return _gif.decode_gif(payload)
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            from foglamp_filter_python35_spark.functions import (  # noqa: PLC0415
                tiff as _tiff,
            )

            return _tiff.decode_tiff(payload)
        if payload[:2] in (b"P2", b"P3", b"P5", b"P6") and payload[2:3] in (
            b" ",
            b"\t",
            b"\r",
            b"\n",
            b"#",
        ):
            return decode_pnm(payload)
        if payload[:9] == b"YUV4MPEG2":
            m = decode_y4m(payload)
            m.pop("luma_means", None)  # keep the meta row narrow
            return m
        err = "unrecognized container (no magic-byte match)"
    except Exception as exc:  # noqa: BLE001 — corrupt container: degrade
        err = f"{type(exc).__name__}: {exc}"
    return {
        "kind": "opaque",
        "decode_error": err,
        "pseudo": pseudo_decode(payload),
    }


MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("decode_error", StringType()),
    ]
)


def _media_meta_frame(doc_ids: pd.Series, payloads) -> pd.DataFrame:
    metas = [decode_media(p) for p in payloads]
    return pd.DataFrame(
        {
            "doc_id": doc_ids.astype("int64"),
            "kind": [m["kind"] for m in metas],
            "n_bytes": [len(p) for p in payloads],
            "width": pd.array(
                [m.get("width") for m in metas], dtype="Int32"
            ),
            "height": pd.array(
                [m.get("height") for m in metas], dtype="Int32"
            ),
            "n_channels": pd.array(
                [m.get("n_channels") for m in metas], dtype="Int32"
            ),
            "sample_rate": pd.array(
                [m.get("sample_rate") for m in metas], dtype="Int32"
            ),
            "duration_ms": pd.array(
                [m.get("duration_ms") for m in metas], dtype="Int64"
            ),
            "decode_error": [m.get("decode_error") for m in metas],
        }
    )


def extract_media_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched REAL media metadata extraction (same mapInPandas
    shape as :func:`extract_features`): WAV/BMP/PNG/JPEG/y4m rows decode
    for real, anything else degrades to the opaque path with its kind,
    NULL media properties, and the ``decode_error`` reason recorded —
    so corpus-hygiene audits can count/classify degraded rows without
    re-decoding.  Swapping in a compressed-format codec later changes
    only ``decode_media``'s dispatch table — zero plan structure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _media_meta_frame(pdf["doc_id"], list(pdf["payload"]))

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        run, MEDIA_META_SCHEMA
    )


def extract_media_meta_ptr(pointers: DataFrame) -> DataFrame:
    """Real-codec metadata extraction over (uri, offset, length)
    pointers — the pointer twin of :func:`extract_media_meta`, mirroring
    the :func:`extract_features` / :func:`extract_features_ptr` pair.
    Payload bytes are range-fetched inside the Arrow kernel, so no
    binary column ever exists in the plan; decode (zlib inflate,
    Huffman+IDCT, PCM header walk) runs map-side, partition-parallel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _media_meta_frame(pdf["doc_id"], list(fetch_payloads(pdf)))

    return pointers.select("doc_id", "uri", "offset", "length").mapInPandas(
        run, MEDIA_META_SCHEMA
    )


def resize_media_ptr(
    pointers: DataFrame, width: int, height: int, quality: int = 90
) -> DataFrame:
    """REAL resize over pointers: range-fetch the payload inside the
    kernel, decode + nearest-neighbor resample + re-encode in the
    payload's own container via :func:`resize_media` (BMP/PNG/baseline
    JPEG; ``quality`` applies to the lossy JPEG re-encode only).  Rows
    whose container :func:`resize_media` cannot handle degrade to a NULL
    ``resized_payload`` rather than failing the batch — the same
    per-row degrade contract as :func:`decode_media`.  Output schema is
    :data:`RESIZE_SCHEMA`; rows stay 1:1 and nothing shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for payload in fetch_payloads(pdf):
                try:
                    resized.append(
                        resize_media(payload, width, height, quality=quality)
                    )
                except Exception:  # noqa: BLE001 — per-row degrade
                    resized.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "resized_payload": pd.Series(resized, dtype="object"),
                }
            )

    return pointers.select("doc_id", "uri", "offset", "length").mapInPandas(
        run, RESIZE_SCHEMA
    )


def pseudo_decode(payload: bytes) -> dict:
    """Deterministic fake decode: derives stable 'media properties' from
    the payload digest.  Stands in for the real codec with identical
    schema/shape."""
    digest = hashlib.md5(payload).digest()
    return {
        "width": 64 + digest[0] % 64,
        "height": 64 + digest[1] % 64,
        "n_frames": 1 + digest[2] % 8,
    }


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _features_frame(doc_ids: pd.Series, payloads: pd.Series) -> pd.DataFrame:
    feats = [pseudo_decode(p) for p in payloads]
    return pd.DataFrame(
        {
            "doc_id": doc_ids.astype("int64"),
            "n_bytes": [len(p) for p in payloads],
            "digest": [hashlib.md5(p).hexdigest() for p in payloads],
            "width": [f["width"] for f in feats],
            "height": [f["height"] for f in feats],
            "n_frames": [f["n_frames"] for f in feats],
        }
    )


def extract_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _features_frame(pdf["doc_id"], pdf["payload"])

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def extract_features_ptr(pointers: DataFrame) -> DataFrame:
    """Feature extraction over (uri, offset, length) pointers: payloads
    are range-fetched inside the kernel, so no binary column ever exists
    in the plan (same output as :func:`extract_features`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _features_frame(pdf["doc_id"], fetch_payloads(pdf))

    return pointers.select("doc_id", "uri", "offset", "length").mapInPandas(
        run, FEATURE_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_payload", BinaryType()),
    ]
)


def resize(
    docs_with_payload: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Arrow-batched resize: in production the body is one PIL/opencv
    call per payload; here the stand-in emits a deterministic
    payload whose length scales with the target area (the schema,
    batching, and partition-parallelism are the real contract).  Output
    rows are 1:1 with inputs — Catalyst can pipeline this between scans
    and downstream operators without a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            resized = []
            for payload in pdf["payload"]:
                # deterministic downsample: stride the bytes to ~area size
                stride = max(1, len(payload) // target)
                resized.append(bytes(payload[::stride][:target]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "resized_payload": pd.Series(resized, dtype="object"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        run, RESIZE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def _frames_frame(doc_ids, payloads) -> pd.DataFrame:
    ids, idxs, frames = [], [], []
    for doc_id, payload in zip(doc_ids, payloads):
        n = pseudo_decode(payload)["n_frames"]
        for i in range(n):
            ids.append(int(doc_id))
            idxs.append(i)
            # deterministic per-frame slice of the payload
            frames.append(bytes(payload[i::n]))
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "frame_idx": pd.Series(idxs, dtype="int32"),
            "frame_payload": pd.Series(frames, dtype="object"),
        }
    )


def sample_frames(docs_with_payload: DataFrame) -> DataFrame:
    """1->N frame sampling: each payload fans out into n_frames rows
    (pseudo-decoded), the video-pipeline shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _frames_frame(pdf["doc_id"], pdf["payload"])

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        run, FRAME_SCHEMA
    )


def sample_frames_ptr(pointers: DataFrame) -> DataFrame:
    """1->N frame sampling over pointers: payload bytes are fetched
    inside the kernel (same output as :func:`sample_frames`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _frames_frame(pdf["doc_id"], fetch_payloads(pdf))

    return pointers.select("doc_id", "uri", "offset", "length").mapInPandas(
        run, FRAME_SCHEMA
    )
