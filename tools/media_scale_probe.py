"""Multimodal scale probe on the REAL-codec pointer path.

The r6 multimodal probes predate the stdlib PNG/JPEG codecs: decode was
digest arithmetic, so "the pointer path parallelizes map-side" was a
plumbing claim, not a CPU claim.  Since r10 decode is genuinely
CPU-bearing (zlib inflate + per-row unfilters for PNG, canonical
Huffman + IDCT for baseline JPEG), so this tool re-measures the claim
that matters at 100 TB: with real per-image decode work, does
wall-clock grow linearly with payload volume while the plan stays
pointer-only (no binary column, no wide scan, no shuffle)?

Corpus: a base set of deterministic 48x48 RGB images (half PNG, half
baseline JPEG q85 — gradients with planted rectangles, i.e. realistic
AC-coefficient density rather than worst-case noise), encoded ONCE with
the repo's own encoders, then replicated xN with distinct doc_ids into
per-partition shard files (pack once, range-fetch per consumer — the
WebDataset layout).  Replication preserves per-row decode cost exactly,
so total work scales exactly with the multiplier and a super-linear
defect cannot hide.

Probes (both consume ONLY the (uri, offset, length) pointer table):
- meta_real:   extract_media_meta_ptr — fetch + full decode per row
- resize_real: resize_media_ptr 24x24 — fetch + decode + resample +
               re-encode in the source container per row

Usage (run alone — co-tenant Spark sessions contaminate timings):
    python tools/media_scale_probe.py --build             # ~1 min
    python tools/media_scale_probe.py --run               # JSON + md table
    python tools/media_scale_probe.py --run --mults 1,10
    python tools/media_scale_probe.py --build --run --media audio

``--media audio`` swaps the corpus for 1k ~0.25s clips cycling WAV
PCM16 / WAV G.711 mu-law / AU 24-bit PCM / AIFF and probes
``extract_media_meta_ptr`` only (resize is image-only) — the audio
decoders dispatch through the same pointer kernels, and this measures
that the claim holds with their (numpy-vectorized, cheaper) CPU
profile too.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import time
from typing import Iterator

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

PROBE_ROOT = "/tmp/media_scale_probe"
BASE_N = 1000  # images in the base set (x100 -> 100k rows)
MULTS = (1, 10, 100)
SIDE = 48  # base image side in px


def _base_images() -> list[bytes]:
    """BASE_N deterministic images cycling PNG / baseline JPEG / GIF /
    TIFF-LZW — every real image codec in the repo pays its decode bill
    in the probe."""
    from foglamp_filter_python35_spark.functions import gif as G
    from foglamp_filter_python35_spark.functions import jpeg as J
    from foglamp_filter_python35_spark.functions import multimodal as M
    from foglamp_filter_python35_spark.functions import tiff as T

    rng = np.random.default_rng(20260815)
    payloads: list[bytes] = []
    for i in range(BASE_N):
        # smooth gradient + 3 planted rectangles: realistic AC density
        yy, xx = np.mgrid[0:SIDE, 0:SIDE]
        img = np.stack(
            [
                (yy * 255 // SIDE),
                (xx * 255 // SIDE),
                ((yy + xx) * 255 // (2 * SIDE)),
            ],
            axis=-1,
        ).astype(np.int32)
        for _ in range(3):
            y0, x0 = rng.integers(0, SIDE - 8, size=2)
            h, w = rng.integers(4, 16, size=2)
            img[y0 : y0 + h, x0 : x0 + w] += rng.integers(-60, 60, size=3)
        rgb = np.clip(img, 0, 255).astype(np.uint8)
        kind = i % 4
        if kind == 0:
            payloads.append(M.encode_png(rgb))
        elif kind == 1:
            payloads.append(J.encode_jpeg(rgb, quality=85))
        elif kind == 2:
            # GIF needs <= 256 colors: 2-bit-per-channel quantization
            # (4^3 = 64 possible colors)
            payloads.append(G.encode_gif((rgb >> 6) << 6))
        else:
            payloads.append(T.encode_tiff(rgb, compression="lzw"))
    return payloads


def _base_clips() -> list[bytes]:
    """BASE_N deterministic ~0.25s audio clips cycling WAV PCM16 /
    WAV G.711 mu-law / AU 24-bit PCM / AIFF PCM16 — every audio
    container+codec in the repo pays its decode bill in the probe.
    Containers are assembled here from the public specs (the package
    ships decoders only), mirroring tests/test_real_decoders.py."""
    import io
    import struct
    import wave

    from foglamp_filter_python35_spark.functions import multimodal as M

    def g711_ulaw(samples: np.ndarray) -> bytes:
        codes = np.arange(256, dtype=np.uint8)
        expanded = M._g711_ulaw_to_linear(bytes(codes)).astype(np.int64)
        order = np.argsort(expanded)
        idx = np.clip(np.searchsorted(expanded[order], samples), 0, 255)
        lo = expanded[order][np.maximum(idx - 1, 0)]
        hi = expanded[order][idx]
        pick = np.where(
            np.abs(samples - lo) <= np.abs(hi - samples),
            np.maximum(idx - 1, 0),
            idx,
        )
        return bytes(codes[order][pick].tolist())

    def float80(value: int) -> bytes:
        exp = value.bit_length() - 1
        return struct.pack(">HQ", 16383 + exp, value << (63 - exp))

    rng = np.random.default_rng(20260815)
    rate, n = 8000, 2000  # 0.25 s
    t = np.arange(n) / rate
    payloads: list[bytes] = []
    for i in range(BASE_N):
        f0, f1 = rng.uniform(100, 900, size=2)
        amp = rng.uniform(0.2, 0.8)
        sig = amp * (0.7 * np.sin(2 * np.pi * f0 * t)
                     + 0.3 * np.sin(2 * np.pi * f1 * t))
        pcm16 = (sig * 32000).astype(np.int64)
        kind = i % 4
        if kind == 0:  # WAV PCM16 via stdlib wave
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(pcm16.astype("<i2").tobytes())
            payloads.append(buf.getvalue())
        elif kind == 1:  # WAV G.711 mu-law (fmt tag 7)
            data = g711_ulaw(pcm16)
            fmt = struct.pack("<HHIIHH", 7, 1, rate, rate, 1, 8)
            body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data)
            payloads.append(
                b"RIFF" + struct.pack("<I", len(body)) + body
            )
        elif kind == 2:  # AU 24-bit big-endian linear PCM (enc 4)
            pcm24 = (sig * (1 << 22)).astype(np.int64)
            raw = b"".join(
                int(v & 0xFFFFFF).to_bytes(3, "big") for v in pcm24
            )
            payloads.append(
                b".snd" + struct.pack(">IIIII", 24, len(raw), 4, rate, 1)
                + raw
            )
        else:  # AIFF PCM16
            comm = struct.pack(">hLh", 1, n, 16) + float80(rate)
            ssnd = struct.pack(">II", 0, 0) + pcm16.astype(">i2").tobytes()
            body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
                    + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
            payloads.append(b"FORM" + struct.pack(">I", len(body)) + body)
    return payloads


def _build(spark, mults: list[int], media: str = "image") -> None:
    from pyspark.sql import functions as F

    from foglamp_filter_python35_spark.functions.multimodal import (
        POINTER_SCHEMA,
    )

    t0 = time.perf_counter()
    base = _base_images() if media == "image" else _base_clips()
    print(
        f"base set: {BASE_N} {media}s, "
        f"{sum(len(p) for p in base) / 1e6:.1f} MB encoded in "
        f"{time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )

    import pandas as pd  # noqa: PLC0415

    for mult in mults:
        out = os.path.join(PROBE_ROOT, media, f"x{mult}")
        shutil.rmtree(out, ignore_errors=True)
        shard_dir = os.path.join(out, "shards")
        n = BASE_N * mult

        def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # probe-local binary packer: same shard layout as
            # pack_payload_shards, payload looked up from the replicated
            # base set instead of a column
            from pyspark import TaskContext  # noqa: PLC0415

            # shard named by (partition, task attempt): a retry or
            # speculative duplicate writes its own file, so committed
            # pointer rows always reference the committing attempt's
            # bytes (mirrors pack_payload_shards)
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
                    for doc_id in pdf["id"]:
                        data = base[int(doc_id) % BASE_N]
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

        n_part = min(32, max(2, mult))
        (
            spark.range(n)
            .repartition(n_part, F.col("id"))
            .mapInPandas(pack, POINTER_SCHEMA)
            .write.mode("overwrite")
            .parquet(os.path.join(out, "pointers.parquet"))
        )
        print(f"built x{mult}: {n} rows, {n_part} shards", file=sys.stderr)


def _run(spark, mults: list[int], media: str = "image") -> dict:
    from foglamp_filter_python35_spark.functions import multimodal as M

    probes = {
        "meta_real": lambda ptr: M.extract_media_meta_ptr(ptr),
    }
    if media == "image":  # resize is an image-only operator
        probes["resize_real"] = lambda ptr: M.resize_media_ptr(ptr, 24, 24)
    results: dict[str, dict] = {name: {} for name in probes}
    plans_ok = True
    for mult in mults:
        ptr_path = os.path.join(
            PROBE_ROOT, media, f"x{mult}", "pointers.parquet"
        )
        if not os.path.isdir(ptr_path):
            print(f"missing {ptr_path} — run --build first", file=sys.stderr)
            sys.exit(2)
        ptr = spark.read.parquet(ptr_path)
        n = ptr.count()
        for name, fn in probes.items():
            df = fn(ptr)
            # the pointer-path invariant: no binary column anywhere in
            # the optimized plan upstream of the kernel (the kernel's
            # OUTPUT may be binary — resized payloads — but its INPUT
            # plan reads 4 pointer columns only)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
            # the kernel's OUTPUT may carry resized_payload#N; the
            # banned pattern is an INPUT column named exactly payload
            scan_ok = not re.search(r"(?<![\w])payload#", plan)
            plans_ok = plans_ok and scan_ok
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[name][f"x{mult}"] = {
                "rows": n,
                "wall_s": round(best, 2),
                "rows_per_sec": round(n / best),
            }
            print(
                f"{name} x{mult}: {n} rows in {best:.2f}s "
                f"({n / best:,.0f} rows/s, pointer-only plan: {scan_ok})",
                file=sys.stderr,
            )
    return {"probes": results, "pointer_only_plans": plans_ok}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--mults", default="1,10,100")
    ap.add_argument(
        "--media", choices=("image", "audio"), default="image",
        help="corpus type: image (PNG/JPEG/GIF/TIFF) or audio "
        "(WAV PCM16 / WAV G.711 / AU 24-bit / AIFF)",
    )
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    from foglamp_filter_python35_spark.session import get_spark

    spark = get_spark(app_name="media_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    if args.build:
        _build(spark, mults, args.media)
    if args.run:
        out = _run(spark, mults, args.media)
        print(json.dumps(out))
        # markdown table for SCALE.md
        for name, rows in out["probes"].items():
            print(f"\n| {name} | " + " | ".join(rows) + " |")
            print("|---" * (len(rows) + 1) + "|")
            print(
                "| wall_s | "
                + " | ".join(str(v["wall_s"]) for v in rows.values())
                + " |"
            )
            print(
                "| rows/s | "
                + " | ".join(f"{v['rows_per_sec']:,}" for v in rows.values())
                + " |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
