"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-
sample run as Arrow-batched ``mapInPandas`` stages. Two codecs are
real here:

- **PNG** (non-interlaced, 8-bit gray/gray+alpha/RGB/RGBA): a
  stdlib-``zlib`` decoder/encoder below (``decode_png`` /
  ``encode_png``) — genuine pixel payloads work end-to-end through
  the filters/features/resize stages, no PIL required;
- a deterministic **fake codec** for synthetic corpora:
  ``b"FAKEIMG" + width:uint16 + height:uint16 + fmt:1byte + pixels``
  with ``width*height`` seeded bytes.

JPEG/webp/ffmpeg formats are NOT decodable in this container
(``strict=True`` raises ``NotImplementedError`` for them — the marked
extension point for PIL/libvips); everything Spark-side — schemas,
partitioning, UDF signatures, batch shapes — is identical whichever
codec produced the bytes.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

ASSET_SCHEMA = (
    "asset_id long, conv_id string, kind string, payload binary, "
    "meta struct<width:int,height:int,format:string,n_bytes:int>"
)

FEATURE_SCHEMA = (
    "asset_id long, conv_id string, kind string, width int, height int, "
    "features array<float>"
)

_MAGIC = b"FAKEIMG"
_FMTS = ["png", "jpeg", "webp"]


def encode_fake_image(seed: int, width: int, height: int, fmt: str) -> bytes:
    """Deterministic fake payload (stands in for real encoded bytes)."""
    import numpy as np

    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    pixels = rng.randint(0, 256, size=width * height, dtype=np.int64)
    return (_MAGIC + struct.pack("<HHB", width, height, _FMTS.index(fmt))
            + pixels.astype("uint8").tobytes())


def decode_fake_image(payload: bytes, strict: bool = False):
    """→ (width, height, fmt, pixel ndarray). The real-codec hook."""
    import numpy as np

    if not payload or not payload.startswith(_MAGIC):
        if strict:
            raise NotImplementedError(
                "real image decoding requires PIL/libvips — not available "
                "in this container; payload is not fake-codec")
        return None
    w, h, f = struct.unpack_from("<HHB", payload, len(_MAGIC))
    off = len(_MAGIC) + 5
    pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=off)
    return w, h, _FMTS[f], pixels


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per pixel by PNG color type: gray, RGB, gray+alpha, RGBA
_PNG_NCH = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes):
    """Minimal stdlib PNG decoder — deflate + per-row filters, no PIL.

    Handles non-interlaced 8-bit gray / gray+alpha / RGB / RGBA (the
    overwhelming majority of document-page renders). Color is reduced
    to luma ``(299 R + 587 G + 114 B) // 1000``; alpha is ignored —
    the pixel consumers here (ink/blank stats, histograms, resize)
    are luminance-based. Returns ``(w, h, gray_uint8_flat)`` or raises
    ``ValueError``/``NotImplementedError`` on malformed/unsupported
    input.

    Throughput note: Up is fully vectorized and Sub is a uint8-wrap
    ``cumsum``; Average/Paeth carry a per-pixel LEFT dependency the
    PNG spec makes inherently sequential, so those rows run as
    plain-int Python loops (list-based — still ~5-10x the old numpy
    scalar-indexing form). Measured ceiling (512x512 gray, one core,
    round 5): None 360 MB/s, Up 257, Sub 86, **Average 6.7, Paeth
    3.1** — i.e. a 32-core executor tops out near ~100-215 MB/s on
    worst-case-filtered corpora, and no numpy formulation exists for
    the left-recurrence (mod-256 add through a branchy predictor is
    neither a prefix sum nor linearizable). Fine for fixture/validator
    traffic; a real 100 TB image corpus must decode with a native
    codec (PIL/OpenCV) slotted behind this same mapInPandas seam —
    that swap changes ONLY this function, none of the Spark plumbing.
    """
    import zlib

    import numpy as np

    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    w = h = color = None
    idat: list = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # 4 len + 4 type + data + 4 crc
        if ctype == b"IHDR":
            w, h, bitd, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if bitd != 8 or interlace != 0 or color not in _PNG_NCH:
                raise NotImplementedError(
                    "only 8-bit non-interlaced gray/RGB/RGBA PNG "
                    f"(bit_depth={bitd} color={color} interlace={interlace})")
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    nch = _PNG_NCH[color]
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG scanline data truncated")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        row = np.frombuffer(raw, np.uint8, stride, p + 1).copy()
        p += 1 + stride
        if f == 1:    # Sub = per-channel mod-256 prefix sum (vector)
            g = row.reshape(w, nch)
            np.cumsum(g, axis=0, dtype=np.uint8, out=g)
        elif f == 2:  # Up (uint8 addition wraps mod 256 — the spec)
            row += prev
        elif f == 3:  # Average — left-dependency is inherently
            # sequential; plain-int list loop (numpy scalar indexing
            # is ~5-10x slower per element than list ints)
            r, pv = row.tolist(), prev.tolist()
            for x in range(stride):
                left = r[x - nch] if x >= nch else 0
                r[x] = (r[x] + ((left + pv[x]) >> 1)) & 0xFF
            row = np.asarray(r, dtype=np.uint8)
        elif f == 4:  # Paeth — same sequential left-dependency
            r, pv = row.tolist(), prev.tolist()
            for x in range(stride):
                a = r[x - nch] if x >= nch else 0
                b = pv[x]
                c = pv[x - nch] if x >= nch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r[x] = (r[x] + pred) & 0xFF
            row = np.asarray(r, dtype=np.uint8)
        elif f != 0:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = row
        prev = row
    px = out.reshape(h, w, nch)
    if nch in (1, 2):
        gray = px[:, :, 0]
    else:
        rgb = px[:, :, :3].astype(np.int32)
        gray = ((rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587
                 + rgb[:, :, 2] * 114) // 1000).astype(np.uint8)
    return w, h, np.ascontiguousarray(gray).reshape(-1)


def encode_png(pixels) -> bytes:
    """Grayscale uint8 H×W → a real (filter-0, color-type-0) PNG via
    stdlib zlib — the round-trip twin of :func:`decode_png` and the
    fixture hook for genuine-payload tests."""
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def decode_image(payload: bytes, strict: bool = False):
    """Codec dispatch → ``(width, height, fmt, flat_uint8_pixels)``.

    Fake-codec and real PNG payloads decode; other formats return
    ``None`` (or raise with ``strict=True`` — the PIL extension
    point). Every pixel consumer below goes through this, so real PNG
    bytes flow through filters/features/resize unchanged."""
    if payload and payload.startswith(_MAGIC):
        return decode_fake_image(payload)
    if payload and payload.startswith(_PNG_MAGIC):
        try:
            w, h, gray = decode_png(payload)
            return w, h, "png", gray
        except NotImplementedError:
            if strict:
                raise
            return None
        except Exception:
            return None  # malformed payload → filtered, never a task kill
    if strict:
        raise NotImplementedError(
            "real decoding of non-PNG formats requires PIL/libvips — "
            "not available in this container")
    return None


def encode_pixels(pixels, fmt: str = "png") -> bytes:
    """Wrap an explicit uint8 HxW pixel buffer in the fake-codec
    container — the fixture hook for content-dependent tests (blank
    pages, drawn rectangles), mirroring what a real encoder would
    produce."""
    h, w = pixels.shape
    return (_MAGIC + struct.pack("<HHB", w, h, _FMTS.index(fmt))
            + pixels.astype("uint8").reshape(-1).tobytes())


def synth_assets(spark, n_assets: int, seed: int = 42,
                 partitions: int | None = None) -> DataFrame:
    """Distributed deterministic asset table generation."""
    import pandas as pd

    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_assets, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import random

        for pdf in batches:
            cols = {k: [] for k in ["asset_id", "conv_id", "kind",
                                    "payload", "meta"]}
            for i in pdf["id"].tolist():
                rng = random.Random((seed << 22) ^ i)
                w = rng.choice([32, 64, 128])
                h = rng.choice([32, 64])
                fmt = rng.choice(_FMTS)
                payload = encode_fake_image(i, w, h, fmt)
                cols["asset_id"].append(i)
                cols["conv_id"].append(f"conv{i % max(n_assets // 4, 1):08d}")
                cols["kind"].append("image")
                cols["payload"].append(payload)
                cols["meta"].append({"width": w, "height": h, "format": fmt,
                                     "n_bytes": len(payload)})
            yield pd.DataFrame(cols)

    return base.mapInPandas(gen, schema=ASSET_SCHEMA)


def extract_features(assets: DataFrame, n_bins: int = 8) -> DataFrame:
    """Decode + feature-extract (pixel-histogram) per asset — the
    shape of a real embedding/feature stage: binary in, float array
    out, one Arrow boundary, map-only."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            cols = {k: [] for k in ["asset_id", "conv_id", "kind",
                                    "width", "height", "features"]}
            for aid, cid, kind, payload in zip(
                pdf["asset_id"], pdf["conv_id"], pdf["kind"], pdf["payload"]
            ):
                dec = decode_image(bytes(payload))
                if dec is None:
                    continue
                w, h, _, px = dec
                hist, _ = np.histogram(px, bins=n_bins, range=(0, 256))
                feats = (hist / max(px.size, 1)).astype("float32")
                cols["asset_id"].append(int(aid))
                cols["conv_id"].append(cid)
                cols["kind"].append(kind)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["features"].append(feats.tolist())
            yield pd.DataFrame(cols)

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def content_stats(assets: DataFrame, dark_threshold: int = 128) -> DataFrame:
    """Per-asset pixel-content statistics: std of the pixel buffer and
    the fraction of "ink" (dark) pixels. The decode step is the fake
    codec; a real deployment swaps PIL in at ``decode_fake_image``."""

    schema = ("asset_id long, conv_id string, kind string, width int, "
              "height int, px_std double, ink_fraction double")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            cols = {k: [] for k in ["asset_id", "conv_id", "kind", "width",
                                    "height", "px_std", "ink_fraction"]}
            for aid, cid, kind, payload in zip(
                pdf["asset_id"], pdf["conv_id"], pdf["kind"], pdf["payload"]
            ):
                dec = decode_image(bytes(payload))
                if dec is None:
                    continue
                w, h, _, px = dec
                cols["asset_id"].append(int(aid))
                cols["conv_id"].append(cid)
                cols["kind"].append(kind)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["px_std"].append(float(np.std(px)))
                cols["ink_fraction"].append(
                    float((px < dark_threshold).mean()))
            yield pd.DataFrame(cols)

    return assets.mapInPandas(run, schema=schema)


def filter_blank_lowink(assets: DataFrame, min_std: float = 1.0,
                        min_ink: float = 0.02) -> DataFrame:
    """§2.11 pixel-content media filter (reference spec
    ``tests/test_media_filters.py:33-48,116-123`` — the module it tests
    does not exist in the reference tree; these are its specified
    behaviors): drop assets whose decoded pixels are blank (near-zero
    variance, e.g. an empty page render) or low-ink (dark fraction
    below ``min_ink`` — a 30×30 blob on a 400×400 page is noise, not a
    figure). Pass-through map, payload kept for downstream sinks."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            keep = []
            for i, payload in enumerate(pdf["payload"]):
                dec = decode_image(bytes(payload))
                if dec is None:
                    keep.append(False)
                    continue
                _, _, _, px = dec
                blank = float(np.std(px)) < min_std
                low_ink = float((px < 128).mean()) < min_ink
                keep.append(not blank and not low_ink)
            yield pdf[np.array(keep, dtype=bool)] if len(pdf) else pdf

    return assets.mapInPandas(run, schema=assets.schema)


class TableRegionValidator:
    """Region-content validator (reference spec
    ``tests/test_media_filters.py:52-105``): a detector-proposed table
    region is valid when the cropped region is non-degenerate and shows
    ink structure — here ink fraction within ``[min_ink, max_ink]`` and
    both sides ≥ ``min_side`` px; a real implementation would run line
    detection on the PDF render. ``close()`` mirrors the reference's
    resource-holding validator interface."""

    def __init__(self, min_side: int = 8, min_ink: float = 0.005,
                 max_ink: float = 0.98):
        self.min_side = min_side
        self.min_ink = min_ink
        self.max_ink = max_ink

    def is_valid(self, payload: bytes, bbox) -> bool:
        dec = decode_image(bytes(payload))
        if dec is None:
            return False
        w, h, _, px = dec
        x0, y0, x1, y1 = (int(bbox[k]) for k in ("x0", "y0", "x1", "y1")) \
            if isinstance(bbox, dict) else (int(v) for v in bbox)
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, w), min(y1, h)
        if x1 - x0 < self.min_side or y1 - y0 < self.min_side:
            return False
        region = px.reshape(h, w)[y0:y1, x0:x1]
        ink = float((region < 128).mean())
        return self.min_ink <= ink <= self.max_ink

    def close(self) -> None:  # interface parity with the reference spec
        pass


def validate_table_regions(assets: DataFrame,
                           detector_source: str = "detector-table",
                           **validator_kw) -> DataFrame:
    """Drop detector-proposed table assets whose bbox region fails
    :class:`TableRegionValidator`; rows from other sources (or without
    a bbox) pass through — the reference spec validates only
    detector-table entries. Expects a ``bbox`` struct column
    ``(x0,y0,x1,y1)`` in pixel coordinates."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        v = TableRegionValidator(**validator_kw)
        try:
            for pdf in batches:
                keep = []
                for src, payload, bbox in zip(
                    pdf["source"], pdf["payload"], pdf["bbox"]
                ):
                    if src != detector_source or bbox is None:
                        keep.append(True)
                        continue
                    keep.append(v.is_valid(bytes(payload), bbox))
                yield pdf[np.array(keep, dtype=bool)] if len(pdf) else pdf
        finally:
            v.close()

    return assets.mapInPandas(run, schema=assets.schema)


def resize_assets(assets: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize stage: fake codec does nearest-neighbor downsample on its
    pixel buffer; a real implementation swaps in PIL here."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            cols = {k: [] for k in ["asset_id", "conv_id", "kind",
                                    "payload", "meta"]}
            for aid, cid, kind, payload, meta in zip(
                pdf["asset_id"], pdf["conv_id"], pdf["kind"],
                pdf["payload"], pdf["meta"]
            ):
                dec = decode_image(bytes(payload))
                if dec is None:
                    continue
                w, h, fmt, px = dec
                scale = max(max(w, h) / max_side, 1.0)
                nw, nh = max(int(w / scale), 1), max(int(h / scale), 1)
                grid = px.reshape(h, w)[
                    np.linspace(0, h - 1, nh).astype(int)][:,
                    np.linspace(0, w - 1, nw).astype(int)]
                if bytes(payload).startswith(_PNG_MAGIC):
                    # real PNG in → real PNG out (stdlib encoder)
                    out = encode_png(grid.astype("uint8"))
                else:
                    out = (_MAGIC
                           + struct.pack("<HHB", nw, nh, _FMTS.index(fmt))
                           + grid.astype("uint8").tobytes())
                cols["asset_id"].append(int(aid))
                cols["conv_id"].append(cid)
                cols["kind"].append(kind)
                cols["payload"].append(out)
                cols["meta"].append({"width": nw, "height": nh,
                                     "format": fmt, "n_bytes": len(out)})
            yield pd.DataFrame(cols)

    return assets.mapInPandas(run, schema=ASSET_SCHEMA)


# ---------------------------------------------------------------------------
# video: fake frame container + uniform temporal frame sampling
# ---------------------------------------------------------------------------
# container: b"FAKEVID" + width:u16 + height:u16 + n_frames:u16 + fps:u8
# + n_frames × (width*height) seeded gray frames. Deterministic stand-in
# for an ffmpeg-decodable payload; the Spark plumbing (schema, batch
# shape, one-row-in → n-rows-out fan-out) is real either way, and the
# sampled frames come OUT as genuine PNG bytes (stdlib encoder above).

_VMAGIC = b"FAKEVID"

VIDEO_SCHEMA = (
    "asset_id long, conv_id string, kind string, payload binary, "
    "meta struct<width:int,height:int,n_frames:int,fps:int,n_bytes:int>"
)

FRAME_SCHEMA = (
    "asset_id long, conv_id string, frame_idx int, payload binary, "
    "meta struct<width:int,height:int,format:string,n_bytes:int>"
)

FRAME_STATS_SCHEMA = (
    "asset_id long, frame_idx int, width int, height int, "
    "px_mean double, px_std double"
)


def encode_fake_video(seed: int, width: int, height: int,
                      n_frames: int, fps: int = 24) -> bytes:
    import numpy as np

    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    frames = rng.randint(0, 256, size=n_frames * width * height,
                         dtype=np.int64)
    return (_VMAGIC + struct.pack("<HHHB", width, height, n_frames, fps)
            + frames.astype("uint8").tobytes())


def decode_fake_video(payload: bytes, strict: bool = False):
    """→ (width, height, n_frames, fps, frames[n,h,w]) or None."""
    import numpy as np

    if not payload or not payload.startswith(_VMAGIC):
        if strict:
            raise NotImplementedError(
                "real video decoding requires ffmpeg — not available in "
                "this container; payload is not fake-codec")
        return None
    w, h, nf, fps = struct.unpack_from("<HHHB", payload, len(_VMAGIC))
    off = len(_VMAGIC) + 7
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * nf,
                       offset=off)
    return w, h, nf, fps, px.reshape(nf, h, w)


def synth_videos(spark, n_assets: int, seed: int = 42,
                 partitions: int | None = None) -> DataFrame:
    """Distributed deterministic video-asset table generation."""
    import pandas as pd

    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_assets, 1, parts)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import random

        for pdf in batches:
            cols = {k: [] for k in ["asset_id", "conv_id", "kind",
                                    "payload", "meta"]}
            for i in pdf["id"].tolist():
                rng = random.Random((seed << 23) ^ i)
                w = rng.choice([16, 32])
                h = rng.choice([16, 24])
                nf = rng.choice([6, 12, 25])
                fps = rng.choice([24, 30])
                payload = encode_fake_video(i, w, h, nf, fps)
                cols["asset_id"].append(i)
                cols["conv_id"].append(f"conv{i % max(n_assets // 4, 1):08d}")
                cols["kind"].append("video")
                cols["payload"].append(payload)
                cols["meta"].append({"width": w, "height": h,
                                     "n_frames": nf, "fps": fps,
                                     "n_bytes": len(payload)})
            yield pd.DataFrame(cols)

    return base.mapInPandas(gen, schema=VIDEO_SCHEMA)


def frame_sample(videos: DataFrame, n_samples: int = 4) -> DataFrame:
    """Uniform temporal frame sampling: ``n_samples`` frame indices
    linspaced over [0, n_frames-1] (deduped — a 2-frame clip sampled
    at 4 yields 2 rows), each emitted as a REAL PNG payload row.

    One video row fans out to ≤ n_samples frame rows inside the same
    Arrow batch — no shuffle, no driver; undecodable payloads are
    skipped (the error-row model belongs to the extraction surface).
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            cols = {k: [] for k in ["asset_id", "conv_id", "frame_idx",
                                    "payload", "meta"]}
            for aid, cid, payload in zip(pdf["asset_id"], pdf["conv_id"],
                                         pdf["payload"]):
                dec = decode_fake_video(bytes(payload))
                if dec is None:
                    continue
                w, h, nf, _fps, frames = dec
                idxs = np.unique(
                    np.linspace(0, nf - 1, min(n_samples, nf)).astype(int))
                for fi in idxs:
                    png = encode_png(frames[int(fi)])
                    cols["asset_id"].append(int(aid))
                    cols["conv_id"].append(cid)
                    cols["frame_idx"].append(int(fi))
                    cols["payload"].append(png)
                    cols["meta"].append({"width": w, "height": h,
                                         "format": "png",
                                         "n_bytes": len(png)})
            yield pd.DataFrame(cols)

    return videos.mapInPandas(run, schema=FRAME_SCHEMA)


def frame_stats(frames: DataFrame) -> DataFrame:
    """Per-sampled-frame pixel stats over the (real PNG) payloads.
    Mean/std from integer pixel sums — bit-deterministic across runs."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            cols = {k: [] for k in ["asset_id", "frame_idx", "width",
                                    "height", "px_mean", "px_std"]}
            for aid, fi, payload in zip(pdf["asset_id"], pdf["frame_idx"],
                                        pdf["payload"]):
                dec = decode_image(bytes(payload))
                if dec is None:
                    continue
                w, h, _fmt, px = dec
                n = px.size
                s1 = int(np.sum(px, dtype=np.int64))
                s2 = int(np.sum(px.astype(np.int64) ** 2))
                mean = s1 / n
                var = max(s2 / n - mean * mean, 0.0)
                cols["asset_id"].append(int(aid))
                cols["frame_idx"].append(int(fi))
                cols["width"].append(w)
                cols["height"].append(h)
                cols["px_mean"].append(round(mean, 6))
                cols["px_std"].append(round(var ** 0.5, 4))
            yield pd.DataFrame(cols)

    return frames.mapInPandas(run, schema=FRAME_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# audio: fake PCM container + feature extraction
# ---------------------------------------------------------------------------
# container: b"FAKEPCM" + sample_rate:u32 + n_samples:u32 + int16 LE
# samples (seeded sine + noise). Features use integer/sign arithmetic
# wherever the value feeds a fixture oracle, for bit determinism.

_AMAGIC = b"FAKEPCM"

AUDIO_SCHEMA = (
    "asset_id long, conv_id string, kind string, payload binary, "
    "meta struct<sample_rate:int,n_samples:int,n_bytes:int>"
)

AUDIO_FEATURES_SCHEMA = (
    "asset_id long, sample_rate int, n_samples int, duration_s double, "
    "rms double, zcr double, peak int"
)


def encode_fake_audio(seed: int, sample_rate: int, n_samples: int) -> bytes:
    import numpy as np

    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    t = np.arange(n_samples, dtype=np.float64)
    freq = 100.0 + (seed % 800)
    wave = (0.5 * np.sin(2.0 * np.pi * freq * t / sample_rate)
            + 0.1 * rng.standard_normal(n_samples))
    samples = np.clip(wave, -1.0, 1.0) * 32767.0
    return (_AMAGIC + struct.pack("<II", sample_rate, n_samples)
            + samples.astype("<i2").tobytes())


def decode_fake_audio(payload: bytes, strict: bool = False):
    """→ (sample_rate, int16 samples) or None."""
    import numpy as np

    if not payload or not payload.startswith(_AMAGIC):
        if strict:
            raise NotImplementedError(
                "real audio decoding requires soundfile/ffmpeg — not "
                "available in this container; payload is not fake-codec")
        return None
    sr, n = struct.unpack_from("<II", payload, len(_AMAGIC))
    samples = np.frombuffer(payload, dtype="<i2", count=n,
                            offset=len(_AMAGIC) + 8)
    return sr, samples


def synth_audio(spark, n_assets: int, seed: int = 42,
                partitions: int | None = None) -> DataFrame:
    """Distributed deterministic audio-asset table generation."""
    import pandas as pd

    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_assets, 1, parts)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import random

        for pdf in batches:
            cols = {k: [] for k in ["asset_id", "conv_id", "kind",
                                    "payload", "meta"]}
            for i in pdf["id"].tolist():
                rng = random.Random((seed << 24) ^ i)
                sr = rng.choice([8000, 16000])
                n = rng.choice([2000, 4000, 6400])
                payload = encode_fake_audio(i, sr, n)
                cols["asset_id"].append(i)
                cols["conv_id"].append(f"conv{i % max(n_assets // 4, 1):08d}")
                cols["kind"].append("audio")
                cols["payload"].append(payload)
                cols["meta"].append({"sample_rate": sr, "n_samples": n,
                                     "n_bytes": len(payload)})
            yield pd.DataFrame(cols)

    return base.mapInPandas(gen, schema=AUDIO_SCHEMA)


def audio_features(assets: DataFrame) -> DataFrame:
    """Per-clip features: duration, RMS (int64 sum of squares → one
    float division — bit-deterministic), zero-crossing rate (sign
    changes / (n-1)), peak amplitude."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            cols = {k: [] for k in ["asset_id", "sample_rate", "n_samples",
                                    "duration_s", "rms", "zcr", "peak"]}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                dec = decode_fake_audio(bytes(payload))
                if dec is None:
                    continue
                sr, s = dec
                n = s.size
                s64 = s.astype(np.int64)
                rms = (int(np.sum(s64 * s64)) / n) ** 0.5 / 32768.0
                zc = int(np.count_nonzero(np.diff(np.signbit(s64))))
                cols["asset_id"].append(int(aid))
                cols["sample_rate"].append(int(sr))
                cols["n_samples"].append(n)
                cols["duration_s"].append(round(n / sr, 6))
                cols["rms"].append(round(rms, 6))
                cols["zcr"].append(round(zc / (n - 1), 6) if n > 1 else 0.0)
                cols["peak"].append(int(np.max(np.abs(s64))))
            yield pd.DataFrame(cols)

    return assets.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def perturb_assets(assets: DataFrame, every: int = 5,
                   id_offset: int = 100_000,
                   n_flips: int = 3) -> DataFrame:
    """Deterministic near-copies of every ``every``-th asset — the
    planted ground truth for image near-dup evaluation: decode, bump
    ``n_flips`` seeded pixels by +8 intensity, re-encode, shift the
    id by ``id_offset``.  Per-copy content depends ONLY on the source
    asset_id (the x30/x31 prefix-stability invariant), so a frozen
    cap-sized fixture serves every scale factor.  Map-only.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import random

        import numpy as np

        for pdf in batches:
            cols = {k: [] for k in ["asset_id", "conv_id", "kind",
                                    "payload", "meta"]}
            for aid, cid, kind, payload, meta in zip(
                pdf["asset_id"], pdf["conv_id"], pdf["kind"],
                pdf["payload"], pdf["meta"],
            ):
                if int(aid) % every != 0:
                    continue
                dec = decode_image(bytes(payload))
                if dec is None:
                    continue
                w, h, fmt, px = dec
                a = np.array(px, dtype=np.int64).reshape(h, w)
                rng = random.Random(0x5EED ^ int(aid))
                for _ in range(n_flips):
                    r, c = rng.randrange(h), rng.randrange(w)
                    a[r, c] = min(255, int(a[r, c]) + 8)
                cols["asset_id"].append(int(aid) + id_offset)
                cols["conv_id"].append(cid)
                cols["kind"].append(kind)
                cols["payload"].append(
                    encode_pixels(a.astype(np.uint8),
                                  fmt if fmt in _FMTS else "png"))
                cols["meta"].append(dict(meta))
            if cols["asset_id"]:  # an empty frame's meta column would
                yield pd.DataFrame(cols)  # infer float64, not struct

    return assets.mapInPandas(run, schema=ASSET_SCHEMA)


DHASH_SCHEMA = "asset_id bigint, width int, height int, dhash bigint"


def image_dhash(assets: DataFrame, grid: int = 8) -> DataFrame:
    """64-bit difference hash (dHash) per image — the standard
    perceptual near-dup signature for image corpora (identical
    re-encodes, minor edits and small noise land within a few bits;
    unrelated images differ in ~32).  Grid ``8`` → 8 rows × 9 block
    columns, bit (r, c) = [block(r, c) brighter than block(r, c+1)].

    Determinism: blocks are integer pixel SUMS over floor-divided
    grid edges, and the brightness comparison cross-multiplies by
    block areas (``s₁·n₂ > s₂·n₁``) — all-integer, no float means.
    The signed-int64 wrap of the 64-bit hash matches the JVM/DuckDB
    convention of the SimHash pipeline, so :func:`dedup.hamming_pairs`
    and x32's band SQL consume it unchanged.

    Map-only (one Arrow boundary); the pair stage downstream is the
    banded equi-join, never all-pairs.  Images narrower than grid+1
    or shorter than grid are skipped (no stable hash exists).
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            cols = {k: [] for k in ["asset_id", "width", "height",
                                    "dhash"]}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                dec = decode_image(bytes(payload))
                if dec is None:
                    continue
                w, h, _, px = dec
                if w < grid + 1 or h < grid:
                    continue
                a = np.array(px, dtype=np.int64).reshape(h, w)
                re = [r * h // grid for r in range(grid + 1)]
                ce = [c * w // (grid + 1) for c in range(grid + 2)]
                hv = 0
                for r in range(grid):
                    rows = a[re[r]:re[r + 1]]
                    for c in range(grid):
                        s1 = int(rows[:, ce[c]:ce[c + 1]].sum())
                        s2 = int(rows[:, ce[c + 1]:ce[c + 2]].sum())
                        n1 = (re[r + 1] - re[r]) * (ce[c + 1] - ce[c])
                        n2 = (re[r + 1] - re[r]) * (ce[c + 2] - ce[c + 1])
                        if s1 * n2 > s2 * n1:
                            hv |= 1 << (r * grid + c)
                if hv >= 1 << 63:  # signed-int64 wrap (JVM convention)
                    hv -= 1 << 64
                cols["asset_id"].append(int(aid))
                cols["width"].append(int(w))
                cols["height"].append(int(h))
                cols["dhash"].append(hv)
            yield pd.DataFrame(cols)

    return assets.mapInPandas(run, schema=DHASH_SCHEMA)
