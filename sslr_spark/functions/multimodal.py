"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Two decode tiers:

- :func:`decode_media` is a REAL decoder for headered formats — BMP
  and PNG dimensions, JPEG dimensions (SOF marker walk), and WAV
  sample rate / duration all parse straight out of the file bytes
  with ``struct``, no codec library needed. This is the production
  shape end-to-end: magic-number sniffing, header-offset arithmetic,
  chunk/marker walking, all inside the Arrow batch loop.
- :func:`decode_metadata` keeps the clearly-marked deterministic STUB
  for the parts that genuinely need a codec (JPEG/MP4 PIXEL data;
  the container ships none) — everything Spark-side (binary
  representation, output schema, batch shape, embarrassingly-parallel
  partitioning) is real and tested; swap `_decode_stub` for
  PIL/ffmpeg and nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_fp", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: payload as an opaque binary column
    (here derived from text since the synthetic data has no media) plus
    typed metadata the pipeline carries alongside."""
    return df.select(
        "doc_id",
        F.col(text_col).cast("binary").alias("payload"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decode — deterministic fake dimensions derived from the
    content hash. A real deployment decodes with PIL/ffmpeg here;
    the container ships no codecs (NotImplementedError territory per
    the build contract), so we return a reproducible fake so the
    Spark-side plumbing stays testable end-to-end."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 30
    return width, height, n_frames


def decode_metadata(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas streams record batches through
    Python; per batch we emit metadata rows. No collect, no per-row
    UDF serde — the batch shape is what a real image decode needs."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [_decode_stub(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_fp": payloads.map(
                        lambda p: hashlib.md5(bytes(p)).hexdigest()
                    ),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return binary_df.mapInPandas(decode_batches, DECODE_SCHEMA)


def jpeg_pixel_codec():
    """Optional REAL JPEG pixel codec (pillow/libjpeg). Returns the
    PIL Image module when importable, else None — the container ships
    no codecs by default, and entropy-coded JPEG pixel data genuinely
    needs one (the documented codec boundary; headers parse without)."""
    try:
        from PIL import Image  # optional dependency, never required

        return Image
    except ImportError:
        return None


PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_luma", T.IntegerType(), False),
    ]
)


def decode_pixels_jpeg(binary_df: DataFrame, codec: str = "auto") -> DataFrame:
    """JPEG PIXEL decode behind the optional-codec boundary (VERDICT
    r7 item 7): ``codec='pil'`` decodes payload bytes with pillow
    (grayscale width/height/mean-luma); ``'stub'`` is the
    deterministic md5-derived fake (same style as ``_decode_stub``,
    SQL-reproducible so the Spark-side plumbing hash-checks in any
    environment); ``'auto'`` picks pillow when importable, stub
    otherwise — the zero-dependency default stays green and a real
    codec activates by just installing it.

    Arrow-batched ``mapInPandas`` either way: the batch shape,
    schema, and partitioning are identical across codecs, so the
    plumbing the oracle verifies under the stub is exactly what the
    real codec rides."""
    import pandas as pd

    if codec not in ("auto", "pil", "stub"):
        raise ValueError(f"codec must be auto|pil|stub, got {codec!r}")
    image_mod = jpeg_pixel_codec() if codec in ("auto", "pil") else None
    if codec == "pil" and image_mod is None:
        raise ImportError("codec='pil' requested but pillow is not installed")

    def stub_one(p: bytes) -> tuple[int, int, int]:
        h = hashlib.md5(p).digest()
        return 64 + h[0] % 192, 64 + h[1] % 192, int(h[2])

    def pil_one(p: bytes) -> tuple[int, int, int]:
        import io

        img = image_mod.open(io.BytesIO(p)).convert("L")
        px = list(img.getdata())
        return img.width, img.height, int(sum(px) / max(1, len(px)))

    one = pil_one if image_mod is not None else stub_one

    def decode_batches(batches):
        for pdf in batches:
            dims = [one(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "mean_luma": [d[2] for d in dims],
                }
            )

    return binary_df.mapInPandas(decode_batches, PIXELS_SCHEMA)


# ------------------------------------------------------------------
# real header decode (BMP / WAV) — no codec library required
# ------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def parse_bmp(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a BMP header: 'BM' magic, DIB header size
    at byte 14; BITMAPINFOHEADER (and later) carry int32-LE
    width/height at bytes 18/22 (negative height = top-down row
    order); the ancient BITMAPCOREHEADER carries uint16 at 18/20."""
    if len(b) < 22 or b[:2] != b"BM":
        return None
    hsz = struct.unpack_from("<I", b, 14)[0]
    if hsz >= 40 and len(b) >= 26:
        w, h = struct.unpack_from("<ii", b, 18)
        return w, abs(h)
    if hsz == 12 and len(b) >= 22:
        w, h = struct.unpack_from("<HH", b, 18)
        return w, h
    return None


def parse_wav(b: bytes) -> tuple[int, int] | None:
    """(sample_rate, duration_ms) from a RIFF/WAVE file by walking
    its chunk list: sample rate and byte rate come from the `fmt `
    chunk, duration = data-chunk size / byte rate (floor ms). Chunks
    are word-aligned (odd sizes pad one byte)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, rate, byte_rate, data_size = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        if cid == b"fmt " and pos + 20 <= len(b):
            rate = struct.unpack_from("<I", b, pos + 12)[0]
            byte_rate = struct.unpack_from("<I", b, pos + 16)[0]
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if not rate or not byte_rate or data_size is None:
        return None
    return rate, data_size * 1000 // byte_rate


def parse_png(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a PNG: 8-byte signature, then the IHDR
    chunk is REQUIRED to be first (PNG spec §5.6) — its 13-byte data
    carries width/height as big-endian uint32 at file bytes 16-23."""
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    if b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack_from(">II", b, 16)
    if w <= 0 or h <= 0 or w > 0x7FFFFFFF or h > 0x7FFFFFFF:
        return None
    return w, h


def parse_jpeg(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a JPEG by walking its marker segments:
    after SOI, each segment is FF <marker> <len:u16be> <payload>;
    dimensions live in the frame header (SOF0..SOF15, excluding the
    non-frame C4/C8/CC markers) as big-endian height/width at payload
    bytes 1-4. Standalone markers (RST0-7, TEM) and FF fill bytes are
    skipped; the walk stops at SOS/EOI (no frame header seen)."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None  # lost sync: not a marker where one must be
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / start-of-scan: no SOF seen
            return None
        seg_len = struct.unpack_from(">H", b, pos + 2)[0]
        if seg_len < 2:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(b):
                return None
            h, w = struct.unpack_from(">HH", b, pos + 5)
            if w == 0 or h == 0:
                return None
            return w, h
        pos += 2 + seg_len
    return None


def parse_mp4(b: bytes) -> tuple[int, int, int] | None:
    """(width, height, duration_ms) from an ISO-BMFF / MP4 container
    by walking its box tree — pure byte arithmetic, no codec: each
    box is ``size:u32be + type:4``; the movie header (moov/mvhd v0)
    carries timescale+duration at payload bytes 12/16, the track
    header (moov/trak/tkhd v0) carries width/height as 16.16 fixed
    point in its last 8 payload bytes. Returns the first video-sized
    track's dimensions (tkhd with nonzero width)."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            size = struct.unpack_from(">I", b, pos)[0]
            hdr = 8
            if size == 1:
                # ISO-BMFF 14496-12 §4.2 largesize: u64 follows the
                # type, 16-byte header (>4 GiB boxes, e.g. big mdat)
                if pos + 16 > hi:
                    return
                size = struct.unpack_from(">Q", b, pos + 8)[0]
                hdr = 16
            elif size == 0:
                # size==0: box extends to the end of the enclosing
                # scope (streamed mdat-before-moov layout)
                size = hi - pos
            if size < hdr or pos + size > hi:
                return
            yield b[pos + 4:pos + 8], pos + hdr, pos + size
            pos += size

    timescale = duration = None
    width = height = None
    for typ, lo, hi in walk(0, len(b)):
        if typ != b"moov":
            continue
        for t2, lo2, hi2 in walk(lo, hi):
            if t2 == b"mvhd" and lo2 + 20 <= hi2:
                ver = b[lo2]
                if ver == 0:
                    timescale, duration = struct.unpack_from(
                        ">II", b, lo2 + 12
                    )
                elif lo2 + 28 <= hi2:  # v1: 64-bit times
                    timescale = struct.unpack_from(">I", b, lo2 + 20)[0]
                    duration = struct.unpack_from(">Q", b, lo2 + 24)[0]
            elif t2 == b"trak":
                for t3, lo3, hi3 in walk(lo2, hi2):
                    if t3 == b"tkhd" and hi3 - lo3 >= 84 and width is None:
                        w_fx, h_fx = struct.unpack_from(">II", b, hi3 - 8)
                        if w_fx:
                            width, height = w_fx >> 16, h_fx >> 16
    if timescale and duration is not None and width:
        return width, height, duration * 1000 // timescale
    return None


def make_mp4(
    width: int, height: int, duration_ms: int, pad: int = 0
) -> bytes:
    """A minimal structurally-valid MP4: ftyp, a ``free`` box of
    ``pad`` filler bytes (the walk must skip it by declared size),
    moov{mvhd(timescale=1000, duration), trak{tkhd(width, height as
    16.16)}}, empty mdat. Total size = 136 + pad + the fixed box
    overhead — a pure formula, like every other synthesizer here."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"mp41")
    free = box(b"free", bytes(pad))
    mvhd = box(
        b"mvhd",
        bytes(4)                      # version 0 + flags
        + bytes(8)                    # ctime/mtime
        + struct.pack(">II", 1000, duration_ms)  # timescale, duration
        + struct.pack(">I", 0x00010000)          # rate 1.0
        + bytes(2 + 10 + 36 + 24)     # volume, reserved, matrix, predef
        + struct.pack(">I", 2),       # next track id
    )
    tkhd = box(
        b"tkhd",
        bytes(4)                      # version 0 + flags
        + bytes(8)                    # ctime/mtime
        + struct.pack(">I", 1)        # track id
        + bytes(4)                    # reserved
        + struct.pack(">I", duration_ms)
        + bytes(8 + 2 + 2 + 2 + 2 + 36)  # reserved/layer/alt/vol/matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + free + moov + box(b"mdat", b"")


def decode_media(binary_df: DataFrame) -> DataFrame:
    """REAL metadata decode for headered media formats, Arrow-batched:
    sniffs the magic number per payload and parses BMP/PNG/JPEG
    dimensions, MP4 dimensions+duration (container box walk), and
    WAV rate+duration straight from the bytes (:func:`parse_bmp`,
    :func:`parse_png`, :func:`parse_jpeg`, :func:`parse_mp4`,
    :func:`parse_wav`). Unknown formats pass through with fmt
    'unknown' and null media fields — triage them with
    :func:`binary_meta` before spending codec cost. Pure per-row
    map over (doc_id, payload): embarrassingly parallel, no shuffle,
    no driver involvement."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "fmt": [],
                "n_bytes": [],
                "width": [],
                "height": [],
                "sample_rate": [],
                "duration_ms": [],
            }
            for p in pdf["payload"]:
                b = bytes(p)
                out["n_bytes"].append(len(b))
                dims = fmt = None
                for name, parser in (
                    ("bmp", parse_bmp),
                    ("png", parse_png),
                    ("jpeg", parse_jpeg),
                ):
                    dims = parser(b)
                    if dims is not None:
                        fmt = name
                        break
                mp4 = parse_mp4(b) if dims is None else None
                wav = (
                    parse_wav(b) if dims is None and mp4 is None else None
                )
                if dims is not None:
                    out["fmt"].append(fmt)
                    out["width"].append(dims[0])
                    out["height"].append(dims[1])
                    out["sample_rate"].append(None)
                    out["duration_ms"].append(None)
                elif mp4 is not None:
                    out["fmt"].append("mp4")
                    out["width"].append(mp4[0])
                    out["height"].append(mp4[1])
                    out["sample_rate"].append(None)
                    out["duration_ms"].append(mp4[2])
                elif wav is not None:
                    out["fmt"].append("wav")
                    out["width"].append(None)
                    out["height"].append(None)
                    out["sample_rate"].append(wav[0])
                    out["duration_ms"].append(wav[1])
                else:
                    out["fmt"].append("unknown")
                    out["width"].append(None)
                    out["height"].append(None)
                    out["sample_rate"].append(None)
                    out["duration_ms"].append(None)
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "fmt": out["fmt"],
                    "n_bytes": pd.array(out["n_bytes"], dtype="Int64"),
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "sample_rate": pd.array(
                        out["sample_rate"], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        out["duration_ms"], dtype="Int32"
                    ),
                }
            )

    return binary_df.mapInPandas(decode, MEDIA_SCHEMA)


def resize_bmp(b: bytes, new_w: int, new_h: int) -> bytes:
    """REAL nearest-neighbor resize of a 24-bit BMP, byte-level and
    codec-free: parse the header, index the source pixel grid
    (stride-aligned rows), resample with ``src = dst * src_dim //
    dst_dim``, re-emit a complete BMP. Vectorized per image with
    numpy fancy indexing — the same kernel shape a real image
    pipeline runs, just without a compressed codec in front.

    Handles top-down sources (negative BITMAPINFOHEADER height): rows
    are flipped to bottom-up order before resampling so the emitted
    bottom-up BMP shows the same image. Raises ValueError for
    anything it cannot resize losslessly-in-structure (non-24bpp,
    BITMAPCOREHEADER, truncated pixel data) — callers that want
    pass-through semantics catch it (:func:`resize_media` does)."""
    import numpy as np

    if len(b) < 30 or b[:2] != b"BM":
        raise ValueError("not a BMP (or truncated header)")
    hsz = struct.unpack_from("<I", b, 14)[0]
    if hsz < 40:
        raise ValueError(f"unsupported DIB header size {hsz}")
    w, h_signed = struct.unpack_from("<ii", b, 18)
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate BMP dimensions {w}x{h_signed}")
    bpp = struct.unpack_from("<H", b, 28)[0]
    if bpp != 24:
        raise ValueError(f"only 24-bit BMPs supported, got {bpp}")
    off = struct.unpack_from("<I", b, 10)[0]
    stride = ((w * 3 + 3) // 4) * 4
    if off + stride * h > len(b):
        raise ValueError("truncated BMP pixel data")
    px = (
        np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
        .reshape(h, stride)[:, : w * 3]
        .reshape(h, w, 3)
    )
    if h_signed < 0:
        # top-down source: flip to the bottom-up row order the emitted
        # header declares, so the visual content is preserved
        px = px[::-1]
    ys = np.arange(new_h) * h // new_h
    xs = np.arange(new_w) * w // new_w
    sampled = px[np.ix_(ys, xs)]                      # (new_h, new_w, 3)
    nstride = ((new_w * 3 + 3) // 4) * 4
    rows = np.zeros((new_h, nstride), dtype=np.uint8)
    rows[:, : new_w * 3] = sampled.reshape(new_h, new_w * 3)
    data = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, new_w, new_h, 1, 24, 0, len(data),
        2835, 2835, 0, 0,
    )
    return header + dib + data


def resize_media(
    binary_df: DataFrame, num: int = 1, den: int = 2
) -> DataFrame:
    """Arrow-batched media resize: 24-bit BMP and 8-bit-RGB PNG
    payloads downscale by ``num/den`` (dimension >= 1 enforced)
    through the REAL byte-level resamplers (:func:`resize_bmp`,
    :func:`resize_png` — the PNG path genuinely inflates, unfilters,
    resamples, and re-emits); everything else — WAV, JPEG (entropy-
    coded pixels need a codec), unknown formats, and BMP/PNG variants
    the resamplers do not support — passes through UNTOUCHED rather
    than failing the job: one odd payload in a 100 TB column must not
    kill the stage. The sniff-and-dispatch shape a mixed-modality
    column needs. Pure per-row map, embarrassingly parallel."""

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                dims = parse_bmp(b)
                png_dims = parse_png(b) if dims is None else None
                try:
                    if dims is not None:
                        w, h = dims
                        b = resize_bmp(
                            b, max(1, w * num // den), max(1, h * num // den)
                        )
                    elif png_dims is not None:
                        w, h = png_dims
                        b = resize_png(
                            b, max(1, w * num // den), max(1, h * num // den)
                        )
                except (ValueError, struct.error):
                    pass  # unsupported/corrupt image: pass through
                out.append(b)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return binary_df.select("doc_id", "payload").mapInPandas(rs, out_schema)


def make_bmp(width: int, height: int) -> bytes:
    """A complete, viewer-openable 24-bit BMP of the given dimensions
    (zeroed pixels, 4-byte-aligned row stride)."""
    stride = ((width * 3 + 3) // 4) * 4
    data = bytes(stride * height)
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data),
        2835, 2835, 0, 0,
    )
    return header + dib + data


def _png_chunks(b: bytes):
    """Yield (type, data) for each chunk of a PNG byte string."""
    pos = 8
    while pos + 8 <= len(b):
        ln = struct.unpack_from(">I", b, pos)[0]
        typ = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        yield typ, data
        pos += 12 + ln
        if typ == b"IEND":
            break


def png_to_pixels(b: bytes):
    """REAL PNG pixel decode for 8-bit RGB (color type 2,
    non-interlaced) — pure stdlib + numpy, no codec library: walk the
    chunks, zlib-inflate the concatenated IDAT stream, and UNFILTER
    every scanline per the PNG spec (filters 0-4: None, Sub, Up,
    Average, Paeth). Returns an (h, w, 3) uint8 array. Raises
    ValueError for PNG variants outside that profile (palette,
    alpha, 16-bit, interlaced) — callers wanting pass-through
    semantics catch it (:func:`resize_media` does)."""
    import numpy as np
    import zlib

    dims = parse_png(b)
    if dims is None:
        raise ValueError("not a PNG")
    w, h = dims
    depth, color, _comp, _filt, interlace = struct.unpack_from(
        ">BBBBB", b, 24
    )
    if (depth, color, interlace) != (8, 2, 0):
        raise ValueError(
            f"only 8-bit RGB non-interlaced PNGs supported, got "
            f"depth={depth} color={color} interlace={interlace}"
        )
    idat = b"".join(d for t, d in _png_chunks(b) if t == b"IDAT")
    raw = zlib.decompress(idat)
    stride = w * 3
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        ft = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(
            stride, dtype=np.int32
        )
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        else:
            # Sub/Average/Paeth need the in-progress row — sequential
            # in x but vectorizable per pixel-group; scanlines are
            # short, rows are the parallel unit at corpus scale
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                bb = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 1:      # Sub
                    rec[x] = (line[x] + a) & 0xFF
                elif ft == 3:    # Average
                    rec[x] = (line[x] + (a + bb) // 2) & 0xFF
                elif ft == 4:    # Paeth
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        bb if pb <= pc else c
                    )
                    rec[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, 3)


def pixels_to_png(px) -> bytes:
    """(h, w, 3) uint8 array -> complete 8-bit RGB PNG (filter None
    per scanline, stored-deflate IDAT so the output size is the same
    68 + h*(1+3w) formula :func:`make_png` documents)."""
    import zlib

    h, w = px.shape[0], px.shape[1]
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    comp = zlib.compress(raw, 0)

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )


def resize_png(b: bytes, new_w: int, new_h: int) -> bytes:
    """REAL nearest-neighbor PNG resize, codec-free: inflate +
    unfilter (:func:`png_to_pixels`), resample with ``src = dst *
    src_dim // dst_dim`` (the same kernel as :func:`resize_bmp`),
    re-emit (:func:`pixels_to_png`)."""
    import numpy as np

    px = png_to_pixels(b)
    h, w = px.shape[0], px.shape[1]
    ys = np.arange(new_h) * h // new_h
    xs = np.arange(new_w) * w // new_w
    return pixels_to_png(px[np.ix_(ys, xs)])


def resample_wav(b: bytes, new_rate: int) -> bytes:
    """REAL nearest-sample resample of a 16-bit mono PCM WAV to
    ``new_rate`` — the audio twin of :func:`resize_bmp` /
    :func:`resize_png`, byte-level and codec-free: walk the RIFF
    chunks to the fmt/data payloads, index the int16 sample grid with
    ``src = dst * old_n // new_n`` (numpy fancy indexing), re-emit a
    complete WAV. Output length ``new_n = old_n * new_rate //
    old_rate`` keeps the clip duration (floor); a real pipeline swaps
    in a windowed-sinc kernel here with identical plumbing. Raises
    ValueError for non-PCM / non-16-bit / multi-channel payloads —
    pass-through callers catch it."""
    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt_chunk, data_off, data_size = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        if cid == b"fmt " and pos + 8 + 16 <= len(b):
            fmt_chunk = struct.unpack_from("<HHIIHH", b, pos + 8)
        elif cid == b"data":
            data_off, data_size = pos + 8, size
        pos += 8 + size + (size & 1)
    if fmt_chunk is None or data_off is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, old_rate, _brate, _align, bits = fmt_chunk
    if (audio_fmt, channels, bits) != (1, 1, 16):
        raise ValueError(
            f"only 16-bit mono PCM supported, got fmt={audio_fmt} "
            f"ch={channels} bits={bits}"
        )
    if data_off + data_size > len(b):
        raise ValueError("truncated WAV data")
    old_n = data_size // 2
    samples = np.frombuffer(b, dtype="<i2", count=old_n, offset=data_off)
    new_n = old_n * new_rate // old_rate
    idx = np.arange(new_n) * old_n // max(1, new_n) if new_n else (
        np.zeros(0, dtype=np.int64)
    )
    out = samples[idx].astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, new_rate, new_rate * 2, 2, 16
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(out)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(out)) + out
    )


def resample_audio(
    binary_df: DataFrame, target_rate: int = 8000
) -> DataFrame:
    """Arrow-batched audio resample: 16-bit mono PCM WAV payloads
    resample to ``target_rate`` through the REAL byte-level kernel;
    everything else (images, unknown, unsupported WAV profiles)
    passes through untouched — the same sniff-and-dispatch contract
    as :func:`resize_media`. Pure per-row map."""

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                if parse_wav(b) is not None:
                    try:
                        b = resample_wav(b, target_rate)
                    except (ValueError, struct.error):
                        pass  # unsupported/corrupt WAV: pass through
                out.append(b)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return binary_df.select("doc_id", "payload").mapInPandas(rs, out_schema)


def make_png(width: int, height: int) -> bytes:
    """A complete, viewer-openable 8-bit RGB PNG of the given
    dimensions: real IHDR/IDAT/IEND chunks with correct CRCs,
    deterministic pixel formula, and zlib level 0 (STORED deflate
    blocks) so the compressed size — hence the total file size — is a
    pure formula of the dimensions: raw = height*(1 + 3*width) scanline
    bytes, IDAT data = 11 + raw for raw <= 65535 (2-byte zlib header +
    one 5-byte stored-block header + raw + 4-byte adler32), total =
    68 + raw. That predictability is what lets the decode oracle pin
    every output field without parsing bytes."""
    import zlib

    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None
        for x in range(width):
            raw += bytes(
                ((x * 7 + y * 13) % 256, (x + y) % 256, (x * 3) % 256)
            )
    comp = zlib.compress(bytes(raw), 0)

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )


def make_jpeg(width: int, height: int, com_pad: int = 0) -> bytes:
    """A minimal JPEG whose marker stream exercises the SOF walk:
    SOI, a COM segment of ``com_pad`` filler bytes (the walk must
    skip it by its declared length), a baseline SOF0 frame header
    carrying the dimensions, EOI. Header-only — no entropy-coded
    data, which :func:`parse_jpeg` (like any header sniffer) never
    reads. Total size = 21 + com_pad bytes, a pure formula."""
    com = b"\xff\xfe" + struct.pack(">H", 2 + com_pad) + bytes(com_pad)
    sof = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, height, width, 1)
        + bytes((1, 0x11, 0))  # component 1, 1x1 sampling, q-table 0
    )
    return b"\xff\xd8" + com + sof + b"\xff\xd9"


def make_wav(sample_rate: int, n_samples: int) -> bytes:
    """A complete 16-bit mono PCM WAV (silence) at the given rate."""
    data = bytes(n_samples * 2)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def synthesize_media(df: DataFrame) -> DataFrame:
    """Deterministic media corpus over (doc_id, n_chars): even doc_ids
    become real BMPs (width 4 + doc_id % 29, height 4 + n_chars % 31),
    odd doc_ids real WAVs (rate 8000 * (1 + doc_id % 5), 16-bit mono,
    100 + n_chars % 400 samples). The formulas are plain column
    arithmetic, so an oracle can predict every decoded field without
    parsing bytes — which is exactly what makes the real decoder
    end-to-end verifiable: construct from formulas, decode from BYTES,
    compare. Arrow-batched map, (doc_id, payload) out."""

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                d, c = int(doc_id), int(n_chars)
                if d % 2 == 0:
                    payloads.append(make_bmp(4 + d % 29, 4 + c % 31))
                else:
                    payloads.append(
                        make_wav(8000 * (1 + d % 5), 100 + c % 400)
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return df.select("doc_id", "n_chars").mapInPandas(build, out_schema)


def synthesize_media_all(df: DataFrame) -> DataFrame:
    """Four-format deterministic media corpus over (doc_id, n_chars)
    — the PNG/JPEG extension of :func:`synthesize_media`:

    - doc_id % 4 == 0 -> BMP   w = 4 + doc_id % 29, h = 4 + n_chars % 31
    - doc_id % 4 == 1 -> WAV   rate = 8000 * (1 + doc_id % 5),
                               samples = 100 + n_chars % 400
    - doc_id % 4 == 2 -> PNG   w = 3 + doc_id % 37, h = 3 + n_chars % 23
                               (stored-deflate: size is a formula too)
    - doc_id % 4 == 3 -> JPEG  w = 5 + n_chars % 41, h = 5 + doc_id % 19,
                               COM padding doc_id % 17

    Same verification shape as synthesize_media: every decoded field
    (fmt, n_bytes, width, height, rate, duration) is a plain column
    formula the oracle predicts WITHOUT parsing — construct from
    formulas, decode from BYTES, compare. Arrow-batched map."""

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                d, c = int(doc_id), int(n_chars)
                kind = d % 4
                if kind == 0:
                    payloads.append(make_bmp(4 + d % 29, 4 + c % 31))
                elif kind == 1:
                    payloads.append(
                        make_wav(8000 * (1 + d % 5), 100 + c % 400)
                    )
                elif kind == 2:
                    payloads.append(make_png(3 + d % 37, 3 + c % 23))
                else:
                    payloads.append(
                        make_jpeg(5 + c % 41, 5 + d % 19, com_pad=d % 17)
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return df.select("doc_id", "n_chars").mapInPandas(build, out_schema)


def synthesize_video(df: DataFrame) -> DataFrame:
    """Deterministic MP4 corpus over (doc_id, n_chars): every row
    becomes a structurally-valid container (ftyp + free-box padding +
    moov/mvhd/trak/tkhd + mdat) with

        width  = 16 * (1 + doc_id % 20)
        height = 16 * (1 + n_chars % 15)
        duration_ms = 500 + n_chars % 2000
        free-box pad = doc_id % 23   (total bytes = 252 + pad)

    — plain column formulas, so the oracle predicts every decoded
    field without walking a byte. Arrow-batched map."""

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                d, c = int(doc_id), int(n_chars)
                payloads.append(
                    make_mp4(
                        16 * (1 + d % 20),
                        16 * (1 + c % 15),
                        500 + c % 2000,
                        pad=d % 23,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return df.select("doc_id", "n_chars").mapInPandas(build, out_schema)


FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def extract_features(binary_df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction plumbing: binary payload -> fixed-dim float
    vector via Arrow-batched mapInPandas. STUB featurizer (md5-derived
    deterministic values in [-1, 1]); a real deployment runs an image/
    audio encoder here with identical plumbing. Output feeds directly
    into the similarity/dedup operators (same array<float> shape as the
    embeddings table)."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                h = hashlib.md5(bytes(p)).digest()
                # stretch 16 md5 bytes deterministically to `dim` floats
                vals = [
                    (h[i % 16] ^ (i * 37 & 0xFF)) / 127.5 - 1.0 for i in range(dim)
                ]
                feats.append(np.asarray(vals, dtype="float32"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return binary_df.mapInPandas(feat, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_fp", T.StringType(), False),
    ]
)


def sample_frames(binary_df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video-shaped payloads: one output
    row per sampled frame (every ``every_n``-th of the payload's
    n_frames). The decode is the same STUB as decode_metadata; the
    Spark-side shape — batch in, multiple rows out per input row — is
    exactly what real frame extraction needs."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, fps = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(p)
                _, _, n_frames = _decode_stub(payload)
                for i in range(0, n_frames, every_n):
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    # stub frame fingerprint: payload + ':' + ascii
                    # index (not packed binary) so the exact formula
                    # is SQL-reproducible and the driver hash-checks
                    # this Python stage end-to-end; a real deployment
                    # replaces this whole function body with ffmpeg
                    fps.append(
                        hashlib.md5(
                            payload + b":" + str(i).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": idxs, "frame_fp": fps}
            )

    return binary_df.mapInPandas(frames, FRAME_SCHEMA)


TAR_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("n_members", T.LongType(), False),
        T.StructField("tar", T.BinaryType(), False),
    ]
)


def tar_shards(
    binary_df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    seed: str = "shard",
) -> DataFrame:
    """WebDataset-style shard export — the standard packaging for
    large-scale multimodal training data: binary payloads grouped
    into a fixed number of tar archives, one member per document.

    Fully DETERMINISTIC tars: hash-stable shard assignment
    (sampling.py shard_assign — the same h60 key the parquet shard
    exports use, so tar shards and parquet shards of one corpus
    align), members sorted by id, zeroed mtime/uid/gid, fixed mode,
    USTAR format — byte-identical across re-runs, so shard files are
    content-addressable and a re-export diff (shard_diff) detects
    exactly the changed shards. Sizes are arithmetic: each member
    costs 512 header bytes + its payload rounded up to 512, the
    archive ends with 1024 zero bytes, and tarfile pads to the
    10240-byte record size — so the oracle hash-checks every shard's
    byte size from the payload-size formulas alone.

    Scale shape: ONE hash shuffle on the uniform shard key (balanced
    regardless of id skew), then each shard's tar assembles in a
    single applyInPandas group — shard count is chosen so a shard
    fits an executor (the same contract WebDataset itself has: a
    shard must fit the reader). Returns (shard, n_members, tar);
    write the binary column to ``shard-%05d.tar`` objects with any
    sink (at 100 TB: foreachPartition -> object store multipart)."""
    import io
    import tarfile

    from sslr_spark.functions.sampling import shard_assign

    sharded = shard_assign(
        binary_df.select(id_col, payload_col), n_shards, id_col, seed
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tf:
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                ti = tarfile.TarInfo(name=f"{int(key):012d}.bin")
                ti.size = len(data)
                ti.mtime = 0
                ti.uid = 0
                ti.gid = 0
                ti.mode = 0o644
                ti.uname = ""
                ti.gname = ""
                tf.addfile(ti, io.BytesIO(data))
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_members": [len(pdf)],
                "tar": [buf.getvalue()],
            }
        )

    return sharded.groupBy("shard").applyInPandas(build, TAR_SHARD_SCHEMA)


def plan_frames(
    binary_df: DataFrame, fps: int = 2, every_n: int = 1
) -> DataFrame:
    """Frame-extraction PLAN from REAL container metadata: for every
    MP4 payload, derive the frame timestamps a sampler at ``fps``
    would target from the parsed mvhd duration (:func:`decode_media`)
    and emit every ``every_n``-th — (doc_id, frame_idx, t_ms). This
    is the step a production video pipeline runs BEFORE paying any
    codec cost: plan the timestamps from container metadata, then
    seek-decode only the planned frames. Every video yields at least
    frame 0. Pure built-in SQL over the decoded metadata — the row
    amplification is sequence+explode, no Python beyond the Arrow
    header parse."""
    meta = decode_media(binary_df)
    # integer arithmetic throughout (DIV, not /) — no float rounding
    n_frames = F.greatest(
        F.lit(1).cast("long"),
        F.expr(
            f"cast(duration_ms as bigint) * {int(fps)} div 1000"
        ),
    )
    idxs = F.sequence(
        F.lit(0).cast("long"), n_frames - 1, F.lit(int(every_n)).cast("long")
    )
    return (
        meta.filter(F.col("fmt") == "mp4")
        .select("doc_id", F.explode(idxs).alias("frame_idx"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.expr(f"cast(frame_idx * 1000 div {int(fps)} as int)").alias(
                "t_ms"
            ),
        )
    )


def binary_meta(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pure-SQL binary metadata (no Python): byte length, content hash,
    leading-bytes 'magic number' hex — the cheap pre-decode triage
    columns a media pipeline filters on before spending decode cost."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_fp"),
        F.lower(F.hex(F.substring(F.col(text_col), 1, 4).cast("binary"))).alias(
            "magic_hex"
        ),
    )


# ------------------------------------------------------------------
# Perceptual hashing (image near-dup dedup)
# ------------------------------------------------------------------

DHASH_W, DHASH_H = 9, 7  # 9x7 grid -> 8x7 = 56 comparison bits


def make_bmp_gray(values) -> bytes:
    """A 24-bit BMP whose pixels are the given grayscale grid
    (``values``: h x w ints in 0..255, VISUAL top-down order; r=g=b).
    Rows are stored bottom-up with 4-byte stride padding per the BMP
    spec — the decoder must undo both to see the visual grid."""
    import numpy as np

    px = np.asarray(values, dtype=np.uint8)
    h, w = px.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rgb = np.repeat(px[:, :, None], 3, axis=2).reshape(h, w * 3)
    rows[:, : w * 3] = rgb
    data = rows[::-1].tobytes()  # bottom-up storage
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0,
    )
    return header + dib + data


def _dhash_value(grp: int, var: int, x: int, y: int) -> int:
    """The synthetic corpus' pixel formula, shared verbatim with the
    DuckDB oracle: a quadratic base (wrap pattern pseudo-random, so
    different groups land far apart in Hamming space) with ONE pixel
    swapped per non-zero variant (so a group's variants stay within
    ~2 Hamming bits of each other — genuine near-duplicates)."""
    t = x + 9 * y + 17 * grp
    v = (t * t + x) % 251
    if var > 0 and x == (grp + var) % 9 and y == (grp + 2 * var) % 7:
        v = (v + 128) % 251
    return v


def synthesize_images_dhash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """doc rows -> real 9x7 grayscale BMPs from :func:`_dhash_value`:
    doc_id // 4 picks a base pattern (group), doc_id % 4 a near-dup
    variant of it. Arrow-batched; output (doc_id, payload)."""
    import pandas as pd

    def synth(batches):
        for pdf in batches:
            out = []
            for d in pdf[id_col].astype("int64"):
                g, v = int(d) // 4, int(d) % 4
                grid = [
                    [_dhash_value(g, v, x, y) for x in range(DHASH_W)]
                    for y in range(DHASH_H)
                ]
                out.append(make_bmp_gray(grid))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": out})

    return df.select(id_col).mapInPandas(synth, "doc_id long, payload binary")


def dhash64(binary_df: DataFrame) -> DataFrame:
    """REAL difference-hash over BMP payloads: parse the header,
    un-pad and un-flip the bottom-up pixel rows, integer-luma each
    pixel ((299r + 587g + 114b) // 1000 — exact for gray pixels), and
    set bit y*8+x iff gray[y][x+1] > gray[y][x] on the 9x7 grid. The
    production path resizes first (resize_bmp / resize_png to 9x7);
    payloads here are already grid-sized. 56 bits -> non-negative
    bigint, so banding and XOR Hamming stay in plain long arithmetic.

    Arrow-batched mapInPandas, zero shuffle. Output: (doc_id, phash).
    Raises on non-BMP/truncated payloads — quarantine upstream, the
    hygiene-screen convention."""
    import numpy as np
    import pandas as pd

    def hash_batches(batches):
        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                b = bytes(b)
                if len(b) < 54 or b[:2] != b"BM":
                    raise ValueError("not a BMP")
                w, h_signed = struct.unpack_from("<ii", b, 18)
                h = abs(h_signed)
                off = struct.unpack_from("<I", b, 10)[0]
                stride = ((w * 3 + 3) // 4) * 4
                if off + stride * h > len(b):
                    raise ValueError("truncated BMP pixel data")
                px = (
                    np.frombuffer(
                        b, dtype=np.uint8, count=stride * h, offset=off
                    )
                    .reshape(h, stride)[:, : w * 3]
                    .reshape(h, w, 3)
                )
                if h_signed > 0:
                    px = px[::-1]  # bottom-up storage -> visual order
                gray = (
                    px[:, :, 2].astype(np.int64) * 299
                    + px[:, :, 1].astype(np.int64) * 587
                    + px[:, :, 0].astype(np.int64) * 114
                ) // 1000
                bits = gray[:, 1:] > gray[:, :-1]  # (h, w-1)
                hh, ww = bits.shape
                weights = 1 << (
                    np.arange(hh, dtype=np.int64)[:, None] * 8
                    + np.arange(ww, dtype=np.int64)[None, :]
                )
                out.append(int((bits * weights).sum()))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "phash": pd.array(out, dtype="int64")}
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        hash_batches, "doc_id long, phash long"
    )


# ------------------------------------------------------------------
# Audio voice-activity detection (energy VAD)
# ------------------------------------------------------------------

VAD_FRAME = 80  # samples per frame (10 ms at 8 kHz)


def _vad_sample(doc_id: int, i: int) -> int:
    """Synthetic-corpus PCM sample formula, shared verbatim with the
    DuckDB oracle: 160-sample silence/activity alternation, active
    samples a doc-seeded pseudo-random value in [-1000, 1000]."""
    if (i // 160) % 2 == 0:
        return 0
    return (i * 37 + doc_id * 11) % 2001 - 1000


def synthesize_audio_vad(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """doc rows -> real 16-bit mono PCM WAVs (8 kHz, 400 + n_chars %
    300 samples) whose samples follow :func:`_vad_sample` — silence
    and activity alternate in 160-sample blocks, so frame energies
    are exactly predictable. Arrow-batched; (doc_id, payload) out."""
    import numpy as np
    import pandas as pd

    def synth(batches):
        for pdf in batches:
            out = []
            for d, c in zip(
                pdf[id_col].astype("int64"), pdf["n_chars"].astype("int64")
            ):
                d, n = int(d), 400 + int(c) % 300
                i = np.arange(n, dtype=np.int64)
                s = np.where(
                    (i // 160) % 2 == 0, 0, (i * 37 + d * 11) % 2001 - 1000
                ).astype("<i2")
                data = s.tobytes()
                fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
                out.append(
                    b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                    + b"fmt " + struct.pack("<I", 16) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": out})

    return df.select(id_col, "n_chars").mapInPandas(
        synth, "doc_id long, payload binary"
    )


def audio_vad(
    binary_df: DataFrame,
    frame_len: int = VAD_FRAME,
    energy_threshold: int = 2_000_000,
) -> DataFrame:
    """REAL energy-based voice-activity detection over WAV payloads:
    walk the RIFF chunks to the int16 PCM data, frame it
    (``frame_len`` samples, tail remainder dropped), and score each
    frame with its exact INTEGER energy ``sum(sample^2)`` — active
    iff energy > threshold. The bigint energy makes frames
    hash-comparable across engines (a float RMS would not be); a
    production VAD swaps in a windowed filterbank with identical
    plumbing (same framing, same per-frame row shape).

    Arrow-batched mapInPandas, zero shuffle. Output one row per full
    frame: (doc_id, frame, energy, active). Raises on non-PCM-16
    payloads — quarantine upstream."""
    import numpy as np
    import pandas as pd

    def vad(batches):
        for pdf in batches:
            ids, frames, energies = [], [], []
            for d, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b)
                if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError("not a WAV")
                pos, fmt_chunk, data_off, data_size = 12, None, None, None
                while pos + 8 <= len(b):
                    cid = b[pos:pos + 4]
                    size = struct.unpack_from("<I", b, pos + 4)[0]
                    if cid == b"fmt " and pos + 8 + 16 <= len(b):
                        fmt_chunk = struct.unpack_from("<HHIIHH", b, pos + 8)
                    elif cid == b"data":
                        data_off, data_size = pos + 8, size
                    pos += 8 + size + (size & 1)
                if fmt_chunk is None or data_off is None:
                    raise ValueError("missing fmt/data chunk")
                audio_fmt, channels, _rate, _br, _al, bits = fmt_chunk
                if (audio_fmt, channels, bits) != (1, 1, 16):
                    raise ValueError("only 16-bit mono PCM supported")
                s = np.frombuffer(
                    b, dtype="<i2", count=data_size // 2, offset=data_off
                ).astype(np.int64)
                n_frames = len(s) // frame_len
                e = (
                    (s[: n_frames * frame_len] ** 2)
                    .reshape(n_frames, frame_len)
                    .sum(axis=1)
                )
                ids.extend([int(d)] * n_frames)
                frames.extend(range(n_frames))
                energies.extend(int(x) for x in e)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame": pd.array(frames, dtype="int32"),
                    "energy": pd.array(energies, dtype="int64"),
                }
            )

    framed = binary_df.select("doc_id", "payload").mapInPandas(
        vad, "doc_id long, frame int, energy long"
    )
    return framed.withColumn(
        "active", F.col("energy") > F.lit(energy_threshold)
    )


def sniff_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-byte content sniffing — the dispatch step BEFORE any
    decode: classify payloads by their leading bytes (BMP 'BM', PNG
    \\x89PNG, JPEG FF D8 FF, RIFF/WAVE, ISO-BMFF 'ftyp' at offset 4,
    gzip 1F 8B, else unknown) so a mixed media column routes each
    format to its decoder without a Python round-trip: this is pure
    JVM ``substring``-on-binary expressions inside whole-stage
    codegen, zero shuffle, zero UDF — at 100 TB the sniff costs one
    scan and prunes every payload the downstream decoder would
    reject. Adds ``fmt_sniffed`` to the input columns."""
    p = F.col(payload_col)
    fmt = (
        F.when(F.substring(p, 1, 3) == F.lit(b"\xff\xd8\xff"), "jpeg")
        .when(F.substring(p, 1, 4) == F.lit(b"\x89PNG"), "png")
        .when(
            (F.substring(p, 1, 4) == F.lit(b"RIFF"))
            & (F.substring(p, 9, 4) == F.lit(b"WAVE")),
            "wav",
        )
        .when(F.substring(p, 5, 4) == F.lit(b"ftyp"), "mp4")
        .when(F.substring(p, 1, 2) == F.lit(b"BM"), "bmp")
        .when(F.substring(p, 1, 2) == F.lit(b"\x1f\x8b"), "gzip")
        .otherwise("unknown")
    )
    return df.withColumn("fmt_sniffed", fmt)
