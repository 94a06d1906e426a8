"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched pandas UDFs via mapInPandas.

Header-parsable formats get REAL decoders: BMP (image dimensions) and
WAV (sample rate, channels, frame count) are pure-Python parseable
without PIL/ffmpeg, so ``_decode_payload`` sniffs the magic bytes and
parses those natively. Compressed codecs (JPEG/PNG/MP3/H.264 …) would
need the codec libraries this container lacks, so for any OTHER
payload the decode is STUBBED: NotImplementedError unless
``deterministic_fake=True``, in which case fake dims derive
deterministically from the payload bytes. Everything Spark-side —
schema, batch iteration, partitioning, UDF signatures — is real and
tested; further decoders drop into ``_decode_payload`` without
touching the plumbing.

Scale notes: binary payloads ride in Parquet/Iceberg as BINARY
columns; feature extraction is a narrow mapInPandas pass (no shuffle)
whose Arrow batch size bounds executor memory (payload_bytes ×
maxRecordsPerBatch). Frame sampling fans out rows (one per sampled
frame) — an explode, still narrow.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        # real-codec-only fields (NULL from the fake path)
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)


def parse_bmp(payload: bytes) -> tuple[int, int]:
    """(width, height) from a BITMAPINFOHEADER BMP — offsets per the
    published format: 'BM' magic, int32 LE width at 18, int32 LE
    height at 22 (negative = top-down rows; dimension is |height|)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    if width <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    return width, abs(height)


def parse_wav(payload: bytes) -> tuple[int, int, int]:
    """(sample_rate, channels, n_frames) from a RIFF/WAVE payload by
    walking the chunk list (chunks are word-aligned; sizes LE)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    sample_rate = channels = block_align = None
    n_frames = None
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        size = struct.unpack_from("<I", payload, off + 4)[0]
        body = off + 8
        if cid == b"fmt " and size >= 16:
            # Declared sizes are untrusted: a truncated payload whose
            # fmt chunk claims >= 16 bytes must fail as ValueError,
            # not leak struct.error out of the parser.
            if body + 16 > len(payload):
                raise ValueError("WAV fmt chunk truncated")
            channels, sample_rate = struct.unpack_from("<HI", payload, body + 2)
            block_align = struct.unpack_from("<H", payload, body + 12)[0]
        elif cid == b"data":
            if block_align is None:
                raise ValueError("WAV data chunk before fmt chunk")
            # Clamp an oversized declared data size to the bytes that
            # are actually present so n_frames can't be inflated.
            avail = max(len(payload) - body, 0)
            n_frames = min(size, avail) // max(block_align, 1)
        off = body + size + (size % 2)  # chunks pad to even length
    if sample_rate is None or n_frames is None:
        raise ValueError("WAV missing fmt or data chunk")
    return sample_rate, channels, n_frames


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_png(payload: bytes) -> tuple[int, int]:
    """(width, height) from a PNG's IHDR chunk — pure-Python, no
    codec library: the 8-byte signature is followed by the IHDR
    chunk (the spec REQUIRES it first), whose first 8 body bytes are
    width and height as big-endian uint32 (offsets 16 and 20).
    Pixel-level decode would additionally need only stdlib zlib
    (IDAT is a zlib stream) — not required for dimensions."""
    if len(payload) < 24 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    length, ctype = struct.unpack_from(">I4s", payload, 8)
    if ctype != b"IHDR" or length < 13:
        raise ValueError("PNG first chunk is not a valid IHDR")
    width, height = struct.unpack_from(">II", payload, 16)
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid PNG dimensions {width}x{height}")
    return width, height


def parse_jpeg(payload: bytes) -> tuple[int, int]:
    """(width, height) from a JPEG's SOFn marker — pure-Python
    marker walk: segments are (0xFF, marker, uint16 BE length);
    standalone markers (SOI, RSTn, TEM) carry no length; the frame
    header SOFn (0xC0-0xCF except DHT 0xC4 / JPG 0xC8 / DAC 0xCC)
    stores precision(1), height(2 BE), width(2 BE) at body start.
    Declared lengths are untrusted: truncation raises ValueError."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    off = 2
    while off + 2 <= len(payload):
        if payload[off] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[off + 1]
        if marker == 0xFF:  # fill byte
            off += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            off += 2
            continue
        if off + 4 > len(payload):
            raise ValueError("JPEG segment truncated")
        seglen = struct.unpack_from(">H", payload, off + 2)[0]
        if seglen < 2:
            raise ValueError("JPEG bad segment length")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if off + 9 > len(payload) or seglen < 7:
                raise ValueError("JPEG SOF truncated")
            height, width = struct.unpack_from(">HH", payload, off + 5)
            if width <= 0 or height <= 0:
                raise ValueError(
                    f"invalid JPEG dimensions {width}x{height}"
                )
            return width, height
        if marker == 0xDA:  # SOS: entropy data follows, SOF must precede
            break
        off += 2 + seglen
    raise ValueError("JPEG has no SOFn frame header")


def _decode_payload(payload: bytes, kind: str, deterministic_fake: bool):
    """Dispatch on magic bytes: BMP, WAV, PNG and JPEG parse natively
    (header formats are public and pure-Python parseable); anything
    else is the stub. Returns (width, height, n_frames, sample_rate,
    channels)."""
    if len(payload) >= 2 and payload[:2] == b"BM":
        w, h = parse_bmp(payload)
        return w, h, 1, None, None
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        rate, ch, frames = parse_wav(payload)
        return None, None, frames, rate, ch
    if len(payload) >= 8 and payload[:8] == _PNG_SIG:
        w, h = parse_png(payload)
        return w, h, 1, None, None
    if len(payload) >= 2 and payload[:2] == b"\xff\xd8":
        w, h = parse_jpeg(payload)
        return w, h, 1, None, None
    if not deterministic_fake:
        raise NotImplementedError(
            "no native decoder for this payload (BMP/WAV/PNG/JPEG "
            "headers parse without codec libraries; PIXEL decode of "
            "compressed audio/video formats — MP3, MP4, Vorbis — "
            "needs codec libraries this environment lacks); pass "
            "deterministic_fake=True or plug in a real decoder"
        )
    h = hashlib.md5(payload or b"").digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    n_frames = 1 if kind == "image" else 1 + h[2] % 30
    return width, height, n_frames, None, None


def extract_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """Narrow mapInPandas feature-extraction pass over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                payload = bytes(r.payload) if r.payload is not None else b""
                w, h, nf, rate, ch = _decode_payload(
                    payload, r.kind, deterministic_fake
                )
                rows.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "n_bytes": len(payload),
                        "digest": hashlib.md5(payload).hexdigest(),
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        "sample_rate": rate,
                        "channels": ch,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURES.fields],
            )

    return media.mapInPandas(run, schema=FEATURES)


def sample_frames(features: DataFrame, every_k: int = 5) -> DataFrame:
    """Fan out one row per sampled frame index (explode — narrow)."""
    from pyspark.sql import functions as F

    idx = F.sequence(
        F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_k)
    )
    return features.select(
        "media_id", "kind", F.explode(idx).alias("frame_idx")
    )


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A real minimal 24-bpp BITMAPINFOHEADER BMP with deterministic
    pixel bytes (rows padded to 4-byte boundaries per the format)."""
    row = ((width * 3 + 3) // 4) * 4
    data_size = row * height
    header = b"BM" + struct.pack(
        "<IHHI", 54 + data_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    pixels = bytes(
        (seed * 31 + i * 7) % 256 for i in range(data_size)
    )
    return header + pixels


def make_wav(
    n_frames: int, sample_rate: int = 8000, channels: int = 1, seed: int = 0
) -> bytes:
    """A real PCM-16 RIFF/WAVE payload with deterministic samples."""
    block_align = channels * 2
    data_size = n_frames * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_size)
        + bytes((seed * 17 + i * 13) % 256 for i in range(data_size))
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int, seed: int = 0) -> bytes:
    """A real format-conformant 8-bit RGB PNG (signature, CRC-correct
    IHDR/IDAT/IEND, filter-0 scanlines zlib-compressed via stdlib)
    with deterministic pixel bytes."""
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00"
        + bytes((seed * 13 + y * 7 + x) % 256 for x in range(width * 3))
        for y in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def make_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """A format-conformant baseline JPEG header sequence (SOI, JFIF
    APP0, DQT, SOF0 with the real dimensions, DHT, SOS) followed by
    deterministic entropy bytes (all < 0xFF, so no marker collision)
    and EOI. Dimension parsing — the supported operation — needs only
    the marker walk to SOF0."""
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    dqt = b"\x00" + bytes(1 + (seed * 7 + i) % 255 for i in range(64))
    sof0 = (
        struct.pack(">BHHB", 8, height, width, 3)
        + b"\x01\x22\x00\x02\x11\x00\x03\x11\x00"
    )
    dht = b"\x00" + bytes([1] + [0] * 15) + b"\x00"
    sos = b"\x03\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00"
    entropy = bytes((seed * 11 + i * 5) % 255 for i in range(32))
    return (
        b"\xff\xd8"
        + _jpeg_seg(0xE0, app0)
        + _jpeg_seg(0xDB, dqt)
        + _jpeg_seg(0xC0, sof0)
        + _jpeg_seg(0xC4, dht)
        + _jpeg_seg(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/bench (payload bytes
    derived from the id — no external data)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * (1 + i % 7)
        rows.append(
            (i, kinds[i % 3], bytearray(payload), "application/octet-stream", "synthetic")
        )
    return spark.createDataFrame(rows, schema=MEDIA)


def wav_samples(payload: bytes):
    """int16 PCM sample array (interleaved channels) plus channel
    count from a RIFF/WAVE payload — the decode step behind
    audio_energy_windows. Same chunk-walk discipline as parse_wav:
    declared sizes are untrusted and clamped to the bytes present."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    channels = None
    data = None
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        size = struct.unpack_from("<I", payload, off + 4)[0]
        body = off + 8
        if cid == b"fmt " and size >= 16:
            if body + 16 > len(payload):
                raise ValueError("WAV fmt chunk truncated")
            channels = struct.unpack_from("<H", payload, body + 2)[0]
        elif cid == b"data":
            avail = max(len(payload) - body, 0)
            n = min(size, avail) // 2 * 2  # whole int16 samples
            data = payload[body : body + n]
        off = body + size + (size % 2)
    if channels is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return np.frombuffer(data, dtype="<i2"), channels


AUDIO_ENERGY = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_energy_windows(
    media: DataFrame, window_frames: int = 25
) -> DataFrame:
    """Per-window audio energy over PCM-16 WAV payloads: frames
    windowed in fixed blocks of ``window_frames``, energy = exact
    BIGINT sum of squared samples across all channels in the window
    (the VAD / silence-gate feature a speech-data curation pipeline
    computes before transcription). Arrow-batched mapInPandas with a
    vectorized numpy kernel per payload — no per-sample Python; the
    trailing partial window is emitted with its true n_samples."""
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = {
                "media_id": [],
                "window_idx": [],
                "n_samples": [],
                "energy": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, channels = wav_samples(bytes(payload))
                step = window_frames * channels
                n = len(samples)
                sq = samples.astype(np.int64) ** 2
                for w in range(0, max((n + step - 1) // step, 0)):
                    chunk = sq[w * step : (w + 1) * step]
                    out["media_id"].append(int(mid))
                    out["window_idx"].append(w)
                    out["n_samples"].append(int(len(chunk)))
                    out["energy"].append(int(chunk.sum()))
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_ENERGY.fields])

    return media.mapInPandas(run, schema=AUDIO_ENERGY)


def bmp_pixels(payload: bytes):
    """(H, W, 3) uint8 pixel array (top-down row order, per-pixel BGR
    bytes as stored) decoded from a 24-bpp BITMAPINFOHEADER BMP — the
    pixel-level decode behind image_tiles. Same untrusted-size
    discipline as the other parsers: the declared data offset and the
    stride*height extent are bounds-checked against the bytes
    actually present."""
    import numpy as np

    w, h = parse_bmp(payload)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise ValueError(f"only 24-bpp BMP supported, got {bpp}")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    stride = ((w * 3 + 3) // 4) * 4
    if data_off + stride * h > len(payload):
        raise ValueError("BMP pixel data truncated")
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    px = raw[:, : w * 3].reshape(h, w, 3)
    # Positive height field = bottom-up row storage (the common case);
    # negative = already top-down.
    if struct.unpack_from("<i", payload, 22)[0] > 0:
        px = px[::-1]
    return px


IMAGE_TILES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("tx", T.LongType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("intensity_sum", T.LongType()),
    ]
)


def image_tiles(media: DataFrame, grid: int = 2) -> DataFrame:
    """ViT-style patch extraction over decoded BMP payloads: the
    image splits into a grid×grid tile lattice (pixel at top-down row
    r, column c lands in tile (min(r*grid//H, grid-1),
    min(c*grid//W, grid-1)) — integer-exact, no float boundaries) and
    each tile reports its pixel count plus the exact BIGINT sum of
    its channel bytes — the patch-statistics pass an image-curation
    pipeline runs before embedding (brightness screens, letterbox
    detection). Narrow Arrow-batched mapInPandas, vectorized numpy
    per payload — no per-pixel Python; tile fan-out is grid² rows per
    image."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in IMAGE_TILES.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = bmp_pixels(bytes(payload))
                hh, ww = px.shape[:2]
                inten = px.astype(np.int64).sum(axis=2)
                ty = np.minimum(np.arange(hh) * grid // hh, grid - 1)
                tx = np.minimum(np.arange(ww) * grid // ww, grid - 1)
                for a in range(grid):
                    rows = inten[ty == a]
                    for b in range(grid):
                        block = rows[:, tx == b]
                        out["media_id"].append(int(mid))
                        out["ty"].append(a)
                        out["tx"].append(b)
                        out["n_px"].append(int(block.size))
                        out["intensity_sum"].append(int(block.sum()))
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_TILES.fields]
            )

    return media.mapInPandas(run, schema=IMAGE_TILES)


PHASH = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.StringType()),
    ]
)


def average_hash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash over decoded BMP payloads: pixels land
    on a grid×grid cell lattice (image_tiles' integer assignment),
    and bit(cell) = 1 iff the cell's mean intensity exceeds the
    image's global mean — compared CROSS-MULTIPLIED
    (cell_sum · n_total > total_sum · n_cell) so the whole hash is
    integer-exact with no float mean anywhere; empty cells (an image
    shorter than the grid) compare 0 > 0 and bit 0. Returns the
    64-char '0'/'1' string in row-major cell order — the
    dedup/near-dup fingerprint image-curation pipelines bucket on.
    Narrow Arrow-batched mapInPandas, numpy bincount per payload."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_cells = grid * grid
        for pdf in batches:
            out = {"media_id": [], "phash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = bmp_pixels(bytes(payload))
                hh, ww = px.shape[:2]
                inten = px.astype(np.int64).sum(axis=2)
                ty = np.minimum(np.arange(hh) * grid // hh, grid - 1)
                tx = np.minimum(np.arange(ww) * grid // ww, grid - 1)
                cell = (ty[:, None] * grid + tx[None, :]).ravel()
                flat = inten.ravel()
                cs = np.bincount(
                    cell, weights=flat, minlength=n_cells
                ).astype(np.int64)
                cn = np.bincount(cell, minlength=n_cells).astype(np.int64)
                ts, tn = int(flat.sum()), int(flat.size)
                bits = cs * tn > ts * cn
                out["media_id"].append(int(mid))
                out["phash"].append(
                    "".join("1" if b else "0" for b in bits)
                )
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return media.mapInPandas(run, schema=PHASH)


def dft_tables(window: int, bins: tuple[int, ...]):
    """Integer DFT filter tables: for each bin k, cos/sin at the
    window's phase steps quantized to x100 integers (half-away
    rounding). The SAME integers drive the Spark kernel and the
    DuckDB oracle, so no trig function is ever compared across
    engines — the filter IS the integer table."""
    import math

    def rha(x):
        return int(math.copysign(math.floor(abs(x) * 100 + 0.5), x))

    out = {}
    for k in bins:
        out[k] = (
            [rha(math.cos(2 * math.pi * k * i / window)) for i in range(window)],
            [rha(math.sin(2 * math.pi * k * i / window)) for i in range(window)],
        )
    return out


SPECTRAL = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.LongType()),
        T.StructField("bin", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("re_c", T.LongType()),
        T.StructField("im_c", T.LongType()),
        T.StructField("power_c2", T.LongType()),
    ]
)


def spectral_windows(
    media: DataFrame,
    window_frames: int = 32,
    bins: tuple[int, ...] = (1, 2, 4),
) -> DataFrame:
    """Per-window DFT-bin power over channel 0 of PCM-16 WAV payloads
    — the tone/voicing feature a speech-curation pipeline gates on
    (the spectral sibling of audio_energy_windows). Per window of
    ``window_frames`` frames and per bin k: re = sum(s_i * cos_k[i]),
    im = sum(s_i * sin_k[i]) over the x100 integer tables
    (dft_tables), power = re^2 + im^2 — all BIGINT-exact (|s|<=2^15,
    |tab|<=100, 32 terms -> |re|<~1e8, power <~1e16 < 2^63). The
    trailing partial window truncates the table to its true length.
    Arrow-batched mapInPandas, vectorized per payload: the window
    fold is one reshape + matmul against the (window, bins) table."""
    import numpy as np
    import pandas as pd

    tabs = dft_tables(window_frames, bins)
    cos_m = np.array([tabs[k][0] for k in bins], dtype=np.int64).T
    sin_m = np.array([tabs[k][1] for k in bins], dtype=np.int64).T

    def run(batches):
        for pdf in batches:
            out = {f.name: [] for f in SPECTRAL.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, channels = wav_samples(bytes(payload))
                ch0 = samples[::channels].astype(np.int64)
                n = len(ch0)
                for w in range(0, max((n + window_frames - 1) // window_frames, 0)):
                    chunk = ch0[w * window_frames : (w + 1) * window_frames]
                    L = len(chunk)
                    re = chunk @ cos_m[:L]
                    im = chunk @ sin_m[:L]
                    for j, k in enumerate(bins):
                        out["media_id"].append(int(mid))
                        out["window_idx"].append(w)
                        out["bin"].append(int(k))
                        out["n_frames"].append(L)
                        out["re_c"].append(int(re[j]))
                        out["im_c"].append(int(im[j]))
                        out["power_c2"].append(
                            int(re[j]) ** 2 + int(im[j]) ** 2
                        )
            yield pd.DataFrame(out, columns=[f.name for f in SPECTRAL.fields])

    return media.mapInPandas(run, schema=SPECTRAL)


CONV3 = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_interior", T.LongType()),
        T.StructField("n_edges", T.LongType()),
        T.StructField("resp_sum", T.LongType()),
    ]
)


def conv3x3_edges(media: DataFrame, threshold: int = 256) -> DataFrame:
    """3×3 integer convolution over decoded BMP pixels — the
    neighborhood pass image curation runs for blur/flat screens and
    cheap edge density (a Laplacian-style response): per interior
    pixel lap = 9·I(r,c) − Σ 3×3 box of the channel-sum intensity,
    all in exact int64; per image the interior count, the count of
    |lap| >= ``threshold`` (edge pixels), and Σ|lap| (response mass —
    ~0 for flat regions, so it doubles as a synthetic-vs-natural
    screen). 'valid' region only (no padding invention), so every
    emitted value restates arithmetically from the payload formula.
    One narrow Arrow-batched mapInPandas; the convolution is
    vectorized numpy shifts — no per-pixel Python, no SciPy."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in CONV3.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = bmp_pixels(bytes(payload))
                inten = px.astype(np.int64).sum(axis=2)
                hh, ww = inten.shape
                if hh < 3 or ww < 3:
                    vals = (0, 0, 0)
                else:
                    box = np.zeros((hh - 2, ww - 2), dtype=np.int64)
                    for dr in range(3):
                        for dc in range(3):
                            box += inten[dr : dr + hh - 2, dc : dc + ww - 2]
                    lap = np.abs(9 * inten[1 : hh - 1, 1 : ww - 1] - box)
                    vals = (
                        int(lap.size),
                        int((lap >= threshold).sum()),
                        int(lap.sum()),
                    )
                out["media_id"].append(int(mid))
                out["n_interior"].append(vals[0])
                out["n_edges"].append(vals[1])
                out["resp_sum"].append(vals[2])
            yield pd.DataFrame(out, columns=[f.name for f in CONV3.fields])

    return media.mapInPandas(run, schema=CONV3)


RESIZED = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("oy", T.LongType()),
        T.StructField("ox", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("g", T.LongType()),
        T.StructField("r", T.LongType()),
    ]
)


def resize_nearest(media: DataFrame, out: int = 4) -> DataFrame:
    """Nearest-neighbor resample of decoded BMP payloads to a fixed
    out×out raster — the resize step every image-curation pipeline
    runs before batching into an embedding model (fixed input shape),
    and the spec's 'resize' verb made pixel-exact: output cell
    (oy, ox) samples source pixel (oy*H div out, ox*W div out) — the
    floor mapping, integer-exact in both engines, correct for down-
    AND up-sampling (the fixture corpus has H as small as 3). Emits
    the sampled pixel's channel bytes (BGR as stored) per cell, so an
    oracle can reconstruct every byte from the generator formula —
    the decode+resample path is proven, not just shaped. Narrow
    Arrow-batched mapInPandas, one numpy fancy-index per payload;
    fan-out out² rows per image."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k.name: [] for k in RESIZED.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = bmp_pixels(bytes(payload))
                hh, ww = px.shape[:2]
                rows = np.arange(out) * hh // out
                ccs = np.arange(out) * ww // out
                sub = px[np.ix_(rows, ccs)].astype(np.int64)
                for oy in range(out):
                    for ox in range(out):
                        cols["media_id"].append(int(mid))
                        cols["oy"].append(oy)
                        cols["ox"].append(ox)
                        cols["b"].append(int(sub[oy, ox, 0]))
                        cols["g"].append(int(sub[oy, ox, 1]))
                        cols["r"].append(int(sub[oy, ox, 2]))
            yield pd.DataFrame(
                cols, columns=[f.name for f in RESIZED.fields]
            )

    return media.mapInPandas(run, schema=RESIZED)


def vad_segments(energy: DataFrame) -> DataFrame:
    """Voice-activity segmentation over ``audio_energy_windows``
    output — the step between the energy feature and a transcription
    queue: windows strictly above their OWN media's mean energy are
    active (the relative gate: absolute thresholds break across
    recordings with different gain), and consecutive active windows
    compress into segments via gaps-and-islands (w13's discipline:
    group key = window_idx − row_number over the per-media order).

    Exact-integer active rule: energy·n_windows > sum_energy — the
    cross-multiplied form of energy > mean, no division anywhere.
    Scale shape: the mean join, the islands window and the segment
    rollup are all keyed/partitioned on media_id — one exchange
    satisfies every stage; no global windows, no driver state.
    Returns (media_id, seg_start, seg_end, n_windows, seg_energy).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tot = energy.groupBy("media_id").agg(
        F.sum("energy").alias("sum_e"),
        F.count("*").alias("n_w"),
    )
    act = energy.join(tot, "media_id").filter(
        F.col("energy") * F.col("n_w") > F.col("sum_e")
    )
    w = Window.partitionBy("media_id").orderBy("window_idx")
    return (
        act.withColumn(
            "grp", F.col("window_idx") - F.row_number().over(w)
        )
        .groupBy("media_id", "grp")
        .agg(
            F.min("window_idx").cast("long").alias("seg_start"),
            F.max("window_idx").cast("long").alias("seg_end"),
            F.count("*").cast("long").alias("n_windows"),
            F.sum("energy").cast("long").alias("seg_energy"),
        )
        .drop("grp")
    )
