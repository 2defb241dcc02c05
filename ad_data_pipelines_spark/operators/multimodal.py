"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched `mapInPandas`.

Beyond-reference (BASELINE.json north star). The design treats
image/audio/video as `binary` columns with a metadata struct; decode /
resize / frame-sample are Pandas-UDF stages over `mapInPandas`, so each
Arrow batch crosses the JVM↔Python boundary once and the expensive codec
work is vectorized per batch.

The heavy codecs (PIL/librosa/av) are NOT in this container.
`decode_image` runs a real Pillow decode where the runtime provides
one; without Pillow, PNGs still decode FOR REAL through
`decode_png_stdlib` (stdlib zlib inflate + scanline unfilter), and
codec-requiring formats raise NotImplementedError loudly. `binary_meta`
is the same plumbing with a deterministic metadata extractor (byte
length + md5), which IS oracle-checkable — proving schema, batching and
UDF signature are correct end-to-end.

Scale notes: mapInPandas streams batches (no per-row pickling); payload
columns should be read with `spark.sql.parquet.enableVectorizedReader`
on and kept OUT of shuffle keys; partition by content hash for decode
skew (all-identical assets land together under naive hashing).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the metadata-extraction stage.
BINARY_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column. On real data this is the
    stored media blob; here it is the UTF-8 encoding of `text` so the
    pipeline stays deterministic and oracle-checkable."""
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def binary_meta(docs: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    The canonical multimodal stage shape: mapInPandas(Iterator[pd.DataFrame]
    → Iterator[pd.DataFrame]) with an explicit output schema. Replace the
    body with image decode / audio resample in a codec-enabled image.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return with_payload(docs).mapInPandas(extract, BINARY_META_SCHEMA)


def pillow_available() -> bool:
    """True when a real image codec (Pillow) is importable at runtime."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return False
    return True


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: Magic prefixes of formats a real codec would handle — payloads with
#: one of these but no available decoder must FAIL LOUDLY, never emit a
#: silent NULL (a NULL says "corrupt blob", not "codec missing").
_KNOWN_IMAGE_MAGIC = (
    b"\xff\xd8\xff",  # JPEG
    b"GIF87a",
    b"GIF89a",
    b"BM",  # BMP
    b"II*\x00",  # TIFF little-endian
    b"MM\x00*",  # TIFF big-endian
)

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}


def decode_bmp_stdlib(data: bytes) -> tuple[int, int, str, bytes]:
    """Real decode of uncompressed 24-bit BITMAPINFOHEADER BMPs with
    nothing but `struct` — the second stdlib-real codec beside
    `decode_png_stdlib` (same rationale: the sandbox has no Pillow, but
    'no codec installed' must not mean 'decode path never executed').

    Returns (width, height, 'RGB', pixels) with pixels top-down
    row-major RGB (BMP stores bottom-up BGR with rows padded to 4
    bytes; both are normalized here). Raises ValueError for malformed
    payloads and flags every other BMP variant (palette, RLE, 32-bit,
    V4/V5 headers carry through fine — only bpp/compression gate) as
    needing the Pillow path.
    """
    import struct

    if len(data) < 54 or not data.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError("BMP core-header variant needs the Pillow path")
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"BMP bpp={bpp}/compression={compression} needs the Pillow path"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError("corrupt BMP dimensions")
    row_stride = (width * 3 + 3) & ~3
    need = pixel_off + row_stride * height
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        base = pixel_off + src_row * row_stride
        dst = row * width * 3
        for x in range(width):
            b_, g_, r_ = data[base + 3 * x : base + 3 * x + 3]
            out[dst + 3 * x : dst + 3 * x + 3] = bytes((r_, g_, b_))
    return width, height, "RGB", bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_stdlib(data: bytes) -> tuple[int, int, str, bytes]:
    """Dependency-free PNG decode: chunk walk → IHDR parse → stdlib
    `zlib` inflate of the IDAT stream → per-scanline filter reversal
    (None/Sub/Up/Average/Paeth). Returns (width, height, mode,
    raw_pixels) with pixels in scanline order, `channels` bytes each.

    Covers the deterministic subset — 8-bit depth, non-interlaced,
    color types L/RGB/P/LA/RGBA — which is what synthetic training
    payloads and the vast majority of stored PNGs use; exotic variants
    (16-bit, Adam7) raise ValueError and belong to the Pillow path.
    Pure Python per scanline is fine here: this is the codec-less
    fallback, and the batch boundary (mapInPandas) is unchanged, so a
    codec-enabled runtime swaps in Pillow with zero plan changes.
    """
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IHDR":
            ihdr = chunk
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("missing or malformed IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    ch = _PNG_CHANNELS.get(color)
    if depth != 8 or comp or filt or interlace or ch is None:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={color} "
            f"interlace={interlace}) — needs the Pillow path"
        )
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # normalize to the corrupt-payload contract: zlib.error is NOT
        # a ValueError, and an uncaught one would fail the whole Spark
        # batch instead of emitting a NULL-dims row
        raise ValueError(f"corrupt PNG pixel stream: {exc}") from exc
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("truncated pixel data")
    out = bytearray(stride * h)
    prev = bytearray(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad scanline filter {f}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, _PNG_MODES[color], bytes(out)


#: Real-decode output schema: dimensions + mode from the actual codec.
IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mode", StringType()),
    ]
)


def decode_image(docs_with_payload: DataFrame) -> DataFrame:
    """Image decode stage — Pillow when importable, stdlib PNG otherwise.

    Where a codec-enabled runtime provides Pillow, each Arrow batch's
    payloads are decoded executor-side (`PIL.Image.open` on the raw
    bytes). Without Pillow, PNG payloads still decode FOR REAL through
    `decode_png_stdlib` (zlib inflate + scanline unfilter — the same
    pattern that reads real .xlsx without an Excel engine,
    sources/sideinputs.py). Per payload:

      * decodes cleanly → (width, height, mode) row — PNG via
        `decode_png_stdlib`, uncompressed 24-bit BMP via
        `decode_bmp_stdlib`, both REAL in-sandbox,
      * recognized image magic (JPEG/GIF/TIFF, or a PNG/BMP variant the
        stdlib subset can't handle) but no codec → NotImplementedError,
        loudly — a missing codec must never masquerade as corrupt data,
      * anything else → NULL-dims row (a 100 TB corpus always contains
        corrupt blobs; those must not fail the batch).
    """
    use_pillow = pillow_available()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        if use_pillow:
            import PIL.Image

        def one(payload) -> tuple[int | None, int | None, str | None]:
            b = bytes(payload)
            if use_pillow:
                try:
                    with PIL.Image.open(io.BytesIO(b)) as im:
                        return im.width, im.height, im.mode
                except Exception:
                    return None, None, None
            if b.startswith(_PNG_SIG):
                try:
                    w, h, mode, _ = decode_png_stdlib(b)
                    return w, h, mode
                except ValueError as exc:
                    if "needs the Pillow path" in str(exc):
                        raise NotImplementedError(
                            "PNG variant beyond the stdlib subset requires "
                            "a codec-enabled runtime (Pillow)"
                        ) from exc
                    return None, None, None  # corrupt PNG
            if b.startswith(b"BM"):
                try:
                    w, h, mode, _ = decode_bmp_stdlib(b)
                    return w, h, mode
                except ValueError as exc:
                    if "needs the Pillow path" in str(exc):
                        raise NotImplementedError(
                            "BMP variant beyond the stdlib subset "
                            "requires a codec-enabled runtime (Pillow)"
                        ) from exc
                    return None, None, None  # corrupt BMP
            if b.startswith(_KNOWN_IMAGE_MAGIC):
                raise NotImplementedError(
                    "non-PNG/BMP image format requires a codec-enabled "
                    "runtime (Pillow not importable)"
                )
            return None, None, None  # not an image at all

        for pdf in batches:
            decoded = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series(
                        [d[0] for d in decoded], dtype="Int64"
                    ),
                    "height": pd.Series(
                        [d[1] for d in decoded], dtype="Int64"
                    ),
                    "mode": pd.Series(
                        [d[2] for d in decoded], dtype="object"
                    ),
                }
            )

    return docs_with_payload.mapInPandas(decode, IMAGE_META_SCHEMA)


_WAV_MAGIC = b"RIFF"
#: Audio formats that need a real codec — loud failure, never NULL.
_KNOWN_AUDIO_MAGIC = (
    b"ID3",  # MP3 with ID3 tag
    b"\xff\xfb",  # bare MP3 frame sync
    b"OggS",  # Ogg (Vorbis/Opus)
    b"fLaC",  # FLAC
)


def decode_wav_stdlib(data: bytes) -> tuple[int, int, int, int]:
    """Dependency-free PCM WAV parse: RIFF/WAVE chunk walk → fmt
    (sample rate, channels, bit depth) + data chunk size → returns
    (sample_rate, n_channels, bits_per_sample, n_frames). Covers
    uncompressed PCM (format tag 1) and IEEE float (3) — what training
    corpora store; compressed tags raise ValueError for the codec
    path. The same stdlib-real pattern as `decode_png_stdlib`."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data_size = size
    if fmt is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _byte_rate, block_align, bits = fmt
    if tag not in (1, 3):  # PCM / IEEE float
        raise ValueError(
            f"compressed WAV (format tag {tag}) — needs the codec path"
        )
    if not channels or not block_align:
        raise ValueError("malformed fmt chunk")
    return rate, channels, bits, data_size // block_align


AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("bits_per_sample", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def audio_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Audio metadata stage — the audio twin of `decode_image`: PCM WAV
    payloads parse FOR REAL through `decode_wav_stdlib`; recognized
    compressed formats (MP3/Ogg/FLAC) raise NotImplementedError loudly
    in codec-less runtimes; everything else yields NULL dims (corrupt
    blob). Same Arrow mapInPandas shape as every multimodal stage."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload):
            b = bytes(payload)
            if b.startswith(_WAV_MAGIC):
                try:
                    return decode_wav_stdlib(b)
                except ValueError as exc:
                    if "codec path" in str(exc):
                        raise NotImplementedError(
                            "compressed WAV requires a codec-enabled "
                            "runtime"
                        ) from exc
                    return None, None, None, None  # corrupt WAV
            if b.startswith(_KNOWN_AUDIO_MAGIC):
                raise NotImplementedError(
                    "compressed audio format requires a codec-enabled "
                    "runtime (no decoder importable)"
                )
            return None, None, None, None

        for pdf in batches:
            decoded = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "sample_rate": pd.Series(
                        [d[0] for d in decoded], dtype="Int64"
                    ),
                    "n_channels": pd.Series(
                        [d[1] for d in decoded], dtype="Int64"
                    ),
                    "bits_per_sample": pd.Series(
                        [d[2] for d in decoded], dtype="Int64"
                    ),
                    "n_frames": pd.Series(
                        [d[3] for d in decoded], dtype="Int64"
                    ),
                }
            )

    return docs_with_payload.mapInPandas(extract, AUDIO_META_SCHEMA)


#: Fake-decode output schema — what a real image decoder would emit
#: (minus the pixel buffer, which stays in the batch in real pipelines).
DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def decode_fake(docs: DataFrame) -> DataFrame:
    """DETERMINISTIC-FAKE decode: (width, height, n_frames) derived from
    the payload's md5 — a stand-in with the exact stage signature of a
    real decoder (mapInPandas, explicit schema, one Arrow crossing).
    Being md5-arithmetic, it is fully oracle-checkable (DECODE_FAKE_SQL).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": digests.map(lambda d: 16 + int(d[:4], 16) % 240),
                    "height": digests.map(lambda d: 16 + int(d[4:8], 16) % 240),
                    "n_frames": digests.map(lambda d: 1 + int(d[8:12], 16) % 32),
                }
            )

    return with_payload(docs).mapInPandas(decode, DECODED_META_SCHEMA)


def resize_meta(decoded: DataFrame, target: int = 64) -> DataFrame:
    """Resize planning stage: longest side → `target`, aspect preserved,
    floor semantics, minimum 1px. Pure column algebra (the pixel resample
    itself belongs in the decode batch body) — no UDF, codegen'd."""
    scale = F.lit(float(target)) / F.greatest("width", "height")
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1))
        .cast("long")
        .alias("new_width"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1))
        .cast("long")
        .alias("new_height"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def frame_sample(
    docs: DataFrame, frame_chars: int = 64, stride: int = 2
) -> DataFrame:
    """Frame-sampling stage: treat each document's text as a fake video
    of fixed `frame_chars`-character frames and keep every `stride`-th
    frame — one OUTPUT ROW PER SAMPLED FRAME (mapInPandas changing batch
    row count, the shape a real video frame-sampler has). Emits length +
    checksum per kept frame; a real decoder would emit the frame tensor.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                frames = [
                    text[i : i + frame_chars]
                    for i in range(0, len(text), frame_chars)
                ]
                for fi in range(0, len(frames), stride):
                    ids.append(doc_id)
                    idxs.append(fi)
                    lens.append(len(frames[fi]))
                    sums.append(hashlib.md5(frames[fi].encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame_md5": pd.Series(sums, dtype="object"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(sample, FRAME_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def byte_histogram_features(docs: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction stage: L1-normalized `dim`-bin byte histogram
    of the payload — a genuine (if simple) content feature with the same
    stage shape a CNN/audio embedder plugs into. Vectorized numpy per
    Arrow batch; output is an `array<double>` column ready for the
    similarity operators (operators/similarity.py)."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * dim)
                    continue
                hist = np.bincount(arr // (256 // dim), minlength=dim).astype(float)
                feats.append((hist / hist.sum()).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return with_payload(docs).mapInPandas(extract, FEATURES_SCHEMA)


BINARY_META_SQL = """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum
    FROM documents
"""

DECODE_FAKE_SQL = """
    SELECT doc_id,
           16 + CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 240 AS width,
           16 + CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 240 AS height,
           1 + CAST('0x' || substr(md5(text), 9, 4) AS BIGINT) % 32 AS n_frames
    FROM documents
"""


def frame_sample_sql(frame_chars: int = 64, stride: int = 2) -> str:
    return f"""
        WITH frames AS (
            SELECT doc_id,
                   CAST(i AS BIGINT) AS frame_idx,
                   substr(text, i * {frame_chars} + 1, {frame_chars}) AS frame
            FROM documents,
                 LATERAL unnest(generate_series(
                     0, CAST(CEIL(n_chars * 1.0 / {frame_chars}) AS BIGINT) - 1
                 )) AS t(i)
        )
        SELECT doc_id, frame_idx,
               length(frame) AS frame_len,
               md5(frame) AS frame_md5
        FROM frames
        WHERE frame_idx % {stride} = 0 AND length(frame) > 0
    """


def wav_pcm16_samples(data: bytes):
    """Extract interleaved int16 samples from an uncompressed 16-bit
    PCM WAV (the training-corpus storage format): returns
    (sample_rate, n_channels, numpy int16 array). Other bit depths /
    float WAVs raise for the codec-enabled path — loud, never lossy."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, body = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
        if cid == b"fmt " and len(chunk) >= 16:
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            body = chunk
    if fmt is None or body is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _br, _ba, bits = fmt
    if tag != 1 or bits != 16:
        raise ValueError(
            f"need uncompressed 16-bit PCM (tag={tag}, bits={bits})"
        )
    return rate, channels, np.frombuffer(body, dtype="<i2")


AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_windows", LongType()),
        StructField("energies", ArrayType(DoubleType())),
    ]
)


def audio_energy(
    docs_with_payload: DataFrame, window_ms: int = 25
) -> DataFrame:
    """Per-window RMS energy over real PCM samples — the first DSP
    feature every audio curation pipeline computes (silence trimming,
    voice-activity gating, loudness stratification). Windows are
    `window_ms` long, channels mean-mixed to mono, RMS normalized to
    [0, 1] by full scale and rounded to 6dp; a trailing partial window
    is dropped (deterministic window count). Non-PCM16 payloads yield
    NULL feature rows — visible, not silently skipped. Same Arrow
    mapInPandas shape as every multimodal stage."""
    import math

    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload):
            if payload is None:
                return None, None, None
            try:
                rate, channels, samples = wav_pcm16_samples(bytes(payload))
            except ValueError:
                return None, None, None
            if channels > 1:
                usable = len(samples) - (len(samples) % channels)
                mono = (
                    samples[:usable]
                    .reshape(-1, channels)
                    .mean(axis=1)
                )
            else:
                mono = samples.astype("float64")
            win = max(1, rate * window_ms // 1000)
            n_win = len(mono) // win
            if n_win == 0:
                return int(rate), 0, []
            x = mono[: n_win * win].reshape(n_win, win) / 32768.0
            rms = np.sqrt((x * x).mean(axis=1))
            return (
                int(rate),
                int(n_win),
                [round(float(v), 6) for v in rms],
            )

        for b in batches:
            out = b["payload"].map(one)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "sample_rate": out.map(lambda t: t[0]),
                    "n_windows": out.map(lambda t: t[1]),
                    "energies": out.map(lambda t: t[2]),
                }
            )

    return docs_with_payload.mapInPandas(extract, AUDIO_ENERGY_SCHEMA)


AUDIO_HASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_windows", LongType()),
        StructField("ahash", LongType()),
    ]
)


def audio_envelope_hash(
    docs_with_payload: DataFrame, window_ms: int = 25, n_bits: int = 60
) -> DataFrame:
    """60-bit energy-envelope fingerprint — the AUDIO twin of
    `image_dhash`: bit_i = 1 iff window i+1's RMS exceeds window i's,
    the dHash gradient trick applied to the loudness envelope instead
    of a pixel row. The envelope's SHAPE is what survives re-encoding
    and level changes (a uniformly rescaled copy preserves every RMS
    ordering, so its hash is IDENTICAL — unit-tested), which is
    exactly the near-dup signal: same clip at different loudness or
    codec settings lands within a few flipped bits.

    Same real PCM decode / mono mix / `window_ms` windowing as
    `audio_energy`; 60 bits keep the hash positive in int64 (the
    repo-wide bitmap discipline). Docs with fewer than 2 windows or
    non-PCM16 payloads yield a NULL hash — visible, not silently
    dropped. Pair with `dhash_near_dup_pairs` (it bands ANY long-typed
    fingerprint): `pairs = dhash_near_dup_pairs(
    hashes.select("doc_id", F.col("ahash").alias("dhash")))` — hashes
    shuffle, samples never do."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload):
            if payload is None:
                return None, None
            try:
                rate, channels, samples = wav_pcm16_samples(bytes(payload))
            except ValueError:
                return None, None
            if channels > 1:
                usable = len(samples) - (len(samples) % channels)
                mono = samples[:usable].reshape(-1, channels).mean(axis=1)
            else:
                mono = samples.astype("float64")
            win = max(1, rate * window_ms // 1000)
            n_win = len(mono) // win
            if n_win < 2:
                return n_win, None
            x = mono[: n_win * win].reshape(n_win, win) / 32768.0
            rms = np.sqrt((x * x).mean(axis=1))
            h = 0
            for i in range(min(n_bits, n_win - 1)):
                if rms[i + 1] > rms[i]:
                    h |= 1 << i
            return int(n_win), h

        for b in batches:
            out = b["payload"].map(one)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "n_windows": out.map(lambda t: t[0]).astype("object"),
                    "ahash": out.map(lambda t: t[1]).astype("object"),
                }
            )

    return docs_with_payload.mapInPandas(extract, AUDIO_HASH_SCHEMA)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_luma", DoubleType()),
        StructField("std_luma", DoubleType()),
        StructField("dark_frac", DoubleType()),
    ]
)


def image_brightness_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Pixel-level quality signals from REAL decoded images — the
    image twin of `audio_energy`: per-image mean/std luma (Rec.601
    weights for color) and the dark-pixel fraction (< 16/255), the
    features behind black-frame/blank-scan drops and exposure
    stratification. Decodes through the stdlib PNG and BMP paths
    (palette PNGs lack luma semantics and fail to the NULL row, as do
    undecodable payloads — visible, never silently skipped). Arrow
    mapInPandas, one crossing."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload):
            if payload is None:
                return (None,) * 5
            b = bytes(payload)
            try:
                if b.startswith(_PNG_SIG):
                    w, h, mode, px = decode_png_stdlib(b)
                elif b[:2] == b"BM":
                    w, h, mode, px = decode_bmp_stdlib(b)
                else:
                    return (None,) * 5
                if mode == "P":
                    return (None,) * 5  # indices, not intensities
            except (ValueError, NotImplementedError):
                return (None,) * 5
            arr = np.frombuffer(px, dtype=np.uint8).astype(np.float64)
            ch = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
            arr = arr.reshape(-1, ch)
            if ch >= 3:
                luma = (
                    0.299 * arr[:, 0] + 0.587 * arr[:, 1] + 0.114 * arr[:, 2]
                )
            else:
                luma = arr[:, 0]
            return (
                int(w),
                int(h),
                round(float(luma.mean()), 4),
                round(float(luma.std()), 4),
                round(float((luma < 16.0).mean()), 4),
            )

        for b in batches:
            out = b["payload"].map(one)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "width": out.map(lambda t: t[0]),
                    "height": out.map(lambda t: t[1]),
                    "mean_luma": out.map(lambda t: t[2]),
                    "std_luma": out.map(lambda t: t[3]),
                    "dark_frac": out.map(lambda t: t[4]),
                }
            )

    return docs_with_payload.mapInPandas(extract, IMAGE_STATS_SCHEMA)


def parse_mp4_meta(data: bytes) -> tuple[float, int, int]:
    """Dependency-free ISO-BMFF (MP4/MOV) container parse: top-level
    box walk → `moov/mvhd` (timescale + duration) and track count —
    returns (duration_seconds, timescale, n_tracks). Container-level
    metadata needs no codec (the same stdlib-real principle as the
    PNG/BMP/WAV paths); decoding FRAMES still requires the gated
    codec path. Supports mvhd versions 0 (32-bit) and 1 (64-bit)."""
    import struct

    def boxes(buf, pos, end):
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            btype = buf[pos + 4 : pos + 8]
            header = 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                header = 16
            elif size == 0:  # to end of enclosing box
                size = end - pos
            if size < header:
                raise ValueError("malformed box size")
            yield btype, pos + header, pos + size
            pos += size

    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (MP4) file")
    duration_s, timescale, n_tracks = None, None, 0
    for btype, body, end in boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        for ityp, ibody, iend in boxes(data, body, end):
            if ityp == b"mvhd":
                ver = data[ibody]
                if ver == 1:
                    ts, dur = struct.unpack(
                        ">IQ", data[ibody + 20 : ibody + 32]
                    )
                else:
                    ts, dur = struct.unpack(
                        ">II", data[ibody + 12 : ibody + 20]
                    )
                if not ts:
                    raise ValueError("zero timescale")
                timescale, duration_s = ts, dur / ts
            elif ityp == b"trak":
                n_tracks += 1
    if duration_s is None:
        raise ValueError("missing moov/mvhd box")
    return duration_s, timescale, n_tracks


VIDEO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("timescale", LongType()),
        StructField("n_tracks", LongType()),
    ]
)


def video_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Video metadata stage — the container twin of `audio_meta`:
    MP4/MOV payloads parse FOR REAL through `parse_mp4_meta`
    (duration, timescale, track count from the box structure, no codec
    involved); non-ISO-BMFF or malformed payloads yield NULL rows
    visibly. Same Arrow mapInPandas shape as every multimodal stage."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload):
            if payload is None:
                return None, None, None
            import struct as _struct

            try:
                d, ts, n = parse_mp4_meta(bytes(payload))
                return round(d, 4), ts, n
            except (ValueError, IndexError, _struct.error):
                return None, None, None

        for b in batches:
            out = b["payload"].map(one)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "duration_s": out.map(lambda t: t[0]),
                    "timescale": out.map(lambda t: t[1]),
                    "n_tracks": out.map(lambda t: t[2]),
                }
            )

    return docs_with_payload.mapInPandas(extract, VIDEO_META_SCHEMA)


DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dhash", LongType()),
    ]
)


def image_dhash(docs_with_payload: DataFrame) -> DataFrame:
    """64-bit difference-hash (dHash) per image from REAL decoded
    pixels: luma block-means on a 9×8 grid, each bit = left cell
    brighter than its right neighbor — the classic perceptual
    fingerprint that survives resizing/re-encoding but flips few bits
    under small edits. Undecodable/palette payloads → NULL hash
    (visible, never skipped). Arrow mapInPandas, one crossing; output
    is ONE bigint per image, so downstream near-dup joins shuffle
    8-byte hashes, never pixels."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload):
            if payload is None:
                return None
            b = bytes(payload)
            try:
                if b.startswith(_PNG_SIG):
                    w, h, mode, px = decode_png_stdlib(b)
                elif b[:2] == b"BM":
                    w, h, mode, px = decode_bmp_stdlib(b)
                else:
                    return None
                if mode == "P":
                    return None
            except (ValueError, NotImplementedError):
                return None
            arr = np.frombuffer(px, dtype=np.uint8).astype(np.float64)
            ch = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
            arr = arr.reshape(h, w, ch)
            if ch >= 3:
                luma = (
                    0.299 * arr[:, :, 0]
                    + 0.587 * arr[:, :, 1]
                    + 0.114 * arr[:, :, 2]
                )
            else:
                luma = arr[:, :, 0]
            # block-mean downsample to 8 rows × 9 cols (row/col edges
            # from linspace so any input size maps deterministically)
            re = np.linspace(0, h, 9).astype(int)
            ce = np.linspace(0, w, 10).astype(int)
            grid = np.empty((8, 9))
            for i in range(8):
                for j in range(9):
                    block = luma[re[i]:max(re[i + 1], re[i] + 1),
                                 ce[j]:max(ce[j + 1], ce[j] + 1)]
                    grid[i, j] = block.mean()
            bits = (grid[:, :-1] > grid[:, 1:]).flatten()
            v = 0
            for bit in bits:
                v = (v << 1) | int(bit)
            # keep within signed int64 (bit 63 set → negative long)
            if v >= 1 << 63:
                v -= 1 << 64
            return v

        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "dhash": b["payload"].map(one).astype("object"),
                }
            )

    return docs_with_payload.mapInPandas(extract, DHASH_SCHEMA)


def dhash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) for images whose dHashes differ by ≤
    `max_hamming` bits. EXACT for max_hamming ≤ 3 by pigeonhole: the
    64-bit hash splits into 4 16-bit bands, and ≤3 flipped bits leave
    ≥1 band identical — so candidates come from 4 band equi-joins
    (shuffling 8-byte hashes), never an all-pairs comparison; the
    exact Hamming filter (bit_count of xor, JVM-side) then verifies.
    The same band discipline as SimHash candidates, specialized to the
    image fingerprint."""
    h = hashes.filter(F.col("dhash").isNotNull())
    bands = h.select(
        "doc_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("dhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "dhash", F.col("b.band").alias("band"),
             F.col("b.key").alias("key"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("dhash").alias("ha"),
        "band",
        "key",
    )
    bb = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("dhash").alias("hb"),
        "band",
        "key",
    )
    ham = F.bit_count(
        F.col("ha").bitwiseXOR(F.col("hb"))
    ).cast("int")
    return (
        a.join(bb, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
