"""Real image decode without a codec dependency: PNG payloads decode
through the stdlib path (zlib inflate + scanline unfilter) even in this
codec-less container; formats that NEED a codec must fail loudly
(never a silent NULL — that says "corrupt blob", not "codec missing")."""

import struct
import zlib

import pytest

from ad_data_pipelines_spark.operators import multimodal as mm
from ad_data_pipelines_spark.plans import testdata_queries as tq
from tests.conftest import SF_SMALL


def _make_png(w, h, pixels, color_type=2, filters=None):
    """Minimal PNG encoder (test-local): 8-bit, non-interlaced, with a
    chosen scanline filter per row — lets the tests exercise every
    filter type the decoder must reverse."""
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = w * ch
    assert len(pixels) == stride * h

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = bytes(pixels[y * stride : (y + 1) * stride])
        f = filters[y % len(filters)] if filters else 0
        enc = bytearray(line)
        if f == 1:  # Sub
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (enc[i] - line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                enc[i] = (enc[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                enc[i] = (enc[i] - mm._paeth(left, prev[i], ul)) & 0xFF
        raw.append(f)
        raw += enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        mm._PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _gradient(n):
    # deterministic, non-constant bytes so every filter type transforms
    # the scanline non-trivially
    return bytes((7 * i + (i * i) // 3) % 256 for i in range(n))


def test_decode_png_stdlib_all_filters_roundtrip():
    w, h = 17, 10  # odd width: stride not a multiple of typical vector sizes
    px = _gradient(w * h * 3)
    png = _make_png(w, h, px, color_type=2, filters=[0, 1, 2, 3, 4])
    gw, gh, mode, out = mm.decode_png_stdlib(png)
    assert (gw, gh, mode) == (w, h, "RGB")
    assert out == px  # bit-exact filter reversal


def test_decode_png_stdlib_grayscale_and_rgba():
    for color_type, mode, ch in [(0, "L", 1), (6, "RGBA", 4), (4, "LA", 2)]:
        px = _gradient(5 * 4 * ch)
        got = mm.decode_png_stdlib(
            _make_png(5, 4, px, color_type=color_type, filters=[4, 2, 1, 3])
        )
        assert got == (5, 4, mode, px)


def test_decode_png_stdlib_rejects_exotic_variants():
    # 16-bit depth: IHDR says depth=16 — stdlib subset must refuse,
    # flagging the Pillow path rather than mis-decoding
    png = bytearray(_make_png(4, 4, _gradient(48)))
    png[24] = 16  # depth byte inside IHDR
    with pytest.raises(ValueError, match="Pillow path"):
        mm.decode_png_stdlib(bytes(png))
    with pytest.raises(ValueError, match="signature"):
        mm.decode_png_stdlib(b"not a png at all")


def test_decode_image_real_png_end_to_end(spark):
    """The full Spark stage decodes crafted PNG bytes in this sandbox —
    no codec dependency — and NULLs genuinely-non-image payloads."""
    png_rgb = _make_png(20, 10, _gradient(600), color_type=2, filters=[0, 4])
    png_gray = _make_png(3, 3, _gradient(9), color_type=0)
    df = spark.createDataFrame(
        [
            (1, bytearray(png_rgb)),
            (2, bytearray(png_gray)),
            (3, bytearray(b"plain text, not an image")),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in mm.decode_image(df).collect()}
    assert (rows[1].width, rows[1].height, rows[1].mode) == (20, 10, "RGB")
    assert (rows[2].width, rows[2].height, rows[2].mode) == (3, 3, "L")
    assert rows[3].width is None and rows[3].mode is None


def test_decode_image_text_payloads_null_dims(spark):
    docs = tq.t(spark, SF_SMALL, "documents").limit(5)
    rows = mm.decode_image(mm.with_payload(docs)).collect()
    assert len(rows) == 5
    assert all(r.width is None and r.mode is None for r in rows)


def test_decode_image_missing_codec_fails_loudly(spark):
    if mm.pillow_available():
        pytest.skip("Pillow present: every known format decodes for real")
    jpeg_ish = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    df = spark.createDataFrame(
        [(1, bytearray(jpeg_ish))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="codec-enabled"):
        mm.decode_image(df).collect()


@pytest.mark.skipif(not mm.pillow_available(), reason="Pillow not installed")
def test_decode_png_stdlib_agrees_with_pillow():
    import io

    import PIL.Image

    png = _make_png(20, 10, _gradient(600), color_type=2, filters=[0, 1, 2, 3, 4])
    with PIL.Image.open(io.BytesIO(png)) as im:
        assert (im.width, im.height, im.mode) == (20, 10, "RGB")
        assert im.tobytes() == mm.decode_png_stdlib(png)[3]


def _make_wav(rate=16_000, channels=2, bits=16, n_frames=100, fmt_tag=1):
    """Minimal PCM WAV encoder (test-local)."""
    block = channels * bits // 8
    body = bytes(n_frames * block)
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, channels, rate, rate * block, block, bits
    )
    chunks = b"".join(
        [
            b"fmt " + struct.pack("<I", len(fmt)) + fmt,
            b"data" + struct.pack("<I", len(body)) + body,
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_stdlib_parses_real_header():
    assert mm.decode_wav_stdlib(_make_wav()) == (16_000, 2, 16, 100)
    assert mm.decode_wav_stdlib(
        _make_wav(rate=44_100, channels=1, bits=8, n_frames=7)
    ) == (44_100, 1, 8, 7)
    with pytest.raises(ValueError, match="RIFF"):
        mm.decode_wav_stdlib(b"not audio")
    with pytest.raises(ValueError, match="codec path"):
        mm.decode_wav_stdlib(_make_wav(fmt_tag=85))  # MP3-in-WAV


def test_audio_meta_end_to_end(spark):
    df = spark.createDataFrame(
        [
            (1, bytearray(_make_wav())),
            (2, bytearray(b"just some text bytes")),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in mm.audio_meta(df).collect()}
    assert (
        rows[1].sample_rate,
        rows[1].n_channels,
        rows[1].bits_per_sample,
        rows[1].n_frames,
    ) == (16_000, 2, 16, 100)
    assert rows[2].sample_rate is None


def test_audio_meta_compressed_fails_loudly(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"ID3\x04" + b"\x00" * 16))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="codec-enabled"):
        mm.audio_meta(df).collect()


def _make_bmp(width, height, rgb_rows, top_down=False):
    """Craft an uncompressed 24-bit BMP; rgb_rows is top-down row-major
    [(r,g,b), ...] of length width*height."""
    import struct

    stride = (width * 3 + 3) & ~3
    px = bytearray()
    row_order = range(height) if top_down else range(height - 1, -1, -1)
    for row in row_order:
        line = bytearray()
        for x in range(width):
            r, g, b = rgb_rows[row * width + x]
            line += bytes((b, g, r))
        line += b"\x00" * (stride - len(line))
        px += line
    h = height if not top_down else -height
    info = struct.pack("<IiiHHIIiiII", 40, width, h, 1, 24, 0,
                       len(px), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    return bytes(header + info + px)


def test_decode_bmp_stdlib_real_pixels():
    """Bottom-up and top-down BMPs decode to identical top-down RGB;
    row padding is stripped; variants gate on the Pillow path."""
    pixels = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
              (1, 2, 3), (4, 5, 6), (7, 8, 9)]  # 3x2 top-down
    for td in (False, True):
        w, h, mode, data = mm.decode_bmp_stdlib(_make_bmp(3, 2, pixels, td))
        assert (w, h, mode) == (3, 2, "RGB")
        got = [tuple(data[i:i + 3]) for i in range(0, len(data), 3)]
        assert got == pixels

    import pytest as _pytest

    with _pytest.raises(ValueError, match="Pillow path"):
        bad = bytearray(_make_bmp(3, 2, pixels))
        bad[28:30] = (32).to_bytes(2, "little")  # claim 32bpp
        mm.decode_bmp_stdlib(bytes(bad))
    with _pytest.raises(ValueError, match="truncated"):
        mm.decode_bmp_stdlib(_make_bmp(3, 2, pixels)[:-4])


def test_decode_image_real_bmp_end_to_end(spark):
    """The Spark decode stage reads real BMP bytes in this sandbox."""
    pixels = [(i, i, i) for i in range(12)]
    bmp = _make_bmp(4, 3, pixels)
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in mm.decode_image(df).collect()}
    assert (rows[1].width, rows[1].height, rows[1].mode) == (4, 3, "RGB")
    assert rows[2].width is None


def test_decode_image_corrupt_idat_yields_null_not_crash(spark):
    """A PNG with valid signature/IHDR but garbage IDAT bytes must emit
    a NULL-dims row (corrupt blob contract), never fail the batch —
    zlib.error is normalized to the ValueError corrupt path."""
    import struct
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0)
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
        )
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"\xde\xad\xbe\xef" * 4)  # not a zlib stream
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame(
        [(1, bytearray(bad))], "doc_id long, payload binary"
    )
    rows = mm.decode_image(df).collect()
    assert rows[0].width is None and rows[0].mode is None


def _wav16(rate, channels, samples_int16):
    """Craft a minimal RIFF/WAVE with one fmt + data chunk."""
    import struct

    body = b"".join(struct.pack("<h", s) for s in samples_int16)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_audio_energy_windows_known_signal(spark):
    """Silence then a half-scale square wave: per-window RMS is exactly
    [0.0, 0.5]; stereo mean-mixing halves an antiphase signal to 0;
    non-PCM16 payloads yield NULL rows, and partial windows drop."""
    from ad_data_pipelines_spark.operators import multimodal as mm

    rate = 8000
    win = rate * 25 // 1000  # 200 samples per 25 ms window
    mono = _wav16(rate, 1, [0] * win + [16384, -16384] * (win // 2) + [7] * 3)
    # stereo, channels in exact antiphase → mono mix is silence
    stereo_frames = []
    for _ in range(win):
        stereo_frames += [16384, -16384]
    stereo = _wav16(rate, 2, stereo_frames)
    docs = spark.createDataFrame(
        [(1, bytearray(mono)), (2, bytearray(stereo)),
         (3, bytearray(b"not audio at all"))],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r for r in mm.audio_energy(docs).collect()}
    assert rows[1].n_windows == 2  # the 3 trailing samples drop
    assert rows[1].energies == [0.0, 0.5]
    assert rows[2].n_windows == 1 and rows[2].energies == [0.0]
    assert rows[3].sample_rate is None and rows[3].energies is None


def test_audio_envelope_hash_level_invariant_and_pairing(spark):
    """The energy-envelope fingerprint: closed-form bits on an
    alternating quiet/loud square signal, EXACT INVARIANCE to a
    uniform level rescale (the near-dup property the hash exists
    for), a disjoint hash for the inverted envelope, NULLs for
    sub-2-window and non-PCM payloads, and banded pairing finding
    exactly the level-rescaled twin."""
    from pyspark.sql import functions as F

    from ad_data_pipelines_spark.operators import multimodal as mm

    rate = 8000
    win = rate * 25 // 1000  # 200 samples per window

    def envelope(amps):
        samples = []
        for a in amps:
            samples += [a, -a] * (win // 2)
        return _wav16(rate, 1, samples)

    # 61 windows alternating quiet/loud → bit_i = 1 for even i < 60
    amps = [0 if i % 2 == 0 else 16384 for i in range(61)]
    loud = envelope(amps)
    half = envelope([a // 2 for a in amps])          # same SHAPE
    inverted = envelope([16384 - a for a in amps])   # opposite shape
    short = envelope([16384])                        # 1 window
    docs = spark.createDataFrame(
        [(1, bytearray(loud)), (2, bytearray(half)),
         (3, bytearray(inverted)), (4, bytearray(short)),
         (5, bytearray(b"not audio"))],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r for r in mm.audio_envelope_hash(docs).collect()}
    want = sum(1 << i for i in range(0, 60, 2))
    assert rows[1].n_windows == 61 and rows[1].ahash == want
    assert rows[2].ahash == want  # level rescale → identical hash
    assert rows[3].ahash == sum(1 << i for i in range(1, 60, 2))
    assert rows[4].n_windows == 1 and rows[4].ahash is None
    assert rows[5].n_windows is None and rows[5].ahash is None

    hashes = mm.audio_envelope_hash(docs).select(
        "doc_id", F.col("ahash").alias("dhash")
    )
    pairs = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in mm.dhash_near_dup_pairs(hashes, max_hamming=3).collect()
    )
    assert pairs == [(1, 2, 0)]  # the rescaled twin; inverted is 60 away


def test_image_brightness_stats_known_pixels(spark):
    """Hand-constructed images: a half-black/half-white grayscale PNG
    gives mean 127.5, std 127.5, dark_frac 0.5; a solid mid-gray RGB
    image gives zero std; garbage payloads yield NULL rows."""
    from ad_data_pipelines_spark.operators import multimodal as mm

    half = _make_png(4, 4, [0] * 8 + [255] * 8, color_type=0)
    gray = _make_png(2, 2, [100, 100, 100] * 4, color_type=2)
    docs = spark.createDataFrame(
        [(1, bytearray(half)), (2, bytearray(gray)),
         (3, bytearray(b"nope"))],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r for r in mm.image_brightness_stats(docs).collect()}
    assert (rows[1].width, rows[1].height) == (4, 4)
    assert rows[1].mean_luma == 127.5
    assert rows[1].std_luma == 127.5
    assert rows[1].dark_frac == 0.5
    assert rows[2].mean_luma == 100.0 and rows[2].std_luma == 0.0
    assert rows[2].dark_frac == 0.0
    assert rows[3].mean_luma is None


def _mp4(duration, timescale, n_tracks, version=0):
    """Minimal ISO-BMFF: ftyp + moov(mvhd + n empty trak boxes)."""
    import struct

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    if version == 1:
        mvhd = (bytes([1]) + b"\x00" * 3 + b"\x00" * 16
                + struct.pack(">IQ", timescale, duration) + b"\x00" * 80)
    else:
        mvhd = (bytes([0]) + b"\x00" * 3 + b"\x00" * 8
                + struct.pack(">II", timescale, duration) + b"\x00" * 80)
    moov = box(b"mvhd", mvhd) + b"".join(
        box(b"trak", b"") for _ in range(n_tracks)
    )
    return box(b"ftyp", b"isom\x00\x00\x02\x00isom") + box(b"moov", moov)


def test_video_meta_parses_real_mp4_boxes(spark):
    """Crafted MP4 containers: version-0 and version-1 mvhd durations
    and track counts parse exactly; garbage payloads yield NULL rows."""
    from ad_data_pipelines_spark.operators import multimodal as mm

    v0 = _mp4(duration=90_000, timescale=600, n_tracks=2)
    v1 = _mp4(duration=48_000, timescale=1_000, n_tracks=1, version=1)
    docs = spark.createDataFrame(
        [(1, bytearray(v0)), (2, bytearray(v1)),
         (3, bytearray(b"definitely not a video"))],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r for r in mm.video_meta(docs).collect()}
    assert rows[1].duration_s == 150.0  # 90000/600
    assert rows[1].timescale == 600 and rows[1].n_tracks == 2
    assert rows[2].duration_s == 48.0 and rows[2].n_tracks == 1
    assert rows[3].duration_s is None


def test_media_near_dup_via_feature_cosine(spark):
    """Composition: byte-histogram features → L2 normalization →
    embedding-cosine near-dup — media dedup end-to-end with the
    existing stages. Payloads with matching byte distributions pair
    at sim≈1; a differently-distributed payload stays out."""
    from pyspark.sql import functions as F

    from ad_data_pipelines_spark.operators import multimodal as mm
    from ad_data_pipelines_spark.operators import similarity as sim

    # with_payload encodes `text`; matching character distributions
    # give matching byte histograms
    near_a = "abcdefgh" * 200
    near_b = "abcdefgh" * 200 + "a"  # one extra char
    far = "zzzzzzzz" * 200
    docs = spark.createDataFrame(
        [(1, near_a), (2, near_b), (3, far)],
        "doc_id bigint, text string",
    )
    feats = mm.byte_histogram_features(docs)
    norm = F.sqrt(
        F.aggregate(
            F.transform("features", lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    emb = feats.select(
        F.col("doc_id").alias("vec_id"),
        F.transform("features", lambda x: x / norm).alias("embedding"),
    )
    pairs = {
        (r.vec_a, r.vec_b): r.sim
        for r in sim.cosine_near_dup(emb, threshold=0.9).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] > 0.99


def test_image_dhash_and_near_dup_pairs(spark):
    """dHash: a one-pixel edit of a gradient image lands within 3
    Hamming bits of the original (banded candidate join finds the
    pair), an inverted gradient lands far away, and undecodable
    payloads yield NULL hashes that never pair. Python reference
    reproduces the exact hash."""
    import numpy as np

    w, h = 18, 16
    grad = [((x * 14 + y) % 256,) * 3 for y in range(h) for x in range(w)]
    near = list(grad)
    near[5 * w + 7] = tuple(min(255, c + 6) for c in near[5 * w + 7])
    inverted = [(255 - r, 255 - g, 255 - b) for r, g, b in grad]
    rows = [
        (0, bytearray(_make_bmp(w, h, grad))),
        (1, bytearray(_make_bmp(w, h, near))),
        (2, bytearray(_make_bmp(w, h, inverted))),
        (3, bytearray(b"not an image at all")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = mm.image_dhash(docs)
    got = {r.doc_id: r.dhash for r in hashes.collect()}
    assert got[3] is None
    assert got[0] is not None and got[2] is not None

    # Python reference of the same definition for the base image
    luma = np.array(
        [0.299 * r + 0.587 * g + 0.114 * b for r, g, b in grad]
    ).reshape(h, w)
    re_, ce = np.linspace(0, h, 9).astype(int), np.linspace(0, w, 10).astype(int)
    grid = np.array([
        [luma[re_[i]:max(re_[i+1], re_[i]+1),
              ce[j]:max(ce[j+1], ce[j]+1)].mean() for j in range(9)]
        for i in range(8)
    ])
    v = 0
    for bit in (grid[:, :-1] > grid[:, 1:]).flatten():
        v = (v << 1) | int(bit)
    if v >= 1 << 63:
        v -= 1 << 64
    assert got[0] == v

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(got[0], got[1]) <= 3       # near-identical
    assert ham(got[0], got[2]) > 10       # inverted = far

    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in mm.dhash_near_dup_pairs(hashes, max_hamming=3).collect()}
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] == ham(got[0], got[1])
