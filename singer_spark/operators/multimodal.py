"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side contract — schema, Arrow-batched mapInPandas signatures,
partitioning behavior, batch shapes — is exactly what a production decoder
pipeline uses.  The kernels are REAL for the formats decodable with
stdlib + numpy alone (PPM/P6 images, RIFF/WAV PCM audio, and motion-PPM
"video" = concatenated P6 frames): decode, nearest-neighbor resize, frame
sampling, and mean-pooled features all operate on actual pixels/samples.
Compressed IMAGE formats (JPEG/PNG/...) decode through an import-gated
PIL path (`_pil_image`, same pattern as the Kafka rack fetcher's gate);
compressed VIDEO/AUDIO (MP4/MP3/WebM/...) through an import-gated pyav
path (`_av`) at the same dispatch points (`sample_frames`,
`audio_stats`).  Where the library is installed they work end-to-end;
where it isn't — this sandbox has neither — the dispatch raises the
clearly-marked NotImplementedError.  Float32 WAV (fmt=3) decodes with
numpy alone, no gate needed.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),   # image | audio | video
    StructField("content", BinaryType(), False),       # opaque payload
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("byte_len", IntegerType(), False),
    StructField("sha_prefix", StringType(), False),
    StructField("feature", ArrayType(FloatType()), False),  # pooled embedding
])

AUDIO_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("sample_rate", IntegerType(), False),
    StructField("n_samples", LongType(), False),
    StructField("duration_ms", IntegerType(), False),
    StructField("rms", FloatType(), False),
    StructField("peak", FloatType(), False),
])


# ---------------------------------------------------------------------------
# Pure-python codecs (no external libs): PPM (P6) and RIFF/WAV PCM16.
# ---------------------------------------------------------------------------
def _ppm_header(payload: bytes, pos: int = 0) -> tuple[int, int, int, int]:
    """Parse one P6 header starting at `pos` (whitespace- and
    comment-tolerant): returns (w, h, data_start, data_end) as offsets into
    `payload` — offset arithmetic only, so a frame whose DIMENSIONS line
    happens to contain '255' can't confuse the framing."""
    if payload[pos : pos + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos += 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    return w, h, pos, pos + w * h * 3


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6): 'P6' <w> <h> <maxval> raw RGB.
    Returns (w, h, uint8[h, w, 3])."""
    w, h, data_start, _ = _ppm_header(payload)
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=data_start)
    return w, h, arr.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def ppm_frame_lengths(payload: bytes) -> list[tuple[int, int]]:
    """Byte ranges of each frame in a motion-PPM stream (concatenated P6
    frames — the uncompressed 'video' container the tests use).  Header
    parsing works on offsets into the original buffer — no per-frame
    slicing, no substring search."""
    out, pos = [], 0
    while pos < len(payload):
        _, _, _, end = _ppm_header(payload, pos)
        out.append((pos, end))
        pos = end
    return out


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE with 16-bit PCM (fmt=1) or 32-bit float (fmt=3): walk
    the chunk list for fmt + data.  Returns (sample_rate, samples
    flattened across channels) — dtype int16 for PCM16, float32 for
    IEEE-float WAV (already in [-1, 1])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data, sample_dtype = 12, None, None, "<i2"
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, _ch, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt == 1 and bits == 16:
                sample_dtype = "<i2"
            elif fmt == 3 and bits == 32:
                sample_dtype = "<f4"
            else:
                raise ValueError("only PCM16 or float32 WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return rate, np.frombuffer(data, dtype=sample_dtype)


def encode_wav(samples: np.ndarray, sample_rate: int,
               float32: bool = False) -> bytes:
    if float32:
        data = samples.astype("<f4").tobytes()
        fmt = struct.pack("<HHIIHH", 3, 1, sample_rate, sample_rate * 4, 4, 32)
    else:
        data = samples.astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _unsupported(payload: bytes, op: str):
    magic = payload[:8].hex()
    raise NotImplementedError(
        f"{op}: payload (magic {magic}) is not a stdlib-decodable format; "
        "compressed image codecs work when Pillow is installed, and "
        "compressed video/audio when pyav is installed (both import-gated "
        "at this dispatch) — neither library is present here")


def _pil_image():
    """Import-gated Pillow (absent in this sandbox, present in most prod
    images): returns the PIL.Image module or None.  Gate pattern matches
    the Kafka leader-rack fetcher — optional capability, hard fallback."""
    try:
        from PIL import Image

        return Image
    except Exception:
        return None


def _av():
    """Import-gated pyav (ffmpeg bindings — absent in this sandbox,
    common in prod decode images): returns the `av` module or None.
    Same optional-capability/hard-fallback pattern as `_pil_image`."""
    try:
        import av

        return av
    except Exception:
        return None


def _av_sample_frames(av, payload: bytes, every_n: int):
    """Decode a compressed video payload with pyav and yield every
    `every_n`-th frame as (width, height, ppm_bytes)."""
    import io

    with av.open(io.BytesIO(payload)) as container:
        for idx, frame in enumerate(container.decode(video=0)):
            if idx % every_n:
                continue
            arr = frame.to_ndarray(format="rgb24")
            h, w = arr.shape[:2]
            yield w, h, encode_ppm(arr)


def _av_audio_samples(av, payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a compressed audio payload with pyav: (sample_rate,
    float64 samples flattened across channels, normalized to [-1, 1])."""
    import io

    chunks = []
    rate = None
    with av.open(io.BytesIO(payload)) as container:
        if not container.streams.audio:
            # e.g. a video-only MP4 mis-tagged as audio: surface the
            # marked dispatch error, not a bare IndexError from deep
            # inside an executor
            _unsupported(payload, "audio_stats (no audio stream)")
        stream = container.streams.audio[0]
        rate = int(stream.rate)
        for frame in container.decode(audio=0):
            arr = frame.to_ndarray()  # (channels, n) — dtype per codec
            if np.issubdtype(arr.dtype, np.integer):
                info = np.iinfo(arr.dtype)
                half = float(info.max + 1) / 2 if info.min == 0 \
                    else float(info.max + 1)
                # unsigned formats (u8/u8p) center on (max+1)/2: silence
                # is 128, not 0 — subtract before scaling so rms/peak
                # measure signal, not DC offset
                offset = half if info.min == 0 else 0.0
                arr = (arr.astype(np.float64) - offset) / half
            # interleave channels like decode_wav's flattened layout
            chunks.append(arr.astype(np.float64).T.reshape(-1))
    samples = np.concatenate(chunks) if chunks else np.zeros(0)
    return rate, samples


def decode_image(payload: bytes, op: str = "decode_image") -> tuple[int, int, np.ndarray]:
    """(width, height, HxWx3 uint8 RGB) for any decodable still image:
    PPM/P6 via the stdlib kernel, JPEG/PNG/... via Pillow when importable;
    otherwise the marked NotImplementedError."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    Image = _pil_image()
    if Image is not None:
        import io

        try:
            with Image.open(io.BytesIO(payload)) as im:
                rgb = im.convert("RGB")
                arr = np.asarray(rgb, dtype=np.uint8)
                return rgb.width, rgb.height, arr
        except NotImplementedError:
            raise
        except Exception:
            pass  # PIL present but payload isn't an image it recognizes
    _unsupported(payload, op)


# ---------------------------------------------------------------------------
# DataFrame-level operators (Arrow-batched mapInPandas kernels).
# ---------------------------------------------------------------------------
def documents_as_media(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    binary plumbing is exercised against real test tables."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.col(text_col).cast("binary").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _fallback_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Content-hash feature for payloads no decoder claims — deterministic
    across executors/retries (tests pin this), so unknown blobs still get a
    stable fingerprint vector instead of poisoning the batch."""
    digest = hashlib.md5(payload).digest()
    vals = struct.unpack(">4I", digest)
    return [round((vals[i % 4] % 1000) / 1000.0 + i * 0.001, 6) for i in range(dim)]


def _pool_image_feature(arr: np.ndarray, dim: int) -> list[float]:
    """Mean-pool the decoded image onto a dim-length vector: grayscale grid
    pooling over a g×g tiling (g² ≥ dim), row-major."""
    g = int(np.ceil(np.sqrt(dim)))
    gray = arr.mean(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, g + 1, dtype=int)
    xs = np.linspace(0, w, g + 1, dtype=int)
    vals = []
    for i in range(g):
        for j in range(g):
            cell = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                        xs[j]:max(xs[j + 1], xs[j] + 1)]
            vals.append(float(round(cell.mean() / 255.0, 6)))
    return vals[:dim]


def extract_image_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: PPM payloads
    decode to pixels and mean-pool; anything else gets the deterministic
    content-hash vector.

    mapInPandas receives whole Arrow batches (not rows); at scale the input
    should be repartitioned so one batch ≈ one GPU/decoder-friendly chunk —
    callers control that with `media.repartition(n)` before this."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                b = bytes(payload)
                try:
                    _, _, arr = decode_image(b, "extract_image_features")
                    feat = _pool_image_feature(arr, dim)
                except (NotImplementedError, ValueError, struct.error, IndexError):
                    feat = _fallback_feature(b, dim)  # undecodable → stable hash
                rows.append((int(mid), len(b), hashlib.sha256(b).hexdigest()[:16], feat))
            yield pd.DataFrame(rows, columns=["media_id", "byte_len", "sha_prefix", "feature"])

    return media.mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize — REAL for PPM payloads and (when Pillow is
    importable) JPEG/PNG: numpy index gather over the decoded pixels,
    re-encoded as PPM with updated metadata (decoded compressed inputs are
    emitted as raw PPM — the downstream kernels all read it); formats no
    decoder claims raise at the dispatch (see `_unsupported`)."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                b = bytes(r.content)
                w, h, arr = decode_image(b, "resize_images")
                ys = (np.arange(height) * h // height)
                xs = (np.arange(width) * w // width)
                out = arr[ys][:, xs]
                rows.append((int(r.media_id), r.media_type, encode_ppm(out),
                             "image/x-portable-pixmap", width, height, None))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.mapInPandas(gen, MEDIA_SCHEMA)


# backwards-compat name: the resize entry point used to be a declared stub
resize_stub = resize_images


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling: keep every `every_n`-th frame, one output row per
    kept frame (media_id preserved; width/height from the frame header).
    REAL for motion-PPM streams (concatenated P6 frames) with stdlib
    alone, and for compressed video (MP4/WebM/...) where pyav is
    importable — decoded frames re-encode as PPM so every downstream
    kernel reads them unchanged."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                b = bytes(r.content)
                if b[:2] == b"P6":
                    for idx, (s, e) in enumerate(ppm_frame_lengths(b)):
                        if idx % every_n:
                            continue
                        frame = b[s:e]
                        w, h, _ = decode_ppm(frame)
                        rows.append((int(r.media_id), "image", frame,
                                     "image/x-portable-pixmap", w, h, None))
                    continue
                av = _av()
                if av is None:
                    _unsupported(b, "sample_frames")
                for w, h, frame in _av_sample_frames(av, b, every_n):
                    rows.append((int(r.media_id), "image", frame,
                                 "image/x-portable-pixmap", w, h, None))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.mapInPandas(gen, MEDIA_SCHEMA)


frame_sample_stub = sample_frames


def audio_stats(media: DataFrame) -> DataFrame:
    """WAV PCM decode → per-clip sample rate, duration, RMS and peak level
    (normalized to [0, 1]) — the audio-quality gate of a training-data
    pipeline, Arrow-batched like the image kernels."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                b = bytes(payload)
                if b[:4] == b"RIFF":
                    rate, samples = decode_wav(b)
                    # PCM16 normalizes by 2^15; float WAV is already [-1,1]
                    x = (samples.astype(np.float64) / 32768.0
                         if samples.dtype == np.int16
                         else samples.astype(np.float64))
                else:
                    av = _av()
                    if av is None:
                        _unsupported(b, "audio_stats")
                    rate, x = _av_audio_samples(av, b)
                rows.append((int(mid), rate, len(x),
                             int(len(x) * 1000 / rate),
                             float(round(np.sqrt((x ** 2).mean()), 6)) if len(x) else 0.0,
                             float(round(np.abs(x).max(), 6)) if len(x) else 0.0))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return media.mapInPandas(gen, AUDIO_SCHEMA)


def image_phash(media: DataFrame, bits: int = 60) -> DataFrame:
    """Perceptual average-hash (aHash, public recipe) per image: decode PPM
    → grayscale → pool onto an 8×8 grid → bit i = cell_i > grid mean,
    truncated to `bits` (60 keeps the signature positive in a signed BIGINT
    and reuses the text-SimHash block layout).  Near-identical images
    (re-encodes, small edits, slight noise) land within a few bits;
    non-PPM payloads fall back to content-hash bits — exact-dup-only
    semantics for formats this container can't decode.

    Output: (media_id, phash) — feed to
    :func:`~singer_spark.operators.dedup.signature_near_dup_pairs`."""
    import pandas as pd

    if not 1 <= bits <= 62:
        raise ValueError("bits must be in [1, 62] to fit a signed bigint")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                b = bytes(payload)
                sig = None
                try:
                    vals = np.array(_pool_image_feature(
                        decode_image(b, "image_phash")[2], 64))
                except (NotImplementedError, ValueError, struct.error, IndexError):
                    pass  # undecodable → stable content-hash signature
                else:
                    sig = 0
                    mean = float(vals.mean())
                    for i in range(bits):
                        if vals[i] > mean:
                            sig |= 1 << i
                if sig is None:
                    sig = int.from_bytes(hashlib.md5(b).digest()[:8], "big")
                    sig &= (1 << bits) - 1
                rows.append((int(mid), sig))
            yield pd.DataFrame(rows, columns=["media_id", "phash"])

    return media.mapInPandas(gen, "media_id bigint, phash bigint")


def image_near_dup_pairs(media: DataFrame, max_hamming: int = 6,
                         bits: int = 60) -> DataFrame:
    """Image near-duplicate pairs: perceptual hashes through the SAME
    multi-index pigeonhole join the text SimHash uses
    (`dedup.signature_near_dup_pairs`) — blocking on pair-of-block keys,
    popcount verify, bucket guard.  The 100 TB shape is identical: one
    narrow decode+hash pass, then only (id, 8-byte sig, block keys)
    shuffle — pixels never leave the scan.

    Output: (id_a, id_b, hamming)."""
    from singer_spark.operators.dedup import signature_near_dup_pairs

    sigs = image_phash(media, bits).select(
        F.col("media_id").alias("id"), F.col("phash").alias("sig"))
    return signature_near_dup_pairs(sigs, max_hamming=max_hamming, bits=bits)


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata over opaque payloads — JVM-side only (no decode):
    byte length + md5, the minimum viable audit columns for a media lake."""
    return media.select(
        "media_id", "media_type",
        F.length("content").cast("int").alias("byte_len"),
        F.md5("content").alias("content_md5"),
    )
