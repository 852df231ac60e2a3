"""Multimodal column handling (SURVEY §2.10 L6).

Design: media travels as an opaque ``binary`` payload column next to a
typed metadata struct; decode / feature-extract / resize / frame-sample
are Arrow kernels over ``mapInPandas`` so bytes never round-trip through
Python row objects. ``decode_media`` has two REAL, dependency-free codec
paths that execute in this container — uncompressed 24-bit BMP (manual
header parse) and PCM WAV (stdlib ``wave``) — plus soft-imported
PIL/soundfile for the general image/audio families (absent here; the
production build installs the dependency, no code change). The
deterministic fakes (``extract_features`` / ``frame_sample`` /
``resize_media``) remain as decode-free stand-ins that keep the plumbing
testable for formats with no local codec.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def attach_binary_payload(docs: DataFrame, mime: str = "text/plain") -> DataFrame:
    """Build the multimodal layout from a text table: binary payload +
    metadata struct. For real media, the payload comes straight off the
    source (e.g. parquet BYTE_ARRAY of image bytes)."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"), F.length(payload).cast("bigint").alias("n_bytes")
        ).alias("meta"),
    )


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Serialize an (H, W, 3) uint8 RGB array as an uncompressed 24-bit
    BMP (BITMAPINFOHEADER, bottom-up rows, BGR byte order, rows padded
    to 4 bytes) — the inverse of ``_decode_bmp``, used by tests and the
    l30 registry query to manufacture real image payloads without any
    image library."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects an (H, W, 3) uint8 array")
    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    bgr = pixels[:, :, ::-1]
    data = b"".join(bgr[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1))
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Manual parse of an uncompressed 24-bit BMP → (H, W, 3) uint8 RGB
    array (same shape/order contract as PIL's ``np.asarray(Image.open)``
    so swapping in the soft-imported codec changes nothing downstream).
    Handles bottom-up (positive height) and top-down (negative height)
    row order and 4-byte row padding; refuses palettized/compressed
    variants rather than mis-decoding them."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    _hdr, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} unsupported")
    top_down = h < 0
    h = abs(h)
    row = w * 3
    stride = (row + 3) // 4 * 4
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) < data_off + stride * (h - 1) + row:
        raise ValueError("truncated BMP pixel data")
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        src = data_off + y * stride
        out[y if top_down else h - 1 - y] = buf[src : src + row].reshape(w, 3)[:, ::-1]
    return out


def encode_wav(samples: np.ndarray, framerate: int = 16000) -> bytes:
    """Serialize a 1-D int16 sample array as a mono PCM WAV via stdlib
    ``wave`` — the inverse of ``_decode_wav``."""
    import io
    import wave

    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_wav expects a 1-D int16 array")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return bio.getvalue()


def _decode_wav(payload: bytes) -> np.ndarray:
    """PCM WAV decode via stdlib ``wave`` → float64 samples in [-1, 1)
    (int16/32768, uint8 centered at 128 — soundfile's convention, so
    the soft-imported codec is a drop-in replacement). Mono → 1-D,
    multi-channel → (n_frames, n_channels)."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
        n, ch, sw = wf.getnframes(), wf.getnchannels(), wf.getsampwidth()
        raw = wf.readframes(n)
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} unsupported")
    return arr.reshape(-1, ch) if ch > 1 else arr


def _find_codec(mime: str):
    """Resolve the decode callable for a mime type. Exact dependency-free
    codecs first (BMP, WAV — always available); then soft-import PIL for
    image/*, soundfile for audio/*. Returns None when no codec exists in
    this environment (the stub path)."""
    mime_l = mime.lower()
    if mime_l == "image/bmp":
        return _decode_bmp
    if mime_l in ("audio/wav", "audio/x-wav", "audio/wave"):
        return _decode_wav
    family = mime.split("/", 1)[0]
    if family == "image":
        try:
            import io

            from PIL import Image  # type: ignore[import-not-found]

            return lambda payload: np.asarray(Image.open(io.BytesIO(payload)))
        except ImportError:
            return None
    if family == "audio":
        try:
            import io

            import soundfile  # type: ignore[import-not-found]

            return lambda payload: soundfile.read(io.BytesIO(payload))[0]
        except ImportError:
            return None
    return None


def decode_media(payload: bytes, mime: str) -> np.ndarray:
    """Real decode path. image/bmp and audio/wav decode here with zero
    dependencies (manual BMP parse, stdlib wave); other image/* and
    audio/* mimes soft-import PIL/soundfile (PIL → HxWxC uint8 array,
    soundfile → float samples) — the production build just installs
    the dependency, no code change. Where no codec exists it raises
    NotImplementedError; the deterministic fakes (extract_features /
    frame_sample / resize_media) keep the Spark-side plumbing testable
    either way."""
    codec = _find_codec(mime)
    if codec is None:
        raise NotImplementedError(
            f"no codec available for {mime!r} in this environment"
            " (install pillow/soundfile); use fake_decode_features"
        )
    return codec(bytes(payload))


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("feat0", T.IntegerType()),
        T.StructField("feat_mean", T.DoubleType()),
    ]
)


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    DETERMINISTIC FAKE standing in for decode+embed: feat0 = first
    payload byte, feat_mean = mean byte value rounded to 6 dp. The
    batching/schema/partitioning is exactly what a real CLIP/CNN
    featurizer uses — swap the body, keep the plan."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "byte_len": [], "feat0": [], "feat_mean": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                out["doc_id"].append(int(doc_id))
                out["byte_len"].append(len(buf))
                out["feat0"].append(int(buf[0]) if len(buf) else -1)
                out["feat_mean"].append(round(float(buf.mean()), 6) if len(buf) else 0.0)
            yield pd.DataFrame(out)

    from actuarial_reserve_modelling_spark.operators import spread_for_kernel

    return spread_for_kernel(media.select("doc_id", "payload"), bytes_per_task=262144).mapInPandas(
        kernel, schema=FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame/sample extraction pattern (video frame-sample analogue):
    1 payload row → N sampled 'frames'. Deterministic fake: one frame
    per every_n_bytes slice, id + first byte. Real impl replaces the
    slicer with a container demuxer; the explode-shaped output contract
    (one row per frame, frame_idx ordered) is the stable part."""
    frames = F.expr(
        f"transform(sequence(0, int(octet_length(payload) / {every_n_bytes})), "
        f"i -> named_struct('frame_idx', i, 'lead_byte', "
        f"coalesce(ascii(substring(cast(payload AS STRING), i * {every_n_bytes} + 1, 1)), -1)))"
    )
    return media.select("doc_id", F.explode(frames).alias("f")).select(
        "doc_id", F.col("f.frame_idx").alias("frame_idx"), F.col("f.lead_byte").alias("lead_byte")
    )

def resize_media(
    media: DataFrame, target_bytes: int = 16, payload_col: str = "payload"
) -> DataFrame:
    """Resize/thumbnail pattern: payload → fixed-size payload.

    DETERMINISTIC FAKE standing in for an image resize: stride-sample
    the byte stream down to exactly ``target_bytes`` (repeating the
    last byte when the source is shorter). The contract a real resizer
    keeps: output payload has fixed, known size regardless of input —
    which is what makes downstream batching (fixed-shape tensors)
    possible. Arrow kernel; bytes never become Python row objects.
    Output: (doc_id, payload: binary[target_bytes], orig_bytes)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("orig_bytes", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs, origs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(buf) == 0:
                    resized = np.zeros(target_bytes, dtype=np.uint8)
                else:
                    idx = np.minimum(
                        (np.arange(target_bytes) * len(buf)) // target_bytes,
                        len(buf) - 1,
                    )
                    resized = buf[idx]
                ids.append(int(doc_id))
                outs.append(resized.tobytes())
                origs.append(len(buf))
            yield pd.DataFrame({"doc_id": ids, "payload": outs, "orig_bytes": origs})

    from actuarial_reserve_modelling_spark.operators import spread_for_kernel

    return spread_for_kernel(media.select("doc_id", payload_col), bytes_per_task=262144).mapInPandas(
        kernel, schema=schema
    )

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("dims", T.ArrayType(T.IntegerType())),
        T.StructField("n_values", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


def decode_features(media: DataFrame) -> DataFrame:
    """REAL-decode feature extraction: each payload is decoded with the
    codec for its ``meta.mime`` (``decode_media`` — BMP/WAV always, the
    PIL/soundfile families when installed) and summarized as (doc_id,
    mime, dims, n_values, value_sum) with value_sum the UNROUNDED sum
    of decoded array values. For integer-backed codecs (uint8 pixels,
    int16/2^15 PCM floats) every addend and partial sum is an exactly
    representable dyadic rational, so value_sum is bit-exact in any
    summation order and hash-comparable against an oracle that computes
    the same sum from the payload construction — no float tolerance
    needed.

    Same Arrow ``mapInPandas`` shape as ``extract_features``: a real
    CLIP/CNN/fbank featurizer swaps the per-payload body, the plan —
    partition-spread scan, one Python stage, columnar out — stays."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "mime": [], "dims": [], "n_values": [], "value_sum": []}
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                mime = meta["mime"]
                arr = decode_media(bytes(payload), mime)
                out["doc_id"].append(int(doc_id))
                out["mime"].append(mime)
                out["dims"].append([int(d) for d in arr.shape])
                out["n_values"].append(int(arr.size))
                out["value_sum"].append(float(arr.sum()))
            yield pd.DataFrame(out)

    from actuarial_reserve_modelling_spark.operators import spread_for_kernel

    return spread_for_kernel(media.select("doc_id", "payload", "meta"), bytes_per_task=262144).mapInPandas(
        kernel, schema=DECODED_SCHEMA
    )


ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.DoubleType()),
    ]
)


def audio_frame_energy(media: DataFrame, frame_bytes: int = 64) -> DataFrame:
    """Audio analogue of frame_sample: split each payload into
    fixed-size frames and compute per-frame RMS energy — the shape of
    every windowed audio featurizer (VAD, loudness normalization,
    silence trimming). DETERMINISTIC FAKE decode: the byte stream IS
    the sample stream (uint8 PCM stand-in); a real build decodes the
    container first (decode_media) and keeps the same 1-row-per-frame
    aggregate contract. Arrow kernel, vectorized per batch: one
    reduceat over the concatenated frame boundaries, no per-sample
    Python."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, ns, en = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
                if len(buf) == 0:
                    continue
                n_frames = int(np.ceil(len(buf) / frame_bytes))
                bounds = np.arange(n_frames) * frame_bytes
                sums = np.add.reduceat(buf * buf, bounds)
                counts = np.diff(np.append(bounds, len(buf)))
                rms = np.sqrt(sums / counts)
                ids.extend([int(doc_id)] * n_frames)
                fidx.extend(range(n_frames))
                ns.extend(int(c) for c in counts)
                en.extend(round(float(r), 6) for r in rms)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": fidx, "n_samples": ns, "energy": en}
            )

    from actuarial_reserve_modelling_spark.operators import spread_for_kernel

    return spread_for_kernel(media.select("doc_id", "payload"), bytes_per_task=262144).mapInPandas(
        kernel, schema=ENERGY_SCHEMA
    )
