"""Multimodal column handling (SURVEY §2.10 L6).

Design: media travels as an opaque ``binary`` payload column next to a
typed metadata struct; decode / feature-extract / resize / frame-sample
are Arrow kernels over ``mapInPandas`` so bytes never round-trip through
Python row objects. The decode internals are STUBBED (no image/audio
libs in this container): ``decode_media`` raises NotImplementedError for
real codecs and ships a clearly-marked deterministic fake so the
Spark-side plumbing — schema, batching, partitioning — is real and
testable end-to-end.
"""

from __future__ import annotations

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


def _find_codec(mime: str):
    """Soft-import the codec for a mime family: PIL for image/*,
    soundfile for audio/*. Returns a decode callable or None when the
    library is absent (this container ships neither — the stub path)."""
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
    """Real decode path: soft-imports the codec for the mime family
    (PIL → HxWxC uint8 array for image/*, soundfile → float samples
    for audio/*) and decodes when the library is installed — the
    production build just installs the dependency, no code change.
    Where codecs are absent (this container ships none) it raises
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

    return spread_for_kernel(media.select("doc_id", "payload")).mapInPandas(
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

    return spread_for_kernel(media.select("doc_id", payload_col)).mapInPandas(
        kernel, schema=schema
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

    return spread_for_kernel(media.select("doc_id", "payload")).mapInPandas(
        kernel, schema=ENERGY_SCHEMA
    )
