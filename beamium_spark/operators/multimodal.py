"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested — the actual media decode is STUBBED
(``NotImplementedError``) or replaced by a deterministic fake, since no
image/audio libraries exist in this container.

Pattern: metadata extraction is pure Catalyst (magic-byte sniffing via
substring on binary); decode/resize/frame-sample run as ``mapInPandas``
over batches of binary cells, emitting fixed-shape float arrays — exactly
the shape a torchvision/librosa-backed implementation drops into.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAGIC = {
    "ffd8ff": "jpeg",
    "89504e47": "png",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi containers
    "66747970": "mp4",  # at offset 4, handled below
    "3c68746d": "html",  # '<htm'
    "3c21646f": "html",  # '<!do'
}


def sniff_format(payload: Column) -> Column:
    """Magic-byte container sniff on the first bytes of a binary cell."""
    head = F.lower(F.hex(F.substring(payload, 1, 4)))
    head3 = F.substring(head, 1, 6)
    mp4_marker = F.lower(F.hex(F.substring(payload, 5, 4)))
    out = F.lit("unknown")
    for magic, fmt in _MAGIC.items():
        probe = head3 if len(magic) == 6 else head
        out = F.when(probe == magic, F.lit(fmt)).otherwise(out)
    out = F.when(mp4_marker == "66747970", F.lit("mp4")).otherwise(out)
    return F.when(F.length(payload) == 0, F.lit("empty")).otherwise(out)


def attach_metadata(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Add a typed ``media`` struct: byte size, container sniff, content
    digest — all JVM-side."""
    p = F.col(payload_col)
    return df.withColumn(
        "media",
        F.struct(
            F.coalesce(F.length(p), F.lit(0)).cast("long").alias("bytes"),
            sniff_format(p).alias("format"),
            F.sha2(F.coalesce(p, F.lit(b"")), 256).alias("sha256"),
        ),
    )


def decode_image(payload: bytes) -> "np.ndarray":  # pragma: no cover - stub
    """REAL decode is not available in this container (no PIL/cv2).
    Swap this function for ``PIL.Image.open`` in production."""
    raise NotImplementedError(
        "image decode requires PIL/opencv, not present in this environment"
    )


def fake_decode(payload: bytes, h: int = 8, w: int = 8, c: int = 3) -> np.ndarray:
    """Deterministic stand-in decoder: (h, w, c) float32 derived from the
    payload's sha256 — stable across runs/engines, exercises the exact
    batch shapes the real decoder would produce."""
    if not payload:
        return np.zeros((h, w, c), dtype=np.float32)
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.random((h, w, c), dtype=np.float32)


def sha_decode(payload: bytes, h: int = 8, w: int = 8, c: int = 1) -> np.ndarray:
    """Engine-neutral deterministic decoder: pixel bytes are chained
    sha256 digests of the payload (d1 = sha256(payload); d_{k+1} =
    sha256(hex(d_k)) — the chain stays in hex-string domain because
    SQL engines' sha256 is VARCHAR→hex), value = byte/256.

    byte/256 is EXACTLY representable in float32 (and double), so a SQL
    oracle recomputing the same bytes compares floats without rounding
    tolerance — this is the decoder the correctness gate routes
    :func:`extract_features` through to value-check the mapInPandas
    boundary end-to-end (fake_decode's PCG64 stream is not
    SQL-reproducible)."""
    n = h * w * c
    if not payload:
        return np.zeros((h, w, c), dtype=np.float32)
    data = payload if isinstance(payload, (bytes, bytearray)) else str(payload).encode()
    hexes: list[str] = []
    d = hashlib.sha256(data).hexdigest()
    while len(hexes) * 32 < n:
        hexes.append(d)
        d = hashlib.sha256(d.encode()).hexdigest()
    buf = bytes.fromhex("".join(hexes))[:n]
    arr = np.frombuffer(buf, dtype=np.uint8).astype(np.float32) / np.float32(256.0)
    return arr.reshape(h, w, c)


def extract_features(
    df: DataFrame,
    payload_col: str = "html",
    id_col: str = "url",
    h: int = 8,
    w: int = 8,
    use_real_decoder: bool = False,
    decoder=None,
) -> DataFrame:
    """binary column → fixed-shape feature vectors via mapInPandas.

    Output: (id, feat: array<float>, feat_norm: double). Batches stream
    through Arrow; per-batch numpy, no per-row Python beyond the decode
    call itself (which is the library boundary in production too).

    ``decoder`` overrides the decode callable (signature
    ``(payload, h, w) -> ndarray(h, w, c)``); default is
    :func:`fake_decode`, or :func:`decode_image` when
    ``use_real_decoder`` is set.
    """
    if decoder is None:
        decoder = decode_image if use_real_decoder else fake_decode

    def _extract(batches):
        for pdf in batches:
            feats = [
                decoder(p, h, w).mean(axis=2).ravel() if p is not None else
                np.zeros(h * w, dtype=np.float32)
                for p in pdf[payload_col]
            ]
            arr = np.stack(feats) if feats else np.zeros((0, h * w), dtype=np.float32)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "feat": list(arr.astype("float32")),
                    "feat_norm": np.sqrt((arr.astype("float64") ** 2).sum(axis=1)),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _extract, schema="id string, feat array<float>, feat_norm double"
    )


def frame_sample_plan(
    df: DataFrame, n_frames: int = 4, payload_col: str = "html", id_col: str = "url"
) -> DataFrame:
    """Video-style frame sampling plumbing: explode n evenly-spaced frame
    indices per payload (the decode itself is the stubbed boundary).
    Output partitioning stays on the id so per-media frames co-locate."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.coalesce(F.length(payload_col), F.lit(0)).alias("bytes"),
        )
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))))
        .withColumn(
            "byte_offset",
            (F.col("frame_idx") * F.col("bytes") / n_frames).cast("long"),
        )
        .repartition(F.col("id"))
    )
