"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as `binary` columns with a
small typed header; Spark's job is the plumbing — schema, partitioning,
Arrow-batched kernels — while actual media decoding belongs to
specialized libs (not present in this container, so the *codec* step is
a deterministic fake format behind the same interface, and the real-lib
path raises NotImplementedError where Pillow/ffmpeg would plug in).

Kernels are `mapInPandas` batch iterators: one pandas batch in, one out,
no per-row Python at the Spark level (the per-row loop inside a batch is
over in-memory bytes, the same shape a real decoder takes).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd

FAKE_MAGIC = b"FAKM"
_HDR = struct.Struct("<4s3sBHHI")  # magic, kind, channels, width, height, n_frames
HDR_SIZE = _HDR.size


def pack_header(kind: str, channels: int, width: int, height: int, n_frames: int) -> bytes:
    return _HDR.pack(FAKE_MAGIC, kind.encode(), channels, width, height, n_frames)

MEDIA_SPARK_SCHEMA = "media_id long, kind string, payload binary"
FEATURES_SPARK_SCHEMA = (
    "media_id long, kind string, width int, height int, channels int, "
    "n_frames int, payload_bytes long, sha256 string"
)


def encode_fake_media(kind: str, media_id: int, width: int, height: int, n_frames: int = 1) -> bytes:
    """Deterministic fake media blob: typed header + seeded pixel bytes."""
    rng = np.random.default_rng(media_id)
    channels = {"img": 3, "aud": 1, "vid": 3}[kind]
    body = rng.integers(0, 256, width * height * channels * n_frames, dtype=np.uint8)
    return _HDR.pack(FAKE_MAGIC, kind.encode(), channels, width, height, n_frames) + body.tobytes()


def decode_header(payload: bytes) -> dict:
    """Sniff the payload magic and decode its typed header.

    Dispatch, most-capable first:
    * ``FAKM`` — the deterministic test fixture format (always available).
    * ``RIFF..WAVE`` — REAL decode via the stdlib ``wave`` module:
      kind='aud', channels=nchannels, width=framerate, height=sampwidth,
      n_frames=nframes (the audio field mapping).
    * PNG / JPEG — real decode via Pillow when importable (kind='img',
      n_frames=1); raises NotImplementedError otherwise, naming the
      missing library — the Spark plumbing (schema, batching, kernels)
      is identical either way.
    """
    if payload[:4] == FAKE_MAGIC:
        magic, kind, channels, width, height, n_frames = _HDR.unpack_from(payload, 0)
        return {
            "kind": kind.decode().rstrip("\x00"),
            "channels": channels,
            "width": width,
            "height": height,
            "n_frames": n_frames,
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            return {
                "kind": "aud",
                "channels": w.getnchannels(),
                "width": w.getframerate(),
                "height": w.getsampwidth(),
                "n_frames": w.getnframes(),
            }
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:3] == b"\xff\xd8\xff":
        try:
            import io

            from PIL import Image
        except ImportError:
            raise NotImplementedError(
                "PNG/JPEG decoding requires Pillow (not in this container); "
                "FAKM and WAV payloads remain decodable"
            )
        with Image.open(io.BytesIO(payload)) as im:
            return {
                "kind": "img",
                "channels": len(im.getbands()),
                "width": im.width,
                "height": im.height,
                "n_frames": getattr(im, "n_frames", 1),
            }
    raise NotImplementedError(
        "unrecognized media magic "
        f"{payload[:4]!r}; decodable formats: FAKM (fixture), WAV "
        "(stdlib), PNG/JPEG (with Pillow installed)"
    )


def synth_media_df(spark, n: int, seed: int = 42):
    """Deterministic media table as a Spark DataFrame."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["img", "aud", "vid"]
    for i in range(n):
        kind = kinds[int(rng.integers(3))]
        w, h = int(rng.integers(4, 64)), int(rng.integers(4, 64))
        frames = int(rng.integers(2, 9)) if kind == "vid" else 1
        rows.append((i, kind, encode_fake_media(kind, i, w, h, frames)))
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload"])
    return spark.createDataFrame(pdf, schema=MEDIA_SPARK_SCHEMA)


def extract_features(df):
    """Decode headers + content hash for every media row (batch kernel)."""

    def kernel(batches):
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                h = decode_header(b)
                out.append(
                    (
                        int(mid),
                        kind,
                        h["width"],
                        h["height"],
                        h["channels"],
                        h["n_frames"],
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "width", "height", "channels",
                    "n_frames", "payload_bytes", "sha256",
                ],
            )

    return df.mapInPandas(kernel, FEATURES_SPARK_SCHEMA)


def sample_frames(df, every_k: int = 2):
    """Frame sampling for video payloads: keep every k-th frame, rewrite
    the payload (a real pipeline would do exactly this around ffmpeg)."""

    def kernel(batches):
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                h = decode_header(b)
                if kind == "vid" and h["n_frames"] > 1:
                    frame_bytes = h["width"] * h["height"] * h["channels"]
                    body = np.frombuffer(b, np.uint8, offset=HDR_SIZE).reshape(
                        h["n_frames"], frame_bytes
                    )
                    kept = body[::every_k]
                    b = pack_header(
                        kind, h["channels"], h["width"], h["height"], kept.shape[0]
                    ) + kept.tobytes()
                ids.append(int(mid))
                kinds.append(kind)
                payloads.append(b)
            yield pd.DataFrame({"media_id": ids, "kind": kinds, "payload": payloads})

    return df.mapInPandas(kernel, MEDIA_SPARK_SCHEMA)


def resize_images(df, width: int, height: int):
    """Nearest-neighbor resize of image payloads (pure numpy — the FAKM
    pixel layout is dense HxWxC, so fancy-index row/col maps do the whole
    frame in two vectorized gathers; a real pipeline swaps this kernel
    body for Pillow without touching the Spark plumbing). Non-image rows
    pass through unchanged; every frame of a multi-frame payload is
    resized."""

    def kernel(batches):
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                if kind == "img" or kind == "vid":
                    h = decode_header(b)
                    c, w0, h0, nf = h["channels"], h["width"], h["height"], h["n_frames"]
                    frames = np.frombuffer(b, np.uint8, offset=HDR_SIZE).reshape(
                        nf, h0, w0, c
                    )
                    rows = (np.arange(height) * h0) // height
                    cols = (np.arange(width) * w0) // width
                    resized = frames[:, rows][:, :, cols]
                    b = pack_header(kind, c, width, height, nf) + resized.tobytes()
                ids.append(int(mid))
                kinds.append(kind)
                payloads.append(b)
            yield pd.DataFrame({"media_id": ids, "kind": kinds, "payload": payloads})

    return df.mapInPandas(kernel, MEDIA_SPARK_SCHEMA)
