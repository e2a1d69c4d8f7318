"""Multimodal column plumbing (driver instructions).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages (small
``batch_size`` — payload rows are large; per-actor setup in ``__init__``;
Arrow-native outputs).

The decode kernels are REAL for the two formats a pure-Python parser can
handle byte-for-byte:

* :class:`ImageDecodeStage` — Netpbm **P6 (PPM)**: parses magic, comment
  lines (a ``# frames=N`` comment carries the synthetic frame count),
  dimensions and maxval from the actual payload bytes.
* :class:`AudioDecodeStage` — **RIFF/WAVE**: walks the chunk list, reads
  the ``fmt `` block (rate/channels/bits) and sizes the ``data`` chunk.

Formats that need an external codec (JPEG/PNG/H.264…) are STUBBED behind a
clearly-marked ``NotImplementedError`` (``codec="jpeg"``) — the container
has no imaging libs — but the Ray-side plumbing they share is real and
tested.

``attach_payload_batch`` / ``attach_audio_batch`` synthesize REAL
deterministic payloads (valid P6 / WAV files whose geometry derives from
the text length), so the decode stages exercise true byte parsing and the
SQL oracles can mirror the geometry arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# synthetic geometry: small dims keep a batch of payloads ≪ worker heap
IMG_W_MOD, IMG_H_MOD, FRAMES_MOD = 64, 48, 30
WAV_SAMPLES_MOD, WAV_RATE_BASE, WAV_RATE_MOD = 500, 8000, 8


def _ppm_bytes(text: str) -> bytes:
    """A valid P6 image: ``P6\\n# frames=F\\nW H\\n255\\n`` + W·H·3 pixel
    bytes (text bytes tiled).  Geometry is a pure function of rune count."""
    n = len(text)
    w, h, f = n % IMG_W_MOD + 1, n % IMG_H_MOD + 1, n % FRAMES_MOD + 1
    header = f"P6\n# frames={f}\n{w} {h}\n255\n".encode("ascii")
    npx = w * h * 3
    src = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    pixels = np.resize(src, npx) if len(src) else np.zeros(npx, dtype=np.uint8)
    return header + pixels.tobytes()


def attach_payload_batch(batch: pa.Table) -> pa.Table:
    payload = pa.array([_ppm_bytes(t) for t in batch["text"].to_pylist()], type=pa.large_binary())
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": payload,
            "media_type": pa.array(["image/x-portable-pixmap"] * len(batch), type=pa.string()),
        }
    )


def _parse_ppm(buf: bytes) -> tuple[int, int, int, int]:
    """Parse a P6 header from raw bytes → (width, height, maxval, n_frames).
    Real parsing: magic check, ``#`` comment skipping (``# frames=N``
    recognized), whitespace-separated dimension tokens."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    vals: list[int] = []
    n_frames = 1
    while len(vals) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":
            end = buf.find(b"\n", pos)
            comment = buf[pos + 1 : end if end >= 0 else len(buf)].strip()
            if comment.startswith(b"frames="):
                n_frames = int(comment[7:])
            pos = (end if end >= 0 else len(buf)) + 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated P6 header")
        vals.append(int(buf[start:pos]))
    return vals[0], vals[1], vals[2], n_frames


class ImageDecodeStage:
    """Actor-pool decode stage over binary payloads.

    ``codec="ppm"`` (default) is a REAL parser over the payload bytes;
    ``codec="jpeg"`` (or any other) marks the deliberate stub — external
    imaging libs are absent from this container.  Real deployments:
    ``map_batches(ImageDecodeStage, batch_size=32, concurrency=(2, 8))``.
    """

    def __init__(self, codec: str = "ppm", fake: bool | None = None):
        # back-compat shim: fake=True → the old pseudo-decode (size-derived),
        # fake=False historically raised; the real default is the PPM parser
        self.codec = "pseudo" if fake else codec
        if self.codec not in ("ppm", "pseudo"):
            raise NotImplementedError(
                f"codec {codec!r} requires an imaging library not present in "
                "this container; supported here: 'ppm' (real parser)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        n_bytes = pc.binary_length(payload).to_numpy(zero_copy_only=False).astype(np.int64)
        if self.codec == "pseudo":
            width = n_bytes % 640 + 1
            height = n_bytes % 480 + 1
            n_frames = n_bytes % 30 + 1
        else:
            width = np.empty(len(batch), dtype=np.int64)
            height = np.empty(len(batch), dtype=np.int64)
            n_frames = np.empty(len(batch), dtype=np.int64)
            col = payload.combine_chunks() if isinstance(payload, pa.ChunkedArray) else payload
            for i, v in enumerate(col):
                w, h, _maxval, f = _parse_ppm(v.as_py())
                width[i], height[i], n_frames[i] = w, h, f
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "width": pa.array(width, type=pa.int64()),
                "height": pa.array(height, type=pa.int64()),
                "n_frames": pa.array(n_frames, type=pa.int64()),
            }
        )


class FrameSampleStage:
    """Frame sampling: one output row per sampled frame ordinal (every
    ``stride``-th frame).  The frame count comes from the REAL payload
    header (``# frames=N``), not from external metadata."""

    def __init__(self, stride: int = 10):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        payload = batch["payload"]
        col = payload.combine_chunks() if isinstance(payload, pa.ChunkedArray) else payload
        n_frames = np.array([_parse_ppm(v.as_py())[3] for v in col], dtype=np.int64)
        sampled = (n_frames + self.stride - 1) // self.stride
        out_doc = np.repeat(doc_ids, sampled)
        frame_idx = (
            np.arange(int(sampled.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(sampled) - sampled, sampled)
        ) * self.stride
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
# audio: RIFF/WAVE
# ---------------------------------------------------------------------------


def _wav_bytes(text: str) -> bytes:
    """A valid 16-bit mono RIFF/WAVE file; rate and sample count derive from
    the rune count, samples from the text bytes (tiled)."""
    n = len(text)
    rate = WAV_RATE_BASE + (n % WAV_RATE_MOD) * 1000
    n_samples = n % WAV_SAMPLES_MOD + 1
    src = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    samples = (np.resize(src, n_samples).astype(np.int16) - 128) * 256 if len(src) else np.zeros(
        n_samples, dtype=np.int16
    )
    data = samples.astype("<i2").tobytes()
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack(
        "<I", len(data)
    ) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def _parse_wav(buf: bytes) -> tuple[int, int, int, int]:
    """Walk the RIFF chunk list → (sample_rate, channels, bits, n_samples)."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = bits = block_align = data_size = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            _fmt, channels, rate, _brate, block_align, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, bits, data_size // block_align


def attach_audio_batch(batch: pa.Table) -> pa.Table:
    payload = pa.array([_wav_bytes(t) for t in batch["text"].to_pylist()], type=pa.large_binary())
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": payload,
            "media_type": pa.array(["audio/wav"] * len(batch), type=pa.string()),
        }
    )


class AudioDecodeStage:
    """Actor-pool WAV header decode: real RIFF chunk walking per payload."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        col = payload.combine_chunks() if isinstance(payload, pa.ChunkedArray) else payload
        n = len(batch)
        rate = np.empty(n, dtype=np.int64)
        n_samples = np.empty(n, dtype=np.int64)
        channels = np.empty(n, dtype=np.int64)
        for i, v in enumerate(col):
            r, c, _b, s = _parse_wav(v.as_py())
            rate[i], channels[i], n_samples[i] = r, c, s
        duration_us = n_samples * 1_000_000 // rate
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sample_rate": pa.array(rate, type=pa.int64()),
                "channels": pa.array(channels, type=pa.int64()),
                "n_samples": pa.array(n_samples, type=pa.int64()),
                "duration_us": pa.array(duration_us, type=pa.int64()),
            }
        )
