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


def _ppm_pixels(buf: bytes) -> tuple[np.ndarray, int]:
    """Parse a P6 payload into an (h, w, 3) uint8 array (+ n_frames)."""
    w, h, maxval, f = _parse_ppm(buf)
    if maxval != 255:
        raise ValueError("only 8-bit P6 supported")
    # pixel data = last w*h*3 bytes (header is ASCII, ends with single ws)
    data = np.frombuffer(buf, dtype=np.uint8)[-w * h * 3 :]
    return data.reshape(h, w, 3), f


class ImageResizeStage:
    """Actor-pool resize: REAL nearest-neighbor resampling of the decoded
    raster (pure numpy fancy-index gather), re-encoded as a valid P6
    payload.  `map_batches(ImageResizeStage, batch_size=32,
    fn_constructor_kwargs={"out_w": .., "out_h": ..})`."""

    def __init__(self, out_w: int = 16, out_h: int = 12):
        self.out_w = out_w
        self.out_h = out_h
        # precomputed per-actor: nothing heavy here, but the contract stands
        self._header = f"P6\n{out_w} {out_h}\n255\n".encode("ascii")

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["payload"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        out = []
        for v in col:
            px, _f = _ppm_pixels(v.as_py())
            h, w, _ = px.shape
            yi = (np.arange(self.out_h) * h) // self.out_h
            xi = (np.arange(self.out_w) * w) // self.out_w
            small = px[yi][:, xi]
            out.append(self._header + small.tobytes())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array(out, type=pa.large_binary()),
                "width": pa.array([self.out_w] * len(out), type=pa.int64()),
                "height": pa.array([self.out_h] * len(out), type=pa.int64()),
                "n_bytes": pa.array([len(b) for b in out], type=pa.int64()),
            }
        )


class ImageFeatureStage:
    """Actor-pool feature extraction over decoded rasters — REAL numpy
    kernels: per-channel means, luminance standard deviation, and edge
    density (mean |∇| of the luminance plane).  Engine-defined values →
    rows-only gate + numpy-reference pytest."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["payload"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        mr, mg, mb, lstd, edge = [], [], [], [], []
        for v in col:
            px, _f = _ppm_pixels(v.as_py())
            f64 = px.astype(np.float64)
            mr.append(f64[:, :, 0].mean())
            mg.append(f64[:, :, 1].mean())
            mb.append(f64[:, :, 2].mean())
            lum = f64 @ np.array([0.299, 0.587, 0.114])
            lstd.append(float(lum.std()))
            gy = np.abs(np.diff(lum, axis=0)).mean() if lum.shape[0] > 1 else 0.0
            gx = np.abs(np.diff(lum, axis=1)).mean() if lum.shape[1] > 1 else 0.0
            edge.append(float(gy + gx))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "mean_r": pa.array(np.round(mr, 6), type=pa.float64()),
                "mean_g": pa.array(np.round(mg, 6), type=pa.float64()),
                "mean_b": pa.array(np.round(mb, 6), type=pa.float64()),
                "lum_std": pa.array(np.round(lstd, 6), type=pa.float64()),
                "edge_density": pa.array(np.round(edge, 6), type=pa.float64()),
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
