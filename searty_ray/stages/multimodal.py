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

from ..functions.hashing import gather_padded
from .encode_stage import _binary_offsets, _binary_values

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


_HDR_WIDTH = 96  # canonical P6 headers fit well inside this prefix


def _parse_int_fields(mat: np.ndarray, s: np.ndarray, e: np.ndarray) -> np.ndarray:
    """ASCII decimal fields mat[i, s[i]:e[i]] → int64, all rows at once
    (one masked pass per digit column, like the hash kernels)."""
    v = np.zeros(len(s), dtype=np.int64)
    width = int((e - s).max()) if len(s) else 0
    for j in range(width):
        m = s + j < e
        v[m] = v[m] * 10 + (mat[m, (s + j)[m]].astype(np.int64) - 48)
    return v


def _digit_fields_ok(mat: np.ndarray, s: np.ndarray, e: np.ndarray) -> np.ndarray:
    """True where mat[i, s[i]:e[i]] is a NON-EMPTY run of ASCII digits —
    guards the canonical fast path against headers it would misparse (e.g.
    a double space would feed 0x20 into the digit arithmetic)."""
    n = len(s)
    ok = e > s
    rows = np.arange(n)
    width = int((e - s).max()) if n else 0
    for j in range(width):
        m = s + j < e
        b = mat[rows[m], (s + j)[m]]
        bad = (b < 48) | (b > 57)
        ok[rows[m][bad]] = False
    return ok


def _parse_ppm_batch(col: pa.Array) -> tuple[np.ndarray, ...]:
    """Batched P6 header parse over a binary column, ZERO-COPY.

    The payload bytes stay in the Arrow values buffer (no per-row
    ``as_py()`` copies); the canonical synthetic header layout
    (``P6\\n# frames=F\\nW H\\n255\\n`` — fixed-shape ASCII) is parsed fully
    vectorized from one (n × 96) gathered prefix matrix: newline/space
    positions via cumsum+argmax, integer fields via one masked pass per
    digit.  Rows that don't match the canonical shape (extra comments,
    other whitespace) fall back to the scalar :func:`_parse_ppm` scanner.

    → (width, height, maxval, n_frames, px_start, buf) where ``buf`` is the
    shared uint8 view and ``px_start`` the per-row pixel-data offset.
    """
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buf = np.frombuffer(_binary_values(col), dtype=np.uint8)
    offs = _binary_offsets(col).astype(np.int64)
    n = len(col)
    lens = np.diff(offs)
    take = np.minimum(lens, _HDR_WIDTH)
    mat = gather_padded(buf, offs[:-1], take, _HDR_WIDTH)

    cols = np.arange(_HDR_WIDTH)
    nlc = np.cumsum(mat == 10, axis=1)
    nl1 = np.argmax(nlc == 1, axis=1)  # after "P6"
    nl2 = np.argmax(nlc == 2, axis=1)  # after comment
    nl3 = np.argmax(nlc == 3, axis=1)  # after "W H"
    nl4 = np.argmax(nlc == 4, axis=1)  # after maxval
    prefix = np.frombuffer(b"P6\n# frames=", dtype=np.uint8)
    canonical = (
        (mat[:, : len(prefix)] == prefix).all(axis=1)
        & (nl4 > nl3) & (nl3 > nl2) & (nl2 > nl1) & (nl1 == 2)
    )
    w = np.empty(n, dtype=np.int64)
    h = np.empty(n, dtype=np.int64)
    maxval = np.empty(n, dtype=np.int64)
    frames = np.empty(n, dtype=np.int64)
    px_start = np.empty(n, dtype=np.int64)
    if canonical.any():
        c = np.flatnonzero(canonical)
        mc = mat[c]
        sp = np.argmax((mc == 32) & (cols > nl2[c, None]) & (cols < nl3[c, None]), axis=1)
        # fields must be non-empty digit runs with exactly one separating
        # space, or the row is demoted to the scalar fallback parser
        good = (sp > nl2[c]) & (sp + 1 < nl3[c])
        good &= _digit_fields_ok(mc, np.full(len(c), len(prefix)), nl2[c])
        good &= _digit_fields_ok(mc, nl2[c] + 1, sp)
        good &= _digit_fields_ok(mc, sp + 1, nl3[c])
        good &= _digit_fields_ok(mc, nl3[c] + 1, nl4[c])
        canonical[c[~good]] = False
        c, mc, sp = c[good], mc[good], sp[good]
        frames[c] = _parse_int_fields(mc, np.full(len(c), len(prefix)), nl2[c])
        w[c] = _parse_int_fields(mc, nl2[c] + 1, sp)
        h[c] = _parse_int_fields(mc, sp + 1, nl3[c])
        maxval[c] = _parse_int_fields(mc, nl3[c] + 1, nl4[c])
        px_start[c] = offs[:-1][c] + nl4[c] + 1
    for i in np.flatnonzero(~canonical):
        raw = bytes(buf[offs[i] : offs[i + 1]])
        w[i], h[i], maxval[i], frames[i] = _parse_ppm(raw)
        px_start[i] = offs[i + 1] - w[i] * h[i] * 3
    return w, h, maxval, frames, px_start, buf


class ImageDecodeStage:
    """Actor-pool decode stage over binary payloads.

    ``codec="ppm"`` (default) is a REAL parser over the payload bytes —
    batched (:func:`_parse_ppm_batch`), zero-copy from the Arrow buffer;
    ``codec="jpeg"`` (or any other) marks the deliberate stub — external
    imaging libs are absent from this container.  PRODUCTION SWAP POINT:
    for JPEG/PNG/H.264-class formats, replace the parse call inside
    ``__call__`` with a C codec (libjpeg-turbo / ffmpeg bindings); the
    actor-pool plumbing, schema and batch sizing stay as-is.  Real
    deployments: ``map_batches(ImageDecodeStage, batch_size=32,
    concurrency=(2, 8))``.
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
            width, height, _maxval, n_frames, _ps, _buf = _parse_ppm_batch(payload)
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
        n_frames = _parse_ppm_batch(batch["payload"])[3]
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
        w, h, mx, _f, ps, buf = _parse_ppm_batch(batch["payload"])
        if len(w) and (mx != 255).any():
            raise ValueError("only 8-bit P6 supported")
        out = []
        for i in range(len(w)):
            # zero-copy raster view into the Arrow buffer; the gather is the
            # only per-image numpy work (shapes differ row to row)
            px = buf[ps[i] : ps[i] + w[i] * h[i] * 3].reshape(h[i], w[i], 3)
            yi = (np.arange(self.out_h) * h[i]) // self.out_h
            xi = (np.arange(self.out_w) * w[i]) // self.out_w
            out.append(self._header + px[yi][:, xi].tobytes())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array(out, type=pa.large_binary()),
                "width": pa.array([self.out_w] * len(out), type=pa.int64()),
                "height": pa.array([self.out_h] * len(out), type=pa.int64()),
                "n_bytes": pa.array([len(b) for b in out], type=pa.int64()),
            }
        )


_LUM_W = np.array([299, 587, 114], dtype=np.int64)  # ITU-R 601 milli-weights


class ImageFeatureStage:
    """Actor-pool feature extraction over decoded rasters — REAL numpy
    kernels: per-channel means, luminance standard deviation, and edge
    density (mean |∇| of the luminance plane).

    INTEGER-DERIVED (r4 verdict item 3 — the ``idf_micro`` house pattern):
    luminance uses milli-weights L1000 = 299r + 587g + 114b, so every
    aggregate is an exact int64 sum (S1 = ΣL, S2 = ΣL², channel sums,
    |∇L| sums) and the only float steps are the FINAL expressions —
    mirrored token-for-token in the SQL oracle:

      mean_c   = round6(sum_c / n_px)
      lum_std  = round6(sqrt(n_px·S2 − S1²) / (n_px · 1000.0))
      edge     = round6(Σ|ΔyL| / ((h−1)·w·1000.0) + Σ|ΔxL| / (h·(w−1)·1000.0))

    int64 bounds: L ≤ 255 000; S2 ≤ n_px·L² ≤ 3072·6.5e10 ≈ 2e14;
    n_px·S2 and S1² ≤ ~6.2e17 < 2⁶³ (exact in DuckDB HUGEINT too; the
    int→double cast at the sqrt rounds identically on both sides)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math

        from ..functions.words import round6

        w, h, _mx, _f, ps, buf = _parse_ppm_batch(batch["payload"])
        mr, mg, mb, lstd, edge = [], [], [], [], []
        for i in range(len(w)):
            px = buf[ps[i] : ps[i] + w[i] * h[i] * 3].reshape(h[i], w[i], 3)
            px = px.astype(np.int64)
            n_px = int(w[i]) * int(h[i])
            sums = px.reshape(-1, 3).sum(axis=0)
            mr.append(round6(int(sums[0]) / n_px))
            mg.append(round6(int(sums[1]) / n_px))
            mb.append(round6(int(sums[2]) / n_px))
            l1000 = px @ _LUM_W  # (h, w) int64, ≤ 255 000
            s1, s2 = int(l1000.sum()), int((l1000 * l1000).sum())
            var_num = n_px * s2 - s1 * s1  # exact python int
            lstd.append(round6(math.sqrt(float(var_num)) / (n_px * 1000.0)))
            gy = (
                int(np.abs(np.diff(l1000, axis=0)).sum()) / ((h[i] - 1) * w[i] * 1000.0)
                if h[i] > 1
                else 0.0
            )
            gx = (
                int(np.abs(np.diff(l1000, axis=1)).sum()) / (h[i] * (w[i] - 1) * 1000.0)
                if w[i] > 1
                else 0.0
            )
            edge.append(round6(gy + gx))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "mean_r": pa.array(mr, type=pa.float64()),
                "mean_g": pa.array(mg, type=pa.float64()),
                "mean_b": pa.array(mb, type=pa.float64()),
                "lum_std": pa.array(lstd, type=pa.float64()),
                "edge_density": pa.array(edge, type=pa.float64()),
            }
        )


class ImageChannelStatsStage:
    """Integer-exact channel statistics over decoded rasters: per-channel
    byte SUMS (int64 — the exact numerators of the channel means), global
    min/max, pixel count.  Pure integer arithmetic end-to-end, so unlike
    the float kernels of :class:`ImageFeatureStage` these are
    order-independent and the gate mirrors them in SQL bit-exactly
    (``image_channel_stats``): the oracle re-derives every pixel byte from
    the text and aggregates the same integers."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        w, h, _mx, _f, ps, buf = _parse_ppm_batch(batch["payload"])
        n = len(w)
        sums = np.zeros((n, 3), dtype=np.int64)
        mins = np.zeros(n, dtype=np.int64)
        maxs = np.zeros(n, dtype=np.int64)
        npx = np.zeros(n, dtype=np.int64)
        for i in range(n):
            px = buf[ps[i] : ps[i] + w[i] * h[i] * 3].reshape(-1, 3)
            sums[i] = px.sum(axis=0, dtype=np.int64)
            mins[i], maxs[i], npx[i] = px.min(), px.max(), px.size
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sum_r": pa.array(sums[:, 0]),
                "sum_g": pa.array(sums[:, 1]),
                "sum_b": pa.array(sums[:, 2]),
                "px_min": pa.array(mins),
                "px_max": pa.array(maxs),
                "n_px": pa.array(npx),
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


def _parse_wav_batch(col: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched RIFF/WAVE header decode → (rate, channels, n_samples).

    The canonical layout (``RIFF·WAVE`` + 16-byte ``fmt `` + ``data`` at
    offset 36 — fixed-shape) is decoded fully vectorized from one (n × 44)
    gathered header matrix viewed as little-endian fields; payloads with
    extra chunks fall back to the scalar :func:`_parse_wav` chunk walker.
    Payload bytes never leave the Arrow buffer on the canonical path."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buf = np.frombuffer(_binary_values(col), dtype=np.uint8)
    offs = _binary_offsets(col).astype(np.int64)
    n = len(col)
    lens = np.diff(offs)
    take = np.minimum(lens, 44)
    mat = gather_padded(buf, offs[:-1], take, 44)

    def le32(o):
        return np.ascontiguousarray(mat[:, o : o + 4]).view("<u4").ravel().astype(np.int64)

    def le16(o):
        return np.ascontiguousarray(mat[:, o : o + 2]).view("<u2").ravel().astype(np.int64)

    pre1 = np.frombuffer(b"RIFF", dtype=np.uint8)
    pre2 = np.frombuffer(b"WAVEfmt ", dtype=np.uint8)
    pre3 = np.frombuffer(b"data", dtype=np.uint8)
    canonical = (
        (lens >= 44)
        & (mat[:, 0:4] == pre1).all(axis=1)
        & (mat[:, 8:16] == pre2).all(axis=1)
        & (le32(16) == 16)
        & (mat[:, 36:40] == pre3).all(axis=1)
    )
    rate = np.empty(n, dtype=np.int64)
    channels = np.empty(n, dtype=np.int64)
    n_samples = np.empty(n, dtype=np.int64)
    c = canonical
    rate[c], channels[c] = le32(24)[c], le16(22)[c]
    block_align = np.maximum(le16(32), 1)
    n_samples[c] = (le32(40) // block_align)[c]
    for i in np.flatnonzero(~canonical):
        r, ch, _b, s = _parse_wav(bytes(buf[offs[i] : offs[i + 1]]))
        rate[i], channels[i], n_samples[i] = r, ch, s
    return rate, channels, n_samples


class AudioDecodeStage:
    """Actor-pool WAV header decode: batched RIFF parsing
    (:func:`_parse_wav_batch`), scalar chunk-walk fallback.  PRODUCTION
    SWAP POINT for compressed audio (MP3/AAC/Opus): replace the parse call
    with a C codec; the actor-pool plumbing and schema stay as-is."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rate, channels, n_samples = _parse_wav_batch(batch["payload"])
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
