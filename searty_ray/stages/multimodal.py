"""Multimodal column plumbing (driver instructions).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata.  The decode/feature kernels themselves are STUBBED (no imaging
libs in this container): :class:`ImageDecodeStage` raises
``NotImplementedError`` unless ``fake=True``, in which case it derives
deterministic pseudo-metadata from the bytes — but the Ray-side plumbing is
real and tested: actor-pool ``map_batches`` with small ``batch_size``
(payload rows are large), ``large_binary`` schema, per-actor "model" setup
in ``__init__``, Arrow-native outputs.

``attach_payload_batch`` builds the binary payload column (UTF-8 bytes of
the text here; real pipelines read image bytes from storage).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def attach_payload_batch(batch: pa.Table) -> pa.Table:
    payload = pc.cast(batch["text"], pa.large_binary())
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": payload,
            "media_type": pa.array(["image/fake"] * len(batch), type=pa.string()),
        }
    )


class ImageDecodeStage:
    """Actor-pool decode/feature stage over binary payloads.

    __init__ loads the (stub) decoder once per actor; __call__ handles one
    Arrow batch.  Real deployments: ``map_batches(ImageDecodeStage,
    batch_size=32, concurrency=(2, 8), num_cpus=1)``.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake
        # real impl would do: self.decoder = PIL/torchvision/... load here
        self.decoder = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires an imaging library not present in this "
                "container; run with fake=True for deterministic pseudo-decode"
            )
        payload = batch["payload"]
        n_bytes = pc.binary_length(payload).to_numpy(zero_copy_only=False).astype(np.int64)
        # deterministic pseudo-decode: metadata is a pure function of size
        width = n_bytes % 640 + 1
        height = n_bytes % 480 + 1
        n_frames = n_bytes % 30 + 1
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
    """Frame-sampling plumbing: one output row per sampled frame ordinal
    (every ``stride``-th frame), payload sliced deterministically."""

    def __init__(self, stride: int = 10):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_bytes = (
            pc.binary_length(batch["payload"]).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        n_frames = n_bytes % 30 + 1
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
