"""Multimodal column plumbing — binary payloads with typed metadata.

Image/audio/video travel as opaque ``binary`` columns; decode /
feature-extract stages are actor-pool ``map_batches`` classes. The
actual codec work is STUBBED (the container has no image/audio libs,
per the build brief): :class:`ImageDecodeStub` derives deterministic
fake dimensions from the payload bytes, and :meth:`real decode
<ImageDecodeStub._decode_real>` raises ``NotImplementedError`` behind
an import-try — the Ray-side plumbing (schema, batch sizing, actor
signature, output layout) is real and tested.

Scale notes: binary payloads make rows wide — callers should use a
small ``batch_size`` and let block splitting handle fat rows; the
payload column is dropped after decode (project-early, SURVEY §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def attach_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Test-fixture synthesizer: a deterministic binary payload derived
    from the text column (stands in for a WARC image payload)."""
    payload = pc.cast(batch.column(text_col), pa.binary())
    return batch.append_column("payload", payload)


class ImageDecodeStub:
    """Actor-pool decode stage: ``payload: binary`` → typed metadata.

    Real decoders (PIL / libvips) would be loaded once per actor here
    in ``__init__``; the per-batch ``__call__`` shape is identical.
    """

    def __init__(self, try_real_decoder: bool = False):
        self.decoder = None
        if try_real_decoder:
            try:  # gate optional dependency behind an import-try
                from PIL import Image  # noqa: F401

                self.decoder = Image
            except ImportError:
                self.decoder = None

    def _decode_real(self, payload: bytes) -> tuple[int, int, str]:
        if self.decoder is None:
            raise NotImplementedError(
                "no image codec in this environment — stubbed decode only"
            )
        raise NotImplementedError("real decode path not wired in-sandbox")

    @staticmethod
    def _decode_stub(n_bytes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Deterministic fake dimensions — a pure function of payload
        length (mirrors the SQL oracle: width = n % 640 + 16,
        height = n % 480 + 16)."""
        width = n_bytes % 640 + 16
        height = n_bytes % 480 + 16
        return width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column("payload")
        n_bytes = pc.binary_length(payload).to_numpy(zero_copy_only=False).astype(np.int64)
        width, height = self._decode_stub(n_bytes)
        out = batch.drop_columns(["payload"])  # project the fat column away
        out = out.append_column("payload_bytes", pa.array(n_bytes, pa.int64()))
        out = out.append_column("width", pa.array(width, pa.int64()))
        out = out.append_column("height", pa.array(height, pa.int64()))
        return out.append_column(
            "format", pa.array(["stub"] * len(batch), pa.string())
        )


class FeatureExtractStub:
    """Actor-pool feature-extraction stage: ``payload: binary`` →
    ``embedding: list<float>`` (dim configurable). A real model (CLIP /
    audio encoder) would load once per actor in ``__init__``; the stub
    derives a deterministic projection of the payload length so the
    plumbing (schema, actor signature, downstream knn compatibility)
    is real and the SQL oracle can reproduce the values exactly:
    ``f_j = (n_bytes * (j+1)) % 997 / 997.0``."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_bytes = (
            pc.binary_length(batch.column("payload"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        feats = (
            (n_bytes[:, None] * (np.arange(self.dim)[None, :] + 1)) % 997
        ) / 997.0
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "embedding",
            pa.array([list(map(float, row)) for row in feats],
                     pa.list_(pa.float64())),
        )


class ResizeStub:
    """Actor-pool resize stage: (width, height) → dimensions fit into
    a ``max_side`` box preserving aspect ratio, integer math only
    (``floor(side * max_side / long_side)``) so the SQL oracle can
    reproduce it exactly. The pixel work is where a real resampler
    (PIL/libvips, loaded once per actor) would run."""

    def __init__(self, max_side: int = 224):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column("height").to_numpy(zero_copy_only=False).astype(np.int64)
        long_side = np.maximum(np.maximum(w, h), 1)
        scale_needed = long_side > self.max_side
        rw = np.where(scale_needed, w * self.max_side // long_side, w)
        rh = np.where(scale_needed, h * self.max_side // long_side, h)
        out = batch.append_column("resized_w", pa.array(rw, pa.int64()))
        return out.append_column("resized_h", pa.array(rh, pa.int64()))


class FrameSampleStub:
    """Actor-pool frame-sampling stage for video payloads: emits one
    row per sampled frame index (``flat_map`` shape). Frame count is
    a deterministic stub of the payload size (25 "fps", 1 KB per
    "second"); a real decoder would probe the container instead."""

    def __init__(self, every_nth: int = 25):
        self.every_nth = every_nth

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_bytes = (
            pc.binary_length(batch.column("payload"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_frames = np.maximum(n_bytes // 1024, 1) * 25
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_frame = [], []
        for i, nf in enumerate(n_frames):
            frames = range(0, int(nf), self.every_nth)
            out_id.extend([int(ids[i])] * len(frames))
            out_frame.extend(frames)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame_index": pa.array(out_frame, pa.int64()),
            }
        )
