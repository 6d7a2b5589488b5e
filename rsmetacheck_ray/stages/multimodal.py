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
