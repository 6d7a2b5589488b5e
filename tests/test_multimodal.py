"""Multimodal plumbing tests: stubbed decode, resize, frame sampling —
the Ray-side schema/batch/actor contracts are real, codecs are stubbed
(no image/audio libs in this container)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rsmetacheck_ray.stages import multimodal as mm


def _payload_batch():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["x" * 100, "y" * 2000, ""])})
    return mm.attach_payload(t)


def test_decode_stub_dims_deterministic():
    out = mm.ImageDecodeStub()(_payload_batch())
    assert out.column("payload_bytes").to_pylist() == [100, 2000, 0]
    assert out.column("width").to_pylist() == [100 % 640 + 16, 2000 % 640 + 16, 16]
    assert "payload" not in out.column_names  # fat column projected away


def test_decode_real_path_raises_not_implemented():
    stub = mm.ImageDecodeStub(try_real_decoder=True)
    with pytest.raises(NotImplementedError):
        stub._decode_real(b"\x89PNG")


def test_resize_preserves_aspect_and_small_images():
    decoded = mm.ImageDecodeStub()(_payload_batch())
    out = mm.ResizeStub(max_side=224)(decoded)
    w = np.array(out.column("width").to_pylist())
    h = np.array(out.column("height").to_pylist())
    rw = np.array(out.column("resized_w").to_pylist())
    rh = np.array(out.column("resized_h").to_pylist())
    assert (np.maximum(rw, rh) <= np.maximum(np.maximum(w, h), 224)).all()
    small = np.maximum(w, h) <= 224
    assert (rw[small] == w[small]).all() and (rh[small] == h[small]).all()


def test_frame_sample_rows_per_doc():
    out = mm.FrameSampleStub(every_nth=25)(_payload_batch())
    ids = np.array(out.column("doc_id").to_pylist())
    # doc 2: 2000 bytes -> 1 "second" -> 25 frames -> 1 sample at stride 25
    assert (ids == 2).sum() == 1
    # frame indices are multiples of the stride
    assert all(f % 25 == 0 for f in out.column("frame_index").to_pylist())


def test_actor_pool_contract(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(100), pa.int64()),
                                 "text": pa.array(["hello world"] * 100)}))
    out = (
        ds.map_batches(mm.attach_payload, batch_format="pyarrow")
        .map_batches(mm.ImageDecodeStub, batch_format="pyarrow", concurrency=(1, 2))
        .map_batches(mm.ResizeStub, batch_format="pyarrow", concurrency=(1, 2))
    ).to_pandas()
    assert len(out) == 100
    assert {"payload_bytes", "width", "height", "resized_w", "resized_h"} <= set(out.columns)


def test_feature_extract_feeds_knn(ray_session):
    """Extract-stub embeddings are knn-compatible end-to-end."""
    import numpy as np
    import ray.data as rd

    from rsmetacheck_ray.functions.similarity import knn_bruteforce

    # lengths large enough that the %997 wrap gives each doc a DISTINCT
    # direction (small n keeps all stub vectors parallel and cosine
    # cannot discriminate)
    t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                  "text": pa.array(["x" * (150 + 13 * i) for i in range(50)])})
    feats = (
        rd.from_arrow(t)
        .map_batches(mm.attach_payload, batch_format="pyarrow")
        .map_batches(mm.FeatureExtractStub, batch_format="pyarrow", concurrency=(1, 2))
    )
    ds = feats.map_batches(
        lambda b: b.select(["doc_id", "embedding"]).rename_columns(["vec_id", "embedding"]),
        batch_format="pyarrow",
    )
    target_n = 150 + 13 * 17  # doc 17's payload bytes
    q = np.array([[(target_n * (j + 1)) % 997 / 997.0 for j in range(8)]])
    res = knn_bruteforce(ds, q, np.array([0]), k=3).to_pandas()
    assert len(res) == 3
    assert res["vec_id"].iloc[0] == 17  # exact-feature query retrieves its doc
