"""Multimodal plumbing tests: stubbed decode, resize, frame sampling —
the Ray-side schema/batch/actor contracts are real, codecs are stubbed
(no image/audio libs in this container)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

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


# --------------------------------------------------------------------------
# REAL codec path (P6 PPM — no external libraries needed)
# --------------------------------------------------------------------------

def test_ppm_roundtrip_bit_exact():
    import numpy as np

    from rsmetacheck_ray.stages import multimodal as mm

    pix = mm.synth_pixels(7, 1234)
    back = mm.decode_ppm(mm.encode_ppm(pix))
    assert back.dtype == np.uint8 and (back == pix).all()


def test_ppm_header_comments_and_errors():
    import pytest as _pytest

    from rsmetacheck_ray.stages import multimodal as mm

    data = b"P6\n# comment line\n4 2\n255\n" + bytes(range(24))
    assert mm.decode_ppm(data).shape == (2, 4, 3)
    with _pytest.raises(ValueError):
        mm.decode_ppm(b"P5\n1 1\n255\n\x00")
    with _pytest.raises(ValueError):
        mm.decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00")


def test_nn_resize_known_values():
    import numpy as np

    from rsmetacheck_ray.stages import multimodal as mm

    pix = np.arange(4 * 8 * 3, dtype=np.uint8).reshape(4, 8, 3)
    r = mm._nn_resize(pix, 4)
    assert r.shape == (2, 4, 3)
    # nearest-neighbor picks rows (0,2) and cols (0,2,4,6)
    assert (r == pix[np.array([0, 2])[:, None], np.array([0, 2, 4, 6])[None, :]]).all()
    # no-op below the box
    small = np.zeros((3, 3, 3), np.uint8)
    assert mm._nn_resize(small, 224) is small


def test_ppm_pipeline_decodes_real_pixels(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rsmetacheck_ray.stages import multimodal as mm

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["x" * 100, "y" * 350, "z" * 40]),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(mm.attach_ppm_payload, batch_format="pyarrow")
        .map_batches(mm.PPMDecode, batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, n in enumerate((100, 350, 40)):
        pix = mm.synth_pixels(i, n)
        assert out.loc[i, "width"] == pix.shape[1]
        assert out.loc[i, "height"] == pix.shape[0]
        assert abs(out.loc[i, "mean_r"] - pix[:, :, 0].mean()) < 1e-9


def test_ppm_knn_self_match(ray_session):
    """Each query image's nearest neighbor among all features must be
    itself (real pixel features, cosine)."""
    from rsmetacheck_ray.pipelines.queries import q_multimodal_ppm_knn

    out = q_multimodal_ppm_knn("/root/testdata/sf0.001").to_pandas()
    top = out.groupby("query_id").head(1)
    assert (top["query_id"].to_numpy() == top["vec_id"].to_numpy()).all()


def test_ppm_video_frame_sampling(ray_session):
    """The container walk must find exactly every nth frame with the
    right per-frame dimensions and pixel stats."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rsmetacheck_ray.stages import multimodal as mm

    t = pa.table(
        {"doc_id": pa.array([5], pa.int64()), "text": pa.array(["q" * 12])}
    )  # 12 % 7 + 2 = 7 frames
    out = (
        rd.from_arrow(t)
        .map_batches(mm.attach_ppm_video, batch_format="pyarrow")
        .map_batches(mm.PPMFrameSample, fn_constructor_kwargs={"every_nth": 3},
                     batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
        .sort_values("frame_index")
        .reset_index(drop=True)
    )
    assert out["frame_index"].tolist() == [0, 3, 6]
    for _, row in out.iterrows():
        pix = mm.synth_pixels(5 * 1000 + int(row["frame_index"]),
                              12 + int(row["frame_index"]))
        assert row["width"] == pix.shape[1] and row["height"] == pix.shape[0]
        assert abs(row["mean_pixel"] - pix.mean()) < 1e-9


def test_bmp_roundtrip_bit_exact():
    """BMP encode -> decode is identity, including odd widths that
    require row padding and 1-pixel edges."""
    from rsmetacheck_ray.stages import multimodal as mm

    for h, w in [(5, 7), (8, 8), (1, 1), (3, 2), (16, 33)]:
        pix = mm.synth_pixels(h * 100 + w, w * h)[:h, :w]
        back = mm.decode_bmp(mm.encode_bmp(pix))
        assert back.shape == pix.shape
        assert (back == pix).all(), (h, w)


def test_bmp_top_down_variant():
    """Negative biHeight (top-down raster) decodes identically."""
    import struct

    from rsmetacheck_ray.stages import multimodal as mm

    pix = mm.synth_pixels(9, 30)
    data = bytearray(mm.encode_bmp(pix))
    h = pix.shape[0]
    # flip to top-down: negate height, reverse the row order in place
    struct.pack_into("<i", data, 22, -h)
    row_bytes = pix.shape[1] * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    raster = np.frombuffer(bytes(data[54:]), np.uint8).reshape(h, stride)
    data[54:] = raster[::-1].tobytes()
    assert (mm.decode_bmp(bytes(data)) == pix).all()


def test_image_format_dispatch_and_cross_codec_equality():
    """decode_image routes by magic bytes; the SAME pixels encoded
    through both codecs decode to identical arrays."""
    import pytest

    from rsmetacheck_ray.stages import multimodal as mm

    pix = mm.synth_pixels(4, 21)
    p_ppm, f_ppm = mm.decode_image(mm.encode_ppm(pix))
    p_bmp, f_bmp = mm.decode_image(mm.encode_bmp(pix))
    p_ff, f_ff = mm.decode_image(mm.encode_farbfeld(pix))
    assert (f_ppm, f_bmp, f_ff) == ("ppm", "bmp", "farbfeld")
    assert (p_ppm == p_bmp).all() and (p_ppm == p_ff).all()
    with pytest.raises(ValueError, match="unknown image magic"):
        mm.decode_image(b"GIF89a...")
    with pytest.raises(ValueError, match="unsupported BMP"):
        # 8-bpp header is rejected, not misdecoded
        import struct

        bad = bytearray(mm.encode_bmp(pix))
        struct.pack_into("<H", bad, 28, 8)
        mm.decode_bmp(bytes(bad))
    with pytest.raises(ValueError, match="truncated farbfeld"):
        mm.decode_farbfeld(mm.encode_farbfeld(pix)[:-4])


def test_mixed_decode_stage(ray_session):
    """The dispatch stage decodes a PPM/BMP/farbfeld-mixed corpus and
    reports per-format pixel stats matching the synthesized ground
    truth."""
    from rsmetacheck_ray.stages import multimodal as mm

    t = pa.table(
        {
            "doc_id": pa.array([2, 3, 10, 11], pa.int64()),
            "text": pa.array(["x" * 20, "y" * 33, "z" * 5, "w" * 48]),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(mm.attach_mixed_payload, batch_format="pyarrow")
        .map_batches(mm.ImageDecode, batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc_id % 3: 2 -> farbfeld, 3 -> ppm, 10 -> bmp, 11 -> farbfeld
    assert out["format"].tolist() == ["farbfeld", "ppm", "bmp", "farbfeld"]
    for _, row in out.iterrows():
        n = {2: 20, 3: 33, 10: 5, 11: 48}[int(row["doc_id"])]
        pix = mm.synth_pixels(int(row["doc_id"]), n)
        assert row["width"] == pix.shape[1] and row["height"] == pix.shape[0]
        assert abs(row["mean_r"] - pix[:, :, 0].mean()) < 1e-9


def test_cross_codec_features_and_mixed_knn(ray_session):
    """The same deterministic pixels through PPM, BMP and farbfeld
    produce IDENTICAL retrieval features (decode → resize → features),
    and the mixed-codec knn equals the PPM-only knn row-for-row."""
    import pyarrow.parquet as pq
    import os, tempfile

    from rsmetacheck_ray.pipelines.queries import (
        q_multimodal_mixed_knn,
        q_multimodal_ppm_knn,
    )
    from rsmetacheck_ray.stages import multimodal as mm

    # per-codec feature equality on one batch
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["aaa bbb", "cc", "dddd ee ff"], pa.string()),
        }
    )
    feats = {}
    for name, attach in (
        ("ppm", mm.attach_ppm_payload),
        ("mixed", mm.attach_mixed_payload),
    ):
        out = mm.PPMFeatures()(
            mm.PPMResize()(
                (mm.ImageDecode() if name == "mixed" else mm.PPMDecode())(
                    attach(t)
                )
            )
        )
        feats[name] = out.column("embedding").to_pylist()
    assert feats["mixed"] == feats["ppm"]

    # end-to-end: mixed knn equals ppm knn on the real testdata dir
    sf = "/root/testdata/sf0.001"
    a = q_multimodal_ppm_knn(sf).to_pandas()
    b = q_multimodal_mixed_knn(sf).to_pandas()
    a_sorted = a.sort_values(list(a.columns)).reset_index(drop=True)
    b_sorted = b.sort_values(list(b.columns)).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a_sorted, b_sorted)


def test_mixed_resize_transcode_roundtrip():
    """MixedResize re-encodes in the ORIGINAL format and the payload
    decodes to exactly the nearest-neighbor resample of the source
    pixels, for all three codecs."""
    import numpy as np

    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, size=(40, 28, 3), dtype=np.uint8)
    payloads = {
        "ppm": mm.encode_ppm(pix),
        "bmp": mm.encode_bmp(pix),
        "farbfeld": mm.encode_farbfeld(pix),
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(payloads))), pa.int64()),
            "payload": pa.array(list(payloads.values()), pa.binary()),
        }
    )
    out = mm.MixedResize(max_side=16)(t)
    ref = mm._nn_resize(pix, 16)
    for i, fmt in enumerate(payloads):
        assert out.column("format")[i].as_py() == fmt
        assert out.column("width")[i].as_py() == 28
        assert out.column("height")[i].as_py() == 40
        assert out.column("resized_w")[i].as_py() == ref.shape[1]
        assert out.column("resized_h")[i].as_py() == ref.shape[0]
        got, got_fmt = mm.decode_image(out.column("payload")[i].as_py())
        assert got_fmt == fmt
        assert (got == ref).all()


def test_mixed_resize_small_image_passthrough():
    import numpy as np

    pix = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "payload": pa.array([mm.encode_bmp(pix)], pa.binary()),
        }
    )
    out = mm.MixedResize(max_side=16)(t)
    assert out.column("resized_w")[0].as_py() == 4
    assert out.column("resized_h")[0].as_py() == 5
    got, _ = mm.decode_image(out.column("payload")[0].as_py())
    assert (got == pix).all()


def test_wav_roundtrip_bit_exact():
    import numpy as np

    rng = np.random.default_rng(21)
    s = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    data = mm.encode_wav(s, 16000)
    got, rate = mm.decode_wav(data)
    assert rate == 16000
    assert (got == s).all()


def test_wav_stereo_downmix_and_chunk_walk():
    """A LIST chunk before data must be skipped; stereo averages."""
    import struct

    import numpy as np

    left = np.array([100, -200, 300], np.int16)
    right = np.array([300, -400, 100], np.int16)
    inter = np.empty(6, np.int16)
    inter[0::2], inter[1::2] = left, right
    body = inter.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    payload = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + lst
        + b"data" + struct.pack("<I", len(body)) + body
    )
    got, rate = mm.decode_wav(payload)
    assert rate == 8000
    assert (got == (left.astype(np.int32) + right) // 2).all()


def test_wav_features_match_numpy():
    import numpy as np

    t = pa.table(
        {
            "doc_id": pa.array([0, 3], pa.int64()),
            "text": pa.array(["abc def", "xyz"], pa.string()),
        }
    )
    out = mm.WavFeatures()(mm.attach_wav_payload(t))
    for i, doc in enumerate([0, 3]):
        s = mm.synth_samples(doc, len(t.column("text")[i].as_py()))
        x = s.astype(np.float64) / 32768.0
        assert out.column("n_samples")[i].as_py() == len(s)
        assert out.column("sample_rate")[i].as_py() == (8000 if doc % 3 == 0 else 16000)
        assert abs(out.column("rms")[i].as_py() - np.sqrt(np.mean(x * x))) < 1e-12
        zcr = np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))
        assert abs(out.column("zcr")[i].as_py() - zcr) < 1e-12


def test_wav_resample_passthrough_and_ratio():
    import numpy as np

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),  # 0: 8k, 1: 16k
            "text": pa.array(["aaaa", "bbbb"], pa.string()),
        }
    )
    attached = mm.attach_wav_payload(t)
    out = mm.WavResample(target_rate=8000)(attached)
    # doc 0 already at 8 kHz: payload passes through bit-exact
    assert out.column("payload")[0].as_py() == attached.column("payload")[0].as_py()
    # doc 1 halves its sample count (16k -> 8k)
    s1 = mm.synth_samples(1, 4)
    assert out.column("n_samples")[1].as_py() == len(s1) // 2
    got, rate = mm.decode_wav(out.column("payload")[1].as_py())
    assert rate == 8000 and (got == s1[::2]).all()


def test_fused_feature_pipeline_matches_chained():
    """ImageFeaturePipeline (the one-pool retrieval stage) must be
    BITWISE identical to the chained PPMDecode→PPMResize→PPMFeatures
    stages, for both the single-codec and the dispatch variants."""
    t = pa.table(
        {
            "doc_id": pa.array(list(range(7)), pa.int64()),
            "text": pa.array(["x" * (11 + 13 * i) for i in range(7)], pa.string()),
        }
    )
    # PPM-only path
    attached = mm.attach_ppm_payload(t)
    chained = mm.PPMFeatures()(mm.PPMResize()(mm.PPMDecode()(attached)))
    fused = mm.ImageFeaturePipeline(dispatch=False)(attached)
    assert (
        chained.column("embedding").to_pylist()
        == fused.column("embedding").to_pylist()
    )
    # mixed dispatch path (PPM | BMP | farbfeld by doc_id % 3)
    mixed = mm.attach_mixed_payload(t)
    chained_m = mm.PPMFeatures()(mm.PPMResize()(mm.ImageDecode()(mixed)))
    fused_m = mm.ImageFeaturePipeline(dispatch=True)(mixed)
    assert (
        chained_m.column("embedding").to_pylist()
        == fused_m.column("embedding").to_pylist()
    )
    # and the codecs carry the same pixels, so the two paths agree
    assert (
        fused.column("embedding").to_pylist()
        == fused_m.column("embedding").to_pylist()
    )


# --- perceptual hash ----------------------------------------------------

def test_ahash_resize_invariance():
    """The classic aHash property: a nearest-neighbor downsample of
    the same image keeps the same 64-bit fingerprint (cell means move
    together with the global mean)."""
    from rsmetacheck_ray.stages import multimodal as mm

    # smooth gradient image: robust under resampling (pure noise is
    # not — aHash's guarantee is for natural-image structure)
    y, x = np.mgrid[0:64, 0:64]
    pix = np.stack([(y * 4) % 256, (x * 4) % 256, ((x + y) * 2) % 256],
                   axis=2).astype(np.uint8)
    full = mm.ahash_halves(pix)
    half = mm.ahash_halves(mm._nn_resize(pix, 32))
    assert full == half


def test_ahash_distinguishes_images():
    from rsmetacheck_ray.stages import multimodal as mm

    a = mm.ahash_halves(mm.synth_pixels(1, 40))
    b = mm.ahash_halves(mm.synth_pixels(2, 40))
    assert a != b
    # deterministic
    assert a == mm.ahash_halves(mm.synth_pixels(1, 40))


def test_phash_pairs_query(ray_session):
    from rsmetacheck_ray.pipelines.queries import _PHASH_MOD, q_multimodal_phash_pairs

    out = q_multimodal_phash_pairs("/root/testdata/sf0.001").to_pandas()
    # star pairs: canonical strictly below member, groups = doc_id%97
    assert (out["doc_id_a"] < out["doc_id_b"]).all()
    assert ((out["doc_id_a"] % _PHASH_MOD) == (out["doc_id_b"] % _PHASH_MOD)).all()
    # 500 docs / 97 residues: every non-minimal member pairs up
    assert len(out) == 500 - _PHASH_MOD


def test_audio_fingerprint_properties(ray_session):
    from rsmetacheck_ray.pipelines.queries import q_multimodal_audio_fp_pairs
    from rsmetacheck_ray.stages import multimodal as mm

    a = mm.audio_fingerprint_halves(mm.synth_samples(1, 40))
    assert a == mm.audio_fingerprint_halves(mm.synth_samples(1, 40))
    assert a != mm.audio_fingerprint_halves(mm.synth_samples(2, 40))
    assert mm.audio_fingerprint_halves(np.zeros(0, np.int16)) == (0, 0)
    # amplitude invariance: doubling every sample scales all energies
    # by 4 — the cross-multiplied bits don't move
    s = mm.synth_samples(3, 99)
    assert mm.audio_fingerprint_halves(s) == mm.audio_fingerprint_halves(
        (s.astype(np.int32) * 2).clip(-32768, 32767).astype(np.int16)
    )

    out = q_multimodal_audio_fp_pairs("/root/testdata/sf0.001").to_pandas()
    assert (out["doc_id_a"] < out["doc_id_b"]).all()
    assert ((out["doc_id_a"] % 97) == (out["doc_id_b"] % 97)).all()
    assert len(out) == 500 - 97


def test_video_container_roundtrip():
    from rsmetacheck_ray.stages import multimodal as mm

    frames = mm.synth_video_frames(5, 40)
    back = mm.decode_video(mm.encode_video(frames))
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)
    import pytest as _pt
    with _pt.raises(ValueError):
        mm.decode_video(b"XXXX" + b"\x00" * 8)


def test_video_fingerprint_sampling(ray_session):
    from rsmetacheck_ray.pipelines.queries import q_multimodal_video_fp_pairs
    from rsmetacheck_ray.stages import multimodal as mm

    frames = mm.synth_video_frames(7, 33)  # 7%4=3 -> 7 frames
    fp = mm.video_fingerprint_halves(mm.encode_video(frames))
    # stride-2: only frames 0,2,4,6 contribute — mutating frame 1
    # (unsampled) keeps the fingerprint, mutating frame 2 changes it
    mut = list(frames)
    mut[1] = mm.synth_pixels(999, 33)
    assert mm.video_fingerprint_halves(mm.encode_video(mut)) == fp
    mut2 = list(frames)
    mut2[2] = mm.synth_pixels(999, 33)
    assert mm.video_fingerprint_halves(mm.encode_video(mut2)) != fp

    out = q_multimodal_video_fp_pairs("/root/testdata/sf0.001").to_pandas()
    assert (out["doc_id_a"] < out["doc_id_b"]).all()
    assert ((out["doc_id_a"] % 97) == (out["doc_id_b"] % 97)).all()
    assert len(out) == 500 - 97
