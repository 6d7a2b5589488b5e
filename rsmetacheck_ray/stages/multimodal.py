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


# ---------------------------------------------------------------------------
# REAL codec path — PPM (P6). The container has no image libraries, but
# PPM needs none: the header is ASCII, the payload is raw RGB bytes. So
# unlike the stub path above, this stage genuinely DECODES pixels,
# resamples them and extracts features from them — the full multimodal
# shape (decode → transform → embed) with the codec real end-to-end.
# ---------------------------------------------------------------------------

from ..functions.hashing import splitmix64_np as _smx  # noqa: E402


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6 PPM."""
    h, w, c = pixels.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def _parse_ppm_header(data: bytes, pos: int = 0) -> tuple[int, int, int]:
    """Parse one P6 header at ``pos`` → (raster_offset, w, h) —
    the single implementation of the netpbm grammar (whitespace,
    comments, three tokens, one whitespace byte after maxval) shared
    by the frame decoder and the video container walk."""
    if data[pos : pos + 2] != b"P6":
        raise ValueError(f"not a P6 PPM at offset {pos}")
    p, vals = pos + 2, []
    while len(vals) < 3:
        while p < len(data) and data[p : p + 1].isspace():
            p += 1
        if data[p : p + 1] == b"#":
            while p < len(data) and data[p] != 0x0A:
                p += 1
            continue
        start = p
        while p < len(data) and not data[p : p + 1].isspace():
            p += 1
        if start == p:
            raise ValueError("truncated PPM header")
        vals.append(int(data[start:p]))
    p += 1  # exactly one whitespace byte after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    return p, w, h


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 PPM → (h, w, 3) uint8 (comments and whitespace per
    the netpbm spec)."""
    pos, w, h = _parse_ppm_header(data)
    arr = np.frombuffer(data, np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3)


def synth_pixels(doc_id: int, text_len: int) -> np.ndarray:
    """Deterministic fixture image (stands in for a WARC image)."""
    w = text_len % 64 + 8
    h = text_len % 48 + 8
    idx = np.arange(w * h * 3, dtype=np.uint64) ^ np.uint64(
        (doc_id * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
    )
    return (_smx(idx) & np.uint64(0xFF)).astype(np.uint8).reshape(h, w, 3)


def attach_ppm_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Fixture synthesizer: real encoded PPM bytes per row."""
    ids = batch.column("doc_id").to_pylist()
    lens = pc.utf8_length(batch.column(text_col)).to_pylist()
    payloads = [
        encode_ppm(synth_pixels(int(d), int(n or 0))) for d, n in zip(ids, lens)
    ]
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


def _nn_resize(pix: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor resample into a max_side box (aspect kept)."""
    h, w, _ = pix.shape
    long_side = max(h, w)
    if long_side <= max_side:
        return pix
    rw = max(w * max_side // long_side, 1)
    rh = max(h * max_side // long_side, 1)
    yi = (np.arange(rh) * h) // rh
    xi = (np.arange(rw) * w) // rw
    return pix[yi[:, None], xi[None, :]]


class PPMDecode:
    """Actor-pool stage: REAL P6 decode. Emits dimensions + per-channel
    means from the actual pixels and carries the raw pixel buffer
    forward (the fat payload column is projected away)."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ws, hs, means, raws = [], [], [], []
        for data in payloads:
            pix = decode_ppm(data)
            h, w, _ = pix.shape
            ws.append(w)
            hs.append(h)
            means.append(pix.reshape(-1, 3).mean(axis=0))
            raws.append(pix.tobytes())
        out = batch.drop_columns(["payload"])
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column(
            "mean_r", pa.array([float(m[0]) for m in means], pa.float64())
        )
        out = out.append_column(
            "mean_g", pa.array([float(m[1]) for m in means], pa.float64())
        )
        out = out.append_column(
            "mean_b", pa.array([float(m[2]) for m in means], pa.float64())
        )
        return out.append_column("pixels", pa.array(raws, pa.binary()))


class PPMResize:
    """Actor-pool stage: REAL nearest-neighbor resample of the decoded
    pixel buffers into a ``max_side`` box."""

    def __init__(self, max_side: int = 224):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        raws = batch.column("pixels").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        rws, rhs, out_raw = [], [], []
        for raw, w, h in zip(raws, ws, hs):
            pix = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
            r = _nn_resize(pix, self.max_side)
            rh, rw, _ = r.shape
            rws.append(rw)
            rhs.append(rh)
            out_raw.append(r.tobytes())
        out = batch.drop_columns(["pixels"])
        out = out.append_column("resized_w", pa.array(rws, pa.int64()))
        out = out.append_column("resized_h", pa.array(rhs, pa.int64()))
        return out.append_column("pixels", pa.array(out_raw, pa.binary()))


def _pixel_feature_vec(pix: np.ndarray) -> list:
    """15-dim pixel features of one float64 (h, w, 3) raster: global
    per-channel means + a 2×2 spatial grid of channel means,
    L2-normalized — the single feature definition shared by the
    chained stages and the fused retrieval stage."""
    h, w, _ = pix.shape
    f = [pix.reshape(-1, 3).mean(axis=0)]
    for yy in (slice(0, h // 2), slice(h // 2, h)):
        for xx in (slice(0, w // 2), slice(w // 2, w)):
            block = pix[yy, xx]
            f.append(
                block.reshape(-1, 3).mean(axis=0)
                if block.size
                else np.zeros(3)
            )
    v = np.concatenate(f)
    n = np.linalg.norm(v)
    return (v / n if n else v).tolist()


class PPMFeatures:
    """Actor-pool stage: REAL pixel features — global per-channel means
    plus a 2×2 spatial grid of channel means (15 dims), L2-normalized;
    flows straight into the knn operators."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        raws = batch.column("pixels").to_pylist()
        ws = batch.column("resized_w").to_pylist()
        hs = batch.column("resized_h").to_pylist()
        feats = [
            _pixel_feature_vec(
                np.frombuffer(raw, np.uint8)
                .reshape(h, w, 3)
                .astype(np.float64)
            )
            for raw, w, h in zip(raws, ws, hs)
        ]
        out = batch.drop_columns(["pixels"])
        return out.append_column(
            "embedding", pa.array(feats, pa.list_(pa.float64()))
        )


class ImageFeaturePipeline:
    """FUSED decode→resize→feature stage for the retrieval path. The
    chained PPMDecode → PPMResize → PPMFeatures pipeline ships the fat
    raw-raster column through the object store TWICE between actor
    pools; for feature extraction none of those intermediates are
    needed downstream, so this stage collapses the three pools into
    one and emits only the 15-float embeddings. Bitwise identical to
    the chained stages (same decode, same _nn_resize, same
    _pixel_feature_vec — pinned by pytest)."""

    def __init__(self, dispatch: bool = False, max_side: int = 224):
        self.dispatch = dispatch
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for data in batch.column("payload").to_pylist():
            pix = decode_image(data)[0] if self.dispatch else decode_ppm(data)
            pix = _nn_resize(pix, self.max_side)
            feats.append(_pixel_feature_vec(pix.astype(np.float64)))
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "embedding", pa.array(feats, pa.list_(pa.float64()))
        )


# ---------------------------------------------------------------------------
# Second REAL codec — BMP (24-bit uncompressed, BITMAPINFOHEADER).
# Like P6, BMP needs no libraries: a 54-byte little-endian header and a
# bottom-up BGR raster with rows padded to 4 bytes. Two genuinely
# different raster layouts (top-down unpadded RGB vs bottom-up padded
# BGR) exercise real format DISPATCH in the decode stage.
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    import struct

    h, w, c = pixels.shape
    assert c == 3
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    raster = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    # bottom-up rows, BGR channel order
    raster[:, :row_bytes] = pixels[::-1, :, ::-1].reshape(h, row_bytes)
    body = raster.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return head + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB (bottom-up or
    top-down rasters, row padding honored)."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    size, w, h_raw, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    raster = np.frombuffer(data, np.uint8, count=h * stride, offset=offset)
    rows = raster.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


# ---------------------------------------------------------------------------
# Third REAL codec — farbfeld (suckless): 8-byte magic "farbfeld",
# big-endian u32 width/height, then row-major RGBA with 16-bit
# big-endian components. A third genuinely different raster layout
# (16-bit samples + alpha vs 8-bit RGB vs padded bottom-up BGR) for the
# dispatch stage; 8-bit values widen as v*257 so the roundtrip is exact
# (v*257 >> 8 == v).
# ---------------------------------------------------------------------------


def encode_farbfeld(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → farbfeld bytes (opaque alpha)."""
    h, w, c = pixels.shape
    assert c == 3
    rgba = np.empty((h, w, 4), dtype=">u2")
    rgba[:, :, :3] = pixels.astype(np.uint16) * 257
    rgba[:, :, 3] = 0xFFFF
    import struct

    return b"farbfeld" + struct.pack(">II", w, h) + rgba.tobytes()


def decode_farbfeld(data: bytes) -> np.ndarray:
    """farbfeld → (h, w, 3) uint8 RGB (alpha dropped, 16→8 bit via the
    high byte — exact inverse of the *257 widening)."""
    import struct

    if data[:8] != b"farbfeld":
        raise ValueError("not a farbfeld payload")
    w, h = struct.unpack_from(">II", data, 8)
    if len(data) < 16 + h * w * 8:
        raise ValueError("truncated farbfeld raster")
    raw = np.frombuffer(data, dtype=">u2", count=h * w * 4, offset=16)
    rgba = raw.reshape(h, w, 4)
    return (rgba[:, :, :3] >> 8).astype(np.uint8)


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Format dispatch on magic bytes → (pixels, format). The decode
    stage never trusts a declared format column — payload bytes rule."""
    if data[:2] == b"P6":
        return decode_ppm(data), "ppm"
    if data[:2] == b"BM":
        return decode_bmp(data), "bmp"
    if data[:8] == b"farbfeld":
        return decode_farbfeld(data), "farbfeld"
    raise ValueError(f"unknown image magic {data[:2]!r}")


def attach_mixed_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Fixture synthesizer: the SAME deterministic pixels per doc,
    encoded PPM / BMP / farbfeld by doc_id % 3 — so a decode
    differential (same pixels through all three codecs) is testable."""
    ids = batch.column("doc_id").to_pylist()
    lens = pc.utf8_length(batch.column(text_col)).to_pylist()
    enc = {0: encode_ppm, 1: encode_bmp, 2: encode_farbfeld}
    payloads = []
    for d, n in zip(ids, lens):
        pix = synth_pixels(int(d), int(n or 0))
        payloads.append(enc[int(d) % 3](pix))
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


class ImageDecode:
    """Actor-pool stage: REAL multi-format decode (PPM | BMP |
    farbfeld dispatch by magic bytes). Same output schema as :class:`PPMDecode` plus the
    detected ``format`` column."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ws, hs, means, fmts, raws = [], [], [], [], []
        for data in payloads:
            pix, fmt = decode_image(data)
            h, w, _ = pix.shape
            ws.append(w)
            hs.append(h)
            means.append(pix.reshape(-1, 3).mean(axis=0))
            fmts.append(fmt)
            raws.append(pix.tobytes())
        out = batch.drop_columns(["payload"])
        out = out.append_column("format", pa.array(fmts, pa.string()))
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column(
            "mean_r", pa.array([float(m[0]) for m in means], pa.float64())
        )
        out = out.append_column(
            "mean_g", pa.array([float(m[1]) for m in means], pa.float64())
        )
        out = out.append_column(
            "mean_b", pa.array([float(m[2]) for m in means], pa.float64())
        )
        return out.append_column("pixels", pa.array(raws, pa.binary()))


_ENCODERS = {"ppm": encode_ppm, "bmp": encode_bmp, "farbfeld": encode_farbfeld}


class MixedResize:
    """Actor-pool TRANSCODE stage: dispatch-decode (PPM | BMP |
    farbfeld), nearest-neighbor resize into a ``max_side`` box, and
    RE-ENCODE in the ORIGINAL format — the thumbnail/normalize pass of
    an image-curation pipeline, with the payload staying a valid file
    of its own format end to end. Output replaces ``payload`` and adds
    (format, width, height, resized_w, resized_h)."""

    def __init__(self, max_side: int = 16):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        fmts, ws, hs, rws, rhs, outs = [], [], [], [], [], []
        for data in payloads:
            pix, fmt = decode_image(data)
            h, w, _ = pix.shape
            r = _nn_resize(pix, self.max_side)
            rh, rw, _ = r.shape
            fmts.append(fmt)
            ws.append(w)
            hs.append(h)
            rws.append(rw)
            rhs.append(rh)
            outs.append(_ENCODERS[fmt](r))
        out = batch.drop_columns(["payload"])
        out = out.append_column("format", pa.array(fmts, pa.string()))
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("resized_w", pa.array(rws, pa.int64()))
        out = out.append_column("resized_h", pa.array(rhs, pa.int64()))
        return out.append_column("payload", pa.array(outs, pa.binary()))


def _ppm_payload_length(data: bytes, pos: int) -> tuple[int, int, int]:
    """(frame_length, width, height) of the PPM frame starting at pos —
    parsed from the self-describing header (shared grammar with
    :func:`decode_ppm`), no index needed."""
    raster, w, h = _parse_ppm_header(data, pos)
    return (raster - pos) + w * h * 3, w, h


def attach_ppm_video(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Fixture synthesizer: a 'video' payload = concatenated real PPM
    frames (frame count and pixels deterministic per doc)."""
    ids = batch.column("doc_id").to_pylist()
    lens = pc.utf8_length(batch.column(text_col)).to_pylist()
    payloads = []
    for d, n in zip(ids, lens):
        n = int(n or 0)
        n_frames = n % 7 + 2
        payloads.append(
            b"".join(
                encode_ppm(synth_pixels(int(d) * 1000 + f, n + f))
                for f in range(n_frames)
            )
        )
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


class PPMFrameSample:
    """Actor-pool frame-sampling stage with a REAL container walk: the
    byte stream is parsed frame by frame (each P6 header self-describes
    its length) and every ``every_nth`` frame is emitted as its own row
    with genuinely decoded stats — the ``flat_map`` shape of video
    sampling with the codec real."""

    def __init__(self, every_nth: int = 2):
        self.every_nth = every_nth

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_idx, out_w, out_h, out_mean = [], [], [], [], []
        for d, data in zip(ids, payloads):
            pos = frame = 0
            while pos < len(data):
                length, w, h = _ppm_payload_length(data, pos)
                if frame % self.every_nth == 0:
                    pix = decode_ppm(data[pos : pos + length])
                    out_id.append(int(d))
                    out_idx.append(frame)
                    out_w.append(w)
                    out_h.append(h)
                    out_mean.append(float(pix.mean()))
                pos += length
                frame += 1
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame_index": pa.array(out_idx, pa.int64()),
                "width": pa.array(out_w, pa.int64()),
                "height": pa.array(out_h, pa.int64()),
                "mean_pixel": pa.array(out_mean, pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
# AUDIO tier — WAV / PCM16 (RIFF), from scratch like P6/BMP/farbfeld.
# A canonical 44-byte RIFF header + little-endian int16 samples needs
# no libraries, so the audio modality gets the same REAL treatment as
# images: genuine sample decode, vectorized features (RMS energy,
# zero-crossing rate, peak), and nearest-neighbor resampling — the
# decode→featurize→downsample plumbing an audio curation pipeline
# runs, with payloads that any audio tool can open.
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """mono int16 samples → canonical PCM WAV bytes."""
    import struct

    s = np.ascontiguousarray(samples, dtype="<i2")
    body = s.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(body), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(body),
    )
    return hdr + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (int16 samples, sample_rate). Walks RIFF chunks (a
    writer may insert LIST/fact chunks before data); strict on the
    format: mono/stereo 16-bit PCM only, stereo downmixed by averaging
    (the curation-pipeline convention)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    samples = None
    rate = 0
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, pos
            )
            if audio_fmt != 1 or bits != 16 or channels not in (1, 2):
                raise ValueError(
                    f"unsupported WAV variant (fmt={audio_fmt}, "
                    f"bits={bits}, channels={channels})"
                )
            fmt = channels
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt")
            raw = np.frombuffer(data, "<i2", count=size // 2, offset=pos)
            if fmt == 2:  # downmix stereo
                raw = (
                    (raw[0::2].astype(np.int32) + raw[1::2].astype(np.int32))
                    // 2
                ).astype(np.int16)
            samples = raw
        pos += size + (size & 1)  # RIFF chunks are word-aligned
    if samples is None:
        raise ValueError("WAV without a data chunk")
    return samples, rate


def synth_samples(doc_id: int, text_len: int) -> np.ndarray:
    """Deterministic synthetic waveform per doc (splitmix-seeded saw +
    square mix) — the stand-in payload generator, like synth_pixels."""
    from ..functions.hashing import splitmix64_np

    n = 256 + (text_len % 512)
    seeds = splitmix64_np(
        np.arange(n, dtype=np.uint64) ^ np.uint64(doc_id * 2654435761 + 7)
    )
    return ((seeds % np.uint64(20001)).astype(np.int64) - 10000).astype(
        np.int16
    )


def attach_wav_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, payload): one WAV clip per doc, rate varied by id."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    rates = [8000 if int(i) % 3 == 0 else 16000 for i in ids]
    payloads = [
        encode_wav(synth_samples(int(i), len(t or "")), r)
        for i, t, r in zip(ids, texts, rates)
    ]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class WavFeatures:
    """Actor-pool stage: decode → vectorized clip features (duration,
    RMS energy, zero-crossing rate, peak) — the audio analog of
    PPMFeatures; everything numpy over the sample vector."""

    def __init__(self):
        pa.set_cpu_count(1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "n_samples": [], "sample_rate": [], "duration_s": [],
            "rms": [], "zcr": [], "peak": [],
        }
        for data in batch.column("payload").to_pylist():
            s, rate = decode_wav(data)
            x = s.astype(np.float64) / 32768.0
            out["n_samples"].append(len(s))
            out["sample_rate"].append(rate)
            out["duration_s"].append(len(s) / rate)
            out["rms"].append(float(np.sqrt(np.mean(x * x))) if len(s) else 0.0)
            out["zcr"].append(
                float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                if len(s) > 1 else 0.0
            )
            out["peak"].append(float(np.abs(x).max()) if len(s) else 0.0)
        t = batch.drop_columns(["payload"])
        t = t.append_column("n_samples", pa.array(out["n_samples"], pa.int64()))
        t = t.append_column("sample_rate", pa.array(out["sample_rate"], pa.int64()))
        t = t.append_column("duration_s", pa.array(out["duration_s"], pa.float64()))
        t = t.append_column("rms", pa.array(out["rms"], pa.float64()))
        t = t.append_column("zcr", pa.array(out["zcr"], pa.float64()))
        return t.append_column("peak", pa.array(out["peak"], pa.float64()))


class WavResample:
    """Actor-pool TRANSCODE stage: decode → nearest-neighbor resample
    to ``target_rate`` → re-encode as WAV (the payload stays a valid
    file, like MixedResize). Clips already at the target pass through
    bit-exact."""

    def __init__(self, target_rate: int = 8000):
        self.target = target_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, ns, outs = [], [], []
        for data in batch.column("payload").to_pylist():
            s, rate = decode_wav(data)
            if rate != self.target and len(s):
                n_out = max(1, (len(s) * self.target) // rate)
                idx = (np.arange(n_out) * rate) // self.target
                s = s[np.minimum(idx, len(s) - 1)]
            rates.append(rate)
            ns.append(len(s))
            outs.append(encode_wav(s, self.target))
        t = batch.drop_columns(["payload"])
        t = t.append_column("orig_rate", pa.array(rates, pa.int64()))
        t = t.append_column("n_samples", pa.array(ns, pa.int64()))
        return t.append_column("payload", pa.array(outs, pa.binary()))


# ---------------------------------------------------------------------------
# Average-hash (aHash) perceptual fingerprint — exact-integer variant:
# grayscale = per-pixel channel SUM (0..765, no division), an 8×8
# cell grid by floor index (y*8//h), and each bit set iff the cell's
# gray-sum exceeds the image mean by integer CROSS-MULTIPLICATION
# (cell_sum * n_pixels > total_sum * cell_pixels) — no float ever, so
# DuckDB re-derives the hash bit-for-bit from the synth pixel stream.
# The classic aHash property (invariance under nearest-neighbor
# resize of the same image) is pinned in pytest.
# ---------------------------------------------------------------------------


def ahash_halves(pix: np.ndarray) -> tuple[int, int]:
    """(hash_hi, hash_lo): the 64 aHash bits as two int32-range int64
    halves (cells 32..63 and 0..31) — split so the SQL oracle can
    accumulate each half inside BIGINT (DuckDB << rejects shifts that
    would cross 2^63)."""
    s = pix.astype(np.int64).sum(axis=2)
    h, w = s.shape
    cy = np.arange(h, dtype=np.int64) * 8 // h
    cx = np.arange(w, dtype=np.int64) * 8 // w
    cell = (cy[:, None] * 8 + cx[None, :]).ravel()
    cs = np.zeros(64, np.int64)
    np.add.at(cs, cell, s.ravel())
    cnp = np.bincount(cell, minlength=64).astype(np.int64)
    npix = np.int64(h * w)
    total = s.sum()
    bits = cs * npix > total * cnp
    weights = np.int64(1) << np.arange(32, dtype=np.int64)
    lo = int((bits[:32] * weights).sum())
    hi = int((bits[32:] * weights).sum())
    return hi, lo


class AHashStage:
    """Actor-pool stage: decode the P6 payload and emit the exact
    aHash halves plus their 16-hex-digit concatenation ``k`` (the
    string key the exact-dedup machinery groups on)."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        his, los, ks = [], [], []
        for data in payloads:
            hi, lo = ahash_halves(decode_ppm(data))
            his.append(hi)
            los.append(lo)
            ks.append(f"{hi:08x}{lo:08x}")
        out = batch.drop_columns(["payload"])
        out = out.append_column("hash_hi", pa.array(his, pa.int64()))
        out = out.append_column("hash_lo", pa.array(los, pa.int64()))
        return out.append_column("k", pa.array(ks, pa.string()))


# ---------------------------------------------------------------------------
# Audio energy fingerprint — the aHash idea on PCM16: 64 floor-index
# windows, each bit set iff the window's ENERGY (Σs², exact int64)
# exceeds the clip mean by integer cross-multiplication. Same halves
# split as ahash_halves for the same BIGINT-shift oracle reason.
# ---------------------------------------------------------------------------


def audio_fingerprint_halves(samples: np.ndarray) -> tuple[int, int]:
    """(hash_hi, hash_lo) of the 64 window-energy bits of a PCM16
    clip. Bounds: |s| <= 32767 ⇒ s² < 2³⁰; the cross-products stay
    far inside int64 for any clip under ~2²⁰ samples per window."""
    s = samples.astype(np.int64)
    n = len(s)
    if n == 0:
        return 0, 0
    win = np.arange(n, dtype=np.int64) * 64 // n
    e = np.zeros(64, np.int64)
    np.add.at(e, win, s * s)
    wn = np.bincount(win, minlength=64).astype(np.int64)
    total = (s * s).sum()
    bits = e * np.int64(n) > total * wn
    weights = np.int64(1) << np.arange(32, dtype=np.int64)
    lo = int((bits[:32] * weights).sum())
    hi = int((bits[32:] * weights).sum())
    return hi, lo


class AudioFingerprintStage:
    """Actor-pool stage: decode the WAV payload and emit the exact
    energy-fingerprint halves plus the 16-hex key ``k``."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        his, los, ks = [], [], []
        for data in payloads:
            samples, _rate = decode_wav(data)
            hi, lo = audio_fingerprint_halves(samples)
            his.append(hi)
            los.append(lo)
            ks.append(f"{hi:08x}{lo:08x}")
        out = batch.drop_columns(["payload"])
        out = out.append_column("hash_hi", pa.array(his, pa.int64()))
        out = out.append_column("hash_lo", pa.array(los, pa.int64()))
        return out.append_column("k", pa.array(ks, pa.string()))


# ---------------------------------------------------------------------------
# Video container + sampled-frame clip fingerprint. The container is a
# real (from-scratch) framing: b"RVID" + u32 frame count + length-
# prefixed binary-P6 frames; encode/decode are exact inverses (pinned
# by roundtrip pytest). The clip fingerprint samples every 2nd frame
# (the frame-sample op of the multimodal brief) and XORs the sampled
# frames' exact-integer aHashes — XOR is associative/commutative/
# integer, so the oracle reproduces it with bit_xor over re-derived
# frame hashes.
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"RVID"
VIDEO_FRAME_STRIDE = 2


def encode_video(frames: list) -> bytes:
    parts = [VIDEO_MAGIC, len(frames).to_bytes(4, "big")]
    for f in frames:
        ppm = encode_ppm(f)
        parts.append(len(ppm).to_bytes(4, "big"))
        parts.append(ppm)
    return b"".join(parts)


def decode_video(data: bytes) -> list:
    if data[:4] != VIDEO_MAGIC:
        raise ValueError("not an RVID container")
    n = int.from_bytes(data[4:8], "big")
    pos = 8
    frames = []
    for _ in range(n):
        ln = int.from_bytes(data[pos: pos + 4], "big")
        pos += 4
        frames.append(decode_ppm(data[pos: pos + ln]))
        pos += ln
    return frames


def synth_video_frames(doc_id: int, text_len: int) -> list:
    """Deterministic clip: 4 + doc_id%4 frames, frame f's pixel stream
    keyed on doc_id*131 + f (all frames share the text_len dims)."""
    n_frames = 4 + doc_id % 4
    return [
        synth_pixels(doc_id * 131 + f, text_len) for f in range(n_frames)
    ]


def video_fingerprint_halves(data: bytes) -> tuple[int, int]:
    """(hash_hi, hash_lo): XOR of the aHash halves of every sampled
    (stride-2) frame of the clip."""
    hi = lo = 0
    frames = decode_video(data)
    for f in range(0, len(frames), VIDEO_FRAME_STRIDE):
        fhi, flo = ahash_halves(frames[f])
        hi ^= fhi
        lo ^= flo
    return hi, lo


class VideoFingerprintStage:
    """Actor-pool stage: decode the RVID payload, sample frames, and
    emit the exact clip-fingerprint halves plus the 16-hex key ``k``."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        his, los, ks = [], [], []
        for data in payloads:
            hi, lo = video_fingerprint_halves(data)
            his.append(hi)
            los.append(lo)
            ks.append(f"{hi:08x}{lo:08x}")
        out = batch.drop_columns(["payload"])
        out = out.append_column("hash_hi", pa.array(his, pa.int64()))
        out = out.append_column("hash_lo", pa.array(los, pa.int64()))
        return out.append_column("k", pa.array(ks, pa.string()))


# ---------------------------------------------------------------------------
# per-worker payload memo (r5): the bench corpora key every synthetic
# payload on doc_id % 97, so at most 97 distinct blobs exist per
# modality — memoizing the encode side makes the benched cost the
# DECODE/fingerprint operator (the real pipeline), not the fixture
# synthesis. Module-level dict: one fill per worker process.
# ---------------------------------------------------------------------------

_PAYLOAD_MEMO: dict[tuple, bytes] = {}


def synth_payload_memo(kind: str, residue: int) -> bytes:
    key = (kind, residue)
    p = _PAYLOAD_MEMO.get(key)
    if p is None:
        if kind == "image":
            p = encode_ppm(synth_pixels(residue, residue * 7))
        elif kind == "audio":
            p = encode_wav(synth_samples(residue, residue * 7))
        elif kind == "video":
            p = encode_video(synth_video_frames(residue, residue * 7))
        else:
            raise ValueError(f"unknown payload kind {kind!r}")
        _PAYLOAD_MEMO[key] = p
    return p
