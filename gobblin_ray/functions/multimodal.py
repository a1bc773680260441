"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode codecs (PIL / libav / ffmpeg) are NOT in this container, so the
decode kernels are STUBBED behind ``DeterministicFakeCodec`` (a seeded,
header-driven fake) or raise NotImplementedError in strict mode — but the
Ray-side plumbing is real and tested: schema, actor signature (state built
once in ``__init__``), byte-aware batch sizing, and output layout.

Batch-size note (SURVEY.md §4.5): media rows are wide — size batches by
BYTES, not rows (``suggest_batch_size``); a 100 KB payload means a few
hundred rows per batch, so batch x concurrency fits a worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # producer-claimed metadata
        ("height", pa.int32()),
    ]
)

_MAGIC = b"FAKEIMG1"


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus: payload = magic + w/h header +
    seeded pixel bytes."""
    rng = np.random.default_rng(seed)
    ws = rng.integers(8, 64, n).astype(np.int32)
    hs = rng.integers(8, 64, n).astype(np.int32)
    payloads = []
    for i in range(n):
        px = rng.integers(0, 256, int(ws[i]) * int(hs[i]), dtype=np.uint8)
        payloads.append(
            _MAGIC
            + int(ws[i]).to_bytes(4, "big")
            + int(hs[i]).to_bytes(4, "big")
            + px.tobytes()
        )
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/x-fake"] * n),
            "width": pa.array(ws),
            "height": pa.array(hs),
        },
        schema=MEDIA_SCHEMA,
    )


class DeterministicFakeCodec:
    """Stand-in decoder: parses the fake header + pixels. Real deployments
    replace this class with a PIL/libav wrapper — same interface."""

    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:8] != _MAGIC:
            raise ValueError("bad magic")
        w = int.from_bytes(payload[8:12], "big")
        h = int.from_bytes(payload[12:16], "big")
        return np.frombuffer(payload[16 : 16 + w * h], dtype=np.uint8).reshape(h, w)


class MediaDecoder:
    """Actor-pool stage: decode payloads, verify claimed metadata, emit
    decoded dims + a mean-luminance feature. Codec loaded ONCE per actor.

    strict=True raises NotImplementedError where a real codec would be
    required (documents the stub boundary)."""

    def __init__(self, strict: bool = False):
        if strict:
            raise NotImplementedError(
                "real image codec unavailable in this environment; "
                "install PIL/libav and swap DeterministicFakeCodec"
            )
        self.codec = DeterministicFakeCodec()  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, lum, ok = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            try:
                img = self.codec.decode(payload)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                lum.append(float(img.mean()))
                ok.append(True)
            except Exception:
                hs.append(0)
                ws.append(0)
                lum.append(0.0)
                ok.append(False)
        return (
            batch.drop_columns(["payload"])  # decoded stages drop the heavy bytes
            .append_column("dec_width", pa.array(ws, pa.int32()))
            .append_column("dec_height", pa.array(hs, pa.int32()))
            .append_column("mean_luma", pa.array(lum, pa.float64()))
            .append_column("decode_ok", pa.array(ok, pa.bool_()))
        )


class ImageResizer:
    """Actor-pool stage: decode -> nearest-neighbor resize to a fixed
    (out_w, out_h) thumbnail -> emit the resized pixels as a fixed-size
    binary column plus its mean luminance.

    The resize itself is REAL array math (index-gather; what PIL's
    NEAREST does) — only the decode behind it is the documented codec
    stub. Output rows are fixed-size, so downstream batch sizing is
    byte-predictable regardless of source image dims (the reason
    pipelines resize early at scale)."""

    def __init__(self, out_w: int = 8, out_h: int = 8, strict: bool = False):
        if strict:
            raise NotImplementedError(
                "real image codec unavailable; swap DeterministicFakeCodec"
            )
        self.codec = DeterministicFakeCodec()
        self.out_w, self.out_h = out_w, out_h

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape
        rows = (np.arange(self.out_h) * h) // self.out_h
        cols = (np.arange(self.out_w) * w) // self.out_w
        return img[rows][:, cols]

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs, lum, ok = [], [], []
        for payload in batch.column("payload").to_pylist():
            try:
                small = self._resize(self.codec.decode(payload))
                thumbs.append(small.tobytes())
                lum.append(float(small.mean()))
                ok.append(True)
            except Exception:
                thumbs.append(b"\x00" * (self.out_w * self.out_h))
                lum.append(0.0)
                ok.append(False)
        return (
            batch.drop_columns(["payload"])  # resized stage drops source bytes
            .append_column("thumb", pa.array(thumbs, pa.binary()))
            .append_column("thumb_w", pa.array([self.out_w] * len(ok), pa.int32()))
            .append_column("thumb_h", pa.array([self.out_h] * len(ok), pa.int32()))
            .append_column("thumb_luma", pa.array(lum, pa.float64()))
            .append_column("resize_ok", pa.array(ok, pa.bool_()))
        )


class ByteHistogram:
    """Actor-pool feature extractor over raw payload bytes (real compute,
    codec-free): 16-bin byte histogram as a fixed-size list column."""

    def __init__(self, bins: int = 16):
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            arr = np.frombuffer(payload or b"", dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=self.bins).astype(np.float64)
            total = hist.sum() or 1.0
            feats.append(hist / total)
        return batch.append_column(
            "byte_hist", pa.array(feats, pa.list_(pa.float64()))
        )


def frame_sample_stub(*_a, **_k):
    """Video frame sampling with a REAL demuxer (libav/ffmpeg) — strict
    boundary marker; the plumbing itself is FrameSampler below."""
    raise NotImplementedError("video demuxer unavailable; stub per SURVEY plan")


_VMAGIC = b"FAKEVID1"


def synth_video(n: int, seed: int = 43) -> pa.Table:
    """Deterministic fake video corpus: payload = magic + frame count +
    concatenated fake-image frames (each with its own header)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        n_frames = int(rng.integers(4, 24))
        frames = []
        for _ in range(n_frames):
            w, h = int(rng.integers(8, 32)), int(rng.integers(8, 32))
            px = rng.integers(0, 256, w * h, dtype=np.uint8)
            frames.append(
                _MAGIC + w.to_bytes(4, "big") + h.to_bytes(4, "big") + px.tobytes()
            )
        body = b"".join(
            len(f).to_bytes(4, "big") + f for f in frames
        )
        rows.append(_VMAGIC + n_frames.to_bytes(4, "big") + body)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(rows, pa.binary()),
            "mime": pa.array(["video/x-fake"] * n),
        }
    )


class FrameSampler:
    """Actor-pool 1:N stage: demux each video payload, keep every
    ``stride``-th frame up to ``max_frames``, emit ONE ROW PER SAMPLED
    FRAME with per-frame features — the fan-out shape a real
    libav-backed sampler plugs into (swap the demux/decode internals,
    keep the signature). Heavy payload bytes never leave this stage.

    strict=True raises where the real demuxer would be required."""

    def __init__(self, stride: int = 4, max_frames: int = 8, strict: bool = False):
        if strict:
            frame_sample_stub()
        self.stride = stride
        self.max_frames = max_frames
        self.codec = DeterministicFakeCodec()  # once per actor

    def _demux(self, payload: bytes) -> list[bytes]:
        if payload[:8] != _VMAGIC:
            raise ValueError("bad video magic")
        n_frames = int.from_bytes(payload[8:12], "big")
        frames, off = [], 12
        for _ in range(n_frames):
            ln = int.from_bytes(payload[off : off + 4], "big")
            off += 4
            frames.append(payload[off : off + ln])
            off += ln
        return frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, ws, hs, lum = [], [], [], [], []
        ids = batch.column("media_id").to_pylist()
        for mid, payload in zip(ids, batch.column("payload").to_pylist()):
            frames = self._demux(payload)
            picked = frames[:: self.stride][: self.max_frames]
            for j, fb in enumerate(picked):
                img = self.codec.decode(fb)
                mids.append(mid)
                fidx.append(j * self.stride)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                lum.append(float(img.mean()))
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_index": pa.array(fidx, pa.int32()),
                "frame_width": pa.array(ws, pa.int32()),
                "frame_height": pa.array(hs, pa.int32()),
                "mean_luma": pa.array(lum, pa.float64()),
            }
        )


def frame_sample_pipeline(video_ds, stride: int = 4, max_frames: int = 8,
                          concurrency: int = 2, avg_payload_bytes: int = 16_384):
    """Video → sampled-frame rows: byte-aware batches, actor pool, payload
    dropped inside the stage (the 1:N explode multiplies ROWS, not bytes)."""
    return video_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(stride=stride, max_frames=max_frames),
        batch_format="pyarrow",
        batch_size=suggest_batch_size(avg_payload_bytes),
        concurrency=concurrency,
    )


def planted_media_batch(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """PLANTED-TRUTH media synth (batch fn, runs distributed): payload is
    derived ONLY from the row id with arithmetic an external SQL oracle
    can mirror — w = 8 + id % 56, h = 8 + (id // 7) % 56, every pixel =
    (id * 37) % 256. The decode stage must therefore recover exactly
    those dims and a mean luminance of exactly that pixel value, turning
    the multimodal family from rows-only checks into value oracles while
    the decode path (header parse + full pixel-buffer mean) stays real."""
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    ws = (8 + ids % 56).astype(np.int32)
    hs = (8 + (ids // 7) % 56).astype(np.int32)
    vs = ((ids * 37) % 256).astype(np.uint8)
    payloads = [
        _MAGIC
        + int(w).to_bytes(4, "big")
        + int(h).to_bytes(4, "big")
        + bytes([int(v)]) * (int(w) * int(h))
        for w, h, v in zip(ws, hs, vs)
    ]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/x-fake"] * len(ids)),
            "width": pa.array(ws),
            "height": pa.array(hs),
        },
        schema=MEDIA_SCHEMA,
    )


def planted_video_batch(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Planted-truth video synth (batch fn): n_frames = 1 + id % 5; frame
    f has dims (8 + (id+f) % 24, 8 + (id*3+f) % 24) and constant pixel
    value (id*37 + f) % 256 — all SQL-reproducible, so the demux +
    per-frame decode emits oracle-checkable rows."""
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    rows = []
    for mid in ids.tolist():
        n_frames = 1 + mid % 5
        frames = []
        for f in range(n_frames):
            w = 8 + (mid + f) % 24
            h = 8 + (mid * 3 + f) % 24
            v = (mid * 37 + f) % 256
            frames.append(
                _MAGIC + w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([v]) * (w * h)
            )
        body = b"".join(len(fb).to_bytes(4, "big") + fb for fb in frames)
        rows.append(_VMAGIC + n_frames.to_bytes(4, "big") + body)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(rows, pa.binary()),
            "mime": pa.array(["video/x-fake"] * len(ids)),
        }
    )


def suggest_batch_size(avg_payload_bytes: int, budget_bytes: int = 64 * 2**20) -> int:
    """Rows per batch so one batch stays under ``budget_bytes`` of payload."""
    return max(16, int(budget_bytes / max(1, avg_payload_bytes)))


def decode_pipeline(media_ds, concurrency: int = 4, avg_payload_bytes: int = 4096):
    """The canonical multimodal stage wiring: byte-aware batch size +
    actor pool + heavy column dropped at the earliest stage."""
    return media_ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=suggest_batch_size(avg_payload_bytes),
        concurrency=concurrency,
    )


def resize_pipeline(
    media_ds,
    out_w: int = 8,
    out_h: int = 8,
    concurrency: int = 4,
    avg_payload_bytes: int = 4096,
):
    """Decode + thumbnail in one actor pass: variable-size payloads in,
    fixed-size rows out — downstream batches become byte-predictable."""
    return media_ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h),
        batch_format="pyarrow",
        batch_size=suggest_batch_size(avg_payload_bytes),
        concurrency=concurrency,
    )
