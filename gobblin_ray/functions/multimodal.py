"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

Codec reality levels (each documented at its boundary):
- IMAGE: REAL decode for Netpbm P5/P6 (``PnmCodec`` — the standard PGM/PPM
  byte format, parsed with numpy; no external library needed), plus the
  legacy ``DeterministicFakeCodec`` header format. ``AutoCodec`` sniffs the
  magic. Compressed formats (JPEG/PNG) would slot in as another AutoCodec
  arm backed by PIL — not in this container, still the documented stub.
- AUDIO: REAL decode for PCM WAV via the stdlib ``wave`` module
  (``WavCodec``); features (duration/rms/peak) are real DSP over samples.
- VIDEO: the CONTAINER demux is the documented fake (no libav/ffmpeg
  here), but each contained frame is a real PGM image decoded by PnmCodec.

Batch-size note (SURVEY.md §4.5): media rows are wide — size batches by
BYTES, not rows (``suggest_batch_size``); a 100 KB payload means a few
hundred rows per batch, so batch x concurrency fits a worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


class PnmCodec:
    """REAL image codec: Netpbm binary PGM (P5, grayscale) and PPM (P6,
    RGB) — a standard interchange format whose decode is pure header
    parsing + a zero-copy numpy view over the pixel buffer. P6 decodes to
    ITU-style luminance via an exact per-pixel channel mean (float64)."""

    @staticmethod
    def encode_pgm(img: np.ndarray) -> bytes:
        img = np.ascontiguousarray(img, dtype=np.uint8)
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()

    @staticmethod
    def encode_ppm(img: np.ndarray) -> bytes:
        img = np.ascontiguousarray(img, dtype=np.uint8)
        h, w, _ = img.shape
        return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()

    def decode(self, payload: bytes) -> np.ndarray:
        magic = payload[:2]
        if magic not in (b"P5", b"P6"):
            raise ValueError("not a binary PGM/PPM payload")
        pos, vals, end = 2, [], len(payload)
        while len(vals) < 3:
            while pos < end and payload[pos : pos + 1].isspace():
                pos += 1
            if pos >= end:
                # bound the scan: b"".isspace() is False, so an unbounded
                # loop on a truncated header spins forever and the
                # decode_ok=False fallback (which needs an EXCEPTION)
                # never fires — one corrupt row wedged the actor
                raise ValueError("truncated PNM header")
            if payload[pos : pos + 1] == b"#":  # comment line
                nl = payload.find(b"\n", pos)
                if nl < 0:
                    raise ValueError("truncated PNM comment")
                pos = nl + 1
                continue
            start = pos
            while pos < end and not payload[pos : pos + 1].isspace():
                pos += 1
            if pos >= end or start == pos:
                raise ValueError("truncated PNM header")
            vals.append(int(payload[start:pos]))
        pos += 1  # exactly one whitespace byte after maxval
        w, h, maxv = vals
        if maxv != 255:
            raise ValueError("only 8-bit PNM supported")
        ch = 1 if magic == b"P5" else 3
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
        if ch == 1:
            return arr.reshape(h, w)
        return arr.reshape(h, w, 3).mean(axis=2)


class AutoCodec:
    """Magic-sniffing dispatcher: real PNM bytes decode for real; the
    legacy fake-header format still decodes (compatibility); anything else
    (JPEG/PNG/...) raises at the documented external-codec boundary."""

    def __init__(self):
        self.pnm = PnmCodec()
        self.fake = DeterministicFakeCodec()

    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:2] in (b"P5", b"P6"):
            return self.pnm.decode(payload)
        if payload[:8] == _MAGIC:
            return self.fake.decode(payload)
        raise NotImplementedError(
            "compressed image codec (JPEG/PNG) unavailable in this container"
        )


class MediaDecoder:
    """Actor-pool stage: decode payloads, verify claimed metadata, emit
    decoded dims + a mean-luminance feature. Codec loaded ONCE per actor.

    strict=True raises NotImplementedError where a real codec would be
    required (documents the stub boundary)."""

    def __init__(self, strict: bool = False):
        if strict:
            raise NotImplementedError(
                "compressed image codecs (JPEG/PNG) unavailable in this "
                "environment; install PIL and add an AutoCodec arm"
            )
        self.codec = AutoCodec()  # once per actor (real PNM + legacy fake)

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
                "compressed image codecs unavailable; install PIL"
            )
        self.codec = AutoCodec()
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
                lum.append(float(small.mean()))
                thumbs.append(
                    np.ascontiguousarray(small, dtype=np.uint8).tobytes()
                )
                ok.append(True)
            except Exception:
                thumbs.append(b"\x00" * (self.out_w * self.out_h))
                lum.append(0.0)
                ok.append(False)
        return (
            batch.drop_columns(["payload"])  # resized stage drops source bytes
            .append_column("thumb", pa.array(thumbs, pa.binary()))  # uint8 px
            .append_column("thumb_w", pa.array([self.out_w] * len(ok), pa.int32()))
            .append_column("thumb_h", pa.array([self.out_h] * len(ok), pa.int32()))
            .append_column("thumb_luma", pa.array(lum, pa.float64()))
            .append_column("resize_ok", pa.array(ok, pa.bool_()))
        )


class ByteHistogram:
    """Actor-pool feature extractor over raw payload bytes (real compute,
    codec-free): 16-bin byte histogram as a fixed-size list column."""

    def __init__(self, bins: int = 16):
        if bins < 1 or bins > 256 or 256 % bins:
            raise ValueError("bins must divide 256")
        self.bins = bins
        self.div = 256 // bins  # bucket = byte // div — honors ANY bins
        # (a hard-coded >> 4 made every bins value behave like 16)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            arr = np.frombuffer(payload or b"", dtype=np.uint8)
            hist = np.bincount(arr // self.div,
                               minlength=self.bins).astype(np.float64)
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
        self.codec = AutoCodec()  # frames are real PGM; container is the stub

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
            # per-row containment, like the sibling stages' decode_ok
            # contract: one corrupt container must not kill the batch
            # task (a 1:N stage signals failure as zero emitted frames)
            try:
                frames = self._demux(payload)
                picked = frames[:: self.stride][: self.max_frames]
                decoded = [self.codec.decode(fb) for fb in picked]
            except Exception:
                continue
            for j, img in enumerate(decoded):
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
    a REAL binary PGM image derived ONLY from the row id with arithmetic
    an external SQL oracle can mirror — w = 8 + id % 56,
    h = 8 + (id // 7) % 56, every pixel = (id * 37) % 256. The decode
    stage (real Netpbm parse + full pixel-buffer mean) must recover
    exactly those dims and a mean luminance of exactly that pixel value,
    so the multimodal family is value-oracled end to end through a
    standard byte format."""
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    ws = (8 + ids % 56).astype(np.int32)
    hs = (8 + (ids // 7) % 56).astype(np.int32)
    vs = ((ids * 37) % 256).astype(np.uint8)
    payloads = [
        PnmCodec.encode_pgm(np.full((int(h), int(w)), v, dtype=np.uint8))
        for w, h, v in zip(ws, hs, vs)
    ]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/x-portable-graymap"] * len(ids)),
            "width": pa.array(ws),
            "height": pa.array(hs),
        },
        schema=MEDIA_SCHEMA,
    )


def planted_video_batch(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Planted-truth video synth (batch fn): n_frames = 1 + id % 5; frame
    f has dims (8 + (id+f) % 24, 8 + (id*3+f) % 24) and constant pixel
    value (id*37 + f) % 256 — all SQL-reproducible, so the demux +
    per-frame decode emits oracle-checkable rows. Frames are REAL binary
    PGM images; only the surrounding container is the documented fake."""
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
                PnmCodec.encode_pgm(np.full((h, w), v, dtype=np.uint8))
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


# --------------------------------------------------------------------- audio

class WavCodec:
    """REAL audio codec: PCM WAV (RIFF) via the stdlib ``wave`` module —
    decode returns (int16 sample array, sample_rate). Mono 16-bit only
    (the canonical speech-corpus layout); other layouts raise at the
    boundary."""

    @staticmethod
    def encode(samples: np.ndarray, rate: int) -> bytes:
        import io
        import wave

        samples = np.ascontiguousarray(samples, dtype=np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(samples.tobytes())
        return buf.getvalue()

    def decode(self, payload: bytes) -> tuple[np.ndarray, int]:
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getnchannels() != 1 or w.getsampwidth() != 2:
                raise NotImplementedError("only mono 16-bit PCM supported")
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
        return np.frombuffer(raw, dtype=np.int16), rate


class AudioFeatures:
    """Actor-pool stage: real WAV decode + real DSP features per clip —
    sample count, duration, RMS, peak. Codec state built once per actor;
    the heavy payload column is dropped inside the stage."""

    def __init__(self):
        self.codec = WavCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, dur, rms, peak, ok = [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            try:
                x, rate = self.codec.decode(payload)
                xf = x.astype(np.float64)
                ns.append(len(x))
                dur.append(len(x) / rate)
                rms.append(float(np.sqrt(np.mean(xf * xf))) if len(x) else 0.0)
                peak.append(float(np.abs(xf).max()) if len(x) else 0.0)
                ok.append(True)
            except Exception:
                ns.append(0)
                dur.append(0.0)
                rms.append(0.0)
                peak.append(0.0)
                ok.append(False)
        return (
            batch.drop_columns(["payload"])
            .append_column("n_samples", pa.array(ns, pa.int64()))
            .append_column("duration_s", pa.array(dur, pa.float64()))
            .append_column("rms", pa.array(rms, pa.float64()))
            .append_column("peak", pa.array(peak, pa.float64()))
            .append_column("decode_ok", pa.array(ok, pa.bool_()))
        )


def planted_audio_batch(t: pa.Table, id_col: str = "doc_id",
                        rate: int = 8000) -> pa.Table:
    """Planted-truth audio synth (batch fn): REAL mono 16-bit PCM WAV
    clips with n = 800 + (id % 32)*40 constant-amplitude samples of
    A = 100 + (id*13) % 2000 — so n_samples, duration (n/rate), RMS (== A
    exactly: sqrt of a perfect square of an exact float64 integer sum) and
    peak (== A) are all SQL-reproducible from the id."""
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    payloads = []
    for mid in ids.tolist():
        n = 800 + (mid % 32) * 40
        amp = 100 + (mid * 13) % 2000
        payloads.append(WavCodec.encode(np.full(n, amp, dtype=np.int16), rate))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["audio/wav"] * len(ids)),
        }
    )


def audio_pipeline(audio_ds, concurrency: int = 2,
                   avg_payload_bytes: int = 8_192):
    """Audio → per-clip feature rows: byte-aware batches, actor pool,
    payload dropped inside the stage."""
    return audio_ds.map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        batch_size=suggest_batch_size(avg_payload_bytes),
        concurrency=concurrency,
    )


# ------------------------------------------------------ perceptual hashing

def ahash64(img: np.ndarray) -> np.uint64:
    """64-bit average hash (aHash — the classic perceptual image
    fingerprint used for LAION-style image near-dup): 8x8 block-mean
    downsample over integer grid boundaries (integral-image sums, exact
    float64 means), threshold each cell against the mean of the 64 cell
    means, pack row-major MSB-first. A pure per-image function of the
    pixels, so distributed hashing is batching-invariant and a sequential
    replay reproduces it bit-for-bit."""
    if img.ndim != 2:
        raise ValueError("ahash64 expects a 2-D luminance image")
    h, w = img.shape
    if h < 8 or w < 8:
        raise ValueError("image smaller than the 8x8 hash grid")
    ii = np.zeros((h + 1, w + 1), np.int64)
    np.cumsum(img.astype(np.int64), axis=0).cumsum(axis=1, out=ii[1:, 1:])
    rb = (np.arange(9) * h) // 8
    cb = (np.arange(9) * w) // 8
    s = ii[rb][:, cb]
    sums = s[1:, 1:] - s[:-1, 1:] - s[1:, :-1] + s[:-1, :-1]
    cnt = (rb[1:] - rb[:-1])[:, None] * (cb[1:] - cb[:-1])[None, :]
    means = sums / cnt
    bits = (means > means.mean()).reshape(-1)
    weights = np.uint64(1) << (np.uint64(63) - np.arange(64, dtype=np.uint64))
    return np.uint64((weights * bits.astype(np.uint64)).sum())


class PerceptualHasher:
    """Actor-pool stage: image payload -> (id, phash) rows. Codec sniffed
    once per actor; per-row decode is inherent to variable-size payloads
    (same posture as the md5 fingerprint stage). Undecodable or sub-grid
    payloads are DROPPED from the signature set (a hash they cannot
    contribute to is not a dedup signal) — callers needing an audit trail
    diff row counts against the input."""

    def __init__(self, id_col: str = "media_id", payload_col: str = "payload"):
        self.codec = AutoCodec()
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).to_numpy(zero_copy_only=False)
        out_ids: list[int] = []
        out_fp: list[np.uint64] = []
        for i, payload in enumerate(t.column(self.payload_col).to_pylist()):
            try:
                out_fp.append(ahash64(self.codec.decode(payload)))
                out_ids.append(int(ids[i]))
            except Exception:
                # undecodable payload (bad bytes, None, truncated header,
                # or a codec this container lacks) or sub-grid image: no
                # hash. Broad catch matches the MediaDecoder /
                # VideoFrameHasher drop contract — any per-row failure
                # drops the row, never the batch task.
                continue
        fp_arr = (
            np.asarray(out_fp, np.uint64).view(np.int64)
            if out_fp
            else np.array([], np.int64)
        )
        return pa.table(
            {
                self.id_col: pa.array(np.asarray(out_ids, np.int64)),
                "phash": pa.array(fp_arr),
            }
        )


def phash_pairs(
    media_ds,
    id_col: str = "media_id",
    num_partitions: int | None = None,
    max_hamming: int = 3,
    concurrency=(1, 4),
):
    """Image near-dup pairs by perceptual hash: the PerceptualHasher actor
    pool feeds the generic banded ``dedup.hamming_candidate_pairs`` kernel
    (one bounded exchange of 4 16-bit bands per image). Recall at radius
    <= 3 is exact by pigeonhole FOR BUCKETS UP TO the kernel's
    ``_SIMHASH_FULL_BUCKET`` triangle cap; a band bucket beyond it (e.g.
    thousands of solid-color thumbnails sharing one aHash) degrades to
    the sorted-window + identical-fingerprint-star pair-gen — dup
    CLUSTERS stay connected for a downstream connected-components pass,
    but the raw pair list is truncated. Analog of the text SimHash path
    with the fingerprint swapped for pixel-space aHash — the image half
    of a crawl-corpus dedup (image bytes never reach the exchange, only
    (id, 8-byte hash) rows)."""
    from .dedup import hamming_candidate_pairs

    sigs = media_ds.map_batches(
        PerceptualHasher,
        fn_constructor_kwargs=dict(id_col=id_col),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    )
    return hamming_candidate_pairs(
        sigs,
        "phash",
        id_col=id_col,
        num_partitions=num_partitions,
        max_hamming=max_hamming,
    )


def planted_neardup_media_batch(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Planted near-dup image corpus, a pure function of doc_id (the
    sequential oracle sidecar regenerates byte-identical payloads):
    doc_ids collapse into groups of 3 (g = doc_id // 3); variant 0 is the
    group's base 32x32 image, variant 1 perturbs two pixels by one level
    (block means move < 1/16 of a level -> Hamming usually 0), variant 2
    brightens one corner block (~1-2 bits plus whatever borderline cells
    the shifted global mean flips). Different groups are independent
    uniform noise — expected Hamming ~32, never candidates. Payloads are
    REAL binary PGM (P5) so the distributed stage exercises the real
    PnmCodec decode path."""
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    payloads = []
    for d in ids.tolist():
        g, v = d // 3, d % 3
        rng = np.random.default_rng(90_000 + g)
        px = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        if v == 1:
            px[0, 0] ^= 1
            px[16, 16] ^= 1
        elif v == 2:
            px[:4, :4] |= 0x80
        payloads.append(PnmCodec.encode_pgm(px))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/x-portable-graymap"] * len(ids)),
        }
    )


class VideoFrameHasher(FrameSampler):
    """Actor-pool stage: video payload -> one row per DISTINCT sampled
    frame aHash (media_id, fhash). Reuses FrameSampler's demux (container
    stub, real PGM frame decode); per-video distinct so a downstream
    shared-hash count is a true set-intersection size. Corrupt containers
    emit zero rows (same contract as the sibling 1:N stages)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        mids: list[int] = []
        hashes: list[np.uint64] = []
        ids = batch.column("media_id").to_pylist()
        for mid, payload in zip(ids, batch.column("payload").to_pylist()):
            try:
                frames = self._demux(payload)
                picked = frames[:: self.stride][: self.max_frames]
                fps = {ahash64(self.codec.decode(fb)) for fb in picked}
            except Exception:
                continue
            for fp in sorted(fps):
                mids.append(int(mid))
                hashes.append(fp)
        fp_arr = (
            np.asarray(hashes, np.uint64).view(np.int64)
            if hashes
            else np.array([], np.int64)
        )
        return pa.table(
            {
                "media_id": pa.array(np.asarray(mids, np.int64)),
                "fhash": pa.array(fp_arr),
            }
        )


def video_dup_pairs(
    video_ds,
    min_shared: int = 2,
    max_bucket: int = 64,
    stride: int = 1,
    max_frames: int = 8,
    num_partitions: int | None = None,
    concurrency=(1, 4),
):
    """Video near-dup pairs by shared sampled-frame fingerprints — the
    video analog of content-defined near-dup: two videos pair when they
    share >= ``min_shared`` distinct sampled-frame aHashes. ONE bounded
    exchange: (media_id, 8-byte fhash) rows partition on fhash %% P
    (video bytes never leave the hashing stage), each partition
    boundary-detects identical-hash buckets on one sort and emits the
    bucket triangle; a frame hash present in more than ``max_bucket``
    videos is a STOP FRAME (intros, black frames) and is dropped entirely
    — the deterministic cutoff the sequential oracle mirrors, which also
    bounds pair-gen at corpus scale. groupby(a, b) then counts shared
    hashes exactly (per-video hashes are distinct by construction)."""
    import ray
    from ray.data.aggregate import Count

    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)))
    P = num_partitions

    rows = video_ds.map_batches(
        VideoFrameHasher,
        fn_constructor_kwargs=dict(stride=stride, max_frames=max_frames),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )

    def add_partition(t: pa.Table) -> pa.Table:
        fh = t.column("fhash").to_numpy(zero_copy_only=False)
        part = (fh.view(np.uint64) % np.uint64(P)).astype(np.int32)
        return t.append_column("_bp", pa.array(part))

    add_partition.__name__ = "partition_by_fhash"

    def pairs_in_partition(group: pa.Table) -> pa.Table:
        ids = group.column("media_id").to_numpy(zero_copy_only=False)
        fh = group.column("fhash").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, fh))
        ids, fh = ids[order], fh[order]
        change = np.flatnonzero(np.diff(fh) != 0) + 1
        bounds = np.concatenate([[0], change, [len(ids)]])
        out_a, out_b = [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            m = hi - lo
            if m < 2 or m > max_bucket:  # singleton or stop frame
                continue
            seg = ids[lo:hi]
            ii, jj = np.triu_indices(m, k=1)
            out_a.append(seg[ii])
            out_b.append(seg[jj])
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(out_a)),
                         "b": pa.array(np.concatenate(out_b))})

    pairs_in_partition.__name__ = "frame_bucket_pairs"
    counted = (
        rows.map_batches(add_partition, batch_format="pyarrow",
                         batch_size=None)
        .groupby("_bp")
        .map_groups(pairs_in_partition, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="shared"))
    )

    def keep_min_shared(t: pa.Table) -> pa.Table:
        shared = pc.cast(t.column("shared"), pa.int64())
        t = t.set_column(t.schema.get_field_index("shared"), "shared", shared)
        return t.filter(pc.greater_equal(shared, min_shared))

    keep_min_shared.__name__ = "filter_min_shared"
    return counted.map_batches(keep_min_shared, batch_format="pyarrow",
                               batch_size=None)


def planted_neardup_video_batch(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Planted near-dup video corpus, a pure function of doc_id: groups of
    3 (g = doc_id // 3); variant 0 is six 16x16 PGM frames seeded by g,
    variant 1 replaces one frame with noise (5 shared), variant 2 keeps
    frames 2..5 and appends two noise frames (4 shared with v0). Frames
    are real binary PGM inside the documented fake container format."""
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    payloads = []
    for d in ids.tolist():
        g, v = d // 3, d % 3
        rng = np.random.default_rng(70_000 + g)
        frames = [
            rng.integers(0, 256, (16, 16)).astype(np.uint8) for _ in range(6)
        ]
        noise = np.random.default_rng(80_000 + d)
        if v == 1:
            frames[0] = noise.integers(0, 256, (16, 16)).astype(np.uint8)
        elif v == 2:
            frames = frames[2:] + [
                noise.integers(0, 256, (16, 16)).astype(np.uint8)
                for _ in range(2)
            ]
        blobs = [PnmCodec.encode_pgm(f) for f in frames]
        body = b"".join(len(b).to_bytes(4, "big") + b for b in blobs)
        payloads.append(_VMAGIC + len(blobs).to_bytes(4, "big") + body)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/x-fake"] * len(ids)),
        }
    )


def dedup_images(
    media_ds,
    id_col: str = "media_id",
    max_hamming: int = 3,
    num_partitions: int | None = None,
    concurrency=(1, 4),
):
    """Full image near-dup pipeline (the media analog of dedup_minhash):
    perceptual-hash pairs -> distributed connected components -> drop
    every non-representative cluster member (keep min id). The media
    dataset is consumed twice (hashing pass, final filter) — pass a
    materialized dataset when the upstream read is expensive. The driver
    holds only the node->label map of CONFIRMED dups."""
    from .dedup import _drop_non_representatives

    pairs = phash_pairs(
        media_ds,
        id_col=id_col,
        num_partitions=num_partitions,
        max_hamming=max_hamming,
        concurrency=concurrency,
    )
    return _drop_non_representatives(media_ds, pairs, id_col)
