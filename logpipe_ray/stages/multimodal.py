"""Multimodal payload plumbing: opaque binary columns + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns flowing
through the same routed pipeline as tokens (pass-through invariant
applies to bytes too). Real decoders (PIL/ffmpeg/torchaudio) are NOT
in this container, so the decode kernel is explicitly stubbed: the Ray
plumbing — schema, batch sizing, actor-pool signature, output layout —
is real and tested; ``DecodeStub`` raises ``NotImplementedError`` when
``real=True`` and otherwise derives deterministic fake metadata from
the payload bytes (so tests/oracles can verify the plumbing
end-to-end).

Batch-size note (memory-aware): binary payloads are large per row —
size ``batch_size`` so batch_bytes × concurrency fits the worker heap
(e.g. 4 MB images → batch_size ≤ 256 at 1 GB/actor).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def encode_payload(
    batch: pa.Table, *, text_col: str = "text", out_col: str = "payload"
) -> pa.Table:
    """Synthesize an opaque binary payload column (utf-8 bytes of the
    text — stands in for image/audio bytes in this container)."""
    return batch.append_column(out_col, pc.cast(batch[text_col], pa.binary()))


def encode_bmp_payload(
    batch: pa.Table, *, text_col: str = "text", out_col: str = "payload"
) -> pa.Table:
    """Synthesize VALID 24-bpp BMP images as the payload column
    (w = 1 + n_bytes(text) % 64, h = 1 + 7·n_bytes(text) % 64, black
    pixels) — real, decodable image bytes built without any codec
    library. Fully vectorized: per-row totals → one offsets cumsum →
    one shared uint8 buffer with numpy scatter writes for every header
    field; the payload column is a BinaryArray over that buffer
    (no per-row Python, no bytes objects)."""
    n = batch.num_rows
    nb = (
        pc.binary_length(pc.cast(batch[text_col], pa.binary()))
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    w = 1 + nb % 64
    h = 1 + (nb * 7) % 64
    stride = (w * 3 + 3) // 4 * 4  # BMP rows pad to 4-byte boundaries
    img = stride * h
    total = 54 + img
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total, out=offsets[1:])
    if offsets[-1] >= 2**31:
        raise ValueError("batch too large for int32 binary offsets; lower batch_size")
    buf = np.zeros(offsets[-1], dtype=np.uint8)
    s = offsets[:-1]

    def put_u32(off: int, val) -> None:
        v = np.asarray(val, dtype=np.uint32)
        for k in range(4):
            buf[s + off + k] = ((v >> (8 * k)) & 0xFF).astype(np.uint8)

    buf[s] = 0x42  # 'B'
    buf[s + 1] = 0x4D  # 'M'
    put_u32(2, total)  # file size
    put_u32(10, 54)  # pixel data offset
    put_u32(14, 40)  # BITMAPINFOHEADER size
    put_u32(18, w)
    put_u32(22, h)
    buf[s + 26] = 1  # planes (uint16 LE)
    buf[s + 28] = 24  # bits per pixel
    put_u32(34, img)  # image size
    put_u32(38, 2835)  # 72 DPI
    put_u32(42, 2835)
    payload = pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offsets.astype(np.int32)), pa.py_buffer(buf)],
    )
    return batch.append_column(out_col, payload)


def _binary_view(col) -> tuple[np.ndarray, np.ndarray]:
    """(absolute offsets int64[n+1], data uint8[]) view of a binary column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = np.frombuffer(
        col.buffers()[1], dtype=np.int32, count=len(col) + 1, offset=col.offset * 4
    ).astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return offsets, data


class DecodeStub:
    """Actor-pool decode stage (``map_batches(DecodeStub, concurrency=N,
    batch_size=small)``) — the real decoder's Ray-side shape.

    ``__init__`` is where a real implementation loads the codec/model
    once per actor. ``__call__`` emits typed metadata columns:
    payload_bytes, width, height (all int64).

    ``real=True`` is a REAL decoder for the BMP container format: it
    parses the BITMAPINFOHEADER (magic check + width/height at byte
    offsets 18/22, int32 LE) straight out of the Arrow data buffer with
    vectorized numpy gathers — no per-row Python, no codec library.
    Compressed formats (JPEG/PNG/audio/video) would need codecs this
    container doesn't ship, so non-BMP payloads under ``real=True``
    raise ``ValueError`` instead of silently faking. ``real=False``
    derives deterministic fake metadata from the byte length (plumbing
    tests for arbitrary opaque payloads).
    """

    def __init__(self, *, real: bool = False):
        self.real = real

    def __call__(self, batch: pa.Table) -> pa.Table:
        nbytes = pc.cast(pc.binary_length(batch["payload"]), pa.int64())
        if self.real:
            width, height = self._decode_bmp(batch["payload"])
        else:
            width = pc.add(
                pc.cast(pc.bit_wise_and(nbytes, 1023), pa.int64()), 64
            )
            height = pc.add(
                pc.cast(pc.bit_wise_and(pc.multiply(nbytes, 31), 1023), pa.int64()),
                64,
            )
        batch = batch.append_column("payload_bytes", nbytes)
        batch = batch.append_column("width", width)
        return batch.append_column("height", height)

    @staticmethod
    def _decode_bmp(col) -> tuple[pa.Array, pa.Array]:
        n = len(col)
        if n == 0:
            empty = pa.array([], type=pa.int64())
            return empty, empty
        offsets, data = _binary_view(col)
        lens = np.diff(offsets)
        if (lens < 26).any():
            raise ValueError("payload too short for a BMP header")
        s = offsets[:-1]
        if not ((data[s] == 0x42) & (data[s + 1] == 0x4D)).all():
            raise ValueError(
                "real decode supports BMP only in this container (no codec libs)"
            )
        hdr = data[s[:, None] + np.arange(18, 26)].astype(np.uint32)
        w = hdr[:, 0] | hdr[:, 1] << 8 | hdr[:, 2] << 16 | hdr[:, 3] << 24
        h = hdr[:, 4] | hdr[:, 5] << 8 | hdr[:, 6] << 16 | hdr[:, 7] << 24
        # int32 sign: negative height encodes top-down row order
        w = np.abs(w.astype(np.int32)).astype(np.int64)
        h = np.abs(h.astype(np.int32)).astype(np.int64)
        return pa.array(w), pa.array(h)


class ResizeStub:
    """Actor-pool image-resize stage (the preprocessing shape: load the
    resampler once per actor in ``__init__``, transform batches in
    ``__call__``). Real resampling needs PIL/libvips (not in this
    container — ``real=True`` raises); the fake "resize" truncates the
    payload to ``target_w × target_h`` bytes (a zero-copy Arrow slice),
    so output sizes are deterministic and SQL-oracle-checkable."""

    def __init__(self, *, target_w: int = 224, target_h: int = 224, real: bool = False):
        if real:
            raise NotImplementedError(
                "image resampling libs are not available in this container; "
                "run with real=False for the deterministic stub"
            )
        self.cap = target_w * target_h
        self.target_w = target_w
        self.target_h = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        nbytes = pc.cast(pc.binary_length(batch["payload"]), pa.int64())
        resized = pc.binary_slice(batch["payload"], 0, self.cap)
        out = batch.drop_columns(["payload"])
        out = out.append_column("payload_bytes", nbytes)
        out = out.append_column("resized", resized)
        out = out.append_column(
            "resized_bytes", pc.cast(pc.binary_length(resized), pa.int64())
        )
        out = out.append_column(
            "out_w", pa.array([self.target_w] * batch.num_rows, type=pa.int64())
        )
        return out.append_column(
            "out_h", pa.array([self.target_h] * batch.num_rows, type=pa.int64())
        )


class FrameSampleStub:
    """Actor-pool video frame-sampling stage: flat-map each payload into
    fixed-stride frames. Real demuxing needs ffmpeg (``real=True``
    raises); the fake treats the payload as raw frames of
    ``frame_stride`` bytes.

    The explode is ZERO-COPY: payload rows are contiguous in the Arrow
    data buffer, and frame boundaries within a row meet end-to-start,
    so the frame column is rebuilt as a ``BinaryArray`` over the SAME
    buffer with finer-grained offsets — no bytes are moved no matter
    how large the payloads are."""

    def __init__(self, *, frame_stride: int = 97, real: bool = False):
        if real:
            raise NotImplementedError(
                "video demuxers are not available in this container; "
                "run with real=False for the deterministic stub"
            )
        self.stride = frame_stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["payload"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = np.frombuffer(
            col.buffers()[1], dtype=np.int32, count=len(col) + 1,
            offset=col.offset * 4,
        ).astype(np.int64)
        lens = np.diff(offsets)
        n_frames = -(-lens // self.stride)  # ceil; empty payload → 0 frames
        total = int(n_frames.sum())
        row_rep = np.repeat(np.arange(len(lens), dtype=np.int64), n_frames)
        foff = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(n_frames, out=foff[1:])
        fi = np.arange(total, dtype=np.int64) - np.repeat(foff[:-1], n_frames)
        starts = offsets[:-1][row_rep] + fi * self.stride
        ends = np.minimum(starts + self.stride, offsets[1:][row_rep])
        # frame k's end == frame k+1's start (within and across rows),
        # so appending the final end yields valid contiguous offsets
        new_offsets = np.append(starts, offsets[-1] if total else offsets[0])
        frames = pa.Array.from_buffers(
            pa.binary(),
            total,
            [None, pa.py_buffer(new_offsets.astype(np.int32)), col.buffers()[2]],
        )
        return pa.table(
            {
                "doc_id": pc.take(batch["doc_id"], pa.array(row_rep)),
                "frame_idx": pa.array(fi, type=pa.int64()),
                "frame_bytes": pa.array(ends - starts, type=pa.int64()),
                "frame": frames,
            }
        )


def encode_wav_payload(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "payload",
    sample_rate: int = 16000,
) -> pa.Table:
    """Synthesize VALID PCM16 mono WAV files as the payload column —
    real, stdlib-``wave``-readable audio bytes built without any codec
    library (the audio sibling of :func:`encode_bmp_payload`).

    Deterministic content so an SQL oracle can recompute every decoded
    feature: n_samples = 1 + n_bytes(text) % 2048 and
    sample[i] = ((doc_id·1000003 + i·10007) mod 65536) − 32768.
    Fully vectorized: one offsets cumsum, numpy scatter writes for the
    RIFF/fmt/data headers, one flat int16 synth + one byte scatter for
    all sample payloads."""
    n = batch.num_rows
    nb = (
        pc.binary_length(pc.cast(batch[text_col], pa.binary()))
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    did = pc.cast(batch[id_col], pa.int64()).to_numpy(zero_copy_only=False)
    ns = 1 + nb % 2048
    data_bytes = 2 * ns
    total = 44 + data_bytes
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total, out=offsets[1:])
    if offsets[-1] >= 2**31:
        raise ValueError("batch too large for int32 binary offsets; lower batch_size")
    buf = np.zeros(offsets[-1], dtype=np.uint8)
    s = offsets[:-1]

    def put_u32(off: int, val) -> None:
        v = np.asarray(val, dtype=np.uint32)
        for k in range(4):
            buf[s + off + k] = ((v >> (8 * k)) & 0xFF).astype(np.uint8)

    def put_tag(off: int, tag: bytes) -> None:
        for k, ch in enumerate(tag):
            buf[s + off + k] = ch

    put_tag(0, b"RIFF")
    put_u32(4, total - 8)
    put_tag(8, b"WAVE")
    put_tag(12, b"fmt ")
    put_u32(16, 16)  # fmt chunk size
    buf[s + 20] = 1  # PCM (u16 LE)
    buf[s + 22] = 1  # mono
    put_u32(24, sample_rate)
    put_u32(28, sample_rate * 2)  # byte rate
    buf[s + 32] = 2  # block align
    buf[s + 34] = 16  # bits per sample
    put_tag(36, b"data")
    put_u32(40, data_bytes)
    # flat sample synthesis (one pass for the whole batch)
    flat_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(ns, out=flat_starts[1:])
    tot = int(flat_starts[-1])
    i_within = np.arange(tot, dtype=np.int64) - np.repeat(flat_starts[:-1], ns)
    did_flat = np.repeat(did, ns)
    samples = (
        (did_flat * 1000003 + i_within * 10007) % 65536 - 32768
    ).astype("<i2")
    sample_bytes = samples.view(np.uint8)
    byte_within = np.arange(2 * tot, dtype=np.int64) - np.repeat(
        2 * flat_starts[:-1], 2 * ns
    )
    dst = np.repeat(s + 44, 2 * ns) + byte_within
    buf[dst] = sample_bytes
    payload = pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offsets.astype(np.int32)), pa.py_buffer(buf)],
    )
    return batch.append_column(out_col, payload)


class WavDecode:
    """Actor-pool REAL audio decode + feature extraction for PCM16 mono
    WAV payloads — header fields and every sample parsed straight out
    of the Arrow data buffer with vectorized numpy gathers (no codec
    library, no per-row Python). Emits integer features so results are
    bit-reproducible: n_samples, sample_rate, sum_abs (Σ|sample|),
    zero_crossings (sign changes between consecutive samples).
    Compressed audio (mp3/ogg/flac) needs codecs this container
    doesn't ship — non-WAV payloads raise instead of silently faking
    (same honesty rule as DecodeStub's BMP-only real path)."""

    def __init__(self, *, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(
                "n_samples", pa.array([], type=pa.int64())
            ).append_column(
                "sample_rate", pa.array([], type=pa.int64())
            ).append_column(
                "sum_abs", pa.array([], type=pa.int64())
            ).append_column(
                "zero_crossings", pa.array([], type=pa.int64())
            )
        offsets, data = _binary_view(batch[self.payload_col])
        s = offsets[:-1]
        lens = np.diff(offsets)
        if (lens < 44).any():
            raise ValueError("payload too short for a WAV header")
        for off, tag in ((0, b"RIFF"), (8, b"WAVE"), (36, b"data")):
            for k, ch in enumerate(tag):
                if not (data[s + off + k] == ch).all():
                    raise ValueError(
                        "real decode supports PCM16 WAV only in this "
                        "container (no codec libs)"
                    )
        hdr = data[s[:, None] + np.arange(24, 28)].astype(np.uint32)
        rate = (hdr[:, 0] | hdr[:, 1] << 8 | hdr[:, 2] << 16 | hdr[:, 3] << 24).astype(np.int64)
        dz = data[s[:, None] + np.arange(40, 44)].astype(np.uint32)
        data_bytes = (dz[:, 0] | dz[:, 1] << 8 | dz[:, 2] << 16 | dz[:, 3] << 24).astype(np.int64)
        if ((data_bytes & 1) != 0).any() or (44 + data_bytes > lens).any():
            raise ValueError("corrupt data chunk size")
        ns = data_bytes // 2
        flat_starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ns, out=flat_starts[1:])
        tot = int(flat_starts[-1])
        byte_within = np.arange(2 * tot, dtype=np.int64) - np.repeat(
            2 * flat_starts[:-1], 2 * ns
        )
        src = np.repeat(s + 44, 2 * ns) + byte_within
        samples = data[src].view("<i2").astype(np.int64)
        # reduceat only over NONZERO-sample docs' starts (all < tot and
        # strictly increasing; zero-sample docs contribute no samples
        # between them, so each segment is exactly one doc's run) —
        # clamping shared boundaries instead would shift the PREVIOUS
        # doc's segment end and silently drop its last sample when a
        # zero-sample doc trails the batch
        nz = ns > 0
        nz_starts = flat_starts[:-1][nz]
        sum_abs = np.zeros(n, dtype=np.int64)
        zc = np.zeros(n, dtype=np.int64)
        if tot and nz.any():
            sum_abs[nz] = np.add.reduceat(np.abs(samples), nz_starts)
            neg = samples < 0
            change = np.zeros(tot, dtype=np.int64)
            if tot > 1:
                change[1:] = (neg[1:] != neg[:-1]).astype(np.int64)
            change[nz_starts] = 0  # no cross-doc crossings
            zc[nz] = np.add.reduceat(change, nz_starts)
        batch = batch.append_column("n_samples", pa.array(ns, type=pa.int64()))
        batch = batch.append_column("sample_rate", pa.array(rate, type=pa.int64()))
        batch = batch.append_column("sum_abs", pa.array(sum_abs, type=pa.int64()))
        return batch.append_column(
            "zero_crossings", pa.array(zc, type=pa.int64())
        )
