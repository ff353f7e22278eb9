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


class DecodeStub:
    """Actor-pool decode stage (``map_batches(DecodeStub, concurrency=N,
    batch_size=small)``) — the real decoder's Ray-side shape.

    ``__init__`` is where a real implementation loads the codec/model
    once per actor. ``__call__`` emits typed metadata columns:
    payload_bytes (int64), width, height (int64 — deterministic fakes
    derived from the byte length; a real decoder reads the header).
    """

    def __init__(self, *, real: bool = False):
        if real:
            raise NotImplementedError(
                "image/audio codecs are not available in this container; "
                "run with real=False for the deterministic stub"
            )
        self.real = real

    def __call__(self, batch: pa.Table) -> pa.Table:
        nbytes = pc.cast(pc.binary_length(batch["payload"]), pa.int64())
        width = pc.add(pc.multiply(pc.cast(pc.bit_wise_and(nbytes, 1023), pa.int64()), 1), 64)
        height = pc.add(
            pc.cast(
                pc.bit_wise_and(pc.multiply(nbytes, 31), 1023), pa.int64()
            ),
            64,
        )
        batch = batch.append_column("payload_bytes", nbytes)
        batch = batch.append_column("width", width)
        return batch.append_column("height", height)


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
