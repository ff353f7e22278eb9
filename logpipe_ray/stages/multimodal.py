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
