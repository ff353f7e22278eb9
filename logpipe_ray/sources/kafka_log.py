"""Message-log consumer — the ``logpipe-input-kafka`` analog.

Reference: ``src-plugins/logpipe-input-kafka.c:96-252`` — the plugin
polls a consumer for messages and feeds each message's value through
the pipeline; the broker tracks per-partition offsets committed after
delivery. There is no broker in this sandbox, so the topic is modeled
by its on-disk essence: a PARTITIONED APPEND-ONLY MESSAGE LOG —

    topic_dir/
      partition=0/segment-00000000.log     # one message per line,
      partition=0/segment-00000001.log     # "key<TAB>value" or "value"
      partition=1/segment-00000000.log
      ...

exactly the layout a Kafka broker keeps per partition. Consumer
semantics carried over faithfully:

- **Partition = unit of parallelism and ordering**: each partition is
  tailed independently (one task set per partition); messages within a
  partition are delivered in offset order; no order across partitions.
- **Offset = monotone int64 per partition**: ``segment_index << 32 |
  line_no`` — opaque, strictly increasing within a partition, stable
  across reads (Kafka's offsets are equally opaque monotone ints).
- **Commit-after-deliver**: ``read()`` returns everything after the
  last committed offsets and is repeatable until ``commit()`` — crash
  between the two re-reads the same increment (at-least-once into an
  idempotent sink; same discipline as sources/stream.py and the
  reference's src/output.c:280-302 commit order).
- A message spanning an unflushed write (no trailing newline) is not
  consumed until terminated (split-line carry, src/util.c:585-666).

Built on :class:`~logpipe_ray.sources.stream.DirectoryTailSource` (one
per partition directory, sharing one state root), with a vectorized
map over the line rows: partition/offset columns + first-TAB key/value
split (Arrow kernels, no per-message Python).
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from logpipe_ray.sources.stream import DirectoryTailSource

MESSAGE_SCHEMA = pa.schema(
    [
        ("partition", pa.int64()),
        ("offset", pa.int64()),
        ("key", pa.string()),
        ("value", pa.string()),
    ]
)

_PARTITION_RE = re.compile(r"^partition=(\d+)$")
_SEGMENT_RE = r"^segment-(?P<seg>\d+)\.log$"


def _to_messages(batch: pa.Table, partition: int) -> pa.Table:
    """line rows (source=segment file, line_no, line) → message rows."""
    if batch.num_rows == 0:
        return MESSAGE_SCHEMA.empty_table()
    seg = pc.cast(
        pc.struct_field(pc.extract_regex(batch["source"], _SEGMENT_RE), "seg"),
        pa.int64(),
    )
    offset = pc.add(
        pc.shift_left(seg, 32), pc.subtract(batch["line_no"], 1)
    )
    # key<TAB>value split on the FIRST tab; no tab → key null, all value.
    # Gather first/last elements through the flat list buffers (lists
    # have 1 or 2 elements; pc.list_element can't index ragged tails).
    import numpy as np

    parts = pc.split_pattern(batch["line"], "\t", max_splits=1)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    off = np.asarray(parts.offsets)
    lens = np.diff(off)
    value = pc.take(parts.values, pa.array(off[1:] - 1))
    key = pc.if_else(
        pa.array(lens == 2),
        pc.take(parts.values, pa.array(off[:-1])),
        pa.nulls(batch.num_rows, pa.string()),
    )
    return pa.table(
        {
            "partition": pa.array([partition] * batch.num_rows, type=pa.int64()),
            "offset": pc.cast(offset, pa.int64()),
            "key": key,
            "value": value,
        }
    )


class MessageLogSource:
    """Consumer-group handle over a partitioned message-log topic dir."""

    def __init__(self, topic_dir: str, state_dir: str, *, group: str = "g0"):
        self.topic_dir = topic_dir
        self._tails: dict[int, DirectoryTailSource] = {}
        for name in sorted(os.listdir(topic_dir)):
            m = _PARTITION_RE.match(name)
            if not m:
                continue
            p = int(m.group(1))
            self._tails[p] = DirectoryTailSource(
                os.path.join(topic_dir, name),
                os.path.join(state_dir, group, name),
                include=["segment-*.log"],
            )
        if not self._tails:
            raise ValueError(f"no partition=N directories under {topic_dir!r}")

    @property
    def partitions(self) -> list[int]:
        return sorted(self._tails)

    def read(self) -> ray.data.Dataset:
        """Messages appended since the last commit(), all partitions."""
        from functools import partial

        parts = []
        for p, tail in sorted(self._tails.items()):
            parts.append(
                tail.read().map_batches(
                    partial(_to_messages, partition=p), batch_format="pyarrow"
                )
            )
        ds = parts[0]
        for other in parts[1:]:
            ds = ds.union(other)
        return ds

    def commit(self) -> None:
        """Durably advance every partition's offsets (atomic per partition)."""
        for tail in self._tails.values():
            tail.commit()


def write_topic_fixture(
    topic_dir: str,
    messages: list[tuple[int, str, str]],
    *,
    segment: int = 0,
) -> None:
    """Append (partition, key, value) messages as one segment per
    partition — the test/fixture producer (a real deployment's log is
    written by the broker)."""
    by_part: dict[int, list[str]] = {}
    for part, key, value in messages:
        by_part.setdefault(part, []).append(
            f"{key}\t{value}" if key is not None else value
        )
    for part, lines in by_part.items():
        d = os.path.join(topic_dir, f"partition={part}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"segment-{segment:08d}.log"), "a") as f:
            f.write("\n".join(lines) + "\n")
