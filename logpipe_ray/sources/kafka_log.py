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


class MessageLogSink:
    """Producer side — the ``logpipe-output-kafka`` analog
    (src-plugins/logpipe-output-kafka.c: per-block ``rd_kafka_produce``
    with delivery confirmation and flush-on-close).

    Broker semantics restated for a batch engine: a Kafka partition log
    is a sequence of SEGMENTS, each written by one producer at a time.
    Here every producing task appends its own exclusive segment per
    partition (segment id = deterministic per-task tag), so parallel
    producers never interleave bytes; per-partition order = segment
    order then line order, exactly what the consumer's ``segment <<
    32 | line`` offsets encode. Delivery confirmation ≈ write-temp +
    ``os.replace`` (a segment becomes visible atomically or not at
    all — Ray task retries overwrite the same name, idempotent).

    Use as a ``map_batches`` callable: rows must carry ``key_col`` /
    ``value_col``; partition = ``hash(key) % partitions`` via a
    content hash (NOT Python ``hash()`` — per-process salted).
    """

    def __init__(
        self,
        topic_dir: str,
        *,
        partitions: int = 4,
        key_col: str = "key",
        value_col: str = "value",
    ):
        self.topic_dir = topic_dir
        self.partitions = partitions
        self.key_col = key_col
        self.value_col = value_col
        os.makedirs(topic_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        import numpy as np
        import pandas as pd

        if batch.num_rows == 0:
            return pa.schema(
                [("partition", pa.int64()), ("n_messages", pa.int64())]
            ).empty_table()
        keys = batch[self.key_col].to_pandas().astype(str)
        vals = batch[self.value_col].to_pandas().astype(str)
        part = (
            pd.util.hash_array(keys.to_numpy(dtype=object)) % self.partitions
        ).astype(np.int64)
        # segment id per task: content-hash of this batch's keys — the
        # same batch (retry) lands on the same segment name (idempotent)
        seg = int.from_bytes(
            hashlib.blake2b(
                "\x00".join(keys.tolist()).encode(), digest_size=4
            ).digest(),
            "big",
        )
        counts: dict[int, int] = {}
        for p in sorted(set(part.tolist())):
            rows = [
                f"{k}\t{v}"
                for k, v in zip(keys[part == p], vals[part == p])
            ]
            d = os.path.join(self.topic_dir, f"partition={p}")
            os.makedirs(d, exist_ok=True)
            final = os.path.join(d, f"segment-{seg:08d}.log")
            tmp = final + ".tmp"
            with open(tmp, "w") as f:
                f.write("\n".join(rows) + "\n")
            os.replace(tmp, final)  # delivery confirmation: atomic visibility
            counts[p] = len(rows)
        return pa.table(
            {
                "partition": pa.array(sorted(counts), type=pa.int64()),
                "n_messages": pa.array(
                    [counts[p] for p in sorted(counts)], type=pa.int64()
                ),
            }
        )


def produce_messages(
    ds: ray.data.Dataset,
    topic_dir: str,
    *,
    partitions: int = 4,
    key_col: str = "key",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Produce a Dataset into a message-log topic; returns per-partition
    message-count partials (fold with smallagg.fold_partials)."""
    return ds.map_batches(
        MessageLogSink(
            topic_dir,
            partitions=partitions,
            key_col=key_col,
            value_col=value_col,
        ),
        batch_format="pyarrow",
    )


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
