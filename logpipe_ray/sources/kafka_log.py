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
- **Offset = monotone int64 per partition**: ``segment_ordinal << 32 |
  line_no`` — opaque, strictly increasing within a partition, stable
  across reads (Kafka's offsets are equally opaque monotone ints).
  The ordinal is assigned by the CONSUMER in first-seen order (new
  segments sorted by name behind every previously-known one) and
  persisted with the group state at ``commit()`` — segment FILE NAMES
  are arbitrary (producers name segments by content hash), so deriving
  the offset from the name would be neither monotone nor int64-safe.
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

import fnmatch
import json
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


def _to_messages(
    batch: pa.Table, partition: int, ordinals: dict[str, int]
) -> pa.Table:
    """line rows (source=segment file, line_no, line) → message rows.

    ``ordinals`` maps segment basename → consumer-assigned ordinal (see
    module doc); the lookup is a vectorized index_in/take, no Python per
    row. A segment has at most 2^32 lines by the offset encoding (a
    segment is one producer batch, or a fixture file — both far below)."""
    if batch.num_rows == 0:
        return MESSAGE_SCHEMA.empty_table()
    names = pa.array(list(ordinals), type=pa.string())
    ord_vals = pa.array(list(ordinals.values()), type=pa.int64())
    idx = pc.index_in(batch["source"], value_set=names)
    if pc.any(pc.is_null(idx)).as_py():
        unknown = pc.unique(batch["source"].filter(pc.is_null(idx)))
        raise RuntimeError(
            f"segment(s) {unknown.to_pylist()} delivered without an "
            "ordinal — read() must plan ordinals before tailing"
        )
    seg = pc.take(ord_vals, idx)
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
        self._state_dirs: dict[int, str] = {}
        self._pending_ordinals: dict[int, dict[str, int]] | None = None
        for name in sorted(os.listdir(topic_dir)):
            m = _PARTITION_RE.match(name)
            if not m:
                continue
            p = int(m.group(1))
            sd = os.path.join(state_dir, group, name)
            self._state_dirs[p] = sd
            self._tails[p] = DirectoryTailSource(
                os.path.join(topic_dir, name),
                sd,
                include=["segment-*.log"],
            )
        if not self._tails:
            raise ValueError(f"no partition=N directories under {topic_dir!r}")

    @property
    def partitions(self) -> list[int]:
        return sorted(self._tails)

    # -- consumer-assigned segment ordinals (see module doc) -----------------

    def _ordinals_path(self, p: int) -> str:
        return os.path.join(self._state_dirs[p], "segments.json")

    def _load_ordinals(self, p: int) -> dict[str, int]:
        try:
            with open(self._ordinals_path(p)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _plan_ordinals(self, p: int) -> dict[str, int]:
        """Committed ordinals + new segments (sorted by name) appended
        behind them — deterministic, so read() stays repeatable until
        commit() even for hash-named segments."""
        ords = self._load_ordinals(p)
        part_dir = os.path.join(self.topic_dir, f"partition={p}")
        names = sorted(
            n
            for n in os.listdir(part_dir)
            if fnmatch.fnmatch(n, "segment-*.log")
        )
        nxt = max(ords.values(), default=-1) + 1
        for n in names:
            if n not in ords:
                ords[n] = nxt
                nxt += 1
        return ords

    def read(self) -> ray.data.Dataset:
        """Messages appended since the last commit(), all partitions."""
        from functools import partial

        parts = []
        pending: dict[int, dict[str, int]] = {}
        for p, tail in sorted(self._tails.items()):
            ords = self._plan_ordinals(p)
            pending[p] = ords
            # Close the listdir TOCTOU between _plan_ordinals() and the
            # tail's own _plan(): the tail reads EXACTLY the planned
            # segment set (exact-name set membership, not fnmatch — a
            # pattern list would cost O(segments²) per read on an aging
            # topic), so a segment published by a concurrent producer
            # between the two listings waits for the next read() instead
            # of arriving ordinal-less and crashing _to_messages
            # mid-execution.
            tail.include_names = set(ords)
            parts.append(
                tail.read().map_batches(
                    partial(_to_messages, partition=p, ordinals=ords),
                    batch_format="pyarrow",
                )
            )
        self._pending_ordinals = pending
        ds = parts[0]
        for other in parts[1:]:
            ds = ds.union(other)
        return ds

    def commit(self) -> None:
        """Durably advance every partition's offsets (atomic per partition).

        Ordinals persist BEFORE the tail offsets: a crash between the
        two re-reads the increment under the SAME ordinals (idempotent
        replay). The reverse order would mark segments consumed while
        losing their ordinal assignment — a later segment could then be
        assigned an already-delivered ordinal, breaking the monotone-
        offset invariant permanently."""
        for p, tail in sorted(self._tails.items()):
            if self._pending_ordinals and p in self._pending_ordinals:
                os.makedirs(self._state_dirs[p], exist_ok=True)
                tmp = self._ordinals_path(p) + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(self._pending_ordinals[p], f)
                os.replace(tmp, self._ordinals_path(p))
            tail.commit()
        self._pending_ordinals = None


class MessageLogSink:
    """Producer side — the ``logpipe-output-kafka`` analog
    (src-plugins/logpipe-output-kafka.c: per-block ``rd_kafka_produce``
    with delivery confirmation and flush-on-close).

    Broker semantics restated for a batch engine: a Kafka partition log
    is a sequence of SEGMENTS, each written by one producer at a time.
    Here every producing task appends its own exclusive segment per
    partition (segment id = a 64-bit content hash of the batch, written
    as a fixed-width 20-digit name so lexicographic file order is
    total), so parallel producers never interleave bytes; per-partition
    order = consumer-assigned segment ordinal then line order (see
    MessageLogSource — offsets do NOT come from the hash). Delivery
    confirmation ≈ write-temp + ``os.replace`` (a segment becomes
    visible atomically or not at all — a Ray task RETRY regenerates the
    same name + bytes and is a no-op; a 64-bit hash COLLISION between
    two different batches is refused loudly instead of silently
    overwriting a delivered segment). Consequence of content-hash
    naming: two byte-identical batches deliver once (content-idempotent
    exactly-once), which is the retry semantics we want.

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
        # Arrow-native formatting (the one-time pandas round-trip on the
        # hot write path was flagged in review): cast keys/values to
        # string with C++ kernels, build "key\tvalue" lines with
        # binary_join_element_wise, and join each partition's lines into
        # one buffer with binary_join — zero Python per message.
        keys = pc.cast(batch[self.key_col], pa.string())
        vals = pc.cast(batch[self.value_col], pa.string())
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        # null key → bare "value" line (no tab), the exact encoding the
        # consumer maps back to key=null — roundtrip-faithful (a tab in
        # a NULL-keyed value would mis-split on consume; keyed values
        # are safe, only the first tab splits)
        lines = pc.if_else(
            pc.is_null(keys),
            vals,
            pc.binary_join_element_wise(
                pc.fill_null(keys, ""), vals, "\t"
            ),
        )
        key_np = keys.to_numpy(zero_copy_only=False)
        part = (pd.util.hash_array(key_np) % self.partitions).astype(np.int64)
        # segment id per task: 64-bit content hash of this batch's
        # key+value bytes — a retry regenerates the same name + content
        # (idempotent no-op); 4 bytes would hash-collide at the birthday
        # bound (~77k batches/partition) and silently drop a segment.
        h = hashlib.blake2b(digest_size=8)
        for buf in lines.buffers():
            if buf is not None:
                h.update(buf)
        seg = int.from_bytes(h.digest(), "big")
        from logpipe_ray.util import join_lines

        counts: dict[int, int] = {}
        for p in np.unique(part).tolist():
            sub = lines.filter(pa.array(part == p))
            payload = join_lines(sub)
            d = os.path.join(self.topic_dir, f"partition={p}")
            os.makedirs(d, exist_ok=True)
            final = os.path.join(d, f"segment-{seg:020d}.log")
            if os.path.exists(final):
                with open(final) as f:
                    if f.read() != payload:
                        raise RuntimeError(
                            f"segment hash collision: {final} exists with "
                            "different content — refusing to overwrite a "
                            "delivered segment"
                        )
                counts[p] = len(sub)  # idempotent retry: already delivered
                continue
            tmp = f"{final}.tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(payload)
            os.replace(tmp, final)  # delivery confirmation: atomic visibility
            counts[p] = len(sub)
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
