"""MessageLogSource (logpipe-input-kafka analog) consumer semantics."""

import os

import pytest

from logpipe_ray.sources.kafka_log import MessageLogSource, write_topic_fixture


@pytest.fixture()
def topic(tmp_path):
    d = str(tmp_path / "topic")
    write_topic_fixture(
        d,
        [
            (0, "k0", "alpha"),
            (0, "k1", "beta"),
            (1, "k2", "gamma"),
            (1, None, "no key here"),
        ],
    )
    return d


def rows(ds):
    return sorted(
        ds.take_all(), key=lambda r: (r["partition"], r["offset"])
    )


def test_read_partitions_offsets_keys(ray_session, topic, tmp_path):
    src = MessageLogSource(topic, str(tmp_path / "state"))
    assert src.partitions == [0, 1]
    got = rows(src.read())
    assert [(r["partition"], r["offset"], r["key"], r["value"]) for r in got] == [
        (0, 0, "k0", "alpha"),
        (0, 1, "k1", "beta"),
        (1, 0, "k2", "gamma"),
        (1, 1, None, "no key here"),
    ]


def test_commit_then_incremental_append(ray_session, topic, tmp_path):
    src = MessageLogSource(topic, str(tmp_path / "state"))
    assert len(rows(src.read())) == 4
    src.commit()
    # nothing new → empty increment (typed)
    src2 = MessageLogSource(topic, str(tmp_path / "state"))
    assert rows(src2.read()) == []
    # append to partition 0 (same segment) + a NEW segment on partition 1
    write_topic_fixture(topic, [(0, "k3", "delta")])
    write_topic_fixture(topic, [(1, "k4", "epsilon")], segment=1)
    src3 = MessageLogSource(topic, str(tmp_path / "state"))
    got = rows(src3.read())
    assert [(r["partition"], r["offset"], r["value"]) for r in got] == [
        (0, 2, "delta"),
        (1, 1 << 32, "epsilon"),  # segment 1, line 0 — still monotone
    ]


def test_read_repeatable_until_commit(ray_session, topic, tmp_path):
    src = MessageLogSource(topic, str(tmp_path / "state"))
    a = rows(src.read())
    # no commit → a fresh consumer in the same group re-reads the same increment
    src2 = MessageLogSource(topic, str(tmp_path / "state"))
    b = rows(src2.read())
    assert a == b


def test_value_with_tab_splits_only_first(ray_session, tmp_path):
    d = str(tmp_path / "t2")
    write_topic_fixture(d, [(0, "k", "val\twith\ttabs")])
    src = MessageLogSource(d, str(tmp_path / "state2"))
    [r] = rows(src.read())
    assert (r["key"], r["value"]) == ("k", "val\twith\ttabs")


def test_no_partitions_raises(tmp_path):
    os.makedirs(tmp_path / "empty_topic", exist_ok=True)
    with pytest.raises(ValueError, match="partition"):
        MessageLogSource(str(tmp_path / "empty_topic"), str(tmp_path / "s"))


class TestMessageLogSink:
    def test_produce_consume_roundtrip(self, ray_session, tmp_path):
        import ray.data

        from logpipe_ray.sources.kafka_log import produce_messages

        msgs = [{"key": str(i), "value": f"v{i}"} for i in range(50)]
        topic = str(tmp_path / "topic_out")
        parts = produce_messages(
            ray.data.from_items(msgs, override_num_blocks=5), topic, partitions=3
        ).to_pandas()
        assert parts["n_messages"].sum() == 50
        src = MessageLogSource(topic, str(tmp_path / "st"))
        got = {(r["key"], r["value"]) for r in src.read().take_all()}
        assert got == {(str(i), f"v{i}") for i in range(50)}

    def test_partitioning_deterministic_and_keyed(self, ray_session, tmp_path):
        """Same key always lands in the same partition, across tasks."""
        import ray.data

        from logpipe_ray.sources.kafka_log import produce_messages

        msgs = [{"key": str(i % 7), "value": f"m{i}"} for i in range(70)]
        topic = str(tmp_path / "topic_kp")
        produce_messages(
            ray.data.from_items(msgs, override_num_blocks=7), topic, partitions=4
        ).materialize()
        src = MessageLogSource(topic, str(tmp_path / "st2"))
        by_key = {}
        for r in src.read().take_all():
            by_key.setdefault(r["key"], set()).add(r["partition"])
        assert all(len(ps) == 1 for ps in by_key.values())

    def test_offsets_monotone_across_hash_named_segments(
        self, ray_session, tmp_path
    ):
        """Producer segment names are content hashes (arbitrary order);
        consumer offsets must STILL be monotone across reads because
        ordinals are assigned first-seen and persisted at commit."""
        import pyarrow as pa

        from logpipe_ray.sources.kafka_log import MessageLogSink

        topic = str(tmp_path / "topic_mono")
        sink = MessageLogSink(topic, partitions=1)
        sink(pa.table({"key": ["a"], "value": ["first"]}))
        src = MessageLogSource(topic, str(tmp_path / "st_mono"))
        got1 = src.read().take_all()
        src.commit()
        hi1 = max(r["offset"] for r in got1)

        # a second batch whose hash may sort BEFORE the first segment
        sink(pa.table({"key": ["b"], "value": ["second"]}))
        src2 = MessageLogSource(topic, str(tmp_path / "st_mono"))
        got2 = src2.read().take_all()
        assert [r["value"] for r in got2] == ["second"]
        assert got2[0]["offset"] > hi1  # strictly increasing across reads
        assert got2[0]["offset"] >= 0  # int64-safe (no << 32 overflow)

    def test_segment_names_fixed_width(self, ray_session, tmp_path):
        import os

        import pyarrow as pa

        from logpipe_ray.sources.kafka_log import MessageLogSink

        topic = str(tmp_path / "topic_width")
        MessageLogSink(topic, partitions=1)(
            pa.table({"key": ["x"], "value": ["y"]})
        )
        [name] = [f for _, _, fs in os.walk(topic) for f in fs]
        assert len(name) == len("segment-") + 20 + len(".log")

    def test_collision_refused_not_overwritten(self, ray_session, tmp_path):
        """A same-named segment with DIFFERENT content (64-bit hash
        collision) must raise, never silently replace delivered data."""
        import os

        import pyarrow as pa
        import pytest

        from logpipe_ray.sources.kafka_log import MessageLogSink

        topic = str(tmp_path / "topic_coll")
        sink = MessageLogSink(topic, partitions=1)
        sink(pa.table({"key": ["a"], "value": ["1"]}))
        [path] = [
            os.path.join(d, f) for d, _, fs in os.walk(topic) for f in fs
        ]
        with open(path, "w") as f:  # simulate a colliding earlier segment
            f.write("other\tcontent\n")
        with pytest.raises(RuntimeError, match="collision"):
            sink(pa.table({"key": ["a"], "value": ["1"]}))

    def test_null_key_roundtrip(self, ray_session, tmp_path):
        import pyarrow as pa

        from logpipe_ray.sources.kafka_log import MessageLogSink

        topic = str(tmp_path / "topic_nullk")
        MessageLogSink(topic, partitions=1)(
            pa.table({"key": [None, "k"], "value": ["bare", "keyed"]})
        )
        src = MessageLogSource(topic, str(tmp_path / "st_nullk"))
        got = {(r["key"], r["value"]) for r in src.read().take_all()}
        assert got == {(None, "bare"), ("k", "keyed")}

    def test_commit_crash_between_ordinals_and_offsets(
        self, ray_session, tmp_path
    ):
        """commit() persists ordinals BEFORE tail offsets: a crash
        between the two (simulated by deleting the tail's offsets.json
        after a full commit) replays the same increment under the SAME
        ordinals — identical offsets, monotonicity preserved."""
        import os

        import pyarrow as pa

        from logpipe_ray.sources.kafka_log import MessageLogSink

        topic = str(tmp_path / "topic_crash")
        sink = MessageLogSink(topic, partitions=1)
        sink(pa.table({"key": ["a"], "value": ["v1"]}))
        st = str(tmp_path / "st_crash")
        src = MessageLogSource(topic, st)
        first = {(r["offset"], r["value"]) for r in src.read().take_all()}
        src.commit()
        # crash window: ordinals persisted, tail offsets lost
        [offsets_json] = [
            os.path.join(d, f)
            for d, _, fs in os.walk(st)
            for f in fs
            if f == "offsets.json"
        ]
        os.remove(offsets_json)
        src2 = MessageLogSource(topic, st)
        replay = {(r["offset"], r["value"]) for r in src2.read().take_all()}
        assert replay == first  # same ordinals → same offsets
        src2.commit()
        # and a NEW segment still gets a strictly larger ordinal
        sink(pa.table({"key": ["b"], "value": ["v2"]}))
        src3 = MessageLogSource(topic, st)
        [(off, val)] = [
            (r["offset"], r["value"]) for r in src3.read().take_all()
        ]
        assert val == "v2" and off > max(o for o, _ in first)

    def test_segment_write_idempotent(self, ray_session, tmp_path):
        """Re-producing the same batch overwrites the same segment
        (content-hash names) — a task retry cannot duplicate messages."""
        import os

        import pyarrow as pa

        from logpipe_ray.sources.kafka_log import MessageLogSink

        topic = str(tmp_path / "topic_idem")
        sink = MessageLogSink(topic, partitions=2)
        b = pa.table({"key": ["a", "b", "c"], "value": ["1", "2", "3"]})
        sink(b)
        files1 = sorted(
            f for d, _, fs in os.walk(topic) for f in fs
        )
        sink(b)  # retry
        files2 = sorted(
            f for d, _, fs in os.walk(topic) for f in fs
        )
        assert files1 == files2
        src = MessageLogSource(topic, str(tmp_path / "st3"))
        assert len(src.read().take_all()) == 3
