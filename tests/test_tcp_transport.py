"""Real TCP frame transport: wire layout, collector roundtrip from Ray
tasks, reconnect-resend under injected session drops."""

import socket
import struct

import pyarrow as pa
import pytest
import ray.data

from logpipe_ray.sources.stream import DirectoryTailSource
from logpipe_ray.sources.tcp import (
    TcpFrameSink,
    frame_file,
    start_collector,
)


@pytest.fixture()
def collector(tmp_path):
    servers = []

    def factory(fail_next_files=0, name="spool"):
        srv = start_collector(
            str(tmp_path / name), fail_next_files=fail_next_files
        )
        servers.append(srv)
        return srv

    yield factory
    for s in servers:
        s.shutdown()


def test_frame_wire_layout():
    """Byte-exact frame: '@' + BE16 name len + name + (BE32 len +
    4 zero bytes + payload)* + zero length field — incl. the
    reference's htonl-into-uint64 quirk (output-tcp.c:392)."""
    f = frame_file("a.log", b"xyz", block_bytes=2)
    assert f == (
        b"@" + struct.pack(">H", 5) + b"a.log"
        + struct.pack(">I", 2) + b"\x00" * 4 + b"xy"
        + struct.pack(">I", 1) + b"\x00" * 4 + b"z"
        + struct.pack(">I", 0) + b"\x00" * 4
    )


def test_collector_appends_and_acks(collector, tmp_path):
    srv = collector()
    with socket.create_connection(("127.0.0.1", srv.port)) as s:
        s.sendall(frame_file("a.log", b"l1\nl2\n"))
        assert s.recv(1) == b"+"
        s.sendall(frame_file("a.log", b"l3\n"))  # merge-by-filename append
        assert s.recv(1) == b"+"
        s.sendall(frame_file("b.log", b"m1\n"))
        assert s.recv(1) == b"+"
    assert (tmp_path / "spool" / "a.log").read_text() == "l1\nl2\nl3\n"
    assert (tmp_path / "spool" / "b.log").read_text() == "m1\n"
    assert srv.n_files == 3


def test_bad_magic_drops_session(collector):
    srv = collector()
    with socket.create_connection(("127.0.0.1", srv.port)) as s:
        s.sendall(b"X" + struct.pack(">H", 1) + b"a")
        assert s.recv(1) == b""  # closed, no ack
    assert srv.n_files == 0


def test_ray_pipeline_over_the_wire(ray_session, collector, tmp_path):
    """collector→aggregator topology END-TO-END: Ray actor-pool sink
    forwards framed files over real sockets; the spool is consumed
    incrementally by DirectoryTailSource; every line arrives exactly
    once (no failures injected)."""
    srv = collector(name="spool_e2e")
    rows = pa.table(
        {
            "source": [f"{'abc'[i % 3]}.log" for i in range(600)],
            "line": [f"line-{i:04d}" for i in range(600)],
        }
    )
    parts = (
        ray.data.from_arrow(rows)
        .repartition(4)
        .map_batches(
            TcpFrameSink,
            fn_constructor_args=("127.0.0.1", srv.port),
            fn_constructor_kwargs={"retry_wait_s": 0.01},
            batch_format="pyarrow",
            batch_size=128,
            concurrency=2,
            num_cpus=0.5,
        )
        .to_pandas()
    )
    assert parts["n_lines"].sum() == 600
    tail = DirectoryTailSource(
        str(tmp_path / "spool_e2e"), str(tmp_path / "st"), include=["*.log"]
    )
    got = tail.read().take_all()
    assert sorted(r["line"] for r in got) == sorted(
        f"line-{i:04d}" for i in range(600)
    )
    # per-file attribution preserved across the wire: row i was sent to
    # '{'abc'[i % 3]}.log', so every spooled line must sit in its file
    for r in got:
        i = int(r["line"].split("-")[1])
        assert r["source"] == f"{'abc'[i % 3]}.log", r
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["line"])
    assert set(by_src) == {"a.log", "b.log", "c.log"}


def test_reconnect_resend_on_session_drop(ray_session, collector, tmp_path):
    """The collector drops 2 sessions after reading a full frame but
    BEFORE appending (no ack) — the sink must reconnect and resend;
    every line still arrives exactly once."""
    srv = collector(fail_next_files=2, name="spool_fail")
    rows = pa.table(
        {
            "source": ["x.log"] * 100,
            "line": [f"r-{i:03d}" for i in range(100)],
        }
    )
    ray.data.from_arrow(rows).repartition(2).map_batches(
        TcpFrameSink,
        fn_constructor_args=("127.0.0.1", srv.port),
        fn_constructor_kwargs={"retry_wait_s": 0.01},
        batch_format="pyarrow",
        batch_size=50,
        concurrency=1,
        num_cpus=0.5,
    ).to_pandas()
    text = (tmp_path / "spool_fail" / "x.log").read_text()
    assert sorted(text.strip("\n").split("\n")) == sorted(
        f"r-{i:03d}" for i in range(100)
    )


def test_registry_tcp_sink(ray_session, collector, tmp_path):
    from logpipe_ray.registry import SINKS

    srv = collector(name="spool_reg")
    rows = pa.table(
        {"source": ["z.log"] * 20, "line": [f"q{i}" for i in range(20)]}
    )
    ds = ray.data.from_arrow(rows).repartition(2)
    out = SINKS["tcp"](ds, "127.0.0.1", srv.port, concurrency=1).to_pandas()
    assert out["n_lines"].sum() == 20
    assert len((tmp_path / "spool_reg" / "z.log").read_text().split()) == 20
