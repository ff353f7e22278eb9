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

    def factory(fail_next_files=0, name="spool", uncompress=None):
        srv = start_collector(
            str(tmp_path / name),
            fail_next_files=fail_next_files,
            uncompress=uncompress,
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


_DEAD_HOLDS = []


def _dead_port() -> int:
    """A port that instantly refuses AND stays dead: bound but never
    listen()ed — connects get RST while the bind (held for the test
    session) keeps the OS from re-issuing the port to anyone else."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    _DEAD_HOLDS.append(s)  # hold the bind; freed at interpreter exit
    return s.getsockname()[1]


def _batch(sources_lines):
    srcs, lines = zip(*sources_lines)
    return pa.table({"source": list(srcs), "line": list(lines)})


def _spool_lines(tmp_path, *names):
    out = []
    for name in names:
        d = tmp_path / name
        if d.exists():
            for f in sorted(d.iterdir()):
                out += f.read_text().strip("\n").split("\n")
    return sorted(x for x in out if x)


def test_frame_compression_wire_layout():
    """compress='deflate' deflates each BLOCK; the length fields count
    the compressed bytes (crypto.c:6-49 analog)."""
    import zlib

    f = frame_file("a.log", b"A" * 100, compress="deflate")
    assert f[:1] == b"@"
    (name_len,) = struct.unpack(">H", f[1:3])
    body = f[3 + name_len :]
    (blen,) = struct.unpack(">I", body[:4])
    blk = body[8 : 8 + blen]
    assert blen < 100  # actually compressed
    assert zlib.decompress(blk) == b"A" * 100
    # zero terminator follows
    assert body[8 + blen : 8 + blen + 8] == struct.pack(">I", 0) + b"\x00" * 4


def test_compressed_roundtrip(collector, tmp_path):
    """Deflate sender + inflating collector: spool holds plain text."""
    srv = collector(name="spool_z", uncompress="deflate")
    sink = TcpFrameSink(
        "127.0.0.1", srv.port, compress="deflate", retry_wait_s=0.01
    )
    sink(_batch([("z.log", f"zz-{i}") for i in range(50)]))
    text = (tmp_path / "spool_z" / "z.log").read_text()
    assert sorted(text.strip("\n").split("\n")) == sorted(
        f"zz-{i}" for i in range(50)
    )
    assert srv.n_uncompress_errors == 0


def test_mixed_session_plain_sender_rejected(collector, tmp_path):
    """A PLAIN sender against an inflating collector is the reference's
    per-plugin-flag mismatch: inflate fails, the session is dropped
    without append or ack (output-file.c:326-333)."""
    srv = collector(name="spool_mix", uncompress="deflate")
    with socket.create_connection(("127.0.0.1", srv.port)) as s:
        s.sendall(frame_file("p.log", b"plain\n"))  # no compression
        assert s.recv(1) == b""  # closed, no ack
    assert srv.n_uncompress_errors == 1
    assert not (tmp_path / "spool_mix" / "p.log").exists()
    # a correctly-compressed session on the SAME collector still lands
    with socket.create_connection(("127.0.0.1", srv.port)) as s:
        s.sendall(frame_file("p.log", b"zipped\n", compress="deflate"))
        assert s.recv(1) == b"+"
    assert (tmp_path / "spool_mix" / "p.log").read_text() == "zipped\n"


def test_multi_peer_round_robin(collector, tmp_path):
    """Frames rotate across live peers (CheckAndConnectForwardSocket's
    index advance, output-tcp.c:140-146): with two live collectors,
    both spools receive work and the union is exactly-once."""
    a = collector(name="spool_rra")
    b = collector(name="spool_rrb")
    sink = TcpFrameSink(
        peers=[("127.0.0.1", a.port), ("127.0.0.1", b.port)],
        retry_wait_s=0.01,
    )
    # 4 distinct sources in one batch → 4 frames → 2 to each peer
    sink(_batch([(f"f{i}.log", f"line-{i}") for i in range(4)]))
    assert a.n_files == 2 and b.n_files == 2
    assert _spool_lines(tmp_path, "spool_rra", "spool_rrb") == sorted(
        f"line-{i}" for i in range(4)
    )


def test_failover_dead_peer_and_midstream_kill(collector, tmp_path):
    """One peer dead from the START (connect refused → disabled for the
    window) and one KILLED mid-stream (live sessions severed): every
    frame is still delivered exactly once (by content) to the
    surviving peers."""
    a = collector(name="spool_fa")
    b = collector(name="spool_fb")
    sink = TcpFrameSink(
        peers=[
            ("127.0.0.1", _dead_port()),  # dead from the start
            ("127.0.0.1", a.port),
            ("127.0.0.1", b.port),
        ],
        retry_wait_s=0.01,
        disable_timeout_s=0.2,
    )
    sink(_batch([(f"g{i}.log", f"pre-{i}") for i in range(4)]))
    assert sink.n_retries >= 1  # the dead peer cost at least one probe
    b.kill()  # aggregator dies mid-deployment, sessions severed
    sink(_batch([(f"g{i}.log", f"post-{i}") for i in range(4)]))
    assert _spool_lines(tmp_path, "spool_fa", "spool_fb") == sorted(
        [f"pre-{i}" for i in range(4)] + [f"post-{i}" for i in range(4)]
    )
    # post-kill frames all landed on the survivor
    assert _spool_lines(tmp_path, "spool_fa").count("post-0") + _spool_lines(
        tmp_path, "spool_fb"
    ).count("post-0") == 1


def test_single_peer_send_failure_still_reprobes(collector, tmp_path):
    """With ONE peer, a send failure must re-probe that peer after the
    retry wait even inside its disable window (the reference pins and
    reconnects the failed session) — the r4 single-peer
    reconnect-resend contract survives the multi-peer rewrite."""
    srv = collector(fail_next_files=1, name="spool_single")
    sink = TcpFrameSink(
        "127.0.0.1",
        srv.port,
        retry_wait_s=0.01,
        disable_timeout_s=60.0,  # window far longer than the test
    )
    sink(_batch([("s.log", "only-line")]))
    assert (tmp_path / "spool_single" / "s.log").read_text() == "only-line\n"
    assert sink.n_retries >= 1


def test_retry_budget_is_bounded_against_dead_peers():
    """ONE retry budget covers peer sweeps + sends: with every peer
    dead and max_retries=3, the sink must raise ConnectionError after
    ~max_retries sweeps (≤ one connect attempt per peer per sweep) —
    not max_retries² attempts (the r4 invariant a failover rewrite
    briefly regressed)."""
    import time as _time

    sink = TcpFrameSink(
        peers=[
            ("127.0.0.1", _dead_port()),
            ("127.0.0.1", _dead_port()),
        ],
        max_retries=3,
        retry_wait_s=0.01,
        disable_timeout_s=0.05,
    )
    t0 = _time.monotonic()
    with pytest.raises(ConnectionError):
        sink._send_frame(frame_file("x.log", b"payload"))
    assert _time.monotonic() - t0 < 5.0  # bounded, no quadratic blowup
    # ≤ (max_retries+1) sweeps × 2 peers connect attempts
    assert sink.n_retries <= (3 + 1) * 2
