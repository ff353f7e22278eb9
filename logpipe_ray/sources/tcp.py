"""Real TCP frame transport — the logpipe collector→aggregator wire.

The reference forwards file content over TCP with this frame layout
(logpipe-output-tcp.c:340-470 sender, logpipe-input-tcp.c:221-361
receiver):

- file header: ``'@'`` magic (LOGPIPE_COMM_HEAD_MAGIC,
  src/logpipe_api.h:114) + uint16 big-endian filename length +
  filename bytes;
- then blocks: an 8-byte length field + that many payload bytes;
- a zero length field terminates the file; the session then carries
  the next file header (or closes).

Wire quirk kept bit-faithful: the sender declares the length field
``uint64_t`` but assigns ``htonl(block_len)`` (output-tcp.c:392) — on
the little-endian hosts the reference runs on, the 8 wire bytes are a
4-byte BIG-ENDIAN 32-bit length followed by 4 zero bytes. We emit and
parse exactly those bytes.

Multi-peer forwarding (output-tcp.c:120-200 ``CheckAndConnectForwardSocket``,
same for ingeek's 1-32 sinks, logpipe-output-ingeek.c:223-307): the
sender takes 1-N forward peers, round-robins file frames across them,
and on a connect failure disables that peer for ``disable_timeout_s``
(the reference's ``enable_timestamp = time(NULL) + disable_timeout``,
default ``DISABLE_TIMEOUT`` = 60 s) before re-probing. One documented
deviation from that routine: the reference retries a MID-SEND transport
failure against the same peer forever (the ``forward_session_index >= 0``
path pins the session); here a send failure also disables the peer and
fails the frame over to the next one — a dead aggregator costs one
disable window instead of stalling the actor.

Optional wire compression (src/crypto.c:6-103 ``CompressInputPluginData``
analog): ``compress="deflate"`` on the sink zlib-deflates each BLOCK
payload in flight (the frame layout already carries explicit lengths,
so nothing else changes); ``uncompress="deflate"`` on the collector
inflates each block before the spool append — per-plugin flags on each
side, exactly like the reference pairs an input plugin's
``compress_algorithm`` with the output plugin's ``uncompress_algorithm``
(logpipe-output-file.c:299-356). A mixed session — plain sender hitting
an inflating collector — fails the inflate and drops the session
without appending or acking, the reference's error path
(output-file.c:326-333 returns -1 and drops the trace file).

Two documented deviations, both closing reference defects:

1. On a mid-file transport failure the reference reconnects and
   resends only the current BLOCK (the ``_GOTO_WRITEN_*`` loops) — but
   the receiver expects a fresh ``@`` header on a new session, so the
   resumed stream is a protocol violation. Here the sender resends the
   whole FILE FRAME from its header after reconnect.
2. The reference has NO acknowledgement: ``writen`` returning only
   proves the bytes reached the local kernel buffer, so a connection
   drop after the last send silently loses the tail of the stream.
   Here the receiver ACKs one ``+`` byte after durably appending a
   frame, and the sender resends the frame until acked — at-least-once
   for real (a lost ack after append duplicates the frame; the
   receiver APPENDS by filename, merge-by-filename, so duplicates flow
   to downstream dedup — the same contract as every other source
   here).

Batch restatement:

- :class:`TcpFrameSink` — actor-pool ``map_batches`` callable: one
  persistent socket per actor, batch rows grouped by ``source``
  (filename), one file frame per group, reconnect-retry-resend.
- :class:`TcpCollectorServer` — threaded acceptor (one thread per
  session, the epoll-session analog) appending received blocks to
  ``spool_dir/<filename>``; consume the spool incrementally with
  :class:`~logpipe_ray.sources.stream.DirectoryTailSource` (offset
  commit), completing collector → aggregator → Dataset.
"""

from __future__ import annotations

import os
import socket
import socketserver
import struct
import threading
import time
import zlib

import pyarrow as pa
import pyarrow.compute as pc

MAGIC = b"@"  # LOGPIPE_COMM_HEAD_MAGIC
DISABLE_TIMEOUT_S = 60.0  # output-tcp.c DISABLE_TIMEOUT default


def _len_field(n: int) -> bytes:
    """8-byte length field: BE32 length + 4 zero bytes (module doc)."""
    return struct.pack(">I", n) + b"\x00\x00\x00\x00"


def frame_file(
    filename: str,
    payload: bytes,
    *,
    block_bytes: int = 1 << 20,
    compress: str | None = None,
) -> bytes:
    """One complete file frame: header + length-prefixed blocks + 0-len.

    ``compress="deflate"`` zlib-deflates each block payload (the zlib
    stream format ``deflateInit`` produces, crypto.c:14); block
    boundaries and the length fields describe the COMPRESSED bytes,
    exactly as the reference frames compressed input-plugin blocks."""
    name = filename.encode()
    if len(name) > 4096:  # PATH_MAX guard (input-tcp.c:264-269)
        raise ValueError(f"filename too long: {len(name)}")
    if compress is not None and compress != "deflate":
        raise ValueError(f"compress_algorithm {compress!r} invalid")  # crypto.c:44
    out = [MAGIC, struct.pack(">H", len(name)), name]
    for i in range(0, len(payload), block_bytes):
        blk = payload[i : i + block_bytes]
        if compress:
            blk = zlib.compress(blk)
        out += [_len_field(len(blk)), blk]
    out.append(_len_field(0))
    return b"".join(out)


class TcpFrameSink:
    """Actor-pool forwarder (output-tcp analog). Rows need a
    ``source_col`` (filename) and ``line_col``; each batch sends one
    file frame per distinct source, round-robined across 1-N forward
    peers with per-peer disable-timeout failover (module doc),
    reconnect-retry-resending the WHOLE frame on transport failure.

    ``peers`` is a list of ``(host, port)`` (or ``"host:port"``
    strings, the config-file form); the positional ``host, port`` pair
    remains the single-peer shorthand."""

    def __init__(
        self,
        host: str | None = None,
        port: int | None = None,
        *,
        peers: list | None = None,
        source_col: str = "source",
        line_col: str = "line",
        block_bytes: int = 1 << 20,
        max_retries: int = 60,
        retry_wait_s: float = 0.05,
        disable_timeout_s: float = DISABLE_TIMEOUT_S,
        compress: str | None = None,
    ):
        if peers is None:
            if host is None or port is None:
                raise ValueError("need host+port or peers=[...]")
            peers = [(host, port)]
        elif host is not None or port is not None:
            raise ValueError(
                "pass host+port OR peers=[...], not both — the "
                "positional pair would be silently ignored"
            )
        self.peers: list[tuple[str, int]] = []
        for p in peers:
            if isinstance(p, str):
                h, _, pt = p.rpartition(":")
                if not h:
                    # '' resolves to localhost — silently misdirected
                    # frames; surface the malformed entry instead
                    raise ValueError(f"peer {p!r} must be 'host:port'")
                self.peers.append((h, int(pt)))
            else:
                self.peers.append((p[0], int(p[1])))
        self.source_col = source_col
        self.line_col = line_col
        self.block_bytes = block_bytes
        self.max_retries = max_retries
        self.retry_wait_s = retry_wait_s
        self.disable_timeout_s = disable_timeout_s
        self.compress = compress
        self._socks: list[socket.socket | None] = [None] * len(self.peers)
        # monotonic deadline before which the peer is skipped
        # (ForwardSession.enable_timestamp analog, output-tcp.c:150-156)
        self._enable_at = [0.0] * len(self.peers)
        self._rr = len(self.peers) - 1  # first advance lands on peer 0
        self.n_retries = 0

    def _drop(self, i: int, *, disable: bool) -> None:
        s, self._socks[i] = self._socks[i], None
        if s is not None:
            try:
                s.close()
            except OSError:
                pass
        if disable:
            self._enable_at[i] = time.monotonic() + self.disable_timeout_s

    def _next_peer(self) -> int | None:
        """ONE round-robin sweep (CheckAndConnectForwardSocket's inner
        pass, output-tcp.c:130-200): advance the index, skip peers
        inside their disable window, reuse a live socket, else attempt
        ONE connect per peer (failure disables the peer). Returns None
        when the sweep found no usable peer — the retry budget belongs
        to the _send_frame loop ALONE (an inner retry loop here would
        multiply to max_retries² connect attempts against a down
        endpoint — the r4 single-peer invariant, kept)."""
        all_disabled = True
        for _ in range(len(self.peers)):
            self._rr = (self._rr + 1) % len(self.peers)
            i = self._rr
            if time.monotonic() < self._enable_at[i]:
                continue
            all_disabled = False
            self._enable_at[i] = 0.0
            if self._socks[i] is not None:
                return i
            try:
                s = socket.create_connection(self.peers[i], timeout=10)
                # the reference sets TCP_NODELAY on forward sockets
                # (output-tcp.c:176-179); with an ack per frame,
                # Nagle + delayed-ACK otherwise stalls small frames
                s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                self._socks[i] = s
                return i
            except OSError:
                self._drop(i, disable=True)
                self.n_retries += 1
        if all_disabled:
            # Every peer is inside its disable window. The reference
            # pins and immediately reconnects the failed session in
            # this situation (output-tcp.c forward_session_index >= 0
            # skips the enable_timestamp check) — re-enable the
            # soonest peer so the NEXT sweep probes it.
            self._enable_at[min(
                range(len(self.peers)), key=self._enable_at.__getitem__
            )] = 0.0
        return None

    def _send_frame(self, frame: bytes) -> None:
        """Same loop shape as stages/es_sink.EsBulkSink._post, plus
        peer failover: a send/ack failure disables the peer for
        disable_timeout_s and resends the whole frame to the next one
        (documented deviation — the reference pins the session). ONE
        retry budget covers everything: each of the max_retries+1
        attempts is at most one peer sweep (≤ one connect per peer)
        plus one send — bounded time against any failure pattern."""
        last: Exception | None = None
        for _ in range(self.max_retries + 1):
            i = self._next_peer()
            if i is None:
                time.sleep(self.retry_wait_s)
                continue
            try:
                self._socks[i].sendall(frame)
                ack = self._socks[i].recv(1)  # delivery ack (module doc #2)
                if ack != b"+":
                    raise OSError("connection closed before ack")
                return
            except OSError as e:
                last = e
                self._drop(i, disable=True)
                self.n_retries += 1
                time.sleep(self.retry_wait_s)
        raise ConnectionError(
            f"tcp sink: frame undeliverable to any of {self.peers} "
            f"after {self.max_retries} retries"
        ) from last

    def __call__(self, batch: pa.Table) -> pa.Table:
        schema = pa.schema([("source", pa.string()), ("n_lines", pa.int64())])
        if batch.num_rows == 0:
            return schema.empty_table()
        src = pc.cast(batch[self.source_col], pa.string())
        lines = pc.cast(batch[self.line_col], pa.string())
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        enc = pc.dictionary_encode(src)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        import numpy as np

        codes = enc.indices.to_numpy(zero_copy_only=False)
        out_src, out_n = [], []
        from logpipe_ray.util import join_lines

        for code, name in enumerate(enc.dictionary.to_pylist()):
            sub = lines.filter(pa.array(codes == code))
            self._send_frame(
                frame_file(
                    name,
                    join_lines(sub).encode(),
                    block_bytes=self.block_bytes,
                    compress=self.compress,
                )
            )
            out_src.append(name)
            out_n.append(len(sub))
        return pa.table(
            {
                "source": pa.array(out_src, type=pa.string()),
                "n_lines": pa.array(out_n, type=pa.int64()),
            }
        )


class _SessionHandler(socketserver.BaseRequestHandler):
    def _readn(self, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = self.request.recv(n - len(buf))
            if not chunk:
                return None  # peer closed
            buf += chunk
        return buf

    def handle(self):
        srv: TcpCollectorServer = self.server  # type: ignore[assignment]
        with srv.spool_lock:
            srv._sessions.add(self.request)
        try:
            self._session_loop(srv)
        finally:
            with srv.spool_lock:
                srv._sessions.discard(self.request)

    def _session_loop(self, srv: "TcpCollectorServer"):
        while True:
            head = self._readn(3)
            if head is None:
                return
            if head[0:1] != MAGIC:
                return  # invalid magic: drop session (input-tcp.c:254-259)
            (name_len,) = struct.unpack(">H", head[1:3])
            name_b = self._readn(name_len)
            if name_b is None:
                return
            name = os.path.basename(name_b.decode())  # no path escape
            blocks = []
            while True:
                lf = self._readn(8)
                if lf is None:
                    return  # mid-file close: drop partial (no commit)
                (blen,) = struct.unpack(">I", lf[:4])
                if blen == 0:
                    break
                blk = self._readn(blen)
                if blk is None:
                    return
                if srv.uncompress is not None:
                    try:
                        blk = zlib.decompress(blk)
                    except zlib.error:
                        # plain (or corrupt) block into an inflating
                        # collector: the reference's error path drops
                        # the file without writing or acking
                        # (output-file.c:326-333 returns -1)
                        with srv.spool_lock:
                            srv.n_uncompress_errors += 1
                        return
                blocks.append(blk)
            data = b"".join(blocks)
            with srv.spool_lock:
                if srv.fail_next_files > 0:
                    srv.fail_next_files -= 1
                    self.request.close()  # drop after frame, BEFORE append
                    return
                with open(os.path.join(srv.spool_dir, name), "ab") as f:
                    f.write(data)
                srv.n_files += 1
                srv.n_bytes += len(data)
            self.request.sendall(b"+")  # delivery ack (module doc #2)


class TcpCollectorServer(socketserver.ThreadingTCPServer):
    """input-tcp analog: accepts sessions, parses frames, appends each
    completed file transfer to ``spool_dir/<filename>`` (a PARTIAL
    transfer — session lost mid-file — is discarded, never appended,
    so the spool only ever holds whole frames; the sender's frame
    resend makes that at-least-once). ``fail_next_files`` injects N
    session drops after a complete frame is read but BEFORE the append
    (tests the sender's reconnect-resend). ``uncompress="deflate"``
    inflates each block before the append (module doc). ``kill()``
    stops the acceptor AND severs live sessions — the dead-aggregator
    case the sender's multi-peer failover covers."""

    daemon_threads = True
    allow_reuse_address = True

    def __init__(
        self,
        spool_dir: str,
        *,
        fail_next_files: int = 0,
        uncompress: str | None = None,
    ):
        if uncompress is not None and uncompress != "deflate":
            raise ValueError(f"uncompress_algorithm {uncompress!r} invalid")
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self.spool_lock = threading.Lock()
        self.n_files = 0
        self.n_bytes = 0
        self.n_uncompress_errors = 0
        self.fail_next_files = fail_next_files
        self.uncompress = uncompress
        self._sessions: set[socket.socket] = set()
        super().__init__(("127.0.0.1", 0), _SessionHandler)

    @property
    def port(self) -> int:
        return self.server_address[1]

    def kill(self) -> None:
        """Simulate the aggregator dying mid-deployment: stop accepting
        and sever every live session (senders see ECONNRESET/EOF on the
        next send or ack read and fail over)."""
        self.shutdown()
        with self.spool_lock:
            sessions = list(self._sessions)
        for s in sessions:
            try:
                s.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
        self.server_close()


def start_collector(
    spool_dir: str, *, fail_next_files: int = 0, uncompress: str | None = None
) -> TcpCollectorServer:
    srv = TcpCollectorServer(
        spool_dir, fail_next_files=fail_next_files, uncompress=uncompress
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
