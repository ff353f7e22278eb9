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

import pyarrow as pa
import pyarrow.compute as pc

MAGIC = b"@"  # LOGPIPE_COMM_HEAD_MAGIC


def _len_field(n: int) -> bytes:
    """8-byte length field: BE32 length + 4 zero bytes (module doc)."""
    return struct.pack(">I", n) + b"\x00\x00\x00\x00"


def frame_file(filename: str, payload: bytes, *, block_bytes: int = 1 << 20) -> bytes:
    """One complete file frame: header + length-prefixed blocks + 0-len."""
    name = filename.encode()
    if len(name) > 4096:  # PATH_MAX guard (input-tcp.c:264-269)
        raise ValueError(f"filename too long: {len(name)}")
    out = [MAGIC, struct.pack(">H", len(name)), name]
    for i in range(0, len(payload), block_bytes):
        blk = payload[i : i + block_bytes]
        out += [_len_field(len(blk)), blk]
    out.append(_len_field(0))
    return b"".join(out)


class TcpFrameSink:
    """Actor-pool forwarder (output-tcp analog). Rows need a
    ``source_col`` (filename) and ``line_col``; each batch sends one
    file frame per distinct source over the actor's persistent socket,
    reconnect-retry-resending the WHOLE frame on transport failure."""

    def __init__(
        self,
        host: str,
        port: int,
        *,
        source_col: str = "source",
        line_col: str = "line",
        block_bytes: int = 1 << 20,
        max_retries: int = 60,
        retry_wait_s: float = 0.05,
    ):
        self.addr = (host, port)
        self.source_col = source_col
        self.line_col = line_col
        self.block_bytes = block_bytes
        self.max_retries = max_retries
        self.retry_wait_s = retry_wait_s
        self._sock: socket.socket | None = None
        self.n_retries = 0

    def _connect(self) -> None:
        """ONE connection attempt — the retry budget belongs to the
        _send_frame loop alone (an inner retry loop here would multiply
        to max_retries² attempts against a down endpoint)."""
        self._sock = socket.create_connection(self.addr, timeout=10)

    def _send_frame(self, frame: bytes) -> None:
        """Same loop shape as stages/es_sink.EsBulkSink._post."""
        last: Exception | None = None
        for _ in range(self.max_retries + 1):
            try:
                if self._sock is None:
                    self._connect()
                self._sock.sendall(frame)
                ack = self._sock.recv(1)  # delivery ack (module doc #2)
                if ack != b"+":
                    raise OSError("connection closed before ack")
                return
            except OSError as e:
                last = e
                try:
                    if self._sock is not None:
                        self._sock.close()
                finally:
                    self._sock = None
                self.n_retries += 1
                time.sleep(self.retry_wait_s)
        raise ConnectionError(
            f"tcp sink: {self.addr} unreachable after {self.max_retries} retries"
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
                    name, join_lines(sub).encode(), block_bytes=self.block_bytes
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
    (tests the sender's reconnect-resend)."""

    daemon_threads = True
    allow_reuse_address = True

    def __init__(self, spool_dir: str, *, fail_next_files: int = 0):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self.spool_lock = threading.Lock()
        self.n_files = 0
        self.n_bytes = 0
        self.fail_next_files = fail_next_files
        super().__init__(("127.0.0.1", 0), _SessionHandler)

    @property
    def port(self) -> int:
        return self.server_address[1]


def start_collector(
    spool_dir: str, *, fail_next_files: int = 0
) -> TcpCollectorServer:
    srv = TcpCollectorServer(spool_dir, fail_next_files=fail_next_files)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
