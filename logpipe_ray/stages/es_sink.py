"""ES bulk-HTTP delivery sink — the transport half of logpipe-output-es.

Reference semantics (logpipe-output-es.c):

- docs accumulate in a grow buffer, each prefixed with the bulk action
  line ``{ "index":{} }\\r\\n`` (:572-578, bulk_head at :213-214); the
  buffer POSTs to ``/{index}/{type}/_bulk`` (:399-405).
- transport failure → close the socket, reconnect in a loop, RESEND
  the same buffer (the ``_GOTO_RESEND`` loop, :377-461) — at-least-once.
- an HTTP non-2xx status is LOGGED but not retried (:449-457) — only
  transport errors resend.
- flush-on-close: whatever is buffered posts when the writer closes.

Batch restatement: a callable CLASS for ``map_batches`` (actor pool —
the HTTP connection is per-actor state, built once in ``__init__``,
reused across batches with keep-alive). Each ``__call__`` frames the
batch's docs as NDJSON, posts full ``flush_bytes`` chunks as it goes
(the grow-buffer bound), and flushes the remainder before returning —
a Dataset finishing IS close, so no bytes are ever held across batches
and a completed pipeline implies a completed delivery.

Exactly-once effect: with ``id_col`` set, each action line carries the
doc id (``{"index":{"_id":"..."}}``) — a transport retry that
re-delivers an already-indexed chunk overwrites the same ``_id``
(standard ES bulk idempotency), so at-least-once transport yields
exactly-once documents. Without ``id_col`` the sink reproduces the
reference exactly (anonymous ``{ "index":{} }`` actions, at-least-once).
"""

from __future__ import annotations

import http.client
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

class BulkHttpStub(ThreadingHTTPServer):
    """Minimal local ``_bulk`` endpoint — the in-sandbox stand-in for a
    real ES server (no network in this environment): parses NDJSON
    action/doc pairs, stores docs by ``_id`` (last write wins, ES index
    idempotency); ``_id``-less docs append to ``anon``. ``fail_plan``
    maps 1-based request ordinal → injected failure mode:

    - ``drop_before``: close without reading (failure before delivery);
    - ``drop_after``: read + STORE, close without responding (failure
      after delivery — a resend must not duplicate);
    - ``http_500``: respond 500 after storing (logged, not retried).

    Use :func:`start_bulk_stub` to run it on a daemon thread.
    """

    daemon_threads = True

    def __init__(self, fail_plan: dict[int, str] | None = None):
        self.docs: dict[str, str] = {}
        self.anon: list[str] = []
        self.n_requests = 0
        self.bodies: list[bytes] = []
        self.fail_plan = dict(fail_plan or {})
        self.lock = threading.Lock()
        super().__init__(("127.0.0.1", 0), _StubHandler)

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.server_address[1]}"

    def ingest(self, body: bytes) -> None:
        lines = body.decode().replace("\r\n", "\n").strip("\n").split("\n")
        for action_s, doc in zip(lines[0::2], lines[1::2]):
            action = json.loads(action_s)
            _id = action.get("index", {}).get("_id")
            if _id is None:
                self.anon.append(doc)
            else:
                self.docs[_id] = doc


class _StubHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        srv: BulkHttpStub = self.server  # type: ignore[assignment]
        with srv.lock:
            srv.n_requests += 1
            mode = srv.fail_plan.get(srv.n_requests)
            if mode == "drop_before":
                self.connection.close()
                return
            body = self.rfile.read(int(self.headers["Content-Length"]))
            srv.bodies.append(body)
            srv.ingest(body)
            if mode == "drop_after":
                self.connection.close()
                return
            status = 500 if mode == "http_500" else 200
        self.send_response(status)
        payload = b'{"errors":false}'
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


def start_bulk_stub(fail_plan: dict[int, str] | None = None) -> BulkHttpStub:
    srv = BulkHttpStub(fail_plan)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


PARTIAL_SCHEMA = pa.schema(
    [
        ("n_docs", pa.int64()),
        ("n_posts", pa.int64()),
        ("n_retries", pa.int64()),
        ("n_http_errors", pa.int64()),
    ]
)


class EsBulkSink:
    """Actor-pool bulk sink (see module doc). ``id_col`` values must be
    JSON-string-safe (no quotes/backslashes) — true for every id this
    engine generates (hex digests, ``source-seq`` names)."""

    def __init__(
        self,
        url: str,
        *,
        index: str = "logs",
        doc_type: str = "_doc",
        doc_col: str = "doc",
        id_col: str | None = None,
        flush_bytes: int = 1 << 20,
        max_retries: int = 60,
        retry_wait_s: float = 0.05,
        timeout_s: float = 10.0,
    ):
        u = urlparse(url if "://" in url else f"http://{url}")
        self.host, self.port = u.hostname, u.port or 9200
        self.path = f"/{index}/{doc_type}/_bulk"
        self.doc_col = doc_col
        self.id_col = id_col
        self.flush_bytes = flush_bytes
        self.max_retries = max_retries
        self.retry_wait_s = retry_wait_s
        self.timeout_s = timeout_s
        self._conn: http.client.HTTPConnection | None = None
        self.n_retries = 0
        self.n_http_errors = 0

    # -- connection management (ConnectElasticSearchServer analog) ----------

    def _connect(self) -> None:
        """ONE connection attempt — the retry budget belongs to the
        _post loop alone (an inner retry loop here would multiply to
        max_retries² attempts against a down endpoint)."""
        self._conn = http.client.HTTPConnection(
            self.host, self.port, timeout=self.timeout_s
        )
        self._conn.connect()

    def _post(self, body: bytes) -> None:
        """POST one bulk body; reconnect-and-RESEND on transport failure
        (the reference's _GOTO_RESEND loop), log-only on HTTP errors.
        Same loop shape as sources/tcp.TcpFrameSink._send_frame."""
        last: Exception | None = None
        for _ in range(self.max_retries + 1):
            try:
                if self._conn is None:
                    self._connect()
                self._conn.request(
                    "POST",
                    self.path,
                    body,
                    headers={"Content-Type": "application/x-ndjson"},
                )
                resp = self._conn.getresponse()
                resp.read()  # drain for keep-alive
                if resp.status // 100 != 2:
                    self.n_http_errors += 1  # logged, not retried (:449-457)
                return
            except (http.client.HTTPException, OSError) as e:
                # transport failure: close, reconnect, resend same buffer
                last = e
                try:
                    if self._conn is not None:
                        self._conn.close()
                finally:
                    self._conn = None
                self.n_retries += 1
                time.sleep(self.retry_wait_s)
        raise ConnectionError(
            f"es sink: {self.host}:{self.port} unreachable after "
            f"{self.max_retries} retries"
        ) from last

    # -- batch delivery ------------------------------------------------------

    def _frame(self, batch: pa.Table) -> tuple[pa.Array, np.ndarray]:
        """NDJSON action+doc line pairs per row, vectorized; returns the
        framed lines and their byte sizes (for chunking)."""
        docs = pc.cast(batch[self.doc_col], pa.string())
        if isinstance(docs, pa.ChunkedArray):
            docs = docs.combine_chunks()
        if self.id_col is not None:
            ids = pc.cast(batch[self.id_col], pa.string())
            action = pc.binary_join_element_wise(
                '{"index":{"_id":"', ids, '"}}', ""
            )
            if isinstance(action, pa.ChunkedArray):
                action = action.combine_chunks()
        else:
            action = pa.array(
                ['{ "index":{} }'] * batch.num_rows, type=pa.string()
            )
        lines = pc.binary_join_element_wise(action, docs, "\r\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        sizes = (
            pc.binary_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
            + 1  # +1 for the trailing \n per pair
        )
        return lines, sizes

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return PARTIAL_SCHEMA.empty_table()
        lines, sizes = self._frame(batch)
        # chunk boundaries: cumulative bytes // flush_bytes transitions
        # (each chunk ≤ flush_bytes unless a single doc exceeds it)
        cum = np.cumsum(sizes)
        chunk_of = (cum - 1) // self.flush_bytes
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(chunk_of)) + 1, [len(lines)])
        )
        from logpipe_ray.util import join_lines

        r0, h0 = self.n_retries, self.n_http_errors
        n_posts = 0
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e <= s:
                continue
            self._post(join_lines(lines.slice(s, e - s)).encode())
            n_posts += 1
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], type=pa.int64()),
                "n_posts": pa.array([n_posts], type=pa.int64()),
                "n_retries": pa.array(
                    [self.n_retries - r0], type=pa.int64()
                ),
                "n_http_errors": pa.array(
                    [self.n_http_errors - h0], type=pa.int64()
                ),
            }
        )
