"""ES bulk sink delivery: local _bulk server stub, injected transport
failures, exactly-once verification (logpipe-output-es.c:377-461)."""

import json

import pyarrow as pa
import pytest
import ray.data

from logpipe_ray.stages.es_sink import start_bulk_stub


@pytest.fixture()
def stub():
    servers = []

    def factory(fail_plan=None):
        srv = start_bulk_stub(fail_plan)
        servers.append(srv)
        return srv, srv.url

    yield factory
    for s in servers:
        s.shutdown()


def _docs_table(n=300):
    return pa.table(
        {
            "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
            "doc": pa.array([json.dumps({"i": i, "msg": f"m{i}"}) for i in range(n)]),
        }
    )


def _deliver(url, n=300, fail_plan=None, **kw):
    from logpipe_ray.stages.es_sink import EsBulkSink

    ds = ray.data.from_arrow(_docs_table(n)).repartition(4)
    partials = ds.map_batches(
        EsBulkSink,
        fn_constructor_kwargs={
            "url": url,
            "index": "t",
            "doc_col": "doc",
            "id_col": "doc_id",
            **kw,
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        num_cpus=0.5,
    )
    return partials.to_pandas()


def test_bulk_delivery_exactly_once(ray_session, stub):
    srv, url = stub()
    p = _deliver(url)
    assert p["n_docs"].sum() == 300
    assert srv.docs == {
        f"d{i:04d}": json.dumps({"i": i, "msg": f"m{i}"}) for i in range(300)
    }
    # framing: every request body is NDJSON action/doc pairs, \n-terminated
    for b in srv.bodies:
        assert b.endswith(b"\n")
        lines = b.decode().strip("\n").split("\n")
        assert len(lines) % 2 == 0


def test_retry_resend_on_dropped_connections(ray_session, stub):
    """drop_before loses the request → resend delivers; drop_after
    stores then kills the response → resend re-delivers, _id dedupes.
    Either way every doc arrives EXACTLY once in the final store."""
    srv, url = stub({1: "drop_before", 3: "drop_after"})
    p = _deliver(url, retry_wait_s=0.01)
    assert p["n_retries"].sum() >= 2
    assert srv.docs == {
        f"d{i:04d}": json.dumps({"i": i, "msg": f"m{i}"}) for i in range(300)
    }


def test_http_error_logged_not_retried(ray_session, stub):
    """A non-2xx HTTP status is counted but NOT resent (the reference
    logs the status and clears the buffer, :449-457)."""
    srv, url = stub({1: "http_500"})
    p = _deliver(url, retry_wait_s=0.01)
    assert p["n_http_errors"].sum() == 1
    # no duplicate deliveries from the 500
    assert len(srv.docs) == 300


def test_flush_bytes_chunks_large_batches(ray_session, stub):
    """A batch larger than flush_bytes posts in multiple bounded bodies
    (the grow-buffer bound), and all docs still arrive."""
    srv, url = stub()
    p = _deliver(url, flush_bytes=2048)
    assert p["n_posts"].sum() > p["n_docs"].sum() / 64  # > 1 post per batch
    assert all(len(b) <= 2048 + 256 for b in srv.bodies)  # one pair overshoot
    assert len(srv.docs) == 300


def test_registry_es_sink(ray_session, stub):
    """Config pipelines can target kind 'es'; folded counters return."""
    from logpipe_ray.registry import SINKS

    srv, url = stub()
    ds = ray.data.from_arrow(_docs_table(100)).repartition(2)
    out = SINKS["es"](
        ds, url, index="t", doc_col="doc", id_col="doc_id", concurrency=2
    ).to_pandas()
    assert out["n_docs"].sum() == 100
    assert len(srv.docs) == 100


def test_anonymous_actions_without_id_col(ray_session, stub):
    """Without id_col the sink reproduces the reference exactly:
    '{ \"index\":{} }' action lines, docs stored anonymously."""
    srv, url = stub()
    from logpipe_ray.stages.es_sink import EsBulkSink

    ds = ray.data.from_arrow(_docs_table(50)).repartition(1)
    ds.map_batches(
        EsBulkSink,
        fn_constructor_kwargs={"url": url, "index": "t", "doc_col": "doc"},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=1,
        num_cpus=0.5,
    ).to_pandas()
    assert len(srv.anon) == 50
