"""Enrich stage: broadcast lookup, default-route fallback, actor pool path."""

import pyarrow as pa
import ray
import ray.data

from logpipe_ray.routes import DEFAULT_ROUTE, default_route_table
from logpipe_ray.stages.enrich import Enricher, enrich_batch


def test_known_source_lookup():
    routes = default_route_table()
    t = pa.table({"source": ["app_web_00.log", "db_core_01.log"]})
    out = enrich_batch(t, routes)
    assert out["sink"].to_pylist() == ["sink-web", "sink-db"]
    assert out["system"].to_pylist() == ["app_web", "db_core"]
    assert out["server"].to_pylist() == ["srv-0", "srv-1"]


def test_default_route_fallback():
    routes = default_route_table()
    t = pa.table({"source": ["never_configured.log", "app_api_15.log"]})
    out = enrich_batch(t, routes)
    assert out["sink"].to_pylist() == [DEFAULT_ROUTE["sink"]] * 2
    assert out["system"].to_pylist() == ["unknown", "unknown"]


def test_actor_pool_stage():
    routes_ref = ray.put(default_route_table())
    ds = ray.data.from_items(
        [{"source": "app_web_00.log"}, {"source": "zzz.log"}] * 10
    )
    out = ds.map_batches(
        Enricher,
        fn_constructor_kwargs={"routes_ref": routes_ref},
        batch_format="pyarrow",
        concurrency=2,
    )
    sinks = sorted(set(r["sink"] for r in out.take_all()))
    assert sinks == ["sink-default", "sink-web"]
