"""Route/enrich lookup table — the broadcast small side (FIXTURES.md F2).

This is the analog of logpipe's sink configuration — the ip/port list of
up to 8 tcp sinks (logpipe-output-tcp.c:57-102), the ingeek cut-key
routing rules (logpipe-output-ingeek.c:199-215) — plus the static
system/server enrich tags a filter attaches
(logpipe-filter-pack-metadata.c:39-43).

The table is tiny (one row per known ``source``), so it is **broadcast**:
``ray.put`` once on the driver, ``ray.get`` once per enrich actor — never
a distributed join (SURVEY.md §2.5 "Lookup/enrich").

Sources with id >= ROUTED_SOURCES are deliberately absent from the table
so the unmatched→default path is exercised (reference analog: a file not
matching any configured route still flows, logpipe's outputs see every
block).
"""

from __future__ import annotations

from dataclasses import dataclass

from logpipe_ray.sources.sequences import GROUPS, N_SOURCES

ROUTED_SOURCES = 14  # source ids 14, 15 fall through to the default route

SINK_BY_GROUP = {
    "app_web": "sink-web",
    "db_core": "sink-db",
    "sys_monitor": "sink-sys",
    "app_api": "sink-api",
}

DEFAULT_ROUTE = {"sink": "sink-default", "system": "unknown", "server": "unknown"}

ALL_SINKS = sorted(set(SINK_BY_GROUP.values()) | {DEFAULT_ROUTE["sink"]})


@dataclass(frozen=True)
class Route:
    sink: str
    system: str
    server: str


def default_route_table() -> dict[str, dict[str, str]]:
    """source filename → {sink, system, server}; misses use DEFAULT_ROUTE."""
    table: dict[str, dict[str, str]] = {}
    for s in range(ROUTED_SOURCES):
        grp = GROUPS[s % 4]
        src = f"{grp}_{s:02d}.log"
        table[src] = {"sink": SINK_BY_GROUP[grp], "system": grp, "server": f"srv-{s % 4}"}
    return table


def all_source_names() -> list[str]:
    return [f"{GROUPS[s % 4]}_{s:02d}.log" for s in range(N_SOURCES)]
