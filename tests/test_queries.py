"""Every registered query vs its DuckDB oracle at sf0.001 — the same
comparison the driver runs (row count, sorted column names,
order-insensitive value hash)."""

import hashlib
import sys

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

sys.path.insert(0, "/root/repo")


def _pairs():
    import __ray_entry__ as mod

    qs, os_ = mod.queries(), mod.oracle_sql()
    return [(name, qs[name], os_.get(name)) for name in sorted(qs)]


def _to_pandas(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    s = df.astype(str).sort_values(list(df.columns)).reset_index(drop=True)
    return (
        len(df),
        sorted(df.columns),
        hashlib.sha256(s.to_csv(index=False).encode()).hexdigest(),
    )


@pytest.mark.parametrize(
    "name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()]
)
def test_query_matches_oracle(name, fn, sql, sf_dir, oracle):
    got = _to_pandas(fn(sf_dir))
    assert got is not None
    if sql is None:
        assert len(got) >= 0  # rows-only check (non-SQL-expressible op)
        return
    exp = oracle.sql(sql).df()
    g, x = _canon(got), _canon(exp)
    assert g[0] == x[0], f"{name}: row count {g[0]} != {x[0]}"
    assert g[1] == x[1], f"{name}: columns {g[1]} != {x[1]}"
    assert g[2] == x[2], f"{name}: value hash mismatch"
