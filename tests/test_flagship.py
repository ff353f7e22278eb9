"""End-to-end flagship golden tests vs DuckDB oracle (FIXTURES.md oracles 1-2)."""

import glob
import shutil
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from logpipe_ray.pipelines.flagship import build_enriched, run_flagship
from logpipe_ray.sources.sequences import synthesize_sequences

import sys

sys.path.insert(0, "/root/repo")
from __ray_entry__ import SEQ_CTE  # noqa: E402


@pytest.fixture(scope="module")
def flagship_out(sf_dir):
    out = tempfile.mkdtemp(prefix="lpr_test_flagship_")
    counters = run_flagship(sf_dir, out)
    df = counters.to_pandas()
    yield out, df
    shutil.rmtree(out, ignore_errors=True)


def test_counters_match_oracle(flagship_out, oracle):
    _, df = flagship_out
    got = (
        df.sort_values(["source", "sink"])
        .reset_index(drop=True)
        .astype({"n_rows": "int64", "sum_n_tok": "int64"})
    )
    exp = oracle.sql(
        SEQ_CTE
        + """SELECT source, sink, count(*) AS n_rows,
                    CAST(sum(n_tok) AS BIGINT) AS sum_n_tok
             FROM sequences GROUP BY 1,2 ORDER BY 1,2"""
    ).df()
    pd.testing.assert_frame_equal(got[["source", "sink", "n_rows", "sum_n_tok"]], exp)


def test_routed_row_equality(flagship_out, oracle):
    """Each doc_id lands in exactly the sink the route table says (oracle 1)."""
    out, _ = flagship_out
    parts = {}
    for path in glob.glob(out + "/sink=*/*.parquet"):
        sink = path.split("/")[-2].split("=", 1)[1]
        t = pq.read_table(path, columns=["doc_id"])
        parts.setdefault(sink, []).extend(t["doc_id"].to_pylist())
    from collections import Counter

    exp = oracle.sql(SEQ_CTE + "SELECT sink, doc_id FROM sequences").df()
    exp_by_sink = {
        sink: Counter(g["doc_id"]) for sink, g in exp.groupby("sink")
    }
    assert set(parts) == set(exp_by_sink)
    for sink, docs in parts.items():
        # multiset equality: the synthetic lineitem has a few exact-dup
        # rows, which legitimately yield identical sequence rows
        assert Counter(docs) == exp_by_sink[sink], f"membership mismatch in {sink}"


def test_token_array_passthrough(flagship_out, sf_dir):
    """Routed rows carry byte-identical token arrays (join on doc_id)."""
    out, _ = flagship_out
    routed = (
        pq.read_table(out, columns=["doc_id", "tokens"])
        .sort_by("doc_id")
        .combine_chunks()
    )
    src = pa.concat_tables(
        synthesize_sequences(sf_dir).iter_batches(batch_format="pyarrow")
    )
    src = src.select(["doc_id", "tokens"]).sort_by("doc_id").combine_chunks()
    assert routed.num_rows == src.num_rows
    assert routed["doc_id"].equals(src["doc_id"])
    # exact array equality, not hashes (SURVEY.md §7.4)
    assert routed["tokens"].equals(src["tokens"])


def test_enriched_schema(sf_dir):
    ds = build_enriched(sf_dir)
    names = ds.schema().names
    assert names == [
        "doc_id",
        "tokens",
        "n_tok",
        "source",
        "route_key",
        "sink",
        "system",
        "server",
    ]


def test_run_fused_matches_oracle(sf_dir, oracle):
    """The single-operator fused flagship is semantically identical."""
    import tempfile

    from logpipe_ray.pipelines.flagship import run_fused
    from logpipe_ray.sources.sequences import synthesize_sequences

    out = tempfile.mkdtemp(prefix="lpr_fused_")
    counters = (
        run_fused(synthesize_sequences(sf_dir), out)
        .to_pandas()
        .sort_values(["source", "sink"])
        .reset_index(drop=True)
        .astype({"n_rows": "int64", "sum_n_tok": "int64"})
    )
    exp = oracle.sql(
        SEQ_CTE
        + """SELECT source, sink, count(*) AS n_rows,
                    CAST(sum(n_tok) AS BIGINT) AS sum_n_tok
             FROM sequences GROUP BY 1,2 ORDER BY 1,2"""
    ).df()
    pd.testing.assert_frame_equal(
        counters[["source", "sink", "n_rows", "sum_n_tok"]], exp
    )
    shutil.rmtree(out, ignore_errors=True)
