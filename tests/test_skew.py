"""Skew handling: salted repartition bounds per-partition size (SURVEY §4)."""

import pyarrow as pa
from ray.data.aggregate import Count

import ray.data

from logpipe_ray.sources.sequences import synthesize_sequences
from logpipe_ray.stages.route import add_salt


def test_hot_source_salting_bounds_partitions(sf_dir):
    ds = synthesize_sequences(sf_dir)  # app_web_00.log holds ~50% of rows
    hot = frozenset({"app_web_00.log"})
    salted = ds.map_batches(
        lambda b: add_salt(b, hot_keys=hot, buckets=8), batch_format="pyarrow"
    )
    sizes = (
        salted.groupby(["source", "salt"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    total = sizes["n"].sum()
    assert total == 6000
    hot_groups = sizes[sizes["source"] == "app_web_00.log"]
    # hot source split into ~8 buckets, each far below the unsalted ~50%
    assert len(hot_groups) == 8
    assert hot_groups["n"].max() < 0.15 * total
    # cold sources keep a single partition (salt 0)
    cold = sizes[sizes["source"] != "app_web_00.log"]
    assert (cold["salt"] == 0).all()


def test_salt_deterministic_across_runs(sf_dir):
    hot = frozenset({"app_web_00.log"})

    def salt_of(ds):
        t = pa.concat_tables(
            ds.map_batches(
                lambda b: add_salt(b, hot_keys=hot, buckets=8),
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow")
        )
        return dict(zip(t["doc_id"].to_pylist(), t["salt"].to_pylist()))

    a = salt_of(synthesize_sequences(sf_dir))
    b = salt_of(synthesize_sequences(sf_dir))
    assert a == b
