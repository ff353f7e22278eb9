"""Shuffle router (salted repartition by sink) matches the fan-out path."""

import glob
import shutil
import sys
import tempfile
from collections import Counter

import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from logpipe_ray.pipelines.flagship import build_enriched, route_shuffled


def test_shuffled_counters_match_oracle(sf_dir, oracle):
    from __ray_entry__ import SEQ_CTE

    out = tempfile.mkdtemp(prefix="lpr_shuf_")
    counters = (
        route_shuffled(build_enriched(sf_dir), out, salt_buckets=8)
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

    # hot sink salted into multiple partition files; routed rows complete
    web_files = glob.glob(out + "/sink=sink-web/*.parquet")
    assert len(web_files) >= 4, "hot sink should be salted across partitions"
    routed = Counter()
    for f in glob.glob(out + "/sink=*/*.parquet"):
        routed.update(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    assert sum(routed.values()) == 6000
    shutil.rmtree(out, ignore_errors=True)
