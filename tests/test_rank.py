"""Distributed global rank vs naive argsort (test_queries covers the
DuckDB row_number() oracle; these cover the distributed mechanics —
many buckets, tie keys, grouped partitions, tiny bucket_width forcing
cross-block offset composition)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _naive_rank(df: pd.DataFrame, key: str, id_: str, group: str | None):
    out = {}
    if group is None:
        g = df.sort_values([key, id_])
        for r, i in enumerate(g[id_], 1):
            out[i] = r
    else:
        for _, part in df.groupby(group):
            part = part.sort_values([key, id_])
            for r, i in enumerate(part[id_], 1):
                out[i] = r
    return out


def _fixture(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            # heavy ties: only 40 distinct keys over 5000 rows
            "key": rng.integers(0, 40, n).astype(np.int64) * 17,
            "grp": rng.choice(["a", "b", "c"], n),
        }
    )


class TestGlobalRank:
    def test_global_matches_naive(self):
        from logpipe_ray.stages.rank import global_rank

        df = _fixture()
        ds = ray.data.from_pandas(df).repartition(16)
        got = global_rank(
            ds, key_col="key", id_col="id", bucket_width=64, rank_col="rnk"
        ).to_pandas()
        exp = _naive_rank(df, "key", "id", None)
        assert dict(zip(got["id"], got["rnk"])) == exp
        # ranks are a permutation of 1..n
        assert sorted(got["rnk"]) == list(range(1, len(df) + 1))

    def test_grouped_matches_naive(self):
        from logpipe_ray.stages.rank import global_rank

        df = _fixture()
        ds = ray.data.from_pandas(df).repartition(16)
        got = global_rank(
            ds,
            key_col="key",
            id_col="id",
            bucket_width=100,
            group_col="grp",
            rank_col="rnk",
        ).to_pandas()
        assert dict(zip(got["id"], got["rnk"])) == _naive_rank(
            df, "key", "id", "grp"
        )

    def test_single_bucket_and_carry(self):
        """bucket_width larger than the key range (one bucket) and a
        carried payload column survive intact."""
        from logpipe_ray.stages.rank import global_rank

        df = _fixture(n=300)
        df["payload"] = df["id"] * 3
        ds = ray.data.from_pandas(df).repartition(4)
        got = global_rank(
            ds,
            key_col="key",
            id_col="id",
            bucket_width=10**9,
            carry_cols=("payload",),
        ).to_pandas()
        assert dict(zip(got["id"], got["rnk"])) == _naive_rank(
            df, "key", "id", None
        )
        assert (got["payload"] == got["id"] * 3).all()
