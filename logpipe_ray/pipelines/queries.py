"""Registry of driver-facing queries and their DuckDB oracle SQL.

Each entry: name → (callable(sf_dir) -> Dataset/Table/DataFrame,
oracle_sql | None). Column names and types match between the Ray result
and the oracle exactly (the driver compare sorts columns by name and
hashes values). Monetary sums are integer cents (float sum order is
engine-dependent); all ints are int64.

Registered via ``@query("name", ORACLE_SQL)`` decorator; `__ray_entry__`
exposes the dicts to the driver, tests iterate all pairs at sf0.001.
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _i64(batch: pa.Table, cols: list[str]) -> pa.Table:
    for c in cols:
        batch = batch.set_column(
            batch.schema.get_field_index(c), c, pc.cast(batch[c], pa.int64())
        )
    return batch


def _pc_mod(col, n: int):
    """Arrow integer modulo (no pc.mod kernel exists): x - (x//n)*n.
    Arrow's integer divide truncates toward zero, so this matches SQL
    ``%`` only for NON-NEGATIVE x — every caller keys on non-negative
    ids/sequence numbers."""
    return pc.subtract(col, pc.multiply(pc.divide(col, n), n))


def _cents(col) -> pa.Array:
    return pc.cast(
        # duckdb round() is half-away-from-zero = arrow "half_towards_infinity"
        pc.round(pc.multiply(col, 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


# ---------------------------------------------------------------------------
# Events: aggregate / windows / top-k / distinct
# ---------------------------------------------------------------------------


@query(
    "events_agg",
    """SELECT event_type, count(*) AS n_events,
              CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
       FROM events GROUP BY event_type""",
)
def events_agg(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": b["event_type"], "value_cents": _cents(b["value"])}
        )

    from logpipe_ray.stages.smallagg import grouped_agg

    return grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        "event_type",
        sums={"sum_value_cents": "value_cents"},
        count="n_events",
    )


@query(
    "events_tumbling",
    """SELECT user_id, CAST(floor(epoch(ts)/3600) AS BIGINT) AS window,
              count(*) AS n_events,
              CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
       FROM events GROUP BY 1, 2""",
)
def events_tumbling(sf_dir: str):
    from logpipe_ray.stages.window import tumbling_aggregate

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    return tumbling_aggregate(ds, width_s=3600)


@query(
    "events_session",
    """WITH lagd AS (
         SELECT user_id, ts, value,
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         FROM events
       ), sess AS (
         SELECT user_id, value,
                SUM(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) <= 1800
                         THEN 0 ELSE 1 END)
                  OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
         FROM lagd
       )
       SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              count(*) AS n_events,
              CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
       FROM sess GROUP BY 1, 2""",
)
def events_session(sf_dir: str):
    from logpipe_ray.stages.window import sessionize

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return sessionize(ds, gap_s=1800)


@query(
    "events_topk",
    """SELECT user_id,
              CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_cents
       FROM events GROUP BY user_id
       ORDER BY total_cents DESC, user_id LIMIT 10""",
)
def events_topk(sf_dir: str):
    from logpipe_ray.stages.window import top_k

    ds = _read(sf_dir, "events", ["user_id", "value"])
    return top_k(ds, key_col="user_id", value_col="value", k=10)


@query(
    "events_group_topk",
    """SELECT event_type, user_id, total_cents, rnk FROM (
         SELECT event_type, user_id,
                CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                  AS total_cents,
                CAST(row_number() OVER (
                  PARTITION BY event_type
                  ORDER BY sum(CAST(round(value*100) AS BIGINT)) DESC, user_id
                ) AS BIGINT) AS rnk
         FROM events GROUP BY event_type, user_id
       ) t WHERE rnk <= 3""",
)
def events_group_topk(sf_dir: str):
    """Per-group top-k (rank within partition): top-3 spenders per event
    type. Per-batch arrow group_by pre-aggregates, so at most
    types×users rows leave any block; user_id is UNBOUNDED, so the
    partials fold through ``sorted_runs_fold`` (volume-bounded single-
    column sort co-locates each user — never a one-block all-users
    table); each folded block then emits its local top-3-per-type
    (≤ 3×types rows) and the selection tree-merges via
    ``fold_blocks_tree`` — rank3 recomputes ranks from scratch, so it
    is its own merge."""
    import numpy as np

    from logpipe_ray.stages.smallagg import fold_blocks_tree, sorted_runs_fold

    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b["event_type"],
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "total_cents": _cents(b["value"]),
            }
        )
        g = t.group_by(["event_type", "user_id"]).aggregate(
            [("total_cents", "sum")]
        )
        g = g.rename_columns(
            [c[: -len("_sum")] if c.endswith("_sum") else c for c in g.column_names]
        )
        return g.select(["event_type", "user_id", "total_cents"])

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("user_id", pa.int64()),
            ("total_cents", pa.int64()),
        ]
    )

    def user_combine(b: pa.Table) -> pa.Table:
        # a user's rows are confined to this block (single-column sort
        # invariant), so a local group_by completes every (user, type)
        # total exactly once globally
        if b.num_rows == 0:
            return part_schema.empty_table()
        g = b.group_by(["event_type", "user_id"]).aggregate(
            [("total_cents", "sum")]
        )
        g = g.rename_columns(
            [
                c[: -len("_sum")] if c.endswith("_sum") else c
                for c in g.column_names
            ]
        )
        return g.select(part_schema.names).cast(part_schema)

    agg = sorted_runs_fold(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id",
        user_combine,
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("user_id", pa.int64()),
            ("total_cents", pa.int64()),
            ("rnk", pa.int64()),
        ]
    )

    def rank3(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        from logpipe_ray.stages.smallagg import run_ranks

        et = b["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        uid = b["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tc = b["total_cents"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, -tc, et))  # type asc, cents desc, user asc
        rnk = run_ranks(et[order]) + 1
        keep = order[rnk <= 3]
        return pa.table(
            {
                "event_type": pa.array(et[keep], type=pa.string()),
                "user_id": pa.array(uid[keep], type=pa.int64()),
                "total_cents": pa.array(tc[keep], type=pa.int64()),
                "rnk": pa.array(rnk[rnk <= 3], type=pa.int64()),
            }
        )

    # local top-3-per-type partials (≤ 3×types rows leave any block),
    # then rank3 tree-merges its own outputs (it re-lexsorts and
    # re-ranks from scratch each application)
    return fold_blocks_tree(
        agg.map_batches(rank3, batch_format="pyarrow", batch_size=None),
        rank3,
    )


@query("events_distinct_types", "SELECT DISTINCT event_type FROM events")
def events_distinct_types(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, type=pa.string())})


# ---------------------------------------------------------------------------
# Relational: pricing aggregate, joins, sort/top-k
# ---------------------------------------------------------------------------


@query(
    "q1_pricing",
    """SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
              CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
                AS sum_base_cents,
              CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))
                   AS BIGINT) AS sum_disc_cents,
              count(*) AS n_rows
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1995-06-30'
       GROUP BY l_returnflag, l_linestatus""",
)
def q1_pricing(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    from datetime import datetime

    cutoff = pa.scalar(datetime(1995, 6, 30), type=pa.timestamp("us"))

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["l_shipdate"], cutoff))
        disc_price = pc.multiply(
            b["l_extendedprice"], pc.subtract(1.0, b["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": pc.cast(b["l_quantity"], pa.int64()),
                "base_cents": _cents(b["l_extendedprice"]),
                "disc_cents": _cents(disc_price),
            }
        )

    from logpipe_ray.stages.smallagg import grouped_agg

    return grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        sums={
            "sum_qty": "qty",
            "sum_base_cents": "base_cents",
            "sum_disc_cents": "disc_cents",
        },
        count="n_rows",
    )


@query(
    "join_broadcast",
    """SELECT p_brand, count(*) AS n_items,
              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand""",
)
def join_broadcast(sf_dir: str):
    """Fact ⋈ small dimension: broadcast hash join, no shuffle."""
    import pyarrow.parquet as pq

    from logpipe_ray.stages.joins import broadcast_join

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    joined = broadcast_join(ds, part, keys="l_partkey", right_keys="p_partkey")

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"p_brand": b["p_brand"], "qty": pc.cast(b["l_quantity"], pa.int64())}
        )

    from logpipe_ray.stages.smallagg import grouped_agg

    return grouped_agg(
        joined.map_batches(prep, batch_format="pyarrow"),
        "p_brand",
        sums={"sum_qty": "qty"},
        count="n_items",
    )


@query(
    "join_hash",
    """SELECT c_mktsegment, count(*) AS n_orders,
              CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
                AS sum_total_cents
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)
def join_hash(sf_dir: str):
    """Large×large hash-partitioned join (Dataset.join, 8 partitions)."""
    from logpipe_ray.stages.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = hash_join(
        orders, customer, on="o_custkey", right_on="c_custkey", num_partitions=8
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "total_cents": _cents(b["o_totalprice"]),
            }
        )

    from logpipe_ray.stages.smallagg import grouped_agg

    return grouped_agg(
        joined.map_batches(prep, batch_format="pyarrow"),
        "c_mktsegment",
        sums={"sum_total_cents": "total_cents"},
        count="n_orders",
    )


@query(
    "join_semi",
    """SELECT c_custkey FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders)""",
)
def join_semi(sf_dir: str):
    """Semi join via broadcast key set (Bloom-filter pattern).

    The distinct key set of the fact side is computed DISTRIBUTEDLY
    (per-block pre-distinct inside map_batches, then Dataset.unique's
    shuffle) — only the already-distinct keys reach the driver for the
    broadcast. If the distinct set were too big to broadcast, the
    fallback is hash_join(how='semi') — see stages/joins.py."""
    from logpipe_ray.stages.joins import distinct_keys, semi_join

    keys = distinct_keys(
        _read(sf_dir, "orders", ["o_custkey"]), "o_custkey"
    )
    ds = _read(sf_dir, "customer", ["c_custkey"])
    return semi_join(ds, keys, key_col="c_custkey")


@query(
    "join_anti",
    """SELECT c_custkey FROM customer
       WHERE c_custkey NOT IN
         (SELECT o_custkey FROM orders WHERE o_totalprice >= 400000)""",
)
def join_anti(sf_dir: str):
    """Customers with no large order (anti join via broadcast key set);
    the filter + distinct of the fact side runs distributedly."""
    from logpipe_ray.stages.joins import distinct_keys, semi_join

    big = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: b.filter(pc.greater_equal(b["o_totalprice"], 400000.0)).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    keys = distinct_keys(big, "o_custkey")
    ds = _read(sf_dir, "customer", ["c_custkey"])
    return semi_join(ds, keys, key_col="c_custkey", anti=True)


@query(
    "sort_topk_orders",
    """SELECT o_orderkey,
              CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
       FROM orders
       ORDER BY total_cents DESC, o_orderkey LIMIT 10""",
)
def sort_topk_orders(sf_dir: str):
    """Global top-10 orders by price. No distributed sort at all: each
    block's local top-10 (10 rows leave any block) tree-merges via
    ``fold_blocks_tree`` (the selection re-sorts from scratch, so it is
    its own merge) — a full ``Dataset.sort().limit(10)`` would shuffle
    the whole table for 10 rows. The final sort orders ≤ 10 rows."""
    import numpy as np

    from logpipe_ray.stages.smallagg import fold_blocks_tree

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top_schema = pa.schema([("o_orderkey", pa.int64()), ("total_cents", pa.int64())])

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return top_schema.empty_table()
        if "o_totalprice" in b.column_names:  # first application: prep
            b = pa.table(
                {
                    "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                    "total_cents": _cents(b["o_totalprice"]),
                }
            )
        k = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        c = b["total_cents"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.lexsort((k, -c))[:10]
        return pa.table(
            {
                "o_orderkey": pa.array(k[keep], type=pa.int64()),
                "total_cents": pa.array(c[keep], type=pa.int64()),
            }
        )

    top = fold_blocks_tree(
        ds.map_batches(local_top, batch_format="pyarrow"), local_top
    )
    return top.sort(["total_cents", "o_orderkey"], descending=[True, False]).limit(10)


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------


@query(
    "text_stats",
    r"""SELECT doc_id,
              CAST(length(text) AS BIGINT) AS n_chars,
              CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
              CAST(length(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS n_punct,
              CAST(length(regexp_extract_all(text, '\b(?:the|and|of|a|to|in|is)\b'))
                   AS BIGINT) AS n_stop
       FROM documents""",
)
def text_stats(sf_dir: str):
    from logpipe_ray.stages.text_analysis import add_text_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: add_text_stats(b).select(
            ["doc_id", "n_chars", "n_words", "n_punct", "n_stop"]
        ),
        batch_format="pyarrow",
    )


@query(
    "token_count",
    r"""SELECT doc_id,
              CAST(length(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                AS n_tokens
       FROM documents""",
)
def token_count(sf_dir: str):
    from logpipe_ray.stages.text_analysis import add_token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: add_token_count(b).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )


@query(
    "lang_id",
    """WITH t AS (
         SELECT doc_id, lang, text,
                list_transform(regexp_extract_all(text, '[a-zA-Z]+'),
                               w -> lower(w)) AS ws
         FROM documents
       ), h AS (
         SELECT doc_id, lang,
           regexp_matches(text, '[一-鿿]') AS cjk,
           length(list_filter(ws, w -> w IN ('der','die','das','und','ist','von','zu','mit','den','ein'))) AS de,
           length(list_filter(ws, w -> w IN ('the','and','of','to','a','in','is','that','it','for'))) AS en,
           length(list_filter(ws, w -> w IN ('el','la','los','y','de','un','una','es','que','por'))) AS es,
           length(list_filter(ws, w -> w IN ('le','la','les','et','de','un','une','est','que','pour'))) AS fr
         FROM t
       )
       SELECT doc_id, lang,
         CASE WHEN cjk THEN 'zh'
              WHEN greatest(de,en,es,fr) = 0 THEN 'und'
              WHEN de = greatest(de,en,es,fr) THEN 'de'
              WHEN en = greatest(de,en,es,fr) THEN 'en'
              WHEN es = greatest(de,en,es,fr) THEN 'es'
              ELSE 'fr' END AS lang_pred
       FROM h""",
)
def lang_id(sf_dir: str):
    from logpipe_ray.stages.text_analysis import LangId

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return ds.map_batches(
        LangId, batch_format="pyarrow", concurrency=2, num_cpus=0.5
    ).map_batches(
        lambda b: b.select(["doc_id", "lang", "lang_pred"]), batch_format="pyarrow"
    )


@query(
    "doc_fingerprint",
    """SELECT doc_id,
              CASE WHEN length(text) = 0 THEN 0 ELSE
                list_reduce(
                  list_transform(range(1, length(text)+1),
                                 i -> CAST(unicode(text[i]) AS BIGINT)),
                  (acc, x) -> (acc * 4294967296 + x) % 2147483647)
              END AS fingerprint
       FROM documents""",
)
def doc_fingerprint(sf_dir: str):
    from logpipe_ray.stages.text_analysis import fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: fingerprint_batch(b).select(["doc_id", "fingerprint"]),
        batch_format="pyarrow",
    )


@query(
    "quality_score",
    # mirrors stages/text_analysis.quality_score_batch op-for-op: every
    # step is a single correctly-rounded IEEE double op in both engines,
    # so the composite is bit-identical (components are the text_stats
    # regex counts, themselves oracle-green)
    r"""WITH s AS (
         SELECT doc_id,
                CAST(length(text) AS BIGINT) AS n_chars,
                CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
                CAST(length(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS n_punct,
                CAST(length(regexp_extract_all(text, '\b(?:the|and|of|a|to|in|is)\b'))
                     AS BIGINT) AS n_stop
         FROM documents
       ), f AS (
         SELECT doc_id,
           least(greatest(n_chars/500.0, 0.0), 1.0) AS ls,
           1.0 - least(greatest(
             (CASE WHEN n_chars > 0
                   THEN CAST(n_punct AS DOUBLE)/greatest(n_chars, 1)
                   ELSE 0.0 END) * 10.0, 0.0), 1.0) AS ps,
           least(greatest(
             (CASE WHEN n_words > 0
                   THEN CAST(n_stop AS DOUBLE)/greatest(n_words, 1)
                   ELSE 0.0 END) * 4.0, 0.0), 1.0) AS ss
         FROM s
       )
       SELECT doc_id, (ls + ps + ss)/3.0 AS quality_score FROM f""",
)
def quality_score(sf_dir: str):
    from logpipe_ray.stages.text_analysis import quality_score_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: quality_score_batch(b).select(["doc_id", "quality_score"]),
        batch_format="pyarrow",
    )


@query(
    "quality_percentile_filter",
    # threshold = exact rank floor((n-1)*0.25) (0-based) of the sorted
    # values; the window form below pins the identical definition
    """WITH ranked AS (
         SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rn,
                count(*) OVER () AS n
         FROM documents
       ), thr AS (
         SELECT n_chars AS t FROM ranked
         WHERE rn = CAST(floor((n-1)*0.25) AS BIGINT) + 1
       )
       SELECT d.doc_id, d.n_chars FROM documents d, thr WHERE d.n_chars >= thr.t""",
)
def quality_percentile_filter(sf_dir: str):
    """Corpus-relative quality gate: drop the bottom quartile by doc
    length (the "filter below corpus p25" curation pattern — the cut
    point depends on the corpus, not a constant).

    Exact percentile WITHOUT a global sort: per-block value-count
    partials (≤ distinct-lengths rows leave any block), one combine
    task folds the histogram, the exact rank-floor((n-1)*q) threshold
    is read off the cumulative counts, and a broadcast compare filters
    the stream. Two passes; the driver holds only the histogram
    (bounded by distinct metric values, not corpus rows)."""
    import numpy as np

    from logpipe_ray.stages.smallagg import count_partials, fold_partials_tree

    Q = 0.25
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    hist = fold_partials_tree(count_partials(ds, "n_chars"), "n_chars", "n").to_pandas()
    if hist.empty:  # empty corpus → nothing passes (or fails) the gate
        return ds
    hist = hist.sort_values("n_chars").reset_index(drop=True)
    cum = hist["n"].to_numpy().cumsum()
    rank = int((cum[-1] - 1) * Q)  # 0-based floor
    thr = int(hist["n_chars"].iloc[int(np.searchsorted(cum, rank + 1))])
    return ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_chars"], thr)),
        batch_format="pyarrow",
    )


@query(
    "doc_repetition",
    """WITH wc AS (
         SELECT doc_id, w, count(*) AS c
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         GROUP BY doc_id, w
       ), wstats AS (
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                CAST(sum(c) - count(*) AS BIGINT) AS n_dup_words,
                CAST(max(c) AS BIGINT) AS top_word_count
         FROM wc GROUP BY doc_id
       ), bc AS (
         SELECT doc_id, b, count(*) AS c
         FROM (SELECT doc_id,
                 unnest(list_transform(range(1, len(ws)),
                                       i -> ws[i] || ' ' || ws[i+1])) AS b
               FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
         GROUP BY doc_id, b
       ), bstats AS (
         SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_count
         FROM bc GROUP BY doc_id
       )
       SELECT w.doc_id, n_words, n_dup_words, top_word_count,
              COALESCE(top_bigram_count, 0) AS top_bigram_count
       FROM wstats w LEFT JOIN bstats b ON w.doc_id = b.doc_id""",
)
def doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals per document (duplicate
    words, most-frequent word/bigram counts) — integer outputs only,
    vectorized across the batch (no per-doc loop)."""
    from logpipe_ray.stages.text_analysis import repetition_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(repetition_stats, batch_format="pyarrow")


@query(
    "docs_training_pipeline",
    """WITH wc AS (
         SELECT doc_id, w, count(*) AS c
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         GROUP BY doc_id, w
       ), stats AS (
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                CAST(max(c) AS BIGINT) AS topw
         FROM wc GROUP BY doc_id
       ), kept AS (
         SELECT d.doc_id, d.text, s.n_words
         FROM documents d JOIN stats s ON d.doc_id = s.doc_id
         WHERE s.topw * 8 <= s.n_words AND s.n_words >= 40
       ), uniq AS (
         SELECT min(doc_id) AS doc_id, min(n_words) AS n_words
         FROM kept GROUP BY text
       )
       SELECT doc_id, n_words,
              CAST(COALESCE(SUM(n_words) OVER (
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // 512 AS BIGINT) AS pack_id
       FROM uniq""",
)
def docs_training_pipeline(sf_dir: str):
    """End-to-end LLM training-data build: repetition quality gate →
    exact dedup → greedy 512-token packing — the full composition, one
    SQL oracle."""
    from logpipe_ray.pipelines.training_data import docs_to_training_packs

    return docs_to_training_packs(sf_dir)


@query(
    "filter_grep",
    "SELECT doc_id FROM documents WHERE text LIKE '%window%'",
)
def filter_grep(sf_dir: str):
    from logpipe_ray.stages.parse import grep_filter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: grep_filter(b, text_col="text", pattern="window").select(["doc_id"]),
        batch_format="pyarrow",
    )


@query(
    "es_fields_template",
    r"""WITH f AS (
         SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
       )
       SELECT doc_id,
              '{"w1":"' || ws[1] || '","w3":"' || ws[3] || '","w5":"' || ws[5]
                || '"}' AS doc
       FROM f WHERE length(ws) >= 5""",
)
def es_fields_template(sf_dir: str):
    """ES-sink analog: whitespace field split (strict arity) + $N template."""
    from logpipe_ray.stages.parse import format_template, split_fields

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        b = split_fields(b, text_col="text", max_fields=5, strict=True)
        b = format_template(b, '{"w1":"$1","w3":"$3","w5":"$5"}')
        return b.select(["doc_id", "doc"])

    return ds.map_batches(prep, batch_format="pyarrow")


@query(
    "es_bulk_delivery",
    r"""WITH f AS (
         SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
       )
       SELECT doc_id,
              '{"w1":"' || ws[1] || '","w3":"' || ws[3] || '","w5":"' || ws[5]
                || '"}' AS doc
       FROM f WHERE length(ws) >= 5""",
)
def es_bulk_delivery(sf_dir: str):
    """ES sink END-TO-END (logpipe-output-es.c delivery half): field
    split + $N template (as es_fields_template), then the actor-pool
    bulk sink POSTs NDJSON ``_bulk`` bodies over keep-alive HTTP to a
    local in-process ``_bulk`` stub — with a transport failure injected
    on the first request, exercising the reconnect-retry-resend loop
    (:377-461). The returned rows come back FROM THE SERVER'S STORE,
    so the oracle match proves exactly-once delivery of every doc
    (at-least-once transport + ``_id`` idempotency), not just
    formatting."""
    from logpipe_ray.stages.es_sink import EsBulkSink, start_bulk_stub
    from logpipe_ray.stages.parse import format_template, split_fields

    srv = start_bulk_stub({1: "drop_before"})
    try:
        ds = _read(sf_dir, "documents", ["doc_id", "text"])

        def prep(b: pa.Table) -> pa.Table:
            b = split_fields(b, text_col="text", max_fields=5, strict=True)
            b = format_template(b, '{"w1":"$1","w3":"$3","w5":"$5"}')
            return b.select(["doc_id", "doc"])

        ds.map_batches(prep, batch_format="pyarrow").map_batches(
            EsBulkSink,
            fn_constructor_kwargs={
                "url": srv.url,
                "index": "docs",
                "doc_col": "doc",
                "id_col": "doc_id",
                "retry_wait_s": 0.01,
            },
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=2,
            num_cpus=0.5,
        ).materialize()
        ids = sorted(srv.docs, key=int)
        return pa.table(
            {
                "doc_id": pa.array([int(i) for i in ids], type=pa.int64()),
                "doc": pa.array([srv.docs[i] for i in ids], type=pa.string()),
            }
        )
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
       FROM documents GROUP BY text""",
)
def dedup_exact(sf_dir: str):
    """Exact dedup: content hash → min-id representative + copy count.
    Only per-batch (hash, min_id, n) PARTIALS shuffle, never the text —
    hash is UNBOUNDED (distinct-content-proportional), so the partials
    complete through ``sorted_runs_fold`` (Ray's sort-based groupby
    would range-sort every raw (hash, id) row instead)."""
    import numpy as np

    from logpipe_ray.stages.dedup import add_text_hash
    from logpipe_ray.stages.smallagg import run_starts, sorted_runs_fold

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    part_schema = pa.schema(
        [
            ("text_hash", pa.int64()),
            ("doc_id", pa.int64()),
            ("n_copies", pa.int64()),
        ]
    )

    def hash_partial(b: pa.Table) -> pa.Table:
        t = add_text_hash(b).select(["doc_id", "text_hash"])
        if t.num_rows == 0:
            return part_schema.empty_table()
        g = t.group_by(["text_hash"]).aggregate(
            [("doc_id", "min"), ([], "count_all")]
        )
        g = g.rename_columns(
            [
                {"doc_id_min": "doc_id", "count_all": "n_copies"}.get(c, c)
                for c in g.column_names
            ]
        )
        return g.select(part_schema.names).cast(part_schema)

    def hash_combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        h = b["text_hash"].combine_chunks().to_numpy(zero_copy_only=False)
        did = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        n = b["n_copies"].combine_chunks().to_numpy(zero_copy_only=False)
        starts = run_starts(h)
        mn = np.minimum.reduceat(did, starts)
        return pa.table(
            {
                "text_hash": pa.array(h[starts], type=pa.int64()),
                "doc_id": pa.array(mn.astype(np.int64), type=pa.int64()),
                "n_copies": pa.array(
                    np.add.reduceat(n, starts).astype(np.int64), type=pa.int64()
                ),
            }
        )

    folded = sorted_runs_fold(
        ds.map_batches(hash_partial, batch_format="pyarrow"),
        "text_hash",
        hash_combine,
    )
    return folded.map_batches(
        lambda b: b.select(["doc_id", "n_copies"]), batch_format="pyarrow"
    )


@query(
    "dedup_keep_best",
    r"""WITH k AS (
         SELECT doc_id, n_chars,
                list_sort(list_distinct(regexp_extract_all(text, '\S+'))) AS ws
         FROM documents
       ), g AS (
         SELECT ws, count(*) AS n_copies,
                CAST(max(n_chars) AS BIGINT) AS n_chars
         FROM k GROUP BY ws
       )
       SELECT CAST(min(k.doc_id) AS BIGINT) AS doc_id, g.n_chars, g.n_copies
       FROM k JOIN g ON k.ws = g.ws AND k.n_chars = g.n_chars
       GROUP BY g.ws, g.n_chars, g.n_copies""",
)
def dedup_keep_best(sf_dir: str):
    """Canonical-content dedup that keeps the BEST copy, not the first:
    docs grouped by their distinct-word SET, the longest copy wins
    (tie: lowest doc_id) — the "keep the highest-quality duplicate"
    curation pattern, vs dedup_exact's min-id-wins. Thin wrapper over
    :func:`logpipe_ray.stages.dedup.keep_best_dedup` (the distributed
    shape is documented there; also benchmarked at 100k docs by
    ``bench.py --dedup``)."""
    from logpipe_ray.stages.dedup import keep_best_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    return keep_best_dedup(ds, quality_col="n_chars")


@query(
    "dedup_ngram_topk",
    r"""WITH w AS (
         SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
       ), sh AS (
         SELECT doc_id,
                list_distinct(list_transform(range(1, length(ws) - 1),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
         FROM w
       ), pairs AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(length(list_intersect(a.s, b.s)) AS DOUBLE)
                  / length(list_distinct(list_concat(a.s, b.s))) AS j
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       )
       SELECT doc_a, doc_b, CAST(floor(j*10000) AS BIGINT) AS jaccard_bp
       FROM pairs WHERE j > 0
       ORDER BY jaccard_bp DESC, doc_a, doc_b LIMIT 20""",
)
def dedup_ngram_topk(sf_dir: str):
    """Exact word-3-gram Jaccard, global top-20 most-similar pairs.

    Distributed shape: shingle sets computed per batch in parallel,
    broadcast-gathered (they are tiny vs the text), pairwise scored.
    The MinHash+LSH query below is the sub-quadratic scale path.
    """
    from logpipe_ray.stages.dedup import shingle_table, topk_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    shingle_parts = ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "shingles": pa.array(
                    [
                        st.astype("int64").tolist()
                        for st in shingle_table(
                            zip(
                                (str(x) for x in b["doc_id"].to_pylist()),
                                b["text"].to_pylist(),
                            )
                        ).values()
                    ],
                    type=pa.list_(pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    import numpy as np

    shingles = {}
    for part in shingle_parts.iter_batches(batch_format="pyarrow"):
        for i in range(part.num_rows):
            shingles[int(part["doc_id"][i].as_py())] = np.asarray(
                part["shingles"][i].as_py(), dtype=np.int64
            )
    pairs = topk_jaccard_pairs(shingles, k=20)
    return pa.table(
        {
            "doc_a": pa.array([p[0] for p in pairs], type=pa.int64()),
            "doc_b": pa.array([p[1] for p in pairs], type=pa.int64()),
            "jaccard_bp": pa.array([p[2] for p in pairs], type=pa.int64()),
        }
    )


_EXACT_PAIRS_CTE = r"""WITH RECURSIVE w AS (
     SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
   ), sh AS (
     SELECT doc_id,
            list_distinct(list_transform(range(1, length(ws) - 1),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
     FROM w
   ), pairs AS (
     SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(length(list_intersect(a.s, b.s)) AS DOUBLE)
              / length(list_distinct(list_concat(a.s, b.s))) AS j
     FROM sh a JOIN sh b ON a.doc_id < b.doc_id
     WHERE length(a.s) > 0 AND length(b.s) > 0
   ), verified AS (
     SELECT doc_a, doc_b, CAST(floor(j*10000) AS BIGINT) AS jaccard_bp
     FROM pairs WHERE CAST(floor(j*10000) AS BIGINT) >= 2000
   )"""


@query(
    "decontaminate_ngram",
    r"""WITH w AS (
         SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
       ), sh AS (
         SELECT doc_id,
                list_distinct(list_transform(range(1, length(ws) - 1),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
         FROM w
       ), bench AS (
         SELECT list_distinct(flatten(list(s))) AS bs FROM sh WHERE doc_id % 50 = 0
       )
       SELECT doc_id,
              CAST(length(list_intersect(s, bs)) AS BIGINT) AS n_overlap
       FROM sh, bench
       WHERE doc_id % 50 != 0 AND length(list_intersect(s, bs)) > 0""",
)
def decontaminate_ngram(sf_dir: str):
    """Benchmark decontamination: flag training docs sharing any word
    3-gram with a held-out benchmark set (docs with doc_id%50==0 stand
    in for the benchmark) — the eval-leakage gate of LLM data curation;
    n_overlap = how many of the doc's distinct shingles are leaked.

    Distributed shape: benchmark shingle hashes are a distributed
    distinct (benchmark sets are small by definition), broadcast once
    via ray.put; the corpus streams through one map_batches that marks
    per-row distinct-shingle membership with a vectorized searchsorted
    against the sorted benchmark array — corpus text never shuffles,
    no join, one pass over the corpus."""
    import numpy as np

    import ray as _ray

    from logpipe_ray.stages.dedup import batch_shingles

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _bench_mask(b: pa.Table, bench: bool) -> pa.Table:
        rem = _pc_mod(b["doc_id"], 50)
        return b.filter(pc.equal(rem, 0) if bench else pc.not_equal(rem, 0))

    def bench_partial(b: pa.Table) -> pa.Table:
        _, h = batch_shingles(_bench_mask(b, True)["text"])
        # uint64 hashes ride Arrow as reinterpreted int64 bits
        return pa.table({"h": pa.array(np.unique(h).view(np.int64))})

    # unique() yields None (not []) when every block is empty — e.g. a
    # corpus with no doc_id%50==0 docs of >=3 words (see CLAUDE.md)
    bench_hashes = (
        ds.map_batches(bench_partial, batch_format="pyarrow").unique("h")
    ) or []
    bench_arr = np.array(bench_hashes, dtype=np.int64).view(np.uint64)
    bench_arr.sort()
    bench_ref = _ray.put(bench_arr)

    def mark(b: pa.Table) -> pa.Table:
        b = _bench_mask(b, False)
        bh = _ray.get(bench_ref)
        off, h = batch_shingles(b["text"])
        if len(bh) == 0:
            hit = np.zeros(len(h), dtype=bool)
        else:
            idx = np.searchsorted(bh, h)
            hit = (idx < len(bh)) & (bh[np.minimum(idx, len(bh) - 1)] == h)
        cs = np.zeros(len(h) + 1, dtype=np.int64)
        np.cumsum(hit, out=cs[1:])
        n_overlap = cs[off[1:]] - cs[off[:-1]]
        keep = n_overlap > 0
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()).filter(pa.array(keep)),
                "n_overlap": pa.array(n_overlap[keep], type=pa.int64()),
            }
        )

    return ds.map_batches(mark, batch_format="pyarrow")


@query(
    "dedup_minhash_lsh",
    _EXACT_PAIRS_CTE + "\nSELECT doc_a, doc_b, jaccard_bp FROM verified",
)
def dedup_minhash_lsh(sf_dir: str):
    """MinHash+LSH near-dup candidates, exact-Jaccard verified (scale path:
    shingle→minhash→band explode→bucket groupby→candidate pairs).

    LSH recall is probabilistic in general (measured vs the exact path
    in tests), but on the synthetic corpus every true pair has J ≥ 0.5
    where the 16-band × 8-row miss probability is ≤ (1-0.5^8)^16 ≈ 6%,
    and the pipeline's fixed hash seeds make the outcome deterministic:
    the verified set MEASURES equal to the exact all-pairs threshold
    set at sf0.001/0.01, so the exact SQL set is a valid hash oracle
    here (same oracle as dedup_lsh_verified)."""
    from logpipe_ray.pipelines.dedup_pipeline import minhash_lsh_pairs

    return minhash_lsh_pairs(sf_dir, threshold_bp=2000)


@query(
    "dedup_lsh_verified",
    _EXACT_PAIRS_CTE + "\nSELECT doc_a, doc_b, jaccard_bp FROM verified",
)
def dedup_lsh_verified(sf_dir: str):
    """The LSH pipeline in its full-recall configuration (bands == k:
    128 single-hash bands — a pair is a candidate iff it shares any
    minhash; miss probability for J ≥ 0.2 is (1-0.2)^128 ≈ 4e-13), so
    the verified output equals the exact all-pairs threshold set and is
    hash-checked against the SQL oracle. Same distributed machinery as
    dedup_minhash_lsh."""
    from logpipe_ray.pipelines.dedup_pipeline import minhash_lsh_pairs

    return minhash_lsh_pairs(sf_dir, threshold_bp=2000, k=128, bands=128)


@query("dedup_simhash", None)  # 63-bit sketch — verified vs reimpl in tests
def dedup_simhash(sf_dir: str):
    from logpipe_ray.stages.dedup import add_simhash

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: add_simhash(b).select(["doc_id", "simhash"]),
        batch_format="pyarrow",
    )


@query("dedup_simhash_pairs", None)  # full-recall property tested vs brute
def dedup_simhash_pairs(sf_dir: str):
    """Banded SimHash near-dup search: pairs within Hamming distance 3
    (pigeonhole-complete at 4 bands — tested equal to the brute-force
    all-pairs scan). Sketch values are blake2b-derived, so no SQL
    oracle; recall/equality is property-tested instead."""
    from logpipe_ray.pipelines.dedup_pipeline import simhash_near_pairs

    return simhash_near_pairs(sf_dir, max_hamming=3)


# ---------------------------------------------------------------------------
# Embedding similarity
# ---------------------------------------------------------------------------


def _query_vectors(sf_dir: str, n: int = 5):
    import pyarrow.parquet as pq

    from logpipe_ray.stages.similarity import _matrix

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t["vec_id"], n))
    return t["vec_id"].to_pylist(), _matrix(t["embedding"])


@query(
    "embed_knn",
    """WITH q AS (
         SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
         FROM embeddings WHERE vec_id < 5
       ), s AS (
         SELECT qid, c.vec_id AS nid,
                list_cosine_similarity(qv, CAST(c.embedding AS DOUBLE[])) AS cos
         FROM q CROSS JOIN embeddings c WHERE c.vec_id != qid
       ), r AS (
         SELECT qid AS query_id, nid AS neighbor_id,
                row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
         FROM s
       )
       SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id
       FROM r WHERE rank <= 5""",
)
def embed_knn(sf_dir: str):
    """Brute-force cosine top-5 for query vectors 0..4 (broadcast query
    matrix, per-batch numpy matmul, per-query merge)."""
    from logpipe_ray.stages.similarity import knn_topk

    qids, qmat = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_topk(ds, qids, qmat, k=5)


@query(
    "embed_topk_pairs",
    """WITH v AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       ), pairs AS (
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                list_cosine_similarity(a.e, b.e) AS cos
         FROM v a JOIN v b ON a.vec_id < b.vec_id
       ), r AS (
         SELECT vec_a, vec_b,
                row_number() OVER (ORDER BY cos DESC, vec_a, vec_b) AS rank
         FROM pairs
       )
       SELECT CAST(rank AS BIGINT) AS rank, vec_a, vec_b FROM r WHERE rank <= 20""",
)
def embed_topk_pairs(sf_dir: str):
    """Embedding near-dup: top-20 most-cosine-similar distinct pairs,
    via distributed chunk-pair block matmuls (no driver gram matrix —
    each task scores one chunk_rows² block; only top-k partials move)."""
    from logpipe_ray.stages.similarity import topk_cosine_pairs_distributed

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return topk_cosine_pairs_distributed(ds, k=20, chunk_rows=2048)


@query(
    "embed_dedup_cosine",
    """WITH v AS (
         SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       )
       SELECT a.vec_id FROM v a
       WHERE NOT EXISTS (
         SELECT 1 FROM v b
         WHERE b.vec_id < a.vec_id
           AND list_cosine_similarity(b.e, a.e) >= 0.45
       )""",
)
def embed_dedup_cosine(sf_dir: str):
    """Embedding-cosine near-dup REMOVAL (vs embed_topk_pairs, which
    only ranks): survivors after dropping every vector with cosine ≥
    0.45 to a lower-id vector. Distributed chunk-pair matmuls → dup-
    proportional edge set → broadcast removal filter. Threshold 0.45
    sits in a ≥2e-3 gap of the synthetic corpus's cosine distribution,
    so float64-matmul vs DuckDB-double order-of-summation differences
    cannot flip a pair across it."""
    from logpipe_ray.stages.similarity import cosine_dedup_distributed

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_dedup_distributed(ds, threshold=0.45, chunk_rows=2048).select_columns(
        ["vec_id"]
    )


@query("embed_ann_lsh", None)  # ANN recall < 1 by design — measured in tests
def embed_ann_lsh(sf_dir: str):
    from logpipe_ray.stages.similarity import ann_knn_bucketed

    qids, qmat = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann_knn_bucketed(ds, qids, qmat, k=5)


@query("embed_dedup_lsh", None)  # LSH recall < 1 by design — measured in tests
def embed_dedup_lsh(sf_dir: str):
    """Sub-quadratic embedding-cosine dedup (the 100 TB scale path next
    to embed_dedup_cosine's exact chunk-pair variant): hyperplane-LSH
    band buckets → one sort → run-scan candidate pairs → exact-cosine
    verify. Precision is exact (every removal cosine-verified) but
    recall is probabilistic per band collision, so there is no SQL
    oracle; tests/test_dedup_text.py asserts it removes exactly the
    planted near-dup set (miss prob ~1e-10 at the planted cosine) and
    matches the exact path there. Threshold 0.82 targets true near-dups
    (the 0.45 exact-path threshold sits below LSH's useful recall
    regime by design of random-hyperplane collision probabilities)."""
    from logpipe_ray.stages.similarity import cosine_dedup_lsh

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_dedup_lsh(ds, threshold=0.82, n_planes=8, bands=16).select_columns(
        ["vec_id"]
    )


@query("semantic_dedup", None)  # cluster-boundary misses by design — tested
def semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster
    the embedding space, near-dup-remove only WITHIN clusters —
    quadratic work drops n² → Σ m². Not SQL-expressible (k-means cells
    + boundary-straddle misses are inherent to the method); pytest
    properties assert planted-recall with a boundary-straddle bound and
    removal ⊆ the global exact removal set (tests/test_semdedup.py).
    Threshold matches embed_dedup_lsh's near-dup operating point."""
    from logpipe_ray.stages.similarity import semantic_cluster_dedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semantic_cluster_dedup(
        ds, threshold=0.82, n_clusters=16
    ).select_columns(["vec_id"])


@query("embed_ann_ivf", None)  # ANN recall < 1 by design — measured in tests
def embed_ann_ivf(sf_dir: str):
    """IVF ANN at nprobe=4 of 8 centroid cells (the real ANN operating
    point). Not SQL-expressible (k-means cells); verified by pytest
    properties instead: full probe (nprobe=n_clusters) is asserted
    EQUAL to brute-force kNN, and recall at nprobe=4 is measured
    against brute force (tests/test_similarity.py)."""
    from logpipe_ray.stages.similarity import ivf_knn

    qids, qmat = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ivf_knn(ds, qids, qmat, k=5, n_clusters=8, nprobe=4)


# ---------------------------------------------------------------------------
# Multimodal payload plumbing (decode stubbed — no codecs in container)
# ---------------------------------------------------------------------------


@query(
    "multimodal_meta",
    """SELECT doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
              CAST(64 + (octet_length(encode(text)) & 1023) AS BIGINT) AS width,
              CAST(64 + ((octet_length(encode(text)) * 31) & 1023) AS BIGINT)
                AS height
       FROM documents""",
)
def multimodal_meta(sf_dir: str):
    """Binary payload → actor-pool decode stub → typed metadata columns."""
    from logpipe_ray.stages.multimodal import DecodeStub, encode_payload

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(encode_payload, batch_format="pyarrow")
    decoded = ds.map_batches(
        DecodeStub, batch_format="pyarrow", concurrency=2, num_cpus=0.5, batch_size=256
    )
    return decoded.map_batches(
        lambda b: b.select(["doc_id", "payload_bytes", "width", "height"]),
        batch_format="pyarrow",
    )


@query(
    "bigram_topk",
    """SELECT b AS bigram, CAST(count(*) AS BIGINT) AS n
       FROM (SELECT unnest(list_transform(range(1, len(ws)),
                                          i -> ws[i] || ' ' || ws[i+1])) AS b
             FROM (SELECT string_split(text, ' ') AS ws FROM documents))
       GROUP BY b ORDER BY n DESC, b LIMIT 50""",
)
def bigram_topk(sf_dir: str):
    """Corpus bigram vocabulary top-50 via the Misra–Gries
    exact-top-k kernel (functions/sketches.heavy_hitters_exact_topk,
    same shape as word_topk_mg): MG partials are ≤ (m+1) rows per
    block — the shuffle volume is m-bounded no matter how large the
    bigram domain grows, where the previous groupby carried EVERY
    distinct bigram through Ray's sort-based aggregate (the bigram
    domain is unbounded — it grows with the corpus, unlike vocab_topk's
    fixed token vocabulary). The runtime certificate (k-th exact count
    > total decrement) keeps the result provably equal to the SQL
    top-k; tie-break (n desc, bigram asc) matches the oracle."""
    from logpipe_ray.functions.sketches import heavy_hitters_exact_topk
    from logpipe_ray.stages.text_analysis import _doc_bigrams

    ds = _read(sf_dir, "documents", ["text"])

    def bigrams_of(b: pa.Table) -> pa.Array:
        _, bg = _doc_bigrams(b, "text")
        return bg

    top = heavy_hitters_exact_topk(ds, k=50, m=2048, make_values=bigrams_of)
    return top.rename_columns(["bigram", "n"])


@query(
    "doc_lm_familiarity",
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       bg AS (SELECT doc_id,
                     unnest(list_transform(range(1, len(ws)),
                                           i -> ws[i] || ' ' || ws[i+1])) AS b
              FROM ws),
       cnt AS (SELECT b, count(*) AS n FROM bg GROUP BY b),
       model AS (SELECT b, n FROM cnt WHERE n >= 5),
       per_doc AS (
         SELECT bg.doc_id, count(*) AS n_bg,
                sum(COALESCE(m.n, 0)) AS fam
         FROM bg LEFT JOIN model m ON bg.b = m.b
         GROUP BY bg.doc_id)
       SELECT d.doc_id,
              CAST(COALESCE(p.n_bg, 0) AS BIGINT) AS n_bigrams,
              CAST(COALESCE(p.fam, 0) AS BIGINT) AS familiarity
       FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id""",
)
def doc_lm_familiarity(sf_dir: str):
    """Count-pruned bigram-LM familiarity scoring (the CCNet-style LM
    quality filter, Wenzek et al. 2019, restated exact-integer): pass 1
    folds corpus bigram counts and prunes to count ≥ 5 (deterministic,
    unlike top-K tie-breaking); the pruned model broadcasts once; pass 2
    scores every doc vectorized (searchsorted + reduceat). Integer
    familiarity sums are bit-reproducible where float perplexity's
    log-sum order is not — hence a full SQL oracle."""
    from logpipe_ray.stages.text_analysis import lm_familiarity_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return lm_familiarity_scores(ds, min_count=5)


@query(
    "train_val_split",
    """SELECT doc_id,
              CASE WHEN ((abs(doc_id) % 100000007) * 2654435761) % 100 < 95
                   THEN 'train' ELSE 'val' END AS split
       FROM documents""",
)
def train_val_split(sf_dir: str):
    """Deterministic hash-based train/val split (95/5): a pure function
    of the id, so membership is stable across runs, engines and
    re-partitioning — the scale-correct alternative to seeded
    random_sample for corpus splits."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def split(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # abs + pre-mod: keeps the product < 2^63 for any int64 id
        # (DuckDB BIGINT errors, not wraps, on overflow) and sidesteps
        # the numpy-vs-SQL negative-modulo sign difference
        bucket = ((np.abs(ids) % 100000007) * 2654435761) % 100
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "split": pa.array(
                    np.where(bucket < 95, "train", "val"), type=pa.string()
                ),
            }
        )

    return ds.map_batches(split, batch_format="pyarrow")


@query(
    "source_cap",
    """SELECT doc_id, source FROM (
         SELECT doc_id, source,
                row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         FROM documents
       ) t WHERE rn <= 10""",
)
def source_cap(sf_dir: str):
    """Per-domain contribution cap (data mixing): keep at most 10 docs
    per source, deterministic first-by-doc_id — the "no domain may
    dominate the mix" curation op.

    Distributed shape: per-batch vectorized partial cap (one lexsort;
    ≤ cap×sources rows leave any block), then the SAME kernel tree-folds
    the partials (`smallagg.fold_blocks_tree` — cap selection is a
    merge, so every fold task sees ≤ fanin × cap × sources rows at any
    block count) — no corpus sort, doc rows beyond the partial caps
    never shuffle."""
    import numpy as np

    CAP = 10
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    schema = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])

    def cap_per_source(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return schema.empty_table()
        from logpipe_ray.stages.smallagg import run_ranks

        src = b["source"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = pc.cast(b["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, src))
        keep = order[run_ranks(src[order]) < CAP]
        return pa.table(
            {
                "doc_id": pa.array(doc[keep], type=pa.int64()),
                "source": pa.array(src[keep], type=pa.string()),
            }
        )

    from logpipe_ray.stages.smallagg import fold_blocks_tree

    partials = ds.map_batches(cap_per_source, batch_format="pyarrow")
    # cap selection is a merge (min-CAP-by-doc_id semilattice): tree-fold
    # it — a flat repartition(1) would concat n_blocks × cap × sources
    # rows into ONE block (the one-block-fold trap at web-scale block
    # counts)
    return fold_blocks_tree(partials, cap_per_source)


@query(
    "multimodal_resize",
    """SELECT doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
              CAST(LEAST(octet_length(encode(text)), 224*224) AS BIGINT)
                AS resized_bytes,
              CAST(224 AS BIGINT) AS out_w, CAST(224 AS BIGINT) AS out_h
       FROM documents""",
)
def multimodal_resize(sf_dir: str):
    """Actor-pool resize stage (deterministic truncation fake — real
    resampler raises; the Ray plumbing is the deliverable)."""
    from logpipe_ray.stages.multimodal import ResizeStub, encode_payload

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(encode_payload, batch_format="pyarrow")
    resized = ds.map_batches(
        ResizeStub, batch_format="pyarrow", concurrency=2, num_cpus=0.5, batch_size=256
    )
    return resized.map_batches(
        lambda b: b.select(
            ["doc_id", "payload_bytes", "resized_bytes", "out_w", "out_h"]
        ),
        batch_format="pyarrow",
    )


@query(
    "multimodal_frames",
    """WITH p AS (
         SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
       ), e AS (
         SELECT doc_id, nb,
                unnest(range(0, CAST(ceil(nb/97.0) AS BIGINT))) AS fi
         FROM p
       )
       SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
              CAST(LEAST(97, nb - fi*97) AS BIGINT) AS frame_bytes
       FROM e""",
)
def multimodal_frames(sf_dir: str):
    """Zero-copy frame-sampling flat-map over binary payloads (fixed
    97-byte stride fake — real demuxer raises)."""
    from logpipe_ray.stages.multimodal import FrameSampleStub, encode_payload

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(encode_payload, batch_format="pyarrow")
    frames = ds.map_batches(
        FrameSampleStub,
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=0.5,
        batch_size=256,
    )
    return frames.map_batches(
        lambda b: b.select(["doc_id", "frame_idx", "frame_bytes"]),
        batch_format="pyarrow",
    )


@query(
    "multimodal_decode_real",
    """WITH p AS (
         SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
       ), d AS (
         SELECT doc_id, 1 + nb % 64 AS w, 1 + (nb * 7) % 64 AS h FROM p
       )
       SELECT doc_id,
              CAST(54 + ((w*3+3)//4*4) * h AS BIGINT) AS payload_bytes,
              CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height
       FROM d""",
)
def multimodal_decode_real(sf_dir: str):
    """REAL image decode path (no codec library needed): synthesize
    valid 24-bpp BMP payloads per document (vectorized header scatter,
    stages/multimodal.encode_bmp_payload), then the actor-pool decoder
    with ``real=True`` parses width/height back out of the actual
    BITMAPINFOHEADER bytes. The oracle recomputes the dimensions and
    the padded file size independently in SQL — the decoded values must
    round-trip through real image bytes."""
    from logpipe_ray.stages.multimodal import DecodeStub, encode_bmp_payload

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(encode_bmp_payload, batch_format="pyarrow", batch_size=4096)
    decoded = ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"real": True},
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=0.5,
        batch_size=4096,
    )
    return decoded.map_batches(
        lambda b: b.select(["doc_id", "payload_bytes", "width", "height"]),
        batch_format="pyarrow",
    )


@query(
    "multimodal_audio_real",
    """WITH p AS (
         SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
       ), d AS (
         SELECT doc_id, 1 + nb % 2048 AS n FROM p
       ), s AS (
         SELECT doc_id, n,
                list_transform(range(0, CAST(n AS INT)),
                  i -> ((doc_id*1000003 + i*10007) % 65536) - 32768) AS smp
         FROM d
       )
       SELECT doc_id,
              CAST(n AS BIGINT) AS n_samples,
              CAST(16000 AS BIGINT) AS sample_rate,
              CAST(list_aggregate(list_transform(smp, x -> abs(x)), 'sum')
                   AS BIGINT) AS sum_abs,
              CAST(COALESCE(list_aggregate(
                     list_transform(range(1, CAST(n AS INT)),
                       i -> CASE WHEN (smp[i] < 0) != (smp[i+1] < 0)
                                 THEN 1 ELSE 0 END), 'sum'), 0)
                   AS BIGINT) AS zero_crossings
       FROM s""",
)
def multimodal_audio_real(sf_dir: str):
    """REAL audio decode path (no codec library needed): synthesize
    valid PCM16 mono WAV payloads per document (vectorized header +
    sample scatter, stages/multimodal.encode_wav_payload — stdlib
    ``wave`` reads them back byte-exact, proven in tests), then the
    actor-pool WavDecode parses the RIFF header and EVERY sample out of
    the Arrow data buffer and emits integer features (Σ|sample|,
    zero-crossing count). The oracle recomputes all features from the
    deterministic synth formula in SQL — the values must round-trip
    through real audio bytes."""
    from logpipe_ray.stages.multimodal import WavDecode, encode_wav_payload

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(encode_wav_payload, batch_format="pyarrow", batch_size=2048)
    decoded = ds.map_batches(
        WavDecode,
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=0.5,
        batch_size=2048,
    )
    return decoded.map_batches(
        lambda b: b.select(
            ["doc_id", "n_samples", "sample_rate", "sum_abs", "zero_crossings"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Log-file text source (file → lines with per-stream counters)
# ---------------------------------------------------------------------------


def _textsrc_fixture(sf_dir: str) -> str:
    """Write documents as per-source text files (deterministic: lines in
    doc_id order) — the watched-log-directory fixture."""
    import os

    import pyarrow.parquet as pq

    tag = sf_dir.strip("/").replace("/", "_")
    d = f"/tmp/lpr_textsrc_{tag}"
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    t = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])
        .sort_by("doc_id")
    )
    by_src: dict[str, list[str]] = {}
    for src, text in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        by_src.setdefault(src, []).append(text)
    for src, lines in by_src.items():
        with open(os.path.join(d, f"{src}.log"), "w") as f:
            f.write("\n".join(lines) + "\n")
    # files the glob screens must skip (reference `.`/`_` prefix rule)
    with open(os.path.join(d, "_skipme.log"), "w") as f:
        f.write("nope\n")
    with open(os.path.join(d, "notalog.txt"), "w") as f:
        f.write("nope\n")
    with open(marker, "w") as f:
        f.write("ok")
    return d


@query(
    "log_lines_source",
    """SELECT source || '.log' AS source,
              CAST(row_number() OVER w AS BIGINT) AS line_no,
              CAST(sum(octet_length(encode(text)) + 1) OVER w
                   - (octet_length(encode(text)) + 1) AS BIGINT) AS byte_offset,
              CAST(length(text) AS BIGINT) AS n_chars
       FROM documents
       WINDOW w AS (PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING)""",
)
def log_lines_source(sf_dir: str):
    """Text-file source: glob-screened files → line rows with per-file
    line_no/byte_offset counters (the trace_line/trace_offset analogs)."""
    from logpipe_ray.sources.text import read_log_lines

    d = _textsrc_fixture(sf_dir)
    ds = read_log_lines(d, include=["*.log"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "line_no": b["line_no"],
                "byte_offset": b["byte_offset"],
                "n_chars": pc.cast(pc.utf8_length(b["line"]), pa.int64()),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


@query(
    "log_lines_tail",
    # identical oracle to log_lines_source: two incremental tail reads
    # over a growing directory must union to exactly the full-read rows
    """SELECT source || '.log' AS source,
              CAST(row_number() OVER w AS BIGINT) AS line_no,
              CAST(sum(octet_length(encode(text)) + 1) OVER w
                   - (octet_length(encode(text)) + 1) AS BIGINT) AS byte_offset,
              CAST(length(text) AS BIGINT) AS n_chars
       FROM documents
       WINDOW w AS (PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING)""",
)
def log_lines_tail(sf_dir: str):
    """Streaming-source skeleton end-to-end: write half of every log,
    tail-read + commit, append the rest (plus an unterminated partial
    line that must NOT be consumed), tail-read again — the two
    increments together must equal the one-shot full read, with line
    numbers and byte offsets continuing exactly across runs."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from logpipe_ray.sources.stream import DirectoryTailSource

    d = tempfile.mkdtemp(prefix="lpr_tail_")
    t = (
        pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        ).sort_by("doc_id")
    )
    by_src: dict[str, list[str]] = {}
    for src, text in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        by_src.setdefault(src, []).append(text)

    src_obj = DirectoryTailSource(
        d, os.path.join(d, "_state"), include=["*.log"]
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "line_no": b["line_no"],
                "byte_offset": b["byte_offset"],
                "n_chars": pc.cast(pc.utf8_length(b["line"]), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("line_no", pa.int64()),
            ("byte_offset", pa.int64()),
            ("n_chars", pa.int64()),
        ]
    )

    def collect(ds) -> pa.Table:
        return pa.Table.from_pylist(
            ds.map_batches(prep, batch_format="pyarrow").take_all(),
            schema=out_schema,
        )

    # run 1: first half of every file (+ a partial line with no newline)
    for src, lines in by_src.items():
        half = (len(lines) + 1) // 2
        with open(os.path.join(d, f"{src}.log"), "w") as f:
            f.write("\n".join(lines[:half]) + "\n")
            f.write(lines[half][:3] if len(lines) > half else "")
    part1 = collect(src_obj.read())
    src_obj.commit()
    # run 2: complete the partial line + append the rest
    for src, lines in by_src.items():
        half = (len(lines) + 1) // 2
        with open(os.path.join(d, f"{src}.log"), "a") as f:
            if len(lines) > half:
                f.write(lines[half][3:] + "\n")
                rest = lines[half + 1 :]
                if rest:
                    f.write("\n".join(rest) + "\n")
    part2 = collect(src_obj.read())
    src_obj.commit()
    return pa.concat_tables([part1, part2])


@query(
    "exec_source",
    # identical oracle to log_lines_source: the exec source `cat`ing the
    # fixture files must produce exactly the file source's rows/offsets
    """SELECT source || '.log' AS source,
              CAST(row_number() OVER w AS BIGINT) AS line_no,
              CAST(sum(octet_length(encode(text)) + 1) OVER w
                   - (octet_length(encode(text)) + 1) AS BIGINT) AS byte_offset,
              CAST(length(text) AS BIGINT) AS n_chars
       FROM documents
       WINDOW w AS (PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING)""",
)
def exec_source(sf_dir: str):
    """Command-output source (``logpipe-input-exec`` analog,
    src-plugins/logpipe-input-exec.c:85-228): the command list is the
    work list — one Ray task per command, each subprocessing its command
    and line-splitting stdout with per-command line/offset counters.
    Here each command ``cat``s one fixture log file, so the result must
    equal the file source's rows exactly (source-equivalence oracle)."""
    import glob
    import os

    from logpipe_ray.registry import SOURCES

    d = _textsrc_fixture(sf_dir)
    cmds = [
        (os.path.basename(f), f"cat {f}")
        for f in sorted(glob.glob(os.path.join(d, "*.log")))
        if not os.path.basename(f).startswith(("_", "."))
    ]
    ds = SOURCES["exec"](cmds)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "line_no": b["line_no"],
                "byte_offset": b["byte_offset"],
                "n_chars": pc.cast(pc.utf8_length(b["line"]), pa.int64()),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


def _topic_fixture(sf_dir: str) -> str:
    """Documents as a 4-partition message-log topic (partition =
    doc_id % 4, key = doc_id, value = text; messages in doc_id order,
    one segment per partition) — the broker-side layout the consumer
    reads."""
    import os

    import pyarrow.parquet as pq

    from logpipe_ray.sources.kafka_log import write_topic_fixture

    import shutil
    import uuid

    tag = sf_dir.strip("/").replace("/", "_")
    d = f"/tmp/lpr_topic_{tag}"
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    # build in a scratch dir, publish atomically: write_topic_fixture
    # APPENDS, so a crash between a partial write and the marker would
    # otherwise duplicate messages on the retry
    tmp = f"{d}.build-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    t = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .sort_by("doc_id")
    )
    msgs = [
        (int(i) % 4, str(int(i)), s)
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    ]
    write_topic_fixture(tmp, msgs)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    shutil.rmtree(d, ignore_errors=True)
    try:
        os.rename(tmp, d)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race; d exists
    return d


@query(
    "kafka_log_source",
    """SELECT CAST(doc_id % 4 AS BIGINT) AS partition,
              CAST(row_number() OVER (PARTITION BY doc_id % 4
                                      ORDER BY doc_id) - 1 AS BIGINT) AS offset,
              CAST(doc_id AS BIGINT) AS key_id,
              CAST(length(text) AS BIGINT) AS n_chars
       FROM documents""",
)
def kafka_log_source(sf_dir: str):
    """Partitioned message-log consumer (``logpipe-input-kafka`` analog,
    src-plugins/logpipe-input-kafka.c:96-252): per-partition offset-
    ordered delivery with commit-after-deliver offsets, over the
    broker-style ``partition=N/segment-*.log`` layout. One segment per
    partition here, so offset = in-partition row number."""
    import tempfile

    from logpipe_ray.sources.kafka_log import MessageLogSource

    d = _topic_fixture(sf_dir)
    src = MessageLogSource(d, tempfile.mkdtemp(prefix="lpr_topic_state_"))
    ds = src.read()

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "partition": b["partition"],
                "offset": b["offset"],
                "key_id": pc.cast(b["key"], pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(b["value"]), pa.int64()),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


@query(
    "kafka_roundtrip",
    """SELECT CAST(doc_id AS BIGINT) AS key_id,
              CAST(length(text) AS BIGINT) AS n_chars
       FROM documents""",
)
def kafka_roundtrip(sf_dir: str):
    """Produce → consume identity through the message-log topic: the
    documents table is PRODUCED into a fresh partitioned topic
    (``MessageLogSink``, the output-kafka analog — parallel tasks each
    writing exclusive segments with atomic visibility) and CONSUMED
    back (``MessageLogSource``, the input-kafka analog); every message
    must come back exactly once with its key and value intact.
    Partition/offset are not exported: cross-segment order depends on
    task batching (as Kafka's depends on producer arrival)."""
    import tempfile

    from logpipe_ray.sources.kafka_log import MessageLogSource, produce_messages

    topic = tempfile.mkdtemp(prefix="lpr_topic_rt_")
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda b: pa.table(
            {
                "key": pc.cast(b["doc_id"], pa.string()),
                "value": b["text"],
            }
        ),
        batch_format="pyarrow",
    )
    # drive the produce to completion (count() is the barrier; partials
    # are partition-count-sized)
    produce_messages(docs, topic, partitions=4).count()

    src = MessageLogSource(topic, tempfile.mkdtemp(prefix="lpr_topic_rt_state_"))
    return src.read().map_batches(
        lambda b: pa.table(
            {
                "key_id": pc.cast(b["key"], pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(b["value"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


@query(
    "tcp_roundtrip",
    """SELECT CAST(doc_id AS BIGINT) AS key_id,
              CAST(length(text) AS BIGINT) AS n_chars
       FROM documents""",
)
def tcp_roundtrip(sf_dir: str):
    """Real-wire collector→aggregator topology (logpipe-output-tcp →
    logpipe-input-tcp): the documents table is framed and SENT over
    127.0.0.1 sockets by the actor-pool TcpFrameSink (with a session
    drop injected, exercising reconnect-resend; a DEAD first peer in
    the forward list, exercising multi-peer disable-timeout failover;
    and deflate wire compression matched by the collector's
    uncompress flag), received by the threaded collector into a
    merge-by-filename spool, and read back incrementally with
    DirectoryTailSource. Every doc must come back exactly once with
    its id and content length intact."""
    import tempfile

    from logpipe_ray.sources.stream import DirectoryTailSource
    from logpipe_ray.sources.tcp import TcpFrameSink, start_collector

    spool = tempfile.mkdtemp(prefix="lpr_tcp_spool_")
    srv = start_collector(spool, fail_next_files=1, uncompress="deflate")
    # a dead peer that STAYS dead: bound but never listen()ed —
    # connects are RST-refused, and holding the bind for the whole
    # query keeps the OS from handing the port to a concurrent process
    # (a closed ephemeral port could be rebound mid-query)
    import socket as _socket

    _dead = _socket.socket()
    _dead.bind(("127.0.0.1", 0))
    dead_port = _dead.getsockname()[1]
    try:
        docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            lambda b: pa.table(
                {
                    "source": pc.binary_join_element_wise(
                        "fwd-",
                        pc.cast(_pc_mod(b["doc_id"], 4), pa.string()),
                        ".log",
                        "",
                    ),
                    "line": pc.binary_join_element_wise(
                        pc.cast(b["doc_id"], pa.string()), b["text"], "\t"
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        docs.map_batches(
            TcpFrameSink,
            fn_constructor_kwargs={
                "peers": [("127.0.0.1", dead_port), ("127.0.0.1", srv.port)],
                "retry_wait_s": 0.01,
                "compress": "deflate",
            },
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=2,
            num_cpus=0.5,
        ).materialize()
        tail = DirectoryTailSource(
            spool, tempfile.mkdtemp(prefix="lpr_tcp_state_"), include=["*.log"]
        )

        def back(b: pa.Table) -> pa.Table:
            # split the FIRST tab only (doc text may contain tabs)
            m = pc.extract_regex(b["line"], r"^(?P<id>\d+)\t(?P<rest>.*)$")
            return pa.table(
                {
                    "key_id": pc.cast(pc.struct_field(m, "id"), pa.int64()),
                    "n_chars": pc.cast(
                        pc.utf8_length(pc.struct_field(m, "rest")), pa.int64()
                    ),
                }
            )

        return tail.read().map_batches(back, batch_format="pyarrow")
    finally:
        srv.shutdown()
        srv.server_close()
        _dead.close()


@query(
    "events_sliding",
    """SELECT user_id, "window", count(*) AS n_events
       FROM (
         SELECT user_id, CAST(floor(epoch(ts)/1800) AS BIGINT) AS "window" FROM events
         UNION ALL
         SELECT user_id, CAST(floor(epoch(ts)/1800) AS BIGINT) - 1 AS "window" FROM events
       ) t GROUP BY 1, 2""",
)
def events_sliding(sf_dir: str):
    """Sliding window (width 3600s, slide 1800s): each event lands in two
    half-overlapping windows — emitted by duplicating rows with both
    window ids in map_batches. Window id w covers [w*1800, w*1800+3600).

    (user, window) is UNBOUNDED, so per-batch pyarrow group_by partials
    complete through ``sorted_runs_fold`` per user — Ray's sort-based
    groupby would range-sort every duplicated raw row instead."""
    from logpipe_ray.stages.smallagg import sorted_runs_fold

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        import numpy as np

        users = b["user_id"].to_numpy(zero_copy_only=False)
        epoch_us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = epoch_us // (1800 * 1_000_000)
        return pa.table(
            {
                "user_id": pa.array(np.concatenate([users, users]), type=pa.int64()),
                "window": pa.array(np.concatenate([w, w - 1]), type=pa.int64()),
            }
        )

    slide_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("window", pa.int64()),
            ("n_events", pa.int64()),
        ]
    )

    def slide_partial(b: pa.Table) -> pa.Table:
        b = prep(b)
        if b.num_rows == 0:
            return slide_schema.empty_table()
        g = b.group_by(["user_id", "window"]).aggregate([([], "count_all")])
        g = g.rename_columns(
            ["n_events" if c == "count_all" else c for c in g.column_names]
        )
        return g.select(slide_schema.names).cast(slide_schema)

    def slide_combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return slide_schema.empty_table()
        g = b.group_by(["user_id", "window"]).aggregate([("n_events", "sum")])
        g = g.rename_columns(
            ["n_events" if c == "n_events_sum" else c for c in g.column_names]
        )
        return g.select(slide_schema.names).cast(slide_schema)

    return sorted_runs_fold(
        ds.map_batches(slide_partial, batch_format="pyarrow"),
        "user_id",
        slide_combine,
    )


@query(
    "seq_dedup_exact",
    # tokens are a pure function of m (sources/sequences.py), so distinct
    # token arrays == distinct m — the oracle counts via m while the Ray
    # side hashes the actual token bytes (honest content dedup).
    None,  # oracle registered by __ray_entry__ (needs SEQ_CTE)
)
def seq_dedup_exact(sf_dir: str):
    """Exact dedup over the token payload: per-row blake2b content hash
    of the token bytes (functions/tokens.add_tokens_hash — measured
    faster than the vectorized kernel at these row lengths, see its
    docstring) → per-batch (hash, n) value_counts partials completed by
    ``sorted_runs_fold`` (hash domain is distinct-content-proportional;
    Ray's sort-based groupby would range-sort every raw hash row) →
    (one row) corpus dedup stats."""
    import numpy as np

    from logpipe_ray.functions.tokens import add_tokens_hash
    from logpipe_ray.sources.sequences import synthesize_sequences
    from logpipe_ray.stages.smallagg import run_starts, sorted_runs_fold

    ds = synthesize_sequences(sf_dir)
    hp_schema = pa.schema([("tokens_hash", pa.int64()), ("n", pa.int64())])

    def hash_partial(b: pa.Table) -> pa.Table:
        h = add_tokens_hash(b)["tokens_hash"].combine_chunks()
        if len(h) == 0:
            return hp_schema.empty_table()
        vc = h.value_counts()
        return pa.table(
            {
                "tokens_hash": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        ).cast(hp_schema)

    def stats_combine(b: pa.Table) -> pa.Table:
        # a hash's partial rows are confined to this block, so each
        # distinct sequence is counted exactly once across all blocks;
        # only 3 int64 partials leave the block
        if b.num_rows == 0:
            return pa.table(
                {
                    "n_rows": pa.array([], type=pa.int64()),
                    "n_unique_sequences": pa.array([], type=pa.int64()),
                    "n_dupe_rows": pa.array([], type=pa.int64()),
                }
            )
        h = b["tokens_hash"].combine_chunks().to_numpy(zero_copy_only=False)
        n = b["n"].combine_chunks().to_numpy(zero_copy_only=False)
        total = int(n.sum())
        uniq = int(len(run_starts(h)))
        return pa.table(
            {
                "n_rows": pa.array([total], type=pa.int64()),
                "n_unique_sequences": pa.array([uniq], type=pa.int64()),
                "n_dupe_rows": pa.array([total - uniq], type=pa.int64()),
            }
        )

    import pandas as pd

    agg = sorted_runs_fold(
        ds.map_batches(hash_partial, batch_format="pyarrow"),
        "tokens_hash",
        stats_combine,
    ).sum(["n_rows", "n_unique_sequences", "n_dupe_rows"])
    return pd.DataFrame(
        {
            "n_rows": [int(agg["sum(n_rows)"])],
            "n_unique_sequences": [int(agg["sum(n_unique_sequences)"])],
            "n_dupe_rows": [int(agg["sum(n_dupe_rows)"])],
        }
    )


@query(
    "events_asof",
    """SELECT p.event_id,
              CAST(s.event_id AS DOUBLE) AS signup_event_id
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
         ON p.user_id = s.user_id AND p.ts >= s.ts""",
)
def events_asof(sf_dir: str):
    """As-of join: each purchase matched to the user's most recent prior
    signup (groupby(user).map_groups + pd.merge_asof)."""
    from logpipe_ray.stages.window import asof_join_by_key

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def mark(b: pa.Table) -> pa.Table:
        b = b.append_column("is_l", pc.equal(b["event_type"], "purchase"))
        return b.append_column("is_r", pc.equal(b["event_type"], "signup"))

    marked = ds.map_batches(mark, batch_format="pyarrow")
    return asof_join_by_key(
        marked,
        key_col="user_id",
        ts_col="ts",
        left_mask_col="is_l",
        right_mask_col="is_r",
        left_id="event_id",
        right_id="event_id",
        out_right_id="signup_event_id",
    )


@query(
    "events_cumsum",
    """SELECT event_id,
              CAST(SUM(CAST(round(value*100) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
       FROM events""",
)
def events_cumsum(sf_dir: str):
    from logpipe_ray.stages.window import cumulative_sum_by_key

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return cumulative_sum_by_key(ds)


@query(
    "events_lag_diff",
    """SELECT event_id,
              CAST(round(value*100) AS BIGINT)
                - COALESCE(lag(CAST(round(value*100) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id),
                  CAST(round(value*100) AS BIGINT))
                AS delta_cents
       FROM events""",
)
def events_lag_diff(sf_dir: str):
    """LAG() window: per-user value delta vs the previous event (first
    event per user → 0; pure int64, no nullable-int degradation)."""
    from logpipe_ray.stages.window import lag_diff_by_key

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return lag_diff_by_key(ds)


@query(
    "events_union",
    """SELECT event_type, count(*) AS n FROM (
         SELECT event_type FROM events WHERE event_type = 'purchase' AND value >= 100
         UNION ALL
         SELECT event_type FROM events WHERE event_type = 'error'
       ) t GROUP BY event_type""",
)
def events_union(sf_dir: str):
    """Dataset.union of two filtered slices, then aggregate."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    purchases = ds.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.equal(b["event_type"], "purchase"),
                pc.greater_equal(b["value"], 100.0),
            )
        ).select(["event_type"]),
        batch_format="pyarrow",
    )
    errors = ds.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "error")).select(["event_type"]),
        batch_format="pyarrow",
    )
    from logpipe_ray.stages.smallagg import count_partials, fold_partials_tree

    merged = purchases.union(errors)
    return fold_partials_tree(count_partials(merged, "event_type"), "event_type", "n")


@query(
    "events_approx_users",
    """SELECT event_type,
              CAST(count(DISTINCT user_id) AS BIGINT) AS approx_distinct
       FROM events GROUP BY event_type""",
)
def events_approx_users(sf_dir: str):
    """Approximate distinct users per event_type via mergeable KMV
    sketches (only ≤k-int64 sketch rows shuffle, never the values).

    Oracle note: a KMV sketch is EXACT whenever the true cardinality is
    below k (the sketch then holds every distinct hash —
    functions/sketches.kmv_estimate), and the driver's correctness
    scales (sf0.001: ~15, sf0.01: 150 distinct users per type) are
    below k=256, so exact COUNT(DISTINCT) is the principled oracle
    there — not a coincidence of seeds. Above k the estimate is
    approximate by design; tolerance vs exact is property-tested
    (test_dedup_text::TestKmvSketch) at cardinalities ≫ k."""
    from logpipe_ray.functions.sketches import approx_distinct_by_key

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return approx_distinct_by_key(ds, key_col="event_type", value_col="user_id")


@query(
    "multijoin_nation_revenue",
    """SELECT n_name,
              CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))
                   AS BIGINT) AS revenue_cents,
              count(*) AS n_items
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       GROUP BY n_name""",
)
def multijoin_nation_revenue(sf_dir: str):
    """Multi-way star join: fact ⋈ two broadcast dimensions chained
    (supplier, nation pre-joined driver-side — both tiny), then agg."""
    import pyarrow.parquet as pq

    from logpipe_ray.stages.joins import broadcast_join

    supplier = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    dim = supplier.join(
        nation, keys=["s_nationkey"], right_keys=["n_nationkey"]
    ).select(["s_suppkey", "n_name"])
    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
    joined = broadcast_join(ds, dim, keys="l_suppkey", right_keys="s_suppkey")

    def prep(b: pa.Table) -> pa.Table:
        disc = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        return pa.table({"n_name": b["n_name"], "rev_cents": _cents(disc)})

    from logpipe_ray.stages.smallagg import grouped_agg

    return grouped_agg(
        joined.map_batches(prep, batch_format="pyarrow"),
        "n_name",
        sums={"revenue_cents": "rev_cents"},
        count="n_items",
    )


@query(
    "agg_having",
    """SELECT source, count(*) AS n_docs
       FROM documents GROUP BY source HAVING count(*) >= 20""",
)
def agg_having(sf_dir: str):
    """Post-aggregation filter (HAVING): per-block count partials →
    tiny fold → vectorized filter (bounded key cardinality, so the
    partial/combine shape beats a row shuffle at any scale)."""
    from logpipe_ray.stages.smallagg import count_partials, fold_partials_tree

    ds = _read(sf_dir, "documents", ["source"])
    agg = fold_partials_tree(count_partials(ds, "source", out_col="n_docs"), "source", "n_docs")
    return agg.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_docs"], 20)),
        batch_format="pyarrow",
    )


@query(
    "dedup_clusters",
    _EXACT_PAIRS_CTE
    + """,
   edges AS (
     SELECT doc_a AS src, doc_b AS dst FROM verified
     UNION SELECT doc_b, doc_a FROM verified
   ), reach AS (
     SELECT src AS n, dst AS m FROM edges
     UNION
     SELECT r.n, e.dst FROM reach r JOIN edges e ON r.m = e.src
   )
   SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n""",
)
def dedup_clusters(sf_dir: str):
    """Near-dup clusters via DISTRIBUTED min-label propagation over the
    verified LSH pair set (full-recall bands==k config, so the SQL
    transitive-closure oracle enumerates the same components).
    cluster_rep = min doc_id reachable (min(m) over reach includes the
    node itself through any round-trip path; every node in an edge has
    one)."""
    from logpipe_ray.pipelines.dedup_pipeline import near_dup_clusters

    return near_dup_clusters(sf_dir, threshold_bp=2000, k=128, bands=128)


@query(
    "events_pivot",
    """SELECT user_id,
              CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS n_click,
              CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS n_view,
              CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
              CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS n_error,
              CAST(count(*) FILTER (event_type = 'signup')   AS BIGINT) AS n_signup
       FROM events GROUP BY user_id""",
)
def events_pivot(sf_dir: str):
    """Pivot: per-user event-type counts as columns (conditional partial
    aggregation inside map_batches → one small groupby)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    types = ["click", "view", "purchase", "error", "signup"]

    def prep(b: pa.Table) -> pa.Table:
        cols = {"user_id": b["user_id"]}
        for t in types:
            cols[f"n_{t}"] = pc.cast(pc.equal(b["event_type"], t), pa.int64())
        return pa.table(cols)

    from logpipe_ray.stages.smallagg import grouped_agg

    return grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        sums={f"n_{t}": f"n_{t}" for t in types},
    )


@query(
    "events_median",
    """SELECT event_type,
              CAST(median(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
                AS median_cents
       FROM events GROUP BY event_type""",
)
def events_median(sf_dir: str):
    """Exact median per group via histogram-rank over integer cents —
    no group ever materializes its raw rows in one block.

    Same kernel family as quality_percentile_filter's exact ranks
    (this file): per-block (event_type, cents) COUNT partials are the
    only thing that leaves a scan block (bounded by the distinct cent
    values, not the row count), a single-column sort co-locates each
    type's histogram (volume-bounded blocks — a type whose histogram
    exceeds one block would need the domain split, but the cent domain
    is fixed while rows grow without bound), and a vectorized
    cumulative-count rank scan reads the two middle elements exactly.
    Interpolated halves are exact in binary so the double compares
    bit-identically with DuckDB's median()."""
    import numpy as np

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"], "cents": _cents(b["value"])})

    from logpipe_ray.stages.smallagg import (
        count_partials,
        fold_partials_tree,
        run_starts,
    )

    partials = count_partials(
        ds.map_batches(prep, batch_format="pyarrow"), ["event_type", "cents"]
    )
    # The (type, cents) histogram domain is FIXED while rows grow
    # without bound — the tree fold combines the unbounded partial
    # stream down to one ≤|domain|-row block with bounded task memory
    # and NO sort (a keyed range sort on a 5-value event_type key emits
    # schema-less empty ranges once the stream outgrows the block
    # budget — the smallagg module-docstring failure class).
    hist = fold_partials_tree(partials, ["event_type", "cents"], "n")
    schema = pa.schema([("event_type", pa.string()), ("median_cents", pa.float64())])

    def median_scan(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return schema.empty_table()
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        names = enc.dictionary.to_pylist()
        c = b["cents"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, codes))
        codes, c, n = codes[order], c[order], n[order]
        starts = run_starts(codes)
        ends = np.concatenate((starts[1:], [len(codes)]))
        out_t, out_m = [], []
        for s, e in zip(starts, ends):  # ≤ |event types| iterations
            cum = np.cumsum(n[s:e])
            total = int(cum[-1])
            lo = c[s + np.searchsorted(cum, (total - 1) // 2 + 1)]
            hi = c[s + np.searchsorted(cum, total // 2 + 1)]
            out_t.append(names[codes[s]])
            out_m.append((lo + hi) / 2.0)
        return pa.table(
            {
                "event_type": pa.array(out_t, type=pa.string()),
                "median_cents": pa.array(out_m, type=pa.float64()),
            }
        )

    # Run the rank scan driver-side on the (result-sized, ≤|domain|-row,
    # single-block) histogram rather than via map_batches: Ray skips map
    # UDFs on empty blocks, so an empty events table would pass the
    # HISTOGRAM schema through as the query result instead of the
    # declared (event_type, median_cents) schema.
    blocks = [ray.get(r) for r in hist.to_arrow_refs()]
    non_empty = [b for b in blocks if b.num_rows]
    if not non_empty:
        return schema.empty_table()
    return median_scan(pa.concat_tables(non_empty))


@query(
    "events_latest",
    """SELECT user_id, event_id FROM (
         SELECT user_id, event_id,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
         FROM events
       ) t WHERE rn = 1""",
)
def events_latest(sf_dir: str):
    """Per-key argmax (latest event per user; rank/window-function shape).

    Vectorized per-batch partial argmax (one lexsort keeps the max-(ts,
    event_id) row per user per batch — ≤ n_users rows survive each
    block), then the same vectorized kernel folds the partials in a
    tiny final groupby. No per-key Python round-trips."""
    import numpy as np

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def argmax_per_user(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "ts": pa.array([], type=pa.int64()),
                    "event_id": pa.array([], type=pa.int64()),
                }
            )
        order = np.lexsort((eid, ts, u))  # user asc, ts asc, id asc
        us = u[order]
        last = np.nonzero(np.r_[us[1:] != us[:-1], True])[0]  # last per user
        keep = order[last]
        return pa.table(
            {
                "user_id": pa.array(u[keep], type=pa.int64()),
                "ts": pa.array(ts[keep], type=pa.int64()),
                "event_id": pa.array(eid[keep], type=pa.int64()),
            }
        )

    partials = ds.map_batches(argmax_per_user, batch_format="pyarrow")
    # argmax_per_user is associative over (ts, event_id), so it doubles
    # as the fold combine. The partials total n_blocks × n_users rows —
    # UNBOUNDED key cardinality, so a one-block fold would be a single-
    # worker OOM at hundreds of millions of users (the fold_partials
    # trap, CLAUDE.md). sorted_runs_fold instead: one volume-bounded
    # single-column sort on user_id co-locates each user's partial rows
    # in one block (never splitting a key run), where the same kernel
    # runs as the run-scan combine.
    from logpipe_ray.stages.smallagg import sorted_runs_fold

    # Empty-input schema guard (the Ray skip-empty class events_median
    # handles driver-side): on an empty events table the combine AND
    # the projection are skipped on the empty block, leaking the
    # 3-column partials schema. sorted_runs_fold materializes its input
    # anyway, so this count is free.
    partials = partials.materialize()
    if partials.count() == 0:
        return pa.schema(
            [("user_id", pa.int64()), ("event_id", pa.int64())]
        ).empty_table()
    return sorted_runs_fold(partials, "user_id", argmax_per_user).select_columns(
        ["user_id", "event_id"]
    )


@query(
    "pushdown_filter",
    """SELECT count(*) AS n_rows,
              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01'""",
)
def pushdown_filter(sf_dir: str):
    """Predicate pushdown at the read: the filter expression is given to
    read_parquet so row groups that can't match never leave storage
    (data-induced-predicate pattern) — no post-read filter stage."""
    from datetime import datetime

    import pyarrow.compute as _pc
    import pyarrow.dataset  # noqa: F401 — registers dataset expressions

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_shipdate"],
        filter=(_pc.field("l_shipdate") >= datetime(1995, 1, 1)),
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "one": pa.array([1] * b.num_rows, type=pa.int64()),
                "qty": pc.cast(b["l_quantity"], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .sum(["one", "qty"])
    )
    return pa.table(
        {
            "n_rows": pa.array([agg["sum(one)"]], type=pa.int64()),
            "sum_qty": pa.array([agg["sum(qty)"]], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# PII redaction / outer join / rollup (round 3 additions)
# ---------------------------------------------------------------------------

# The synthetic corpus contains no real PII, so the oracled query adds one
# corpus-hitting word alternative to the generic PII pattern — the
# replacement path is exercised on every batch, not just the count==0 path.
_REDACT_PATTERN = (
    r"[\w.+-]+@[\w-]+\.\w+"
    r"|\b(?:\d{1,3}\.){3}\d{1,3}\b"
    r"|\b\d{3}[- ]\d{2}[- ]\d{4}\b"
    r"|\bcustomer\b"
)


@query(
    "text_redact",
    f"""SELECT doc_id,
              regexp_replace(text, '{_REDACT_PATTERN}', '<PII>', 'g') AS text,
              CAST(length(regexp_extract_all(text, '{_REDACT_PATTERN}')) AS BIGINT)
                AS n_redactions
       FROM documents""",
)
def text_redact(sf_dir: str):
    """PII scrubbing over the corpus: replace every email/IPv4/SSN-shaped
    (plus one corpus-hitting word, see _REDACT_PATTERN) match with a
    placeholder and count redactions per doc. Pure vectorized map — two
    RE2 Arrow kernels per batch, zero shuffle; both engines run the SAME
    RE2 pattern string (pyarrow and DuckDB embed RE2), so replacement
    semantics are oracle-identical."""
    from logpipe_ray.stages.text_analysis import redact_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        return _i64(redact_batch(b, pattern=_REDACT_PATTERN), ["doc_id"])

    return ds.map_batches(prep, batch_format="pyarrow")


@query(
    "join_outer",
    """WITH c AS (SELECT c_custkey AS custkey, c_name FROM customer
                  WHERE c_acctbal < 0),
            o AS (SELECT o_custkey AS custkey,
                         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
                              AS BIGINT) AS total_cents
                  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
       SELECT COALESCE(c.custkey, o.custkey) AS custkey,
              COALESCE(c.c_name, '') AS c_name,
              COALESCE(o.total_cents, CAST(-1 AS BIGINT)) AS total_cents
       FROM c FULL OUTER JOIN o ON c.custkey = o.custkey""",
)
def join_outer(sf_dir: str):
    """Full outer join: negative-balance customers × per-customer totals
    of 'F'-status orders — each side holds keys the other lacks, so both
    null directions are exercised and then COALESCE-filled ('' / -1) to
    hash-match the SQL.

    Distributed shape: aggregate-before-join (per-batch pyarrow group_by
    partials; custkey is UNBOUNDED, so the partials fold through
    ``sorted_runs_fold`` — volume-bounded blocks, never a one-block
    all-customers table), then a hash-partitioned full_outer
    Dataset.join with the partition count bounded by the small side's
    row count (stages/joins.py policy)."""
    import numpy as np

    from logpipe_ray.stages.joins import hash_join
    from logpipe_ray.stages.smallagg import sorted_runs_fold

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

    def cust_prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b["c_acctbal"], 0.0))
        return pa.table(
            {
                "custkey": pc.cast(b["c_custkey"], pa.int64()),
                "c_name": b["c_name"],
            }
        )

    left = cust.map_batches(cust_prep, batch_format="pyarrow")

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderstatus"]
    )

    def ord_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["o_orderstatus"], "F"))
        t = pa.table(
            {
                "custkey": pc.cast(b["o_custkey"], pa.int64()),
                "total_cents": _cents(b["o_totalprice"]),
            }
        )
        if t.num_rows == 0:
            return t
        g = t.group_by(["custkey"]).aggregate([("total_cents", "sum")])
        g = g.rename_columns(
            [c[: -len("_sum")] if c.endswith("_sum") else c for c in g.column_names]
        )
        return g.select(["custkey", "total_cents"])

    tot_schema = pa.schema([("custkey", pa.int64()), ("total_cents", pa.int64())])

    def cust_combine(b: pa.Table) -> pa.Table:
        # custkey is UNBOUNDED (customer-proportional): the volume-
        # bounded single-column sort co-locates each key, so a run-scan
        # completes every total without the flat fold's one-block
        # all-customers table
        if b.num_rows == 0:
            return tot_schema.empty_table()
        from logpipe_ray.stages.smallagg import run_starts

        ck = b["custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        tc = b["total_cents"].combine_chunks().to_numpy(zero_copy_only=False)
        starts = run_starts(ck)
        return pa.table(
            {
                "custkey": pa.array(ck[starts], type=pa.int64()),
                "total_cents": pa.array(
                    np.add.reduceat(tc, starts).astype(np.int64), type=pa.int64()
                ),
            }
        )

    totals = sorted_runs_fold(
        orders.map_batches(ord_partial, batch_format="pyarrow"),
        "custkey",
        cust_combine,
    )

    n_left = left.count()
    joined = hash_join(
        left,
        totals,
        on="custkey",
        join_type="full_outer",
        small_rows=max(n_left, 1),
    )

    def fill(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": pc.cast(b["custkey"], pa.int64()),
                "c_name": pc.fill_null(b["c_name"], ""),
                "total_cents": pc.fill_null(
                    pc.cast(b["total_cents"], pa.int64()), -1
                ),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


@query(
    "join_range",
    """WITH tiers(lo, hi, tier) AS (VALUES
         (0,        1000000,  'low'),
         (1000000,  10000000, 'mid'),
         (10000000, 30000000, 'high'),
         (25000000, 60000000, 'bulk'))
       SELECT o_orderkey,
              CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
              tier
       FROM orders JOIN tiers
         ON CAST(round(o_totalprice*100) AS BIGINT) >= lo
        AND CAST(round(o_totalprice*100) AS BIGINT) < hi""",
)
def join_range(sf_dir: str):
    """Non-equi range join: each order matched to every price tier whose
    [lo, hi) interval contains its cents price. The 'high'/'bulk' tiers
    OVERLAP deliberately — orders in [25M, 30M) cents emit two rows,
    exercising the 1:N interval semantics a searchsorted bucketing
    cannot express. Broadcast shape (joins.broadcast_range_join): the
    tier table ships once via ray.put; each batch runs one vectorized
    mask per interval — no shuffle, no row loop."""
    from logpipe_ray.stages.joins import broadcast_range_join

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "price_cents": _cents(b["o_totalprice"]),
            }
        )

    tiers = pa.table(
        {
            "lo": pa.array([0, 1_000_000, 10_000_000, 25_000_000], pa.int64()),
            "hi": pa.array(
                [1_000_000, 10_000_000, 30_000_000, 60_000_000], pa.int64()
            ),
            "tier": pa.array(["low", "mid", "high", "bulk"]),
        }
    )
    return broadcast_range_join(
        ds.map_batches(prep, batch_format="pyarrow"), tiers, value_col="price_cents"
    )


@query(
    "events_band_join",
    """SELECT a.event_id, count(b.event_id) AS n_nearby
       FROM events a LEFT JOIN events b
         ON a.user_id = b.user_id AND b.event_type = 'purchase'
        AND b.ts BETWEEN a.ts - INTERVAL 2 HOUR AND a.ts + INTERVAL 2 HOUR
       WHERE a.event_type = 'click'
       GROUP BY a.event_id""",
)
def events_band_join(sf_dir: str):
    """Large×large band join: for every click, the number of purchases
    by the same user within ±2 h (inclusive — BETWEEN parity). The
    distributed shape is joins.band_join_count: bucket t // delta,
    replicate the purchase side into ±1 neighbor buckets, ONE
    volume-bounded range sort on (user, bucket), then per-run
    searchsorted counting — 4×int64 tuples shuffle, never an all-pairs
    product. Zero-match clicks emit 0 (LEFT JOIN parity)."""
    from logpipe_ray.stages.joins import band_join_count

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def us(b: pa.Table, typ: str, with_id: bool) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], typ))
        cols = {
            "key": pc.cast(b["user_id"], pa.int64()),
            "t": pc.cast(b["ts"], pa.int64()),
        }
        if with_id:
            cols["id"] = pc.cast(b["event_id"], pa.int64())
        return pa.table(cols)

    left = ds.map_batches(
        lambda b: us(b, "click", True), batch_format="pyarrow"
    )
    right = ds.map_batches(
        lambda b: us(b, "purchase", False), batch_format="pyarrow"
    )
    return band_join_count(
        left,
        right,
        delta=2 * 3600 * 1_000_000,
        out_col="n_nearby",
    ).map_batches(
        lambda b: b.rename_columns(["event_id", "n_nearby"]),
        batch_format="pyarrow",
    )


@query(
    "events_moments",
    """SELECT event_type, count(*) AS n_events,
              CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                AS sum_cents,
              CAST(sum(CAST(round(value*100) AS BIGINT)
                       * CAST(round(value*100) AS BIGINT)) AS BIGINT)
                AS sumsq_cents
       FROM events GROUP BY event_type""",
)
def events_moments(sf_dir: str):
    """Mergeable second moments: (n, Σx, Σx²) per group in exact integer
    cents — the distributed restatement of AVG/VAR/STDDEV (all derivable
    from the three, and the partials merge by plain addition, unlike the
    float statistics themselves, whose sum order is engine-dependent).
    One corpus pass of per-batch group_by partials, folded without a
    keyed shuffle (event_type is bounded-cardinality)."""
    from logpipe_ray.stages.smallagg import grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        cents = _cents(b["value"])
        return pa.table(
            {
                "event_type": b["event_type"],
                "cents": cents,
                "sq": pc.multiply(cents, cents),
            }
        )

    return grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        "event_type",
        sums={"sum_cents": "cents", "sumsq_cents": "sq"},
        count="n_events",
    )


@query(
    "text_normalize",
    """SELECT c_custkey,
              trim(regexp_replace(lower(c_name), '[^a-z0-9]+', ' ', 'g'))
                AS norm_name
       FROM customer""",
)
def text_normalize(sf_dir: str):
    """Vectorized text normalization (casefold → non-alnum collapse →
    trim), the standard first stage of a training-data text pipeline.
    Three Arrow C++ kernel passes per batch (utf8_lower, RE2
    replace_substring_regex, utf8_trim_whitespace) — no Python rows;
    both engines run the same RE2 pattern, so the oracle is
    hash-exact."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def norm(b: pa.Table) -> pa.Table:
        s = pc.utf8_lower(b["c_name"])
        s = pc.replace_substring_regex(s, pattern="[^a-z0-9]+", replacement=" ")
        return pa.table(
            {
                "c_custkey": pc.cast(b["c_custkey"], pa.int64()),
                "norm_name": pc.utf8_trim_whitespace(s),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


@query(
    "events_user_journey",
    """SELECT user_id,
              string_agg(event_type, '>' ORDER BY ts, event_id) AS journey,
              count(*) AS n_events
       FROM events GROUP BY user_id""",
)
def events_user_journey(sf_dir: str):
    """Ordered per-key list aggregation (collect_list ORDER BY ts): each
    user's full event-type sequence as one delimited string — the
    sessionless 'user journey' shape sequence-model training data wants.
    Keyed shuffle moves only (user, ts, id, type) tuples; one
    sort(user) co-locates, then the whole-block lexsort + run-offset
    ListArray + pc.binary_join kernel builds EVERY user's journey in
    one vectorized pass (the window-family shape, BASELINE.md r4 —
    no per-group pandas, no Python string joins)."""
    import numpy as np

    from logpipe_ray.stages.smallagg import run_starts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    schema = pa.schema(
        [("user_id", pa.int64()), ("journey", pa.string()), ("n_events", pa.int64())]
    )

    def kernel(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return schema.empty_table()
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        ts = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        et = b["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        order = np.lexsort((eid, ts, u))
        us = u[order]
        et_sorted = et.take(pa.array(order))
        starts = run_starts(us)
        if n >= 2**31:  # same guard as multimodal.encode_wav_payload
            raise ValueError(
                "sorted block too large for int32 list offsets; "
                "lower rows per block"
            )
        offsets = np.concatenate((starts, [n])).astype(np.int32)
        journeys = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), et_sorted),
            ">",
        )
        return pa.table(
            {
                "user_id": pa.array(us[starts], type=pa.int64()),
                "journey": journeys,
                "n_events": pa.array(
                    np.diff(offsets).astype(np.int64), type=pa.int64()
                ),
            }
        )

    return ds.sort("user_id").map_batches(
        kernel, batch_format="pyarrow", batch_size=None
    )


@query(
    "events_rollup",
    """SELECT COALESCE(event_type, 'ALL') AS event_type,
              count(*) AS n_events,
              CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                AS sum_value_cents
       FROM events GROUP BY ROLLUP(event_type)""",
)
def events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type): per-type aggregates plus the grand
    total, from ONE corpus pass — per-batch group_by partials (at most
    |types| rows leave any block), folded without a keyed shuffle
    (bounded cardinality), total row derived from the per-type table
    (result-sized) rather than a second scan."""
    from logpipe_ray.stages.smallagg import fold_partials_tree

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b["event_type"],
                "sum_value_cents": _cents(b["value"]),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("sum_value_cents", "sum"), ([], "count_all")]
        )
        names = []
        for c in g.column_names:
            if c == "sum_value_cents_sum":
                names.append("sum_value_cents")
            elif c == "count_all":
                names.append("n_events")
            else:
                names.append(c)
        g = g.rename_columns(names)
        return g.select(["event_type", "n_events", "sum_value_cents"]).cast(
            pa.schema(
                [
                    ("event_type", pa.string()),
                    ("n_events", pa.int64()),
                    ("sum_value_cents", pa.int64()),
                ]
            )
        )

    folded = fold_partials_tree(
        ds.map_batches(partial, batch_format="pyarrow"),
        "event_type",
        ["n_events", "sum_value_cents"],
    )

    def add_total(b: pa.Table) -> pa.Table:
        total = pa.table(
            {
                "event_type": pa.array(["ALL"]),
                "n_events": pa.array(
                    [pc.sum(b["n_events"]).as_py() or 0], type=pa.int64()
                ),
                "sum_value_cents": pa.array(
                    [pc.sum(b["sum_value_cents"]).as_py() or 0], type=pa.int64()
                ),
            }
        )
        return pa.concat_tables([b.cast(total.schema), total])

    return folded.map_batches(add_total, batch_format="pyarrow", batch_size=None)


@query(
    "doc_rarity",
    r"""WITH w AS (
         SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word
         FROM documents
       ), f AS (
         SELECT word, count(*) AS cnt FROM w GROUP BY 1
       ), s AS (
         SELECT CAST(sum(cnt) AS BIGINT) AS total,
                count(*) AS vocab FROM f
       )
       SELECT w.doc_id,
              count(*) AS n_words,
              CAST(sum(f.cnt) AS BIGINT) AS sum_freq,
              CAST(sum(CASE WHEN f.cnt * (SELECT vocab FROM s)
                                 <= (SELECT total FROM s)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
       FROM w JOIN f USING (word) GROUP BY 1""",
)
def doc_rarity(sf_dir: str):
    """Corpus-frequency rarity scoring (the CCNet/importance-filter
    pattern in exact-integer form): per doc, the sum of each word's
    corpus frequency and the count of below-mean-frequency words —
    rarity signals for quality filtering without a float LM in the
    hash-compared path.

    Distributed shape: pass 1 builds the word-frequency table from
    per-batch ``np.unique`` partials tree-folded (vocab-bounded root,
    fanin-bounded combine tasks at any corpus block count); the vocab table is broadcast once via ``ray.put``;
    pass 2 streams the corpus through one map_batches scoring every
    word with a vectorized searchsorted — corpus text never shuffles,
    no join touches the corpus."""
    import numpy as np

    import ray as _ray

    from logpipe_ray.stages.dedup import batch_words
    from logpipe_ray.stages.smallagg import fold_partials_tree

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_partial(b: pa.Table) -> pa.Table:
        _, flat = batch_words(b["text"])
        if len(flat) == 0:  # typed empty — never a null-typed column
            return pa.table(
                {
                    "word": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        w, c = np.unique(flat, return_counts=True)
        return pa.table(
            {"word": pa.array(w, type=pa.string()), "cnt": pa.array(c, type=pa.int64())}
        )

    vocab_tbl = pa.concat_tables(
        fold_partials_tree(
            ds.map_batches(count_partial, batch_format="pyarrow"),
            "word",
            "cnt",
        ).iter_batches(batch_format="pyarrow")
    )
    words = np.asarray(vocab_tbl["word"].to_numpy(zero_copy_only=False))
    cnts = vocab_tbl["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(words)
    words, cnts = words[order], cnts[order]
    total, vocab = int(cnts.sum()), len(words)
    vocab_ref = _ray.put((words, cnts))

    def score(b: pa.Table) -> pa.Table:
        vw, vc = _ray.get(vocab_ref)
        off, flat = batch_words(b["text"])
        idx = np.searchsorted(vw, flat)
        wc = vc[idx]
        rare = (wc * vocab) <= total
        cs_f = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(wc, out=cs_f[1:])
        cs_r = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(rare, out=cs_r[1:])
        n_words = np.diff(off)
        keep = n_words > 0  # zero-word docs have no oracle row
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "n_words": pa.array(n_words[keep], type=pa.int64()),
                "sum_freq": pa.array(
                    (cs_f[off[1:]] - cs_f[off[:-1]])[keep], type=pa.int64()
                ),
                "n_rare": pa.array(
                    (cs_r[off[1:]] - cs_r[off[:-1]])[keep], type=pa.int64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


@query(
    "events_json_extract",
    """SELECT event_id, event_type,
              CAST(json_extract(props, '$.k') AS BIGINT) AS k
       FROM events""",
)
def events_json_extract(sf_dir: str):
    """Structured-field extraction from a JSON string column (the
    fasterjson/ES field-transform analog): each batch's props column is
    parsed as ONE newline-delimited buffer by pyarrow's C++ JSON reader
    — no per-row Python, no shuffle, types pinned by explicit schema."""
    from logpipe_ray.stages.parse import parse_json_column

    ds = _read(sf_dir, "events", ["event_id", "event_type", "props"])
    k_schema = pa.schema([("k", pa.int64())])

    def extract(b: pa.Table) -> pa.Table:
        parsed = parse_json_column(b["props"], schema=k_schema)
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "event_type": b["event_type"],
                "k": parsed["k"],
            }
        )

    return ds.map_batches(extract, batch_format="pyarrow")


def _jsonl_fixture(sf_dir: str) -> str:
    """Write events as sharded JSONL files (deterministic: event_id
    order, 4 shards by event_id range) — the structured-log-directory
    fixture for the JSONL source."""
    import json
    import os

    import pyarrow.parquet as pq

    tag = sf_dir.strip("/").replace("/", "_")
    d = f"/tmp/lpr_jsonl_{tag}"
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    t = (
        pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "event_type", "value"],
        ).sort_by("event_id")
    )
    rows = t.to_pylist()
    n_shards = 4
    per = -(-len(rows) // n_shards)
    for s in range(n_shards):
        part = rows[s * per : (s + 1) * per]
        with open(os.path.join(d, f"events-{s:04d}.jsonl"), "w") as f:
            for r in part:
                f.write(json.dumps(r) + "\n")
    with open(marker, "w") as f:
        f.write("ok")
    return d


@query(
    "jsonl_source",
    """SELECT event_id, user_id, event_type, value FROM events""",
)
def jsonl_source(sf_dir: str):
    """JSONL directory source: ``ray.data.read_json`` over sharded
    newline-delimited JSON (one read task per shard — the same
    file-parallel shape as the text/log source), column-projected to
    the contract schema. Values round-trip exactly: json.dumps emits
    shortest-repr doubles, and both readers parse to the same IEEE
    double."""
    d = _jsonl_fixture(sf_dir)
    # explicit extension filter: the fixture's _SUCCESS marker must not
    # be parsed as JSON
    ds = ray.data.read_json(f"{d}/", file_extensions=["jsonl"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "event_type": b["event_type"],
                "value": pc.cast(b["value"], pa.float64()),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


def _publish_fixture_dir(tmp: str, d: str) -> None:
    """Atomically publish a fully-built fixture dir. NEVER deletes a
    possibly-published ``d`` (readers may be mid-query in it): the
    marker-check → stale-removal → rename sequence runs under an
    O_EXCL lockfile, so it can't interleave with a concurrent
    publisher (an unlocked check-then-move has a window where a dir
    published in between gets yanked). Losing the race discards our
    build and keeps the winner's; a crashed builder's lock goes stale
    and is broken by mtime."""
    import os
    import shutil
    import time

    marker = os.path.join(d, "_SUCCESS")
    lock = d + ".lock"
    deadline = time.monotonic() + 120
    while True:
        try:
            os.close(os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            break
        except FileExistsError:
            if os.path.exists(marker):  # the lock holder published
                shutil.rmtree(tmp, ignore_errors=True)
                return
            try:  # break a crashed builder's stale lock
                # wall clock, NOT monotonic: getmtime is epoch-based.
                # Claim-by-RENAME (atomic) before removing: a plain
                # os.remove could race another waiter and delete the
                # FRESH lock that waiter just re-created, letting two
                # publishers into the critical section.
                if time.time() - os.path.getmtime(lock) > 60:
                    broken = f"{lock}.broken-{os.getpid()}-{time.monotonic_ns()}"
                    os.rename(lock, broken)  # only one waiter wins this
                    os.remove(broken)
                    continue
            except OSError:
                continue  # lock vanished/claimed between checks — retry
            if time.monotonic() > deadline:
                shutil.rmtree(tmp, ignore_errors=True)
                raise RuntimeError(f"timed out waiting to publish {d}")
            time.sleep(0.05)
    try:
        if os.path.exists(marker):  # raced: winner published first
            shutil.rmtree(tmp, ignore_errors=True)
            return
        if os.path.exists(d):  # marker-less stale dir (publish crash)
            shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass


def _csv_fixture(sf_dir: str) -> str:
    """Write events as sharded CSV (deterministic: event_id order, 4
    shards by range; Arrow's CSV writer emits shortest-round-trip
    doubles, so value survives parquet→csv→parse exactly).

    Atomic publish via _publish_fixture_dir: a crashed builder leaves
    only an unpublished scratch dir, and a live published dir is never
    deleted out from under a reader."""
    import os
    import uuid

    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    tag = sf_dir.strip("/").replace("/", "_")
    d = f"/tmp/lpr_csv_{tag}"
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    tmp = f"{d}.build-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
    ).sort_by("event_id")
    n_shards = 4
    per = -(-t.num_rows // n_shards)
    for s in range(n_shards):
        pacsv.write_csv(
            t.slice(s * per, per), os.path.join(tmp, f"events-{s:04d}.csv")
        )
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    _publish_fixture_dir(tmp, d)
    return d


@query(
    "csv_source",
    """SELECT event_id, user_id, event_type, value FROM events""",
)
def csv_source(sf_dir: str):
    """Sharded CSV directory source: ``ray.data.read_csv`` (one read
    task per shard, Arrow C++ parser — file-parallel like the
    text/JSONL sources), column-projected to the contract schema with
    an extension filter so the _SUCCESS marker is skipped."""
    d = _csv_fixture(sf_dir)
    ds = ray.data.read_csv(f"{d}/", file_extensions=["csv"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "event_type": b["event_type"],
                "value": pc.cast(b["value"], pa.float64()),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


def _columnar_fixture(sf_dir: str, fmt: str) -> str:
    """customer table sharded as .orc / .arrow files (atomic publish
    via _publish_fixture_dir, same as _csv_fixture)."""
    import os
    import uuid

    import pyarrow.parquet as pq

    tag = sf_dir.strip("/").replace("/", "_")
    d = f"/tmp/lpr_{fmt}_{tag}"
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    tmp = f"{d}.build-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    t = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
    ).sort_by("c_custkey")
    n_shards = 4
    per = -(-t.num_rows // n_shards)
    for s in range(n_shards):
        sl = t.slice(s * per, per)
        if fmt == "orc":
            from pyarrow import orc

            orc.write_table(sl, os.path.join(tmp, f"customer-{s:04d}.orc"))
        else:
            from pyarrow import feather

            feather.write_feather(
                sl, os.path.join(tmp, f"customer-{s:04d}.arrow")
            )
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    _publish_fixture_dir(tmp, d)
    return d


_COLUMNAR_ORACLE = """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
       FROM customer"""


def _columnar_prep(b: pa.Table) -> pa.Table:
    return pa.table(
        {
            "c_custkey": pc.cast(b["c_custkey"], pa.int64()),
            "c_name": b["c_name"],
            "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            "acctbal_cents": _cents(b["c_acctbal"]),
        }
    )


@query("orc_source", _COLUMNAR_ORACLE)
def orc_source(sf_dir: str):
    """Sharded ORC directory source (sources/columnar.read_orc_dir):
    file-parallel decode tasks, column-pruned at the ORC reader."""
    from logpipe_ray.sources.columnar import read_orc_dir

    d = _columnar_fixture(sf_dir, "orc")
    ds = read_orc_dir(
        d, columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"]
    )
    return ds.map_batches(_columnar_prep, batch_format="pyarrow")


@query("arrow_ipc_source", _COLUMNAR_ORACLE)
def arrow_ipc_source(sf_dir: str):
    """Sharded Arrow IPC (Feather V2) directory source
    (sources/columnar.read_ipc_dir): memory-mapped zero-copy decode."""
    from logpipe_ray.sources.columnar import read_ipc_dir

    d = _columnar_fixture(sf_dir, "ipc")
    ds = read_ipc_dir(
        d, columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"]
    )
    return ds.map_batches(_columnar_prep, batch_format="pyarrow")


@query(
    "tail_dedup_ingest",
    """WITH appended AS (
         SELECT source, text FROM documents
         UNION ALL
         SELECT source, text FROM documents WHERE doc_id % 7 = 3
       )
       SELECT source,
              CAST(count(*) AS BIGINT) AS n_seen,
              CAST(count(DISTINCT text) AS BIGINT) AS n_ingested
       FROM appended GROUP BY source""",
)
def tail_dedup_ingest(sf_dir: str):
    """The reference's core loop end-to-end, batch-restated: incremental
    tail-follow → dedup against all previously ingested content → routed
    append → offset commit, over TWO ingest ticks
    (pipelines/ingest.ingest_tick — scale shape and the
    at-least-once + dedup-absorbs crash contract documented there, the
    kill-at-every-boundary proof in tests/test_ingest_chaos.py). Tick 2
    re-appends every doc_id%7==3 line (re-sent log content), which the
    corpus-state dedup must drop while tick-internal duplicate texts
    dedupe first-wins."""
    import os
    import tempfile

    import pyarrow.parquet as _pq

    from logpipe_ray.pipelines.ingest import ingest_tick
    from logpipe_ray.sources.stream import DirectoryTailSource
    from logpipe_ray.state.hashstate import HashStateStore

    d = tempfile.mkdtemp(prefix="lpr_ingest_")
    logs, hstate, outd = f"{d}/logs", f"{d}/hashstate", f"{d}/out"
    for p in (logs, hstate, outd):
        os.makedirs(p, exist_ok=True)
    store = HashStateStore(hstate, max_segments=8)

    t = (
        _pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        ).sort_by("doc_id")
    )
    rows = list(
        zip(t["doc_id"].to_pylist(), t["source"].to_pylist(), t["text"].to_pylist())
    )

    def append_lines(sel):
        by: dict[str, list[str]] = {}
        for _id, src, text in sel:
            by.setdefault(src, []).append(text)
        for src, lines in by.items():
            with open(f"{logs}/{src}.log", "a") as f:
                f.write("".join(x + "\n" for x in lines))

    src_obj = DirectoryTailSource(logs, f"{d}/_tailstate", include=["*.log"])
    totals: dict[str, list[int]] = {}  # source -> [n_seen, n_ingested]

    for i, sel in ((1, rows), (2, [r for r in rows if r[0] % 7 == 3])):
        append_lines(sel)
        seen, ingested = ingest_tick(src_obj, store, outd, i)
        for s, n in seen.items():
            totals.setdefault(s, [0, 0])[0] += n
        for s, n in ingested.items():
            totals.setdefault(s, [0, 0])[1] += n

    srcs = sorted(totals)
    return pa.table(
        {
            "source": pa.array(srcs, type=pa.string()),
            "n_seen": pa.array([totals[s][0] for s in srcs], type=pa.int64()),
            "n_ingested": pa.array(
                [totals[s][1] for s in srcs], type=pa.int64()
            ),
        }
    )


@query(
    "word_topk_mg",
    """SELECT w AS item, CAST(count(*) AS BIGINT) AS n
       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       GROUP BY w ORDER BY n DESC, w LIMIT 25""",
)
def word_topk_mg(sf_dir: str):
    """Top-25 words via the Misra–Gries heavy-hitters sketch + exact
    candidate rescore (functions/sketches.heavy_hitters_exact_topk):
    pass 1 folds ≤ (m+1)-row MG partials (vocabulary-INDEPENDENT
    shuffle volume — the scale story vs vocab_topk's vocab-bounded
    bincount partials), pass 2 exact-counts only the ≤ m candidates.
    The runtime certificate (k-th exact count > total decrement D)
    makes the result provably equal to the SQL top-k, not approximate;
    tie-break (n desc, word asc) matches the oracle."""
    from logpipe_ray.functions.sketches import heavy_hitters_exact_topk
    from logpipe_ray.stages.dedup import batch_words

    ds = _read(sf_dir, "documents", ["text"])

    def words_of(b: pa.Table) -> pa.Array:
        _, flat = batch_words(b["text"])
        return pa.array(flat, type=pa.string())

    return heavy_hitters_exact_topk(ds, k=25, m=512, make_values=words_of)


@query(
    "source_mix",
    """WITH q AS (
         SELECT source, CAST(floor(sqrt(count(*))) AS BIGINT) AS quota
         FROM documents GROUP BY 1
       ), r AS (
         SELECT doc_id, source,
                row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         FROM documents
       )
       SELECT r.doc_id, r.source FROM r JOIN q USING (source)
       WHERE r.rn <= q.quota""",
)
def source_mix(sf_dir: str):
    """Temperature-based source mixing (α = 0.5): each source's quota is
    ⌊√count⌋ — over-represented domains are flattened toward the mix
    (the pretraining data-mixing pattern), deterministic first-by-doc_id
    within each source. Integer isqrt on both sides keeps the quota
    hash-exact.

    Distributed shape: pass 1 folds per-batch source counts (sources
    dimension-bounded) to a broadcast quota map; pass 2 is the
    source_cap kernel with per-source quotas — per-batch vectorized
    partial cap (≤ Σquota rows leave any block), same kernel tree-folds
    the partials (quotas are corpus-dependent isqrt(count), so the flat
    one-block fold would be the unbounded-cardinality trap). The corpus
    never globally sorts or shuffles."""
    import math

    import numpy as np

    import ray as _ray

    from logpipe_ray.stages.smallagg import (
        count_partials,
        fold_blocks_tree,
        fold_partials_tree,
        run_ranks,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    counts = pa.concat_tables(
        fold_partials_tree(
            count_partials(ds, "source"), "source", "n"
        ).iter_batches(batch_format="pyarrow")
    )
    srcs = np.asarray(counts["source"].to_numpy(zero_copy_only=False))
    quota = np.array(
        [math.isqrt(int(n)) for n in counts["n"].to_pylist()], dtype=np.int64
    )
    order = np.argsort(srcs)
    srcs, quota = srcs[order], quota[order]
    quota_ref = _ray.put((srcs, quota))

    schema = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])

    def cap_by_quota(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return schema.empty_table()
        qs, qv = _ray.get(quota_ref)
        src = b["source"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = pc.cast(b["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, src))
        ranks = run_ranks(src[order])
        row_quota = qv[np.searchsorted(qs, src[order])]
        keep = order[ranks < row_quota]
        return pa.table(
            {
                "doc_id": pa.array(doc[keep], type=pa.int64()),
                "source": pa.array(src[keep], type=pa.string()),
            }
        )

    partials = ds.map_batches(cap_by_quota, batch_format="pyarrow")
    # quotas are isqrt(per-source count) — corpus-dependent, so the flat
    # one-block fold would hold n_blocks × Σ quota rows; the quota-cap
    # selection is a merge, so tree-fold it with bounded task inputs
    return fold_blocks_tree(partials, cap_by_quota)


@query(
    "events_approx_quantile",
    """WITH b AS (
         SELECT CAST(round(value*100) AS BIGINT) // 50 AS bucket FROM events
       ), c AS (
         SELECT bucket, count(*) AS n FROM b GROUP BY 1
       ), t AS (
         SELECT CAST(sum(n) AS BIGINT) AS total FROM c
       ), cum AS (
         SELECT bucket, CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum
         FROM c
       ), ps(p_bp) AS (VALUES (5000), (9000), (9900))
       SELECT CAST(p_bp AS BIGINT) AS p_bp,
              CAST(min(bucket) AS BIGINT) AS bucket,
              CAST(min(bucket) * 50 AS BIGINT) AS lo_cents
       FROM ps, cum, t WHERE cum * 10000 >= total * p_bp GROUP BY 1""",
)
def events_approx_quantile(sf_dir: str):
    """Approximate quantiles (p50/p90/p99) via a deterministic mergeable
    histogram sketch: values bucketed to fixed 0.50-wide cells (integer
    cents // 50), per-batch bucket-count partials merged by addition —
    the classic bounded-error quantile sketch, but with integer bucket
    math so the SAME sketch is expressible in SQL and the result is
    hash-exact (error ≤ bucket width, the stated contract of the op).

    Distributed shape: ≤ |buckets| rows leave any block (value range /
    0.50 — bounded by data range, not corpus size), one tree fold, quantile
    scan over the single folded block. At 100 TB the sketch is still
    KBs; merging is associative so a two-level fold tree drops in."""
    import numpy as np

    from logpipe_ray.stages.smallagg import count_partials, fold_partials_tree

    ds = _read(sf_dir, "events", ["value"])

    def to_bucket(b: pa.Table) -> pa.Table:
        # arrow pc.divide truncates toward zero while the oracle's
        # DuckDB // floors — identical ONLY for non-negative values,
        # which events.value is by construction (same precondition as
        # _pc_mod / stages/rank.py; a negative value would mis-bucket)
        return pa.table({"bucket": pc.divide(_cents(b["value"]), 50)})

    folded = fold_partials_tree(
        count_partials(
            ds.map_batches(to_bucket, batch_format="pyarrow"), "bucket"
        ),
        "bucket",
        "n",
    )

    def quantiles(b: pa.Table) -> pa.Table:
        bk = b["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(bk)
        bk, n = bk[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1]) if len(cum) else 0
        rows = []
        for p_bp in (5000, 9000, 9900):
            # smallest bucket with cum*10000 >= total*p_bp (exact rank)
            i = int(np.searchsorted(cum * 10000, total * p_bp))
            rows.append((p_bp, int(bk[i]), int(bk[i]) * 50))
        return pa.table(
            {
                "p_bp": pa.array([r[0] for r in rows], type=pa.int64()),
                "bucket": pa.array([r[1] for r in rows], type=pa.int64()),
                "lo_cents": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )

    return folded.map_batches(
        quantiles, batch_format="pyarrow", batch_size=None
    )


@query(
    "orders_global_rank",
    """SELECT o_orderkey,
              CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
              CAST(row_number() OVER (
                ORDER BY CAST(round(o_totalprice*100) AS BIGINT), o_orderkey
              ) AS BIGINT) AS rnk
       FROM orders""",
)
def orders_global_rank(sf_dir: str):
    """Corpus-wide ``row_number()`` (rank every order by price): the
    distributed two-level prefix-sum rank of
    :func:`logpipe_ray.stages.rank.global_rank` — per-batch bucket
    histogram partials tree-folded, exclusive bucket offsets broadcast,
    ONE bucket-keyed shuffle where each bucket sorts locally and adds
    its offset. No full-corpus driver sort; the driver holds only the
    buckets-row offsets table."""
    from logpipe_ray.stages.rank import global_rank

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "price_cents": _cents(b["o_totalprice"]),
            }
        )

    return global_rank(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_col="price_cents",
        id_col="o_orderkey",
        bucket_width=1 << 21,  # ~$21k-wide ordered price ranges
        rank_col="rnk",
    )


@query(
    "docs_stratified_split",
    """WITH r AS (
         SELECT doc_id, source,
                row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
                count(*) OVER (PARTITION BY source) AS n
         FROM documents
       )
       SELECT doc_id, source, CAST(rn AS BIGINT) AS rnk,
              CASE WHEN rn * 10 <= n + 9 THEN 'val' ELSE 'train' END AS split
       FROM r""",
)
def docs_stratified_split(sf_dir: str):
    """Stratified train/val split with EXACT per-source quotas (val =
    first ⌈10%⌉ of each source by doc_id) — the split you need when
    hash-splitting would under-sample small domains. Per-source rank
    from the distributed prefix-sum rank stage; quotas from one
    bounded fold (sources-cardinality rows), broadcast and applied
    vectorized per batch."""
    import numpy as np

    import ray as _ray

    from logpipe_ray.stages.rank import global_rank
    from logpipe_ray.stages.smallagg import count_partials, fold_partials_tree

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    totals = pa.concat_tables(
        fold_partials_tree(
            count_partials(ds, "source"), "source", "n"
        ).iter_batches(batch_format="pyarrow")
    )
    srcs = np.asarray(totals["source"].to_numpy(zero_copy_only=False))
    quota = (totals["n"].to_numpy(zero_copy_only=False) + 9) // 10  # ceil(n/10)
    order = np.argsort(srcs)
    quota_ref = _ray.put((srcs[order], quota[order]))

    ranked = global_rank(
        ds,
        key_col="doc_id",
        id_col="doc_id",
        bucket_width=1 << 16,
        group_col="source",
        rank_col="rnk",
    )

    def label(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("source", pa.string()),
                    ("rnk", pa.int64()),
                    ("split", pa.string()),
                ]
            ).empty_table()
        qs, qv = _ray.get(quota_ref)
        src = b["source"].combine_chunks().to_numpy(zero_copy_only=False)
        rnk = b["rnk"].combine_chunks().to_numpy(zero_copy_only=False)
        is_val = rnk <= qv[np.searchsorted(qs, src)]
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "source": b["source"],
                "rnk": pc.cast(b["rnk"], pa.int64()),
                "split": pa.array(
                    np.where(is_val, "val", "train"), type=pa.string()
                ),
            }
        )

    return ranked.map_batches(label, batch_format="pyarrow")


@query(
    "docs_curriculum",
    """SELECT doc_id, n_chars,
              CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
                AS rnk,
              CAST((row_number() OVER (ORDER BY n_chars, doc_id) - 1) // 64
                AS BIGINT) AS stage
       FROM documents""",
)
def docs_curriculum(sf_dir: str):
    """Curriculum ordering: rank the corpus short→long (n_chars, then
    doc_id) and cut it into fixed-size training stages — the
    length-curriculum pre-sort of a staged pretraining run, as a rank
    + vectorized stage assignment (one bucket shuffle, no driver
    sort)."""
    from logpipe_ray.stages.rank import global_rank

    ranked = global_rank(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        key_col="n_chars",
        id_col="doc_id",
        bucket_width=256,
        rank_col="rnk",
    )

    def stage(b: pa.Table) -> pa.Table:
        rnk = pc.cast(b["rnk"], pa.int64())
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "n_chars": pc.cast(b["n_chars"], pa.int64()),
                "rnk": rnk,
                "stage": pc.divide(pc.subtract(rnk, 1), 64),
            }
        )

    return ranked.map_batches(stage, batch_format="pyarrow")


@query(
    "dedup_substr",
    r"""WITH d AS (
         SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
       ), pos AS (
         SELECT doc_id, ws, CAST(u.i AS BIGINT) AS i
         FROM d, UNNEST(generate_series(1, len(ws))) AS u(i)
       ), g AS (
         SELECT doc_id, i, array_to_string(ws[i:i+4], ' ') AS gram
         FROM pos WHERE i + 4 <= len(ws)
       ), r AS (
         SELECT doc_id, i,
                row_number() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn
         FROM g
       ), dup AS (
         SELECT doc_id, i FROM r WHERE rn > 1
       ), cov AS (
         SELECT DISTINCT p.doc_id, p.i FROM pos p
         JOIN dup ON p.doc_id = dup.doc_id AND p.i >= dup.i AND p.i <= dup.i + 4
       ), kept AS (
         SELECT p.doc_id, p.i, p.ws[p.i] AS w FROM pos p
         LEFT JOIN cov ON p.doc_id = cov.doc_id AND p.i = cov.i
         WHERE cov.doc_id IS NULL
       )
       SELECT doc_id,
              string_agg(w, ' ' ORDER BY i) AS text_clean,
              CAST(count(*) AS BIGINT) AS n_kept
       FROM kept GROUP BY doc_id""",
)
def dedup_substr(sf_dir: str):
    """ExactSubstr-style duplicated-span removal (Lee et al. 2021,
    arXiv:2107.06499) at word-5-gram granularity: every 5-gram
    occurrence that isn't the corpus-wide first (by doc_id, position)
    marks its 5 words for removal; surviving words reassemble in
    order. See
    :func:`logpipe_ray.pipelines.dedup_pipeline.remove_duplicate_spans`
    for the distributed shape (one gram-hash sort of int64 triples, a
    dup-proportional span-list groupby, one partition-bounded text
    join)."""
    from logpipe_ray.pipelines.dedup_pipeline import remove_duplicate_spans

    return remove_duplicate_spans(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=5
    )
