"""Sequences synthesis: determinism, schema, uniqueness, skew, token formula."""

import numpy as np
import pyarrow as pa

from logpipe_ray.sources.sequences import (
    MAX_N_TOK,
    MIX_MOD,
    MIX_MUL,
    SEQ_SCHEMA,
    TOK_MUL_POS,
    TOK_MUL_ROW,
    TOKEN_VOCAB,
    synthesize_sequences,
)


def test_schema_and_counts(sf_dir):
    ds = synthesize_sequences(sf_dir)
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert tbl.schema.equals(SEQ_SCHEMA)
    assert tbl.num_rows == 6000  # == lineitem rows at sf0.001
    # doc_id is unique per distinct lineitem key-tuple; the synthetic
    # lineitem itself contains a few exact-duplicate rows, which map to
    # identical sequence rows (multiset semantics, same as the oracle)
    import duckdb

    expected_uniq = duckdb.sql(
        "SELECT count(DISTINCT ((l_orderkey*10 + l_linenumber)*20000 + l_partkey)*2000 + l_suppkey) "
        "FROM '/root/testdata/sf0.001/lineitem.parquet'"
    ).fetchone()[0]
    assert len(set(tbl["doc_id"].to_pylist())) == expected_uniq


def test_determinism(sf_dir):
    a = pa.concat_tables(
        synthesize_sequences(sf_dir).iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")
    b = pa.concat_tables(
        synthesize_sequences(sf_dir).iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")
    assert a.equals(b)


def test_token_formula_independent_reimpl(sf_dir):
    """Spot-check rows against a from-scratch scalar reimplementation."""
    tbl = pa.concat_tables(
        synthesize_sequences(sf_dir).iter_batches(batch_format="pyarrow")
    )
    for i in range(0, tbl.num_rows, 997):
        doc_id = tbl["doc_id"][i].as_py()
        seq = int(doc_id.rsplit("-", 1)[1])
        m = seq % MIX_MOD
        n_tok = 1 + (m * MIX_MUL) % MAX_N_TOK
        expected = [(m * TOK_MUL_ROW + j * TOK_MUL_POS) % TOKEN_VOCAB for j in range(n_tok)]
        assert tbl["n_tok"][i].as_py() == n_tok
        assert tbl["tokens"][i].as_py() == expected


def test_hot_source_skew(sf_dir):
    """FIXTURES.md F1: one hot source holds ~50% of rows."""
    tbl = pa.concat_tables(
        synthesize_sequences(sf_dir).iter_batches(batch_format="pyarrow")
    )
    src = tbl["source"].to_pandas()
    frac = (src == "app_web_00.log").mean()
    assert 0.4 < frac < 0.6
    assert src.nunique() == 16


def test_expand_scales_rows_uniquely(sf_dir):
    ds = synthesize_sequences(sf_dir, expand=3)
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert tbl.num_rows == 3 * 6000
    base = pa.concat_tables(
        synthesize_sequences(sf_dir).iter_batches(batch_format="pyarrow")
    )
    base_uniq = len(set(base["doc_id"].to_pylist()))
    assert len(set(tbl["doc_id"].to_pylist())) == 3 * base_uniq


def test_n_tok_bounds(sf_dir):
    tbl = pa.concat_tables(
        synthesize_sequences(sf_dir).iter_batches(batch_format="pyarrow")
    )
    n = tbl["n_tok"].to_numpy()
    assert n.min() >= 1 and n.max() <= MAX_N_TOK
    flat = tbl["tokens"].combine_chunks().values.to_numpy()
    assert flat.min() >= 0 and flat.max() < TOKEN_VOCAB
    assert flat.dtype == np.int32
