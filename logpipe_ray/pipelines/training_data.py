"""End-to-end LLM training-data pipeline over the documents corpus:

    quality filter (repetition signals) → exact dedup (min-id
    representative) → greedy token-budget packing

— the composition a real pretraining-data build runs, assembled
entirely from this engine's stages, with every step SQL-expressible so
the WHOLE pipeline has a hash-checked DuckDB oracle
(``docs_training_pipeline`` in queries.py).

Scale shape: the filter is a pure per-batch map (repetition stats are
vectorized — no per-doc loop); dedup is one hash-bucket shuffle with
vectorized first-wins; packing is the two-level distributed prefix sum
(stages/packing.py). Document text never reaches the packing shuffle —
only (id, n_words, bucket) rows move after dedup.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from logpipe_ray.stages.dedup import exact_dedup
from logpipe_ray.stages.packing import pack_by_token_budget
from logpipe_ray.stages.text_analysis import repetition_stats


def quality_filter_batch(
    batch: pa.Table,
    *,
    max_topword_x: int = 8,
    min_words: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Keep docs whose most-frequent word is ≤ 1/``max_topword_x`` of
    the doc and with at least ``min_words`` words (the Gopher-style
    repetition gate); appends ``n_words``."""
    stats = repetition_stats(batch, text_col=text_col, id_col=id_col)
    keep = pc.and_(
        pc.less_equal(
            pc.multiply(stats["top_word_count"], max_topword_x),
            stats["n_words"],
        ),
        pc.greater_equal(stats["n_words"], min_words),
    )
    return batch.append_column("n_words", stats["n_words"]).filter(keep)


def docs_to_training_packs(
    sf_dir: str,
    *,
    budget: int = 512,
    bucket_width: int = 128,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """documents → (doc_id, n_words, pack_id) training-pack assignment."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    kept = ds.map_batches(quality_filter_batch, batch_format="pyarrow")
    uniq = exact_dedup(kept, num_buckets=num_buckets)
    packed = pack_by_token_budget(
        uniq,
        budget=budget,
        bucket_width=bucket_width,
        source_col=None,
        n_tok_col="n_words",
    )
    return packed
