"""User-extension example: a custom stage registered like a logpipe plugin.

The reference's extension surface is a compiled .so implementing hook
typedefs (README §5 templates); here a third-party stage is a plain
Python function registered under a config `kind`:

    python examples/custom_stage.py     # runs the spec below standalone
"""

import pyarrow as pa
import pyarrow.compute as pc

from logpipe_ray.registry import register_stage


@register_stage("redact_digits")
def redact_digits(col: str = "line", replacement: str = "#"):
    """Replace digit runs in a text column (e.g. scrub ids from logs)."""

    def fn(batch: pa.Table) -> pa.Table:
        red = pc.replace_substring_regex(batch[col], r"\d+", replacement)
        return batch.set_column(
            batch.schema.get_field_index(col), col, red
        )

    return fn


SPEC = {
    "source": {
        "kind": "parquet",
        "path": "/root/testdata/sf0.001/documents.parquet",
        "columns": ["doc_id", "text"],
    },
    "stages": [{"kind": "redact_digits", "col": "text"}],
    "sink": {"kind": "stdout", "limit": 5},
}


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    from logpipe_ray.config import build_pipeline

    build_pipeline(SPEC)
    ray.shutdown()
