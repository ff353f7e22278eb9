from logpipe_ray.sources.sequences import (  # noqa: F401
    synthesize_sequences,
    SEQ_SCHEMA,
    TOKEN_VOCAB,
)
