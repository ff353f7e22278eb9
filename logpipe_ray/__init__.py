"""logpipe_ray — a Ray-Data-native parse → enrich → route → aggregate engine.

A from-scratch rebuild of the data-processing capabilities of
calvinwilliams/logpipe (a single-process C log collect→forward daemon)
as a batch ``ray.data.Dataset`` DAG over Parquet tables of pre-tokenized
training sequences (``doc_id:string, tokens:list<int32>, n_tok:int32,
source:string``).

Architecture (see SURVEY.md §7):

    read_parquet(input)                          # source
      .map_batches(parse)                        # vectorized pyarrow.compute
      .map_batches(Enricher, concurrency=N)      # broadcast lookup actor pool
      .write_parquet(out, partition_cols=[sink]) # hash fan-out to per-sink dirs
    read back → partial pre-agg → groupby(source, sink)  # counters

Reference semantics preserved (citations are file:line into
/root/reference): the (filename, block) message model becomes an Arrow
row keyed by ``doc_id`` with ``source`` as the stream/routing key; the
filter chain (src/output.c:232-253) becomes ordered ``map_batches``
stages; fan-out to all outputs (src/output.c:256-277) becomes the
per-sink partitioned write; the per-stream offset/line counters
(src/output.c:31-56) become the per-(source, sink) count/sum(n_tok)
aggregate.
"""

__version__ = "0.1.0"
