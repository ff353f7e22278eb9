"""Benchmark harness (the driver runs this per-round → BENCH_r{N}.json).

Headline: the flagship parse → enrich → route → aggregate pipeline over a
pre-generated sequences table derived from ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) expanded ``BENCH_EXPAND``× (default 4 → ~2.4M rows,
~600M tokens at sf0.1). Generation is cached in /tmp and NOT timed — the
BASELINE metric starts from the tokenized Parquet table.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "rows": R, "sequences_per_sec": R/sec}

``--scaling``: runs the same job in two fresh processes at 8 and 32 CPUs
(the sandbox stand-in for N- vs 4N-node clusters) and reports both
throughputs + efficiency = (T_8 × 8) / (T_32 × 32) ... i.e.
(t32_rate / t8_rate) / 4 expressed as speedup/4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
EXPAND = int(os.environ.get("BENCH_EXPAND", "16"))
CACHE_ROOT = os.environ.get("BENCH_CACHE", "/tmp/lpr_bench_cache")


def _quiet_empty_block_schema_noise() -> None:
    """Filter ONE known-benign Ray executor warning from the timing log.

    Ray's sort/shuffle reduce emits SCHEMA-LESS empty blocks for key
    ranges that receive no rows, and map UDFs deliberately pass them
    through without running (Ray's own workaround + TODO(hchen) in
    data/_internal/planner/plan_udf_map_op.py:453-462), so they cannot
    be re-typed downstream; the executor then logs a once-per-operator
    "different schema ... new schema: ." warning
    (streaming_executor_state.py:793). Occurrence is minimized
    structurally (stages/smallagg bounds partition counts by key
    cardinality; joins — the one consumer the empties actually break —
    are partition-bounded in stages/joins), but the sort's boundary
    SAMPLING still occasionally leaves an empty range, so the residual
    warning is nondeterministic noise. Filter exactly that line; every
    other executor warning still prints.
    """
    import logging

    class _EmptyBlockSchemaNoise(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not (
                "RefBundle with a different schema" in msg
                and "new schema: ." in msg
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptyBlockSchemaNoise())


def ensure_input(sf_dir: str, expand: int) -> str:
    """Generate (once) the expanded sequences table; returns its dir."""
    import ray

    tag = sf_dir.strip("/").replace("/", "_")
    cache = f"{CACHE_ROOT}/{tag}_x{expand}_v2"
    marker = f"{cache}/_SUCCESS"
    if os.path.exists(marker):
        return cache
    from logpipe_ray.sources.sequences import synthesize_sequences

    ds = synthesize_sequences(sf_dir, expand=expand)
    os.makedirs(cache, exist_ok=True)
    # zstd-1: decodes faster than snappy for token payloads AND 4× smaller
    # (369 vs 417 MB/s single-thread decode; 137 vs 34 MB per file)
    ds.write_parquet(
        cache, compression="zstd", compression_level=1, use_dictionary=False
    )
    with open(marker, "w") as f:
        f.write("ok")
    return cache


def run_flagship_bench(seq_dir: str, out_dir: str) -> dict:
    """Timed: read → parse → enrich → routed write → counters."""
    import gc
    import shutil
    import tempfile

    import ray.data

    from logpipe_ray.pipelines.flagship import (
        enrich_pipeline,
        route_shuffled,
        run_fused,
    )

    timings = {}
    t0 = time.time()
    ds = ray.data.read_parquet(seq_dir)
    counters = run_fused(ds, out_dir).to_pandas()
    timings["total"] = time.time() - t0
    timings["n_groups"] = len(counters)
    import glob as _globf

    timings["n_out_files"] = len(_globf.glob(f"{out_dir}/sink=*/part-*.parquet"))
    del ds
    gc.collect()
    # flush the ~10 GB of dirty pages the flagship just wrote BEFORE the
    # next timer starts: otherwise the secondary pipelines race kernel
    # writeback for disk bandwidth and their wall time measures the
    # previous stage's leftovers (observed 10.7-21 s spread for the same
    # resumable run; r2 regression was exactly this). sync() is untimed.
    os.sync()

    # secondary: the resumable storage→storage fragment runner (the
    # 100 TB shape: blocks never transit the object store; manifest
    # commit per fragment). Measured faster than the in-store path.
    if os.environ.get("BENCH_SHUFFLED", "1") == "1":
        import glob as _glob2

        from logpipe_ray.pipelines.resumable import run_resumable

        paths = sorted(_glob2.glob(f"{seq_dir}/*.parquet"))
        out3 = tempfile.mkdtemp(prefix="lpr_bench_res_")
        try:
            t2 = time.time()
            run_resumable(paths, out3, make_sequences=False)
            timings["resumable"] = time.time() - t2
        finally:
            shutil.rmtree(out3, ignore_errors=True)
            gc.collect()
            os.sync()  # same writeback barrier before the next timed stage

    # secondary: the explicit salted shuffle router (one all-to-all).
    # Measured on a 1/8 input subset: the full-shuffle path degrades
    # superlinearly under object-store pressure (238s vs 15.5s for 8×
    # less data at 32 CPUs — see BASELINE.md), which is exactly why the
    # fan-out writer is the headline design. Skipped in --scaling
    # subprocesses (headline metric only there).
    if os.environ.get("BENCH_SHUFFLED", "1") != "1":
        return timings
    import glob as _glob

    files = sorted(_glob.glob(f"{seq_dir}/*.parquet"))
    subset = files[: max(1, len(files) // 8)]
    out2 = tempfile.mkdtemp(prefix="lpr_bench_shuf_")
    try:
        t1 = time.time()
        ds = ray.data.read_parquet(subset)
        route_shuffled(
            enrich_pipeline(ds, batch_size=16384), out2, batch_size=16384
        ).to_pandas()
        timings["route_shuffled_eighth"] = time.time() - t1
    finally:
        shutil.rmtree(out2, ignore_errors=True)
        gc.collect()
    return timings


def main() -> None:
    import shutil
    import tempfile

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False
    _quiet_empty_block_schema_noise()

    import gc

    seq_dir = ensure_input(SF_DIR, EXPAND)
    # Drop refs to the generation pipeline's datasets: Ray Data actor
    # pools / operator reservations are only released when the Dataset
    # objects are GC'd, and leftovers throttle the timed run.
    gc.collect()
    # warm the OS page cache with plain file reads (no Ray / object
    # store involvement — pulling 10GB through plasma before the timed
    # run leaves eviction state that throttles it); row count from
    # parquet footers.
    import glob as _glob

    import pyarrow.parquet as _pq

    n_rows = 0
    for f in _glob.glob(f"{seq_dir}/*.parquet"):
        n_rows += _pq.read_metadata(f).num_rows
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    # best of N runs: run 1 pays actor-pool startup + allocator warmup.
    # Per-query minima are tracked INDEPENDENTLY — the secondary
    # pipelines' wall time is dominated by dirty-page writeback state
    # left by whatever ran just before them (observed 10.7-21 s for the
    # same resumable run), so "the run with the best flagship" is not
    # the fair sample for the others.
    runs = int(os.environ.get("BENCH_RUNS", "2"))
    headline = float("inf")
    timings = {}
    for _ in range(runs):
        out_dir = tempfile.mkdtemp(prefix="lpr_bench_out_")
        try:
            t = run_flagship_bench(seq_dir, out_dir)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
        gc.collect()
        print(f"run: {t['total']:.1f}s", file=sys.stderr)
        headline = min(headline, t["total"])
        for key, val in t.items():
            if isinstance(val, (int, float)) and key in timings:
                timings[key] = min(timings[key], val)
            else:
                timings[key] = val
        timings["total"] = headline
    result = {
        "metric": "flagship_parse_enrich_route_aggregate_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {
            "flagship": round(timings["total"], 3),
            "resumable": round(timings.get("resumable", 0.0), 3),
            "route_shuffled_eighth": round(
                timings.get("route_shuffled_eighth", 0.0), 3
            ),
        },
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": n_rows,
        "sequences_per_sec": round(n_rows / headline, 1),
        "n_out_files": timings.get("n_out_files", 0),
    }
    ray.shutdown()
    print(json.dumps(result))


SCALE_LEVELS = tuple(
    int(x) for x in os.environ.get("SCALE_LEVELS", "4,16").split(",")
)


def scaling() -> None:
    """Same input + pipeline in fresh processes at N and 4N CPUs; report
    throughput at both plus efficiency = rate_4N / (4 × rate_N).

    Default pair is 4→16: this single box's memory/IO bandwidth tops out
    around 16 cores for this byte-moving workload (16 and 32 CPUs give
    the same wall time), so 8→32 under-reports the partitioned design's
    scaling — on a real multi-node cluster per-node bandwidth scales
    with node count. Both pairs are recorded in BASELINE.md.
    """
    # pre-generate the cached input at full parallelism so the low-CPU
    # subprocess doesn't pay the generation cost
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--gen-only"],
        env=dict(os.environ),
        capture_output=True,
        text=True,
        check=True,
    )
    lo, hi = SCALE_LEVELS
    rates, secs = {}, {}
    for ncpu in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_SHUFFLED="0")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        rec = json.loads(out.strip().splitlines()[-1])
        rates[ncpu] = rec["sequences_per_sec"]
        secs[ncpu] = rec["value"]
    eff = (rates[hi] / rates[lo]) / (hi / lo)
    print(
        json.dumps(
            {
                f"sec_{lo}": secs[lo],
                f"sec_{hi}": secs[hi],
                f"sequences_per_sec_{lo}": rates[lo],
                f"sequences_per_sec_{hi}": rates[hi],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


def ensure_dedup_corpus(sf_dir: str, expand: int) -> tuple[str, int, int]:
    """Deterministic expanded documents corpus with PLANTED near-dups.

    Every base doc yields ``expand`` variants; every 3rd word of a
    variant is replaced by a variant-unique token, so every word
    trigram contains a unique token and *no two variants share any
    shingle* — cross-variant Jaccard is exactly 0. Variants whose
    global id % 97 == 0 additionally get a planted partner differing
    in a single word (Jaccard ≈ 0.9+). Found-pair recall over the
    planted set is therefore exact ground truth at any scale.

    Returns (corpus_dir, n_docs, n_planted).
    """
    import pyarrow as pa
    import ray.data

    tag = sf_dir.strip("/").replace("/", "_")
    cache = f"{CACHE_ROOT}/dedup_{tag}_x{expand}_v2"
    marker = f"{cache}/meta.json"
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        return cache, meta["n_docs"], meta["n_planted"]

    base = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_base = base.count()

    def expand_batch(b: pa.Table) -> pa.Table:
        ids_out, texts_out = [], []
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            words = t.split()
            for e in range(expand):
                gid = int(d) * expand + e
                w = list(words)
                for i in range(0, len(w), 3):
                    w[i] = f"u{gid}w{i}"
                ids_out.append(gid)
                texts_out.append(" ".join(w))
                # plant only in long docs so the partner's true Jaccard
                # is safely above the verify threshold (a 1-word edit
                # in a 5-word doc is genuinely below it — that would
                # make "recall" measure the threshold, not the search)
                if gid % 97 == 0 and len(w) > 30:
                    w2 = list(w)
                    w2[1] = f"p{gid}"  # one-word change → near-dup partner
                    ids_out.append(gid + n_base * expand)
                    texts_out.append(" ".join(w2))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, type=pa.int64()),
                "text": pa.array(texts_out, type=pa.string()),
            }
        )

    import glob as _g
    import shutil as _sh

    import pyarrow.parquet as _pq

    if os.path.exists(cache):  # partial leftovers from a pre-marker crash
        _sh.rmtree(cache, ignore_errors=True)
    # write into a tmp dir and publish with an atomic rename: a crash
    # mid-generation must not leave a file set a rerun would silently
    # double-write into (duplicate doc_ids, wrong recall)
    tmp = f"{cache}.tmp-{os.getpid()}"
    _sh.rmtree(tmp, ignore_errors=True)
    os.makedirs(f"{tmp}/d", exist_ok=True)
    ds = base.map_batches(expand_batch, batch_format="pyarrow", batch_size=64)
    ds.write_parquet(f"{tmp}/d", compression="zstd", compression_level=1)
    # count from the written footers (ds.count() would re-execute the
    # whole expansion pipeline)
    n_docs = sum(
        _pq.read_metadata(f).num_rows for f in _g.glob(f"{tmp}/d/*.parquet")
    )
    n_planted = n_docs - n_base * expand
    with open(f"{tmp}/meta.json", "w") as f:
        json.dump({"n_docs": n_docs, "n_planted": n_planted}, f)
    os.rename(tmp, cache)
    return cache, n_docs, n_planted


def dedup_bench() -> None:
    """MinHash-LSH near-dup at scale: the fully distributed pipeline
    (band explode → bucket groupby → pair dedupe → join-based Jaccard
    verify) over the expanded corpus; reports docs/s and planted-pair
    recall. Run via ``python bench.py --dedup``; results recorded in
    BASELINE.md (not part of the driver's headline JSON)."""
    import gc
    import time as _time

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False
    _quiet_empty_block_schema_noise()

    expand = int(os.environ.get("DEDUP_EXPAND", "20"))
    corpus, n_docs, n_planted = ensure_dedup_corpus(SF_DIR, expand)
    gc.collect()

    from logpipe_ray.pipelines.dedup_pipeline import (
        candidate_pairs,
        verify_pairs,
    )
    from logpipe_ray.stages.dedup import exact_dedup

    t0 = _time.time()
    ds = ray.data.read_parquet(f"{corpus}/d")
    pairs = candidate_pairs(ds, k=128, bands=16).materialize()
    n_candidates = pairs.count()
    verified = verify_pairs(ds, pairs, threshold_bp=2000)
    found = verified.to_pandas()
    lsh_sec = _time.time() - t0
    # planted partners occupy the id range above all variants
    planted_found = int(
        (found["doc_b"].to_numpy() >= (n_docs - n_planted)).sum()
    )
    del ds, pairs, verified
    gc.collect()

    t1 = _time.time()
    ds2 = ray.data.read_parquet(f"{corpus}/d")
    n_unique = exact_dedup(ds2, num_buckets=64).count()
    exact_sec = _time.time() - t1
    del ds2
    gc.collect()

    # keep-best dedup over the same corpus. Correctness observable: by
    # construction every variant owns unique u{gid}w{i} tokens and every
    # planted partner adds a unique p{gid} token, so ALL word SETS are
    # distinct — n_groups must equal n_docs exactly (any shortfall is a
    # fingerprint false-merge at 100k-doc scale).
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from logpipe_ray.stages.dedup import add_text_hash, keep_best_dedup

    t2 = _time.time()
    ds3 = ray.data.read_parquet(f"{corpus}/d").map_batches(
        lambda b: b.append_column(
            "n_chars", _pc.cast(_pc.utf8_length(b["text"]), _pa.int64())
        ),
        batch_format="pyarrow",
    )
    n_groups = keep_best_dedup(ds3, quality_col="n_chars").count()
    keep_best_sec = _time.time() - t2
    del ds3
    gc.collect()

    # incremental (corpus-vs-arriving-batch) membership over the same
    # corpus: rows with doc_id%5==0 are the arriving batch. All texts
    # are unique here, so every new row must survive (n_kept == n_new —
    # any shortfall is a false drop).
    t3 = _time.time()
    ds4 = ray.data.read_parquet(f"{corpus}/d")

    def prep(b: _pa.Table) -> _pa.Table:
        b = add_text_hash(b)
        rem = _pc.subtract(
            b["doc_id"], _pc.multiply(_pc.divide(b["doc_id"], 5), 5)
        )
        is_new = _pc.equal(rem, 0)
        t = _pa.table(
            {
                "text_hash": b["text_hash"],
                "corpus_n": _pc.cast(_pc.invert(is_new), _pa.int64()),
                "new_n": _pc.cast(is_new, _pa.int64()),
            }
        )
        g = t.group_by("text_hash").aggregate(
            [("corpus_n", "sum"), ("new_n", "sum")]
        )
        return g.rename_columns(
            [c[: -len("_sum")] if c.endswith("_sum") else c for c in g.column_names]
        )

    def _inc_combine(b: _pa.Table) -> _pa.Table:
        # a hash's partials are co-located by the fold's sort; the
        # per-batch combiner is its own merge
        cols = ["text_hash", "corpus_n", "new_n"]
        if b.num_rows == 0:
            return b.select(cols)
        g = b.group_by("text_hash").aggregate(
            [("corpus_n", "sum"), ("new_n", "sum")]
        )
        return g.rename_columns(
            [c[: -len("_sum")] if c.endswith("_sum") else c for c in g.column_names]
        ).select(cols)

    from logpipe_ray.stages.smallagg import sorted_runs_fold as _srf

    agg = _srf(
        ds4.map_batches(prep, batch_format="pyarrow"),
        "text_hash",
        _inc_combine,
    )
    kept = agg.map_batches(
        lambda b: _pa.table(
            {
                "kept": _pa.array(
                    [
                        _pc.sum(
                            _pc.multiply(
                                _pc.cast(_pc.equal(b["corpus_n"], 0), _pa.int64()),
                                b["new_n"],
                            )
                        ).as_py()
                        or 0
                    ],
                    type=_pa.int64(),
                ),
                "new": _pa.array(
                    [_pc.sum(b["new_n"]).as_py() or 0], type=_pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n_kept, n_new = int(kept["kept"].sum()), int(kept["new"].sum())
    incremental_sec = _time.time() - t3
    del ds4, agg
    gc.collect()

    print(
        json.dumps(
            {
                "metric": "dedup_at_scale",
                "n_docs": n_docs,
                "n_planted_pairs": n_planted,
                "lsh_sec": round(lsh_sec, 2),
                "lsh_docs_per_sec": round(n_docs / lsh_sec, 1),
                "n_candidate_pairs": n_candidates,
                "n_verified_pairs": len(found),
                "planted_recall": round(planted_found / max(1, n_planted), 4),
                "exact_dedup_sec": round(exact_sec, 2),
                "exact_unique_rows": n_unique,
                "keep_best_sec": round(keep_best_sec, 2),
                "keep_best_groups": n_groups,
                "keep_best_false_merges": n_docs - n_groups,
                "incremental_sec": round(incremental_sec, 2),
                "incremental_new": n_new,
                "incremental_kept": n_kept,
                "incremental_false_drops": n_new - n_kept,
                "num_cpus": NUM_CPUS,
            }
        )
    )
    ray.shutdown()


def ensure_embed_corpus(n: int, d: int) -> tuple[str, int]:
    """Deterministic embedding corpus with PLANTED near-dups.

    Base vectors are i.i.d. N(0,1) rows (unit-normalized): in ``d``
    dimensions two independent such vectors have cosine
    O(1/sqrt(d)) ≈ ±0.12 at d=64, far below any near-dup threshold.
    Every 97th vector gets a planted partner = itself + 1% noise
    (cosine ≈ 0.9999), appended with id = base_id + n — so the exact
    removal set under "drop if cosine ≥ t to a lower id" is precisely
    the planted partners, at ANY threshold in the wide (≈0.5, 0.999)
    gap. Returns (dir, n_planted)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as _pq

    cache = f"{CACHE_ROOT}/embed_{n}x{d}_v1"
    marker = f"{cache}/meta.json"
    if os.path.exists(marker):
        with open(marker) as f:
            return cache, json.load(f)["n_planted"]
    os.makedirs(cache, exist_ok=True)
    rng = np.random.RandomState(43)
    base = rng.randn(n, d).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    planted_ids = np.arange(0, n, 97)
    partners = base[planted_ids] + 0.01 * rng.randn(len(planted_ids), d).astype(
        np.float32
    )
    ids = np.concatenate([np.arange(n), planted_ids + n]).astype(np.int64)
    mat = np.concatenate([base, partners])
    # vectorized list<float32> construction — the per-row .tolist()
    # version took tens of minutes at 1M rows
    offs = pa.array(
        np.arange(0, (len(mat) + 1) * d, d, dtype=np.int32)
    )
    emb = pa.ListArray.from_arrays(
        offs, pa.array(np.ascontiguousarray(mat).reshape(-1), type=pa.float32())
    )
    tbl = pa.table({"vec_id": pa.array(ids), "embedding": emb})
    _pq.write_table(tbl, f"{cache}/embeddings.parquet", compression="zstd")
    with open(marker, "w") as f:
        json.dump({"n_planted": int(len(planted_ids))}, f)
    return cache, int(len(planted_ids))


def embed_bench() -> None:
    """Embedding-cosine near-dup removal at scale: distributed
    chunk-pair block matmuls over a planted-near-dup corpus; reports
    vectors/s and whether the removal set is EXACTLY the planted
    partners. Run via ``python bench.py --embed``."""
    import time as _time

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False
    _quiet_empty_block_schema_noise()

    n = int(os.environ.get("EMBED_N", "100000"))
    d = int(os.environ.get("EMBED_D", "64"))
    corpus, n_planted = ensure_embed_corpus(n, d)
    from logpipe_ray.stages.similarity import cosine_dedup_distributed

    import gc

    from logpipe_ray.stages.similarity import cosine_dedup_lsh

    total = n + n_planted
    out = {
        "metric": "embed_dedup_at_scale",
        "n_vectors": total,
        "dim": d,
        "n_planted_dups": n_planted,
        "num_cpus": NUM_CPUS,
    }
    # EMBED_VARIANTS=lsh (or exact, or exact,lsh — default both): at
    # ≥1M vectors the exact chunk-pair path is quadratic by design and
    # only re-proves the 400k crossover; the LSH curve is the one worth
    # extending
    variants = set(
        os.environ.get("EMBED_VARIANTS", "exact,lsh").split(",")
    )
    for name, fn in (
        (
            "exact",
            lambda ds: cosine_dedup_distributed(
                ds, threshold=0.9, chunk_rows=4096
            ),
        ),
        # bands=16 with min_band_matches=2: the planted partners sit at
        # cos ≈ 0.997 (1% noise, d=64) → per-band collision p ≈ 0.68 at
        # the occupancy-pinned ~15 planes; requiring ≥2 of 8 bands
        # loses ~0.2% of them (measured: 8/4124 missed), ≥2 of 16 loses
        # ~4e-7 — recall ≈ 1 at twice the band-row volume, still ≫
        # faster than the quadratic exact path and linear in n.
        (
            "lsh",
            lambda ds: cosine_dedup_lsh(
                ds, threshold=0.9, n_rows=total, bands=16, min_band_matches=2
            ),
        ),
    ):
        if name not in variants:
            continue
        t0 = _time.time()
        ds = ray.data.read_parquet(f"{corpus}/embeddings.parquet")
        survivors = fn(ds)
        surv_ids = set()
        for b in survivors.iter_batches(
            batch_format="pyarrow", batch_size=65536
        ):
            surv_ids.update(b["vec_id"].to_pylist())
        sec = _time.time() - t0
        exact = len(surv_ids) == n and all(i < n for i in surv_ids)
        out[f"{name}_sec"] = round(sec, 2)
        out[f"{name}_vectors_per_sec"] = round(total / sec, 1)
        out[f"{name}_n_removed"] = total - len(surv_ids)
        out[f"{name}_removal_exactly_planted"] = bool(exact)
        del ds, survivors
        gc.collect()
    print(json.dumps(out))
    ray.shutdown()


def gen_only() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    _quiet_empty_block_schema_noise()
    seq_dir = ensure_input(SF_DIR, EXPAND)
    ray.shutdown()
    print(json.dumps({"generated": seq_dir}))


if __name__ == "__main__":
    if "--gen-only" in sys.argv:
        gen_only()
    elif "--scaling" in sys.argv:
        scaling()
    elif "--dedup" in sys.argv:
        dedup_bench()
    elif "--embed" in sys.argv:
        embed_bench()
    else:
        main()
