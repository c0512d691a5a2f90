"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + drain results via
count/collect of the final frame), twice:

* cold (first run) — includes codegen compile + Python-worker startup; this
  is what `value`/`queries` report, comparable across rounds;
* warm — the data-path time once codegen/worker pools are hot, reported
  as `value_warm`/`queries_warm`. Since round 6 the warm number is the
  MEDIAN OF 3 iterations with the per-query (max-min) spread published in
  `queries_warm_spread`, so a regression is a trend, not a coin flip
  (round 5's 1.17x-published vs 1.08x-rerun ambiguity was exactly one
  noisy sample). Cold-vs-warm separates fixed JIT/compile overhead
  (irrelevant at 100 TB, where it amortizes to zero) from the
  scan/shuffle/compute time that actually scales with data. Every run
  also appends its full record (plus load-average machine state) to
  BENCH_HISTORY.jsonl for trend reads across rounds.

The headline set spans the engine's surface: reference-parity expansion,
TPC-H-style joins/aggs, windows, dedup (exact + MinHash-LSH + SimHash +
the full fuzzy pipeline + substring spans), similarity search, Gopher
quality filters, and session windows.
"""

from __future__ import annotations

import json
import os
import statistics
import time

from batch_processing_iac_aws_spark.plans import QUERIES
from batch_processing_iac_aws_spark.session import get_spark

HEADLINE = [
    "interval_expand",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q21_waiting_suppliers",
    "multimodal_frames",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q9_product_profit",
    "q10_top_customers",
    "q18_large_orders",
    "window_rank",
    "window_session",
    "join_asof",
    "dedup_exact_hash",
    "dedup_minhash",
    # round 10: dedup_simhash (retired registry row) replaced by its
    # oracled portable twin — same voting/packing/banding algorithm plus
    # the banded pair join + exhaustive verify, so the slot now measures
    # the FULL simhash near-dup path rather than signatures only
    "dedup_simhash_portable",
    "similarity_topk",
    "similarity_ivf",
    "text_quality",
    "text_tfidf_topk",
    "search_bm25",
    "embedding_pca",
    "join_point_in_time",
    # round 4: full fuzzy flow + span dedup + Gopher quality filters
    "dedup_fuzzy_pipeline",
    "dedup_substring_spans",
    "text_repetition_profile",
    "corpus_gopher_filter",
    # round 5: rolling-corpus near-dup ingestion (signature-index banding;
    # inverted-broadcast semantic dedup)
    "dedup_incremental_fuzzy",
    "dedup_incremental_embedding",
    # round 5 (cont.): corpus-wide line dedup, SemDeDup, exact k-means,
    # the published k-means+SemDeDup composition, C4 normalization
    "corpus_line_dedup",
    "dedup_semantic",
    "cluster_kmeans",
    "dedup_semantic_kmeans",
    "text_normalize",
    # round 6: persisted rolling-corpus IVF index + capped-LSH prod guard
    # + bloom-prefiltered ingest + token-balanced sharding
    "similarity_incremental",
    "dedup_minhash_capped",
    "dedup_bloom_prefilter",
    "docs_balanced_shards",
    # round 7: band-key Bloom in front of the banded fuzzy join (compare
    # against dedup_incremental_fuzzy above), PQ + exact rerank, real-BPE
    # token budgeting through the count_tokens seam
    "dedup_incremental_fuzzy_bloom",
    "similarity_pq_rerank",
    "docs_token_budget_bpe",
    # round 7 (cont.): the full streaming ANN composition — its source
    # scaffold is cached per process (scratch_source_cache), so cold
    # includes the one-time corpus build (~16s at sf0.1) and warm
    # measures ingest + search (~5.5s)
    "streaming_incremental_ann",
    "similarity_ivf_pq",
    "docs_sparse_knn",
    "dedup_incremental_sparse",
    # round 8: the persisted IVF-PQ search (index cached per process as an
    # input-by-contract, so warm ≈ steady-state search cost — the
    # amortized number the per-call-training similarity_ivf_pq above
    # cannot show), the sixth streaming composition (lexical-cosine
    # rolling ingest; source cached, table/index/checkpoint rebuilt per
    # call), and the weights-as-data quality gate (map-only projection)
    "similarity_ivf_pq_index",
    "streaming_incremental_sparse",
    "quality_logit_score",
    # round 8 (cont.): the quality gate fused into the streaming ingest
    # (shares the cached source with streaming_incremental_ann's pattern)
    # and IVFADC proper (residual-trained PQ at the same code budget)
    "streaming_quality_ingest",
    "similarity_ivf_pq_residual",
    # round 8 (second wave): persisted-index small-files compaction —
    # the 4-batch input index is cached per process (input-by-contract)
    # and COPIED per run, so warm measures copy + compact + the two
    # audit searches, not the 4-batch build
    "similarity_index_compact",
    # round 8 (second wave, cont.): perceptual-hash media near-dup —
    # relational aHash + the shared pigeonhole hamming band join
    "multimodal_phash_pairs",
    # round 9: dedup-index small-files compaction through the shared
    # generationed store (4-batch sha index cached per process as an
    # input-by-contract and COPIED per run, so warm measures copy +
    # compact + the two audit anti-joins, not the 4-batch build), and
    # the eighth streaming composition (compaction fused into the
    # checkpointed rolling ingest: two streaming runs + a compaction per
    # call under the wiped scratch_dir; source cached per process)
    "dedup_index_compact",
    "streaming_compacted_ingest",
    # round 9 (cont.): index-accelerated semantic dedup — the persisted
    # IVF index built per call (build path), then a 2-of-16-cell probe
    # dedup of the 25% batch
    "dedup_incremental_ann",
    # round 9 (cont.): the ninth streaming composition — near-duplicate
    # rolling ingest (MinHash banding vs the store-resolved signature
    # index + exact-Jaccard verify); source cached per process,
    # table/index/checkpoint rebuilt per call
    "streaming_fuzzy_ingest",
    # round 10: the tenth streaming composition — the corpus TABLE behind
    # the generationed store, compaction mid-checkpoint + before-any-write
    # replay refusal (two streaming runs + a table compaction + the
    # refusal probe per call under the wiped scratch_dir; source cached)
    "table_compacted_ingest",
    # round 11: the eleventh streaming composition — the threshold-gated
    # auto-compaction policy fused IN-BAND (one streaming run with
    # auto_compact_batches=1, the metadata-only trigger firing
    # mid-stream, + the refusal and crash-replay fixpoint probes per
    # call under the wiped scratch_dir; source cached)
    "streaming_autocompact_ingest",
    # round 12: the four round-11 staged pairs flipped live — DSIR
    # importance resampling (top-k head + published Gumbel-top-k
    # sampling head), the store's snapshot-read contract (full
    # 3-batch ingest + compaction + as-of reads per call under the
    # wiped scratch_dir; source cached), and blocked record linkage
    "dsir_select",
    "dsir_gumbel",
    "table_snapshot_asof",
    "join_fuzzy_match",
    # round 12 (cont.): the r11 GIF codec family on true bits — per-doc
    # engine-encoded 2-frame animations decoded + composed through the
    # real sample_frames/gif_frame_fn path, block-mean featurized
    "multimodal_gif_frames",
    # round 13: the two round-12 staged audio pairs flipped live — the
    # true-bits WAV codec seam (encode -> RIFF walk -> downmix ->
    # block-RMS envelope) and the gain-invariant audio near-dup over
    # the shared banded perceptual-hash join — plus the
    # dataset_mixture -> dsir_select end-to-end curation composition
    "multimodal_wav_envelope",
    "multimodal_audio_near_dup",
    "dsir_mixture_select",
    # round 14: the two round-13 staged video pairs flipped live — the
    # true-bits MJPEG-AVI container seam (encode_jpeg_gray ->
    # encode_avi_mjpeg -> RIFF/movi walk -> JPEG decode -> block-mean
    # features) and the brightness-invariant video near-dup completing
    # the near-dup triad over the shared banded perceptual-hash join
    "multimodal_avi_frames",
    "multimodal_video_near_dup",
    # round 14 (cont.): the G.711 telephony decode branch on true
    # format-6/7 bits, and the store lifecycle under the object-store
    # CAS commit protocol (FakeObjectStoreBackend, forced retries)
    "multimodal_g711_telephony",
    "table_objectstore_ingest",
]

# FROZEN core yardstick (round 10, verdict item 5): the headline set keeps
# growing from its original 36 queries, so cross-round totals of the FULL
# set are
# not comparable — coverage growth reads as regression. CORE is the
# round-5-era headline prefix (33 queries: the 34-query prefix stable
# since r5 minus the retired dedup_simhash) and MUST NEVER CHANGE — the
# yardstick regressions are measured against. New queries go to HEADLINE
# only. bench emits core_total_sec / core_total_warm_sec alongside the
# full headline totals every run; r8/r9 core totals are back-computed in
# ARCHITECTURE.md (round-10 section) for the trend line.
CORE = [
    "interval_expand",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q21_waiting_suppliers",
    "multimodal_frames",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q9_product_profit",
    "q10_top_customers",
    "q18_large_orders",
    "window_rank",
    "window_session",
    "join_asof",
    "dedup_exact_hash",
    "dedup_minhash",
    "similarity_topk",
    "similarity_ivf",
    "text_quality",
    "text_tfidf_topk",
    "search_bm25",
    "embedding_pca",
    "join_point_in_time",
    "dedup_fuzzy_pipeline",
    "dedup_substring_spans",
    "text_repetition_profile",
    "corpus_gopher_filter",
    "dedup_incremental_fuzzy",
    "dedup_incremental_embedding",
    "corpus_line_dedup",
    "dedup_semantic",
    "cluster_kmeans",
    "dedup_semantic_kmeans",
    "text_normalize",
]

WARM_ITERS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load0 = os.getloadavg()[0]
    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen paths once so per-query numbers measure the
    # queries, not session bootstrap
    QUERIES["q6_forecast_revenue"](spark, sf_dir).count()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        n = QUERIES[name](spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
        samples = []
        for _ in range(WARM_ITERS):
            t1 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            samples.append(time.perf_counter() - t1)
        warm[name] = round(statistics.median(samples), 3)
        spread[name] = round(max(samples) - min(samples), 3)
        print(
            f"# {name}: {cold[name]}s cold / {warm[name]}s warm median "
            f"(±{spread[name]}s over {WARM_ITERS}) ({n} rows)",
            flush=True,
        )

    record = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(cold.values()), 3),
        "unit": "sec",
        "queries": cold,
        "value_warm": round(sum(warm.values()), 3),
        "queries_warm": warm,
        "queries_warm_spread": spread,
        "warm_iters": WARM_ITERS,
        # the frozen yardstick (see CORE above) + explicit full-set
        # aliases, so cross-round trend reads never mix the two
        "core_total_sec": round(sum(cold[n] for n in CORE), 3),
        "core_total_warm_sec": round(sum(warm[n] for n in CORE), 3),
        "headline_total_sec": round(sum(cold.values()), 3),
        "headline_total_warm_sec": round(sum(warm.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # load gate (round 11, verdict item 5): the r10 driver entry was
        # recorded at loadavg 13.5 and read as a 1.08x regression that a
        # low-load rerun showed didn't exist. A run that STARTS loaded is
        # marked unofficial so trend reads skip it; the round's official
        # number should be the lowest-load of >=2 runs.
        "load_avg_start": round(load0, 2),
        # official also requires the CANONICAL scale factor (round 14,
        # r13 verdict item 4): an sf0.01 run in the ledger was marked
        # official and produced phantom 6.9x per-query "regressions" in
        # any trend read that filtered on the flag alone — the flag now
        # encodes both the load gate and sf0.1, so envelope/trend
        # tooling cannot mix scale factors.
        "official": load0 < 2.0 and sf == "0.1",
    }
    print(json.dumps(record), flush=True)
    try:  # per-query trend ledger: regression = trend, not coin flip
        hist = dict(record)
        hist["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        hist["load_avg_start"] = load0
        hist["load_avg_end"] = os.getloadavg()[0]
        hist["cpus"] = cpus
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_HISTORY.jsonl"), "a"
        ) as fh:
            fh.write(json.dumps(hist) + "\n")
    except OSError:
        pass  # history is best-effort; the stdout contract is the product
    spark.stop()


if __name__ == "__main__":
    main()
