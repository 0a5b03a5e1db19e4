#!/usr/bin/env python3
"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32), plus the
quality-filter pipeline over a synthesized pages table sized to the SF
(sf0.1 → 100k docs). The pipeline number is the BASELINE.md headline:
docs/sec filtered.

Output:
  {"metric": "total_bench_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "pipeline_docs": N, "pipeline_docs_per_sec": N, "cpus": N,
   "steal_sec": N, "queries_steal": {...}, "pipeline_steal_sec": N}

Steal accounting (BENCH.md rule 5): this host has bursty CPU steal —
identical jobs have measured 36 s → 267 s swings. Every timed segment
records the /proc/stat col-9 (steal ticks) delta so a cross-round
regression can be adjudicated as real vs. a noisy-neighbor window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_CLK_TCK = os.sysconf("SC_CLK_TCK")


def _steal_ticks() -> int:
    """Aggregate steal ticks (col 9 of the 'cpu' line) — 0 if unreadable."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8])
    except (OSError, IndexError, ValueError):
        return 0


def _steal_sec(since_ticks: int) -> float:
    return round((_steal_ticks() - since_ticks) / _CLK_TCK, 3)

#: queries()-registry names timed per-round (one scan each; collect() to
#: force full materialization like the driver does)
BENCH_QUERIES = [
    "fused_rules",
    "langid_counts",
    "gopher_flags",
    "quality_scores",
    "token_stats",
    "unique_source",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ann_bruteforce",
    "ann_ivf",
    "bpe_token_stats",
    "quality_histogram",
    "tpch_rollup",
    "events_pivot",
    "embedding_pairs",
    "embedding_pairs_lsh",
    "events_daily",
    "sessionize",
    "tpch_q1",
    "top_customers",
    "perplexity_by_source",
    "asof_purchase_click",
    "range_signup_purchase",
    "multimodal_decode",
    "repetition_signals",
    "decontaminate",
    # round 3
    "token_budget",
    "hash_sample",
    "stratified_sample",
    "quantile_filter",
    "line_dedup",
    "time_rollup_events",
    "quality_quantiles",
    "ann_ivf_index",
    "top_ngrams",
    "key_skew",
    "curation_end_to_end",
    "asof_forward_click",
    "asof_nearest_click",
    "interval_overlap",
    "temperature_sample",
    "cap_per_source",
    # round 4
    "top_lines",
    "boilerplate_strip",
    "url_dedup",
    "classifier_scores",
    "chunk_dedup",
    "domain_filter",
    "normalize_text",
    # round 5
    "bloom_probe",
    "intra_doc_line_dedup",
    "split_summary",
    "exact_substring_pairs",
    "substring_scrub",
    "semantic_dedup",
    "dsir_weights",
    "mixture_sample",
    "pack_sequences",
    "drift_report",
    "blocklist_filter",
    "rule_overlap",
    "curation_decontaminated",
    "bpe_pair_counts",
    "ccnet_buckets",
    "domain_top_terms",
    "domain_pagerank",
    "profile_table",
    "embedding_decontaminate",
    "shard_assign",
    "shard_manifest",
    "dedup_best_corpus",
    "calibration_curve",
    "vocab_coverage",
    "dedup_census",
    "soft_sample",
    "contamination_provenance",
    "shard_verify",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    import __spark_entry__ as entry_mod
    from validatelite_spark.pipeline import QualityPipeline, synthesize_pages
    from validatelite_spark.session import get_spark

    spark = get_spark("vlite-spark-bench", cpus=cpus)
    spark.range(1000).count()  # JVM warmup

    timings: dict[str, float] = {}
    steals: dict[str, float] = {}
    bench_steal0 = _steal_ticks()
    qs = entry_mod.queries()
    for name in BENCH_QUERIES:
        t0, s0 = time.time(), _steal_ticks()
        qs[name](spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)
        steals[name] = _steal_sec(s0)

    # pipeline throughput: docs scaled to SF (sf0.1 → 100k pages)
    n_docs = max(int(sf * 1_000_000), 10_000)
    pipe = QualityPipeline(spark)
    # each task slot runs a JVM thread + a Python UDF worker (2 hot
    # threads) — cpus//2 concurrent tasks saturate the box without
    # oversubscribing it (BENCH.md rule 5; measured 2x faster than
    # cpus*2 partitions at cpus=32 AND draws less hypervisor steal)
    pipe_parts = max(cpus // 2, 4)
    pipe.run(synthesize_pages(spark, max(n_docs // 10, 1000),
                              partitions=pipe_parts))  # codegen/JIT warmup
    # best-of-3: the host has bursty CPU steal (BENCH.md); one bad
    # window would otherwise dominate the recorded per-round number
    pipe_sec = None
    pipe_steal = None
    for _ in range(3):
        pages = synthesize_pages(spark, n_docs, partitions=pipe_parts)
        t0, s0 = time.time(), _steal_ticks()
        _, results = pipe.run(pages)  # one fused scan incl. UDF stages
        el = round(time.time() - t0, 3)
        if pipe_sec is None or el < pipe_sec:
            pipe_sec, pipe_steal = el, _steal_sec(s0)
    timings["pipeline_filter"] = pipe_sec
    steals["pipeline_filter"] = pipe_steal
    kept = next(int(r.execution_message.split("kept=")[-1])
                for r in results if "kept=" in (r.execution_message or ""))

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "pipeline_docs": n_docs,
        "pipeline_docs_kept": kept,
        "pipeline_docs_per_sec": round(n_docs / pipe_sec, 1),
        "steal_sec": _steal_sec(bench_steal0),
        "queries_steal": steals,
        "pipeline_steal_sec": pipe_steal,
    }
    full_line = json.dumps(payload)
    # the full line first (humans + whole-output parsers), the whole
    # payload to a file the driver can read intact, and a SHORT summary
    # line LAST: the r3 driver artifact recorded parsed:null because its
    # tail window truncated the head of the long line (VERDICT r3 #4)
    print(full_line)
    out_file = os.environ.get("SPARK_GRAFT_BENCH_OUT",
                              os.path.join(os.path.dirname(
                                  os.path.abspath(__file__)),
                                  "BENCH_local.json"))
    with open(out_file, "w") as fh:
        fh.write(full_line + "\n")
    print(json.dumps({
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        "n_queries": len(timings),
        "pipeline_docs_per_sec": payload["pipeline_docs_per_sec"],
        "steal_sec": payload["steal_sec"],
        "pipeline_steal_sec": pipe_steal,
        "queries_file": "BENCH_local.json",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
