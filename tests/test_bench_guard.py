"""Unit tests for bench.py's rotation-stable noise guard (round-5
verdict item 3): stem mapping must track the documented key rotations,
and the previous-round medians must parse both the raw bench JSON and
the driver's wrapped shape."""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench


def test_stem_strips_rotated_prefixes():
    assert bench._stem("qd01_neardup_pagerank") == "d01_neardup_pagerank"
    assert bench._stem("qe06_jsonl_sink_roundtrip") == "e06_jsonl_sink_roundtrip"
    assert bench._stem("qb14_tokenize_ids") == "b14_tokenize_ids"
    assert bench._stem("qc03_dup_clusters_distributed") == "c03_dup_clusters_distributed"
    # plain q-keys are NOT rotated prefixes
    assert bench._stem("q01_pricing_summary") == "q01_pricing_summary"
    assert bench._stem("q97_dup_clusters") == "q97_dup_clusters"
    # round-6-rotated f/g keys map back to their r05 history stems
    assert bench._stem("qf02_bigram_lm_logprob") == "f02_bigram_lm_logprob"
    assert bench._stem("qg01_personalized_pagerank") == "g01_personalized_pagerank"
    # round-7-rotated h/i keys map back to their r06 history stems
    assert bench._stem("qh01_bm25_ranking") == "h01_bm25_ranking"
    assert bench._stem("qi01_incremental_neardup_edges") == "i01_incremental_neardup_edges"


def test_previous_bench_reads_driver_wrapped_shape():
    prev = bench._previous_bench()
    # BENCH_r04.json exists in the repo with the driver's {"parsed": ...}
    # wrapper; the reader must surface per-query floats keyed by stem
    assert prev, "expected BENCH_r*.json to parse"
    assert all(isinstance(v, (int, float)) for v in prev.values())
    assert "q01_pricing_summary" in prev


def test_every_bench_query_maps_to_history_or_is_new():
    from pyspark_distributed_kmodes_spark.registry import load_all

    prev = bench._previous_bench()
    names = [n for n, q in load_all().items() if q.bench]
    unmapped = [n for n in names if bench._stem(n) not in prev]
    # only genuinely NEW bench entries (the staged k/l/m/n/r suites)
    # may lack history; every pre-existing entry must map through the
    # rotation
    assert all(n.startswith(("h", "i", "j", "k", "l", "m", "n", "r")) for n in unmapped), unmapped
