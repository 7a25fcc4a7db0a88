"""Near-dup detection property tests: MinHash recall vs exact Jaccard on
planted duplicates; SimHash behavior on identical/perturbed docs."""

import pytest
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_col,
)

BASE = "the quick brown fox jumps over the lazy dog while the spark engine scans parquet files in parallel"


@pytest.fixture(scope="module")
def planted(spark):
    """Corpus with planted near-duplicates: doc 1 == doc 0 (exact), doc 2
    differs by one word, docs 10+ are unrelated."""
    rows = [
        (0, BASE),
        (1, BASE),
        (2, BASE.replace("lazy", "sleepy")),
        (10, "completely different content about database query optimization and join ordering strategies here"),
        (11, "yet another unrelated document discussing window functions aggregation and shuffle partitioning"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_finds_exact_duplicate(planted):
    sigs = minhash_signatures(planted)
    pairs = lsh_candidate_pairs(sigs).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 1) in found


def test_minhash_signature_of_identical_docs_identical(planted):
    sigs = {r.doc_id: tuple(r.sig) for r in minhash_signatures(planted).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[10]


def test_minhash_estimate_high_for_neardup(planted):
    sigs = minhash_signatures(planted)
    cands = lsh_candidate_pairs(sigs)
    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
    est = {
        (r.doc_a, r.doc_b): r.est
        for r in cands.select("doc_a", "doc_b", (agree / 32).alias("est")).collect()
    }
    assert est[(0, 1)] == 1.0
    if (0, 2) in est:
        assert est[(0, 2)] > 0.4  # one-word change keeps most shingles


def test_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    """Every real-corpus pair with exact trigram Jaccard ≥ 0.5 must be
    recalled by the MinHash-LSH candidate stage."""
    from pyspark_distributed_kmodes_spark.operators.text import qo55_ngram_jaccard
    from pyspark_distributed_kmodes_spark.sources.tables import table

    exact = {
        (r.doc_a, r.doc_b)
        for r in qo55_ngram_jaccard(spark, sf_dir).collect()
        if r.jaccard >= 0.5
    }
    docs = table(spark, sf_dir, "documents")
    cands = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    missed = exact - cands
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_simhash_identical_zero_hamming(planted):
    sims = {r.doc_id: r.simhash for r in simhash_col(planted).collect()}
    assert sims[0] == sims[1]
    assert bin(sims[0] ^ sims[2]).count("1") < bin(sims[0] ^ sims[10]).count("1")


def test_language_id_deterministic_and_total(spark, sf_dir):
    from pyspark_distributed_kmodes_spark.operators.text import qm58_language_id

    out1 = qm58_language_id(spark, sf_dir).collect()
    out2 = qm58_language_id(spark, sf_dir).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    # every held-out doc gets exactly one prediction from the known langs
    langs = {"en", "fr", "es", "de", "zh"}
    assert all(r.predicted_lang in langs for r in out1)
    ids = [r.doc_id for r in out1]
    assert len(ids) == len(set(ids)) > 0


def test_connected_components_basic(spark):
    from pyspark_distributed_kmodes_spark.functions.graph import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6), (7, 7)], ["src", "dst"])
    cc = {r.vertex: r.component for r in connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7}


def test_connected_components_chain_diameter(spark):
    """A 12-node chain needs multiple propagation rounds — exercises the
    distributed iteration (driver_edge_limit=0 disables union-find),
    not just one hop."""
    from pyspark_distributed_kmodes_spark.functions.graph import connected_components

    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], ["src", "dst"])
    cc = {
        r.vertex: r.component
        for r in connected_components(edges, driver_edge_limit=0).collect()
    }
    assert set(cc.values()) == {0}
    assert len(cc) == 13


def test_connected_components_paths_agree(spark):
    """Driver union-find and distributed pointer doubling must emit
    IDENTICAL labels on the same graph (chains, cliques, isolates,
    self-loops, reversed edge directions)."""
    from pyspark_distributed_kmodes_spark.functions.graph import connected_components

    raw = (
        [(i, i + 1) for i in range(10, 20)]      # chain
        + [(a, b) for a in (30, 31, 32, 33) for b in (30, 31, 32, 33) if a < b]  # clique
        + [(41, 40), (43, 42), (42, 41)]          # reversed directions
        + [(50, 50)]                              # self-loop isolate
    )
    edges = spark.createDataFrame(raw, ["src", "dst"])
    fast = {r.vertex: r.component for r in connected_components(edges).collect()}
    slow = {
        r.vertex: r.component
        for r in connected_components(edges, driver_edge_limit=0).collect()
    }
    assert fast == slow
    assert fast[43] == 40 and fast[33] == 30 and fast[50] == 50
