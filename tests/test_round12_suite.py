"""Independent re-derivations for the round-12 staged suite (p18+,
operators/analytics14.py): pure-python replays, partition-invariance
sweeps, and law pins. The p18+ keys sort after p17 and before q01, so
they stay OUT of the round-12 driver window (pinned in test_entry.py)
and rename into the round-13 window per the documented plan."""

import hashlib

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


# ---------------------------------------------------------------------------
# p18 — LSH bucket assignment audit


def _p18_planes(n_tables=8, bits=5, dim=64):
    even = "02468ace"
    return {
        (t, b): [
            1.0 if hashlib.md5(f"{t}_{b}_{j}".encode()).hexdigest()[0] in even else -1.0
            for j in range(1, dim + 1)
        ]
        for t in range(n_tables)
        for b in range(bits)
    }


def test_p18_matches_python_replay(spark, sf_dir, reg):
    """Third engine: hashlib planes + sequential float64 dots + bit
    packing in pure python must reproduce every (table, bucket) row."""
    rows = reg["p18_lsh_bucket_assign_audit"].fn(spark, sf_dir).collect()
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    planes = _p18_planes()
    expect = {}
    for vid, vec in emb.items():
        for t in range(8):
            bucket = 0
            for b in range(5):
                acc = 0.0
                for x, s in zip(vec, planes[(t, b)]):
                    acc += x * s
                if round(acc, 9) >= 0:
                    bucket |= 1 << b
            n, sm = expect.get((t, bucket), (0, 0))
            expect[(t, bucket)] = (n + 1, sm + vid)
    got = {(r.tbl, r.bucket): (r.n_vectors, r.sum_vec_ids) for r in rows}
    assert got == expect


def test_p18_partition_invariance(spark, sf_dir, reg):
    """The bucket assignment must not depend on input partitioning:
    the audit's totals are a pure function of the rows."""
    base = reg["p18_lsh_bucket_assign_audit"].fn(spark, sf_dir).collect()
    # every vector appears exactly once per table
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    per_table = {}
    for r in base:
        per_table[r.tbl] = per_table.get(r.tbl, 0) + r.n_vectors
    assert per_table == {t: n_vecs for t in range(8)}
    # buckets are 5-bit keys
    assert all(0 <= r.bucket < 32 for r in base)


def test_p18_planes_are_balanced_enough(spark, sf_dir, reg):
    """Sanity on the md5-parity rule: with ±1 pseudo-random planes over
    a real corpus, no single (table, bucket) may swallow everything —
    the routing must actually spread (>= 4 distinct buckets per table
    on every shipped SF)."""
    rows = reg["p18_lsh_bucket_assign_audit"].fn(spark, sf_dir).collect()
    buckets_per_table = {}
    for r in rows:
        buckets_per_table.setdefault(r.tbl, set()).add(r.bucket)
    assert all(len(v) >= 4 for v in buckets_per_table.values()), buckets_per_table
