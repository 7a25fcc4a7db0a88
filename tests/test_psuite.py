"""Independent re-derivations for the round-11 staged p-suite (new
engine surface, operators/analytics13.py): a numpy/union-find replay of
the fixed-quantizer SemDeDup pipeline and a pure-Python replay of the
one-iteration k-modes fit trace.

The p-prefix sorts after o67 and before q01, so these stay OUT of the
round-11 driver window (pinned in test_entry.py) and rename into the
round-12 window per the documented plan."""

import hashlib
import math

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def _md5fold(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _seqsum(vals):
    """Sequential float64 accumulation — matches the JVM aggregate fold
    and DuckDB list_sum ordering (NOT numpy pairwise summation)."""
    acc = 0.0
    for v in vals:
        acc += v
    return acc


def _round6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


@pytest.fixture(scope="module")
def p01_replay(duck):
    """Full python replay of p01 at sf0.001: md5-rank centroids,
    euclidean argmin with the (dist, cid) tie key, within-list cosine
    pairs at the rounded 0.42 boundary, union-find by min."""
    rows = duck.execute("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    vecs = {vid: [float(x) for x in emb] for vid, emb in rows}
    n_lists = -(-len(vecs) // 250)  # corpus-proportional, as the engine
    cents = sorted(vecs, key=lambda v: (_md5fold(str(v)), v))[:n_lists]

    def d2(a, b):
        return _seqsum((x - y) * (x - y) for x, y in zip(a, b))

    assign = {}
    for vid, v in vecs.items():
        key = min(
            (int(math.floor(_round6(math.sqrt(d2(v, vecs[c]))) * 1_000_000 + 0.5)), c)
            for c in cents
        )
        assign[vid] = key[1]

    def cos(a, b):
        return _seqsum(x * y for x, y in zip(a, b)) / (
            math.sqrt(_seqsum(x * x for x in a)) * math.sqrt(_seqsum(y * y for y in b))
        )

    ids = sorted(vecs)
    parent = {v: v for v in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if assign[a] == assign[b] and _round6(cos(vecs[a], vecs[b])) >= 0.42:
                edges.append((a, b))
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {v: find(v) for v in ids}
    return assign, comp, edges


def test_p01_matches_python_replay(spark, sf_dir, reg, p01_replay):
    assign, comp, _ = p01_replay
    rows = reg["p01_semantic_dedup_fixed_quantizer"].fn(spark, sf_dir).collect()
    assert len(rows) == len(assign)
    sizes = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    for r in rows:
        assert r.list_id == assign[r.vec_id], r
        assert r.component == comp[r.vec_id], r
        assert r.component_size == sizes[comp[r.vec_id]], r
        assert r.keep == (r.vec_id == comp[r.vec_id]), r


def test_p01_components_stay_within_one_list(spark, sf_dir, reg):
    """Edges are intra-list only, so every component must live inside a
    single coarse list — the SemDeDup candidate-bound property the
    whole 100 TB argument rests on."""
    rows = reg["p01_semantic_dedup_fixed_quantizer"].fn(spark, sf_dir).collect()
    lists_per_comp = {}
    keeps = {}
    for r in rows:
        lists_per_comp.setdefault(r.component, set()).add(r.list_id)
        keeps[r.component] = keeps.get(r.component, 0) + (1 if r.keep else 0)
    assert all(len(s) == 1 for s in lists_per_comp.values())
    assert all(k == 1 for k in keeps.values()), "exactly one keeper per component"


def test_p01_finds_planted_neardups(p01_replay):
    """The replay itself must be non-degenerate: the corpus plants
    near-duplicate embeddings, so at least one intra-list edge exists
    (otherwise the hash gate only proves the no-op path)."""
    _, comp, edges = p01_replay
    assert edges, "expected at least one within-list near-dup pair"
    assert any(v != c for v, c in comp.items())


def _p02_python_replay(duck, k=5):
    orders = duck.execute(
        "SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders"
    ).fetchall()
    counts = {}
    for _, s, p in orders:
        counts[(s, p)] = counts.get((s, p), 0) + 1
    init = [
        sp for sp, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    ][:k]

    def ham(sp, m):
        return (sp[0] != m[0]) + (sp[1] != m[1])

    def assign(modes):
        out = {}
        for okey, s, p in orders:
            out[okey] = min((ham((s, p), m) * 10 + i, i) for i, m in enumerate(modes))[1]
        return out

    a0 = assign(init)
    by_okey = {okey: (s, p) for okey, s, p in orders}
    new_modes = []
    for ci in range(k):
        members = [by_okey[okey] for okey, c in a0.items() if c == ci]
        if not members:
            new_modes.append(init[ci])
            continue
        mode = []
        for j in range(2):
            tally = {}
            for m in members:
                tally[m[j]] = tally.get(m[j], 0) + 1
            top = max(tally.values())
            mode.append(min(v for v, c in tally.items() if c == top))
        new_modes.append(tuple(mode))
    a1 = assign(new_modes)
    per = {}
    for ci in range(k):
        n_init = sum(1 for c in a0.values() if c == ci)
        members1 = [okey for okey, c in a1.items() if c == ci]
        n_stayed = sum(1 for okey in members1 if a0[okey] == ci)
        cost = sum(ham(by_okey[okey], new_modes[ci]) for okey in members1)
        per[ci] = (n_init, len(members1), n_stayed, cost, new_modes[ci])
    return init, new_modes, per, a0, a1, by_okey


def test_p02_matches_python_replay(spark, sf_dir, reg, duck):
    init, new_modes, per, _, _, _ = _p02_python_replay(duck)
    rows = reg["p02_kmodes_fit_step_trace"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        n_init, n_after, n_stayed, cost, mode = per[r.cluster]
        assert (r.n_init, r.n_after, r.n_stayed, r.cost_after) == (
            n_init,
            n_after,
            n_stayed,
            cost,
        ), r
        assert (r.mode_status, r.mode_priority) == mode, r


def test_p02_lloyd_step_never_increases_cost(duck):
    """The defining Lloyd property the trace must witness: re-assignment
    under the recomputed modes cannot cost more than the init
    assignment cost (each row moves only to a nearer-or-equal mode,
    and each mode is the per-attribute majority of its members)."""
    init, new_modes, per, a0, _, by_okey = _p02_python_replay(duck)

    def ham(sp, m):
        return (sp[0] != m[0]) + (sp[1] != m[1])

    cost_init = sum(ham(by_okey[okey], init[c]) for okey, c in a0.items())
    cost_after = sum(v[3] for v in per.values())
    assert cost_after <= cost_init
