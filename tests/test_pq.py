"""Product quantization: train / encode / ADC search (similarity.py)."""
import pytest
from pyspark.sql import functions as F

from csvweb_spark.operators.similarity import (pq_encode, pq_search_adc,
                                               pq_train)

SCHEMA = "vec_id long, embedding array<double>"


def _vecs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


PATTERNS = [(0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0)]


def _clustered():
    """20 4-dim vectors in 2 subspaces; each subspace has two obvious
    clusters around 0.0 and 1.0 (5 vectors per (a, b) combination).
    Seeding is md5-deterministic (kmeans_lloyd contract): for ids
    0..19 the k=2 seed rows are ids 6 and 19, so those ids carry
    patterns (0,0) and (1,1) - one seed per cluster in BOTH subspaces,
    the well-posed Lloyd case this test wants (k-means with both seeds
    in one cluster legitimately may not separate)."""
    assign = {6: 0, 19: 3}
    counts = {0: 1, 1: 0, 2: 0, 3: 1}
    for i in range(20):
        if i in assign:
            continue
        p = min(range(4), key=lambda j: (counts[j], j))
        assign[i] = p
        counts[p] += 1
    rows = []
    for vid in range(20):
        a, b = PATTERNS[assign[vid]]
        eps = (vid % 5) * 0.001
        rows.append((vid, [a + eps, a - eps, b + eps, b - eps]))
    return rows, assign


def test_pq_train_shapes_and_ranges(spark):
    codes, books = pq_train(_vecs(spark, _clustered()[0]), m=2, k=2,
                            iterations=2)
    bk = books.collect()
    assert len(bk) == 4  # m*k
    assert {(r.sub, r.cell) for r in bk} == {(0, 0), (0, 1),
                                             (1, 0), (1, 1)}
    assert all(len(r.cv) == 2 for r in bk)
    cd = codes.collect()
    assert len(cd) == 20
    assert all(len(r.codes) == 2 for r in cd)
    assert all(0 <= c <= 1 for r in cd for c in r.codes)


def test_pq_codes_separate_subspace_clusters(spark):
    """Vectors sharing a subspace cluster share that subspace's code;
    the 4 (a, b) combinations get 4 distinct code words."""
    rows, assign = _clustered()
    codes, _ = pq_train(_vecs(spark, rows), m=2, k=2, iterations=2)
    got = {r.vec_id: tuple(r.codes) for r in codes.collect()}
    groups = [{got[v] for v in range(20) if assign[v] == p}
              for p in range(4)]
    assert all(len(g) == 1 for g in groups)  # stable within cluster
    assert len({next(iter(g)) for g in groups}) == 4  # distinct words


def test_pq_encode_equals_training_codes(spark):
    df = _vecs(spark, _clustered()[0])
    codes, books = pq_train(df, m=2, k=2, iterations=1)
    re = pq_encode(df, books)
    a = sorted((r.vec_id, tuple(r.codes)) for r in codes.collect())
    b = sorted((r.vec_id, tuple(r.codes)) for r in re.collect())
    assert a == b


def test_pq_adc_matches_python_replay(spark):
    df = _vecs(spark, _clustered()[0])
    codes, books = pq_train(df, m=2, k=2, iterations=2)
    queries = _vecs(spark, [(100, [0.0, 0.0, 1.0, 1.0]),
                            (101, [1.0, 1.0, 0.0, 0.0])]) \
        .withColumnRenamed("vec_id", "query_id")
    out = pq_search_adc(queries, codes, books, k=20)
    bk = {(r.sub, r.cell): list(r.cv) for r in books.collect()}
    cd = {r.vec_id: list(r.codes) for r in codes.collect()}
    qs = {100: [0.0, 0.0, 1.0, 1.0], 101: [1.0, 1.0, 0.0, 0.0]}

    def adc(qid, key):
        qv = [int(x * 1_000_000 // 1) for x in qs[qid]]
        total = 0
        for sub in (0, 1):
            cv = bk[(sub, cd[key][sub])]
            sv = qv[sub * 2:(sub + 1) * 2]
            total += sum((a - b) ** 2 for a, b in zip(sv, cv))
        return total

    for r in out.collect():
        assert r.adc_dist == adc(r.query_id, r.vec_id), \
            (r.query_id, r.vec_id)


def test_pq_adc_ranks_true_neighbors_first(spark):
    """Zero quantization error case: corpus rows sit exactly on their
    centroids, so ADC == true distance and top-1 is the true NN."""
    # ids 0..11, seed rows (k=2, md5 order) are ids 6 and 9: pin them
    # to patterns (0,0) and (1,1) so both subspaces seed well-posed
    assign = {6: 0, 9: 3}
    counts = {0: 1, 1: 0, 2: 0, 3: 1}
    for i in range(12):
        if i in assign:
            continue
        p = min(range(4), key=lambda j: (counts[j], j))
        assign[i] = p
        counts[p] += 1
    rows = [(vid, [PATTERNS[assign[vid]][0], PATTERNS[assign[vid]][0],
                   PATTERNS[assign[vid]][1], PATTERNS[assign[vid]][1]])
            for vid in range(12)]
    df = _vecs(spark, rows)
    codes, books = pq_train(df, m=2, k=2, iterations=3)
    queries = _vecs(spark, [(7, [1.0, 1.0, 1.0, 1.0])]) \
        .withColumnRenamed("vec_id", "query_id")
    top = pq_search_adc(queries, codes, books, k=3).collect()
    ones = sorted(v for v in range(12) if assign[v] == 3)
    assert sorted(r.vec_id for r in top) == ones
    assert all(r.adc_dist == 0 for r in top)


def test_pq_validates(spark):
    df = _vecs(spark, [(0, [1.0, 2.0, 3.0])])
    with pytest.raises(ValueError):
        pq_train(df, m=2, k=2)  # dim 3 not divisible by 2
    codes, books = pq_train(_vecs(spark, _clustered()[0]), m=2, k=2,
                            iterations=0)
    q = _vecs(spark, [(1, [0.0] * 4)]).withColumnRenamed(
        "vec_id", "query_id")
    with pytest.raises(ValueError):
        pq_search_adc(q, codes, books, k=0)


def test_pq_search_plan_window_group_limit_no_python(spark):
    df = _vecs(spark, _clustered()[0])
    codes, books = pq_train(df, m=2, k=2, iterations=1)
    q = _vecs(spark, [(1, [0.0] * 4)]).withColumnRenamed(
        "vec_id", "query_id")
    out = pq_search_adc(q, codes, books, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
