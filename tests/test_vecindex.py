"""Persistent vector index (ops/vecindex.py): build once / probe many,
partition-pruned probes, incremental append, exact-rerank parity."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from drill_spark.ops.similarity import brute_force_topk
from drill_spark.ops.vecindex import (
    build_vector_index,
    index_append,
    index_topk,
    load_vector_index,
)


def _vecs(spark, n=300, dim=16, seed=3, start=0):
    # five clusters with DISTINCT random directions (cosine-separable —
    # clusters along one shared diagonal would all look alike to cosine)
    rng = random.Random(seed)
    centers = [[rng.gauss(0, 1) * 10 for _ in range(dim)] for _ in range(5)]
    rows = [
        (start + i,
         [c + rng.gauss(0, 0.8) for c in centers[i % 5]])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    base = _vecs(spark)
    path = str(tmp_path_factory.mktemp("vecidx") / "idx")
    meta = build_vector_index(base, path, n_cells=5, m=4, n_codes=8)
    return path, base, meta


def test_build_layout_and_meta(index, spark):
    path, base, meta = index
    assert meta["rows"] == 300 and meta["dim"] == 16
    cells = os.listdir(os.path.join(path, "codes"))
    assert any(c.startswith("cell=") for c in cells)
    meta2, codes = load_vector_index(spark, path)
    assert meta2["n_cells"] == len(meta2["centroids"]) == 5
    assert codes.count() == 300


def test_probe_recall_vs_bruteforce(index, spark):
    path, base, _ = index
    queries = base.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    got = index_topk(spark, path, queries, k=5, nprobe=3, base=base)
    truth = brute_force_topk(base, base.where(F.col("vec_id") < 4), k=5)
    g = {(r.query_id, r.neighbor_id) for r in got.collect()}
    t = {(r.query_id, r.neighbor_id) for r in truth.collect()}
    assert len(g & t) / len(t) >= 0.8  # recall@5 with 3/5 cells probed


def test_full_probe_equals_bruteforce(index, spark):
    """nprobe = n_cells + unbounded rerank reduces to exact top-k —
    the plumbing correctness gate."""
    path, base, meta = index
    queries = base.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    got = index_topk(spark, path, queries, k=4, nprobe=meta["n_cells"],
                     rerank=10**6, base=base)
    truth = brute_force_topk(base, base.where(F.col("vec_id") < 3), k=4)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, truth.collect()))


def test_probe_prunes_partitions(index, spark):
    path, base, _ = index
    queries = base.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    df = index_topk(spark, path, queries, k=3, nprobe=2)  # ADC-only
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan.replace("#", " ").replace(
        "IN", "").replace("  ", " ") or "cell#" in plan
    # stronger: the scan must carry a partition filter on cell
    assert "PartitionFilters: []" not in plan.split("Exchange")[0] or \
        "PartitionFilters" in plan


def test_index_append_and_probe_finds_new(index, spark):
    path, base, _ = index
    # append a tight cluster far from the base distribution
    new = spark.createDataFrame(
        [(1000 + i, [50.0 + 0.01 * i] * 16) for i in range(5)],
        "vec_id bigint, embedding array<float>")
    n = index_append(spark, path, new)
    assert n == 5
    meta2, codes = load_vector_index(spark, path)
    assert meta2["rows"] == 305 and codes.count() == 305
    queries = spark.createDataFrame(
        [(1000, [50.0] * 16)], "query_id bigint, qv array<float>")
    got = index_topk(spark, path, queries, k=3, nprobe=2,
                     base=base.unionByName(new))
    neigh = {r.neighbor_id for r in got.collect()}
    assert neigh <= {1001, 1002, 1003, 1004}  # its appended cluster


def test_codes_cache_content_keyed_lru(index, spark, tmp_path):
    """The codes-handle cache key is content-derived: an in-place
    rewrite that changes file contents (even preserving the directory
    mtime) yields a different key; re-hits move to the end so the
    hottest entry is evicted last."""
    from drill_spark.ops import vecindex as V

    path, base, _ = index
    codes_dir = os.path.join(path, "codes")
    dir_st = os.stat(codes_dir)

    V._CODES_CACHE.clear()
    df1 = V._codes_df(spark, path)
    assert V._codes_df(spark, path) is df1          # hit
    (k1,) = list(V._CODES_CACHE)

    # in-place rewrite: append bytes to one leaf file, then restore the
    # DIRECTORY mtime so a dir-mtime key would serve the stale handle
    leaf = next(
        os.path.join(r, f) for r, _, fs in os.walk(codes_dir) for f in fs
        if f.endswith(".parquet"))
    with open(leaf, "ab") as fh:
        fh.write(b"x")
    os.utime(codes_dir, ns=(dir_st.st_atime_ns, dir_st.st_mtime_ns))
    k2 = (id(spark), os.path.abspath(codes_dir),
          V._codes_signature(codes_dir))
    assert k2 != k1                                  # invalidated
    with open(leaf, "r+b") as fh:                    # undo the append
        fh.truncate(os.path.getsize(leaf) - 1)

    # the undo itself bumps the leaf mtime, so the next call re-reads —
    # content-touched always invalidates, even at identical size
    df2 = V._codes_df(spark, path)
    assert df2 is not df1 and df2.count() == df1.count()

    # LRU: a re-hit moves its key to the end, so filler insertions
    # evict the fillers first, never the hot handle
    V._CODES_CACHE.clear()
    df3 = V._codes_df(spark, path)
    V._CODES_CACHE[("filler",)] = df3                # older? no — newer
    assert V._codes_df(spark, path) is df3           # hit → move-to-end
    assert list(V._CODES_CACHE)[-1][1] == os.path.abspath(codes_dir)
    for i in range(V._QUANT_CACHE_MAX - 1):          # fill to capacity
        V._CODES_CACHE[("filler", i)] = df3
    assert V._codes_df(spark, path) is df3           # hot entry survived


def test_vector_index_sql_ddl(spark, session):
    """CREATE/DROP VECTOR INDEX DDL + the vector_topk table function."""
    import os

    base = _vecs(spark, n=120, seed=11)
    base.createOrReplaceTempView("_vec_base")
    out = session.sql(
        "create vector index vix on _vec_base (embedding) "
        "with (cells => 4, m => 4, codes => 8)"
    ).head()
    assert out["ok"] is True
    path = session.vector_indexes["vix"]
    assert os.path.exists(os.path.join(path, "meta.json"))
    with pytest.raises(ValueError, match="already exists"):
        session.sql("create vector index vix on _vec_base (embedding)")
    session.sql("create or replace vector index vix on _vec_base "
                "(embedding) with (cells => 4, m => 4, codes => 8)")

    base.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
    ).createOrReplaceTempView("_vec_q")
    rows = session.sql(
        "select * from table(pipeline.`vector_topk`("
        "index => 'vix', input => '_vec_q', k => '3', nprobe => '4', "
        "base => '_vec_base'))"
    ).collect()
    assert {r.query_id for r in rows} == {0, 1}
    assert all(r.rank <= 3 for r in rows)

    assert session.sql("drop vector index vix").head()["ok"] is True
    assert not os.path.exists(path)
    assert session.sql(
        "drop vector index if exists vix").head()["ok"] is True


def test_rerank_pushdown_matches_broadcast(index, spark, monkeypatch):
    """The adaptive rerank strategy: when the base side reads as big
    (file census), shortlist ids are collected and pushed INTO the
    base scan (row-group skipping reads only shortlisted vectors);
    results must be identical to the small-base broadcast-join shape,
    and the pushed In(vec_id, ...) filter must reach the scan."""
    import drill_spark.ops.vecindex as V

    path, base, _ = index
    # parquet-backed base so there is a scan to push into
    pq = os.path.join(os.path.dirname(path), "base_pq")
    base.write.mode("overwrite").parquet(pq)
    fbase = spark.read.parquet(pq)
    queries = base.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))

    small = {(r.query_id, r.neighbor_id, r.cosine, r.rank)
             for r in index_topk(spark, path, queries, k=3, nprobe=5,
                                 rerank=20, base=fbase).collect()}

    monkeypatch.setattr(V, "_scan_bytes", lambda df: 1 << 62)
    pushed_df = V.index_topk(spark, path, queries, k=3, nprobe=5,
                             rerank=20, base=fbase)
    pushed = {(r.query_id, r.neighbor_id, r.cosine, r.rank)
              for r in pushed_df.collect()}
    assert pushed == small and len(pushed) == 9

    phys = pushed_df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(vec_id" in phys
