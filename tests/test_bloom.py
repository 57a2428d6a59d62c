"""Catalyst-native Bloom filter (ops/bloom.py): no false negatives,
bounded false-positive rate, EXACT semi/anti joins and decontamination
(sketch prefilter + exact verify), and the scale-shape plan claims."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from drill_spark import plans
from drill_spark.ops.bloom import (
    bloom_anti_join,
    bloom_build,
    bloom_decontaminate,
    bloom_might_contain,
    bloom_params,
    bloom_prefilter,
    bloom_semi_join,
)


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_bloom_params_sizing():
    m, k = bloom_params(1000, 0.01)
    # textbook sizing: ~9.6 bits/key, 7 probes at 1% fpp
    assert 9000 <= m <= 10240 and k == 7
    assert m % 64 == 0
    m2, _ = bloom_params(1000, 0.0001)
    assert m2 > m
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_bloom_no_false_negatives(spark):
    """Every inserted key MUST test positive — the property that makes
    the negated prefilter (and hence the anti join fast path) exact."""
    rng = random.Random(7)
    keys = [f"k{rng.randrange(10**12)}" for _ in range(500)]
    m, k = bloom_params(len(keys), 0.01)
    sketch = bloom_build(_keys_df(spark, keys), "key", m, k)
    probed = (
        _keys_df(spark, keys)
        .crossJoin(F.broadcast(sketch))
        .select(bloom_might_contain(F.col("bloom"), F.col("key"), m, k).alias("hit"))
    )
    assert all(r.hit for r in probed.collect())


def test_bloom_fpp_bounded(spark):
    """Disjoint probe keys false-positive at ~fpp (3x slack for a
    2000-probe sample)."""
    ins = [f"in{i}" for i in range(2000)]
    probe = [f"out{i}" for i in range(2000)]
    m, k = bloom_params(len(ins), 0.01)
    sketch = bloom_build(_keys_df(spark, ins), "key", m, k)
    hits = (
        _keys_df(spark, probe)
        .crossJoin(F.broadcast(sketch))
        .where(bloom_might_contain(F.col("bloom"), F.col("key"), m, k))
        .count()
    )
    assert hits <= 3 * 0.01 * len(probe), hits


def test_bloom_semi_anti_join_exact(spark):
    """bloom_semi_join / bloom_anti_join return EXACTLY the plain
    semi/anti join rows — false positives verified away, false
    negatives impossible."""
    rng = random.Random(13)
    left = [f"v{rng.randrange(300)}" for _ in range(400)]
    right = {f"v{rng.randrange(300)}" for _ in range(100)}
    ldf, rdf = _keys_df(spark, left), _keys_df(spark, sorted(right))
    # generous fpp so false positives actually occur and must be
    # scrubbed; min_keys=0 forces the SKETCH path at toy size (the
    # default routes small key sets to a plain broadcast join)
    got_semi = sorted(r.key for r in bloom_semi_join(
        ldf, rdf, "key", fpp=0.2, min_keys=0).collect())
    want_semi = sorted(k for k in left if k in right)
    assert got_semi == want_semi
    got_anti = sorted(r.key for r in bloom_anti_join(
        ldf, rdf, "key", fpp=0.2, min_keys=0).collect())
    want_anti = sorted(k for k in left if k not in right)
    assert got_anti == want_anti
    # the adaptive default (broadcast regime) returns the same rows
    assert sorted(r.key for r in bloom_semi_join(
        ldf, rdf, "key").collect()) == want_semi
    assert sorted(r.key for r in bloom_anti_join(
        ldf, rdf, "key").collect()) == want_anti


def test_bloom_empty_right_side(spark):
    """Empty key set -> empty map sketch: nothing might-contains, semi
    join is empty, anti join passes everything through."""
    ldf = _keys_df(spark, ["a", "b"])
    rdf = _keys_df(spark, []).where(F.lit(False))
    assert bloom_semi_join(ldf, rdf, "key", expected_items=1,
                           min_keys=0).count() == 0
    assert bloom_anti_join(ldf, rdf, "key", expected_items=1,
                           min_keys=0).count() == 2


def test_bloom_decontaminate_matches_exact(spark):
    """bloom_decontaminate == pipeline.decontaminate on the same split:
    identical (doc_id, n_shared) rows, including documents contaminated
    by multiple shared 8-grams."""
    from drill_spark.ops.pipeline import decontaminate

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(120))))
    # plant verbatim 12-token passages from "benchmark" docs (ids % 5 == 0)
    bench_ids = [i for i, _ in docs if i % 5 == 0]
    for ci in (3, 7, 11):
        src = docs[bench_ids[ci % len(bench_ids)]][1].split()[10:22]
        base = docs[ci][1].split()
        docs[ci] = (ci, " ".join(base[:30] + src + base[30:]))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    bench = df.where(F.col("doc_id") % 5 == 0)
    corpus = df.where(F.col("doc_id") % 5 != 0)
    want = sorted(
        (r.doc_id, r.n_shared)
        for r in decontaminate(corpus, bench, "doc_id", "text", n=8).collect())
    got = sorted(
        (r.doc_id, r.n_shared)
        for r in bloom_decontaminate(corpus, bench, "doc_id", "text",
                                     n=8, fpp=0.1, min_keys=0).collect())
    assert got == want and len(got) >= 3
    # adaptive default (broadcast regime at this size): same rows
    got_bc = sorted(
        (r.doc_id, r.n_shared)
        for r in bloom_decontaminate(corpus, bench, "doc_id",
                                     "text", n=8).collect())
    assert got_bc == want


def test_bloom_prefilter_plan_shape(spark):
    """Scale claims, plan-asserted. Small sketch: the filter embeds as
    an array LITERAL, so the probed side's plan is scan+filter with NO
    Exchange of any kind. Large sketch (past the 1 MB literal bound):
    the sketch arrives via a single-row broadcast and the only hash
    shuffle anywhere is the sketch's own word aggregation — the probed
    side itself never shuffles."""
    import re

    ldf = _keys_df(spark, [f"a{i}" for i in range(50)])
    rdf = _keys_df(spark, [f"a{i}" for i in range(0, 50, 5)])
    m, k = bloom_params(10, 0.01)
    s = plans.explain_str(bloom_prefilter(ldf, rdf, "key", m, k))
    assert "Exchange" not in s and "Join" not in s, s

    from drill_spark.ops.bloom import _LITERAL_SKETCH_MAX_BITS
    m_big = _LITERAL_SKETCH_MAX_BITS * 2
    s = plans.explain_str(bloom_prefilter(ldf, rdf, "key", m_big, k))
    assert "BroadcastExchange" in s, s
    hash_exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", s)
    assert all(key.startswith("__w") for key in hash_exchanges), s


def test_bloom_sharded_matches_single(spark):
    """Sharded filters (the past-2GB scale form) behave identically to
    the single-row filter: no false negatives, and the sharded
    semi/anti prefilter + verify pipeline returns exactly the plain
    join results."""
    from drill_spark.ops.bloom import bloom_prefilter_sharded

    rng = random.Random(41)
    left = [f"v{rng.randrange(400)}" for _ in range(500)]
    right = sorted({f"v{rng.randrange(400)}" for _ in range(120)})
    ldf, rdf = _keys_df(spark, left), _keys_df(spark, right)
    m, k = bloom_params(len(right), 0.05)
    # no false negatives through the sharded probe
    hits = bloom_prefilter_sharded(
        _keys_df(spark, right), rdf, "key", m, k, shards=4)
    assert hits.count() == len(right)
    # exact semi/anti via shard prefilter + verify
    pre = bloom_prefilter_sharded(ldf, rdf, "key", m, k, shards=4)
    got_semi = sorted(r.key for r in pre.join(rdf, "key", "left_semi").collect())
    assert got_semi == sorted(v for v in left if v in set(right))
    out = bloom_prefilter_sharded(ldf, rdf, "key", m, k, shards=4, negate=True)
    maybe = pre.join(rdf, "key", "left_anti")
    got_anti = sorted(r.key for r in out.unionByName(maybe).collect())
    assert got_anti == sorted(v for v in left if v not in set(right))


def test_bloom_shards_for_sizing():
    from drill_spark.ops.bloom import _MAX_SHARD_BITS, bloom_shards_for

    assert bloom_shards_for(1 << 20) == 1
    assert bloom_shards_for(_MAX_SHARD_BITS) == 1
    assert bloom_shards_for(_MAX_SHARD_BITS + 1) == 2
    assert bloom_shards_for(10 * _MAX_SHARD_BITS) == 10
