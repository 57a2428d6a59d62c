"""Catalyst-native Bloom filter: broadcast a compact bit-set sketch
instead of a hash relation for membership tests against very large key
sets, then exact-verify the survivors — the 100 TB decontamination /
blocklist pattern.

Why not a semi join: decontaminating a corpus against a banned set of
~1e9 n-grams with a plain semi join either broadcasts a ~50 GB hash
relation (impossible) or shuffles the ENTIRE corpus gram stream on the
join key. A Bloom filter at 1% fpp is ~1.2 GB for 1e9 keys — small
enough to broadcast — and kills ~99% of clean grams map-side in
codegen; only the contaminated + false-positive residue reaches the
exact verify join, so the shuffle is sized by the contamination rate,
not the corpus. Results are EXACT: Bloom filters have no false
negatives (a key that was inserted always tests positive — asserted as
a hypothesis property in tests), and false positives are removed by the
verify join.

Why from scratch: Spark's own BloomFilterAggregate/BloomFilterMightContain
expressions (the runtime-filter machinery) are not SQL-registered in
4.1, and DataFrameStatFunctions.bloomFilter returns a driver-side JVM
object unusable inside a Column. The sketch here is a dense
``array<bigint>`` of the filter's 64-bit words built with one
explode + bit_or aggregation, and membership is k O(1) codegen bit
tests — every step is a built-in JVM expression, no Python in the
data path.

Hashing: Kirsch-Mitzenmacher double hashing — position_i =
(h1 + i*h2) mod m with h1 = xxhash64(key) and h2 = xxhash64(key, salt)
(the salt folds in as a second hash child), which gives k independent
probes from two hash evaluations. Both sides (build and probe) share
``_positions``, so there is no drift between insert and test.

No reference-parity citation: Drill has no Bloom surface; this is part
of the training-data-pipeline extension (SURVEY.md §6 scope) like
ops/dedup.py.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: m = -n*ln(p)/ln(2)^2 bits, k = (m/n)*ln(2)
    probes. Returned m is rounded up to a multiple of 64 (whole words).
    """
    n = max(1, int(expected_items))
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _hash_pair(key: Column, m_bits: int) -> tuple[Column, Column]:
    """(h1, h2) for Kirsch-Mitzenmacher double hashing, pmod-reduced so
    h1 + i*h2 stays < (k+1)*m — no bigint overflow even under ANSI mode
    (m is at most ~2^40 for any realistic filter). h2 is forced odd:
    double hashing degenerates when h2 == 0 (all k probes identical)."""
    h1 = F.pmod(F.xxhash64(key), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(m_bits))
    h2 = h2 + F.lit(1) - F.pmod(h2, F.lit(2))
    return h1, h2


def _positions_from(h1: Column, h2: Column, m_bits: int, k: int) -> list[Column]:
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits). Used where the hash pair cannot
    be hoisted into its own projection (bloom_build's explode); probe
    paths hoist via _hash_pair so xxhash64 runs once per row, not per
    probe."""
    h1, h2 = _hash_pair(key, m_bits)
    return _positions_from(h1, h2, m_bits, k)


def _bit_mask(bit: Column) -> Column:
    """1L << bit as a Column: PySpark's shiftleft only takes a Python
    int shift amount, so the 64 single-bit masks are a literal array
    indexed by bit (bit 63 is the sign bit — stored as its signed
    two's-complement value)."""
    masks = [(1 << i) if i < 63 else (1 << 63) - (1 << 64) for i in range(64)]
    return F.element_at(
        F.array(*[F.lit(v).cast("bigint") for v in masks]),
        bit.cast("int") + 1)


def bloom_build(keys: DataFrame, key_col: str, m_bits: int, k: int) -> DataFrame:
    """One-row DataFrame ``(bloom array<bigint>)``: the DENSE m-bit
    filter over every value of ``key_col``, as m/64 words.

    Plan: per-key explode of k (word, mask) pairs (no shuffle) → ONE
    bit_or aggregation keyed by word index, unioned with a zero row per
    word so every index is present (shuffle bounded by m/64 words, not
    by key count) → single-group sorted collect into the array. The
    final row is exactly m/8 bytes — the thing small enough to
    broadcast when the key set itself is not.

    Dense array, NOT map_from_entries: Catalyst's element_at on a map
    value LINEAR-SCANS the key array (ArrayBasedMapData has no hash
    index), which turned every probe into O(words) — a measured ~30x
    slowdown on the sf0.1 soak. Array element_at is O(1)."""
    n_words = m_bits // 64
    # the sketch is ONE array value: Spark caps single values at 2 GB,
    # so ~2^34 bits (~1.2e9 keys at 1% fpp) is the hard ceiling for one
    # filter. Past it, shard: S independent filters keyed by
    # pmod(xxhash64(key), S), probed by the matching shard — same
    # math, S rows. The guard raises rather than failing mid-job.
    if n_words * 8 > (1 << 31) - 64:
        raise ValueError(
            f"bloom sketch of {m_bits} bits exceeds Spark's 2 GB "
            "single-value limit; shard the key set (build one filter "
            "per pmod(xxhash64(key), S) shard) or raise fpp")
    pos = F.array(*_positions(F.col(key_col), m_bits, k))
    words = keys.select(F.explode(pos).alias("__p")).select(
        (F.col("__p") / 64).cast("bigint").alias("__w"),
        _bit_mask(F.pmod(F.col("__p"), F.lit(64))).alias("__m"),
    )
    zeros = keys.sparkSession.range(n_words).select(
        F.col("id").alias("__w"), F.lit(0).cast("bigint").alias("__m"))
    packed = words.unionByName(zeros).groupBy("__w").agg(
        F.bit_or("__m").alias("__bits"))
    return packed.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__w", "__bits"))),
            lambda x: x["__bits"],
        ).alias("bloom")
    )


# one filter row must stay under Spark's 2 GB single-value cap
_MAX_SHARD_BITS = ((1 << 31) - 64) * 8

_SHARD_SALT = 0x51ED270B


def _shard_of(key: Column, shards: int) -> Column:
    """Shard id in [0, shards) — a THIRD independent hash (its own
    salt), so shard choice is uncorrelated with the probe positions."""
    return F.pmod(F.xxhash64(key, F.lit(_SHARD_SALT)), F.lit(shards))


def bloom_shards_for(m_bits: int,
                     max_bits_per_shard: int = _MAX_SHARD_BITS) -> int:
    """Smallest shard count keeping every filter row under the 2 GB
    single-value cap: 1 up to ~1.7e10 bits (~1.2e9 keys at 1% fpp)."""
    return max(1, -(-m_bits // max_bits_per_shard))


def bloom_build_sharded(keys: DataFrame, key_col: str, m_bits: int,
                        k: int, shards: int) -> DataFrame:
    """``shards`` independent filters as rows (shard bigint, bloom
    array<bigint>) — the scale form past the single-row 2 GB cap
    (~1.2e9 keys): keys split by an independent hash, each shard gets
    m_bits/shards bits (per-shard load matches because the split is
    ~uniform), and the probe joins its shard row by equi-key. Same
    plan shape as bloom_build with the word aggregation keyed
    (shard, word); the S-row result broadcasts like the single row."""
    m_shard = ((m_bits // shards + 63) // 64) * 64
    n_words = m_shard // 64
    if n_words * 8 > (1 << 31) - 64:
        raise ValueError(
            f"bloom shard of {m_shard} bits exceeds Spark's 2 GB "
            "single-value limit; raise shards")
    pos = F.array(*_positions(F.col(key_col), m_shard, k))
    words = keys.select(
        _shard_of(F.col(key_col), shards).alias("__s"),
        F.explode(pos).alias("__p"),
    ).select(
        "__s",
        (F.col("__p") / 64).cast("bigint").alias("__w"),
        _bit_mask(F.pmod(F.col("__p"), F.lit(64))).alias("__m"),
    )
    zeros = keys.sparkSession.range(shards * n_words).select(
        (F.col("id") / n_words).cast("bigint").alias("__s"),
        F.pmod(F.col("id"), F.lit(n_words)).alias("__w"),
        F.lit(0).cast("bigint").alias("__m"))
    packed = words.unionByName(zeros).groupBy("__s", "__w").agg(
        F.bit_or("__m").alias("__bits"))
    return packed.groupBy(F.col("__s").alias("shard")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__w", "__bits"))),
            lambda x: x["__bits"],
        ).alias("bloom")
    )


def bloom_prefilter_sharded(df: DataFrame, keys: DataFrame, key_col: str,
                            m_bits: int, k: int, shards: int,
                            negate: bool = False,
                            _sketch: DataFrame | None = None) -> DataFrame:
    """Sharded variant of bloom_prefilter: the probe computes its shard
    id and equi-joins the broadcast S-row sketch table, then runs the
    same k O(1) bit tests against that shard's words. The probed side
    still never shuffles (broadcast hash join). ``_sketch`` lets a
    caller probing twice (bloom_anti_join's definite-out + maybe split)
    share ONE build aggregation over the key set — the build is the
    expensive stage in the sharded (billion-key) regime."""
    m_shard = ((m_bits // shards + 63) // 64) * 64
    sketch = _sketch if _sketch is not None else bloom_build_sharded(
        keys, key_col, m_bits, k, shards)
    h1, h2 = _hash_pair(F.col(key_col), m_shard)
    test = _might_contain_from(F.col("bloom"), F.col("__h1"), F.col("__h2"),
                               m_shard, k)
    return (
        df.withColumn("__s", _shard_of(F.col(key_col), shards))
        .withColumn("__h1", h1).withColumn("__h2", h2)
        .join(F.broadcast(sketch), F.col("__s") == sketch["shard"])
        .where(~test if negate else test)
        .drop("shard", "bloom", "__s", "__h1", "__h2")
    )


def _might_contain_from(bloom: Column, h1: Column, h2: Column,
                        m_bits: int, k: int) -> Column:
    """k O(1) bit tests against the dense word array: true iff every
    probed bit is set. h1/h2 are expected to be materialized columns so
    the hashes compute once per row, not once per probe."""
    checks = []
    for p in _positions_from(h1, h2, m_bits, k):
        word = F.element_at(bloom, (p / 64).cast("int") + 1)
        mask = _bit_mask(F.pmod(p, F.lit(64)))
        checks.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, checks)


def bloom_might_contain(bloom: Column, key: Column, m_bits: int, k: int) -> Column:
    h1, h2 = _hash_pair(key, m_bits)
    return _might_contain_from(bloom, h1, h2, m_bits, k)


# Sketches at or below this many bits (32 KB of words) collect to the
# driver and embed as an array LITERAL in the probe filter — one fewer
# join stage and a plain codegen Filter over the scan. Larger sketches
# stay a single-row broadcast: a big literal is wrong twice over (the
# plan ships it to every task, and PySpark's F.lit converts python
# lists element-by-element through py4j — measured 14.5s for 28k
# longs, which is why _sketch_literal builds SQL text parsed JVM-side
# instead).
_LITERAL_SKETCH_MAX_BITS = 1 << 18


def _sketch_literal(words) -> Column:
    """array<bigint> literal from ONE py4j string round-trip: the
    words render as SQL text and Spark's parser materializes the
    array JVM-side. F.lit(list) would marshal element-by-element."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in words) + ")")


def bloom_prefilter(df: DataFrame, keys: DataFrame, key_col: str,
                    m_bits: int, k: int, negate: bool = False) -> DataFrame:
    """Rows of ``df`` whose ``key_col`` MIGHT be in ``keys`` (or, with
    ``negate``, rows that DEFINITELY are not — no false negatives means
    the negated filter is already exact). Small sketches embed as an
    array literal (bounded <= 1 MB driver materialization); large ones
    join in via a broadcast nested-loop of a single row. Either way the
    membership test runs in whole-stage codegen with no shuffle of
    ``df`` — the two xxhash64 evaluations are projected once per row,
    then the k probes are O(1) array bit tests."""
    shards = bloom_shards_for(m_bits)
    if shards > 1:
        return bloom_prefilter_sharded(df, keys, key_col, m_bits, k,
                                       shards, negate)
    sketch = bloom_build(keys, key_col, m_bits, k)
    h1, h2 = _hash_pair(F.col(key_col), m_bits)
    if m_bits <= _LITERAL_SKETCH_MAX_BITS:
        words = sketch.collect()[0][0]
        test = _might_contain_from(_sketch_literal(words), F.col("__h1"),
                                   F.col("__h2"), m_bits, k)
        return (
            df.withColumn("__h1", h1).withColumn("__h2", h2)
            .where(~test if negate else test)
            .drop("__h1", "__h2")
        )
    test = _might_contain_from(F.col("bloom"), F.col("__h1"), F.col("__h2"),
                               m_bits, k)
    return (
        df.withColumn("__h1", h1).withColumn("__h2", h2)
        .crossJoin(F.broadcast(sketch))
        .where(~test if negate else test)
        .drop("bloom", "__h1", "__h2")
    )


# Below this many distinct keys the sketch is the WRONG plan: a plain
# broadcast hash semi/anti join is ONE codegen stage (the key set at
# ~50 B/key is well under executor budgets), while the sketch pipeline
# pays a multi-stage build + a fixed few seconds of plan compilation
# that nothing amortizes. Measured on the bench corpus: a 2.5k-key
# bloom_anti_join cost ~5 s of pure compile; the broadcast join, ~0.3 s.
# The sketch earns its keep in the can't-broadcast regime it was built
# for (1e8-1e10 keys). Callers pin min_keys=0 to force the sketch
# (tests do, to keep the path covered at toy sizes).
BLOOM_MIN_KEYS = 1_000_000


def bloom_semi_join(left: DataFrame, right: DataFrame, key_col: str,
                    fpp: float = 0.01,
                    expected_items: int | None = None,
                    min_keys: int = BLOOM_MIN_KEYS) -> DataFrame:
    """EXACT left-semi join on ``key_col`` with a Bloom prefilter:
    only rows surviving the broadcast sketch reach the exact semi join,
    so the shuffled volume is (true matches + fpp·clean), not |left|.
    ``expected_items`` sizes the filter; when omitted one count job
    runs over the distinct right keys (cheap: it is the small side).
    Below ``min_keys`` the sketch is skipped for a plain broadcast
    hash semi join — same exact result, one codegen stage."""
    rk = right.select(key_col).distinct().persist()
    n = expected_items if expected_items is not None else rk.count()
    if n < min_keys:
        return left.join(F.broadcast(rk), key_col, "left_semi")
    m_bits, k = bloom_params(n, fpp)
    survivors = bloom_prefilter(left, rk, key_col, m_bits, k)
    return survivors.join(rk, key_col, "left_semi")


def bloom_anti_join(left: DataFrame, right: DataFrame, key_col: str,
                    fpp: float = 0.01,
                    expected_items: int | None = None,
                    min_keys: int = BLOOM_MIN_KEYS) -> DataFrame:
    """EXACT left-anti join on ``key_col``: rows rejected by the sketch
    are definite non-members and pass through with NO shuffle at all
    (the dominant fraction when scrubbing a corpus against a
    blocklist); only sketch hits go through the exact anti join to
    strip false positives back in. Below ``min_keys`` the sketch is
    skipped for a plain broadcast hash anti join — same exact result,
    one codegen stage (the adaptive switch a real planner would make)."""
    rk = right.select(key_col).distinct().persist()
    n = expected_items if expected_items is not None else rk.count()
    if n < min_keys:
        return left.join(F.broadcast(rk), key_col, "left_anti")
    m_bits, k = bloom_params(n, fpp)
    if bloom_shards_for(m_bits) > 1:
        shards = bloom_shards_for(m_bits)
        # ONE sketch build shared by both probes: the two branches of
        # the union carry the same broadcast subtree, so Spark's
        # ReuseExchange runs the key-set aggregation once, not twice
        sketch = bloom_build_sharded(rk, key_col, m_bits, k, shards)
        definite_out = bloom_prefilter_sharded(
            left, rk, key_col, m_bits, k, shards, negate=True,
            _sketch=sketch)
        maybe = bloom_prefilter_sharded(
            left, rk, key_col, m_bits, k, shards, _sketch=sketch)
        return definite_out.unionByName(maybe.join(rk, key_col, "left_anti"))
    sketch = bloom_build(rk, key_col, m_bits, k)
    h1, h2 = _hash_pair(F.col(key_col), m_bits)
    if m_bits <= _LITERAL_SKETCH_MAX_BITS:
        bloom_col = _sketch_literal(sketch.collect()[0][0])
        tagged = left.withColumn("__h1", h1).withColumn("__h2", h2)
        drop = ["__h1", "__h2"]
    else:
        bloom_col = F.col("bloom")
        tagged = (
            left.withColumn("__h1", h1).withColumn("__h2", h2)
            .crossJoin(F.broadcast(sketch))
        )
        drop = ["bloom", "__h1", "__h2"]
    test = _might_contain_from(bloom_col, F.col("__h1"), F.col("__h2"),
                               m_bits, k)
    definite_out = tagged.where(~test).drop(*drop)
    maybe = tagged.where(test).drop(*drop)
    return definite_out.unionByName(maybe.join(rk, key_col, "left_anti"))


def bloom_decontaminate(corpus: DataFrame, benchmark: DataFrame,
                        id_col: str, text_col: str, n: int = 8,
                        fpp: float = 0.001,
                        expected_items: int | None = None,
                        min_keys: int = BLOOM_MIN_KEYS) -> DataFrame:
    """Benchmark decontamination (same contract and EXACT same results
    as ops/pipeline.decontaminate: (id, n_shared) over shared word
    n-grams) shaped for a banned set too large to broadcast-join.

    Three phases: (1) one pass over the benchmark's distinct n-gram
    hashes builds the sketch; (2) the corpus gram stream is prefiltered
    map-side against the broadcast sketch — at fpp=1e-3 that removes
    ~99.9% of clean grams before any shuffle; (3) survivors exact-join
    the benchmark grams (false positives die here) and aggregate per
    document. The benchmark explode runs twice (build + verify) rather
    than being persisted — it is the small side by assumption, and
    caching it would pin executor memory at scale."""
    from drill_spark.ops.pipeline import _ngram_keys, _spread

    c = _spread(corpus).select(
        F.col(id_col), F.explode(_ngram_keys(text_col, n)).alias("__ng"))
    # the benchmark gram set is consumed three times (sizing count,
    # sketch build, exact verify) — persist it; it is the small side by
    # assumption (MEMORY_AND_DISK, evictable, so nothing is pinned hard)
    b = _spread(benchmark).select(
        F.explode(_ngram_keys(text_col, n)).alias("__ng")).distinct().persist()
    n_keys = expected_items if expected_items is not None else b.count()
    if n_keys < min_keys:
        # small benchmark: the exact join IS a broadcast hash join;
        # a sketch in front of it would only add compile time
        survivors = c.join(F.broadcast(b), "__ng")
    else:
        m_bits, k = bloom_params(n_keys, fpp)
        survivors = bloom_prefilter(c, b, "__ng", m_bits, k).join(b, "__ng")
    return (
        survivors
        .groupBy(id_col)
        .agg(F.count_distinct("__ng").alias("n_shared"))
    )
