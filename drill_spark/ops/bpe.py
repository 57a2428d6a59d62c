"""Byte-pair-encoding tokenizer trained on the corpus itself.

The public BPE algorithm (Sennrich et al. 2016; the GPT-2 tokenizer's
merge loop): start from characters, repeatedly merge the most frequent
adjacent symbol pair over the word-frequency table, apply merges to
text by rank. This replaces the repo's earlier chars/4 "BPE-ish"
estimate with real learned-subword token counts while staying
self-contained (no external vocab files).

Scale shape: the WORD-FREQUENCY table is the only training input —
computed distributed (split + explode + groupBy, map-side combined),
then capped to the top ``max_words`` distinct words for the driver-side
merge loop (exactly how BPE is trained in practice: vocab learners
consume word counts, not raw text; the cap bounds driver memory by
distinct-word count, not corpus size). Application broadcasts the merge
ranks into an Arrow-batched pandas iterator — one pass over the corpus,
no shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_END = "</w>"  # word-final marker, as in the published algorithm


def word_frequencies(df: DataFrame, text_col: str = "text",
                     max_words: int = 50_000) -> list[tuple[str, int]]:
    """Distributed word-frequency table, capped to the most frequent
    ``max_words`` (ties broken by word for determinism)."""
    rows = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return [(r.w, r.n) for r in rows]


def train_bpe(word_freqs: list[tuple[str, int]],
              n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a word-frequency table.

    Deterministic: the most frequent pair wins, ties broken
    lexicographically. Pure driver-side compute over the (bounded)
    vocabulary, independent of corpus size."""
    words: dict[tuple, int] = {}
    for w, n in word_freqs:
        words[tuple(w) + (_END,)] = words.get(tuple(w) + (_END,), 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple, int] = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        # max frequency; lexicographically SMALLEST pair on ties
        top_n = max(pairs.values())
        a, b = min(p for p, n in pairs.items() if n == top_n)
        if top_n < 2:
            break  # nothing left that repeats
        merges.append((a, b))
        merged = a + b
        new_words: dict[tuple, int] = {}
        for sym, n in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
    return merges


def encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """Apply merges to one word by rank (the GPT-2 bpe() loop)."""
    sym = list(word) + [_END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i: best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_token_stats(df: DataFrame, merges: list[tuple[str, str]],
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_words) per document under the trained merges —
    the real token-budget accounting a training pipeline runs. The
    ranks dict is a plan constant shipped with the closure; the apply
    is one Arrow-batched pass, no shuffle."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def run(batches):
        import pandas as pd

        for pdf in batches:
            toks, nwords = [], []
            for text in pdf[text_col]:
                words = [w for w in (text or "").lower().split() if w]
                total = 0
                for w in words:
                    total += len(encode_word(w, ranks))
                toks.append(total)
                nwords.append(len(words))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_tokens": pd.Series(toks, dtype="int64"),
                "n_words": pd.Series(nwords, dtype="int64"),
            })

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} bigint, n_tokens bigint, n_words bigint")


# A FIXED merge table — the "pretrained vocab" stand-in for
# tokenizer-true token accounting (budgets counted under the tokenizer
# that will actually train, not whitespace words). Deterministic by
# construction and small enough that a SQL oracle can replay the merge
# loop per distinct word (DuckDB recursive CTE); rank = list position.
FIXED_MERGES_V1: list[tuple[str, str]] = [
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("table", "</w>"),
    ("t", "h"), ("th", "e"), ("the", "</w>"),
    ("a", "</w>"), ("e", "</w>"), ("w", "</w>"), ("n", "</w>"),
    ("r", "o"), ("ro", "w"), ("row", "</w>"),
    ("d", "a"), ("da", "t"), ("dat", "a</w>"),
    ("i", "n"), ("in", "d"), ("w", "in"), ("win", "d"),
    ("s", "c"), ("sc", "a"), ("sca", "n</w>"),
    ("e", "r"), ("er", "</w>"), ("o", "r"),
    ("b", "a"), ("ba", "t"), ("bat", "c"), ("batc", "h"),
    ("v", "a"), ("va", "l"), ("val", "u"),
    ("q", "u"), ("qu", "e"),
    ("s", "m"), ("sm", "a"), ("sma", "l"),
    ("g", "r"), ("gr", "o"), ("gro", "u"),
    ("s", "t"), ("st", "r"), ("str", "e"),
    ("l", "i"), ("li", "n"),
]


def bpe_count_column(text_col: str, merges: list[tuple[str, str]]):
    """Arrow-batched Column: tokenizer-true token count of ``text_col``
    under ``merges`` — one pandas pass, ranks broadcast in the closure,
    no shuffle. The word-internal end-marker convention means any
    aggregate of these counts equals the sum of per-WORD counts, which
    is what lets a SQL oracle replay them from a distinct-word map."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("long")
    def n_tok(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def count(text):
            total = 0
            for w in (text or "").lower().split():
                c = cache.get(w)
                if c is None:
                    c = len(encode_word(w, ranks))
                    cache[w] = c
                total += c
            return total

        return s.map(count).astype("int64")

    return n_tok(text_col)


def corpus_bpe_stats(spark: SparkSession, df: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_merges: int = 200,
                     max_words: int = 50_000) -> DataFrame:
    """Train-on-corpus convenience: word counts (distributed) ->
    merges (driver, bounded) -> per-doc token stats (distributed)."""
    merges = train_bpe(word_frequencies(df, text_col, max_words), n_merges)
    return bpe_token_stats(df, merges, id_col, text_col)


def token_fertility(df: DataFrame, group_col: str,
                    text_col: str = "text",
                    merges: list[tuple[str, str]] | None = None
                    ) -> DataFrame:
    """Tokenizer fertility by group — the per-language tokenizer-
    fairness table (XLM-R, Conneau et al. 2020 report fertility =
    subwords per word; bytes per token is its byte-level twin): a
    language whose words fragment into many subwords pays more
    sequence length for the same content, which skews both training
    mixes and serving cost. Feed ``group_col`` from
    ops/langid.classify_lang so the table reflects PREDICTED language,
    not trusted metadata.

    Returns (group, n_docs, n_words, n_tokens, n_bytes, fertility
    tokens/word, bytes_per_token), ratios floored to 6 decimals, NULL
    on empty denominators.

    Scale shape: the BPE count is the one Arrow-batched pass
    (bpe_count_column, merge ranks broadcast in the closure); words
    and bytes are codegen; the aggregate is ONE map-combined groupBy
    over the bounded language key space. The whitespace word count
    uses the same split convention as the BPE kernel, so
    fertility >= 1 is a structural invariant."""
    toks = bpe_count_column(text_col, merges or FIXED_MERGES_V1)
    words = F.size(
        F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                 lambda w: w != "")
    ).cast("long")
    nbytes = F.octet_length(F.col(text_col)).cast("long")
    agg = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(words).alias("n_words"),
        F.sum(toks).alias("n_tokens"),
        F.sum(nbytes).alias("n_bytes"),
    )
    return agg.select(
        group_col, "n_docs", "n_words", "n_tokens", "n_bytes",
        F.when(
            F.col("n_words") > 0,
            F.floor(F.col("n_tokens").cast("double") * 1000000
                    / F.col("n_words")) / 1000000,
        ).alias("fertility"),
        F.when(
            F.col("n_tokens") > 0,
            F.floor(F.col("n_bytes").cast("double") * 1000000
                    / F.col("n_tokens")) / 1000000,
        ).alias("bytes_per_token"),
    )
