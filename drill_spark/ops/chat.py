"""Instruction/chat training-data operators: conversation-structure
validation and chat-template rendering.

SFT/RLHF corpora ship as conversations — ``array<struct<role,
content>>`` — and the curation pipeline must (a) enforce the
structural contract every trainer assumes (optional leading system
turn, strict user/assistant alternation starting with user, ending on
assistant, no empty turns) and (b) render validated conversations into
the model's chat template for tokenize-and-pack.

Both operators are pure Catalyst array/struct HOFs bounded by
conversation length — one scan, zero shuffles, zero Python — so a
100 TB conversation store costs exactly one codegen pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_conversations(
    df: DataFrame, id_col: str = "conv_id", conv_col: str = "turns"
) -> DataFrame:
    """Structural validation of chat conversations. Emits per row:
    ``n_turns``, ``valid``, and ``reason`` — the FIRST failing rule in
    a fixed order ('too_short', 'bad_start', 'bad_alternation',
    'bad_end', 'empty_content', 'ok'), so downstream triage can group
    by failure mode.

    Contract: an optional single leading ``system`` turn, then strict
    ``user``/``assistant`` alternation that starts with user and ends
    with assistant; every turn's content non-blank.
    """
    conv = F.col(conv_col)
    roles = F.transform(conv, lambda x: x["role"])
    has_system = F.element_at(roles, 1) == "system"
    body = F.when(has_system, F.slice(roles, 2, F.size(roles) - 1)).otherwise(roles)
    n_body = F.size(body)
    alt_ok = F.forall(
        F.sequence(F.lit(1), n_body),
        lambda i: F.element_at(body, i)
        == F.when(i % 2 == 1, "user").otherwise("assistant"),
    )
    # coalesce: a NULL content must read as a FAILED predicate — forall
    # over a null lambda result is null, and the reason CASE would skip
    # it, marking a missing-content conversation 'ok'
    empty_ok = F.forall(
        conv,
        lambda x: F.coalesce(F.length(F.trim(x["content"])) > 0, F.lit(False)),
    )
    too_short = n_body < 2
    bad_start = F.element_at(body, 1) != "user"
    bad_end = F.element_at(body, -1) != "assistant"
    reason = (
        F.when(too_short, "too_short")
        .when(bad_start, "bad_start")
        .when(~alt_ok, "bad_alternation")
        .when(bad_end, "bad_end")
        .when(~empty_ok, "empty_content")
        .otherwise("ok")
    )
    return df.select(
        F.col(id_col),
        F.size(conv).cast("long").alias("n_turns"),
        reason.alias("reason"),
    ).withColumn("valid", F.col("reason") == "ok")


def render_chat(
    df: DataFrame, id_col: str = "conv_id", conv_col: str = "turns"
) -> DataFrame:
    """Render conversations into the ChatML-style training template:
    every turn becomes ``<|im_start|>{role}\\n{content}<|im_end|>\\n``
    and turns concatenate in order — the string a tokenize-and-pack
    stage (ops/pipeline.chunk_tokens → pack_bins) consumes. One array
    transform + join per row; codegen end to end."""
    conv = F.col(conv_col)
    rendered = F.array_join(
        F.transform(
            conv,
            lambda x: F.concat(
                F.lit("<|im_start|>"), x["role"], F.lit("\n"),
                # null content renders as empty rather than silently
                # nulling the whole turn out of the array_join
                F.coalesce(x["content"], F.lit("")),
                F.lit("<|im_end|>\n"),
            ),
        ),
        "",
    )
    return df.select(F.col(id_col), rendered.alias("rendered"))


def preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    response_col: str = "response",
    score_col: str = "score",
) -> DataFrame:
    """Preference-pair construction for DPO/RLHF from scored candidate
    responses: per prompt, chosen = the highest-scored response and
    rejected = the lowest-scored (deterministic ties: the response
    string itself breaks them, so re-runs and engines agree); prompts
    whose candidates all tie (margin 0) carry no preference signal and
    are dropped.

    Shape: ONE map-side-combined aggregation — chosen/rejected are
    ``max``/``min`` over a (score, response) struct, so no window, no
    self-join, and a million-candidate prompt costs one combiner row
    per task. Emits (prompt, chosen, rejected, chosen_score,
    rejected_score, margin)."""
    pair = F.struct(F.col(score_col).alias("s"),
                    F.col(response_col).alias("r"))
    # an unscored candidate must not poison the prompt: min(struct)
    # would pick the NULL score as 'worst' and the NULL margin would
    # drop the whole pair
    df = df.where(F.col(score_col).isNotNull())
    agg = df.groupBy(prompt_col).agg(
        F.max(pair).alias("best"),
        F.min(pair).alias("worst"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    return (
        agg.select(
            prompt_col,
            F.col("best.r").alias("chosen"),
            F.col("worst.r").alias("rejected"),
            F.col("best.s").alias("chosen_score"),
            F.col("worst.s").alias("rejected_score"),
            (F.col("best.s") - F.col("worst.s")).alias("margin"),
            "n_candidates",
        )
        .where(F.col("margin") > 0)
    )
