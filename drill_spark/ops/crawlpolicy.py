"""Crawl-policy operators — robots.txt (RFC 9309) filtering.

A crawl corpus must honor exclusion rules before anything downstream
sees the pages; the published pipelines re-check robots at curation
time too (licensing/consent audits). Split to keep the hot path
JVM-side:

- ``parse_robots``: robots.txt TEXT -> rule rows. Group selection and
  directive parsing are line-stateful, so this is an Arrow-batched
  pandas UDF — robots files are one small row per HOST, never corpus-
  sized, so the Python cost is bounded by the domain count.
- ``robots_filter``: the per-URL decision is pure Catalyst — a
  broadcast join of the (tiny) rules table onto the URL set and a
  longest-match window, replayable in the DuckDB oracle. RFC 9309
  semantics: most-specific (longest) rule wins, Allow wins ties, no
  matching rule or no rules for the host means ALLOWED; ``*`` matches
  any characters and a trailing ``$`` anchors at the path end (LIKE
  translation with proper escaping of ``%``/``_``/``\\``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drill_spark.ops.text import url_domain


def parse_robots(df: DataFrame, text_col: str = "robots",
                 domain_col: str = "domain",
                 agent: str = "*") -> DataFrame:
    """(domain, robots-text) rows -> (domain, prefix, allow) rule rows
    for ``agent``: groups whose User-agent token equals the agent
    (case-insensitive) win; otherwise the ``*`` groups apply (RFC
    9309 group selection). Empty Disallow lines (allow-all) produce no
    rule, matching the spec."""
    out_type = "array<struct<prefix string, allow boolean>>"

    @F.pandas_udf(out_type)
    def _parse(texts):
        import pandas as pd

        def one(text):
            if text is None:
                return []
            groups = []  # (agents, rules)
            agents: list[str] = []
            rules: list[tuple[str, bool]] = []
            rules_started = False
            for raw in str(text).splitlines():
                line = raw.split("#", 1)[0].strip()
                if not line or ":" not in line:
                    continue
                key, _, val = line.partition(":")
                key = key.strip().lower()
                val = val.strip()
                if key == "user-agent":
                    if rules_started:
                        groups.append((agents, rules))
                        agents, rules, rules_started = [], [], False
                    agents.append(val.lower())
                elif key in ("allow", "disallow"):
                    rules_started = True
                    if val:  # empty Disallow: == allow everything
                        rules.append((val, key == "allow"))
                # crawl-delay / sitemap etc.: not path rules
            if agents or rules:
                groups.append((agents, rules))
            a = agent.lower()
            chosen = [r for ags, rs in groups if a in ags for r in rs]
            if not chosen and a != "*":
                chosen = [r for ags, rs in groups if "*" in ags for r in rs]
            return [{"prefix": p, "allow": al} for p, al in chosen]

        return pd.Series([one(t) for t in texts])

    return (
        df.select(F.col(domain_col).alias("domain"),
                  F.explode(_parse(F.col(text_col))).alias("r"))
        .select("domain", F.col("r.prefix").alias("prefix"),
                F.col("r.allow").alias("allow"))
    )


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Add ``allowed`` (+ the deciding rule) per URL. ``rules`` is
    (domain, prefix, allow) — from ``parse_robots`` or any source.
    Pure Catalyst: broadcast rules join + longest-match window."""
    from pyspark.sql import Window

    # Unique per-row key so duplicate URLs (normal in multi-capture crawl
    # data) each keep their own row — output cardinality == input.
    u = urls.withColumn("_rid", F.monotonically_increasing_id()).withColumn(
        "_dom", url_domain(F.col(url_col))).withColumn(
        "_path",
        F.coalesce(
            F.nullif(F.regexp_extract(F.col(url_col),
                                      r"^[a-z]+://[^/?#]*([^#]*)", 1),
                     F.lit("")),
            F.lit("/")))
    r = rules.select(
        F.col("domain").alias("_dom"), "prefix", "allow",
        F.length("prefix").alias("_plen"))
    # LIKE translation (escape %,_,\ then * -> %; trailing $ anchors)
    esc = F.replace(F.col("prefix"), F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit("%"), F.lit("\\%"))
    esc = F.replace(esc, F.lit("_"), F.lit("\\_"))
    esc = F.replace(esc, F.lit("*"), F.lit("%"))
    pat = F.when(esc.endswith("$"), F.expr(
        "substring(_esc, 1, length(_esc) - 1)")).otherwise(
        F.concat(F.col("_esc"), F.lit("%")))
    r = r.withColumn("_esc", esc).withColumn("_pat", pat).drop("_esc")

    joined = u.join(F.broadcast(r), "_dom", "left").withColumn(
        "_hit",
        F.expr("_path LIKE _pat ESCAPE '\\\\'"))
    w = Window.partitionBy("_rid").orderBy(
        F.desc_nulls_last(F.when(F.col("_hit"), F.col("_plen"))),
        F.desc_nulls_last(F.when(F.col("_hit"), F.col("allow"))),
        F.asc_nulls_last("prefix"))
    best = (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            *[F.col(c) for c in urls.columns],
            F.coalesce(F.when(F.col("_hit"), F.col("allow")),
                       F.lit(True)).alias("allowed"),
            F.when(F.col("_hit"), F.col("prefix")).alias("matched_rule"),
        )
    )
    return best
