"""Robots-exclusion evaluation (RFC 9309), JVM-side end to end.

A crawl-derived corpus has to re-evaluate robots rules at scale —
retroactive exclusion requests are applied to petabytes long after
the fetch. The shape is a classic tiny-dim join: robots.txt files
are per-HOST (thousands), URLs are the corpus (billions), so the
parsed rule set BROADCASTS and every URL resolves its verdict in one
map-side pass — no shuffle of the corpus.

Profile (loud refusals, never guessed verdicts): the '*' user-agent
group, literal-prefix Allow/Disallow rules only. Path patterns
containing the RFC's '*' wildcard or '$' end anchor raise
NotImplementedError at parse time rather than mis-evaluating.
Precedence per RFC 9309 §2.2.2: the longest matching rule wins; on a
length tie the ALLOW rule wins; no match at all means allowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_robots_rules", "evaluate_robots"]

# RFC 9309 field names are case-insensitive ('User-Agent',
# 'disallow' are legal wild spellings); verbs normalize via lower()
_RULE_RE = r"(?i)^(Allow|Disallow)\s*:\s*(\S*)\s*$"
_AGENT_RE = r"(?i)^User-agent\s*:\s*(\S+)\s*$"


def parse_robots_rules(robots: DataFrame, host_col: str = "host",
                       text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> (host, verb, path_prefix). Lines are
    split and matched with one regexp; only the global '*' group is
    supported — a User-agent line other than '*' refuses loudly, as
    do wildcard/'$' patterns (raise_error stays row-level and costs
    no extra scan). Empty Disallow ('Disallow:') means allow-all per
    the RFC and is dropped (it can never out-match another rule)."""
    lines = robots.select(
        host_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "line_no", "line"
        ),
    ).withColumn("line", F.trim("line"))
    agent = F.regexp_extract("line", _AGENT_RE, 1)
    checked = lines.withColumn(
        "line",
        F.when(
            (agent != "") & (agent != "*"),
            F.raise_error(
                F.concat(
                    F.lit("robots profile supports only the '*' "
                          "user-agent group, got line: "),
                    F.col("line"),
                )
            ),
        ).otherwise(F.col("line")),
    )
    # a line that STARTS like a rule but fails the anchored grammar
    # (embedded space, trailing tokens: 'Disallow: /a b') must refuse,
    # not silently drop — a dropped disallow flips verdicts to
    # 'allowed' (ADVICE r10); mirrors the wildcard check below
    checked = checked.withColumn(
        "line",
        F.when(
            F.col("line").rlike(r"(?i)^(allow|disallow)\s*:")
            & ~F.col("line").rlike(_RULE_RE),
            F.raise_error(
                F.concat(
                    F.lit("malformed robots rule line (not "
                          "verb: single-token-path): "),
                    F.col("line"),
                )
            ),
        ).otherwise(F.col("line")),
    )
    rules = checked.select(
        host_col,
        F.initcap(
            F.lower(F.regexp_extract("line", _RULE_RE, 1))
        ).alias("verb"),
        F.regexp_extract("line", _RULE_RE, 2).alias("path_prefix"),
    ).filter((F.col("verb") != "") & (F.col("path_prefix") != ""))
    return rules.withColumn(
        "path_prefix",
        F.when(
            F.col("path_prefix").rlike(r"[*$]"),
            F.raise_error(
                F.concat(
                    F.lit("wildcard/'$' robots patterns not in "
                          "profile: "),
                    F.col("path_prefix"),
                )
            ),
        ).otherwise(F.col("path_prefix")),
    )


def evaluate_robots(urls: DataFrame, rules: DataFrame,
                    host_col: str = "host",
                    path_col: str = "path") -> DataFrame:
    """Verdict per URL row with ZERO shuffle of the corpus: the rule
    set folds to ONE array-of-structs row per host (an aggregation of
    the tiny dim side only), broadcast-joins onto the URLs, and each
    row picks its winner with a higher-order fold over the matching
    prefixes — longest wins, Allow beats Disallow on a length tie
    (RFC 9309 §2.2.2), no match means allowed. Adds `allowed`
    (int 0/1) and `matched_rule` (winning prefix, '' if none)."""
    per_host = rules.groupBy(host_col).agg(
        F.collect_list(
            F.struct(
                F.col("verb").alias("verb"),
                F.col("path_prefix").alias("path_prefix"),
            )
        ).alias("__rules")
    )
    joined = urls.join(F.broadcast(per_host), on=host_col, how="left")
    matched = F.filter(
        F.coalesce(
            F.col("__rules"),
            F.array().cast(
                "array<struct<verb:string,path_prefix:string>>"
            ),
        ),
        lambda r: F.col(path_col).startswith(r["path_prefix"]),
    )

    def better(acc, x):
        """x beats acc when longer, or equally long and an Allow."""
        xl, al = F.length(x["path_prefix"]), F.length(acc["path_prefix"])
        return F.when(
            acc["verb"].isNull()
            | (xl > al)
            | ((xl == al) & (x["verb"] == "Allow")),
            x,
        ).otherwise(acc)

    null_rule = F.struct(
        F.lit(None).cast("string").alias("verb"),
        F.lit(None).cast("string").alias("path_prefix"),
    )
    winner = F.aggregate(matched, null_rule, better)
    return joined.select(
        *urls.columns,
        F.when(winner["verb"] == "Disallow", F.lit(0))
        .otherwise(F.lit(1))
        .alias("allowed"),
        F.coalesce(winner["path_prefix"], F.lit("")).alias(
            "matched_rule"
        ),
    )
