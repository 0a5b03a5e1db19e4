"""Domain-level (source-level) quality signals.

Web pipelines score DOMAINS, not just documents: a page from a domain
whose corpus-wide average quality is rock-bottom is dropped even when
the page itself squeaks past the per-doc rules (and vice versa, domain
reputation rescues borderline pages). The reference has no multi-row
prior of this kind (its rules are row-local; closest surface is the
aggregate rule metrics, reference: core/executors/base_executor.py) —
this is a training-data operator over the ``source``/domain column.

Scale shape: one partial-aggregating groupBy(domain) builds the domain
table (|domains| rows — millions at web scale, trivially shuffled);
the quantile threshold is computed over DOMAIN aggregates (one row per
domain, never per doc); the winner set joins back as a semi-join on
the domain key. No window over doc-keyed data anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def domain_stats(
    df: DataFrame,
    score_col: str,
    by: str = "source",
    token_col: str | None = None,
) -> DataFrame:
    """Per-domain mixing report: (domain, n_docs, avg_score[, tokens]).
    NULL domain is its own group (Spark groupBy keeps NULL keys)."""
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(score_col) + 1e-9, 6).alias("avg_score")]
    if token_col:
        aggs.append(F.sum(token_col).alias("tokens"))
    return df.groupBy(F.col(by).alias("domain")).agg(*aggs)


def domain_blocklist_filter(
    df: DataFrame,
    blocklist,
    host_col: str,
    key_col: str,
    mode: str = "drop",
    max_labels: int = 6,
) -> DataFrame:
    """Subdomain-aware blocklist filter (the UT1/adult-list semantics
    RefinedWeb/FineWeb apply): a row is blocked iff its host equals a
    blocklist domain OR sits under one (``a.b.example.com`` is blocked
    by ``example.com``). ``mode='drop'`` keeps the clean rows,
    ``'report'`` returns the blocked ones.

    ``blocklist``: a 1-column DataFrame of lowercase domains, or a
    Python list (wrapped into one). Matching is by label suffix, not
    string suffix — ``notexample.com`` is NOT blocked by
    ``example.com``.

    Scale shape: each row expands to its ≤ ``max_labels`` label
    suffixes with ``substring_index`` (pure native Column — no
    higher-order functions in the corpus projection) plus the full
    host; one explode (bounded fan-out ≤ max_labels+1), an equi-join
    against the blocklist on the suffix (AQE broadcasts a small list;
    a multi-million-entry UT1 list shuffles — both fine, the join key
    is a short string), then the blocked KEY SET joins back
    semi/anti on ``key_col``. Blocklist entries with more than
    ``max_labels`` labels only match a host exactly (documented cap —
    raise ``max_labels`` for deeper lists)."""
    if mode not in ("drop", "report"):
        raise ValueError("mode must be 'drop' or 'report'")
    spark = df.sparkSession
    if not isinstance(blocklist, DataFrame):
        blocklist = spark.createDataFrame(
            [(str(d),) for d in blocklist], "domain string")
    else:
        blocklist = blocklist.toDF("domain")
    host = F.col(host_col)
    cands = [host] + [F.substring_index(host, ".", -k)
                      for k in range(1, max_labels + 1)]
    blocked_keys = (df.select(F.col(key_col),
                              F.explode(F.array(*cands)).alias("__sfx"))
                    .join(blocklist,
                          F.col("__sfx") == F.col("domain"),
                          "left_semi")
                    .select(key_col).distinct())
    how = "left_anti" if mode == "drop" else "left_semi"
    return df.join(blocked_keys, on=key_col, how=how)


def domain_quality_filter(
    df: DataFrame,
    score_col: str,
    by: str = "source",
    q: float = 0.1,
    min_docs: int = 1,
    keep_small: bool = True,
    round_to: int = 4,
) -> DataFrame:
    """Drop every doc whose domain's AVERAGE ``score_col`` falls below
    the ``q``-quantile of per-domain averages (domains weighted
    equally, not by size — the reputation convention).

    ``min_docs``: domains with fewer docs carry too little evidence for
    a reputation; ``keep_small=True`` (default) passes their docs
    through unjudged, ``False`` drops them. The threshold is rounded
    (+1e-9 tie-break) so the cut is engine-reproducible; it is one
    scalar collected from a |domains|-row aggregate — driver-safe.
    NULL domains form their own reputation group (null-safe semi-join
    back)."""
    stats = (df.groupBy(F.col(by).alias("__d"))
             .agg(F.avg(score_col).alias("__avg"),
                  F.count(F.lit(1)).alias("__n")))
    judged = stats.filter(F.col("__n") >= min_docs)
    (row,) = (judged.agg(
        F.round(F.percentile("__avg", F.lit(q)) + 1e-9, round_to)
        .alias("th")).collect())
    th = row["th"]
    if th is None:
        return df  # no judged domain at all
    winners = judged.filter(F.round(F.col("__avg") + 1e-9, round_to)
                            >= F.lit(th)).select("__d")
    kept = df.join(winners, F.col(by).eqNullSafe(F.col("__d")),
                   "left_semi")
    if not keep_small:
        return kept
    small = stats.filter(F.col("__n") < min_docs).select("__d")
    return kept.unionByName(
        df.join(small, F.col(by).eqNullSafe(F.col("__d")),
                "left_semi"))
