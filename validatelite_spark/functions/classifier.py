"""Hashed-n-gram linear quality classifier (fastText-style scoring).

The north-star pipeline scores documents with a fastText-like linear
model over hashed bag-of-words features. This is that scoring engine,
Spark-first: token → md5-derived bucket (engine-portable — the same
``('0x'||substr(md5(t),1,8))`` arithmetic the SimHash oracle replays),
bucket → weight from a fixed-size literal vector, per-doc sum + bias
through a logistic link. No model file and no training dependency: the
weights are data (a plain ``list[float]``), trained here with a
closed-form class-frequency-difference rule (Naive-Bayes-flavored) or
supplied by the caller from any external trainer.

Determinism across engines AND partitionings: weights are snapped to
the 1/1024 dyadic grid, so per-doc weight sums (hundreds of terms,
each k/1024 with |k| <= 2^11) are EXACT in IEEE double regardless of
summation order — Spark's shuffle-order sum and DuckDB's sequential
sum agree bit-for-bit, and the oracle needs no tolerance. The
reference engine has no classifier surface (closest: rule-threshold
checks, reference: core/executors/validity_executor.py); this is a
training-data operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from validatelite_spark.functions.textquality import tokens

#: default feature-vector width — small enough that the literal weight
#: array embeds in the plan (and the DuckDB oracle) comfortably
DEFAULT_DIM = 256

#: weight grid: 1/1024 steps keep every partial sum exactly
#: representable (dyadic rationals), making the score independent of
#: summation order on any engine
GRID = 1024


def snap_to_grid(w: float) -> float:
    return round(w * GRID) / GRID


def bucket_of(tok: Column, dim: int = DEFAULT_DIM) -> Column:
    """md5-derived hash bucket in [0, dim) — portable to any engine
    with md5 (DuckDB replay: ``('0x'||substr(md5(t),1,8))::bigint %
    dim``)."""
    h = F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(dim))


def classifier_scores(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """(id_col, score) — logistic score per doc over hashed tokens.

    Every token OCCURRENCE votes (bag-of-words with multiplicity, the
    fastText convention). NULL text → NULL score; a doc with no tokens
    scores ``sigmoid(bias)``.

    Physical shape: explode tokens → bucket → ``element_at`` into the
    literal weight array (whole-stage codegen — no Python, no HOF) →
    one partial-aggregating groupBy(doc) → broadcast-join the per-doc
    sums back. The weight vector rides in the plan as a literal: no
    side table, no model file distribution problem."""
    dim = len(weights)
    warr = F.array(*[F.lit(float(w)) for w in weights])
    ex = (df.filter(F.col(text_col).isNotNull())
          .select(F.col(id_col).alias("__k"),
                  F.explode(tokens(F.col(text_col))).alias("__t")))
    wt = F.element_at(warr, (bucket_of(F.col("__t"), dim) + 1)
                      .cast("int"))
    sums = ex.groupBy("__k").agg(F.sum(wt).alias("__s"))
    raw = F.lit(float(bias)) + F.coalesce(F.col("__s"), F.lit(0.0))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)) + 1e-9,
                    round_to)
    return (df.select(id_col, F.col(text_col).isNull().alias("__null"))
            .join(sums.withColumnRenamed("__k", id_col), id_col, "left")
            .select(id_col,
                    F.when(F.col("__null"),
                           F.lit(None).cast("double"))
                    .otherwise(score).alias("score")))


def train_weights(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    scale: float = 8.0,
) -> list[float]:
    """Closed-form linear weights from a labeled sample: per bucket,
    ``scale * (P(bucket | label=1) - P(bucket | label=0))``, snapped to
    the 1/1024 grid. A Naive-Bayes-flavored discriminator — one
    distributed pass (explode → (label, bucket) partial-agg counts),
    collect is dim-bounded (≤ 2·dim rows). Not SGD; callers with a
    trained fastText/logistic model just pass its weights instead."""
    ex = (df.filter(F.col(text_col).isNotNull())
          .select(F.col(label_col).cast("int").alias("__y"),
                  F.explode(tokens(F.col(text_col))).alias("__t")))
    counts = (ex.groupBy("__y", bucket_of(F.col("__t"), dim)
                 .alias("__b"))
              .agg(F.count(F.lit(1)).alias("__c")).collect())
    tot = {0: 0, 1: 0}
    per = {}
    for r in counts:
        tot[r["__y"]] += r["__c"]
        per[(r["__y"], r["__b"])] = r["__c"]
    w = []
    for b in range(dim):
        p1 = per.get((1, b), 0) / max(tot[1], 1)
        p0 = per.get((0, b), 0) / max(tot[0], 1)
        w.append(snap_to_grid(scale * (p1 - p0)))
    return w


def classifier_fail(col: Column, params: dict) -> Column:
    """CLASSIFIER rule failure predicate: NULL text fails (completeness
    semantics); otherwise fails when the logistic score is below
    ``min_score``. Scalar form for the fused rule scan: the per-row
    weight sum runs through ``F.aggregate`` over the token array
    (CodegenFallback — same cost class as the UDF-tier rules, one scan
    either way)."""
    weights = [float(x) for x in params["weights"]]
    bias = float(params.get("bias", 0.0))
    min_score = float(params.get("min_score", 0.5))
    dim = len(weights)
    warr = F.array(*[F.lit(w) for w in weights])
    s = F.aggregate(
        tokens(col), F.lit(0.0),
        lambda acc, t: acc + F.element_at(
            warr, (bucket_of(t, dim) + 1).cast("int")))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(bias) + s)))
    return F.when(col.isNull(), F.lit(True)).otherwise(
        score < F.lit(min_score))


def duckdb_classifier_sql(
    weights: list[float],
    bias: float,
    toks_expr: str,
    round_to: int | None = 6,
) -> str:
    """DuckDB scalar expression replaying ``classifier_scores``'s score
    for one row given ``toks_expr`` (the token-list SQL the other
    oracles share). Exact parity by the dyadic-grid argument above.
    ``round_to=None`` returns the raw sigmoid — use that when the
    oracle COMPARES the score (``classifier_fail`` thresholds the
    unrounded value; rounding first could flip a boundary doc)."""
    dim = len(weights)
    wl = "[" + ", ".join(repr(float(w)) for w in weights) + "]"
    s = (f"coalesce(list_sum(list_transform({toks_expr}, t -> "
         f"{wl}[1 + CAST(('0x'||substr(md5(t),1,8))::bigint % {dim} "
         f"AS INT)])), 0.0)")
    raw = f"1.0/(1.0 + exp(-({bias!r} + {s})))"
    if round_to is None:
        return raw
    return f"round({raw} + 1e-9, {round_to})"
