"""Deterministic sampling / budgeting operators for training-data mixes.

- **hash_sample**: keep a row iff the first 8 hex digits of
  ``md5(key || ':' || seed)``, mod 1e6, fall under ``fraction * 1e6``.
  Unlike ``df.sample`` (RNG per partition → different rows per run and
  per partitioning), the decision is a pure function of the key, so the
  sample is reproducible across runs, partitionings, and cluster sizes
  — and md5 is identical in every engine, so the oracle can verify the
  EXACT row set (xxhash64 would be Spark-only). Per-stratum rates
  compose by applying different fractions per group.
- **token_budget_filter**: the data-mixing primitive — within each
  group (lang, source, ...), take documents in a deterministic order
  until a token budget is reached. A doc is kept while the PRE-doc
  running total is under budget, so the first over-budget doc still
  lands (standard inclusive cut: the mix reaches its budget instead of
  undershooting).

  Scale shape: a naive ``Window.partitionBy(group)`` cumsum funnels each
  group through ONE task — at web scale the ``en`` group is most of the
  corpus. Instead a two-phase prefix sum: range-bucket each group on the
  order column (monotone → bucket order = sort order), aggregate
  per-bucket token sums (tiny: groups × n_buckets rows), turn them into
  cumulative bucket offsets with a window over that tiny table, then
  broadcast the offsets back and run the cumsum window per (group,
  bucket) — parallelism is groups × n_buckets and no task ever sees more
  than one bucket of one group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: denominator for hash-fraction arithmetic: fractions are exact
#: multiples of 1/1_000_000 (plenty for mix ratios)
_DENOM = 1_000_000


def _hash_bucket(key_col: str, seed: int):
    """The sampling contract, in ONE place (its SQL mirror appears in
    every sampling oracle): first 8 md5 hex digits of ``key:seed``,
    mod 1e6 — engine-portable, partition/cluster-size invariant."""
    return F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col(key_col).cast("string"), F.lit(str(seed)))), 1, 8),
        16, 10).cast("long") % _DENOM


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``key_col``.

    Exact semantics (SQL-expressible in any engine): keep iff
    ``conv(substr(md5(key || ':' || seed), 1, 8), 16, 10) % 1e6 <
    round(fraction * 1e6)``. Distinct keys are kept or dropped
    atomically — sampling is stable under duplication, joins, and
    reordering."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(round(fraction * _DENOM))
    bucket = _hash_bucket(key_col, seed)
    return df.filter(bucket < F.lit(threshold))


def prefix_sums(
    df: DataFrame,
    token_col: str,
    by: str,
    order_col: str = None,
    key_col: str = None,
    n_buckets: int = 64,
    out_col: str = "__pre",
    order_bounds: tuple | None = None,
) -> DataFrame:
    """Scalable per-group running totals: every input column plus
    ``out_col`` = the sum of ``token_col`` over all rows of the same
    ``by`` group that sort STRICTLY BEFORE this row in ascending
    (``order_col``, ``key_col``) order — i.e. the pre-row prefix sum.

    This is the shared two-phase machinery behind
    ``token_budget_filter`` / ``mixture_budget_filter`` (budget cuts)
    and ``pack_sequences`` (sequence packing). Scale shape (module
    docstring): a naive ``Window.partitionBy(by)`` cumsum funnels each
    group through ONE task; instead each group is range-bucketed on
    ``order_col`` into ``n_buckets`` buckets, per-bucket sums (a tiny
    |groups| × n_buckets table) become cumulative bucket offsets via a
    window over that tiny table, and the heavy window partitions by
    (group, bucket). Bucketing is a monotone function of ``order_col``
    alone, so bucket boundaries never split an order tie and the result
    equals the single-window definition at any partitioning."""
    order_col = order_col or token_col
    # range bucketing casts order_col to double: a non-numeric order
    # column would raise CAST_INVALID_INPUT under ANSI mode — or, under
    # non-ANSI sessions, yield NULL buckets whose join silently drops
    # every row. Fail loudly up front instead (ADVICE r3).
    from pyspark.sql.types import NumericType, TimestampType
    ot = df.schema[order_col].dataType
    if not isinstance(ot, (NumericType, TimestampType)):
        raise TypeError(
            f"prefix_sums order_col {order_col!r} must be "
            f"numeric or timestamp (got {ot.simpleString()}) — range "
            "bucketing needs a castable order; use a numeric sort key")
    intra = [F.col(order_col)]
    if key_col:
        intra.append(F.col(key_col))

    # NULL handling must match the definitional single window exactly:
    # a NULL group key is its own partition, so the broadcast joins use
    # NULL-SAFE equality on the NATIVE key (a stringified surrogate
    # would split groups the window merges — e.g. -0.0 vs 0.0 — or
    # collide with a real key equal to the sentinel), and NULL order
    # values sort FIRST (Spark ASC NULLS FIRST) — they get the reserved
    # bucket -1.
    # phase 0: per-group order_col range (tiny) → broadcast back.
    # ``order_bounds=(lo, hi)`` skips this extra full scan when the
    # caller KNOWS the range (e.g. ``shards.assign_shards`` generated
    # the order itself as a 60-bit hash) — any monotone bucketing gives
    # identical prefix sums, only bucket balance depends on the bounds,
    # so known-uniform bounds lose nothing and save a corpus pass.
    if order_bounds is not None:
        lo, hi = float(order_bounds[0]), float(order_bounds[1])
        if not hi > lo:
            raise ValueError(f"order_bounds must satisfy hi > lo, "
                             f"got {order_bounds}")
        bucket = (
            F.when(F.col(order_col).isNull(), F.lit(-1))
            .otherwise(F.greatest(F.least(
                F.floor((F.col(order_col).cast("double") - F.lit(lo))
                        / F.lit(hi - lo) * n_buckets).cast("int"),
                F.lit(n_buckets - 1)), F.lit(0))))
        b = df.withColumn("__bkt", bucket)
    else:
        stats = (df.groupBy(F.col(by).alias("__gk"))
                 .agg(F.min(order_col).cast("double").alias("__lo"),
                      F.max(order_col).cast("double").alias("__hi")))
        span = F.col("__hi") - F.col("__lo")
        bucket = (
            F.when(F.col(order_col).isNull(), F.lit(-1))
            .when(span <= 0, F.lit(0))
            .otherwise(F.least(
                F.floor((F.col(order_col).cast("double") - F.col("__lo"))
                        / span * n_buckets).cast("int"),
                F.lit(n_buckets - 1))))
        b = (df.join(F.broadcast(stats),
                     F.col(by).eqNullSafe(F.col("__gk")))
             .withColumn("__bkt", bucket).drop("__gk", "__lo", "__hi"))

    # phase 1: per-(group, bucket) token sums → cumulative offsets.
    # bsums has ≤ |groups| × n_buckets rows, so this window is trivial.
    bsums = (b.groupBy(F.col(by).alias("__gk"), F.col("__bkt"))
             .agg(F.sum(token_col).alias("__bsum")))
    wo = (Window.partitionBy("__gk").orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = bsums.select(
        "__gk", F.col("__bkt").alias("__obkt"),
        (F.sum("__bsum").over(wo) - F.col("__bsum")).alias("__off"))

    # phase 2: intra-bucket cumsum + offset = global pre-doc total
    w = (Window.partitionBy(by, "__bkt").orderBy(*intra)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = (F.col("__off") + F.sum(token_col).over(w) - F.col(token_col))
    return (b.join(F.broadcast(offsets),
                   F.col(by).eqNullSafe(F.col("__gk"))
                   & (F.col("__bkt") == F.col("__obkt")))
            .withColumn(out_col, pre)
            .drop("__bkt", "__obkt", "__off", "__gk"))


def token_budget_filter(
    df: DataFrame,
    budget: int | dict,
    token_col: str,
    by: str,
    order_col: str = None,
    key_col: str = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Keep documents per ``by`` group until ``budget`` tokens.

    ``budget`` is a single int (every group gets the same budget) or a
    ``{group_value: budget}`` dict (per-group budgets — the data-mixing
    path, see ``mixture_budget_filter``); groups absent from the dict
    get budget 0 and are dropped entirely.

    Documents are taken in ascending ``order_col`` (ties broken by
    ``key_col`` for determinism); a doc is kept while the running token
    total BEFORE it is under the budget, so each group ends at or just
    past its budget (never empty when any doc exists). Running totals
    come from ``prefix_sums`` (two-phase — no one-task-per-group
    bottleneck). Degenerate case: a group whose ``order_col`` is a
    single constant collapses to one bucket (ordering within it is pure
    ``key_col``, which range-bucketing on the order column cannot
    split)."""
    pre = prefix_sums(df, token_col, by, order_col=order_col,
                      key_col=key_col, n_buckets=n_buckets)
    if isinstance(budget, dict):
        # literal CASE on the group value: |groups| is mixture-sized
        # (languages/domains), so the expression stays small and the
        # whole plan remains SQL-replayable; NULL-safe equality so a
        # NULL group key can carry a budget too
        bud = F.lit(0)
        for g, v in budget.items():
            bud = F.when(F.col(by).eqNullSafe(F.lit(g)),
                         F.lit(int(v))).otherwise(bud)
    else:
        bud = F.lit(int(budget))
    return pre.filter(F.col("__pre") < bud).drop("__pre")


def mixture_weights_to_budgets(total_budget: int,
                               weights: dict) -> dict:
    """{group: token budget} — weights renormalized to sum 1, budgets
    rounded half-even (shared by the Spark path and the oracle SQL
    builder so the two sides cannot drift)."""
    tot = float(sum(weights.values()))
    if tot <= 0:
        raise ValueError("mixture weights must sum to a positive value")
    return {g: int(round(total_budget * w / tot))
            for g, w in weights.items()}


def mixture_budget_filter(
    df: DataFrame,
    total_budget: int,
    weights: dict,
    token_col: str,
    by: str,
    order_col: str = None,
    key_col: str = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Static data mixing (the DoReMi / Pile recipe shape): split a
    total token budget across ``by`` groups in proportion to target
    mixture ``weights`` and take each group's documents in ascending
    ``order_col`` until its share is filled (inclusive cut — each
    group lands at or just past its share, so the mix reaches the
    total instead of undershooting).

    Groups outside ``weights`` are filtered BEFORE the prefix-sum
    machinery (predicate pushes to the scan); the per-group cut reuses
    ``token_budget_filter``'s two-phase prefix sum, so no group ever
    funnels through a single task."""
    budgets = mixture_weights_to_budgets(total_budget, weights)
    pruned = df.filter(F.col(by).isin(list(budgets)))
    return token_budget_filter(pruned, budgets, token_col, by,
                               order_col=order_col, key_col=key_col,
                               n_buckets=n_buckets)


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    key_col: str,
    strata_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic hash sampling — the data-mixing form of
    ``hash_sample``: each ``strata_col`` value gets its own keep rate
    (e.g. ``{"en": 0.3, "de": 1.0}``; strata absent from ``fractions``
    use ``default_fraction``). Same md5 bucket arithmetic as
    ``hash_sample``, so samples are reproducible across runs,
    partitionings, and cluster sizes, and the same key keeps or drops
    atomically across strata-mates. Pure filter — no shuffle, no UDF."""
    from pyspark.sql import functions as F

    for v in list(fractions.values()) + [default_fraction]:
        if not 0.0 <= v <= 1.0:
            raise ValueError("fractions must be in [0, 1]")
    thr = F.lit(int(round(default_fraction * _DENOM)))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == stratum,
                     F.lit(int(round(frac * _DENOM)))).otherwise(thr)
    bucket = _hash_bucket(key_col, seed)
    return df.filter(bucket < thr)


def quantile_filter(
    df: DataFrame,
    value_col: str,
    by: str,
    q: float,
    keep: str = "ge",
    round_to: int = 4,
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Adaptive per-group threshold filter: keep rows whose ``value_col``
    is >= (``keep='ge'``) or <= (``'le'``) their group's exact
    interpolated ``q``-quantile — the "keep the top X% by quality /
    drop the top X% by perplexity PER LANGUAGE" primitive (fixed global
    thresholds misfire when score distributions differ per group).

    Physical shape: one aggregate computes every group's quantile, the
    per-group thresholds broadcast-join back, and the filter stays a
    pure Column predicate on the scan side. Thresholds are rounded to
    ``round_to`` (+1e-9 tie-break) so the comparison is reproducible in
    any engine (DuckDB ``quantile_cont`` uses the same interpolation as
    Spark ``percentile``).

    ``approx``: exact ``percentile`` buffers EVERY group value in the
    final aggregation buffer — O(group size) reducer memory, an OOM
    path when one language is most of a 100 TB corpus. ``approx=True``
    switches to ``approx_percentile`` (Greenwald-Khanna sketch, memory
    bounded by ``approx_accuracy`` regardless of group size) — the
    production default at scale; the exact variant stays the
    test-scale/oracle anchor (the sketch is engine-specific, so only
    the exact path is DuckDB-verifiable)."""
    if keep not in ("ge", "le"):
        raise ValueError("keep must be 'ge' or 'le'")
    pct = (F.approx_percentile(value_col, F.lit(q),
                               F.lit(approx_accuracy)) if approx
           else F.percentile(value_col, F.lit(q)))
    th = (df.groupBy(F.col(by).alias("__gk"))
          .agg(F.round(pct + 1e-9, round_to).alias("__th")))
    # NULL-SAFE join on the native group key: a plain equi-join would
    # silently DROP every NULL-group row instead of filtering it
    # against its own group's quantile (same contract as
    # token_budget_filter / temperature_sample; oracle uses
    # IS NOT DISTINCT FROM)
    joined = df.join(F.broadcast(th), F.col(by).eqNullSafe(F.col("__gk")))
    pred = (F.col(value_col) >= F.col("__th") if keep == "ge"
            else F.col(value_col) <= F.col("__th"))
    return joined.filter(pred).drop("__th", "__gk")


def score_buckets(
    df: DataFrame,
    value_col: str,
    by: str,
    cuts: tuple = (1.0 / 3, 2.0 / 3),
    labels: tuple = ("head", "middle", "tail"),
    round_to: int = 4,
    approx: bool = False,
    approx_accuracy: int = 10_000,
    bucket_col: str = "bucket",
) -> DataFrame:
    """CCNet-style per-group quantile bucketing (Wenzek et al. 2020):
    annotate every row with the bucket its ``value_col`` falls into
    under its OWN group's quantile cuts — the canonical web-text
    perplexity split ("head" = lowest LM perplexity third per language,
    "tail" = highest; CCNet trains on head+middle). Generic over any
    score: compose with ``functions/perplexity.py`` for the faithful
    CCNet pipeline, or any native signal for a fully-oracled path.

    ``cuts`` are strictly-increasing quantiles in (0, 1);
    ``labels`` has ``len(cuts) + 1`` entries, first label = lowest
    values. A NULL score gets a NULL bucket (it is NOT silently
    dumped into the last label — the naive CASE would do exactly
    that, since NULL comparisons are false-y in a WHEN chain).

    Physical shape is ``quantile_filter``'s: ONE aggregate computes
    every group's cut vector (|groups| rows), the tiny threshold table
    broadcast-joins back null-safely on the native group key, and the
    bucket label is a pure Column CASE on the scan side — no window
    over doc-keyed data, no per-group funnelling. ``approx`` swaps the
    exact interpolated ``percentile`` (O(group) reducer memory — the
    oracle anchor) for ``approx_percentile`` (Greenwald-Khanna,
    memory-bounded — the 100 TB path; CLAUDE.md rule 9)."""
    if len(labels) != len(cuts) + 1:
        raise ValueError("need len(cuts) + 1 labels")
    if list(cuts) != sorted(set(cuts)) or not all(0 < c < 1 for c in cuts):
        raise ValueError("cuts must be strictly increasing in (0, 1)")
    pcts = F.array(*[F.lit(float(c)) for c in cuts])
    pct = (F.approx_percentile(value_col, pcts, F.lit(approx_accuracy))
           if approx else F.percentile(value_col, pcts))
    th = (df.groupBy(F.col(by).alias("__gk"))
          .agg(*[F.round(F.element_at(pct, i + 1) + 1e-9, round_to)
                 .alias(f"__th{i}") for i in range(len(cuts))]))
    joined = df.join(F.broadcast(th), F.col(by).eqNullSafe(F.col("__gk")))
    expr = F.when(F.col(value_col).isNull(), F.lit(None))
    for i, lab in enumerate(labels[:-1]):
        expr = expr.when(F.col(value_col) <= F.col(f"__th{i}"),
                         F.lit(lab))
    expr = expr.otherwise(F.lit(labels[-1]))
    return (joined.withColumn(bucket_col, expr)
            .drop("__gk", *[f"__th{i}" for i in range(len(cuts))]))


def temperature_sample(
    df: DataFrame,
    total_budget: int,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-based mixture sampling (the XLM-R / mT5 multilingual
    rule): stratum ``l`` with ``c_l`` docs gets a target share
    ``c_l^alpha / sum_k c_k^alpha`` of ``total_budget`` docs —
    ``alpha=1`` keeps natural proportions, ``alpha→0`` flattens toward
    uniform, upweighting low-resource strata. Per-stratum keep fraction
    = min(1, target / c_l), applied with the same deterministic md5
    bucket arithmetic as ``hash_sample`` (reproducible at any cluster
    size; engine-portable, so a SQL oracle can replay the EXACT row
    set).

    Physical shape: one partial-agg count per stratum (tiny), fractions
    derived on that tiny table, broadcast back, pure filter on the scan
    side — no shuffle of the corpus. Fractions are rounded to
    ``round_to`` (+1e-9) before thresholding so cross-engine pow()
    1-ulp differences cannot flip a keep decision."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    counts = (df.groupBy(F.col(strata_col).alias("__s"))
              .agg(F.count(F.lit(1)).alias("__c")))
    # the normalizer is a window over the TINY counts table (one row per
    # stratum) — a separate counts.agg() would embed the corpus-wide
    # count aggregation twice in the plan (one extra full scan)
    wz = Window.partitionBy()
    z = F.sum(F.pow(F.col("__c"), F.lit(alpha))).over(wz)
    frac = F.least(
        F.lit(1.0),
        F.lit(float(total_budget)) * F.pow(F.col("__c"), F.lit(alpha))
        / z / F.col("__c"))
    # double round: the inner round pins the fraction at round_to
    # decimals; the outer snaps fraction*1e6 to the nearest integer so
    # float-representation dust (0.123456*1e6 = 123455.9999…) cannot
    # truncate differently across engines
    thresholds = counts.select(
        "__s",
        F.round(F.round(frac + 1e-9, round_to) * _DENOM, 0)
        .cast("long").alias("__thr"))
    bucket = _hash_bucket(key_col, seed)
    return (df.join(F.broadcast(thresholds),
                    F.col(strata_col).eqNullSafe(F.col("__s")))
            .filter(bucket < F.col("__thr"))
            .drop("__s", "__thr"))


def cap_per_group(
    df: DataFrame,
    by: str,
    n: int,
    order_col: str,
    key_col: str = None,
    descending: bool = True,
) -> DataFrame:
    """Keep at most ``n`` rows per ``by`` group, best-first by
    ``order_col`` (ties broken by ``key_col``) — the RefinedWeb-style
    per-domain quota that stops any single site from dominating the
    corpus. One window row_number per group; group cardinality is the
    parallelism (domains are numerous at web scale — no hot-partition
    hazard; for a pathological single-group input use
    ``token_budget_filter``'s bucketed shape instead)."""
    # NULLs rank LAST in both directions (desc is NULLS LAST natively;
    # plain asc would be NULLS FIRST and let NULL rows eat the quota)
    order = [F.desc(order_col) if descending
             else F.asc_nulls_last(order_col)]
    if key_col:
        order.append(F.col(key_col))
    w = Window.partitionBy(by).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__rn"))


def score_weighted_sample(
    df: DataFrame,
    score_col: str,
    key_col: str,
    seed: int = 42,
    scale: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Soft quality filtering: keep each doc with probability
    ``clamp(score * scale, 0, 1)`` — deterministically, via the same
    md5 hash-bucket contract as ``hash_sample`` (keep iff
    ``bucket < round(clamped_score * 1e6)``).

    A hard threshold (CLASSIFIER rule / ``quantile_filter``) discards
    every mid-quality doc and keeps every just-above-threshold one;
    sampling proportional to the classifier score keeps the corpus
    quality-weighted while retaining diversity from the middle of the
    distribution (the CCNet/RedPajama-style soft alternative). NULL
    scores sample at probability 0 (dropped). ``scale`` rebalances the
    expected keep rate without retraining the scorer.

    The decision is a pure row-local function of (key, seed, score) —
    no shuffle, stable under repartitioning/joins/re-runs, and the
    exact row set replays in any engine with md5. The score is rounded
    to ``round_to`` before thresholding so engines that disagree in the
    last ulp still pick identical rows."""
    if scale < 0:
        raise ValueError(f"scale must be >= 0, got {scale}")
    p = F.round(F.col(score_col).cast("double") * F.lit(float(scale))
                + F.lit(1e-9), round_to)
    p = F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0))
    thr = F.round(p * _DENOM).cast("long")
    return df.filter(_hash_bucket(key_col, seed) < thr)
