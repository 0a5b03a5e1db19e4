"""Join operators Spark's API lacks, composed scale-safe.

- **as-of join** (merge-asof): for every left row, the latest right row
  with ``right.ts <= left.ts`` within the same key. Spark has no native
  ASOF; the naive encoding (non-equi range join + groupBy max) explodes
  quadratically on hot keys. This implementation is the linear shape:
  union both sides, ONE shuffle on the key, sort within partitions, and
  a running ``last(right, ignorenulls=True)`` window carries the most
  recent right row forward onto each left row. Cost is a single
  sort-shuffle of |L|+|R| rows at any scale. Skewed keys: pass
  ``salt=N`` — left rows scatter across N sub-partitions of their key
  (deterministic hash) while the right side replicates into every
  sub-partition, so each sub-partition sees the FULL right history and
  1/N of the left rows; output is identical to unsalted at N× right-side
  duplication (the standard replicate-small-side skew trade).

- **range join** (point-in-interval): naive Spark turns
  ``l.x BETWEEN r.start AND r.end`` into BroadcastNestedLoopJoin (or a
  full cartesian when neither side broadcasts) — O(|L|·|R|) at scale.
  ``range_join`` buckets the number line: each right interval explodes
  to the fixed-width buckets it covers, each left point lands in
  exactly ONE bucket, and the equi-join on (key, bucket) + exact
  predicate recovers the precise result. Each (l, r) pair meets at most
  once (the point's single bucket), so no dedup pass. Pick
  ``bucket_width`` ≈ the typical interval length: cost is
  |L| + |R|·(avg_span/width) shuffled rows.

- **interval join** (interval × interval overlap): same bucketing; a
  pair sharing many buckets is emitted once via the owner-bucket rule
  (the bucket of ``max(start_l, start_r)``) — no dedup pass.

DuckDB is the oracle for the driver queries (__spark_entry__.py):
asof_purchase_click / asof_forward_click via native ASOF JOIN (>= and
<=), asof_nearest_click via two composed ASOFs, range_signup_purchase
and interval_overlap via plain inequality joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "right_",
    tiebreak: str | None = None,
    salt: int = 1,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (pandas ``merge_asof`` semantics, all directions).

    Output: every left row + the columns of the matched right row with
    the same ``by`` key, prefixed with ``right_prefix`` (NULL columns
    when nothing matches). ``direction``:

    - ``"backward"`` (default): latest right with ``right_ts <=
      left_ts`` — among equal-timestamp rights the MAX ``tiebreak``
      wins;
    - ``"forward"``: earliest right with ``right_ts >= left_ts`` —
      among equal-timestamp rights the MIN ``tiebreak`` wins (the
      mirror convention);
    - ``"nearest"``: whichever of the two is closer in time; exact ties
      go to the backward match (pandas convention).

    All three run on ONE shuffle of |L|+|R| rows: forward is the same
    running-``last`` carry as backward over the reverse sort order, and
    nearest evaluates both windows on the same exchange (two sorts, one
    shuffle). ``tiebreak``: a right column in its native type.
    ``salt``: split each key's window into this many sub-partitions when
    one key dominates the input (see module docstring) — results are
    identical for any salt value."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = left.columns
    rcols = right.columns
    # a NULL timestamp satisfies no inequality in ANY direction: NULL-ts
    # right rows can never be matches (drop them before the carry —
    # otherwise NULLS-FIRST/LAST sort placement smuggles them into the
    # running last()), and NULL-ts left rows get NULL match columns in
    # the final projection below
    right = right.filter(F.col(right_ts).isNotNull())
    # tiebreak sorts in its NATIVE type: a cast (e.g. string id → long)
    # would NULL out non-numeric ids and silently drop the deterministic
    # tie-break (ADVICE r2); the left side carries a NULL of that type
    tb_type = (right.schema[tiebreak].dataType if tiebreak else "long")
    l = left.select(
        F.col(by).alias("__by"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_l"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(
            right.select(F.struct(*rcols).alias("s")).schema["s"].dataType
        ).alias("__r"))
    r = right.select(
        F.col(by).alias("__by"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_l"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        (F.col(tiebreak) if tiebreak
         else F.lit(0).cast("long")).alias("__tb"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"))
    # right rows sort BEFORE left at the same timestamp (__is_l 0 < 1)
    # so an equal-ts right row is visible to the left row (inclusive);
    # among equal-ts right rows the max tiebreak wins (last in order)
    part_cols = ["__by"]
    if salt > 1:
        # deterministic scatter of LEFT rows; right history replicates
        # into every sub-partition so each one is self-contained
        l = l.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("__l")), F.lit(salt)))
        r = r.withColumn(
            "__salt",
            F.explode(F.array(*[F.lit(i) for i in range(salt)])))
        part_cols.append("__salt")
    w_b = (Window.partitionBy(*part_cols)
           .orderBy(F.col("__ts").asc(), F.col("__is_l").asc(),
                    F.col("__tb").asc())
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # forward = the identical running-last carry over the REVERSE scan:
    # ts desc; right still sorts before left at equal ts (inclusive);
    # tb desc so the last-seen equal-ts right is the MIN tiebreak.
    # desc_nulls_first: a NULL tiebreak must be scanned FIRST (= lose
    # equal-ts ties) exactly as asc NULLS FIRST makes it lose in the
    # backward scan — plain desc would scan it last and win (ADVICE r3)
    w_f = (Window.partitionBy(*part_cols)
           .orderBy(F.col("__ts").desc(), F.col("__is_l").asc(),
                    F.col("__tb").desc_nulls_first())
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = l.unionByName(r)
    if direction == "backward":
        u = u.withColumn("__rm", F.last("__r", ignorenulls=True).over(w_b))
    elif direction == "forward":
        u = u.withColumn("__rm", F.last("__r", ignorenulls=True).over(w_f))
    else:  # nearest: both carries share the single exchange
        u = (u.withColumn("__rb", F.last("__r", ignorenulls=True).over(w_b))
             .withColumn("__rf", F.last("__r", ignorenulls=True).over(w_f)))
        back_ts = F.col(f"__rb.{right_ts}")
        fwd_ts = F.col(f"__rf.{right_ts}")
        u = u.withColumn(
            "__rm",
            F.when(F.col("__rb").isNull(), F.col("__rf"))
            .when(F.col("__rf").isNull(), F.col("__rb"))
            .when(F.col("__ts") - back_ts <= fwd_ts - F.col("__ts"),
                  F.col("__rb"))          # exact tie → backward (pandas)
            .otherwise(F.col("__rf")))
    matched = u.filter(F.col("__is_l") == 1)
    out = [F.col(f"__l.{c}").alias(c) for c in lcols]
    # NULL-ts left rows match nothing (their window position is a sort
    # artifact, not a comparison result)
    out += [F.when(F.col("__ts").isNotNull(), F.col(f"__rm.{c}"))
            .alias(f"{right_prefix}{c}") for c in rcols]
    return matched.select(*out)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    by: str | None = None,
    right_prefix: str = "right_",
    inclusive_end: bool = False,
) -> DataFrame:
    """Point-in-interval join: left rows matched to every right row with
    ``right_start <= left_point < right_end`` (``<=`` end when
    ``inclusive_end``), optionally also keyed on ``by``.

    Physical shape: right intervals posexplode into the integer buckets
    ``floor(start/w) .. floor(end/w)``; left points map to their single
    bucket; Catalyst runs a plain shuffled equi-join on (by, bucket) and
    the exact range predicate filters inside the join — never a nested-
    loop/cartesian plan. Range columns must be numeric (cast timestamps
    to epoch seconds first)."""
    w = float(bucket_width)
    lcols, rcols = left.columns, right.columns
    # right columns are renamed up front so a self-join (both sides
    # derived from the same DataFrame) never hits ambiguous-column refs
    p = right_prefix
    lb = left.select(
        *[F.col(c) for c in lcols],
        F.floor(F.col(left_point) / F.lit(w)).cast("long").alias("__lb"))
    rb = right.select(
        *[F.col(c).alias(f"{p}{c}") for c in rcols],
        F.explode(F.sequence(
            F.floor(F.col(right_start) / F.lit(w)).cast("long"),
            F.floor(F.col(right_end) / F.lit(w)).cast("long")))
        .alias("__rb"))
    cond = F.col("__lb") == F.col("__rb")
    if by is not None:
        cond = cond & (F.col(by) == F.col(f"{p}{by}"))
    pt, start, end = (F.col(left_point), F.col(f"{p}{right_start}"),
                      F.col(f"{p}{right_end}"))
    return (lb.join(rb, cond)
            .filter((pt >= start) & ((pt <= end) if inclusive_end
                                     else (pt < end)))
            .select(*lcols, *[f"{p}{c}" for c in rcols]))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    by: str | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """Interval-overlap join: every (l, r) pair with
    ``l.start < r.end AND r.start < l.end`` (strict overlap, the
    standard half-open convention), optionally also keyed on ``by``.

    Physical shape: both sides posexplode into the fixed-width integer
    buckets their interval covers; Catalyst runs a plain shuffled
    equi-join on (key, bucket). A pair overlaps in possibly MANY shared
    buckets — instead of a dedup pass, each pair is counted exactly once
    by the OWNER-BUCKET rule: the pair belongs to the bucket containing
    ``max(l.start, r.start)`` (the start of the overlap region), which
    both sides cover by construction. Cost is
    |L|·(span/width) + |R|·(span/width) shuffled rows and no
    nested-loop/cartesian plan; pick ``bucket_width`` ≈ the typical
    interval length. Range columns must be numeric."""
    w = float(bucket_width)
    lcols, rcols = left.columns, right.columns
    p = right_prefix
    lb = left.select(
        *[F.col(c) for c in lcols],
        F.explode(F.sequence(
            F.floor(F.col(left_start) / F.lit(w)).cast("long"),
            F.floor(F.col(left_end) / F.lit(w)).cast("long")))
        .alias("__lb"))
    rb = right.select(
        *[F.col(c).alias(f"{p}{c}") for c in rcols],
        F.explode(F.sequence(
            F.floor(F.col(right_start) / F.lit(w)).cast("long"),
            F.floor(F.col(right_end) / F.lit(w)).cast("long")))
        .alias("__rb"))
    cond = F.col("__lb") == F.col("__rb")
    if by is not None:
        cond = cond & (F.col(by) == F.col(f"{p}{by}"))
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(f"{p}{right_start}"), F.col(f"{p}{right_end}")
    owner = F.floor(F.greatest(ls, rs) / F.lit(w)).cast("long")
    return (lb.join(rb, cond)
            .filter((ls < re_) & (rs < le)
                    & (F.col("__lb") == owner))
            .select(*lcols, *[f"{p}{c}" for c in rcols]))
