"""The fused UDF-tier pass — ONE Arrow round-trip for every Python-side
signal (SURVEY.md §7 step 4: "One mapInPandas pass evaluates all UDF-tier
rules per partition — the UDF-side analogue of the merger").

A single pandas UDF takes (text, native_drop) and returns a struct
``(ppl double, pii boolean, scrubbed string)``:

- perplexity: batch-vectorized char-bigram scorer;
- pii hit flag: evaluated for every doc (the PII_SCRUB rule's metric);
- scrubbed text: computed ONLY for kept docs (native rules passed and
  ppl under threshold) — dropped docs skip the expensive regex
  substitutions entirely.

Compared to three separate pandas UDFs this saves two Arrow
serializations of the text column and two Python worker chains per task
— the dominant cost of the UDF tier at scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from validatelite_spark.functions.perplexity import perplexity_series
from validatelite_spark.functions.pii import hit_series, scrub_series

FUSED_SCHEMA = T.StructType([
    T.StructField("ppl", T.DoubleType()),
    T.StructField("pii", T.BooleanType()),
    T.StructField("scrubbed", T.StringType()),
])


def fused_text_eval(text: Column, native_drop: Column,
                    max_ppl: float, ppl_drops: bool = True) -> Column:
    """Struct column (ppl, pii, scrubbed) in one vectorized pass.

    ``ppl_drops``: whether the PERPLEXITY rule is a *dropping* rule (its
    severity is in drop_severities). When False, a doc with ppl > max_ppl
    is still kept — so the scrub must still run for it; folding the ppl
    threshold into the internal keep unconditionally would silently NULL
    the scrub output for kept docs."""

    @F.pandas_udf(FUSED_SCHEMA)
    def _eval(s: pd.Series, drop: pd.Series) -> pd.DataFrame:
        ppl = perplexity_series(s)
        pii = hit_series(s)
        keep = ~drop.fillna(True).astype(bool)
        if ppl_drops:
            keep &= ppl <= max_ppl
        scrubbed = pd.Series([None] * len(s), index=s.index, dtype="object")
        # kept docs with NO pattern hit scrub to themselves — skip the
        # substitution passes for them (byte-identical by definition)
        clean = keep & ~pii
        scrubbed[clean] = s[clean].astype("object")
        dirty = keep & pii
        if dirty.any():
            scrubbed[dirty] = scrub_series(s[dirty]).astype("object")
        return pd.DataFrame({"ppl": ppl, "pii": pii, "scrubbed": scrubbed})

    return _eval(text, native_drop)
