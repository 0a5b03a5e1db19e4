#!/usr/bin/env python3
"""Cluster entrypoint for end-to-end corpus curation.

Submitted via ``scripts/submit_job.sh`` (swap the job path), or run
directly for local smoke tests. The full training-data chain over a
Common-Crawl-shaped table (BASELINE.json input_hint — url/text/lang):

1. canonical-URL dedup (``operators/dedup.url_dedup``) when the input
   has a ``url`` column — the crawl pipeline's first dedup stage;
2. exact-dedup → quality-filter → per-language token budget
   (``pipeline/curation.curate`` — dedup runs physically first, see
   its commutation note);
3. write the selected corpus + a one-row summary table.

Args: INPUT OUTPUT TOKEN_BUDGET [allowed_langs csv] [key_col]
      [lang_col] [token_col]

``token_col`` defaults to ``n_chars`` when present, else a
whitespace token count is derived. ``key_col`` defaults to ``url``
when present (input_hint shape), else the first column.
"""

from __future__ import annotations

import os
import sys

# direct `python jobs/curate_job.py` from anywhere: make the repo
# importable (spark-submit ships the package zip via --py-files instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    input_path, output_path = sys.argv[1], sys.argv[2]
    token_budget = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    langs = tuple((sys.argv[4] if len(sys.argv) > 4 else "en").split(","))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("vlite-spark-curate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from validatelite_spark.functions.textquality import token_count
    from validatelite_spark.operators.dedup import url_dedup
    from validatelite_spark.pipeline.curation import curate
    from validatelite_spark.sources.reader import read_source

    df = read_source(spark, input_path)
    key_col = (sys.argv[5] if len(sys.argv) > 5
               else "url" if "url" in df.columns else df.columns[0])
    lang_col = sys.argv[6] if len(sys.argv) > 6 else "lang"
    token_col = (sys.argv[7] if len(sys.argv) > 7
                 else "n_chars" if "n_chars" in df.columns else "__tokens")

    n_in = df.count()
    if "url" in df.columns:
        df = url_dedup(df, "url", key_col)
    if token_col == "__tokens":
        df = df.withColumn("__tokens", token_count(F.col("text")))

    out = curate(spark, df, token_budget, text_col="text",
                 key_col=key_col, lang_col=lang_col,
                 token_col=token_col, allowed_langs=langs)
    out = out.drop("__tokens")
    out.write.mode("overwrite").parquet(output_path)

    kept = spark.read.parquet(output_path).count()
    print(f"[curate] kept {kept}/{n_in} docs (budget {token_budget} "
          f"per lang in {langs})")
    spark.createDataFrame(
        [(n_in, kept, token_budget, ",".join(langs))],
        "docs_in long, docs_kept long, token_budget long, langs string"
    ).write.mode("overwrite").parquet(output_path.rstrip("/") + "_summary")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
