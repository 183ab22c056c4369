"""spark-submit entry point for the corpus-hygiene stage: extracted
articles → training-corpus funnel + near-dup candidate pairs +
benchmark decontamination + deterministic sample manifest.

Runs downstream of extract_job.py over its articles/ output (or any table
with (doc_id, source, text) columns — pass --text-col/--source-col to
remap).  Cluster deployment mirrors extract_job.py:

    spark-submit --py-files dist/go_readability_spark.zip \
        jobs/hygiene_job.py \
        --input <articles root or documents table> \
        --output <output root: url_filter_verdicts/ funnel/ dup_pairs/
                  dup_groups/ keep_manifest/ split_manifest/ clean_corpus/
                  host_clean_corpus/ shaping_funnel/ contaminated/
                  sample_manifest/ scrubbed_corpus/ mixture_manifest/>

Local smoke run:

    python jobs/hygiene_job.py --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/hygiene --local-cpus 8
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--skip-groups", action="store_true",
                    help="skip connected-components grouping (pairs only)")
    ap.add_argument("--mixture-budget", type=int, default=None,
                    help="flat per-source token budget for mixture_manifest/")
    ap.add_argument("--local-cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from go_readability_spark.textops.dedup import (
        block_removal_clean,
        canonical_keep,
        dedup_groups,
        lsh_candidate_pairs,
    )
    from go_readability_spark.textops.domains import (
        corpus_shaping_funnel,
        host_boilerplate_clean,
        split_assignments,
    )
    from go_readability_spark.textops.pii import scrub_pii_col
    from go_readability_spark.textops.textstats import (
        MIXTURE_BASE_BUDGET,
        corpus_mixture,
        decontaminate,
        stratified_sample,
        training_corpus_funnel,
    )
    from go_readability_spark.textops.urls import url_filter

    if args.local_cpus:
        from go_readability_spark.spark.session import build_session

        spark = build_session(cpus=args.local_cpus, app_name="hygiene-job")
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("hygiene-job").getOrCreate()

    docs = spark.read.parquet(args.input).select(
        "doc_id",
        F.col(args.source_col).alias("source"),
        F.col(args.text_col).alias("text"),
    )

    # URL-filter verdicts (UT1-style blocklist + path-keyword gate) — in a
    # crawl pipeline this manifest gates the frontier BEFORE fetch; here it
    # is emitted alongside the content gates so downstream stages can
    # anti-join blocked docs out.  The synthetic fetch-URL derivation needs
    # a numeric doc_id (the testdata shape); over an articles table with
    # string ids a real corpus would carry its own url column instead.
    from pyspark.sql.types import NumericType

    if isinstance(docs.schema["doc_id"].dataType, NumericType):
        url_filter(docs).write.mode("overwrite").parquet(
            os.path.join(args.output, "url_filter_verdicts")
        )
    else:
        print("hygiene: skipping url_filter_verdicts (non-numeric doc_id, no url column)")

    funnel = training_corpus_funnel(docs)
    funnel.write.mode("overwrite").parquet(os.path.join(args.output, "funnel"))

    pairs = lsh_candidate_pairs(docs)
    pairs.write.mode("overwrite").parquet(os.path.join(args.output, "dup_pairs"))

    if not args.skip_groups:
        groups = dedup_groups(docs).persist()
        groups.write.mode("overwrite").parquet(os.path.join(args.output, "dup_groups"))
        # survivor manifest: keep=1 rows ARE the retained set inside each
        # duplicate group (groups reused, CC runs once)
        canonical_keep(docs, groups=groups).write.mode("overwrite").parquet(
            os.path.join(args.output, "keep_manifest")
        )
        # dedup-aware split manifest: buckets keyed on the GROUP id so
        # near-dup twins never straddle a train/eval boundary (same
        # persisted groups frame — CC still runs once)
        split_assignments(docs, groups=groups).write.mode("overwrite").parquet(
            os.path.join(args.output, "split_manifest")
        )
        groups.unpersist()

    # substring-dedup rewrite: the corpus with corpus-duplicated 8-word
    # blocks deleted (Lee et al. ExactSubstr, block-granular)
    block_removal_clean(docs).write.mode("overwrite").parquet(
        os.path.join(args.output, "clean_corpus")
    )

    # per-host template cleanup + the shaping-funnel report (boilerplate
    # removal → quality gates on the CLEANED text → per-host caps)
    host_boilerplate_clean(docs).write.mode("overwrite").parquet(
        os.path.join(args.output, "host_clean_corpus")
    )
    corpus_shaping_funnel(docs).write.mode("overwrite").parquet(
        os.path.join(args.output, "shaping_funnel")
    )

    # benchmark decontamination (broadcast probe set) + the reproducible
    # per-source sample manifest — the remaining gates a training pipeline
    # applies before corpus assembly
    decontaminate(docs).write.mode("overwrite").parquet(
        os.path.join(args.output, "contaminated")
    )
    stratified_sample(docs).write.mode("overwrite").parquet(
        os.path.join(args.output, "sample_manifest")
    )

    # PII-redacted corpus (emails/IPs/phones -> class tokens) and the
    # per-source mixture manifest — real corpora pass their own weights
    # table; the flat default budget here is the job-level knob
    docs.select(
        "doc_id", "source", scrub_pii_col(F.col("text")).alias("text")
    ).write.mode("overwrite").parquet(os.path.join(args.output, "scrubbed_corpus"))
    budget = (
        args.mixture_budget
        if args.mixture_budget is not None  # 0 is a legal explicit budget
        else 2 * MIXTURE_BASE_BUDGET
    )
    corpus_mixture(docs, budget=F.lit(budget)).write.mode("overwrite").parquet(
        os.path.join(args.output, "mixture_manifest")
    )

    n_funnel = spark.read.parquet(os.path.join(args.output, "funnel")).count()
    n_pairs = spark.read.parquet(os.path.join(args.output, "dup_pairs")).count()
    n_cont = spark.read.parquet(os.path.join(args.output, "contaminated")).count()
    print(
        f"hygiene: {n_funnel} funnel rows, {n_pairs} candidate pairs, "
        f"{n_cont} contaminated docs -> {args.output}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
