#!/usr/bin/env python
"""Corpus-curation launch entrypoint — the end-to-end training-data
shape: quality + repetition gate -> (optional) benchmark
decontamination -> (optional) PII redaction -> near-dup keeper
selection -> (optional) deterministic downsample -> stable
train/val/test split -> per-split parquet.

    cd /root/repo && zip -qr /tmp/ner_app_spark.zip ner_app_spark
    spark-submit --master local[32] --py-files /tmp/ner_app_spark.zip \
        jobs/run_curation.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/curated [--min-quality 0.5] [--min-jaccard 0.3] \
        [--sample 0.5] [--decontam <eval docs parquet>] [--strip-pii] \
        [--max-dup-line-frac 0.5] [--max-top2gram-frac 0.5] \
        [--max-dup-span-frac 0.5 [--dup-span-ngram 8]]

Every stage is deterministic, so re-running the job over the same input
reproduces the identical curated corpus (and over a GROWN input, every
previously-kept doc keeps its split — operators/sampling.py). The sink
is partitioned by split, so downstream training readers scan only their
partition."""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="curated corpus sink dir")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--min-jaccard", type=float, default=0.3,
                    help="near-dup verification threshold")
    ap.add_argument("--sample", type=float, default=None,
                    help="optional deterministic downsample fraction")
    ap.add_argument("--decontam", default=None,
                    help="eval/benchmark docs parquet: drop training docs "
                         "sharing a verbatim 13-gram with it")
    ap.add_argument("--decontam-ngram", type=int, default=13)
    ap.add_argument("--strip-pii", action="store_true",
                    help="redact email/phone/IPv4 matches in kept text")
    ap.add_argument("--max-dup-line-frac", type=float, default=0.5,
                    help="drop docs whose duplicate-line fraction exceeds this")
    ap.add_argument("--max-top2gram-frac", type=float, default=0.5,
                    help="drop docs whose top-2-gram token-mass fraction "
                         "exceeds this")
    ap.add_argument("--max-dup-span-frac", type=float, default=None,
                    help="drop docs whose cross-document duplicated-span "
                         "fraction (verbatim --dup-span-ngram-gram window "
                         "starts shared with >=1 other doc) exceeds this")
    ap.add_argument("--dup-span-ngram", type=int, default=8)
    args = ap.parse_args()

    from ner_app_spark.operators.decontam import decontaminate, eval_shingle_dim
    from ner_app_spark.operators.dedup import dup_span_fraction
    from ner_app_spark.operators.graphalgo import dup_clusters
    from ner_app_spark.operators.pii import redact_pii
    from ner_app_spark.operators.sampling import hash_sample, hash_split
    from ner_app_spark.operators.textquality import quality_score
    from ner_app_spark.session import get_session

    spark = get_session(app_name="curation")
    t0 = time.monotonic()
    docs = spark.read.parquet(args.input)
    n_input = docs.count()

    # 1. quality + repetition gate (cheap, runs first so dedup never
    # hashes junk; the Gopher-class repetition signals gate here too)
    q = quality_score(docs).filter(
        (F.col("quality") >= args.min_quality)
        & (F.col("dup_line_frac") <= args.max_dup_line_frac)
        & (F.col("top2gram_frac") <= args.max_top2gram_frac)
    )
    gated = docs.join(q.select("doc_id"), "doc_id", "left_semi")

    # 2. optional benchmark decontamination (broadcast eval shingle dim)
    n_decontaminated = None
    if args.decontam:
        ev = eval_shingle_dim(
            spark.read.parquet(args.decontam), n=args.decontam_ngram
        )
        flags = decontaminate(gated, ev, n=args.decontam_ngram)
        clean_ids = flags.filter(~F.col("contaminated")).select("doc_id")
        before = gated.count()
        gated = gated.join(clean_ids, "doc_id", "left_semi")
        n_decontaminated = before - gated.count()

    # 2b. optional substring-level dedup gate (Lee et al.): drop docs
    # whose cross-document verbatim-span mass is too high — catches the
    # partially-copied pages document-level LSH scores below threshold
    n_span_dropped = None
    if args.max_dup_span_frac is not None:
        frac = dup_span_fraction(gated, n=args.dup_span_ngram)
        keep_ids = frac.filter(
            F.col("dup_frac_micros") <= int(args.max_dup_span_frac * 1_000_000)
        ).select("doc_id")
        before = gated.count()
        gated = gated.join(keep_ids, "doc_id", "left_semi")
        n_span_dropped = before - gated.count()

    # 3. near-dup keeper selection (LSH -> verify -> CC -> one per cluster)
    keepers = dup_clusters(gated, min_jaccard=args.min_jaccard).filter(
        "is_keeper"
    )
    kept = gated.join(keepers.select("doc_id"), "doc_id", "left_semi")

    # 4. optional deterministic downsample
    if args.sample is not None:
        kept = hash_sample(kept, args.sample)

    # 5. optional PII redaction of the surviving text
    if args.strip_pii:
        kept = redact_pii(kept)

    # 6. stable split + per-split sink
    out = kept.join(hash_split(kept).select("doc_id", "split"), "doc_id")
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)

    back = spark.read.parquet(args.output)
    by_split = {
        r["split"]: r["n"]
        for r in back.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    wall = round(time.monotonic() - t0, 3)
    print(json.dumps({
        "wall_sec": wall,
        "input_docs": n_input,
        "decontam_dropped": n_decontaminated,
        "dup_span_dropped": n_span_dropped,
        "quality_kept": gated.count(),
        "dedup_kept": int(sum(by_split.values())) if args.sample is None else None,
        "written": int(sum(by_split.values())),
        "by_split": by_split,
        "docs_per_sec": round(n_input / wall, 2) if wall else None,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
