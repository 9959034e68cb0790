#!/usr/bin/env python
"""NER inference launch entrypoint (notebook cells 8-13 as a batch job):

    cd /root/repo && zip -qr /tmp/ner_app_spark.zip ner_app_spark
    spark-submit --master local[32] --py-files /tmp/ner_app_spark.zip \
        jobs/run_ner.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/ner_out [--artifact-root DIR --artifact-id ID]

Reads a documents table (doc_id, text), runs the batched
mapInPandas NER stage, and writes (doc_id, entity_group, word, score)
to a parquet sink. With --artifact-root/--artifact-id, model weights are
loaded from the content-addressed artifact store (plans/artifacts.py)
and shipped to executors via addFile — the production path real
checkpoint weights take (`--archives` being the spark-submit-native
equivalent)."""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", help="entity parquet sink (omit = count only)")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--parts", type=int, default=None)
    ap.add_argument("--artifact-root", help="model artifact store root")
    ap.add_argument("--artifact-id", help="content address of the model")
    args = ap.parse_args()
    if bool(args.artifact_root) != bool(args.artifact_id):
        ap.error("--artifact-root and --artifact-id go together")

    from ner_app_spark.operators.ner import ner_entities
    from ner_app_spark.session import get_session

    spark = get_session(app_name="ner-inference")
    t0 = time.monotonic()
    aid = None
    if args.artifact_root:
        from ner_app_spark.plans.artifacts import ship_artifact

        aid = ship_artifact(spark, args.artifact_root, args.artifact_id)
    docs = spark.read.parquet(args.input)
    ents = ner_entities(
        docs,
        text_col=args.text_col,
        id_col=args.id_col,
        num_partitions=args.parts,
        model_artifact_id=aid,
    )
    if args.output:
        ents.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = ents.count()
    wall = round(time.monotonic() - t0, 3)
    print(json.dumps({
        "wall_sec": wall,
        "entities": n,
        "entities_per_sec": round(n / wall, 2) if wall else None,
        "model_artifact": aid,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
