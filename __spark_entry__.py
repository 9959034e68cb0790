"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in the ``ner_app_spark`` package; this module is the
thin contract adapter. Operator coverage: SURVEY.md §2 (KG pipeline ops)
plus the training-data family (dedup / similarity / text quality /
multimodal plumbing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ner_app_spark.oracles import oracle_sql_map
from ner_app_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's POST / analyze path at small scale —
    pages -> byte-identical extract -> mapInPandas phrase extraction ->
    triple emission (SURVEY.md §3.1), on the deterministic synthetic pages
    table pinned to sf0.001."""
    from ner_app_spark.operators.extract import (
        extract_phrases_and_triples,
        fused_triples,
    )
    from ner_app_spark.sources.pages import synth_pages_df

    pages = synth_pages_df(spark, 60)
    # production shape: ONE fused Arrow-batch stage emits phrases AND
    # triples (per-doc local); no shuffle between the two
    return fused_triples(extract_phrases_and_triples(pages, num_partitions=8))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family (SURVEY.md §2)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (46 of 50;
    kg_phrases / kg_triples gained full independent SQL replays of the
    analyze pipeline in round 4). Intentionally absent (rows-only): the
    4 genuinely non-SQL rows — kg_extracted_text (binary html decode),
    kg_links / kg_canonical (iterative linking + connected components),
    multimodal_features (binary payloads). Each of the 4 embeds its OWN
    in-query oracle comparison with a raise_error branch (byte-identity,
    exact-probe/threshold, CC invariants, payload-recompute), so each can
    go RED, not just rows-only-pass."""
    return oracle_sql_map()
