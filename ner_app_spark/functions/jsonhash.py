"""Canonical-JSON content addressing (S2/F7 parity).

Reproduces the reference's analysis-file identity exactly
(/root/reference/src/services/text_service.py:8-11):
``md5(utf8(json.dumps(data, sort_keys=True, ensure_ascii=False)))``.
Spark's ``to_json`` neither sorts keys nor matches Python's separator
style, so the canonical form is a vectorized pandas UDF (one Python pass
per Arrow batch — never per-row Python).

Used by ``analysis_sink`` (plans/pipeline.py): the distributed analog of
the reference's write-iff-absent analysis JSON sink
(/root/reference/src/routers/api.py:22-29) — each document's analysis
payload is written to ``analysis_{md5}.json`` only when absent, executor-
side, so re-running the pipeline re-writes nothing (idempotent resume at
file granularity, the primitive §4.3 generalizes per-partition).
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def canonical_json(data) -> str:
    """json.dumps with the reference's exact knobs (text_service.py:9)."""
    return json.dumps(data, sort_keys=True, ensure_ascii=False)


def json_hash(data) -> str:
    """text_service.get_json_hash: md5 of the canonical utf-8 form."""
    return hashlib.md5(canonical_json(data).encode("utf-8")).hexdigest()


@F.pandas_udf(StringType())
def canonical_json_udf(col: pd.Series) -> pd.Series:
    """Struct/map column -> canonical JSON string. Arrow hands a STRUCT
    column to a pandas UDF as a pandas DataFrame (one column per field) —
    the annotation says Series for eval-type inference; the runtime check
    below handles the DataFrame form."""
    if isinstance(col, pd.DataFrame):
        return pd.Series(
            [canonical_json(rec) for rec in col.to_dict("records")],
            index=col.index,
        )

    def conv(v):
        if v is None:
            return None
        if hasattr(v, "asDict"):
            v = v.asDict(recursive=True)
        return canonical_json(v)

    return col.map(conv)


def content_address(struct_col):
    """Column expr: md5(canonical_json(struct)) — the reference's
    content-address (S2) as a composable column."""
    return F.md5(canonical_json_udf(struct_col))
