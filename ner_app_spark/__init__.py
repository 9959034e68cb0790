"""PySpark-native knowledge-graph construction engine.

From-scratch re-expression of the query/data-processing semantics of
TheDudoser/NER-app (reference at /root/reference, read-only) as an
idiomatic PySpark batch pipeline over Common-Crawl-style page tables:

    pages(url, warc_ts, html, text, lang)
      -> text extraction (byte-identical per url)
      -> batched phrase/entity extraction (mapInPandas, no per-row Python)
      -> TF-IDF scoring + POS-pattern classification
      -> (subj, pred, obj) triple emission
      -> entity linking (broadcast alias join + MinHash blocking + cosine)
      -> canonicalization (connected components)
      -> nodes/edges materialization

See SURVEY.md for the operator-by-operator mapping.
"""

__version__ = "0.1.0"
