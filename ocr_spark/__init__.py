"""ocr_spark — a from-scratch PySpark-native document-extraction and
analytics engine with the computational capabilities of the reference
`kento-nakai-ai/ocr` pipeline (see SURVEY.md).

Everything is expressed in the pyspark.sql DataFrame API so Catalyst /
Tungsten / AQE own the physical plan; Python appears only inside
Arrow-vectorized pandas UDFs (never per-row).

Layout:
    session     SparkSession factory with scale-oriented defaults
    schema      canonical schemas (docs/spans, problems, embeddings, manifest)
    corpus      deterministic synthetic corpus generator (seeded, skew knobs)
    storage     parquet table catalog + MERGE-style upsert + manifest/resume
    functions/  native column-expression libraries (text normalization, ids,
                vector math, text stats)
    operators/  DataFrame → DataFrame operators (extraction, structure,
                embeddings, similarity, dedup, tags, scores, ann, media)
    plans/      end-to-end pipelines (extract pipeline, salted heavy-doc path)
    streaming/  incremental / foreachBatch wrappers
"""

__version__ = "0.1.0"
