"""data_pipeline_rsna_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
pipeline ``debbie-alaine/data-pipeline-rsna`` (labels-CSV ingest,
per-patient box aggregation, DICOM decode, deterministic split, seven
geometric augmentation pipelines, annotation joins + validity filter +
coordinate normalization, sharded sink) as lazy DataFrame/SQL dataflow
on Apache Spark, extended with LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis, streaming event
aggregation) designed for 100 TB horizontal scale.

Design rules (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst owns the physical plan.
- Explicit StructType schemas everywhere; no inference.
- Python only in Arrow-batched pandas UDFs, isolated in
  ``operators/multimodal.py`` and ``operators/image_kernels.py``.
- All randomness seeded and keyed by (id, variant).
"""

__version__ = "0.1.0"
