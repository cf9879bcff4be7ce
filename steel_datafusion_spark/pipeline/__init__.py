"""Beyond-reference pipeline operators for training-data curation at scale:
dedup (incl. connected-components cluster resolution and a persisted
incremental-dedup index), similarity/ANN (banded LSH, IVF, k-means),
text analysis + PII redaction, curation (repetition quality,
decontamination, mixture resampling), deterministic sampling & splitting,
sequence packing, fuzzy edit-distance joins, mergeable HLL/KLL sketches,
multimodal binary columns.

Submodules are imported lazily by the operators that need them; import
directly for explicit use::

    from steel_datafusion_spark.pipeline.dedup import minhash_dedup_pairs
    from steel_datafusion_spark.pipeline.curation import mixture_resample
    from steel_datafusion_spark.pipeline.fuzzy import fuzzy_match
"""
