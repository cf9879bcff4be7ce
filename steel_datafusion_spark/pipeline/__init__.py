"""Beyond-reference pipeline operators for training-data curation at scale:
dedup (incl. connected-components cluster resolution and a persisted
incremental-dedup index), similarity/ANN (banded LSH, IVF, k-means),
text analysis + PII redaction + hashed linear quality classification
(terms.py), exact heavy hitters with bucketized pigeonhole pruning
(terms.py), token-window chunking and exact-substring duplicated-span
extents (chunking.py), product-quantization ANN and L2 normalization
(similarity.py), curation (repetition quality, decontamination, mixture
resampling incl. temperature flattening, per-domain caps, IQR outlier
fences), deterministic
sampling & splitting & training-order sharding, sequence packing, fuzzy
edit-distance joins, mergeable HLL/KLL sketches (two-level salted merge),
multimodal binary columns with real image decode (pipeline/codecs.py:
pure-Python PNG/JPEG/BMP/PPM — baseline JPEG in pipeline/jpeg.py; Pillow
when installed), corpus-statistical scoring (scoring.py: unigram-LM
quality scores, BM25 retrieval, Bloom-filter decontamination screens,
cross-document n-gram novelty), snapshot change-data-capture (cdc.py:
keyed snapshot diff + SCD2 batch-versioned dimensions), deterministic
count-min sketches (sketches.py: oracle-exact, vocabulary-independent
shuffle), source-pair overlap matrices (dedup.py
source_overlap_matrix), DSIR importance resampling (selection.py:
hashed n-gram target/pool models, Gumbel top-k), logistic-regression
quality-filter training (classifier.py: one aggregation per GD
iteration, oracle-unrolled trajectory), distributed BPE learn+apply
(bpe.py), weighted PageRank / triangle counting / deterministic
label-propagation communities (graph.py), time-bucket gap filling with
LOCF/linear interpolation and chained event debounce (rollup.py),
real VIDEO decode (codecs.py decode_avi: RIFF/AVI raw-DIB + MJPEG, all
three modalities genuine), CCNet-style interpolated-LM perplexity
bucketing and HTML stripping (scoring.py / text.py), sparse TF-IDF
document similarity + hard-negative mining (terms.py / similarity.py),
distributed PCA (similarity.py embedding_covariance + driver
eigenstep), best-member dedup representatives (dedup.py), market-basket
association rules (basket.py), incremental aggregate-view maintenance
(cdc.py agg_state/merge_agg_state; streamed via
streaming.operators.streaming_view_maintenance), and — in the sibling
packages — Z-order clustering layout + small-file compaction planning
(sources/layout.py), shuffle-key skew diagnosis + exact
join-cardinality pre-flight (operators/skew.py), and declarative
data-quality expectations (operators/expectations.py).

Submodules are imported lazily by the operators that need them; import
directly for explicit use::

    from steel_datafusion_spark.pipeline.dedup import minhash_dedup_pairs
    from steel_datafusion_spark.pipeline.curation import mixture_resample
    from steel_datafusion_spark.pipeline.fuzzy import fuzzy_match
"""
