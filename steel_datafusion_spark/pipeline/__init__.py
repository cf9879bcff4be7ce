"""Beyond-reference pipeline operators for training-data curation at scale:
dedup (incl. connected-components cluster resolution), similarity/ANN,
text analysis + PII redaction, deterministic sampling & splitting,
sequence packing, multimodal binary columns."""
