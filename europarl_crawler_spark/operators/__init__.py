"""Large-scale training-data pipeline operators: dedup, similarity search,
text analysis, multimodal column handling — the operations a 100 TB
image+caption corpus needs beyond the reference's own surface."""
