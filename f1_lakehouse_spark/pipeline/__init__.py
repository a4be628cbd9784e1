"""Large-scale training-data pipeline operators: deduplication, similarity
search, text analysis, multimodal columns. All deterministic-by-construction
(integer hashing, left-fold float reductions) so every operator has an exact
DuckDB oracle."""
