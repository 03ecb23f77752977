"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing.  All hot paths are JVM-side built-ins; Python appears
only inside Arrow-batched pandas UDFs (multimodal decode stubs)."""
