"""Large-scale training-data operators beyond the reference's validators:
profiling aggregates, dedup (exact + near), similarity search, text analysis,
multimodal plumbing. All Ray-Data-first: map_batches over Arrow, partial
aggregation before shuffles, broadcast small sides."""
