"""Training-data pipeline operators beyond the reference's surface:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute + IVF), text analysis
(lang-id, quality, token stats, fingerprints) and multimodal
decode plumbing. All Ray-Data-first: vectorized ``map_batches`` +
``groupby`` shuffles, broadcast small sides, actor pools for stateful
stages."""
