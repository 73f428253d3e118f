"""Build-pipeline stages (stateless map_batches bodies + groupby merge).

Stage order (SURVEY.md §3.1 "Ray shape"):
``read → termize (partial postings per task) → groupby((shard,bucket))
→ merge (delta+VByte encode, block-max sidecars) → write + manifest``.
"""
