"""Operator library — one module per SURVEY.md §2 family.

pivoting    — long→wide pivot with controlled cell naming (A3-A5, J1)
windows     — rank/lag/cumsum derivations of the API's precomputed fields (W1-W6)
joins       — broadcast/semi/anti/full-outer/as-of join helpers (§2.3)
topk        — global (TakeOrderedAndProject) and per-group top-k (O2/O4)
dedup       — exact survivor, n-gram Jaccard, MinHash-LSH, SimHash (⊕)
similarity  — brute-force / LSH / IVF cosine top-k over embeddings (⊕)
textops     — language-ID, quality scoring, token counts, fingerprints (⊕)
multimodal  — binary payload columns + Arrow-batched decode/feature stubs (⊕)
sessionize  — gaps-and-islands sessionization (batch ≡ session_window)
skew        — deterministic salting: sharded exact distinct, hot-key joins
components  — connected components (pairs → dedup groups), iterative (⊕)
scd2        — SCD2 snapshot merge (the dbt snapshots the reference scaffolds)
sampling    — reproducible hash-of-key samples, splits, sequence packing (⊕)
"""
