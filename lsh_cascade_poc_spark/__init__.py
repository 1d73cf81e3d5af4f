"""lsh_cascade_poc_spark — a PySpark-native near-duplicate detection engine.

A from-scratch reimagination of cmscom/lsh-cascade-poc (reference read-only at
/root/reference): the reference's multi-stage cascade search (cheap coarse LSH
filter -> Hamming rerank -> exact cosine verify, /root/reference/src/pipeline.py:68-119)
is re-targeted as a bulk *all-pairs* near-duplicate detection + clustering
pipeline over tables of multi-turn conversation transcripts:

    coarse MinHash bands  ->  tight bands (min-match)  ->  exact Jaccard verify
    -> connected-components clustering

Everything is declarative DataFrame/SQL; Python appears only inside
Arrow-vectorized ``pandas_udf`` kernels (never per-row UDFs).
"""

__version__ = "0.1.0"
