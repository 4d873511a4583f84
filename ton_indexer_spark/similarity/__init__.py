"""Similarity search over embedding columns (array<float>).

- brute: exact cosine top-k (the baseline) — cross join + zip_with dot
  product, TakeOrdered per query.
- lsh:   sign-pattern bucketed ANN (the scale path) — candidates only
  within a bucket, so the join shuffles on the bucket key instead of
  materializing |queries| × |corpus|.
- ivf:   inverted-list ANN (the other scale path) — corpus partitioned by
  nearest coarse centroid, queries probe nprobe lists; per-query cost is
  the probed fraction of the corpus.
"""

from ton_indexer_spark.similarity.brute import cosine_topk
from ton_indexer_spark.similarity.ivf import ivf_topk
from ton_indexer_spark.similarity.lsh import sign_lsh_topk

__all__ = ["cosine_topk", "ivf_topk", "sign_lsh_topk"]
