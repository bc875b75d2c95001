"""Large-scale training-data-pipeline operators (SURVEY §2.8).

Not part of the reference's surface — these are the operators a 100 TB
data pipeline needs on top of the event/document tables: deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search over
embeddings (brute-force + LSH-bucketed), text analysis (language id,
quality scores, token counts, fingerprints), and multimodal column
plumbing. Everything is built from JVM-side ``pyspark.sql.functions``
except where Python is semantically required, and every operator is
shuffle-conscious: LSH banding turns O(n²) candidate generation into a
bucket-join; verification only touches candidate pairs.
"""

from eventstorm_spark.extensions import (bpe, curation, dedup, multimodal,
                                         packing, pipeline, similarity,
                                         sketches, temporal, text)

__all__ = ["dedup", "similarity", "text", "multimodal", "pipeline",
           "temporal", "sketches", "packing", "bpe", "curation"]
