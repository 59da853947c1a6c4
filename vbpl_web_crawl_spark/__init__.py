"""vbpl_web_crawl_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the capabilities of the reference crawler
(Minh0511/vbpl-web-crawl, read-only at /root/reference) as idiomatic
Spark: DataFrame/SQL operators, window-function parsers, sketch-backed
anti-join dedup, a politeness-aware iterative frontier scheduler, and a
library of large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Nothing here is a port: the reference is single-process imperative
Python + MySQL; this package is declarative DataFrame programs designed
for a multi-executor cluster at ~100 TB scale, tested on local[32].
"""

from vbpl_web_crawl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
