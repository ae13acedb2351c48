"""etl_file_loader_spark — a PySpark-native analytics/ingestion engine.

From-scratch re-expression of the capabilities of the reference
``cmgoffena13/etl-file-loader`` (a configuration-driven file -> relational-DB
ingestion service; see /root/reference, SURVEY.md) as an idiomatic Spark
DataFrame engine, extended with the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
the reference does not have.

Design principles (100 TB first):
 - Declarative DataFrame plans only; Catalyst does pruning/pushdown/join
   selection. No driver-side row loops, no ``collect()`` except bounded
   samples (top-5 duplicate examples, first-5 error samples).
 - All validation is Column-expression based (whole-stage codegen), never
   row-at-a-time Python. Pandas UDFs only where expressions genuinely
   cannot express the semantics (multimodal decode).
 - Every shuffle is on an explicit, documented key; small sides broadcast.
"""

from etl_file_loader_spark.config import FieldSpec, SourceConfig
from etl_file_loader_spark.session import get_spark

__all__ = ["FieldSpec", "SourceConfig", "get_spark"]
__version__ = "0.1.0"
