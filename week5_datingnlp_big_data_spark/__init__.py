"""PySpark-native analytics engine with the capabilities of the reference
``ElishevaMedioni/Week5_datingNLP_Big_Data`` (an R NLP/ML pipeline over the
OkCupid profiles corpus), re-expressed Spark-first.

Subpackages
-----------
sources    : explicit schemas + parquet/CSV catalog for the test tables
functions  : scalar/text/vector helpers (pure ``pyspark.sql.functions`` where
             possible; Pandas UDFs only for the stemmer and vector math)
operators  : the engine's operator surface — corpus prep, doc-term matrix,
             TF-IDF, frequency analysis, relational/window/JSON analytics,
             dedup, similarity search, ML stages, multimodal plumbing
plans      : composed end-to-end pipelines (EP-1/EP-2/EP-3 of the reference)
streaming  : Structured Streaming variants of the count pipelines

Design rules (SURVEY.md section 7): DataFrame/SQL first, long-form
``(doc_id, term, count)`` is the canonical sparse representation, never
densify, no ``collect()`` in operators, broadcast small sides, let
Catalyst/AQE pick physical strategies.
"""

__version__ = "0.1.0"

from week5_datingnlp_big_data_spark.session import get_spark  # noqa: F401
