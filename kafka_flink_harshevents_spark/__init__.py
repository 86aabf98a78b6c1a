"""PySpark-native analytics engine with the query and data-processing
capabilities of ``Kaushika-Omnidya/kafka-flink-harshevents``.

Every operator is a shared batch/streaming ``DataFrame -> DataFrame``
function (SURVEY.md §7 design stance): bind to ``spark.read`` for the
DuckDB-oracle correctness checks and to ``spark.readStream`` for the live
Kafka pipeline. Architecture is Spark-first — declarative DataFrame/SQL
plans optimized by Catalyst, keyed state via Structured Streaming, Pandas
UDFs only where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
