"""drill_spark — a PySpark-native analytics engine with the query surface
of Apache Drill (reference: /root/reference, apache/drill).

Not a port: Drill's relational core (Calcite + generated-code operators)
maps onto Spark SQL / Catalyst wholesale; this package contributes the
session/catalog layer, schema-on-read conveniences, the Drill function
compat surface, and large-scale extension operators (dedup, similarity
search, text analysis, multimodal columns, streaming).

See SURVEY.md for the full blueprint and reference citations.
"""

from drill_spark.session import DrillSession, get_spark

__version__ = "0.1.0"

__all__ = ["DrillSession", "get_spark", "__version__"]
