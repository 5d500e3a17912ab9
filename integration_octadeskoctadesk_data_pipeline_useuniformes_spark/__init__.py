"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference Octadesk→BigQuery ETL pipeline
(GabrielDK-vish/Integration_octadeskoctadesk-data-pipeline-useuniformes), re-expressed Spark-first.

Layout
------
- ``session``   : SparkSession factory / driver-session configuration
- ``tables``    : parquet loaders for the synthetic test tables + the
                  Octadesk-shaped derived views (tickets/chats/chat_events)
- ``functions`` : scalar/name/kv/json helpers (SURVEY §2.9)
- ``operators`` : projection, filters, joins, dedup, similarity, text,
                  pivot, windows (SURVEY §2.2-2.8 + north-star extensions)
- ``sources``   : windowed/paginated REST-shaped Python DataSource (§2.1)
- ``sinks``     : append/schema-evolution + merge/upsert sinks (§2.1 S11-S13)
- ``plans``     : pipeline assemblies reproducing the reference entry points
- ``streaming`` : incremental variants (SURVEY §2.10 T1-T5)
"""

__version__ = "0.1.0"
