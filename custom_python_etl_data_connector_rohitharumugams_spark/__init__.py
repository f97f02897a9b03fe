"""PySpark-native analytics engine with the capabilities of the reference
``Kyureeus-Edtech/custom-python-etl-data-connector-rohitharumugams`` (an ETL
data connector spec: REST API -> transform -> document store; see
/root/reference/README.md:21-24), rebuilt Spark-first and extended with the
LLM-data-pipeline operator set (dedup, similarity search, multimodal columns,
text analysis) per SURVEY.md SS2.

Layout:
  session    - tuned SparkSession factory (UTC, AQE, Arrow)
  catalog    - test-fixture table loading + temp-view registration
  plans      - named query registry (the driver-checked operator surface)
  sources    - REST-API Python DataSource, document sink, env config
  functions  - text / vector / hashing / json column helpers
  operators  - composed operators (as-of join, top-k, dedup families)
  streaming  - event-replay streaming ops (windows, watermark, stateful)
"""

__version__ = "0.1.0"
