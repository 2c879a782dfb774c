"""ocr_application_spark — a PySpark-native document-extraction engine.

A from-scratch rebuild of the capabilities of RayenR1/OCR-application
("EyeQ", a Kafka-chained OCR microservice pipeline) as batch DataFrame
stages over parquet/Iceberg-style tables of Common-Crawl-like web pages.

Architecture (see SURVEY.md):
  recognize -> classify -> extract -> structure -> aggregate
as lazy DataFrame stages; heavy per-document work runs in Arrow-batched
``mapInPandas`` kernels (no per-row Python at the Spark level); everything
relational uses built-in ``pyspark.sql.functions`` so Catalyst can push
down, prune, reorder and broadcast.
"""

__version__ = "0.1.0"
