"""sparkotel — a PySpark-native log/telemetry pipeline.

Brand-new engine (not a port) with the processing semantics of the
OpenTelemetry Collector contrib's receive → process → export DAG,
re-expressed as batch DataFrame stages over Common-Crawl-style web
pages.  See SURVEY.md for the blueprint and the reference citations.
"""

__version__ = "0.1.0"
