"""tilemaker_spark — a from-scratch PySpark-native vector-tile engine.

Re-expresses the query/data-processing capabilities of TimSC/tilemaker
(reference at /root/reference, see SURVEY.md) as idiomatic Spark:
DataFrame stages + Arrow-vectorized pandas UDFs, no per-row Python on
the hot path. The input is a Common-Crawl-style web-page table
(url, warc_ts, html, text, lang); features are geocoded out of it
deterministically, then classified into layers, assembled into
geometries, assigned to z/x/y tiles, and encoded as Mapbox Vector
Tiles across a zoom pyramid.
"""

__version__ = "0.1.0"
