"""odin_rs_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ODIN-fire/odin-rs.

The reference (/root/reference, Rust actor-based streaming ETL for wildland
fire data integration) defines WHAT we compute: hotspot pipelines, keyed
track state, as-of/interval/spatial joins, schedule-learning aggregations,
bounded retention windows, raster cell algebra, and streaming TTL/dedup
semantics (see SURVEY.md). This package re-expresses those semantics
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured Streaming
for live feeds, Pandas UDFs only where built-ins cannot express the op.

Layout:
    functions/   column-expression library (geo, datetime, text) — pure JVM
    operators/   relational + domain operators (filters, joins, windows,
                 aggregations, dedup, similarity, text, raster, multimodal)
    sources/     table/feed adapters (parquet star schema, CSV hotspot
                 formats, streaming bridges)
    sinks/       output adapters (snapshot/delta JSON, CSV products)
    streaming/   stateful streaming ops (TTL eviction, alarm dedup, traces)
    plans/       composed pipelines mirroring the reference's actor graphs
"""

from odin_rs_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
