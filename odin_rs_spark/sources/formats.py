"""Wire-format decoders for the reference's external feeds (SURVEY §2.1).

All formats here are public specifications; the decoders are pure
DataFrame transforms (from_csv / from_json / regexp_extract) so they run
JVM-side and compose with any batch or streaming source:

  parse_sbs            ~ S7  ADS-B SBS/BaseStation socket lines
                         (odin_adsb/src/sbs.rs:27-151)
  parse_mode_s_json    ~ S8  line-delimited Mode-S decoder JSON with
                         per-frame-type dispatch
                         (odin_adsb/src/rs1090.rs:89-234)
  parse_firms_csv      ~ S5  FIRMS VIIRS/MODIS hotspot area CSV +
                         confidence recode (odin_orbital/src/firms.rs:117-424)
  himawari_path_time   ~ S6  time-encoded L2WLF file names
                         (odin_himawari/src/lib.rs:248-366)
  goes_key_time        ~ S1  ABI L2 S3 object-key timestamp parse
                         (odin_goesr/src/lib.rs:293-366)
  parse_geojson        ~ S13 GeoJSON FeatureCollection scan
                         (odin_bushfire/src/lib.rs:198-218)
  filename_capture     ~ S15 filename-regex metadata extract
                         (odin_common/src/fs.rs:258-307,393-432)

Scale note: every decoder is a per-row expression — no shuffle, fully
pipelined with the scan; pushing a filter on the decoded columns still
prunes files/row-groups where the source format allows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# --------------------------------------------------------------------------
# S7 — SBS-1 / BaseStation CSV lines (public port-30003 format)
# --------------------------------------------------------------------------

SBS_SCHEMA = (
    "msg_type STRING, transmission_type INT, session_id STRING, aircraft_id STRING,"
    " icao24 STRING, flight_id STRING, date_gen STRING, time_gen STRING,"
    " date_log STRING, time_log STRING, callsign STRING, altitude_ft DOUBLE,"
    " groundspeed_kt DOUBLE, track_deg DOUBLE, lat DOUBLE, lon DOUBLE,"
    " vertical_rate_fpm DOUBLE, squawk STRING, alert STRING, emergency STRING,"
    " spi STRING, is_on_ground STRING"
)


def parse_sbs(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Decode SBS-1 text lines (one CSV record per line) into typed rows.

    Emits every MSG record with a parsed event timestamp; position
    messages (transmission_type 2/3) carry lat/lon, velocity messages
    (4) carry speed/track/vertical rate — the same split the reference's
    parse_msg handles (odin_adsb/src/sbs.rs:27-151). Non-MSG control
    lines (SEL/ID/AIR/STA/CLK) are dropped.
    """
    parsed = lines.select(
        F.from_csv(F.col(line_col), SBS_SCHEMA).alias("r")
    ).select("r.*")
    return (
        parsed.filter(F.col("msg_type") == "MSG")
        .withColumn(
            "ts",
            F.try_to_timestamp(
                F.concat_ws(" ", "date_gen", "time_gen"),
                F.lit("yyyy/MM/dd HH:mm:ss.SSS"),
            ),
        )
        .withColumn("callsign", F.nullif(F.trim("callsign"), F.lit("")))
        .withColumn("is_position", F.col("transmission_type").isin(2, 3))
        .withColumn("is_velocity", F.col("transmission_type") == 4)
    )


# --------------------------------------------------------------------------
# S8 — line-delimited Mode-S decode JSON (public 1090 MHz fields)
# --------------------------------------------------------------------------

MODE_S_SCHEMA = (
    "df INT, icao24 STRING, bds STRING, callsign STRING, altitude DOUBLE,"
    " latitude DOUBLE, longitude DOUBLE, groundspeed DOUBLE, track DOUBLE,"
    " vertical_rate DOUBLE, squawk STRING, timestamp DOUBLE,"
    " selected_altitude DOUBLE, selected_heading DOUBLE"
)


def parse_mode_s_json(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Decode line-delimited Mode-S JSON and dispatch by downlink format
    (DF17/18 extended squitter carries position/identification/velocity;
    DF4/20 altitude replies; DF5/21 identity replies) — the when()-chain
    restatement of the reference's match on frame type
    (odin_adsb/src/rs1090.rs:89-234). `kind` labels the update type the
    downstream keyed state applies.
    """
    parsed = lines.select(
        F.from_json(F.col(line_col), MODE_S_SCHEMA).alias("r")
    ).select("r.*")
    return parsed.filter(F.col("icao24").isNotNull()).withColumn(
        "kind",
        F.when(
            F.col("df").isin(17, 18) & F.col("latitude").isNotNull(), "position"
        )
        .when(F.col("df").isin(17, 18) & F.col("callsign").isNotNull(), "identification")
        .when(F.col("df").isin(17, 18) & F.col("groundspeed").isNotNull(), "velocity")
        .when(F.col("df").isin(4, 20), "altitude")
        .when(F.col("df").isin(5, 21), "identity")
        .otherwise("status"),
    ).withColumn("ts", F.timestamp_seconds(F.col("timestamp")))


# --------------------------------------------------------------------------
# S5 — FIRMS hotspot area CSV (public NASA FIRMS columns)
# --------------------------------------------------------------------------

FIRMS_SCHEMA = (
    "latitude DOUBLE, longitude DOUBLE, bright_ti4 DOUBLE, scan DOUBLE,"
    " track DOUBLE, acq_date STRING, acq_time STRING, satellite STRING,"
    " instrument STRING, confidence STRING, version STRING, bright_ti5 DOUBLE,"
    " frp DOUBLE, daynight STRING"
)


def parse_firms_csv(spark_or_df, path: str | None = None) -> DataFrame:
    """Read a FIRMS area CSV (header row) into typed hotspot rows with
    the reference's confidence recode (l/n/h → low/nominal/high,
    odin_orbital/src/firms.rs) and a proper acquisition timestamp from
    acq_date + zero-padded acq_time HHMM."""
    if path is not None:
        df = spark_or_df.read.csv(path, header=True, schema=FIRMS_SCHEMA)
    else:
        df = spark_or_df
    hhmm = F.lpad(F.col("acq_time"), 4, "0")
    return (
        df.withColumn(
            "acq_ts",
            F.try_to_timestamp(
                F.concat_ws(" ", "acq_date", hhmm), F.lit("yyyy-MM-dd HHmm")
            ),
        )
        .withColumn(
            "confidence_class",
            F.when(F.lower("confidence").isin("l", "low"), "low")
            .when(F.lower("confidence").isin("n", "nominal"), "nominal")
            .when(F.lower("confidence").isin("h", "high"), "high")
            # MODIS numeric confidence 0-100 → banded like the reference
            # (try_cast: ANSI mode must not throw on letter codes)
            .when(F.col("confidence").try_cast("double") < 30, "low")
            .when(F.col("confidence").try_cast("double") < 80, "nominal")
            .when(F.col("confidence").try_cast("double") >= 80, "high")
            .otherwise("unknown"),
        )
    )


# --------------------------------------------------------------------------
# S6 / S1 — time-encoded file names
# --------------------------------------------------------------------------


def himawari_path_time(path_col: Column | str = None) -> Column:
    """Timestamp from Himawari L2WLF file names
    (`HNN_yyyymmdd_HHMM_L2WLF...`): the directory/time enumeration the
    reference derives its per-10-min scan slots from."""
    c = F.input_file_name() if path_col is None else (
        F.col(path_col) if isinstance(path_col, str) else path_col
    )
    return F.try_to_timestamp(
        F.concat(
            F.regexp_extract(c, r"H\d{2}_(\d{8})_(\d{4})_L2WLF", 1),
            F.regexp_extract(c, r"H\d{2}_(\d{8})_(\d{4})_L2WLF", 2),
        ),
        F.lit("yyyyMMddHHmm"),
    )


def goes_key_time(key_col: Column | str = None) -> Column:
    """Scan-start timestamp from ABI L2 object keys
    (`..._G1x_sYYYYDDDHHMMSSs...`, public naming convention): DOY-format
    parse matching odin_goesr/src/lib.rs:350-366."""
    c = F.input_file_name() if key_col is None else (
        F.col(key_col) if isinstance(key_col, str) else key_col
    )
    s = F.regexp_extract(c, r"_s(\d{13})", 1)
    return F.try_to_timestamp(
        F.substring(s, 1, 11), F.lit("yyyyDDDHHmm")
    ) + F.make_dt_interval(secs=F.substring(s, 12, 2).try_cast("double"))


def filename_capture(pattern: str, group: int = 1, path_col: Column | str = None) -> Column:
    """S15 — generic filename-regex metadata extraction over
    input_file_name() (odin_common/src/fs.rs:393-432)."""
    c = F.input_file_name() if path_col is None else (
        F.col(path_col) if isinstance(path_col, str) else path_col
    )
    return F.regexp_extract(c, pattern, group)


# --------------------------------------------------------------------------
# S13 — GeoJSON FeatureCollection
# --------------------------------------------------------------------------

GEOJSON_GEOMETRY = StructType(
    [
        StructField("type", StringType()),
        # coordinates as raw JSON string: depth varies by geometry type
        # (Point=1, LineString=2, Polygon=3, MultiPolygon=4); callers
        # decode with geojson_polygon_rings()/geojson_point() below.
        StructField("coordinates", StringType()),
    ]
)


def geojson_feature_schema(properties: StructType) -> StructType:
    return StructType(
        [
            StructField("type", StringType()),
            StructField(
                "features",
                ArrayType(
                    StructType(
                        [
                            StructField("type", StringType()),
                            StructField("id", StringType()),
                            StructField("geometry", GEOJSON_GEOMETRY),
                            StructField("properties", properties),
                        ]
                    )
                ),
            ),
        ]
    )


def parse_geojson(
    raw: DataFrame, properties: StructType, json_col: str = "value"
) -> DataFrame:
    """Explode a FeatureCollection document (one JSON text per row) into
    one row per feature: (feature_id, geom_type, coordinates_json,
    props struct). Property cleanup (dropping nulls/renames,
    odin_bushfire/src/lib.rs:206-218) is then plain select/withColumn.
    """
    doc = raw.select(
        F.from_json(
            F.col(json_col),
            geojson_feature_schema(properties),
            {"mode": "PERMISSIVE"},
        ).alias("d")
    )
    feat = doc.select(F.explode_outer("d.features").alias("f")).filter(
        F.col("f").isNotNull()
    )
    return feat.select(
        F.col("f.id").alias("feature_id"),
        F.col("f.geometry.type").alias("geom_type"),
        F.col("f.geometry.coordinates").alias("coordinates_json"),
        F.col("f.properties").alias("props"),
    )


def geojson_point(coordinates_json: Column | str) -> Column:
    """Decode Point coordinates → struct(lon, lat)."""
    c = F.col(coordinates_json) if isinstance(coordinates_json, str) else coordinates_json
    arr = F.from_json(c, ArrayType(DoubleType()))
    return F.struct(
        F.element_at(arr, 1).alias("lon"), F.element_at(arr, 2).alias("lat")
    )


def geojson_polygon_rings(coordinates_json: Column | str) -> Column:
    """Decode Polygon coordinates → array of rings, each an array of
    struct(lon, lat) — the engine's GeoPolygon layout (SURVEY §1.4),
    ready for functions.polygon.* (ring 1 = exterior)."""
    c = F.col(coordinates_json) if isinstance(coordinates_json, str) else coordinates_json
    rings = F.from_json(c, ArrayType(ArrayType(ArrayType(DoubleType()))))
    return F.transform(
        rings,
        lambda ring: F.transform(
            ring,
            lambda pt: F.struct(
                F.element_at(pt, 1).alias("lon"), F.element_at(pt, 2).alias("lat")
            ),
        ),
    )


# ---------------------------------------------------------------------------
# CSV dialect sniffing (messy-ingest reality: crawled/uploaded tabular
# files carry no dialect declaration; Python's csv.Sniffer and every
# warehouse loader infer delimiter + header by consistency voting).
# Beyond-reference corpus-ingest capability.
# ---------------------------------------------------------------------------

CSV_SNIFF_DELIMS: tuple[tuple[str, str], ...] = (
    # (literal, split regex) in priority order for ties
    (",", ","),
    (";", ";"),
    ("\t", "\t"),
    ("|", r"\|"),
)

_NUMERIC_RE = r"^-?[0-9]+(\.[0-9]+)?$"

CSV_SNIFF_LINES = 10


def sniff_csv_dialect(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Infer the delimiter and header of raw CSV text by consistency
    voting: for each candidate delimiter, split the first
    CSV_SNIFF_LINES lines and find the modal field count (>1); the
    candidate with the most lines agreeing on one count wins (ties:
    larger field count, then candidate priority).  Header = first
    row's fields are all non-numeric while the second row has at
    least one numeric field (the csv.Sniffer heuristic).

    Adds ``delimiter`` / ``n_fields`` / ``consistency`` /
    ``has_header``.  Zero UDF — the vote is a higher-order-function
    chain over an in-row line array, so it replays in the oracle and
    runs in codegen on a 10^9-file crawl.  Quoted-field embedding of
    the delimiter is deliberately ignored during SNIFFING (so is
    csv.Sniffer's fallback path); the real parse afterwards is
    quote-aware."""
    lines = F.slice(F.split(F.col(text_col), "\n"), 1, CSV_SNIFF_LINES)

    def vote(split_re: str) -> Column:
        counts = F.transform(lines, lambda ln: F.size(F.split(ln, split_re)))
        u = F.array_distinct(F.filter(counts, lambda c: c > 1))
        # encode (consistency, modal fields) as consistency*1000+fields
        scores = F.transform(
            u,
            lambda v: F.size(F.filter(counts, lambda c: c == v)) * 1000 + v,
        )
        return F.coalesce(F.array_max(scores), F.lit(0))

    votes = [vote(sre) for _, sre in CSV_SNIFF_DELIMS]
    # global score folds in candidate priority (earlier wins ties):
    # vote * 10 + (n_candidates - position)
    n = len(CSV_SNIFF_DELIMS)
    best = F.greatest(*[v * 10 + (n - i) for i, v in enumerate(votes)])
    delim = F.lit(None).cast("string")
    split_re = F.lit(None).cast("string")
    for i, (lit, sre) in reversed(list(enumerate(CSV_SNIFF_DELIMS))):
        hit = best == votes[i] * 10 + (n - i)
        delim = F.when(hit, F.lit(lit)).otherwise(delim)
        split_re = F.when(hit, F.lit(sre)).otherwise(split_re)
    n_fields = F.floor(best / 10) % 1000
    consistency = F.floor(best / 10000)
    f0 = F.split(F.try_element_at(lines, F.lit(1)), split_re)
    f1 = F.split(F.try_element_at(lines, F.lit(2)), split_re)
    has_header = (
        F.size(F.filter(f0, lambda x: x.rlike(_NUMERIC_RE))) == 0
    ) & (F.size(F.filter(f1, lambda x: x.rlike(_NUMERIC_RE))) > 0)
    return df.select(
        "*",
        delim.alias("delimiter"),
        n_fields.cast("int").alias("n_fields"),
        consistency.cast("int").alias("consistency"),
        F.coalesce(has_header, F.lit(False)).alias("has_header"),
    )
