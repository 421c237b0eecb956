"""Format-decoder + sink tests, mirroring the reference's style of unit
tests over checked-in sample resources (SURVEY §5) — with synthesized
sample lines for the public wire formats (SBS, Mode-S JSON, FIRMS CSV,
GeoJSON)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from odin_rs_spark.sinks import products
from odin_rs_spark.sources import formats

SBS_LINES = [
    # MSG,3 = airborne position
    "MSG,3,1,1,A1B2C3,1,2024/01/05,12:00:01.500,2024/01/05,12:00:01.600,,35000,,,"
    "37.615223,-122.389977,,,0,0,0,0",
    # MSG,4 = velocity
    "MSG,4,1,1,A1B2C3,1,2024/01/05,12:00:02.000,2024/01/05,12:00:02.100,,,450.5,"
    "271.2,,,64,,,,,",
    # MSG,1 = identification (callsign)
    "MSG,1,1,1,A1B2C3,1,2024/01/05,12:00:03.000,2024/01/05,12:00:03.100,UAL123  ,"
    ",,,,,,,,,,",
    # non-MSG control line → dropped
    "STA,,1,1,A1B2C3,1,2024/01/05,12:00:04.000,2024/01/05,12:00:04.100",
]

MODE_S_LINES = [
    json.dumps(
        {"df": 17, "icao24": "a1b2c3", "latitude": 37.6, "longitude": -122.4,
         "altitude": 35000.0, "timestamp": 1704456001.5}
    ),
    json.dumps({"df": 17, "icao24": "a1b2c3", "callsign": "UAL123", "timestamp": 1704456002.0}),
    json.dumps(
        {"df": 17, "icao24": "a1b2c3", "groundspeed": 450.0, "track": 271.0,
         "vertical_rate": 64.0, "timestamp": 1704456003.0}
    ),
    json.dumps({"df": 4, "icao24": "ff0011", "altitude": 12000.0, "timestamp": 1704456004.0}),
    json.dumps({"df": 11, "timestamp": 1704456005.0}),  # no icao24 → dropped
]

FIRMS_CSV = """latitude,longitude,bright_ti4,scan,track,acq_date,acq_time,satellite,instrument,confidence,version,bright_ti5,frp,daynight
38.1234,-122.5678,330.5,0.39,0.36,2024-01-05,436,N,VIIRS,n,2.0NRT,290.1,2.4,N
38.2000,-122.6000,341.2,0.40,0.37,2024-01-05,1805,N,VIIRS,h,2.0NRT,295.0,5.1,D
38.3000,-122.7000,305.0,0.41,0.38,2024-01-05,1806,A,MODIS,85,6.1NRT,,12.0,D
"""

GEOJSON_DOC = json.dumps(
    {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": "bf1",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[150.0, -33.0], [151.0, -33.0], [151.0, -32.0],
                         [150.0, -32.0], [150.0, -33.0]]
                    ],
                },
                "properties": {"name": "fire-1", "status": "Going"},
            },
            {
                "type": "Feature",
                "id": "bf2",
                "geometry": {"type": "Point", "coordinates": [149.5, -34.5]},
                "properties": {"name": "fire-2", "status": "Contained"},
            },
        ],
    }
)


def test_parse_sbs(spark):
    df = spark.createDataFrame([(l,) for l in SBS_LINES], ["value"])
    out = formats.parse_sbs(df).collect()
    assert len(out) == 3  # STA dropped
    by_tt = {r.transmission_type: r for r in out}
    assert by_tt[3].lat == 37.615223 and by_tt[3].lon == -122.389977
    assert by_tt[3].is_position and not by_tt[3].is_velocity
    assert by_tt[4].groundspeed_kt == 450.5 and by_tt[4].is_velocity
    assert by_tt[1].callsign == "UAL123"  # trimmed
    assert str(by_tt[3].ts) == "2024-01-05 12:00:01.500000"


def test_parse_mode_s_json(spark):
    df = spark.createDataFrame([(l,) for l in MODE_S_LINES], ["value"])
    out = formats.parse_mode_s_json(df).collect()
    assert len(out) == 4  # missing-icao24 frame dropped
    kinds = [r.kind for r in out]
    assert kinds == ["position", "identification", "velocity", "altitude"]
    assert out[0].latitude == 37.6
    assert out[0].ts is not None


def test_parse_firms_csv(spark, tmp_path):
    p = tmp_path / "firms.csv"
    p.write_text(FIRMS_CSV)
    out = formats.parse_firms_csv(spark, str(p)).orderBy("acq_ts").collect()
    assert [r.confidence_class for r in out] == ["nominal", "high", "high"]
    # acq_time 436 → 04:36 zero-padded
    assert str(out[0].acq_ts) == "2024-01-05 04:36:00"
    assert out[0].frp == 2.4


def test_time_encoded_filenames(spark):
    df = spark.createDataFrame(
        [
            ("H09_20240105_1230_L2WLF010_FLDK.06001_06001.csv",),
            ("OR_ABI-L2-FDCC-M6_G16_s20240052101177_e20240052103550_c20240052104106.nc",),
        ],
        ["name"],
    )
    r = df.select(
        formats.himawari_path_time("name").alias("him"),
        formats.goes_key_time("name").alias("goes"),
    ).collect()
    assert str(r[0].him) == "2024-01-05 12:30:00"
    # s20240052101177 → 2024 DOY 005 21:01 + 17.7s → 21:01:17
    assert str(r[1].goes).startswith("2024-01-05 21:01:17")


def test_parse_geojson(spark):
    props = StructType(
        [StructField("name", StringType()), StructField("status", StringType())]
    )
    raw = spark.createDataFrame([(GEOJSON_DOC,)], ["value"])
    feats = formats.parse_geojson(raw, props)
    rows = {r.feature_id: r for r in feats.collect()}
    assert rows["bf1"].geom_type == "Polygon"
    assert rows["bf1"].props.status == "Going"
    # decode rings and run the polygon library on them
    from odin_rs_spark.functions import polygon as poly_fns

    ring = feats.filter(F.col("geom_type") == "Polygon").select(
        F.element_at(
            formats.geojson_polygon_rings("coordinates_json"), 1
        ).alias("ring")
    )
    m = ring.select(
        poly_fns.polygon_area_deg2(F.col("ring")).alias("area"),
        poly_fns.point_in_polygon(F.lit(150.5), F.lit(-32.5), F.col("ring")).alias("inside"),
    ).collect()[0]
    assert abs(m.area - 1.0) < 1e-9
    assert m.inside
    pt = rows["bf2"]
    p = spark.createDataFrame([(pt.coordinates_json,)], ["c"]).select(
        formats.geojson_point("c").alias("p")
    ).collect()[0]
    assert p.p.lon == 149.5 and p.p.lat == -34.5


def test_filename_capture(spark):
    df = spark.createDataFrame([("fire_summary_CZU_2024.json",)], ["name"])
    r = df.select(
        formats.filename_capture(r"fire_summary_(\w+)_(\d{4})", 1, "name").alias("fire"),
    ).collect()[0]
    assert r.fire == "CZU"


def test_geojson_feature_sink_roundtrip(spark, tmp_path):
    cells = spark.createDataFrame(
        [(1.0, 2.0, 5.5), (3.0, 4.0, 7.7)], ["x", "y", "spd"]
    )
    feat = cells.select(
        products.geojson_feature(
            "Point",
            F.array(F.col("x"), F.col("y")),
            F.struct(F.col("spd")),
        ).alias("feature")
    )
    out = str(tmp_path / "geojson")
    products.write_geojson_features(feat, "feature", out)
    lines = spark.read.text(out).collect()
    docs = [json.loads(r.value) for r in lines]
    assert {d["geometry"]["type"] for d in docs} == {"Point"}
    assert sorted(d["properties"]["spd"] for d in docs) == [5.5, 7.7]


def test_lru_purge(tmp_path):
    old = tmp_path / "old.bin"
    new = tmp_path / "new.bin"
    old.write_bytes(b"x" * 100)
    new.write_bytes(b"y" * 100)
    past = time.time() - 7200
    os.utime(old, (past, past))
    removed = products.lru_purge(str(tmp_path), max_age_sec=3600)
    assert [os.path.basename(p) for p in removed] == ["old.bin"]
    assert new.exists() and not old.exists()
    # size bound: keep newest under the cap
    removed = products.lru_purge(str(tmp_path), max_total_bytes=50)
    assert not new.exists()


def test_shared_store_change_feed(spark, tmp_path):
    path = str(tmp_path / "store.json")
    changes = []
    s = products.SharedStore(path)
    s.subscribe(changes.append)
    s.set("region/a", {"bbox": [1, 2, 3, 4]})
    s.set("region/b", {"bbox": [5, 6, 7, 8]})
    s.remove("region/a")
    assert [c["op"] for c in changes] == ["set", "set", "remove"]
    # persistence: reload sees the surviving key
    s2 = products.SharedStore(path)
    assert list(s2.query("region/")) == ["region/b"]
    df = s2.to_df(spark)
    assert df.count() == 1


def test_messenger_sink(spark):
    alarms = spark.createDataFrame([("d1", "smoke", 0.97)], ["device", "kind", "conf"])
    got = []
    sink = products.messenger_sink([got.append])
    sink(alarms, 0)
    assert got == [{"device": "d1", "kind": "smoke", "conf": 0.97}]
