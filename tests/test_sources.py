"""Source contract: CSV quote/escape semantics + cast-on-entry (R1-R3)."""

from geoengine.sources import coerce_points, read_points_csv


def test_csv_quote_escape_and_cast(spark, tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text(
        'node_uuid,name,latitude,longitude\n'
        'a1,"Clinic ""North"", LLC",42.5,-71.1\n'
        'a2,"Plain name",10,20\n'
    )
    df = read_points_csv(
        spark, str(p), id_col="node_uuid", lat_col="latitude", lon_col="longitude"
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows["a1"]["name"] == 'Clinic "North", LLC'
    assert isinstance(rows["a2"]["latitude"], float)
    assert [f.dataType.simpleString() for f in df.schema.fields[:3]] == [
        "string", "double", "double",
    ]


def test_coerce_points_passthrough_payload(spark):
    df = spark.createDataFrame(
        [(1, 2.0, 3.0, b"\x00payload", "cap")],
        "id int, latitude double, longitude double, bytes binary, caption string",
    )
    out = coerce_points(df)
    r = out.collect()[0]
    assert r["id"] == "1" and r["bytes"] == b"\x00payload" and r["caption"] == "cap"


def test_jsonl_points_roundtrip(spark, tmp_path):
    """JSONL source: hostile strings (quotes, backslash, newline, unicode)
    survive the write+read; explicit schema path; point coercion works."""
    from geoengine.sources import read_points_jsonl

    import pandas as pd

    hostile = 'he said "hi"\\path\nline2\tü€'
    df = spark.createDataFrame(
        pd.DataFrame(
            {"pid": ["x1", "x2"], "lat": [1.5, -2.5],
             "lon": [10.0, 20.0], "caption": [hostile, "plain"]}
        )
    )
    d = str(tmp_path / "pts_jsonl")
    df.write.mode("overwrite").json(d)
    back = read_points_jsonl(
        spark, d, schema="pid string, lat double, lon double, caption string",
        id_col="pid", lat_col="lat", lon_col="lon",
    )
    rows = {r["id"]: r for r in back.collect()}
    assert rows["x1"]["caption"] == hostile
    assert [f.dataType.simpleString() for f in back.schema.fields[:3]] == [
        "string", "double", "double",
    ]


def test_orc_points_roundtrip(spark, tmp_path):
    from geoengine.sources import read_points_orc

    df = spark.createDataFrame(
        [(7, 1.0, 2.0, b"\x00\xffbin", "cap")],
        "id int, latitude double, longitude double, bytes binary, caption string",
    )
    d = str(tmp_path / "pts_orc")
    df.write.mode("overwrite").orc(d)
    r = read_points_orc(spark, d).collect()[0]
    assert r["id"] == "7" and r["bytes"] == b"\x00\xffbin" and r["caption"] == "cap"
