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
