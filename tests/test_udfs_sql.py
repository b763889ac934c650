"""Registered SQL UDF surface (R19/R20): golden values through spark.sql,
string-input contract, -1.0 parse-failure contract."""

from geoengine.udfs import register_sql_udfs


def test_distance_udf_golden_through_sql(spark):
    register_sql_udfs(spark)
    r = spark.sql(
        "SELECT distanceMi('42.5787980', '-71.5728', '42.461886', '-71.5485457') AS mi, "
        "distanceKm('42.5787980', '-71.5728', '42.461886', '-71.5485457') AS km"
    ).collect()[0]
    assert abs(r["mi"] - 8.1717) < 1e-2  # SqlUdf.scala:10
    assert abs(r["km"] - 13.151) < 1e-2  # SqlUdf.scala:11


def test_distance_udf_parse_failure_contract(spark):
    register_sql_udfs(spark)
    r = spark.sql(
        "SELECT distanceKm('not-a-number', '0', '0', '0') AS km, "
        "distanceMi('1', NULL, '2', '3') AS mi"
    ).collect()[0]
    assert r["km"] == -1.0 and r["mi"] == -1.0  # SqlUDF.scala:14-16


def test_cell_udfs_golden(spark):
    register_sql_udfs(spark, bits=40)
    r = spark.sql(
        "SELECT cellString(cellEncode(34.932603, -117.907324)) AS s"
    ).collect()[0]
    assert r["s"] == "0100110110100001010011000111111011001001"  # GeoSearch.scala:72

def test_sql_double_rejects_non_finite():
    import pytest
    from geoengine.exprs import sql_double

    assert sql_double(0.5) == "0.5e0"
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError, match="non-finite"):
            sql_double(bad)
