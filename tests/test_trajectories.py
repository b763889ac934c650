"""Trajectory operators: segment metrics, per-entity rollups, geofence
visit sessionization — handcrafted fixtures with known geometry/timing so
every output value is asserted against an independent computation."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoengine import exprs
from geoengine.trajectories import (
    geofence_visits,
    segment_metrics,
    trajectory_stats,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def _points(spark, rows):
    """rows: (id, entity, seconds_from_T0, lat, lon)."""
    return spark.createDataFrame(
        [(i, e, _ts(s), la, lo) for i, e, s, la, lo in rows],
        schema="id long, user_id long, ts timestamp_ntz, "
               "latitude double, longitude double",
    )


def _dist_km(lat1, lon1, lat2, lon2):
    c = (
        np.sin(np.radians(lat1)) * np.sin(np.radians(lat2))
        + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2))
        * np.cos(np.radians(lon1) - np.radians(lon2))
    )
    return float(np.arccos(min(max(c, -1.0), 1.0)) * 6371.0)


@pytest.fixture(scope="module")
def utc(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


class TestSegmentMetrics:
    def test_values_and_ordering(self, utc):
        # entity 1: 3 fixes; fix 20 and 30 share a timestamp -> the id
        # tie-break fixes the order (20 before 30)
        pts = _points(utc, [
            (10, 1, 0.0, 0.0, 0.0),
            (20, 1, 3600.0, 0.0, 1.0),
            (30, 1, 3600.0, 0.0, 1.0),   # co-timestamped, same place
            (40, 2, 0.0, 10.0, 10.0),    # other entity: no cross-segments
        ])
        seg = segment_metrics(pts, max_kmh=1000.0).orderBy("id")
        rows = {r["id"]: r for r in seg.collect()}
        assert set(rows) == {20, 30}  # first fix per entity emits no row
        d = _dist_km(0.0, 0.0, 0.0, 1.0)
        assert rows[20]["seg_km"] == pytest.approx(d, rel=1e-12)
        assert rows[20]["dt_s"] == 3600.0
        assert rows[20]["kmh"] == pytest.approx(d, rel=1e-12)  # 1 hour
        assert rows[20]["is_glitch"] is False
        # zero elapsed, zero distance: speed undefined, not a glitch
        assert rows[30]["seg_km"] == 0.0
        assert rows[30]["dt_s"] == 0.0
        assert rows[30]["kmh"] is None
        assert rows[30]["is_glitch"] is False

    def test_glitch_flags(self, utc):
        pts = _points(utc, [
            (1, 7, 0.0, 0.0, 0.0),
            (2, 7, 1.0, 0.0, 1.0),     # ~111 km in 1 s -> over any bound
            (3, 7, 1.0, 0.0, 2.0),     # zero dt but MOVED -> teleport
        ])
        seg = segment_metrics(pts, max_kmh=1000.0)
        got = {r["id"]: r["is_glitch"] for r in seg.collect()}
        assert got == {2: True, 3: True}

    def test_no_flag_column_without_threshold(self, utc):
        pts = _points(utc, [(1, 1, 0.0, 0.0, 0.0), (2, 1, 1.0, 0.0, 1.0)])
        assert "is_glitch" not in segment_metrics(pts).columns


class TestTrajectoryStats:
    def test_rollup_values(self, utc):
        # entity 1: right-angle path 0,0 -> 0,1 -> 1,1 over 2 h
        pts = _points(utc, [
            (1, 1, 0.0, 0.0, 0.0),
            (2, 1, 3600.0, 0.0, 1.0),
            (3, 1, 7200.0, 1.0, 1.0),
            (9, 2, 0.0, 5.0, 5.0),  # single fix
        ])
        got = {r["user_id"]: r for r in trajectory_stats(pts).collect()}
        leg1 = _dist_km(0.0, 0.0, 0.0, 1.0)
        leg2 = _dist_km(0.0, 1.0, 1.0, 1.0)
        disp = _dist_km(0.0, 0.0, 1.0, 1.0)
        r1 = got[1]
        assert r1["n_points"] == 3
        assert r1["path_km"] == pytest.approx(leg1 + leg2, rel=1e-12)
        assert r1["displacement_km"] == pytest.approx(disp, rel=1e-12)
        assert r1["duration_s"] == 7200.0
        assert r1["avg_kmh"] == pytest.approx((leg1 + leg2) / 2.0, rel=1e-12)
        assert r1["straightness"] == pytest.approx(
            disp / (leg1 + leg2), rel=1e-12
        )
        # single-fix entity: zero path, zero duration, NULL ratios
        r2 = got[2]
        assert r2["n_points"] == 1
        assert r2["path_km"] == 0.0
        assert r2["displacement_km"] == 0.0
        assert r2["duration_s"] == 0.0
        assert r2["avg_kmh"] is None
        assert r2["straightness"] is None

    def test_first_last_follow_tie_break(self, utc):
        # two fixes share the max timestamp; id order decides which is
        # 'last' -> displacement must use id=3's position
        pts = _points(utc, [
            (1, 1, 0.0, 0.0, 0.0),
            (2, 1, 60.0, 0.0, 5.0),
            (3, 1, 60.0, 0.0, 9.0),
        ])
        r = trajectory_stats(pts).collect()[0]
        assert r["displacement_km"] == pytest.approx(
            _dist_km(0.0, 0.0, 0.0, 9.0), rel=1e-12
        )


def _square(pid, lat0, lat1, lon0, lon1):
    return {
        "poly_id": pid,
        "rings": [[
            {"lat": lat0, "lon": lon0}, {"lat": lat0, "lon": lon1},
            {"lat": lat1, "lon": lon1}, {"lat": lat1, "lon": lon0},
        ]],
    }


@pytest.fixture()
def fences(spark):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame([
            _square("A", 0.0, 10.0, 0.0, 10.0),
            _square("B", 5.0, 15.0, 5.0, 15.0),  # overlaps A
        ]),
        schema="poly_id string, "
               "rings array<array<struct<lat:double, lon:double>>>",
    )


class TestGeofenceVisits:
    def test_islands_reentry_and_overlap(self, utc, fences):
        # entity 1 path: in A, in A, OUT, in A -> two visits to A
        # (reentry); fix at (7,7) is inside BOTH fences
        pts = _points(utc, [
            (1, 1, 0.0, 2.0, 2.0),     # A
            (2, 1, 10.0, 7.0, 7.0),    # A and B
            (3, 1, 20.0, 50.0, 50.0),  # outside both
            (4, 1, 30.0, 3.0, 3.0),    # A again -> NEW visit
        ])
        v = geofence_visits(pts, fences)
        got = sorted(
            (r["poly_id"], r["enter_ts"], r["exit_ts"], r["n_events"])
            for r in v.collect()
        )
        assert got == [
            ("A", _ts(0.0), _ts(10.0), 2),
            ("A", _ts(30.0), _ts(30.0), 1),
            ("B", _ts(10.0), _ts(10.0), 1),
        ]

    def test_entity_isolation(self, utc, fences):
        # consecutive ranks belong to DIFFERENT entities -> no merged runs
        pts = _points(utc, [
            (1, 1, 0.0, 2.0, 2.0),
            (2, 2, 5.0, 2.0, 2.0),
            (3, 1, 10.0, 2.0, 2.0),
        ])
        v = geofence_visits(pts, fences)
        got = sorted((r["user_id"], r["n_events"]) for r in v.collect())
        assert got == [(1, 2), (2, 1)]

    def test_gap_in_fence_rank_not_time(self, utc, fences):
        # the island key is CONSECUTIVE-FIX membership: a long silent gap
        # with no intervening fix does NOT split the visit
        pts = _points(utc, [
            (1, 1, 0.0, 2.0, 2.0),
            (2, 1, 99999.0, 2.5, 2.5),
        ])
        v = geofence_visits(pts, fences).collect()
        assert len(v) == 1 and v[0]["n_events"] == 2

    def test_reserved_column_guard(self, utc, fences):
        pts = _points(utc, [(1, 1, 0.0, 2.0, 2.0)]).withColumn(
            "_traj_rn", F.lit(1)
        )
        with pytest.raises(ValueError, match="_traj_rn"):
            geofence_visits(pts, fences)

    def test_no_cartesian_in_plan(self, utc, fences):
        pts = _points(utc, [(1, 1, 0.0, 2.0, 2.0)])
        plan = geofence_visits(pts, fences)._sc is not None and \
            geofence_visits(pts, fences)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestDedupImages:
    def test_composition_on_fixture(self, spark):
        from geoengine.fixtures import near_dup_images_table
        from geoengine.images import dedup_images

        imgs = near_dup_images_table(spark, 50)
        out = dedup_images(imgs).select(
            "image_id", "cluster_id", "is_keeper"
        )
        got = {r["image_id"]: r for r in out.collect()}
        assert len(got) == 50
        for i in range(50):
            iid = f"img{i:010d}"
            want = i - 1 if i % 5 == 3 else i
            assert got[iid]["cluster_id"] == f"img{want:010d}", iid
            assert got[iid]["is_keeper"] is (i % 5 != 3)


class TestCoLocation:
    def _pts(self, spark, rows):
        return _points(spark, rows)

    def test_semantics_handcrafted(self, utc):
        from geoengine.trajectories import co_location_pairs

        # tau=60s, radius=200km. lon 1 deg at equator ~ 111 km
        pts = _points(utc, [
            (1, 10, 0.0, 0.0, 0.0),
            (2, 20, 30.0, 0.0, 1.0),    # ~111 km, 30 s -> pair with 1
            (3, 30, 300.0, 0.0, 1.0),   # close in space, 300 s -> out
            (4, 40, 10.0, 0.0, 50.0),   # close in time, ~5560 km -> out
            (5, 10, 20.0, 0.0, 0.5),    # same entity as 1 -> excluded
            (6, 50, 60.0, 0.0, 0.2),    # exactly tau from fix 1 -> in (<=)
        ])
        got = sorted(
            (r["seq_a"], r["seq_b"])
            for r in co_location_pairs(pts, 200.0, 60.0).collect()
        )
        # expected: (1,2), (1,6), (2,6) [30s apart, ~89km], (2,5), (5,6)
        # (5 is entity 10 — only its pair with 1 is excluded)
        assert got == [(1, 2), (1, 6), (2, 5), (2, 6), (5, 6)]

    def test_bucket_boundary_pair_found_once(self, utc):
        from geoengine.trajectories import co_location_pairs

        # tau=60: fixes at t=59 and t=61 sit in DIFFERENT buckets, 2 s
        # apart -> must be found, exactly once
        pts = _points(utc, [
            (1, 1, 59.0, 0.0, 0.0),
            (2, 2, 61.0, 0.0, 0.1),
        ])
        rows = co_location_pairs(pts, 50.0, 60.0).collect()
        assert len(rows) == 1
        assert rows[0]["dt_s"] == 2.0

    def test_matches_brute_force(self, utc):
        import numpy as np

        from geoengine.trajectories import co_location_pairs

        rng = np.random.default_rng(7)
        n = 250
        ent = rng.integers(0, 25, n)
        t = rng.uniform(0, 7200, n)
        lat = rng.uniform(-80, 80, n)
        lon = rng.uniform(-179, 179, n)
        pts = _points(utc, [
            (i, int(ent[i]), float(round(t[i], 3)), float(lat[i]),
             float(lon[i]))
            for i in range(n)
        ])
        got = sorted(
            (min(r["seq_a"], r["seq_b"]), max(r["seq_a"], r["seq_b"]))
            for r in co_location_pairs(pts, 400.0, 600.0).collect()
        )
        want = []
        tt = np.round(t, 3)
        for i in range(n):
            for j in range(i + 1, n):
                if ent[i] == ent[j]:
                    continue
                # exact micros like the engine (round to ms first)
                if abs(int(tt[i] * 1e6) - int(tt[j] * 1e6)) > 600_000_000:
                    continue
                if _dist_km(lat[i], lon[i], lat[j], lon[j]) <= 400.0:
                    want.append((i, j))
        assert got == sorted(want)


class TestDedupEmbeddings:
    def test_identical_vector_groups(self, spark):
        from geoengine.similarity import dedup_embeddings

        rows = [
            (1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]),  # dup pair
            (3, [0.0, 1.0, 0.0]),                          # singleton
            (4, [0.0, 0.0, 1.0]), (5, [0.0, 0.0, 2.0]),   # colinear dup
        ]
        df = spark.createDataFrame(
            rows, schema="vec_id long, embedding array<double>"
        )
        out = {r["vec_id"]: r for r in dedup_embeddings(df, 0.99).collect()}
        assert out[1]["cluster_id"] == 1 and out[2]["cluster_id"] == 1
        assert out[3]["cluster_id"] == 3
        assert out[4]["cluster_id"] == 4 and out[5]["cluster_id"] == 4
        keepers = sorted(k for k, r in out.items() if r["is_keeper"])
        assert keepers == [1, 3, 4]


class TestCoLocationPlan:
    def test_no_cartesian(self, utc):
        from geoengine.trajectories import co_location_pairs

        pts = _points(utc, [(1, 1, 0.0, 0.0, 0.0), (2, 2, 1.0, 0.0, 0.1)])
        plan = co_location_pairs(pts, 100.0, 60.0)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestTileFlows:
    def test_transitions_and_rollup(self, utc):
        from geoengine.trajectories import tile_flows

        # zoom 1 -> 2x2 tiles (x from lon halves, y from Mercator lat
        # halves). Entity 1: west->east->east (one move then a self-loop);
        # entity 2 makes the same west->east move.
        pts = _points(utc, [
            (1, 1, 0.0, 0.0, -90.0),   # tile x=0
            (2, 1, 10.0, 0.0, 90.0),   # tile x=1
            (3, 1, 20.0, 0.0, 91.0),   # tile x=1 (self-loop, excluded)
            (4, 2, 0.0, 0.0, -91.0),
            (5, 2, 10.0, 0.0, 95.0),
        ])
        got = tile_flows(pts, 1).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["from_x"], r["to_x"]) == (0, 1)
        assert r["n_moves"] == 2 and r["n_entities"] == 2

    def test_include_self(self, utc):
        from geoengine.trajectories import tile_flows

        pts = _points(utc, [
            (1, 1, 0.0, 0.0, 90.0),
            (2, 1, 10.0, 0.0, 91.0),
        ])
        out = tile_flows(pts, 1, include_self=True).collect()
        assert len(out) == 1 and out[0]["from_x"] == out[0]["to_x"] == 1


class TestStreamingGeofence:
    def test_events_across_batches(self, utc, fences):
        """Enter/exit stream equals the batch visit semantics, with the
        membership state surviving micro-batch boundaries (4 files,
        ts-ordered replay)."""
        from geoengine.streaming import (
            replay_parquet_stream,
            run_stream_to_memory,
            streaming_geofence_events,
        )

        batch = _points(utc, [
            (1, 1, 0.0, 2.0, 2.0),     # enter A
            (2, 1, 10.0, 7.0, 7.0),    # still A; enter B
            (3, 1, 20.0, 50.0, 50.0),  # exit A (ts=10), exit B (ts=10)
            (4, 1, 30.0, 3.0, 3.0),    # enter A again (trailing: no exit)
            (5, 2, 5.0, 12.0, 12.0),   # entity 2: enter B only (trailing)
        ])
        stream, d = replay_parquet_stream(utc, batch, n_files=4,
                                          order_col="ts")
        out = streaming_geofence_events(stream, fences)
        table = run_stream_to_memory(out, "geofence_events_test",
                                     "append", d)
        got = sorted(
            (r["entity"], r["poly_id"], r["event"], r["event_us"] / 1e6)
            for r in table.collect()
        )
        t0 = T0.timestamp()  # UTC pin active -> epoch of T0
        assert got == sorted([
            (1, "A", "enter", t0 + 0.0),
            (1, "B", "enter", t0 + 10.0),
            (1, "A", "exit", t0 + 10.0),
            (1, "B", "exit", t0 + 10.0),
            (1, "A", "enter", t0 + 30.0),
            (2, "B", "enter", t0 + 5.0),
        ])


class TestDwellTimes:
    def test_interval_attribution(self, utc):
        from geoengine.trajectories import dwell_times

        # zoom 1: lon<0 -> tile x=0, lon>0 -> x=1. Intervals attribute to
        # the STARTING fix's tile; the trailing fix contributes nothing.
        pts = _points(utc, [
            (1, 1, 0.0, 0.0, -90.0),   # west for 10 s
            (2, 1, 10.0, 0.0, 90.0),   # east for 5 s
            (3, 1, 15.0, 0.0, 95.0),   # east for 20 s
            (4, 1, 35.0, 0.0, -95.0),  # trailing (west): no interval
        ])
        got = {
            (r["tile_x"]): (r["dwell_s"], r["n_intervals"])
            for r in dwell_times(pts, 1).collect()
        }
        assert got[0] == (10.0, 1)
        assert got[1] == (25.0, 2)

    def test_single_fix_entity_absent(self, utc):
        from geoengine.trajectories import dwell_times

        pts = _points(utc, [(1, 1, 0.0, 0.0, 0.0)])
        assert dwell_times(pts, 1).count() == 0


class TestCoLocationSummary:
    def test_rollup_and_canonical_pair(self, utc):
        from geoengine.trajectories import (
            co_location_pairs,
            co_location_summary,
        )

        pts = _points(utc, [
            (1, 5, 0.0, 0.0, 0.0),
            (2, 3, 10.0, 0.0, 0.5),   # contact with 1 (entity 3 < 5)
            (3, 5, 20.0, 0.0, 1.0),   # contact with 2 again
        ])
        s = co_location_summary(
            co_location_pairs(pts, 200.0, 60.0)
        ).collect()
        assert len(s) == 1
        r = s[0]
        assert (r["ent_1"], r["ent_2"]) == (3, 5)
        assert r["n_contacts"] == 2
        assert r["min_dist_km"] == pytest.approx(
            _dist_km(0.0, 0.5, 0.0, 1.0), rel=1e-12
        )

    def test_validation(self, utc):
        from geoengine.trajectories import co_location_pairs

        pts = _points(utc, [(1, 1, 0.0, 0.0, 0.0)])
        with pytest.raises(ValueError, match="radius_km"):
            co_location_pairs(pts, 0.0, 60.0)
        with pytest.raises(ValueError, match="max_dt_s"):
            co_location_pairs(pts, 10.0, -1.0)


class TestNullCoordinates:
    """greatest/least skip NULLs, so every coordinate path needs explicit
    guards — these pin the module's documented NULL contract."""

    def _null_pts(self, spark):
        return spark.createDataFrame(
            [
                (1, 1, _ts(0.0), 0.0, 0.0),
                (2, 1, _ts(10.0), None, None),   # lost fix
                (3, 1, _ts(20.0), 0.0, 1.0),
            ],
            schema="id long, user_id long, ts timestamp_ntz, "
                   "latitude double, longitude double",
        )

    def test_segment_metrics_null_is_null_not_antipodal(self, utc):
        seg = {r["id"]: r for r in
               segment_metrics(self._null_pts(utc), max_kmh=1e6).collect()}
        # both segments touching the NULL fix: NULL metrics, glitch False
        for i in (2, 3):
            assert seg[i]["seg_km"] is None, i
            assert seg[i]["kmh"] is None, i
            assert seg[i]["is_glitch"] is False, i

    def test_trajectory_stats_skips_null_segments(self, utc):
        r = trajectory_stats(self._null_pts(utc)).collect()[0]
        assert r["path_km"] == 0.0  # both segments NULL -> skipped
        # first/last fixes have real coords -> displacement defined
        assert r["displacement_km"] == pytest.approx(
            _dist_km(0.0, 0.0, 0.0, 1.0), rel=1e-12
        )

    def test_trajectory_stats_null_endpoint_displacement(self, utc):
        pts = utc.createDataFrame(
            [(1, 1, _ts(0.0), None, None), (2, 1, _ts(10.0), 0.0, 1.0)],
            schema="id long, user_id long, ts timestamp_ntz, "
                   "latitude double, longitude double",
        )
        r = trajectory_stats(pts).collect()[0]
        assert r["displacement_km"] is None
        assert r["straightness"] is None

    def test_tile_ops_drop_null_fixes(self, utc):
        from geoengine.trajectories import dwell_times, tile_flows

        pts = self._null_pts(utc)
        flows = tile_flows(pts, 1, include_self=True).collect()
        # the NULL fix is dropped: one transition 1->3 spanning the gap
        assert sum(r["n_moves"] for r in flows) == 1
        dw = dwell_times(pts, 1).collect()
        # interval attributes to fix 1's tile for the FULL 20 s
        assert sum(r["dwell_s"] for r in dw) == 20.0


class TestStreamingGeofenceGenericTypes:
    def test_string_entity_and_int_poly(self, utc):
        import pandas as pd

        from geoengine.streaming import (
            replay_parquet_stream,
            run_stream_to_memory,
            streaming_geofence_events,
        )

        pts = utc.createDataFrame(
            [("devA", 1, _ts(0.0), 2.0, 2.0),
             ("devA", 2, _ts(10.0), 50.0, 50.0)],
            schema="user_id string, id long, ts timestamp_ntz, "
                   "latitude double, longitude double",
        )
        fences = utc.createDataFrame(
            pd.DataFrame([{
                "poly_id": 7,
                "rings": [[{"lat": 0.0, "lon": 0.0}, {"lat": 0.0, "lon": 10.0},
                           {"lat": 10.0, "lon": 10.0}, {"lat": 10.0, "lon": 0.0}]],
            }]),
            schema="poly_id long, "
                   "rings array<array<struct<lat:double, lon:double>>>",
        )
        stream, d = replay_parquet_stream(utc, pts, n_files=2,
                                          order_col="ts")
        out = streaming_geofence_events(stream, fences)
        table = run_stream_to_memory(out, "geofence_generic_test",
                                     "append", d)
        got = sorted((r["entity"], r["poly_id"], r["event"])
                     for r in table.collect())
        assert got == [("devA", 7, "enter"), ("devA", 7, "exit")]


class TestTrajectoryPlanShape:
    def test_stats_single_exchange(self, utc):
        """PLANS.md claim: the entity-key shuffle is paid ONCE and reused
        by the lag window, the first/last frame and the groupBy (partial
        agg rides map-side)."""
        pts = _points(utc, [(1, 1, 0.0, 0.0, 0.0), (2, 1, 1.0, 0.0, 1.0)])
        plan = trajectory_stats(pts)._jdf.queryExecution() \
            .executedPlan().toString()
        n_exchanges = sum(
            1 for line in plan.splitlines()
            if "Exchange" in line.strip()[:12]
        )
        assert n_exchanges == 1, plan


def _brute_staypoints(rows, move_km, min_stay_s):
    """rows: (id, entity, sec, lat, lon) -> list of staypoint tuples via
    a sequential scan twin (drop NULL coords, break on step > move_km)."""
    out = []
    by_ent: dict = {}
    for i, e, s, la, lo in rows:
        if la is None or lo is None:
            continue
        by_ent.setdefault(e, []).append((s, i, la, lo))
    for e, fixes in by_ent.items():
        fixes.sort()
        run: list = []
        for s, i, la, lo in fixes:
            if run and _dist_km(run[-1][2], run[-1][3], la, lo) <= move_km:
                run.append((s, i, la, lo))
            else:
                if run:
                    out.append((e, run))
                run = [(s, i, la, lo)]
        if run:
            out.append((e, run))
    sps = []
    for e, run in out:
        dur = run[-1][0] - run[0][0]
        if dur >= min_stay_s:
            sps.append((
                e,
                float(np.mean([r[2] for r in run])),
                float(np.mean([r[3] for r in run])),
                int(run[0][0] * 1e6) + 1704067200000000,
                int(run[-1][0] * 1e6) + 1704067200000000,
                float(dur),
                len(run),
            ))
    return sorted(sps)


def test_staypoints_matches_brute(spark):
    from geoengine.trajectories import staypoints

    # entity 1: dwell near (10,10) for 3 fixes over 600 s, hop 50 km,
    # dwell again for 2 fixes over 120 s, then a lone far fix
    rows = [
        (1, 1, 0.0, 10.0, 10.0),
        (2, 1, 300.0, 10.001, 10.001),
        (3, 1, 600.0, 10.002, 10.0),
        (4, 1, 900.0, 10.45, 10.0),    # ~50 km hop -> breaks
        (5, 1, 960.0, 10.451, 10.0),
        (6, 1, 1020.0, 10.452, 10.0),
        (7, 1, 1100.0, 60.0, 100.0),   # lone far fix
        # entity 2: NULL coordinate inside a dwell is dropped, run continues
        (10, 2, 0.0, -20.0, 40.0),
        (11, 2, 100.0, None, 40.0),
        (12, 2, 200.0, -20.001, 40.001),
        (13, 2, 400.0, -20.002, 40.0),
    ]
    got = sorted(
        (r["user_id"], r["center_lat"], r["center_lon"], r["enter_us"],
         r["exit_us"], r["duration_s"], r["n_fixes"])
        for r in staypoints(_points(spark, rows), 2.0, 100.0).collect()
    )
    want = _brute_staypoints(rows, 2.0, 100.0)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[6] == w[6]
        assert g[1] == pytest.approx(w[1], abs=1e-9)
        assert g[2] == pytest.approx(w[2], abs=1e-9)
        assert g[3] == w[3] and g[4] == w[4]
        assert g[5] == pytest.approx(w[5])
    # entity 1: first dwell (3 fixes, 600 s) qualifies; second dwell only
    # 120 s >= 100 s qualifies too; lone fix duration 0 -> dropped
    e1 = [g for g in got if g[0] == 1]
    assert [g[6] for g in e1] == [3, 3]


def test_staypoints_validation_and_boundary(spark):
    from geoengine.trajectories import staypoints

    with pytest.raises(ValueError, match="move_km"):
        staypoints(_points(spark, []), 0.0, 10.0)
    with pytest.raises(ValueError, match="min_stay_s"):
        staypoints(_points(spark, []), 1.0, -1.0)
    # boundary: a step of EXACTLY move_km keeps the run (<= rule)
    lat_step = 1.0 / 111.19492664455873  # ~1 km along a meridian
    rows = [(1, 1, 0.0, 0.0, 0.0), (2, 1, 50.0, lat_step, 0.0)]
    d = _dist_km(0.0, 0.0, lat_step, 0.0)
    got = staypoints(_points(spark, rows), d, 0.0).collect()
    assert len(got) == 1 and got[0]["n_fixes"] == 2


def test_staypoint_trips_matches_brute(spark):
    from geoengine.trajectories import staypoint_trips, staypoints

    # entity 1: three dwells separated by long hops; the middle dwell is
    # TOO SHORT (filtered) so the trip spans it; entity 2: single dwell
    # -> no trips
    rows = [
        (1, 1, 0.0, 10.0, 10.0),
        (2, 1, 400.0, 10.001, 10.0),      # dwell A: 400 s
        (3, 1, 500.0, 20.0, 20.0),        # hop
        (4, 1, 550.0, 20.001, 20.0),      # dwell (only 50 s -> filtered)
        (5, 1, 700.0, 30.0, 30.0),        # hop
        (6, 1, 1000.0, 30.001, 30.0),
        (7, 1, 1200.0, 30.0, 30.001),     # dwell B: 500 s
        (10, 2, 0.0, -50.0, -60.0),
        (11, 2, 900.0, -50.001, -60.0),   # lone dwell -> no trip
    ]
    sp = staypoints(_points(spark, rows), 5.0, 100.0)
    got = staypoint_trips(sp).collect()
    assert len(got) == 1
    t = got[0]
    assert t["user_id"] == 1
    assert t["from_seq"] < t["to_seq"]   # gappy seq (filtered run between)
    assert t["to_seq"] - t["from_seq"] == 2
    # depart at dwell A's last fix (t=400), arrive at dwell B's first (700)
    base = 1704067200000000
    assert t["depart_us"] == base + 400_000_000
    assert t["arrive_us"] == base + 700_000_000
    assert t["travel_s"] == pytest.approx(300.0)
    a_lat, a_lon = np.mean([10.0, 10.001]), 10.0
    b_lat = np.mean([30.0, 30.001, 30.0])
    b_lon = np.mean([30.0, 30.0, 30.001])
    assert t["from_lat"] == pytest.approx(a_lat, abs=1e-12)
    assert t["to_lat"] == pytest.approx(b_lat, abs=1e-12)
    assert t["trip_km"] == pytest.approx(
        _dist_km(a_lat, a_lon, b_lat, b_lon), rel=1e-9)


def test_staypoints_null_ts_dropped(spark):
    from geoengine.trajectories import staypoints

    rows = [
        (1, 1, 0.0, 10.0, 10.0),
        (3, 1, 300.0, 10.001, 10.0),
    ]
    df = _points(spark, rows).unionByName(
        spark.createDataFrame(
            [(2, 1, None, 10.0005, 10.0)],
            "id long, user_id long, ts timestamp_ntz, "
            "latitude double, longitude double",
        )
    )
    got = staypoints(df, 2.0, 100.0).collect()
    assert len(got) == 1 and got[0]["n_fixes"] == 2  # NULL-ts fix dropped


def test_positions_at_interpolation(spark):
    from geoengine.trajectories import positions_at

    rows = [
        # entity 1: bracket 100..300 s around at=200 -> f=0.5
        (1, 1, 100.0, 10.0, 20.0),
        (2, 1, 300.0, 12.0, 26.0),
        # entity 2: fix exactly AT the query time -> it is prev (<=),
        # next is the later fix; f=0
        (10, 2, 200.0, -5.0, 7.0),
        (11, 2, 400.0, -9.0, 3.0),
        # entity 3: only fixes BEFORE at -> absent
        (20, 3, 50.0, 1.0, 1.0),
        # entity 4: only fixes AFTER at -> absent
        (30, 4, 250.0, 2.0, 2.0),
        # entity 5: equal-ts tie at prev -> larger seq wins (ts, seq order)
        (40, 5, 100.0, 0.0, 0.0),
        (41, 5, 100.0, 4.0, 8.0),
        (42, 5, 300.0, 8.0, 16.0),
    ]
    at = _ts(200.0)
    got = {r["user_id"]: r
           for r in positions_at(_points(spark, rows), at).collect()}
    assert set(got) == {1, 2, 5}
    assert got[1]["latitude"] == pytest.approx(11.0)
    assert got[1]["longitude"] == pytest.approx(23.0)
    assert got[1]["gap_s"] == pytest.approx(200.0)
    assert got[2]["latitude"] == pytest.approx(-5.0)  # f=0 -> prev exactly
    assert got[2]["prev_us"] % 1_000_000 == 0
    # entity 5: prev = seq 41 (4.0, 8.0), f = 0.5 -> (6.0, 12.0)
    assert got[5]["latitude"] == pytest.approx(6.0)
    assert got[5]["longitude"] == pytest.approx(12.0)
    # max_gap drops the wide bracket of entity 2 (200 s)
    tight = {r["user_id"]
             for r in positions_at(_points(spark, rows), at,
                                   max_gap_s=150.0).collect()}
    assert tight == set()  # entity 1 gap 200, entity 2 gap 200, e5 gap 200
    loose = {r["user_id"]
             for r in positions_at(_points(spark, rows), at,
                                   max_gap_s=250.0).collect()}
    assert loose == {1, 2, 5}


def test_radius_of_gyration_matches_brute(spark):
    from geoengine.trajectories import radius_of_gyration

    rng = np.random.default_rng(13)
    rows = []
    i = 0
    for ent, (bla, blo, spread) in enumerate(
            [(10.0, 20.0, 0.5), (-40.0, 100.0, 5.0), (60.0, -120.0, 0.0)]):
        for _ in range(30):
            rows.append((i, ent, float(i), bla + rng.uniform(-spread, spread),
                         blo + rng.uniform(-spread, spread)))
            i += 1
    got = {r["user_id"]: r
           for r in radius_of_gyration(_points(spark, rows)).collect()}
    by_ent: dict = {}
    for _, e, _, la, lo in rows:
        by_ent.setdefault(e, []).append((la, lo))
    for e, fixes in by_ent.items():
        clat = float(np.mean([a for a, _ in fixes]))
        clon = float(np.mean([b for _, b in fixes]))
        rg = float(np.sqrt(np.mean(
            [_dist_km(a, b, clat, clon) ** 2 for a, b in fixes])))
        r = got[e]
        assert r["n_fixes"] == 30
        assert r["center_lat"] == pytest.approx(clat, abs=1e-12)
        assert r["rg_km"] == pytest.approx(rg, rel=1e-6)
    # zero-spread entity: every fix identical -> rg at the acos noise
    # floor (~1e-4 km), far below any real dispersion
    assert got[2]["rg_km"] < 0.001
    assert got[1]["rg_km"] > got[0]["rg_km"] > 1.0


def test_location_entropy_matches_brute(spark):
    import math

    from geoengine.trajectories import location_entropy

    hb, n = 4, 16
    rows = [
        # entity 1: all fixes in ONE cell -> entropy 0
        *[(i, 1, float(i), 10.0 + i * 0.01, 10.0) for i in range(5)],
        # entity 2: 4 fixes uniformly over 4 distinct far cells -> ln(4)
        (10, 2, 0.0, 0.0, 0.0), (11, 2, 1.0, 0.0, 60.0),
        (12, 2, 2.0, 0.0, 120.0), (13, 2, 3.0, 40.0, 0.0),
        # entity 3: skewed 3-1 over two cells
        (20, 3, 0.0, -30.0, -30.0), (21, 3, 1.0, -30.0, -30.0),
        (22, 3, 2.0, -30.0, -30.0), (23, 3, 3.0, -30.0, -120.0),
    ]
    got = {r["user_id"]: r
           for r in location_entropy(_points(spark, rows), hb).collect()}
    assert got[1]["entropy"] == pytest.approx(0.0, abs=1e-12)
    assert got[1]["n_cells"] == 1
    assert got[2]["entropy"] == pytest.approx(math.log(4.0), rel=1e-12)
    want3 = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert got[3]["entropy"] == pytest.approx(want3, rel=1e-12)
    assert got[3]["n_fixes"] == 4 and got[3]["n_cells"] == 2
