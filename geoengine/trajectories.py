"""Trajectory analytics over timestamped point sequences (north-rule
extension; the reference has no counterpart — its pipeline is pointwise).

Three operators over "entity moves through time" data — the other half of
a geospatial event table, complementing the pointwise tile/cell/radius
surfaces:

- :func:`segment_metrics` — consecutive-point segments per entity:
  great-circle length, elapsed time, speed, and a teleportation/GPS-glitch
  flag (the standard mobility-data cleaning step before any downstream
  aggregation).
- :func:`trajectory_stats` — per-entity rollup: path length, net
  displacement, duration, mean speed, straightness index.
- :func:`geofence_visits` — visit intervals per (entity, polygon):
  point-in-polygon membership (the certified cell-prefiltered ray-cast
  join, pip.py) sessionized into maximal runs of consecutive fixes inside
  the fence, emitting enter/exit timestamps — the geofencing primitive.

Distance kernel is the engine's law-of-cosines R=6371 (exprs.dist_km,
parity constants GeoSearch.scala:150-156).

Timestamps: event tables carry TIMESTAMP_NTZ (no zone). Elapsed-time
columns are computed from ``unix_micros(cast(ts as timestamp))`` — integer
microseconds, so the subtraction is exact — which interprets NTZ in the
SESSION time zone. Differences are zone-invariant except across a DST
transition of the session zone; pin ``spark.sql.session.timeZone`` to UTC
(as the gate queries do) for fully deterministic output.

Input contract: fixes with NULL timestamps are undefined — Spark windows
order NULLS FIRST ascending while DuckDB defaults NULLS LAST, so the
engine and any SQL twin would disagree on where a NULL-ts fix sits in
the sequence; filter them out upstream. NULL coordinates drop silently
on the join-based operators (NULL keys never match), are DROPPED
up-front by the tile-keyed ops (tile_flows, dwell_times — the tile
clamp would otherwise fabricate a corner tile), and produce NULL
segment/displacement metrics on the distance ops (explicitly guarded —
see trajectory_stats).

Scale posture (100 TB of fixes): every operator is pure-Column codegen
over ONE window shuffle keyed by the entity id — lag, row_number and
first/last ride the same sort — and rollups are map-side-combinable
groupBys on the same key, so AQE coalesces post-shuffle partitions and a
hot entity costs only its own row count. No UDFs, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import exprs


def _epoch_us(ts: Column) -> Column:
    """Exact integer microseconds since epoch for an NTZ (or zoned)
    timestamp column; see module docstring for the session-zone caveat."""
    return F.unix_micros(ts.cast("timestamp"))


def segment_metrics(
    points: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "id",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    max_kmh: float | None = None,
) -> DataFrame:
    """Per consecutive-fix segment of each entity's trajectory (ordered by
    ``(ts, seq)`` — the seq tie-break makes equal-timestamp fixes
    deterministic): one output row per segment, keyed by the DESTINATION
    fix.

    Output columns: entity, seq, ts, ``seg_km`` (great-circle length),
    ``dt_s`` (elapsed seconds, exact micros arithmetic), ``kmh`` (NULL when
    ``dt_s == 0`` — co-timestamped fixes have no defined speed), and — when
    ``max_kmh`` is given — ``is_glitch`` (speed above the physical bound,
    OR a zero-dt fix that actually moved: the two teleportation shapes a
    GPS cleaning pass drops). The first fix of each entity emits no row
    (it has no predecessor).
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, seq_col)
    us = _epoch_us(F.col(ts_col))
    seg = points.select(
        entity_col,
        seq_col,
        ts_col,
        F.col(lat_col).alias("_lat"),
        F.col(lon_col).alias("_lon"),
        F.lag(lat_col).over(w).alias("_pla"),
        F.lag(lon_col).over(w).alias("_plo"),
        # first-fix detection must lag a NEVER-NULL column: lagging a
        # coordinate would also drop the successor of a NULL-coordinate
        # fix (which owes a row with NULL metrics, not absence)
        F.lag(seq_col).over(w).alias("_pseq"),
        ((us - F.lag(us).over(w)).cast("double") / 1.0e6).alias("dt_s"),
    ).where(F.col("_pseq").isNotNull())
    # all-four-coordinate guard: greatest/least skip NULLs, so an
    # unguarded NULL endpoint folds the acos clamp to a phantom
    # 20,015-km segment — a NULL-coordinate endpoint yields a NULL
    # segment (the module's documented NULL contract)
    coords_ok = (
        F.col("_pla").isNotNull() & F.col("_plo").isNotNull()
        & F.col("_lat").isNotNull() & F.col("_lon").isNotNull()
    )
    seg = seg.withColumn(
        "seg_km",
        F.when(
            coords_ok,
            exprs.dist_km(
                F.col("_pla"), F.col("_plo"), F.col("_lat"), F.col("_lon")
            ),
        ),
    ).withColumn(
        "kmh",
        F.when(
            F.col("dt_s") > 0.0,
            F.col("seg_km") / (F.col("dt_s") / 3600.0),
        ),
    )
    cols = [entity_col, seq_col, ts_col, "seg_km", "dt_s", "kmh"]
    if max_kmh is not None:
        seg = seg.withColumn(
            "is_glitch",
            # NULL speed (co-timestamped fixes) is not evidence of a
            # glitch: coalesce the over-speed clause so a zero-dt,
            # zero-move fix flags false, not NULL
            F.coalesce(F.col("kmh") > F.lit(float(max_kmh)), F.lit(False))
            | F.coalesce(
                (F.col("dt_s") == 0.0) & (F.col("seg_km") > 0.0),
                F.lit(False),
            ),
        )
        cols.append("is_glitch")
    return seg.select(*cols)


def trajectory_stats(
    points: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "id",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Per-entity trajectory rollup: ``n_points``, ``path_km`` (sum of
    consecutive-fix great-circle segments), ``displacement_km``
    (first fix -> last fix), ``duration_s``, ``avg_kmh`` (path over
    duration; NULL for zero-duration trajectories) and ``straightness``
    (displacement/path in [0,1]; NULL when the entity never moved —
    the standard tortuosity index).

    One window shuffle on the entity key computes lag distances AND
    first/last fix coordinates (``first_value``/``last_value`` over the
    full frame share the window sort); the rollup is a
    map-side-combinable groupBy on the same key.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, seq_col)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    us = _epoch_us(F.col(ts_col))
    la, lo = F.col(lat_col), F.col(lon_col)
    # the NULL-lag first row AND any NULL coordinate must be guarded
    # EXPLICITLY: dist_km's acos clamp uses greatest/least, which IGNORE
    # NULL inputs (in Spark and DuckDB both), so an unguarded NULL folds
    # to acos(-1) — a phantom 20,015-km antipodal segment, not a NULL.
    # NULL-coordinate segments are skipped by the path sum (partial path,
    # module NULL contract).
    seg_ok = (
        F.lag(la).over(w).isNotNull() & F.lag(lo).over(w).isNotNull()
        & la.isNotNull() & lo.isNotNull()
    )
    rows = points.select(
        entity_col,
        F.when(
            seg_ok,
            exprs.dist_km(F.lag(la).over(w), F.lag(lo).over(w), la, lo),
        ).alias("_seg_km"),
        us.alias("_us"),
        F.first(la).over(wf).alias("_f_lat"),
        F.first(lo).over(wf).alias("_f_lon"),
        F.last(la).over(wf).alias("_l_lat"),
        F.last(lo).over(wf).alias("_l_lon"),
    )
    out = rows.groupBy(entity_col).agg(
        F.count("*").alias("n_points"),
        F.coalesce(F.sum("_seg_km"), F.lit(0.0)).alias("path_km"),
        # first/last coords are frame-constant per entity; max() reduces
        # them deterministically without an order-sensitive first().
        # Same NULL guard as the segments: a NULL first/last coordinate
        # means displacement is undefined, not antipodal
        F.when(
            F.max("_f_lat").isNotNull() & F.max("_f_lon").isNotNull()
            & F.max("_l_lat").isNotNull() & F.max("_l_lon").isNotNull(),
            exprs.dist_km(
                F.max("_f_lat"), F.max("_f_lon"),
                F.max("_l_lat"), F.max("_l_lon"),
            ),
        ).alias("displacement_km"),
        ((F.max("_us") - F.min("_us")).cast("double") / 1.0e6).alias(
            "duration_s"
        ),
    )
    return out.withColumn(
        "avg_kmh",
        F.when(
            F.col("duration_s") > 0.0,
            F.col("path_km") / (F.col("duration_s") / 3600.0),
        ),
    ).withColumn(
        "straightness",
        F.when(
            F.col("path_km") > 0.0,
            F.col("displacement_km") / F.col("path_km"),
        ),
    )


def staypoints(
    points: DataFrame,
    move_km: float,
    min_stay_s: float,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "id",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Staypoint detection (the mobility-mining staple behind visit/
    POI inference, Li et al. GIS'08 family) — gaps-and-islands variant:
    order each entity's fixes by ``(ts, seq)``; a fix STARTS A NEW RUN
    when it is the entity's first fix or its great-circle step from the
    previous fix exceeds ``move_km`` (``<=`` keeps, matching the
    engine's radius boundary rule); maximal stationary runs whose exact
    duration (last fix - first fix, integer micros) reaches
    ``min_stay_s`` become staypoints, reported at the run's arithmetic
    centroid.

    NULL-coordinate and NULL-timestamp fixes are DROPPED up front (a
    fix with no time has no place in an ordered trajectory; neither can
    extend nor anchor a run — unlike segment_metrics' NULL-metric
    contract, documented difference; streaming_staypoints applies the
    identical filter, keeping batch==streaming). The arithmetic
    centroid is exact for the
    local clusters staypoints describe; a run hugging the antimeridian
    averages across the +/-180 seam and distorts — known limitation of
    the lat/lon-mean form, acceptable because runs are move_km-local.

    Output: (entity, visit_seq, center_lat, center_lon, enter_us,
    exit_us, duration_s, n_fixes) — enter/exit as exact integer micros
    (the cross-engine-exact time representation the module uses
    throughout); ``visit_seq`` is the entity's 1-based run counter in
    time order — deterministic, and gappy when sub-min_stay runs sit
    between staypoints (:func:`staypoint_trips` orders by it).

    100-TB posture: ONE window shuffle on the entity key (lag + running
    break-count share the sort) + one map-side-combinable groupBy on
    (entity, run) — a hot entity costs its own rows only.
    """
    if not (move_km > 0):
        raise ValueError(f"move_km must be > 0, got {move_km!r}")
    if min_stay_s < 0:
        raise ValueError(f"min_stay_s must be >= 0, got {min_stay_s!r}")
    la, lo = F.col(lat_col), F.col(lon_col)
    pts = points.where(
        la.isNotNull() & lo.isNotNull() & F.col(ts_col).isNotNull()
    )
    w = Window.partitionBy(entity_col).orderBy(ts_col, seq_col)
    step = exprs.dist_km(F.lag(la).over(w), F.lag(lo).over(w), la, lo)
    brk = F.when(
        F.lag(F.col(seq_col)).over(w).isNull() | (step > move_km),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = pts.select(
        entity_col,
        ts_col,
        seq_col,
        la.alias("_lat"),
        lo.alias("_lon"),
        _epoch_us(F.col(ts_col)).alias("_us"),
        brk.alias("_brk"),
    ).withColumn(
        "_run",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sp = runs.groupBy(entity_col, "_run").agg(
        F.avg("_lat").alias("center_lat"),
        F.avg("_lon").alias("center_lon"),
        F.min("_us").alias("enter_us"),
        F.max("_us").alias("exit_us"),
        F.count(F.lit(1)).alias("n_fixes"),
    )
    dur = (
        (F.col("exit_us") - F.col("enter_us")).cast("double") / 1.0e6
    )
    return (
        sp.withColumn("duration_s", dur)
        .where(F.col("duration_s") >= float(min_stay_s))
        .select(
            entity_col, F.col("_run").alias("visit_seq"),
            "center_lat", "center_lon",
            "enter_us", "exit_us", "duration_s", "n_fixes",
        )
    )


def radius_of_gyration(
    points: DataFrame,
    entity_col: str = "user_id",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Radius of gyration per entity — THE classic human-mobility
    dispersion metric (Gonzalez et al., Nature 2008):

        rg = sqrt( mean over fixes of dist_km(fix, centroid)^2 )

    with the centroid as the arithmetic lat/lon mean (the staypoints
    module's documented planar-centroid form — distorts only for
    activity spaces hugging the antimeridian) and the great-circle
    law-of-cosines distance (the reference constant). NULL-coordinate
    fixes are dropped.

    Output: (entity, n_fixes, center_lat, center_lon, rg_km).

    100-TB posture: one map-side-combinable groupBy to the centroid,
    one equi-join back on the entity key, one more groupBy — no
    windows, no quadratics; a hot entity costs its own rows twice.
    """
    la, lo = F.col(lat_col), F.col(lon_col)
    pts = points.where(la.isNotNull() & lo.isNotNull()).select(
        F.col(entity_col).alias("_ent"),
        la.alias("_lat"),
        lo.alias("_lon"),
    )
    cent = pts.groupBy("_ent").agg(
        F.avg("_lat").alias("center_lat"),
        F.avg("_lon").alias("center_lon"),
    )
    d = exprs.dist_km(
        F.col("_lat"), F.col("_lon"),
        F.col("center_lat"), F.col("center_lon"),
    )
    return (
        pts.join(cent, "_ent")
        .groupBy(F.col("_ent").alias(entity_col),
                 "center_lat", "center_lon")
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.sqrt(F.avg(d * d)).alias("rg_km"),
        )
        .select(entity_col, "n_fixes", "center_lat", "center_lon", "rg_km")
    )


def location_entropy(
    points: DataFrame,
    half_bits: int,
    entity_col: str = "user_id",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Shannon entropy of each entity's visited-cell distribution — the
    standard mobility predictability metric (Song et al., Science 2010
    family): with p_c = the fraction of the entity's fixes in grid cell
    c, entropy = -sum_c p_c * ln(p_c) (natural log; 0 for an entity that
    never leaves one cell, ln(k) for k uniformly visited cells).

    Output: (entity, n_fixes, n_cells, entropy).

    100-TB posture: one groupBy to the per-(entity, cell) histogram,
    one groupBy to the entity rollup — the entropy sum folds p*ln(p)
    map-side; no joins, no windows.
    """
    from .join import with_grid_cell

    la, lo = F.col(lat_col), F.col(lon_col)
    pts = points.where(la.isNotNull() & lo.isNotNull()).select(
        F.col(entity_col).alias("_ent"),
        la.alias("latitude"),
        lo.alias("longitude"),
    )
    hist = (
        with_grid_cell(pts, half_bits, out="_cell")
        .groupBy("_ent", "_cell")
        .agg(F.count(F.lit(1)).alias("_k"))
    )
    # p*ln(p) per cell needs the entity total: one window-free route is
    # a second groupBy after attaching totals — but sum(k*ln(k)) and
    # total decompose: H = ln(n) - sum(k*ln(k))/n  (exact algebra, and
    # both terms fold map-side without a join)
    kd = F.col("_k").cast("double")
    ent = hist.groupBy(F.col("_ent").alias(entity_col)).agg(
        F.sum("_k").alias("n_fixes"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(kd * F.log(kd)).alias("_klnk"),
    )
    nd = F.col("n_fixes").cast("double")
    return ent.select(
        entity_col, "n_fixes", "n_cells",
        (F.log(nd) - F.col("_klnk") / nd).alias("entropy"),
    )


def positions_at(
    points: DataFrame,
    at_ts,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "id",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    max_gap_s: float | None = None,
) -> DataFrame:
    """Trajectory SNAPSHOT: where was every entity at time ``at_ts``?
    Linear time interpolation between the bracketing fixes — prev = the
    entity's last fix with ts <= at (deterministic (ts, seq) tie-break),
    next = its first fix with ts > at:

        f   = (at_us - prev_us) / (next_us - prev_us)   (exact micros)
        lat = prev_lat + (next_lat - prev_lat) * f       (same for lon)

    INTERIOR interpolation only: entities without both brackets (first
    fix after ``at``, or last fix before it) are absent — inner
    semantics, like idw_interpolate. ``max_gap_s`` optionally drops
    brackets wider than trustworthy. The strict prev<=at<next split
    makes next_us > prev_us always (no zero division). Coordinate
    interpolation is planar in lat/lon — a bracket crossing the
    antimeridian distorts (the staypoints centroid's documented
    limitation; brackets are short in practice). NULL coordinate/ts
    fixes are dropped.

    100-TB posture: two map-side-combinable groupBys (max_by / min_by —
    no window sort) + one equi-join on the entity key; the time filters
    push to the scan.
    """
    at_us = F.unix_micros(F.lit(at_ts).cast("timestamp"))
    la, lo = F.col(lat_col), F.col(lon_col)
    base = points.where(
        la.isNotNull() & lo.isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(entity_col).alias("_ent"),
        _epoch_us(F.col(ts_col)).alias("_us"),
        F.col(seq_col).alias("_seq"),
        la.alias("_lat"),
        lo.alias("_lon"),
    )
    fix = F.struct(F.col("_us"), F.col("_lat"), F.col("_lon"))
    order = F.struct(F.col("_us"), F.col("_seq"))
    prevs = (
        base.where(F.col("_us") <= at_us)
        .groupBy("_ent")
        .agg(F.max_by(fix, order).alias("_p"))
    )
    nexts = (
        base.where(F.col("_us") > at_us)
        .groupBy("_ent")
        .agg(F.min_by(fix, order).alias("_n"))
    )
    j = prevs.join(nexts, "_ent")
    p, n = F.col("_p"), F.col("_n")
    gap = (n.getField("_us") - p.getField("_us")).cast("double") / 1.0e6
    if max_gap_s is not None:
        j = j.where(gap <= float(max_gap_s))
    f = (
        (at_us - p.getField("_us")).cast("double")
        / (n.getField("_us") - p.getField("_us")).cast("double")
    )
    lat_i = p.getField("_lat") + (n.getField("_lat") - p.getField("_lat")) * f
    lon_i = p.getField("_lon") + (n.getField("_lon") - p.getField("_lon")) * f
    return j.select(
        F.col("_ent").alias(entity_col),
        lat_i.alias("latitude"),
        lon_i.alias("longitude"),
        p.getField("_us").alias("prev_us"),
        n.getField("_us").alias("next_us"),
        gap.alias("gap_s"),
    )


def staypoint_trips(
    visits: DataFrame,
    entity_col: str = "user_id",
) -> DataFrame:
    """Origin-destination TRIPS between an entity's consecutive
    staypoints (the visit layer of the mobility stack: staypoints say
    WHERE you stopped, trips say how you moved between stops).

    ``visits`` is :func:`staypoints` output (or any table with
    visit_seq/center_lat/center_lon/enter_us/exit_us). Each consecutive
    visit pair (by ``visit_seq``) yields one trip: depart at the origin
    visit's exit, arrive at the destination visit's enter, great-circle
    distance between the two centroids. Sub-min_stay pauses between the
    two staypoints are part of the trip by construction (visit_seq is
    gappy there — standard semantics).

    Output: (entity, from_seq, to_seq, from_lat, from_lon, to_lat,
    to_lon, depart_us, arrive_us, travel_s, trip_km). travel_s >= 0
    always (runs partition each entity's time-ordered fixes).

    100-TB posture: one window (lead) on the entity key over the
    already-aggregated visit table — rows = staypoints, not fixes.
    """
    w = Window.partitionBy(entity_col).orderBy("visit_seq")
    trips = visits.select(
        entity_col,
        F.col("visit_seq").alias("from_seq"),
        F.lead("visit_seq").over(w).alias("to_seq"),
        F.col("center_lat").alias("from_lat"),
        F.col("center_lon").alias("from_lon"),
        F.lead("center_lat").over(w).alias("to_lat"),
        F.lead("center_lon").over(w).alias("to_lon"),
        F.col("exit_us").alias("depart_us"),
        F.lead("enter_us").over(w).alias("arrive_us"),
    ).where(F.col("to_seq").isNotNull())
    return trips.select(
        "*",
        ((F.col("arrive_us") - F.col("depart_us")).cast("double") / 1.0e6)
        .alias("travel_s"),
        exprs.dist_km(
            F.col("from_lat"), F.col("from_lon"),
            F.col("to_lat"), F.col("to_lon"),
        ).alias("trip_km"),
    )


def tile_flows(
    points: DataFrame,
    zoom: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "id",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    include_self: bool = False,
) -> DataFrame:
    """Origin-destination flow matrix at slippy-tile resolution: each
    entity's consecutive-fix transitions rolled up to (from_tile,
    to_tile) counts — the transport-analytics OD primitive.

    Output: (from_x, from_y, to_x, to_y, n_moves, n_entities). Self-loops
    (consecutive fixes in the same tile) are excluded unless
    ``include_self`` — an OD matrix usually wants movements, not dwell.

    Same one-window-shuffle shape as segment_metrics: lag over the
    entity's (ts, seq) sort, then a map-side-combinable groupBy on the
    tile pair. Pure Column codegen end to end. NULL-coordinate fixes are
    DROPPED before windowing (the tile clamp would otherwise fabricate a
    corner tile for them — greatest/least skip NULLs); the transition
    then spans the gap.
    """
    points = points.where(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    )
    w = Window.partitionBy(entity_col).orderBy(ts_col, seq_col)
    tx = exprs.tile_x(F.col(lon_col), zoom)
    ty = exprs.tile_y(F.col(lat_col), zoom)
    moves = points.select(
        F.col(entity_col).alias("_ent"),
        F.lag(tx).over(w).alias("from_x"),
        F.lag(ty).over(w).alias("from_y"),
        tx.alias("to_x"),
        ty.alias("to_y"),
    ).where(F.col("from_x").isNotNull())
    if not include_self:
        moves = moves.where(
            (F.col("from_x") != F.col("to_x"))
            | (F.col("from_y") != F.col("to_y"))
        )
    return moves.groupBy("from_x", "from_y", "to_x", "to_y").agg(
        F.count("*").alias("n_moves"),
        F.countDistinct("_ent").alias("n_entities"),
    )


def dwell_times(
    points: DataFrame,
    zoom: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "id",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Time spent per (entity, tile): each inter-fix interval is
    attributed to the tile of the interval's STARTING fix — the entity
    was last seen there until the next fix arrived. The trailing fix has
    no interval and contributes nothing (same open-tail contract as the
    sessionize/geofence ops).

    Output: (entity, tile_x, tile_y, dwell_s, n_intervals). ``dwell_s``
    sums EXACT integer microseconds before one final divide, so parity
    holds bit-for-bit at any row count. One window shuffle + one groupBy
    on (entity, tile) — all-Column codegen. NULL-coordinate fixes are
    DROPPED before windowing (same contract as tile_flows); the interval
    then attributes to the last located fix.
    """
    points = points.where(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    )
    w = Window.partitionBy(entity_col).orderBy(ts_col, seq_col)
    us = _epoch_us(F.col(ts_col))
    rows = points.select(
        F.col(entity_col).alias("_ent"),
        exprs.tile_x(F.col(lon_col), zoom).alias("tile_x"),
        exprs.tile_y(F.col(lat_col), zoom).alias("tile_y"),
        (F.lead(us).over(w) - us).alias("_dwell_us"),
    ).where(F.col("_dwell_us").isNotNull())
    return (
        rows.groupBy(F.col("_ent").alias(entity_col), "tile_x", "tile_y")
        .agg(
            (F.sum("_dwell_us").cast("double") / 1.0e6).alias("dwell_s"),
            F.count("*").alias("n_intervals"),
        )
    )


def co_location_summary(pairs: DataFrame) -> DataFrame:
    """Entity-pair contact rollup over :func:`co_location_pairs` output:
    one row per unordered entity pair with the contact count and the
    closest observed approach. Pair identity is canonicalized by entity
    id (ent_1 < ent_2), independent of the pair stage's bucket/seq
    orientation."""
    e1 = F.least("ent_a", "ent_b").alias("ent_1")
    e2 = F.greatest("ent_a", "ent_b").alias("ent_2")
    return pairs.groupBy(e1, e2).agg(
        F.count("*").alias("n_contacts"),
        F.min("dist_km").alias("min_dist_km"),
    )


def co_location_pairs(
    points: DataFrame,
    radius_km: float,
    max_dt_s: float,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "id",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    half_bits: int | None = None,
) -> DataFrame:
    """Spatio-temporal co-location (contact) join: every pair of fixes
    from DIFFERENT entities within ``radius_km`` great-circle km AND
    ``max_dt_s`` seconds of each other — the contact-tracing /
    co-movement primitive.

    Output, one row per qualifying unordered fix pair: ``entity_a, seq_a,
    entity_b, seq_b`` (side *a* is the earlier time bucket, or the smaller
    seq within a bucket — a deterministic orientation), ``dist_km``,
    ``dt_s`` (absolute elapsed seconds, exact micros arithmetic).

    Plan — a single int64 equi-join, NEVER all-pairs, the same shape as
    the radius join (join.py) with time folded into the key:

    - every fix gets its time bucket ``tb = floor(us / max_dt_s)``; a pair
      within ``max_dt_s`` differs by at most one bucket, so the probe side
      explodes to ``{{tb, tb-1}}`` and the join matches build ``tb``;
    - the probe side also explodes to the covering grid cells of its
      radius circle (join.explode_covering_cells — coverage-safe at the
      worst-case latitude), the build side carries its single cell;
    - join key = (cell, bucket); each unordered pair survives exactly ONCE
      by construction: probe-bucket > build-bucket keeps cross-bucket
      pairs in one orientation, probe-seq > build-seq orients same-bucket
      pairs — no distinct needed;
    - exact |dt| and great-circle refinements ride the join, codegen'd.

    100-TB posture: shuffle is keyed on (cell, bucket) — hot places at hot
    times are real skew, so AQE skew-join applies; fanout is the covering
    grid (~9-25 cells) x 2 buckets on the probe side only. Entities
    co-located with THEMSELVES (consecutive own fixes) are excluded.
    Fixes with NULL coordinates or NULL timestamps drop silently (a NULL
    cell/bucket key never matches — same contract as the radius join's
    validate_points filter).
    """
    from .join import explode_covering_cells, pick_half_bits, with_grid_cell

    if not float(radius_km) > 0.0:
        raise ValueError(f"radius_km must be > 0, got {radius_km}")
    if not float(max_dt_s) * 1_000_000 >= 1.0:
        # the bucket key divides by integer microseconds: sub-microsecond
        # windows truncate to 0 and would divide by zero downstream
        raise ValueError(
            f"max_dt_s must be >= 1 microsecond, got {max_dt_s}"
        )
    hb = pick_half_bits(radius_km) if half_bits is None else half_bits
    us = _epoch_us(F.col(ts_col))
    tau_us = int(float(max_dt_s) * 1_000_000)
    base = points.select(
        F.col(entity_col).alias("_ent"),
        F.col(seq_col).alias("_seq"),
        F.col(lat_col).alias("latitude"),
        F.col(lon_col).alias("longitude"),
        us.alias("_us"),
        F.floor(us / F.lit(tau_us)).alias("_tb"),
    )
    build = with_grid_cell(base, hb).select(
        F.col("_ent").alias("ent_a"), F.col("_seq").alias("seq_a"),
        F.col("latitude").alias("_lat_a"), F.col("longitude").alias("_lon_a"),
        F.col("_us").alias("_us_a"), F.col("_tb").alias("_tb_a"), "gkey",
    )
    probe = (
        explode_covering_cells(base, radius_km, hb)
        .withColumn("_tkey", F.explode(F.array(F.col("_tb"),
                                               F.col("_tb") - 1)))
        .select(
            F.col("_ent").alias("ent_b"), F.col("_seq").alias("seq_b"),
            F.col("latitude").alias("_lat_b"),
            F.col("longitude").alias("_lon_b"),
            F.col("_us").alias("_us_b"), F.col("_tb").alias("_tb_b"),
            "gkey", "_tkey",
        )
    )
    joined = build.join(
        probe,
        (build["gkey"] == probe["gkey"]) & (build["_tb_a"] == probe["_tkey"]),
    )
    d = exprs.dist_km(
        F.col("_lat_a"), F.col("_lon_a"), F.col("_lat_b"), F.col("_lon_b")
    )
    dt_us = F.abs(F.col("_us_b") - F.col("_us_a"))
    return (
        joined.where(
            (
                (F.col("_tb_b") > F.col("_tb_a"))
                | (
                    (F.col("_tb_b") == F.col("_tb_a"))
                    & (F.col("seq_b") > F.col("seq_a"))
                )
            )
            & (F.col("ent_a") != F.col("ent_b"))
            & (dt_us <= F.lit(tau_us))
            & (d <= F.lit(float(radius_km)))
        )
        .select(
            "ent_a", "seq_a", "ent_b", "seq_b",
            d.alias("dist_km"),
            (dt_us.cast("double") / 1.0e6).alias("dt_s"),
        )
    )


def geofence_visits(
    points: DataFrame,
    polygons: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "id",
    half_bits: int = 8,
    poly_id: str = "poly_id",
    rings_col: str = "rings",
) -> DataFrame:
    """Visit intervals: one row per maximal run of consecutive fixes (in
    the entity's global ``(ts, seq)`` order) that lie inside a polygon.

    ``points``: (seq, entity, ts, latitude, longitude); ``polygons``:
    the multi-ring table pip.points_in_multipolygons takes. Output:
    (entity, poly_id, enter_ts, exit_ts, n_events). A fix inside two
    fences contributes to both; leaving for even one fix and returning
    opens a NEW visit (classic gaps-and-islands semantics — the island
    key is ``global_rank - within-fence rank``, constant exactly on
    consecutive-membership runs).

    Plan: one window shuffle ranks each entity's fixes; membership is the
    certified cell-prefiltered PIP join — a planner-chosen equi-join on
    the slim covering frame plus a size-gated broadcast hint for the
    per-distinct-geometry attach (points_in_multipolygons), never a
    cartesian; a second window on (entity, polygon) + one groupBy build
    the islands. Hot fences cost their own membership rows only.
    """
    from .pip import points_in_multipolygons

    for reserved in ("_traj_rn", "_traj_grp"):
        if reserved in points.columns:
            raise ValueError(
                f"geofence_visits uses an internal {reserved!r} column but "
                "points already has one — rename or drop it first"
            )
    w_all = Window.partitionBy(entity_col).orderBy(ts_col, seq_col)
    ranked = points.withColumn("_traj_rn", F.row_number().over(w_all))
    hits = points_in_multipolygons(
        ranked,
        polygons,
        half_bits=half_bits,
        point_id=seq_col,
        poly_id=poly_id,
        rings_col=rings_col,
        keep=(entity_col, ts_col, "_traj_rn"),
    )
    w_pp = Window.partitionBy(entity_col, poly_id).orderBy("_traj_rn")
    isl = hits.withColumn(
        "_traj_grp", F.col("_traj_rn") - F.row_number().over(w_pp)
    )
    return (
        isl.groupBy(entity_col, poly_id, "_traj_grp")
        .agg(
            F.min(ts_col).alias("enter_ts"),
            F.max(ts_col).alias("exit_ts"),
            F.count("*").alias("n_events"),
        )
        .drop("_traj_grp")
    )
