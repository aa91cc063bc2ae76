"""Geospatial operators: grid-cell bucketed radius joins and
nearest-neighbor search over (lat, lon) columns.

The reference engine (/root/reference/script.js) ships no geospatial
machinery; its sites are opaque ``SiteCode`` strings.  A fleet-scale
deployment of the same people-counter pipeline immediately needs the
classic geo primitives this module provides:

* **Radius join** — "which suppliers (sensors / stores / depots) lie
  within R km of each customer" — the workhorse behind coverage checks,
  territory assignment, and proximity features for training data.
* **Bounded nearest neighbor** — "the closest facility within R km,
  else none" — the serving-side variant of the same join.
* **Containment join** — "which service rectangles cover this point"
  (admin regions, tiles, geofences) — the other classic spatial join,
  where the replicated side's blow-up is its AREA in cells.

Scale design (100 TB posture) — the naive form is a cross join
(|L|·|R| haversine evaluations; dead at even GB scale).  Instead:

1. Assign the SMALLER side to fixed lat/lon grid cells sized so one
   cell ≥ the search radius in both axes, REPLICATED to its 3×3
   neighborhood (9 rows per entity; constant blow-up, map-side).
2. The larger side computes its single exact cell id — no replication
   where the data is big.
3. Equi-join on ``(lat_cell, lon_cell)`` — a plain shuffle/broadcast
   hash join Catalyst can plan (AQE broadcasts the replicated dim at
   small scale; at 100 TB both sides shuffle on the cell key).
4. Post-filter by true haversine distance — the cell join is a
   superset of the radius ball by construction, never a subset.

Longitude wraps at the antimeridian: cell indices are taken modulo the
cell count so a probe at lon=179.9° meets candidates at −179.9°.
Latitude needs no wrap (the synthetic domain stays off the poles, and
real deployments clamp |lat| ≤ 85 like web mercator).  Empty-ocean /
dense-city cell skew is real at scale: the cell key composes with the
existing salting lever (operators/skew.py) if one cell dominates; AQE
skew-join splitting covers the moderate case.

Cell sizing: 1° latitude ≈ 110.57 km everywhere; 1° longitude ≈
111.32·cos(lat) km.  With |lat| ≤ 60° (cos ≥ 0.5) the conservative
constants 110 km/° (lat) and 55 km/° (lon) make every cell at least
R in both axes, so the 3×3 neighborhood provably covers the R-ball.

The fixture tables carry no coordinates, so both the Spark builders and
the DuckDB oracles derive them from the integer keys with IDENTICAL
pure-arithmetic formulas (no trig, no hashing — bit-exact in any
IEEE-754 engine):

    lat = -60  + ((key * 7919)   % 120000) / 1000.0     # [-60, 60)
    lon = -180 + ((key * 104729) % 360000) / 1000.0     # [-180, 180)

Haversine itself uses sin/cos/asin (correctly-rounded to ~1 ulp in both
the JVM and libm); every surfaced distance is rounded well above ulp
noise and ranking ties break on the rounded distance then the key.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table

EARTH_RADIUS_KM = 6371.0
#: conservative km per degree of latitude (true value ≈ 110.57)
KM_PER_DEG_LAT = 110.0
#: conservative km per degree of longitude at |lat| ≤ 60° (≈ 55.66 there)
KM_PER_DEG_LON = 55.0


def synthetic_coords(key: Column) -> tuple[Column, Column]:
    """Deterministic (lat, lon) from an integer key — pure int/float
    arithmetic so any SQL engine replays it bit-exactly."""
    lat = F.lit(-60.0) + ((key * F.lit(7919)) % F.lit(120000)) / F.lit(1000.0)
    lon = (
        F.lit(-180.0)
        + ((key * F.lit(104729)) % F.lit(360000)) / F.lit(1000.0)
    )
    return lat, lon


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine form — numerically stable
    for the small angles a radius join filters on)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def _cell_cols(radius_km: float) -> tuple[float, float, int]:
    """(lat cell size °, lon cell size °, lon cell count) for a radius.

    Longitude cells must tile 360° EXACTLY UNIFORMLY: with a narrower
    partial seam cell, two points within R could straddle it and land
    two cell indices apart, escaping the 3×3 neighborhood.  So the cell
    count rounds DOWN (each cell ≥ the minimum width) and the width is
    360/n — uniform and still radius-covering.
    """
    lat_deg = radius_km / KM_PER_DEG_LAT
    n_lon = max(1, int(math.floor(360.0 * KM_PER_DEG_LON / radius_km)))
    lon_deg = 360.0 / n_lon
    return lat_deg, lon_deg, n_lon


def cell_radius_join(
    probe: DataFrame,
    candidates: DataFrame,
    radius_km: float,
    probe_lat: str = "lat",
    probe_lon: str = "lon",
    cand_lat: str = "c_lat",
    cand_lon: str = "c_lon",
) -> DataFrame:
    """All (probe, candidate) pairs within ``radius_km``, via a grid-cell
    equi-join instead of a cross join.

    ``candidates`` (the smaller side) is replicated to its 3×3 cell
    neighborhood; ``probe`` (the big side) computes one exact cell and
    equi-joins — O(|probe| + 9·|candidates|) rows into a hash join,
    never |probe|·|candidates|.  Longitude cells wrap modulo the cell
    count so the antimeridian seam loses no pairs.  Output keeps every
    input column plus ``dist_km`` (unrounded).
    """
    lat_deg, lon_deg, n_lon = _cell_cols(radius_km)

    def lat_cell(c: Column) -> Column:
        return F.floor((c + F.lit(90.0)) / F.lit(lat_deg)).cast("int")

    def lon_cell(c: Column) -> Column:
        return (
            F.floor((c + F.lit(180.0)) / F.lit(lon_deg)).cast("int")
            % F.lit(n_lon)
        )

    # Replicate the small side to its 9 neighbor cells (lon wraps).
    offsets = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(dlat).alias("dlat"), F.lit(dlon).alias("dlon")
                )
                for dlat in (-1, 0, 1)
                for dlon in (-1, 0, 1)
            ]
        )
    )
    cand9 = (
        candidates.withColumn("_o", offsets)
        .withColumn(
            "_lat_cell", lat_cell(F.col(cand_lat)) + F.col("_o.dlat")
        )
        .withColumn(
            "_lon_cell",
            (lon_cell(F.col(cand_lon)) + F.col("_o.dlon") + F.lit(n_lon))
            % F.lit(n_lon),
        )
        .drop("_o")
    )
    probed = probe.withColumn(
        "_lat_cell", lat_cell(F.col(probe_lat))
    ).withColumn("_lon_cell", lon_cell(F.col(probe_lon)))
    dist = haversine_km(
        F.col(probe_lat), F.col(probe_lon), F.col(cand_lat), F.col(cand_lon)
    )
    return (
        probed.join(cand9, ["_lat_cell", "_lon_cell"])
        .withColumn("dist_km", dist)
        # Membership on the 6-dp-ROUNDED distance: JVM Math vs libm sin/cos
        # can differ by ulps, and a pair within ulps of exactly radius_km
        # could otherwise be included by one engine and excluded by the
        # other, changing the row SET (ADVICE r09 #3).  6 dp sits far
        # above ulp noise and far below the data's distance granularity.
        .where(F.round(F.col("dist_km"), 6) <= F.lit(float(radius_km)))
        .drop("_lat_cell", "_lon_cell")
    )


def cell_radius_join_salted(
    probe: DataFrame,
    candidates: DataFrame,
    radius_km: float,
    probe_lat: str = "lat",
    probe_lon: str = "lon",
    cand_lat: str = "c_lat",
    cand_lon: str = "c_lon",
    n_salt: int = 8,
) -> DataFrame:
    """Hot-cell-safe :func:`cell_radius_join` — identical output rows.

    Dense-city skew (one grid cell holding most of the PROBE side) makes
    the plain cell equi-join a straggler: one shuffle partition receives
    the hot cell's entire probe mass.  Standard join salting fixes it
    because the cell join is a pure equi-join (no aggregation to split):

    1. each probe row gets a DETERMINISTIC salt from its coordinates —
       the hot cell's probes spread over ``n_salt`` reduce tasks;
    2. the replicated candidate side duplicates each of its 9 neighbor
       rows across ALL ``n_salt`` salts (blow-up 9·n_salt, still riding
       the SMALL side);
    3. equi-join on (lat_cell, lon_cell, salt) + the same rounded
       haversine membership filter.

    Measured under 80 %-one-cell probe skew in SCALE.md sweep 35.
    """
    lat_deg, lon_deg, n_lon = _cell_cols(radius_km)

    def lat_cell(c: Column) -> Column:
        return F.floor((c + F.lit(90.0)) / F.lit(lat_deg)).cast("int")

    def lon_cell(c: Column) -> Column:
        return (
            F.floor((c + F.lit(180.0)) / F.lit(lon_deg)).cast("int")
            % F.lit(n_lon)
        )

    offsets = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(dlat).alias("dlat"),
                    F.lit(dlon).alias("dlon"),
                    F.lit(s).alias("salt"),
                )
                for dlat in (-1, 0, 1)
                for dlon in (-1, 0, 1)
                for s in range(n_salt)
            ]
        )
    )
    cand9 = (
        candidates.withColumn("_o", offsets)
        .withColumn(
            "_lat_cell", lat_cell(F.col(cand_lat)) + F.col("_o.dlat")
        )
        .withColumn(
            "_lon_cell",
            (lon_cell(F.col(cand_lon)) + F.col("_o.dlon") + F.lit(n_lon))
            % F.lit(n_lon),
        )
        .withColumn("_salt", F.col("_o.salt"))
        .drop("_o")
    )
    probed = (
        probe.withColumn("_lat_cell", lat_cell(F.col(probe_lat)))
        .withColumn("_lon_cell", lon_cell(F.col(probe_lon)))
        .withColumn(
            "_salt",
            F.pmod(
                F.xxhash64(F.col(probe_lat), F.col(probe_lon)),
                F.lit(n_salt),
            ).cast("int"),
        )
    )
    dist = haversine_km(
        F.col(probe_lat), F.col(probe_lon), F.col(cand_lat), F.col(cand_lon)
    )
    return (
        probed.join(cand9, ["_lat_cell", "_lon_cell", "_salt"])
        .withColumn("dist_km", dist)
        .where(F.round(F.col("dist_km"), 6) <= F.lit(float(radius_km)))
        .drop("_lat_cell", "_lon_cell", "_salt")
    )


# --- fixture wiring: customers probe, suppliers are the dim --------------

#: search radius for the registry queries (km).  ~100 suppliers spread
#: over the |lat|<60 band (~4.4e8 km²) give each customer an expected
#: 0.5-ish supplier within 800 km — non-trivial matches at sf0.01
#: without being all-pairs.
RADIUS_KM = 800.0

_COORD_SQL = """
    cust AS (
        SELECT c_custkey,
               -60.0  + ((c_custkey * 7919)   % 120000) / 1000.0 AS lat,
               -180.0 + ((c_custkey * 104729) % 360000) / 1000.0 AS lon
        FROM customer
    ),
    supp AS (
        SELECT s_suppkey,
               -60.0  + ((s_suppkey * 7919)   % 120000) / 1000.0 AS c_lat,
               -180.0 + ((s_suppkey * 104729) % 360000) / 1000.0 AS c_lon
        FROM supplier
    ),
    pairs AS (
        SELECT c.c_custkey, s.s_suppkey,
               2.0 * 6371.0 * ASIN(SQRT(
                   POWER(SIN(RADIANS(s.c_lat - c.lat) / 2), 2)
                   + COS(RADIANS(c.lat)) * COS(RADIANS(s.c_lat))
                     * POWER(SIN(RADIANS(s.c_lon - c.lon) / 2), 2)
               )) AS dist_km
        FROM cust c CROSS JOIN supp s
    )
"""


def _customers_with_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    lat, lon = synthetic_coords(F.col("c_custkey"))
    return c.withColumn("lat", lat).withColumn("lon", lon)


def _suppliers_with_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    lat, lon = synthetic_coords(F.col("s_suppkey"))
    return s.withColumn("c_lat", lat).withColumn("c_lon", lon)


@register(
    "geo_supplier_radius_count",
    # the oracle is the textbook cross join — the engine must match it
    # while never materializing the all-pairs set
    oracle="WITH "
    + _COORD_SQL
    + f"""
    SELECT c_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_within,
           ROUND(MIN(dist_km), 3) AS min_dist_km
    FROM pairs
    WHERE ROUND(dist_km, 6) <= {RADIUS_KM}
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def geo_supplier_radius_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-customer count of suppliers within RADIUS_KM plus the nearest
    distance — the coverage-check radius join, grid-bucketed (9× dim
    replication + one equi-join), never a cross join."""
    pairs = cell_radius_join(
        _customers_with_coords(spark, sf_dir),
        _suppliers_with_coords(spark, sf_dir),
        RADIUS_KM,
    )
    return (
        pairs.groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_within"),
            F.round(F.min("dist_km"), 3).alias("min_dist_km"),
        )
        .orderBy("c_custkey")
    )


@register(
    "geo_nearest_supplier",
    oracle="WITH "
    + _COORD_SQL
    + f""",
    ranked AS (
        SELECT c_custkey, s_suppkey, dist_km,
               ROW_NUMBER() OVER (
                   PARTITION BY c_custkey
                   ORDER BY ROUND(dist_km, 6), s_suppkey
               ) AS rn
        FROM pairs
        WHERE ROUND(dist_km, 6) <= {RADIUS_KM}
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey,
           ROUND(dist_km, 3) AS dist_km
    FROM ranked WHERE rn = 1
    ORDER BY c_custkey
    """,
)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded nearest neighbor: the closest supplier within RADIUS_KM
    per customer (customers with none drop out).  Ties rank on the
    6-dp-rounded distance then supplier key, so the winner is
    engine-independent.  Same grid-bucketed candidate join as the
    radius count; the argmin is one window over the survivors."""
    pairs = cell_radius_join(
        _customers_with_coords(spark, sf_dir),
        _suppliers_with_coords(spark, sf_dir),
        RADIUS_KM,
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.round(F.col("dist_km"), 6), F.col("s_suppkey")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("s_suppkey").alias("nearest_suppkey"),
            F.round("dist_km", 3).alias("dist_km"),
        )
        .orderBy("c_custkey")
    )


@register(
    "geo_cell_density",
    oracle="""
    WITH supp AS (
        SELECT s_suppkey, s_acctbal,
               -60.0  + ((s_suppkey * 7919)   % 120000) / 1000.0 AS lat,
               -180.0 + ((s_suppkey * 104729) % 360000) / 1000.0 AS lon
        FROM supplier
    )
    SELECT CAST(FLOOR((lat + 90.0) / 5.0) AS INT) AS lat_cell,
           CAST(FLOOR((lon + 180.0) / 5.0) AS INT) AS lon_cell,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(AVG(s_acctbal), 4) AS avg_acctbal
    FROM supp
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier density per 5° grid cell — the spatial rollup that
    feeds cell-skew diagnostics (which cells would need salting) and
    partition layout choices for a geo-partitioned table.  Map-side
    cell assignment, one aggregate; at scale this is the query you run
    BEFORE picking the radius-join partitioning."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal"
    )
    lat, lon = synthetic_coords(F.col("s_suppkey"))
    return (
        s.withColumn(
            "lat_cell",
            F.floor((lat + F.lit(90.0)) / F.lit(5.0)).cast("int"),
        )
        .withColumn(
            "lon_cell",
            F.floor((lon + F.lit(180.0)) / F.lit(5.0)).cast("int"),
        )
        .groupBy("lat_cell", "lon_cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 4).alias("avg_acctbal"),
        )
        .orderBy("lat_cell", "lon_cell")
    )


# --- containment join: points in (possibly overlapping) boxes -------------

#: grid cell size (degrees) for the containment join — boxes register in
#: every cell they intersect, points in exactly one
BBOX_CELL_DEG = 5.0


def cell_containment_join(
    points: DataFrame,
    boxes: DataFrame,
    cell_deg: float = BBOX_CELL_DEG,
) -> DataFrame:
    """All (point, box) pairs with the point inside the box, via a grid
    equi-join: each box explodes to the cells its rectangle intersects
    (bounded by box area / cell area), each point computes ONE cell.
    Points need ``lat``/``lon``; boxes need ``lat_lo/lat_hi/lon_lo/lon_hi``
    (non-wrapping).  Output keeps all input columns.

    The radius join's wrap machinery is deliberately absent: bbox tables
    (admin regions, tiles) are conventionally split at the antimeridian
    upstream, so cells here are plain floors.
    """
    lo = F.floor((F.col("lat_lo") + 90.0) / cell_deg).cast("int")
    hi = F.floor((F.col("lat_hi") + 90.0) / cell_deg).cast("int")
    lo2 = F.floor((F.col("lon_lo") + 180.0) / cell_deg).cast("int")
    hi2 = F.floor((F.col("lon_hi") + 180.0) / cell_deg).cast("int")
    boxes9 = (
        boxes.withColumn("_lat_cell", F.explode(F.sequence(lo, hi)))
        .withColumn("_lon_cell", F.explode(F.sequence(lo2, hi2)))
    )
    pts = points.withColumn(
        "_lat_cell", F.floor((F.col("lat") + 90.0) / cell_deg).cast("int")
    ).withColumn(
        "_lon_cell", F.floor((F.col("lon") + 180.0) / cell_deg).cast("int")
    )
    return (
        pts.join(boxes9, ["_lat_cell", "_lon_cell"])
        .where(
            (F.col("lat") >= F.col("lat_lo"))
            & (F.col("lat") <= F.col("lat_hi"))
            & (F.col("lon") >= F.col("lon_lo"))
            & (F.col("lon") <= F.col("lon_hi"))
        )
        .drop("_lat_cell", "_lon_cell")
    )


_BBOX_SQL = """
    boxes AS (
        SELECT n_nationkey,
               -60.0 + ((n_nationkey * 7919) % 100) AS lat_lo,
               -60.0 + ((n_nationkey * 7919) % 100)
                     + 4.0 + (n_nationkey * 13) % 12 AS lat_hi,
               -180.0 + ((n_nationkey * 104729) % 320) AS lon_lo,
               -180.0 + ((n_nationkey * 104729) % 320)
                      + 6.0 + (n_nationkey * 17) % 18 AS lon_hi
        FROM nation
    )
"""


@register(
    "geo_bbox_contains_join",
    # the oracle is the plain cross join + containment predicate
    oracle="""WITH cust AS (
        SELECT c_custkey,
               -60.0  + ((c_custkey * 7919)   % 120000) / 1000.0 AS lat,
               -180.0 + ((c_custkey * 104729) % 360000) / 1000.0 AS lon
        FROM customer
    ),"""
    + _BBOX_SQL
    + """
    SELECT c.c_custkey, b.n_nationkey,
           ROUND(c.lat, 3) AS lat, ROUND(c.lon, 3) AS lon
    FROM cust c CROSS JOIN boxes b
    WHERE c.lat >= b.lat_lo AND c.lat <= b.lat_hi
      AND c.lon >= b.lon_lo AND c.lon <= b.lon_hi
    ORDER BY c.c_custkey, b.n_nationkey
    """,
)
def geo_bbox_contains_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial containment join — customers located inside synthetic
    per-nation service rectangles (overlapping boxes allowed: a point
    reports every box that contains it).  The scale shape differs from
    the radius join: the replicated side's blow-up is its AREA in cells
    (boxes explode to the cells they intersect), the point side stays
    single-cell — a hash join on the cell key either way.  Pure
    arithmetic throughout (no trig): bounds and coordinates replay
    bit-exactly in the oracle's cross join."""
    cust = _customers_with_coords(spark, sf_dir)
    nk = F.col("n_nationkey")
    lat_lo = F.lit(-60.0) + ((nk * 7919) % 100).cast("double")
    lon_lo = F.lit(-180.0) + ((nk * 104729) % 320).cast("double")
    boxes = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        lat_lo.alias("lat_lo"),
        (lat_lo + 4.0 + ((nk * 13) % 12).cast("double")).alias("lat_hi"),
        lon_lo.alias("lon_lo"),
        (lon_lo + 6.0 + ((nk * 17) % 18).cast("double")).alias("lon_hi"),
    )
    pairs = cell_containment_join(cust, F.broadcast(boxes))
    return pairs.select(
        "c_custkey",
        "n_nationkey",
        F.round("lat", 3).alias("lat"),
        F.round("lon", 3).alias("lon"),
    ).orderBy("c_custkey", "n_nationkey")


@register(
    "geo_coverage_gap",
    oracle="WITH "
    + _COORD_SQL
    + f"""
    SELECT c.c_custkey, ROUND(c.lat, 3) AS lat, ROUND(c.lon, 3) AS lon
    FROM cust c
    WHERE NOT EXISTS (
        SELECT 1 FROM pairs p
        WHERE p.c_custkey = c.c_custkey AND ROUND(p.dist_km, 6) <= {RADIUS_KM}
    )
    ORDER BY c.c_custkey
    """,
)
def geo_coverage_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The coverage COMPLEMENT: customers with NO supplier within
    RADIUS_KM — the expansion-planning list the radius count can't show
    (it drops uncovered customers).  One left anti-join against the
    same grid-bucketed candidate set: the cell join over-approximates
    the R-ball, so anti-joining its distance-filtered survivors is
    exact.  At 100 TB this is the cheapest query in the family — the
    anti-join's build side is only the COVERED keys."""
    cust = _customers_with_coords(spark, sf_dir)
    covered = cell_radius_join(
        cust, _suppliers_with_coords(spark, sf_dir), RADIUS_KM
    ).select("c_custkey").distinct()
    return (
        cust.join(covered, "c_custkey", "left_anti")
        .select(
            "c_custkey",
            F.round("lat", 3).alias("lat"),
            F.round("lon", 3).alias("lon"),
        )
        .orderBy("c_custkey")
    )
