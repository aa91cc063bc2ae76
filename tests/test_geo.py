"""Geo family: the grid-cell radius join must equal the brute-force
cross join (including across the antimeridian seam), and the plan must
never contain a CartesianProduct."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.geo import (
    RADIUS_KM,
    cell_radius_join,
    haversine_km,
    synthetic_coords,
)
from trafsys_data_transfer_spark.registry import all_queries


def _brute_force(spark, probe_rows, cand_rows, radius_km):
    p = spark.createDataFrame(probe_rows, "pid long, lat double, lon double")
    c = spark.createDataFrame(
        cand_rows, "cid long, c_lat double, c_lon double"
    )
    d = haversine_km(
        F.col("lat"), F.col("lon"), F.col("c_lat"), F.col("c_lon")
    )
    return {
        (r.pid, r.cid)
        for r in p.crossJoin(c)
        .withColumn("dist_km", d)
        .where(F.col("dist_km") <= radius_km)
        .collect()
    }


def test_cell_join_matches_bruteforce_random(spark):
    """Seeded random points over the full domain: the bucketed join
    returns exactly the brute-force pair set."""
    rng = random.Random(90210)
    probe = [
        (i, rng.uniform(-60, 60), rng.uniform(-180, 180)) for i in range(80)
    ]
    cand = [
        (j, rng.uniform(-60, 60), rng.uniform(-180, 180)) for j in range(40)
    ]
    radius = 2500.0
    p = spark.createDataFrame(probe, "pid long, lat double, lon double")
    c = spark.createDataFrame(cand, "cid long, c_lat double, c_lon double")
    got = {
        (r.pid, r.cid)
        for r in cell_radius_join(p, c, radius).collect()
    }
    assert got == _brute_force(spark, probe, cand, radius)


def test_cell_join_covers_antimeridian_seam(spark):
    """Pairs straddling lon=±180 must be found: the lon cell index wraps
    modulo the (uniform) cell count."""
    probe = [(1, 10.0, 179.95), (2, -30.0, -179.9)]
    cand = [(1, 10.0, -179.95), (2, -30.0, 179.8), (3, -30.0, 170.0)]
    radius = 100.0
    p = spark.createDataFrame(probe, "pid long, lat double, lon double")
    c = spark.createDataFrame(cand, "cid long, c_lat double, c_lon double")
    got = {
        (r.pid, r.cid)
        for r in cell_radius_join(p, c, radius).collect()
    }
    # (1,1): ~22 km apart across the seam; (2,2): ~29 km across the seam;
    # (2,3): ~960 km away — outside
    assert got == {(1, 1), (2, 2)}


def test_cell_join_boundary_distance(spark):
    """A candidate just inside R at a cell boundary survives; one just
    outside drops — the cell superset never clips the R-ball."""
    # ~RADIUS_KM along a meridian: 1° lat = 111.195 km at R=6371
    deg_in = (RADIUS_KM - 1.0) / 111.194927
    deg_out = (RADIUS_KM + 1.0) / 111.194927
    probe = [(1, 0.0, 0.0)]
    cand = [(10, deg_in, 0.0), (11, deg_out, 0.0)]
    p = spark.createDataFrame(probe, "pid long, lat double, lon double")
    c = spark.createDataFrame(cand, "cid long, c_lat double, c_lon double")
    got = {
        (r.pid, r.cid)
        for r in cell_radius_join(p, c, RADIUS_KM).collect()
    }
    assert got == {(1, 10)}


def test_geo_plans_have_no_cartesian(spark, sf_dir):
    for name in (
        "geo_supplier_radius_count",
        "geo_nearest_supplier",
        "geo_cell_density",
    ):
        df = all_queries()[name].build(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name


def test_cell_density_partitions_all_suppliers(spark, sf_dir):
    """Every supplier lands in exactly one 5° cell."""
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    out = all_queries()["geo_cell_density"].build(spark, sf_dir)
    total = out.agg(F.sum("n_suppliers")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "supplier").count()


def test_synthetic_coords_in_domain(spark):
    lat, lon = synthetic_coords(F.col("id"))
    df = spark.range(1, 5000).select(
        lat.alias("lat"), lon.alias("lon")
    )
    row = df.agg(
        F.min("lat"), F.max("lat"), F.min("lon"), F.max("lon")
    ).collect()[0]
    assert -60.0 <= row[0] and row[1] < 60.0
    assert -180.0 <= row[2] and row[3] < 180.0


def test_containment_join_matches_bruteforce(spark):
    """Random points × random (overlapping) boxes: the grid containment
    join returns exactly the brute-force pair set."""
    from trafsys_data_transfer_spark.operators.geo import (
        cell_containment_join,
    )

    rng = random.Random(777)
    pts = [
        (i, rng.uniform(-60, 60), rng.uniform(-170, 170)) for i in range(60)
    ]
    boxes = []
    for j in range(15):
        la = rng.uniform(-60, 40)
        lo = rng.uniform(-170, 120)
        boxes.append((j, la, la + rng.uniform(1, 25), lo, lo + rng.uniform(1, 40)))
    p = spark.createDataFrame(pts, "pid long, lat double, lon double")
    b = spark.createDataFrame(
        boxes, "bid long, lat_lo double, lat_hi double,"
        " lon_lo double, lon_hi double"
    )
    got = {
        (r.pid, r.bid) for r in cell_containment_join(p, b).collect()
    }
    want = {
        (pid, bid)
        for pid, la, lo in pts
        for bid, lo1, hi1, lo2, hi2 in boxes
        if lo1 <= la <= hi1 and lo2 <= lo <= hi2
    }
    assert got == want


def test_coverage_gap_complements_radius_count(spark, sf_dir):
    """gap ∪ covered == all customers, disjoint."""
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    gap = {
        r.c_custkey
        for r in all_queries()["geo_coverage_gap"].build(spark, sf_dir).collect()
    }
    covered = {
        r.c_custkey
        for r in all_queries()["geo_supplier_radius_count"]
        .build(spark, sf_dir)
        .collect()
    }
    allc = {
        r.c_custkey
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .collect()
    }
    assert gap | covered == allc
    assert not (gap & covered)


def test_salted_cell_join_equals_plain_under_hot_cell_skew(spark):
    """80% of probes in ONE grid cell (the dense-city shape): the salted
    variant must return exactly the plain join's pair set (VERDICT r09
    task 4 — salting an equi-join changes task layout, never rows)."""
    import random as _random

    from trafsys_data_transfer_spark.operators.geo import (
        cell_radius_join_salted,
    )

    rng = _random.Random(5150)
    radius = 800.0
    # hot cell: a ~2 degree city patch; the rest spread over the domain
    probe = [
        (i, 40.0 + rng.uniform(0, 2.0), -74.0 + rng.uniform(0, 2.0))
        for i in range(160)
    ] + [
        (1000 + i, rng.uniform(-60, 60), rng.uniform(-180, 180))
        for i in range(40)
    ]
    cand = [
        (j, rng.uniform(30, 50), rng.uniform(-90, -60)) for j in range(30)
    ] + [
        (100 + j, rng.uniform(-60, 60), rng.uniform(-180, 180))
        for j in range(20)
    ]
    p = spark.createDataFrame(probe, "pid long, lat double, lon double")
    c = spark.createDataFrame(cand, "cid long, c_lat double, c_lon double")
    plain = {
        (r.pid, r.cid) for r in cell_radius_join(p, c, radius).collect()
    }
    for n_salt in (1, 4, 8):
        salted = {
            (r.pid, r.cid)
            for r in cell_radius_join_salted(
                p, c, radius, n_salt=n_salt
            ).collect()
        }
        assert salted == plain, f"n_salt={n_salt}"
    assert plain  # non-trivial: the hot patch must produce matches
