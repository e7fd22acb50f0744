"""ES 1.x geo queries vs DuckDB oracles (SURVEY §2.5): geo_distance
filter+sort, geo_bounding_box, geo_distance agg, over deterministic
hash-derived coordinates (bit-identical cross-engine, like random_score)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.geo import (
    geo_bbox_hits,
    geo_bbox_hits_sql,
    geo_distance_agg,
    geo_distance_agg_sql,
    geo_distance_hits,
    geo_distance_hits_sql,
    geo_enrich,
    parse_distance,
)

CENTER = (48.8566, 2.3522)  # somewhere specific, any point works


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.fixture(scope="module")
def geo_docs(documents):
    return geo_enrich(documents)


def test_coordinates_bit_identical(geo_docs, duck):
    got = {
        r["doc_id"]: (r["lat"], r["lon"])
        for r in geo_docs.select("doc_id", "lat", "lon").collect()
    }
    from flume_elasticsearch_2_spark.operators.geo import geo_enrich_sql

    want = {
        i: (la, lo)
        for i, la, lo in duck.execute(
            f"SELECT doc_id, lat, lon FROM ({geo_enrich_sql()})"
        ).fetchall()
    }
    assert got == want  # exact float equality, no rounding


def test_geo_distance_matches_duckdb(geo_docs, duck):
    got = [
        tuple(r)
        for r in geo_distance_hits(geo_docs, *CENTER, "2000km", k=20).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(
            geo_distance_hits_sql(*CENTER, "2000km", k=20)
        ).fetchall()
    ]
    assert got == want and got
    assert all(d <= 2000 for _, d in got)
    assert got == sorted(got, key=lambda x: (x[1], x[0]))


def test_geo_bbox_matches_duckdb(geo_docs, duck):
    tl, br = (60.0, -30.0), (20.0, 40.0)
    got = [tuple(r) for r in geo_bbox_hits(geo_docs, tl, br, k=25).collect()]
    want = [tuple(r) for r in duck.execute(geo_bbox_hits_sql(tl, br, k=25)).fetchall()]
    assert got == want and got


def test_geo_distance_agg_matches_duckdb(geo_docs, duck):
    ranges = [(None, 2000.0), (2000.0, 8000.0), (8000.0, None)]
    got = [
        tuple(r) for r in geo_distance_agg(geo_docs, *CENTER, ranges).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(geo_distance_agg_sql(*CENTER, ranges)).fetchall()
    ]
    assert got == want
    # rings partition the corpus: counts sum to n_docs
    n = geo_docs.count()
    assert sum(c for _, c in got) == n


def test_distance_parsing():
    assert parse_distance(100) == 100.0
    assert parse_distance("100km") == 100.0
    assert parse_distance("5000m") == 5.0
    assert parse_distance("1mi") == pytest.approx(1.609344)
    with pytest.raises(ValueError):
        parse_distance("3ly")


def test_bbox_validation(geo_docs):
    with pytest.raises(ValueError):
        geo_bbox_hits(geo_docs, (10.0, 40.0), (20.0, -30.0), k=5)
    with pytest.raises(ValueError):
        geo_bbox_hits_sql((10.0, 170.0), (20.0, -170.0))


def test_geo_distance_band_prefilter_is_lossless(geo_docs, duck):
    """The sargable lat-band pre-filter must not drop true hits: compare
    against an unbanded oracle."""
    from flume_elasticsearch_2_spark.operators.geo import (
        geo_enrich_sql,
        haversine_sql,
    )

    r = 3000.0
    d = haversine_sql("lat", "lon", *CENTER)
    brute = duck.execute(f"""
        WITH geo AS ({geo_enrich_sql()})
        SELECT doc_id, round({d}, 6) AS dist_km FROM geo
        WHERE {d} <= {r!r} ORDER BY {d} ASC, doc_id ASC LIMIT 50
    """).fetchall()
    got = [
        tuple(x)
        for x in geo_distance_hits(geo_docs, *CENTER, r, k=50).collect()
    ]
    assert got == [tuple(x) for x in brute] and got
