"""KMV sketch guards: exactness when unsaturated, bounded error when
saturated, and mergeable-partial equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from singer_spark.operators.sketches import kmv_overlap, kmv_sketch
from singer_spark.session import read_events


def _truth(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    v = ev.where("event_type = 'view'").select("user_id").distinct()
    p = ev.where("event_type = 'purchase'").select("user_id").distinct()
    return (v.count(), p.count(),
            v.join(p, "user_id").count(),
            v.unionByName(p).distinct().count())


def test_kmv_unsaturated_is_exact(spark, sf_dir):
    # sf0.001 has far fewer distinct users than k, so every sketch holds
    # its full hash set and the estimates are exact counts
    ev = read_events(spark, sf_dir).select("event_type", "user_id")
    sk = kmv_sketch(ev, "event_type", "user_id", k=256)
    row = kmv_overlap(sk, "event_type", "view", "purchase", k=256).first()
    a, b, i, u = _truth(spark, sf_dir)
    assert (row.est_a, row.est_b) == (float(a), float(b))
    assert row.est_union == float(u)
    assert row.est_intersection == float(i)


def test_kmv_saturated_error_bounded(spark):
    # synthetic disjoint-ish sets: A = 0..999, B = 500..1499 → |A∩B| = 500
    k = 128
    rows = [("A", i) for i in range(1000)] + [("B", i) for i in range(500, 1500)]
    df = spark.createDataFrame(rows, "g string, item bigint").repartition(8)
    sk = kmv_sketch(df, "g", "item", k=k)
    # saturation: both sketches must be at capacity for this test to bite
    assert all(r.n_kept == k for r in sk.collect())
    row = kmv_overlap(sk, "g", "A", "B", k=k).first()
    # ~1/sqrt(k) ≈ 9% standard error; allow 4 sigma on counts, wider on
    # the intersection (compounded estimate)
    assert abs(row.est_a - 1000) / 1000 < 0.36
    assert abs(row.est_b - 1000) / 1000 < 0.36
    assert abs(row.est_union - 1500) / 1500 < 0.36
    assert abs(row.est_intersection - 500) / 500 < 0.5
    assert 0.1 < row.jaccard < 0.6  # truth 1/3
