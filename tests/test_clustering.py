"""operators/clustering.py: integer-exact Lloyd's k-means — convergence
on a trivially separable set, deterministic tie-breaks, empty-cluster
centroid retention."""

from pyspark.sql import Row

from open_bus_stride_etl_spark.operators.clustering import kmeans_assignments


def _embs(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )


def test_two_obvious_clusters(spark):
    # two tight groups far apart; seeds (ids 0 and 1) start one in each
    d = _embs(
        spark,
        [
            (0, [1.0, 0.0]), (1, [-1.0, 0.0]),
            (2, [0.9, 0.1]), (3, [-0.9, -0.1]),
            (4, [0.95, 0.0]), (5, [-0.95, 0.05]),
        ],
    )
    out = {r["vec_id"]: r["cluster"] for r in kmeans_assignments(d, k=2, iters=3).collect()}
    assert out[0] == out[2] == out[4]
    assert out[1] == out[3] == out[5]
    assert out[0] != out[1]


def test_seeds_move_points_across_rounds(spark):
    # both seeds (ids 0, 1) sit in the left group; after the first
    # update the left centroid re-centers and the right group must all
    # land together in one cluster
    d = _embs(
        spark,
        [
            (0, [-1.0, 0.0]), (1, [-0.8, 0.0]),
            (2, [1.0, 0.0]), (3, [1.1, 0.0]), (4, [0.9, 0.0]),
        ],
    )
    out = {r["vec_id"]: r["cluster"] for r in kmeans_assignments(d, k=2, iters=3).collect()}
    assert out[2] == out[3] == out[4]


def test_empty_cluster_keeps_centroid_and_stays_deterministic(spark):
    # 3 clusters over 3 points, two of which coincide: one cluster
    # inevitably empties; run must not fail and must stay stable
    d = _embs(spark, [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])])
    a = kmeans_assignments(d, k=3, iters=2).collect()
    b = kmeans_assignments(d, k=3, iters=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    out = dict(map(tuple, a))
    # coincident points share a cluster (tie-break to the lowest id)
    assert out[0] == out[1]
