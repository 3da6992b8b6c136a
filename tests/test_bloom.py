"""Bloom-pre-filtered seen-index joins (operators/bloom.py): the result
must be row-identical to the plain anti/semi join at ANY filter size —
including a deliberately undersized filter where false positives are
guaranteed — because the Bloom is a shuffle-avoidance pre-filter, never
a source of truth."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from open_bus_stride_etl_spark.operators import bloom as bl


def _frames(spark):
    new = spark.createDataFrame(
        [Row(fp=f"k{i}", doc_id=i) for i in range(200)], "fp string, doc_id long"
    )
    # seen covers every third key plus keys absent from `new`
    seen = spark.createDataFrame(
        [Row(fp=f"k{i}") for i in range(0, 200, 3)]
        + [Row(fp=f"other{i}") for i in range(50)],
        "fp string",
    )
    return new, seen


def test_bloom_anti_join_matches_plain(spark):
    new, seen = _frames(spark)
    plain = sorted(
        r["doc_id"]
        for r in new.join(seen, on="fp", how="left_anti").collect()
    )
    for bits_log2 in (20, 6):  # roomy filter AND a forced-false-positive one
        got = sorted(
            r["doc_id"]
            for r in bl.bloom_anti_join(new, seen, "fp", bits_log2=bits_log2).collect()
        )
        assert got == plain, f"bits_log2={bits_log2}"


def test_bloom_semi_join_matches_plain(spark):
    new, seen = _frames(spark)
    plain = sorted(
        r["doc_id"] for r in new.join(seen, on="fp", how="left_semi").collect()
    )
    for bits_log2 in (20, 6):
        got = sorted(
            r["doc_id"]
            for r in bl.bloom_semi_join(new, seen, "fp", bits_log2=bits_log2).collect()
        )
        assert got == plain, f"bits_log2={bits_log2}"


def test_bloom_has_no_false_negatives_and_prunes(spark):
    """Every seen key must probe 'maybe' (no false negatives — the
    exactness precondition), and at a sane size the filter must actually
    prune most definitely-new rows (the scale point)."""
    new, seen = _frames(spark)
    words = bl.build_bloom(seen, "fp", bits_log2=20)
    flagged = bl.with_bloom_maybe(new, "fp", words, bits_log2=20)
    rows = {r["doc_id"]: r["_bloom_maybe"] for r in flagged.collect()}
    for i in range(0, 200, 3):
        assert rows[i], f"false negative for seen key k{i}"
    definite_new = sum(1 for i, m in rows.items() if not m)
    # 133 truly-new rows; at 2^20 bits / ~117 keys the FP rate is ~0
    assert definite_new >= 120


def test_bloom_null_and_empty_index(spark):
    new = spark.createDataFrame(
        [Row(fp=None, doc_id=1), Row(fp="a", doc_id=2)], "fp string, doc_id long"
    )
    seen_with_null = spark.createDataFrame([Row(fp=None), Row(fp="a")], "fp string")
    plain = sorted(
        r["doc_id"] for r in new.join(seen_with_null, on="fp", how="left_anti").collect()
    )
    got = sorted(
        r["doc_id"]
        for r in bl.bloom_anti_join(new, seen_with_null, "fp", bits_log2=10).collect()
    )
    assert got == plain  # null keys never equi-match: row 1 survives both paths

    empty = spark.createDataFrame([], "fp string")
    got2 = sorted(
        r["doc_id"] for r in bl.bloom_anti_join(new, empty, "fp", bits_log2=10).collect()
    )
    assert got2 == [1, 2]
