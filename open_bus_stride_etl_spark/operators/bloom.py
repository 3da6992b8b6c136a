"""Broadcast Bloom-filter pre-filtering for seen-index joins — the
standard 100 TB continuous-ingest pattern: a daily crawl batch anti-joins
a historical fingerprint index that is orders of magnitude larger than
the batch's overlap with it. A plain anti-join shuffles the ENTIRE batch
by fingerprint; with a Bloom filter built over the index and broadcast
to the workers, rows whose key is DEFINITELY absent (the overwhelming
majority of a healthy crawl) bypass the shuffle entirely, and only
possible members — true duplicates plus the filter's false-positive
residue — reach the exact join.

EXACT by construction: a Bloom filter has no false negatives, so no
genuinely-new row can be misclassified as seen; false positives are
cleared by the exact anti-join that follows. The composed result is
row-identical to the plain anti-join (pinned by tests that run both
paths, including a forced-false-positive case), which is why the
oracle-checked queries can adopt it without touching their SQL.

Shapes (no reference-repo analog — the reference delegates joins to
Postgres; this is the Spark-native scale path):

- BUILD: one map-side-combined aggregation over the index —
  ``n_hashes`` positions per key, OR-ed into 64-bit words,
  ``groupBy(word).bit_or(mask)`` — then the nonzero words (bounded by
  ``2^bits_log2 / 64``; 1 MiB of longs at the 2^23-bit default) are
  collected and broadcast as a dense numpy bitset.
- PROBE: hash positions are computed JVM-side (``xxhash64`` — the same
  codegen expression as the build side, so bit-for-bit consistent) and
  the membership test is one vectorized numpy gather per Arrow batch in
  ``mapInPandas`` — zero shuffle, zero Python hashing.

Sizing: FP rate ~ (1 - e^(-k*n/m))^k; the 2^23-bit default with k=5
holds ~1M index keys at ~2% FP — at larger indexes pass a bigger
``bits_log2`` (each +1 doubles the 1 MiB broadcast) or shard the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEF_BITS_LOG2 = 23
_DEF_HASHES = 5


def _positions(key_col: str, bits_log2: int, n_hashes: int) -> list:
    m = 1 << bits_log2
    return [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m)).alias(f"_bp{i}")
        for i in range(n_hashes)
    ]


def build_bloom(
    seen: DataFrame,
    key_col: str,
    bits_log2: int = _DEF_BITS_LOG2,
    n_hashes: int = _DEF_HASHES,
):
    """Aggregate ``seen``'s keys into a dense numpy uint64 bitset
    (returned driver-side, ready to broadcast). One shuffle of at most
    ``2^bits_log2 / 64`` word rows after map-side combine."""
    import numpy as np  # noqa: PLC0415

    words_n = (1 << bits_log2) // 64
    pos = F.explode(F.array(*_positions(key_col, bits_log2, n_hashes))).alias("_pos")
    word_rows = (
        seen.select(pos)
        .select(
            F.shiftright("_pos", 6).alias("_word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT))").alias("_mask"),
        )
        .groupBy("_word")
        .agg(F.bit_or("_mask").alias("_bits"))
        .collect()
    )
    words = np.zeros(words_n, dtype=np.int64)
    for r in word_rows:
        words[r["_word"]] = r["_bits"]
    return words.view(np.uint64)


def with_bloom_maybe(
    df: DataFrame,
    key_col: str,
    bloom_words,
    bits_log2: int = _DEF_BITS_LOG2,
    n_hashes: int = _DEF_HASHES,
    flag_col: str = "_bloom_maybe",
) -> DataFrame:
    """Add ``flag_col``: true iff the row's key is POSSIBLY in the set
    the bitset was built from (false = definitely absent). Hash
    positions are computed JVM-side; the bit test is a vectorized numpy
    gather per Arrow batch — no shuffle."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(bloom_words))
    cols = list(df.columns)
    pos_names = [f"_bp{i}" for i in range(n_hashes)]
    widened = df.select("*", *_positions(key_col, bits_log2, n_hashes))

    def probe(batches):
        words = bc.value
        for pdf in batches:
            if pdf.empty:
                yield pdf[cols].assign(**{flag_col: pd.Series([], dtype=bool)})
                continue
            maybe = np.ones(len(pdf), dtype=bool)
            for name in pos_names:
                p = pdf[name].to_numpy(np.uint64)
                bit = (words[p >> np.uint64(6)] >> (p & np.uint64(63))) & np.uint64(1)
                maybe &= bit.astype(bool)
            out = pdf[cols].copy()
            out[flag_col] = maybe
            yield out

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    return widened.mapInPandas(probe, schema + f", {flag_col} boolean")


def bloom_anti_join(
    new: DataFrame,
    seen: DataFrame,
    key_col: str,
    bits_log2: int = _DEF_BITS_LOG2,
    n_hashes: int = _DEF_HASHES,
) -> DataFrame:
    """``new LEFT ANTI JOIN seen ON key_col`` with Bloom pre-filtering:
    definitely-new rows skip the shuffle; only possible members reach
    the exact anti-join. Row-identical to the plain anti-join."""
    words = build_bloom(seen, key_col, bits_log2, n_hashes)
    flagged = with_bloom_maybe(new, key_col, words, bits_log2, n_hashes)
    definite_new = flagged.where(~F.col("_bloom_maybe")).drop("_bloom_maybe")
    maybe = flagged.where(F.col("_bloom_maybe")).drop("_bloom_maybe")
    cleared = maybe.join(seen.select(key_col).distinct(), on=key_col, how="left_anti")
    return definite_new.unionByName(cleared)


def bloom_semi_join(
    new: DataFrame,
    seen: DataFrame,
    key_col: str,
    bits_log2: int = _DEF_BITS_LOG2,
    n_hashes: int = _DEF_HASHES,
) -> DataFrame:
    """``new LEFT SEMI JOIN seen ON key_col`` with Bloom pre-filtering:
    definitely-absent rows are dropped before the shuffle; the exact
    semi-join clears false positives. Row-identical to the plain
    semi-join."""
    words = build_bloom(seen, key_col, bits_log2, n_hashes)
    flagged = with_bloom_maybe(new, key_col, words, bits_log2, n_hashes)
    maybe = flagged.where(F.col("_bloom_maybe")).drop("_bloom_maybe")
    return maybe.join(seen.select(key_col).distinct(), on=key_col, how="left_semi")
