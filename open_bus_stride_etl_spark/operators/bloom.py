"""Broadcast Bloom-filter pre-filtering for seen-index joins — correct,
tested, and — MEASURED IN r5 — slower than Spark's native anti-join at
every scale tried on this engine. Kept as a documented pattern with its
honest verdict, not as a recommended default.

The idea: a daily crawl batch anti-joins a historical fingerprint index;
a Bloom filter built over the index and broadcast to the workers lets
rows whose key is DEFINITELY absent bypass the join shuffle, and only
possible members (true dupes + false positives) reach the exact join.
EXACT by construction: no false negatives, and false positives are
cleared by the exact join that follows — the composed result is
row-identical to the plain join (pinned by tests running both paths,
including a forced-false-positive undersized filter, plus a hypothesis
property test).

MEASURED VERDICT (r5, interleaved A/B x3 on an idle local[32]):
- 20M-key materialized parquet index x 5M-row batch, 1% overlap:
  plain AQE anti-join 2.4 s; bloom_anti_join 29 s (12x SLOWER). The
  per-run BUILD dominates — 5 hash positions x 20M keys explode into a
  100M-row aggregation plus a multi-MB driver collect — and even the
  probe-side saving cannot win because Spark's shuffled anti-join of a
  640 MB index is already a 2-second operation on this box.
- In-query-derived indexes (dedup_incremental's shape) lose even
  harder: 0.42 -> 2.15 s at sf0.1, 1.25 -> 2.63 s at sf10.
- Spark's JVM-native ``bloom_filter_agg``/``might_contain`` (which
  would remove the explode + collect) is not SQL-registered in this
  build (UNRESOLVED_ROUTINE), so a JVM-side build is not available.

When CAN it win? Only when the build is AMORTIZED: a bitset artifact
persisted alongside the index and updated incrementally with each
day's new keys (bit-OR union — never rebuilt from the full index), AND
the index is large enough that its side of the anti-join shuffle
dominates, AND small enough that the bitset still broadcasts
(~10^8-10^9 keys at 10 bits/key = 125 MB-1.25 GB; beyond that the
bitset itself stops fitting). That niche is real but narrow; the
engine's default for seen-index joins is the plain anti-join, and the
one production call site (llm-curate-corpus incremental) was REVERTED
to it on these numbers.

Mechanics, for the amortized niche:
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
holds ~1M index keys at ~2% FP.
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
