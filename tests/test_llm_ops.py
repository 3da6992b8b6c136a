"""Tests for the LLM-pipeline operators: dedup, similarity, text
analysis, multimodal plumbing."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from open_bus_stride_etl_spark.operators import dedup as dd
from open_bus_stride_etl_spark.operators import similarity as sim
from open_bus_stride_etl_spark.operators import text as tx
from open_bus_stride_etl_spark.operators.multimodal import (
    decode_image,
    fake_decode_stats,
    frame_sample_plan,
)


def test_minhash_identical_docs_share_signature(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="The  quick  brown fox jumps over the lazy dog"),
            Row(doc_id=3, text="completely different words appear here instead now"),
        ]
    )
    sigs = {r["doc_id"]: tuple(r[f"m{i}"] for i in range(8)) for r in dd.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]  # normalization folds case/whitespace
    assert sigs[1] != sigs[3]


def test_jaccard_identical_is_10000(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f g h"),
            Row(doc_id=2, text="a b c d e f g h"),
            Row(doc_id=3, text="a b c d e f g x"),
        ]
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard_bp"] for r in dd.jaccard_pairs(docs).collect()}
    assert pairs[(1, 2)] == 10000
    # 8 words -> 6 shingles; docs 1 and 3 share 5 of 7 distinct
    assert pairs[(1, 3)] == round(10000 * 5 / 7)


def test_minhash_lsh_pairs_matches_primitive_composition(spark):
    """The plan-tuned composite (raw shingles, fused sizes, broadcast
    pair joins) must produce exactly the pairs + scores of the naive
    primitive composition it replaced."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy dog tonight"),
            Row(doc_id=3, text="an entirely different document about spark pipelines"),
            Row(doc_id=4, text="an entirely different document about spark pipelines"),
            Row(doc_id=5, text="the quick brown fox jumps over the lazy dog today"),
        ]
    )
    sh = dd._shingled(docs, "doc_id", "text", 3)
    sigs = dd.minhash_signatures(docs, shingled=sh)
    cands = dd.lsh_candidate_pairs(sigs)
    naive = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in dd.jaccard_pairs(docs, candidates=cands, shingled=sh).collect()
    }
    tuned = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in dd.minhash_lsh_pairs(docs).collect()
    }
    assert tuned == naive
    assert tuned[(1, 5)] == 10000 and tuned[(3, 4)] == 10000


def test_minhash_lsh_pairs_b_ids_restriction(spark):
    """The incremental b-side restriction (r9) returns EXACTLY the full
    pipeline's pairs filtered to doc_b ∈ b_ids — same jaccard values,
    nothing extra, nothing missing (the curate fast-path's correctness
    precondition)."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy dog tonight"),
            Row(doc_id=3, text="an entirely different document about spark pipelines"),
            Row(doc_id=4, text="an entirely different document about spark pipelines"),
            Row(doc_id=5, text="the quick brown fox jumps over the lazy dog today"),
        ]
    )
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in dd.minhash_lsh_pairs(docs).collect()
    }
    b_ids = spark.createDataFrame([Row(doc_id=4), Row(doc_id=5)])
    restricted = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in dd.minhash_lsh_pairs(docs, b_ids=b_ids).collect()
    }
    assert restricted == {p: j for p, j in full.items() if p[1] in (4, 5)}
    assert any(b not in (4, 5) for _a, b in full)  # restriction is real


def test_lsh_pairs_from_buckets_equals_full(spark):
    """The amortized band-index path (r10): given a materialized bucket
    table equal to minhash_band_buckets(docs), the from_buckets operator
    returns EXACTLY minhash_lsh_pairs' rows — unrestricted and with the
    b_ids restriction — and duplicate index rows (crash-replayed
    appends) change nothing."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy dog tonight"),
            Row(doc_id=3, text="an entirely different document about spark pipelines"),
            Row(doc_id=4, text="an entirely different document about spark pipelines"),
            Row(doc_id=5, text="the quick brown fox jumps over the lazy dog today"),
        ]
    )
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in dd.minhash_lsh_pairs(docs).collect()
    }
    buckets = dd.minhash_band_buckets(docs)
    from_idx = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in dd.minhash_lsh_pairs_from_buckets(docs, buckets).collect()
    }
    assert from_idx == full and full

    b_ids = spark.createDataFrame([Row(doc_id=4), Row(doc_id=5)])
    from_idx_b = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in dd.minhash_lsh_pairs_from_buckets(docs, buckets, b_ids=b_ids).collect()
    }
    assert from_idx_b == {p: j for p, j in full.items() if p[1] in (4, 5)}

    # duplicated rows (replayed append) are absorbed by the pair distinct
    dup = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in dd.minhash_lsh_pairs_from_buckets(
            docs, buckets.unionByName(buckets)
        ).collect()
    }
    assert dup == full

    # the tiny-probe broadcast guard and the shuffle fallback agree
    no_bc = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in dd.minhash_lsh_pairs_from_buckets(
            docs, buckets, b_ids=b_ids, max_broadcast_probe=0
        ).collect()
    }
    assert no_bc == from_idx_b

    # caller-supplied probe size (skips the sizing count job) agrees too
    sized = {
        (r["doc_a"], r["doc_b"]): r["jaccard_bp"]
        for r in dd.minhash_lsh_pairs_from_buckets(
            docs, buckets, b_ids=b_ids, probe_rows=8
        ).collect()
    }
    assert sized == from_idx_b


def test_shingle_count_exact(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="w1 w2 w3 w4"), Row(doc_id=2, text="w1 w2")])
    out = df.withColumn("_w", F.split(tx.normalize_text(F.col("text")), " ")).select(
        "doc_id", F.size(tx.shingle_array("_w", 3)).alias("n")
    )
    got = {r["doc_id"]: r["n"] for r in out.collect()}
    assert got == {1: 2, 2: 0}  # n - k + 1, and no descending-sequence blowup


def test_simhash_deterministic(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma"), Row(doc_id=2, text="alpha beta gamma")]
    )
    out = [r["simhash"] for r in dd.simhash32(docs).collect()]
    assert out[0] == out[1]
    assert 0 <= out[0] < (1 << 32)


def test_simhash_wide_pigeonhole_exact(spark):
    """The 60-bit production config (simhash_hamming_pairs sim_bits=60,
    4 bands of 15 bits) must return EXACTLY the pairs within hamming 3
    of the 60-bit signatures — the same pigeonhole-exactness contract
    the 32-bit registered config is oracle-gated on. Cross-checked
    against a brute-force all-pairs popcount of the collected
    signatures on a corpus with planted one-word substitutions."""
    words = ["w%d" % i for i in range(12)]
    rows = []
    for d in range(24):
        toks = [words[(d * 7 + i * 5) % len(words)] for i in range(10)]
        rows.append(Row(doc_id=d * 2, text=" ".join(toks)))
        toks_near = list(toks)
        toks_near[3] = "sub%d" % d
        rows.append(Row(doc_id=d * 2 + 1, text=" ".join(toks_near)))
    docs = spark.createDataFrame(rows)
    sims = {r["doc_id"]: r["simhash"] for r in dd.simhash(docs, bits=60).collect()}
    assert all(0 <= s < (1 << 60) for s in sims.values())
    ids = sorted(sims)
    expect = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sims[a] ^ sims[b]).count("1") <= 3
    }
    assert expect  # the planted corpus must actually exercise the join
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dd.simhash_hamming_pairs(docs, threshold=3, n_bands=4, sim_bits=60).collect()
    }
    assert got == expect


def test_cosine_topk_orders_by_similarity(spark):
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),   # most similar to 0
            Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),   # orthogonal
            Row(vec_id=3, embedding=[0.5, 0.5, 0.0]),
        ]
    )
    q = emb.where(F.col("vec_id") == 0)
    out = sim.cosine_topk(emb, q, k=3).orderBy("rank").collect()
    assert [r["cand_id"] for r in out] == [1, 3, 2]
    assert out[0]["cos"] > 0.99


def test_cosine_topk_rejects_oversized_query_set(spark):
    """The collect+broadcast precondition is enforced: an oversized
    query set must raise a clear error, never OOM the driver."""
    emb = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="max_query_rows"):
        sim.cosine_topk(emb, emb, k=2, max_query_rows=5)


def test_lang_id_profiles(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat and the dog of the house"),
            Row(doc_id=2, text="el gato y la casa de la abuela"),
            Row(doc_id=3, text="zzz qqq xxx"),
        ]
    )
    out = {r["doc_id"]: r["p"] for r in docs.select("doc_id", tx.lang_id(F.col("text")).alias("p")).collect()}
    assert out == {1: "en", 2: "es", 3: "und"}


def test_multimodal_fake_decode_and_stub(spark):
    media = spark.createDataFrame(
        [Row(media_id=1, payload=b"abc"), Row(media_id=2, payload=None)]
    )
    out = {r["media_id"]: r for r in fake_decode_stats(media).collect()}
    assert out[1]["n_bytes"] == 3
    assert out[1]["payload_md5"] == "900150983cd24fb0d6963f7d28e17f72"
    assert abs(out[1]["mean_byte"] - (97 + 98 + 99) / 3) < 1e-9
    assert out[2]["n_bytes"] is None
    with pytest.raises(ValueError, match="not a PNG"):
        decode_image(b"\x89PNG")  # truncated signature


from open_bus_stride_etl_spark.operators.multimodal import encode_png as _encode_png


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_decode_image_roundtrip_all_filters(color_type, ch):
    """Every PNG filter type (None/Sub/Up/Average/Paeth) and every
    supported color type round-trips bit-exactly through the stdlib
    decoder."""
    import numpy as np

    rng = np.random.default_rng(42 + color_type)
    px = rng.integers(0, 256, size=(5, 7, ch), dtype=np.uint8)
    payload = _encode_png(px, color_type, filters=[0, 1, 2, 3, 4])
    got = decode_image(payload)
    assert got.shape == (5, 7, ch)
    assert (got == px).all()


def test_decode_image_palette_and_errors():
    import numpy as np

    idx = np.array([[[0], [1]], [[2], [0]]], dtype=np.uint8)  # 2x2 indices
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    payload = _encode_png(idx, 3, palette=palette)
    got = decode_image(payload)
    assert got.shape == (2, 2, 3)
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[0, 1].tolist() == [0, 255, 0]
    assert got[1, 0].tolist() == [0, 0, 255]
    with pytest.raises(ValueError, match="not a PNG"):
        decode_image(b"JFIF not a png")
    # 16-bit depth is unsupported and must fail loudly, not garble
    import struct
    import zlib

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    deep = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_image(deep)


@pytest.mark.parametrize("bits,channels", [(8, 1), (16, 1), (16, 2)])
def test_decode_audio_roundtrip(bits, channels):
    """WAV PCM round-trips bit-exactly through the stdlib codec for
    8-bit mono / 16-bit mono / 16-bit stereo."""
    import numpy as np

    from open_bus_stride_etl_spark.operators.multimodal import decode_audio, encode_wav

    rng = np.random.default_rng(7 + bits + channels)
    lo, hi = (-128, 128) if bits == 8 else (-32768, 32768)
    samples = rng.integers(lo, hi, size=(13, channels), dtype=np.int32)
    payload = encode_wav(samples, sample_rate=16000, bits=bits)
    got, sr = decode_audio(payload)
    assert sr == 16000
    assert got.shape == (13, channels)
    assert (got == samples).all()


def test_decode_audio_skips_unknown_chunks_and_errors():
    import struct

    import numpy as np

    from open_bus_stride_etl_spark.operators.multimodal import decode_audio, encode_wav

    samples = np.array([[100], [-100], [0]], dtype=np.int32)
    payload = bytearray(encode_wav(samples, sample_rate=8000))
    # splice a LIST metadata chunk between fmt and data (RIFF allows it)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = bytes(payload[:fmt_end]) + extra + bytes(payload[fmt_end:])
    got, sr = decode_audio(spliced)
    assert sr == 8000 and got.reshape(-1).tolist() == [100, -100, 0]
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_audio(b"OggS not a wav")
    # non-PCM (format tag 3 = float) must fail loudly
    bad = bytearray(encode_wav(samples, sample_rate=8000))
    bad[20] = 3  # audio format field inside fmt chunk
    with pytest.raises(ValueError, match="unsupported"):
        decode_audio(bytes(bad))


def test_decode_audio_stats_spark_stage(spark):
    import numpy as np

    from open_bus_stride_etl_spark.operators import multimodal as mm

    clip = np.full((5, 2), -250, dtype=np.int32)  # |mean| = 250.000
    rows = [
        Row(media_id=1, payload=bytearray(mm.encode_wav(clip, sample_rate=44100))),
        Row(media_id=2, payload=bytearray(b"not audio at all")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in mm.decode_audio_stats(media).collect()}
    assert out[1]["decode_ok"] and out[1]["sample_rate"] == 44100
    assert out[1]["n_samples"] == 5 and out[1]["n_audio_channels"] == 2
    assert out[1]["mean_abs_milli"] == 250000
    assert not out[2]["decode_ok"]


def test_decode_image_stats_spark_stage(spark):
    """The real decoder runs end-to-end inside the Arrow mapInPandas
    stage: valid PNGs yield dimensions + deterministic integer pixel
    means; corrupt/non-PNG payloads become decode_ok=false rows."""
    import numpy as np

    from open_bus_stride_etl_spark.operators import multimodal as mm

    g = np.full((4, 6, 1), 100, dtype=np.uint8)  # uniform gray: mean 100.000
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[..., 0] = 255  # pure red: mean 255/3 = 85.000
    rows = [
        Row(media_id=1, payload=bytearray(_encode_png(g, 0, filters=[0, 1, 2, 3]))),
        Row(media_id=2, payload=bytearray(_encode_png(rgb, 2))),
        Row(media_id=3, payload=bytearray(b"definitely not an image")),
        Row(media_id=4, payload=None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in mm.decode_image_stats(media).collect()}
    assert out[1]["decode_ok"] and (out[1]["width"], out[1]["height"]) == (6, 4)
    assert out[1]["n_channels"] == 1 and out[1]["mean_pixel_milli"] == 100000
    assert out[2]["decode_ok"] and out[2]["n_channels"] == 3
    assert out[2]["mean_pixel_milli"] == 85000
    assert not out[3]["decode_ok"] and out[3]["width"] is None
    assert not out[4]["decode_ok"]


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [
            Row(media_id=1, kind="video", payload=b"x" * 30720),  # 30 "frames"
            Row(media_id=2, kind="image", payload=b"y" * 30720),
        ]
    )
    rows = frame_sample_plan(media, every_n=10).collect()
    assert {r["media_id"] for r in rows} == {1}
    assert [r["frame_no"] for r in rows] == [0, 10, 20]


def test_ann_ivf_finds_planted_neighbor(spark):
    """A vector nearly identical to a query lands in the same IVF cell
    (same nearest pivot) and ranks first."""
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),   # pivot A
        Row(vec_id=1, embedding=[0.0, 1.0, 0.0, 0.0]),   # pivot B
        Row(vec_id=50, embedding=[0.9, 0.05, 0.0, 0.0]),  # query, cell A
        Row(vec_id=7, embedding=[0.91, 0.04, 0.01, 0.0]),  # planted near-dup
        Row(vec_id=8, embedding=[0.0, 0.95, 0.1, 0.0]),   # cell B noise
    ]
    emb = spark.createDataFrame(rows)
    q = emb.where(F.col("vec_id") == 50)
    out = sim.ann_ivf_topk(emb, q, k=2, n_pivots=2).orderBy("rank").collect()
    assert out[0]["cand_id"] == 7 and out[0]["cos"] > 0.999
    # cell-B vector (8) must NOT be scored: candidates are cell-local
    assert all(r["cand_id"] != 8 for r in out)


def test_embedding_near_dup_threshold(spark):
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.02, 0.2]),
        Row(vec_id=2, embedding=[0.99, 0.01, 0.2]),  # near-dup of 1, same sign bits
        Row(vec_id=3, embedding=[-1.0, 0.5, -0.2]),  # different bucket/sign
    ]
    emb = spark.createDataFrame(rows)
    out = sim.embedding_near_dup_pairs(emb, threshold=0.95, bits=3).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(1, 2)]
    assert out[0]["cos"] > 0.99


def test_multimodal_resize_and_features_chain(spark):
    """The media pipeline composes: resize scales metadata preserving
    aspect; feature-extract emits embeddings the similarity operators
    consume directly (identical payloads -> identical vectors -> top
    cosine match)."""
    from open_bus_stride_etl_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [
            Row(media_id=1, kind="image", payload=bytes(range(200)) * 3,
                width=1024, height=512, sample_rate=None),
            Row(media_id=2, kind="image", payload=bytes(range(200)) * 3,  # dup of 1
                width=200, height=100, sample_rate=None),
            Row(media_id=3, kind="image", payload=bytes([7, 9, 250] * 40),
                width=100, height=200, sample_rate=None),
        ],
        mm.MEDIA_SCHEMA,
    )
    resized = {r["media_id"]: r for r in mm.fake_resize(media, max_dim=256).collect()}
    assert (resized[1]["width"], resized[1]["height"]) == (256, 128)  # aspect kept
    assert (resized[2]["width"], resized[2]["height"]) == (200, 100)  # under cap: untouched

    feats = mm.fake_feature_extract(media, dim=8)
    rows = {r["media_id"]: r["embedding"] for r in feats.collect()}
    assert all(len(v) == 8 and abs(sum(v) - 1.0) < 1e-6 for v in rows.values())
    assert rows[1] == rows[2] != rows[3]

    out = sim.cosine_topk(feats, feats.where(F.col("media_id") == 1), k=2,
                          id_col="media_id", vec_col="embedding").orderBy("rank").collect()
    assert out[0]["cand_id"] == 2 and out[0]["cos"] > 0.999999


# ---------------------------------------------------------------------------
# The NumPy probe machinery: tie-exactness and edge cases
# ---------------------------------------------------------------------------

def test_topk_per_column_matches_full_sort_with_tie_runs():
    """The slab optimization (np.partition + boundary sort) must equal a
    full (cos DESC, cand_id ASC) sort even when a tie run straddles the
    k boundary — the case a naive argpartition cut gets wrong."""
    import numpy as np

    rng = np.random.RandomState(7)
    # scores drawn from few distinct values => massive tie runs
    cos = rng.choice([0.1, 0.5, 0.5000000001, 0.9], size=(200, 17))
    cand_ids = rng.permutation(200).astype(np.int64)
    k = 5
    for j, cand_top, col_top in sim._topk_per_column(cos.copy(), cand_ids, k):
        order = np.lexsort((cand_ids, -cos[:, j]))[:k]
        assert list(cand_top) == list(cand_ids[order]), f"col {j}"
        assert list(col_top) == list(cos[:, j][order]), f"col {j}"


def test_topk_per_column_neginf_rows_never_emitted():
    import numpy as np

    cos = np.array([[0.9, -np.inf], [-np.inf, 0.8], [0.1, 0.2]])
    cand_ids = np.array([10, 11, 12], dtype=np.int64)
    got = {j: list(c) for j, c, _ in sim._topk_per_column(cos, cand_ids, k=3)}
    assert got[0] == [10, 12] and got[1] == [11, 12]


def test_cosine_topk_empty_query_set_returns_empty(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.5] * 4)],
    )
    out = sim.cosine_topk(emb, emb.where(F.col("vec_id") < 0), k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "cand_id", "rank", "cos"]


def test_fan_out_rebalances_single_partition(spark):
    from open_bus_stride_etl_spark.operators.util import fan_out

    df = spark.range(100).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    fanned = fan_out(df)
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert fanned.count() == 100
    # already-wide inputs pass through without an extra shuffle
    wide = spark.range(100).repartition(64)
    assert fan_out(wide) is wide


# ---------------------------------------------------------------------------
# Sampling + sketches (operators/sampling.py)
# ---------------------------------------------------------------------------

def test_deterministic_sample_nested_and_stable(spark):
    from open_bus_stride_etl_spark.operators import sampling as sp

    df = spark.range(1, 2001).withColumnRenamed("id", "k")
    s10 = set(r["k"] for r in sp.deterministic_sample(df, "k", 10).collect())
    s30 = set(r["k"] for r in sp.deterministic_sample(df, "k", 30).collect())
    assert s10 and s10 < s30  # nested carve-outs: 10% subset of 30%
    assert 0.05 < len(s10) / 2000 < 0.15 and 0.22 < len(s30) / 2000 < 0.38
    # stable across repartitioning (pure function of the key)
    again = set(r["k"] for r in sp.deterministic_sample(df.repartition(13), "k", 10).collect())
    assert again == s10


def test_reservoir_per_group_exactly_k_and_reproducible(spark):
    from open_bus_stride_etl_spark.operators import sampling as sp

    df = spark.range(1, 501).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("k")
    )
    out1 = sp.reservoir_per_group(df, "g", "k", 7).groupBy("g").count().collect()
    assert all(r["count"] == 7 for r in out1)
    a = sorted(map(tuple, sp.reservoir_per_group(df, "g", "k", 7).collect()))
    b = sorted(map(tuple, sp.reservoir_per_group(df.repartition(9), "g", "k", 7).collect()))
    assert a == b
    # a different seed draws a different sample
    c = sorted(map(tuple, sp.reservoir_per_group(df, "g", "k", 7, seed="x").collect()))
    assert a != c


def test_approx_sketches_within_tolerance(spark):
    from open_bus_stride_etl_spark.operators import sampling as sp

    df = spark.range(0, 20000).select((F.col("id") % 7919).alias("v"))
    approx = sp.approx_distinct(df, "v", rsd=0.02).collect()[0][0]
    assert abs(approx - 7919) / 7919 < 0.06  # 3x the target rsd
    dd_ = df.selectExpr("CAST(v AS DOUBLE) AS v")
    exact_median = dd_.selectExpr("percentile(v, 0.5) AS m").collect()[0][0]
    qs = sp.approx_quantiles(dd_, "v", [0.5], 0.01)
    # rank-error guarantee: within ~1% of N ranks => values are close on
    # this near-uniform distribution
    assert abs(qs[0] - exact_median) < 200


def test_multiprobe_lsh_recall_dominates_exact_bucket(spark):
    """Multi-probe candidates are a superset of exact-bucket candidates,
    so per query the rank-1 similarity can only improve or tie."""
    from open_bus_stride_etl_spark.sources.lake import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    base = {r["query_id"]: r["cos"]
            for r in sim.ann_lsh_topk(emb, queries, k=1).collect()}
    multi = {r["query_id"]: r["cos"]
             for r in sim.ann_lsh_topk(emb, queries, k=1, probes=1).collect()}
    assert set(base) <= set(multi)  # probing can only add answerable queries
    assert all(multi[q] >= base[q] for q in base)


def test_chunk_fixed_overlap_and_short_docs(spark):
    from open_bus_stride_etl_spark.operators import chunking as ck

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a" * 250), Row(doc_id=2, text="short")]
    )
    out = {(r["doc_id"], r["chunk_no"]): r for r in ck.chunk_fixed(
        docs, chunk_chars=100, overlap=20).collect()}
    # 250 chars, step 80: starts 0/80/160 — last window still has >=20 new chars
    assert sorted(k[1] for k in out if k[0] == 1) == [0, 1, 2]
    assert out[(1, 1)]["chunk_start"] == 80
    assert len(out[(1, 0)]["chunk_text"]) == 100
    assert out[(1, 0)]["chunk_text"][80:] == out[(1, 1)]["chunk_text"][:20]  # overlap
    assert out[(2, 0)]["chunk_text"] == "short"  # short doc: one chunk


def test_pack_greedy_bins_bounded(spark):
    from open_bus_stride_etl_spark.operators import chunking as ck

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join("w" for _ in range(5 + i % 17))) for i in range(200)]
    )
    out = ck.pack_greedy(docs, budget_tokens=50, n_shards=4)
    per_bin = out.groupBy("shard", "bin_id").agg(
        F.sum("n_tokens").alias("total"), F.max("n_tokens").alias("mx")
    ).collect()
    # streaming first-fit bound: bin total <= budget + largest member
    assert all(r["total"] <= 50 + r["mx"] for r in per_bin)
    # bins are dense per shard: 0..max with no gaps
    for shard in {r["shard"] for r in per_bin}:
        bins = sorted(r["bin_id"] for r in per_bin if r["shard"] == shard)
        assert bins == list(range(len(bins)))


def _uf_components(n_nodes, edges):
    """Reference union-find for the CC property test."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    out = {}
    touched = {u for e in edges for u in e}
    for x in touched:
        out[x] = find(x)
    return out


@pytest.mark.parametrize(
    "edges",
    [
        # a long chain: worst case for naive label propagation
        [(i, i + 1) for i in range(60)],
        # two cliques + a bridge + an isolated pair
        [(i, j) for i in range(5) for j in range(i + 1, 5)]
        + [(i, j) for i in range(10, 16) for j in range(i + 1, 16)]
        + [(4, 10), (100, 101)],
        # star with high-id center (exercises both large- and small-star)
        [(99, i) for i in range(20)],
        # pseudo-random graph, deterministic seed
        [((i * 7919) % 50, (i * 104729) % 50) for i in range(80) if (i * 7919) % 50 != (i * 104729) % 50],
    ],
)
@pytest.mark.parametrize("local_finish", [0, 50_000])
@pytest.mark.parametrize("precontract", [False, True])
def test_connected_components_matches_union_find(spark, edges, local_finish, precontract):
    """local_finish=0 forces the fully-distributed star rounds;
    50_000 takes the driver-side union-find tail finish; precontract
    adds the map-local union-find round first — all four combinations
    must produce identical components."""
    expected = _uf_components(200, edges)
    pairs = spark.createDataFrame(
        [Row(doc_a=u, doc_b=v) for u, v in edges], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in dd.connected_components(
            pairs, local_finish_edges=local_finish, precontract=precontract
        ).collect()
    }
    assert got == expected


def test_local_cc_finish_kernel_matches_union_find(spark):
    """Direct kernel test for the r7 vectorized _local_cc_finish
    (numpy min-label propagation + pointer jumping, replacing the dict
    union-find): randomized non-contiguous-id graphs plus the shapes
    that stress the jumping loop (long chains, duplicate edges,
    reversed orientation) must match a reference union-find exactly —
    component_id = MIN node id for every node that appears in edges."""
    import random

    rng = random.Random(42)
    cases = [
        # long chain (pointer jumping needs O(log n) outer rounds)
        [(i * 3 + 1, i * 3 + 4) for i in range(400)],
        # duplicate + reversed edges
        [(5, 9), (9, 5), (5, 9), (9, 14), (14, 5)],
    ]
    for _ in range(6):
        n = rng.randint(2, 300)
        cases.append(
            [
                (rng.randrange(n) * 11 + 2, rng.randrange(n) * 11 + 2)
                for _ in range(rng.randint(1, 500))
            ]
        )
    for edges in cases:
        edges = [(u, v) for u, v in edges if u != v]
        if not edges:
            continue
        nodes = {x for e in edges for x in e}
        expected = _uf_components(max(nodes) + 1, edges)
        pairs = spark.createDataFrame(
            [Row(doc_a=u, doc_b=v) for u, v in edges], "doc_a long, doc_b long"
        )
        got = {
            r["doc_id"]: r["component_id"]
            for r in dd._local_cc_finish(pairs).collect()
        }
        assert got == expected


def test_precontract_preserves_self_loop_only_nodes(spark):
    """r5 ADVICE fix: with input_simple=True (caller skips the defensive
    self-loop filter) a node appearing ONLY in self-loop edges must not
    be silently dropped by the map-local precontract pass — precontract
    must be a transparent optimization, so precontract=True/False give
    identical components on the same (off-contract) input."""
    pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=7, doc_b=7), Row(doc_a=2, doc_b=3)],
        "doc_a long, doc_b long",
    )
    results = []
    for pre in (False, True):
        got = {
            r["doc_id"]: r["component_id"]
            for r in dd.connected_components(
                pairs, input_simple=True, local_finish_edges=50_000, precontract=pre
            ).collect()
        }
        results.append(got)
    assert results[0] == results[1]
    assert results[0][7] == 7  # singleton survives
    assert results[0][1] == results[0][2] == results[0][3] == 1


@pytest.mark.parametrize("local_finish", [0, 50_000])
def test_connected_components_empty_and_self_loops(spark, local_finish):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dd.connected_components(empty, local_finish_edges=local_finish).count() == 0
    loops = spark.createDataFrame([Row(doc_a=7, doc_b=7)], "doc_a long, doc_b long")
    assert dd.connected_components(loops, local_finish_edges=local_finish).count() == 0


def test_quantile_threshold_filter_tie_inclusive(spark):
    from open_bus_stride_etl_spark.operators import curation as cu

    # group g: scores 10,9,8,8,8,1,1,1,1,1 (n=10, k=ceil(10/5)=2 -> t=9)
    rows = [Row(g="g", id=i, s=s) for i, s in enumerate([10, 9, 8, 8, 8, 1, 1, 1, 1, 1])]
    # group h: all ties (n=5, k=1 -> t=7, everything kept)
    rows += [Row(g="h", id=100 + i, s=7) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, id long, s long")
    out = cu.quantile_threshold_filter(df, "g", "s", keep_top_n_of=(1, 5)).collect()
    got = {(r["g"], r["id"]): r["thr_s"] for r in out}
    assert {k for k in got if k[0] == "g"} == {("g", 0), ("g", 1)}  # 10 and 9
    assert all(v == 9 for k, v in got.items() if k[0] == "g")
    assert len([k for k in got if k[0] == "h"]) == 5  # ties all kept
    assert all(v == 7 for k, v in got.items() if k[0] == "h")


def test_balance_sources_rates_and_determinism(spark):
    from open_bus_stride_etl_spark.operators import curation as cu

    rows = [Row(source="big", doc_id=i) for i in range(1000)] + [
        Row(source="small", doc_id=10_000 + i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = {r["source"]: r for r in cu.balance_sources(df).collect()}
    assert out["small"]["rate_bp"] == 10000 and out["small"]["n_kept"] == 100
    assert out["big"]["rate_bp"] == 1000  # 100/1000 of 10000 bp
    # md5 membership is a pure function of doc_id: repartitioning is a no-op
    out2 = {r["source"]: r for r in cu.balance_sources(df.repartition(13)).collect()}
    assert out == out2
    # kept count tracks the rate (binomial-ish, wide tolerance)
    assert 60 <= out["big"]["n_kept"] <= 140


def test_shared_span_pairs_planted_run(spark):
    # docs 1+2 share the verbatim 6-word run "one two three four five
    # six" (4 consecutive 3-gram shingles) at different offsets, plus
    # nothing else; doc 3 shares nothing.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta one two three four five six gamma"),
            Row(doc_id=2, text="one two three four five six delta epsilon zeta"),
            Row(doc_id=3, text="totally different words in this document here"),
        ]
    )
    cands = spark.createDataFrame([Row(doc_a=1, doc_b=2), Row(doc_a=1, doc_b=3)])
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in dd.shared_span_pairs(docs, candidates=cands).collect()
    }
    # pair (1,3): no shared shingle -> absent
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert r["max_run_shingles"] == 4
    assert r["max_run_words"] == 6
    assert r["n_matches"] == 4


def test_shared_span_two_disjoint_runs_and_repeats(spark):
    # Shared runs: "a b c d" (2 shingles) appears twice in doc 2 -> the
    # duplicate alignment cells land on DIFFERENT diagonals; and a
    # separate shared run "x y z" (1 shingle). Longest stays 2.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d q q q x y z"),
            Row(doc_id=2, text="a b c d m m a b c d n x y z"),
        ]
    )
    cands = spark.createDataFrame([Row(doc_a=1, doc_b=2)])
    r = dd.shared_span_pairs(docs, candidates=cands).collect()[0]
    assert r["max_run_shingles"] == 2
    assert r["max_run_words"] == 4
    # alignments: run1 at two diagonals (2 cells each) + "x y z" (1 cell)
    assert r["n_matches"] == 5


def test_epoch_upsample_fractional_copies(spark):
    from open_bus_stride_etl_spark.operators.curation import epoch_upsample, hash_bucket_bp

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="a" if i < 200 else "b") for i in range(400)]
    )
    w = spark.createDataFrame(
        [Row(source="a", weight_bp=23000), Row(source="b", weight_bp=4000)]
    )
    out = epoch_upsample(docs, w)
    by_doc = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # source a: every doc has 2 or 3 copies; fraction with 3 ~= 30%
    a_counts = [by_doc[i] for i in range(200) if i in by_doc]
    assert len(a_counts) == 200 and set(a_counts) <= {2, 3}
    assert 30 <= sum(1 for c in a_counts if c == 3) <= 90
    # source b (0.4 epochs): docs appear once or not at all
    b_counts = [by_doc.get(i, 0) for i in range(200, 400)]
    assert set(b_counts) <= {0, 1}
    assert 40 <= sum(b_counts) <= 120
    # copy_idx enumerates 1..n for every doc
    bad = (
        out.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("copy_idx").alias("mx"), F.min("copy_idx").alias("mn"))
        .where((F.col("mx") != F.col("n")) | (F.col("mn") != 1))
        .count()
    )
    assert bad == 0
    # determinism: exact same rows on re-run
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, epoch_upsample(docs, w).collect()))


def test_shard_shuffle_deterministic_and_contiguous(spark):
    from open_bus_stride_etl_spark.operators.sampling import shard_shuffle

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(500)])
    a = shard_shuffle(docs, n_shards=8, seed="s1").collect()
    b = shard_shuffle(docs.repartition(13), n_shards=8, seed="s1").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # partitioning-invariant
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense ranks
    # a different seed produces a different order
    c = shard_shuffle(docs, n_shards=8, seed="s2").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_ann_recall_at_k_counts(spark):
    exact = spark.createDataFrame(
        [Row(query_id=1, cand_id=c) for c in (10, 11, 12)]
        + [Row(query_id=2, cand_id=c) for c in (20, 21)]
    )
    ann = spark.createDataFrame(
        [Row(query_id=1, cand_id=c) for c in (10, 12, 99)]
        + [Row(query_id=2, cand_id=77)]
    )
    out = {r["query_id"]: r for r in sim.ann_recall_at_k(exact, ann).collect()}
    assert out[1]["n_true"] == 3 and out[1]["n_hit"] == 2 and out[1]["recall_bp"] == 6667
    assert out[2]["n_true"] == 2 and out[2]["n_hit"] == 0 and out[2]["recall_bp"] == 0


def test_leakage_safe_split_co_assigns_dup_groups(spark):
    """Every member of a near-dup component must land in the SAME split,
    the assignment must be deterministic, and the weights must roughly
    hold on singleton docs."""
    from open_bus_stride_etl_spark.operators.curation import leakage_safe_split

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(500)], "doc_id long")
    # components: docs 0-9 in one group, 100-104 in another
    comps = spark.createDataFrame(
        [Row(doc_id=i, component_id=0) for i in range(10)]
        + [Row(doc_id=i, component_id=100) for i in range(100, 105)],
        "doc_id long, component_id long",
    )
    out = {r["doc_id"]: r["split"] for r in leakage_safe_split(docs, comps).collect()}
    assert len(out) == 500 and set(out.values()) <= {"train", "val", "test"}
    assert len({out[i] for i in range(10)}) == 1, "dup group split across sets"
    assert len({out[i] for i in range(100, 105)}) == 1
    # deterministic
    out2 = {r["doc_id"]: r["split"] for r in leakage_safe_split(docs, comps).collect()}
    assert out == out2
    # rough weight sanity on ~485 singletons: train is the large bucket
    n_train = sum(1 for v in out.values() if v == "train")
    assert n_train > 400
    with pytest.raises(ValueError, match="10000"):
        leakage_safe_split(docs, None, {"train": 5000, "test": 1000})
    # without components: still total, deterministic
    solo = {r["doc_id"]: r["split"] for r in leakage_safe_split(docs).collect()}
    assert len(solo) == 500


def test_decode_stats_survive_corrupt_payloads(spark):
    """Signature-valid but corrupt payloads (truncated chunks, garbage
    deflate streams, wrong lengths) must become decode_ok=false rows —
    the Arrow stage never fails the job on a bad file."""
    import struct
    import zlib

    from open_bus_stride_etl_spark.operators import multimodal as mm

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    sig = b"\x89PNG\r\n\x1a\n"
    rows = [
        # valid signature, garbage after
        (1, sig + b"\x00" * 40),
        # valid IHDR, IDAT is not a deflate stream
        (2, sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", b"not deflate") + chunk(b"IEND", b"")),
        # valid IHDR, deflate stream of the WRONG length
        (3, sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 3)) + chunk(b"IEND", b"")),
        # RIFF/WAVE with a truncated fmt chunk
        (4, b"RIFF" + struct.pack("<I", 20) + b"WAVE" + b"fmt " + struct.pack("<I", 4) + b"\x01\x00"),
    ]
    media = spark.createDataFrame(
        [Row(media_id=i, payload=bytearray(p)) for i, p in rows],
        "media_id long, payload binary",
    )
    img = {r["media_id"]: r["decode_ok"] for r in mm.decode_image_stats(media).collect()}
    aud = {r["media_id"]: r["decode_ok"] for r in mm.decode_audio_stats(media).collect()}
    assert img == {1: False, 2: False, 3: False, 4: False}
    assert aud == {1: False, 2: False, 3: False, 4: False}


def test_minhash_lsh_broadcast_guard_fallback_matches(spark):
    """Above max_broadcast_pairs the pair joins drop their broadcast
    hints (AQE shuffle joins complete instead of OOMing the driver on a
    degenerate all-near-identical corpus) — and the rows must be
    IDENTICAL to the broadcast path."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"the quick document number {i} talks about data and the pipeline")
         for i in range(40)]
    )
    fast = sorted(map(tuple, dd.minhash_lsh_pairs(docs).collect()))
    degraded = sorted(map(tuple, dd.minhash_lsh_pairs(docs, max_broadcast_pairs=1).collect()))
    assert fast == degraded and len(fast) > 100  # templated docs: dense pair set
