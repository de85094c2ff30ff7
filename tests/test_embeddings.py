"""Embedding compression operators: numerics against numpy, plans stay
UDF-free (operators/embeddings.py)."""

import numpy as np
import pyspark.sql.functions as F

from userbehavioranalysis_spark.operators.embeddings import (
    dequantize_int8,
    l2_normalize,
    quantize_int8,
)
from userbehavioranalysis_spark.sources.readers import load_testdata

SF = "/root/testdata/sf0.001"


def test_l2_normalize_matches_numpy(spark):
    emb = load_testdata(spark, SF)["embeddings"].limit(50)
    rows = l2_normalize(emb).select("vec_id", "embedding").collect()
    raw = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    for r in rows:
        v = raw[r["vec_id"]].astype(np.float64)
        want = v / np.linalg.norm(v) if np.linalg.norm(v) else v
        np.testing.assert_allclose(np.array(r["embedding"]), want, rtol=1e-12)


def test_quantize_roundtrip_error_bounded(spark):
    emb = load_testdata(spark, SF)["embeddings"].limit(100)
    deq = dequantize_int8(quantize_int8(emb)).select(
        "vec_id", "embedding", "q_scale", "q_vec", "embedding_deq"
    )
    for r in deq.collect():
        x = np.array(r["embedding"], dtype=np.float64)
        q = np.array(r["q_vec"], dtype=np.int64)
        assert q.min() >= -128 and q.max() <= 127
        if r["q_scale"] == 0.0:
            assert not np.any(x)
            continue
        bound = 0.5 / r["q_scale"] + 1e-12
        err = np.max(np.abs(x - np.array(r["embedding_deq"])))
        assert err <= bound, (r["vec_id"], err, bound)


def test_zero_vector_safe(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    out = dequantize_int8(quantize_int8(l2_normalize(df))).collect()
    z = next(r for r in out if r["vec_id"] == 1)
    assert z["q_scale"] == 0.0 and list(z["q_vec"]) == [0, 0, 0]
    assert list(z["embedding_deq"]) == [0.0, 0.0, 0.0]


def test_quantize_plan_is_udf_free(spark):
    emb = load_testdata(spark, SF)["embeddings"]
    plan = (
        quantize_int8(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quantized_ann_recall_vs_exact(spark):
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.embeddings import ann_topk_quantized
    from userbehavioranalysis_spark.operators.similarity import ann_topk_brute

    emb = load_testdata(spark, SF)["embeddings"]
    qs = emb.filter(F.col("vec_id") < 5)
    exact = ann_topk_brute(emb, qs, k=10).collect()
    quant = ann_topk_quantized(emb, qs, k=10).collect()
    truth, got = {}, {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in quant:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(truth) == set(got)
    recalls = [len(truth[q] & got[q]) / len(truth[q]) for q in truth]
    # int8 on 64-dim vectors: quantization noise may swap near-ties at
    # the top-10 boundary but must preserve the neighborhood
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_thumbnail_sig_resolution_invariant(spark):
    """The perceptual point: same two-tone content at different
    resolutions -> same signature; different tones -> different."""
    from userbehavioranalysis_spark.operators.multimodal import (
        image_thumbnail_sig,
        synthetic_two_tone_bmp,
    )

    # doc 1 and 41 share tones (1%4, (1//4)%4) vs (41%4=1, (41//4)%4=2)?
    # choose ids with identical (id%4, (id//4)%4) and same n_chars parity:
    # 1 -> (1, 0); 17 -> (1, 0); widths 8+(10%32)=18 and 8+(12%32)=20 (both even)
    docs = spark.createDataFrame(
        [(1, 10), (17, 12), (2, 10)],
        "doc_id long, n_chars long",
    )
    sigs = {r.media_id: (r.sig_hex, r.width, r.height) for r in
            image_thumbnail_sig(synthetic_two_tone_bmp(docs)).collect()}
    assert sigs[1][1:] != sigs[17][1:]      # genuinely different dims
    assert sigs[1][0] == sigs[17][0]        # same perceptual signature
    assert sigs[1][0] != sigs[2][0]         # different tones differ


def test_phash_dedup_groups_across_byte_different_payloads(spark):
    from userbehavioranalysis_spark.operators.multimodal import (
        phash_dedup_clusters,
        synthetic_two_tone_bmp,
    )

    docs = spark.createDataFrame(
        [(1, 10), (17, 12), (2, 10)],
        "doc_id long, n_chars long",
    )
    rows = phash_dedup_clusters(synthetic_two_tone_bmp(docs)).collect()
    got = {r.keep_id: r.n_images for r in rows}
    assert got == {1: 2, 2: 1}


def test_audio_chunks_partial_tail_and_exact_rms(spark):
    from userbehavioranalysis_spark.operators.multimodal import (
        audio_chunks,
        synthetic_wav_media,
    )

    # doc 3: n_frames = 800 + 500 = 1300 -> chunks 256*5 + 20
    docs = spark.createDataFrame([(3, 500)], "doc_id long, n_chars long")
    rows = sorted(
        audio_chunks(synthetic_wav_media(docs)).collect(),
        key=lambda r: r.chunk_no,
    )
    assert [r.n_frames for r in rows] == [256] * 5 + [20]
    amp = 1000 + 3 % 20000
    assert all(r.peak == amp and r.rms == amp for r in rows)


def test_pq_encode_code_contract(spark):
    """Codes are (m) ints in [0, n_codes), one row per vector, and the
    nearest-centroid property holds against numpy recomputation."""
    import random

    import numpy as np

    from userbehavioranalysis_spark.operators.embeddings import (
        pq_codebooks,
        pq_encode,
    )

    rng = random.Random(9)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(60)]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    books = pq_codebooks(emb, m=4, n_codes=8, sample_n=60)
    rows = pq_encode(emb, books).collect()
    assert len(rows) == 60
    got = {r["vec_id"]: r["codes"] for r in rows}
    x = np.array(vecs)
    for i in range(60):
        codes = got[i]
        assert len(codes) == 4 and all(0 <= c < 8 for c in codes)
        for j in range(4):
            xs = x[i, j * 4 : (j + 1) * 4]
            d = ((books[j] - xs) ** 2).sum(axis=1)
            assert codes[j] == int(d.argmin())


def test_doc_embed_hashing_semantics(spark):
    """Hashing-trick embeddings: unit norm, near-dup texts land close,
    disjoint-vocabulary texts land near-orthogonal, and token COUNTS
    (not just presence) shape the vector."""
    from userbehavioranalysis_spark.operators.embeddings import doc_embed_hashing

    base = "the quick brown fox jumps over the lazy dog by the river"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base.replace("river", "creek")),        # near dup
            (2, "alpha beta gamma delta epsilon zeta"),  # disjoint vocab
            (3, base + " " + base),                      # doubled counts
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["embedding"] for r in doc_embed_hashing(docs).collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    for v in got.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9  # unit norm
    assert cos(got[0], got[1]) > 0.8
    assert abs(cos(got[0], got[2])) < 0.5
    # doubling every count leaves the normalized vector unchanged
    assert cos(got[0], got[3]) > 0.999999


def test_doc_embed_kernel_matches_sql_fold(spark):
    """The Arrow embed kernel must be BIT-identical to the SQL
    explode → 64-conditional-sum → fold-norm formulation it replaced
    (the r9 optimization), over the awkward tokenization shapes: empty
    text (one empty token), leading/trailing Java-\\s whitespace
    (leading empty token kept, trailing kept by split's -1 limit),
    tabs/newlines (NOT trimmed by trim — only ASCII spaces are),
    repeated tokens, unicode, and a doc whose every token cancels is
    still emitted (zero vector).  NULL text drops the row on both
    paths."""
    from pyspark.sql import functions as F

    from userbehavioranalysis_spark.operators.embeddings import doc_embed_hashing

    dim = 64
    docs = spark.createDataFrame(
        [
            (0, "plain words here"),
            (1, ""),                          # one empty token
            (2, "   spaced   out   "),        # ASCII spaces trimmed
            (3, "\tleading tab"),             # tab NOT trimmed -> leading empty token
            (4, "trailing newline\n"),        # kept by limit -1
            (5, "dup dup dup dup words"),
            (6, "héllo wörld ünïcode"),
            (7, None),                        # dropped on both paths
            (8, "a\nb\tc\x0bd\x0ce\rf"),      # every Java \s delimiter
        ],
        "doc_id long, text string",
    )
    # the pre-r9 SQL formulation, verbatim
    toks = F.expr("split(trim(text), '\\\\s+')")
    h = "cast(conv(substr(md5(concat('e#', w)), 1, 15), 16, 10) as bigint)"
    s = "cast(conv(substr(md5(concat('s#', w)), 1, 15), 16, 10) as bigint)"
    words = (
        docs.withColumn("_t", toks)
        .select("doc_id", F.posexplode_outer("_t").alias("_p", "w"))
        .filter(F.col("_p").isNotNull())
        .select(
            "doc_id",
            F.expr(f"pmod({h}, {dim})").alias("b"),
            F.expr(f"if(pmod({s}, 2) = 0, 1, -1)").alias("sg"),
        )
    )
    sums = words.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("b") == d, F.col("sg")).otherwise(0)).alias(f"v{d}")
            for d in range(dim)
        ]
    )
    iv = "array(" + ", ".join(f"v{d}" for d in range(dim)) + ")"
    norm = (
        "sqrt(aggregate(iv, cast(0 as double),"
        " (acc, x) -> acc + cast(x as double) * cast(x as double)))"
    )
    old = {
        r["doc_id"]: r["embedding"]
        for r in sums.withColumn("iv", F.expr(iv))
        .withColumn(
            "embedding",
            F.expr(
                f"CASE WHEN {norm} = 0.0 THEN transform(iv, x -> 0.0d) "
                f"ELSE transform(iv, x -> cast(x as double) / {norm}) END"
            ),
        )
        .select("doc_id", "embedding")
        .collect()
    }
    new = {r["doc_id"]: r["embedding"] for r in doc_embed_hashing(docs).collect()}
    assert set(new) == set(old) == {0, 1, 2, 3, 4, 5, 6, 8}
    for d in old:
        assert new[d] == old[d], f"doc {d}: kernel diverges from the SQL fold"
