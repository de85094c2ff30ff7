"""Dedup + similarity operators on constructed near-duplicate corpora."""

import pyspark.sql.functions as F

from userbehavioranalysis_spark.operators.dedup import (
    embedding_dedup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from userbehavioranalysis_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    synthetic_media,
)
from userbehavioranalysis_spark.operators.similarity import (
    ann_topk_brute,
    ann_topk_ivf,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"


def test_exact_dedup_groups(spark):
    docs = _docs(spark, [BASE, BASE, "completely different text here"])
    res = {r["text_md5"]: (r["n_docs"], r["keeper_id"]) for r in exact_dedup(docs).collect()}
    assert sorted(res.values()) == [(1, 2), (2, 0)]


def test_minhash_finds_near_duplicates_not_distinct(spark):
    near = BASE.replace("today", "tonight")
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(spark, [BASE, near, other])
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_hamming_close_for_near_duplicates(spark):
    near = BASE.replace("today", "tonight")
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(spark, [BASE, near, other])
    res = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=63).collect()}
    assert res[(0, 1)] < res[(0, 2)]
    assert res[(0, 1)] <= 12


def test_ngram_jaccard_exact_values(spark):
    # doc0: shingles {ab bc, bc cd} ; doc1: {ab bc, bc ce} -> inter 1, union 3
    docs = _docs(spark, ["ab bc cd", "ab bc ce"])
    [r] = ngram_jaccard_pairs(docs, shingle_k=2, jaccard_num=1, jaccard_den=10).collect()
    assert (r["inter_count"], r["union_count"]) == (1, 3)


def _embs(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], i % 2) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_embedding_dedup_threshold(spark):
    vecs = [[1, 0, 0], [0.99, 0.1, 0], [0, 1, 0]]
    pairs = {(r["vec_a"], r["vec_b"]) for r in embedding_dedup_pairs(_embs(spark, vecs), 0.9).collect()}
    assert pairs == {(0, 1)}


def test_ann_brute_orders_by_cosine(spark):
    vecs = [[1, 0, 0], [0.9, 0.1, 0], [0.5, 0.5, 0], [0, 1, 0]]
    emb = _embs(spark, vecs)
    res = ann_topk_brute(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    order = [r["neighbor_id"] for r in sorted(res, key=lambda r: r["rank"])]
    assert order == [1, 2, 3]


def test_ann_ivf_recall_on_clustered_data(spark):
    # 8 well-separated clusters of 12 points: k-means-lite IVF with 3
    # probes must recover nearly all brute-force top-5 neighbors
    import random

    from userbehavioranalysis_spark.operators.similarity import assign_ivf_clusters

    rng = random.Random(7)
    vecs = []
    for c in range(8):
        center = [0.0] * 16
        center[c * 2] = 1.0
        center[c * 2 + 1] = 0.5
        for _ in range(12):
            vecs.append([x + rng.uniform(-0.05, 0.05) for x in center])
    emb = _embs(spark, vecs)
    clustered = assign_ivf_clusters(emb, n_clusters=8, iters=2)
    q = emb.filter(F.col("vec_id") < 4)
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_brute(emb, q, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_ivf(clustered, q, k=5, cluster_col="cluster").collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.9, f"IVF recall {recall}"


def test_ann_lsh_recall_and_candidate_locality(spark):
    # clustered data again: banded hyperplane LSH must (a) recover most
    # brute-force neighbors, (b) never emit a pair that shares no band
    # (candidates come only from the (band, band_val) equi-join)
    import random

    from userbehavioranalysis_spark.operators.similarity import ann_topk_lsh

    rng = random.Random(11)
    vecs = []
    for c in range(4):
        center = [0.0] * 16
        center[c * 4] = 1.0
        center[c * 4 + 1] = -0.7
        for _ in range(20):
            vecs.append([x + rng.uniform(-0.08, 0.08) for x in center])
    emb = _embs(spark, vecs)
    q = emb.filter(F.col("vec_id") < 4)
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_brute(emb, q, k=5).collect()
    }
    lsh_rows = ann_topk_lsh(emb, q, k=5).collect()
    lsh = {(r["query_id"], r["neighbor_id"]) for r in lsh_rows}
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.9, f"LSH recall {recall}"
    # determinism: a second run returns the identical ranked rows
    again = ann_topk_lsh(emb, q, k=5).collect()
    assert sorted(map(tuple, lsh_rows)) == sorted(map(tuple, again))


def test_multimodal_feature_shapes_and_frame_fanout(spark):
    docs = _docs(spark, ["abcdef " * 30, "xyz " * 50, "short text"])
    media = synthetic_media(docs)
    feats = extract_features(media).collect()
    assert len(feats) == 3
    assert all(f["width"] >= 16 and 0 <= f["mean_intensity"] <= 1 for f in feats)
    frames = frame_sample(media, every_n_bytes=32).collect()
    vids = {r["media_id"] for r in frames}
    assert vids  # at least one video got sampled
    assert all(r["offset"] % 32 == 0 for r in frames)


def test_multimodal_resize_composes_with_features(spark):
    from userbehavioranalysis_spark.operators.multimodal import (
        extract_features,
        resize,
        synthetic_media,
    )

    docs = _docs(spark, ["x" * 500, "y" * 100, "short"])
    media = synthetic_media(docs)
    small = resize(media, max_bytes=64)
    rows = {r.media_id: r for r in small.collect()}
    assert all(r.byte_len <= 64 for r in rows.values())
    assert rows[0].byte_len == 64 and rows[2].byte_len == 5
    # binary-out schema composes straight into the feature extractor
    feats = extract_features(small).collect()
    assert len(feats) == 3 and all(f.width > 0 for f in feats)


def test_clean_corpus_pipeline_gates_compose(spark):
    from userbehavioranalysis_spark.operators.pipeline import clean_corpus

    texts = [
        "the cat sat on the mat and the dog slept near a door of wood",  # en, keeper
        "the cat sat on the mat and the dog slept near a door of wood",  # exact dup -> dropped
        "the cat sat on the mat and the dog slept near a door of pine",  # near dup -> dropped
        "der hund und die katze und das haus und der baum und das brot",  # german -> dropped
        "zz",                                                             # lang=und -> dropped
    ]
    out = clean_corpus(
        _docs(spark, texts), min_score=0.3, lang="en", near_dup_min_matches=9
    ).collect()
    assert [r.doc_id for r in out] == [0]
    assert out[0].n_tokens == 15


def test_simhash_blocking_strategies_agree(spark):
    """Pigeonhole blocking must be lossless: forced-blocked and
    all-pairs strategies return identical pair sets."""
    from userbehavioranalysis_spark.operators.dedup import simhash_pairs

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",   # near dup
        "one two three four five six seven eight nine",
        "alpha beta gamma delta epsilon zeta eta theta",  # exact dup
        "completely different words entirely unrelated here",
    ]
    docs = _docs(spark, texts)
    blocked = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(docs, block=True).collect()
    }
    allpairs = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(docs, block=False).collect()
    }
    assert blocked == allpairs
    assert (0, 3, 0) in allpairs  # exact dup pair at hamming 0


def test_dedup_clusters_components_and_canonicals(spark):
    from userbehavioranalysis_spark.operators.dedup import dedup_clusters

    # chain 1-2-3 (+ redundant 1-3), isolated pair 10-11, and a LONG
    # chain 100..140 whose diameter (40) exceeds max_iters (16) unless
    # pointer jumping actually doubles the propagation radius per round
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11)]
    pairs += [(i, i + 1) for i in range(100, 140)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup_clusters(df).collect()
    }
    assert got[1] == (1, True) and got[2] == (1, False) and got[3] == (1, False)
    assert got[10] == (10, True) and got[11] == (10, False)
    assert all(got[i] == (100, i == 100) for i in range(100, 141))
    assert len(got) == 3 + 2 + 41


def test_dedup_clusters_matches_union_find_property(spark):
    """Random pair graphs: the distributed CC must equal a plain
    union-find's components exactly (cluster id = min member)."""
    import random

    from userbehavioranalysis_spark.operators.dedup import dedup_clusters

    rng = random.Random(7)
    for trial in range(3):
        n = rng.randint(5, 60)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(1, 2 * n))
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        in_pairs = {x for p in pairs for x in p}
        expect = {x: find(x) for x in in_pairs}
        df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        got = {
            r["doc_id"]: r["cluster_id"] for r in dedup_clusters(df).collect()
        }
        assert got == expect, f"trial {trial}: {got} != {expect}"


def test_dedup_clusters_driver_finish_matches_distributed_tail(spark, monkeypatch):
    """The r9 driver-finish ending (union-find over the contracted
    remnant once it is provably driver-sized) must label EXACTLY like
    the pure distributed pointer-jumping tail it replaces.  Same graph,
    both endings: default threshold takes the driver finish after round
    0; threshold 0 forces the full distributed loop."""
    from userbehavioranalysis_spark.operators import dedup as D

    # two long chains (driver finish must union across many remnant
    # hops), a triangle, an isolated pair — all shapes in one graph
    pairs = [(i, i + 1) for i in range(100, 140)]
    pairs += [(i, i + 1) for i in range(300, 320)]
    pairs += [(1, 2), (2, 3), (1, 3), (10, 11)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    with_finish = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in D.dedup_clusters(df).collect()
    }
    monkeypatch.setattr(D, "_REMNANT_MAX_EDGES", 0)
    pure_distributed = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in D.dedup_clusters(df).collect()
    }
    assert with_finish == pure_distributed
    assert (100, 100, True) in with_finish and (140, 100, False) in with_finish


def test_pii_redact_counts_and_masking(spark):
    import hashlib

    from userbehavioranalysis_spark.operators.text_analysis import pii_redact

    docs = _docs(
        spark,
        [
            "mail bob.smith+x@corp.example.org or admin@sub.example.co now",
            "server at 192.168.1.200 and 10.0.0.7 responded",
            "nothing sensitive here",
        ],
    )
    got = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert (got[0]["n_emails"], got[0]["n_ips"]) == (2, 0)
    assert (got[1]["n_emails"], got[1]["n_ips"]) == (0, 2)
    assert (got[2]["n_emails"], got[2]["n_ips"]) == (0, 0)
    expect = "mail <EMAIL> or <EMAIL> now"
    assert got[0]["redacted_md5"] == hashlib.md5(expect.encode()).hexdigest()
    assert got[0]["redacted_len"] == len(expect)
    assert got[1]["redacted_md5"] == hashlib.md5(
        b"server at <IP> and <IP> responded"
    ).hexdigest()


def test_curate_sample_gate_and_cap(spark):
    import hashlib

    from userbehavioranalysis_spark.operators.text_analysis import curate_sample

    texts = [f"word{i} " + "the a of and filler text here" for i in range(40)]
    docs = _docs(spark, texts).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("fr")
    )
    rows = curate_sample(docs, hash_prefix_max="7f", per_lang=3).collect()
    # gate: only md5-prefix <= 7f docs can appear (~half)
    for r in rows:
        assert hashlib.md5(texts[r["doc_id"]].encode()).hexdigest()[:2] <= "7f"
    # cap: at most 3 per language, ranks 1..n contiguous
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["lang_rank"])
    for ranks in by_lang.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)) and len(ranks) <= 3


def test_wav_round_trip_real_decoder(spark):
    """The audio path is NOT a stub: real RIFF/WAV bytes parsed back by
    the stdlib wave module must reproduce the synthesis parameters."""
    import io
    import wave

    from userbehavioranalysis_spark.operators.multimodal import (
        audio_features,
        synthetic_wav_media,
    )

    docs = spark.createDataFrame(
        [(7, "x" * 123), (20042, "y" * 955)], "doc_id long, text string"
    ).withColumn("n_chars", __import__("pyspark.sql.functions", fromlist=["f"]).length("text").cast("long"))
    media = synthetic_wav_media(docs)
    payload = media.orderBy("media_id").first()["payload"]
    # independently verify the payload is a well-formed WAV container
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (8000, 1, 2)
    got = {r["media_id"]: r for r in audio_features(media).collect()}
    assert got[7]["n_frames"] == 800 + 123 and got[7]["peak"] == got[7]["rms"] == 1007
    assert got[20042]["n_frames"] == 800 + 955 % 800
    assert got[20042]["peak"] == 1000 + 20042 % 20000 == 1042


def test_bmp_round_trip_real_decoder(spark):
    """The image path round-trips genuine BMP bytes: header magic,
    dimensions, stride padding and pixel means all decoded for real."""
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.multimodal import (
        image_features,
        synthetic_bmp_media,
    )

    docs = spark.createDataFrame(
        [(3, "a" * 7), (260, "b" * 33)], "doc_id long, text string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    media = synthetic_bmp_media(docs)
    payload = bytes(media.orderBy("media_id").first()["payload"])
    assert payload[:2] == b"BM"  # real RIFF... BMP magic
    got = {r["media_id"]: r for r in image_features(media).collect()}
    # doc 3: w=8+7=15 (odd width exercises stride padding), h=8+3, gray=3
    assert (got[3]["width"], got[3]["height"], got[3]["mean_intensity"]) == (15, 11, 3)
    # doc 260: gray=260%256=4, h=8+260%32=12, w=8+33%32=9
    assert (got[260]["width"], got[260]["height"], got[260]["mean_intensity"]) == (9, 12, 4)


def test_bmp_resize_real_downscale(spark):
    """Resize is not a truncation stub: the output is a valid smaller
    BMP whose decoded dims follow the integer-stride formula and whose
    solid-gray content survives the resample exactly."""
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.multimodal import (
        bmp_resize,
        image_features,
        synthetic_bmp_media,
    )

    # doc 25: w=8+33%32=9, h=8+25%32=33 -> step=ceil(33/8)=5 -> 2x7
    docs = spark.createDataFrame(
        [(25, "b" * 33)], "doc_id long, text string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    small = bmp_resize(synthetic_bmp_media(docs), max_side=8)
    payload = bytes(small.first()["payload"])
    assert payload[:2] == b"BM"
    got = image_features(small).first()
    assert (got["width"], got["height"], got["mean_intensity"]) == (2, 7, 25)


def test_avi_round_trip_real_decoder(spark):
    """The video path round-trips a genuine RIFF/AVI container: magic,
    chunk tree, avih metadata and per-frame DIB pixels decoded for
    real, with every-2nd-frame sampling."""
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.multimodal import (
        synthetic_avi_media,
        video_frame_features,
    )

    docs = spark.createDataFrame(
        [(5, "a" * 7), (300, "b" * 21)], "doc_id long, text string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    media = synthetic_avi_media(docs)
    payload = bytes(media.orderBy("media_id").first()["payload"])
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    rows = video_frame_features(media, step=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["media_id"], []).append(r)
    # doc 5: n_frames=2+5%6=7 -> sampled frames 0,2,4,6; w=8+7=15 (odd
    # stride), h=8+5=13; frame f gray=(5+17f)%256
    f5 = sorted(by_doc[5], key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in f5] == [0, 2, 4, 6]
    assert all((r["width"], r["height"], r["n_frames"], r["fps"]) == (15, 13, 7, 10) for r in f5)
    assert [r["intensity"] for r in f5] == [(5 + 17 * f) % 256 for f in (0, 2, 4, 6)]
    # doc 300: n_frames=2+300%6=2 -> only frame 0; gray=300%256=44
    f300 = by_doc[300]
    assert len(f300) == 1 and f300[0]["frame_no"] == 0 and f300[0]["intensity"] == 44


def test_minhash_bucket_cap_subset_and_bound(spark):
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.dedup import minhash_lsh_pairs
    from userbehavioranalysis_spark.sources.readers import load_testdata

    docs = load_testdata(spark, "/root/testdata/sf0.001")["documents"]
    full = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    capped = minhash_lsh_pairs(docs, max_bucket=32).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in capped}
    # dropping buckets can only remove candidates, never invent them
    assert got <= full
    assert len(got) < len(full)  # the dup-dense corpus must trip the cap


def test_substring_spans_flags_verbatim_boilerplate(spark):
    from userbehavioranalysis_spark.operators.dedup import substring_spans

    boiler = "all rights reserved contact us terms of service apply here"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (0, boiler + " unique tail zero", "en", "s", 0),
            (1, boiler + " different ending one", "en", "s", 0),
            (2, "totally unrelated content with no shared span at all ok", "en", "s", 0),
            (3, "too short", "en", "s", 0),  # < 8 tokens -> no spans
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    res = {r["doc_id"]: r for r in substring_spans(docs, span_k=8).collect()}
    # docs 0/1 share the 8-token spans inside the boilerplate prefix
    assert res[0]["n_shared_spans"] > 0 and res[1]["n_shared_spans"] > 0
    assert res[0]["flagged"] == 1
    assert res[2]["n_shared_spans"] == 0 and res[2]["flagged"] == 0
    assert (res[3]["n_spans"], res[3]["flagged"]) == (0, 0)


def _py_wide_sketch(text, word):
    """Pure-Python reference for one 60-bit word of the wide sketch:
    md5-top-15-hex word hashes seeded '<word>#', majority vote per bit
    (60 bits = every random bit the h64 hash carries; no dead bits)."""
    import hashlib

    toks = set(text.split())
    sh = 0
    for i in range(60):
        v = sum(
            1
            if (int(hashlib.md5(f"{word}#{w}".encode()).hexdigest()[:15], 16) >> i) & 1
            else -1
            for w in toks
        )
        if v > 0:
            sh |= 1 << i
    return sh


def test_simhash_wide_matches_python_reference(spark):
    """Blocked wide-simhash pairs == brute-force over independently
    computed 120-bit sketches — pins sketch construction AND proves the
    word-local pigeonhole blocking is lossless."""
    from userbehavioranalysis_spark.operators.dedup import simhash_wide_pairs

    near = BASE.replace("today", "tonight")
    texts = [
        BASE,
        near,
        BASE,  # exact dup of 0 -> hamming 0
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
    ]
    max_h = 30  # wide threshold: 31 segments of ~4 bits, stresses blocking
    sk = [(_py_wide_sketch(t, 0), _py_wide_sketch(t, 1)) for t in texts]
    expected = {
        (a, b, bin(sk[a][0] ^ sk[b][0]).count("1") + bin(sk[a][1] ^ sk[b][1]).count("1"))
        for a in range(len(texts))
        for b in range(a + 1, len(texts))
        if bin(sk[a][0] ^ sk[b][0]).count("1") + bin(sk[a][1] ^ sk[b][1]).count("1")
        <= max_h
    }
    docs = _docs(spark, texts)
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_wide_pairs(docs, max_hamming=max_h).collect()
    }
    assert got == expected
    assert (0, 2, 0) in got  # the exact-dup pair


def test_simhash_wide_subset_of_63bit_at_same_threshold(spark):
    """8/120 bits is a STRICTER relative cut than 8/63: on a dup-dense
    corpus the wide operator's pair set must be no larger, and near
    dups must still surface."""
    from userbehavioranalysis_spark.operators.dedup import simhash_wide_pairs

    near = BASE.replace("today", "tonight")
    other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(spark, [BASE, near, other])
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_wide_pairs(docs, max_hamming=30).collect()
    }
    assert (0, 1) in pairs
    assert pairs.get((0, 2), 999) > pairs[(0, 1)]


def test_ngram_absolute_df_cap_drops_stop_shingles(spark):
    """The absolute df cap (the df^2 scale guard) must drop shingles
    above it even when the fractional cap would keep them."""
    # shingle 'x y' appears in all 3 docs (df=3); every other shingle
    # is unique (df=1, uncovered by the df>=2 floor)
    docs = _docs(spark, ["x y a", "x y b", "x y c"])
    uncapped = ngram_jaccard_pairs(
        docs, shingle_k=2, jaccard_num=1, jaccard_den=10, max_df_frac=1.0
    ).collect()
    assert len(uncapped) == 3  # frac=1.0 bypasses BOTH caps: exact semantics
    capped = ngram_jaccard_pairs(
        docs, shingle_k=2, jaccard_num=1, jaccard_den=10,
        max_df_frac=0.9, max_df_abs=2,
    ).collect()
    assert capped == []  # df=3 > abs cap 2 -> the only shared shingle drops


def test_embedding_dedup_lsh_recall_and_exactness(spark):
    """Bucketed near-dup pairs on clustered vectors: high recall of the
    exact all-pairs result, and NEVER a pair the exact filter rejects
    (candidates may miss, the cosine verify may not lie)."""
    import random

    from userbehavioranalysis_spark.operators.dedup import (
        embedding_dedup_lsh,
        embedding_dedup_pairs,
    )

    rng = random.Random(23)
    vecs = []
    for c in range(5):
        center = [0.0] * 16
        center[c * 3] = 1.0
        center[c * 3 + 1] = 0.6
        for _ in range(10):
            vecs.append([x + rng.uniform(-0.04, 0.04) for x in center])
    emb = _embs(spark, vecs)
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_dedup_pairs(emb, min_cosine=0.8).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_dedup_lsh(emb, min_cosine=0.8).collect()
    }
    assert lsh <= exact  # exact verify: no false pairs, ever
    assert len(exact) > 0
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"LSH dedup recall {recall}"


def test_lsh_plane_entropy_no_mega_buckets(spark):
    """Hyperplane independence regression guard: on dispersed vectors
    the (band, band_val) buckets must stay near-singleton.  The old
    Knuth-sweep planes (plane(p,d) linear in p·64+d) concentrated band
    values on a handful of alternating-bit patterns — buckets grew 72×
    at the 100× corpus and the candidate join filled the disk."""
    import random

    from userbehavioranalysis_spark.operators.similarity import _lsh_bands

    rng = random.Random(41)
    vecs = []
    for _ in range(400):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        n = sum(x * x for x in v) ** 0.5
        vecs.append([x / n for x in v])
    emb = _embs(spark, vecs)
    sizes = [
        r["c"]
        for r in _lsh_bands(emb, "vec_id", 128, 16)
        .groupBy("band", "band_val")
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    # 400 random unit vectors over 2^16 values/band: collisions should
    # be rare (expected max bucket ~2); the old planes produced
    # buckets of 10+ here
    assert max(sizes) <= 4, f"mega-bucket of {max(sizes)} — planes correlated?"
    assert sum(sizes) == 400 * 8  # every vector contributes all 8 bands


def test_lsh_band_kernel_matches_jvm_fold(spark):
    """The Arrow matmul band kernel (similarity._band_vals_udf) must be
    BIT-IDENTICAL to the original interpreted JVM fold of the same
    integer math — the r8 optimization replaced the fold
    (``aggregate(zip_with(qi, pl, ...))`` over the literal plane
    matrix, ~40 ms/vector at 128 planes) with one int64 numpy matmul
    per batch; int64 modular arithmetic is associative, so summation
    order cannot diverge even under wraparound.  Pins the equivalence
    on the awkward shapes: null embedding (≡ zero vector → n_bands
    rows of band_val 0, NOT dropped), empty array, short row (null→0
    padding), >64-dim row (excess ignored), null element, exact-zero
    vector — plus plain vectors, at two plane configurations."""
    import random

    from userbehavioranalysis_spark.operators.similarity import (
        _lsh_bands,
        _plane_matrix,
    )

    def fold_form(df, id_col, n_planes, band_bits):
        planes = ", ".join(
            "array(" + ", ".join(str(c) for c in row) + ")"
            for row in _plane_matrix(n_planes)
        )
        qint = "transform(embedding, x -> cast(round(x * 1000000) as bigint))"
        bits = (
            f"transform(array({planes}), pl -> "
            "  aggregate(zip_with(qi, pl, (x, c) -> coalesce(x * c, cast(0 as bigint))), "
            "    cast(0 as bigint), (acc, t) -> acc + t) > 0)"
        )
        n_bands = n_planes // band_bits
        band_val = " + ".join(
            f"if(element_at(sig, b * {band_bits} + {j} + 1), {1 << j}, 0)"
            for j in range(band_bits)
        )
        return (
            df.withColumn("qi", F.expr(qint))
            .withColumn("sig", F.expr(bits))
            .select(
                F.col("vec_id").alias(id_col),
                F.posexplode_outer(
                    F.expr(f"transform(sequence(0, {n_bands - 1}), b -> {band_val})")
                ).alias("band", "band_val"),
            )
            .filter(F.col("band").isNotNull())
        )

    rng = random.Random(17)
    rows = [
        (1, None),
        (2, []),
        (3, [0.5] * 3),
        (4, [0.25] * 70),
        (5, [0.5, None, -0.75] + [1.0] * 61),
        (6, [0.0] * 64),
    ] + [
        (100 + i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for n_planes, band_bits in ((128, 16), (16, 4)):
        old = fold_form(emb, "vec_id", n_planes, band_bits)
        new = _lsh_bands(emb, "vec_id", n_planes, band_bits)
        assert old.exceptAll(new).count() == 0
        assert new.exceptAll(old).count() == 0
        # null embedding packs to band_val 0 in every band, as the fold did
        assert (
            new.filter("vec_id = 1").filter("band_val = 0").count()
            == n_planes // band_bits
        )


def test_ann_pq_recall_on_clustered_data(spark):
    """PQ+ADC+rerank must recover nearly all brute-force neighbors on
    separable clusters, and a second run must reproduce identical rows
    (codebooks/codes/ranks are deterministic per corpus)."""
    import random

    from userbehavioranalysis_spark.operators.embeddings import ann_topk_pq

    rng = random.Random(31)
    vecs = []
    for c in range(6):
        center = [0.0] * 16
        center[c * 2] = 1.0
        center[c * 2 + 1] = -0.8
        for _ in range(15):
            vecs.append([x + rng.uniform(-0.06, 0.06) for x in center])
    emb = _embs(spark, vecs)
    q = emb.filter(F.col("vec_id") < 4)
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_brute(emb, q, k=5).collect()
    }
    rows = ann_topk_pq(emb, q, k=5, m=4, n_codes=16, rerank_n=20).collect()
    pq = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(brute & pq) / len(brute)
    assert recall >= 0.9, f"PQ recall {recall}"
    again = ann_topk_pq(emb, q, k=5, m=4, n_codes=16, rerank_n=20).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ann_ivfpq_recall_on_clustered_data(spark):
    """IVFPQ (coarse routing x PQ codes x exact rerank) must recover
    nearly all brute-force neighbors when clusters are separable."""
    import random

    from userbehavioranalysis_spark.operators.embeddings import ann_topk_ivfpq
    from userbehavioranalysis_spark.operators.similarity import assign_ivf_clusters

    rng = random.Random(17)
    vecs = []
    for c in range(8):
        center = [0.0] * 16
        center[c * 2] = 1.0
        center[c * 2 + 1] = 0.5
        for _ in range(12):
            vecs.append([x + rng.uniform(-0.05, 0.05) for x in center])
    emb = _embs(spark, vecs)
    clustered = assign_ivf_clusters(emb, n_clusters=8, iters=2)
    q = emb.filter(F.col("vec_id") < 4)
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_brute(emb, q, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_ivfpq(
            clustered, q, k=5, cluster_col="cluster", m=4, n_codes=16, rerank_n=20
        ).collect()
    }
    recall = len(brute & got) / len(brute)
    assert recall >= 0.9, f"IVFPQ recall {recall}"


def test_ann_lsh_multiprobe_recall_superset(spark):
    """Multi-probe candidates strictly extend single-probe: the result
    set's recall vs brute is >= plain LSH's, and every plain-LSH hit
    survives (the exact buckets are a subset of the probe set)."""
    import random

    from userbehavioranalysis_spark.operators.similarity import (
        ann_topk_lsh,
        ann_topk_lsh_multiprobe,
    )

    rng = random.Random(13)
    vecs = []
    for c in range(4):
        center = [0.0] * 16
        center[c * 4] = 1.0
        center[c * 4 + 2] = 0.9
        for _ in range(20):
            vecs.append([x + rng.uniform(-0.15, 0.15) for x in center])
    emb = _embs(spark, vecs)
    q = emb.filter(F.col("vec_id") < 4)
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_brute(emb, q, k=5).collect()
    }
    plain = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_lsh(emb, q, k=5).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_lsh_multiprobe(emb, q, k=5).collect()
    }
    r_plain = len(brute & plain) / len(brute)
    r_multi = len(brute & multi) / len(brute)
    assert r_multi >= r_plain, (r_plain, r_multi)
    assert r_multi >= 0.9, f"multiprobe recall {r_multi}"


def test_simhash_scale_wall_autoroutes_to_wide(spark):
    """The SCALE.md segment-width rule is executable: when blocking is
    selected ADAPTIVELY (block=None, corpus over block_threshold) and
    n_docs > 2^(seg_bits-2), simhash_pairs must return the WIDE-sketch
    result (12-15-bit segments) instead of the narrow 63-bit blocking
    that degenerates to n^2/2^7 candidates at scale.  40 docs with
    block_threshold=30 crosses both the threshold and the mocked wall
    (2^(7-2)=32)."""
    from userbehavioranalysis_spark.operators.dedup import (
        simhash_pairs,
        simhash_wide_pairs,
    )

    texts = [f"alpha beta gamma token{i} delta epsilon word{i} zeta" for i in range(38)]
    texts += [texts[0], texts[1]]  # two exact dups
    docs = _docs(spark, texts)
    routed = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(docs, block_threshold=30).collect()
    }
    wide = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_wide_pairs(docs).collect()
    }
    assert routed == wide
    assert (0, 38, 0) in routed  # exact dup survives the reroute
    # an EXPLICITLY pinned strategy keeps the narrow 63-bit semantics:
    # block=True and block=False are two physical plans, one result
    narrow_blocked = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(docs, block=True).collect()
    }
    narrow_all_pairs = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(docs, block=False).collect()
    }
    assert narrow_blocked == narrow_all_pairs
    # the adaptive escape hatch also keeps narrow semantics (for
    # callers pinned to a fixed narrow-semantics oracle at any sf)
    hatch = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(
            docs, block_threshold=30, allow_narrow_at_scale=True
        ).collect()
    }
    assert hatch == narrow_all_pairs


def test_ann_pq_fixed_recall_and_determinism(spark):
    """The md5-landmark fixed-codebook PQ (the hash-checkable sibling)
    must still recover nearly all brute neighbors on separable
    clusters — the exact rerank restores top-k from the integer ADC
    shortlist — and reproduce byte-identical rows run-to-run."""
    import random

    from userbehavioranalysis_spark.operators.embeddings import ann_topk_pq_fixed

    rng = random.Random(53)
    vecs = []
    for c in range(6):
        center = [0.0] * 16
        center[c * 2] = 1.0
        center[c * 2 + 1] = -0.8
        for _ in range(15):
            vecs.append([x + rng.uniform(-0.06, 0.06) for x in center])
    emb = _embs(spark, vecs)
    q = emb.filter(F.col("vec_id") < 4)
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_brute(emb, q, k=5).collect()
    }
    rows = ann_topk_pq_fixed(emb, q, k=5, m=4, n_codes=16, rerank_n=20).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(brute & got) / len(brute)
    assert recall >= 0.9, f"fixed-PQ recall {recall}"
    again = ann_topk_pq_fixed(emb, q, k=5, m=4, n_codes=16, rerank_n=20).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ann_ivfpq_fixed_recall(spark):
    """Fixed-codebook IVFPQ: integer coarse routing + integer ADC +
    exact rerank recovers brute neighbors when clusters separate."""
    import random

    from userbehavioranalysis_spark.operators.embeddings import (
        ann_topk_ivfpq_fixed,
    )
    from userbehavioranalysis_spark.operators.similarity import assign_ivf_clusters

    rng = random.Random(59)
    vecs = []
    for c in range(8):
        center = [0.0] * 16
        center[c * 2] = 1.0
        center[c * 2 + 1] = 0.5
        for _ in range(12):
            vecs.append([x + rng.uniform(-0.05, 0.05) for x in center])
    emb = _embs(spark, vecs)
    clustered = assign_ivf_clusters(emb, n_clusters=8, iters=2)
    q = emb.filter(F.col("vec_id") < 4)
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_brute(emb, q, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_ivfpq_fixed(
            clustered, q, k=5, cluster_col="cluster", m=4, n_codes=16, rerank_n=20
        ).collect()
    }
    recall = len(brute & got) / len(brute)
    assert recall >= 0.9, f"fixed-IVFPQ recall {recall}"


def test_wide_words_needed_tracks_corpus_decades():
    """The executable width rule sizes the sketch at every decade:
    2 words to 500k docs, 3 at 5M, 4 at 80M (9 segments, 60-bit words)."""
    from userbehavioranalysis_spark.operators.dedup import wide_words_needed

    assert wide_words_needed(5_000) == 2
    assert wide_words_needed(500_000) == 2
    assert wide_words_needed(5_000_000) == 3
    assert wide_words_needed(80_000_000) == 4
    # never below the 120-bit floor, even on tiny corpora
    assert wide_words_needed(10) == 2


def test_simhash_wide_three_words_matches_python_reference(spark):
    """n_words=3 (180-bit sketch): blocked pairs == brute force over
    independently computed 3x60-bit python sketches — the generalized
    word loop and word-local segments stay lossless."""
    from userbehavioranalysis_spark.operators.dedup import simhash_wide_pairs

    near = BASE.replace("today", "tonight")
    texts = [
        BASE,
        near,
        BASE,  # exact dup of 0 -> hamming 0
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
    ]
    max_h = 45  # 46 segments of ~3-4 bits over 180 bits: stresses blocking
    sk = [tuple(_py_wide_sketch(t, w) for w in range(3)) for t in texts]

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    expected = {
        (a, b, ham(sk[a], sk[b]))
        for a in range(len(texts))
        for b in range(a + 1, len(texts))
        if ham(sk[a], sk[b]) <= max_h
    }
    docs = _docs(spark, texts)
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_wide_pairs(docs, max_hamming=max_h, n_words=3).collect()
    }
    assert got == expected
    assert (0, 2, 0) in got


def test_chunk_documents_hand_computed(spark):
    """10 tokens, chunk=4, overlap=1 (stride 3): chunks start at tokens
    1,4,7,10 -> ceil((10-4)/3)+1 = 3 chunks... verify against the exact
    hand-computed grid, coverage, and overlap."""
    from userbehavioranalysis_spark.operators.text_analysis import chunk_documents

    text = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    docs = _docs(spark, [text, "solo"])
    rows = {
        (r.doc_id, r.chunk_id): (r.chunk_start, r.chunk_len, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    }
    # doc 0: n=10, stride=3 -> n_chunks = ceil((10-4)/3)+1 = 3
    assert rows[(0, 0)] == (1, 4, "t1 t2 t3 t4")
    assert rows[(0, 1)] == (4, 4, "t4 t5 t6 t7")
    assert rows[(0, 2)] == (7, 4, "t7 t8 t9 t10")
    # short doc: exactly one short chunk
    assert rows[(1, 0)] == (1, 1, "solo")
    assert len(rows) == 4
    # invariants: consecutive chunks overlap by exactly `overlap`
    # tokens and the last chunk ends at n
    assert rows[(0, 1)][0] == rows[(0, 0)][0] + 3
    assert rows[(0, 2)][0] + rows[(0, 2)][1] - 1 == 10


def test_chunk_documents_covers_every_token(spark):
    """Every token index of every doc falls inside at least one chunk,
    and chunk grids are identical across doc lengths 1..40."""
    from userbehavioranalysis_spark.operators.text_analysis import chunk_documents

    docs = _docs(
        spark, [" ".join(f"w{i}" for i in range(n)) for n in range(1, 41)]
    )
    cov = {}
    for r in chunk_documents(docs, chunk_tokens=8, overlap=3).collect():
        cov.setdefault(r.doc_id, set()).update(
            range(r.chunk_start, r.chunk_start + r.chunk_len)
        )
    for d, got in cov.items():
        n = d + 1  # doc_id d has d+1 tokens
        assert got == set(range(1, n + 1)), (d, sorted(got))


def test_minhash_incremental_matches_subset_of_full_pairs(spark):
    """Incremental (batch vs corpus) must find exactly the full-run
    pairs that CROSS the batch/corpus boundary — no pair invented, no
    cross pair lost, and corpus-internal pairs never recomputed."""
    from userbehavioranalysis_spark.operators.dedup import (
        minhash_incremental_matches,
        minhash_lsh_pairs,
    )

    texts = [BASE, BASE + " extra", "totally different words here entirely",
             BASE, "another unrelated document about spark engines",
             BASE + " extra tail"]
    docs = _docs(spark, texts)
    corpus = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id % 2 = 1")
    thr = 6
    inc = {
        (r.new_doc_id, r.corpus_doc_id): r.match_count
        for r in minhash_incremental_matches(
            corpus, batch, min_matching_hashes=thr
        ).collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.match_count
        for r in minhash_lsh_pairs(docs, min_matching_hashes=thr).collect()
    }
    crossing = {
        (max(a, b) if max(a, b) % 2 == 1 else min(a, b),
         min(a, b) if max(a, b) % 2 == 1 else max(a, b)): m
        for (a, b), m in full.items()
        if (a % 2) != (b % 2)
    }
    assert inc == crossing, (inc, crossing)
    assert any(k[1] == 0 or k[1] == 4 for k in inc), inc  # BASE dups found


def test_chunk_documents_matches_python_reference_grid(spark):
    """Chunk grid equality against an independent pure-Python reference
    across (chunk_tokens, overlap) combinations and doc lengths 1..40 —
    pins the integer ceil-div arithmetic for any parameterization, not
    just the registered 32/8 form."""
    from userbehavioranalysis_spark.operators.text_analysis import chunk_documents

    def py_chunks(tokens, chunk, overlap):
        stride = chunk - overlap
        n = len(tokens)
        out = []
        cid = 0
        while True:
            start = cid * stride  # 0-based
            out.append((cid, start + 1, min(chunk, n - start),
                        " ".join(tokens[start:start + chunk])))
            if start + chunk >= n:
                break
            cid += 1
        return out

    docs_tokens = [[f"w{i}" for i in range(n)] for n in range(1, 41)]
    docs = _docs(spark, [" ".join(t) for t in docs_tokens])
    for chunk, overlap in [(2, 0), (4, 1), (5, 4), (8, 3), (16, 15), (64, 16)]:
        got = {
            (r.doc_id, r.chunk_id): (r.chunk_start, r.chunk_len, r.chunk_text)
            for r in chunk_documents(
                docs, chunk_tokens=chunk, overlap=overlap
            ).collect()
        }
        want = {
            (d, cid): (start, clen, text)
            for d, toks in enumerate(docs_tokens)
            for cid, start, clen, text in py_chunks(toks, chunk, overlap)
        }
        assert got == want, (chunk, overlap)


def test_minhash_incremental_empty_batch_and_disjoint(spark):
    """Edge cases: an empty new batch yields an empty (not failing)
    result, and a batch sharing nothing with the corpus matches
    nothing."""
    from userbehavioranalysis_spark.operators.dedup import (
        minhash_incremental_matches,
    )

    corpus = _docs(spark, [BASE, BASE + " extra"])
    empty = corpus.filter("doc_id < 0")
    assert minhash_incremental_matches(corpus, empty).count() == 0
    disjoint = _docs(spark, ["qqq www eee rrr ttt yyy uuu iii ooo ppp"])
    assert minhash_incremental_matches(corpus, disjoint).count() == 0


def test_minhash_corpus_index_path_equals_direct(spark):
    """The persisted-index probe (corpus_index=...) must return exactly
    the direct path's matches — the refactor that lets a refresh loop
    build the index once can never change results."""
    from userbehavioranalysis_spark.operators.dedup import (
        minhash_corpus_index,
        minhash_incremental_matches,
    )

    texts = [BASE, BASE + " extra", "totally different words here entirely",
             BASE, "another unrelated document about spark engines",
             BASE + " extra tail"]
    docs = _docs(spark, texts)
    corpus = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id % 2 = 1")
    direct = {
        tuple(r) for r in minhash_incremental_matches(corpus, batch).collect()
    }
    idx = minhash_corpus_index(corpus)
    via_index = {
        tuple(r)
        for r in minhash_incremental_matches(
            None, batch, corpus_index=idx
        ).collect()
    }
    assert direct == via_index and direct


def test_ann_pq_mllib_codebooks_recall(spark):
    """PQ with MLlib-distributed codebooks (full-corpus k-means|| per
    subspace) must recover nearly all brute-force neighbors, and the
    injected-books path must honor the (m, n_codes) contract."""
    import random

    import pytest

    from userbehavioranalysis_spark.operators.embeddings import ann_topk_pq
    from userbehavioranalysis_spark.operators.mlcodebooks import (
        pq_codebooks_distributed,
    )

    rng = random.Random(43)
    vecs = []
    for c in range(6):
        center = [0.0] * 16
        center[c * 2] = 1.0
        center[c * 2 + 1] = -0.8
        for _ in range(15):
            vecs.append([x + rng.uniform(-0.06, 0.06) for x in center])
    emb = _embs(spark, vecs)
    q = emb.filter(F.col("vec_id") < 4)
    books = pq_codebooks_distributed(emb, m=4, n_codes=16)
    assert books.shape == (4, 16, 4)
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_brute(emb, q, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_pq(
            emb, q, k=5, m=4, n_codes=16, rerank_n=20, books=books
        ).collect()
    }
    recall = len(brute & got) / len(brute)
    assert recall >= 0.9, f"MLlib-PQ recall {recall}"
    with pytest.raises(AssertionError):  # shape contract is enforced
        ann_topk_pq(emb, q, k=5, m=8, n_codes=16, books=books)


def test_ann_ivf_mllib_centroids_recall(spark):
    """IVF with MLlib-distributed coarse centroids must recover nearly
    all brute-force neighbors when clusters are separable."""
    import random

    from userbehavioranalysis_spark.operators.mlcodebooks import (
        ivf_clusters_distributed,
    )
    from userbehavioranalysis_spark.operators.similarity import ann_topk_ivf

    rng = random.Random(59)
    vecs = []
    for c in range(8):
        center = [0.0] * 16
        center[c * 2] = 1.0
        center[c * 2 + 1] = 0.5
        for _ in range(12):
            vecs.append([x + rng.uniform(-0.05, 0.05) for x in center])
    emb = _embs(spark, vecs)
    clustered = ivf_clusters_distributed(emb, n_clusters=8)
    assert set(clustered.columns) == {"vec_id", "embedding", "cluster"}
    q = emb.filter(F.col("vec_id") < 4)
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_brute(emb, q, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_ivf(clustered, q, k=5, cluster_col="cluster").collect()
    }
    recall = len(brute & got) / len(brute)
    assert recall >= 0.9, f"MLlib-IVF recall {recall}"


def test_incremental_refresh_every_gate_fires(spark):
    """One batch doc per gate: quality, language, exact-vs-corpus,
    near-dup-vs-corpus, exact/near self-dup — each drops exactly its
    target and the clean survivors come through with their stats."""
    from userbehavioranalysis_spark.operators.pipeline import incremental_refresh

    corpus_texts = [
        "the cat sat on the mat and the dog slept near a door of wood",
        "a tall ship of oak sailed the wide sea and the wind was cold",
    ]
    batch = [
        (1, "the cat sat on the mat and the dog slept near a door of pine"),  # near-dup of corpus 0
        (3, "a tall ship of oak sailed the wide sea and the wind was cold"),  # exact dup of corpus 1
        (5, "the green hill of stone rose over a valley and the mist hung low"),  # keeper of self-dup pair
        (7, "the green hill of stone rose over a valley and the mist hung low"),  # self exact dup -> drop
        (9, "der hund und die katze und das haus und der baum und das brot"),  # german -> drop
        (11, "the the the"),  # quality -> drop
        (13, "a quiet owl of night flew past the barn and the moon was bright"),  # survivor
    ]
    corpus = spark.createDataFrame(
        [(2 * i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    new_docs = spark.createDataFrame(batch, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_tokens, r.score_r4)
        for r in incremental_refresh(
            corpus, new_docs, min_score=0.3, near_dup_min_matches=9
        ).collect()
    }
    assert set(out) == {5, 13}
    assert out[5][0] == 14 and out[13][0] == 14


def test_incremental_refresh_accepts_persisted_index(spark, tmp_path):
    """Passing the parquet-read corpus index must produce the same
    survivors as deriving the index from the corpus frame."""
    from userbehavioranalysis_spark.operators.dedup import minhash_index_write
    from userbehavioranalysis_spark.operators.pipeline import incremental_refresh
    from userbehavioranalysis_spark.sources.readers import load_testdata

    docs = load_testdata(spark, "/root/testdata/sf0.001")["documents"]
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    path = str(tmp_path / "index")
    minhash_index_write(corpus, path)
    spark_read = spark.read
    sig_c = spark_read.parquet(f"{path}/signatures").withColumn(
        "sig", F.array(*[F.col(f"m{i}") for i in range(12)])
    )
    bk_c = spark_read.parquet(f"{path}/buckets").select(
        "corpus_doc_id", "band_id", "band_sig"
    )

    direct = {
        tuple(r) for r in incremental_refresh(corpus, batch).collect()
    }
    via_index = {
        tuple(r)
        for r in incremental_refresh(
            corpus, batch, corpus_index=(sig_c, bk_c)
        ).collect()
    }
    assert direct == via_index and direct


def test_daily_refresh_sequential_semantics_differ_from_whole_batch(spark, tmp_path):
    """The sequential loop must differ from whole-batch refresh exactly
    where the semantics say so: a near-dup pair split across days whose
    EARLIER member was quality-gated (so never appended) keeps the
    later member — whole-batch refresh drops it (self pairs are
    computed pre-gate over the whole delta)."""
    import os

    from userbehavioranalysis_spark.operators.dedup import (
        minhash_index_append,
        minhash_index_write,
    )
    from userbehavioranalysis_spark.operators.pipeline import (
        incremental_refresh,
        refresh_against_persisted,
    )

    words = " ".join(f"w{i}" for i in range(10))
    low_q = ("the " * 10).strip() + " " + words            # stop-heavy, short
    high_q = "the " + " ".join([words] * 10)               # same DISTINCT tokens
    corpus = spark.createDataFrame(
        [(0, "a quiet owl of night flew past the barn and the moon was bright")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame([(1, low_q)], "doc_id long, text string")
    b2 = spark.createDataFrame([(3, high_q)], "doc_id long, text string")

    # whole-batch refresh: (1,3) is a self near-dup pair -> 3 drops; 1 is
    # quality-gated -> nothing survives
    whole = incremental_refresh(corpus, b1.union(b2)).collect()
    assert whole == []

    # sequential loop: day 1 gates doc 1 out (never appended); day 2's
    # doc 3 finds no match in the index and survives
    idx = str(tmp_path / "index")
    md5p = str(tmp_path / "md5")
    minhash_index_write(corpus, idx)
    corpus.select(F.md5("text").alias("text_md5")).distinct().write.parquet(md5p)
    # day 3: an exact copy of day 2's survivor (caught by the appended
    # md5 set) and a near-dup of it (caught by the appended band index)
    near_dup = "the xq " + " ".join([words] * 10)
    b3 = spark.createDataFrame(
        [(5, high_q), (7, near_dup)], "doc_id long, text string"
    )
    survivors = []
    for bdf in (b1, b2, b3):
        res = refresh_against_persisted(bdf, idx, md5p).localCheckpoint()
        surv = bdf.join(res.select("doc_id"), "doc_id", "left_semi").localCheckpoint()
        minhash_index_append(surv, idx)
        surv.select(F.md5("text").alias("text_md5")).write.mode("append").parquet(md5p)
        survivors += [r.doc_id for r in res.collect()]
    assert survivors == [3]
    assert os.path.isdir(idx)


def test_embedding_dedup_incremental_matches_sources_and_is_one_sided(spark):
    """A re-crawled delta (one zeroed dimension) must match its source
    vectors through the banded probe at high recall, every match must
    verify at the cosine threshold, and the output must be strictly
    batch-vs-corpus (never corpus-vs-corpus pairs)."""
    from userbehavioranalysis_spark.operators.dedup import (
        embedding_dedup_incremental,
    )
    from userbehavioranalysis_spark.sources.readers import load_testdata

    emb = load_testdata(spark, "/root/testdata/sf0.001")["embeddings"]
    batch = emb.filter(F.col("vec_id") % 16 == 0).select(
        (F.col("vec_id") + 10000000).alias("vec_id"),
        F.expr(
            "transform(embedding,"
            " (x, i) -> case when i = 0 then cast(0.0 as float) else x end)"
        ).alias("embedding"),
    )
    n_batch = batch.count()
    rows = embedding_dedup_incremental(emb, batch).collect()
    assert all(r.new_vec_id >= 10000000 > r.corpus_vec_id for r in rows)
    hits = {r.new_vec_id - 10000000 for r in rows if
            r.new_vec_id - 10000000 == r.corpus_vec_id}
    assert len(hits) >= 0.9 * n_batch, f"{len(hits)}/{n_batch} sources found"
