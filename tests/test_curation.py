"""Curation operators: repetition filters, decontamination, mixture
sampling, and the Q8-shape market-share plan."""

import pyspark.sql.functions as F

from userbehavioranalysis_spark.operators.text_analysis import (
    decontaminate,
    mixture_sample,
    repetition_score,
)
from userbehavioranalysis_spark.plans import relational as rel
from userbehavioranalysis_spark.sources.readers import load_testdata

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_repetition_flags_spam_not_prose(spark):
    docs = _docs(
        spark,
        [
            (0, "buy now buy now buy now buy now buy now", "s"),
            (1, "the quick brown fox jumps over the lazy dog today", "s"),
        ],
    )
    res = {r["doc_id"]: r for r in repetition_score(docs).collect()}
    assert res[0]["flagged"] == 1
    assert res[0]["dup_bigram_ratio_r4"] > 0.5  # 'buy now'/'now buy' repeat
    assert res[1]["flagged"] == 0
    assert res[1]["top_token_ratio_r4"] == 0.2  # 'the' is 2 of 10


def test_decontaminate_flags_benchmark_overlap_only(spark):
    # benchmark_mod=2 -> even doc_ids are the benchmark slice
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma delta epsilon", "s"),  # benchmark
            (1, "zzz alpha beta gamma yyy", "s"),  # shares 'alpha beta gamma'
            (3, "one two three four five six", "s"),  # disjoint
        ],
    )
    res = {r["doc_id"]: r for r in decontaminate(docs, benchmark_mod=2).collect()}
    assert set(res) == {1, 3}  # benchmark docs excluded from output
    assert res[1]["contaminated"] == 1 and res[1]["n_hit_shingles"] == 1
    assert res[3]["contaminated"] == 0 and res[3]["n_hit_shingles"] == 0


def test_mixture_sample_deterministic_and_gated(spark):
    t = load_testdata(spark, SF_DIR)
    a = mixture_sample(t["documents"]).collect()
    b = mixture_sample(t["documents"]).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    assert all(r["bucket"] < r["permille"] for r in a)
    assert all(100 <= r["permille"] < 900 for r in a)
    assert 0 < len(a) < t["documents"].count()


def test_market_share_shares_sum_to_one(spark):
    t = load_testdata(spark, SF_DIR)
    res = rel.market_share(
        t["region"], t["nation"], t["customer"], t["supplier"],
        t["orders"], t["lineitem"], t["part"],
    ).collect()
    assert res
    by_year: dict[int, float] = {}
    for r in res:
        assert r["revenue_r4"] > 0
        by_year[r["o_year"]] = by_year.get(r["o_year"], 0.0) + r["share_r6"]
    for year, total in by_year.items():
        assert abs(total - 1.0) < 1e-4, (year, total)


def test_as_of_join_boundary_and_no_match(spark):
    from userbehavioranalysis_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [("u1", 10), ("u1", 20), ("u2", 5)], "k string, ts long"
    )
    right = spark.createDataFrame(
        [("u1", 10, 1.0), ("u1", 15, 2.0), ("u2", 6, 9.0)],
        "k string, ts long, v double",
    )
    res = {
        (r["k"], r["ts"]): (r["ts_asof"], r["v_asof"])
        for r in as_of_join(left, right, keys=["k"]).collect()
    }
    assert res[("u1", 10)] == (10, 1.0)  # equal ts matches (>= semantics)
    assert res[("u1", 20)] == (15, 2.0)  # latest prior, not first
    assert res[("u2", 5)] == (None, None)  # right row is later: no match


def test_doc_rarity_rare_vs_common(spark):
    from userbehavioranalysis_spark.operators.text_analysis import doc_rarity

    docs = _docs(
        spark,
        [
            (0, "common common filler", "s"),
            (1, "common words here", "s"),
            (2, "unique vocabulary entirely", "s"),
        ],
    )
    res = {r["doc_id"]: r for r in doc_rarity(docs).collect()}
    # doc 2's tokens appear in no other doc -> mean df 1.0
    assert res[2]["mean_df_r4"] == 1.0
    # 'common' df=2 lifts docs 0/1 above 1.0
    assert res[0]["mean_df_r4"] > 1.0 and res[1]["mean_df_r4"] > 1.0
    assert res[0]["n_distinct_tokens"] == 2  # distinct: common, filler


def test_pack_shards_budget_invariant(spark):
    from userbehavioranalysis_spark.operators.text_analysis import pack_shards

    t = load_testdata(spark, SF_DIR)
    rows = pack_shards(t["documents"], budget=500).collect()
    assert rows
    by_shard: dict[tuple, list] = {}
    for r in rows:
        assert r["shard"] == (r["cum_tokens"] - r["n_tokens"]) // 500
        by_shard.setdefault((r["source"], r["shard"]), []).append(r["n_tokens"])
    # every shard except possibly a source's last opened before budget
    for (src, shard), toks in by_shard.items():
        packed_before_last = sum(toks) - toks[-1]
        assert packed_before_last < 500 + max(toks)


def test_length_quantiles_orders_with_data(spark):
    from userbehavioranalysis_spark.operators.text_analysis import length_quantiles

    t = load_testdata(spark, SF_DIR)
    for r in length_quantiles(t["documents"]).collect():
        assert r["p50_r4"] <= r["p90_r4"] <= r["p99_r4"]
        assert r["n_docs"] > 0


def test_partitioned_corpus_sink_prunes_on_read(spark, tmp_path):
    from userbehavioranalysis_spark.sources.writers import write_partitioned_corpus

    t = load_testdata(spark, SF_DIR)
    out = str(tmp_path / "corpus")
    write_partitioned_corpus(t["documents"], out)

    back = spark.read.parquet(out)
    assert back.count() == t["documents"].count()

    en = back.filter(F.col("lang") == "en")
    assert en.count() == t["documents"].filter(F.col("lang") == "en").count()
    plan = en._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan  # pruned, not scanned

    # one file per partition value (no small-file explosion)
    import glob
    for d in glob.glob(out + "/lang=*"):
        files = [f for f in glob.glob(d + "/*.parquet")]
        assert len(files) == 1, d


def test_split_assign_duplicates_share_split(spark):
    from userbehavioranalysis_spark.operators.text_analysis import split_assign

    dup = "identical content lands in the same split always"
    docs = spark.createDataFrame(
        [(i, dup, "en") for i in range(50)], "doc_id long, text string, lang string"
    )
    splits = {r["split"] for r in split_assign(docs).collect()}
    assert len(splits) == 1  # content-hash: all duplicates together

    t = load_testdata(spark, SF_DIR)
    res = split_assign(t["documents"]).collect()
    counts = {}
    for r in res:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert counts.get("train", 0) > counts.get("val", 0)
    assert all(0 <= r["bucket"] < 1000 for r in res)


def test_unigram_logprob_rare_tokens_score_higher(spark):
    from userbehavioranalysis_spark.operators.text_analysis import unigram_logprob

    # 'common' appears 9x in the corpus, 'xyzzy'/'plugh' once each
    docs = _docs(
        spark,
        [
            (0, "common common common", "s"),
            (1, "common common common", "s"),
            (2, "common common common", "s"),
            (3, "xyzzy plugh", "s"),
        ],
    )
    res = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert res[3]["xent_r4"] > res[0]["xent_r4"]
    # doc 0: total=11 tokens, p(common)=9/11 -> xent = log2(11) - log2(9)
    import math

    want = round(math.log2(11) - math.log2(9), 4)
    assert abs(res[0]["xent_r4"] - want) < 1e-9


def test_pack_sequences_straddles_and_offsets(spark):
    from userbehavioranalysis_spark.operators.text_analysis import pack_sequences

    # 3-token docs packed into 4-token sequences: doc 1 straddles the
    # first cut (tokens 3..5 -> seqs 0..1), doc 2 starts mid-seq 1
    docs = _docs(
        spark,
        [
            (0, "w w w", "s"),
            (1, "w w w", "s"),
            (2, "w w w", "s"),
        ],
    )
    res = {
        r["doc_id"]: r for r in pack_sequences(docs, seq_len=4).collect()
    }
    assert (res[0]["seq_first"], res[0]["seq_last"], res[0]["seq_offset"]) == (0, 0, 0)
    assert (res[1]["seq_first"], res[1]["seq_last"], res[1]["seq_offset"]) == (0, 1, 3)
    assert (res[2]["seq_first"], res[2]["seq_last"], res[2]["seq_offset"]) == (1, 2, 2)


def test_stratified_sample_exact_quota_and_determinism(spark):
    from userbehavioranalysis_spark.operators.text_analysis import (
        stratified_sample,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en" if i < 10 else "fr") for i in range(13)],
        "doc_id long, text string, lang string",
    )
    out = stratified_sample(docs, per_lang=4).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    # exact quota where the stratum is big enough, whole stratum otherwise
    assert len(by_lang["en"]) == 4 and len(by_lang["fr"]) == 3
    assert sorted(r.sample_rank for r in by_lang["en"]) == [1, 2, 3, 4]
    # deterministic: same frame, same sample
    again = {(r.doc_id, r.sample_rank) for r in
             stratified_sample(docs, per_lang=4).collect()}
    assert {(r.doc_id, r.sample_rank) for r in out} == again


def test_importance_sample_rate_tracks_score_and_is_deterministic(spark):
    from userbehavioranalysis_spark.operators.text_analysis import (
        importance_sample,
        quality_score,
    )

    docs = load_testdata(spark, SF_DIR)["documents"]
    kept = importance_sample(docs).collect()
    n_docs = docs.count()
    scores = quality_score(docs).agg(F.avg("score_r4")).collect()[0][0]
    rate = len(kept) / n_docs
    # keep rate should track the mean score (binomial tolerance)
    assert abs(rate - scores) < 0.1, (rate, scores)
    # deterministic across reruns
    again = {r.doc_id for r in importance_sample(docs).collect()}
    assert {r.doc_id for r in kept} == again


def test_cms_never_undercounts_and_collides_overcounts(spark):
    from userbehavioranalysis_spark.operators.sketches import (
        token_cms_estimates,
    )

    docs = spark.createDataFrame(
        [(i, "w%d x common" % (i % 3), "s") for i in range(30)],
        "doc_id long, text string, source string",
    )
    rows = token_cms_estimates(docs, width=4, depth=2).collect()
    # CMS guarantee: estimates only overcount, never undercount
    assert all(r.overcount >= 0 for r in rows), rows
    got = {r.token: r.exact_count for r in rows}
    assert got["common"] == 30 and got["x"] == 30
    # width=4 forces collisions somewhere across 5 tokens
    assert any(r.overcount > 0 for r in rows)


def test_cms_sketch_size_independent_of_corpus(spark):
    from userbehavioranalysis_spark.operators.sketches import (
        token_cms_estimates,
    )

    small = spark.createDataFrame(
        [(1, "a b c", "s")], "doc_id long, text string, source string"
    )
    rows = token_cms_estimates(small, width=8, depth=3).collect()
    assert {r.token for r in rows} == {"a", "b", "c"}
    assert all(r.est_count == r.exact_count == 1 for r in rows)


def test_bm25_search_matches_hand_computation(spark):
    """BM25 on a 4-doc corpus vs an independent Python computation of
    the Lucene-form formula (idf = ln(1 + (N-df+0.5)/(df+0.5)))."""
    import math

    from userbehavioranalysis_spark.operators.text_analysis import bm25_search

    texts = [
        "spark hash window spark",          # all terms, tf(spark)=2
        "spark table row scan",             # one term
        "window window window pad pad pad", # one term, high tf, longer
        "alpha beta gamma delta",           # no terms
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.score_r4 for r in bm25_search(docs, k=10).collect()}

    k1, b = 1.2, 0.75
    n_docs, dls = 4, [4, 4, 6, 4]
    avgdl = sum(dls) / n_docs
    tfs = {0: {"spark": 2, "hash": 1, "window": 1}, 1: {"spark": 1}, 2: {"window": 3}}
    dfs = {"spark": 2, "hash": 1, "window": 2}
    want = {}
    for d, tf in tfs.items():
        s = 0.0
        for t, f in tf.items():
            idf = math.log(1 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * (dls[d] / avgdl)))
        want[d] = round(s, 4)
    assert got == want
    assert 3 not in got  # no-term doc unscored
    assert got[0] > got[1]  # multi-term match outranks single-term
