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
