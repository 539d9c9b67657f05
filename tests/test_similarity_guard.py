"""The bounded-query contract: ANN *_topk query paths hold the query
set driver-side and must fail fast past MAX_DRIVER_QUERIES instead of
OOMing the driver."""

from __future__ import annotations

import pytest


def test_query_cap_fails_fast(spark, monkeypatch):
    from cassandra_diff_spark.operators import similarity
    from pyspark.sql import functions as F

    monkeypatch.setattr(similarity, "MAX_DRIVER_QUERIES", 5)
    vec = F.array(*[(F.col("id") % 7).cast("float") + i for i in range(4)])
    df = spark.range(10).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    with pytest.raises(ValueError, match="MAX_DRIVER_QUERIES"):
        similarity._collect_queries(df, "vec_id", "embedding")
    # under the cap: fine
    ids, mat, norm = similarity._collect_queries(
        df.limit(5), "vec_id", "embedding"
    )
    assert len(ids) == 5 and mat.shape == (5, 4)
