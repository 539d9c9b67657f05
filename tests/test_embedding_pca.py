"""Covariance moments + PCA projection (operators/embeddings.py).

embedding_covariance is oracle-paired at the gate; here the value-level
invariants that the rows-only embedding_pca_project gate can't carry:
equality with a straight numpy PCA under the same quantization and sign
convention, orthonormal components, and projection variance matching
the covariance eigenvalues.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.vectors import QUANT
from cassandra_diff_spark.operators.embeddings import (
    embedding_covariance,
    pca_project,
)

DIM = 6
N = 80


def _corpus():
    rng = np.random.RandomState(7)
    base = rng.randn(N, 2) @ rng.randn(2, DIM) * 3.0  # rank-2 structure
    noise = rng.randn(N, DIM) * 0.05
    return (base + noise + rng.randn(DIM) * 2.0).astype(np.float32)


@pytest.fixture(scope="module")
def vecs(spark):
    m = _corpus()
    rows = [(i, [float(x) for x in m[i]]) for i in range(N)]
    rows.append((N, None))  # null vector excluded
    rows.append((N + 1, [1.0] * (DIM - 1)))  # too-short vector excluded
    return spark.createDataFrame(
        rows, f"id long, embedding array<float>"
    ).repartition(4)


def _quantized(m):
    return np.round(m.astype(np.float64) * QUANT).astype(np.int64)


class TestCovariance:
    def test_matches_numpy_population_covariance(self, spark, vecs):
        out = embedding_covariance(vecs, "embedding", dim=DIM).collect()
        q = _quantized(_corpus())
        x = q.astype(np.float64) / QUANT
        expected = np.cov(x, rowvar=False, bias=True)
        got = np.zeros((DIM, DIM))
        for r in out:
            got[r["i"], r["j"]] = got[r["j"], r["i"]] = r["cov"]
            assert r["n"] == N
        assert len(out) == DIM * (DIM + 1) // 2
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)

    def test_m2_is_exact_integer_identity(self, spark, vecs):
        out = embedding_covariance(vecs, "embedding", dim=DIM).collect()
        q = _quantized(_corpus())
        s_ij = q.T @ q
        s_i = q.sum(axis=0)
        for r in out:
            assert r["m2_q"] == N * s_ij[r["i"], r["j"]] - s_i[r["i"]] * s_i[r["j"]]

    def test_dims_subblock(self, spark, vecs):
        out = embedding_covariance(
            vecs, "embedding", dim=DIM, dims=[0, 2]
        ).collect()
        cells = {(r["i"], r["j"]) for r in out}
        assert cells == {(0, 0), (0, 2), (2, 2)}

    def test_shards_fold_additively(self, spark, vecs):
        """Moment rows from disjoint shards sum to the full-corpus rows —
        the >1e9-row sharding escape hatch documented in the docstring."""
        full = {
            (r["i"], r["j"]): r["m2_q"]
            for r in embedding_covariance(vecs, "embedding", dim=DIM).collect()
        }
        # fold per-shard integer moments (n, S_i, S_ij all add) and check
        # the combined m2 identity against the one-pass Spark result
        parts = {}
        q = _quantized(_corpus())
        for split in (slice(0, 40), slice(40, N)):
            qq = q[split]
            sij = qq.T @ qq
            si = qq.sum(axis=0)
            for i in range(DIM):
                for j in range(i, DIM):
                    parts.setdefault((i, j), []).append(
                        (len(qq), sij[i, j], si[i], si[j])
                    )
        for (i, j), ps in parts.items():
            n = sum(p[0] for p in ps)
            sij = sum(p[1] for p in ps)
            si = sum(p[2] for p in ps)
            sj = sum(p[3] for p in ps)
            assert full[(i, j)] == n * sij - si * sj


class TestPcaProject:
    def test_matches_numpy_pca_and_invariants(self, spark, vecs):
        k = 3
        out = (
            pca_project(vecs, "id", "embedding", dim=DIM, n_components=k)
            .orderBy("id")
            .collect()
        )
        assert len(out) == N
        got = np.array([r["proj"] for r in out])

        q = _quantized(_corpus()).astype(np.float64) / QUANT
        cov = np.cov(q, rowvar=False, bias=True)
        vals, vecs_np = np.linalg.eigh(cov)
        order = np.argsort(vals)[::-1][:k]
        comp = vecs_np[:, order]
        for c in range(k):
            if comp[np.argmax(np.abs(comp[:, c])), c] < 0:
                comp[:, c] = -comp[:, c]
        expected = (q - q.mean(axis=0)) @ comp
        # same sign convention -> direct equality, no per-column sign fix
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)

        # projection variance == top eigenvalues of the covariance
        np.testing.assert_allclose(
            got.var(axis=0), np.sort(vals)[::-1][:k], rtol=1e-9
        )
        # scores of distinct components are uncorrelated
        cross = (got - got.mean(axis=0)).T @ (got - got.mean(axis=0)) / N
        np.testing.assert_allclose(
            cross, np.diag(np.diag(cross)), atol=1e-9
        )

    def test_projection_stage_is_map_only(self, spark, vecs, tmp_path):
        # parquet input (no fixture repartition) -> the projection plan
        # must be scan -> filter -> mapInPandas with NO Exchange anywhere
        path = str(tmp_path / "emb")
        vecs.write.mode("overwrite").parquet(path)
        src = spark.read.parquet(path)
        plan = pca_project(
            src, "id", "embedding", dim=DIM, n_components=2
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_empty_corpus_raises(self, spark):
        empty = spark.createDataFrame([], "id long, embedding array<float>")
        with pytest.raises(ValueError, match="no rows"):
            pca_project(empty, "id", "embedding", dim=DIM, n_components=2)


class TestRandomProject:
    """embeddings.random_project — JL ±1 projection, integer-exact."""

    def test_matches_python_reference(self, spark, vecs):
        import hashlib

        from cassandra_diff_spark.operators.embeddings import random_project

        od = 3
        got = {r.id: list(r.proj_q) for r in random_project(
            vecs, "id", "embedding", dim=DIM, out_dim=od, seed=7
        ).collect()}
        q = _quantized(_corpus())
        signs = np.empty((od, DIM), dtype=np.int64)
        for j in range(od):
            for i in range(DIM):
                h = int(hashlib.md5(f"{i}:{j}:7".encode()).hexdigest()[:15], 16)
                signs[j, i] = 1 if h % 2 == 0 else -1
        exp = q @ signs.T
        assert len(got) == N
        for rid in range(N):
            assert got[rid] == list(exp[rid])

    def test_distance_preservation_rough(self, spark, vecs):
        """JL sanity (not a proof): with 4 output dims over a rank-2
        corpus, projected distances correlate strongly with originals."""
        from cassandra_diff_spark.operators.embeddings import random_project

        got = {r.id: np.array(r.proj_q, dtype=float) for r in random_project(
            vecs, "id", "embedding", dim=DIM, out_dim=4, seed=1
        ).collect()}
        x = _corpus().astype(np.float64)
        rng = np.random.RandomState(0)
        pairs = [(int(a), int(b)) for a, b in rng.randint(0, N, (200, 2)) if a != b]
        orig = np.array([np.linalg.norm(x[a] - x[b]) for a, b in pairs])
        proj = np.array([np.linalg.norm(got[a] - got[b]) for a, b in pairs])
        assert np.corrcoef(orig, proj)[0, 1] > 0.7

    def test_map_only_and_seed_sensitivity(self, spark, vecs, tmp_path):
        from cassandra_diff_spark.operators.embeddings import random_project

        path = str(tmp_path / "emb_rp")
        vecs.write.mode("overwrite").parquet(path)
        src = spark.read.parquet(path)
        out = random_project(src, "id", "embedding", dim=DIM, out_dim=2, seed=0)
        assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
        a = {r.id: tuple(r.proj_q) for r in out.collect()}
        b = {r.id: tuple(r.proj_q) for r in random_project(
            src, "id", "embedding", dim=DIM, out_dim=2, seed=1
        ).collect()}
        assert a != b

    def test_validation(self, spark, vecs):
        from cassandra_diff_spark.operators.embeddings import random_project

        with pytest.raises(ValueError):
            random_project(vecs, "id", "embedding", dim=DIM, out_dim=0)


class TestMahalanobis:
    """embeddings.mahalanobis_scores — moment-pass + driver solve."""

    def test_matches_numpy_and_flags_planted_outlier(self, spark):
        from cassandra_diff_spark.operators.embeddings import mahalanobis_scores

        m = _corpus()
        rows = [(i, [float(x) for x in m[i]]) for i in range(N)]
        out_vec = (m.mean(axis=0) + 40.0 * m.std(axis=0) * np.sign(
            np.arange(DIM) - 2.5
        )).astype(np.float32)
        rows.append((900, [float(x) for x in out_vec]))
        df = spark.createDataFrame(rows, "id long, embedding array<float>")

        got = {r.id: r.m2 for r in mahalanobis_scores(
            df, "id", "embedding", dim=DIM
        ).collect()}

        q = np.round(
            np.vstack([m, out_vec[None, :]]).astype(np.float64) * QUANT
        ) / QUANT
        cov = np.cov(q, rowvar=False, bias=True)
        prec = np.linalg.inv(cov + 1e-6 * np.eye(DIM))
        mu = q.mean(axis=0)
        x = q - mu
        exp = np.einsum("ij,jk,ik->i", x, prec, x)
        ids = list(range(N)) + [900]
        for pos, rid in enumerate(ids):
            assert abs(got[rid] - exp[pos]) < 1e-8 * max(1.0, exp[pos])
        # the planted off-manifold vector dominates every inlier
        inlier_max = max(got[i] for i in range(N))
        assert got[900] > 5 * inlier_max

    def test_scoring_stage_is_map_only(self, spark, vecs, tmp_path):
        from cassandra_diff_spark.operators.embeddings import mahalanobis_scores

        path = str(tmp_path / "emb_md")
        vecs.write.mode("overwrite").parquet(path)
        src = spark.read.parquet(path)
        plan = mahalanobis_scores(
            src, "id", "embedding", dim=DIM
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_empty_raises(self, spark):
        from cassandra_diff_spark.operators.embeddings import mahalanobis_scores

        empty = spark.createDataFrame([], "id long, embedding array<float>")
        with pytest.raises(ValueError, match="no rows"):
            mahalanobis_scores(empty, "id", "embedding", dim=DIM)
