"""Training-data pipeline operators: property tests that the gate's
hash-match can't express — LSH recall vs exact baselines, sketch
behavior on known near-duplicates, multimodal plumbing shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators import dedup, multimodal, similarity


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


class TestDedup:
    def test_exact_dedup_finds_injected_dups(self, spark, docs):
        # duplicate three docs verbatim -> their fingerprints collapse
        dup = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100_000)
        res = dedup.exact_dedup(docs.unionByName(dup), "doc_id", "text")
        assert res.filter(F.col("n_dups") == 2).count() == 3
        # survivors keep the min id
        assert res.filter((F.col("n_dups") == 2) & (F.col("keep_id") >= 100_000)).count() == 0

    def test_minhash_lsh_recall_vs_exact_jaccard(self, docs):
        # every truly near-duplicate pair (jaccard >= 0.8) must be caught
        # by the banded MinHash join (16 perms / 4 bands -> ~99.9% at 0.9)
        exact = {
            (r.id_1, r.id_2)
            for r in dedup.ngram_jaccard_pairs(
                docs, "doc_id", "text", threshold_num=9, threshold_den=10
            ).collect()
        }
        lsh = {
            (r.id_1, r.id_2)
            for r in dedup.minhash_lsh_pairs(docs, "doc_id", "text").collect()
        }
        assert exact, "testdata should contain near-duplicate pairs"
        recall = len(exact & lsh) / len(exact)
        assert recall >= 0.95, f"minhash LSH recall too low: {recall}"

    def test_minhash_verified_filters_low_jaccard_band_collision(self, spark):
        # VERDICT r2 #4: raw band collisions admit low-Jaccard pairs that
        # dedup_clusters would merge transitively. Hand-construct (by a
        # deterministic Python-side search over the SAME md5/permutation
        # arithmetic) a doc pair that collides on band 0 yet agrees on
        # fewer than half the permutations — the verified operator must
        # drop it while keeping an exact-duplicate pair.
        import hashlib

        from cassandra_diff_spark.operators.dedup import A, B, NUM_PERM, P, XMOD

        def sig_of(text: str) -> list[int]:
            toks = text.split()
            if len(toks) < 3:
                shs = [" ".join(toks)]
            else:
                shs = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            xs = [
                int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % XMOD
                for s in set(shs)
            ]
            return [min((A[i] * x + B[i]) % P for x in xs) for i in range(NUM_PERM)]

        base = "alpha beta gamma"
        s_base = sig_of(base)
        found = None
        for seed in range(200_000):
            cand = f"{base} w{seed}a w{seed}b w{seed}c"
            s_cand = sig_of(cand)
            agree = sum(a == b for a, b in zip(s_base, s_cand))
            if s_cand[:4] == s_base[:4] and agree * 2 < NUM_PERM:
                found = (cand, agree)
                break
        assert found, "search space should contain a low-agreement band collision"
        cand_text, agree = found

        df = spark.createDataFrame(
            [(1, base), (2, cand_text), (10, "same exact text"), (11, "same exact text")],
            "doc_id long, text string",
        )
        raw = {(r.id_1, r.id_2) for r in dedup.minhash_lsh_pairs(df, "doc_id", "text").collect()}
        assert (1, 2) in raw and (10, 11) in raw  # both collide on a band
        ver = {
            (r.id_1, r.id_2): (r.n_agree, r.est_sim)
            for r in dedup.minhash_lsh_verified_pairs(df, "doc_id", "text").collect()
        }
        assert (1, 2) not in ver, "low-Jaccard collision must be filtered"
        assert ver[(10, 11)] == (NUM_PERM, 1.0)  # exact dup: full agreement
        # the Spark-side agreement count matches the Python reimplementation
        allp = dedup.minhash_lsh_verified_pairs(
            df, "doc_id", "text", min_agree_num=0, min_agree_den=1
        )
        spark_agree = {(r.id_1, r.id_2): r.n_agree for r in allp.collect()}
        assert spark_agree[(1, 2)] == agree
        # downstream: clusters built from VERIFIED pairs keep 1 and 2 apart
        clusters = {
            r.id: r.cluster_id
            for r in dedup.dedup_clusters(
                spark.createDataFrame(
                    [k for k in ver], "id_1 long, id_2 long"
                )
            ).collect()
        }
        assert clusters == {10: 10, 11: 10}

    def test_dedup_clusters_warns_on_nonconvergence(self, spark):
        # ADVICE r2: a chain longer than max_iters must not silently
        # return wrong labels
        import warnings

        chain = [(i, i + 1) for i in range(6)]
        pairs = spark.createDataFrame(chain, "id_1 long, id_2 long")
        # driver_edge_cap=0 forces the distributed loop (the driver-side
        # union-find always converges, so the budget is moot there)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            dedup.dedup_clusters(pairs, max_iters=2, driver_edge_cap=0).collect()
        assert any("did not converge" in str(x.message) for x in w)
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="did not converge"):
            dedup.dedup_clusters(
                pairs, max_iters=2, strict=True, driver_edge_cap=0
            )
        # and with budget it converges cleanly: one component, min label —
        # on BOTH paths, which must agree exactly
        res = {r.id: r.cluster_id for r in dedup.dedup_clusters(pairs).collect()}
        assert set(res.values()) == {0}
        dist = {
            r.id: r.cluster_id
            for r in dedup.dedup_clusters(pairs, driver_edge_cap=0).collect()
        }
        assert dist == res

    def test_simhash_identical_docs_distance_zero(self, spark):
        rows = [(1, "spark shuffles the join keys"), (2, "spark shuffles the join keys")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = dedup.simhash_near_pairs(df, "doc_id", "text", max_hamming=3).collect()
        assert len(pairs) == 1 and pairs[0].hamming == 0

    def test_ngram_df_limit_prunes_hot_shingles(self, docs):
        # with a tighter df cap the pair set can only shrink, never grow
        full = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", df_limit=None).count()
        capped = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", df_limit=50).count()
        assert capped <= full

    def test_clusters_resolve_chains(self, spark):
        # chain 1-2-3 collapses transitively even though (1,3) was never
        # a pair; disjoint pair (7,8) stays its own cluster
        pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_1 long, id_2 long")
        res = {r.id: r.cluster_id for r in dedup.dedup_clusters(pairs).collect()}
        assert res == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}

    def test_df_cap_bounds_join_input(self, docs):
        # inject a corpus-wide boilerplate prefix -> hot shingles whose
        # doc frequency is the whole corpus; the cap provably bounds the
        # max join-key fan-out to df_limit
        boiler = docs.withColumn(
            "text", F.concat(F.lit("shared boilerplate header line "), F.col("text"))
        )
        sh = dedup.shingle_set(boiler, "doc_id", "text", 3)
        max_df = sh.groupBy("h").count().agg(F.max("count")).first()[0]
        assert max_df > 100, "boilerplate should create hot shingles"
        capped = dedup.cap_hot_shingles(sh, 100)
        assert capped.groupBy("h").count().agg(F.max("count")).first()[0] <= 100


class TestSimilarity:
    def test_lsh_topk_recall_vs_brute_force(self, embs):
        q = embs.filter(F.col("vec_id") < 10)
        brute = {
            (r.query_id, r.neighbor_id)
            for r in similarity.brute_force_topk(embs, q, "vec_id", "embedding", k=5).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in similarity.hyperplane_lsh_topk(embs, q, "vec_id", "embedding", k=5).collect()
        }
        recall = len(brute & approx) / len(brute)
        # multi-probe LSH measured ~0.94 on this corpus; 0.8 is the guard
        assert recall >= 0.8, f"ANN recall too low: {recall}"

    def test_topk_is_k_rows_per_query(self, embs):
        q = embs.filter(F.col("vec_id") < 4)
        res = similarity.brute_force_topk(embs, q, "vec_id", "embedding", k=5)
        counts = {r.query_id: r.n for r in res.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
        assert counts == {0: 5, 1: 5, 2: 5, 3: 5}


class TestMultimodal:
    def test_parse_header_av_formats(self):
        """Driverless spec checks of the pure-byte parsers: FLAC 20-bit
        sample rate + 3-bit channels, ISO-BMFF box walk to mvhd, WebP
        VP8X 24-bit LE canvas dims."""
        from cassandra_diff_spark.operators.multimodal import _parse_header

        # FLAC: fLaC + STREAMINFO(34): rate 44100 (0x0AC44 -> bytes
        # 0A C4 4_), 2 channels -> low nibble 0x.2
        si = bytes(10) + bytes([0x0A, 0xC4, 0x42]) + bytes(21)
        flac = b"fLaC" + b"\x00\x00\x00\x22" + si
        assert _parse_header(flac) == ("flac", None, None, 44100, 2, None)

        # mp4: ftyp then moov>mvhd v0, timescale 600, duration 1234
        mvhd = (
            (32).to_bytes(4, "big") + b"mvhd" + bytes(12)
            + (600).to_bytes(4, "big") + (1234).to_bytes(4, "big") + bytes(4)
        )
        moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
        ftyp = (16).to_bytes(4, "big") + b"ftyp" + b"isom" + bytes(4)
        got = _parse_header(ftyp + moov)
        assert got == ("mp4", None, None, None, None, 1234 * 1000 // 600)

        # WebP VP8X: canvas 1920x1080 as minus-one 24-bit LE fields
        vp8x = (
            b"RIFF" + bytes(4) + b"WEBP" + b"VP8X" + (10).to_bytes(4, "little")
            + bytes(4) + (1919).to_bytes(3, "little") + (1079).to_bytes(3, "little")
        )
        assert _parse_header(vp8x) == ("webp", 1920, 1080, None, None, None)

        assert _parse_header(b"\x00" * 40)[0] == "unknown"

    def test_payload_roundtrip_bytes(self, docs):
        p = multimodal.attach_payload(docs, "doc_id", "text")
        row = p.join(docs, "doc_id").select("n_bytes", F.length("text").alias("n_chars")).first()
        assert row.n_bytes >= row.n_chars  # utf-8 >= char count

    def test_decode_stub_schema_and_determinism(self, docs):
        p = multimodal.attach_payload(docs.limit(20), "doc_id", "text")
        d1 = {r.doc_id: (r.width, r.height, r.checksum) for r in multimodal.decode_stub(p).collect()}
        d2 = {r.doc_id: (r.width, r.height, r.checksum) for r in multimodal.decode_stub(p).collect()}
        assert d1 == d2 and len(d1) == 20
        assert all(1 <= w <= 640 and 1 <= h <= 480 for w, h, _ in d1.values())

    def test_decode_headers_real_formats(self, spark):
        # real container headers built byte-for-byte with struct packing;
        # the parser must recover dims / rate / channels from raw bytes
        import struct
        import zlib

        def png(w, h):
            ihdr = struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
            return b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr

        def jpeg(w, h):
            # SOI + COM segment (skipped by the scanner) + SOF0
            com = b"\xff\xfe" + struct.pack(">H", 6) + b"meta"
            sof = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
            return b"\xff\xd8" + com + sof + b"\x01\x22\x00"

        def gif(w, h):
            return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"

        def bmp(w, h):
            return (
                b"BM" + b"\x00" * 16 + struct.pack("<ii", w, -h) + b"\x00" * 4
            )  # negative height = top-down; parser reports magnitude

        def wav(rate, ch):
            return (
                b"RIFF" + b"\x00" * 4 + b"WAVEfmt " + struct.pack("<IHH", 16, 1, ch)
                + struct.pack("<I", rate) + b"\x00" * 8
            )

        rows = [
            (1, png(640, 480)),
            (2, jpeg(1920, 1080)),
            (3, gif(32, 16)),
            (4, bmp(100, 200)),
            (5, wav(44100, 2)),
            (6, b"not a container at all"),
            (7, b""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r.doc_id: r for r in multimodal.decode_headers(df).collect()}
        assert (out[1].format, out[1].width, out[1].height) == ("png", 640, 480)
        assert (out[2].format, out[2].width, out[2].height) == ("jpeg", 1920, 1080)
        assert (out[3].format, out[3].width, out[3].height) == ("gif", 32, 16)
        assert (out[4].format, out[4].width, out[4].height) == ("bmp", 100, 200)
        assert (out[5].format, out[5].sample_rate, out[5].n_channels) == ("wav", 44100, 2)
        assert out[6].format == "unknown" and out[6].width is None
        assert out[7].format == "unknown" and out[7].n_bytes == 0
        assert out[1].checksum == zlib.crc32(png(640, 480))

    def test_frame_sample_counts(self, spark):
        df = spark.createDataFrame([(1, 250), (2, 99), (3, 100)], "doc_id long, n_bytes long")
        res = multimodal.frame_sample_stub(df, every_n_bytes=100)
        counts = {r.doc_id: r.n for r in res.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
        # 250 bytes -> frames at 0,100,200; 99 -> just 0; 100 -> 0
        assert counts == {1: 3, 2: 1, 3: 1}


class TestIVF:
    def test_ivf_recall_vs_brute_force(self, embs):
        from pyspark.sql import functions as F

        q = embs.filter(F.col("vec_id") < 10)
        brute = {
            (r.query_id, r.neighbor_id)
            for r in similarity.brute_force_topk(embs, q, "vec_id", "embedding", k=5).collect()
        }
        ivf = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk(embs, q, "vec_id", "embedding", k=5).collect()
        }
        recall = len(brute & ivf) / len(brute)
        # 4-of-16 probed lists on random centroids: must beat chance by far
        assert recall >= 0.3, f"IVF recall suspiciously low: {recall}"

    def test_ivf_returns_k_per_query(self, embs):
        from pyspark.sql import functions as F

        q = embs.filter(F.col("vec_id") < 3)
        res = similarity.ivf_topk(embs, q, "vec_id", "embedding", k=5)
        counts = {r.query_id: r.n for r in res.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {0, 1, 2} and all(v == 5 for v in counts.values())

    def test_ivf_max_centroids_guard_raises(self, embs):
        # VERDICT r2 #3: an under-sized centroid_mod must raise with
        # guidance, not collect |corpus|/mod rows to the driver — the
        # limit bounds the fetch itself, the error names both knobs
        import pytest

        q = embs.filter(F.col("vec_id") < 2)
        with pytest.raises(ValueError, match="max_centroids"):
            similarity.ivf_topk(
                embs, q, "vec_id", "embedding", k=5, centroid_mod=2, max_centroids=10
            )

    def test_ivf_string_ids(self, embs):
        # ADVICE r2: non-integer id columns must work (lists join on the
        # ordinal centroid index, ids never pass through numpy)
        s = embs.select(
            F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("vec_id"),
            "embedding",
        )
        q = s.filter(F.col("vec_id").isin("doc-0", "doc-1"))
        res = similarity.ivf_topk(s, q, "vec_id", "embedding", k=5)
        counts = {
            r.query_id: r.n
            for r in res.groupBy("query_id").agg(F.count("*").alias("n")).collect()
        }
        assert set(counts) == {"doc-0", "doc-1"} and all(
            v == 5 for v in counts.values()
        )

    def test_ivf_kmeans_recall_vs_brute_force(self, embs):
        from pyspark.sql import functions as F

        q = embs.filter(F.col("vec_id") < 10)
        brute = {
            (r.query_id, r.neighbor_id)
            for r in similarity.brute_force_topk(embs, q, "vec_id", "embedding", k=5).collect()
        }
        km = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk_kmeans(
                embs, q, "vec_id", "embedding", k=5, n_lists=16, n_probe=4
            ).collect()
        }
        recall = len(brute & km) / len(brute)
        # learned centroids should at least match the hash-mod floor
        assert recall >= 0.3, f"KMeans IVF recall suspiciously low: {recall}"
        # deterministic given the fixed seed
        km2 = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk_kmeans(
                embs, q, "vec_id", "embedding", k=5, n_lists=16, n_probe=4
            ).collect()
        }
        assert km == km2


class TestVacuum:
    def test_ttl_drops_old_rows(self, spark, tmp_path):
        import time
        from cassandra_diff_spark.journal import Journal, vacuum

        j = Journal(spark, str(tmp_path / "vacjournal"))
        j.update_task_status("old-job", 0, "t", 0, {}, 0)
        time.sleep(1.2)
        cut = time.time()  # rows written before this are "old"
        j.update_task_status("new-job", 0, "t", 1, {}, 0)
        dropped = vacuum(j, ttl_seconds=0, now_epoch=cut)
        assert dropped["task_status"] == 1
        left = j._read("task_status").collect()
        assert len(left) == 1 and left[0].job_id == "new-job"


class TestPandasANN:
    def test_pandas_matmul_matches_expression_topk(self, embs):
        q = embs.filter(F.col("vec_id") < 8)
        expr = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in similarity.brute_force_topk(embs, q, "vec_id", "embedding", k=5).collect()
        }
        blas = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in similarity.brute_force_topk_pandas(embs, q, "vec_id", "embedding", k=5).collect()
        }
        assert expr == blas


class TestCurate:
    def test_clean_corpus_dedup_before_quality(self, spark):
        from cassandra_diff_spark.operators.curate import clean_corpus, corpus_stats

        good = (
            "the quick brown fox jumps over the lazy dog and then "
            "the dog sleeps in the warm sun for a while with a friend"
        )
        rows = [
            (1, good),            # kept: survivor of fp group {1, 2}
            (2, good),            # dropped: duplicate of 1
            (3, "x" * 10),        # dropped: junk (no stopwords, short)
            (4, good + " again"), # kept: unique, good quality
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        kept = {r.id for r in clean_corpus(df, "doc_id", "text").collect()}
        assert kept == {1, 4}

        stats = corpus_stats(df, "doc_id", "text").collect()
        assert len(stats) == 1 and stats[0].lang == "en" and stats[0].n_docs == 2

    def test_clean_corpus_low_quality_survivor_blocks_group(self, spark):
        # dedup-before-quality: if the min-id copy fails the gate, the
        # whole fingerprint group is dropped (the survivor IS the group)
        from cassandra_diff_spark.operators.curate import clean_corpus

        junk = "!!! ??? " * 30  # punctuation-only: quality 333 < 500
        df = spark.createDataFrame(
            [(1, junk), (2, junk)], "doc_id long, text string"
        )
        assert clean_corpus(df, "doc_id", "text").count() == 0


class TestStratifiedSample:
    def test_rates_apply_per_stratum(self, spark):
        from cassandra_diff_spark.operators.curate import stratified_sample

        df = spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b") for i in range(400)],
            "id long, src string",
        )
        out = stratified_sample(
            df, "id", "src", ppm={"a": 1_000_000}, default_ppm=0
        )
        rows = out.collect()
        # keep-all stratum survives in full, default 0 drops stratum b
        assert {r.src for r in rows} == {"a"}
        assert len(rows) == 200

    def test_deterministic_and_monotone(self, spark):
        # a 25% sample is an exact subset of a 50% sample (hash predicate
        # thresholds nest) and identical across invocations
        from cassandra_diff_spark.operators.curate import stratified_sample

        df = spark.createDataFrame(
            [(i, "w") for i in range(1000)], "id long, src string"
        )
        s25 = {r.id for r in stratified_sample(df, "id", "src", {"w": 250_000}).collect()}
        s50 = {r.id for r in stratified_sample(df, "id", "src", {"w": 500_000}).collect()}
        s25_again = {
            r.id for r in stratified_sample(df, "id", "src", {"w": 250_000}).collect()
        }
        assert s25 == s25_again
        assert s25 <= s50
        # keep rate lands near the requested fraction
        assert 150 < len(s25) < 350 and 380 < len(s50) < 620

    def test_map_only_plan(self, spark):
        # the sample must stay a scan+filter: no exchange in the plan
        from cassandra_diff_spark.operators.curate import stratified_sample

        df = spark.range(100).selectExpr("id", "'w' AS src")
        plan = stratified_sample(df, "id", "src", {"w": 500_000})._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestBenchmarkContamination:
    def test_overlap_counts(self, spark):
        from cassandra_diff_spark.operators.curate import benchmark_contamination

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely different words here that never collide at all"),
                (3, "hi"),  # under 3 words: ONE whole-text shingle
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(9, "the quick brown fox runs far")], "doc_id long, text string"
        )
        out = {r.id: r for r in benchmark_contamination(docs, bench, "doc_id", "text").collect()}
        assert set(out) == {1, 2, 3}
        assert out[3].n_grams == 1 and out[3].n_overlap == 0
        # doc 1 shares exactly the shingles 'the quick brown' and
        # 'quick brown fox' with the benchmark
        assert out[1].n_overlap == 2
        assert out[1].n_grams == 7
        assert out[1].overlap_milli == 2000 // 7
        assert out[2].n_overlap == 0 and out[2].overlap_milli == 0

    def test_fully_contained_doc_hits_1000(self, spark):
        from cassandra_diff_spark.operators.curate import benchmark_contamination

        text = "alpha beta gamma delta epsilon"
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        bench = spark.createDataFrame(
            [(2, "prefix words " + text + " suffix words")],
            "doc_id long, text string",
        )
        row = benchmark_contamination(docs, bench, "doc_id", "text").first()
        assert row.n_overlap == row.n_grams and row.overlap_milli == 1000


class TestRepetitionStats:
    def test_hand_computed_fractions(self, spark):
        from cassandra_diff_spark.operators.curate import repetition_stats

        docs = spark.createDataFrame(
            [
                # 6 words, 3 distinct; 'spam' x4 -> top word 4/6;
                # 2-grams: [spam spam, spam spam, spam eggs, eggs ham,
                # ham spam] -> top 'spam spam' 2/5
                (1, "spam spam spam eggs ham spam"),
                # all distinct: distinct=1000, top word 1/4, top 2-gram 1/3
                (2, "alpha beta gamma delta"),
                # single word: shingles fall back to whole text (1 shingle)
                (3, "solo"),
            ],
            "doc_id long, text string",
        )
        out = {r.id: r for r in repetition_stats(docs, "doc_id", "text").collect()}
        assert out[1].n_words_total == 6
        assert out[1].distinct_word_milli == 3000 // 6
        assert out[1].top_word_milli == 4000 // 6
        assert out[1].top_ngram_milli == 2000 // 5
        assert out[2].distinct_word_milli == 1000
        assert out[2].top_word_milli == 250
        assert out[2].top_ngram_milli == 1000 // 3
        assert out[3].n_words_total == 1 and out[3].top_ngram_milli == 1000

    def test_pathological_repeater_flagged(self, spark):
        from cassandra_diff_spark.operators.curate import repetition_stats

        docs = spark.createDataFrame(
            [(1, "buy now " * 50), (2, "genuinely varied prose with many words")],
            "doc_id long, text string",
        )
        out = {r.id: r for r in repetition_stats(docs, "doc_id", "text").collect()}
        # the looping doc: 2 distinct words over 100 -> 20 milli
        assert out[1].distinct_word_milli == 20
        assert out[1].top_word_milli == 500
        assert out[2].distinct_word_milli == 1000


class TestBoilerplateFlags:
    def test_corpus_frequent_shingle_marked(self, spark):
        from cassandra_diff_spark.operators.curate import boilerplate_flags

        footer = "all rights reserved"
        docs = spark.createDataFrame(
            [
                (1, "unique content one " + footer),
                (2, "other unique body text " + footer),
                (3, "third distinct document here " + footer),
                (4, "no shared trailer in this one at all"),
            ],
            "doc_id long, text string",
        )
        out = {
            r.id: r
            for r in boilerplate_flags(
                docs, "doc_id", "text", n=3, min_df=3
            ).collect()
        }
        # 'all rights reserved' appears in 3 docs -> boilerplate for 1-3
        assert all(out[i].n_boiler >= 1 for i in (1, 2, 3))
        assert out[4].n_boiler == 0 and out[4].boiler_milli == 0
        # doc 1: 5 words -> 3 shingles... verify the fraction arithmetic
        for i in (1, 2, 3):
            assert out[i].boiler_milli == (out[i].n_boiler * 1000) // out[i].n_shingles

    def test_min_df_threshold_respected(self, spark):
        from cassandra_diff_spark.operators.curate import boilerplate_flags

        docs = spark.createDataFrame(
            [(1, "shared phrase here plus own"), (2, "shared phrase here and more")],
            "doc_id long, text string",
        )
        # df of 'shared phrase here' is 2: below min_df=3 nothing flagged
        out = boilerplate_flags(docs, "doc_id", "text", n=3, min_df=3).collect()
        assert all(r.n_boiler == 0 for r in out)


class TestIndexReuse:
    """Build-once/query-many: a persisted index must give results
    identical to the direct (index-free) operator call."""

    def test_lsh_index_roundtrip_identical(self, embs, tmp_path):
        q = embs.filter(F.col("vec_id") < 8)
        direct = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in similarity.hyperplane_lsh_topk(
                embs, q, "vec_id", "embedding", k=5
            ).collect()
        }
        p = str(tmp_path / "lsh_index.parquet")
        similarity.hyperplane_lsh_index(embs, "vec_id", "embedding").write.parquet(p)
        idx = embs.sparkSession.read.parquet(p)
        via_index = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in similarity.hyperplane_lsh_topk(
                embs, q, "vec_id", "embedding", k=5, index=idx
            ).collect()
        }
        assert via_index == direct

    def test_ivf_index_roundtrip_identical(self, embs, tmp_path):
        q = embs.filter(F.col("vec_id") < 8)
        direct = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in similarity.ivf_topk(
                embs, q, "vec_id", "embedding", k=5, centroid_mod=8
            ).collect()
        }
        p = str(tmp_path / "ivf_index.parquet")
        similarity.ivf_index(embs, "vec_id", "embedding", centroid_mod=8).write.parquet(p)
        idx = embs.sparkSession.read.parquet(p)
        via_index = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in similarity.ivf_topk(
                embs, q, "vec_id", "embedding", k=5, centroid_mod=8, index=idx
            ).collect()
        }
        assert via_index == direct


class TestIncrementalDedup:
    """minhash_lsh_incremental: batch-vs-indexed-corpus dedup with
    planted duplicates in both relations."""

    def test_planted_duplicates_found(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again "
        corpus_rows = [(i, base + f"corpus unique text {i} " * 3) for i in range(10)]
        corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
        batch = spark.createDataFrame(
            [
                (100, corpus_rows[3][1]),        # exact dup of corpus doc 3
                (101, "totally novel content with nothing shared whatsoever " * 4),
                (102, base + "batch twin payload " * 5),
                (103, base + "batch twin payload " * 5),  # dup of 102
            ],
            "doc_id long, text string",
        )
        from cassandra_diff_spark.operators.dedup import (
            minhash_lsh_incremental,
            minhash_signatures,
        )

        sigs = minhash_signatures(corpus, "doc_id", "text")
        out = minhash_lsh_incremental(batch, sigs, "doc_id", "text").collect()
        rel = {(r.new_id, r.dup_id): (r.dup_in, r.est_sim) for r in out}
        assert rel[(100, 3)][0] == "corpus" and rel[(100, 3)][1] == 1.0
        assert rel[(103, 102)][0] == "batch" and rel[(103, 102)][1] == 1.0
        assert not any(new_id == 101 for new_id, _ in rel)  # novel doc clean
        from cassandra_diff_spark.operators import release_caches

        release_caches()


class TestFusedIndexParity:
    """The fused mapInArrow index builds must be BIT-identical to the
    expression-path builds (same quantize HALF_UP rounding, same keys,
    same centroid tie-breaks) — the throughput rewrite may not move a
    single value, or the oracle-checked rerank results would drift."""

    def test_lsh_index_bit_parity(self, embs):
        fused = similarity.hyperplane_lsh_index(
            embs, "vec_id", "embedding", fused=True
        )
        classic = similarity.hyperplane_lsh_index(
            embs, "vec_id", "embedding", fused=False
        )
        assert fused.schema == classic.schema
        assert fused.exceptAll(classic).count() == 0
        assert classic.exceptAll(fused).count() == 0

    def test_ivf_index_bit_parity(self, embs):
        fused = similarity.ivf_index(
            embs, "vec_id", "embedding", centroid_mod=8, fused=True
        )
        classic = similarity.ivf_index(
            embs, "vec_id", "embedding", centroid_mod=8, fused=False
        )
        assert fused.schema == classic.schema
        assert fused.exceptAll(classic).count() == 0
        assert classic.exceptAll(fused).count() == 0

    def test_quantize_np_half_up_ties(self, spark):
        """Exact .5 fractions round AWAY from zero, matching Spark."""
        import pyarrow as pa

        from cassandra_diff_spark.operators.similarity import _make_vec_matrix_fn

        vals = [0.0005, -0.0005, 0.0015, -0.0015, 0.0024999, 1.0, -1.0]
        got = _make_vec_matrix_fn(len(vals))(pa.array([vals]))[0].tolist()
        df = spark.createDataFrame([(vals,)], "v array<double>")
        from cassandra_diff_spark.functions.vectors import quantize

        want = df.select(quantize(F.col("v")).alias("q")).collect()[0].q
        assert got == want
        assert got[:4] == [1, -1, 2, -2]  # ties away from zero

    def test_fused_rejects_nulls_and_ragged(self, spark):
        import pyarrow as pa
        import pytest as _pytest

        from cassandra_diff_spark.operators.similarity import _make_vec_matrix_fn

        with _pytest.raises(ValueError, match="null embedding"):
            _make_vec_matrix_fn(2)(pa.array([[1.0, 2.0], None]))
        with _pytest.raises(ValueError, match="ragged"):
            _make_vec_matrix_fn(2)(pa.array([[1.0, 2.0], [3.0]]))


class TestPII:
    """PII detection/redaction (functions/text.py PII_* surface)."""

    def test_counts_and_redaction(self, spark):
        from cassandra_diff_spark.functions.text import pii_count, pii_redact

        rows = [
            (1, "mail jo.doe+x@ex-ample.org and sue@a.io, ip 10.0.0.1"),
            (2, "call 555-123-4567 or 555-000-1111"),
            (3, "clean text with no identifiers at all"),
        ]
        df = spark.createDataFrame(rows, "id int, t string")
        out = df.select(
            "id",
            pii_count(F.col("t"), "email").alias("e"),
            pii_count(F.col("t"), "ipv4").alias("i"),
            pii_count(F.col("t"), "phone").alias("p"),
            pii_redact(F.col("t")).alias("r"),
        ).collect()
        by_id = {r["id"]: r for r in out}
        assert (by_id[1]["e"], by_id[1]["i"], by_id[1]["p"]) == (2, 1, 0)
        assert (by_id[2]["e"], by_id[2]["i"], by_id[2]["p"]) == (0, 0, 2)
        assert (by_id[3]["e"], by_id[3]["i"], by_id[3]["p"]) == (0, 0, 0)
        assert by_id[1]["r"] == "mail [EMAIL] and [EMAIL], ip [IP]"
        assert by_id[2]["r"] == "call [PHONE] or [PHONE]"
        assert by_id[3]["r"] == rows[2][1]

    def test_phone_not_double_counted_as_ip(self, spark):
        from cassandra_diff_spark.functions.text import pii_count

        df = spark.createDataFrame([(1, "x 555-123-4567 y")], "id int, t string")
        r = df.select(
            pii_count(F.col("t"), "ipv4").alias("i"),
            pii_count(F.col("t"), "phone").alias("p"),
        ).collect()[0]
        assert (r["i"], r["p"]) == (0, 1)


class TestPackSequences:
    """Greedy context-window packing (operators/curate.pack_sequences)."""

    def test_invariants(self, spark, sf_dir):
        from cassandra_diff_spark.functions.text import n_words
        from cassandra_diff_spark.operators.curate import pack_sequences

        d = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "source", n_words(F.col("text")).alias("nw"))
        )
        out = pack_sequences(d, "doc_id", "nw", capacity=256, group_col="source")
        rows = out.collect()
        assert len(rows) == d.count()
        # bin fill never exceeds capacity unless the bin is a singleton
        from collections import defaultdict

        fills = defaultdict(list)
        for r in rows:
            fills[(r["source"], r["bin"])].append(r["nw"])
        for (src, b), toks in fills.items():
            assert sum(toks) <= 256 or len(toks) == 1, (src, b, toks)
        # offsets are the running prefix sums within each bin
        by_bin = defaultdict(list)
        for r in rows:
            by_bin[(r["source"], r["bin"])].append((r["doc_id"], r["offset"], r["nw"]))
        for docs in by_bin.values():
            docs.sort()
            run = 0
            for _, off, nw in docs:
                assert off == run
                run += nw

    def test_deterministic_and_sharded(self, spark, sf_dir):
        from cassandra_diff_spark.functions.text import n_words
        from cassandra_diff_spark.operators.curate import pack_sequences

        d = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "source", n_words(F.col("text")).alias("nw"))
        )
        a = pack_sequences(d, "doc_id", "nw", 128, n_shards=4).collect()
        b = pack_sequences(d, "doc_id", "nw", 128, n_shards=4).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))
        assert len({r["shard"] for r in a}) == 4

    def test_oversized_doc_gets_own_bin(self, spark):
        from cassandra_diff_spark.operators.curate import pack_sequences

        d = spark.createDataFrame(
            [(1, "g", 10), (2, "g", 999), (3, "g", 10)], "doc_id long, g string, nw long"
        )
        rows = {r["doc_id"]: r for r in
                pack_sequences(d, "doc_id", "nw", 100, group_col="g").collect()}
        assert rows[2]["bin"] not in (rows[1]["bin"], rows[3]["bin"])
        assert rows[2]["offset"] == 0

    def test_requires_exactly_one_grouping(self, spark):
        from cassandra_diff_spark.operators.curate import pack_sequences

        d = spark.createDataFrame([(1, "g", 5)], "doc_id long, g string, nw long")
        with pytest.raises(ValueError):
            pack_sequences(d, "doc_id", "nw", 100)
        with pytest.raises(ValueError):
            pack_sequences(d, "doc_id", "nw", 100, group_col="g", n_shards=2)


class TestSemanticDedup:
    """SemDeDup-style cluster-scoped dedup: min-id survivorship within
    deterministic IVF cells; brute-force recomputation as the baseline."""

    def test_matches_brute_force_within_cells(self, embs):
        import numpy as np

        res = {
            r["vec_id"]: r
            for r in dedup.semantic_dedup(
                embs, "vec_id", "embedding", min_cos=0.4, centroid_mod=32
            ).collect()
        }
        assert len(res) == embs.count()
        # brute-force replica: same quantization-free cosine is close
        # enough for a 0.4 threshold only if we replicate the quantized
        # math — so reuse the engine's own cell assignment and verify the
        # survivorship logic independently in numpy
        rows = embs.collect()
        vec = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
        cells: dict = {}
        for vid, r in res.items():
            cells.setdefault(r["cent_id"], []).append(vid)
        for cell_ids in cells.values():
            cell_ids.sort()
            for i, a in enumerate(cell_ids):
                expect_killed = False
                for b in cell_ids[:i]:
                    va, vb = vec[a], vec[b]
                    cos = float(va @ vb) / (
                        np.linalg.norm(va) * np.linalg.norm(vb)
                    )
                    # stay away from the quantization boundary
                    if cos >= 0.4 + 1e-6:
                        expect_killed = True
                        break
                    if cos >= 0.4 - 1e-6:
                        expect_killed = None  # boundary — skip assert
                        break
                if expect_killed is None:
                    continue
                assert res[a]["kept"] == (not expect_killed), a

    def test_min_id_always_kept_per_cell(self, embs):
        res = dedup.semantic_dedup(
            embs, "vec_id", "embedding", min_cos=0.4, centroid_mod=32
        )
        mins = res.groupBy("cent_id").agg(F.min("vec_id").alias("vec_id"))
        joined = res.join(mins, ["cent_id", "vec_id"])
        assert joined.filter(~F.col("kept")).count() == 0

    def test_cent_id_is_a_real_document_id(self, embs):
        res = dedup.semantic_dedup(
            embs, "vec_id", "embedding", min_cos=0.4, centroid_mod=32
        )
        ids = {r["vec_id"] for r in embs.select("vec_id").collect()}
        cents = {r["cent_id"] for r in res.select("cent_id").distinct().collect()}
        assert cents <= ids


class TestDomainCap:
    def test_salted_equals_unsalted_with_hot_domain(self, spark):
        from cassandra_diff_spark.operators.curate import domain_cap

        rows = [(i, "hot" if i < 900 else f"d{i % 7}", i * 37 % 1000)
                for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, dom string, q long")
        order = [F.col("q").desc(), F.col("id").asc()]
        plain = domain_cap(df, "dom", n_max=10, order_by=order)
        salted = domain_cap(
            df, "dom", n_max=10, order_by=order,
            salt_id_col="id", salt_partitions=16,
        )
        key = lambda d: sorted(  # noqa: E731
            (r["id"], r["dom"], r["domain_rank"]) for r in d.collect()
        )
        assert key(plain) == key(salted)
        assert all(r["domain_rank"] <= 10 for r in salted.collect())

    def test_cap_keeps_best_rows(self, spark):
        from cassandra_diff_spark.operators.curate import domain_cap

        df = spark.createDataFrame(
            [(1, "a", 5), (2, "a", 9), (3, "a", 7), (4, "b", 1)],
            "id long, dom string, q long",
        )
        res = domain_cap(
            df, "dom", n_max=2, order_by=[F.col("q").desc(), F.col("id")]
        )
        got = {(r["id"], r["domain_rank"]) for r in res.collect()}
        assert got == {(2, 1), (3, 2), (4, 1)}


class TestUrlParts:
    def test_parses_and_handles_garbage(self, spark):
        from cassandra_diff_spark.functions import web

        df = spark.createDataFrame(
            [
                ("https://user:pw@w1.s.example.org:8443/p/1?lang=en",),
                ("http://example.com/",),
                ("not a url",),
                ("ftp://files.archive.example.co.uk/a/b",),
            ],
            "url string",
        )
        rows = df.select(web.url_parts(F.col("url")).alias("p")).collect()
        p0, p1, p2, p3 = (r["p"] for r in rows)
        assert p0["scheme"] == "https" and p0["host"] == "w1.s.example.org"
        assert p0["port"] == "8443" and p0["path"] == "/p/1"
        assert p0["query"] == "lang=en" and p0["domain"] == "example.org"
        assert p1["host"] == "example.com" and p1["port"] == ""
        assert p2["host"] == "" and p2["scheme"] == ""
        # documented last-two-labels heuristic (no PSL): co.uk, not
        # example.co.uk
        assert p3["scheme"] == "ftp" and p3["domain"] == "co.uk"


class TestTrainingLayout:
    def test_shuffle_is_globally_sorted_and_deterministic(self, docs):
        from cassandra_diff_spark.operators.curate import deterministic_shuffle

        a = deterministic_shuffle(docs, "doc_id", seed=1, n_partitions=8)
        keys = [r["shuffle_key"] for r in a.select("shuffle_key").collect()]
        assert keys == sorted(keys)  # range partitions collect in order
        b = deterministic_shuffle(docs, "doc_id", seed=1, n_partitions=8)
        assert [r["doc_id"] for r in a.select("doc_id").collect()] == [
            r["doc_id"] for r in b.select("doc_id").collect()
        ]
        c = deterministic_shuffle(docs, "doc_id", seed=2, n_partitions=8)
        assert [r["doc_id"] for r in a.select("doc_id").collect()] != [
            r["doc_id"] for r in c.select("doc_id").collect()
        ]

    def test_shards_roundtrip_and_file_caps(self, docs, tmp_path):
        import glob

        from cassandra_diff_spark.operators.curate import write_training_shards

        path = str(tmp_path / "shards")
        manifest = write_training_shards(
            docs, path, "doc_id", n_shards=8, max_records_per_file=20
        )
        rows = {r["shard"]: r["n_rows"] for r in manifest.collect()}
        assert sum(rows.values()) == docs.count()
        assert set(rows) <= set(range(8))
        # partitioned layout on disk; every file respects the record cap
        spark = docs.sparkSession
        for d in glob.glob(f"{path}/shard=*"):
            for f in glob.glob(f"{d}/*.parquet"):
                assert spark.read.parquet(f).count() <= 20


class TestSemanticDedupIndexReuse:
    def test_prebuilt_index_identical(self, embs, tmp_path):
        p = str(tmp_path / "sem_idx")
        similarity.ivf_index(
            embs, "vec_id", "embedding", centroid_mod=32
        ).write.parquet(p)
        spark = embs.sparkSession
        idx = spark.read.parquet(p)
        fresh = dedup.semantic_dedup(
            embs, "vec_id", "embedding", min_cos=0.4, centroid_mod=32
        )
        reused = dedup.semantic_dedup(
            embs, "vec_id", "embedding", min_cos=0.4, centroid_mod=32,
            index=idx,
        )
        key = lambda d: sorted(tuple(r) for r in d.collect())  # noqa: E731
        assert key(fresh) == key(reused)


class TestClusterSurvivors:
    def test_best_quality_survivor(self, spark):
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "id long, cluster_id long"
        )
        scores = spark.createDataFrame(
            [(1, 100), (2, 900), (3, 900), (7, 5), (8, 50)], "id long, score long"
        )
        res = {
            r["id"]: (r["survivor_id"], r["kept"])
            for r in dedup.cluster_survivors(clusters, scores).collect()
        }
        # cluster 1: max score 900 tie between 2 and 3 -> min id 2
        assert res[1] == (2, False) and res[2] == (2, True) and res[3] == (2, False)
        assert res[8] == (8, True) and res[7] == (8, False)


class TestTokenBudgetRates:
    def test_rate_arithmetic(self):
        from cassandra_diff_spark.operators.curate import token_budget_rates

        rates = token_budget_rates(
            {"en": 1_000_000, "de": 100, "fr": 0},
            {"en": 250_000, "de": 500, "fr": 10, "xx": 5},
        )
        assert rates["en"] == 250_000  # quarter of available
        assert rates["de"] == 1_000_000  # target > available -> keep all
        assert rates["fr"] == 0 and rates["xx"] == 0  # nothing available

    def test_sampled_tokens_near_target(self, docs):
        from cassandra_diff_spark.operators.curate import (
            clean_corpus,
            stratified_sample,
            token_budget_rates,
        )

        kept = clean_corpus(docs, "doc_id", "text")
        stats = {
            r["lang"]: r["t"]
            for r in kept.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
        }
        targets = {lang: total // 2 for lang, total in stats.items()}
        sampled = stratified_sample(
            kept, "id", "lang", token_budget_rates(stats, targets)
        )
        got = {
            r["lang"]: r["t"]
            for r in sampled.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
        }
        for lang, target in targets.items():
            if target > 1000:  # enough mass for the LLN to apply
                assert 0.6 * target <= got.get(lang, 0) <= 1.4 * target, lang


class TestContainmentPairs:
    def test_truncated_copy_found_jaccard_misses_it(self, spark):
        from cassandra_diff_spark.operators.dedup import (
            ngram_containment_pairs,
            ngram_jaccard_pairs,
        )

        full = " ".join(f"w{i}x" for i in range(50))  # 50 distinct words
        trunc = " ".join(full.split()[:15])  # 30% prefix
        df = spark.createDataFrame(
            [(1, full), (2, trunc), (3, "completely different words here entirely")],
            "doc_id long, text string",
        )
        cont = {
            (r.id_1, r.id_2)
            for r in ngram_containment_pairs(
                df, "doc_id", "text", threshold_num=9, threshold_den=10
            ).collect()
        }
        assert (1, 2) in cont and not any(3 in p for p in cont)
        jac = {
            (r.id_1, r.id_2)
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", threshold_num=4, threshold_den=5
            ).collect()
        }
        assert (1, 2) not in jac  # the case Jaccard structurally misses

    def test_symmetric_min_normalization(self, spark):
        """Containment normalizes by the SMALLER set: order of the pair
        doesn't change acceptance."""
        from cassandra_diff_spark.operators.dedup import ngram_containment_pairs

        full = "one two three four five six seven eight nine ten " * 3
        trunc = " ".join(full.split()[:9])
        df = spark.createDataFrame(
            [(2, full), (1, trunc)], "doc_id long, text string"
        )
        rows = ngram_containment_pairs(df, "doc_id", "text").collect()
        assert len(rows) == 1 and rows[0].id_1 == 1 and rows[0].id_2 == 2


class TestChunkDocuments:
    def test_overlapping_windows(self, spark):
        from cassandra_diff_spark.operators.curate import chunk_documents

        text = " ".join(f"t{i}" for i in range(10))
        df = spark.createDataFrame(
            [(1, text), (2, ""), (3, "   ")], "doc_id long, text string"
        )
        rows = sorted(
            chunk_documents(df, "doc_id", "text", chunk_words=4, overlap_words=1)
            .collect(),
            key=lambda r: r.chunk_id,
        )
        # step=3: starts 0,3,6,9; empty docs produce nothing
        assert [r.doc_id for r in rows] == [1, 1, 1, 1]
        assert [(r.chunk_id, r.start_word, r.n_words) for r in rows] == [
            (0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1),
        ]
        assert rows[1].chunk_text == "t3 t4 t5 t6"
        assert rows[3].chunk_text == "t9"
        # every adjacent pair shares exactly the overlap
        assert rows[0].chunk_text.split()[-1] == rows[1].chunk_text.split()[0]

    def test_no_shuffle_plan(self, spark):
        from cassandra_diff_spark.operators.curate import chunk_documents

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = (
            chunk_documents(df, "doc_id", "text", chunk_words=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_bad_overlap_raises(self, spark):
        from cassandra_diff_spark.operators.curate import chunk_documents

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, "doc_id", "text", chunk_words=4, overlap_words=4)


class TestContainmentIncremental:
    def test_one_shot_parity(self, spark):
        """Incremental batch-vs-index run == the one-shot containment run
        over corpus+batch restricted to batch-touching pairs, reoriented
        so new_id is the batch doc (larger id for batch-batch pairs)."""
        from cassandra_diff_spark.operators.dedup import (
            ngram_containment_incremental,
            ngram_containment_pairs,
            shingle_set,
        )

        full = " ".join(f"w{i}x" for i in range(60))
        trunc40 = " ".join(full.split()[:24])
        other = " ".join(f"z{i}q" for i in range(40))
        other_trunc = " ".join(other.split()[:16])
        corpus = spark.createDataFrame(
            [(1, full), (2, other), (3, "unrelated text entirely here now")],
            "doc_id long, text string",
        )
        batch = spark.createDataFrame(
            # 10 and 11 truncate corpus doc 1 (11 also contained in 10 ->
            # a batch-batch relation); 12 truncates corpus doc 2
            [(10, trunc40), (11, " ".join(full.split()[:10])), (12, other_trunc)],
            "doc_id long, text string",
        )
        idx = shingle_set(corpus, "doc_id", "text", 3)
        got = {
            (r.new_id, r.dup_id, r.dup_in, r.intersect_n, r.sz_new, r.sz_dup)
            for r in ngram_containment_incremental(
                batch, idx, "doc_id", "text", threshold_num=9, threshold_den=10
            ).collect()
        }
        both = corpus.unionByName(batch)
        batch_ids = {10, 11, 12}
        want = set()
        for r in ngram_containment_pairs(
            both, "doc_id", "text", threshold_num=9, threshold_den=10
        ).collect():
            in1, in2 = r.id_1 in batch_ids, r.id_2 in batch_ids
            if not (in1 or in2):
                continue  # corpus-corpus pairs are not re-litigated
            if in1 and in2:
                new, dup, dup_in = max(r.id_1, r.id_2), min(r.id_1, r.id_2), "batch"
                sz_new, sz_dup = (
                    (r.sz_2, r.sz_1) if r.id_2 > r.id_1 else (r.sz_1, r.sz_2)
                )
            elif in1:
                new, dup, dup_in = r.id_1, r.id_2, "corpus"
                sz_new, sz_dup = r.sz_1, r.sz_2
            else:
                new, dup, dup_in = r.id_2, r.id_1, "corpus"
                sz_new, sz_dup = r.sz_2, r.sz_1
            want.add((new, dup, dup_in, r.intersect_n, sz_new, sz_dup))
        assert got == want
        assert any(d == "corpus" for _, _, d, _, _, _ in got)
        assert any(d == "batch" for _, _, d, _, _, _ in got)

    def test_df_cap_counts_union(self, spark):
        """The hot-shingle cap is computed over corpus+batch, matching
        the one-shot run (a corpus-only cap would diverge)."""
        from cassandra_diff_spark.operators.dedup import (
            ngram_containment_incremental,
            shingle_set,
        )

        # one shared shingle everywhere: 'a b c' in every doc
        base = "a b c "
        corpus = spark.createDataFrame(
            [(i, base + f"u{i} v{i} w{i}") for i in range(3)],
            "doc_id long, text string",
        )
        batch = spark.createDataFrame(
            [(10 + i, base + f"x{i} y{i} z{i}") for i in range(3)],
            "doc_id long, text string",
        )
        idx = shingle_set(corpus, "doc_id", "text", 3)
        # df of shingle 'a b c' = 6 over the union; cap at 5 must drop it
        got = ngram_containment_incremental(
            batch, idx, "doc_id", "text", threshold_num=1, threshold_den=2,
            df_limit=5,
        ).collect()
        assert all(r.intersect_n == 0 or r.intersect_n < 6 for r in got)
        # with the shared shingle capped away, no batch doc reaches 1/2
        # containment against anything
        assert got == []


class TestCleanCorpusNeardup:
    def test_near_copies_removed_exact_survivorship_subsumed(self, spark):
        from cassandra_diff_spark.operators.curate import clean_corpus_neardup

        base = " ".join(f"common word{i} body" for i in range(30))
        near = base + " tail"          # near-dup of base
        exact = base                    # exact dup of base
        other = " ".join(f"z{i}q" for i in range(40))
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, exact), (4, other)],
            "doc_id long, text string",
        )
        kept = {r.id for r in clean_corpus_neardup(
            df, "doc_id", "text", min_quality_milli=0
        ).collect()}
        # 1 survives its cluster {1, 2, 3}; the unrelated doc stays
        assert kept == {1, 4}

    def test_quality_gate_applies_after_survivorship(self, spark):
        from cassandra_diff_spark.operators.curate import clean_corpus_neardup

        df = spark.createDataFrame(
            [(1, "!!!! ???? ;;;; ::::"), (2, "a perfectly normal sentence here")],
            "doc_id long, text string",
        )
        kept = clean_corpus_neardup(df, "doc_id", "text").collect()
        assert [r.id for r in kept] == [2]  # punctuation soup gated out


class TestSampleExactK:
    """curate.sample_exact_k — deterministic exact-k-per-stratum."""

    @pytest.fixture(scope="class")
    def strat_df(self, spark):
        rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
        rows += [(1000 + i, None) for i in range(5)]   # null stratum
        return spark.createDataFrame(rows, "id long, lang string")

    def _naive(self, spark, df, k, seed=0):
        """The full-sort window formulation — the semantics oracle."""
        from cassandra_diff_spark.functions.text import md5_hash64
        from pyspark.sql import Window

        u = md5_hash64(F.concat(F.col("id").cast("string"), F.lit(f":{seed}"))) % 1_000_000
        w = Window.partitionBy("lang").orderBy(u.asc(), F.col("id").asc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    def test_exact_counts_and_equality_with_naive(self, spark, strat_df):
        from cassandra_diff_spark.operators.curate import sample_exact_k

        got = sample_exact_k(strat_df, "id", "lang", 10)
        per = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert per == {"en": 10, "de": 10, "fr": 10, None: 5}  # null stratum has 5 < k
        key = lambda df: sorted((r.id, r.lang) for r in df.collect())  # noqa: E731
        assert key(got) == key(self._naive(spark, strat_df, 10))

    def test_escalation_path_is_exact(self, spark, strat_df):
        """candidate_factor=0 zeroes the prefilter so EVERY stratum takes
        the escalation branch — output must be identical anyway."""
        from cassandra_diff_spark.operators.curate import sample_exact_k

        key = lambda df: sorted((r.id, r.lang) for r in df.collect())  # noqa: E731
        assert key(
            sample_exact_k(strat_df, "id", "lang", 7, candidate_factor=0)
        ) == key(sample_exact_k(strat_df, "id", "lang", 7))

    def test_seed_changes_selection_deterministically(self, spark, strat_df):
        from cassandra_diff_spark.operators.curate import sample_exact_k

        key = lambda df: sorted((r.id, r.lang) for r in df.collect())  # noqa: E731
        a1 = key(sample_exact_k(strat_df, "id", "lang", 10, seed=1))
        a2 = key(sample_exact_k(strat_df, "id", "lang", 10, seed=1))
        b = key(sample_exact_k(strat_df, "id", "lang", 10, seed=2))
        assert a1 == a2 and a1 != b

    def test_null_id_dropped_and_k_validated(self, spark):
        from cassandra_diff_spark.operators.curate import sample_exact_k

        df = spark.createDataFrame(
            [(None, "en"), (1, "en")], "id long, lang string"
        )
        assert sample_exact_k(df, "id", "lang", 5).count() == 1
        with pytest.raises(ValueError):
            sample_exact_k(df, "id", "lang", 0)


class TestSampleExactKPlan:
    def test_rates_join_is_broadcast(self, spark):
        """The per-stratum rate table joins in as a BROADCAST (it is
        |strata| rows); the corpus side must not shuffle for the
        prefilter."""
        from cassandra_diff_spark.operators.curate import sample_exact_k

        df = spark.createDataFrame(
            [(i, ["a", "b"][i % 2]) for i in range(100)], "id long, lang string"
        )
        plan = sample_exact_k(df, "id", "lang", 5)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestStripBoilerplate:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        footer = "(c) example corp - all rights reserved"
        rows = [
            (1, f"alpha body one\n\n{footer}"),
            (2, f"beta body two\n{footer}\nextra beta"),
            (3, f"gamma body three\n{footer}"),
            (4, footer),                       # becomes empty
            (5, "unique only here"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_frequent_lines_dropped_order_kept(self, spark, docs):
        from cassandra_diff_spark.operators.curate import strip_boilerplate_lines

        out = {
            r.doc_id: r
            for r in strip_boilerplate_lines(
                docs, "doc_id", "text", min_df=3
            ).collect()
        }
        assert out[1].text == "alpha body one\n"   # blank line preserved
        assert out[1].n_lines == 3 and out[1].n_dropped == 1
        assert out[2].text == "beta body two\nextra beta"
        assert out[4].text == "" and out[4].n_dropped == 1
        assert out[5].text == "unique only here" and out[5].n_dropped == 0

    def test_min_df_threshold_and_normalized_match(self, spark):
        from cassandra_diff_spark.operators.curate import strip_boilerplate_lines

        rows = [
            (1, "Cookie  Notice\nbody a"),
            (2, "cookie notice\nbody b"),   # same fingerprint (case/ws)
            (3, "body c"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r.text
            for r in strip_boilerplate_lines(
                df, "doc_id", "text", min_df=2
            ).collect()
        }
        assert out[1] == "body a" and out[2] == "body b"
        # min_df=3: nothing frequent enough
        out3 = {
            r.doc_id: r.n_dropped
            for r in strip_boilerplate_lines(
                df, "doc_id", "text", min_df=3
            ).collect()
        }
        assert all(v == 0 for v in out3.values())


class TestSampleWeighted:
    """curate.sample_weighted — Efraimidis-Spirakis weighted sampling
    without replacement, certified prefilter + heavy-skew escalation."""

    @pytest.fixture(scope="class")
    def wdf(self, spark):
        rows = [(i, ["en", "de"][i % 2], float(1 + i % 7)) for i in range(200)]
        rows += [(500, "en", None), (501, "en", 0.0), (502, "en", -3.0)]
        rows += [(600 + i, None, 2.0) for i in range(4)]  # null stratum
        return spark.createDataFrame(rows, "id long, lang string, w double")

    def _naive(self, df, k, seed=0):
        """The full-sort window formulation — the semantics oracle."""
        from pyspark.sql import Window

        from cassandra_diff_spark.functions.text import md5_hash64

        h = md5_hash64(F.concat(F.col("id").cast("string"), F.lit(f":{seed}")))
        u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
        key = -F.log(u) / F.col("w").cast("double")
        win = Window.partitionBy("lang").orderBy(key.asc(), F.col("id").asc())
        return (
            df.filter(F.col("id").isNotNull())
            .filter(F.col("w").isNotNull() & (F.col("w") > 0))
            .withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    @staticmethod
    def _key(df):
        return sorted((r.id, r.lang) for r in df.collect())

    def test_equals_naive_window_formulation(self, spark, wdf):
        from cassandra_diff_spark.operators.curate import sample_weighted

        got = sample_weighted(wdf, "id", "lang", "w", 15)
        assert self._key(got) == self._key(self._naive(wdf, 15))
        per = {
            r.lang: r.n
            for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert per == {"en": 15, "de": 15, None: 4}  # null stratum has 4 < k

    def test_heavy_skew_forces_escalation_and_stays_exact(self, spark):
        """One row carries ~all the weight: t = 4k/W starves the light
        rows, certification fails, the stratum escalates — and the output
        still equals the naive formulation."""
        from cassandra_diff_spark.operators.curate import sample_weighted

        rows = [(0, "a", 1.0e9)] + [(i, "a", 1.0) for i in range(1, 60)]
        df = spark.createDataFrame(rows, "id long, lang string, w double")
        got = sample_weighted(df, "id", "lang", "w", 5, candidate_factor=1)
        assert self._key(got) == self._key(self._naive(df, 5))
        # the mega-weight row is (essentially) always drawn
        assert 0 in {r.id for r in got.collect()}

    def test_zero_factor_escalates_everything(self, spark, wdf):
        from cassandra_diff_spark.operators.curate import sample_weighted

        assert self._key(
            sample_weighted(wdf, "id", "lang", "w", 9, candidate_factor=0)
        ) == self._key(sample_weighted(wdf, "id", "lang", "w", 9))

    def test_weight_bias_is_real(self, spark):
        """10x-weight rows should win far more than 1x rows (sanity on
        the proportional-inclusion semantics, not a statistical test of
        the engine): expected heavy share ~10/11, binomial sd ~3."""
        from cassandra_diff_spark.operators.curate import sample_weighted

        rows = [(i, "a", 10.0 if i % 2 == 0 else 1.0) for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, lang string, w double")
        got = sample_weighted(df, "id", "lang", "w", 100)
        heavy = sum(1 for r in got.collect() if r.id % 2 == 0)
        assert heavy >= 75

    def test_partitioning_invariance(self, spark, wdf):
        from cassandra_diff_spark.operators.curate import sample_weighted

        a = self._key(sample_weighted(wdf.repartition(13), "id", "lang", "w", 8))
        b = self._key(sample_weighted(wdf.coalesce(1), "id", "lang", "w", 8))
        assert a == b

    def test_k_validated(self, spark, wdf):
        from cassandra_diff_spark.operators.curate import sample_weighted

        with pytest.raises(ValueError):
            sample_weighted(wdf, "id", "lang", "w", 0)


class TestAssignSplit:
    """curate.assign_split — deterministic hash train/val/test split."""

    def test_partition_of_rows_and_rough_fractions(self, spark):
        from cassandra_diff_spark.operators.curate import assign_split

        df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
        out = assign_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
        per = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(per.values()) == 5000 and set(per) == {"train", "val", "test"}
        assert 3800 <= per["train"] <= 4200  # ~4000, hash-uniform
        assert 350 <= per["val"] <= 650 and 350 <= per["test"] <= 650

    def test_stability_under_growth_and_layout(self, spark):
        """The defining property: adding rows or repartitioning never
        moves an existing id across a split boundary."""
        from cassandra_diff_spark.operators.curate import assign_split

        small = spark.createDataFrame([(i,) for i in range(300)], "id long")
        big = spark.createDataFrame([(i,) for i in range(900)], "id long").repartition(7)
        splits = {"train": 0.9, "test": 0.1}
        a = {r.id: r.split for r in assign_split(small, "id", splits).collect()}
        b = {r.id: r.split for r in assign_split(big, "id", splits).collect()}
        assert all(b[i] == a[i] for i in a)

    def test_seed_changes_assignment(self, spark):
        from cassandra_diff_spark.operators.curate import assign_split

        df = spark.createDataFrame([(i,) for i in range(400)], "id long")
        splits = {"a": 0.5, "b": 0.5}
        x = {r.id: r.split for r in assign_split(df, "id", splits, seed=1).collect()}
        y = {r.id: r.split for r in assign_split(df, "id", splits, seed=2).collect()}
        assert any(x[i] != y[i] for i in x)

    def test_map_only_plan(self, spark):
        from cassandra_diff_spark.operators.curate import assign_split

        df = spark.createDataFrame([(i,) for i in range(10)], "id long")
        plan = (
            assign_split(df, "id", {"a": 0.5, "b": 0.5})
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_validation(self, spark):
        from cassandra_diff_spark.operators.curate import assign_split

        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="at least 2"):
            assign_split(df, "id", {"all": 1.0})
        with pytest.raises(ValueError, match="sum to 1"):
            assign_split(df, "id", {"a": 0.5, "b": 0.6})
        with pytest.raises(ValueError, match="positive"):
            assign_split(df, "id", {"a": 1.5, "b": -0.5})


class TestMixToTarget:
    def _corpus(self, spark, sizes):
        rows = []
        i = 0
        for dom, n in sizes.items():
            for _ in range(n):
                rows.append((i, dom))
                i += 1
        return spark.createDataFrame(rows, "id long, dom string")

    def test_plan_scarcest_domain_limits(self, spark):
        from cassandra_diff_spark.operators.curate import mix_plan

        df = self._corpus(spark, {"web": 1000, "code": 100, "books": 40})
        # 70/20/10 mixture: books supports 40*10/1 = 400 total at most
        total, rates = mix_plan(df, "dom", {"web": 7, "code": 2, "books": 1})
        assert total == 400
        # books must be kept wholesale (rate 1e6); web 28%, code 80%
        assert rates["books"] == 1_000_000
        assert rates["web"] == 280_000
        assert rates["code"] == 800_000

    def test_plan_max_total_cap(self, spark):
        from cassandra_diff_spark.operators.curate import mix_plan

        df = self._corpus(spark, {"web": 1000, "code": 100, "books": 40})
        total, rates = mix_plan(
            df, "dom", {"web": 7, "code": 2, "books": 1}, max_total=100
        )
        assert total == 100
        assert rates == {"web": 70_000, "code": 200_000, "books": 250_000}

    def test_unrealizable_raises(self, spark):
        from cassandra_diff_spark.operators.curate import mix_plan

        df = self._corpus(spark, {"web": 10})
        with pytest.raises(ValueError, match="zero rows"):
            mix_plan(df, "dom", {"web": 1, "nosuch": 1})
        with pytest.raises(ValueError, match="positive"):
            mix_plan(df, "dom", {"web": 0})

    def test_sample_achieves_mixture(self, spark):
        from cassandra_diff_spark.operators.curate import mix_to_target

        df = self._corpus(spark, {"web": 4000, "code": 800, "books": 250})
        out = mix_to_target(df, "id", "dom", {"web": 7, "code": 2, "books": 1})
        got = {r.dom: r.n for r in out.groupBy("dom").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        # off-target domains dropped entirely; hash sampling is
        # binomial around the expected counts — allow 25% slack
        assert set(got) == {"web", "code", "books"}
        total = sum(got.values())
        for dom, frac in [("web", 0.7), ("code", 0.2), ("books", 0.1)]:
            assert abs(got[dom] / total - frac) < 0.25 * frac + 0.02

    def test_map_only_plan(self, spark):
        from cassandra_diff_spark.operators.curate import mix_to_target

        df = self._corpus(spark, {"web": 100, "code": 50})
        out = mix_to_target(df, "id", "dom", {"web": 1, "code": 1})
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestNoveltyScores:
    def test_known_fractions(self, spark):
        from cassandra_diff_spark.operators.curate import novelty_scores

        # doc 1: shingles {p q r, q r s}; "p q r" shared with doc 2
        # doc 2: {p q r, q r z, r z z2, z z2 z3} -> 3 of 4 unique
        # doc 3: fully unique; doc 4: short doc -> one whole-text shingle
        df = spark.createDataFrame(
            [
                (1, "p q r s"),
                (2, "p q r z z2 z3"),
                (3, "alpha beta gamma delta"),
                (4, "hi there"),
            ],
            "doc_id long, text string",
        )
        got = {
            r.id: (r.n_grams, r.n_unique, r.novelty_milli)
            for r in novelty_scores(df, "doc_id", "text", n=3).collect()
        }
        assert got == {
            1: (2, 1, 500),
            2: (4, 3, 750),
            3: (2, 2, 1000),
            4: (1, 1, 1000),
        }

    def test_verbatim_copy_scores_zero(self, spark):
        from cassandra_diff_spark.operators.curate import novelty_scores

        text = "one two three four five six seven"
        df = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id long, text string"
        )
        rows = novelty_scores(df, "doc_id", "text", n=3).collect()
        assert len(rows) == 2
        assert all(r.n_unique == 0 and r.novelty_milli == 0 for r in rows)

    def test_repeated_shingle_within_doc_counts_once(self, spark):
        from cassandra_diff_spark.operators.curate import novelty_scores

        # "a b c" occurs twice inside doc 1 but nowhere else: the
        # distinct shingle set makes it corpus-unique (df == 1)
        df = spark.createDataFrame(
            [(1, "a b c a b c"), (2, "x y z w")], "doc_id long, text string"
        )
        got = {r.id: r for r in novelty_scores(df, "doc_id", "text", n=3).collect()}
        r1 = got[1]
        # distinct shingles of "a b c a b c": {a b c, b c a, c a b}
        assert r1.n_grams == 3 and r1.n_unique == 3 and r1.novelty_milli == 1000


class TestHardNegatives:
    def _frames(self, spark):
        # 1-d direction encoded in 2-d so cosine ordering is explicit:
        # corpus 10..14 at increasing angles from query 0's direction
        import math

        rows = [(0, [1.0, 0.0])]
        for i, deg in enumerate([5, 10, 15, 20, 25]):
            a = math.radians(deg)
            rows.append((10 + i, [math.cos(a), math.sin(a)]))
        embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        return embs, embs.filter(F.col("vec_id") == 0)

    def test_excludes_dups_and_reranks_densely(self, spark):
        from cassandra_diff_spark.operators.similarity import hard_negatives

        embs, q = self._frames(spark)
        # nearest (10) and third-nearest (12) are known duplicates,
        # one given in each orientation
        dup = spark.createDataFrame(
            [(0, 10), (12, 0)], "id_1 long, id_2 long"
        )
        got = [
            (r.neighbor_id, r.rank)
            for r in hard_negatives(
                embs, q, "vec_id", "embedding", dup, k=3, candidate_k=5
            )
            .orderBy("rank")
            .collect()
        ]
        assert got == [(11, 1), (13, 2), (14, 3)]

    def test_exhausted_candidates_yield_fewer_rows(self, spark):
        from cassandra_diff_spark.operators.similarity import hard_negatives

        embs, q = self._frames(spark)
        # candidate_k=2 and both candidates are dups -> nothing survives
        dup = spark.createDataFrame([(0, 10), (0, 11)], "id_1 long, id_2 long")
        out = hard_negatives(
            embs, q, "vec_id", "embedding", dup, k=3, candidate_k=2
        )
        assert out.count() == 0

    def test_no_dups_matches_brute_force(self, spark):
        from cassandra_diff_spark.operators.similarity import (
            brute_force_topk,
            hard_negatives,
        )

        embs, q = self._frames(spark)
        empty = spark.createDataFrame([], "id_1 long, id_2 long")
        a = sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in hard_negatives(
                embs, q, "vec_id", "embedding", empty, k=3, candidate_k=5
            ).collect()
        )
        b = sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in brute_force_topk(embs, q, "vec_id", "embedding", k=3).collect()
        )
        assert a == b


class TestAssignSplitGrouped:
    def _splits(self):
        return {"train": 0.6, "val": 0.2, "test": 0.2}

    def test_cluster_members_share_split(self, spark):
        from cassandra_diff_spark.operators.curate import (
            assign_split,
            assign_split_grouped,
        )

        df = spark.createDataFrame(
            [(i, f"d{i}") for i in range(1, 9)], "doc_id long, text string"
        )
        # chain 1-2, 2-3 (one component) and pair 5-7; 4, 6, 8 singletons
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 7)], "id_1 long, id_2 long"
        )
        got = {
            r.doc_id: r.split
            for r in assign_split_grouped(
                df, "doc_id", pairs, self._splits(), seed=3
            ).collect()
        }
        assert got[1] == got[2] == got[3]
        assert got[5] == got[7]
        # the shared split is the one the min-id label hashes to, and
        # singletons match plain assign_split exactly
        ref = {
            r.doc_id: r.split
            for r in assign_split(df, "doc_id", self._splits(), seed=3).collect()
        }
        assert got[1] == ref[1] and got[5] == ref[5]
        for s in (4, 6, 8):
            assert got[s] == ref[s]

    def test_growth_never_moves_existing_rows(self, spark):
        from cassandra_diff_spark.operators.curate import assign_split_grouped

        pairs = spark.createDataFrame([(1, 2)], "id_1 long, id_2 long")
        small = spark.createDataFrame(
            [(i, "t") for i in range(1, 5)], "doc_id long, text string"
        )
        big = spark.createDataFrame(
            [(i, "t") for i in range(1, 50)], "doc_id long, text string"
        )
        a = {
            r.doc_id: r.split
            for r in assign_split_grouped(
                small, "doc_id", pairs, self._splits(), seed=9
            ).collect()
        }
        b = {
            r.doc_id: r.split
            for r in assign_split_grouped(
                big, "doc_id", pairs, self._splits(), seed=9
            ).collect()
        }
        assert all(b[k] == v for k, v in a.items())

    def test_no_pairs_equals_plain_assign_split(self, spark):
        from cassandra_diff_spark.operators.curate import (
            assign_split,
            assign_split_grouped,
        )

        df = spark.createDataFrame(
            [(i, "t") for i in range(100)], "doc_id long, text string"
        )
        empty = spark.createDataFrame([], "id_1 long, id_2 long")
        a = sorted(
            (r.doc_id, r.split)
            for r in assign_split_grouped(
                df, "doc_id", empty, self._splits(), seed=1
            ).collect()
        )
        b = sorted(
            (r.doc_id, r.split)
            for r in assign_split(df, "doc_id", self._splits(), seed=1).collect()
        )
        assert a == b


class TestNoveltyIncremental:
    def test_one_shot_parity(self, spark, sf_dir):
        from cassandra_diff_spark.operators.curate import (
            novelty_scores,
            novelty_scores_incremental,
        )
        from cassandra_diff_spark.operators.dedup import shingle_set

        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        corpus = d.filter(F.col("doc_id") % 3 != 0)
        batch = d.filter(F.col("doc_id") % 3 == 0)
        idx = shingle_set(corpus, "doc_id", "text", n=3, distinct=True)
        inc = sorted(
            tuple(r) for r in novelty_scores_incremental(
                batch, idx, "doc_id", "text", n=3
            ).collect()
        )
        batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
        one = sorted(
            tuple(r)
            for r in novelty_scores(d, "doc_id", "text", n=3).collect()
            if r.id in batch_ids
        )
        assert inc == one

    def test_batch_internal_repeats_are_not_novel(self, spark):
        from cassandra_diff_spark.operators.curate import (
            novelty_scores_incremental,
        )
        from cassandra_diff_spark.operators.dedup import shingle_set

        corpus = spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "doc_id long, text string"
        )
        idx = shingle_set(corpus, "doc_id", "text", n=3, distinct=True)
        # 10 and 11 repeat each other; 12 overlaps the CORPUS; 13 is new
        batch = spark.createDataFrame(
            [
                (10, "one two three four"),
                (11, "one two three four"),
                (12, "alpha beta gamma delta"),
                (13, "totally fresh shingle material"),
            ],
            "doc_id long, text string",
        )
        got = {
            r.id: r.novelty_milli
            for r in novelty_scores_incremental(
                batch, idx, "doc_id", "text", n=3
            ).collect()
        }
        assert got == {10: 0, 11: 0, 12: 0, 13: 1000}


class TestGopherFlags:
    def _flags(self, spark, rows, **kw):
        from cassandra_diff_spark.operators.curate import gopher_quality_flags

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r.id: r
            for r in gopher_quality_flags(df, "doc_id", "text", **kw).collect()
        }

    def test_good_document_passes(self, spark):
        text = ("the quick brown fox jumps over the lazy dog and then " * 6)
        got = self._flags(spark, [(1, text)], min_words=50)
        r = got[1]
        assert r.passes and r.n_words >= 50
        assert 3000 <= r.mean_word_len_milli <= 10000
        assert r.alpha_word_milli == 1000

    def test_each_rule_rejects(self, spark):
        base = "the quick brown fox jumps over a lazy dog today " * 10
        rows = [
            (1, "too short"),                                   # n_words
            (2, "#" * 40 + " " + base),                         # symbols
            (3, "\n".join("- bullet line here" for _ in range(20))
                + "\n" + base),                                 # bullets
            (4, "\n".join("trailing line..." for _ in range(20))
                + "\n" + base),                                 # ellipsis
            (5, " ".join("123456" for _ in range(100))),        # no alpha
            (6, base),                                          # control
        ]
        got = self._flags(spark, rows, max_bullet_line_milli=500,
                          max_ellipsis_line_milli=500)
        assert not got[1].passes
        assert not got[2].passes and got[2].symbol_word_milli > 100
        assert not got[3].passes and got[3].bullet_line_milli > 500
        assert not got[4].passes and got[4].ellipsis_line_milli > 500
        assert not got[5].passes and got[5].alpha_word_milli == 0
        assert got[6].passes

    def test_mean_word_length_bounds(self, spark):
        # single-char words -> mean 1000 milli, below the 3000 floor
        short = " ".join("a" for _ in range(100))
        long = " ".join("abcdefghijklmnop" for _ in range(100))
        got = self._flags(spark, [(1, short), (2, long)])
        assert got[1].mean_word_len_milli == 1000 and not got[1].passes
        assert got[2].mean_word_len_milli == 16000 and not got[2].passes

    def test_null_text_fails_closed(self, spark):
        got = self._flags(spark, [(1, None)])
        assert got[1].passes is False

    def test_map_only_plan(self, spark):
        from cassandra_diff_spark.operators.curate import gopher_quality_flags

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = (
            gopher_quality_flags(df, "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


class TestDuplicateUnitStats:
    def test_hand_computed_lines(self, spark):
        from cassandra_diff_spark.operators.curate import duplicate_unit_stats

        # doc 1: 4 lines, "aa" twice (4 chars dup of 10 total)
        # doc 2: all unique; doc 3: blank/whitespace lines excluded
        df = spark.createDataFrame(
            [
                (1, "aa\nbbb\naa\nccc"),
                (2, "x\ny"),
                (3, "only\n\n   \nline"),
            ],
            "doc_id long, text string",
        )
        got = {
            r.id: r
            for r in duplicate_unit_stats(df, "doc_id", "text").collect()
        }
        r1 = got[1]
        assert r1.n_units == 4 and r1.dup_unit_milli == 250
        assert r1.dup_char_milli == (1000 * 4) // 10
        assert got[2].dup_unit_milli == 0 and got[2].dup_char_milli == 0
        assert got[3].n_units == 2 and got[3].dup_unit_milli == 0

    def test_paragraph_separator(self, spark):
        from cassandra_diff_spark.operators.curate import duplicate_unit_stats

        df = spark.createDataFrame(
            [(1, "para one\n\npara two\n\npara one")],
            "doc_id long, text string",
        )
        r = duplicate_unit_stats(df, "doc_id", "text", sep="\n\n").collect()[0]
        assert r.n_units == 3 and r.dup_unit_milli == 333

    def test_no_units_doc_absent(self, spark):
        from cassandra_diff_spark.operators.curate import duplicate_unit_stats

        df = spark.createDataFrame(
            [(1, "   \n  \n"), (2, "real line")], "doc_id long, text string"
        )
        got = {r.id for r in duplicate_unit_stats(df, "doc_id", "text").collect()}
        assert got == {2}


class TestDuplicateNgramStats:
    def test_looping_phrase_detected(self, spark):
        from cassandra_diff_spark.operators.curate import duplicate_ngram_stats

        loop = ("one two three four five " * 4).strip()  # every 5-gram repeats
        fresh = "a b c d e f g h i j"  # all distinct 5-grams
        df = spark.createDataFrame(
            [(1, loop), (2, fresh)], "doc_id long, text string"
        )
        got = {
            r.id: r
            for r in duplicate_ngram_stats(df, "doc_id", "text", n=5).collect()
        }
        assert got[1].dup_char_milli == 1000  # ALL 5-gram mass repeats
        assert got[1].dup_ngram_milli > 500
        assert got[2].dup_ngram_milli == 0 and got[2].dup_char_milli == 0

    def test_hand_counts(self, spark):
        from cassandra_diff_spark.operators.curate import duplicate_ngram_stats

        # "x y x y x y": 2-grams = [x y, y x, x y, y x, x y]
        # counts: "x y" x3 (len 3), "y x" x2 (len 3) -> all chars dup
        df = spark.createDataFrame([(1, "x y x y x y")], "doc_id long, text string")
        r = duplicate_ngram_stats(df, "doc_id", "text", n=2).collect()[0]
        assert r.n_ngrams == 5
        assert r.dup_ngram_milli == (1000 * 3) // 5
        assert r.dup_char_milli == 1000

    def test_short_doc_whole_text_shingle(self, spark):
        from cassandra_diff_spark.operators.curate import duplicate_ngram_stats

        df = spark.createDataFrame([(1, "hi there")], "doc_id long, text string")
        r = duplicate_ngram_stats(df, "doc_id", "text", n=5).collect()[0]
        assert r.n_ngrams == 1 and r.dup_ngram_milli == 0


class TestExactDedupIncremental:
    def test_one_shot_parity_and_survivor_takeover(self, spark):
        from cassandra_diff_spark.operators.dedup import (
            exact_dedup,
            exact_dedup_incremental,
        )

        corpus = spark.createDataFrame(
            [(10, "same text"), (11, "corpus only"), (12, "shared later")],
            "doc_id long, text string",
        )
        # batch: 5 beats corpus id 10 (takeover); 99 loses to 12;
        # 50+51 duplicate each other batch-internally; 60 is new
        batch = spark.createDataFrame(
            [
                (5, "same text"),
                (99, "shared later"),
                (50, "batch dup"),
                (51, "batch dup"),
                (60, "fresh"),
            ],
            "doc_id long, text string",
        )
        idx = exact_dedup(corpus, "doc_id", "text")
        inc = sorted(
            map(tuple, exact_dedup_incremental(
                batch, idx, "doc_id", "text"
            ).collect())
        )
        once = sorted(
            map(tuple, exact_dedup(
                corpus.unionByName(batch), "doc_id", "text"
            ).collect())
        )
        assert inc == once
        by_keep = {r[1]: r[2] for r in inc}
        assert by_keep[5] == 2     # takeover: batch id 5 < corpus id 10
        assert by_keep[12] == 2    # corpus survivor retained
        assert by_keep[50] == 2    # batch-internal dup pair
        assert by_keep[60] == 1

    def test_chained_folds_equal_one_shot(self, spark):
        from cassandra_diff_spark.operators.dedup import (
            exact_dedup,
            exact_dedup_incremental,
        )

        d = spark.createDataFrame(
            [(i, f"t{i % 4}") for i in range(12)], "doc_id long, text string"
        )
        idx = exact_dedup(d.filter(F.col("doc_id") < 4), "doc_id", "text")
        idx = exact_dedup_incremental(
            d.filter((F.col("doc_id") >= 4) & (F.col("doc_id") < 8)),
            idx, "doc_id", "text",
        )
        idx = exact_dedup_incremental(
            d.filter(F.col("doc_id") >= 8), idx, "doc_id", "text"
        )
        assert sorted(map(tuple, idx.collect())) == sorted(
            map(tuple, exact_dedup(d, "doc_id", "text").collect())
        )


class TestMojibake:
    def test_marker_counting(self, spark):
        from cassandra_diff_spark.functions.text import mojibake_marks

        rows = [
            (1, "perfectly clean ascii"),
            (2, "Ã© double-decoded e-acute"),         # 1 single
            (3, "â€œsmart quotesâ€ gone wrong"),       # 2 pairs
            (4, "lost � char and Â nbsp"),            # 2 singles
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {
            r.id: r.m
            for r in df.select(
                "id", mojibake_marks(F.col("text")).alias("m")
            ).collect()
        }
        assert got == {1: 0, 2: 1, 3: 2, 4: 2}

    def test_null_text_null_marks(self, spark):
        from cassandra_diff_spark.functions.text import mojibake_marks

        df = spark.createDataFrame([(1, None)], "id long, text string")
        assert df.select(mojibake_marks(F.col("text")).alias("m")).collect()[
            0
        ].m is None


def test_dedup_clusters_null_ids_both_paths(spark):
    """A NULL id never joins in the distributed path (null keys match
    nothing) — the driver-side union-find must mirror that instead of
    crashing on None comparison."""
    from cassandra_diff_spark.operators import dedup

    rows = [(1, 2), (None, 3), (4, None)]
    pairs = spark.createDataFrame(rows, "id_1 long, id_2 long")
    fast = {
        r.id: r.cluster_id for r in dedup.dedup_clusters(pairs).collect()
    }
    slow = {
        r.id: r.cluster_id
        for r in dedup.dedup_clusters(pairs, driver_edge_cap=0).collect()
    }
    assert fast == slow
    assert fast[1] == fast[2] == 1      # the real edge clusters
    assert fast[3] == 3 and fast[4] == 4  # null partners stay isolated
    assert fast[None] is None


def test_clean_corpus_nfc_merges_decomposed_duplicates(spark):
    """With nfc=True, a decomposed spelling of a kept document dedups
    into the composed copy's fingerprint group; without it they both
    survive as distinct documents."""
    from cassandra_diff_spark.operators.curate import clean_corpus

    composed = "the café of the and to in is a good café."
    decomposed = composed.replace("é", "é")
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed)], "doc_id long, text string"
    )
    plain = clean_corpus(df, "doc_id", "text", min_quality_milli=0)
    assert {r.id for r in plain.collect()} == {1, 2}
    merged = clean_corpus(df, "doc_id", "text", min_quality_milli=0, nfc=True)
    assert {r.id for r in merged.collect()} == {1}


class TestPrefixJaccard:
    """prefix_jaccard_pairs is LOSSLESS by the prefix-filtering theorem:
    its pair set must equal the full inverted-index join's at the same
    threshold — on hand-built fixtures and on the shingle corpus vs
    ngram_jaccard_pairs with the df cap disabled."""

    def test_word_sets_hand_case(self, spark):
        from cassandra_diff_spark.operators.dedup import prefix_jaccard_pairs

        rows = [
            (1, "a b c d e"),
            (2, "a b c d f"),   # jaccard 4/6 with doc 1
            (3, "x y z"),       # disjoint
            (4, "a b c d e"),   # exact dup of 1 -> jaccard 1
            (5, None),
            (6, "   "),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.id_1, r.id_2): (r.intersect_n, r.union_n, r.jaccard_ppm)
            for r in prefix_jaccard_pairs(
                df, "doc_id", "text", threshold_num=3, threshold_den=5
            ).collect()
        }
        assert got == {
            (1, 2): (4, 6, 666_666),
            (1, 4): (5, 5, 1_000_000),
            (2, 4): (4, 6, 666_666),
        }

    def test_shingle_mode_matches_uncapped_inverted_index(self, spark):
        from cassandra_diff_spark.operators import dedup

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(200)
        via_prefix = {
            (r.id_1, r.id_2): (r.intersect_n, r.union_n)
            for r in dedup.prefix_jaccard_pairs(
                docs, "doc_id", "text",
                threshold_num=4, threshold_den=5, shingle_n=3,
            ).collect()
        }
        via_index = {
            (r.id_1, r.id_2): (r.intersect_n, r.union_n)
            for r in dedup.ngram_jaccard_pairs(
                docs, "doc_id", "text", n=3,
                threshold_num=4, threshold_den=5, df_limit=None,
            ).collect()
        }
        assert via_prefix == via_index and via_prefix

    def test_threshold_validation(self, spark):
        import pytest as _pytest

        from cassandra_diff_spark.operators.dedup import prefix_jaccard_pairs

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="threshold"):
            prefix_jaccard_pairs(df, "doc_id", "text", threshold_num=0)
        with _pytest.raises(ValueError, match="threshold"):
            prefix_jaccard_pairs(
                df, "doc_id", "text", threshold_num=6, threshold_den=5
            )

    def test_ppjoin_filters_prune_candidates_losslessly(self, spark):
        """The r9 PPJoin cuts fire in CANDIDATE generation — before the
        array-carrying verification join — and never drop a true pair.
        Length filter: a 2-token and a 12-token doc can share a rare
        prefix token, but J >= 1/2 needs min >= max/2, so the pair must
        not even become a candidate. Positional filter: two 8-token
        docs whose only shared token sits at opposite prefix ends bound
        the overlap below alpha, again pruned pre-verification."""
        from cassandra_diff_spark.operators.dedup import (
            prefix_jaccard_candidates,
            prefix_jaccard_pairs,
        )

        # dfs: fillers c..m df=4 > qq df=3 > a df=2 > x df=1, so doc 2
        # sorts qq FIRST (inside its 7-token prefix) and doc 1 sorts
        # [a, qq] (prefix = whole doc): the (1,2) prefix collision on
        # qq is real, and ONLY the length filter removes it
        rows = [
            (1, "qq a"),                                  # 2 tokens
            (2, "qq c d e f g h i j k l m"),              # 12 tokens
            (3, "c d e f g h i j k l m n"),
            (4, "qq a x"),                                # J(1,4)=2/3
            (5, "c d e f g h i j k l m n"),
            (6, "c d e f g h i j k l m n"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        docs, cand = prefix_jaccard_candidates(
            df, "doc_id", "text", threshold_num=1, threshold_den=2
        )
        got_cand = {(r.id_1, r.id_2) for r in cand.collect()}
        # (1, 2) shares `qq` in both prefixes but 2*2 < 1*12: pruned
        assert (1, 2) not in got_cand
        # the legitimate pair survives candidates AND verification
        assert (1, 4) in got_cand
        pairs = {
            (r.id_1, r.id_2)
            for r in prefix_jaccard_pairs(
                df, "doc_id", "text", threshold_num=1, threshold_den=2
            ).collect()
        }
        assert (1, 4) in pairs and (1, 2) not in pairs

    def test_ppjoin_positional_filter_prunes(self, spark):
        """Positional filter alone: equal-length docs (length filter
        moot) sharing ONE token at far-apart prefix positions. n1 = n2
        = 8, t = 3/4 -> alpha = ceil(3*16/7) = 7; shared token at i=1,
        j=3 bounds overlap at min(1,3) + min(7,5) = 6 < 7 -> pruned as
        a CANDIDATE even though the raw prefix join collides."""
        from cassandra_diff_spark.operators.dedup import (
            prefix_jaccard_candidates,
        )

        # token df: `zz` unique to docs 1-2; doc 1's other tokens are
        # common (df=3 via fillers), so zz is doc 1's rarest (i=1);
        # doc 2 carries two rarer-than-zz singletons so zz lands at j=3
        rows = [
            (1, "zz a b c d e f g"),
            (2, "zz y1 y2 c d e f g"),   # shares zz,c,d,e,f,g: J=6/10<3/4
            (3, "a b c d e f g h"),
            (4, "a b c d e f g h"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        docs, cand = prefix_jaccard_candidates(
            df, "doc_id", "text", threshold_num=3, threshold_den=4
        )
        got = {(r.id_1, r.id_2) for r in cand.collect()}
        assert (1, 2) not in got
