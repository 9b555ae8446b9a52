"""Sketch + retrieval + featurization tests: HyperLogLog distinct
counting, BM25 search, feature-hashing embeddings."""

import math

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("fuzi-retrieval-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


class TestHll:
    def _keys(self, spark, keys):
        return spark.createDataFrame([(k,) for k in keys], "k string")

    def test_small_range_is_near_exact(self, spark):
        from fuzi_spark.ops.sketch import hll_estimate, hll_sketch

        df = self._keys(spark, ["a", "b", "c"])
        est = hll_estimate(hll_sketch(df, "k")).collect()[0].distinct_est
        assert abs(est - 3) < 0.5

    def test_duplicates_do_not_inflate(self, spark):
        from fuzi_spark.ops.sketch import hll_estimate, hll_sketch

        once = self._keys(spark, [f"k{i}" for i in range(50)])
        thrice = once.unionByName(once).unionByName(once)
        e1 = hll_estimate(hll_sketch(once, "k")).collect()[0].distinct_est
        e3 = hll_estimate(hll_sketch(thrice, "k")).collect()[0].distinct_est
        assert e1 == e3

    def test_error_within_3_sigma_at_1000(self, spark):
        from fuzi_spark.ops.sketch import hll_estimate, hll_sketch

        df = self._keys(spark, [f"key-{i}" for i in range(1000)])
        est = hll_estimate(hll_sketch(df, "k")).collect()[0].distinct_est
        assert abs(est - 1000) / 1000 < 3 * 1.04 / math.sqrt(256)

    def test_register_table_is_a_monoid(self, spark):
        from fuzi_spark.ops.sketch import hll_sketch

        a = self._keys(spark, [f"a{i}" for i in range(200)])
        b = self._keys(spark, [f"b{i}" for i in range(200)])
        merged = (
            hll_sketch(a, "k").unionByName(hll_sketch(b, "k"))
            .groupBy("idx").agg(F.max("rho").alias("rho"))
        )
        whole = hll_sketch(a.unionByName(b), "k")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_grouped_estimates_are_independent(self, spark):
        from fuzi_spark.ops.sketch import hll_estimate, hll_sketch

        rows = [("g1", f"x{i}") for i in range(100)] + [
            ("g2", "only-one")
        ]
        df = spark.createDataFrame(rows, "g string, k string")
        out = {
            r.g: r.distinct_est
            for r in hll_estimate(
                hll_sketch(df, "k", ["g"]), ["g"]
            ).collect()
        }
        assert abs(out["g2"] - 1) < 0.1
        assert abs(out["g1"] - 100) / 100 < 0.25


class TestBm25:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "spark spark spark engine"),          # heavy tf, short
                (2, "spark " + "filler " * 50),            # 1 hit, long
                (3, "engine room"),
                (4, "completely unrelated words here"),
            ],
            "doc_id long, text string",
        )

    def test_tf_and_length_normalization_rank(self, spark):
        from fuzi_spark.ops.bm25 import bm25_search

        rows = bm25_search(self._docs(spark), "spark", top_n=10).collect()
        ids = [r.doc_id for r in rows]
        assert ids[0] == 1            # 3x tf in a short doc wins
        assert set(ids) == {1, 2}     # only matching docs returned

    def test_n_hits_counts_distinct_terms(self, spark):
        from fuzi_spark.ops.bm25 import bm25_search

        rows = {
            r.doc_id: r.n_hits
            for r in bm25_search(
                self._docs(spark), "spark engine", top_n=10
            ).collect()
        }
        assert rows[1] == 2 and rows[3] == 1

    def test_rare_term_outscores_common(self, spark):
        from fuzi_spark.ops.bm25 import bm25_search

        docs = spark.createDataFrame(
            [(i, "common " + ("rare" if i == 0 else "x")) for i in range(20)],
            "doc_id long, text string",
        )
        rows = bm25_search(docs, "common rare", top_n=20).collect()
        assert rows[0].doc_id == 0    # idf: the rare term dominates

    def test_duplicate_query_terms_deduped(self, spark):
        from fuzi_spark.ops.bm25 import bm25_search

        a = bm25_search(self._docs(spark), "spark spark", top_n=10).collect()
        b = bm25_search(self._docs(spark), "spark", top_n=10).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_empty_query_raises(self, spark):
        from fuzi_spark.ops.bm25 import bm25_search

        with pytest.raises(ValueError):
            bm25_search(self._docs(spark), "   ")


class TestHashEmbed:
    def test_deterministic_and_normalized(self, spark):
        from fuzi_spark.ops.hashembed import hash_embed

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in hash_embed(docs, dims=32).collect()}
        assert list(rows[1].embedding) == list(rows[2].embedding)
        assert abs(
            sum(x * x for x in rows[1].embedding) - 1.0
        ) < 1e-9
        assert rows[3].norm == 0.0
        assert all(x == 0.0 for x in rows[3].embedding)

    def test_unnormalized_is_linear_in_tf(self, spark):
        from fuzi_spark.ops.hashembed import hash_embed

        docs = spark.createDataFrame(
            [(1, "alpha"), (2, "alpha alpha")], "doc_id long, text string"
        )
        rows = {
            r.doc_id: list(r.embedding)
            for r in hash_embed(docs, dims=16, normalize=False).collect()
        }
        assert rows[2] == [2 * x for x in rows[1]]
        # exactly one dimension carries the single token, value +/-1
        assert sorted(abs(x) for x in rows[1])[-1] == 1.0
        assert sum(1 for x in rows[1] if x != 0.0) == 1

    def test_case_and_whitespace_canonicalized(self, spark):
        from fuzi_spark.ops.hashembed import hash_embed

        docs = spark.createDataFrame(
            [(1, "Alpha\tBETA  gamma"), (2, "alpha beta gamma")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: list(r.embedding)
                for r in hash_embed(docs, dims=32).collect()}
        assert rows[1] == rows[2]

    def test_feeds_similarity_suite(self, spark):
        from fuzi_spark.ops.hashembed import hash_embed
        from fuzi_spark.ops.similarity import cosine_topk_bruteforce

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy cat"),
                (3, "pure linear algebra kernel benchmark suite"),
            ],
            "doc_id long, text string",
        )
        emb = hash_embed(docs, dims=64).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        top = cosine_topk_bruteforce(
            emb, emb.filter(F.col("vec_id") == 1), k=2
        ).collect()
        ranked = [r.neighbor_id for r in sorted(top, key=lambda r: r.rank)]
        assert ranked[0] == 2   # near-copy ranks first (self excluded)


class TestTextSemanticDedup:
    def test_reversed_token_twin_is_found(self, spark):
        """The integration invariant behind the text_semantic_dedup
        query: token-order permutation preserves the hashed embedding
        exactly, so LSH near-dup pairing must group a doc with its
        reversed twin even though the bytes differ."""
        from fuzi_spark.ops.hashembed import hash_embed
        from fuzi_spark.ops.similarity import embedding_near_dups

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "zeta epsilon delta gamma beta alpha"),   # reversed
                (3, "totally different content entirely here"),
            ],
            "doc_id long, text string",
        )
        emb = hash_embed(docs, dims=64)
        rows = {r.doc_id: list(r.embedding) for r in emb.collect()}
        assert rows[1] == rows[2] and rows[1] != rows[3]
        pairs = embedding_near_dups(
            emb.select("doc_id", "embedding"),
            threshold=0.999999, id_col="doc_id",
        ).collect()
        assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}


class TestMultimodalDedup:
    def test_union_of_modalities_closes_block(self, spark):
        """The multimodal_dedup invariant at fixture scale: text pairs
        (0,1)/(2,3) and image pairs (0,2)/(1,3) — neither modality
        alone groups all four docs; their edge union must."""
        from fuzi_spark.ops.dedup import dedup_components

        text_edges = spark.createDataFrame(
            [(0, 1), (2, 3)], "id_a long, id_b long"
        )
        img_edges = spark.createDataFrame(
            [(0, 2), (1, 3)], "id_a long, id_b long"
        )
        comp = {r.node_id: r.canonical_id for r in dedup_components(
            text_edges.unionByName(img_edges)
        ).collect()}
        assert comp == {0: 0, 1: 0, 2: 0, 3: 0}
        # either modality alone must NOT close the block
        partial = {r.node_id: r.canonical_id for r in dedup_components(
            text_edges
        ).collect()}
        assert partial[1] == 0 and partial[3] == 2

    def test_phash_groups_real_pngs_by_content(self, spark):
        """The image side of multimodal_dedup uses the REAL decode
        path: two ids built from the same seed must share a pHash,
        different seeds must not."""
        import numpy as np
        import pandas as pd
        from pyspark.sql.pandas.functions import pandas_udf

        from fuzi_spark.ops.multimodal import build_png
        from fuzi_spark.ops.phash import phash_df

        def png(seed):
            rng = np.random.RandomState(seed)
            base = rng.randint(0, 256, (8, 8))
            img = np.kron(base, np.ones((8, 8), dtype=np.int64)).astype(
                np.uint8
            )
            return build_png(64, 64, pixels=np.stack([img] * 3, axis=2))

        media = spark.createDataFrame(
            [("a", "image", png(7)), ("b", "image", png(7)),
             ("c", "image", png(8))],
            "media_ref string, media_type string, content binary",
        )
        got = {r.media_ref: r.phash for r in phash_df(media).collect()}
        assert got["a"] == got["b"] and got["a"] != got["c"]
