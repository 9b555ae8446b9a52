"""Relational/layout operator tests: as-of join, range join,
merge-upsert, Z-order layout, count-min sketch, int8 quantization,
hard-negative mining.

Each test pins exact expected rows from small constructed inputs —
the semantics are relational, so the expectations are enumerable."""

import math

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("fuzi-relational-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


class TestAsofJoin:
    def _tables(self, spark):
        left = spark.createDataFrame(
            [(1, 10, 5.0), (2, 10, 20.0), (3, 10, 35.0), (4, 99, 7.0)],
            "event_id long, user_id long, ts double",
        )
        right = spark.createDataFrame(
            [(10, 5.0, 100.0), (10, 20.0, 200.0), (10, 30.0, 300.0)],
            "user_id long, ts double, val double",
        )
        return left, right

    def test_backward_at_or_before(self, spark):
        from fuzi_spark.ops.relational import asof_join

        left, right = self._tables(spark)
        out = {
            r.event_id: (r.asof_val, r.asof_ts_matched)
            for r in asof_join(
                left, right, on="user_id", payload=["val"]
            ).collect()
        }
        assert out[1] == (100.0, 5.0)      # equal ts matches (inclusive)
        assert out[2] == (200.0, 20.0)
        assert out[3] == (300.0, 30.0)     # most recent, not first
        assert out[4] == (None, None)      # key with no right rows

    def test_no_earlier_row_is_null(self, spark):
        from fuzi_spark.ops.relational import asof_join

        left = spark.createDataFrame(
            [(1, 10, 1.0)], "event_id long, user_id long, ts double"
        )
        _, right = self._tables(spark)
        row = asof_join(left, right, on="user_id", payload=["val"]).collect()[0]
        assert row.asof_val is None and row.asof_ts_matched is None

    def test_forward_direction(self, spark):
        from fuzi_spark.ops.relational import asof_join

        left, right = self._tables(spark)
        out = {
            r.event_id: r.asof_val
            for r in asof_join(
                left, right, on="user_id", payload=["val"],
                direction="forward",
            ).collect()
        }
        assert out[1] == 100.0             # at-or-after, inclusive
        assert out[2] == 200.0
        assert out[3] is None              # nothing after 35
        assert out[4] is None

    def test_tolerance_nulls_far_matches(self, spark):
        from fuzi_spark.ops.relational import asof_join

        left, right = self._tables(spark)
        out = {
            r.event_id: r.asof_val
            for r in asof_join(
                left, right, on="user_id", payload=["val"], tolerance=4.0
            ).collect()
        }
        assert out[1] == 100.0             # distance 0
        assert out[3] is None              # distance 5 > 4
        # row is PRESERVED, payload nulled
        assert set(out) == {1, 2, 3, 4}

    def test_keys_do_not_leak(self, spark):
        from fuzi_spark.ops.relational import asof_join

        left = spark.createDataFrame(
            [(1, 77, 100.0)], "event_id long, user_id long, ts double"
        )
        _, right = self._tables(spark)   # all right rows are user 10
        assert (
            asof_join(left, right, on="user_id", payload=["val"])
            .collect()[0].asof_val is None
        )

    def test_bad_direction_raises(self, spark):
        from fuzi_spark.ops.relational import asof_join

        left, right = self._tables(spark)
        with pytest.raises(ValueError):
            asof_join(left, right, on="user_id", direction="nearest")


class TestRangeJoin:
    def _tables(self, spark):
        pts = spark.createDataFrame(
            [(1, 5.0), (2, 10.0), (3, 25.0), (4, 30.0), (5, 100.0)],
            "pid long, x double",
        )
        ivs = spark.createDataFrame(
            [(100, 5.0, 10.0), (200, 8.0, 26.0), (300, 90.0, 95.0)],
            "iv_id long, lo double, hi double",
        )
        return pts, ivs

    def test_pairs_match_bruteforce(self, spark):
        from fuzi_spark.ops.relational import range_join

        pts, ivs = self._tables(spark)
        got = {
            (r.pid, r.iv_id)
            for r in range_join(pts, ivs, "x", "lo", "hi", 4.0).collect()
        }
        # brute force: 5 in [5,10] and NOT [8,26]; 10 in both; 25 in
        # [8,26]; 30 nowhere; 100 nowhere
        assert got == {(1, 100), (2, 100), (2, 200), (3, 200)}

    def test_boundaries_inclusive_and_no_dups(self, spark):
        from fuzi_spark.ops.relational import range_join

        pts, ivs = self._tables(spark)
        rows = range_join(pts, ivs, "x", "lo", "hi", 1.0).collect()
        keys = [(r.pid, r.iv_id) for r in rows]
        assert len(keys) == len(set(keys))     # wide interval, tiny bins
        assert (1, 100) in keys and (2, 100) in keys  # x==lo and x==hi

    def test_fanout_guard_raises(self, spark):
        from fuzi_spark.ops.relational import range_join

        pts, ivs = self._tables(spark)
        with pytest.raises(ValueError, match="fan-out"):
            range_join(
                pts, ivs, "x", "lo", "hi", 0.001,
                max_bins_per_interval=100,
            )

    def test_bad_width_raises(self, spark):
        from fuzi_spark.ops.relational import range_join

        pts, ivs = self._tables(spark)
        with pytest.raises(ValueError):
            range_join(pts, ivs, "x", "lo", "hi", 0.0)


class TestMergeUpsert:
    def _base(self, spark):
        return spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1), (3, "c", 1)],
            "k long, payload string, version long",
        )

    def test_latest_wins_delete_insert(self, spark):
        from fuzi_spark.ops.relational import merge_upsert

        base = self._base(spark)
        upd = spark.createDataFrame(
            [
                (1, "a2", 2, False),   # update
                (2, "gone", 2, True),  # delete
                (9, "new", 2, False),  # insert
            ],
            "k long, payload string, version long, del boolean",
        )
        got = {
            r.k: (r.payload, r.version)
            for r in merge_upsert(base, upd, "k", "version", "del").collect()
        }
        assert got == {1: ("a2", 2), 3: ("c", 1), 9: ("new", 2)}

    def test_version_tie_update_wins(self, spark):
        from fuzi_spark.ops.relational import merge_upsert

        base = self._base(spark)
        upd = spark.createDataFrame(
            [(1, "a-tie", 1, False)],
            "k long, payload string, version long, del boolean",
        )
        got = {
            r.k: r.payload
            for r in merge_upsert(base, upd, "k", "version", "del").collect()
        }
        assert got[1] == "a-tie"

    def test_stale_update_loses(self, spark):
        from fuzi_spark.ops.relational import merge_upsert

        base = spark.createDataFrame(
            [(1, "fresh", 5)], "k long, payload string, version long"
        )
        upd = spark.createDataFrame(
            [(1, "stale", 2, False)],
            "k long, payload string, version long, del boolean",
        )
        got = merge_upsert(base, upd, "k", "version", "del").collect()
        assert got[0].payload == "fresh" and got[0].version == 5

    def test_idempotent_reapply(self, spark):
        from fuzi_spark.ops.relational import merge_upsert

        base = self._base(spark)
        upd = spark.createDataFrame(
            [(1, "a2", 2, False), (2, "x", 2, True)],
            "k long, payload string, version long, del boolean",
        )
        once = merge_upsert(base, upd, "k", "version", "del")
        twice = merge_upsert(once, upd, "k", "version", "del")
        assert sorted(map(tuple, once.collect())) == sorted(
            map(tuple, twice.collect())
        )

    def test_no_delete_col(self, spark):
        from fuzi_spark.ops.relational import merge_upsert

        base = self._base(spark)
        upd = spark.createDataFrame(
            [(3, "c9", 9)], "k long, payload string, version long"
        )
        got = {
            r.k: r.payload
            for r in merge_upsert(base, upd, "k", "version").collect()
        }
        assert got == {1: "a", 2: "b", 3: "c9"}


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


class TestZorder:
    def test_zvalue_matches_reference_morton(self, spark):
        from fuzi_spark.ops.relational import zorder_value

        # bounds 0..65535 make the quantization the identity map, so
        # the column must equal the bit-twiddled reference exactly
        pts = [(3, 1), (0, 0), (65535, 65535), (12345, 54321), (1, 0)]
        df = spark.createDataFrame(pts, "x long, y long").withColumn(
            "z", zorder_value(F.col("x"), F.col("y"), 0, 65535, 0, 65535)
        )
        for r in df.collect():
            assert r.z == _morton_ref(r.x, r.y), (r.x, r.y)

    def test_layout_partitions_all_rows(self, spark):
        from fuzi_spark.ops.relational import zorder_layout

        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        total = li.count()
        summary = zorder_layout(
            li, "l_partkey", "l_suppkey", 0, 199, 0, 9, n_files=16
        ).collect()
        assert sum(r.n_rows for r in summary) == total
        assert all(0 <= r.file_id < 16 for r in summary)

    def test_layout_tightens_both_dims(self, spark):
        from fuzi_spark.ops.relational import zorder_layout

        # uniform grid: with Z-clustering each file's bounding box
        # must cover a small fraction of BOTH axes (a plain sort on x
        # would leave y ranges full-width)
        n = 64
        grid = spark.createDataFrame(
            [(i % n, i // n) for i in range(n * n)], "x long, y long"
        )
        summary = zorder_layout(
            grid, "x", "y", 0, n - 1, 0, n - 1, n_files=16
        ).collect()
        avg_x = sum(r.max_x - r.min_x for r in summary) / len(summary)
        avg_y = sum(r.max_y - r.min_y for r in summary) / len(summary)
        assert avg_x <= (n - 1) / 2 and avg_y <= (n - 1) / 2

    def test_non_power_of_two_raises(self, spark):
        from fuzi_spark.ops.relational import zorder_layout

        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        with pytest.raises(ValueError):
            zorder_layout(li, "l_partkey", "l_suppkey", 0, 9, 0, 9,
                          n_files=63)


class TestCms:
    def _tokens(self, spark, counts: dict):
        rows = [(t,) for t, c in counts.items() for _ in range(c)]
        return spark.createDataFrame(rows, "token string")

    def test_estimate_never_underestimates(self, spark):
        from fuzi_spark.ops.sketch import cms_build, cms_estimate

        counts = {f"tok{i}": (i % 7) + 1 for i in range(200)}
        toks = self._tokens(spark, counts)
        sketch = cms_build(toks, depth=4, width=64)   # narrow → collisions
        cand = spark.createDataFrame(
            [(t,) for t in counts], "token string"
        )
        for r in cms_estimate(sketch, cand, depth=4, width=64).collect():
            assert r.est >= counts[r.token], r.token

    def test_wide_sketch_is_exact(self, spark):
        from fuzi_spark.ops.sketch import cms_build, cms_estimate

        counts = {"alpha": 5, "beta": 3, "gamma": 1}
        toks = self._tokens(spark, counts)
        sketch = cms_build(toks, depth=4, width=4096)
        cand = spark.createDataFrame([(t,) for t in counts], "token string")
        got = {
            r.token: r.est
            for r in cms_estimate(sketch, cand, depth=4, width=4096).collect()
        }
        assert got == counts    # 3 tokens in 4096 buckets: no collisions

    def test_absent_token_estimates_near_zero(self, spark):
        from fuzi_spark.ops.sketch import cms_build, cms_estimate

        toks = self._tokens(spark, {"alpha": 5})
        sketch = cms_build(toks, depth=4, width=4096)
        cand = spark.createDataFrame([("zzz-never",)], "token string")
        assert cms_estimate(sketch, cand, 4, 4096).collect()[0].est == 0

    def test_sketch_is_a_monoid(self, spark):
        from fuzi_spark.ops.sketch import cms_build

        a = self._tokens(spark, {"x": 3, "y": 2})
        b = self._tokens(spark, {"y": 4, "z": 1})
        merged = (
            cms_build(a, 2, 32).unionByName(cms_build(b, 2, 32))
            .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
        )
        whole = cms_build(a.unionByName(b), 2, 32)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_heavy_hitters_order_and_bound(self, spark):
        from fuzi_spark.ops.sketch import heavy_hitters

        docs = spark.createDataFrame(
            [(1, "a a a b b c"), (2, "a b d"), (3, "A  a\tb")],
            "doc_id long, text string",
        )
        rows = heavy_hitters(docs, top_n=3).collect()
        got = {r.token: (r.exact, r.est) for r in rows}
        assert got["a"][0] == 6 and got["b"][0] == 4   # lowercased, ws-split
        assert all(est >= exact for exact, est in got.values())


class TestQuantize:
    def test_known_codes(self, spark):
        from fuzi_spark.ops.quantize import quantize_embeddings

        df = spark.createDataFrame(
            [(1, [1.0, -0.5, 0.25])], "vec_id long, embedding array<double>"
        )
        r = quantize_embeddings(df).collect()[0]
        assert abs(r.scale - 1.0 / 127.0) < 1e-12
        # v/scale = [127, -63.5, 31.75] → round-half-up → [127, -63, 32]
        assert list(r.codes) == [127, -63, 32]

    def test_zero_vector_lossless(self, spark):
        from fuzi_spark.ops.quantize import quantize_report

        df = spark.createDataFrame(
            [(1, [0.0, 0.0])], "vec_id long, embedding array<double>"
        )
        r = quantize_report(df).collect()[0]
        assert r.scale == 0.0 and r.mse == 0.0 and r.cos_recon is None

    def test_reconstruction_fidelity_on_testdata(self, spark):
        from fuzi_spark.ops.quantize import quantize_report

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        rows = quantize_report(emb).collect()
        assert len(rows) > 0
        assert all(r.cos_recon > 0.995 for r in rows)
        assert all(r.n_sat >= 1 for r in rows)  # max element saturates

    def test_saturation_clamps_hostile_rounding(self, spark):
        from fuzi_spark.ops.quantize import quantize_embeddings

        # the max-abs element maps to exactly 127 (not 128) even
        # though round-half-up of 127.0 could drift with float error
        df = spark.createDataFrame(
            [(1, [3.0, -3.0])], "vec_id long, embedding array<double>"
        )
        r = quantize_embeddings(df).collect()[0]
        assert list(r.codes) == [127, -127]


class TestHardNegatives:
    def test_label_ceiling_floor_and_rank(self, spark):
        from fuzi_spark.ops.negatives import hard_negatives

        # query 0, label 0 at e1; candidates constructed by angle
        corpus = spark.createDataFrame(
            [
                (0, [1.0, 0.0], 0),       # the query itself
                (1, [0.999, 0.04], 0),    # same label → excluded
                (2, [0.99, 0.14], 1),     # cos ≈ .990 > .95 → ceiling
                (3, [0.9, 0.43], 1),      # cos ≈ .902 → kept, rank 1
                (4, [0.5, 0.866], 2),     # cos .5 → kept, rank 2
                (5, [-0.2, 0.98], 1),     # cos < 0 → floor
            ],
            "vec_id long, embedding array<double>, label int",
        )
        qs = corpus.filter(F.col("vec_id") == 0)
        rows = hard_negatives(corpus, qs, k=5, ceiling=0.95).collect()
        assert [(r.neg_id, r.rank) for r in rows] == [(3, 1), (4, 2)]

    def test_k_truncates(self, spark):
        from fuzi_spark.ops.negatives import hard_negatives

        corpus = spark.createDataFrame(
            [(i, [1.0, i * 0.01], 1 if i else 0) for i in range(10)],
            "vec_id long, embedding array<double>, label int",
        )
        qs = corpus.filter(F.col("vec_id") == 0)
        assert hard_negatives(corpus, qs, k=3, ceiling=1.1).count() == 3


class TestThreads:
    def _posts(self, spark, rows):
        return spark.createDataFrame(
            rows, "post_id long, parent_id long, ts long"
        )

    def test_dfs_order_depth_and_roots(self, spark):
        from fuzi_spark.ops.threads import thread_assembly

        #   1 (root, ts 0)
        #   ├── 2 (ts 5)
        #   │   └── 4 (ts 1)
        #   └── 3 (ts 2)      ← earlier ts: renders BEFORE 2's subtree
        #   9 (root of its own thread)
        posts = self._posts(
            spark,
            [(1, None, 0), (2, 1, 5), (3, 1, 2), (4, 2, 1), (9, None, 7)],
        )
        out = {r.post_id: r for r in thread_assembly(posts).collect()}
        assert all(out[p].root_id == 1 for p in (1, 2, 3, 4))
        assert out[9].root_id == 9 and out[9].depth == 0
        assert [out[p].depth for p in (1, 2, 3, 4)] == [0, 1, 1, 2]
        order = sorted((out[p].thread_order, p) for p in (1, 2, 3, 4))
        assert [p for _, p in order] == [1, 3, 2, 4]  # preorder, ts siblings

    def test_deep_chain_resolves(self, spark):
        from fuzi_spark.ops.threads import thread_assembly

        chain = [(0, None, 0)] + [(i, i - 1, i) for i in range(1, 12)]
        out = {r.post_id: r for r in
               thread_assembly(self._posts(spark, chain),
                               max_depth=16).collect()}
        assert out[11].depth == 11 and out[11].root_id == 0
        assert out[11].thread_order == 12

    def test_cycle_fails_loudly(self, spark):
        from fuzi_spark.ops.threads import thread_assembly

        cyc = self._posts(spark, [(1, 2, 0), (2, 1, 1)])
        with pytest.raises(RuntimeError, match="unresolved"):
            thread_assembly(cyc, max_depth=4)

    def test_render_quoting(self, spark):
        from fuzi_spark.ops.threads import render_threads, thread_assembly

        posts = self._posts(
            spark, [(1, None, 0), (2, 1, 1), (3, 2, 2)]
        ).withColumn(
            "text",
            F.concat(F.lit("msg"), F.col("post_id").cast("string")),
        )
        asm = thread_assembly(posts)
        row = render_threads(asm, posts).collect()[0]
        assert row.n_posts == 3
        assert row.dialog == "msg1\n> msg2\n>> msg3"


class TestLossMask:
    def _eps(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, episode_idx int, text string, "
                  "media_refs array<string>"
        )

    def test_offsets_and_trainable(self, spark):
        from fuzi_spark.ops.assemble import loss_mask_spans

        eps = self._eps(
            spark, [(1, 0, "aaa\n<image>\nbb<image>", ["m/1", "m/2"])]
        )
        r = loss_mask_spans(eps).collect()[0]
        assert list(r.mask_starts) == [4, 14]
        assert list(r.mask_ends) == [11, 21]
        assert r.n_trainable_chars == len("aaa\n<image>\nbb<image>") - 14
        assert r.mask_ok

    def test_collision_flagged_not_silently_masked(self, spark):
        from fuzi_spark.ops.assemble import loss_mask_spans

        # source text contains the sentinel literal but NO media refs:
        # counts diverge -> audit flag, never a silent wrong mask
        eps = self._eps(spark, [(1, 0, "pre <image> post", [])])
        r = loss_mask_spans(eps).collect()[0]
        assert not r.mask_ok and len(r.mask_starts) == 1

    def test_no_sentinel(self, spark):
        from fuzi_spark.ops.assemble import loss_mask_spans

        eps = self._eps(spark, [(1, 0, "plain text only", [])])
        r = loss_mask_spans(eps).collect()[0]
        assert list(r.mask_starts) == [] and r.mask_ok
        assert r.n_trainable_chars == len("plain text only")


class TestParseJsonl:
    def _lines(self, spark, rows):
        return spark.createDataFrame(rows, "k long, line string")

    def test_ok_corrupt_and_null(self, spark):
        from fuzi_spark.ops.jsonsrc import parse_jsonl

        df = self._lines(
            spark,
            [
                (1, '{"id": 7, "lang": "en"}'),
                (2, 'garbage{"id": 8}'),
                (3, None),
            ],
        )
        out = {r.k: r for r in
               parse_jsonl(df, "id BIGINT, lang STRING").collect()}
        assert out[1].parse_ok and out[1].id == 7 and out[1].lang == "en"
        assert out[1].raw is None
        assert out[2].parse_ok is False and out[2].id is None
        assert out[2].raw == 'garbage{"id": 8}'
        assert out[3].parse_ok is None

    def test_partial_type_mismatch_is_corrupt(self, spark):
        from fuzi_spark.ops.jsonsrc import parse_jsonl

        # well-formed JSON, wrong type for id: PERMISSIVE would keep
        # the parseable fields — the contract nulls ALL fields so a
        # half-broken record can't masquerade as data
        df = self._lines(spark, [(1, '{"id": "not-a-number", "lang": "fr"}')])
        r = parse_jsonl(df, "id BIGINT, lang STRING").collect()[0]
        assert r.parse_ok is False and r.id is None and r.lang is None
        assert r.raw is not None

    def test_reserved_field_raises(self, spark):
        from fuzi_spark.ops.jsonsrc import parse_jsonl

        df = self._lines(spark, [(1, "{}")])
        with pytest.raises(ValueError):
            parse_jsonl(df, "_corrupt STRING")


class TestRateAnomalies:
    def _events(self, spark, counts, typ="a"):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        for h, n in enumerate(counts):
            for j in range(n):
                rows.append((typ, base + dt.timedelta(hours=h, seconds=j)))
        return spark.createDataFrame(rows, "event_type string, ts timestamp")

    def test_spike_flagged_after_history(self, spark):
        from fuzi_spark.ops.anomaly import rate_anomalies

        ev = self._events(spark, [10, 11, 10, 11, 50])
        out = sorted(
            rate_anomalies(ev, threshold=3.0).collect(),
            key=lambda r: r.win_start,
        )
        assert [r.n for r in out] == [10, 11, 10, 11, 50]
        assert out[-1].is_anomaly and out[-1].z > 3.0
        assert not any(r.is_anomaly for r in out[:-1])

    def test_cold_start_and_flat_history_unscored(self, spark):
        from fuzi_spark.ops.anomaly import rate_anomalies

        ev = self._events(spark, [10, 10, 10, 10, 99])
        out = sorted(
            rate_anomalies(ev).collect(), key=lambda r: r.win_start
        )
        # first buckets: < min_history trailing rows -> unscored
        assert out[0].z is None and out[1].z is None
        # flat history: sigma == 0 -> unscored, NOT an alert
        assert out[-1].z is None and not out[-1].is_anomaly

    def test_groups_isolated(self, spark):
        from fuzi_spark.ops.anomaly import rate_anomalies

        a = self._events(spark, [10, 11, 10, 11, 50], "a")
        b = self._events(spark, [5, 6, 5, 6, 5], "b")
        out = rate_anomalies(a.unionByName(b)).collect()
        assert not any(
            r.is_anomaly for r in out if r.event_type == "b"
        )


class TestRedirects:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src string, dst string")

    def test_chain_resolves_with_hops(self, spark):
        from fuzi_spark.ops.web import resolve_redirects

        out = {
            r.src: (r.final_url, r.n_hops, r.ok)
            for r in resolve_redirects(
                self._edges(spark, [("a", "b"), ("b", "c")])
            ).collect()
        }
        assert out["a"] == ("c", 2, True)
        assert out["b"] == ("c", 1, True)

    def test_loop_flagged_not_wrong(self, spark):
        from fuzi_spark.ops.web import resolve_redirects

        out = {
            r.src: (r.final_url, r.n_hops, r.ok)
            for r in resolve_redirects(
                self._edges(spark, [("x", "y"), ("y", "x"), ("a", "t")]),
                max_hops=4,
            ).collect()
        }
        assert out["x"] == (None, None, False)
        assert out["y"] == (None, None, False)
        assert out["a"] == ("t", 1, True)

    def test_self_loop(self, spark):
        from fuzi_spark.ops.web import resolve_redirects

        r = resolve_redirects(
            self._edges(spark, [("z", "z")]), max_hops=3
        ).collect()[0]
        assert not r.ok and r.final_url is None


class TestFim:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )

    def test_psm_reassembles_source(self, spark):
        from fuzi_spark.ops.fim import MID, PRE, SUF, fim_split

        texts = [f"document number {i} with some body text" for i in range(40)]
        rows = fim_split(self._docs(spark, texts), rate=1.0).collect()
        assert all(r.fim_applied for r in rows)
        for r in rows:
            body = r.fim_text
            assert body.startswith(PRE)
            pre, rest = body[len(PRE):].split(SUF, 1)
            suf, mid = rest.split(MID, 1)
            assert pre + mid + suf == texts[r.doc_id]

    def test_rate_zero_and_short_doc_pass_through(self, spark):
        from fuzi_spark.ops.fim import fim_split

        d = self._docs(spark, ["a long enough document here", "tiny"])
        r0 = fim_split(d, rate=0.0).collect()
        assert all(not r.fim_applied and r.fim_text == t
                   for r, t in zip(sorted(r0, key=lambda r: r.doc_id),
                                   ["a long enough document here", "tiny"]))
        r1 = {r.doc_id: r for r in fim_split(d, rate=1.0).collect()}
        assert r1[0].fim_applied and not r1[1].fim_applied
        assert r1[1].fim_text == "tiny"

    def test_deterministic(self, spark):
        from fuzi_spark.ops.fim import fim_split

        d = self._docs(spark, [f"text body {i} {'x' * (i % 7)}" for i in range(30)])
        a = sorted(map(tuple, fim_split(d).collect()))
        b = sorted(map(tuple, fim_split(d).collect()))
        assert a == b


class TestSpanCorruption:
    """ops/fim.py span_corruption — T5 denoising example prep."""

    def _docs(self, spark, texts):
        return spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )

    def test_reconstruction_invariant(self, spark):
        """Splicing each target span back over its sentinel in inputs
        reproduces the source token sequence exactly — the transform
        is lossless."""
        import re

        from fuzi_spark.ops.fim import span_corruption

        texts = [
            " ".join(f"w{i}x{j}" for j in range(i % 47)) for i in range(60)
        ]
        rows = span_corruption(self._docs(spark, texts)).collect()
        for r in rows:
            spans = {}
            for m in re.finditer(
                r"<extra_id_(\d+)>((?: (?!<extra_id_)\S+)*)", r.targets
            ):
                spans[m.group(1)] = m.group(2).split()
            out = []
            for tok in r.inputs.split():
                m = re.fullmatch(r"<extra_id_(\d+)>", tok)
                out.extend(spans[m.group(1)] if m else [tok])
            assert out == texts[r.doc_id].split(), r.doc_id

    def test_every_window_corrupts_within_bounds(self, spark):
        from fuzi_spark.ops.fim import span_corruption

        texts = [" ".join(str(j) for j in range(100))]
        r = span_corruption(self._docs(spark, texts), window=20, max_span=3).collect()[0]
        assert r.n_tokens == 100
        # 5 windows, each corrupting 1..3 tokens
        assert r.targets.count("<extra_id_") == 5
        assert 5 <= r.n_corrupted <= 15
        assert len(r.inputs.split()) == 100 - r.n_corrupted + 5

    def test_empty_and_short_docs(self, spark):
        from fuzi_spark.ops.fim import span_corruption

        rows = {
            r.doc_id: r
            for r in span_corruption(
                self._docs(spark, ["", "   ", "solo"])
            ).collect()
        }
        assert rows[0].inputs == "" and rows[0].targets == ""
        assert rows[0].n_tokens == 0 and rows[0].n_corrupted == 0
        assert rows[1].inputs == ""
        # one-token doc: the whole doc is the span
        assert rows[2].inputs == "<extra_id_0>"
        assert rows[2].targets == "<extra_id_0> solo"
        assert rows[2].n_corrupted == 1

    def test_deterministic(self, spark):
        from fuzi_spark.ops.fim import span_corruption

        texts = [" ".join(f"t{j}" for j in range(35))]
        d = self._docs(spark, texts)
        a = span_corruption(d).collect()[0]
        b = span_corruption(d).collect()[0]
        assert (a.inputs, a.targets) == (b.inputs, b.targets)

    def test_validation(self, spark):
        from fuzi_spark.ops.fim import span_corruption

        d = self._docs(spark, ["x"])
        with pytest.raises(ValueError):
            span_corruption(d, window=1)
        with pytest.raises(ValueError):
            span_corruption(d, window=5, max_span=5)

    def test_zero_shuffle_projection(self, spark):
        from fuzi_spark.ops.fim import span_corruption

        d = self._docs(spark, ["a b c"])
        plan = (
            span_corruption(d)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan


class TestQuantiles:
    def test_known_ranks(self, spark):
        from fuzi_spark.ops.diagnostics import group_quantiles

        df = spark.createDataFrame(
            [("g", v) for v in range(1, 12)], "grp string, v long"
        )
        r = group_quantiles(df, "v", ["grp"], (0.5, 0.9, 0.99)).collect()[0]
        # n=11: rank(0.5)=floor(5)+1=6 -> 6; rank(0.9)=floor(9)+1=10;
        # rank(0.99)=floor(9.9)+1=10
        assert (r.n, r.q50, r.q90, r.q99) == (11, 6, 10, 10)

    def test_ties_and_groups(self, spark):
        from fuzi_spark.ops.diagnostics import group_quantiles

        df = spark.createDataFrame(
            [("a", 7)] * 5 + [("b", v) for v in (1, 100)],
            "grp string, v long",
        )
        out = {r.grp: r for r in
               group_quantiles(df, "v", ["grp"], (0.5,)).collect()}
        assert out["a"].q50 == 7
        assert out["b"].q50 == 1   # n=2: rank floor(0.5)+1 = 1
