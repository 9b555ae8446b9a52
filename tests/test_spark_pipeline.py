"""End-to-end Spark pipeline tests — the north_rule correctness gate.

Asserts exact span-sequence equality (kind, text, media_ref, order) per
doc_id between the DISTRIBUTED pipeline and the frozen single-process
goldens (tests/goldens/extraction_golden.json), over the corpus seeded
from the reference's own test documents (FIXTURES.md §B). A mismatch here
means the distributed path (codec, shuffle, salting, Arrow transfer)
changed observable semantics.
"""

import hashlib
import json
import os

import pytest

from fuzi_spark.codec import encode_spans, reassemble

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "extraction_golden.json")


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("fuzi-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def _span_digest(spans):
    h = hashlib.sha256()
    for s in spans:
        h.update(
            f"{s['seq']}|{s['kind']}|{s['text'] or ''}|{s['media_ref'] or ''}\n".encode()
        )
    return h.hexdigest()


class TestCodec:
    def test_roundtrip_simple(self):
        m = '<html><body><p>x</p><img src="a.jpg"><p>y</p></body></html>'
        assert reassemble(encode_spans(m)) == m

    def test_roundtrip_fixtures(self):
        path = "/root/reference/Tests/Resources/web.html"
        if not os.path.exists(path):
            pytest.skip("reference fixtures not available")
        m = open(path, encoding="utf-8", errors="replace").read()
        spans = encode_spans(m)
        assert reassemble(spans) == m
        assert any(s["kind"] == "media" for s in spans)

    def test_unordered_reassembly(self):
        m = "<a><b>x</b></a>"
        spans = encode_spans(m)
        assert reassemble(list(reversed(spans))) == m


class TestGoldenEquality:
    """north_rule: span-sequence equality per doc_id, Spark vs goldens."""

    @pytest.fixture(scope="class")
    def extracted(self, spark):
        from fuzi_spark.corpus import corpus_df
        from fuzi_spark.pipeline import run_extraction_pipeline

        docs = corpus_df(spark, include_fixtures=True, skew=True)
        extracted, lineage = run_extraction_pipeline(
            spark, docs, output_dir=None, n_buckets=8, num_partitions=8
        )
        rows = extracted.collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for v in by_doc.values():
            v.sort(key=lambda r: r.seq)
        return by_doc, lineage.collect()

    def test_every_doc_extracted(self, extracted, golden):
        by_doc, _ = extracted
        missing = set(golden) - set(by_doc)
        assert not missing, f"docs missing from pipeline output: {missing}"

    def test_span_sequence_equality(self, extracted, golden):
        by_doc, _ = extracted
        bad = []
        for doc_id, g in golden.items():
            rows = [r for r in by_doc.get(doc_id, []) if r.seq >= 0]
            if len(rows) != g["n_spans"]:
                bad.append((doc_id, "count", len(rows), g["n_spans"]))
                continue
            dig = _span_digest(
                [
                    {"seq": r.seq, "kind": r.kind, "text": r.text, "media_ref": r.media_ref}
                    for r in rows
                ]
            )
            if dig != g["digest"]:
                bad.append((doc_id, "digest", dig[:12], g["digest"][:12]))
        assert not bad, f"span-sequence mismatches: {bad}"

    def test_exact_small_docs(self, extracted, golden):
        by_doc, _ = extracted
        for doc_id, g in golden.items():
            if "spans" not in g:
                continue
            rows = [r for r in by_doc.get(doc_id, []) if r.seq >= 0]
            got = [
                {"seq": r.seq, "kind": r.kind, "text": r.text, "media_ref": r.media_ref}
                for r in rows
            ]
            assert got == g["spans"], f"{doc_id}: {got} != {g['spans']}"

    def test_no_parse_errors_on_corpus(self, extracted, golden):
        by_doc, _ = extracted
        for doc_id, rows in by_doc.items():
            errs = [r for r in rows if r.parse_error]
            expected = golden.get(doc_id, {}).get("parse_error", 0)
            assert len(errs) == expected, f"{doc_id}: unexpected parse errors"

    def test_lineage_totals(self, extracted, golden):
        by_doc, lineage = extracted
        total_docs = sum(r.doc_count for r in lineage)
        total_spans = sum(r.span_count for r in lineage)
        assert total_docs == len(golden)
        assert total_spans == sum(g["n_spans"] for g in golden.values())


class TestResume:
    def test_committed_buckets_skipped(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from fuzi_spark.corpus import corpus_df
        from fuzi_spark.pipeline import run_extraction_pipeline

        out = str(tmp_path / "out")
        docs = corpus_df(spark, include_fixtures=False, skew=False)
        # first run: full
        e1, l1 = run_extraction_pipeline(
            spark, docs, output_dir=out, n_buckets=4, num_partitions=4
        )
        committed = spark.read.parquet(os.path.join(out, "lineage"))
        n_buckets_done = committed.select("bucket").distinct().count()
        assert n_buckets_done == 4
        # second run: everything committed → nothing to extract
        e2, _ = run_extraction_pipeline(
            spark, docs, output_dir=out, n_buckets=4, num_partitions=4
        )
        # spans path now contains each doc exactly once (no double-append)
        spans = spark.read.parquet(os.path.join(out, "spans"))
        per_doc = (
            spans.filter(F.col("seq") == 0).groupBy("doc_id").count().collect()
        )
        assert all(r["count"] == 1 for r in per_doc)


class TestCrashResume:
    def test_kill_between_writes_is_exactly_once(self, spark, tmp_path):
        """Manifest protocol: a run killed AFTER its span files land but
        BEFORE the lineage commit must leave no visible spans; the resume
        run re-extracts and the committed view is bit-identical to a
        clean single run — zero duplicate (doc_id, seq)."""
        from fuzi_spark import pipeline
        from fuzi_spark.corpus import corpus_df
        from fuzi_spark.pipeline import (
            read_committed_spans,
            run_extraction_pipeline,
        )

        docs = corpus_df(spark, include_fixtures=False, skew=False)

        ref_dir = str(tmp_path / "ref")
        run_extraction_pipeline(
            spark, docs, output_dir=ref_dir, n_buckets=4, num_partitions=4
        )
        ref = sorted(
            (r.doc_id, r.seq, r.kind, r.text, r.media_ref)
            for r in read_committed_spans(spark, ref_dir).collect()
        )
        assert ref

        out = str(tmp_path / "out")
        real_commit = pipeline._commit_lineage

        def boom(lineage, path):
            raise RuntimeError("simulated kill between spans and lineage")

        pipeline._commit_lineage = boom
        try:
            with pytest.raises(RuntimeError):
                run_extraction_pipeline(
                    spark, docs, output_dir=out, n_buckets=4, num_partitions=4
                )
        finally:
            pipeline._commit_lineage = real_commit

        # orphan span files are on disk, but nothing is committed
        assert os.path.exists(os.path.join(out, "spans"))
        assert (
            pipeline.committed_buckets(spark, os.path.join(out, "lineage"))
            is None
        )

        # resume: nothing committed → full re-run under a fresh run_id
        run_extraction_pipeline(
            spark, docs, output_dir=out, n_buckets=4, num_partitions=4
        )

        got = sorted(
            (r.doc_id, r.seq, r.kind, r.text, r.media_ref)
            for r in read_committed_spans(spark, out).collect()
        )
        assert got == ref

        # the raw directory really does hold the orphan duplicates the
        # manifest filters out — the protocol, not luck, is what dedups
        raw_rows = spark.read.parquet(os.path.join(out, "spans")).count()
        assert raw_rows > len(got)

    def test_single_extraction_pass_per_run(self, spark, tmp_path):
        """With output_dir set, the write pass is the ONLY MapInPandas run:
        the returned spans/lineage read back the committed parquet, so
        consuming them never re-extracts (VERDICT r1 finding #1)."""
        from fuzi_spark.corpus import corpus_df
        from fuzi_spark.pipeline import run_extraction_pipeline

        docs = corpus_df(spark, include_fixtures=False, skew=False)
        out = str(tmp_path / "once")
        e, l = run_extraction_pipeline(
            spark, docs, output_dir=out, n_buckets=4, num_partitions=4
        )
        for df in (e, l):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "mapinpandas" not in plan.lower(), plan[:2000]


class TestVerificationJoin:
    def test_self_verification_empty(self, spark):
        from fuzi_spark.corpus import corpus_df
        from fuzi_spark.pipeline import run_extraction_pipeline, verification_join

        docs = corpus_df(spark, include_fixtures=False, skew=False)
        extracted, _ = run_extraction_pipeline(
            spark, docs, output_dir=None, n_buckets=4, num_partitions=4
        )
        golden = extracted.filter("seq >= 0").select(
            "doc_id", "seq", "kind", "text", "media_ref"
        )
        mism = verification_join(extracted, golden)
        assert mism.count() == 0


class TestStreaming:
    def test_streaming_matches_batch(self, spark, tmp_path, golden):
        """availableNow streaming run over the corpus produces the same
        span sequences as the batch pipeline (exactly-once via checkpoint)."""
        from fuzi_spark.corpus import corpus_df
        from fuzi_spark.pipeline import streaming_extraction

        inp = str(tmp_path / "in")
        out = str(tmp_path / "out")
        cp = str(tmp_path / "cp")
        docs = corpus_df(spark, include_fixtures=False, skew=False)
        docs.write.parquet(inp)

        q = streaming_extraction(spark, inp, out, cp, n_buckets=4)
        q.awaitTermination(120)

        import os as _os

        spans = spark.read.parquet(_os.path.join(out, "spans"))
        got = {
            r.doc_id: r.cnt
            for r in spans.filter("seq >= 0").groupBy("doc_id").count()
            .withColumnRenamed("count", "cnt").collect()
        }
        for doc_id, g in golden.items():
            if doc_id.startswith(("xml-spec", "web-github", "atom", "ocf", "vmap")):
                continue  # fixtures excluded from this corpus
            if doc_id.startswith("hard-wide-") and doc_id != "hard-wide-5000":
                continue  # skew tail excluded
            if doc_id == "hard-media-heavy":
                continue
            assert got.get(doc_id, 0) == g["n_spans"], doc_id

        # restart with same checkpoint: no new input → no duplicate rows
        n_before = spans.count()
        q2 = streaming_extraction(spark, inp, out, cp, n_buckets=4)
        q2.awaitTermination(60)
        assert spark.read.parquet(_os.path.join(out, "spans")).count() == n_before


class TestSimilarity:
    def test_ivf_recall_vs_bruteforce(self, spark):
        from pyspark.sql import functions as F

        from fuzi_spark.ops.similarity import cosine_topk_bruteforce, cosine_topk_ivf

        vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        queries = vecs.filter(F.col("vec_id") < 5)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_bruteforce(vecs, queries, k=5).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_ivf(vecs, queries, k=5, n_cells=8, n_probe=4).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.4, f"IVF recall collapsed: {recall}"

    def test_ivf_rejects_oversized_query_set(self, spark):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from fuzi_spark.ops.similarity import cosine_topk_ivf

        vecs = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
        queries = vecs.filter(F.col("vec_id") < 10)
        with _pytest.raises(ValueError, match="max_query_rows"):
            cosine_topk_ivf(vecs, queries, k=5, max_query_rows=5)

    def test_lsh_results_subset_of_table(self, spark):
        from pyspark.sql import functions as F

        from fuzi_spark.ops.similarity import cosine_topk_lsh

        vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        queries = vecs.filter(F.col("vec_id") < 5)
        rows = cosine_topk_lsh(vecs, queries, k=5, bits=6).collect()
        assert all(r.rank <= 5 and r.query_id != r.neighbor_id for r in rows)


class TestWindowedEvents:
    def test_streaming_matches_batch(self, spark, tmp_path):
        from fuzi_spark.streaming import streaming_windowed_events, windowed_event_counts

        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        batch = {
            (str(r.window_start), r.event_type): (r.n_events, r.total_cents)
            for r in windowed_event_counts(events).collect()
        }
        inp = str(tmp_path / "ev")
        events.write.parquet(inp)
        q = streaming_windowed_events(
            spark, inp, str(tmp_path / "cp"), query_name="we_test"
        )
        q.awaitTermination(120)
        streamed = {
            (str(r.window_start), r.event_type): (r.n_events, r.total_cents)
            for r in spark.sql("select * from we_test").collect()
        }
        # watermark finalizes all but the stream-final windows; every
        # emitted window must match the batch result exactly
        assert streamed
        for k, v in streamed.items():
            assert batch[k] == v, k


class TestSessionize:
    def test_stateful_stream_matches_batch(self, spark, tmp_path):
        """applyInPandasWithState sessionization emits exactly the batch
        window-function sessions (minus stream-final open sessions whose
        event-time timeout can never fire after input ends)."""
        from fuzi_spark.streaming import sessionize_batch, sessionize_stream

        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        batch = {
            (r.user_id, str(r.session_start)[:19], r.n_events)
            for r in sessionize_batch(events, 30).collect()
        }
        inp = str(tmp_path / "ev")
        events.write.parquet(inp)
        q = sessionize_stream(spark, inp, str(tmp_path / "cp"), 30, query_name="sess_pt")
        q.awaitTermination(150)
        streamed = {
            (r.user_id, str(r.session_start)[:19], r.n_events)
            for r in spark.sql("select * from sess_pt").collect()
        }
        assert streamed, "stream emitted nothing"
        assert streamed - batch == set(), "stream emitted sessions batch doesn't have"
        # only open (last-per-user) sessions may be missing
        assert len(batch - streamed) <= events.select("user_id").distinct().count()
        assert len(streamed) >= 0.9 * len(batch)


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        """Both sides bucketed on the join key -> the join plan contains no
        Exchange: the co-located layout the 10^12-row verification join
        relies on."""
        from fuzi_spark.corpus import corpus_df
        from fuzi_spark.pipeline import run_extraction_pipeline, write_bucketed

        docs = corpus_df(spark, include_fixtures=False, skew=False)
        extracted, _ = run_extraction_pipeline(
            spark, docs, output_dir=None, n_buckets=4, num_partitions=4
        )
        spans = extracted.filter("seq >= 0").select("doc_id", "seq", "kind")
        try:
            write_bucketed(spans, "t_spans", str(tmp_path / "t_spans"), 4)
            write_bucketed(spans, "t_golden", str(tmp_path / "t_golden"), 4)
            a = spark.table("t_spans")
            b = spark.table("t_golden").withColumnRenamed("kind", "g_kind")
            # disable broadcast to exercise the big-table path (at 10^12
            # rows neither side broadcasts); bucketing must remove the
            # shuffle exchanges entirely
            prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                # join on the bucket key: bucketed scans co-locate, no shuffle
                j = a.groupBy("doc_id").count().join(
                    b.groupBy("doc_id").count().withColumnRenamed("count", "g_count"),
                    ["doc_id"],
                )
                plan = j._jdf.queryExecution().executedPlan().toString()
                assert "Exchange hashpartitioning" not in plan, plan[:2000]
                assert "SortMergeJoin" in plan, plan[:2000]
                assert j.count() > 0
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        finally:
            spark.sql("DROP TABLE IF EXISTS t_spans")
            spark.sql("DROP TABLE IF EXISTS t_golden")


class TestJobCLI:
    """fuzi_spark.job main() — the spark-submit entrypoint surface.

    The catalog-table branch (--input-table / --output-table /
    --lineage-table) is the Iceberg deployment path. The container has no
    Iceberg jars, so here job.append_table's writeTo(...).append() is
    submitted, rejected by Spark (CANNOT_WRITE_INTO_V1_TABLE for
    session-catalog parquet tables), and routed to the by-name V1
    saveAsTable(append) fallback — i.e. the branch's logic (run_id
    stamping, lineage aggregated from the committed read-back rows, the
    manifest semi-join readability, the fallback seam itself) runs for
    real end-to-end. Only Iceberg's v2 snapshot-commit atomicity remains
    a documented-not-executed claim (README: Iceberg runtime caveat)."""

    def _mk_docs_table(self, spark, name):
        from fuzi_spark.corpus import corpus_df

        spark.sql(f"DROP TABLE IF EXISTS {name}")
        corpus_df(spark, include_fixtures=False, skew=False).writeTo(name).using(
            "parquet"
        ).create()

    def test_parquet_surface_summary(self, spark, tmp_path, capsys):
        from fuzi_spark.corpus import corpus_df
        from fuzi_spark.job import main

        inp = str(tmp_path / "docs")
        out = str(tmp_path / "out")
        docs = corpus_df(spark, include_fixtures=False, skew=False)
        n_docs = docs.count()
        docs.write.parquet(inp)
        rc = main(
            ["--input", inp, "--output", out, "--n-buckets", "4",
             "--num-partitions", "4"]
        )
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["docs"] == n_docs
        assert summary["parse_errors"] == 0
        spans = spark.read.parquet(os.path.join(out, "spans"))
        assert summary["spans"] == spans.filter("seq >= 0").count()

    def test_table_surface_manifest_protocol(self, spark, capsys):
        from pyspark.sql import functions as F

        from fuzi_spark.job import main
        from fuzi_spark.pipeline import run_extraction_pipeline

        try:
            self._mk_docs_table(spark, "job_docs")
            n_docs = spark.table("job_docs").count()
            # pre-create output/lineage tables with the pipeline's output
            # schema (prod: Iceberg DDL owns this; append() requires the
            # table to exist in both catalogs)
            lazy_spans, lazy_lineage = run_extraction_pipeline(
                spark, spark.table("job_docs"), n_buckets=4, num_partitions=4
            )
            spark.sql("DROP TABLE IF EXISTS job_spans")
            spark.sql("DROP TABLE IF EXISTS job_lineage")
            empty = lazy_spans.withColumn("run_id", F.lit("x")).limit(0)
            empty.writeTo("job_spans").using("parquet").create()
            lazy_lineage.withColumn("run_id", F.lit("x")).limit(0).writeTo(
                "job_lineage"
            ).using("parquet").create()

            args = ["--input-table", "job_docs", "--output-table", "job_spans",
                    "--lineage-table", "job_lineage", "--n-buckets", "4",
                    "--num-partitions", "4"]
            assert main(args) == 0
            s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
            assert s1["docs"] == n_docs

            spans = spark.table("job_spans")
            lineage = spark.table("job_lineage")
            run_ids = [r.run_id for r in spans.select("run_id").distinct().collect()]
            assert len(run_ids) == 1 and run_ids[0]  # stamped, single run
            # lineage aggregates must match a direct recount of the
            # committed span rows, bucket by bucket
            recount = (
                spans.groupBy("bucket")
                .agg(
                    F.sum(F.when(F.col("seq") <= 0, 1).otherwise(0)).alias("d"),
                    F.sum(F.when(F.col("seq") >= 0, 1).otherwise(0)).alias("s"),
                )
                .collect()
            )
            lin = {r.bucket: (r.doc_count, r.span_count) for r in lineage.collect()}
            assert {r.bucket: (r.d, r.s) for r in recount} == lin
            assert sum(d for d, _ in lin.values()) == n_docs

            # a second run appends under a NEW run_id; the lineage manifest
            # keeps both runs distinguishable (the reader's semi-join key)
            assert main(args) == 0
            capsys.readouterr()
            # re-resolve from the catalog: the pre-append DataFrames may
            # cache a stale file index
            spans2 = spark.table("job_spans")
            lineage2 = spark.table("job_lineage")
            assert spans2.select("run_id").distinct().count() == 2
            assert lineage2.select("run_id").distinct().count() == 2
            committed = lineage2.select("bucket", "run_id").distinct()
            joined = spans2.join(committed, ["bucket", "run_id"], "left_semi")
            assert joined.count() == spans2.count()  # every span row committed
        finally:
            for t in ("job_docs", "job_spans", "job_lineage"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


class TestStreamingDedup:
    def test_kernel_within_batch_and_against_seen(self, spark):
        from pyspark.sql import functions as F

        from fuzi_spark.streaming import dedup_novel

        batch = spark.createDataFrame(
            [(1, "aaa"), (2, "aaa"), (3, "bbb"), (4, "ccc")],
            "doc_id long, text string",
        )
        seen = spark.createDataFrame([("x",)], "digest string").select(
            F.sha2(F.lit("ccc"), 256).alias("digest")
        )
        out = {r.doc_id for r in dedup_novel(batch, seen).collect()}
        # aaa keeps min id 1, bbb keeps 3, ccc already seen
        assert out == {1, 3}
        # no-history mode: all three digests keep their min id
        assert {r.doc_id for r in dedup_novel(batch).collect()} == {1, 3, 4}

    def test_stream_dedups_against_history_exactly_once(self, spark, tmp_path):
        """3 micro-batches with within-batch AND cross-batch duplicates:
        the committed novel set carries each distinct text EXACTLY once
        (same distinct-digest set as a batch-mode dedup of the full
        corpus), and a restart on the same checkpoint appends nothing."""
        import os as _os

        from pyspark.sql import functions as F

        from fuzi_spark.streaming import read_novel_docs, streaming_exact_dedup

        inp = str(tmp_path / "in")
        out = str(tmp_path / "out")
        cp = str(tmp_path / "cp")
        # batch k: ids k*100+i; texts overlap within batch (i//2) and
        # across batches (t0..t4 appear in every batch)
        rows = []
        for k in range(3):
            for i in range(10):
                rows.append((k * 100 + i, f"t{i // 2}" * 3))
            rows.append((k * 100 + 50, f"only-batch-{k}"))
        for k in range(3):  # one file per batch
            spark.createDataFrame(
                [r for r in rows if r[0] // 100 == k or r[0] == k * 100 + 50],
                "doc_id long, text string",
            ).coalesce(1).write.mode("append").parquet(inp)

        q = streaming_exact_dedup(
            spark, inp, out, cp, max_files_per_trigger=1
        )
        q.awaitTermination(120)

        novel = read_novel_docs(spark, out)
        texts = [r.text for r in novel.collect()]
        expected = {r[1] for r in rows}
        assert sorted(texts) == sorted(set(texts)), "a text was kept twice"
        assert set(texts) == expected, "a distinct text was lost"
        # keeper determinism within a batch: min id per digest
        first_seen = novel.filter(F.col("text") == "t0t0t0").collect()
        assert len(first_seen) == 1 and first_seen[0].doc_id % 100 == 0

        # restart on the same checkpoint: no new input -> nothing appended
        n = novel.count()
        q2 = streaming_exact_dedup(spark, inp, out, cp, max_files_per_trigger=1)
        q2.awaitTermination(60)
        assert read_novel_docs(spark, out).count() == n


class TestStreamingNearDedup:
    WORDS = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb wc wd we wf".split()

    @classmethod
    def _text(cls, mutate_at=None, tag="z"):
        toks = list(cls.WORDS) * 2
        if mutate_at is not None:
            toks[mutate_at] = tag
        return " ".join(toks)

    def test_near_novel_kernel(self, spark):
        from fuzi_spark.ops.cache import cache_scope
        from fuzi_spark.streaming import near_novel

        base = self._text()
        batch = spark.createDataFrame(
            [
                (1, base),                      # keeper
                (2, base),                      # exact copy → dropped
                (3, self._text(5)),             # 1-token mutation → dropped
                (4, "completely different content about other things "
                    "with many distinct tokens here now today ok fine"),
                (5, "hi"),                      # short: truncated shingle
                (6, "hi"),                      # identical short → dropped
                (7, "yo"),                      # different short → kept
            ],
            "doc_id long, text string",
        )
        with cache_scope():
            novel, nb = near_novel(batch)
            ids = {r.doc_id for r in novel.collect()}
            band_ids = {r.doc_id for r in nb.collect()}
        # mutation 3 collides with 1 (J≈0.97: collision probability
        # 1-(1-J^4)^16 ≈ 1-1e-10 under the fixed deterministic hashes);
        # identical short docs dedup on their truncated shingle,
        # different short docs never constant-collide
        assert ids == {1, 4, 5, 7}
        assert {1, 4, 5, 7} <= band_ids and 6 not in band_ids

    def test_near_novel_against_history(self, spark):
        from fuzi_spark.ops.cache import cache_scope
        from fuzi_spark.ops.dedup import minhash_bands
        from fuzi_spark.streaming import near_novel

        hist = spark.createDataFrame(
            [(100, self._text())], "doc_id long, text string"
        )
        seen = minhash_bands(hist).select("band", "bucket")
        batch = spark.createDataFrame(
            [(1, self._text(3)), (2, "fresh unrelated text with plenty "
                                     "of new tokens to shingle properly")],
            "doc_id long, text string",
        )
        with cache_scope():
            novel, _ = near_novel(batch, seen)
            ids = {r.doc_id for r in novel.collect()}
        assert ids == {2}

    def test_stream_near_dedup_exactly_once(self, spark, tmp_path):
        from fuzi_spark.streaming import (
            read_near_novel_docs,
            streaming_near_dedup,
        )

        inp = str(tmp_path / "in")
        out = str(tmp_path / "out")
        cp = str(tmp_path / "cp")
        # every batch re-delivers the same base text (cross-batch near
        # dup) plus one genuinely new doc per batch
        for k in range(3):
            spark.createDataFrame(
                [
                    (k * 100, self._text(k)),   # near-dup of batch 0's base
                    (k * 100 + 1,
                     f"unique content for batch {k} " * 4 + "end marker"),
                ],
                "doc_id long, text string",
            ).coalesce(1).write.mode("append").parquet(inp)

        q = streaming_near_dedup(spark, inp, out, cp, max_files_per_trigger=1)
        q.awaitTermination(120)
        novel = read_near_novel_docs(spark, out)
        ids = sorted(r.doc_id for r in novel.collect())
        # batch 0 keeps both docs; later batches keep only their unique doc
        assert ids == [0, 1, 101, 201]
        # restart on the same checkpoint: nothing appended
        q2 = streaming_near_dedup(spark, inp, out, cp, max_files_per_trigger=1)
        q2.awaitTermination(60)
        assert read_near_novel_docs(spark, out).count() == 4

    def test_many_batches_table_backed_history_constant_plan(
        self, spark, tmp_path
    ):
        """The band-history scale contract, exercised: 12 batches with
        a TABLE-BACKED (parquet) history — the shape the streaming
        wrapper runs — must (a) keep the per-batch near_novel plan at
        CONSTANT node count (a unionByName-accumulated history would
        grow the plan every batch and eventually stack-overflow the
        analyzer), and (b) produce exactly the batch-replay novel set."""
        from pyspark.sql import functions as F

        from fuzi_spark.ops.cache import cache_scope
        from fuzi_spark.streaming import near_novel

        bands_path = str(tmp_path / "bands")
        plan_nodes = []
        kept = []
        for b in range(12):
            rows = [
                # one doc near-duplicating batch 0's base text
                (b * 10, self._text(b % 16)),
                # one genuinely novel doc per batch
                (b * 10 + 1,
                 f"novel payload {b} " * 3
                 + " ".join(f"tok{b}_{j}" for j in range(8))),
            ]
            batch = spark.createDataFrame(
                rows, "doc_id long, text string"
            )
            try:
                seen = spark.read.parquet(bands_path)
            except Exception:
                seen = None
            with cache_scope():
                novel, novel_bands = near_novel(batch, seen)
                plan = (
                    novel._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
                # node count, not char count: file listings in scan
                # nodes may print differently as files accumulate
                plan_nodes.append(
                    sum(
                        1
                        for line in plan.splitlines()
                        if line.strip().startswith(("+-", ":-", "*("))
                        or line.startswith("*(")
                    )
                )
                kept.extend(r.doc_id for r in novel.collect())
                novel_bands.select("band", "bucket").write.mode(
                    "append"
                ).parquet(bands_path)
        # batch 0 keeps both docs; every later batch keeps only its
        # novel doc (the near-dup collides with committed history)
        assert sorted(kept) == [0, 1] + [
            b * 10 + 1 for b in range(1, 12)
        ], sorted(kept)
        # batches 1.. all run the with-history plan: identical shape
        assert len(set(plan_nodes[1:])) == 1, plan_nodes
        # history growth must not have grown the plan vs batch 1
        assert plan_nodes[-1] == plan_nodes[1], plan_nodes
    def test_salting_spreads_colliding_giants(self, spark):
        """Find doc_ids whose plain hash(doc_id) keys collide into ONE
        partition, mark them giant, and assert salt_partition routes them
        to MULTIPLE partitions while normal docs keep doc_id-hash routing
        (the SPARK-23207-safe deterministic salt)."""
        from pyspark.sql import functions as F

        from fuzi_spark.pipeline import salt_partition

        nparts = 4
        ids = spark.range(200).select(
            F.col("id").cast("string").alias("doc_id"),
            F.lit(1).cast("long").alias("doc_weight"),
        )
        # observe ACTUAL plain routing (repartition re-hashes the key, so
        # the partition is not pmod(xxhash64(id), n) — measure, don't model)
        routed = salt_partition(ids, nparts, giant_threshold=10).select(
            "doc_id", F.spark_partition_id().alias("p")
        )
        by_part = {}
        for r in routed.collect():
            by_part.setdefault(r.p, []).append(r.doc_id)
        colliding = next(v for v in by_part.values() if len(v) >= 6)[:6]
        docs = spark.createDataFrame(
            [(d, 1_000_000) for d in colliding], "doc_id string, doc_weight long"
        )
        # below threshold: all six land together (the skew this cures)
        plain = salt_partition(docs, nparts, giant_threshold=10_000_000)
        plain_parts = (
            plain.select(F.spark_partition_id().alias("sp"))
            .distinct()
            .count()
        )
        assert plain_parts == 1
        # above threshold: the salted second hash spreads them
        salted = salt_partition(docs, nparts, giant_threshold=10_000)
        salted_parts = (
            salted.select(F.spark_partition_id().alias("sp"))
            .distinct()
            .count()
        )
        assert salted_parts > 1, "giants were not spread by the salt"
        # determinism: same input → same routing (stage-retry safety)
        again = salt_partition(docs, nparts, giant_threshold=10_000)
        a = sorted((r.doc_id, r.sp) for r in salted.select(
            "doc_id", F.spark_partition_id().alias("sp")).collect())
        b = sorted((r.doc_id, r.sp) for r in again.select(
            "doc_id", F.spark_partition_id().alias("sp")).collect())
        assert a == b

    def test_salting_is_semantics_neutral(self, spark):
        """Same extracted span sequences whether or not the giant path
        triggers — salting only changes WHERE a doc is parsed."""
        from fuzi_spark.corpus import corpus_df
        from fuzi_spark.pipeline import run_extraction_pipeline

        docs = corpus_df(spark, include_fixtures=False, skew=True)

        def run(threshold):
            e, _ = run_extraction_pipeline(
                spark, docs, output_dir=None, n_buckets=4,
                num_partitions=4, giant_threshold=threshold,
            )
            return sorted(
                (r.doc_id, r.seq, r.kind, r.text, r.media_ref)
                for r in e.collect()
            )

        # 5k: the skew-tail docs exceed it and take the salted route;
        # huge: nothing does
        assert run(5_000) == run(10_000_000_000)


class TestJobCurateCLI:
    """fuzi_spark.job --mode curate — the hygiene DAG as a deployable
    job: verdicts written to parquet, per-reason counts in the JSON
    summary."""

    def test_curate_summary_and_verdicts(self, spark, tmp_path, capsys):
        import json as _json

        from fuzi_spark.job import main

        inp = str(tmp_path / "docs")
        out = str(tmp_path / "verdicts")
        bl = str(tmp_path / "blocklist")
        rows = [
            (1, "the good document body is long enough to pass the gate",
             "https://ok.x/a"),
            (2, "the good document body is long enough to pass the gate",
             "https://ok.x/b"),                       # exact duplicate of 1
            (3, "!!!", "https://ok.x/c"),             # quality reject
            (4, "the other fine body with plenty of distinct words here",
             "https://Spam.X/z"),                     # blocked domain
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, url string"
        ).write.parquet(inp)
        spark.createDataFrame([("spam.x",)], "domain string").write.parquet(bl)
        rc = main(
            ["--mode", "curate", "--input", inp, "--output", out,
             "--blocklist", bl]
        )
        assert rc == 0
        summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["mode"] == "curate"
        assert summary["docs"] == 4 and summary["kept"] == 1
        assert summary["rejected"] == {
            "blocked_domain": 1,
            "exact_duplicate": 1,
            "quality:too_few_tokens": 1,
        }
        got = {
            r.doc_id: (r.keep, r.reject_reason)
            for r in spark.read.parquet(out).collect()
        }
        assert got[1] == (1, None)
        assert got[2] == (0, "exact_duplicate")
        assert got[3] == (0, "quality:too_few_tokens")
        assert got[4] == (0, "blocked_domain")


class TestJobDedupCLI:
    """fuzi_spark.job --mode dedup — the near-dup DAG as a deployable
    job: (doc_id, group_id, keep) verdicts + one-line JSON summary."""

    def test_dedup_summary_and_verdicts(self, spark, tmp_path, capsys):
        import json as _json

        from fuzi_spark.job import main

        base = (
            "the quick brown fox jumps over the lazy dog near the river "
            "bank every single morning before the sun rises fully"
        )
        rows = [
            (1, base),
            (2, base + " extra"),          # near-dup of 1
            (3, "a completely different document about spark catalyst "
                "plans and shuffle exchanges in distributed execution"),
        ]
        inp = str(tmp_path / "docs")
        out = str(tmp_path / "verdicts")
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            inp
        )
        pinned_before = {
            int(k)
            for k in spark.sparkContext._jsc.getPersistentRDDs()
            .keySet()
            .toArray()
        }
        rc = main(["--mode", "dedup", "--input", inp, "--output", out,
                   "--jaccard-threshold", "0.5"])
        assert rc == 0
        summary = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert summary["mode"] == "dedup"
        assert summary["docs"] == 3
        assert summary["kept"] == 2 and summary["dropped"] == 1
        assert summary["dup_groups"] == 1
        got = {
            r.doc_id: (r.keep, r.group_id)
            for r in spark.read.parquet(out).collect()
        }
        assert got[1][0] == 1 and got[3][0] == 1
        assert got[2][0] == 0 and got[2][1] == got[1][1]
        # no pinned operator caches leak out of the job (cache_scope);
        # only the components checkpoints (lineage-truncated data) may
        # remain
        pinned_after = {
            int(k)
            for k in spark.sparkContext._jsc.getPersistentRDDs()
            .keySet()
            .toArray()
        }
        assert len(pinned_after - pinned_before) <= 2


class TestSparkSubmitDeployment:
    """The north rule's shipping shape, executed for real: `spark-submit
    --py-files fuzi_spark.zip job.py ...` as a SUBPROCESS with its own JVM,
    not an in-process main() call. The application file is the repo-root
    submit_job.py shim (spark-submit has no `-m module` mode and
    fuzi_spark/job.py's relative imports need package context — a defect
    this test caught: the docstring previously advertised both broken
    shapes). The shim is copied to a scratch cwd, so `import fuzi_spark`
    can only be satisfied by the --py-files zip — proving the zip is
    self-contained (a missing module in the zip fails this test, where
    the in-process TestJobCLI would still pass via the repo checkout on
    sys.path)."""

    def _build_zip(self, tmp_path):
        import zipfile

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pkg = os.path.join(repo, "fuzi_spark")
        zpath = str(tmp_path / "fuzi_spark.zip")
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _dirs, files in os.walk(pkg):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
        return zpath

    def test_spark_submit_py_files_matches_in_process(self, spark, tmp_path):
        import shutil
        import subprocess
        import sys as _sys

        spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
        if not os.path.exists(spark_submit):
            pytest.skip("spark-submit binary not available")

        from fuzi_spark.corpus import corpus_df
        from fuzi_spark.pipeline import run_extraction_pipeline

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        inp = str(tmp_path / "docs")
        out = str(tmp_path / "out")
        docs = corpus_df(spark, include_fixtures=True, skew=False)
        n_docs = docs.count()
        docs.write.parquet(inp)

        env = dict(os.environ)
        env["PYSPARK_PYTHON"] = _sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = _sys.executable
        env.pop("PYTHONPATH", None)  # the zip must carry the package
        # copy the shim into the scratch cwd: its own directory lands on
        # sys.path, and it must NOT be the repo root
        shim = str(tmp_path / "submit_job.py")
        shutil.copyfile(os.path.join(repo, "submit_job.py"), shim)
        proc = subprocess.run(
            [
                spark_submit,
                "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--py-files", self._build_zip(tmp_path),
                shim,
                "--input", inp, "--output", out,
                "--n-buckets", "4", "--num-partitions", "4",
            ],
            cwd=str(tmp_path),  # NOT the repo root: no checkout on sys.path
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        assert summary["docs"] == n_docs
        assert summary["parse_errors"] == 0

        # the subprocess deployment must produce byte-identical span rows
        # to the same pipeline run in-process
        sub_spans = spark.read.parquet(os.path.join(out, "spans"))
        ref_spans, _ = run_extraction_pipeline(
            spark, docs, n_buckets=4, num_partitions=4
        )
        cols = [c for c in ref_spans.columns]
        got = sorted(
            tuple(r) for r in sub_spans.select(*cols).collect()
        )
        want = sorted(tuple(r) for r in ref_spans.collect())
        assert got == want
