"""Stage attribution of the extraction job's wall time.

The bench measures end-to-end docs/sec; this tool answers WHERE the time
goes, with a ladder of jobs that each add one stage over the same corpus:

  scan        parquet read + spans column decode (sum(size(spans)))
  + codec     JVM-side span→markup reassembly (sum(length(markup)))
  + arrow     identity mapInPandas over (doc_id, markup) — Arrow
              serialization + Python-worker round-trip, zero Python work
  + parse     DOM construction per doc (parse only, spans discarded)
  + classify  full extract_spans_df (parse + boilerplate classify +
              span-row emission)
  + pipeline  run_extraction_pipeline (adds weight/bucket, skew salting,
              lineage aggregation) — the bench's measured job

Adjacent deltas attribute wall time per stage. Each rung is measured
min-of-2 after a warm-up rung run, all in ONE fixed-cores session (the
ladder compares stages against each other, not cluster sizes — same-JVM
bias cancels in the deltas). Corpus: the bench's own deterministic
builder (bench.build_bench_corpus) so numbers line up with
BENCH_LOCAL_*.json.

Usage: python tools/extract_profile.py [cores] [doc_copies] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: corpus builder + session cfg)
from fuzi_spark.pipeline import run_extraction_pipeline  # noqa: E402
from fuzi_spark.udfs import extract_spans_df, markup_from_spans_col  # noqa: E402


def _measure_rungs(rungs) -> dict:
    """Warm every rung once, then two mirrored passes (forward, reverse),
    min per rung. Back-to-back per-rung sampling lets a co-tenant burst
    land entirely inside one rung and fake a stage delta; mirrored
    round-robin spreads drift across all rungs symmetrically (same
    reasoning as bench.py's scaling-child protocol)."""
    for _, fn in rungs:
        fn()  # warm: JIT, codegen, python workers, parquet footers
    times = {name: [] for name, _ in rungs}
    for order in (list(rungs), list(reversed(rungs))):
        for name, fn in order:
            t0 = time.time()
            fn()
            times[name].append(time.time() - t0)
    return {name: round(min(ts), 3) for name, ts in times.items()}


def ladder(spark, corpus_path: str, cores: int) -> dict:
    docs = spark.read.parquet(corpus_path)
    n_docs = docs.count()

    def scan():
        docs.agg(F.sum(F.size("spans"))).collect()

    markup = docs.select("doc_id", markup_from_spans_col("spans").alias("markup"))

    def codec():
        markup.agg(F.sum(F.length("markup"))).collect()

    def _identity(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_chars": pdf["markup"].str.len()}
            )

    ident = markup.mapInPandas(_identity, schema="doc_id string, n_chars long")

    def arrow():
        ident.agg(F.sum("n_chars")).collect()

    def _parse_only(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from fuzi_spark.htmlparser import parse_html

        for pdf in batches:
            ok = []
            for m in pdf["markup"].to_numpy():
                try:
                    ok.append(int(parse_html(m) is not None))
                except Exception:
                    ok.append(0)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ok": ok})

    parsed = markup.mapInPandas(_parse_only, schema="doc_id string, ok int")

    def parse():
        parsed.agg(F.sum("ok")).collect()

    extracted = extract_spans_df(docs, "html")

    def classify():
        extracted.agg(F.sum(F.when(F.col("seq") >= 0, 1).otherwise(0))).collect()

    def pipeline():
        _, lineage = run_extraction_pipeline(
            spark, docs, output_dir=None, n_buckets=64,
            num_partitions=cores * bench.PARTS_MULT, doc_type="html",
        )
        lineage.count()

    rungs = [
        ("scan", scan), ("codec", codec), ("arrow", arrow),
        ("parse", parse), ("classify", classify), ("pipeline", pipeline),
    ]
    cum = _measure_rungs(rungs)
    names = [n for n, _ in rungs]
    deltas = {
        names[0]: cum[names[0]],
        **{
            b: round(max(cum[b] - cum[a], 0.0), 3)
            for a, b in zip(names, names[1:])
        },
    }
    return {
        "cores": cores,
        "n_docs": n_docs,
        "cumulative_secs": cum,
        "stage_delta_secs": deltas,
        "docs_per_sec_full": round(n_docs / cum["pipeline"], 1),
    }


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else bench.DOC_COPIES
    tmp = tempfile.mkdtemp(prefix="fuzi_profile_")
    corpus_path = os.path.join(tmp, "corpus")
    spark = bench.make_session(cores, "extract-profile")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        bench.build_bench_corpus(spark, bench.SF_DIR, copies, corpus_path)
        out = ladder(spark, corpus_path, cores)
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
