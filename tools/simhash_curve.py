"""SimHash operating-point curve: hamming distance & operator recall vs
token-mutation rate.

Completes the measured-recall trio (minhash_recall.py for MinHash-LSH,
the pinned organic-cosine test for embedding LSH): where those measure a
probabilistic banding family against theory, SimHash's candidate join is
pigeonhole-EXACT for hamming ≤ max_hamming — so this tool measures two
different things and cross-checks them:

1. the EMPIRICAL link between text similarity and fingerprint hamming
   distance (what similarity does a hamming-3 operating point actually
   capture on prose-shaped token docs?), and
2. that the chunked candidate join recovers EXACTLY the planted pairs at
   hamming ≤ max_hamming — any gap between "pairs at hamming ≤ 3" and
   "pairs the operator returned" is a bug, not noise (asserted here).

Usage: python tools/simhash_curve.py [n_pairs_per_rate] [out.json]
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from fuzi_spark.ops.cache import cache_scope  # noqa: E402
from fuzi_spark.ops.dedup import (  # noqa: E402
    bitvote64,
    simhash_near_dups,
    token_hashes_col,
)
from tools.minhash_recall import MUTATION_RATES, build_corpus  # noqa: E402

MAX_HAMMING = 3


def measure(spark: SparkSession, n_pairs_per_rate: int = 200):
    rows, planted = build_corpus(n_pairs_per_rate)
    docs = spark.createDataFrame(rows, "doc_id string, text string").repartition(
        spark.sparkContext.defaultParallelism
    )
    with cache_scope():
        fp = (
            docs.select(
                "doc_id", token_hashes_col("text").alias("_th")
            )
            .select("doc_id", bitvote64(F.col("_th")).alias("sh"))
            .collect()
        )
        found = {
            (r.id_a, r.id_b)
            for r in simhash_near_dups(docs, max_hamming=MAX_HAMMING).collect()
        }
    sh = {r.doc_id: r.sh for r in fp}
    hamming = {
        pr: bin((sh[pr[0]] ^ sh[pr[1]]) & ((1 << 64) - 1)).count("1")
        for pr in planted
    }
    # pigeonhole exactness: planted pairs at hamming <= k are found, and
    # no planted pair above k is (found may ALSO contain accidental
    # non-planted pairs — those are fine, they're real near-dup hashes)
    for pr, h in hamming.items():
        assert (pr in found) == (h <= MAX_HAMMING), (pr, h, pr in found)

    out = {"max_hamming": MAX_HAMMING, "n_pairs": len(planted), "buckets": []}
    for p in MUTATION_RATES:
        prs = [pr for pr, rate in planted.items() if rate == p]
        hs = sorted(hamming[pr] for pr in prs)
        rec = sum(1 for pr in prs if hamming[pr] <= MAX_HAMMING) / len(prs)
        out["buckets"].append(
            {
                "mutation_rate": p,
                "n_pairs": len(prs),
                "hamming_median": hs[len(hs) // 2],
                "hamming_p90": hs[int(len(hs) * 0.9)],
                "recall_at_h3": round(rec, 4),
            }
        )
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("simhash-curve")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        out = measure(spark, n)
    finally:
        spark.stop()
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
