"""Measured IVF-PQ recall@k vs brute force (the operating-point curve).

The `similarity_ivfpq` oracle pins the planted invariant (rerank covers
the probed cells ⇒ exact behavior); this tool measures what the PQ
shortlist actually costs in recall when it GENUINELY prunes — the
operating point a 100 TB deployment runs at, where rerank is a small
fraction of the probed population. Protocol mirrors the round-3
embedding-LSH recall measurement (BASELINE.md §Round 3):

1. queries = the first N_QUERIES table vectors perturbed by the
   deterministic 0.005-radian formula (`_planted_probes` shape, but
   recall is measured against the FULL brute-force top-k, not just the
   planted original — misses anywhere count);
2. ground truth = cosine_topk_bruteforce top-k over all vectors;
3. sweep (n_probe, rerank); recall@k = |IVFPQ top-k ∩ brute top-k| /
   (k · n_queries). Demo PQ codebook (m=8, k=4 — deliberately coarse:
   a 4-centroid/subspace code is the WORST realistic codebook, so
   these numbers are a floor, not a showcase).

Writes one JSON with the grid. A floor is pinned in
tests/test_ops.py::TestIvfPq (exactness when rerank covers the cells);
the curve here quantifies the funnel between that and tight budgets.

Usage: python tools/ivfpq_recall.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from fuzi_spark.ops.cache import cache_scope  # noqa: E402
from fuzi_spark.ops.similarity import (  # noqa: E402
    cosine_topk_bruteforce,
    cosine_topk_ivfpq,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
K = 10
N_QUERIES = 50
GRID = [(2, 16), (2, 64), (4, 16), (4, 64), (4, 200), (8, 64), (12, 64), (16, 64)]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "RECALL_ivfpq_r3.json"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    probes = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: x + F.lit(0.005) * F.sin(x * F.lit(1000.0)),
        ).alias("embedding"),
    )
    truth = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(vecs, probes, k=K).collect()
    }
    n_cells = 16
    result = {
        "protocol": (
            f"recall@{K} vs brute force, {N_QUERIES} perturbed queries, "
            f"n_cells={n_cells}, TRAINED pq_train codebooks m=8 k=256 (capped at sample), normalized ADC"
        ),
        "sf": SF,
        "grid": [],
    }
    for n_probe, rerank in GRID:
        with cache_scope():
            got = {
                (r.query_id, r.neighbor_id)
                for r in cosine_topk_ivfpq(
                    vecs,
                    probes,
                    k=K,
                    n_cells=n_cells,
                    n_probe=n_probe,
                    rerank=rerank,
                ).collect()
            }
        recall = len(got & truth) / len(truth)
        result["grid"].append(
            {
                "n_probe": n_probe,
                "rerank": rerank,
                "recall_at_k": round(recall, 4),
            }
        )
        print(f"n_probe={n_probe} rerank={rerank} recall@{K}={recall:.4f}")

    # plain-IVF baseline at the same probe counts: separates IVF cell-
    # probing loss (shared) from the PQ shortlist's own loss, plus the
    # all-cells sanity row (must be 1.0 — IVF with every cell probed
    # IS brute force)
    from fuzi_spark.ops.similarity import cosine_topk_ivf

    result["ivf_baseline"] = []
    for n_probe in (2, 4, 8, n_cells):
        with cache_scope():
            got = {
                (r.query_id, r.neighbor_id)
                for r in cosine_topk_ivf(
                    vecs, probes, k=K, n_cells=n_cells, n_probe=n_probe
                ).collect()
            }
        recall = len(got & truth) / len(truth)
        result["ivf_baseline"].append(
            {"n_probe": n_probe, "recall_at_k": round(recall, 4)}
        )
        print(f"ivf n_probe={n_probe} recall@{K}={recall:.4f}")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
