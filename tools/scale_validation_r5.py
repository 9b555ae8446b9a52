"""Round-5 scale-out validation of the round-4 rework (VERDICT item
3): run the global_rank / assign_ids / set-similarity / MinHash-LSH
battery at sf1-equivalent scale (~6M-row tables, an order of
magnitude past the sf0.1 bench) on a DETERMINISTIC synthetic corpus
(spark.range + xxhash64 expressions — no external data, same-input
reproducibility), and record:

- per-query wall seconds + output row counts,
- CORRECTNESS invariants at scale (rank contiguity/uniqueness,
  planted near-dup recall),
- PLAN spot-checks: every Window carries a partition spec (the r3
  single-reducer regression must stay dead), no CartesianProduct
  anywhere, and for global_rank the sampled three-pass path is the
  one actually exercised (sample_cap << n).

Writes SCALE_r5.json; the summary lands in BASELINE.md §Round 5.

Run: python tools/scale_validation_r5.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

QUICK = "--quick" in sys.argv
N_RANK = 600_000 if QUICK else 6_000_000
N_IDS = 600_000 if QUICK else 6_000_000
N_SETJOIN = 20_000 if QUICK else 200_000
N_MINHASH = 200_000 if QUICK else 2_000_000


def session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .appName("scale_validation_r5")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


def plan_checks(df, require_partitioned_windows=True):
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad_windows = []
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "Window" in line:
            if "specifiedwindowframe" in line and \
                    "windowspecdefinition()" in line.replace(" ", ""):
                bad_windows.append(line.strip()[:160])
    assert "CartesianProduct" not in plan, "cartesian product in plan"
    if require_partitioned_windows:
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                # a partitioned window lists its partition cols before
                # the ordering spec; the r3 regression had none
                assert "#" in line.split("windowspecdefinition", 1)[1], \
                    line
    return {"cartesian": False, "bad_windows": bad_windows}


def main():
    from pyspark.sql import functions as F

    from fuzi_spark.ops.cache import cache_scope
    from fuzi_spark.ops.dedup import minhash_lsh_candidates
    from fuzi_spark.ops.relational import (
        assign_contiguous_ids,
        global_rank,
    )
    from fuzi_spark.ops.setjoin import set_similarity_join

    spark = session()
    out = {"quick": QUICK, "cores": 32}

    # ---- 1. global_rank over a Zipf composite key, sampled path ----
    # ~83% of keys share df==1 (the vocab-rank shape): bucketing on
    # the numeric column alone collapses; only (df, token) splits it.
    t0 = time.time()
    base = spark.range(N_RANK).select(
        F.when(F.col("id") % 6 != 0, F.lit(1)).otherwise(
            (F.pmod(F.xxhash64("id", F.lit(1)), 97) + 2)
        ).cast("long").alias("df"),
        F.format_string("tok%09d", F.col("id")).alias("token"),
    )
    ranked = global_rank(base, ["df", "token"], n_buckets=64)
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rank").alias("mn"),
        F.max("rank").alias("mx"),
        F.countDistinct("rank").alias("nd"),
    ).collect()[0]
    el = time.time() - t0
    assert agg.n == N_RANK and agg.mn == 1 and agg.mx == N_RANK \
        and agg.nd == N_RANK, agg
    pc = plan_checks(ranked)
    out["global_rank"] = {
        "rows": N_RANK, "seconds": round(el, 2),
        "rank_contiguous": True, "plan": pc,
        "sampled_path": N_RANK > 65536,
    }
    print("global_rank:", out["global_rank"], flush=True)

    # ---- 2. assign_contiguous_ids over 6M unique numeric keys ----
    t0 = time.time()
    keys = spark.range(N_IDS).select(
        (F.xxhash64("id") % 1_000_000_007).alias("k"))
    keys = keys.dropDuplicates(["k"])
    n_keys = keys.count()
    ids = assign_contiguous_ids(keys, "k", n_buckets=64)
    agg = ids.agg(
        F.count(F.lit(1)).alias("n"), F.min("new_id").alias("mn"),
        F.max("new_id").alias("mx"),
        F.countDistinct("new_id").alias("nd")).collect()[0]
    el = time.time() - t0
    assert agg.n == n_keys and agg.nd == n_keys and \
        agg.mx - agg.mn + 1 == n_keys, agg
    out["assign_ids"] = {"rows": int(n_keys), "seconds": round(el, 2),
                         "contiguous": True}
    print("assign_ids:", out["assign_ids"], flush=True)

    # ---- 3. exact set-similarity join with planted near-dup pairs --
    # every 100th doc gets a twin sharing 7 of its 8 tokens:
    # J = 7/9 = 0.778 >= 0.7 -> must ALL be found (exact join).
    t0 = time.time()
    vocab = 200_000
    toks = [
        F.format_string(
            "w%07d",
            F.pmod(F.xxhash64(F.col("base"), F.lit(i)), vocab))
        for i in range(8)
    ]
    docs = spark.range(N_SETJOIN).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.when(
            (F.col("id") % 100 == 1) & (F.col("id") >= 1),
            F.lit(1)).otherwise(F.lit(0))).alias("base"),
        (F.col("id") % 100 == 1).cast("int").alias("is_twin"),
    ).select(
        "doc_id",
        F.concat_ws(
            " ", *toks[:-1],
            F.when(F.col("is_twin") == 1,
                   F.format_string("twin%09d", F.col("doc_id")))
            .otherwise(toks[-1])).alias("text"),
    )
    with cache_scope():
        pairs = set_similarity_join(docs, threshold=0.7)
        pc = plan_checks(pairs)
        planted_found = pairs.filter(
            (F.col("id_b") - F.col("id_a") == 1)
            & (F.col("id_b") % 100 == 1)).count()
        total_pairs = pairs.count()
    el = time.time() - t0
    n_planted = (N_SETJOIN - 2) // 100 + 1
    assert planted_found == n_planted, (planted_found, n_planted)
    out["set_similarity"] = {
        "docs": N_SETJOIN, "seconds": round(el, 2),
        "planted": n_planted, "planted_found": planted_found,
        "total_pairs": int(total_pairs), "plan": pc,
    }
    print("set_similarity:", out["set_similarity"], flush=True)

    # ---- 4. MinHash-LSH candidates, planted exact dups ----
    # every 50th doc is an exact copy of its predecessor: identical
    # shingle sets -> identical signatures -> every band collides ->
    # candidate recall on planted pairs must be 1.0.
    t0 = time.time()
    words = [
        F.format_string(
            "t%06d",
            F.pmod(F.xxhash64(F.col("base"), F.lit(i)), 50_000))
        for i in range(12)
    ]
    docs2 = spark.range(N_MINHASH).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.when(
            (F.col("id") % 50 == 1) & (F.col("id") >= 1),
            F.lit(1)).otherwise(F.lit(0))).alias("base"),
    ).select("doc_id", F.concat_ws(" ", *words).alias("text"))
    with cache_scope():
        cands = minhash_lsh_candidates(
            docs2, n_hashes=64, bands=16, shingle_n=3)
        planted_found = cands.filter(
            (F.col("id_b") - F.col("id_a") == 1)
            & (F.col("id_b") % 50 == 1)).count()
    el = time.time() - t0
    n_planted = (N_MINHASH - 2) // 50 + 1
    assert planted_found == n_planted, (planted_found, n_planted)
    out["minhash_lsh"] = {
        "docs": N_MINHASH, "seconds": round(el, 2),
        "planted": n_planted, "planted_found": planted_found,
    }
    print("minhash_lsh:", out["minhash_lsh"], flush=True)

    spark.stop()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
