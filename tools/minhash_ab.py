"""A/B check: one-pass aggregate minhash vs the round-2 per-slot transform.
Asserts identical values at sf0.01, times both at sf0.1."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fuzi_spark.ops.dedup import minhash_signatures, shingle_hashes

spark = (
    SparkSession.builder.master("local[32]")
    .appName("minhash-ab")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "32g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def old_signatures(df, n_hashes=64, seed=42, shingles_col="_sh"):
    hashed = df.select(F.col("doc_id"), F.col(shingles_col).alias("_sh2"))

    def _perm(slot_seed):
        return lambda h: F.xxhash64(h, F.lit(slot_seed))

    sig_cols = [
        F.array_min(F.transform(F.col("_sh2"), _perm(seed * 1_000_003 + i))).alias(
            f"mh{i}"
        )
        for i in range(n_hashes)
    ]
    return hashed.select("doc_id", *sig_cols)


def docs(sf):
    d = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
    return (
        d.repartition(64)
        .select("doc_id", shingle_hashes("text", 3).alias("_sh"))
        .persist()
    )


# equivalence at sf0.01
d = docs("sf0.01")
d.count()
new = minhash_signatures(d, shingles_col="_sh", n_hashes=64)
old = old_signatures(d, n_hashes=64)
diff = new.exceptAll(old).count() + old.exceptAll(new).count()
print(f"sf0.01 diff rows: {diff}")
assert diff == 0, "value mismatch!"
d.unpersist()

# timing at sf0.1
d = docs("sf0.1")
d.count()
for name, fn in [("old", old_signatures), ("new", minhash_signatures)]:
    for rep in range(3):
        t0 = time.time()
        if name == "old":
            n = fn(d, n_hashes=64).agg(F.count("*")).collect()[0][0]
        else:
            n = fn(d, shingles_col="_sh", n_hashes=64).agg(F.count("*")).collect()[0][0]
        print(f"{name} rep{rep}: {time.time()-t0:.2f}s rows={n}")
spark.stop()
