"""Exact set-similarity self-join via prefix filtering (PPJoin family).

The EXACT counterpart to MinHash LSH for near-duplicate discovery:
prefix filtering (Chaudhuri et al. ICDE'06; Bayardo et al. WWW'07;
Vernica et al. SIGMOD'10 for the MapReduce formulation) guarantees
ZERO false negatives at a Jaccard threshold t — where LSH trades a
controlled miss probability for speed, prefix filtering trades a
larger (but still aggressively pruned) candidate set for exactness.
A compliance-grade dedup (licensing, eval-set decontamination with
contractual guarantees) wants this; a best-effort corpus pass wants
LSH; the engine ships both against the same verify stage.

The pruning invariant: order every document's distinct tokens by a
GLOBAL canonical order (ascending document frequency, ties on the
token string — rarest first, so prefixes hit the fewest documents);
if J(A, B) >= t then A and B MUST share a token within the first
    L(x) = |x| - ceil(t * |x|) + 1
tokens of each (if they shared none, the overlap is at most
min(|A|,|B|) - L < t*max ≤ required). Candidates therefore come from
an equi-join on prefix tokens only, then exact Jaccard (JVM
array_intersect over the full sorted token arrays) decides.

Spark shape:
- ONE token-df aggregation (map-side partials) → the global order is
  a (token, rank) table ranked by `global_rank` (ops/relational) —
  sample-bounded range buckets + partitioned per-bucket windows, so
  the shingle universe never meets an unpartitioned row_number;
  broadcast if vocabulary-sized, sort-merge joined otherwise
  (`broadcast_vocab`);
- per-doc sorted token-rank arrays built with array_sort (ranks are
  ints — the sort is codegen'd, no Python);
- prefix explode emits L(x) rows per doc — for t=0.8 that is ~20% of
  the token mass, and the rarest 20% at that;
- the (token, id_a < id_b) self-equi-join + distinct gives candidate
  pairs; length filter |B| >= ceil(t*|A|) prunes size-incompatible
  pairs BEFORE the verify (the standard length filter);
- exact verify: |A∩B| / |A∪B| on the int-rank arrays.

Reference parity note: no counterpart in the reference (Fuzi is a
parse/query library) — pipeline-brief scope, the exactness-grade
member of the dedup family (ops/dedup.py module note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import scoped_persist
from .relational import global_rank

TOKEN_RE = "[a-z0-9]{2,}"


def _token_sets(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    if shingle_n > 1:
        # word-shingle sets (dedup.word_shingles — identical slice
        # semantics to the dedup family's oracles): order-sensitive,
        # so boilerplate-heavy corpora with shared vocabulary don't
        # degenerate into everything-similar — and the much larger
        # shingle universe keeps the rarest-first prefixes SELECTIVE
        from .dedup import word_shingles

        items = F.array_distinct(word_shingles(text_col, shingle_n))
    else:
        items = F.array_distinct(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(TOKEN_RE),
                F.lit(0),
            )
        )
    return df.select(
        F.col(id_col).alias("sid"), items.alias("toks")
    ).filter(F.size("toks") > 0)


def set_similarity_join(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
    shingle_n: int = 1,
) -> DataFrame:
    """All pairs (id_a < id_b) with set Jaccard >= threshold —
    EXACTLY (no false negatives, verified no false positives).
    Returns (id_a, id_b, jaccard). shingle_n=1 compares TOKEN sets
    (entity/title resolution); shingle_n>=2 compares word-SHINGLE
    sets (near-dup documents — order-sensitive, and the larger
    item universe keeps prefixes selective on small-vocabulary
    corpora, where token sets degenerate into everything-similar)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    t = float(threshold)
    sets_ = _token_sets(df, text_col, id_col, shingle_n)
    # global canonical order: ascending df, ties on token — computed
    # once; a (vocab-sized) rank table. Ranked by global_rank
    # (ops/relational): sample-bounded range buckets + PARTITIONED
    # per-bucket windows — no unpartitioned row_number, so the
    # vocabulary (the shingle universe in shingle mode — far larger
    # than any token vocabulary at corpus scale) never funnels
    # through one reducer. The rank table is persisted because
    # global_rank's count/sample passes would otherwise recompute the
    # tokenize + df-agg lineage three times.
    vocab = scoped_persist(
        sets_.select("sid", F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    vocab = global_rank(
        vocab, ["df", "token"], n_buckets=64, rank_name="rank"
    ).select("token", "rank")
    v = F.broadcast(vocab) if broadcast_vocab else vocab
    # persisted: read three times below (prefix explode + the two
    # rank-array join-backs)
    ranked = scoped_persist(
        sets_.select("sid", F.explode("toks").alias("token"))
        .join(v, "token")
        .groupBy("sid")
        .agg(F.array_sort(F.collect_list("rank")).alias("ranks"))
        .withColumn("n", F.size("ranks"))
    )
    prefix_len = (
        F.col("n") - F.ceil(F.lit(t) * F.col("n").cast("double")) + 1
    ).cast("int")
    # keys-first candidate generation: the prefix equi-join carries
    # ONLY (id, n, p) — the full rank arrays stay out of the candidate
    # shuffle and join back exactly once per side after the pair-level
    # dropDuplicates (the shuffle-payload discipline
    # embedding_near_dups documents, ops/similarity.py)
    pref = ranked.select(
        "sid",
        "n",
        F.explode(F.slice("ranks", F.lit(1), prefix_len)).alias("p"),
    )
    a = pref.select(
        F.col("sid").alias("id_a"), F.col("n").alias("na"), "p"
    )
    b = pref.select(
        F.col("sid").alias("id_b"), F.col("n").alias("nb"), "p"
    )
    # length filter: J >= t forces t*|A| <= |B| <= |A|/t
    cands = (
        a.join(b, "p")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (F.col("nb").cast("double") >= F.lit(t) * F.col("na"))
            & (F.col("na").cast("double") >= F.lit(t) * F.col("nb"))
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ra = ranked.select(
        F.col("sid").alias("id_a"), F.col("ranks").alias("ra")
    )
    rb = ranked.select(
        F.col("sid").alias("id_b"), F.col("ranks").alias("rb")
    )
    inter = F.size(F.array_intersect("ra", "rb")).cast("double")
    union = F.size(F.array_union("ra", "rb")).cast("double")
    return (
        cands.join(ra, "id_a")
        .join(rb, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= t)
        .select("id_a", "id_b", "jaccard")
    )
