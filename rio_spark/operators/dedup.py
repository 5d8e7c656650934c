"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), SimHash, and n-gram Jaccard — every stage is built-in column ops
(split / transform / aggregate / md5 / explode / self-join), so the whole
family is JVM-side, shuffle-efficient, and oracle-checkable: hashes are
md5-based on purpose, because md5 is identically defined in Spark and DuckDB
(xxhash64 is not), which makes the driver's side-by-side correctness gate
meaningful.

Scale notes (100 TB): exact dedup is one shuffle on a 32-hex-char key;
MinHash-LSH replaces the quadratic all-pairs comparison with a band-bucket
self-join whose fan-out is bounded by bucket size — hot buckets (boilerplate
docs) are the skew risk, handled by AQE skew-join plus an optional bucket-size
cap; candidate verification re-checks true Jaccard only within candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def normalize_text(col):
    """Lowercase, collapse non-alphanumerics to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def let_col(value, fn):
    """Let-binding for column expressions: evaluate ``value`` ONCE and refer
    to it via a lambda variable inside ``fn``.

    Catalyst's CollapseProject inlines aliased subexpressions into every use
    site, and common-subexpression elimination does not reach through lambda
    functions — so an expression like a minhash signature built on a
    tokenization can otherwise be re-evaluated 10-20x per row (measured: the
    LSH banding Generate re-ran the whole signature per band, 19.7s -> <2s at
    sf0.1 after binding). ``transform`` over a one-element array is the
    optimizer-stable way to bind: the value is computed once per row, all
    inner references are to the lambda variable."""
    return F.element_at(F.transform(F.array(value), fn), 1)


def tokens_col(col):
    return F.split(normalize_text(col), " ")


def shingles_col(col, n: int = 3):
    """Token n-gram shingles as an array column (empty-safe); the
    tokenization is let-bound so it evaluates once however often the caller's
    plan references the shingles."""
    return let_col(
        tokens_col(col),
        lambda toks: F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " "))),
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups on normalized text.

    -> (doc_id, rep_id, group_size): rep_id = min doc_id of the group. One
    hash-aggregate shuffle on the md5 key; map-side partial aggregation
    applies because the key is derived, not the full text."""
    keyed = docs.select(
        F.col(id_col).alias("doc_id"), F.md5(normalize_text(F.col(text_col))).alias("h")
    )
    groups = keyed.groupBy("h").agg(
        F.min("doc_id").alias("rep_id"), F.count("*").alias("group_size")
    )
    return keyed.join(groups, "h").select("doc_id", "rep_id", "group_size")


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    shingle: int = 3,
) -> DataFrame:
    """-> (doc_id, sig array<string> of k minhashes).

    minhash_i = min over shingles of md5('{i}:' || shingle) — k independent
    permutations approximated by salted hashes; all inside one projection
    (no shuffle, no Python). The shingle array is let-bound so it is built
    once per row, not once per permutation."""

    def mh(sh, idx: int):
        # NB: the lambda must be unary — a two-arg lambda would receive the
        # array index as its second argument and clobber the salt
        salt = F.lit(f"{idx}:")
        return F.array_min(F.transform(sh, lambda s: F.md5(F.concat(salt, s))))

    sig = let_col(
        shingles_col(F.col(text_col), shingle),
        lambda sh: F.array(*[mh(sh, i) for i in range(k)]),
    )
    return docs.select(F.col(id_col).alias("doc_id"), sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    shingle: int = 3,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    k minhashes split into `bands` bands of k/bands rows; docs sharing any
    band signature become a candidate pair. -> (doc_a, doc_b) with
    doc_a < doc_b, distinct. The self-join runs on (band_id, band_sig) —
    a narrow key — and never materializes the quadratic pair space.

    ``bucket_cap`` bounds the hot-bucket blowup: a band bucket of f docs
    (boilerplate corpora produce them) would emit f(f-1)/2 join rows — a
    job-killer at 100 TB even though the join key is narrow. With a cap,
    each over-cap bucket keeps only its ``bucket_cap`` lowest doc_ids
    (deterministic), and the output grows a ``truncated`` boolean marking
    pairs that came only from capped buckets — so recall loss is observable,
    not silent. Cost of the cap: one extra window pass on the same
    (band_id, band_sig) shuffle key the join needs anyway."""
    assert k % bands == 0
    rows = k // bands
    sigs = minhash_signatures(docs, id_col, text_col, k, shingle)
    # let-bind the signature: CollapseProject would otherwise inline the full
    # minhash expression into the Generate once PER BAND (measured 10x cost)
    band_arr = let_col(
        F.col("sig"),
        lambda sig: F.array(
            *[F.array_join(F.slice(sig, b * rows + 1, rows), "|") for b in range(bands)]
        ),
    )
    banded = sigs.select(
        "doc_id",
        F.posexplode(band_arr).alias("band_id", "band_sig"),
    )
    if bucket_cap is not None:
        bw = W.partitionBy("band_id", "band_sig")
        banded = (
            banded.select(
                "*",
                F.row_number().over(bw.orderBy("doc_id")).alias("_rn"),
                (F.count("*").over(bw) > bucket_cap).alias("_trunc"),
            )
            .filter(F.col("_rn") <= bucket_cap)
            .drop("_rn")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    joined = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_sig") == F.col("b.band_sig"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    if bucket_cap is None:
        return joined.select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        ).distinct()
    # a pair is marked truncated only if EVERY bucket that produced it was
    # over-cap (an un-capped band vouching for the pair means nothing was
    # lost for it); min(bool) == bool_and
    return (
        joined.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a._trunc").alias("_trunc"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.min("_trunc").alias("truncated"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate verification.

    Explodes distinct shingles, self-joins on shingle (inverted-index join —
    only docs sharing a shingle ever meet), counts intersections, computes
    |A∩B| / (|A|+|B|-|A∩B|). -> (doc_a, doc_b, jaccard) above threshold.

    ``max_df`` is the hot-shingle guard (standard prefix filtering): a
    boilerplate shingle shared by f documents ("all rights reserved ...")
    makes the inverted-index join emit f(f-1)/2 rows — quadratic on exactly
    the corpora dedup targets. Shingles with document frequency > max_df are
    dropped from BOTH the intersection and the size denominators, so the
    result is exact Jaccard over the df-capped shingle universe: ubiquitous
    shingles carry no discriminative signal, and a pair supported only by
    them is never a threshold>=0.8 near-duplicate."""
    ex = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles_col(F.col(text_col), n))).alias("sh"),
    )
    if max_df is not None:
        # df filter = one aggregate + equi-join on the same `sh` key the
        # inverted-index join shuffles on anyway; AQE broadcasts the surviving
        # shingle list when it's small
        keep = ex.groupBy("sh").agg(F.count("*").alias("df")).filter(
            F.col("df") <= max_df
        ).select("sh")
        ex = ex.join(keep, "sh")
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_bits(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 bits: int = 16) -> DataFrame:
    """SimHash fingerprint as a bit string (cross-engine checkable).

    bit_i of a token = parity of the i-th hex nibble of md5(token); the doc
    bit is the sign of the sum of (2*bit-1) over tokens. -> (doc_id, simhash
    string of '0'/'1'). Hamming distance between fingerprints approximates
    cosine similarity of token multisets."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("t"),
    ).withColumn("h", F.md5("t"))
    aggs = [
        F.sum(
            F.when(F.ascii(F.substring("h", i + 1, 1)) % 2 == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_doc = tok.groupBy("doc_id").agg(*aggs)
    bitstr = F.concat(
        *[F.when(F.col(f"b{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(bits)]
    )
    return per_doc.select("doc_id", bitstr.alias("simhash"))


def near_dup_groups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    shingle: int = 3,
    bucket_cap: int | None = None,
) -> DataFrame:
    """End-to-end near-duplicate grouping: MinHash-LSH candidate pairs ->
    connected components -> (doc_id, group_id) for every doc in a near-dup
    cluster, group_id = lexicographic min doc_id of the cluster.

    This is the full 100 TB dedup shape: the pair graph is only LSH
    candidates (never all-pairs), and the transitive closure runs on that
    sparse edge set via the hub-safe large/small-star CC — the same operator
    the KG alias merge uses, reused as-is. Docs in no cluster are omitted
    (joining back for singletons is a trivial left join the caller owns)."""
    from rio_spark.operators.canonicalize import connected_components

    pairs = minhash_lsh_pairs(docs, id_col, text_col, k, bands, shingle, bucket_cap)
    cc = connected_components(pairs.select("doc_a", "doc_b"), src="doc_a", dst="doc_b")
    return cc.select(F.col("node").alias("doc_id"), F.col("component").alias("group_id"))


def decontaminate(
    docs: DataFrame,
    benchmarks: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_bench_df: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: n-gram overlap of every corpus document
    against a held-out benchmark/eval set — the contamination check a
    training-data pipeline runs before any corpus ships to training.

    -> (doc_id, bench_id, overlap) for pairs where ``overlap`` — the
    fraction of the BENCHMARK item's distinct n-grams contained in the
    document (containment toward the benchmark, the standard direction:
    a 10 GB document trivially shares grams with everything, but a doc
    holding most of a benchmark item's grams has memorized it) — is at
    least ``threshold``.  Callers typically anti-join the corpus against
    ``result.select("doc_id").distinct()`` as the contamination gate.

    Plan shape (the 100 TB story): the benchmark side is SMALL by nature
    (thousands of eval items vs billions of docs), so its exploded
    inverted index (bench_id, gram) and its per-item gram counts are
    broadcast — the corpus side is a single map-side scan + broadcast
    hash join + one map-side-combinable aggregate on (doc_id, bench_id);
    the corpus is never shuffled and no all-pairs space exists.
    ``max_bench_df`` is the boilerplate guard, same role as
    ``ngram_jaccard_pairs(max_df=)`` but computed on the small side: a
    gram shared by more than ``max_bench_df`` benchmark ITEMS (a common
    instruction preamble) is dropped from both the index and the
    denominators, bounding the per-corpus-row join fan-out at
    ``max_bench_df`` and keeping the overlap score discriminative."""
    bench_ex = benchmarks.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(F.array_distinct(shingles_col(F.col(bench_text_col), n))).alias("g"),
    )
    if max_bench_df is not None:
        keep = (
            bench_ex.groupBy("g")
            .agg(F.count("*").alias("bdf"))
            .filter(F.col("bdf") <= max_bench_df)
            .select("g")
        )
        bench_ex = bench_ex.join(keep, "g")
    bench_sz = bench_ex.groupBy("bench_id").agg(F.count("*").alias("bench_sz"))
    corpus_ex = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles_col(F.col(text_col), n))).alias("g"),
    )
    inter = (
        corpus_ex.join(F.broadcast(bench_ex), "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(F.broadcast(bench_sz), "bench_id")
        .withColumn("overlap", F.col("inter") / F.col("bench_sz"))
        .filter(F.col("overlap") >= threshold)
        .select("doc_id", "bench_id", F.round("overlap", 6).alias("overlap"))
    )
