"""Deterministic synthetic table generators (reference CLI `write` parity).

The reference generates seeded synthetic tables with mt19937
(src/cli.cpp:29-118 — the 5-column CLI table; benches/benchmark.cpp:42-95
— the 4-column 1M-row benchmark table).  The Spark-native equivalent is
``spark.range`` + column expressions: fully distributed (each partition
generates its slice — no driver materialization) and deterministic given
the seed, via a splittable hash of (seed, id) rather than a sequential
Mersenne Twister, which cannot be parallelized.  Distributions match the
reference's shapes (sequential id, uniform ints, small-domain categories,
fixed string lists); exact bit-parity with mt19937 is a non-goal (the
reference's own tests never assert generator values, only round-trips).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CLI_REGIONS = ("north", "south", "east", "west")
CLI_STATUSES = ("active", "pending", "closed")
BENCH_REGIONS = (
    "north",
    "south",
    "east",
    "west",
    "northeast",
    "northwest",
    "southeast",
    "southwest",
)


def _uniform_long(seed: int, salt: str, lo: int, hi: int) -> F.Column:
    """Deterministic uniform integer in [lo, hi] derived from the row id."""
    h = F.xxhash64(F.col("id"), F.lit(salt), F.lit(seed))
    return (F.pmod(h, F.lit(hi - lo + 1)) + F.lit(lo)).cast("long")


def _pick(seed: int, salt: str, values: tuple[str, ...]) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    idx = F.pmod(F.xxhash64(F.col("id"), F.lit(salt), F.lit(seed)), F.lit(len(values)))
    return F.element_at(arr, (idx + 1).cast("int"))


def cli_table(spark: SparkSession, num_rows: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Reference CLI synthetic table (src/cli.cpp:29-62): id, value,
    category, region, status."""
    rng = spark.range(0, num_rows, numPartitions=partitions) if partitions else spark.range(num_rows)
    return rng.select(
        F.col("id").cast("long").alias("id"),
        _uniform_long(seed, "value", 0, 10_000).alias("value"),
        _uniform_long(seed, "category", 1, 5).cast("int").alias("category"),
        _pick(seed, "region", CLI_REGIONS).alias("region"),
        _pick(seed, "status", CLI_STATUSES).alias("status"),
    )


def bench_table(spark: SparkSession, num_rows: int = 1_000_000, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Reference benchmark table (benches/benchmark.cpp:42-95): id,
    value (0..100000), score (1..10), region (8 values)."""
    rng = spark.range(0, num_rows, numPartitions=partitions) if partitions else spark.range(num_rows)
    return rng.select(
        F.col("id").cast("long").alias("id"),
        _uniform_long(seed, "value", 0, 100_000).alias("value"),
        _uniform_long(seed, "score", 1, 10).cast("int").alias("score"),
        _pick(seed, "region", BENCH_REGIONS).alias("region"),
    )


DOC_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark line "
    "sort window join shard token corpus model train filter dedup stream page "
    "group index plan query stage block cache spill probe build fetch emit "
    "split chunk frame byte codec store flush"
).split()

DOC_LANGS = ("en", "fr", "es", "de")
DOC_SOURCES = ("src0", "src1", "src2", "src3", "src4")


def docs_table(
    spark: SparkSession,
    num_rows: int,
    seed: int = 42,
    dup_frac_mod: int = 10,
    vocab_scale: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """Synthetic documents table (same schema as the driver fixture:
    doc_id, text, lang, source, n_chars) at arbitrary scale — the input
    for scaling probes of the dedup/text operators beyond the fixture's
    row counts.

    Fully distributed: each partition generates its id slice with
    splittable xxhash64 draws.  Every ``dup_frac_mod``-th document is a
    verbatim copy of the previous one, so exact and near-dup operators
    have real duplicates to find at every scale.  ``vocab_scale``
    multiplies the effective vocabulary (word + numeric suffix): at 1 the
    corpus mimics the small-vocab driver fixture; at ≥1000 token sets are
    sparse like real text, so near-dup candidates stay ≈ true duplicates
    when probing at millions of documents.
    """
    rng = (
        spark.range(0, num_rows, numPartitions=partitions)
        if partitions
        else spark.range(num_rows)
    )
    # duplicates: id % mod == 1 copies id - 1's text (same generator seed)
    gen_id = F.when(
        (F.col("id") % dup_frac_mod == 1) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    n_tok = (F.pmod(F.xxhash64(gen_id, F.lit("len"), F.lit(seed)), F.lit(25)) + 15).cast("int")
    vocab = F.array(*[F.lit(w) for w in DOC_VOCAB])

    def token(i):
        h = F.xxhash64(gen_id, i, F.lit(seed))
        word = F.element_at(
            vocab, (F.pmod(h, F.lit(len(DOC_VOCAB))) + 1).cast("int")
        )
        if vocab_scale <= 1:
            return word
        return F.concat(
            word, F.pmod(F.xxhash64(h, F.lit("sfx")), F.lit(vocab_scale)).cast("string")
        )

    text = F.concat_ws(" ", F.transform(F.sequence(F.lit(1), n_tok), token))
    return rng.select(
        F.col("id").cast("long").alias("doc_id"),
        text.alias("text"),
        _pick(seed, "lang", DOC_LANGS).alias("lang"),
        _pick(seed, "source", DOC_SOURCES).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def embeddings_table(
    spark: SparkSession,
    num_rows: int,
    dim: int = 64,
    n_clusters: int = 50,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Synthetic embeddings table (driver-fixture schema: vec_id,
    embedding array<float>, label) at arbitrary scale — the input for
    scaling probes of the similarity operators beyond the fixture's
    2k rows.

    Fully distributed and deterministic: each partition generates its
    id slice with splittable xxhash64 draws, no driver-side data.  Rows
    cluster around ``n_clusters`` fixed centers (component offsets in
    [-1, 1]) with small per-row noise, so approximate indexes (IVF/LSH)
    have real locality structure to exploit at every scale: a vector's
    true nearest neighbors are overwhelmingly its cluster-mates, and an
    IVF probe of a few lists can actually achieve high recall — an
    unclustered uniform cloud would make every ANN method look
    uniformly bad.  ``label`` is the cluster id.
    """
    rng = (
        spark.range(0, num_rows, numPartitions=partitions)
        if partitions
        else spark.range(num_rows)
    )
    cluster = F.pmod(F.xxhash64(F.col("id"), F.lit("c"), F.lit(seed)), F.lit(n_clusters))

    def component(j):
        center = (
            F.pmod(F.xxhash64(cluster, j, F.lit("ctr"), F.lit(seed)), F.lit(2001))
            - 1000
        ) / 1000.0
        noise = (
            F.pmod(F.xxhash64(F.col("id"), j, F.lit("nz"), F.lit(seed)), F.lit(201))
            - 100
        ) / 1000.0
        return (center + noise).cast("float")

    vec = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), component)
    return rng.select(
        F.col("id").cast("long").alias("vec_id"),
        vec.alias("embedding"),
        cluster.cast("int").alias("label"),
    )
