"""Sort / limit / sample operators (SURVEY.md §2.6).

``orderBy(...).limit(k)`` plans TakeOrderedAndProject — per-partition
top-k + a k-row merge on the driver, never a full sort. That IS the
100-TB plan for top-k; a global ORDER BY without LIMIT is the one shape
to avoid at scale (range-partitioned full sort).

Every ordered query fully tie-breaks its keys (SURVEY.md §5.3 hazard 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "sort_multikey",
    oracle="""
SELECT o_orderkey, NULLIF(o_orderpriority, '5-LOW') AS prio_or_null,
       o_totalprice
FROM orders
ORDER BY prio_or_null ASC NULLS FIRST, o_totalprice DESC, o_orderkey
LIMIT 50
""",
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULL placement (NULLs manufactured
    via nullif; the LIMIT makes sort order observable under the driver's
    order-insensitive hash)."""
    o = load_table(spark, sf_dir, "orders")
    prio = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))
    return (
        o.select("o_orderkey", prio.alias("prio_or_null"), "o_totalprice")
        .orderBy(
            F.col("prio_or_null").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            "o_orderkey",
        )
        .limit(50)
    )


@register(
    "limit_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 10
""",
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (asserted in test_plans)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@register("tablesample")  # rows-only: sampling seeds don't align across engines
def tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling with a fixed seed — reproducible within Spark,
    but not across engines, so no SQL oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "sample_hash",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substr(md5(CAST(l_orderkey * 4 + l_linenumber AS VARCHAR)), 1, 2)
      < '1a'
""",
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by content hash — the reproducible
    alternative to seeded Bernoulli sampling.

    ``md5(row key) < threshold`` picks the same rows in every engine, on
    every run, at every partitioning — which is what a 100-TB pipeline
    actually needs from a sample: re-runs, audits and downstream joins
    against the sample all see the same rows ('1a'/'100' ≈ 10.2% of the
    16-bit hash prefix space). Seeded ``sample()`` (the ``tablesample``
    key) is faster per row but engine- and partitioning-specific.
    """
    li = load_table(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 4 + F.col("l_linenumber")).cast("string")
    return li.filter(F.substring(F.md5(key), 1, 2) < "1a").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


#: per-stratum 1-in-k grid: view 1/10, click 1/3, everything rare kept.
_STRAT_K = {"view": 10, "click": 3}


@register(
    "sample_stratified",
    oracle="""
WITH r AS (
  SELECT event_id, event_type, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM events
)
SELECT event_id, event_type, user_id
FROM r
WHERE (rn - 1) % (CASE event_type WHEN 'view' THEN 10
                                  WHEN 'click' THEN 3 ELSE 1 END) = 0
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling, deterministic systematic variant: per-stratum
    1-in-k grids over a defined order (every 10th 'view', every 3rd
    'click', all rare classes kept).

    Downsample dominant classes while keeping rare ones — the
    class-rebalancing step of a training-data pipeline. The systematic
    kernel (`sample_systematic` per stratum) replaces seeded Bernoulli
    coin flips so the sample is reproducible across engines and runs —
    audits get EXACTLY ⌈n_s/k_s⌉ rows per stratum, not a rate hit only
    in expectation. The rank window partitions by stratum; at 100 TB a
    dominant stratum's sort is replaced by range partitioning +
    per-partition offsets (the `zorder_layout` trick), or by the seeded
    map-side variant (`sample_stratified_seeded`) when run-to-run
    reproducibility isn't required.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    k = F.coalesce(
        *[
            F.when(F.col("event_type") == s, F.lit(kk))
            for s, kk in _STRAT_K.items()
        ],
        F.lit(1),
    )
    return (
        ev.select(
            "event_id",
            "event_type",
            "user_id",
            F.row_number().over(w).alias("rn"),
        )
        .where((F.col("rn") - 1) % k == 0)
        .drop("rn")
    )


#: per-stratum Bernoulli keep-fractions for sample_stratified_seeded.
_STRATA_FRACTIONS = {
    "view": 0.1, "click": 0.3, "purchase": 1.0, "error": 1.0, "signup": 1.0
}
_STRATA_SEED = 7


def _hex_threshold(f: float) -> str:
    """8-hex-char threshold for fraction ``f`` of 32-bit hash space.

    Fixed-length lowercase hex compares lexicographically exactly like
    the integer it encodes, so ``substr(md5(..),1,8) < threshold`` is a
    deterministic Bernoulli(f) gate in ANY engine that renders md5 as
    lowercase hex. f >= 1 returns 'g', which every hex string sorts
    below (keep-all)."""
    return "g" if f >= 1.0 else format(int(f * 2**32), "08x")


@register(
    "sample_stratified_seeded",
    oracle="SELECT event_id, event_type, user_id FROM events WHERE "
    "substr(md5(event_id::VARCHAR || ':" + str(_STRATA_SEED) + "'), 1, 8) < "
    "CASE event_type "
    + " ".join(
        f"WHEN '{et}' THEN '{_hex_threshold(f)}'"
        for et, f in sorted(_STRATA_FRACTIONS.items())
    )
    + " ELSE 'g' END",
)
def sample_stratified_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified seeded sampling: per-stratum Bernoulli keep-fractions
    via a deterministic md5 coin flip — the map-side, shuffle-free
    sibling of `sample_stratified` (no stratum materialization, no
    window), and reproducible across engines AND across runs.

    ``sampleBy`` compiles to this exact plan shape (a per-row filter
    with per-stratum thresholds) but keys its coins to Spark's private
    RNG stream, which no oracle can replay. Hashing a stable row key
    with the seed instead (``md5(event_id || ':seed')``, first 8 hex
    chars vs a per-stratum threshold — lexicographic compare on
    fixed-length lowercase hex IS numeric compare) gives the same
    Bernoulli semantics with a portable coin, which is what promotes
    this key from rows-only to oracle-hash-checked (the
    `dedup_minhash_sql` md5-portability move; VERDICT r5 task 6).
    Hash-keyed sampling is also the production-correct choice at 100 TB:
    the decision for a row never depends on partitioning, task retries,
    or row order, so re-runs and incremental loads sample consistently.
    Realized-rate bounds are asserted in tests/test_pipeline.py.
    """
    ev = load_table(spark, sf_dir, "events")
    coin = F.substring(
        F.md5(F.concat(F.col("event_id").cast("string"), F.lit(f":{_STRATA_SEED}"))),
        1, 8,
    )
    thr = F.lit("g")
    for et, f in sorted(_STRATA_FRACTIONS.items()):
        thr = F.when(F.col("event_type") == et, F.lit(_hex_threshold(f))).otherwise(thr)
    return ev.filter(coin < thr).select("event_id", "event_type", "user_id")


@register(
    "cache_reuse",
    oracle="""
WITH base AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS cents,
         COUNT(*) AS n
  FROM orders GROUP BY o_custkey
)
SELECT 'big_spenders' AS segment, COUNT(*) AS n_cust
FROM base WHERE cents > 50000000
UNION ALL
SELECT 'frequent' AS segment, COUNT(*) AS n_cust
FROM base WHERE n >= 20
""",
)
def cache_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-intermediate reuse: ``persist`` + two consumers.

    The iterative-workload surface: an expensive aggregate is computed
    once, cached (memory-and-disk, serialized at scale), and consumed by
    two branches; without the persist each branch would re-run the
    shuffle. ``unpersist`` is the caller's job when the fan-out ends —
    here it's deliberately left to executor eviction (LRU), the correct
    default when downstream reuse count is unknown. At 100 TB prefer
    `StorageLevel.MEMORY_AND_DISK` (the default) — recomputation of a
    wide shuffle costs more than local-disk spill reads.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        F.count(F.lit(1)).alias("n"),
    ).persist()
    big = (
        base.filter(F.col("cents") > 50000000)
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .select(F.lit("big_spenders").alias("segment"), "n_cust")
    )
    freq = (
        base.filter(F.col("n") >= 20)
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .select(F.lit("frequent").alias("segment"), "n_cust")
    )
    return big.unionAll(freq)


#: bits per dimension in the z-order interleave (2 dims × 10 bits).
_Z_BITS = 10


def _z_interleave_sql(xcol: str, ycol: str) -> str:
    """Bit-interleave expression text, valid in both Spark SQL and DuckDB.

    z = Σ_i ((x>>i)&1) << 2i  |  ((y>>i)&1) << (2i+1) — unrolled to a
    constant-folded sum of shifts so the same text runs JVM-side in
    whole-stage codegen and in the oracle.
    """
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "zorder_layout",
    oracle=f"""
WITH dims AS (
  SELECT o_orderkey,
         CAST(o_custkey % {1 << _Z_BITS} AS BIGINT) AS x,
         CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
              % {1 << _Z_BITS} AS BIGINT) AS y
  FROM orders
),
z AS (
  SELECT o_orderkey, x, y,
         CAST({_z_interleave_sql('x', 'y')} AS BIGINT) AS zval
  FROM dims
)
SELECT zval >> 14 AS z_bucket,
       COUNT(*) AS n_rows,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max
FROM z
GROUP BY zval >> 14
""",
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering key + per-bucket locality stats.

    Multi-dimensional pruning needs a SINGLE sort key under which files
    stay tight in EVERY dimension — sorting by (x, y) gives perfect x
    pruning and useless y pruning. Interleaving the bits of both dims
    (the Morton curve) bounds each z-range to a small rectangle, so
    file-level min/max stats prune on x AND y predicates at once — the
    layout trick behind Delta/Iceberg OPTIMIZE ZORDER, built here from
    20 unrolled shift-and-mask terms that stay inside whole-stage
    codegen (the identical expression text is the oracle's).

    The query reports, per top-bits z-bucket, the row count and the
    x/y bounding box — the exact numbers a scan planner would read from
    file footers; the bounded box widths ARE the pruning guarantee. At
    100 TB: compute z map-only in the scan, ``repartitionByRange(z)``,
    ``sortWithinPartitions(z)``, write — one range shuffle total
    (sink_sorted_clustered demonstrates that write path; this operator
    keeps the curve math and its locality proof hash-checked).
    """
    o = load_table(spark, sf_dir, "orders")
    dims = o.select(
        "o_orderkey",
        (F.col("o_custkey") % (1 << _Z_BITS)).cast("long").alias("x"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            % (1 << _Z_BITS)
        )
        .cast("long")
        .alias("y"),
    )
    z = dims.select(
        "o_orderkey",
        "x",
        "y",
        F.expr(f"CAST({_z_interleave_sql('x', 'y')} AS BIGINT)").alias("zval"),
    )
    return (
        z.groupBy(F.expr("zval >> 14").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


@register(
    "sample_weighted",
    oracle="""
WITH u AS (
  SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents WHERE n_chars > 0
),
keys AS (
  SELECT doc_id, n_chars,
         ( (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) ) AS u_int
  FROM u
)
SELECT doc_id, n_chars,
       CAST(FLOOR(ln((u_int + 0.5) / 65536.0) / n_chars * 1000000000000.0)
            AS BIGINT) AS es_key
FROM keys
ORDER BY es_key DESC, doc_id
LIMIT 100
""",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis–Spirakis A-ES scheme (keys u^(1/w), equivalently ranked
    by ln(u)/w) with the uniform u derived from an md5 content hash
    instead of an RNG — the same 100 documents are chosen on every
    engine, every run, every partitioning, with inclusion probability
    proportional to weight (n_chars here; any positive quality score in
    a corpus pipeline).

    Why this matters at 100 TB: weighted reservoir sampling is the
    standard way to build a quality-weighted training subset in ONE
    pass; the hash-uniform variant additionally makes the sample
    REPRODUCIBLE (audits and incremental re-runs see the same subset)
    and embarrassingly parallel — each row computes its key map-side,
    and the global top-k is TakeOrderedAndProject (per-partition heaps,
    never a full sort).

    Determinism discipline: u comes from 16 bits of the md5 (hex chars
    mapped through strpos — portable with no hex-to-int builtin), is
    offset to (0,1) so ln() never sees 0, and the libm-dependent
    ``ln(u)/w`` is floor-gridded at 1e-12 before the ORDER BY — both
    engines rank identical BIGINTs with a doc_id tie-break.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    digits = "0123456789abcdef"
    u_int = sum(
        (
            (F.expr(f"instr('{digits}', substr(md5(CAST(doc_id AS STRING)), {i + 1}, 1))") - 1)
            * (16 ** (3 - i))
        )
        for i in range(4)
    )
    es_key = F.floor(
        F.log((u_int + F.lit(0.5)) / F.lit(65536.0))
        / F.col("n_chars")
        * F.lit(1e12)
    ).cast("long")
    return (
        d.select("doc_id", "n_chars", es_key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(100)
    )


#: systematic sampling interval: every k-th record in key order.
_SYS_K = 20


@register(
    "sample_systematic",
    oracle=f"""
WITH r AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice
FROM r WHERE rn % {_SYS_K} = 1
""",
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic sampling: every k-th record in a defined total order
    — the survey-methodology rung next to `sample_hash` (content-hash
    Bernoulli) and `sample_stratified`: when the sort key spreads a
    latent trend (time, id sequence), a 1-in-k grid inherits
    stratification over that trend for free, with EXACTLY ⌈n/k⌉ rows
    (hash sampling only hits the rate in expectation — audits that
    need a fixed count use this).

    The caveat is also classic — a periodicity in the data that
    divides k biases the sample — which is why the key and k are
    explicit in the plan. The global ROW_NUMBER runs over the sort
    order; at 100 TB the same grid comes shuffle-free from
    `zorder_layout`-style range partitioning + per-partition offsets
    (documented; the fixture-scale window is the readable form).
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") % _SYS_K == 1)
        .drop("rn")
    )


_BOTTOM_K = 500


@register(
    "sample_bottom_k",
    oracle=f"""
SELECT l_orderkey, l_linenumber, l_quantity,
       md5(CAST(l_orderkey * 8 + l_linenumber AS VARCHAR)) AS pri
FROM lineitem
ORDER BY pri
LIMIT {_BOTTOM_K}
""",
)
def sample_bottom_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k deterministic sample: every row gets an md5 priority
    and the k smallest win — the bottom-k-by-hash sample, the shape to
    reach for when a pipeline needs EXACTLY k rows from a table of
    unknown size (fraction gates like `sample_hash` return a binomial
    count, seeded `sample()` isn't portable). The same k rows come back
    in every engine, on every run, at any partitioning, and appending
    data only ever swaps members in — bottom-k sketches compose across
    shards by unioning per-shard bottom-k and re-trimming.

    The plan is TakeOrderedAndProject: each partition keeps a local
    k-heap, the driver merges 32 heaps — no global sort, no shuffle of
    the data, O(k) memory per task. At 100 TB that is the ONLY viable
    exact-k sample; it reads every row once and moves only k·partitions
    candidates.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pri = F.md5(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("string")
    )
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", pri.alias("pri"))
        .orderBy("pri")
        .limit(_BOTTOM_K)
    )
