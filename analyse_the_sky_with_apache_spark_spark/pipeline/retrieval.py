"""Retrieval & corpus-hygiene operators: BM25 ranking, an inverted
index, Gopher-style repetition metrics, and a prefix-filtered set
similarity join (the PPJoin-family scale rung above the plain
all-shingles join in ``dedup.py``).

These complete the training-data story: tfidf/pmi (text.py) score
terms, these rank DOCUMENTS for a query, materialize the index that
makes such ranking cheap at serving time, flag degenerate repetitive
docs (the classic LLM-corpus quality cut of Rae et al.'s Gopher rules),
and find near-duplicate token SETS with a candidate space far below the
all-pairs or all-tokens joins.

Determinism: every ratio is a division of exact integer counts (both
engines produce the identical double); the one libm-dependent value
(BM25's ln) is floor-scaled to integer micro-units per term so the
per-document SUM is an exact long, then divided once — following the
text_tfidf precedent but removing even the ordered-float-sum hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: BM25 free parameters (the standard Robertson defaults).
_K1, _B = 1.2, 0.75
_BM25_TERMS = ("spark", "scan", "merge")


@register(
    "text_bm25",
    oracle=f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         COUNT(*) AS n_docs
  FROM dl
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM words
  WHERE word IN ('spark', 'scan', 'merge') GROUP BY doc_id, word
),
df AS (
  SELECT word, COUNT(DISTINCT doc_id) AS df FROM words
  WHERE word IN ('spark', 'scan', 'merge') GROUP BY word
)
SELECT doc_id,
       CAST(SUM(CAST(FLOOR(
         ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
         * (tf * ({_K1} + 1.0))
         / (tf + {_K1} * (1.0 - {_B} + {_B} * dl / avgdl))
         * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS bm25
FROM tf JOIN df USING (word) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 50
""",
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking for a fixed term query, fully relational:
    tokenize → (tf per doc, df per term, doc length, corpus avgdl) →
    per-term score → per-doc sum → top-50.

    Scale shape: the WHERE word IN (...) prunes the exploded token
    stream to query terms BEFORE any aggregation, so tf is tiny; df and
    the length/avgdl stats are one aggregation each over the token
    stream; stats broadcast as a 1-row cross join. The expensive object
    — the full postings — is never materialized here (that is
    ``text_inverted_index``); a 100-TB corpus ranks a query by reading
    the index instead, but the scoring expression is identical.

    Determinism: ln() is libm-dependent (Java vs DuckDB may differ in
    the last ulp), so each per-term score is floor-scaled to integer
    micro-units and the per-doc SUM runs on exact longs — no
    ordered-float-sum hazard — then one final division. Top-50 is
    tie-broken by doc_id.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    dl = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    q = words.filter(F.col("word").isin(*_BM25_TERMS))
    tf = q.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = q.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    term_score = (
        idf
        * (F.col("tf") * F.lit(_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(_K1)
            * (F.lit(1.0 - _B) + F.lit(_B) * F.col("dl") / F.col("avgdl"))
        )
    )
    micro = F.floor(term_score * F.lit(1e6) + F.lit(0.5))
    return (
        tf.join(F.broadcast(df), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg((F.sum(micro).cast("double") / F.lit(1e6)).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(50)
    )


@register(
    "text_inverted_index",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word
)
SELECT word, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
       string_agg(lpad(CAST(doc_id AS VARCHAR), 6, '0') || ':'
                  || CAST(tf AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM tf GROUP BY word
""",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term → (document frequency, collection
    frequency, sorted posting list of doc:tf pairs). The batch-layer
    artifact that makes BM25/boolean retrieval an index lookup instead
    of a corpus scan.

    One explode + two aggregations, both keyed by term — at 100 TB the
    token stream shuffles once on (doc, term) for tf and once on term
    for the posting assembly; hot terms (stopword-class df) are the
    skew hazard, handled by AQE skew splitting during the shuffle and
    bounded in memory because a posting LIST for a stopword should be
    range-partitioned at write time anyway (the doc_id sort key makes
    the list splittable). Postings serialize as zero-padded doc:tf
    strings so the driver-hashable column is flat AND lexicographic
    order equals numeric order (the round-1 nested-column lesson).
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    entry = F.concat(
        F.lpad(F.col("doc_id").cast("string"), 6, "0"),
        F.lit(":"),
        F.col("tf").cast("string"),
    )
    return tf.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.array_join(F.array_sort(F.collect_list(entry)), ",").alias("postings"),
    )


@register(
    "text_repetition",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
pos AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks
),
tok_stats AS (
  SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT w) AS n_distinct
  FROM pos GROUP BY doc_id
),
big AS (
  SELECT a.doc_id, a.w || ' ' || b.w AS bg
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
bg_counts AS (
  SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY doc_id, bg
),
bg_stats AS (
  SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram
  FROM bg_counts GROUP BY doc_id
)
SELECT t.doc_id, n_tokens,
       CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
       CAST(top_bigram AS DOUBLE) / n_bigrams AS top_bigram_frac
FROM tok_stats t JOIN bg_stats b ON t.doc_id = b.doc_id
WHERE n_tokens >= 10
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per document: distinct-token
    ratio and the share of all bigrams taken by the single most
    repeated bigram — the degenerate-text signals (keyboard mash,
    boilerplate loops, template spam) the classic LLM-corpus quality
    rules cut on (Rae et al. 2021's repetition filters, re-expressed
    relationally; the fixture docs are single-line so the line-dup
    variant of the rule is vacuous here and the n-gram form is the
    operative one).

    Plan: ONE posexplode of the token array feeds both the token stats
    and, self-joined on (doc, position+1), the bigram stream — at scale
    the bigram construction is better done with a window lead() per
    document partition, but the fixture arrays are short; both forms
    shuffle once on doc_id. All outputs are ratios of exact integer
    counts — no float hazards.
    """
    d = load_table(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    )
    tok_stats = pos.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_distinct"),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    big = (
        pos.withColumn("nxt", F.lead("w").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "w", "nxt").alias("bg"))
    )
    bg_counts = big.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    bg_stats = bg_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram")
    )
    return (
        tok_stats.join(bg_stats, "doc_id")
        .filter(F.col("n_tokens") >= 10)
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
                "distinct_ratio"
            ),
            (F.col("top_bigram").cast("double") / F.col("n_bigrams")).alias(
                "top_bigram_frac"
            ),
        )
    )


@register(
    "join_set_similarity",
    oracle="""
WITH toks AS (
  SELECT DISTINCT doc_id,
         t[i::INT] || ' ' || t[i::INT + 1] || ' ' || t[i::INT + 2] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       range(1, 500) g(i)
  WHERE i + 2 <= len(t)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
freq AS (SELECT w, COUNT(*) AS df FROM toks GROUP BY w),
ranked AS (
  SELECT t.doc_id, t.w,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY f.df, t.w)
           AS rarity_rank,
         sz
  FROM toks t JOIN freq f ON t.w = f.w JOIN sizes s ON t.doc_id = s.doc_id
),
prefix AS (
  SELECT doc_id, w FROM ranked
  WHERE rarity_rank <= sz - ((sz + 1) // 2) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM prefix a JOIN prefix b ON a.w = b.w AND a.doc_id < b.doc_id
),
overlap AS (
  SELECT c.a, c.b, COUNT(*) AS ov
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.a
  JOIN toks tb ON tb.doc_id = c.b AND tb.w = ta.w
  GROUP BY c.a, c.b
)
SELECT o.a, o.b, ov, sa.sz AS size_a, sb.sz AS size_b,
       CAST(ov AS DOUBLE) / (sa.sz + sb.sz - ov) AS jaccard
FROM overlap o
JOIN sizes sa ON sa.doc_id = o.a
JOIN sizes sb ON sb.doc_id = o.b
WHERE 2 * ov >= sa.sz + sb.sz - ov
""",
)
def join_set_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity join with PREFIX FILTERING (the SSJoin/PPJoin
    family, Chaudhuri et al. 2006 / Xiao et al. 2008): all document
    pairs whose 3-word-shingle-SET Jaccard ≥ 1/2, without enumerating
    all pairs AND without joining on every shared shingle.

    Set elements are 3-word shingles, not single tokens — on a small
    shared vocabulary single-token sets are degenerate (every doc
    nearly equals every other as a SET; measured 965k pairs at sf0.1),
    while the shingle universe is combinatorial, which is also what
    real near-dup pipelines shingle on.

    The prefix principle: order each set by global shingle rarity; two
    sets with Jaccard ≥ t MUST share an element within each other's
    first ``|s| - ceil(t·|s|) + 1`` rarest elements. Joining only on
    prefix shingles shrinks the candidate space doubly — fewer join
    keys per doc, and the kept keys are the RAREST, so each key's
    bucket is small (the hot-shingle skew of the all-shingles join in
    dedup_ngram_jaccard simply never enters the candidate join). This
    is the designed 100-TB rung: candidate generation shuffles about
    half the shingles per doc, chosen to be low-frequency, then exact
    verification joins only the candidates.

    Exactness: the prefix length uses pure integer math
    (``ceil(s/2) = (s+1) div 2``), rarity is totally ordered by
    (df, shingle-hash) — the prefix principle holds under ANY global
    total order, so hashing the shingles (below) doesn't disturb it —
    and the Jaccard threshold is the cross-multiplied integer
    inequality ``2·ov ≥ sa+sb−ov`` — no float enters any membership
    decision; the reported jaccard is one exact-operand division.
    Shingle identity itself is w.h.p.-exact (64-bit internal hash,
    measured 3.9 s → 2.3 s at sf0.1; see the inline note).
    """
    d = load_table(spark, sf_dir, "documents")
    # per-row array_distinct BEFORE the explode: set semantics with no
    # global dedup shuffle (a .distinct() here cost 4.2 s of the 8.2 s
    # total at sf0.1 — the whole shingle stream shuffled just to dedup
    # within-doc repeats that executors can drop for free).
    # shingles are hashed to 64-bit longs at birth: `w` is an INTERNAL
    # key (rarity ranking, candidate join, array_intersect verify) that
    # never reaches the output, so an 8-byte hash replaces the ~25-char
    # string in every downstream shuffle/checkpoint/sort (collision
    # odds at 260k distinct shingles ≈ 4e-9 — w.h.p.-exact, same
    # stance as dedup_substring_spans' internal digest).
    toks = (
        d.select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            # cap positions at 499 to mirror the oracle's range(1, 500)
            # — same asymmetry class as _dup_spans/corpus_ngram_novelty
            # (ADVICE round 4): both sides must enumerate identical
            # shingle positions on >501-token docs.
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(1, least(size(t) - 2, 499)),"
                    " i -> xxhash64(concat_ws(' ', t[i-1], t[i], t[i+1]))))"
                )
            ).alias("w"),
        )
    )
    # materialize the shingle table once: it feeds rarity ranking AND both
    # sides of the verification join — without this the explode+distinct
    # lineage re-executes three times (warm 8.2 s → 4.8 s at sf0.1 together with the array_distinct rewrite).
    # At 100 TB this is a persisted shingle table, not a checkpoint.
    toks = toks.localCheckpoint(eager=True)
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    rank_w = Window.partitionBy("doc_id").orderBy("df", "w")
    ranked = (
        toks.join(F.broadcast(freq), "w")
        .join(sizes, "doc_id")
        .withColumn("rarity_rank", F.row_number().over(rank_w))
    )
    prefix_len = F.col("sz") - F.expr("(sz + 1) div 2") + F.lit(1)
    prefix = (
        ranked.filter(F.col("rarity_rank") <= prefix_len)
        .select("doc_id", "w", "sz", "rarity_rank")
        .localCheckpoint(eager=True)  # joined to itself below
    )
    pa = prefix.select(
        F.col("doc_id").alias("a"),
        "w",
        F.col("sz").alias("sza"),
        F.col("rarity_rank").alias("ra"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("b"),
        "w",
        F.col("sz").alias("szb"),
        F.col("rarity_rank").alias("rb"),
    )
    # Two exact PPJoin pruning tests inside the candidate join:
    # - LENGTH filter: J ≥ 1/2 forces set sizes within 2× of each other
    #   (t·|a| ≤ |b| ≤ |a|/t ⇔ 2·min ≥ max);
    # - POSITIONAL filter (Xiao et al.): both prefixes are ordered by
    #   the same global rarity order, so at a match sitting at ranks
    #   (ra, rb), overlap ≤ 1 + min(sza−ra, szb−rb); the threshold
    #   needs ov ≥ ceil((sza+szb)/3) (from 3·ov ≥ sza+szb), i.e. keep
    #   only matches with 3·ubound ≥ sza+szb. A truly-qualifying
    #   pair's FIRST shared prefix shingle always passes, so the OR
    #   over matches (the distinct) loses nothing — exactness
    #   preserved, candidates cut before the dedup shuffle and the
    #   verification join (309k → far fewer at sf0.1).
    ubound = F.lit(1) + F.least(
        F.col("sza") - F.col("ra"), F.col("szb") - F.col("rb")
    )
    cand = (
        pa.join(pb, "w")
        .filter(
            (F.col("a") < F.col("b"))
            & (F.lit(2) * F.least("sza", "szb") >= F.greatest("sza", "szb"))
            & (F.lit(3) * ubound >= F.col("sza") + F.col("szb"))
        )
        .select("a", "b")
        .distinct()
    )
    # verification via co-located ARRAY intersection: ship each doc's
    # sorted shingle array to its candidate pairs (two hash joins on doc
    # id) and count the overlap with array_intersect — versus the
    # row-level plan (cand ⋈ shingles of a ⋈ shingles of b) this
    # removes the candidate×shingle fan-out shuffle entirely; the
    # per-pair intersection runs JVM-side on co-located arrays.
    docs_arr = toks.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("w")).alias("ws")
    )
    arr_a = docs_arr.select(F.col("doc_id").alias("a"), F.col("ws").alias("wsa"))
    arr_b = docs_arr.select(F.col("doc_id").alias("b"), F.col("ws").alias("wsb"))
    overlap = (
        cand.join(arr_a, "a")
        .join(arr_b, "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("wsa", "wsb")).cast("long").alias("ov"),
        )
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("size_b"))
    union_sz = F.col("size_a") + F.col("size_b") - F.col("ov")
    return (
        overlap.join(sa, "a")
        .join(sb, "b")
        .filter(F.lit(2) * F.col("ov") >= union_sz)
        .select(
            "a",
            "b",
            "ov",
            "size_a",
            "size_b",
            (F.col("ov").cast("double") / union_sz).alias("jaccard"),
        )
    )


@register(
    "text_perplexity",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
pos AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks
),
big AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
bi_c AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
uni_c AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM pos)
SELECT d.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(CAST(FLOOR(
         -ln((c12 + 1.0) / (c1 + v)) * 1000000.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 1000000.0 / COUNT(*) AS cross_entropy
FROM big d
JOIN bi_c  ON d.w1 = bi_c.w1 AND d.w2 = bi_c.w2
JOIN uni_c ON d.w1 = uni_c.w1
CROSS JOIN vocab
GROUP BY d.doc_id
""",
)
def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model perplexity scoring — the CCNet-style corpus
    quality signal: train an add-one-smoothed bigram model on the
    corpus itself, then score every document's cross-entropy under it
    (high = unnatural/degenerate text, the cut LLM pipelines make
    after the rule-based Gopher gate).

    Fully relational LM training AND scoring: bigram/unigram counts
    are two aggregations, the model joins back to each document's
    bigram occurrences (the join IS the inference), and vocab size
    rides a 1-row broadcast. At 100 TB the model tables are
    term-keyed aggregates a fraction of corpus size; scoring shuffles
    the bigram stream once on w1/w2 — or broadcast the model when the
    vocabulary fits, making inference map-side.

    Determinism: each -ln(p) is floor-gridded to micro-nats, so the
    per-doc sum is an exact long and the division by the (integer)
    bigram count is one identical double op — no ordered-float-sum
    hazard on top of libm's ln.
    """
    d = load_table(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    )
    wlead = Window.partitionBy("doc_id").orderBy("i")
    big = (
        pos.withColumn("w2", F.lead("w").over(wlead))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.col("w").alias("w1"), "w2")
    )
    bi_c = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni_c = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = pos.agg(F.countDistinct("w").alias("v"))
    neg_ln_p = -F.log(
        (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
    )
    micro = F.floor(neg_ln_p * F.lit(1e6) + F.lit(0.5))
    return (
        big.join(F.broadcast(bi_c), ["w1", "w2"])
        .join(F.broadcast(uni_c), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum(micro).cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1))
            ).alias("cross_entropy"),
        )
    )


@register(
    "text_zipf_fit",
    oracle="""
WITH freq AS (
  SELECT w, COUNT(*) AS f FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
  ) GROUP BY w
),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY f DESC, w) AS r, f FROM freq
),
g AS (
  SELECT CAST(FLOOR(ln(r) * 1000000.0 + 0.5) AS BIGINT) AS xm,
         CAST(FLOOR(ln(f) * 1000000.0 + 0.5) AS BIGINT) AS ym
  FROM ranked
),
s AS (
  SELECT COUNT(*) AS n, CAST(SUM(xm) AS BIGINT) AS sx,
         CAST(SUM(ym) AS BIGINT) AS sy,
         CAST(SUM(xm * ym) AS BIGINT) AS sxy,
         CAST(SUM(xm * xm) AS BIGINT) AS sxx
  FROM g
)
SELECT n AS n_types,
       CAST(n * sxy - sx * sy AS DOUBLE)
       / CAST(n * sxx - sx * sx AS DOUBLE) AS zipf_slope,
       (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
        / CAST(n * sxx - sx * sx AS DOUBLE) * sx)
       / CAST(n AS DOUBLE) / 1000000.0 AS intercept_ln
FROM s
""",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: the slope of
    log-frequency vs log-rank (natural text sits near −1; synthetic or
    templated corpora deviate hard — a cheap corpus-health fingerprint
    next to `text_perplexity`). Closed-form least squares from five
    exact sums, the `lightcurve_trend` discipline: both logs
    floor-grid to micro-units so every sum and cross-product is an
    exact long, and the slope/intercept are identical double
    expressions over exact operands.

    Plan: one token aggregation (the tf table every text op shares),
    one rank window over the VOCABULARY (types, not tokens — small by
    Heaps' law), one five-sum aggregate. Nothing data-sized shuffles
    twice.
    """
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    from pyspark.sql import Window as W

    ranked = freq.withColumn(
        "r", F.row_number().over(W.orderBy(F.col("f").desc(), "w"))
    )
    g = ranked.select(
        F.floor(F.log("r") * F.lit(1e6) + F.lit(0.5)).alias("xm"),
        F.floor(F.log("f") * F.lit(1e6) + F.lit(0.5)).alias("ym"),
    )
    s = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xm").alias("sx"),
        F.sum("ym").alias("sy"),
        F.sum(F.col("xm") * F.col("ym")).alias("sxy"),
        F.sum(F.col("xm") * F.col("xm")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    return s.select(
        F.col("n").alias("n_types"),
        slope.alias("zipf_slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx"))
            / F.col("n").cast("double")
            / F.lit(1e6)
        ).alias("intercept_ln"),
    )


#: RRF fusion: the standard rank-smoothing constant and list depths.
_RRF_K = 60
_RRF_DEPTH = 50
_RRF_TOPK = 20


@register(
    "retrieval_rrf_fusion",
    oracle=f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, COUNT(*) AS n_docs
  FROM dl
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM words
  WHERE word IN ('spark', 'scan', 'merge') GROUP BY doc_id, word
),
df AS (
  SELECT word, COUNT(DISTINCT doc_id) AS df FROM words
  WHERE word IN ('spark', 'scan', 'merge') GROUP BY word
),
bm25 AS (
  SELECT doc_id,
         CAST(SUM(CAST(FLOOR(
           ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
           * (tf * ({_K1} + 1.0))
           / (tf + {_K1} * (1.0 - {_B} + {_B} * dl / avgdl))
           * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s_micro
  FROM tf JOIN df USING (word) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY doc_id
),
tfidf AS (
  SELECT doc_id,
         CAST(SUM(tf * CAST(FLOOR(
           ln(CAST(n_docs AS DOUBLE) / df) * 1000000.0 + 0.5)
           AS BIGINT)) AS BIGINT) AS s_micro
  FROM tf JOIN df USING (word) CROSS JOIN stats
  GROUP BY doc_id
),
ra AS (
  SELECT doc_id, rnk FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY s_micro DESC, doc_id) AS rnk
    FROM bm25) z WHERE rnk <= {_RRF_DEPTH}
),
rb AS (
  SELECT doc_id, rnk FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY s_micro DESC, doc_id) AS rnk
    FROM tfidf) z WHERE rnk <= {_RRF_DEPTH}
),
fused AS (
  SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
         ra.rnk AS rank_bm25, rb.rnk AS rank_tfidf,
         CAST(COALESCE(
                CAST(FLOOR(1000000000.0 / ({_RRF_K} + ra.rnk) + 0.5)
                     AS BIGINT), 0)
              + COALESCE(
                CAST(FLOOR(1000000000.0 / ({_RRF_K} + rb.rnk) + 0.5)
                     AS BIGINT), 0) AS BIGINT) AS rrf_nano
  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
)
SELECT doc_id, rank_bm25, rank_tfidf, rrf_nano
FROM fused
ORDER BY rrf_nano DESC, doc_id
LIMIT {_RRF_TOPK}
""",
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two rankers — THE standard hybrid-
    search combiner (Cormack et al. 2009; every BM25+vector stack
    ships it): rank the same query with BM25 (length-normalized) and
    raw tf-idf (not — the orderings genuinely differ on the fixtures),
    keep each list's top-50, and fuse by
    rrf = sum_r 1/(k + rank_r), k = 60. Docs found by both rankers
    rise; single-list docs survive with one term.

    Exactness: both rankers score on the micro grid (the `text_bm25`
    ln discipline), ranks are ROW_NUMBER over (score DESC, doc_id),
    and each reciprocal term is floor-gridded to nano BEFORE the
    two-term sum — so the fused ordering and its tie-break are pure
    int64. NULL ranks coalesce to 0 contribution on both sides.

    100-TB posture: the query-term IN-filter prunes the token stream
    before any aggregation (the BM25 shape); both rank windows run
    over <= |matching docs| rows; the fusion is a full outer join of
    two 50-row lists — broadcast-trivial. Fusing N rankers at depth d
    is an N-way union + one groupBy-sum of nano terms, mergeable by
    construction.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    dl = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    q = words.filter(F.col("word").isin(*_BM25_TERMS))
    tf = q.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = q.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    base = tf.join(df, "word").join(dl, "doc_id").crossJoin(
        F.broadcast(stats)
    )
    idf_bm = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    bm25 = base.groupBy("doc_id").agg(
        F.sum(
            F.floor(
                idf_bm
                * (F.col("tf") * F.lit(_K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(_K1)
                    * (
                        F.lit(1.0 - _B)
                        + F.lit(_B) * F.col("dl") / F.col("avgdl")
                    )
                )
                * F.lit(1e6) + F.lit(0.5)
            ).cast("long")
        ).cast("long").alias("s_micro")
    )
    tfidf = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf")
                * F.floor(
                    F.log(
                        F.col("n_docs").cast("double") / F.col("df")
                    ) * F.lit(1e6) + F.lit(0.5)
                ).cast("long")
            ).cast("long").alias("s_micro")
        )
    )

    def top_ranked(scored: DataFrame, name: str) -> DataFrame:
        w = Window.orderBy(F.col("s_micro").desc(), "doc_id")
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _RRF_DEPTH)
            .select(F.col("doc_id").alias(f"{name}_doc"),
                    F.col("rnk").alias(f"rank_{name}"))
        )

    ra = top_ranked(bm25, "bm25")
    rb = top_ranked(tfidf, "tfidf")
    term = (
        lambda c: F.coalesce(
            F.floor(
                F.lit(1e9) / (F.lit(_RRF_K) + F.col(c)) + F.lit(0.5)
            ).cast("long"),
            F.lit(0).cast("long"),
        )
    )
    fused = (
        ra.join(rb, ra.bm25_doc == rb.tfidf_doc, "full_outer")
        .select(
            F.coalesce("bm25_doc", "tfidf_doc").alias("doc_id"),
            "rank_bm25", "rank_tfidf",
            (term("rank_bm25") + term("rank_tfidf")).alias("rrf_nano"),
        )
    )
    return fused.orderBy(F.col("rrf_nano").desc(), "doc_id").limit(_RRF_TOPK)
