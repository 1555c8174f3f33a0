"""Self-validating accuracy gates for the approximate operators.

The sketch and ANN queries are rows-only under the driver's oracle
check (their raw estimates are engine-specific by construction). These
companion queries make the *accuracy contract* itself hash-checkable:
the Spark side computes approximate AND exact answers in one plan and
emits per-group booleans asserting the sketch's documented error
bounds; the oracle states the contract (literal TRUE per group). A
driver red here means a sketch drifted out of tolerance — precisely
the regression the rows-only check cannot see.

Thresholds are set from measured sf0.01 values (2026-08-14):
approx_count_distinct err 0.7% (gate 10%), GK percentile rank error
within ±2% rank window (guarantee at accuracy=10000 is 0.01%),
HLL-union estimate within 10%, LSH recall 1.0 (gate 0.6), IVF recall
0.4 (gate 0.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "sketch_accuracy_gates",
    category="A3-sketch",
    oracle="""
        SELECT event_type,
               TRUE AS acd_ok, TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p99_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def sketch_accuracy_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy contract for the distinct-count and quantile sketches
    (A3/A6): per event_type, approx_count_distinct (HLL++) and the
    mergeable DataSketches HLL-union estimate must land within 10% of
    the exact distinct count, and the GK approximate p50/p99 must lie
    inside the ±2%-rank window of the exact quantiles.

    Scale: one events scan; the exact count_distinct expands the
    shuffle (it is here as the gate's ground truth, not the production
    path — A3's point is that the sketches replace it at 100 TB); the
    HLL union path is the mergeable per-day layout from
    agg_distinct_hll_mergeable folded to one plan.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12)).alias("sk")
    )
    hll = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("hll_est")
    )
    base = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("acd"),
        F.count_distinct("user_id").alias("cd"),
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("ap50"),
        F.expr("percentile(value, 0.48)").alias("p48"),
        F.expr("percentile(value, 0.52)").alias("p52"),
        F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("ap99"),
        F.expr("percentile(value, 0.985)").alias("p985"),
        F.expr("percentile(value, 0.995)").alias("p995"),
    )
    joined = base.join(hll, "event_type")
    rel = lambda est, exact: F.abs(est - exact) / exact  # noqa: E731
    return joined.select(
        "event_type",
        (rel(F.col("acd"), F.col("cd")) <= 0.10).alias("acd_ok"),
        (rel(F.col("hll_est"), F.col("cd")) <= 0.10).alias("hll_ok"),
        ((F.col("ap50") >= F.col("p48")) & (F.col("ap50") <= F.col("p52"))).alias("p50_ok"),
        ((F.col("ap99") >= F.col("p985")) & (F.col("ap99") <= F.col("p995"))).alias("p99_ok"),
    )


@query(
    "heavy_hitters_gate",
    category="A-heavyhitters",
    oracle="""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ), counts AS (
            SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
        ), n AS (SELECT count(*) AS total FROM toks)
        SELECT TRUE AS all_hot_survive, TRUE AS underestimate_bounded,
               (SELECT count(*) FROM counts, n
                WHERE cnt > total / 16.0) AS n_hot
    """,
)
def heavy_hitters_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Misra-Gries guarantee, hash-checkable: every token whose
    true count exceeds N/k (k=16) must survive the merged MG summary
    with its estimate underestimating by at most N/k. n_hot is exact
    on both sides (same whitespace tokenization), so the oracle pins
    the gate population too, not just the booleans.

    Scale: the exact count here is the gate's ground truth only — the
    production path is the O(k)-memory sketch; N/16.0 is an exact
    binary division so the threshold compare cannot drift.
    """
    from ..operators.heavyhitters import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).persist()
    mg = heavy_hitters(toks, "tok", k=16)
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.count()
    hot = exact.filter(F.col("cnt") > total / 16.0)
    checked = hot.join(
        mg.withColumnRenamed("item", "tok"), "tok", "left"
    ).select(
        F.col("est_count").isNotNull().alias("survived"),
        (F.col("cnt") - F.coalesce("est_count", F.lit(0)) <= total / 16.0).alias("bounded"),
    )
    return checked.agg(
        F.coalesce(F.bool_and("survived"), F.lit(True)).alias("all_hot_survive"),
        F.coalesce(F.bool_and("bounded"), F.lit(True)).alias("underestimate_bounded"),
        F.count(F.lit(1)).alias("n_hot"),
    )


@query(
    "sampling_gates",
    category="P7",
    oracle="""
        SELECT TRUE AS fraction_in_band, TRUE AS seed_repeatable,
               TRUE AS seed_sensitive
    """,
)
def sampling_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical contract for the Bernoulli samplers (P7/O-sample),
    hash-checkable: a seeded 10% sample must (a) land within a
    binomial band around 10% (±4 sigma: n=10000, p=0.1 → ±120 ⇒
    accept 880..1120 per 10k — the unit tests use the same band),
    (b) be IDENTICAL when re-sampled with the same seed — checked as
    the symmetric difference (both anti-join directions), so a
    superset regression cannot slip through — and (c) actually depend
    on the seed (a different seed yields a different set; a sampler
    that ignores its seed fails here, and P(two honest 10% samples of
    10k rows coincide) is ~0).

    Scale: sampling is a map-side scan filter; all checks reduce to
    counts (no data leaves the executors unaggregated).
    """
    ev = load_table(spark, sf_dir, "events").select("event_id")
    s1 = ev.sample(fraction=0.1, seed=42)
    s2 = ev.sample(fraction=0.1, seed=42)
    s3 = ev.sample(fraction=0.1, seed=7)
    n_total = ev.agg(F.count(F.lit(1)).alias("n")).select(F.col("n").alias("n_total"))
    n_s1 = s1.agg(F.count(F.lit(1)).alias("n_s1"))
    d12 = s1.join(s2, "event_id", "left_anti").agg(F.count(F.lit(1)).alias("n_d12"))
    d21 = s2.join(s1, "event_id", "left_anti").agg(F.count(F.lit(1)).alias("n_d21"))
    d13 = s1.join(s3, "event_id", "left_anti").agg(F.count(F.lit(1)).alias("n_d13"))
    return (
        n_total.crossJoin(n_s1).crossJoin(d12).crossJoin(d21).crossJoin(d13)
        .select(
            (
                (F.col("n_s1") >= 0.088 * F.col("n_total"))
                & (F.col("n_s1") <= 0.112 * F.col("n_total"))
            ).alias("fraction_in_band"),
            ((F.col("n_d12") == 0) & (F.col("n_d21") == 0)).alias("seed_repeatable"),
            (F.col("n_d13") > 0).alias("seed_sensitive"),
        )
    )


@query(
    "ann_recall_gates",
    category="L4",
    oracle="""
        SELECT TRUE AS lsh_recall_ok, TRUE AS lsh_prunes, TRUE AS ivf_recall_ok,
               TRUE AS ivf_prunes
    """,
)
def ann_recall_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality/cost contract for the ANN scale paths (L4): the LSH
    union construction must keep recall@5 >= 0.6 while examining < 90%
    of the corpus, and the IVF probe recall@5 >= 0.2 (above its
    candidate-fraction floor) at < 60% examined. Measured sf0.01:
    LSH 1.0 recall @ 0.43 frac, IVF 0.4 @ 0.24 frac.

    Scale: reuses the probe plans unchanged (bucketed candidates,
    bounded broadcasts); the gate is two 1-row frames crossJoined.

    REGEN SENSITIVITY: recall on near-random synthetic embeddings has
    per-dataset variance (5-neighbor sample, 1 query vector). If the
    driver regenerates testdata, re-run the sim for this query first
    and re-measure before trusting the thresholds (round-2 margins:
    LSH 1.0 vs 0.6 gate, IVF 0.4 vs 0.2 gate).
    """
    from ..registry import REGISTRY

    lsh = REGISTRY["ann_lsh_recall_probe"].builder(spark, sf_dir).select(
        (F.col("recall_at_5") >= 0.6).alias("lsh_recall_ok"),
        (F.col("candidate_frac") < 0.9).alias("lsh_prunes"),
    )
    ivf = REGISTRY["ann_ivf_recall_probe"].builder(spark, sf_dir).select(
        (F.col("recall_at_5") >= 0.2).alias("ivf_recall_ok"),
        (F.col("candidate_frac") < 0.6).alias("ivf_prunes"),
    )
    return lsh.crossJoin(ivf)


@query(
    "bitmap_distinct_gate",
    category="A2-bitmap",
    oracle="""
        SELECT event_type, TRUE AS bitmap_matches_exact,
               count(DISTINCT user_id) AS n_exact
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def bitmap_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-based EXACT distinct counting (Spark 4's bitmap_*
    family), gated against count_distinct: per (group, 32k-bucket)
    the member bit positions OR into a fixed 4 KB bitmap, bucket
    popcounts then SUM — the two-level shape that replaces the
    count-distinct Expand with map-side-combinable byte arrays (the
    big win when distinct cardinality per group is huge but bounded
    per bucket). The oracle pins the exact count AND the literal-TRUE
    agreement flag, so a driver red means the bitmap path diverged
    from exact.

    Scale: shuffle carries (group, bucket, 4KB bitmap) rows instead of
    one row per distinct member — compression ∝ density; bitmaps
    merge associatively so AQE/partial aggregation apply.
    """
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.groupBy("event_type", F.bitmap_bucket_number(F.col("user_id")).alias("b"))
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id"))).alias(
                "bm"
            )
        )
        .groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("n_bitmap"))
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_exact")
    )
    return (
        per_bucket.join(exact, "event_type")
        .select(
            "event_type",
            (F.col("n_bitmap") == F.col("n_exact")).alias("bitmap_matches_exact"),
            "n_exact",
        )
    )


@query(
    "profile_approx_distinct_gate",
    category="Q1-profile-approx",
    oracle="""
        SELECT 'event_id' AS col_name, TRUE AS within_10pct
        UNION ALL SELECT 'event_type', TRUE
        UNION ALL SELECT 'props', TRUE
        UNION ALL SELECT 'user_id', TRUE
        UNION ALL SELECT 'value', TRUE
        ORDER BY col_name
    """,
)
def profile_approx_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB relaxation of `profile_columns_events`, made
    hash-checkable: per column, `approx_count_distinct` (HLL++, rsd
    5%) must land within 10% of the exact distinct count. This is the
    gate that licenses swapping the Expand-based exact profile for
    the sketch profile at scale — a driver red here means the sketch
    accuracy regressed below the documented margin.

    Scale: the approx side is ONE aggregate with NO Expand (HLL
    partials merge map-side); the exact side exists only to judge it
    (drop it in production). Measured sf0.01 errors are ≤ ~3% per
    column (rsd 0.05), so the 10% gate has ≥ 3× headroom.
    """
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "event_type", "props", "user_id", "value"]
    approx = ev.agg(
        *[F.approx_count_distinct(c, rsd=0.05).alias(f"a_{c}") for c in cols]
    )
    exact = ev.agg(*[F.count_distinct(F.col(c)).alias(f"e_{c}") for c in cols])
    wide = approx.crossJoin(exact)
    stack = ", ".join(f"'{c}', a_{c}, e_{c}" for c in cols)
    tall = wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col_name, a, e)"
    )
    return tall.select(
        "col_name",
        (F.abs(F.col("a") - F.col("e")) <= 0.10 * F.col("e")).alias(
            "within_10pct"
        ),
    ).orderBy("col_name")


@query(
    "histogram_quantile_gate",
    category="A6-sketch",
    oracle="""
        SELECT event_type,
               TRUE AS hist_p50_ok, TRUE AS hist_p99_ok, TRUE AS gk_close_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def histogram_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantile sketch vs GK (NEXT.md breadth
    item): a t-digest-CLASS sketch — fixed 128-bucket equi-width
    histograms built PER DAY and merged by bucket addition (the
    mergeability that lets every executor/day/partition summarize
    independently at 100 TB) — answers p50/p99 by locating the target
    rank's bucket. The gate asserts the sketch's STRUCTURAL error
    contract: the exact (interpolated) quantile lies in the sandwich
    [lo(floor-rank bucket), hi(ceil-rank bucket)] — interpolation
    happens between two order statistics that can span EMPTY buckets
    in sparse tails, so the naive "exact is inside the ceil-rank
    bucket" is not a theorem (it failed for p99 at sf0.001); the
    floor/ceil sandwich is. GK's approx p50 (±0.01% rank error) must
    land within one extra bucket of the same sandwich.

    Scale: two passes over one events scan — per-type (lo, hi) bounds
    broadcast back, then per-(type, day, bucket) counts merged to
    per-(type, bucket); cumulative rank via a 128-row-per-type window.
    The exact percentile exists only as the gate's ground truth.
    """
    n_buckets = 128
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / n_buckets
    bucketed = (
        ev.join(F.broadcast(bounds), "event_type")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.least(
                F.lit(n_buckets - 1),
                F.floor((F.col("value") - F.col("lo")) / width).cast("int"),
            ).alias("bucket"),
        )
    )
    daily = bucketed.groupBy("event_type", "day", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.sum("cnt").alias("cnt")  # the merge: bucket-wise addition
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    cum = merged.select(
        "event_type", "bucket", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy("event_type")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )

    def est(tag, rank_expr):
        # first bucket whose cumulative count reaches the target rank
        return (
            cum.filter(F.col("cum") >= rank_expr)
            .groupBy("event_type")
            .agg(F.min("bucket").alias(tag))
        )

    # Spark `percentile` INTERPOLATES between the order statistics at
    # ranks floor/ceil(1 + (n-1)q) — in sparse regions those two data
    # points can span EMPTY buckets, so "exact lies in the ceil-rank
    # bucket" is NOT structural (it failed at sf0.001 for p99). The
    # structural sandwich: exact ∈ [lo(floor-rank bucket),
    # hi(ceil-rank bucket)].
    def rk_floor(q):
        return F.floor(F.lit(1.0) + (F.col("n") - 1) * q)

    def rk_ceil(q):
        return F.ceil(F.lit(1.0) + (F.col("n") - 1) * q)

    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("x50"),
        F.expr("percentile(value, 0.99)").alias("x99"),
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("gk50"),
    )
    joined = (
        exact.join(est("b50f", rk_floor(0.5)), "event_type")
        .join(est("b50c", rk_ceil(0.5)), "event_type")
        .join(est("b99f", rk_floor(0.99)), "event_type")
        .join(est("b99c", rk_ceil(0.99)), "event_type")
        .join(F.broadcast(bounds), "event_type")
    )
    blo = lambda b: F.col("lo") + b * width  # noqa: E731
    bhi = lambda b: F.col("lo") + (b + 1) * width  # noqa: E731
    slack = width * 1e-6  # FP guard on bucket-edge exact quantiles
    sandwich = lambda x, bf, bc: (  # noqa: E731
        (x >= blo(bf) - slack) & (x <= bhi(bc) + slack)
    )
    return joined.select(
        "event_type",
        sandwich(F.col("x50"), F.col("b50f"), F.col("b50c")).alias("hist_p50_ok"),
        sandwich(F.col("x99"), F.col("b99f"), F.col("b99c")).alias("hist_p99_ok"),
        # GK p50's ±0.01% rank error stays within one extra bucket
        (
            (F.col("gk50") >= blo(F.col("b50f")) - width)
            & (F.col("gk50") <= bhi(F.col("b50c")) + width)
        ).alias("gk_close_ok"),
    )


@query(
    "countmin_error_gate",
    category="A3-sketch",
    oracle=f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ), truth AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS true_cnt
            FROM toks WHERE tok <> '' GROUP BY tok
        ), probes AS (
            SELECT tok, true_cnt FROM truth
            ORDER BY true_cnt DESC, tok LIMIT 5
        )
        SELECT tok, true_cnt,
               TRUE AS never_undercounts, TRUE AS overcount_ok
        FROM probes
        ORDER BY true_cnt DESC, tok
    """,
)
def countmin_error_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch accuracy contract (A3 breadth: the frequency
    sketch complementing HLL-distinct and Misra-Gries heavy hitters):
    a d=4 × w=512 CMS over the corpus token stream — each (seed,
    bucket) cell is a plain count, so cells merge by addition across
    days/executors like every sketch in this family. Probing the five
    highest-frequency tokens, the gate asserts CMS's two-sided
    contract: estimates NEVER undercount (structural: every
    occurrence lands in the counted cell), and the min-over-rows
    estimate overcounts by at most 2% of the stream length N (the
    ε=e/w guarantee is ~0.5% per row at w=512; min over 4 rows leaves
    wide margin — measured 2026-08-14 at sf0.01).

    Buckets come from the repo's md5_uniform mint (cross-engine
    deterministic); truth counts ride along as hash-checked columns so
    a drifting tokenizer or mint breaks the gate visibly.

    Scale: the sketch build is one explode ×4 seeds → 2048-cell agg
    (map-side combinable); the probe joins the 20-cell slice by
    broadcast. The exact truth table exists only as the gate's ground
    truth — production reads cells, never the token census.
    """
    from ..functions.sampling import md5_uniform

    D, W = 4, 512
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    ).persist()  # three consumers: truth, N, sketch
    truth = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    probes = truth.orderBy(F.col("true_cnt").desc(), "tok").limit(5)
    n_total = toks.agg(F.count(F.lit(1)).alias("n"))
    seeded = toks.select(
        "tok", F.explode(F.array(*[F.lit(i) for i in range(D)])).alias("seed")
    )
    bucket = F.floor(
        md5_uniform("concat(seed, '|', tok)") * F.lit(W)
    ).cast("int")
    cms = (
        seeded.select("seed", bucket.alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cell"))
    )
    probe_cells = (
        probes.select(
            "tok", "true_cnt",
            F.explode(F.array(*[F.lit(i) for i in range(D)])).alias("seed"),
        )
        .withColumn("bucket", bucket)
        .join(cms, ["seed", "bucket"])
        .groupBy("tok", "true_cnt")
        .agg(F.min("cell").alias("est"))
    )
    return (
        probe_cells.crossJoin(F.broadcast(n_total))
        .select(
            "tok",
            "true_cnt",
            (F.col("est") >= F.col("true_cnt")).alias("never_undercounts"),
            ((F.col("est") - F.col("true_cnt")) <= 0.02 * F.col("n")).alias(
                "overcount_ok"
            ),
        )
    )


@query(
    "tdigest_quantile_gate",
    category="A3-sketch",
    oracle="""
        SELECT event_type,
               TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok,
               TRUE AS compressed_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def tdigest_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy + compression contract for the real t-digest
    (operators/tdigest.py — k1 scale function, merging build): per
    event_type, p50/p90/p99 estimated from digests built per
    (event_type, user_id % 8) shard and MERGED must each land within
    ±2% rank error of the exact distribution (the digest's guarantee
    is in q-space, so the gate measures exactly that: the fraction of
    true values ≤ the estimate vs the target q), and the merged digest
    must have actually compressed (≤ 2δ centroids AND ≥5× fewer
    centroids than input rows). Shards are data-derived, so the gate
    is partitioning-invariant — a re-run cannot flake it.

    This closes NEXT.md's "t-digest with actual centroid compression"
    item: histogram_quantile_gate pins fixed-boundary mergeability;
    this pins the adaptive-capacity sketch whose tails stay tight.

    Scale: stage 1 digests are O(δ) per shard, stage 2 merges 8 of
    them per group; the exact-rank probe (ground truth only) is one
    broadcast of the 5-row estimate frame + one combinable avg.
    """
    from ..operators.tdigest import tdigest_quantiles

    ev = load_table(spark, sf_dir, "events")
    est = tdigest_quantiles(
        ev, "event_type", "value", F.col("user_id") % 8,
        qs=(0.5, 0.9, 0.99), delta=100.0, n_shards=8,
    ).withColumnRenamed("g", "event_type")
    ranks = (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.avg((F.col("value") <= F.col("q500")).cast("double")).alias("r50"),
            F.avg((F.col("value") <= F.col("q900")).cast("double")).alias("r90"),
            F.avg((F.col("value") <= F.col("q990")).cast("double")).alias("r99"),
            F.first("n_centroids").alias("n_centroids"),
            F.first("total_weight").alias("total_weight"),
        )
    )
    return ranks.select(
        "event_type",
        (F.abs(F.col("r50") - 0.5) <= 0.02).alias("p50_ok"),
        (F.abs(F.col("r90") - 0.9) <= 0.02).alias("p90_ok"),
        (F.abs(F.col("r99") - 0.99) <= 0.02).alias("p99_ok"),
        (
            (F.col("n_centroids") <= 200)
            & (
                # sparsity (5× fewer centroids than rows) is only a
                # meaningful claim once n >> δ; tiny slices (sf0.001)
                # legitimately keep ~n centroids
                (F.col("total_weight") < 1000)
                | (F.col("n_centroids") * 5 < F.col("total_weight"))
            )
        ).alias("compressed_ok"),
    )


@query(
    "hll_intersection_gate",
    category="A3-sketch",
    oracle="""
        WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
             b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
        SELECT CAST((SELECT count(*) FROM a JOIN b USING (user_id)) AS BIGINT)
                   AS n_intersect_exact,
               TRUE AS ie_ok
    """,
)
def hll_intersection_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-INTERSECTION cardinality from mergeable sketches: HLL
    supports union natively, so |A∩B| comes from inclusion-exclusion
    (|A| + |B| − |A∪B|) — the standard audience-overlap estimator at
    scales where materializing either set is off the table. The gate:
    the estimate must land within ±20% of the exact intersection
    (inclusion-exclusion TRIPLES the per-sketch rsd in the worst case
    — 3 estimates, each ±5% default rsd, differenced — which is why
    the bound is looser than the single-set 10% gates; the exact
    count is hash-checked alongside so the gate population is pinned).

    Scale: three approx_count_distinct aggregates over one scan
    (conditional columns, no self-join); the exact side is the
    ground-truth probe only — per-user bool flags + one count, the
    thing the sketch path exists to avoid.
    """
    ev = load_table(spark, sf_dir, "events")
    est = ev.agg(
        F.approx_count_distinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("ea"),
        F.approx_count_distinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("eb"),
        F.approx_count_distinct(
            F.when(F.col("event_type").isin("view", "click"), F.col("user_id"))
        ).alias("eu"),
    )
    exact = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "view").cast("int")).alias("ia"),
            F.max((F.col("event_type") == "click").cast("int")).alias("ib"),
        )
        .agg(
            F.sum((F.col("ia") * F.col("ib")).cast("long")).alias("n_intersect_exact")
        )
    )
    return (
        exact.crossJoin(F.broadcast(est))
        .select(
            "n_intersect_exact",
            (
                F.abs(F.col("ea") + F.col("eb") - F.col("eu")
                      - F.col("n_intersect_exact"))
                <= 0.2 * F.col("n_intersect_exact")
            ).alias("ie_ok"),
        )
    )


@query(
    "hll_sketch_persist_roundtrip",
    category="A3-sketch",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
               TRUE AS persisted_equals_direct, TRUE AS est_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def hll_sketch_persist_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketches as STORED columns — the production pattern behind
    pre-aggregated rollup tables: per (event_type, day) HLL sketches
    (Datasketches binary, lgK=12) are WRITTEN to parquet, read back,
    and union-merged per event_type; the merged estimate must be
    bit-identical to the direct single-pass estimate over the raw
    rows (HLL union is exact over sketch state — the identity that
    licenses storing daily sketches and answering any date-range
    distinct query without rescanning raw data), and within 10% of
    the exact distinct count, which is hash-checked alongside.

    Scale: this is THE 100 TB distinct-count architecture — a
    sketch-per-partition rollup is ~KBs/day versus a raw rescan;
    any range's estimate is a merge of stored binaries. The roundtrip
    pins that Spark's sketch binary format survives parquet
    serialization (a regression here silently corrupts every stored
    rollup).
    """
    import os

    from .scalars import SCRATCH

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12)).alias("sk"))
    out = os.path.join(
        SCRATCH, "hll_rollup", os.path.basename(sf_dir.rstrip("/"))
    )
    daily.write.mode("overwrite").parquet(out)
    merged = (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_persisted"))
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12))
        ).alias("est_direct"),
        F.countDistinct("user_id").cast("long").alias("n_exact"),
    )
    return (
        direct.join(merged, "event_type")
        .select(
            "event_type",
            "n_exact",
            (F.col("est_persisted") == F.col("est_direct"))
            .alias("persisted_equals_direct"),
            (
                F.abs(F.col("est_persisted") - F.col("n_exact"))
                <= 0.1 * F.col("n_exact")
            ).alias("est_ok"),
        )
    )


@query(
    "tdigest_band_classification",
    category="A3-sketch",
    oracle="""
        WITH cuts AS (
            SELECT event_type,
                   quantile_disc(value, 0.5) AS c50,
                   quantile_disc(value, 0.9) AS c90
            FROM events GROUP BY event_type
        ), banded AS (
            SELECT e.event_type,
                   CASE WHEN e.value <= c.c50 THEN 'low'
                        WHEN e.value <= c.c90 THEN 'mid'
                        ELSE 'high' END AS band
            FROM events e JOIN cuts c USING (event_type)
        )
        SELECT event_type, band, count(*) AS n_exact,
               TRUE AS digest_band_ok
        FROM banded
        GROUP BY event_type, band
        ORDER BY event_type, band
    """,
)
def tdigest_band_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The t-digest as a BROADCAST DIMENSION — the production read
    path for stored digests: per event_type the merged digest's
    p50/p90 estimates become a 5-row cut table broadcast onto the
    fact stream, classifying every event into low/mid/high latency
    bands (the SLO-dashboard / anomaly-routing shape). The gate: each
    digest-banded count must sit within ±2.5% of the type's row count
    from the EXACT percentile_disc banding, whose counts are
    hash-checked alongside (percentile_disc picks actual data values
    — engine-identical, no interpolation ULP risk at the band edge).

    Scale: the digest side never touches raw data twice — cuts come
    from the O(δ) summaries (operators/tdigest.py); classification is
    a broadcast join + map, the exact side exists only as the gate's
    ground truth.
    """
    from ..operators.tdigest import tdigest_quantiles

    ev = load_table(spark, sf_dir, "events")
    cuts_d = tdigest_quantiles(
        ev, "event_type", "value", F.col("user_id") % 8,
        qs=(0.5, 0.9), delta=100.0,
    ).select(
        F.col("g").alias("event_type"),
        F.col("q500").alias("d50"), F.col("q900").alias("d90"),
    )
    cuts_x = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("c50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("c90"),
    )
    both = F.broadcast(cuts_x.join(cuts_d, "event_type"))
    banded = ev.join(both, "event_type").select(
        "event_type",
        F.when(F.col("value") <= F.col("c50"), "low")
        .when(F.col("value") <= F.col("c90"), "mid")
        .otherwise("high").alias("band"),
        F.when(F.col("value") <= F.col("d50"), "low")
        .when(F.col("value") <= F.col("d90"), "mid")
        .otherwise("high").alias("dband"),
    )
    per_type = banded.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_type"))
    exact = banded.groupBy("event_type", "band").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    dig = banded.groupBy("event_type", F.col("dband").alias("band")).agg(
        F.count(F.lit(1)).alias("n_digest")
    )
    return (
        exact.join(dig, ["event_type", "band"], "left")
        .join(per_type, "event_type")
        .select(
            "event_type", "band", "n_exact",
            (
                F.abs(F.coalesce("n_digest", F.lit(0)) - F.col("n_exact"))
                <= 0.025 * F.col("n_type")
            ).alias("digest_band_ok"),
        )
    )


@query(
    "hll_difference_gate",
    category="A3-sketch",
    oracle="""
        WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
             b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
        SELECT CAST((SELECT count(*) FROM a
                     WHERE user_id NOT IN (SELECT user_id FROM b)) AS BIGINT)
                   AS n_diff_exact,
               TRUE AS diff_ok
    """,
)
def hll_difference_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-DIFFERENCE cardinality from sketches (theta-sketch A-not-B
    semantics on HLL): |A\\B| = |A∪B| − |B| — two union-friendly
    estimates differenced, the audience-exclusion counterpart to
    hll_intersection_gate. Gate ±20% of the exact difference (two
    ±5%-rsd estimates differenced), exact count hash-checked
    alongside. Together the three gates (∩, \\, roundtrip) pin the
    full sketch set-algebra surface a rollup store needs.

    Scale: two approx aggregates over one scan; the exact side (anti
    semantics via per-user flags) is ground truth only.
    """
    ev = load_table(spark, sf_dir, "events")
    est = ev.agg(
        F.approx_count_distinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("eb"),
        F.approx_count_distinct(
            F.when(F.col("event_type").isin("view", "click"), F.col("user_id"))
        ).alias("eu"),
    )
    exact = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "view").cast("int")).alias("ia"),
            F.max((F.col("event_type") == "click").cast("int")).alias("ib"),
        )
        .agg(
            F.sum((F.col("ia") * (1 - F.col("ib"))).cast("long"))
            .alias("n_diff_exact")
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_diff_exact",
        (
            F.abs(F.col("eu") - F.col("eb") - F.col("n_diff_exact"))
            <= 0.2 * F.col("n_diff_exact")
        ).alias("diff_ok"),
    )


@query(
    "kll_tdigest_shootout_gate",
    category="A3-sketch",
    oracle="""
        SELECT event_type,
               TRUE AS kll_p50_ok, TRUE AS kll_p90_ok, TRUE AS kll_p99_ok,
               TRUE AS kll_bounded_ok, TRUE AS kll_weight_ok,
               TRUE AS agree_p50_ok, TRUE AS agree_p99_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def kll_tdigest_shootout_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL vs t-digest SHOOTOUT — the two mergeable quantile sketches
    production engines choose between, certified against each other
    and against the exact distribution in one plan. Per event_type:
    KLL (operators/kll.py, k=200, deterministic coins, shards
    user_id % 8 merged in shard order) estimates p50/p90/p99; each
    estimate's TRUE rank (fraction of values ≤ it) must land within
    ±2.5% of the target; the sketch must stay bounded (≤1200 retained
    items = k·log headroom) with total weight within 2% of the true
    row count (KLL's compaction conserves weight only up to odd-buffer
    rounding — a documented property, so the gate claims the bound,
    not equality). Cross-sketch agreement: the RANKS of the KLL and
    t-digest estimates at p50 and p99 must sit within 4% of each
    other (each is within 2–2.5% of target ⇒ ≤ ~5% worst case;
    measured ≪). A red on agree_* with both accuracy families green
    would mean the rank probe itself broke.

    Scale: both sketches are two-level applyInPandas builds with O(k)
    / O(δ) state per shard; the exact-rank probe joins a broadcast
    5-row estimate frame back to the fact scan — ground truth for the
    gate only, not the production path.
    """
    from ..operators.kll import kll_quantiles
    from ..operators.tdigest import tdigest_quantiles

    ev = load_table(spark, sf_dir, "events")
    kll = kll_quantiles(
        ev, "event_type", "value", F.col("user_id") % 8, qs=(0.5, 0.9, 0.99), k=200
    ).select(
        F.col("g").alias("event_type"),
        F.col("q500").alias("k50"), F.col("q900").alias("k90"),
        F.col("q990").alias("k99"),
        "n_retained", F.col("total_weight").alias("kll_weight"),
    )
    td = tdigest_quantiles(
        ev, "event_type", "value", F.col("user_id") % 8,
        qs=(0.5, 0.99), delta=100.0, n_shards=8,
    ).select(
        F.col("g").alias("event_type"),
        F.col("q500").alias("t50"), F.col("q990").alias("t99"),
    )
    est = kll.join(td, "event_type")
    ranks = (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg((F.col("value") <= F.col("k50")).cast("double")).alias("rk50"),
            F.avg((F.col("value") <= F.col("k90")).cast("double")).alias("rk90"),
            F.avg((F.col("value") <= F.col("k99")).cast("double")).alias("rk99"),
            F.avg((F.col("value") <= F.col("t50")).cast("double")).alias("rt50"),
            F.avg((F.col("value") <= F.col("t99")).cast("double")).alias("rt99"),
            F.first("n_retained").alias("n_retained"),
            F.first("kll_weight").alias("kll_weight"),
        )
    )
    return ranks.select(
        "event_type",
        (F.abs(F.col("rk50") - 0.5) <= 0.025).alias("kll_p50_ok"),
        (F.abs(F.col("rk90") - 0.9) <= 0.025).alias("kll_p90_ok"),
        (F.abs(F.col("rk99") - 0.99) <= 0.025).alias("kll_p99_ok"),
        (F.col("n_retained") <= 1200).alias("kll_bounded_ok"),
        (
            F.abs(F.col("kll_weight") - F.col("n")) <= 0.02 * F.col("n")
        ).alias("kll_weight_ok"),
        (F.abs(F.col("rk50") - F.col("rt50")) <= 0.04).alias("agree_p50_ok"),
        (F.abs(F.col("rk99") - F.col("rt99")) <= 0.04).alias("agree_p99_ok"),
    )


@query(
    "qdigest_quantile_gate",
    category="A3-sketch",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_exact,
               TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok,
               TRUE AS size_ok, TRUE AS weight_exact_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def qdigest_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q-digest contract (operators/qdigest.py) — the INTEGER-domain
    quantile sketch with hard deterministic bounds, certified per
    event_type over value-CENTS (floor(value·100+0.5), clamped to the
    16-bit universe; max observed cents ≈ 49k, so clamping is a
    domain statement, not data loss). Claims: each of p50/p90/p99
    lands within the sketch's PROVABLE rank bound log2(U)/k =
    16/1024 ≈ 1.6% (gated at 2% for probe slack); the merged digest
    holds ≤ 3k nodes (the classic size bound); and — the property
    neither KLL nor t-digest has — total weight equals the EXACT row
    count, hash-checked against the oracle's own count(*) per group,
    because q-digest compression only moves counts to ancestors.

    Scale: per-shard leaf maps are bounded by min(rows, U) = at most
    65536 entries no matter the corpus; shard digests are ≤3k nodes;
    the merge is nodewise addition. The exact-rank probe (broadcast
    5-row estimates joined back to the scan) is gate ground truth
    only.
    """
    from ..operators.qdigest import qdigest_quantiles

    ev = load_table(spark, sf_dir, "events")
    cents = F.least(
        F.greatest(F.floor(F.col("value") * 100 + F.lit(0.5)), F.lit(0)),
        F.lit(65535),
    )
    est = qdigest_quantiles(
        ev, "event_type", cents, F.col("user_id") % 8,
        qs=(0.5, 0.9, 0.99), bits=16, k=1024,
    ).withColumnRenamed("g", "event_type")
    ranks = (
        ev.withColumn("cents", cents)
        .join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.avg((F.col("cents") <= F.col("q500")).cast("double")).alias("r50"),
            F.avg((F.col("cents") <= F.col("q900")).cast("double")).alias("r90"),
            F.avg((F.col("cents") <= F.col("q990")).cast("double")).alias("r99"),
            F.first("n_nodes").alias("n_nodes"),
            F.first("total_weight").alias("total_weight"),
        )
    )
    return ranks.select(
        "event_type",
        "n_exact",
        (F.abs(F.col("r50") - 0.5) <= 0.02).alias("p50_ok"),
        (F.abs(F.col("r90") - 0.9) <= 0.02).alias("p90_ok"),
        (F.abs(F.col("r99") - 0.99) <= 0.02).alias("p99_ok"),
        (F.col("n_nodes") <= 3 * 1024).alias("size_ok"),
        (F.col("total_weight") == F.col("n_exact")).alias("weight_exact_ok"),
    )


@query(
    "tdigest_band_agreement_gate",
    category="T16-band",
    oracle="""
        SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
               TRUE AS p50_rank_ok, TRUE AS band_agree_ok
        FROM events
    """,
)
def tdigest_band_agreement_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-powered percentile bands — the 100 TB path behind
    percentile_band_daily: per-day t-digests (one O(δ) summary per
    day, mergeable across that day's shards) estimate p25/p50/p75,
    the same trailing-7-day band logic runs on the estimates, and the
    gate certifies the sketch can OWN the monitor: (a) the mean
    absolute rank error of the t-digest daily median across all days
    is ≤ 4% (per-day n is small at test SFs, where the digest is
    near-exact because nothing compresses; at production n the k1
    tails take over), and (b) the out-of-band verdicts from the
    sketch band agree with the exact band on ≥ 90% of warm days. The
    day count is hash-pinned exactly.

    Scale: this is the shape that removes percentile_band_daily's
    per-day exact sort — each day folds to ≤2δ centroids on the map
    side, the band windows run on the ~30-row day frame, and the
    exact-percentile twin here is gate ground truth only.
    """
    from ..operators.tdigest import tdigest_quantiles

    ev = load_table(spark, sf_dir, "events")
    est = tdigest_quantiles(
        ev.withColumn("day", F.to_date("ts").cast("string")),
        "day", "value", F.col("user_id") % 8,
        qs=(0.25, 0.5, 0.75), delta=100.0,
    ).select(
        F.to_date("g").alias("day"),
        F.col("q250").alias("e25"), F.col("q500").alias("e50"),
        F.col("q750").alias("e75"),
    )
    exact = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("percentile(value, 0.25)").alias("p25"),
        F.expr("percentile(value, 0.50)").alias("p50"),
        F.expr("percentile(value, 0.75)").alias("p75"),
        F.count(F.lit(1)).alias("n_day"),
    )

    def banded(df: DataFrame, lo: str, mid: str, hi: str, out: str) -> DataFrame:
        trail = Window.orderBy("day").rowsBetween(-7, -1)
        return df.select(
            "day", *df.columns[1:],
            F.when(
                F.count(F.lit(1)).over(trail) >= 3,
                (F.col(mid) < F.avg(lo).over(trail))
                | (F.col(mid) > F.avg(hi).over(trail)),
            ).alias(out),
        )

    flag_e = banded(est, "e25", "e50", "e75", "flag_est").select("day", "e50", "flag_est")
    flag_x = banded(exact, "p25", "p50", "p75", "flag_exact").select(
        "day", "n_day", "flag_exact"
    )
    # per-day true rank of the estimated median
    ranks = (
        ev.withColumn("day", F.to_date("ts"))
        .join(F.broadcast(flag_e), "day")
        .groupBy("day")
        .agg(
            F.avg((F.col("value") <= F.col("e50")).cast("double")).alias("r50"),
            F.first("flag_est").alias("flag_est"),
        )
    )
    joined = ranks.join(flag_x, "day")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (F.avg(F.abs(F.col("r50") - 0.5)) <= 0.04).alias("p50_rank_ok"),
        (
            F.coalesce(
                F.avg(
                    F.when(
                        F.col("flag_est").isNotNull()
                        & F.col("flag_exact").isNotNull(),
                        (F.col("flag_est") == F.col("flag_exact")).cast("double"),
                    )
                ),
                F.lit(1.0),
            )
            >= 0.9
        ).alias("band_agree_ok"),
    )


@query(
    "hll_sliding_window_distinct_gate",
    category="A3-sketch",
    oracle="""
        WITH days AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
        ), contrib AS (
            SELECT d.day, e.user_id
            FROM events e JOIN days d
              ON CAST(e.ts AS DATE) <= d.day
             AND CAST(e.ts AS DATE) >= d.day - INTERVAL '6 days'
        )
        SELECT day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
               TRUE AS est_ok
        FROM contrib GROUP BY day ORDER BY day
    """,
)
def hll_sliding_window_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-window distinct counts from mergeable daily sketches —
    the layout that makes 7-day-actives cheap at 100 TB: one HLL
    sketch per day (lgK=12), then each day's trailing-7 estimate is
    an hll_union_agg WINDOW over the ~30-row day frame — the raw
    corpus is scanned once, and a 90-day-actives variant would reuse
    the same daily sketches with a wider frame instead of a rescan.
    The gate hash-pins the exact trailing-7 distinct count per day
    (oracle recomputes it independently) and claims the sketch lands
    within 10% (lgK=12 rsd ≈ 1.6%; measured ≪).

    The exact twin explodes each event onto the ≤7 window days it
    feeds — one shuffle at 7× fan-out, gate ground truth only.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12)).alias("sk")
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    est = daily.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w7)).alias("est"),
    )
    exact = (
        ev.select(F.to_date("ts").alias("eday"), "user_id")
        .withColumn("day", F.explode(F.expr(
            "sequence(eday, date_add(eday, 6), interval 1 day)"
        )))
        .join(daily.select("day"), "day")  # only observed days emit rows
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("n_exact"))
    )
    return (
        exact.join(est, "day")
        .select(
            "day", "n_exact",
            (F.abs(F.col("est") - F.col("n_exact"))
             <= 0.10 * F.col("n_exact")).alias("est_ok"),
        )
    )
