"""Text analysis II: RAKE keyword extraction with integer-scaled
scores, and a self-training character-trigram language classifier
with its confusion census — extending the text family (lang-ID by
stopwords, quality scores, surprisal, readability, PMI collocations
live elsewhere).

Float discipline: RAKE's word score deg/freq is emitted as the FLOOR
integer division (deg·10⁶)//freq, so phrase scores are exact integer
sums (no float accumulation at all); the trigram classifier is pure
integer counting with lexicographic argmax tiebreaks.

Scale: both queries explode text into bounded-per-byte token/gram
streams (the tokenization cost class), collapse immediately to count
frames, and keep every join keyed (gram → profile is a broadcast; no
doc×doc anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ._shared import md5_uniform_sql

# the analysis stoplist: high-frequency function words of the
# synthetic corpus domain (same spirit as lang_id_stopword's profile
# lists — a data-file swap away from a real stoplist)
_RAKE_STOP = (
    "the a an of to and in is are on for with as by at this that "
    "it be or from was were which"
).split()

_STOP_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOP)


@query(
    "rake_keyword_phrases",
    category="TX-rake",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, tok,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY pos) AS pos,
                   tok IN ({_STOP_SQL}) AS is_stop
            FROM (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS pos
                FROM documents
            ) WHERE tok <> ''
        ), runs AS (
            SELECT doc_id, tok, pos,
                   pos - row_number() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS grp
            FROM toks WHERE NOT is_stop
        ), phrases AS (
            SELECT doc_id, grp,
                   string_agg(tok, ' ' ORDER BY pos) AS phrase,
                   CAST(count(*) AS BIGINT) AS plen,
                   list(tok ORDER BY pos) AS words
            FROM runs GROUP BY doc_id, grp
        ), word_stats AS (
            SELECT tok,
                   CAST(count(*) AS BIGINT) AS freq,
                   CAST(sum(plen) AS BIGINT) AS deg
            FROM (SELECT p.doc_id, unnest(p.words) AS tok, p.plen
                  FROM phrases p)
            GROUP BY tok
        ), wscore AS (
            SELECT tok, CAST(deg * 1000000 // freq AS BIGINT) AS ws
            FROM word_stats
        ), pscore AS (
            SELECT phrase,
                   CAST(count(*) AS BIGINT) AS n_occurrences,
                   CAST(max(score) AS BIGINT) AS score_micro
            FROM (
                SELECT p.doc_id, p.grp, p.phrase,
                       CAST(sum(w.ws) AS BIGINT) AS score
                FROM (SELECT doc_id, grp, phrase, unnest(words) AS tok
                      FROM phrases) p
                JOIN wscore w ON w.tok = p.tok
                GROUP BY p.doc_id, p.grp, p.phrase
            ) GROUP BY phrase
            HAVING count(*) >= 3
        )
        SELECT phrase, n_occurrences, score_micro
        FROM pscore
        ORDER BY score_micro DESC, phrase LIMIT 15
    """,
)
def rake_keyword_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction) over the corpus:
    candidate phrases are maximal stopword-free token runs (the
    pos − row_number island trick, per doc); each word scores
    degree/frequency where degree sums the lengths of every phrase
    containing it; a phrase scores the sum of its words' scores.
    Top-15 phrases seen ≥ 3 times.

    Integer discipline: word score is the FLOOR division
    (deg·10⁶)//freq — both engines floor the same integers — so
    phrase scores are exact integer sums; no float enters the ranking
    at all (most RAKE implementations rank on drifting doubles).

    Scale: tokenize-explode (∝ corpus bytes) → island windows keyed
    per doc → two count rollups; the word-score table is vocabulary-
    sized and joins the phrase-words frame on the token key; top-15
    is a heap.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id", "tok",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("pos0")
            ).alias("pos"),
            F.col("tok").isin(_RAKE_STOP).alias("is_stop"),
        )
    )
    runs = toks.filter(~F.col("is_stop")).withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    phrases = runs.groupBy("doc_id", "grp").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("pos", "tok"))
            ).getField("tok"),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).cast("long").alias("plen"),
    )
    phrase_words = phrases.select(
        "doc_id", "grp", "phrase", "plen",
        F.explode(F.split("phrase", " ")).alias("tok"),
    )
    word_stats = phrase_words.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    wscore = word_stats.select(
        "tok",
        F.expr("CAST(deg * 1000000 div freq AS BIGINT)").alias("ws"),
    )
    per_occurrence = (
        phrase_words.join(wscore, "tok")
        .groupBy("doc_id", "grp", "phrase")
        .agg(F.sum("ws").cast("long").alias("score"))
    )
    pscore = (
        per_occurrence.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max("score").cast("long").alias("score_micro"),
        )
        .filter(F.col("n_occurrences") >= 3)
    )
    return pscore.orderBy(F.col("score_micro").desc(), "phrase").limit(15)


@query(
    "langid_char_trigram_confusion",
    category="TX-langid",
    oracle="""
        WITH grams AS (
            SELECT d.doc_id, d.lang, substr(d.text, i, 3) AS g,
                   (d.doc_id % 2 = 0) AS is_train
            FROM documents d,
                 LATERAL unnest(range(1, length(d.text) - 1)) t(i)
        ), profile AS (
            SELECT lang AS plang, g FROM (
                SELECT lang, g, count(*) AS c,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY count(*) DESC, g) AS rnk
                FROM grams WHERE is_train
                GROUP BY lang, g
            ) WHERE rnk <= 8
        ), hits AS (
            SELECT doc_id, lang, plang, CAST(count(*) AS BIGINT) AS score
            FROM grams JOIN profile USING (g)
            WHERE NOT is_train
            GROUP BY doc_id, lang, plang
        ), best AS (
            SELECT doc_id, lang,
                   min_by(plang, lpad(CAST(999999 - score AS VARCHAR), 8, '0')
                                 || plang) AS predicted
            FROM hits GROUP BY doc_id, lang
        )
        SELECT lang AS true_lang, predicted,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM best GROUP BY lang, predicted
        ORDER BY true_lang, predicted
    """,
)
def langid_char_trigram_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-training character-trigram language classifier with its
    confusion census: even doc_ids train per-language profiles (top-8
    trigrams by count, ties to lexicographic gram), odd doc_ids are
    classified by profile-hit count with argmax tiebroken through one
    composite varchar key (inverted score || lang — same idiom as
    max_drawdown's trough pick), and the result is the
    (true, predicted) confusion matrix. The n-gram upgrade of
    lang_id_stopword: no curated wordlists, the profile IS derived
    from data.

    Scale: gram explode ∝ corpus bytes; the profile is |langs|×8 rows
    and BROADCASTS into the scoring join (grams never shuffle); the
    argmax runs per doc on ≤|langs| rows. Training and scoring are
    the same scan with a hash-split — one pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", "lang",
        F.explode(
            F.expr("transform(sequence(1, greatest(length(text) - 2, 0)),"
                   " i -> substring(text, i, 3))")
        ).alias("g"),
        (F.col("doc_id") % 2 == 0).alias("is_train"),
    )
    profile = (
        grams.filter("is_train")
        .groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.col("c").desc(), "g")
            ),
        )
        .filter(F.col("rnk") <= 8)
        .select(F.col("lang").alias("plang"), "g")
    )
    hits = (
        grams.filter(~F.col("is_train"))
        .join(F.broadcast(profile), "g")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.count(F.lit(1)).cast("long").alias("score"))
    )
    pick = F.concat(
        F.lpad((F.lit(999999) - F.col("score")).cast("string"), 8, "0"),
        F.col("plang"),
    )
    best = hits.groupBy("doc_id", "lang").agg(
        F.min_by("plang", pick).alias("predicted")
    )
    return (
        best.groupBy(F.col("lang").alias("true_lang"), "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


@query(
    "negative_sampling_pairs",
    category="TX-negsample",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, tok,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY pos) AS p
            FROM (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS pos
                FROM documents WHERE doc_id < 60
            ) WHERE tok <> ''
        ), pos_pairs AS (
            SELECT a.doc_id, a.p AS pos_idx, a.tok AS center,
                   b.tok AS context
            FROM toks a JOIN toks b
                 ON b.doc_id = a.doc_id AND b.p = a.p + 1
        ), vocab AS (
            SELECT tok,
                   pow(CAST(count(*) AS DOUBLE), 0.75) AS w,
                   row_number() OVER (ORDER BY tok) AS vid
            FROM toks GROUP BY tok
        ), vcum AS (
            SELECT tok, vid,
                   sum(w) OVER (ORDER BY vid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS lo,
                   sum(w) OVER (ORDER BY vid ROWS UNBOUNDED PRECEDING) AS hi,
                   sum(w) OVER () AS tot
            FROM vocab
        ), draws AS (
            SELECT p.doc_id, p.pos_idx, p.center, p.context,
                   j.j,
                   {md5_uniform_sql("'neg:' || CAST(p.doc_id AS VARCHAR) || ':' || CAST(p.pos_idx AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)")}
                       AS u
            FROM pos_pairs p,
                 (SELECT unnest([1, 2]) AS j) j
        ), negs AS (
            SELECT d.doc_id, d.pos_idx, d.center, d.context, d.j,
                   v.tok AS negative
            FROM draws d JOIN vcum v
                 ON d.u * v.tot >= coalesce(v.lo, 0.0)
                AND d.u * v.tot < v.hi
        )
        SELECT negative, CAST(count(*) AS BIGINT) AS n_drawn
        FROM negs GROUP BY negative
        HAVING count(*) >= 20
        ORDER BY n_drawn DESC, negative
    """,
)
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec-style negative sampling for training pairs: positives
    are adjacent (center, context) token pairs; each positive draws 2
    negatives from the unigram^0.75 distribution (Mikolov et al.'s
    smoothing) via inverse-CDF lookup — an md5-minted uniform lands in
    a token's cumulative-weight interval. The emitted census (tokens
    drawn ≥ 20 times) pins the whole machinery: tokenization, pair
    minting, the smoothed distribution, and the interval join.

    Determinism: the cumulative weights accumulate in ONE pinned
    vocabulary order (vid) on both engines, each uniform is minted
    from the (doc, position, draw) key, and the interval test
    u·tot ∈ [lo, hi) is evaluated on identical doubles — every draw
    lands identically.

    Scale: the vocabulary frame (with cumulative bounds) BROADCASTS
    into a range join against the draw stream — the standard
    distributed alias-table substitute; draws ∝ positives × k, all
    map-side until the census rollup. doc_id < 60 bounds the demo
    corpus; production removes the cap and shards the interval join
    by weight-range buckets.
    """
    from ..functions.sampling import md5_uniform
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    toks = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id", "tok",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy("pos0")
            ).alias("p"),
        )
    )
    a = toks.select("doc_id", F.col("p").alias("pos_idx"), F.col("tok").alias("center"))
    b = toks.select("doc_id", (F.col("p") - 1).alias("pos_idx"), F.col("tok").alias("context"))
    pos_pairs = a.join(b, ["doc_id", "pos_idx"])
    vocab = (
        toks.groupBy("tok")
        .agg(F.pow(F.count(F.lit(1)).cast("double"), 0.75).alias("w"))
        .withColumn("vid", F.row_number().over(W.orderBy("tok")))
    )
    vcum = (
        vocab.withColumn(
            "lo",
            F.sum("w").over(
                W.orderBy("vid").rowsBetween(W.unboundedPreceding, -1)
            ),
        )
        .withColumn(
            "hi",
            F.sum("w").over(W.orderBy("vid").rowsBetween(W.unboundedPreceding, 0)),
        )
        .withColumn("tot", F.sum("w").over(W.partitionBy()))
    )
    js = spark.range(1, 3).select(F.col("id").alias("j"))
    draws = pos_pairs.crossJoin(F.broadcast(js)).withColumn(
        "u",
        md5_uniform(
            "concat('neg:', cast(doc_id as string), ':', "
            "cast(pos_idx as string), ':', cast(j as string))"
        ),
    )
    negs = draws.join(
        F.broadcast(vcum),
        (F.col("u") * F.col("tot") >= F.coalesce("lo", F.lit(0.0)))
        & (F.col("u") * F.col("tot") < F.col("hi")),
    )
    return (
        negs.groupBy(F.col("tok").alias("negative"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_drawn"))
        .filter(F.col("n_drawn") >= 20)
    )


@query(
    "vocabulary_overlap_matrix",
    category="TX2-vocaboverlap",
    oracle="""
        WITH vocab AS (
            SELECT DISTINCT source, tok
            FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                  FROM documents)
            WHERE tok <> ''
        ), sizes AS (
            SELECT source, CAST(count(*) AS BIGINT) AS v
            FROM vocab GROUP BY source
        ), inter AS (
            SELECT a.source AS sa, b.source AS sb,
                   CAST(count(*) AS BIGINT) AS both_n
            FROM vocab a JOIN vocab b
              ON a.tok = b.tok AND a.source < b.source
            GROUP BY a.source, b.source
        )
        SELECT i.sa, i.sb, za.v AS v_a, zb.v AS v_b, i.both_n,
               CAST(round(CAST(i.both_n AS DOUBLE)
                          / (za.v + zb.v - i.both_n), 6) AS DOUBLE)
                   AS jaccard,
               CAST(round(CAST(i.both_n AS DOUBLE)
                          / least(za.v, zb.v), 6) AS DOUBLE)
                   AS overlap_coef
        FROM inter i
        JOIN sizes za ON za.source = i.sa
        JOIN sizes zb ON zb.source = i.sb
        ORDER BY jaccard DESC, i.sa, i.sb LIMIT 25
    """,
)
def vocabulary_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between corpus sources: Jaccard
    and Szymkiewicz-Simpson overlap coefficients over distinct token
    sets — the corpus-composition diagnostic that flags near-clone
    sources before dedup (two crawls of the same site show
    overlap_coef → 1 even when size differences hide it from
    Jaccard).

    Determinism: set sizes and intersections are exact integers from
    the distinct (source, token) frame; ratios divide once.

    Scale: the pair work is a TOKEN-keyed equi self-join of the
    vocabulary frame (Σ df² per token, the collocation bound), never
    source×source over raw text; sizes broadcast back.
    """
    docs = load_table(spark, sf_dir, "documents")
    # 4 consumers (pair sides + 2 size lookups) — persist so the
    # tokenize+distinct pass over documents runs once
    vocab = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
        .persist()
    )
    sizes = vocab.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    a = vocab.alias("a")
    b = vocab.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("both_n"))
    )
    za = sizes.select(F.col("source").alias("sa"), F.col("v").alias("v_a"))
    zb = sizes.select(F.col("source").alias("sb"), F.col("v").alias("v_b"))
    return (
        inter.join(F.broadcast(za), "sa")
        .join(F.broadcast(zb), "sb")
        .select(
            "sa", "sb", "v_a", "v_b", "both_n",
            F.round(
                F.col("both_n").cast("double")
                / (F.col("v_a") + F.col("v_b") - F.col("both_n")),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("both_n").cast("double")
                / F.least(F.col("v_a"), F.col("v_b")),
                6,
            ).alias("overlap_coef"),
        )
        .orderBy(F.desc("jaccard"), "sa", "sb")
        .limit(25)
    )


@query(
    "huffman_code_census",
    category="TX-huffman",
    oracle="""
        WITH chars AS (
            SELECT substring(text, CAST(t.off AS INTEGER), 1) AS sym
            FROM documents,
                 LATERAL unnest(generate_series(1, length(text)))
                     AS t(off)
        ), leaves AS (
            SELECT sym, CAST(count(*) AS BIGINT) AS cnt
            FROM chars GROUP BY sym
        ), hfw AS (
            WITH RECURSIVE hf AS (
                SELECT 0 AS k, sym, cnt,
                       cnt AS supw, sym AS tag,
                       CAST(0 AS BIGINT) AS depth
                FROM leaves
                UNION ALL
                SELECT * FROM (
                    WITH w AS (SELECT * FROM hf),
                    ranked AS (
                        SELECT tag, supw,
                               row_number() OVER (ORDER BY supw, tag)
                                   AS rk
                        FROM (SELECT DISTINCT tag, supw FROM w)
                    ), m AS (
                        SELECT max(CASE WHEN rk = 1 THEN tag END) AS t1,
                               max(CASE WHEN rk = 2 THEN tag END) AS t2,
                               CAST(sum(CASE WHEN rk <= 2 THEN supw
                                             ELSE 0 END) AS BIGINT)
                                   AS neww,
                               count(*) AS n_sup
                        FROM ranked
                    )
                    SELECT w.k + 1, w.sym, w.cnt,
                           CAST(CASE WHEN w.tag IN (m.t1, m.t2)
                                     THEN m.neww ELSE w.supw END
                                AS BIGINT) AS supw,
                           CASE WHEN w.tag IN (m.t1, m.t2)
                                THEN least(m.t1, m.t2) ELSE w.tag END
                               AS tag,
                           w.depth + CASE WHEN w.tag IN (m.t1, m.t2)
                                          THEN 1 ELSE 0 END AS depth
                    FROM w CROSS JOIN m
                    WHERE m.n_sup > 1
                )
            ) SELECT * FROM hf
        ), final AS (
            SELECT sym, cnt, depth AS code_len
            FROM hfw WHERE k = (SELECT max(k) FROM hfw)
        ), gstat AS (
            SELECT CAST(max(code_len) AS BIGINT) AS maxlen,
                   CAST(sum(cnt * code_len) AS BIGINT) AS total_bits,
                   CAST(sum(cnt) AS BIGINT) AS n_chars
            FROM final
        ), ent AS (
            SELECT sym,
                   sum(-(CAST(cnt AS DOUBLE) / g.n_chars)
                       * log2(CAST(cnt AS DOUBLE) / g.n_chars))
                       OVER (ORDER BY sym) AS h_run,
                   row_number() OVER (ORDER BY sym DESC) AS rdesc
            FROM final CROSS JOIN gstat g
        ), hval AS (
            SELECT h_run AS entropy FROM ent WHERE rdesc = 1
        ), kraft AS (
            SELECT CAST(sum(CAST(1 AS BIGINT)
                            << (g.maxlen - code_len)) AS BIGINT)
                       AS kraft_sum,
                   CAST(1 AS BIGINT) << max(g.maxlen) AS kraft_full
            FROM final CROSS JOIN gstat g
        )
        SELECT f.sym, f.cnt, f.code_len,
               CAST(round(g.total_bits * 1.0 / g.n_chars, 6) AS DOUBLE)
                   AS avg_bits,
               CAST(round(h.entropy, 6) AS DOUBLE) AS entropy,
               (k.kraft_sum = k.kraft_full) AS kraft_gate,
               (g.total_bits * 1.0 / g.n_chars >= h.entropy
                AND g.total_bits * 1.0 / g.n_chars < h.entropy + 1.0)
                   AS optimal_gate
        FROM final f CROSS JOIN gstat g CROSS JOIN hval h
        CROSS JOIN kraft k
        ORDER BY f.code_len, f.sym
    """,
)
def huffman_code_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HUFFMAN code-length census over the document corpus's character
    alphabet — the constructive companion to the entropy/surprisal
    family: per symbol its frequency and optimal prefix-code length,
    plus the corpus-level average bits/char against the Shannon
    entropy. Two self-certifying gates ride the hash: `kraft_gate`
    pins Σ 2^(maxlen−len) = 2^maxlen EXACTLY (integer arithmetic —
    Huffman trees are full, so Kraft holds with equality; any broken
    merge breaks it), and `optimal_gate` pins the Huffman theorem
    H ≤ avg_bits < H + 1.

    Ties are where Huffman determinism dies (equal-weight nodes admit
    many optimal trees with DIFFERENT per-symbol lengths), so the
    merge rule is pinned and shared: each step merges the two
    supernodes smallest by (weight, tag) where a supernode's tag is
    the MINIMUM symbol it contains; the merged tag is the smaller of
    the two. The oracle replays the identical merge sequence as a
    recursive CTE over per-leaf rows (each leaf carries its current
    supernode's weight and tag; members of the two chosen supers gain
    one depth), so every code length is hash-compared against an
    independent SQL replay of the same pinned algorithm.

    Scale: the character census is one explode→groupBy scan (the
    tokenization cost class); the alphabet is BOUNDED metadata
    (dozens of rows), so the merge loop is a driver-side collect in
    the F-list/Cox pattern; avg_bits is an EXACT integer ratio
    (Σ cnt·len / Σ cnt — no float accumulation) and the entropy sum
    is a pinned-order fold over the sorted alphabet.
    """
    import math

    docs = load_table(spark, sf_dir, "documents")
    leaves = (
        # non-empty-document guard: Spark's sequence(1, 0) DESCENDS
        # to [1, 0] (two phantom sym='' rows per empty doc) while
        # DuckDB's generate_series(1, 0) is empty — filter to
        # length >= 1 to make the implicit contract explicit on both
        # engines (the oracle's series is vacuously empty there)
        docs.filter(F.length("text") >= 1)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.length("text"))
            ).alias("off"),
            "text",
        )
        .select(F.expr("substring(text, off, 1)").alias("sym"))
        .groupBy("sym")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    )
    # bounded-alphabet Huffman with the pinned (weight, tag) merge
    # rule; state mirrors the oracle's per-leaf rows exactly
    syms = sorted((r["sym"], int(r["cnt"])) for r in leaves)
    state = {s: [c, c, s, 0] for s, c in syms}  # sym -> [cnt,supw,tag,d]
    while True:
        supers = sorted({(v[1], v[2]) for v in state.values()})
        if len(supers) == 1:
            break
        (w1, t1), (w2, t2) = supers[0], supers[1]
        neww, newtag = w1 + w2, min(t1, t2)
        for v in state.values():
            if v[2] in (t1, t2):
                v[1], v[2], v[3] = neww, newtag, v[3] + 1
    n_chars = sum(c for _, c in syms)
    total_bits = sum(state[s][0] * state[s][3] for s, _ in syms)
    maxlen = max(v[3] for v in state.values())
    kraft_sum = sum(1 << (maxlen - v[3]) for v in state.values())
    entropy = 0.0
    for s, c in syms:  # pinned order: ascending symbol
        p = c / n_chars
        entropy += -p * math.log2(p)
    avg_bits = total_bits * 1.0 / n_chars
    rows = [
        (
            s,
            c,
            state[s][3],
            round(avg_bits, 6),
            round(entropy, 6),
            kraft_sum == (1 << maxlen),
            entropy <= avg_bits < entropy + 1.0,
        )
        for s, c in syms
    ]
    rows.sort(key=lambda r: (r[2], r[0]))
    return spark.createDataFrame(
        rows,
        "sym string, cnt long, code_len long, avg_bits double,"
        " entropy double, kraft_gate boolean, optimal_gate boolean",
    )
