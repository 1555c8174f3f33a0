"""Record-linkage / entity-resolution operators.

The matching toolbox a data-integration pipeline runs before any
join on dirty keys: checksum validation (Luhn mod-10 over minted
PAN-like digit strings), blocked fuzzy matching (Jaro-Winkler within
token blocks — the classic Fellegi-Sunter comparison step), link
prediction on the interaction graph (Adamic-Adar common-neighbor
scoring), and exact phrase lookup through a positional token index.

Determinism: every digit/token is md5-minted or parsed from data (no
RNG state); Jaro-Winkler is exact rational arithmetic verified
bit-identical to DuckDB's builtin (including the empty-string → 0.0
edge); Adamic-Adar terms are 1/ln(integer degree) summed over
bounded common-neighbor sets, rounded at 6 well above the ulp drift.

Scale: all pair generation is blocked (token blocks, common-neighbor
join on node id) — never all-pairs; the one pandas UDF runs over the
blocked DISTINCT-name pair frame (dimension-sized), not fact rows.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ._shared import INTERACTION_UND_CTE


# --- Luhn: ONE generator emits the engine-shared SQL text -----------------

def _luhn_digit_sql(key_sql: str, i: int) -> str:
    """Digit i (1-based, left to right) of the 16-digit minted PAN:
    hex nibble i of md5(key), folded mod 10. Engine-shared text —
    ``instr``/``substr``/``md5``/``%`` behave identically in Spark
    SQL and DuckDB (verified)."""
    return (
        f"((instr('0123456789abcdef', substr(md5({key_sql}), {i}, 1)) - 1)"
        f" % 10)"
    )


def _luhn_term_sql(key_sql: str, i: int) -> str:
    """Luhn contribution of digit i: doubled (with 9-subtraction) at
    odd positions — rightmost digit is position 16 = the check digit,
    doubling applies where (16 - i) is odd ⇔ i odd."""
    d = _luhn_digit_sql(key_sql, i)
    if i % 2 == 1:
        return f"(CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9 ELSE 2 * {d} END)"
    return d


def _luhn_sql(key_sql: str) -> tuple[str, str]:
    """(raw_total_sql, fixed_total_sql): Luhn sum over all 16 minted
    digits, and the sum with the check digit REPLACED by the digit
    that makes the number pass — the repair a validation pipeline
    applies. Both are integer expressions shared verbatim by the
    Spark plan (F.expr) and the DuckDB oracle."""
    raw = " + ".join(_luhn_term_sql(key_sql, i) for i in range(1, 17))
    body = " + ".join(_luhn_term_sql(key_sql, i) for i in range(1, 16))
    fixed = f"({body}) + ((10 - (({body}) % 10)) % 10)"
    return f"({raw})", f"({fixed})"


_LUHN_RAW, _LUHN_FIXED = _luhn_sql("cast(event_id AS STRING)")


@query(
    "luhn_validity_census",
    category="ER-checksum",
    oracle=f"""
        WITH scored AS (
            SELECT event_type,
                   CASE WHEN {_LUHN_RAW} % 10 = 0 THEN 1 ELSE 0 END AS ok_raw,
                   CASE WHEN {_LUHN_FIXED} % 10 = 0 THEN 1 ELSE 0 END AS ok_fix
            FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(ok_raw) AS BIGINT) AS n_valid_raw,
               round(CAST(sum(ok_raw) AS DOUBLE) / count(*), 6) AS valid_rate,
               (min(ok_fix) = 1) AS all_fixed_valid
        FROM scored GROUP BY event_type ORDER BY event_type
    """,
)
def luhn_validity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) checksum census over minted 16-digit PAN-like
    strings — the validation step a PII scanner runs to separate real
    card numbers from random digit runs (random strings pass ~10%).
    Digits are md5-minted from event_id (deterministic, engine-shared
    expression text); `all_fixed_valid` is the repair contract: after
    recomputing the check digit, EVERY number must validate — a
    literal-TRUE column the hash check pins.

    Scale: pure codegen string/integer math on the fact scan, one
    map-side-combinable aggregate keyed by event_type (5 groups). No
    joins, no windows, no UDFs — whole-stage codegen end to end.
    """
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        "event_type",
        (F.expr(_LUHN_RAW) % 10 == 0).cast("int").alias("ok_raw"),
        (F.expr(_LUHN_FIXED) % 10 == 0).cast("int").alias("ok_fix"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("ok_raw").cast("long").alias("n_valid_raw"),
            F.round(
                F.sum("ok_raw").cast("double") / F.count(F.lit(1)), 6
            ).alias("valid_rate"),
            (F.min("ok_fix") == 1).alias("all_fixed_valid"),
        )
    )


# --- Jaro-Winkler blocked fuzzy matching ----------------------------------

def _jaro_winkler(s1: str, s2: str) -> float:
    """Exact Jaro-Winkler (scaling 0.1, max prefix 4, boost threshold
    0.7) — verified bit-identical to DuckDB's
    ``jaro_winkler_similarity`` across 1600 adversarial pairs,
    including the ''/'' → 0.0 edge DuckDB chose."""
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    match_dist = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(l2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (matches / l1 + matches / l2 + (matches - t) / matches) / 3
    if j > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        j += prefix * 0.1 * (1 - j)
    return j


@query(
    "jaro_winkler_blocked_pairs",
    category="ER-fuzzy",
    oracle="""
        WITH names AS (
            SELECT DISTINCT p_name FROM part
        ), blocked AS (
            SELECT p_name, string_split(p_name, ' ')[2] AS blk FROM names
        ), pairs AS (
            SELECT a.blk, a.p_name AS name_a, b.p_name AS name_b,
                   jaro_winkler_similarity(a.p_name, b.p_name) AS jw
            FROM blocked a JOIN blocked b
              ON a.blk = b.blk AND a.p_name < b.p_name
        )
        SELECT blk, name_a, name_b, round(jw, 6) AS jw_sim
        FROM pairs WHERE jw >= 0.8
        ORDER BY jw_sim DESC, name_a, name_b LIMIT 25
    """,
)
def jaro_winkler_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: candidate part-name pairs within a
    token block (second word = the product noun), scored by
    Jaro-Winkler — the comparison step of a Fellegi-Sunter record
    linker. Blocking is what makes ER feasible at scale: pairs exist
    only WITHIN a block (Σ block² work), never across the full name
    dimension.

    Correctness: the Python JW is bit-identical to DuckDB's builtin
    (verified over adversarial pairs incl. empty strings), so round-6
    hashes match exactly. The pandas UDF runs on the blocked pair
    frame of DISTINCT names — dimension-sized, not fact-sized.

    Scale: distinct-name dedup first (one shuffle), equi-join on the
    block key (hash partition by block), Arrow-batched UDF on the
    bounded pair frame, TakeOrdered final. A 100 TB fact table never
    enters: ER runs on the name dimension by construction.
    """
    # defined inside the query (house rule): a module-level pandas_udf
    # breaks worker-side import — the decorator needs a live session.
    @F.pandas_udf("double")
    def _jw_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_winkler(a, b) for a, b in zip(s1, s2)], dtype="float64"
        )

    # asNondeterministic stops Catalyst pushing the jw >= 0.8 filter
    # THROUGH the projection, which would clone the UDF into a second
    # ArrowEvalPython and score every pair twice (observed in the
    # plan). JW is pure — the marker only pins single evaluation.
    _jw_udf = _jw_udf.asNondeterministic()

    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    blocked = names.select(
        "p_name", F.split("p_name", " ").getItem(1).alias("blk")
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_name") < F.col("b.p_name")),
    ).select(
        F.col("a.blk").alias("blk"),
        F.col("a.p_name").alias("name_a"),
        F.col("b.p_name").alias("name_b"),
        _jw_udf(F.col("a.p_name"), F.col("b.p_name")).alias("jw"),
    )
    return (
        pairs.filter(F.col("jw") >= 0.8)
        .select("blk", "name_a", "name_b", F.round("jw", 6).alias("jw_sim"))
        .orderBy(F.desc("jw_sim"), "name_a", "name_b")
        .limit(25)
    )


# --- Adamic-Adar link prediction ------------------------------------------

@query(
    "adamic_adar_link_prediction",
    category="graph-linkpred",
    oracle=f"""
        WITH {INTERACTION_UND_CTE}, sym AS (
            SELECT a AS node, b AS nbr FROM und
            UNION ALL
            SELECT b AS node, a AS nbr FROM und
        ), deg AS (
            SELECT node, CAST(count(*) AS BIGINT) AS d
            FROM sym GROUP BY node
        ), cand AS (
            SELECT s1.nbr AS x, s2.nbr AS y, s1.node AS z
            FROM sym s1 JOIN sym s2
              ON s1.node = s2.node AND s1.nbr < s2.nbr
        ), scored AS (
            SELECT x, y,
                   CAST(count(*) AS BIGINT) AS common_nbrs,
                   sum(1.0 / ln(deg.d)) AS aa
            FROM cand JOIN deg ON cand.z = deg.node
            GROUP BY x, y
        )
        SELECT x AS user_a, y AS user_b, common_nbrs,
               round(aa, 6) AS aa_score
        FROM scored
        WHERE NOT EXISTS (
            SELECT 1 FROM und WHERE und.a = scored.x AND und.b = scored.y
        )
        ORDER BY aa_score DESC, user_a, user_b LIMIT 20
    """,
)
def adamic_adar_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the shared interaction graph:
    score non-adjacent user pairs by Σ_z 1/ln(deg z) over common
    neighbors z — rare shared contacts count more than hubs. The
    classic friend-of-friend recommender readout.

    Determinism: degrees are exact integers on the DISTINCT canonical
    edge set; each AA term is one division by ln(int); common-neighbor
    sets are small so the float sum sits orders of magnitude inside
    round-6. deg(z) ≥ 2 for every generating node (it has two distinct
    neighbors in the pair), so ln is never 0.

    Scale: the wedge join (sym ⋈ sym on node) shuffles on node id —
    the same Σ deg² shape as triangle counting; at 100 TB hub nodes
    dominate Σ deg², and because AA weights hubs by 1/ln d → ≈0, a
    production run caps per-node fan-out (df-cap on deg, as the
    winnowing queries do) with bounded score loss. The existing-edge
    filter is a left_anti join on the canonical pair, and the final
    top-20 is a TakeOrdered heap, not a global sort.
    """
    from ..operators.graph import interaction_edges

    ev = load_table(spark, sf_dir, "events")
    und = interaction_edges(ev, undirected=True)
    sym = und.select(
        F.col("a").alias("node"), F.col("b").alias("nbr")
    ).unionAll(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
    s1 = sym.alias("s1")
    s2 = sym.alias("s2")
    cand = s1.join(
        s2,
        (F.col("s1.node") == F.col("s2.node"))
        & (F.col("s1.nbr") < F.col("s2.nbr")),
    ).select(
        F.col("s1.nbr").alias("x"),
        F.col("s2.nbr").alias("y"),
        F.col("s1.node").alias("z"),
    )
    scored = (
        cand.join(deg, cand["z"] == deg["node"])
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_nbrs"),
            F.sum(F.lit(1.0) / F.log(F.col("d"))).alias("aa"),
        )
    )
    non_edges = scored.join(
        und,
        (scored["x"] == und["a"]) & (scored["y"] == und["b"]),
        "left_anti",
    )
    return (
        non_edges.select(
            F.col("x").alias("user_a"),
            F.col("y").alias("user_b"),
            "common_nbrs",
            F.round("aa", 6).alias("aa_score"),
        )
        .orderBy(F.desc("aa_score"), "user_a", "user_b")
        .limit(20)
    )


# --- Positional phrase index ----------------------------------------------

@query(
    "phrase_bigram_positional_match",
    category="IR-phrase",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(generate_series(1, len(ws))) AS pos,
                   unnest(ws) AS w
            FROM (SELECT doc_id, string_split(text, ' ') AS ws
                  FROM documents)
        ), bigrams AS (
            SELECT doc_id, w AS w1,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM toks
        ), top1 AS (
            SELECT w1, w2 FROM bigrams WHERE w2 IS NOT NULL
            GROUP BY w1, w2
            ORDER BY count(*) DESC, w1, w2 LIMIT 1
        ), hits AS (
            SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
            FROM bigrams b JOIN top1 t ON b.w1 = t.w1 AND b.w2 = t.w2
            GROUP BY b.doc_id
        )
        SELECT h.doc_id, t.w1 AS phrase_w1, t.w2 AS phrase_w2,
               n_occurrences
        FROM hits h CROSS JOIN top1 t
        ORDER BY n_occurrences DESC, doc_id LIMIT 10
    """,
)
def phrase_bigram_positional_match(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Positional-index phrase query: build (doc, pos, token), form
    adjacent bigrams with a per-doc lead window (the streaming form
    of a positional inverted index), find the corpus's most frequent
    bigram, then rank documents by how often they contain that exact
    phrase — the two-term phrase-query path of a search engine.

    Determinism: token positions are minted identically in both
    engines (split + ordinal); the top bigram ties break
    lexicographically; occurrence counts are exact integers.

    Scale: tokenization is a Generate (explode) — map-side; the
    bigram window partitions BY doc_id (bounded frames, fully
    parallel); the top-1 phrase is a 1-row broadcast back onto the
    bigram stream (no second scan of raw text); doc ranking is a
    TakeOrdered heap. At 100 TB the only shuffle is the bigram
    count — map-side combined on (w1, w2).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "w"),
    )
    wd = Window.partitionBy("doc_id").orderBy("pos0")
    bigrams = toks.select(
        "doc_id",
        F.col("w").alias("w1"),
        F.lead("w").over(wd).alias("w2"),
    )
    top1 = (
        bigrams.filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "w1", "w2")
        .limit(1)
        .select("w1", "w2")
    )
    hits = (
        bigrams.join(
            F.broadcast(top1.withColumnRenamed("w1", "t1").withColumnRenamed("w2", "t2")),
            (F.col("w1") == F.col("t1")) & (F.col("w2") == F.col("t2")),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    return (
        hits.crossJoin(
            F.broadcast(
                top1.select(
                    F.col("w1").alias("phrase_w1"),
                    F.col("w2").alias("phrase_w2"),
                )
            )
        )
        .select("doc_id", "phrase_w1", "phrase_w2", "n_occurrences")
        .orderBy(F.desc("n_occurrences"), "doc_id")
        .limit(10)
    )


# DuckDB replica of American Soundex (Spark's F.soundex):
# translate letters to codes (vowels->0, H/W->9), drop the
# transparent 9s BEFORE collapsing runs (so same-code letters
# separated by H/W merge — the Ashcraft->A261 rule), collapse,
# then first letter + next 3 non-zero codes right-padded with 0.
# Runs collapse one digit class at a time — DuckDB's RE2 regex has
# no backreferences, so '(\\d)\\1+' silently never matches.
def _soundex_sql(col: str) -> str:
    up = f"upper({col})"
    t = (f"translate({up}, 'AEIOUYHWBFPVCGJKQSXZDTLMNR',"
         f" '00000099111122222222334556')")
    collapsed = f"regexp_replace({t}, '9', '', 'g')"
    for d in "0123456":
        collapsed = f"regexp_replace({collapsed}, '{d}{{2,}}', '{d}', 'g')"
    digits = f"replace(substr({collapsed}, 2), '0', '')"
    return f"substr(substr({up}, 1, 1) || {digits} || '000', 1, 4)"


@query(
    "soundex_phonetic_blocking",
    category="RL-phonetic",
    oracle=f"""
        WITH words AS (
            SELECT DISTINCT tok AS w FROM (
                SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents
            ) WHERE tok <> ''
            UNION
            SELECT DISTINCT tok FROM (
                SELECT unnest(string_split(p_name, ' ')) AS tok FROM part
            ) WHERE tok <> ''
        ), coded AS (
            SELECT w, {_soundex_sql("w")} AS code FROM words
        )
        SELECT code,
               CAST(count(*) AS BIGINT) AS n_words,
               min(w) AS first_word,
               max(w) AS last_word,
               CAST(count(*) > 1 AS BOOLEAN) AS is_block
        FROM coded
        GROUP BY code
        ORDER BY n_words DESC, code
    """,
)
def soundex_phonetic_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex phonetic blocking census over the corpus+catalog
    vocabulary: every distinct word from documents and part names is
    coded with American Soundex (Spark's builtin ``F.soundex``; the
    oracle replicates the algorithm in SQL — translate to digit
    codes, drop the transparent H/W, collapse runs, first letter +
    three codes zero-padded), and codes with >1 word are the
    phonetic BLOCKS a record-linkage pass would compare within —
    the classic cheap blocking key before Jaro-Winkler scoring
    (jaro_winkler_blocked_pairs uses token blocks; this is the
    phonetic alternative).

    Determinism: pure string algebra — no floats anywhere.

    Scale: the census runs on the DISTINCT-word frame (vocabulary-
    sized, not corpus-sized); at 100 TB the same plan holds because
    soundex is a scan-side projection and the groupBy key space is
    |codes| ≤ 26·7³.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    parts = load_table(spark, sf_dir, "part").select(
        F.explode(F.split("p_name", " ")).alias("w")
    )
    words = docs.unionAll(parts).filter(F.col("w") != "").distinct()
    coded = words.select("w", F.soundex(F.upper("w")).alias("code"))
    return (
        coded.groupBy("code")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.min("w").alias("first_word"),
            F.max("w").alias("last_word"),
            (F.count(F.lit(1)) > 1).alias("is_block"),
        )
    )


# --- Fellegi-Sunter match-weight estimation --------------------------------

# md5-minted corruption flags per field (deterministic "dirty copy"
# of every order record): nibble i of md5(o_orderkey), folded.
def _nib(i: int) -> str:
    return (
        f"(instr('0123456789abcdef',"
        f" substr(md5(cast(o_orderkey AS STRING)), {i}, 1)) - 1)"
    )


_C_CUST = f"(CASE WHEN {_nib(1)} % 10 = 0 THEN 1 ELSE 0 END)"   # ~10%
_C_DATE = f"(CASE WHEN {_nib(2)} % 5 = 0 THEN 1 ELSE 0 END)"    # ~20%
_C_PRIO = f"(CASE WHEN {_nib(3)} % 4 = 0 THEN 1 ELSE 0 END)"    # ~25%

# log2 weights from (m, u) — identical text both engines
_W2 = "((ln({a}) - ln({b})) / ln(2.0))"


@query(
    "fellegi_sunter_match_weights",
    category="RL-fsweights",
    oracle=f"""
        WITH base AS (
            SELECT o_orderkey, o_custkey,
                   CAST(o_orderdate AS DATE) AS odate, o_orderpriority,
                   {_C_CUST} AS c_cust, {_C_DATE} AS c_date,
                   {_C_PRIO} AS c_prio
            FROM orders
        ), tot AS (
            SELECT CAST(count(*) AS BIGINT) AS r,
                   CAST(sum(c_cust) AS BIGINT) AS k_cust,
                   CAST(sum(c_date) AS BIGINT) AS k_date,
                   CAST(sum(c_prio) AS BIGINT) AS k_prio
            FROM base
        ), u_cust AS (
            SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS agree2 FROM
            (SELECT count(*) AS c FROM base GROUP BY o_custkey)
        ), u_date AS (
            SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS agree2 FROM
            (SELECT count(*) AS c FROM base GROUP BY odate)
        ), u_prio AS (
            SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS agree2 FROM
            (SELECT count(*) AS c FROM base GROUP BY o_orderpriority)
        ), fields AS (
            SELECT 'custkey' AS field, t.r, t.k_cust AS k, u.agree2
            FROM tot t CROSS JOIN u_cust u
            UNION ALL
            SELECT 'orderdate', t.r, t.k_date, u.agree2
            FROM tot t CROSS JOIN u_date u
            UNION ALL
            SELECT 'priority', t.r, t.k_prio, u.agree2
            FROM tot t CROSS JOIN u_prio u
        ), mu AS (
            SELECT field, r, k, agree2,
                   CAST(r - k AS DOUBLE) / r AS m,
                   CAST(agree2 AS DOUBLE)
                       / (CAST(r AS DOUBLE) * (r - 1)) AS u
            FROM fields
        )
        SELECT field, r AS n_records, k AS n_corrupted,
               CAST(round(m, 6) AS DOUBLE) AS m_prob,
               CAST(round(u, 6) AS DOUBLE) AS u_prob,
               CAST(round({_W2.format(a="m", b="u")}, 6) AS DOUBLE)
                   AS w_agree,
               CAST(round({_W2.format(a="(1.0 - m)", b="(1.0 - u)")}, 6)
                    AS DOUBLE) AS w_disagree
        FROM mu ORDER BY field
    """,
)
def fellegi_sunter_match_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter match/unmatch weight estimation — the parameter
    step of probabilistic record linkage: every order record gets a
    deterministic dirty copy (md5-minted per-field corruption at
    10/20/25%), so m (P[field agrees | same entity]) is measured
    EXACTLY as the uncorrupted fraction, and u (P[agrees | random
    pair]) comes from the value-frequency identity Σc(c−1)/R(R−1) —
    no pair enumeration at all. Agreement weight log₂(m/u) and
    disagreement weight log₂((1−m)/(1−u)) per field are what a linker
    sums over fields to score candidate pairs (the blocked JW and
    Soundex queries provide the candidates).

    Determinism: m and u are exact integer ratios; the log₂ weights
    are shared-text double expressions over them.

    Scale: u needs only per-field value censuses (groupBy on each
    field's key space — the Σc² census every skew profiler already
    runs); nothing ever touches record pairs, so 100 TB linkage
    parameter estimation is three hash aggregates.
    """
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.to_date("o_orderdate").alias("odate"),
        "o_orderpriority",
        F.expr(_C_CUST).alias("c_cust"),
        F.expr(_C_DATE).alias("c_date"),
        F.expr(_C_PRIO).alias("c_prio"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("r"),
        F.sum("c_cust").cast("long").alias("k_cust"),
        F.sum("c_date").cast("long").alias("k_date"),
        F.sum("c_prio").cast("long").alias("k_prio"),
    )
    parts = None
    for field, key, kcol in (
        ("custkey", "o_custkey", "k_cust"),
        ("orderdate", "odate", "k_date"),
        ("priority", "o_orderpriority", "k_prio"),
    ):
        agree2 = (
            base.groupBy(key)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.sum(F.col("c") * (F.col("c") - 1))
                .cast("long")
                .alias("agree2")
            )
        )
        row = (
            tot.crossJoin(F.broadcast(agree2))
            .select(
                F.lit(field).alias("field"),
                "r",
                F.col(kcol).alias("k"),
                "agree2",
            )
        )
        parts = row if parts is None else parts.unionAll(row)
    mu = parts.select(
        "field", "r", "k", "agree2",
        ((F.col("r") - F.col("k")).cast("double") / F.col("r")).alias("m"),
        (
            F.col("agree2").cast("double")
            / (F.col("r").cast("double") * (F.col("r") - 1))
        ).alias("u"),
    )
    return mu.select(
        "field",
        F.col("r").alias("n_records"),
        F.col("k").alias("n_corrupted"),
        F.round("m", 6).alias("m_prob"),
        F.round("u", 6).alias("u_prob"),
        F.round(F.expr(_W2.format(a="m", b="u")), 6).alias("w_agree"),
        F.round(
            F.expr(_W2.format(a="(1.0 - m)", b="(1.0 - u)")), 6
        ).alias("w_disagree"),
    ).orderBy("field")
