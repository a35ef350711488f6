"""Corpus-curation queries over ``documents`` (extension surface):
benchmark decontamination, near-dup cluster resolution, and TF-IDF
similarity through an inverted index. All three are fully DuckDB-oracled
— including the connected-components query, whose oracle computes the
transitive closure with a recursive CTE (the SQL-expressible fixpoint
twin of the distributed label-propagation the Spark side runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.curation import (
    connected_components,
    ngram_contamination,
    tfidf_cosine_pairs,
)
from big_data_chicago_crimes_spark.operators.dedup import token_jaccard_pairs
from big_data_chicago_crimes_spark.operators.sampling import hash_bucket
from big_data_chicago_crimes_spark.plans.registry import register
from big_data_chicago_crimes_spark.sources.readers import load_tables

_BUCKET_SQL = (
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"
)

# 4-word shingles for the contamination check: long enough that shared
# grams mean real overlap on this closed-vocabulary corpus (3-grams
# collide by chance — measured 420/439 docs flagged; 4-grams flag 69),
# short enough to survive the synthetic near-dup token edits. Real
# decontamination runs use n=8..13 over an open vocabulary — the n is a
# parameter, the pipeline shape is identical.
_CONTAMINATION_N = 4
_GRAM_PARTS = ", ".join(f"t[i+{j}]" for j in range(_CONTAMINATION_N))


@register(
    "docs_ngram_contamination",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, {_BUCKET_SQL} AS b,
                   regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
        ), grams AS (
            SELECT doc_id, source, b,
                   list_distinct(list_transform(
                       generate_series(1, greatest(len(t) - {_CONTAMINATION_N - 1}, 1)),
                       i -> concat_ws(' ', {_GRAM_PARTS}))) AS gs
            FROM toks
        ), bench AS (
            SELECT DISTINCT unnest(gs) AS g FROM grams WHERE b >= 90
        ), corpus AS (
            SELECT doc_id, source, unnest(gs) AS g FROM grams WHERE b < 90
        ), per_doc AS (
            SELECT c.doc_id, any_value(c.source) AS source,
                   COUNT(*) AS n_ngrams,
                   SUM(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END) AS n_contaminated
            FROM corpus c LEFT JOIN bench bg USING (g)
            GROUP BY c.doc_id
        )
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_contaminated > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_flagged,
               ROUND(AVG(ROUND(n_contaminated * 1.0 / n_ngrams, 6)), 6)
                   AS avg_contamination
        FROM per_doc GROUP BY source ORDER BY source
    """,
    tags=("curation", "decontamination", "extension"),
)
def docs_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination census: hold out a deterministic 10% of
    documents as the "benchmark", flag corpus docs sharing any verbatim
    4-word n-gram with it, and report per-source flag counts and mean
    contamination ratio. The benchmark gram set is broadcast — the
    corpus never shuffles its text."""
    t = load_tables(spark, sf_dir)
    b = hash_bucket("doc_id", 100)
    docs = t.documents
    cont = ngram_contamination(
        docs.filter(b < 90), docs.filter(b >= 90), n=_CONTAMINATION_N
    )
    return (
        cont.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_contaminated") > 0).cast("long")).alias("n_flagged"),
            F.round(F.avg("contamination"), 6).alias("avg_contamination"),
        )
        .orderBy("source")
    )


@register(
    "docs_dedup_components",
    oracle="""
        WITH RECURSIVE toks AS (
            SELECT doc_id, lang, source,
                   list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS t
            FROM documents
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM toks a JOIN toks b
              ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
            WHERE ROUND(len(list_intersect(a.t, b.t)) * 1.0 /
                  len(list_distinct(list_concat(a.t, b.t))), 6) >= 0.5
        ), sym AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ), reach AS (
            SELECT src, dst FROM sym
            UNION
            SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
            WHERE s.dst <> r.src
        ), comp AS (
            SELECT src AS doc_id, least(src, MIN(dst)) AS component
            FROM reach GROUP BY src
        )
        SELECT component, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM comp GROUP BY component ORDER BY component
    """,
    tags=("curation", "dedup", "components", "extension"),
)
def docs_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: token-Jaccard pairs (≥0.5, blocked on
    lang/source) become edges; connected components collapse them into
    clusters labeled by their minimum doc_id — the keep-one-per-cluster
    resolution step after pair generation. Returns each cluster's label
    and size. The oracle computes the same fixpoint via a recursive-CTE
    transitive closure.

    A/B'd (r10, interleaved, both tiers): the large-star/small-star
    variant LOSES on this graph — 47.7 s vs 32.8 s at sf1 (10.1 vs
    10.6 s at sf0.1) — because dedup clusters are near-cliques, so
    propagation converges in diameter≈small rounds while star pays more
    rounds of heavier two-sided joins. Star remains the right tool only
    for adversarially long chains (see connected_components_star).

    r11 absolute-cost attack (VERDICT r10 #5), both output-identical:
    (1) propagation is frontier-pruned — sf1 rounds stamp as
    [44760, 7150, 260, 20, 0] (near-clique collapse in 4 rounds) and
    the loop runs 3.69 vs 4.75 s interleaved; (2) the dominant cost was
    actually EDGE GENERATION, now routed by token_jaccard_pairs' global
    size-weighted dispatch to the lossless prefix-filtered leg at this
    block mix — 7.3 vs 15.5 s interleaved at sf1. Together ~11 s where
    the same-session old plan cost ~20 s."""
    t = load_tables(spark, sf_dir)
    edges = token_jaccard_pairs(t.documents, ["lang", "source"], threshold=0.5)
    # token_jaccard_pairs emits unique (id_a < id_b) pairs, so the
    # symmetrization dedup inside connected_components is skippable
    comp = connected_components(edges, edges_canonical=True)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("component")
    )


@register(
    "docs_tfidf_similar_pairs",
    # max_df_fraction=1.0 (no stop-token pruning): the synthetic corpus
    # is closed-vocabulary (~31 tokens, median df ≈ 0.8·N), so any real
    # df cap would empty the vocabulary; on an open-vocabulary corpus
    # the cap is the fan-out bound (see tfidf_cosine_pairs).
    oracle="""
        WITH tok AS (
            SELECT doc_id, lang, source, tok FROM (
                SELECT doc_id, lang, source,
                       unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
                FROM documents
            ) WHERE tok <> ''
        ), tf AS (
            SELECT doc_id, lang, source, tok, COUNT(*) AS tf
            FROM tok GROUP BY ALL
        ), n AS (
            SELECT COUNT(DISTINCT doc_id) AS n FROM documents
        ), idf AS (
            SELECT tok, ln((n.n + 1) / (COUNT(*) + 1)) + 1.0 AS idf
            FROM tf, n GROUP BY tok, n.n HAVING COUNT(*) <= n.n * 1.0
        ), weights AS (
            SELECT tf.doc_id, tf.lang, tf.source, tf.tok, tf.tf * idf.idf AS w
            FROM tf JOIN idf USING (tok)
        ), norms AS (
            SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM weights GROUP BY doc_id
        ), vec AS (
            SELECT w.doc_id, w.lang, w.source, w.tok, w.w / norms.nrm AS wn
            FROM weights w JOIN norms USING (doc_id)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(SUM(a.wn * b.wn), 6) AS cosine
        FROM vec a JOIN vec b
          ON a.tok = b.tok AND a.lang = b.lang AND a.source = b.source
             AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING ROUND(SUM(a.wn * b.wn), 6) >= 0.8
        ORDER BY id_a, id_b
    """,
    tags=("curation", "similarity", "tfidf", "extension"),
)
def docs_tfidf_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine ≥0.8 document pairs via inverted-index join (pairs
    assemble only from shared tokens — the sparse-similarity shape that
    scales), blocked on (lang, source) like the Jaccard pair ops."""
    t = load_tables(spark, sf_dir)
    return tfidf_cosine_pairs(
        t.documents,
        ["lang", "source"],
        threshold=0.8,
        max_df_fraction=1.0,
    ).orderBy("id_a", "id_b")


@register(
    "docs_bigram_perplexity",
    # λ = 0.75 so λ and 1−λ are exact binary doubles on both engines;
    # every arithmetic step below is written with the same literal
    # association order as the Spark expression (left-to-right
    # multiply-then-divide) so the 6dp round sees bit-identical doubles.
    # Funded by the top10_part_types + parts_never_ordered merge
    # (part_catalog_surface).
    oracle="""
        WITH t AS (
            SELECT doc_id, source,
                   list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        bi AS (
            SELECT doc_id, source, toks[i] AS w1, toks[i + 1] AS w2
            FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS r(i)
        ),
        uni AS (
            SELECT token AS w, COUNT(*) AS cu
            FROM (SELECT unnest(toks) AS token FROM t) GROUP BY token
        ),
        tot AS (SELECT SUM(cu) AS n_total, COUNT(*) AS v_size FROM uni),
        c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
        c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
        docbi AS (
            SELECT doc_id, source, w1, w2, COUNT(*) AS k
            FROM bi GROUP BY doc_id, source, w1, w2
        ),
        doc_scores AS (
            SELECT d.doc_id, d.source,
                   ROUND(SUM(d.k * log10(
                           0.75 * CAST(p2.c2 AS DOUBLE) / CAST(p1.c1 AS DOUBLE)
                           + 0.25 * (CAST(u.cu AS DOUBLE) + 1)
                             / CAST(tt.n_total + tt.v_size AS DOUBLE)))
                         / SUM(d.k), 6) AS lp
            FROM docbi d
            JOIN c2 p2 ON p2.w1 = d.w1 AND p2.w2 = d.w2
            JOIN c1 p1 ON p1.w1 = d.w1
            JOIN uni u ON u.w = d.w2
            CROSS JOIN tot tt
            GROUP BY d.doc_id, d.source
        )
        SELECT 'source' AS leg, source AS key,
               COUNT(*) AS n_docs, ROUND(AVG(lp), 6) AS lp
        FROM doc_scores GROUP BY source
        UNION ALL
        SELECT 'tail5' AS leg, CAST(doc_id AS VARCHAR) AS key,
               CAST(NULL AS BIGINT) AS n_docs, lp
        FROM (SELECT doc_id, lp FROM doc_scores ORDER BY lp, doc_id LIMIT 5)
        ORDER BY leg, key
    """,
    tags=("curation", "lm", "perplexity", "extension"),
)
def docs_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram LM document scoring
    (operators/curation.py:bigram_logprob) — the n-gram upgrade of the
    CCNet-style unigram perplexity filter: ``p(w2|w1) = λ·c2/c1 +
    (1−λ)·smoothed-unigram``, doc score = avg log10 p over adjacent-pair
    instances.

    Two legs in one slot: 'source' = per-source doc count + mean score
    (the corpus-health dashboard view); 'tail5' = the five
    lowest-scoring documents (score asc, doc_id tie-break) — the actual
    filter tail a curation run would drop, pinning PER-DOCUMENT scores
    under the driver hash, not just their aggregate.

    Plan: pair extraction is in-row (slice+zip+explode, zero shuffles);
    the bigram table is one count shuffle; scoring joins the pre-reduced
    (doc, w1, w2, multiplicity) frame — context marginal and unigram
    backoff broadcast, bigram join AQE-decided (see the operator
    docstring for the web-scale rationale)."""
    from big_data_chicago_crimes_spark.operators.curation import bigram_logprob

    t = load_tables(spark, sf_dir)
    scored = bigram_logprob(
        t.documents, "text", "doc_id", carry_cols=("source",), lam=0.75
    )
    return bigram_perplexity_legs(scored)


def bigram_perplexity_legs(scored: DataFrame) -> DataFrame:
    """The query's two legs over a bigram_logprob frame — shared with
    scripts/bench_bigram_persist.py so the persist A/B always measures
    the SHIPPED leg shape (a drifted copy would silently stale the
    no-persist verdict recorded in operators/curation.py)."""
    src = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("bigram_lp"), 6).alias("lp"),
    ).select(
        F.lit("source").alias("leg"),
        F.col("source").alias("key"),
        "n_docs",
        "lp",
    )
    tail = (
        scored.orderBy(F.col("bigram_lp").asc(), F.col("doc_id").asc())
        .limit(5)
        .select(
            F.lit("tail5").alias("leg"),
            F.col("doc_id").cast("string").alias("key"),
            F.lit(None).cast("bigint").alias("n_docs"),
            F.col("bigram_lp").alias("lp"),
        )
    )
    return src.unionByName(tail).orderBy("leg", "key")


def bpe_oracle_sql(
    n_merges: int, eow: str = "</w>", alphabet: str = "char"
) -> str:
    """The full ITERATIVE BPE training replayed in SQL: an unrolled CTE
    chain, one (pairs → best → fold) stage per merge step. Each stage's
    winner is computed in SQL (max summed freq, (lhs, rhs) binary-order
    tie-break — identical in both engines), and the merge application
    is the same canonical greedy fold the engine runs, expressed as
    ``list_reduce`` over the symbol list with a string accumulator
    (plain replace() would diverge on self-pair runs — see
    ``operators.curation.bpe_train_merges``). Valid only when no
    ``min_freq`` early stop triggers (the unrolled chain always runs
    ``n_merges`` stages). Two legs: 'merge' = the learned rule table;
    'encoded' = the per-lang subword-token census read off the FINAL
    training state s{n} (the vocabulary carries lang through the
    chain — grouping s0 by (lang, word) leaves every pair sum and
    every fold identical, since pair counts only ever SUM cnt)."""
    if alphabet == "byte":
        # GPT-2 byte-level initial alphabet: lowercase hex pairs —
        # lower(hex(encode(w))) is identical in both engines for every
        # code point, making this variant's replay contract universal
        sym_expr = (
            "trim(regexp_replace(lower(hex(encode(w))), '(..)', '\\1 ', 'g'))"
        )
    elif alphabet == "char":
        sym_expr = "array_to_string(string_split_regex(w, ''), ' ')"
    else:
        raise ValueError(f"alphabet must be 'char' or 'byte', got {alphabet!r}")
    stages = []
    finals = []
    for k in range(1, n_merges + 1):
        prev = "s0" if k == 1 else f"s{k - 1}"
        stages.append(f"""
        p{k} AS (
            SELECT cnt, sy[i] AS a, sy[i+1] AS b
            FROM (SELECT cnt, string_split(trim(seq), ' ') AS sy FROM {prev}),
                 UNNEST(generate_series(1, len(sy) - 1)) AS t(i)
        ), b{k} AS (
            SELECT a, b, f FROM (
                SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS f
                FROM p{k} GROUP BY a, b
                ORDER BY f DESC, a, b LIMIT 1
            )
        ), s{k} AS (
            SELECT lang, cnt, list_reduce(
                list_prepend(' ', string_split(trim(seq), ' ')),
                (acc, x) -> CASE
                    WHEN suffix(acc, ' ' || a || ' ') AND x = b
                    THEN left(acc, length(acc) - length(a) - 1) || a || b || ' '
                    ELSE acc || x || ' '
                END) AS seq
            FROM {prev} CROSS JOIN b{k}
        )""")
        finals.append(
            f"SELECT 'merge' AS leg, {k} AS step, a AS lhs, b AS rhs, "
            f"a || b AS merged, f AS freq FROM b{k}"
        )
    chain = ",".join(stages)
    union = "\n            UNION ALL ".join(finals)
    return f"""
        WITH words AS (
            SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents WHERE text IS NOT NULL
        ), s0 AS (
            SELECT lang, COUNT(*) AS cnt,
                   ' ' || {sym_expr}
                       || ' {eow} ' AS seq
            FROM words WHERE w <> '' GROUP BY lang, w
        ),{chain}
        SELECT * FROM (
            {union}
            UNION ALL
            SELECT 'encoded' AS leg, CAST(NULL AS INT) AS step,
                   lang AS lhs, CAST(NULL AS VARCHAR) AS rhs,
                   CAST(NULL AS VARCHAR) AS merged,
                   CAST(SUM(len(string_split(trim(seq), ' ')) * cnt) AS BIGINT) AS freq
            FROM s{n_merges} GROUP BY lang
        ) ORDER BY leg, step, lhs
    """


_BPE_MERGES = 6


@register(
    "docs_bpe_merges",
    # NEW r16 operator, registered at slot 12 of the r16 window (the
    # never-sampled tripwire forces new rows inside the first 50), so
    # it certified in round 16 itself — CORRECTNESS_r16 hash-green
    # (ADVICE r16: an earlier revision of this comment contradicted
    # registry.py on the window status; the registry was right). The
    # adopted r16 BENCH stamp predates the row; bench.py HEADLINE
    # picked it up at r17 per the recorded plan. The oracle
    # replays the ENTIRE iterative training — the suite's first
    # SQL-replayable iterative-algorithm row (dedup components' oracle
    # recurses to verify a fixpoint; this one replays a LOOP stage by
    # stage): 6 unrolled (pairs → argmax → greedy-fold) CTE stages.
    # n_merges=6 keeps the min_freq early stop unreachable at every
    # driver SF (step-6 freq >> 1 at sf0.001 already, and frequencies
    # only grow with SF).
    oracle=bpe_oracle_sql(_BPE_MERGES),
    tags=("curation", "bpe", "tokenizer", "extension"),
)
def docs_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAIN + ENCODE (Sennrich et al. 2016), two legs:

    - ``merge`` — the first 6 learned merge rules with frequencies,
      (step, lhs, rhs, merged, freq) in learning order. The corpus
      aggregates to the word-frequency vocabulary ONCE; every training
      iteration runs on that vocab-sized frame (pair explode +
      groupBy), fetches one winner row (dim-bounded collect), and
      applies the merge as a codegen fold — the corpus-size-free loop
      of :func:`~big_data_chicago_crimes_spark.operators.curation.bpe_train_merges`.
    - ``encoded`` — the learned rules APPLIED: per-language
      subword-token totals (``lhs`` = lang, ``freq`` = tokens) via
      :func:`~big_data_chicago_crimes_spark.operators.curation.bpe_encode_counts`
      — the exact token-budget answer of the trained tokenizer, which
      the oracle replays by reading its final training state, so the
      driver hash pins train AND encode agreeing across engines."""
    from big_data_chicago_crimes_spark.operators.curation import (
        bpe_encode_counts,
        bpe_train_merges,
    )

    t = load_tables(spark, sf_dir)
    merges = bpe_train_merges(t.documents, "text", n_merges=_BPE_MERGES)
    rules = [(r.lhs, r.rhs) for r in merges.orderBy("step").collect()]
    merge_leg = merges.select(
        F.lit("merge").alias("leg"), "step", "lhs", "rhs", "merged", "freq"
    )
    enc_leg = bpe_encode_counts(
        t.documents, rules, "text", group_cols=["lang"]
    ).select(
        F.lit("encoded").alias("leg"),
        F.lit(None).cast("int").alias("step"),
        F.col("lang").alias("lhs"),
        F.lit(None).cast("string").alias("rhs"),
        F.lit(None).cast("string").alias("merged"),
        F.col("n_bpe_tokens").alias("freq"),
    )
    return merge_leg.unionByName(enc_leg).orderBy("leg", "step", "lhs")
