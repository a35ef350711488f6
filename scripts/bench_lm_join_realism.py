"""One-off measurement: the unigram-LM scoring-join form at WEB-LIKE
vocabulary and repetition (VERDICT r10 task #4).

The r10 A/B that picked the per-token scoring join for
``unigram_logprob`` ran at the driver fixture's 40-token vocabulary,
where a pre-reduced per-(doc, token) form has nothing to reduce by
construction — every doc holds each common token many times, so the
"reduced" frame is nearly the same size as the token frame and the
extra aggregate is pure overhead. On real web text the trade is
different: a ~200-token document with Zipf-distributed tokens has far
fewer DISTINCT tokens than token instances, so pre-reducing to
(doc, token, count) cuts the scoring-join probe volume by the
repetition factor.

This script synthesizes the realistic regime (100k-token Zipf-skewed
vocabulary — the bench_span_realism.py precedent — ~200 tokens/doc,
measured repetition factor printed alongside) and A/Bs three forms at
n=5,000 (sf0.1 doc-count scale) and n=50,000 (10x), interleaved
within one session so environment drift hits both arms equally:

  A. per-token join (shipped r10 form): explode -> join vocab -> agg
  B. pre-reduced:    explode -> (doc,tok) count -> join vocab -> agg
  C. pre-reduced for DSIR's two-LM ratio (same shape, two joins)
     vs the shipped per-token dsir form.

Outputs one JSON blob with walls, the token/distinct ratio, and the
verdict. Run: python scripts/bench_lm_join_realism.py
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.session import get_spark
from big_data_chicago_crimes_spark.operators.curation import (
    dsir_logratio,
    unigram_logprob,
)

spark = get_spark(app_name="lm-join-realism", shuffle_partitions=32)

VOCAB = 100_000
DOC_TOKENS = 200


def make_corpus(n: int):
    """n docs, DOC_TOKENS tokens each, Zipf over a 100k-token space:
    u = hash(doc, pos) uniform in [0,1), token rank = floor(VOCAB^u)
    (log-uniform ranks give P(rank r) proportional to 1/r — true Zipf:
    the top token carries ln2/lnV ~ 6% of all tokens, like 'the' in
    English), so documents genuinely repeat common tokens — the regime
    where pre-reduction has something to reduce. Deterministic
    (hash-driven, no RNG)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(DOC_TOKENS)),
                    lambda p: F.concat(
                        F.lit("w"),
                        F.floor(
                            F.pow(
                                F.lit(float(VOCAB)),
                                F.pmod(
                                    F.xxhash64(F.col("id"), p), F.lit(1_000_000)
                                ).cast("double")
                                / 1_000_000.0,
                            )
                        ).cast("long"),
                    ),
                ),
            ).alias("text"),
        )
        .cache()
    )


def unigram_logprob_reduced(df, text_col="text", id_col="doc_id", vocab_cap=None):
    """Form B: identical semantics to unigram_logprob, but the token
    frame is pre-reduced to distinct (doc, token) pairs with a
    multiplicity column BEFORE the vocabulary join, so the join probes
    distinct pairs instead of token instances."""
    from big_data_chicago_crimes_spark.functions.text import tokens
    from big_data_chicago_crimes_spark.operators.dedup import spread_for_compute

    toks = spread_for_compute(df).select(
        id_col, F.explode(tokens(text_col)).alias("__tok")
    )
    vocab = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    totals = vocab.agg(
        F.sum("__c").alias("__n_total"), F.count(F.lit(1)).alias("__v_size")
    )
    if vocab_cap is not None:
        vocab = vocab.orderBy(F.col("__c").desc(), F.col("__tok").asc()).limit(vocab_cap)
    dt = toks.groupBy(id_col, "__tok").agg(F.count(F.lit(1)).alias("__k"))
    scored = (
        dt.join(F.broadcast(vocab), "__tok", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("__k") * F.log10(F.coalesce(F.col("__c"), F.lit(0)) + 1)
            ).alias("__s"),
            F.sum("__k").alias("__n"),
        )
    )
    return scored.crossJoin(F.broadcast(totals)).select(
        id_col,
        F.round(
            (
                F.col("__s")
                - F.col("__n") * F.log10(F.col("__n_total") + F.col("__v_size"))
            )
            / F.col("__n"),
            6,
        ).alias("avg_logprob"),
    )


def dsir_logratio_reduced(df, target, text_col="text", id_col="doc_id"):
    """Form C: dsir_logratio with the same pre-reduction on the corpus
    token frame (both LM count frames still broadcast)."""
    from big_data_chicago_crimes_spark.functions.text import tokens
    from big_data_chicago_crimes_spark.operators.dedup import spread_for_compute

    toks = spread_for_compute(df).select(
        id_col, F.explode(tokens(text_col)).alias("__tok")
    )
    vocab_src = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__cs"))
    vocab_tgt = (
        target.select(F.explode(tokens(text_col)).alias("__tok"))
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__ct"))
    )
    totals = vocab_src.agg(
        F.sum("__cs").alias("__ns"), F.count(F.lit(1)).alias("__v")
    ).crossJoin(vocab_tgt.agg(F.sum("__ct").alias("__nt")))
    dt = toks.groupBy(id_col, "__tok").agg(F.count(F.lit(1)).alias("__k"))
    scored = (
        dt.join(F.broadcast(vocab_src), "__tok")
        .join(F.broadcast(vocab_tgt), "__tok", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("__k")
                * (
                    F.log10(F.coalesce(F.col("__ct"), F.lit(0)) + 1)
                    - F.log10(F.col("__cs") + 1)
                )
            ).alias("__d"),
            F.sum("__k").alias("__n"),
        )
    )
    return scored.crossJoin(F.broadcast(totals)).select(
        id_col,
        F.round(
            (
                F.col("__d")
                - F.col("__n")
                * (
                    F.log10(F.col("__nt") + F.col("__v"))
                    - F.log10(F.col("__ns") + F.col("__v"))
                )
            )
            / F.col("__n"),
            6,
        ).alias("dsir_score"),
    )


def timed(fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return min(walls)


out = {"vocab": VOCAB, "doc_tokens": DOC_TOKENS}
for n in (5_000, 50_000):
    corpus = make_corpus(n)
    corpus.count()
    target = corpus.filter(F.col("doc_id") % 20 == 0)

    from big_data_chicago_crimes_spark.functions.text import tokens as _tk

    tok_frame = corpus.select("doc_id", F.explode(_tk("text")).alias("t"))
    n_tokens = tok_frame.count()
    n_pairs = tok_frame.distinct().count()

    # equality first: the forms must agree bit-for-bit at 6dp
    a = {r.doc_id: r.avg_logprob for r in unigram_logprob(corpus).collect()}
    b = {r.doc_id: r.avg_logprob for r in unigram_logprob_reduced(corpus).collect()}
    mismatch = sum(1 for k in a if abs(a[k] - b[k]) > 1e-9)

    # interleaved timing: A B A B A B (shared drift hits both arms)
    walls_a, walls_b, walls_da, walls_db = [], [], [], []
    for _ in range(3):
        t0 = time.time(); unigram_logprob(corpus).count(); walls_a.append(time.time() - t0)
        t0 = time.time(); unigram_logprob_reduced(corpus).count(); walls_b.append(time.time() - t0)
        t0 = time.time(); dsir_logratio(corpus, target).count(); walls_da.append(time.time() - t0)
        t0 = time.time(); dsir_logratio_reduced(corpus, target).count(); walls_db.append(time.time() - t0)

    out[f"n{n}"] = {
        "tokens": n_tokens,
        "distinct_doc_token_pairs": n_pairs,
        "reduction_factor": round(n_tokens / max(1, n_pairs), 2),
        "score_mismatches_at_6dp": mismatch,
        "lm_per_token_s": round(min(walls_a), 3),
        "lm_reduced_s": round(min(walls_b), 3),
        "dsir_per_token_s": round(min(walls_da), 3),
        "dsir_reduced_s": round(min(walls_db), 3),
    }
    corpus.unpersist()

for fam in ("lm", "dsir"):
    r10 = out["n50000"][f"{fam}_per_token_s"] / out["n5000"][f"{fam}_per_token_s"]
    out[f"{fam}_verdict"] = (
        "reduced wins"
        if out["n50000"][f"{fam}_reduced_s"] < out["n50000"][f"{fam}_per_token_s"]
        else "per-token wins"
    )
print(json.dumps(out, indent=2))
