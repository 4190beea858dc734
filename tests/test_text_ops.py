"""Unit tests for the PII-redaction and repetition operators.

Fixture-level checks with known expected values; the corpus-level
parity is covered by test_oracle_parity (q_pii_redact,
q_text_repetition).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.text import redact_pii, repetition_metrics


def _redact_one(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(redact_pii("text").alias("r")).head()[0]


def test_redact_email_ip_id_phone(spark):
    out = _redact_one(
        spark,
        "mail a.b+c@sub.example.org ip 192.168.0.1 ssn 123-45-6789 "
        "ph +44 20 7946 0958 done",
    )
    assert out == "mail <EMAIL> ip <IP> ssn <ID> ph <PHONE> done"


def test_redact_multiple_and_adjacent(spark):
    out = _redact_one(spark, "x@y.io,z@w.ai 10.0.0.1/8")
    assert out == "<EMAIL>,<EMAIL> <IP>/8"


def test_redact_leaves_clean_text_alone(spark):
    s = "no pii here, just words and a version 1.2 string"
    assert _redact_one(spark, s) == s


def test_redact_order_is_deterministic_and_leakproof(spark):
    # An SSN-shaped run inside a phone-looking string masks as <ID>
    # (ID pattern runs before PHONE); what matters is zero digit leak.
    out = _redact_one(spark, "call +1 555-12-3456 now")
    assert out == "call +1 <ID> now"
    assert "555" not in out and "3456" not in out


def test_repetition_metrics_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a"),          # top 'a' 3/5; bigrams: ab ba ab ba -> 2/4 dup
            (2, "x y z"),              # all unique: top 1/3, dup 0
            (3, "w"),                  # single token: no bigrams -> 0
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in repetition_metrics(df).collect()
    }
    assert rows[1]["n_tokens"] == 5
    assert abs(rows[1]["top_token_ratio"] - 3 / 5) < 1e-9
    assert abs(rows[1]["dup_bigram_ratio"] - 0.5) < 1e-9
    assert rows[2]["n_tokens"] == 3
    assert abs(rows[2]["top_token_ratio"] - 1 / 3) < 1e-9
    assert rows[2]["dup_bigram_ratio"] == 0.0
    assert rows[3]["n_tokens"] == 1
    assert rows[3]["dup_bigram_ratio"] == 0.0


def test_repetition_metrics_plan_single_exchange_chain(spark, sf_dir):
    # The token aggregation must not collapse to a driver-side loop;
    # sanity: runs distributed over the documents scan and the two
    # aggregate branches join on the id key.
    from hw_kafka_streams_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir).limit(50)
    out = repetition_metrics(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan  # distributed agg, not a collect
    assert out.count() == 50


def test_boilerplate_prune_drops_hot_passages(spark):
    from hw_kafka_streams_spark.operators.text import boilerplate_prune

    hot = "one two three four five"  # same 5-token passage in 4 docs
    rows = [
        (1, hot + " alpha beta gamma delta eps"),
        (2, hot + " zeta eta theta iota kappa"),
        (3, hot + " lam mu nu xi omicron"),
        (4, hot),  # fully boilerplate
        (5, "pi rho sigma tau ups"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in boilerplate_prune(df, width=5, max_df=2).collect()}
    assert out[1].n_chunks == 2 and out[1].n_kept == 1
    assert out[4].n_chunks == 1 and out[4].n_kept == 0
    import hashlib

    assert out[4].kept_fp == hashlib.md5(b"").hexdigest()
    assert out[5].n_kept == 1  # unique passage untouched
    assert out[1].kept_fp == hashlib.md5(b"alpha beta gamma delta eps").hexdigest()


def test_unigram_logprob_scores_match_hand_computation(spark):
    import math

    from hw_kafka_streams_spark.operators.text import unigram_logprob_scores

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    # corpus: a:2 b:2 c:1, N=5
    out = {r.doc_id: r for r in unigram_logprob_scores(df).collect()}
    exp1 = round(
        (round(2 * math.log(2 / 5), 6) + round(1 * math.log(2 / 5), 6)) / 3, 6
    )
    exp2 = round(
        (round(1 * math.log(2 / 5), 6) + round(1 * math.log(1 / 5), 6)) / 2, 6
    )
    assert out[1].n_tokens == 3 and abs(out[1].avg_ln_p - exp1) < 1e-9
    assert out[2].n_tokens == 2 and abs(out[2].avg_ln_p - exp2) < 1e-9


def test_hashed_features_sparse_and_stats(spark):
    """Hand-checkable fixture: signed counts aggregate per bucket, zero
    weights drop, stats recompute from the sparse form."""
    from pyspark.sql import functions as F

    from hw_kafka_streams_spark.operators.features import (
        hashed_features_sparse,
        hashed_features_stats,
    )

    df = spark.createDataFrame(
        [(1, "aa bb aa aa"), (2, "cc"), (3, "")],
        "doc_id long, text string",
    )
    sparse = hashed_features_sparse(df, dim=64).collect()
    by_doc = {}
    for r in sparse:
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.weight
    # doc 1: 'aa' x3 and 'bb' x1, each bucket's |weight| is the token
    # count unless the two tokens collide (64 buckets -> usually not)
    assert sum(abs(w) for w in by_doc[1].values()) in (2, 4)  # collision-or-not
    assert set(abs(w) for w in by_doc[2].values()) == {1}
    assert 3 not in by_doc  # empty text -> no rows
    stats = {r.doc_id: r for r in hashed_features_stats(df, dim=64).collect()}
    for d, buckets in by_doc.items():
        s = stats[d]
        assert s.nnz == len(buckets)
        assert s.l1 == sum(abs(w) for w in buckets.values())
        top = sorted(buckets.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[0]
        assert (s.top_bucket, s.top_weight) == top


def test_hashed_features_md5_mode_matches_xxhash_shape(spark, sf_dir):
    """Both hash modes produce the same per-doc token mass (l1 equals
    the doc's token count when no bucket nets to zero)."""
    from pyspark.sql import functions as F

    from hw_kafka_streams_spark.operators.features import hashed_features_stats
    from hw_kafka_streams_spark.operators.text import token_count
    from hw_kafka_streams_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir).limit(50)
    toks = {r.doc_id: r.n for r in docs.select("doc_id", token_count("text").alias("n")).collect()}
    for mode in ("xxhash64", "md5"):
        stats = {r.doc_id: r for r in hashed_features_stats(docs, dim=4096, hash_mode=mode).collect()}
        for d, n in toks.items():
            if n:
                # l1 <= tokens (sign cancellation inside a bucket), and
                # at dim=4096 collisions are rare so usually equal
                assert stats[d].l1 <= n and stats[d].nnz <= n


def test_nfc_normalizer_composes_marks(spark):
    from pyspark.sql import functions as F

    from hw_kafka_streams_spark.operators.udfs import make_nfc_normalizer_udf

    df = spark.createDataFrame(
        [(1, "caf\u00e9"), (2, "cafe\u0301"), (3, None), (4, "plain")],
        "id long, t string",
    )
    nfc = make_nfc_normalizer_udf()
    out = {r.id: r.n for r in df.select("id", nfc(F.col("t")).alias("n")).collect()}
    assert out[1] == out[2] == "caf\u00e9"  # decomposed composes
    assert out[3] is None and out[4] == "plain"


def test_bigram_backoff_hand_computed(spark):
    """Stupid backoff against a hand-built model: seen bigram uses
    c2/ctx, unseen-with-seen-unigram uses 0.4*c1/N, full OOV uses
    0.4*0.4/N."""
    import math

    from hw_kafka_streams_spark.operators.text import bigram_backoff_scores

    train = spark.createDataFrame(
        [(100, "a b a c")], "doc_id long, text string"
    )
    # model: c2 = {ab:1, ba:1, ac:1}; ctx = {a:2, b:1}; c1 = {a:2,b:1,c:1}; N=4
    score = spark.createDataFrame(
        [(1, "a b d"), (3, "c a")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in bigram_backoff_scores(score, model_df=train).collect()
    }
    r1 = out[1]  # bigrams (a,b) seen -> ln(1/2); (b,d) OOV -> ln(0.4*0.4/4)
    assert r1.n_bigrams == 2 and r1.n_backoff == 1
    exp1 = (round(math.log(0.5), 6) + round(math.log(0.04), 6)) / 2
    # compare before the final 6dp rounding: Spark rounds HALF_UP,
    # Python rounds half-to-even — the last digit can differ by 1
    assert abs(r1.avg_ln_s - exp1) < 1e-6
    r3 = out[3]  # (c,a) unseen bigram, a seen c1=2 -> ln(0.4*2/4)
    assert r3.n_bigrams == 1 and r3.n_backoff == 1
    assert abs(r3.avg_ln_s - round(math.log(0.2), 6)) < 1e-9


def test_bigram_backoff_self_model_no_backoff(spark):
    """Trained on itself, every bigram is seen: n_backoff == 0."""
    from hw_kafka_streams_spark.operators.text import bigram_backoff_scores

    df = spark.createDataFrame(
        [(1, "x y z x y"), (2, "y x z")], "doc_id long, text string"
    )
    rows = bigram_backoff_scores(df).collect()
    assert all(r.n_backoff == 0 for r in rows)


def test_kneser_ney_hand_computed(spark):
    """Interpolated KN against a hand-built model: seen bigram gets
    discounted MLE + lambda*p_cont, unseen-w2 gets the 0.5/B floor,
    unknown CONTEXT backs off fully to the continuation unigram."""
    import math

    from hw_kafka_streams_spark.operators.text import kneser_ney_scores

    train = spark.createDataFrame(
        [(100, "a b a c")], "doc_id long, text string"
    )
    # model: c2={ab:1,ba:1,ac:1}; ctx={a:2,b:1}; N1+fwd={a:2,b:1};
    # N1+cont={a:1,b:1,c:1}; B=3
    score = spark.createDataFrame(
        [(1, "a b d"), (3, "d a"), (7, "a c")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in kneser_ney_scores(score, model_df=train).collect()
    }
    r1 = out[1]
    # (a,b) seen: (1-.75)/2 + .75*2/2 * 1/3 = 0.375
    # (b,d) unseen w2: lambda(b)*floor = .75*1/1 * (0.5/3) = 0.125
    assert r1.n_bigrams == 2 and r1.n_unseen == 1
    exp1 = (round(math.log(0.375), 6) + round(math.log(0.125), 6)) / 2
    assert abs(r1.avg_ln_p - exp1) < 1e-6
    r3 = out[3]  # (d,a): unknown context d -> p_cont(a) = 1/3
    assert r3.n_bigrams == 1 and r3.n_unseen == 1
    assert abs(r3.avg_ln_p - round(math.log(1.0 / 3.0), 6)) < 1e-9
    r7 = out[7]  # (a,c) seen: (1-.75)/2 + .75*2/2 * 1/3 = 0.375
    assert r7.n_bigrams == 1 and r7.n_unseen == 0
    assert abs(r7.avg_ln_p - round(math.log(0.375), 6)) < 1e-9


def test_kneser_ney_self_model_all_seen(spark):
    """Trained on itself, every bigram is seen and every p is a valid
    probability-like score in (0, 1]: n_unseen == 0, avg_ln_p <= 0."""
    from hw_kafka_streams_spark.operators.text import kneser_ney_scores

    df = spark.createDataFrame(
        [(1, "x y z x y"), (2, "y x z")], "doc_id long, text string"
    )
    rows = kneser_ney_scores(df).collect()
    assert rows and all(r.n_unseen == 0 for r in rows)
    assert all(r.avg_ln_p <= 0 for r in rows)
