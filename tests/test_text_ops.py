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
