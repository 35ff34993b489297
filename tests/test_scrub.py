"""Document-hygiene operators: PII scrub, repetition stats, chunking."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.operators.scrub import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    _gram_rows,
    doc_chunk_plan,
    pii_counts,
    redact_pii,
    text_pii_scrub,
    text_repetition_stats,
)
from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redaction_catches_and_replaces_each_kind(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at jo.doe+x@sub.example.org today"),
            (2, "server 192.168.0.1 and 10.20.30.40 up"),
            (3, "card 4111111111111111 expired"),
            (4, "call 555-123-4567 now"),
            (5, "clean text with numbers 42 and 1.5 only"),
        ],
    )
    rows = df.select(
        "doc_id",
        redact_pii(F.col("text")).alias("red"),
        *[c.alias(k) for k, c in pii_counts(F.col("text")).items()],
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["red"] == "mail me at <EMAIL> today"
    assert by_id[1]["n_emails"] == 1
    assert by_id[2]["red"] == "server <IP> and <IP> up"
    assert by_id[2]["n_ipv4"] == 2
    assert by_id[3]["red"] == "card <NUM> expired"
    assert by_id[3]["n_digit_runs"] == 1
    assert by_id[4]["red"] == "call <PHONE> now"
    assert by_id[4]["n_phones"] == 1
    # short numbers and decimals survive untouched
    assert by_id[5]["red"] == "clean text with numbers 42 and 1.5 only"
    assert all(
        by_id[5][k] == 0 for k in ("n_emails", "n_ipv4", "n_digit_runs", "n_phones")
    )


def test_pii_scrub_certifies_clean_output(spark):
    rows = text_pii_scrub(spark, SF_DIR).collect()
    assert all(r["pii_free"] for r in rows)
    # planting moduli: doc 0 gets every kind, doc 1 gets none
    r0 = next(r for r in rows if r["doc_id"] == 0)
    assert (r0["n_emails"], r0["n_ipv4"], r0["n_digit_runs"], r0["n_phones"]) == (
        1, 1, 1, 1,
    )
    r1 = next(r for r in rows if r["doc_id"] == 1)
    assert (r1["n_emails"], r1["n_ipv4"], r1["n_digit_runs"], r1["n_phones"]) == (
        0, 0, 0, 0,
    )


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_pii_scrub_is_shuffle_free(spark):
    plan = _formatted_plan(spark, text_pii_scrub(spark, SF_DIR))
    # one scan, no hash shuffle — only the demo ORDER BY's range exchange
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "hashpartitioning" not in plan


def test_gram_rows_counts_distinct_bigrams(spark):
    loop = " ".join(["spam and"] * 10)  # "spam and spam and ..."
    varied = "one two three four five six seven eight nine ten"
    df = _docs(spark, [(1, loop), (2, varied)])
    per = _gram_rows(df, 2, "bg").groupBy("doc_id", "bg").count()
    distinct = {r["doc_id"]: r["count"] for r in per.groupBy("doc_id").count().collect()}
    assert distinct[1] == 2  # only "spam and" / "and spam"
    assert distinct[2] == 9  # all bigrams distinct
    top = {
        r["doc_id"]: r["m"]
        for r in per.groupBy("doc_id").agg(F.max("count").alias("m")).collect()
    }
    assert top[1] == 10 and top[2] == 1


def test_repetition_stats_invariants(spark):
    out = text_repetition_stats(spark, SF_DIR).collect()
    assert out, "repetition stats empty"
    for r in out:
        assert 0.0 < r["top_bigram_frac"] <= 1.0
        assert 0.0 <= r["dup_5gram_frac"] <= 1.0


def test_chunk_plan_tiles_documents_exactly(spark):
    out = doc_chunk_plan(spark, SF_DIR).collect()
    assert out
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert chunks[0]["tok_start"] == 0
        for a, b in zip(chunks, chunks[1:]):
            assert b["tok_start"] == a["tok_start"] + CHUNK_STRIDE
            assert b["tok_start"] < a["tok_end"]  # overlap = W - S > 0
        for c in chunks:
            assert c["n_tok_chunk"] == c["tok_end"] - c["tok_start"]
            assert 0 < c["n_tok_chunk"] <= CHUNK_TOKENS
        n_tok = chunks[-1]["tok_end"]
        if len(chunks) == 1:
            assert n_tok <= CHUNK_TOKENS
        else:
            # every interior chunk is full-width; the tail reaches the end
            assert all(c["n_tok_chunk"] == CHUNK_TOKENS for c in chunks[:-1])
            assert n_tok > CHUNK_TOKENS


def test_char_entropy_known_values(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators import scrub

    df = _docs(spark, [(1, "aaaa"), (2, "abab"), (3, "abcd")])
    chars = F.split(F.col("text"), "")
    n = F.size(chars)
    uniq = F.array_sort(F.array_distinct(chars))
    counts = F.transform(uniq, lambda c: F.size(F.filter(chars, lambda x: x == c)))
    ent = -F.aggregate(counts, F.lit(0.0), lambda a, k: a + (k / n) * F.log2(k / n))
    got = {r["doc_id"]: r["e"] for r in df.select("doc_id", F.round(ent, 6).alias("e")).collect()}
    assert got[1] == 0.0  # single symbol
    assert got[2] == 1.0  # two symbols, uniform
    assert got[3] == 2.0  # four symbols, uniform
    out = scrub.text_char_entropy(spark, SF_DIR).collect()
    assert out and all(0.0 <= r["char_entropy_bits"] <= 8.0 for r in out)
    assert not any(r["is_low_entropy"] for r in out)  # word soup is not junk


def test_char_entropy_plan_is_codegen_hash_agg(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators import scrub

    plan = _formatted_plan(spark, scrub.text_char_entropy(spark, SF_DIR))
    assert plan.count("Location: InMemoryFileIndex") == 1
    # the whole pipeline is codegen'd hash aggregation — no object-based
    # aggregate, no sort-based fallback before the demo ORDER BY
    assert "HashAggregate" in plan
    assert "ObjectHashAggregate" not in plan and "SortAggregate" not in plan


def test_chunk_plan_is_shuffle_free(spark):
    plan = _formatted_plan(spark, doc_chunk_plan(spark, SF_DIR))
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "hashpartitioning" not in plan


def test_mojibake_fix_repairs_each_ghost_and_counts(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.scrub import (
        count_mojibake,
        fix_mojibake,
    )

    # latin-1 ghost forms: 'â' is UTF-8 for a right
    # single quote mis-decoded as latin-1, 'Ã©' likewise 'é'.
    rows = [
        (1, "visit the cafÃ© now"),
        (2, "donât panic"),
        (3, "a naÃ¯ve plan â soon"),
        (4, "plain ascii stays put"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            fix_mojibake(F.col("text")).alias("fixed"),
            count_mojibake(F.col("text")).alias("n"),
        ).collect()
    }
    assert out[1]["fixed"] == "visit the café now" and out[1]["n"] == 1
    assert out[2]["fixed"] == "don’t panic" and out[2]["n"] == 1
    assert out[3]["fixed"] == "a naïve plan – soon" and out[3]["n"] == 2
    assert out[4]["fixed"] == "plain ascii stays put" and out[4]["n"] == 0


def test_encoding_fix_certifies_clean_output(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.scrub import (
        text_encoding_fix,
    )

    rows = text_encoding_fix(spark, SF_DIR).collect()
    assert all(r["mojibake_free"] for r in rows)
    counts = {r["n_mojibake"] for r in rows}
    assert 0 in counts and any(c > 0 for c in counts)  # non-vacuous planting
