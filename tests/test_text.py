"""Winnowing fingerprint property tests (the rolling-hash guarantee)."""

from __future__ import annotations

from csv_2_db_pipeline_data_engineering_spark.operators.text import (
    WINNOW_WINDOW,
    text_bigram_logprob,
    winnow_fingerprints,
)


def _fps(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.doc_id, set()).add(r.fp)
    return out


def test_winnowing_shared_run_guarantee(spark):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, "zero prefix words then " + base),  # shares the full run
            (2, "completely different tokens entirely unrelated content here okay"),
        ],
        "doc_id long, text string",
    )
    fps = _fps(winnow_fingerprints(docs))
    # identical long run -> must share at least one fingerprint (MOSS guarantee)
    assert fps[0] & fps[1]
    # unrelated docs share nothing
    assert not (fps[0] & fps[2])
    # determinism: same input, same fingerprints
    assert _fps(winnow_fingerprints(docs))[0] == fps[0]


def test_winnowing_compression(spark):
    text = " ".join(f"tok{i}" for i in range(200))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    fps = _fps(winnow_fingerprints(docs))[0]
    n_grams = 200 - 3 + 1
    # winnowing keeps roughly 2/(w+1) of gram hashes, never more than all
    assert len(fps) < n_grams
    assert len(fps) >= n_grams // (WINNOW_WINDOW * 3)


def test_bigram_logprob_orders_fluent_above_salad(spark, tmp_path):
    # Repeated fluent patterns must outscore token salad; without
    # add-one smoothing the ordering INVERTS (singleton prefixes give
    # MLE P=1), so this pins the smoothing as load-bearing.
    docs = spark.createDataFrame(
        [
            (0, "a b a b a b"),            # repeated bigrams
            (1, "q r s t u v"),            # all-singleton bigrams
            (2, "a b a b x a b"),          # mostly repeated
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    scores = {
        r.doc_id: r.avg_logprob
        for r in text_bigram_logprob(spark, str(tmp_path)).collect()
    }
    assert scores[0] > scores[1]
    assert scores[2] > scores[1]


def test_bpe_merge_cascade_on_known_words(spark):
    from pyspark.sql import functions as F

    from csv_2_db_pipeline_data_engineering_spark.operators.text import _bpe_spaced

    df = spark.createDataFrame(
        [("the",), ("table",), ("scan",), ("value",), ("spark",)], "w string"
    )
    got = {r["w"]: r["e"] for r in df.select("w", _bpe_spaced(F.col("w")).alias("e")).collect()}
    assert got["the"] == "the"        # t h -> th; th e -> the
    assert got["table"] == "table"    # full cascade t ab -> tab -> tabl -> table
    assert got["scan"] == "scan"      # s c -> sc; a n -> an; sc an -> scan
    assert got["value"] == "valu e"   # va lu -> valu; final e unmerged
    assert got["spark"] == "s p a r k"  # no merge fires


def test_bpe_tokenize_compresses_the_corpus(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.text import (
        text_bpe_tokenize,
    )
    from tests.conftest import SF_DIR

    rows = text_bpe_tokenize(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_words"]  # never fewer tokens than words
    # merges genuinely fire somewhere: some doc has tokens < chars
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    assert any(
        r["n_bpe_tokens"] < len(docs[r["doc_id"]].replace(" ", "")) for r in rows
    )


def test_bpe_train_learns_hand_computable_merges(spark):
    """Tiny corpus where every round is computable by hand, including
    the feedback property (round 3 merges a symbol round 1 created)."""
    from csv_2_db_pipeline_data_engineering_spark.operators.text import (
        bpe_train_frame,
    )

    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "ab")], "doc_id long, text string"
    )
    rows = bpe_train_frame(docs, n_merges=3).collect()
    got = [(r["lhs"], r["rhs"], r["merged"], r["pair_count"]) for r in rows]
    # r1: (a,a) weight 4 beats (a,b) 3; greedy rewrite "a a a b"->"aa a b"
    # r2: (a,b) 3 beats (aa,a) 2; r3: only (aa,ab) remains, weight 2 —
    # round 3 consumes BOTH earlier merge products
    assert got == [
        ("a", "a", "aa", 4),
        ("a", "b", "ab", 3),
        ("aa", "ab", "aaab", 2),
    ]


def test_bpe_train_deterministic_tiebreak(spark):
    """Equal-count pairs resolve lexicographically on both engines."""
    from csv_2_db_pipeline_data_engineering_spark.operators.text import (
        bpe_train_frame,
    )

    docs = spark.createDataFrame([(1, "xy ba")], "doc_id long, text string")
    rows = bpe_train_frame(docs, n_merges=1).collect()
    # (b,a) and (x,y) both count 1 -> lexicographically smallest wins
    assert (rows[0]["lhs"], rows[0]["rhs"]) == ("b", "a")


def test_fluency_buckets_partition_evenly(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.text import (
        text_fluency_buckets,
    )
    from tests.conftest import SF_DIR

    rows = text_fluency_buckets(spark, SF_DIR).collect()
    from collections import Counter

    c = Counter(r["bucket"] for r in rows)
    assert set(c) == {"head", "middle", "tail"}
    assert max(c.values()) - min(c.values()) <= 1  # ntile balance
    # heads really are more fluent than tails
    import statistics

    head = [r["avg_logprob"] for r in rows if r["bucket"] == "head"]
    tail = [r["avg_logprob"] for r in rows if r["bucket"] == "tail"]
    assert statistics.mean(head) > statistics.mean(tail)


def test_vocab_zipf_shape(spark):
    from csv_2_db_pipeline_data_engineering_spark.operators.text import (
        text_vocab_zipf,
    )
    from tests.conftest import SF_DIR

    r = text_vocab_zipf(spark, SF_DIR).collect()[0]
    assert r["vocab_size"] > 0 and r["n_tokens"] >= r["vocab_size"]
    assert r["top_count"] <= r["n_tokens"]
    assert r["zipf_slope"] < 0  # frequency falls with rank
