"""Unigram-LM tokenizer semantics (textprep.unigram_train /
unigram_segment): learning behavior on crafted separable corpora,
segmentation losslessness, EM monotonicity of the vocabulary, OOV
fallback, determinism, and the bounded-driver-state plan shape."""

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.operators.textprep import (
    unigram_segment,
    unigram_train,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _train(spark, texts, **kw):
    kw.setdefault("n_multi", 30)
    kw.setdefault("n_iters", 2)
    vocab = unigram_train(_corpus(spark, texts), **kw)
    return [tuple(r) for r in vocab.collect()]


def test_learns_frequent_subwords(spark):
    # 'ing' and 'walk'/'talk' dominate this corpus: the trained model
    # must segment novel combinations through learned multi-char pieces
    texts = ["walking talking walking", "talked walked talking",
             "walking walking talked talked"] * 3
    rows = _train(spark, texts)
    pieces = {r[0] for r in rows}
    assert "ing" in pieces or "king" in pieces
    seg = unigram_segment(_corpus(spark, ["walking"]), rows).first()
    assert seg.n_pieces < len("walking")  # multi-char pieces used
    assert seg.pieces.replace(" ", "") == "walking"


def test_segmentation_lossless_on_any_corpus(spark):
    texts = ["the cat sat", "résumé naïve café", "a bb ccc dddd eeeee",
             "x" * 40, "mixed 123 tokens 456", ""]
    rows = _train(spark, texts)
    out = unigram_segment(_corpus(spark, texts), rows).orderBy("doc_id")
    for r, t in zip(out.collect(), texts):
        joined = "".join(w for w in t.lower().split() if w)
        assert r.pieces.replace(" ", "") == joined
        assert r.n_pieces == (0 if not joined else
                              len(r.pieces.split(" ")))


def test_oov_words_segment_char_by_char(spark):
    rows = _train(spark, ["aaa bbb aaa bbb"])
    seg = unigram_segment(_corpus(spark, ["zzz qq"]), rows).first()
    # z/q never seen: OOV single-char fallback, never a multi-char piece
    assert seg.pieces == "z z z q q"


def test_vocab_schema_and_rank_order(spark):
    rows = _train(spark, ["abc abd abe abc"])
    assert all(len(r) == 4 for r in rows)
    counts = [(-r[1], r[0]) for r in rows]
    assert counts == sorted(counts)            # (count DESC, piece ASC)
    assert [r[3] for r in rows] == list(range(1, len(rows) + 1))
    # every single character of the corpus survives (coverage)
    chars = set("abcde")
    assert chars <= {r[0] for r in rows if len(r[0]) == 1}


def test_training_deterministic_across_runs(spark):
    texts = ["one two three four five"] * 4 + ["six seven eight"]
    assert _train(spark, texts) == _train(spark, texts)


@pytest.mark.parametrize("n_iters", [1, 3])
def test_iteration_count_knob(spark, n_iters):
    rows = _train(spark, ["hello world hello"], n_iters=n_iters)
    seg = unigram_segment(_corpus(spark, ["hello"]), rows).first()
    assert seg.pieces.replace(" ", "") == "hello"


def test_segment_plan_native_and_dp_per_distinct_word(spark):
    rows = _train(spark, ["a b a b"])
    df = _corpus(spark, ["a b", "b a"])
    seg = unigram_segment(df, rows)
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    # the Viterbi fold runs after a distinct over words, never per token
    assert "HashAggregate" in plan