"""PII scrubbing and chunking unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.operators.textprep import (
    chunk_documents,
    scrub_pii,
)


def scrub_one(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(scrub_pii("t").alias("o")).collect()[0].o


@pytest.mark.parametrize("raw,want", [
    ("mail me at a.b-c%d@sub.example.co.uk now",
     "mail me at [EMAIL] now"),
    ("call (555) 123-4567 or 555-123-4567 or 555.123.4567",
     "call [PHONE] or [PHONE] or [PHONE]"),
    ("see https://a.io/x?y=1&z=2 and http://b.org",
     "see [URL] and [URL]"),
    ("host 192.168.0.1 and 10.0.0.255",
     "host [IP] and [IP]"),
    # a URL containing an @ is rewritten as a URL, not an email
    ("https://u:p@host.com/path", "[URL]"),
    # plain text with dots/digits survives untouched
    ("version 1.2 costs $3.50, meet at 5 p.m.",
     "version 1.2 costs $3.50, meet at 5 p.m."),
])
def test_scrub_cases(spark, raw, want):
    assert scrub_one(spark, raw) == want


def test_scrub_is_pure_codegen(spark):
    df = spark.createDataFrame([("x",)], "t string")
    out = df.select(scrub_pii("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunking_covers_and_overlaps(spark):
    words = [f"w{i}" for i in range(100)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    chunks = chunk_documents(df, chunk_size=32, stride=24).collect()
    # starts at 0, 24, 48, 72, 96 -> 5 chunks
    assert [r.chunk_id for r in sorted(chunks, key=lambda r: r.chunk_id)] == [0, 1, 2, 3, 4]
    seen = set()
    for r in chunks:
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.n_chunk_tokens <= 32
        seen.update(toks)
    assert seen == set(words)  # every token appears in some chunk
    by_id = {r.chunk_id: r.chunk_text.split(" ") for r in chunks}
    assert by_id[0][24:] == by_id[1][:8]  # 8-token overlap = size - stride


def test_short_and_empty_documents(spark):
    df = spark.createDataFrame(
        [(1, "just five little tokens here"), (2, "   "), (3, "one")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk_size=32, stride=24).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_chunk_tokens == 5
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 0
    assert len(by_doc[3]) == 1 and by_doc[3][0].chunk_text == "one"


def test_chunk_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="positive"):
        chunk_documents(df, stride=0)


def test_pack_sequences_offsets_and_straddle(spark):
    from pyspark.sql import Row

    from simple_anonymizer_spark.operators.textprep import pack_sequences

    docs = [
        Row(doc_id=1, text="a b c"),          # 3 tokens, offset 0 -> seq 0
        Row(doc_id=2, text="d e f g"),        # offset 3 -> seq 0
        Row(doc_id=3, text="h i j k l m n"),  # offset 7 -> seq 0 (straddles)
        Row(doc_id=4, text="o p"),            # offset 14 -> seq 1
    ]
    out = {r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset)
           for r in pack_sequences(spark.createDataFrame(docs), 10).collect()}
    assert out == {1: (3, 0, 0), 2: (4, 0, 3), 3: (7, 0, 7), 4: (2, 1, 4)}


def test_pack_sequences_partition_invariance_and_plan(spark):
    """Offsets must not depend on partition count, the plan must not grow
    an O(partitions) CASE chain (broadcast offsets join instead), and
    cache_owner must hand back the pinned intermediate for unpersist."""
    from pyspark.sql import Row

    from simple_anonymizer_spark.operators.textprep import pack_sequences

    docs = [Row(doc_id=i, text=" ".join(["t"] * (1 + i % 7)))
            for i in range(200)]
    df = spark.createDataFrame(docs)

    owner: list = []
    base = pack_sequences(df, 16, partitions=2, cache_owner=owner)
    expected = sorted(tuple(r) for r in base.collect())

    wide_owner: list = []
    wide = pack_sequences(df, 16, partitions=512, cache_owner=wide_owner)
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert "CASE WHEN" not in plan  # the old O(partitions) literal map
    assert "Broadcast" in plan      # offsets arrive via broadcast join
    assert sorted(tuple(r) for r in wide.collect()) == expected

    for cached in owner + wide_owner:
        cached.unpersist()


def test_budget_select_exact_greedy_and_partition_invariance(spark):
    """budget_select must equal the single-machine greedy reference
    (sort by score DESC / key ASC, take while cumulative weight fits),
    at any partition count, including the boundary where the next row
    would exactly exceed the budget."""
    from pyspark.sql import Row

    from simple_anonymizer_spark.operators.textprep import budget_select

    rows = [Row(k=i, score=(i * 37) % 50, w=1 + (i * 13) % 9)
            for i in range(300)]
    ordered = sorted(rows, key=lambda r: (-r.score, r.k))
    budget, cum, expected = 500, 0, []
    for r in ordered:
        if cum + r.w > budget:
            # greedy prefix: stop at the first row that no longer fits
            # (rows after it with equal score but larger key can't be
            # taken either — the cut is a strict prefix of the order)
            break
        cum += r.w
        expected.append((r.k, r.score, r.w, cum))

    df = spark.createDataFrame(rows)
    for parts in (2, 64):
        got = sorted(
            (r.k, r.score, r.w, r.cum_weight)
            for r in budget_select(df, "score", "w", "k", budget,
                                   partitions=parts).collect()
        )
        assert got == sorted(expected)

    # degenerate budgets
    assert budget_select(df, "score", "w", "k", 0).count() == 0
    total = sum(r.w for r in rows)
    assert budget_select(df, "score", "w", "k", total).count() == len(rows)


def test_vocab_and_encoding_roundtrip(spark):
    """Encoding then decoding through the vocab must reproduce the
    original token stream; OOV maps to -1; id 0 is the most frequent
    token; zero-token docs keep an empty row."""
    from pyspark.sql import Row, functions as F

    from simple_anonymizer_spark.operators.textprep import (
        build_vocab, encode_documents,
    )

    docs = spark.createDataFrame([
        Row(doc_id=1, text="the cat sat on the mat"),
        Row(doc_id=2, text="the dog"),
        Row(doc_id=3, text="   "),
    ])
    vocab = build_vocab(docs)
    v = {r.token: (r.token_id, r.n_occurrences) for r in vocab.collect()}
    assert v["the"][0] == 0 and v["the"][1] == 3  # most frequent -> id 0
    assert len({tid for tid, _ in v.values()}) == len(v)  # ids unique
    assert sorted(tid for tid, _ in v.values()) == list(range(len(v)))

    enc = {r.doc_id: (r.n_tokens, r.ids_csv)
           for r in encode_documents(docs, vocab).collect()}
    assert enc[3] == (0, "")
    inv = {tid: tok for tok, (tid, _) in v.items()}
    decoded = " ".join(inv[int(t)] for t in enc[1][1].split(" "))
    assert decoded == "the cat sat on the mat"

    # OOV: encode against a vocab missing "dog"
    small = vocab.where(F.col("token") != "dog")
    enc2 = {r.doc_id: r.ids_csv
            for r in encode_documents(docs, small).collect()}
    assert enc2[2].split(" ")[1] == "-1"


def test_vocab_min_freq_and_max_size(spark):
    from pyspark.sql import Row

    from simple_anonymizer_spark.operators.textprep import build_vocab

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a a a b b c")])
    assert build_vocab(docs, min_freq=2).count() == 2
    top = build_vocab(docs, max_size=1).collect()
    assert len(top) == 1 and top[0].token == "a"


# ---------------------------------------------------------------------------
# Duplicate-span scrubbing
# ---------------------------------------------------------------------------


def _scrub(spark, docs, **kw):
    from simple_anonymizer_spark.operators.textprep import (
        scrub_duplicate_spans,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
            for r in scrub_duplicate_spans(df, **kw).collect()}


def test_scrub_removes_cross_doc_span_keeps_unique(spark):
    span = "one two three"
    out = _scrub(spark, [
        (1, f"alpha beta {span} gamma"),
        (2, f"delta {span} epsilon zeta"),
    ], k=3, min_docs=2)
    assert out[1] == (6, 3, "alpha beta gamma")
    assert out[2] == (6, 3, "delta epsilon zeta")


def test_scrub_short_doc_whole_gram(spark):
    # doc 2 is shorter than k: its single whole-doc gram matches doc 1's
    # interior, scrubbing doc 2 entirely.
    out = _scrub(spark, [
        (1, "aa bb xx yy"),
        (2, "bb xx"),
    ], k=3, min_docs=2)
    # doc 2's whole-gram 'bb xx' appears only once in doc 1's gram set
    # ('aa bb xx', 'bb xx yy') - so nothing matches at k=3
    assert out[2] == (2, 0, "bb xx")
    # but at k=2 the shared bigram is scrubbed from both
    out2 = _scrub(spark, [
        (1, "aa bb xx yy"),
        (2, "bb xx"),
    ], k=2, min_docs=2)
    assert out2[2] == (2, 2, "")
    assert out2[1] == (4, 2, "aa yy")


def test_scrub_within_doc_repeat_not_flagged(spark):
    # the same trigram twice in ONE doc: distinct-doc count is 1.
    out = _scrub(spark, [
        (1, "p q r s p q r"),
        (2, "unrelated words here"),
    ], k=3, min_docs=2)
    assert out[1] == (7, 0, "p q r s p q r")


def test_scrub_empty_doc_survives(spark):
    out = _scrub(spark, [(1, ""), (2, "a b c d"), (3, "a b c d")],
                 k=3, min_docs=2)
    assert out[1] == (0, 0, "")
    assert out[2] == (4, 4, "")


def test_scrub_overlapping_spans_union_cover(spark):
    # two duplicated trigrams overlapping by one token: covered set is
    # the union, not double-counted.
    out = _scrub(spark, [
        (1, "a b c d e tail1"),
        (2, "a b c left2"),
        (3, "c d e right3"),
    ], k=3, min_docs=2)
    assert out[1] == (6, 5, "tail1")


def _islands(spark, docs, **kw):
    from simple_anonymizer_spark.operators.textprep import (
        duplicate_span_islands,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {}
    for r in duplicate_span_islands(df, **kw).collect():
        out.setdefault(r.doc_id, []).append((r.span_start, r.span_len))
    return {k: sorted(v) for k, v in out.items()}


def test_islands_report_maximal_span_not_grams(spark):
    # a 5-token shared span at k=3 is THREE duplicated grams but ONE
    # maximal island of length 5 — the longest-match semantics.
    span = "one two three four five"
    out = _islands(spark, [
        (1, f"alpha {span} omega"),
        (2, f"{span} tail tail2 tail3"),
    ], k=3, min_docs=2)
    assert out[1] == [(1, 5)]
    assert out[2] == [(0, 5)]


def test_islands_separate_spans_stay_separate(spark):
    # two shared trigrams with a unique token between them: two islands.
    out = _islands(spark, [
        (1, "a b c GAP1 x y z"),
        (2, "a b c GAP2 x y z"),
    ], k=3, min_docs=2)
    assert out[1] == [(0, 3), (4, 3)]
    assert out[2] == [(0, 3), (4, 3)]


def test_islands_none_when_no_duplication(spark):
    out = _islands(spark, [
        (1, "totally unique words here"),
        (2, "other document text body"),
    ], k=3, min_docs=2)
    assert out == {}


def test_islands_match_scrub_cover(spark):
    # the islands must tile exactly the positions scrub removes.
    docs = [
        (1, "a b c d e tail1"),
        (2, "a b c left2"),
        (3, "c d e right3"),
    ]
    isl = _islands(spark, docs, k=3, min_docs=2)
    scrubbed = _scrub(spark, docs, k=3, min_docs=2)
    for doc_id, (_, n_removed, _) in scrubbed.items():
        covered = sum(ln for _, ln in isl.get(doc_id, []))
        assert covered == n_removed, doc_id


def test_islands_partition_invariance(spark):
    from simple_anonymizer_spark.operators.textprep import (
        duplicate_span_islands,
    )

    span = " ".join(f"s{i}" for i in range(12))
    df = spark.createDataFrame(
        [(i, f"u{i} {span} v{i}") for i in range(6)],
        "doc_id long, text string",
    )
    a = sorted(tuple(r) for r in duplicate_span_islands(
        df.repartition(1), k=4).collect())
    b = sorted(tuple(r) for r in duplicate_span_islands(
        df.repartition(7), k=4).collect())
    assert a == b and len(a) == 6


# ---------------------------------------------------------------------------
# BPE merge training
# ---------------------------------------------------------------------------


def _bpe_docs(spark, words):
    return spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )


def test_bpe_reproduces_sennrich_example(spark):
    from simple_anonymizer_spark.operators.textprep import bpe_train

    docs = _bpe_docs(
        spark, ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    got = [tuple(r) for r in bpe_train(docs, n_merges=5).collect()]
    assert got == [
        (0, "e", "s", "es", 9),
        (1, "es", "t", "est", 9),
        (2, "est", "</w>", "est</w>", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
    ]


def test_bpe_overlapping_run_merges_greedy_left_to_right(spark):
    from simple_anonymizer_spark.operators.textprep import bpe_train

    # 'aaa' -> symbols a a a </w>: pair (a,a) counts both overlaps (2 per
    # word) but the merge applies greedily left-to-right: aa + a. The
    # next round ties (aa,a) with (a,</w>) at 4 — pair-text ascending
    # breaks it deterministically toward 'a </w>'.
    docs = _bpe_docs(spark, ["aaa"] * 4)
    got = [tuple(r) for r in bpe_train(docs, n_merges=2).collect()]
    assert got[0] == (0, "a", "a", "aa", 8)
    assert got[1] == (1, "a", "</w>", "a</w>", 4)


def test_bpe_stops_when_out_of_pairs(spark):
    from simple_anonymizer_spark.operators.textprep import bpe_train

    docs = _bpe_docs(spark, ["ab", "ab"])   # a b </w>: only 3 merges exist
    got = [tuple(r) for r in bpe_train(docs, n_merges=10).collect()]
    assert len(got) == 2
    assert got[-1][3] == "ab</w>"


def test_bpe_deterministic_across_partitionings(spark):
    from simple_anonymizer_spark.operators.textprep import bpe_train

    rows = [(i, "the cat sat on the mat " * (1 + i % 3)) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = [tuple(r) for r in bpe_train(docs.repartition(1), n_merges=6).collect()]
    b = [tuple(r) for r in bpe_train(docs.repartition(7), n_merges=6).collect()]
    assert a == b and len(a) == 6


def test_bpe_segment_applies_merges_in_order(spark):
    from simple_anonymizer_spark.operators.textprep import (
        bpe_segment,
        bpe_train,
    )

    docs = _bpe_docs(
        spark, ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    merges = [tuple(r) for r in bpe_train(docs, n_merges=5).collect()]
    fresh = spark.createDataFrame(
        [(1, "lowest low"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.n_pieces, r.pieces)
           for r in bpe_segment(fresh, merges).collect()}
    # merges: es, est, est</w>, lo, low -> 'lowest' = low est</w>
    assert out[1] == (4, "low est</w> low </w>")
    assert out[2] == (0, "")


def test_bpe_segment_empty_merges_is_char_split(spark):
    from simple_anonymizer_spark.operators.textprep import bpe_segment

    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    out = bpe_segment(docs, []).collect()[0]
    assert (out.n_pieces, out.pieces) == (3, "a b </w>")


def test_normalize_text_each_step_and_cross_engine(spark):
    """Crafted dirty strings exercise every normalization step; the SAME
    inputs run through the DuckDB SQL chain must match byte-for-byte —
    the cross-engine regex contract checked on input that actually
    contains control chars (the fixtures are clean)."""
    import duckdb

    from simple_anonymizer_spark.operators.textprep import (
        normalize_documents, normalize_text_sql)

    docs = [
        (1, "plain text stays"),
        (2, "ctrl\x00\x07chars\x7fgone"),
        (3, "tabs\tand\t\tspaces   collapse"),
        (4, "space before \n and after\n next"),
        (5, "para\n\n\n\n\nbreaks"),
        (6, "  \n outer trim \n\n  "),
        (7, "keep\n\ninner\tone"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_chars_removed, r.changed)
           for r in normalize_documents(df).collect()}

    assert got[1] == ("plain text stays", 0, False)
    assert got[2] == ("ctrlcharsgone", 3, True)
    assert got[3] == ("tabs and spaces collapse", 3, True)
    assert got[4] == ("space before\nand after\nnext", 3, True)
    assert got[5] == ("para\n\nbreaks", 3, True)
    assert got[6][0] == "outer trim"

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", docs)
    sql = (f"SELECT doc_id, {normalize_text_sql('text')} AS n, "
           f"CAST(length(text) - length({normalize_text_sql('text')}) AS BIGINT),"
           f" (text <> {normalize_text_sql('text')}) FROM t")
    duck = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert duck == got


def test_cdc_chunks_shift_robust_and_lossless(spark):
    """Content-defined boundaries: chunks reassemble to the exact input,
    respect max_len, and inserting a prefix changes ONLY the first chunk
    (every later boundary is a function of window content, not offset) —
    the property fixed-window chunking cannot have."""
    import random

    from simple_anonymizer_spark.operators.textprep import cdc_chunks

    rnd = random.Random(7)
    txt = "".join(rnd.choice("abcdefgh ij") for _ in range(400))
    df = spark.createDataFrame(
        [(1, txt), (2, "PREFIX-" + txt), (3, "")],
        "doc_id long, text string",
    )
    by = {}
    for r in cdc_chunks(df).collect():
        by.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.chunk_len))
    for k in by:
        by[k].sort()
    a = [c for _, c, _ in by[1]]
    b = [c for _, c, _ in by[2]]
    assert "".join(a) == txt and "".join(b) == "PREFIX-" + txt
    assert len(a) > 2 and a[1:] == b[1:]          # shift robustness
    assert all(ln <= 512 for _, _, ln in by[1])
    assert all(i == k + 1 for k, (i, _, _) in enumerate(by[1]))
    assert 3 not in by                             # empty doc: no chunks


def test_cdc_chunks_max_len_forces_splits(spark):
    """A boundary desert (one repeated char never matching the divisor
    criterion... or matching everywhere) still yields chunks bounded by
    max_len, and reassembly stays exact."""
    from simple_anonymizer_spark.operators.textprep import cdc_chunks

    txt = "z" * 1500
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    rows = sorted((r.chunk_idx, r.chunk_text) for r in
                  cdc_chunks(df, max_len=100).collect())
    assert "".join(c for _, c in rows) == txt
    assert all(len(c) <= 100 for _, c in rows)


# ---------------------------------------------------------------------------
# WordPiece training (textprep.wordpiece_train)
# ---------------------------------------------------------------------------


def test_wordpiece_prefers_likelihood_over_raw_count(spark):
    """The defining WordPiece property: a pair whose symbols ONLY occur
    together outranks a more frequent pair of independently-common
    symbols. Corpus: 'ab' appears 6x but a/b are everywhere separately;
    'xy' appears 3x and x/y never occur apart."""
    from simple_anonymizer_spark.operators.textprep import (
        bpe_train, wordpiece_train,
    )

    text = " ".join(["ab"] * 6 + ["a"] * 20 + ["b"] * 20 + ["xy"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    wp = wordpiece_train(df, n_merges=1).collect()
    bpe = bpe_train(df, n_merges=1).collect()
    assert wp[0]["left"] == "x" and wp[0]["right"] == "y"
    # BPE by raw count picks a different (more frequent) pair
    assert (bpe[0]["left"], bpe[0]["right"]) != ("x", "y")


def test_wordpiece_merges_drive_bpe_segment_losslessly(spark):
    from simple_anonymizer_spark.operators.textprep import (
        bpe_segment, wordpiece_train,
    )

    docs = spark.createDataFrame(
        [(1, "hugging hugs huge bug"), (2, "gumbo humbug"), (3, "")],
        "doc_id long, text string",
    )
    merges = [tuple(r) for r in wordpiece_train(docs, n_merges=5).collect()]
    out = {r.doc_id: r for r in bpe_segment(docs, merges).collect()}
    # losslessness: removing spaces and </w> markers restores the words
    for doc_id, text in [(1, "hugging hugs huge bug"), (2, "gumbo humbug")]:
        restored = (
            out[doc_id].pieces.replace(" ", "").replace("</w>", " ").strip()
        )
        assert restored == text.replace(" ", " "), (doc_id, restored)
    assert out[3].n_pieces == 0 and out[3].pieces == ""


def test_wordpiece_deterministic_across_partitioning(spark):
    from simple_anonymizer_spark.operators.textprep import wordpiece_train

    docs = spark.createDataFrame(
        [(i, "banana bandana ban") for i in range(8)],
        "doc_id long, text string",
    )
    a = [tuple(r) for r in wordpiece_train(docs, n_merges=4).collect()]
    b = [tuple(r) for r in
         wordpiece_train(docs.repartition(5), n_merges=4).collect()]
    assert a == b and len(a) == 4


# ---------------------------------------------------------------------------
# line_dedup (CCNet boilerplate pass)
# ---------------------------------------------------------------------------


def test_line_dedup_strips_repeating_lines_keeps_order(spark):
    from simple_anonymizer_spark.operators.textprep import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "HEADER\nalpha prose\nmid\nFOOTER"),
            (2, "HEADER\nbeta prose\nFOOTER"),
            (3, "HEADER\ngamma prose\nFOOTER"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs, min_docs=3).collect()}
    assert out[1].clean_text == "alpha prose\nmid"
    assert out[1].n_lines == 4 and out[1].n_removed == 2
    assert out[2].clean_text == "beta prose"


def test_line_dedup_threshold_and_all_boilerplate_doc(spark):
    from simple_anonymizer_spark.operators.textprep import line_dedup

    docs = spark.createDataFrame(
        [(1, "dup\nown1"), (2, "dup\nown2"), (3, "dup")],
        "doc_id long, text string",
    )
    # min_docs=4: nothing repeats enough, everything survives
    loose = {r.doc_id: r.clean_text
             for r in line_dedup(docs, min_docs=4).collect()}
    assert loose == {1: "dup\nown1", 2: "dup\nown2", 3: "dup"}
    # min_docs=3: 'dup' goes; doc 3 becomes empty, counts stay exact
    tight = {r.doc_id: r for r in line_dedup(docs, min_docs=3).collect()}
    assert tight[3].clean_text == "" and tight[3].n_removed == 1
    assert tight[1].clean_text == "own1"


def test_decode_inverts_encode_and_marks_oov(spark):
    from simple_anonymizer_spark.operators.textprep import (
        build_vocab, decode_documents, encode_documents)

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma"), (3, ""), (4, "alpha rare")],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs, min_freq=2)  # alpha(3), beta(2); gamma/rare OOV
    enc = encode_documents(docs, vocab)
    dec = {r.doc_id: r.decoded_text
           for r in decode_documents(enc, vocab).collect()}
    assert dec[1] == "alpha beta alpha"   # faithful round trip
    assert dec[2] == "beta <unk>"         # OOV rendered as sentinel
    assert dec[3] == ""                   # zero-token doc keeps its row
    assert dec[4] == "alpha <unk>"


# ---------------------------------------------------------------------------
# Byte-level BPE (the GPT-2 byte encoder): remap bijection, trainer
# semantics, and the lossless round-trip contract over arbitrary unicode.


def test_byte_symbol_table_is_gpt2_bijection():
    from simple_anonymizer_spark.operators.textprep import BYTE_BPE_SYMBOLS

    assert len(BYTE_BPE_SYMBOLS) == 256
    assert len(set(BYTE_BPE_SYMBOLS)) == 256          # bijective
    assert " " not in BYTE_BPE_SYMBOLS                # space is never a symbol
    # GPT-2 pins: printable bytes map to themselves; space -> Ġ (U+0120),
    # newline -> Ċ (U+010A), NUL -> Ā (U+0100)
    assert BYTE_BPE_SYMBOLS[ord("A")] == "A"
    assert BYTE_BPE_SYMBOLS[ord("!")] == "!"
    assert BYTE_BPE_SYMBOLS[0x20] == "Ġ"
    assert BYTE_BPE_SYMBOLS[0x0A] == "Ċ"
    assert BYTE_BPE_SYMBOLS[0x00] == "Ā"
    assert BYTE_BPE_SYMBOLS[0xFF] == "ÿ"


def test_byte_pretokens_gpt2_contractions(spark):
    """The contraction alternations are back (round-10): ``don't`` must
    split GPT-2-style into ``don`` + ``'t``, and the pre-tokenization
    must remain a partition of the input (losslessness)."""
    from simple_anonymizer_spark.operators.textprep import byte_pretokens

    cases = {
        "don't": ["don", "'t"],
        "I'll we're you've he's I'm they'd can't": [
            "I", "'ll", " we", "'re", " you", "'ve", " he", "'s",
            " I", "'m", " they", "'d", " can", "'t"],
        "it 's": ["it", " '", "s"],        # space+quote: not a contraction
        "rock'n'roll": ["rock", "'", "n", "'", "roll"],
        "a  b\n\nc": ["a", "  ", "b", "\n\n", "c"],  # inner runs keep all ws
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string")
    got = {r.text: r.toks for r in
           df.select("text", byte_pretokens("text").alias("toks")).collect()}
    for text, want in cases.items():
        assert got[text] == want, (text, got[text])
        assert "".join(got[text]) == text  # partition: lossless


def test_byte_bpe_train_greedy_merge_semantics(spark):
    from simple_anonymizer_spark.operators.textprep import byte_bpe_train

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa"), (2, "aaaa")], "doc_id long, text string")
    m = [tuple(r) for r in byte_bpe_train(docs, n_merges=2).collect()]
    # 'aaaa' x3 ('aaaa' and ' aaaa' pre-tokens): pair 'a a' counts
    # non-overlapping left-to-right -> merge 0 is (a, a); merge 1 then
    # pairs the merged symbol: (aa, aa).
    assert m[0][1:4] == ("a", "a", "aa")
    assert m[1][1:4] == ("aa", "aa", "aaaa")


def test_byte_bpe_roundtrip_fixture_corpus(spark, sf_dir):
    from simple_anonymizer_spark.operators.textprep import (
        byte_bpe_decode, byte_bpe_segment, byte_bpe_train)
    from simple_anonymizer_spark.sources.parquet import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = [tuple(r) for r in byte_bpe_train(docs, n_merges=4).collect()]
    dec = byte_bpe_decode(byte_bpe_segment(docs, merges))
    bad = (docs.alias("a").join(dec.alias("b"), "doc_id")
           .where(F.col("a.text") != F.col("b.text")).count())
    assert bad == 0


def test_byte_bpe_roundtrip_arbitrary_unicode(spark):
    """Losslessness is structural (partitioning regex + byte bijection +
    concatenation-only merges) — property-check it over adversarial
    unicode: emoji, CJK, combining marks, controls, lone surrogates are
    excluded (not encodable UTF-8) but everything else must survive."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from simple_anonymizer_spark.operators.textprep import (
        byte_bpe_decode, byte_bpe_segment, byte_bpe_train)

    texts_seen: list[str] = []

    @settings(max_examples=20, deadline=None)
    @given(st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=40),
        min_size=1, max_size=4))
    def check(texts):
        texts_seen.append("".join(texts))
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = [tuple(r) for r in byte_bpe_train(df, n_merges=2).collect()]
        dec = {r.doc_id: r.text
               for r in byte_bpe_decode(byte_bpe_segment(df, merges)).collect()}
        for i, t in rows:
            assert dec[i] == t, (i, t, dec[i])

    check()
    assert texts_seen  # the property actually ran


def test_byte_bpe_segment_empty_and_whitespace_docs(spark):
    from simple_anonymizer_spark.operators.textprep import byte_bpe_segment

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "x")], "doc_id long, text string")
    out = {r.doc_id: r for r in byte_bpe_segment(docs, []).collect()}
    assert out[1].n_pieces == 0 and out[1].pieces == ""
    assert out[2].n_pieces == 3 and set(out[2].pieces.split(" ")) == {"Ġ"}
    assert out[3].pieces == "x"
