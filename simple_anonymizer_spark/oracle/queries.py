"""DuckDB oracle SQL for every declared query in ``queries.py``.

SQL is built programmatically from the same frozen data lists and hash
builders as the Spark expressions, so the two sides cannot drift. Table
names reference the driver's pre-registered parquet views (``region nation
customer supplier part orders lineitem events documents embeddings``).

Cross-engine determinism rules mirrored here: DECIMAL accumulation cast to
DOUBLE, epoch-microsecond bigints instead of timestamps, explicit BIGINT
casts where DuckDB widens ints, and unique-key tie-breaks on every ranked
query.
"""

from __future__ import annotations

from ..operators.text_analysis import LANG_STOPWORDS
from . import duck as O

ORACLES: dict[str, str] = {}

# Dimension of the embeddings fixture. The Spark side derives vector length
# from the data; the SQL comprehensions below must enumerate indices, so the
# dimension is pinned here and guarded by a fixture-dimension test
# (tests/test_operators_misc.py) — a dimension change fails loudly instead
# of silently comparing truncated vectors.
EMBEDDING_DIM = 64
_IDX = f"range(1, {EMBEDDING_DIM + 1})"


def _h(expr: str) -> str:
    return O.raw_hash(expr)


def _shingles(text: str, k: int = 5) -> str:
    return (
        f"list_distinct([substr({text}, i, {k}) "
        f"for i in range(1, greatest(length({text}) - {k - 1}, 1) + 1)])"
    )


def _tokens(text: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({text}), '\\s+'), x -> x <> '')"
    )


_DEC = "CAST({} AS DECIMAL(12,2))"
_ONE = "CAST(1 AS DECIMAL(4,2))"


def _sum_dbl(inner: str) -> str:
    return f"CAST(sum({inner}) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Anonymizers
# ---------------------------------------------------------------------------

ORACLES["anon_stable_hash"] = f"""
SELECT c_custkey, CAST({O.stable_hash('c_name')} AS BIGINT) AS name_hash FROM customer
"""

ORACLES["anon_customer_pii"] = f"""
SELECT c_custkey,
  {O.full_name('c_name')} AS anon_name,
  {O.email('c_name')} AS anon_email,
  {O.phone_number('c_name')} AS anon_phone,
  {O.street_address('c_name')} AS anon_street,
  {O.city('c_name')} AS anon_city,
  {O.zip_code('c_name')} AS anon_zip
FROM customer
"""

ORACLES["anon_names"] = f"""
SELECT s_suppkey,
  {O.first_name('s_name')} AS anon_first,
  {O.last_name('s_name')} AS anon_last,
  {O.male_first_name('s_name')} AS anon_male,
  {O.female_first_name('s_name')} AS anon_female,
  {O.state('s_name')} AS anon_state,
  {O.state_abbr('s_name')} AS anon_state_abbr,
  {O.country('s_name')} AS anon_country
FROM supplier
"""

ORACLES["anon_redact"] = f"""
SELECT p_partkey,
  {O.redact('p_type')} AS redacted_type,
  {O.partial_redact('p_name', 3, 2)} AS partial_name,
  {O.lorem_text('p_name')} AS lorem_name
FROM part
"""

ORACLES["lens_json_field"] = f"""
SELECT c_custkey,
  '{{"name":"' || {O.full_name('c_name')} || '","seg":"' || c_mktsegment || '"}}'
    AS profile_json
FROM customer
"""

# ---------------------------------------------------------------------------
# Spec engine
# ---------------------------------------------------------------------------

ORACLES["spec_project_fixed"] = """
SELECT c_custkey, CAST(NULL AS DOUBLE) AS c_acctbal, c_mktsegment,
       'REDACTED' AS c_name
FROM customer WHERE c_custkey % 2 = 0
"""

ORACLES["spec_topk_orders"] = """
SELECT o_orderkey AS id, o_custkey, o_totalprice, o_orderstatus
FROM orders ORDER BY o_orderkey DESC LIMIT 100
"""

ORACLES["spec_subset_region"] = f"""
SELECT c_custkey, c_nationkey, {O.full_name('c_name')} AS anon_name
FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation WHERE n_regionkey IN (
    SELECT r_regionkey FROM region WHERE r_regionkey = 0))
"""

ORACLES["spec_subset_chain"] = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (
    SELECT c_custkey FROM customer WHERE c_custkey < 50))
"""

ORACLES["selfref_closure"] = """
WITH RECURSIVE base AS (
  SELECT n_nationkey,
         CASE WHEN n_nationkey = 0 THEN NULL
              ELSE CAST((n_nationkey - 1) // 2 AS INTEGER) END AS parent_key
  FROM nation
), reach(k) AS (
  SELECT n_nationkey FROM base WHERE n_nationkey <> 5 AND parent_key IS NULL
  UNION
  SELECT t.n_nationkey FROM base t JOIN reach r ON t.parent_key = r.k
  WHERE t.n_nationkey <> 5
)
SELECT n_nationkey, parent_key FROM base
WHERE n_nationkey <> 5
  AND (parent_key IS NULL OR parent_key IN (SELECT k FROM reach))
"""

# ---------------------------------------------------------------------------
# Relational analytics
# ---------------------------------------------------------------------------

_disc_price = f"{_DEC.format('l_extendedprice')} * ({_ONE} - CAST(l_discount AS DECIMAL(4,2)))"
_charge = f"{_disc_price} * ({_ONE} + CAST(l_tax AS DECIMAL(4,2)))"

ORACLES["q1_pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
  {_sum_dbl(_DEC.format('l_quantity'))} AS sum_qty,
  {_sum_dbl(_DEC.format('l_extendedprice'))} AS sum_base_price,
  {_sum_dbl(_disc_price)} AS sum_disc_price,
  {_sum_dbl(_charge)} AS sum_charge,
  {_sum_dbl(_DEC.format('l_quantity'))} / count(*) AS avg_qty,
  {_sum_dbl(_DEC.format('l_extendedprice'))} / count(*) AS avg_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q3_shipping_priority"] = f"""
SELECT l_orderkey, o_orderpriority, {_sum_dbl(_disc_price)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

ORACLES["q5_region_revenue"] = f"""
SELECT n_name, {_sum_dbl(_disc_price)} AS revenue, count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_regionkey <= 2
GROUP BY n_name
"""

ORACLES["window_top_orders"] = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) t
WHERE rn <= 3
"""

ORACLES["window_running_totals"] = """
SELECT o_custkey, o_orderkey,
  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
  lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
    AS prev_orderkey
FROM orders
"""

ORACLES["setop_except"] = """
SELECT DISTINCT o_custkey AS custkey FROM orders
EXCEPT
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
"""

ORACLES["setop_intersect_union"] = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
"""

ORACLES["agg_segment_stats"] = """
SELECT c_mktsegment,
  count(*) AS n_customers,
  count(DISTINCT c_nationkey) AS n_nations,
  min(c_acctbal) AS min_bal,
  max(c_acctbal) AS max_bal,
  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_bal
FROM customer
GROUP BY c_mktsegment
"""

ORACLES["agg_rollup_region"] = """
SELECT n_regionkey, n_nationkey, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_regionkey, n_nationkey)
"""

ORACLES["agg_cube_status"] = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""

ORACLES["agg_grouping_sets"] = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""

# agg_approx_distinct intentionally has NO oracle: HLL/quantile sketches
# are engine-specific; tests bound the error against exact aggregates.

ORACLES["pivot_segments"] = """
SELECT n_regionkey,
  count(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS automobile,
  count(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS building,
  count(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 END) AS furniture,
  count(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 END) AS household,
  count(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS machinery
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_regionkey
"""

# ---------------------------------------------------------------------------
# Streaming-shaped
# ---------------------------------------------------------------------------

ORACLES["sql_front_door"] = f"""
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
         AS total_balance,
       CAST(min({O.stable_hash('c_name')}) AS BIGINT) AS min_name_hash
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

ORACLES["config_front_door"] = f"""
SELECT c_custkey, {O.full_name('c_name')} AS c_name,
       CAST(NULL AS DOUBLE) AS c_acctbal, 'MASKED' AS c_mktsegment
FROM customer WHERE c_custkey % 3 = 0
"""

ORACLES["scalar_strings"] = """
SELECT c_custkey,
       upper(c_name) AS up,
       left(c_name, 8) AS l8,
       right(c_name, 4) AS r4,
       lpad(c_name, 22, '*') AS padded,
       replace(c_name, 'Customer', 'Anon') AS replaced,
       reverse(c_name) AS rev,
       split_part(c_name, '#', 2) AS num_part,
       CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
       translate(c_name, '0123456789', '##########') AS masked,
       CAST(ascii(substr(c_name, 1, 1)) AS BIGINT) AS first_ascii,
       repeat(substr(c_name, 1, 2), 3) AS rep
FROM customer
"""

ORACLES["events_tumbling"] = """
SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))) AS window_start,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""

ORACLES["events_sliding"] = """
WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS t, user_id FROM events),
exp AS (
  SELECT user_id, time_bucket(INTERVAL 1 HOUR, t) AS ws FROM ev
  UNION ALL
  SELECT user_id, time_bucket(INTERVAL 1 HOUR, t) - INTERVAL 1 HOUR AS ws FROM ev
)
SELECT epoch_us(ws) AS window_start,
       count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM exp GROUP BY ws
"""

ORACLES["events_sessionize"] = """
WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
flagged AS (
  -- STRICT >: Spark session windows merge adjacent windows, so an event at
  -- exactly last+gap still joins the session (pinned by
  -- tests/test_streaming.py::test_sessionize_gap_semantics).
  SELECT user_id, t,
    CASE WHEN lag(t) OVER w IS NULL
          OR t - lag(t) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t)
),
sess AS (
  SELECT user_id, t,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, epoch_us(min(t)) AS session_start, count(*) AS n_events
FROM sess GROUP BY user_id, sid
"""

# ---------------------------------------------------------------------------
# Dedup / text / similarity / multimodal
# ---------------------------------------------------------------------------

ORACLES["dedup_exact"] = """
SELECT min(doc_id) AS keeper_id, count(*) AS dup_count
FROM documents GROUP BY text
"""

ORACLES["dedup_distinct_docs"] = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
"""


def _minhash_sig(hashes: str, num_hashes: int = 8) -> str:
    from ..functions.textops import MERSENNE_31, minhash_permutations

    mins = [
        f"list_min([(h * {a} + {b}) % {MERSENNE_31} for h in {hashes}])"
        for a, b in minhash_permutations(num_hashes)
    ]
    return "[" + ", ".join(mins) + "]"


def _band_selects(bands: int, rows: int) -> str:
    selects = []
    for b in range(bands):
        key = " || '|' || ".join(
            f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows)
        )
        selects.append(
            f"SELECT doc_id, {b} AS band, {key} AS key FROM sig"
        )
    return " UNION ALL ".join(selects)


ORACLES["dedup_minhash_lsh"] = f"""
WITH sh AS (
  SELECT doc_id, {_shingles('text')} AS sh FROM documents
),
hs AS (
  SELECT doc_id, sh, [{_h('s')} for s in sh] AS hashes FROM sh
),
sig AS (
  SELECT doc_id, sh, {_minhash_sig('hashes', 16)} AS sig FROM hs
),
bands AS ({_band_selects(4, 4)}),
-- mirror of the Spark side's max_bucket_size cap (oversize buckets dropped)
sizes AS (
  SELECT band, key, count(DISTINCT doc_id) AS n FROM bands GROUP BY band, key
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  JOIN sizes s ON s.band = a.band AND s.key = a.key AND s.n <= 500
),
scored AS (
  SELECT c.id_a, c.id_b,
    CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
      / CAST(len(sa.sh) + len(sb.sh)
             - len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
      AS jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.3
"""

ORACLES["dedup_simhash"] = f"""
WITH hs AS (
  SELECT doc_id, [{_h('t')} for t in {_tokens('text')}] AS hashes FROM documents
)
SELECT doc_id,
  CAST(list_sum([
    CASE WHEN list_sum([
      CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END
      for h in hashes]) > 0
    THEN (CAST(1 AS BIGINT) << i) ELSE 0 END
    for i in range(0, 32)]) AS BIGINT) AS simhash
FROM hs
"""

# Mirror of simhash_neardup_pairs defaults: 4 blocks of 8 bits, Hamming
# <= 3, bucket cap 500. a.bsz == b.bsz inside a bucket (same window
# partition), so one cap predicate suffices. The comprehension variables
# follow the house rule: the inlined md5 hash expr owns ``i`` in its own
# scope only inside hs; the bit loops here reuse ``i``/``h`` exactly as
# the driver-green dedup_simhash oracle does.
ORACLES["dedup_simhash_pairs"] = f"""
WITH hs AS (
  SELECT doc_id, [{_h('t')} for t in {_tokens('text')}] AS hashes FROM documents
),
sig AS (
  SELECT doc_id,
    CAST(list_sum([
      CASE WHEN list_sum([
        CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END
        for h in hashes]) > 0
      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END
      for i in range(0, 32)]) AS BIGINT) AS simhash
  FROM hs
),
ent AS (
  SELECT doc_id, simhash, i AS block, (simhash >> (i * 8)) & 255 AS val
  FROM sig, (SELECT unnest(range(4)) AS i) t
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY block, val) AS bsz FROM ent
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sized a JOIN sized b ON a.block = b.block AND a.val = b.val
  AND a.doc_id < b.doc_id
WHERE a.bsz <= 500
  AND bit_count(xor(a.simhash, b.simhash)) <= 3
"""

ORACLES["ngram_jaccard_adjacent"] = f"""
WITH sh AS (
  SELECT doc_id, {_shingles('text')} AS sh FROM documents
),
pairs AS (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents)
SELECT p.id_a, p.id_b,
  CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
    / CAST(len(sa.sh) + len(sb.sh)
           - len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
    AS jaccard
FROM pairs p
JOIN sh sa ON sa.doc_id = p.id_a
JOIN sh sb ON sb.doc_id = p.id_b
"""

ORACLES["doc_fingerprint"] = f"""
SELECT doc_id,
  list_min([{_h("s || '_fp'")} for s in {_shingles('text', 8)}]) AS fingerprint,
  CAST({O.stable_hash('text')} AS BIGINT) AS content_hash
FROM documents
"""

ORACLES["token_count_bpe"] = """
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) AS BIGINT)
    AS n_bpe_tokens
FROM documents
"""

ORACLES["text_stats"] = f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len({_tokens('text')}) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct({_tokens('text')})) AS BIGINT) AS n_distinct_tokens,
  CAST(list_sum([length(t) for t in {_tokens('text')}]) AS DOUBLE)
    / CAST(len({_tokens('text')}) AS DOUBLE) AS mean_token_len
FROM documents
"""


def _stop_list_sql(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


ORACLES["text_quality"] = f"""
WITH t AS (
  SELECT doc_id, text, {_tokens('text')} AS toks,
    [substr(text, i, 5)
     for i in range(1, greatest(length(text) - 4, 1) + 1)] AS grams
  FROM documents
)
SELECT doc_id,
  CAST(len(list_filter(toks, x -> list_contains({_stop_list_sql(LANG_STOPWORDS['en'])}, x))) AS DOUBLE)
    / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS type_token_ratio,
  CAST(len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE) AS shingle_diversity
FROM t
"""


_CHK_CANON = ("concat_ws('|', "
              "coalesce(CAST(o_orderkey AS VARCHAR), chr(0)), "
              "coalesce(CAST(o_custkey AS VARCHAR), chr(0)), "
              "coalesce(o_orderstatus, chr(0)), "
              "coalesce(o_orderpriority, chr(0)))")
ORACLES["dq_table_checksum"] = f"""
WITH h AS (
  SELECT CAST({O.stable_hash(_CHK_CANON)} AS HUGEINT) AS hv FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(hv) % 2305843009213693952 AS BIGINT) AS checksum
FROM h
"""

# Closed form of the flat-block Q100 JPEG round trip (exactness is the
# pinned test_flat_color_q100 property of the codec).
ORACLES["multimodal_jpeg_roundtrip"] = """
SELECT doc_id,
  CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
  CAST(64 * (doc_id % 256) AS BIGINT) AS pixel_sum
FROM documents WHERE doc_id % 10 = 0
"""

# Closed form of synthetic_image_meta's PNG encode->decode round trip.
ORACLES["multimodal_image_meta"] = """
SELECT doc_id,
  CAST(8 + doc_id % 16 AS INTEGER) AS width,
  CAST(8 + n_chars % 16 AS INTEGER) AS height,
  CAST((8 + doc_id % 16) * (8 + n_chars % 16) AS BIGINT) AS n_pixels,
  CAST((8 + doc_id % 16) * (8 + n_chars % 16) * (doc_id % 256) AS BIGINT)
    AS pixel_sum
FROM documents
"""

# Closed form of synthetic_audio_features' synthesis (see the video
# twin below): amp = 100 + doc_id % 900, alternating-sign mono 8 kHz.
ORACLES["multimodal_audio_features"] = """
SELECT doc_id,
  CAST(n_chars AS BIGINT) AS n_samples,
  CAST(n_chars * 1000000 // 8000 AS BIGINT) AS duration_us,
  CAST(CASE WHEN n_chars > 0 THEN 100 + doc_id % 900 ELSE 0 END
    AS INTEGER) AS peak_abs,
  CAST(n_chars * (100 + doc_id % 900) * (100 + doc_id % 900) AS BIGINT)
    AS sum_sq,
  CAST(CASE WHEN n_chars > 1 THEN n_chars - 1 ELSE 0 END AS BIGINT)
    AS zero_crossings
FROM documents
"""

# Closed form of synthetic_video_meta's synthesis: the Spark side
# builds a real MP4 per row and parses it back with the from-scratch
# box walker, so value equality here IS parser conformance.
ORACLES["multimodal_video_meta"] = """
SELECT doc_id, CAST(n_chars * 40 AS BIGINT) AS duration_ms,
  CAST(160 + 16 * (doc_id % 20) AS INTEGER) AS width,
  CAST(90 + 9 * (doc_id % 20) AS INTEGER) AS height,
  CAST(1 AS INTEGER) AS n_tracks
FROM documents
"""

ORACLES["corpus_report"] = f"""
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
    CAST(count(DISTINCT lang) AS BIGINT) AS n_languages,
    CAST(count(DISTINCT {O.stable_hash('text')}) AS BIGINT)
      AS n_distinct_texts,
    CAST(sum(length(text)) AS BIGINT) AS total_chars,
    CAST(sum(len({_tokens('text')})) AS BIGINT) AS total_tokens
  FROM documents
)
SELECT *,
  CAST(n_docs - n_distinct_texts AS DOUBLE) / CAST(n_docs AS DOUBLE)
    AS exact_dup_ratio,
  CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_doc_tokens
FROM m
"""

# Gopher §A1.1 mirror: every threshold is an integer cross-multiplication
# (10 * hash_cnt <= n_words), never a float ratio — flags are bit-stable.
# coalesce on list_sum: DuckDB's sum of an empty list is NULL where the
# Spark fold's init value makes it 0.
from ..operators.textprep import normalize_text_sql as _norm_sql  # noqa: E402

# cdc_chunks mirror (window 16, divisor 64, max_len 512). Outer
# comprehension variables are p/pr/s2/k2 — NEVER i, which the inlined
# md5 hash expression owns (the house comprehension-scoping gotcha).
ORACLES["text_cdc_chunks"] = f"""
WITH c AS (
  SELECT doc_id, text,
    list_sort(list_distinct(
      [0]
      || [p + 15 for p in range(1, greatest(length(text) - 15, 0) + 1)
          if ({_h("substr(text, p, 16) || '_cdc'")}) % 64 = 0]
      || [length(text)])) AS cuts
  FROM documents
),
pr AS (
  SELECT doc_id, text,
    [[cuts[k2], cuts[k2 + 1]] for k2 in range(1, len(cuts))] AS prs
  FROM c
),
sp AS (
  SELECT doc_id, text,
    flatten([[{{'st': s2, 'en': least(s2 + 512, pr2[2])}}
              for s2 in range(pr2[1], pr2[2], 512)]
             for pr2 in prs]) AS spans
  FROM pr
),
x AS (
  SELECT doc_id, text,
    unnest([{{'ci': k2, 'st': spans[k2].st, 'en': spans[k2].en}}
            for k2 in range(1, len(spans) + 1)],
           recursive := true)
  FROM sp
)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
  substr(text, st + 1, en - st) AS chunk_text,
  CAST(en - st AS BIGINT) AS chunk_len
FROM x
"""

# Chunk-overlap report over the SAME chunk stream: the CDC oracle nests
# as a materialized CTE (referenced once, but MATERIALIZED keeps the
# comprehension chain from re-inlining under the aggregate).
ORACLES["dedup_chunk_overlap"] = f"""
WITH chunks AS MATERIALIZED ({ORACLES['text_cdc_chunks']})
SELECT CAST({O.stable_hash('chunk_text')} AS BIGINT) AS chunk_hash,
  CAST(length(chunk_text) AS BIGINT) AS chunk_len,
  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_occurrences,
  CAST(min(doc_id) AS BIGINT) AS first_doc
FROM chunks
WHERE chunk_len >= 20
GROUP BY chunk_text
HAVING count(DISTINCT doc_id) > 1
"""

ORACLES["text_normalize"] = f"""
SELECT doc_id, {_norm_sql('text')} AS text,
  CAST(length(text) - length({_norm_sql('text')}) AS BIGINT)
    AS n_chars_removed,
  (text <> {_norm_sql('text')}) AS changed
FROM documents
"""

def _gopher_flags_sql(min_stopwords: int = 2) -> str:
    """Gopher-rule mirror, parameterized exactly like the operator's
    ``min_stopwords`` (default 2 = the paper threshold; the release
    composite pins 1 — the fixture corpus is synthetic word soup with at
    most one of the 8 English stop words per doc)."""
    return f"""
WITH t AS (
  SELECT doc_id, text, {_tokens('text')} AS toks,
    string_split(text, chr(10)) AS lines
  FROM documents
),
m AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_words,
    CAST(coalesce(list_sum([length(w) for w in toks]), 0) AS BIGINT)
      AS total_len,
    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
      AS hash_cnt,
    CAST((length(text) - length(replace(text, '...', ''))) // 3
         + (length(text) - length(replace(text, {"'…'"}, '')))
      AS BIGINT) AS ellipsis_cnt,
    CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))
      AS BIGINT) AS alpha_words,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(list_filter([ltrim(l) for l in lines],
         l -> substr(l, 1, 1) IN ('•', '-', '*'))) AS BIGINT)
      AS bullet_lines,
    CAST(len(list_filter(lines,
         l -> rtrim(l) LIKE '%...' OR rtrim(l) LIKE {"'%…'"}))
      AS BIGINT) AS ellipsis_lines,
    CAST(len(list_intersect(list_distinct(toks),
         {_stop_list_sql(['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])}))
      AS BIGINT) AS stop_present
  FROM t
)
SELECT doc_id, n_words,
  (n_words >= 50 AND n_words <= 100000) AS wordcount_ok,
  (total_len >= 3 * n_words AND total_len <= 10 * n_words)
    AS mean_wordlen_ok,
  (10 * hash_cnt <= n_words AND 10 * ellipsis_cnt <= n_words)
    AS symbol_ratio_ok,
  (5 * alpha_words >= 4 * n_words) AS alpha_words_ok,
  (10 * bullet_lines <= 9 * n_lines) AS bullet_lines_ok,
  (10 * ellipsis_lines <= 3 * n_lines) AS ellipsis_lines_ok,
  (stop_present >= {min_stopwords}) AS stopwords_ok,
  (n_words >= 50 AND n_words <= 100000
   AND total_len >= 3 * n_words AND total_len <= 10 * n_words
   AND 10 * hash_cnt <= n_words AND 10 * ellipsis_cnt <= n_words
   AND 5 * alpha_words >= 4 * n_words
   AND 10 * bullet_lines <= 9 * n_lines
   AND 10 * ellipsis_lines <= 3 * n_lines
   AND stop_present >= {min_stopwords}) AS keep
FROM m
"""


ORACLES["quality_gopher_flags"] = _gopher_flags_sql()


def _lang_scores() -> tuple[str, str]:
    # Distinct-hit scoring, mirroring the lambda-free array_intersect scorer.
    cols = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        cols.append(
            f"CAST(len(list_filter(list_distinct(toks), x -> list_contains({_stop_list_sql(words)}, x))) AS BIGINT) AS s_{lang}"
        )
    langs = sorted(LANG_STOPWORDS)
    m = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    pick = "CASE WHEN " + m + " <= 0 THEN 'und' " + " ".join(
        f"WHEN s_{lang} = {m} THEN '{lang}'" for lang in langs[:-1]
    ) + f" ELSE '{langs[-1]}' END"
    return ", ".join(cols), pick


_lang_cols, _lang_pick = _lang_scores()
_lang_max = "greatest(" + ", ".join(f"s_{lang}" for lang in sorted(LANG_STOPWORDS)) + ")"

ORACLES["lang_id"] = f"""
WITH t AS (
  SELECT doc_id, {_tokens('text')} AS toks FROM documents
),
scored AS (SELECT doc_id, {_lang_cols} FROM t)
SELECT doc_id, {_lang_pick} AS predicted_lang,
       CAST({_lang_max} AS BIGINT) AS lang_hits
FROM scored
"""

_DOT = (
    "list_sum([CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE) "
    f"for i in {_IDX}])"
)
_QNORM = f"sqrt(list_sum([CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE) for i in {_IDX}]))"
_CNORM = f"sqrt(list_sum([CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE) for i in {_IDX}]))"

ORACLES["embedding_topk"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
    {_DOT} / ({_QNORM} * {_CNORM}) AS cos
  FROM c, q WHERE neighbor_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 3
"""


def _bucket_sql(vec: str, planes: int = 4, offset: int = 0) -> str:
    # Outer comprehension variable must NOT be `i`: the inlined md5 hash
    # expression has its own `for i in range(1, 9)` comprehension, and
    # DuckDB scoping would bind the salt's index to the inner variable.
    projs = []
    for p in range(planes):
        salted = "CAST(idx - 1 AS VARCHAR) || '_pl" + str(offset + p) + "'"
        w = f"(CAST({_h(salted)} AS DOUBLE) / 2147483647.0 - 0.5)"
        proj = f"list_sum([CAST({vec}[idx] AS DOUBLE) * {w} for idx in {_IDX}])"
        projs.append(f"CASE WHEN {proj} > 0 THEN {2 ** p} ELSE 0 END")
    return "(" + " + ".join(projs) + ")"


_PAIR_DOT = f"list_sum([CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE) for i in {_IDX}])"
_VA_NORM = f"sqrt(list_sum([CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE) for i in {_IDX}]))"
_VB_NORM = f"sqrt(list_sum([CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE) for i in {_IDX}]))"

# Banded hyperplane LSH mirror: 4 bands x 8 planes, plane family b uses
# global plane indices [8b, 8b+8); candidate = same full bucket in ANY
# band; oversize buckets (> 2000) dropped like the Spark side's cap.
# The corpus mirrors the Spark side's deterministic near-dup salt: every
# 25th vector re-emitted (id + 10M) as v + 0.125*reverse(v), elementwise
# exact IEEE double ops (0.125 is a power of two). MATERIALIZED: the
# bands UNION and the pair joins reference it 6 times (per-reference
# CTE-inlining gotcha).
_NEARDUP_CORPUS = f"""
  SELECT vec_id, [CAST(embedding[k2] AS DOUBLE) for k2 in {_IDX}]
    AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000 AS vec_id,
    [CAST(embedding[k2] AS DOUBLE)
     + 0.125 * CAST(embedding[{EMBEDDING_DIM} + 1 - k2] AS DOUBLE)
     for k2 in {_IDX}] AS embedding
  FROM embeddings WHERE vec_id % 25 = 0
"""

_NEARDUP_BANDS = " UNION ALL ".join(
    f"SELECT vec_id, {b} AS band, {_bucket_sql('embedding', 8, offset=8 * b)} AS bucket"
    " FROM corpus"
    for b in range(4)
)

ORACLES["embedding_neardup"] = f"""
WITH corpus AS MATERIALIZED ({_NEARDUP_CORPUS}),
bands AS ({_NEARDUP_BANDS}),
sizes AS (
  SELECT band, bucket, count(*) AS n FROM bands GROUP BY band, bucket
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
  FROM bands a
  JOIN bands b2 ON a.band = b2.band AND a.bucket = b2.bucket
    AND a.vec_id < b2.vec_id
  JOIN sizes s ON s.band = a.band AND s.bucket = a.bucket AND s.n <= 2000
),
pairs AS (
  SELECT c.id_a, c.id_b, ea.embedding AS va, eb.embedding AS vb
  FROM cand c
  JOIN corpus ea ON ea.vec_id = c.id_a
  JOIN corpus eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, {_PAIR_DOT} / ({_VA_NORM} * {_VB_NORM}) AS cosine
FROM pairs
WHERE {_PAIR_DOT} / ({_VA_NORM} * {_VB_NORM}) >= 0.9
"""

ORACLES["embedding_topk_lsh"] = f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
  FROM b WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
    {_DOT.replace('cv', 'b.embedding')} /
      ({_QNORM} * {_CNORM.replace('cv', 'b.embedding')}) AS cos
  FROM b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 3
"""

# Product quantization: codebook = the 8 lowest-id vectors' subvector
# slices (iteration-zero stand-in, the IVF convention); code = argmax
# subspace dot (ties -> lowest centroid); ADC score = sum of the query's
# per-subspace centroid dots selected by the code. Per-subspace dots are
# fixed-order folds (bit-identical doubles), floored to 2^-24 fixed point
# so the final 8-term sum is an order-free integer sum.
# quantize_int8 mirror: float32 -> double is exact, then divide /
# multiply / add / floor on identical doubles, parenthesized the same
# way as the Spark expressions — bit-identical codes, scale, and error.
_Q8_CODE = ("CAST((CASE WHEN x < 0 THEN -1 ELSE 1 END)"
            " * floor(abs(x) / scale * 127.0 + 0.5) AS INTEGER)")
ORACLES["embedding_quantize_int8"] = f"""
WITH m AS (
  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS dv,
    list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS scale
  FROM embeddings
)
SELECT vec_id, scale,
  array_to_string(
    CASE WHEN scale = 0 THEN [0 for x in dv]
         ELSE [{_Q8_CODE} for x in dv] END, ',') AS codes_csv,
  CASE WHEN scale = 0 THEN 0.0
       ELSE list_max([abs(x - ({_Q8_CODE} * scale) / 127.0) for x in dv])
       END AS max_abs_err
FROM m
"""

ORACLES["embedding_topk_pq"] = """
WITH cent AS (
  SELECT embedding AS cv,
         row_number() OVER (ORDER BY vec_id ASC) - 1 AS cidx
  FROM embeddings ORDER BY vec_id ASC LIMIT 8
),
js AS (SELECT unnest(range(0, 8)) AS j),
subdots AS (
  SELECT e.vec_id, js.j, c.cidx,
    list_sum([CAST(e.embedding[js.j * 8 + ii] AS DOUBLE)
              * CAST(c.cv[js.j * 8 + ii] AS DOUBLE)
              for ii in range(1, 9)]) AS d
  FROM embeddings e, cent c, js
),
codes AS (
  SELECT vec_id, j, cidx AS code FROM (
    SELECT vec_id, j, cidx,
           row_number() OVER (PARTITION BY vec_id, j
                              ORDER BY d DESC, cidx ASC) AS rn
    FROM subdots
  ) WHERE rn = 1
),
qsub AS (
  SELECT vec_id AS query_id, j, cidx,
         CAST(floor(d * 16777216.0) AS BIGINT) AS dfp
  FROM subdots WHERE vec_id < 5
),
scores AS (
  SELECT q.query_id, c2.vec_id AS neighbor_id,
         CAST(sum(q.dfp) AS BIGINT) AS score_fp
  FROM codes c2 JOIN qsub q ON q.j = c2.j AND q.cidx = c2.code
  WHERE c2.vec_id <> q.query_id
  GROUP BY q.query_id, c2.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, score_fp,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_fp DESC, neighbor_id ASC) AS rnk
  FROM scores
)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, score_fp
FROM ranked WHERE rnk <= 3
"""

# Recall@k join of the two existing topk chains (exact + 4-plane LSH).
# Hit counts are integers over neighbor SETS both engines already produce
# bit-identically; the only float is n_hits / 3.0 on identical inputs.
ORACLES["ann_recall_lsh"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
    {_DOT} / ({_QNORM} * {_CNORM}) AS cos
  FROM c, q WHERE neighbor_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored
),
exact AS (SELECT query_id, neighbor_id FROM ranked WHERE rnk <= 3),
bk AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
lq AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
  FROM bk WHERE vec_id < 5
),
lscored AS (
  SELECT lq.query_id, bk.vec_id AS neighbor_id,
    {_DOT.replace('cv', 'bk.embedding')} /
      ({_QNORM} * {_CNORM.replace('cv', 'bk.embedding')}) AS cos
  FROM bk JOIN lq ON bk.bucket = lq.qbucket AND bk.vec_id <> lq.query_id
),
lranked AS (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM lscored
),
approx AS (SELECT query_id, neighbor_id FROM lranked WHERE rnk <= 3),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e JOIN approx a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
  GROUP BY e.query_id
),
exn AS (
  SELECT query_id, count(*) AS exact_n FROM exact GROUP BY query_id
)
SELECT qq.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) AS DOUBLE)
         / CAST(greatest(least(3, coalesce(x.exact_n, 0)), 1) AS DOUBLE)
         AS recall_at_k
FROM (SELECT query_id FROM q) qq
LEFT JOIN hits h ON qq.query_id = h.query_id
LEFT JOIN exn x ON qq.query_id = x.query_id
"""

ORACLES["events_asof_signup"] = """
SELECT e.event_id, e.user_id, s.signup_event
FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t FROM events) e
ASOF LEFT JOIN (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, max(event_id) AS signup_event
  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts) s
ON e.user_id = s.user_id AND e.t > s.t
"""

ORACLES["join_anti_customers"] = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
"""

ORACLES["multimodal_meta"] = f"""
SELECT doc_id AS media_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST({O.stable_hash('text')} AS BIGINT) AS content_hash
FROM documents
"""

# ---------------------------------------------------------------------------
# Approx aggregates (error-bound booleans) + scalar function families
# ---------------------------------------------------------------------------

# Each engine checks ITS OWN sketch against ITS OWN exact value; the
# booleans and the exact counts are what cross the parity gate.
ORACLES["agg_approx_distinct"] = """
SELECT l_returnflag,
  count(DISTINCT l_orderkey) AS exact_orders,
  abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey))
    / count(DISTINCT l_orderkey) <= 0.05 AS approx_within_5pct,
  approx_quantile(l_quantity, 0.5) BETWEEN 20.0 AND 30.0
    AS approx_median_in_range
FROM lineitem
GROUP BY l_returnflag
"""

ORACLES["scalar_dates"] = """
SELECT o_orderkey,
  CAST(year(o_orderdate) AS BIGINT) AS order_year,
  CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
  CAST(month(o_orderdate) AS BIGINT) AS order_month,
  CAST(day(o_orderdate) AS BIGINT) AS order_dom,
  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS order_dow,
  epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-08-01') AS BIGINT)
    AS days_to_cutoff
FROM orders
"""

ORACLES["scalar_math"] = """
SELECT l_orderkey, l_linenumber,
  abs(l_extendedprice - 30000.0) AS abs_off,
  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS price_round1,
  sqrt(l_extendedprice) AS price_sqrt,
  l_extendedprice * l_extendedprice AS price_sq,
  CAST(l_orderkey % 97 AS BIGINT) AS key_mod,
  CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign,
  greatest(l_quantity, l_discount * 100.0) AS max_qd,
  least(l_tax, l_discount) AS min_td
FROM lineitem
"""

ORACLES["scalar_collections"] = """
WITH t AS (
  SELECT c_custkey, c_name, c_mktsegment,
    [c_custkey, c_nationkey, c_custkey % 7] AS arr,
    map(['seg', 'name'], [c_mktsegment, c_name]) AS m
  FROM customer
)
SELECT c_custkey,
  CAST(len(arr) AS BIGINT) AS arr_len,
  CAST(list_max(arr) AS BIGINT) AS arr_max,
  arr[3] AS arr_third,
  CAST(list_sum(arr) AS BIGINT) AS arr_sum,
  array_to_string(list_sort(arr), ',') AS arr_sorted_csv,
  CAST(len(string_split(c_name, '#')) AS BIGINT) AS n_name_parts,
  map_extract(m, 'seg')[1] AS map_seg,
  array_to_string(list_sort(map_keys(m)), ',') AS map_keys_csv,
  CAST(cardinality(m) AS BIGINT) AS map_len
FROM t
"""

ORACLES["merge_upsert"] = """
WITH src AS (
  SELECT c_custkey, 'UPDATED ' || c_name AS c_name, c_acctbal * 2 AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000 AS c_custkey, c_name, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 11 = 0
)
SELECT
  t.c_custkey AS c_custkey,
  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
FROM customer t LEFT JOIN src s ON t.c_custkey = s.c_custkey
UNION ALL
SELECT s.c_custkey, s.c_name, s.c_acctbal, s.c_mktsegment
FROM src s LEFT JOIN customer t ON s.c_custkey = t.c_custkey
WHERE t.c_custkey IS NULL
"""

# IVF: centroids = the 8 lowest-id vectors (k-means iteration zero, the
# deterministic stand-in the Spark side uses); each vector joins its
# argmax-cosine cell, each query probes its top-2 cells.
_XC_DOT = f"list_sum([CAST(xv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE) for i in {_IDX}])"
_XNORM = f"sqrt(list_sum([CAST(xv[i] AS DOUBLE) * CAST(xv[i] AS DOUBLE) for i in {_IDX}]))"
_QC_DOT = f"list_sum([CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE) for i in {_IDX}])"
_QX_DOT = f"list_sum([CAST(qv[i] AS DOUBLE) * CAST(xv[i] AS DOUBLE) for i in {_IDX}])"

ORACLES["embedding_topk_ivf"] = f"""
WITH cent AS (
  SELECT embedding AS cv,
         row_number() OVER (ORDER BY vec_id ASC) - 1 AS cell_idx
  FROM embeddings ORDER BY vec_id ASC LIMIT 8
),
corpus_scored AS (
  SELECT e.vec_id, e.embedding AS xv, c.cell_idx,
         {_XC_DOT.replace('xv', 'e.embedding').replace('cv', 'c.cv')}
           / ({_XNORM.replace('xv', 'e.embedding')} * {_CNORM.replace('cv', 'c.cv')}) AS cc
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, xv, cell_idx,
         row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cell_idx ASC) AS rn
  FROM corpus_scored
),
corpus_cells AS (SELECT vec_id, xv, cell_idx FROM assigned WHERE rn = 1),
q_scored AS (
  SELECT e.vec_id AS query_id, e.embedding AS qv, c.cell_idx,
         {_QC_DOT.replace('qv', 'e.embedding').replace('cv', 'c.cv')}
           / ({_QNORM.replace('qv', 'e.embedding')} * {_CNORM.replace('cv', 'c.cv')}) AS qc
  FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < 5
),
probes AS (
  SELECT query_id, qv, cell_idx FROM (
    SELECT query_id, qv, cell_idx,
           row_number() OVER (PARTITION BY query_id ORDER BY qc DESC, cell_idx ASC) AS prn
    FROM q_scored
  ) WHERE prn <= 2
),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         {_QX_DOT.replace('qv', 'p.qv').replace('xv', 'c.xv')}
           / ({_QNORM.replace('qv', 'p.qv')} * {_XNORM.replace('xv', 'c.xv')}) AS cos
  FROM probes p JOIN corpus_cells c ON p.cell_idx = c.cell_idx
  WHERE c.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 3
"""

ORACLES["range_join_shipments"] = """
WITH o AS (
  SELECT o_orderkey, o_orderdate AS lo,
         o_orderdate + INTERVAL 7 DAY AS hi
  FROM orders WHERE o_orderkey % 97 = 0
)
SELECT o.o_orderkey,
       CAST(count(*) AS BIGINT) AS n_shipped,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM o JOIN lineitem l ON l.l_shipdate BETWEEN o.lo AND o.hi
GROUP BY o.o_orderkey
"""

# Connected components over the minhash pair graph: reuse the pair oracle
# as a CTE and close it transitively with a recursive UNION (set semantics
# deduplicate paths), then label each document with the min reachable id.
_mh = ORACLES["dedup_minhash_lsh"].strip()
assert _mh.startswith("WITH ")
_mh_body, _mh_final = _mh[5:].rsplit("\nSELECT ", 1)
ORACLES["dedup_clusters"] = f"""
WITH RECURSIVE {_mh_body},
pairs AS (SELECT {_mh_final}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
labels AS (
  SELECT d.doc_id AS node,
         least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS component
  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id
)
SELECT node, component FROM labels
"""

# Golden records: the SAME recursive-component CTEs as dedup_clusters,
# extended with the per-cluster survivorship election.
_dc = ORACLES["dedup_clusters"].strip()
_dc_body = _dc.rsplit("\nSELECT ", 1)[0]
ORACLES["dedup_golden_records"] = f"""{_dc_body},
ranked AS (
  SELECT d.doc_id, l.component,
         row_number() OVER (PARTITION BY l.component
                            ORDER BY length(d.text) DESC, d.doc_id ASC) AS rn
  FROM documents d JOIN labels l ON d.doc_id = l.node
),
canon AS (SELECT component, doc_id AS canonical_id FROM ranked WHERE rn = 1)
SELECT r.doc_id, r.component, c.canonical_id,
       CAST(CASE WHEN r.doc_id = c.canonical_id THEN 1 ELSE 0 END AS BIGINT)
         AS is_canonical
FROM ranked r JOIN canon c USING (component)
"""

_SAMPLE_KEY = "CAST(c_custkey AS VARCHAR)"
_SPLIT_KEY = "(" + _SAMPLE_KEY + " || '_split')"
_SPLIT_BUCKET = f"({O.stable_hash(_SPLIT_KEY)} % 10000)"

_GSPLIT_KEY = "(source || '_gsplit')"
_GSPLIT_BUCKET = f"({O.stable_hash(_GSPLIT_KEY)} % 10000)"
ORACLES["sample_split_by_source"] = f"""
SELECT doc_id, source,
  CASE WHEN {_GSPLIT_BUCKET} < 8000 THEN 'train'
       WHEN {_GSPLIT_BUCKET} < 9000 THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""

# per_group_cap mirror: the semantic form is one row_number over
# (bucket, key) per group — the Spark side's two-phase bucket-threshold
# selection is equivalent by construction (buckets below the threshold
# kept whole, the threshold bucket ranked by key).
ORACLES["sample_domain_cap"] = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source ORDER BY
      ({O.stable_hash("(CAST(doc_id AS VARCHAR) || '_cap')")} % 10000),
      doc_id) AS __rn
  FROM documents)
WHERE __rn <= 10
"""

ORACLES["sample_stratified"] = f"""
SELECT c_custkey, c_mktsegment FROM customer
WHERE ({O.stable_hash(_SAMPLE_KEY)} % 10000) <
  CASE c_mktsegment
    WHEN 'BUILDING' THEN 5000
    WHEN 'MACHINERY' THEN 2500
    ELSE 1000
  END
"""

ORACLES["sample_split"] = f"""
SELECT c_custkey,
  CASE WHEN {_SPLIT_BUCKET} < 8000 THEN 'train'
       WHEN {_SPLIT_BUCKET} < 9000 THEN 'val'
       ELSE 'test' END AS split
FROM customer
"""

from ..operators.textprep import scrub_pii_sql as _scrub_sql

_RAW_PII = (
    "('Contact ' || substr(text, 1, 40) || ' at j' || CAST(doc_id AS VARCHAR)"
    " || '.doe@example.com or (555) 123-4567, see https://ex.io/p?q='"
    " || CAST(doc_id AS VARCHAR) || ' from 10.0.0.' || CAST(doc_id % 256 AS VARCHAR))"
)

ORACLES["text_scrub_pii"] = f"""
SELECT doc_id, {_scrub_sql(_RAW_PII)} AS scrubbed FROM documents
"""

ORACLES["text_chunks"] = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
),
starts AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(len(toks), 1), 24)) AS start
  FROM t
)
SELECT doc_id,
       CAST(start // 24 AS BIGINT) AS chunk_id,
       array_to_string(list_slice(toks, start + 1, start + 32), ' ') AS chunk_text,
       CAST(len(list_slice(toks, start + 1, start + 32)) AS BIGINT) AS n_chunk_tokens
FROM starts
"""


# The composed corpus pipeline: minhash clusters (reusing the pair oracle
# body), canonical-keeper + quality + length filters, PII scrub,
# deterministic split, chunking — one statement gating the composition.
_QUALITY_SUB = "(" + ORACLES["text_quality"].strip() + ")"
ORACLES["pipeline_corpus"] = f"""
WITH RECURSIVE {_mh_body},
pairs AS (SELECT {_mh_final}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
labels AS (
  SELECT d.doc_id AS node,
         least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS component
  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id
),
canonical AS (SELECT node AS doc_id FROM labels WHERE node = component),
good AS (
  SELECT doc_id FROM {_QUALITY_SUB} WHERE shingle_diversity >= 0.5
),
kept AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN canonical USING (doc_id)
  JOIN good USING (doc_id)
  WHERE length(d.text) >= 50
),
scrubbed AS (
  SELECT doc_id, {_scrub_sql("text")} AS text FROM kept
),
split AS (
  SELECT doc_id, text,
    CASE WHEN ({O.stable_hash("(CAST(doc_id AS VARCHAR) || '_split')")} % 10000) < 8000 THEN 'train'
         WHEN ({O.stable_hash("(CAST(doc_id AS VARCHAR) || '_split')")} % 10000) < 9000 THEN 'val'
         ELSE 'test' END AS split
  FROM scrubbed
),
tk AS (
  SELECT doc_id, split,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM split
),
starts AS (
  SELECT doc_id, split, toks,
         unnest(range(0, greatest(len(toks), 1), 24)) AS start
  FROM tk
)
SELECT doc_id, split,
       CAST(start // 24 AS BIGINT) AS chunk_id,
       array_to_string(list_slice(toks, start + 1, start + 32), ' ') AS chunk_text,
       CAST(len(list_slice(toks, start + 1, start + 32)) AS BIGINT) AS n_chunk_tokens
FROM starts
"""

# ---------------------------------------------------------------------------
# Descriptive statistics / profiling (operators/stats.py)
# ---------------------------------------------------------------------------

ORACLES["agg_median_balance"] = """
WITH v AS (
  SELECT c_mktsegment, CAST(c_acctbal AS DECIMAL(12,2)) AS bal, c_custkey
  FROM customer
),
r AS (
  SELECT c_mktsegment, bal,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY bal, c_custkey) AS rn,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM v
)
SELECT c_mktsegment,
       CAST(sum(bal) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS median,
       CAST(max(n) AS BIGINT) AS n_rows
FROM r
WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
GROUP BY c_mktsegment
"""

# Moment combines mirror the Spark expression ORDER OF OPERATIONS exactly:
# every step after the exact DECIMAL sums is an IEEE-deterministic double
# op (product/subtract/divide/sqrt), so same inputs + same ops = same bits.
ORACLES["agg_stats_moments"] = """
WITH a AS (
  SELECT o_orderstatus,
         CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2))
                       * CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS s2,
         CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_v,
         CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_v
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, n,
       s / CAST(n AS DOUBLE) AS mean_v,
       CASE WHEN n > 1 THEN
         sqrt(greatest(CAST(n AS DOUBLE) * s2 - s * s, 0.0)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
       END AS stddev_v,
       min_v, max_v
FROM a
"""

ORACLES["agg_corr_qty_price"] = """
WITH a AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2))
                       * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2))
                       * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
             AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0 THEN
         (CAST(n AS DOUBLE) * sxy - sx * sy)
         / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
            * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))
       END AS corr_xy
FROM a
"""

ORACLES["histogram_order_prices"] = """
WITH c AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT cents - cents % 5000000 AS bin_lo_cents,
       cents - cents % 5000000 + 5000000 AS bin_hi_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM c GROUP BY 1, 2
"""

ORACLES["rolling_user_activity"] = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
)
SELECT user_id, event_id, ts_us,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing,
       CAST(sum(v) OVER w AS DOUBLE) AS sum_trailing
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""

ORACLES["funnel_signup_purchase"] = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
),
a AS (
  SELECT user_id, min(us) AS step_a_us FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
),
b AS (
  SELECT ev.user_id, a.step_a_us, min(ev.us) AS step_b_us
  FROM ev JOIN a ON ev.user_id = a.user_id
  WHERE ev.event_type = 'purchase'
    AND ev.us >= a.step_a_us
    AND ev.us <= a.step_a_us + 604800000000
  GROUP BY ev.user_id, a.step_a_us
)
SELECT a.user_id, a.step_a_us, b.step_b_us,
       b.step_b_us IS NOT NULL AS converted,
       b.step_b_us - a.step_a_us AS lag_us
FROM a LEFT JOIN b ON a.user_id = b.user_id AND a.step_a_us = b.step_a_us
"""

# ---------------------------------------------------------------------------
# Corpus term statistics / fuzzy matching
# ---------------------------------------------------------------------------

ORACLES["tfidf_top_terms"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_tokens('text')}) AS term FROM documents
),
t_tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
t_df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM t_tf GROUP BY term
),
scored AS (
  SELECT t_tf.doc_id, t_tf.term, t_tf.tf, t_df.df,
         CAST(t_tf.tf AS DOUBLE) / CAST(t_df.df AS DOUBLE) AS score
  FROM t_tf JOIN t_df ON t_tf.term = t_df.term
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term)
            AS rnk
  FROM scored
)
SELECT doc_id, term, tf, df, score, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 3
"""

ORACLES["corpus_top_tokens"] = f"""
WITH toks AS (
  SELECT unnest({_tokens('text')}) AS token FROM documents
)
SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
FROM toks GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 20
"""

ORACLES["fuzzy_levenshtein"] = """
WITH p AS (SELECT doc_id, substr(text, 1, 60) AS pref FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.pref, b.pref) AS BIGINT) AS edit_distance,
       CASE WHEN greatest(length(a.pref), length(b.pref)) = 0 THEN 1.0
            ELSE 1.0 - CAST(levenshtein(a.pref, b.pref) AS DOUBLE)
                       / CAST(greatest(length(a.pref), length(b.pref)) AS DOUBLE)
       END AS prefix_similarity
FROM p a JOIN p b ON b.doc_id = a.doc_id + 1
"""

ORACLES["agg_quartiles_status"] = """
WITH v AS (
  SELECT o_orderstatus AS g, CAST(o_totalprice AS DECIMAL(12,2)) AS val,
         o_orderkey AS k
  FROM orders
),
r AS (
  SELECT g, CAST(val AS DOUBLE) AS vd,
         row_number() OVER (PARTITION BY g ORDER BY val, k) - 1 AS i,
         count(*) OVER (PARTITION BY g) AS n
  FROM v
),
q AS (SELECT * FROM (VALUES (1, 4), (2, 4), (3, 4)) t(num, den)),
sel AS (
  SELECT g, num, den, n,
         max(CASE WHEN i = ((n - 1) * num) // den THEN vd END) AS vlo,
         max(CASE WHEN i = ((n - 1) * num) // den + 1 THEN vd END) AS vhi
  FROM r CROSS JOIN q
  WHERE i = ((n - 1) * num) // den
     OR (i = ((n - 1) * num) // den + 1 AND ((n - 1) * num) % den > 0)
  GROUP BY g, num, den, n
)
SELECT g AS o_orderstatus,
       CAST(num * 100 // den AS BIGINT) AS q_pct,
       vlo + (coalesce(vhi, vlo) - vlo)
             * (CAST(((n - 1) * num) % den AS DOUBLE) / CAST(den AS DOUBLE))
         AS quantile,
       CAST(n AS BIGINT) AS n_rows
FROM sel
"""

ORACLES["skew_profile_orders"] = """
WITH c AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS key_count FROM orders GROUP BY 1
),
t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM orders)
SELECT o_custkey, key_count,
       CAST(key_count AS DOUBLE) / CAST(total AS DOUBLE) AS key_share
FROM c CROSS JOIN t
ORDER BY key_count DESC, o_custkey
LIMIT 10
"""

ORACLES["cohort_retention_weekly"] = """
WITH ev AS (
  SELECT user_id AS e,
         epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS p
  FROM events
),
first AS (SELECT e, min(p) AS cp FROM ev GROUP BY e),
active AS (SELECT DISTINCT e, p FROM ev),
j AS (SELECT cp, p - cp AS ps FROM active JOIN first USING (e)),
cs AS (SELECT cp, CAST(count(*) AS BIGINT) AS cohort_size FROM first GROUP BY cp),
g AS (SELECT cp, ps, CAST(count(*) AS BIGINT) AS n_active FROM j GROUP BY cp, ps)
SELECT cp * 604800000000 AS cohort_start_us,
       ps AS periods_since, n_active, cohort_size,
       CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retained_share
FROM g JOIN cs USING (cp)
"""

ORACLES["scd2_user_state"] = """
WITH ev AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events
),
r AS (
  SELECT user_id, us, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_type)
           AS prev
  FROM ev
),
runs AS (
  SELECT user_id, us, event_type FROM r
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type AS state, us AS valid_from_us,
       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_type)
         AS valid_to_us
FROM runs
"""

ORACLES["funnel_three_step"] = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
),
s1 AS (
  SELECT user_id, min(us) AS step_1_us FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT ev.user_id, min(ev.us) AS step_2_us
  FROM ev JOIN s1 ON ev.user_id = s1.user_id
  WHERE ev.event_type = 'click' AND ev.us >= s1.step_1_us
  GROUP BY ev.user_id
),
s3 AS (
  SELECT ev.user_id, min(ev.us) AS step_3_us
  FROM ev JOIN s2 ON ev.user_id = s2.user_id
  WHERE ev.event_type = 'purchase' AND ev.us >= s2.step_2_us
  GROUP BY ev.user_id
)
SELECT s1.user_id, s1.step_1_us, s2.step_2_us, s3.step_3_us,
       CAST(1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
            AS BIGINT) AS n_steps
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
"""

ORACLES["window_percentiles"] = """
SELECT o_orderkey, o_orderstatus,
       percent_rank() OVER w AS pct_rank,
       CAST(ntile(10) OVER w AS BIGINT) AS decile,
       cume_dist() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""

ORACLES["events_interval_join"] = """
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t, event_type FROM events
)
SELECT l.user_id, l.event_id AS left_id, r.event_id AS right_id,
       epoch_us(r.t) - epoch_us(l.t) AS lag_us
FROM ev l JOIN ev r
  ON l.user_id = r.user_id
 AND l.event_type = 'click' AND r.event_type = 'purchase'
 AND r.t >= l.t AND r.t <= l.t + INTERVAL 1 HOUR
"""

_BAL_KEY = "(CAST(doc_id AS VARCHAR) || '_bal')"

ORACLES["sample_balanced"] = f"""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ({O.stable_hash(_BAL_KEY)} % 10000), doc_id
         ) AS rk
  FROM documents
)
SELECT doc_id, lang FROM r WHERE rk <= 50
"""

ORACLES["pack_sequences_docs"] = f"""
WITH t AS (
  SELECT doc_id, len({_tokens('text')}) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           - n_tokens AS off
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(off // 256 AS BIGINT) AS seq_id,
       CAST(off % 256 AS BIGINT) AS seq_offset
FROM c
"""

ORACLES["agg_string_collect"] = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_names,
       string_agg(c_name, ',' ORDER BY c_name) AS names_csv
FROM customer
WHERE c_custkey % 100 = 0
GROUP BY c_mktsegment
"""

ORACLES["join_full_outer"] = """
WITH early AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_early FROM orders
  WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY o_custkey
),
late AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_late FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' GROUP BY o_custkey
)
SELECT coalesce(early.o_custkey, late.o_custkey) AS custkey, n_early, n_late
FROM early FULL OUTER JOIN late ON early.o_custkey = late.o_custkey
"""

# TPC-H-shaped widened family. All big decimal sums cross the
# DECIMAL->DOUBLE boundary via VARCHAR (see the double-rounding note at
# agg_stats_moments).

ORACLES["q4_order_priority"] = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND o_orderkey IN (
    SELECT l.l_orderkey FROM lineitem l JOIN orders o2
      ON l.l_orderkey = o2.o_orderkey
    WHERE l.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""

ORACLES["q6_forecast_revenue"] = """
SELECT CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(38,4)))
            AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(4,2)) >= CAST('0.03' AS DECIMAL(4,2))
  AND CAST(l_discount AS DECIMAL(4,2)) <= CAST('0.07' AS DECIMAL(4,2))
  AND l_quantity < 24
"""

ORACLES["q10_returned_items"] = """
WITH rev AS (
  SELECT o.o_custkey,
         CAST(CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * (CAST('1.00' AS DECIMAL(4,2))
                      - CAST(l.l_discount AS DECIMAL(4,2))) AS DECIMAL(38,4)))
              AS VARCHAR) AS DOUBLE) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY o.o_custkey
)
SELECT c.c_custkey, c.c_name, c.c_nationkey, rev.revenue
FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey
ORDER BY rev.revenue DESC, c.c_custkey
LIMIT 20
"""

ORACLES["q12_priority_class"] = """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_linestatus
"""

ORACLES["q14_promo_share"] = """
WITH a AS (
  SELECT
    CAST(CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
        THEN CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST('1.00' AS DECIMAL(4,2))
                - CAST(l.l_discount AS DECIMAL(4,2))) AS DECIMAL(38,4))
        ELSE CAST('0.0000' AS DECIMAL(38,4)) END) AS VARCHAR) AS DOUBLE)
      AS promo,
    CAST(CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST('1.00' AS DECIMAL(4,2))
                - CAST(l.l_discount AS DECIMAL(4,2))) AS DECIMAL(38,4)))
         AS VARCHAR) AS DOUBLE) AS total
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
    AND l.l_shipdate < TIMESTAMP '1996-04-01'
)
SELECT (100.0 * promo) / total AS promo_share_pct,
       promo AS promo_revenue, total AS total_revenue
FROM a
"""

ORACLES["window_running_distinct"] = """
WITH ev AS (
  SELECT event_type, event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events
),
flagged AS (
  SELECT event_type, event_id, ts_us,
         CASE WHEN row_number() OVER (
             PARTITION BY event_type, user_id ORDER BY ts_us, event_id
           ) = 1 THEN 1 ELSE 0 END AS fst
  FROM ev
)
SELECT event_type, event_id, ts_us,
       CAST(sum(fst) OVER (
         PARTITION BY event_type ORDER BY ts_us, event_id
         ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS n_distinct_so_far
FROM flagged
"""

ORACLES["pipeline_retrieval"] = f"""
WITH topk AS ({ORACLES["embedding_topk_ivf"]})
SELECT t.query_id, t.rank, d.doc_id, substr(d.text, 1, 40) AS snippet
FROM topk t JOIN documents d ON d.doc_id = t.neighbor_id
"""

_DOC_SPLIT_BUCKET = (
    "(" + O.stable_hash("(CAST(doc_id AS VARCHAR) || '_split')") + " % 10000)"
)


def _doc_ngrams(n: int) -> str:
    # Distinct space-joined token n-grams; list comprehension variable must
    # not be `i` (the inlined md5 helper binds i) — use g.
    toks = _tokens("text")
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {n} THEN "
        f"[array_to_string(list_slice({toks}, g, g + {n - 1}), ' ') "
        f"for g in range(1, len({toks}) - {n - 1} + 1)] "
        f"ELSE [] END)"
    )


ORACLES["contamination_screen"] = f"""
WITH split_docs AS (
  SELECT doc_id, text,
         CASE WHEN {_DOC_SPLIT_BUCKET} < 8000 THEN 'train'
              WHEN {_DOC_SPLIT_BUCKET} < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
train_grams AS (
  SELECT DISTINCT unnest({_doc_ngrams(5)}) AS gram
  FROM split_docs WHERE split = 'train'
),
test_docs AS (
  SELECT doc_id, {_doc_ngrams(5)} AS grams
  FROM split_docs WHERE split = 'test'
),
test_grams AS (
  SELECT doc_id, unnest(grams) AS gram FROM test_docs
),
hits AS (
  SELECT tg.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
  FROM test_grams tg
  WHERE tg.gram IN (SELECT gram FROM train_grams)
  GROUP BY tg.doc_id
)
SELECT d.doc_id,
       CAST(len(d.grams) AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       CASE WHEN len(d.grams) > 0 THEN
         CAST(coalesce(h.n_contaminated, 0) AS DOUBLE)
           / CAST(len(d.grams) AS DOUBLE)
       END AS contamination_ratio,
       (len(d.grams) > 0
        AND 100 * coalesce(h.n_contaminated, 0) >= 20 * len(d.grams))
         AS flagged
FROM test_docs d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""

ORACLES["dq_audit_orders"] = """
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_custkey,
         CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_orderdate,
         CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_totalprice,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_pk_rows,
         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS nonpositive_total
  FROM orders
),
orph AS (
  SELECT CAST(count(*) AS BIGINT) AS fk_orphans
  FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
  )
)
SELECT 'n_rows' AS metric, n_rows AS value FROM base
UNION ALL SELECT 'null_custkey', null_custkey FROM base
UNION ALL SELECT 'null_orderdate', null_orderdate FROM base
UNION ALL SELECT 'null_totalprice', null_totalprice FROM base
UNION ALL SELECT 'dup_pk_rows', dup_pk_rows FROM base
UNION ALL SELECT 'nonpositive_total', nonpositive_total FROM base
UNION ALL SELECT 'fk_orphans', fk_orphans FROM orph
"""

ORACLES["anomaly_orders_3sigma"] = """
WITH rev AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(floor(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST('1.00' AS DECIMAL(4,2))
                     - CAST(l_discount AS DECIMAL(4,2)))
                  AS DECIMAL(38,4))) * 100) AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY l_orderkey
),
scored0 AS (
  SELECT r.o_orderkey, o.o_orderstatus, r.rev_cents
  FROM rev r JOIN orders o USING (o_orderkey)
),
a AS (
  SELECT o_orderstatus,
         CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(CAST(rev_cents AS DECIMAL(12,2))) AS VARCHAR)
              AS DOUBLE) AS s,
         -- operands widened to (19,2): DuckDB multiplies (12,2)x(12,2)
         -- in int64 and rev_cents^2 overflows it; (19,2) forces the INT128
         -- path. Values are exact integers either way — Spark's (12,2)^2
         -- product in moments is the same number.
         CAST(CAST(sum(CAST(CAST(rev_cents AS DECIMAL(19,2))
                       * CAST(rev_cents AS DECIMAL(19,2)) AS DECIMAL(38,4)))
              AS VARCHAR) AS DOUBLE) AS s2
  FROM scored0 GROUP BY o_orderstatus
),
m AS (
  SELECT o_orderstatus,
         s / CAST(n AS DOUBLE) AS mean_v,
         CASE WHEN n > 1 THEN
           sqrt(greatest(CAST(n AS DOUBLE) * s2 - s * s, 0.0)
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
         END AS stddev_v
  FROM a
),
rows_scored AS (
  SELECT o.o_orderkey, o.o_orderstatus,
         CAST(CAST(o.rev_cents AS DECIMAL(12,2)) AS DOUBLE) AS value,
         m.mean_v, m.stddev_v
  FROM scored0 o JOIN m USING (o_orderstatus)
)
SELECT o_orderkey, o_orderstatus, value, mean_v,
       (value - mean_v) * (value - mean_v) AS dev_sq
FROM rows_scored
WHERE stddev_v IS NOT NULL
  AND (value - mean_v) * (value - mean_v) > 9.0 * (stddev_v * stddev_v)
"""

ORACLES["corpus_top_bigrams"] = f"""
WITH grams AS (
  SELECT unnest({_doc_ngrams(2)}) AS bigram FROM documents
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n_docs
FROM grams GROUP BY bigram
ORDER BY n_docs DESC, bigram
LIMIT 20
"""

ORACLES["winsorize_order_prices"] = """
WITH v AS (
  SELECT o_orderstatus AS g, CAST(o_totalprice AS DECIMAL(12,2)) AS val,
         o_orderkey AS k
  FROM orders
),
r AS (
  SELECT g, CAST(val AS DOUBLE) AS vd,
         row_number() OVER (PARTITION BY g ORDER BY val, k) - 1 AS i,
         count(*) OVER (PARTITION BY g) AS n
  FROM v
),
q AS (SELECT * FROM (VALUES (5, 100), (95, 100)) t(num, den)),
sel AS (
  SELECT g, num, den, n,
         max(CASE WHEN i = ((n - 1) * num) // den THEN vd END) AS vlo,
         max(CASE WHEN i = ((n - 1) * num) // den + 1 THEN vd END) AS vhi
  FROM r CROSS JOIN q
  WHERE i = ((n - 1) * num) // den
     OR (i = ((n - 1) * num) // den + 1 AND ((n - 1) * num) % den > 0)
  GROUP BY g, num, den, n
),
quants AS (
  SELECT g, num * 100 // den AS q_pct,
         vlo + (coalesce(vhi, vlo) - vlo)
               * (CAST(((n - 1) * num) % den AS DOUBLE) / CAST(den AS DOUBLE))
           AS quantile
  FROM sel
),
bounds AS (
  SELECT g,
         max(CASE WHEN q_pct = 5 THEN quantile END) AS qlo,
         max(CASE WHEN q_pct = 95 THEN quantile END) AS qhi
  FROM quants GROUP BY g
)
SELECT v.k AS o_orderkey, v.g AS o_orderstatus,
       CAST(v.val AS DOUBLE) AS value,
       least(greatest(CAST(v.val AS DOUBLE), b.qlo), b.qhi) AS winsorized,
       CAST(v.val AS DOUBLE) < b.qlo AS clipped_low,
       CAST(v.val AS DOUBLE) > b.qhi AS clipped_high
FROM v JOIN bounds b ON v.g = b.g
"""

# Exact Jaccard join: the oracle verifies ALL pairs brute-force (DuckDB is
# fine with O(n^2) at oracle scale) — a STRONGER check than mirroring the
# prefix filter: if Spark's pruning dropped a qualifying pair, the row
# sets would differ.
ORACLES["simjoin_exact_jaccard"] = f"""
WITH t AS (
  SELECT doc_id, list_distinct({_tokens('text')}) AS s FROM documents
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
         CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT)
           AS n_union
  FROM t a JOIN t b ON b.doc_id > a.doc_id
)
SELECT id_a, id_b, n_inter, n_union,
       CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard
FROM p
WHERE n_inter * 20 >= 19 * n_union
"""

_PROFILE_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]

ORACLES["profile_customer"] = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS column, CAST(count(*) - count({c}) AS BIGINT) AS null_count, "
    f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM customer"
    for c in _PROFILE_COLS
)

_FK_EDGES = [
    ("nation", "region", "n_regionkey", "r_regionkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
]

ORACLES["dq_fk_audit"] = "\nUNION ALL\n".join(
    f"SELECT '{ct}' AS child_table, '{pt}' AS parent_table, "
    f"'{cc}' AS fk_columns, CAST(count(*) AS BIGINT) AS orphans "
    f"FROM {ct} c WHERE c.{cc} IS NOT NULL "
    f"AND NOT EXISTS (SELECT 1 FROM {pt} p WHERE p.{pc} = c.{cc})"
    for ct, pt, cc, pc in _FK_EDGES
)

# Multimodal stand-in codecs are byte arithmetic over UTF-8 of ASCII text,
# so substring/repeat mirror them exactly (bytes == chars here).

ORACLES["multimodal_frames"] = """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
idx AS (
  SELECT doc_id, text, unnest(range(0, least(n, 64 * 4), 64)) AS start
  FROM d WHERE n > 0
)
SELECT doc_id AS media_id,
       CAST(start // 64 AS BIGINT) AS frame_index,
       CAST(length(substring(text, start + 1, 64)) AS BIGINT) AS frame_bytes,
       substring(text, start + 1, 64) AS frame_text
FROM idx
"""

ORACLES["multimodal_resize"] = """
SELECT doc_id AS media_id,
       CAST(length(r) AS BIGINT) AS n_bytes,
       r AS resized_text
FROM (
  SELECT doc_id,
         CASE WHEN length(text) = 0 THEN ''
              ELSE substring(repeat(text, 64 // greatest(length(text), 1) + 1),
                             1, 64)
         END AS r
  FROM documents
)
"""

ORACLES["drift_price_distribution"] = """
WITH c AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         o_orderdate >= TIMESTAMP '1998-01-01' AS is_late
  FROM orders
),
ha AS (
  SELECT cents - cents % 5000000 AS bin, CAST(count(*) AS BIGINT) AS na
  FROM c WHERE NOT is_late GROUP BY 1
),
hb AS (
  SELECT cents - cents % 5000000 AS bin, CAST(count(*) AS BIGINT) AS nb
  FROM c WHERE is_late GROUP BY 1
),
j AS (
  SELECT coalesce(ha.na, 0) AS na, coalesce(hb.nb, 0) AS nb
  FROM ha FULL OUTER JOIN hb ON ha.bin = hb.bin
),
t AS (SELECT na, nb, sum(na) OVER () AS ta, sum(nb) OVER () AS tb FROM j)
SELECT CAST(count(*) AS BIGINT) AS n_bins,
       CAST(max(ta) AS BIGINT) AS total_a,
       CAST(max(tb) AS BIGINT) AS total_b,
       CAST(sum(abs(na * tb - nb * ta)) AS DOUBLE)
         / (2.0 * CAST(max(ta) * max(tb) AS DOUBLE)) AS tvd
FROM t
"""

_TOK = _tokens("text")
ORACLES["text_repetition"] = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len({_TOK}) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct({_TOK})) AS BIGINT) AS n_distinct,
         CASE WHEN len({_TOK}) >= 2 THEN
           [array_to_string(list_slice({_TOK}, g, g + 1), ' ')
            for g in range(1, len({_TOK}))]
         ELSE [] END AS bg
  FROM documents
),
bgx AS (SELECT doc_id, unnest(bg) AS bigram FROM base),
bgc AS (SELECT doc_id, bigram, count(*) AS c FROM bgx GROUP BY 1, 2),
bga AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_n,
         CAST(sum(c) AS BIGINT) AS n_bg,
         CAST(count(*) AS BIGINT) AS n_bg_distinct
  FROM bgc GROUP BY 1
)
SELECT b.doc_id, b.n_tokens,
  CASE WHEN b.n_tokens = 0 THEN NULL
       ELSE CAST(b.n_tokens - b.n_distinct AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
  END AS dup_token_frac,
  coalesce(a.top_n, 0) AS top_bigram_n,
  CASE WHEN b.n_tokens = 0 THEN NULL
       ELSE CAST(2 * coalesce(a.top_n, 0) AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
  END AS top_bigram_frac,
  CASE WHEN coalesce(a.n_bg, 0) = 0 THEN NULL
       ELSE CAST(a.n_bg - a.n_bg_distinct AS DOUBLE) / CAST(a.n_bg AS DOUBLE)
  END AS dup_bigram_frac
FROM base b LEFT JOIN bga a ON b.doc_id = a.doc_id
"""

ORACLES["dup_spans"] = """
WITH g AS (
  SELECT doc_id,
         unnest([substr(text, p, 30)
                 for p in range(1, greatest(length(text) - 29, 1) + 1)]) AS gram
  FROM documents
),
shared AS (
  SELECT gram, 1 AS f FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(s.f) AS BIGINT) AS n_shared_grams,
       CAST(count(s.f) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS shared_frac
FROM g LEFT JOIN shared s ON g.gram = s.gram
GROUP BY g.doc_id
"""


# ---------------------------------------------------------------------------
# Count-min sketch (operators/sketch.py) — deterministic grid, frozen hash
# kernel salted per sketch row; the comprehension variable is `r`, never `i`
# (the inlined raw_hash expr owns `i`).
# ---------------------------------------------------------------------------


def _cms_cells(key: str, depth: int, width: int, src: str,
               extra_cols: str = "") -> str:
    selects = []
    for r in range(depth):
        h = _h(f"({key} || '__cms{r}|')")
        selects.append(
            f"SELECT {extra_cols}{r} AS sketch_row, "
            f"CAST({h} % {width} AS INT) AS bucket FROM {src}"
        )
    return " UNION ALL ".join(selects)


ORACLES["cms_sketch_tokens"] = f"""
WITH toks AS (
  SELECT unnest({_tokens('text')}) AS token FROM documents
),
cells AS ({_cms_cells('token', 4, 256, 'toks')})
SELECT sketch_row, bucket, CAST(count(*) AS BIGINT) AS cnt
FROM cells GROUP BY sketch_row, bucket
"""

ORACLES["cms_heavy_hitters"] = f"""
WITH toks AS (
  SELECT unnest({_tokens('text')}) AS token FROM documents
),
cells AS ({_cms_cells('token', 4, 256, 'toks')}),
sk AS (
  SELECT sketch_row, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM cells GROUP BY sketch_row, bucket
),
probes AS (
  SELECT DISTINCT token FROM (
    SELECT unnest({_tokens('text')}) AS token FROM documents
    WHERE doc_id % 20 = 0
  )
),
pc AS ({_cms_cells('token', 4, 256, 'probes', extra_cols='token, ')}),
est AS (
  SELECT token, CAST(min(COALESCE(sk.cnt, 0)) AS BIGINT) AS est
  FROM pc LEFT JOIN sk USING (sketch_row, bucket)
  GROUP BY token
)
SELECT token, est FROM est ORDER BY est DESC, token LIMIT 20
"""


# ---------------------------------------------------------------------------
# Bloom-filter contamination (operators/bloom.py) — bit-identical words:
# bucket r = raw_hash(gram || '__bloom{r}|') % num_bits, word bit_or of
# 1<<(bucket%64). Comprehension-free (the union-all is generated in Python,
# variable r) so the inlined md5 helper's `i` cannot be shadowed.
# ---------------------------------------------------------------------------


def _bloom_wm(key: str, num_hashes: int, num_bits: int, src: str,
              extra_cols: str = "") -> str:
    selects = []
    for r in range(num_hashes):
        b = f"({_h(f'({key} || ' + chr(39) + f'__bloom{r}|' + chr(39) + ')')} % {num_bits})"
        # DuckDB raises on signed 1<<63 where Spark wraps to the sign bit:
        # emit the two's-complement literal for bit 63 explicitly.
        mask = (
            f"(CASE WHEN {b} % 64 = 63 THEN CAST(-9223372036854775808 AS BIGINT) "
            f"ELSE (CAST(1 AS BIGINT) << CAST({b} % 64 AS INT)) END)"
        )
        selects.append(
            f"SELECT {extra_cols}CAST({b} // 64 AS INT) AS word_idx, "
            f"{mask} AS mask FROM {src}"
        )
    return " UNION ALL ".join(selects)


ORACLES["contamination_bloom"] = f"""
WITH split_docs AS (
  SELECT doc_id, text,
         CASE WHEN {_DOC_SPLIT_BUCKET} < 8000 THEN 'train'
              WHEN {_DOC_SPLIT_BUCKET} < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
train_grams AS (
  SELECT unnest({_doc_ngrams(5)}) AS gram
  FROM split_docs WHERE split = 'train'
),
bloom AS (
  SELECT word_idx, bit_or(mask) AS word
  FROM ({_bloom_wm('gram', 4, 1 << 16, 'train_grams')})
  GROUP BY word_idx
),
test_docs AS (
  SELECT doc_id, {_doc_ngrams(5)} AS grams
  FROM split_docs WHERE split = 'test'
),
test_grams AS (
  SELECT doc_id, unnest(grams) AS gram FROM test_docs
),
probe_cells AS ({_bloom_wm('gram', 4, 1 << 16, 'test_grams',
                           extra_cols='doc_id, gram, ')}),
gram_hits AS (
  SELECT doc_id, gram,
         CAST(sum(CASE WHEN (COALESCE(b.word, 0) & p.mask) <> 0
                       THEN 1 ELSE 0 END) = 4 AS BOOLEAN) AS might
  FROM probe_cells p LEFT JOIN bloom b USING (word_idx)
  GROUP BY doc_id, gram
),
hits AS (
  SELECT doc_id, CAST(sum(CASE WHEN might THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated
  FROM gram_hits GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(d.grams) AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       CASE WHEN len(d.grams) > 0 THEN
         CAST(coalesce(h.n_contaminated, 0) AS DOUBLE)
           / CAST(len(d.grams) AS DOUBLE)
       ELSE NULL END AS contamination_ratio,
       (len(d.grams) > 0 AND
        100 * coalesce(h.n_contaminated, 0) >= 20 * len(d.grams)) AS flagged
FROM test_docs d LEFT JOIN hits h USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Distributed k-means (operators/kmeans.py): 2 deterministic Lloyd
# iterations mirrored CTE-for-CTE — lowest-id init, argmax-cosine assign
# (row_number DESC/cell ASC = Spark's array_position-of-max), DECIMAL(20,10)
# dimension sums, one double division, empty cells carry the old centroid.
# ---------------------------------------------------------------------------


def _cosd(a: str, b: str) -> str:
    dot = f"list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) for i in {_IDX}])"
    na = f"sqrt(list_sum([CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE) for i in {_IDX}]))"
    nb = f"sqrt(list_sum([CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) for i in {_IDX}]))"
    return f"({dot} / ({na} * {nb}))"


def _kmeans_assign_cte(prev_cent: str, name: str) -> str:
    cos = _cosd("e.embedding", "c.cv")
    return f"""
{name}_s AS (
  SELECT e.vec_id, e.embedding AS xv, c.cell, {cos} AS cc
  FROM embeddings e CROSS JOIN {prev_cent} c
),
{name} AS (
  SELECT vec_id, xv, cell FROM (
    SELECT vec_id, xv, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cell ASC) AS rn
    FROM {name}_s
  ) WHERE rn = 1
)"""


def _kmeans_update_cte(assign: str, prev_cent: str, name: str) -> str:
    return f"""
{name}_sums AS (
  SELECT cell, d,
         (CAST(sum(CAST(floor(CAST(xv[d] AS DOUBLE) * 16777216.0) AS BIGINT))
               AS DOUBLE) / 16777216.0) / count(*) AS m
  FROM {assign}, range(1, {EMBEDDING_DIM + 1}) t(d)
  GROUP BY cell, d
),
{name}_new AS (
  SELECT cell, list(m ORDER BY d) AS cv FROM {name}_sums GROUP BY cell
),
{name} AS (
  SELECT p.cell, COALESCE(n.cv, p.cv) AS cv
  FROM {prev_cent} p LEFT JOIN {name}_new n USING (cell)
)"""


ORACLES["embedding_kmeans"] = f"""
WITH c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cell,
         embedding AS cv
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id ASC LIMIT 8)
),{_kmeans_assign_cte('c0', 'a1')},{_kmeans_update_cte('a1', 'c0', 'c1')},{_kmeans_assign_cte('c1', 'a2')},{_kmeans_update_cte('a2', 'c1', 'c2')},{_kmeans_assign_cte('c2', 'a3')},
counts AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS n_members FROM a3 GROUP BY cell
)
SELECT c.cell, CAST(COALESCE(k.n_members, 0) AS BIGINT) AS n_members,
       CAST(c.cv[1] AS DOUBLE) AS centroid_d1
FROM c2 c LEFT JOIN counts k USING (cell)
"""

# SemDeDup (kmeans.semantic_dedup): the SAME two Lloyd iterations as
# embedding_kmeans, then within-cell cosine pairs and lowest-id survivors.
ORACLES["semantic_dedup_embeddings"] = f"""
WITH c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cell,
         embedding AS cv
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id ASC LIMIT 8)
),{_kmeans_assign_cte('c0', 'a1')},{_kmeans_update_cte('a1', 'c0', 'c1')},{_kmeans_assign_cte('c1', 'a2')},{_kmeans_update_cte('a2', 'c1', 'c2')},{_kmeans_assign_cte('c2', 'a3')},
dups AS (
  SELECT DISTINCT y.vec_id
  FROM a3 x JOIN a3 y ON x.cell = y.cell AND x.vec_id < y.vec_id
  WHERE {_cosd('x.xv', 'y.xv')} >= 0.9
)
SELECT a.vec_id, a.cell,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM a3 a LEFT JOIN dups d ON a.vec_id = d.vec_id
"""


# ---------------------------------------------------------------------------
# Z-order curve (operators/layout.py): min/max scaling with explicit floor
# (Spark truncates double->long, DuckDB rounds — floor-first is exact both
# ways), then a generated 2x16-term bit interleave. Disjoint bits, so the
# terms sum instead of OR.
# ---------------------------------------------------------------------------


def _z_scaled(col: str, lo: str, hi: str, bits: int) -> str:
    # Constant-column guard mirrors layout._scale_expr: hi <= lo -> 0
    # (without it DuckDB divides by zero into NaN/Inf while Spark emits 0).
    top = float((1 << bits) - 1)
    return (
        f"CASE WHEN {hi} <= {lo} THEN 0 ELSE "
        f"CAST(floor((CAST({col} AS DOUBLE) - {lo}) * {top} / ({hi} - {lo})) "
        f"AS BIGINT) END"
    )


def _z_interleave(scaled: list[str], bits: int) -> str:
    n = len(scaled)
    terms = []
    for j, s in enumerate(scaled):
        for b in range(bits):
            terms.append(f"((({s} >> {b}) & 1) << {b * n + j})")
    return "(" + " + ".join(terms) + ")"


ORACLES["zorder_orders"] = f"""
WITH b AS (
  SELECT min(CAST(o_custkey AS DOUBLE)) AS lo0,
         max(CAST(o_custkey AS DOUBLE)) AS hi0,
         min(CAST(o_totalprice AS DOUBLE)) AS lo1,
         max(CAST(o_totalprice AS DOUBLE)) AS hi1
  FROM orders
)
SELECT o.o_orderkey,
       {_z_interleave([_z_scaled('o.o_custkey', 'b.lo0', 'b.hi0', 16),
                       _z_scaled('o.o_totalprice', 'b.lo1', 'b.hi1', 16)],
                      16)} AS zval
FROM orders o CROSS JOIN b
"""


# ---------------------------------------------------------------------------
# Incremental LSH ingest (dedup.minhash_lsh_ingest): the new batch's band
# entries join the standing corpus index on (band, key); no bucket cap on
# this path (the candidate set is bounded by the batch, not the corpus).
# ---------------------------------------------------------------------------


def _band_selects_from(src: str, idcol: str, bands: int, rows: int) -> str:
    selects = []
    for b in range(bands):
        key = " || '|' || ".join(
            f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows)
        )
        selects.append(
            f"SELECT {idcol}, {b} AS band, {key} AS key FROM {src}"
        )
    return " UNION ALL ".join(selects)


ORACLES["dedup_lsh_ingest"] = f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
newd AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
csh AS (SELECT doc_id, {_shingles('text')} AS sh FROM corpus),
csig AS (
  SELECT doc_id, sh, {_minhash_sig(f"[{_h('s')} for s in sh]", 16)} AS sig
  FROM csh
),
cbands AS ({_band_selects_from('csig', 'doc_id', 4, 4)}),
nsh AS (SELECT doc_id, {_shingles('text')} AS sh FROM newd),
nsig AS (
  SELECT doc_id, sh, {_minhash_sig(f"[{_h('s')} for s in sh]", 16)} AS sig
  FROM nsh
),
nbands AS ({_band_selects_from('nsig', 'doc_id', 4, 4)}),
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
  FROM nbands n JOIN cbands c ON n.band = c.band AND n.key = c.key
  WHERE n.doc_id <> c.doc_id
),
scored AS (
  SELECT cd.new_id, cd.corpus_id,
    CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
      / CAST(len(sa.sh) + len(sb.sh)
             - len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
      AS jaccard
  FROM cand cd
  JOIN nsh sa ON sa.doc_id = cd.new_id
  JOIN csh sb ON sb.doc_id = cd.corpus_id
)
SELECT new_id, corpus_id, jaccard FROM scored WHERE jaccard >= 0.5
"""


# ---------------------------------------------------------------------------
# Weighted sampling + equal remix (operators/sampling.py additions).
# ---------------------------------------------------------------------------

_WDOC_BUCKET = "(" + O.stable_hash("(CAST(doc_id AS VARCHAR) || '_w')") + " % 10000)"
_RMX_BUCKET = "(" + O.stable_hash("(CAST(doc_id AS VARCHAR) || '_remix')") + " % 10000)"

ORACLES["sample_weighted_topk"] = f"""
SELECT doc_id, n_chars FROM documents
WHERE n_chars > 0
ORDER BY CAST({_WDOC_BUCKET} + 1 AS DOUBLE) / CAST(n_chars AS DOUBLE) ASC,
         doc_id ASC
LIMIT 100
"""

ORACLES["remix_lang_equal"] = f"""
WITH sizes AS (
  SELECT count(*) AS cnt FROM documents GROUP BY lang
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang ORDER BY {_RMX_BUCKET}, doc_id
         ) AS rn
  FROM documents
)
SELECT doc_id, lang FROM ranked
WHERE rn <= (SELECT min(cnt) FROM sizes)
"""

_TMP_BUCKET = "(" + O.stable_hash("(CAST(doc_id AS VARCHAR) || '_temp')") + " % 10000)"

# Quota arithmetic is integer-exact on both engines: floor(sqrt(n)) over a
# BIGINT count (IEEE sqrt is correctly rounded — bit-identical), then
# (total * wt) // sum(wt) in integer division. No order-dependent float sums.
ORACLES["remix_lang_temperature"] = f"""
WITH counts AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang
),
wts AS (
  SELECT lang, n,
         CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wt
  FROM counts
),
quota AS (
  SELECT lang,
         least(n, (300 * wt) // (SELECT sum(wt) FROM wts)) AS target
  FROM wts
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang ORDER BY {_TMP_BUCKET}, doc_id
         ) AS rn
  FROM documents
)
SELECT r.doc_id, r.lang
FROM ranked r JOIN quota q ON r.lang = q.lang
WHERE r.rn <= q.target
"""

# Pure integer arithmetic end-to-end (token counts summed as BIGINT under
# a total order) — no float drift possible between engines.
ORACLES["token_budget_corpus"] = f"""
WITH toks AS (
  SELECT doc_id, n_chars,
         CAST(len({_tokens('text')}) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, n_chars, n_tokens,
         CAST(sum(n_tokens) OVER (
           ORDER BY n_chars DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_weight
  FROM toks
)
SELECT doc_id, n_chars, n_tokens, cum_weight
FROM cum WHERE cum_weight <= 10000
"""

_TKM_BUCKET = "(" + O.stable_hash("(CAST(doc_id AS VARCHAR) || '_tokmix')") + " % 10000)"

ORACLES["remix_token_equal"] = f"""
WITH toks AS (
  SELECT doc_id, lang,
         CAST(len({_tokens('text')}) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, lang, n_tokens,
         CAST(sum(n_tokens) OVER (
           PARTITION BY lang
           ORDER BY {_TKM_BUCKET}, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_weight
  FROM toks
)
SELECT doc_id, lang, n_tokens, cum_weight
FROM cum WHERE cum_weight <= 2000
"""


# ---------------------------------------------------------------------------
# Vocabulary + encoding (operators/textprep.py build_vocab/encode_documents).
# ---------------------------------------------------------------------------

_VOCAB_CTE = f"""
vtoks AS (
  SELECT unnest({_tokens('text')}) AS token FROM documents
),
vocab AS (
  SELECT token,
         CAST(row_number() OVER (ORDER BY count(*) DESC, token ASC) - 1
              AS BIGINT) AS token_id,
         CAST(count(*) AS BIGINT) AS n_occurrences
  FROM vtoks GROUP BY token
)"""

ORACLES["vocab_build"] = f"""
WITH {_VOCAB_CTE}
SELECT token, token_id, n_occurrences FROM vocab
"""

ORACLES["encode_docs"] = f"""
WITH {_VOCAB_CTE},
d AS (SELECT doc_id, {_tokens('text')} AS toks FROM documents),
pos AS (
  -- generate_subscripts + unnest expand in lockstep (range() rejects
  -- lateral column parameters in this DuckDB version)
  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS token
  FROM d
),
tagged AS (
  SELECT p.doc_id, p.pos, COALESCE(v.token_id, -1) AS tid
  FROM pos p LEFT JOIN vocab v USING (token)
),
enc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos) AS ids_csv
  FROM tagged GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(e.n_tokens, 0) AS BIGINT) AS n_tokens,
       COALESCE(e.ids_csv, '') AS ids_csv
FROM d LEFT JOIN enc e USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Equi-depth histogram (stats.equi_depth_histogram): global rank under
# (value, tie), bin = (rank * n_bins) div n. The oracle uses a plain
# window (DuckDB side has no scale constraint).
# ---------------------------------------------------------------------------

ORACLES["equidepth_order_prices"] = """
WITH ranked AS (
  SELECT CAST(o_totalprice AS DECIMAL(12,2)) AS v,
         row_number() OVER (
           ORDER BY CAST(o_totalprice AS DECIMAL(12,2)), o_orderkey
         ) - 1 AS r,
         count(*) OVER () AS n
  FROM orders
)
SELECT CAST((r * 10) // n AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(v) AS DOUBLE) AS lo,
       CAST(max(v) AS DOUBLE) AS hi
FROM ranked GROUP BY bin
"""


# ---------------------------------------------------------------------------
# TPC-H extension block (round 4). Mirrors queries.py's adapted Q2/Q7/Q8/
# Q9/Q11/Q13/Q15/Q16/Q17/Q18/Q19/Q20/Q21/Q22. Big DECIMAL(38,4) sums go
# through the VARCHAR round-trip (DuckDB's int128->DOUBLE cast
# double-rounds; the string parse is correctly rounded like Spark's
# BigDecimal path).
# ---------------------------------------------------------------------------

def _sum38(inner: str) -> str:
    return (
        f"CAST(CAST(sum(CAST({inner} AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)"
    )


_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST('1.00' AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)

ORACLES["q2_min_cost_supplier"] = """
WITH shipped AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
sp AS (
  SELECT sh.l_partkey, s.s_suppkey, s.s_name, s.s_acctbal
  FROM shipped sh JOIN supplier s ON sh.l_suppkey = s.s_suppkey
),
mn AS (SELECT l_partkey, min(s_acctbal) AS min_bal FROM sp GROUP BY l_partkey)
SELECT p.p_partkey, p.p_name, sp.s_suppkey, sp.s_name, sp.s_acctbal
FROM sp
JOIN mn ON mn.l_partkey = sp.l_partkey AND sp.s_acctbal = mn.min_bal
JOIN part p ON p.p_partkey = sp.l_partkey
WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'ECONOMY'
"""

ORACLES["q7_nation_volume"] = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       {_sum38(_REV)} AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
"""

ORACLES["q8_market_share"] = f"""
WITH agg AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(CAST(sum(CAST(CASE WHEN s.s_nationkey = 2 THEN {_REV}
                       ELSE CAST('0.0000' AS DECIMAL(38,4)) END AS DECIMAL(38,4)))
              AS VARCHAR) AS DOUBLE) AS nation_revenue,
         {_sum38(_REV)} AS total_revenue
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'SMALL'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
    AND c.c_nationkey IN (
      SELECT n_nationkey FROM nation JOIN region
        ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
  GROUP BY year(o.o_orderdate)
)
SELECT o_year, nation_revenue / total_revenue AS mkt_share,
       nation_revenue, total_revenue
FROM agg
"""

ORACLES["q9_product_profit"] = f"""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(sum(CAST(
         CAST({_REV} AS DECIMAL(38,4))
         - CAST(CAST(p.p_retailprice AS DECIMAL(12,2))
                * CAST('0.60' AS DECIMAL(4,2))
                * CAST(l.l_quantity AS DECIMAL(4,0)) AS DECIMAL(38,4))
       AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%e%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY n.n_name, year(o.o_orderdate)
"""

ORACLES["q11_important_parts"] = """
WITH base AS (
  SELECT l_partkey, l_extendedprice FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE')
),
per_part AS (
  SELECT l_partkey,
         CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
              AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS part_value
  FROM base GROUP BY l_partkey
),
total AS (
  SELECT CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
              AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS t
  FROM base
)
SELECT l_partkey, part_value FROM per_part, total
WHERE part_value > t * 0.001
"""

ORACLES["q13_customer_distribution"] = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
) GROUP BY c_count
"""

ORACLES["q15_top_supplier"] = f"""
WITH rev AS (
  SELECT l_suppkey, {_sum38(_REV)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, rev.total_revenue
FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
WHERE rev.total_revenue = (SELECT max(total_revenue) FROM rev)
"""

ORACLES["q16_supplier_cnt"] = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""

ORACLES["q17_small_qty_revenue"] = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,0))) AS DOUBLE) AS qty_sum,
         CAST(count(*) AS DOUBLE) AS qty_cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
            AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#3'
JOIN per_part pp ON l.l_partkey = pp.pk
WHERE l.l_quantity < 0.5 * (pp.qty_sum / pp.qty_cnt)
"""

ORACLES["q18_large_orders"] = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,0))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,0))) AS DOUBLE) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       epoch_us(o.o_orderdate) AS o_orderdate_us,
       o.o_totalprice, big.total_qty
FROM orders o
JOIN big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""

ORACLES["q19_discounted_revenue"] = f"""
SELECT {_sum38(_REV)} AS revenue, CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11
       AND p.p_size BETWEEN 1 AND 5)
   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20
       AND p.p_size BETWEEN 1 AND 10)
   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30
       AND p.p_size BETWEEN 1 AND 15)
"""

ORACLES["q20_promo_suppliers"] = """
WITH per AS (
  SELECT l_suppkey,
         CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                        AND l_shipdate < TIMESTAMP '1997-01-01'
                       THEN CAST(l_quantity AS DECIMAL(12,0))
                       ELSE CAST('0' AS DECIMAL(12,0)) END) AS DOUBLE) AS q96,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,0))) AS DOUBLE) AS qall
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name FROM supplier
WHERE s_acctbal > 0
  AND s_suppkey IN (SELECT l_suppkey FROM per WHERE q96 * 2.0 > qall)
"""

ORACLES["q21_waiting_suppliers"] = """
WITH fo AS (
  SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
)
SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM fo l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM fo l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM fo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_suppkey, s.s_name
"""

ORACLES["q22_idle_customers"] = """
WITH avg_bal AS (
  SELECT CAST(CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(12,2))
              AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS a
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(CAST(sum(CAST(CAST(c.c_acctbal AS DECIMAL(12,2))
            AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c.c_nationkey
"""


# ---------------------------------------------------------------------------
# Round-4 pipeline operators: BM25, bigram LM, Markov transitions,
# blocked linkage, integer PageRank.
# ---------------------------------------------------------------------------

ORACLES["bm25_docs"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_tokens('text')}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
corpus AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(count(*) AS BIGINT) FROM toks) AS total_len
),
hits AS (
  SELECT tf.doc_id,
         CAST(floor(
           (CAST(22 * tf.tf * c.total_len AS DOUBLE)
            / CAST(10 * tf.tf * c.total_len + 3 * c.total_len
                   + 9 * dl.dl * c.n_docs AS DOUBLE))
           * (CAST(2 * c.n_docs - 2 * df.df + 1 AS DOUBLE)
              / CAST(2 * df.df + 1 AS DOUBLE))
           * 1048576.0
         ) AS BIGINT) AS fp
  FROM tf
  JOIN dfreq df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN corpus c
  WHERE tf.term IN ('spark', 'window', 'hash')
),
scored AS (
  SELECT doc_id, CAST(sum(fp) AS BIGINT) AS score_fp,
         CAST(count(*) AS BIGINT) AS n_terms_hit
  FROM hits GROUP BY doc_id
)
SELECT doc_id, score_fp,
       CAST(score_fp AS DOUBLE) / 1048576.0 AS score,
       n_terms_hit,
       CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id) AS BIGINT) AS rank
FROM scored
ORDER BY score_fp DESC, doc_id
LIMIT 50
"""

ORACLES["bigram_lm_docs"] = f"""
WITH d AS (SELECT doc_id, {_tokens('text')} AS toks FROM documents),
pos AS (
  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS token
  FROM d
),
pairs AS (
  SELECT token AS w1,
         lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM pos
),
counts AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_bigram
  FROM pairs WHERE w2 IS NOT NULL GROUP BY w1, w2
),
contexts AS (
  SELECT w1, CAST(sum(n_bigram) AS BIGINT) AS n_context
  FROM counts GROUP BY w1
)
SELECT c.w1, c.w2, c.n_bigram, x.n_context,
       CAST(c.n_bigram AS DOUBLE) / CAST(x.n_context AS DOUBLE) AS p_cond
FROM counts c JOIN contexts x USING (w1)
"""

ORACLES["markov_event_transitions"] = """
WITH seq AS (
  SELECT event_type AS next_type,
         lag(event_type) OVER (
           PARTITION BY user_id
           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
         ) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type
),
totals AS (
  SELECT prev_type, CAST(sum(n_trans) AS BIGINT) AS prev_total
  FROM trans GROUP BY prev_type
)
SELECT t.prev_type, t.next_type, t.n_trans, x.prev_total,
       CAST(t.n_trans AS DOUBLE) / CAST(x.prev_total AS DOUBLE) AS p_cond
FROM trans t JOIN totals x USING (prev_type)
"""

ORACLES["linkage_customer_supplier"] = """
SELECT c.c_custkey, s.s_suppkey, c.c_name, s.s_name,
       right(c.c_name, 4) AS block,
       CAST(levenshtein(c.c_name, s.s_name) AS BIGINT) AS distance
FROM customer c JOIN supplier s ON right(c.c_name, 4) = right(s.s_name, 4)
WHERE levenshtein(c.c_name, s.s_name) <= 5
"""


def _pagerank_sql(iterations: int = 3) -> str:
    """Unrolled fixed-iteration integer PageRank mirroring
    operators/graph.py step-for-step (same floor divisions, same
    teleport/damping constants, same dangling-node convention)."""
    rank_scale, w_scale = 10**12, 10**6
    ctes = [
        """edges AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY c.c_nationkey, s.s_nationkey
)""",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM nodes)",
        "outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY src)",
        f"""ne AS (
  SELECT e.src, e.dst, (e.w * {w_scale}) // o.ow AS wn
  FROM edges e JOIN outw o ON e.src = o.src
)""",
        f"r0 AS (SELECT node, {rank_scale} // nn.c AS r FROM nodes, nn)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT ne.dst AS node, CAST(sum((p.r * ne.wn) // {w_scale}) AS BIGINT) AS s
  FROM ne JOIN r{i - 1} p ON ne.src = p.node GROUP BY ne.dst
)"""
        )
        ctes.append(
            f"""r{i} AS (
  SELECT nodes.node,
         (({15 * rank_scale}) // (100 * nn.c))
         + (85 * coalesce(c{i}.s, CAST(0 AS BIGINT))) // 100 AS r
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON nodes.node = c{i}.node
)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT rf.node AS nationkey, n.n_name, rf.r AS rank_fp,
       CAST(rf.r AS DOUBLE) / {float(rank_scale)} AS rank
FROM r{iterations} rf JOIN nation n ON rf.node = n.n_nationkey
"""
    )


ORACLES["pagerank_trade"] = _pagerank_sql(3)


ORACLES["gdpr_cascade_delete"] = """
WITH surv_c AS (
  SELECT c_custkey FROM customer WHERE NOT coalesce(c_acctbal < 0, false)
),
surv_o AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IS NULL OR o_custkey IN (SELECT c_custkey FROM surv_c)
),
surv_l AS (
  SELECT 1 AS x FROM lineitem
  WHERE l_orderkey IS NULL OR l_orderkey IN (SELECT o_orderkey FROM surv_o)
),
report AS (
  SELECT 'customer' AS table_name,
         (SELECT count(*) FROM customer) AS b,
         (SELECT count(*) FROM surv_c) AS s
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem), (SELECT count(*) FROM surv_l)
  UNION ALL
  SELECT 'orders',
         (SELECT count(*) FROM orders), (SELECT count(*) FROM surv_o)
)
SELECT table_name, CAST(b AS BIGINT) AS rows_before,
       CAST(s AS BIGINT) AS rows_surviving,
       CAST(b - s AS BIGINT) AS rows_deleted
FROM report
"""


ORACLES["rfm_customer_segments"] = """
WITH per_cust AS (
  SELECT o_custkey AS customer,
         CAST(max(epoch_us(o_orderdate)) AS BIGINT) AS recency_us,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2))
              AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
),
n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM per_cust),
scored AS (
  SELECT p.*,
    ((row_number() OVER (ORDER BY recency_us, customer) - 1) * 4) // n.c + 1
      AS r_score,
    ((row_number() OVER (ORDER BY frequency, customer) - 1) * 4) // n.c + 1
      AS f_score,
    ((row_number() OVER (ORDER BY monetary, customer) - 1) * 4) // n.c + 1
      AS m_score
  FROM per_cust p CROSS JOIN n
)
SELECT customer, recency_us, frequency, monetary,
       CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
FROM scored
"""


ORACLES["graph_triangles"] = """
WITH edges AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY c.c_nationkey, s.s_nationkey
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree
  FROM (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
  GROUP BY node
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
pern AS (
  SELECT node, CAST(count(*) AS BIGINT) AS tri_count
  FROM (SELECT x AS node FROM tri
        UNION ALL SELECT y AS node FROM tri
        UNION ALL SELECT z AS node FROM tri)
  GROUP BY node
)
SELECT d.node, d.degree,
       coalesce(p.tri_count, CAST(0 AS BIGINT)) AS tri_count,
       CASE WHEN d.degree < 2 THEN 0.0
            ELSE CAST(coalesce(p.tri_count, 0) * 2 AS DOUBLE)
                 / CAST(d.degree * (d.degree - 1) AS DOUBLE)
       END AS lcc
FROM deg d LEFT JOIN pern p ON d.node = p.node
"""


ORACLES["anon_account_numbers"] = f"""
SELECT c_custkey, {O.account_number('c_name')} AS acct FROM customer
"""

ORACLES["pipeline_release_orders"] = f"""
SELECT c.c_custkey,
       {O.full_name('c.c_name')} AS anon_name,
       {O.email('c.c_name')} AS anon_email,
       {O.city('c.c_name')} AS anon_city,
       o.o_orderkey,
       CAST({O.shift_timestamp('o.o_orderdate', 'c.c_custkey', 180)}
            AS BIGINT) AS shifted_us,
       CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
JOIN orders o ON c.c_custkey = o.o_custkey
"""

_IP_EXPR = f"(({O.raw_hash('CAST(c_custkey AS VARCHAR)')}) % 4294967296)"
ORACLES["anon_ip_prefix"] = f"""
WITH s AS (
  SELECT c_custkey, CAST({_IP_EXPR} AS BIGINT) AS ip FROM customer
)
SELECT c_custkey, ip,
       CAST({O.prefix_preserving_ip('ip')} AS BIGINT) AS ip_anon
FROM s
"""

ORACLES["anon_shift_dates"] = f"""
SELECT o_orderkey, o_custkey,
       CAST({O.shift_timestamp('o_orderdate', 'o_custkey', 180)} AS BIGINT)
         AS shifted_us
FROM orders
"""

ORACLES["agg_grouping_flags"] = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

ORACLES["scalar_regex"] = """
SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       CAST(len(regexp_extract_all(c_name, '[0-9]')) AS BIGINT)
         AS n_digits,
       CAST(CASE WHEN regexp_matches(c_name, '^Customer#')
                 THEN 1 ELSE 0 END AS BIGINT) AS is_std,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
       CAST(len(string_split_regex(c_name, '[#]')) AS BIGINT) AS n_parts
FROM customer
"""

ORACLES["window_rank_family"] = """
SELECT o_orderkey, o_orderstatus,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       percent_rank() OVER w AS prank,
       cume_dist() OVER w AS cdist,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY o_totalprice ASC, o_orderkey ASC)
"""

ORACLES["event_paths_top"] = """
WITH seq AS (
  SELECT event_type AS t0,
         lag(event_type, 1) OVER w AS t1,
         lag(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
)
SELECT t2 || '>' || t1 || '>' || t0 AS path,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM seq WHERE t2 IS NOT NULL
GROUP BY 1
ORDER BY n_occurrences DESC, path ASC
LIMIT 25
"""

ORACLES["quantile_transform_prices"] = """
WITH r AS (
  SELECT o_orderkey, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS rk,
         count(*) OVER () AS n
  FROM orders
)
SELECT o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rank,
       CASE WHEN n <= 1 THEN 0.0
            ELSE CAST(rk AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS q
FROM r
"""

ORACLES["drift_ks_status"] = """
WITH tagged AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS a,
         CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS b
  FROM orders WHERE o_orderstatus IN ('F', 'O')
),
per_v AS (
  SELECT v, CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
  FROM tagged GROUP BY v
),
tot AS (
  SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb
  FROM per_v
),
cum AS (
  SELECT v,
         CAST(sum(na) OVER (ORDER BY v) AS BIGINT) AS ca,
         CAST(sum(nb) OVER (ORDER BY v) AS BIGINT) AS cb
  FROM per_v
),
d AS (
  SELECT v, abs(ca * tb - cb * ta) AS diff FROM cum CROSS JOIN tot
),
m AS (SELECT max(diff) AS md FROM d)
SELECT t.ta AS n_a, t.tb AS n_b,
       CAST(m.md AS DOUBLE) / CAST(t.ta * t.tb AS DOUBLE) AS ks,
       CAST((SELECT min(v) FROM d WHERE diff = m.md) AS DOUBLE) / 100.0
         AS ks_at
FROM tot t CROSS JOIN m
"""

ORACLES["window_value_family"] = """
SELECT o_orderkey, o_custkey,
       CAST(first_value(o_orderkey) OVER w AS BIGINT) AS first_order,
       CAST(last_value(o_orderkey) OVER w AS BIGINT) AS last_order,
       CAST(nth_value(o_orderkey, 2) OVER w AS BIGINT) AS second_order,
       first_value(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE))
         OVER w AS first_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY epoch_us(CAST(o_orderdate AS TIMESTAMP)), o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""

ORACLES["concentration_segments"] = """
WITH per_seg AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
)
SELECT c_nationkey,
       CAST(sum(n) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(n * n) AS DOUBLE)
         / CAST(sum(n) * sum(n) AS DOUBLE) AS hhi,
       CAST(sum(n) * sum(n) - sum(n * n) AS DOUBLE)
         / CAST(sum(n) * sum(n) AS DOUBLE) AS gini_impurity,
       CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS top_share
FROM per_seg GROUP BY c_nationkey
"""

ORACLES["json_props_profile"] = """
WITH p AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST(sum(k) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_k
FROM p GROUP BY event_type
"""

ORACLES["anomaly_mad_orders"] = """
WITH rows_u AS (
  SELECT o_orderstatus AS g,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS u,
         o_orderkey AS t
  FROM orders
),
r1 AS (
  SELECT g, u, t,
         row_number() OVER (PARTITION BY g ORDER BY u, t) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM rows_u
),
med AS (
  SELECT g, CAST(max(n) AS BIGINT) AS n_rows,
         CASE WHEN count(*) = 1 THEN 2 * sum(u) ELSE sum(u) END AS m2
  FROM r1
  WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT)
     OR rn = CAST(floor(n / 2) AS BIGINT) + 1
  GROUP BY g
),
devs AS (
  SELECT r.g, r.u, r.t, m.m2, m.n_rows, abs(2 * r.u - m.m2) AS dev2
  FROM rows_u r JOIN med m ON r.g = m.g
),
r2 AS (
  SELECT g, dev2, m2, n_rows,
         row_number() OVER (PARTITION BY g ORDER BY dev2, t) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM devs
),
mad AS (
  SELECT g,
         CASE WHEN count(*) = 1 THEN 2 * sum(dev2) ELSE sum(dev2) END AS mad4
  FROM r2
  WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT)
     OR rn = CAST(floor(n / 2) AS BIGINT) + 1
  GROUP BY g
)
SELECT d.g AS o_orderstatus,
       CAST(max(d.n_rows) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN 2 * d.dev2 > 3 * m.mad4 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(max(d.m2) AS DOUBLE) / 200.0 AS median,
       CAST(max(m.mad4) AS DOUBLE) / 400.0 AS mad
FROM devs d JOIN mad m ON d.g = m.g
GROUP BY d.g
"""

ORACLES["agg_mode_disc_percentiles"] = """
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS n
  FROM orders GROUP BY 1, 2
),
md AS (
  SELECT o_orderstatus, o_orderpriority AS mode_priority FROM (
    SELECT o_orderstatus, o_orderpriority,
           row_number() OVER (PARTITION BY o_orderstatus
                              ORDER BY n DESC, o_orderpriority ASC) AS rn
    FROM counts
  ) WHERE rn = 1
),
ranked AS (
  SELECT o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS cnt
  FROM orders
),
pct AS (
  SELECT o_orderstatus,
         CAST(max(cnt) AS BIGINT) AS n_orders,
         max(CASE WHEN rn = CAST(ceil(0.25 * cnt) AS BIGINT)
                  THEN o_totalprice END) AS p25_disc,
         max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT)
                  THEN o_totalprice END) AS p50_disc,
         max(CASE WHEN rn = CAST(ceil(0.75 * cnt) AS BIGINT)
                  THEN o_totalprice END) AS p75_disc
  FROM ranked GROUP BY o_orderstatus
)
SELECT p.o_orderstatus, p.n_orders, m.mode_priority,
       p.p25_disc, p.p50_disc, p.p75_disc
FROM pct p JOIN md m ON p.o_orderstatus = m.o_orderstatus
"""

ORACLES["unpivot_lineitem_metrics"] = """
WITH long AS (
  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT metric, CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
         AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM long GROUP BY metric
"""

ORACLES["assoc_brand_pairs"] = """
WITH tx AS (
  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM tx),
supp AS (
  SELECT item, CAST(count(*) AS BIGINT) AS supp
  FROM tx GROUP BY item HAVING count(*) >= 2
),
pairs AS (
  SELECT t1.item AS item_a, t2.item AS item_b,
         CAST(count(*) AS BIGINT) AS pair_count
  FROM tx t1
  JOIN tx t2 ON t1.basket = t2.basket AND t1.item < t2.item
  WHERE t1.item IN (SELECT item FROM supp)
    AND t2.item IN (SELECT item FROM supp)
  GROUP BY t1.item, t2.item
)
SELECT p.item_a, p.item_b, p.pair_count, sa.supp AS supp_a,
       sb.supp AS supp_b, nb.n_baskets,
       CAST(p.pair_count AS DOUBLE) / CAST(sa.supp AS DOUBLE) AS confidence,
       CAST(p.pair_count * nb.n_baskets AS DOUBLE)
         / CAST(sa.supp * sb.supp AS DOUBLE) AS lift
FROM pairs p
JOIN supp sa ON p.item_a = sa.item
JOIN supp sb ON p.item_b = sb.item
CROSS JOIN nb
ORDER BY p.pair_count DESC, p.item_a, p.item_b
LIMIT 100
"""


ORACLES["ts_daily_interpolate"] = """
WITH obs AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg_obs
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY user_id
),
cal AS (
  SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM spans
),
j AS (
  SELECT c.user_id, c.day, o.n_events, o.avg_obs
  FROM cal c LEFT JOIN obs o ON c.user_id = o.user_id AND c.day = o.day
),
f AS (
  SELECT user_id, day, n_events, avg_obs,
    last_value(avg_obs IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN n_events IS NOT NULL THEN day END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
    first_value(avg_obs IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN n_events IS NOT NULL THEN day END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY day
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM j
)
SELECT user_id, CAST(day AS BIGINT) AS day,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       CASE WHEN n_events IS NOT NULL THEN avg_obs
            ELSE pv + (nv - pv) * (CAST(day - pd AS DOUBLE)
                                   / CAST(nd - pd AS DOUBLE))
       END AS avg_value,
       CAST(CASE WHEN n_events IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS interpolated
FROM f
"""


# BPE merge training: N unrolled iterations, each mirroring the Spark
# driver loop — pair counts over the current vocabulary state, best pair
# by (count DESC, pair ASC), then the double-spaced literal replace.
def _bpe_seq_rewrite(best_cte: str) -> str:
    """The double-spaced literal-replace merge step over ``seq``."""
    return f"""trim(regexp_replace(
    replace(' ' || replace(seq, ' ', '  ') || ' ',
            ' ' || replace((SELECT pair FROM {best_cte}), ' ', '  ') || ' ',
            ' ' || replace((SELECT pair FROM {best_cte}), ' ', '') || ' '),
    ' +', ' ', 'g'))"""


def _bpe_iter_parts(n_merges: int) -> list[str]:
    """The merge-iteration CTE chain over a ``v0(freq, seq)`` state —
    shared by the word-level and byte-level trainers (they differ only
    in how v0's symbol sequences are built)."""
    parts = []
    for i in range(n_merges):
        parts.append(f"""p{i} AS MATERIALIZED (
  SELECT pr AS pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq,
           unnest([sym[j] || ' ' || sym[j + 1]
                   for j in range(1, len(sym))]) AS pr
    FROM (SELECT freq, string_split(seq, ' ') AS sym FROM v{i})
  ) GROUP BY pr
)""")
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT pair, cnt FROM p{i} "
            f"ORDER BY cnt DESC, pair ASC LIMIT 1)"
        )
        parts.append(f"""v{i + 1} AS MATERIALIZED (
  SELECT freq, {_bpe_seq_rewrite(f'b{i}')} AS seq
  FROM v{i}
)""")
    return parts


def _bpe_cte_parts(n_merges: int) -> list[str]:
    # Every CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference,
    # and each iteration references its predecessor ~3 times — without
    # materialization the expansion is 3^N copies of the corpus scan
    # (measured: 8 iterations took 8+ minutes; materialized, seconds).
    parts = [
        "words AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq "
        "FROM ("
        f"SELECT unnest({_tokens('text')}) AS w FROM documents) GROUP BY w)",
        "v0 AS MATERIALIZED (SELECT freq, array_to_string("
        "[w[i] for i in range(1, len(w) + 1)], ' ') || ' </w>' AS seq "
        "FROM words)",
    ]
    parts.extend(_bpe_iter_parts(n_merges))
    return parts


def _bpe_oracle(n_merges: int) -> str:
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS iteration, "
        f"split_part(pair, ' ', 1) AS \"left\", "
        f"split_part(pair, ' ', 2) AS \"right\", "
        f"replace(pair, ' ', '') AS merged, cnt AS pair_count FROM b{i}"
        for i in range(n_merges)
    ]
    return ("WITH " + ",\n".join(_bpe_cte_parts(n_merges)) + "\n"
            + "\nUNION ALL ".join(selects))


def _bpe_encode_oracle(n_merges: int) -> str:
    parts = _bpe_cte_parts(n_merges)
    parts.append(f"""tok AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS w
  FROM (SELECT doc_id, {_tokens('text')} AS toks FROM documents)
)""")
    parts.append(
        "s0 AS MATERIALIZED (SELECT doc_id, pos, array_to_string("
        "[w[i] for i in range(1, len(w) + 1)], ' ') || ' </w>' AS seq "
        "FROM tok)"
    )
    for i in range(n_merges):
        parts.append(f"""s{i + 1} AS MATERIALIZED (
  SELECT doc_id, pos, {_bpe_seq_rewrite(f'b{i}')} AS seq
  FROM s{i}
)""")
    parts.append(f"""agg AS (
  SELECT doc_id, string_agg(seq, ' ' ORDER BY pos) AS pieces
  FROM s{n_merges} GROUP BY doc_id
)""")
    return ("WITH " + ",\n".join(parts) + """
SELECT d.doc_id,
       CAST(CASE WHEN a.pieces IS NULL OR a.pieces = '' THEN 0
                 ELSE len(string_split(a.pieces, ' ')) END AS BIGINT)
         AS n_pieces,
       COALESCE(a.pieces, '') AS pieces
FROM documents d LEFT JOIN agg a USING (doc_id)""")


ORACLES["bpe_train_corpus"] = _bpe_oracle(8)
ORACLES["bpe_encode_docs"] = _bpe_encode_oracle(8)

ORACLES["doc_surprisal_corpus"] = f"""
WITH d AS (SELECT doc_id, {_tokens('text')} AS toks FROM documents),
pairs AS (
  SELECT doc_id, p['w1'] AS w1, p['w2'] AS w2 FROM (
    SELECT doc_id,
           unnest([{{'w1': toks[i], 'w2': toks[i+1]}}
                   for i in range(1, len(toks))]) AS p
    FROM d WHERE len(toks) >= 2
  )
),
lm AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_bigram
  FROM pairs GROUP BY 1, 2
),
ctx AS (
  SELECT w1, CAST(sum(n_bigram) AS BIGINT) AS n_context FROM lm GROUP BY w1
),
scored AS (
  SELECT p.doc_id,
         CAST(length(bin(c.n_context)) AS BIGINT)
           - CAST(length(bin(l.n_bigram)) AS BIGINT) AS b
  FROM pairs p
  JOIN lm l ON p.w1 = l.w1 AND p.w2 = l.w2
  JOIN ctx c ON p.w1 = c.w1
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(b) AS BIGINT) AS total_bits
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(a.total_bits, 0) AS BIGINT) AS total_bits,
       CAST(a.total_bits AS DOUBLE) / CAST(a.n_bigrams AS DOUBLE)
         AS mean_bits
FROM d LEFT JOIN agg a USING (doc_id)
"""

ORACLES["scrub_dup_spans"] = f"""
WITH d AS (SELECT doc_id, {_tokens('text')} AS toks FROM documents),
tok AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS tok
  FROM d
),
gr AS (
  SELECT doc_id, sg['p'] AS p, sg['g'] AS gram
  FROM (
    SELECT doc_id,
           unnest([{{'p': s, 'g': array_to_string(toks[s+1:s+8], ' ')}}
                   for s in range(0, greatest(len(toks) - 8, 0) + 1)]) AS sg
    FROM d WHERE len(toks) > 0
  )
),
dup AS (
  SELECT gram FROM gr GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
cov AS (
  SELECT DISTINCT doc_id, unnest(range(p, p + 8)) AS cpos
  FROM gr WHERE gram IN (SELECT gram FROM dup)
),
j AS (
  SELECT t.doc_id, t.pos, t.tok, c.cpos
  FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.cpos
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(cpos) AS BIGINT) AS n_removed,
         string_agg(CASE WHEN cpos IS NULL THEN tok END, ' ' ORDER BY pos)
           AS clean_text
  FROM j GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_removed, 0) AS BIGINT) AS n_removed,
       COALESCE(a.clean_text, '') AS clean_text
FROM d LEFT JOIN agg a USING (doc_id)
"""


# Privacy audits (operators/privacy.py)

ORACLES["privacy_k_anonymity"] = """
WITH groups AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST(min(n) AS BIGINT) AS k_anonymity,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
       100.0 * CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
         / CAST(sum(n) AS DOUBLE) AS pct_at_risk
FROM groups
"""

# eps-DP noisy counts: the discrete-Laplace threshold table comes from the
# SAME Python builder the Spark expression embeds (operators/privacy.py),
# so the two engines look up identical literals.
from ..operators.privacy import dlap_thresholds as _dlap_thresholds  # noqa: E402

_DP_T = _dlap_thresholds(0.5)
_DP_K = len(_DP_T) // 2
_DP_KEY = (
    "('release-1' || '|' || coalesce(CAST(c_nationkey AS VARCHAR), '<null>')"
    " || '|' || coalesce(c_mktsegment, '<null>'))"
)
ORACLES["privacy_dp_counts"] = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         {O.raw_hash(_DP_KEY)} AS uh
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment,
       greatest(CAST(0 AS BIGINT),
                n + CAST(len([t for t in {_DP_T} if t <= uh]) AS BIGINT)
                  - CAST({_DP_K} AS BIGINT)) AS noisy_count
FROM g
"""

# Samarati minimal generalization: level CTEs + chosen-level CASE built
# from the SAME ladder dict the Spark operator consumes.
from ..operators.privacy import CUSTOMER_QI_LADDER as _QI  # noqa: E402

_QI_COLS = list(_QI)
_QI_LEVELS = max(len(v) for v in _QI.values())


def _qi_rung(col: str, lv: int) -> str:
    exprs = _QI[col]
    return exprs[min(lv, len(exprs) - 1)]


_QI_LEVEL_CTES = ",\n".join(
    f"l{lv} AS (SELECT CAST({lv} AS BIGINT) AS level, "
    f"CAST(min(n) AS BIGINT) AS ms FROM ("
    f"SELECT {', '.join(_qi_rung(c, lv) + f' AS g{i}' for i, c in enumerate(_QI_COLS))}, "
    f"count(*) AS n FROM customer GROUP BY {', '.join(str(i + 1) for i in range(len(_QI_COLS)))}))"
    for lv in range(_QI_LEVELS)
)


def _qi_case(col: str) -> str:
    branches = " ".join(
        f"WHEN ch.lv = {lv} THEN {_qi_rung(col, lv)}"
        for lv in range(_QI_LEVELS - 1)
    )
    return f"CASE {branches} ELSE {_qi_rung(col, _QI_LEVELS - 1)} END AS {col}"


ORACLES["anon_generalize_k"] = f"""
WITH {_QI_LEVEL_CTES},
lvs AS ({' UNION ALL '.join(f'SELECT * FROM l{lv}' for lv in range(_QI_LEVELS))}),
chosen AS (
  SELECT COALESCE(min(CASE WHEN ms >= 5 THEN level END),
                  CAST({_QI_LEVELS - 1} AS BIGINT)) AS lv
  FROM lvs
)
SELECT c_custkey,
       {', '.join(_qi_case(c) for c in _QI_COLS)},
       CAST(ch.lv AS BIGINT) AS gen_level
FROM customer CROSS JOIN chosen ch
"""

ORACLES["privacy_l_diversity"] = """
WITH groups AS (
  SELECT c.c_nationkey, c.c_mktsegment,
         CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS l
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey, c.c_mktsegment
)
SELECT CAST(min(l) AS BIGINT) AS l_diversity,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS homogeneous_groups,
       CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_l
FROM groups
"""

# The round-6 chain composed (defined last — it references the
# normalization and split helpers above): normalize -> canonical dedup
# (min doc id per normalized text, arg_min carries its source) ->
# per-domain cap of 10 in (hash bucket, key) order -> grouped split ->
# per-split summary.
ORACLES["pipeline_web_corpus"] = f"""
WITH norm AS MATERIALIZED (
  SELECT doc_id, source, {_norm_sql('text')} AS text FROM documents
),
canon AS (
  SELECT text, min(doc_id) AS doc_id, arg_min(source, doc_id) AS source
  FROM norm GROUP BY text
),
capped AS (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text,
      row_number() OVER (PARTITION BY source ORDER BY
        ({O.stable_hash("(CAST(doc_id AS VARCHAR) || '_cap')")} % 10000),
        doc_id) AS __rn
    FROM canon)
  WHERE __rn <= 10
),
labeled AS (
  SELECT text,
    CASE WHEN {_GSPLIT_BUCKET} < 8000 THEN 'train'
         WHEN {_GSPLIT_BUCKET} < 9000 THEN 'val'
         ELSE 'test' END AS split,
    source
  FROM capped
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
  CAST(sum(len({_tokens('text')})) AS BIGINT) AS total_tokens
FROM labeled GROUP BY split
"""


# ---------------------------------------------------------------------------
# Selection operators (operators/selection.py): DSIR importance
# resampling and the Naive Bayes seed classifier. All log2 terms are the
# exact integer length(bin(n)) on both sides (the doc_surprisal rule).
# Comprehension variables are j/k — never i, which the inlined md5 hash
# expression binds internally.
# ---------------------------------------------------------------------------

_DSIR_FEATS = (
    "list_concat(toks, [toks[j] || ' ' || toks[j+1] "
    "for j in range(1, len(toks))])"
)
_DSIR_B = 8192  # must match queries.dsir_select_docs num_buckets
_DSIR_SALTED = "(f || '__dsir|')"
_DSIR_BUCKET = f"({_h(_DSIR_SALTED)} % {_DSIR_B})"

ORACLES["dsir_select_docs"] = f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, lang, {_tokens('text')} AS toks FROM documents
),
rfeats AS MATERIALIZED (
  SELECT doc_id, {_DSIR_BUCKET} AS bucket FROM (
    SELECT doc_id, unnest({_DSIR_FEATS}) AS f FROM d)
),
tfeats AS (
  SELECT {_DSIR_BUCKET} AS bucket FROM (
    SELECT unnest({_DSIR_FEATS}) AS f FROM d WHERE lang = 'en')
),
t AS (SELECT bucket, CAST(count(*) AS BIGINT) AS tb FROM tfeats GROUP BY bucket),
r AS (SELECT bucket, CAST(count(*) AS BIGINT) AS rb FROM rfeats GROUP BY bucket),
jn AS (
  SELECT COALESCE(t.bucket, r.bucket) AS bucket,
         COALESCE(t.tb, 0) AS tb, COALESCE(r.rb, 0) AS rb
  FROM t FULL JOIN r ON t.bucket = r.bucket
),
tot AS (
  SELECT CAST(sum(tb) + {_DSIR_B} AS BIGINT) AS tbtot,
         CAST(sum(rb) + {_DSIR_B} AS BIGINT) AS rbtot
  FROM jn
),
w AS (
  SELECT bucket,
         CAST(length(bin(tb + 1)) - length(bin(rb + 1))
              + length(bin(rbtot)) - length(bin(tbtot)) AS BIGINT)
           AS weight_bits
  FROM jn, tot
),
sc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_features,
         CAST(sum(weight_bits) AS BIGINT) AS score_bits
  FROM rfeats JOIN w USING (bucket) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(sc.n_features, 0) AS BIGINT) AS n_features,
       CAST(COALESCE(sc.score_bits, 0) AS BIGINT) AS score_bits
FROM d LEFT JOIN sc USING (doc_id)
ORDER BY score_bits DESC, d.doc_id
LIMIT 60
"""

_NB_SALTED = "(CAST(doc_id AS VARCHAR) || '__nbsplit|')"
_NB_BUCKET = f"({O.stable_hash(_NB_SALTED)} % 4)"

ORACLES["quality_nb_classifier"] = f"""
WITH d AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 'target' ELSE 'other' END AS cls_label,
         {_tokens('text')} AS toks, {_NB_BUCKET} AS bkt
  FROM documents
),
trn AS (SELECT * FROM d WHERE bkt <> 0),
tst AS (SELECT * FROM d WHERE bkt = 0),
ttok AS MATERIALIZED (SELECT cls_label AS cls, unnest(toks) AS w FROM trn),
counts AS (
  SELECT cls, w, CAST(count(*) AS BIGINT) AS n_wc FROM ttok GROUP BY 1, 2
),
vocab AS MATERIALIZED (SELECT DISTINCT w FROM ttok),
scal AS (
  SELECT (SELECT CAST(count(DISTINCT w) AS BIGINT) FROM ttok) AS v,
         (SELECT CAST(count(*) AS BIGINT) FROM trn) AS n
),
cstat AS MATERIALIZED (
  SELECT tc.cls,
         CAST(length(bin(s.n)) - length(bin(dc.ndc)) AS BIGINT)
           AS prior_bits,
         CAST(tc.tc + s.v AS BIGINT) AS tcv
  FROM (SELECT cls, CAST(count(*) AS BIGINT) AS tc FROM ttok GROUP BY cls) tc
  JOIN (SELECT cls_label AS cls, CAST(count(*) AS BIGINT) AS ndc
        FROM trn GROUP BY 1) dc USING (cls),
       scal s
),
dense AS (
  SELECT v.w, c.cls,
         CAST(length(bin(c.tcv))
              - length(bin(COALESCE(k.n_wc, 0) + 1)) AS BIGINT) AS cost_bits
  FROM vocab v CROSS JOIN cstat c
  LEFT JOIN counts k ON k.cls = c.cls AND k.w = v.w
),
stok AS MATERIALIZED (SELECT doc_id, unnest(toks) AS w FROM tst),
matched AS (
  SELECT s.doc_id, de.cls, CAST(sum(de.cost_bits) AS BIGINT) AS m_bits
  FROM stok s JOIN dense de USING (w) GROUP BY 1, 2
),
oov AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_oov
  FROM stok WHERE w NOT IN (SELECT w FROM vocab) GROUP BY doc_id
),
tot AS (
  SELECT b.doc_id, b.cls_label, c.cls,
         CAST(c.prior_bits + COALESCE(m.m_bits, 0)
              + COALESCE(o.n_oov, 0) * length(bin(c.tcv)) AS BIGINT)
           AS total_bits
  FROM (SELECT doc_id, cls_label FROM tst) b
  CROSS JOIN cstat c
  LEFT JOIN matched m ON m.doc_id = b.doc_id AND m.cls = c.cls
  LEFT JOIN oov o ON o.doc_id = b.doc_id
)
SELECT doc_id, cls_label, cls AS pred_cls_label, total_bits,
       (cls = cls_label) AS is_correct
FROM tot
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY total_bits, cls) = 1
"""


def _rp_oracle(in_dim: int, out_dim: int) -> str:
    from ..operators.similarity import rp_signs

    signs = rp_signs(in_dim, out_dim)

    def term(idx: int) -> str:
        return (f"CAST(floor(CAST(embedding[{idx + 1}] AS DOUBLE)"
                f" * 16777216.0) AS BIGINT)")

    cols = []
    for j in range(out_dim):
        expr = "0 " + " ".join(
            ("+ " if s > 0 else "- ") + term(k)
            for k, s in enumerate(signs[j])
        )
        cols.append(f"CAST({expr} AS BIGINT) AS p{j:02d}")
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


ORACLES["embedding_random_projection"] = _rp_oracle(EMBEDDING_DIM, 16)

ORACLES["corpus_epoch_shuffle"] = f"""
WITH k AS (
  SELECT doc_id,
         {O.stable_hash("(CAST(doc_id AS VARCHAR) || '__epoch1|')")} AS h
  FROM documents
),
r AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT)
           AS epoch_pos
  FROM k
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
SELECT doc_id, epoch_pos,
       CAST((epoch_pos * 4) // n.n AS BIGINT) AS shard
FROM r, n
"""


# ---------------------------------------------------------------------------
# PMI collocations, Flesch readability, MMR rerank (round 6 batch 2).
# ---------------------------------------------------------------------------

ORACLES["pmi_collocations"] = f"""
WITH d AS MATERIALIZED (SELECT {_tokens('text')} AS toks FROM documents),
prs AS MATERIALIZED (
  SELECT p['w1'] AS w1, p['w2'] AS w2 FROM (
    SELECT unnest([{{'w1': toks[j], 'w2': toks[j+1]}}
                   for j in range(1, len(toks))]) AS p
    FROM d WHERE len(toks) >= 2
  )
),
bi AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
  FROM prs GROUP BY 1, 2 HAVING count(*) >= 5
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM (
    SELECT unnest(toks) AS w FROM d) GROUP BY w
),
tot AS (
  SELECT (SELECT CAST(sum(n_w) AS BIGINT) FROM uni) AS nu,
         (SELECT CAST(count(*) AS BIGINT) FROM prs) AS nb
)
SELECT b.w1, b.w2, b.n_pair,
       CAST(length(bin(b.n_pair)) + 2 * length(bin(t.nu))
            - length(bin(t.nb)) - length(bin(ua.n_w))
            - length(bin(ub.n_w)) AS BIGINT) AS pmi_bits
FROM bi b
JOIN uni ua ON ua.w = b.w1
JOIN uni ub ON ub.w = b.w2,
     tot t
ORDER BY pmi_bits DESC, b.n_pair DESC, b.w1, b.w2
LIMIT 50
"""

ORACLES["readability_docs"] = f"""
WITH d AS (
  SELECT doc_id, text, {_tokens('text')} AS toks FROM documents
),
c AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(greatest(len(list_filter(
             regexp_split_to_array(text, '[.!?]+'),
             s -> trim(s) <> '')), 1) AS BIGINT) AS n_sentences,
         CAST(COALESCE(list_sum(
             [len(regexp_extract_all(w, '[aeiouy]+')) for w in toks]),
             0) AS BIGINT) AS n_syllables
  FROM d
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0 THEN
         CAST(206.835 AS DOUBLE)
         - CAST(1.015 AS DOUBLE)
           * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         - CAST(84.6 AS DOUBLE)
           * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
       END AS flesch
FROM c
"""


def _mmr_oracle(n_candidates: int, select_k: int, lam: int) -> str:
    inv = 10 - lam
    quant = ("[CAST(floor(CAST(embedding[j] AS DOUBLE) * 16777216.0)"
             f" AS BIGINT) for j in range(1, {EMBEDDING_DIM + 1})]")
    dot_ab = (f"CAST(list_sum([a.v[j] * b.v[j] "
              f"for j in range(1, {EMBEDDING_DIM + 1})]) AS BIGINT)")
    rel = (f"CAST(list_sum([v[j] * q.qv[j] "
           f"for j in range(1, {EMBEDDING_DIM + 1})]) AS BIGINT)")
    parts = [
        f"q AS (SELECT {quant} AS qv FROM embeddings WHERE vec_id = 0)",
        f"""cand AS MATERIALIZED (
  SELECT vec_id, v, {rel} AS rel FROM (
    SELECT vec_id, {quant} AS v FROM embeddings WHERE vec_id <> 0), q
  ORDER BY rel DESC, vec_id LIMIT {n_candidates}
)""",
        f"""pairs AS MATERIALIZED (
  SELECT a.vec_id AS ida, b.vec_id AS idb, {dot_ab} AS dot
  FROM cand a, cand b WHERE a.vec_id <> b.vec_id
)""",
        f"""s1 AS MATERIALIZED (
  SELECT vec_id, rel, CAST({lam} * rel AS BIGINT) AS mmr
  FROM cand ORDER BY rel DESC, vec_id LIMIT 1
)""",
        "sel1 AS (SELECT vec_id FROM s1)",
    ]
    for step in range(2, select_k + 1):
        parts.append(f"""s{step} AS MATERIALIZED (
  SELECT c.vec_id, c.rel, CAST({lam} * c.rel - {inv} * m.mx AS BIGINT) AS mmr
  FROM cand c JOIN (
    SELECT p.ida AS vec_id, max(p.dot) AS mx
    FROM pairs p JOIN sel{step - 1} s ON p.idb = s.vec_id GROUP BY 1) m
    USING (vec_id)
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{step - 1})
  ORDER BY mmr DESC, c.vec_id LIMIT 1
)""")
        parts.append(
            f"sel{step} AS (SELECT vec_id FROM sel{step - 1} "
            f"UNION ALL SELECT vec_id FROM s{step})"
        )
    selects = [
        f"SELECT CAST({step} AS BIGINT) AS rank, vec_id, rel AS rel_fp, "
        f"mmr AS mmr_fp FROM s{step}"
        for step in range(1, select_k + 1)
    ]
    return ("WITH " + ",\n".join(parts) + "\n"
            + "\nUNION ALL ".join(selects))


ORACLES["retrieval_mmr"] = _mmr_oracle(20, 8, 7)


# ---------------------------------------------------------------------------
# Round-6 batch 3: corpus version diff, indexed BM25, IVF cell stats.
# ---------------------------------------------------------------------------

ORACLES["corpus_diff_versions"] = f"""
WITH oldv AS (
  SELECT doc_id, {O.stable_hash('text')} AS h FROM documents
),
newsrc AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 1 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE doc_id % 10 = 2
),
newv AS (SELECT doc_id, {O.stable_hash('text')} AS h FROM newsrc),
j AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         o.h AS old_hash, n.h AS new_hash
  FROM oldv o FULL JOIN newv n ON o.doc_id = n.doc_id
)
SELECT doc_id,
       CASE WHEN old_hash IS NULL THEN 'added'
            WHEN new_hash IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       CAST(old_hash AS BIGINT) AS old_hash,
       CAST(new_hash AS BIGINT) AS new_hash
FROM j
WHERE old_hash IS NULL OR new_hash IS NULL OR old_hash <> new_hash
"""


def _bm25_oracle(terms: list[str], k: int) -> str:
    term_list = ", ".join("'" + t + "'" for t in terms)
    toks = _tokens('text')
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
corpus AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(count(*) AS BIGINT) FROM toks) AS total_len
),
hits AS (
  SELECT tf.doc_id,
         CAST(floor(
           (CAST(22 * tf.tf * c.total_len AS DOUBLE)
            / CAST(10 * tf.tf * c.total_len + 3 * c.total_len
                   + 9 * dl.dl * c.n_docs AS DOUBLE))
           * (CAST(2 * c.n_docs - 2 * df.df + 1 AS DOUBLE)
              / CAST(2 * df.df + 1 AS DOUBLE))
           * 1048576.0
         ) AS BIGINT) AS fp
  FROM tf
  JOIN dfreq df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN corpus c
  WHERE tf.term IN ({term_list})
),
scored AS (
  SELECT doc_id, CAST(sum(fp) AS BIGINT) AS score_fp,
         CAST(count(*) AS BIGINT) AS n_terms_hit
  FROM hits GROUP BY doc_id
)
SELECT doc_id, score_fp,
       CAST(score_fp AS DOUBLE) / 1048576.0 AS score,
       n_terms_hit,
       CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id) AS BIGINT)
         AS rank
FROM scored
ORDER BY score_fp DESC, doc_id
LIMIT {k}
"""


ORACLES["bm25_indexed"] = _bm25_oracle(["merge", "stream", "vector"], 40)

ORACLES["ivf_cell_stats"] = f"""
WITH cent AS (
  SELECT embedding AS cv,
         row_number() OVER (ORDER BY vec_id ASC) - 1 AS cell_idx
  FROM embeddings ORDER BY vec_id ASC LIMIT 8
),
corpus_scored AS (
  SELECT e.vec_id, c.cell_idx,
         {_XC_DOT.replace('xv', 'e.embedding').replace('cv', 'c.cv')}
           / ({_XNORM.replace('xv', 'e.embedding')} * {_CNORM.replace('cv', 'c.cv')}) AS cc
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, cell_idx,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cc DESC, cell_idx ASC) AS rn
  FROM corpus_scored
),
occ AS (
  SELECT cell_idx, CAST(count(*) AS BIGINT) AS n_vecs
  FROM assigned WHERE rn = 1 GROUP BY cell_idx
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
cells AS (SELECT unnest(range(0, 8)) AS cell_idx)
SELECT CAST(c.cell_idx AS BIGINT) AS cell,
       CAST(COALESCE(o.n_vecs, 0) AS BIGINT) AS n_vecs,
       CAST(COALESCE(o.n_vecs, 0) * 8 AS DOUBLE) / CAST(t.n AS DOUBLE)
         AS load_factor
FROM cells c LEFT JOIN occ o USING (cell_idx), tot t
"""

_RM_CANON = ("concat_ws('|', coalesce(CAST(doc_id AS VARCHAR), chr(0)), "
             "coalesce(text, chr(0)))")

ORACLES["release_manifest_versions"] = f"""
WITH newsrc AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 1 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE doc_id % 10 = 2
),
oldv AS (SELECT doc_id, {O.stable_hash('text')} AS h FROM documents),
newv AS (SELECT doc_id, {O.stable_hash('text')} AS h FROM newsrc),
j AS (
  SELECT o.h AS oh, n.h AS nh
  FROM oldv o FULL JOIN newv n ON o.doc_id = n.doc_id
  WHERE o.h IS NULL OR n.h IS NULL OR o.h <> n.h
),
brk AS (
  SELECT CAST(COALESCE(sum(CASE WHEN oh IS NULL THEN 1 END), 0) AS BIGINT)
           AS n_added,
         CAST(COALESCE(sum(CASE WHEN nh IS NULL THEN 1 END), 0) AS BIGINT)
           AS n_removed,
         CAST(COALESCE(sum(CASE WHEN oh IS NOT NULL AND nh IS NOT NULL
                                THEN 1 END), 0) AS BIGINT) AS n_changed
  FROM j
),
oc AS (
  SELECT CAST(count(*) AS BIGINT) AS n_old,
         CAST(COALESCE(sum(CAST({O.stable_hash(_RM_CANON)} AS HUGEINT)), 0)
              % 2305843009213693952 AS BIGINT) AS old_checksum
  FROM documents
),
nc AS (
  SELECT CAST(count(*) AS BIGINT) AS n_new,
         CAST(COALESCE(sum(CAST({O.stable_hash(_RM_CANON)} AS HUGEINT)), 0)
              % 2305843009213693952 AS BIGINT) AS new_checksum
  FROM newsrc
)
SELECT oc.n_old, nc.n_new, brk.n_added, brk.n_removed, brk.n_changed,
       CAST(oc.n_old - brk.n_removed - brk.n_changed AS BIGINT)
         AS n_unchanged,
       oc.old_checksum, nc.new_checksum
FROM oc, nc, brk
"""


def _bpe_fertility_oracle(n_merges: int) -> str:
    parts = _bpe_cte_parts(n_merges)
    parts.append(f"""tok AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS w
  FROM (SELECT doc_id, {_tokens('text')} AS toks FROM documents)
)""")
    parts.append(
        "s0 AS MATERIALIZED (SELECT doc_id, pos, array_to_string("
        "[w[i] for i in range(1, len(w) + 1)], ' ') || ' </w>' AS seq "
        "FROM tok)"
    )
    for i in range(n_merges):
        parts.append(f"""s{i + 1} AS MATERIALIZED (
  SELECT doc_id, pos, {_bpe_seq_rewrite(f'b{i}')} AS seq
  FROM s{i}
)""")
    parts.append(f"""perdoc AS (
  SELECT doc_id,
         CAST(sum(len(string_split(seq, ' '))) AS BIGINT) AS n_pieces,
         CAST(count(*) AS BIGINT) AS n_words
  FROM s{n_merges} GROUP BY doc_id
)""")
    return ("WITH " + ",\n".join(parts) + """
, agg AS (
  SELECT d.lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(sum(p.n_words), 0) AS BIGINT) AS total_words,
         CAST(COALESCE(sum(p.n_pieces), 0) AS BIGINT) AS total_pieces,
         CAST(sum(length(d.text)) AS BIGINT) AS total_chars
  FROM documents d LEFT JOIN perdoc p USING (doc_id)
  GROUP BY d.lang
)
SELECT lang, n_docs, total_words, total_pieces, total_chars,
       CASE WHEN total_words > 0 THEN
         CAST(total_pieces AS DOUBLE) / CAST(total_words AS DOUBLE)
       END AS pieces_per_word,
       CASE WHEN total_pieces > 0 THEN
         CAST(total_chars AS DOUBLE) / CAST(total_pieces AS DOUBLE)
       END AS chars_per_piece
FROM agg""")


ORACLES["bpe_fertility_langs"] = _bpe_fertility_oracle(8)

# Composition oracle: the per-language scorecard embeds the gopher,
# readability, and surprisal oracles whole as CTE bodies (DuckDB accepts
# WITH inside a CTE) and rolls them up — integer sums, single divisions.
ORACLES["corpus_scorecard_langs"] = f"""
WITH gf AS ({ORACLES['quality_gopher_flags']}),
rd AS ({ORACLES['readability_docs']}),
sp AS ({ORACLES['doc_surprisal_corpus']}),
agg AS (
  SELECT d.lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN gf.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         CAST(sum(gf.n_words) AS BIGINT) AS total_words,
         CAST(sum(rd.n_syllables) AS BIGINT) AS total_syllables,
         CAST(sum(sp.n_bigrams) AS BIGINT) AS total_bigrams,
         CAST(sum(sp.total_bits) AS BIGINT) AS total_bits
  FROM documents d
  JOIN gf USING (doc_id) JOIN rd USING (doc_id) JOIN sp USING (doc_id)
  GROUP BY d.lang
)
SELECT lang, n_docs, n_keep, total_words, total_syllables, total_bigrams,
       total_bits,
       CAST(n_keep AS DOUBLE) / CAST(n_docs AS DOUBLE) AS keep_rate,
       CASE WHEN total_words > 0 THEN
         CAST(total_syllables AS DOUBLE) / CAST(total_words AS DOUBLE)
       END AS syllables_per_word,
       CASE WHEN total_bigrams > 0 THEN
         CAST(total_bits AS DOUBLE) / CAST(total_bigrams AS DOUBLE)
       END AS bits_per_bigram
FROM agg
"""


def _minhash_recall_oracle(mod: int, thresholds: tuple) -> str:
    """Sampled-slice mirror of the dedup_minhash_lsh pipeline plus the
    exact all-pairs truth set, rolled up per threshold (the empirical
    S-curve rows)."""
    lo = min(thresholds)
    jacc_ab = ("CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)"
               " / CAST(len(sa.sh) + len(sb.sh)"
               " - len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)")
    jacc_tt = ("CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)"
               " / CAST(len(a.sh) + len(b.sh)"
               " - len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)")
    f_cols = ", ".join(
        f"CAST(COALESCE(sum(CASE WHEN j >= {t} THEN 1 END), 0) AS BIGINT) AS f{k}"
        for k, t in enumerate(thresholds))
    t_cols = ", ".join(
        f"CAST(COALESCE(sum(CASE WHEN j >= {t} THEN 1 END), 0) AS BIGINT) AS t{k}"
        for k, t in enumerate(thresholds))
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({t} AS DOUBLE) AS threshold, t.t{k} AS n_truth, "
        f"f.f{k} AS n_found, CAST(t.t{k} - f.f{k} AS BIGINT) AS n_missed, "
        f"CASE WHEN t.t{k} > 0 THEN CAST(f.f{k} AS DOUBLE) / CAST(t.t{k} AS DOUBLE) END AS recall "
        f"FROM truth t, found f"
        for k, t in enumerate(thresholds))
    return f"""
WITH subs AS MATERIALIZED (
  SELECT doc_id, text FROM documents WHERE doc_id % {mod} = 0
),
sh AS MATERIALIZED (
  SELECT doc_id, {_shingles('text')} AS sh FROM subs
),
hs AS (
  SELECT doc_id, sh, [{_h('s')} for s in sh] AS hashes FROM sh
),
sig AS (
  SELECT doc_id, sh, {_minhash_sig('hashes', 16)} AS sig FROM hs
),
bands AS ({_band_selects(4, 4)}),
sizes AS (
  SELECT band, key, count(DISTINCT doc_id) AS n FROM bands GROUP BY band, key
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  JOIN sizes s ON s.band = a.band AND s.key = a.key AND s.n <= 500
),
found AS (
  SELECT {f_cols} FROM (
    SELECT {jacc_ab} AS j FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
  ) WHERE j >= {lo}
),
truth AS (
  SELECT {t_cols} FROM (
    SELECT {jacc_tt} AS j FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  ) WHERE j >= {lo}
)
{rows}
"""


ORACLES["dedup_minhash_recall"] = _minhash_recall_oracle(4, (0.3, 0.7, 0.9))


# Closed form of synthetic_mjpeg_frames' synthesis: the Spark side muxes
# real JPEG frames into a Motion-JPEG AVI and decodes them back through
# the RIFF demuxer + baseline JPEG codec, so value equality here is
# muxer+demuxer+codec conformance in one hash. Flat 8x8 blocks at
# quality 100 decode exactly (the pinned flat-block property):
# pixel_sum = 64 * level, level = (doc_id + 37 * frame_idx) % 256.
ORACLES["multimodal_video_frames"] = """
SELECT doc_id,
  CAST(f AS BIGINT) AS frame_idx,
  CAST(8 AS INTEGER) AS width,
  CAST(8 AS INTEGER) AS height,
  CAST(64 * ((doc_id + 37 * f) % 256) AS BIGINT) AS pixel_sum
FROM (
  SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS f
  FROM documents WHERE doc_id % 10 = 0
)
"""


# avro_roundtrip_docs: the Spark side writes documents to real Avro
# container files and reads them back through the from-scratch decoder,
# so the oracle is the SOURCE TABLE itself — any drift anywhere in the
# varint/deflate/sync pipeline breaks the value hash.
ORACLES["avro_roundtrip_docs"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


# warc_roundtrip_docs: same gate shape as avro_roundtrip_docs — the
# Spark side writes documents as per-record-gzipped WARC resource
# records and reconstructs the columns from payload + extension header
# fields on read, so the SOURCE TABLE is the oracle and any drift in
# the record framing / gzip member layout breaks the value hash.
ORACLES["warc_roundtrip_docs"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


# html_extract_docs: both engines wrap the fixture rows in the SAME
# page skeleton (textprep.HTML_DEMO_SEGMENTS, one source of truth) and
# run the SAME strip chain (textprep.HTML_STRIP_STEPS via
# extract_html_text_sql) — script/style/comment dropping, block-closer
# newlines, single-pass entity decode, title capture, link census.
from ..operators.textprep import (  # noqa: E402
    HTML_DEMO_SEGMENTS as _HTML_SEG,
    HTML_LINK_PATTERN as _HTML_LINK_PAT,
    HTML_TITLE_PATTERN as _HTML_TITLE_PAT,
    extract_html_text_sql as _html_sql,
)


def _sq(s: str) -> str:
    """Escape a literal for a DuckDB single-quoted string."""
    return s.replace("'", "''")


_HTML_EXPR = (
    f"'{_sq(_HTML_SEG[0])}' || CAST(doc_id AS VARCHAR) || "
    f"'{_sq(_HTML_SEG[1])}' || lang || "
    f"'{_sq(_HTML_SEG[2])}' || text || "
    f"'{_sq(_HTML_SEG[3])}' || source || "
    f"'{_sq(_HTML_SEG[4])}' || CAST(doc_id AS VARCHAR) || "
    f"'{_sq(_HTML_SEG[5])}'"
)

ORACLES["html_extract_docs"] = f"""
WITH h AS (SELECT doc_id, {_HTML_EXPR} AS html FROM documents)
SELECT doc_id,
  regexp_extract(html, '{_HTML_TITLE_PAT}', 1) AS title,
  {_html_sql('html')} AS text,
  CAST(len(regexp_extract_all(html, '{_HTML_LINK_PAT}')) AS BIGINT)
    AS n_links
FROM h
"""


# url_parse_docs / url_domain_stats: both engines synthesize the SAME
# three URL shapes from URL_DEMO_SEGMENTS (one source of truth) and
# mirror the urls.py parse/canonicalize semantics — RFC 3986 Appendix B
# groups, lowercased scheme/host, default-port + fragment drop,
# tracking-param removal, sorted query keys, PSL-head registered
# domain. Patterns bind to variables first (f-string backslash rule).
from ..operators.urls import (  # noqa: E402
    SECOND_LEVEL_SUFFIXES as _PSL2,
    TRACKING_PARAM_PATTERN as _TRACK_PAT,
    URI_PATTERN as _URI_PAT,
    URL_DEMO_SEGMENTS as _URL_SEG,
)

_URL_EXPR = "CASE CAST(doc_id % 3 AS INTEGER) " + " ".join(
    f"WHEN {k} THEN '{a}' || source || '{b}' || "
    f"CAST(doc_id AS VARCHAR) || '{c}'"
    for k, (a, b, c) in _URL_SEG.items()
) + " END"

_U_AUTH = f"string_split(regexp_extract(url, '{_URI_PAT}', 4), '@')[-1]"
_U_SCHEME = f"lower(regexp_extract(url, '{_URI_PAT}', 2))"
_U_HOST = f"lower(string_split({_U_AUTH}, ':')[1])"
_PORT_TAIL_PAT = r":(\d+)$"
_U_PORT_S = f"regexp_extract({_U_AUTH}, '{_PORT_TAIL_PAT}', 1)"
_U_PORT = f"(CASE WHEN {_U_PORT_S} = '' THEN NULL ELSE CAST({_U_PORT_S} AS BIGINT) END)"
_U_PATH = f"regexp_extract(url, '{_URI_PAT}', 5)"
_U_QUERY = f"regexp_extract(url, '{_URI_PAT}', 7)"

_LAST2_PAT = r"([^.]+\.[^.]+)$"
_LAST3_PAT = r"([^.]+\.[^.]+\.[^.]+)$"
_PSL2_IN = ", ".join(f"'{s}'" for s in _PSL2)


def _u_domain(host: str) -> str:
    return (
        f"(CASE WHEN len(string_split({host}, '.')) <= 2 THEN {host} "
        f"WHEN len(string_split({host}, '.')) >= 3 AND "
        f"regexp_extract({host}, '{_LAST2_PAT}', 1) IN ({_PSL2_IN}) "
        f"THEN regexp_extract({host}, '{_LAST3_PAT}', 1) "
        f"ELSE regexp_extract({host}, '{_LAST2_PAT}', 1) END)"
    )


_U_DEPTH = (f"CAST(len(list_filter(string_split({_U_PATH}, '/'), "
            f"p -> p <> '')) AS BIGINT)")
_U_PARAMS = (f"list_sort(list_filter(string_split({_U_QUERY}, '&'), "
             f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACK_PAT}')))")
_U_QSORT = f"array_to_string({_U_PARAMS}, '&')"
_U_KEEP_PORT = (
    f"({_U_PORT} IS NOT NULL AND NOT (({_U_SCHEME} = 'http' AND {_U_PORT} = 80) "
    f"OR ({_U_SCHEME} = 'https' AND {_U_PORT} = 443)))"
)
_U_CANON = (
    f"{_U_SCHEME} || '://' || {_U_HOST} || "
    f"(CASE WHEN {_U_KEEP_PORT} THEN ':' || CAST({_U_PORT} AS VARCHAR) ELSE '' END) || "
    f"(CASE WHEN {_U_PATH} = '' THEN '/' ELSE {_U_PATH} END) || "
    f"(CASE WHEN {_U_QSORT} <> '' THEN '?' || {_U_QSORT} ELSE '' END)"
)

ORACLES["url_parse_docs"] = f"""
WITH u AS (SELECT doc_id, {_URL_EXPR} AS url FROM documents)
SELECT doc_id, {_U_SCHEME} AS scheme, {_U_HOST} AS host,
  {_u_domain(_U_HOST)} AS domain, {_U_PATH} AS path,
  {_U_DEPTH} AS path_depth, {_U_CANON} AS url_canonical
FROM u
"""

ORACLES["url_domain_stats"] = f"""
WITH u AS (SELECT doc_id, {_URL_EXPR} AS url FROM documents),
p AS (
  SELECT {_u_domain(_U_HOST)} AS domain, {_U_HOST} AS host,
    {_U_SCHEME} AS scheme, {_U_CANON} AS canon, {_U_DEPTH} AS depth
  FROM u
)
SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
  CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
  CAST(sum(CASE WHEN scheme = 'https' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_https,
  CAST(sum(depth) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_path_depth
FROM p GROUP BY domain
"""


# anon_fpe_orders: the FF1-shaped Feistel unrolled round-by-round as
# MATERIALIZED CTEs (the BPE-chain lesson: plain CTEs inline per
# reference and an iteration chain explodes exponentially). The PRF is
# the md5 12-hex-digit prefix decoded digit-by-digit (the raw_hash
# pattern, distinct loop variable per the comprehension gotcha); u=v=6
# for the synthesized 12-digit PANs, modulus 10^6 every round, and
# DuckDB's signed % is normalized to pmod.
def _fpe_prf_sql(half: str, rnd: int) -> str:
    msg = f"('fpe-demo:12:{rnd}:' || {half})"
    return (
        "CAST(list_sum([(strpos('0123456789abcdef', substr(md5("
        + msg
        + "), j, 1)) - 1) * (16.0 ** (12 - j)) for j in range(1, 13)]) "
        "AS BIGINT)"
    )


def _fpe_oracle_sql(rounds: int = 8) -> str:
    mod = 10 ** 6
    ctes = [
        "src AS MATERIALIZED (SELECT o_orderkey, "
        "lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS card FROM orders)",
        "e AS MATERIALIZED (SELECT o_orderkey, card, "
        "substr(card, 1, 6) AS a, substr(card, 7, 6) AS b FROM src)",
    ]
    prev = "e"
    for i in range(rounds):
        prf = _fpe_prf_sql("b", i)
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT o_orderkey, card, b AS a, "
            f"lpad(CAST(((CAST(a AS BIGINT) + {prf}) % {mod} + {mod}) "
            f"% {mod} AS VARCHAR), 6, '0') AS b FROM {prev})"
        )
        prev = f"e{i}"
    ctes.append(
        f"enc AS MATERIALIZED (SELECT o_orderkey, card, a || b AS enc, "
        f"substr(a || b, 1, 6) AS a, substr(a || b, 7, 6) AS b FROM {prev})"
    )
    prev = "enc"
    for i in range(rounds - 1, -1, -1):
        prf = _fpe_prf_sql("a", i)
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT o_orderkey, card, enc, "
            f"lpad(CAST(((CAST(b AS BIGINT) - {prf}) % {mod} + {mod}) "
            f"% {mod} AS VARCHAR), 6, '0') AS a, a AS b FROM {prev})"
        )
        prev = f"d{i}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT o_orderkey, card, enc, a || b AS dec FROM {prev}"
    )


ORACLES["anon_fpe_orders"] = _fpe_oracle_sql()


# unigram_train_corpus / unigram_encode_docs: the SentencePiece-unigram
# trainer mirrored end-to-end — seed substring counts, integer-bit
# costs, and each hard-EM iteration's Viterbi pass as a RECURSIVE CTE
# whose accumulator is the growing DP list of (cost, n_pieces, seg)
# structs, with list_sort(...)[1] as the deterministic argmin (struct
# comparison is lexicographic in both engines). Iteration CTEs are
# MATERIALIZED (the BPE 3^N inlining lesson); the OOV constants are
# shared with textprep (_UNI_OOV_EXTRA / _UNI_FORBIDDEN).
from ..operators.textprep import (  # noqa: E402
    _UNI_FORBIDDEN as _UNI_FORBID,
    _UNI_OOV_EXTRA as _UNI_OOV,
)


def _uni_dp_ctes(tag: str, src: str, carry: list[str], cost_cte: str,
                 big_cte: str, max_piece_len: int) -> list[str]:
    """Recursive Viterbi DP over ``src`` (columns: *carry, word[, freq])
    -> CTEs ``dp{tag}`` and ``seg{tag}`` (carry + word + seg).

    The <= max_piece_len candidates unroll as plain CASE expressions
    (DuckDB forbids subqueries inside lambdas), and the per-candidate
    cost lookups are LEFT JOINs against the cost table — NOT correlated
    scalar subqueries, which proved racy inside multithreaded recursive
    CTE execution (one run in ~10 flipped a segmentation; joins are
    stable). An out-of-range start yields a sentinel struct that always
    loses."""
    cols = ", ".join([*carry, "word"])
    joins, cands = [], []
    for d in range(max_piece_len):
        st = f"(i + 1 - {d})"
        plen = d + 1
        joins.append(
            f"LEFT JOIN {cost_cte} jc{plen} "
            f"ON jc{plen}.piece = substr(word, {st}, {plen})"
        )
        fallback = (f"ob.big" if plen == 1
                    else f"CAST({_UNI_FORBID} AS BIGINT)")
        cands.append(
            f"CASE WHEN {st} >= 1 THEN "
            f"{{'c': best[{st}]['c'] + coalesce(jc{plen}.cost, {fallback}), "
            f"'np': best[{st}]['np'] + 1, "
            f"'s': best[{st}]['s'] || ' ' || substr(word, {st}, {plen})}} "
            f"ELSE {{'c': CAST({1 << 55} AS BIGINT), 'np': 0, 's': ''}} END"
        )
    cand_list = "list_value(" + ", ".join(cands) + ")"
    join_sql = "\n  ".join(joins)
    return [
        f"""dp{tag} AS (
  SELECT {cols}, 0 AS i,
         [{{'c': CAST(0 AS BIGINT), 'np': 0, 's': ''}}] AS best
  FROM {src}
  UNION ALL
  SELECT {cols}, i + 1,
    list_append(best, list_sort({cand_list})[1])
  FROM dp{tag}
  CROSS JOIN {big_cte} ob
  {join_sql}
  WHERE i < len(word)
)""",
        f"""seg{tag} AS MATERIALIZED (
  SELECT {cols}, ltrim(best[len(word) + 1]['s']) AS seg
  FROM dp{tag} WHERE i = len(word)
)""",
    ]


def _unigram_ctes(n_multi: int, n_iters: int, max_piece_len: int) -> tuple[list[str], str, str]:
    """-> (CTE list, final vocab cte, final cost cte)."""
    L = max_piece_len
    parts = [
        f"""uw AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest({_tokens('text')}) AS word FROM documents
  ) GROUP BY word
)""",
        f"""ucand AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(flatten(
      [[substr(word, st, c) for c in
        generate_series(1, least({L}, len(word) - st + 1))]
       for st in generate_series(1, len(word))])) AS piece
    FROM uw
  ) GROUP BY piece
)""",
        f"""uv0 AS MATERIALIZED (
  SELECT piece, cnt FROM ucand WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM ucand WHERE length(piece) > 1
    ORDER BY cnt DESC, piece ASC LIMIT {n_multi})
)""",
    ]

    def score_ctes(k: int, vocab: str) -> None:
        parts.append(f"utot{k} AS MATERIALIZED (SELECT CAST(sum(cnt) AS "
                     f"BIGINT) AS t FROM {vocab})")
        parts.append(
            f"uc{k} AS MATERIALIZED (SELECT piece, CAST(CASE WHEN cnt >= 1 "
            f"THEN length(bin(t)) - length(bin(cnt)) ELSE length(bin(t)) "
            f"END AS BIGINT) AS cost FROM {vocab}, utot{k})"
        )
        parts.append(f"ub{k} AS MATERIALIZED (SELECT CAST(length(bin(t)) + "
                     f"{_UNI_OOV} AS BIGINT) AS big FROM utot{k})")

    score_ctes(0, "uv0")
    for k in range(1, n_iters + 1):
        parts.extend(_uni_dp_ctes(f"w{k}", "uw", ["freq"],
                                  f"uc{k - 1}", f"ub{k - 1}", L))
        parts.append(
            f"""ucnt{k} AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(string_split(seg, ' ')) AS piece FROM segw{k}
  ) GROUP BY piece
)"""
        )
        parts.append(
            f"""uv{k} AS MATERIALIZED (
  SELECT s.piece, coalesce(c.cnt, CAST(0 AS BIGINT)) AS cnt
  FROM (SELECT piece FROM uv0 WHERE length(piece) = 1) s
  LEFT JOIN ucnt{k} c ON s.piece = c.piece
  UNION ALL
  SELECT piece, cnt FROM ucnt{k} WHERE length(piece) > 1
)"""
        )
        score_ctes(k, f"uv{k}")
    return parts, f"uv{n_iters}", f"uc{n_iters}"


def _unigram_train_oracle(n_multi=120, n_iters=2, max_piece_len=4) -> str:
    parts, vocab, cost = _unigram_ctes(n_multi, n_iters, max_piece_len)
    return (
        "WITH RECURSIVE " + ",\n".join(parts) + f"""
SELECT v.piece, v.cnt AS count, c.cost AS cost_bits,
  CAST(row_number() OVER (ORDER BY v.cnt DESC, v.piece ASC) AS BIGINT)
    AS rank
FROM {vocab} v JOIN {cost} c ON v.piece = c.piece"""
    )


def _unigram_encode_oracle(n_multi=120, n_iters=2, max_piece_len=4) -> str:
    parts, vocab, cost = _unigram_ctes(n_multi, n_iters, max_piece_len)
    n = n_iters
    parts.append(f"""utok AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS word
  FROM (SELECT doc_id, {_tokens('text')} AS toks FROM documents)
)""")
    parts.extend(_uni_dp_ctes("e", "utok", ["doc_id", "pos"],
                              cost, f"ub{n}", max_piece_len))
    parts.append("""uagg AS (
  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS pieces
  FROM sege GROUP BY doc_id
)""")
    return ("WITH RECURSIVE " + ",\n".join(parts) + """
SELECT d.doc_id,
       CAST(CASE WHEN a.pieces IS NULL OR a.pieces = '' THEN 0
                 ELSE len(string_split(a.pieces, ' ')) END AS BIGINT)
         AS n_pieces,
       COALESCE(a.pieces, '') AS pieces
FROM documents d LEFT JOIN uagg a USING (doc_id)""")


ORACLES["unigram_train_corpus"] = _unigram_train_oracle()
ORACLES["unigram_encode_docs"] = _unigram_encode_oracle()


# ---------------------------------------------------------------------------
# HyperLogLog distinct estimate (operators/sketch.py) — deterministic
# register grid on the frozen hash kernel; rho via binary-string length
# (the doc_surprisal rule); harmonic sum in exact integers; the alpha
# constant round-trips through VARCHAR (decimal literals parse as DECIMAL
# and double-round — the documented DuckDB DECIMAL->DOUBLE gotcha).
# ---------------------------------------------------------------------------

from ..operators.sketch import hll_alpha_const as _hll_const  # noqa: E402

_HLL_CONST_SQL = f"CAST('{_hll_const(10)!r}' AS DOUBLE)"
_HLL_H = _h("(k || '__hll|')")

ORACLES["hll_distinct_orders"] = f"""
WITH keys AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders
),
hv AS (
  SELECT {_HLL_H} AS h FROM keys WHERE k IS NOT NULL AND k <> ''
),
regs AS (
  SELECT CAST(h % 1024 AS INT) AS register,
         max(CASE WHEN h // 1024 = 0 THEN 22
             ELSE 22 - length(bin(h // 1024)) END) AS max_rho
  FROM hv GROUP BY register
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS used_registers,
         CAST(COALESCE(sum(CAST(1 AS BIGINT) << (22 - max_rho)), 0)
              AS BIGINT) AS used_pow
  FROM regs
),
s2 AS (
  SELECT used_registers,
         CAST(1024 - used_registers AS BIGINT) AS zero_registers,
         CAST(used_pow + (1024 - used_registers) * CAST(4194304 AS BIGINT)
              AS BIGINT) AS sum_pow
  FROM s
),
s3 AS (
  SELECT *, {_HLL_CONST_SQL} / CAST(sum_pow AS DOUBLE) AS hll_estimate
  FROM s2
),
ex AS (
  SELECT CAST(count(DISTINCT k) AS BIGINT) AS exact_distinct FROM keys
)
SELECT CAST(1024 AS INT) AS m, used_registers, zero_registers, sum_pow,
       hll_estimate, exact_distinct,
       (hll_estimate - CAST(exact_distinct AS DOUBLE))
         / CAST(exact_distinct AS DOUBLE) AS rel_error
FROM s3 CROSS JOIN ex
"""


# ---------------------------------------------------------------------------
# Semantic contamination screen (contamination.semantic_contamination) —
# the SAME two mirrored Lloyd iterations as embedding_kmeans provide the
# shared quantizer; pool (vec_id % 10 <> 0) x bench (= 0) cosine runs only
# within a cell; max_cosine ranges over QUALIFYING pairs (NULL when none).
# ---------------------------------------------------------------------------

ORACLES["contamination_semantic"] = f"""
WITH c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cell,
         embedding AS cv
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id ASC LIMIT 8)
),{_kmeans_assign_cte('c0', 'a1')},{_kmeans_update_cte('a1', 'c0', 'c1')},{_kmeans_assign_cte('c1', 'a2')},{_kmeans_update_cte('a2', 'c1', 'c2')},{_kmeans_assign_cte('c2', 'a3')},
pool AS (
  SELECT vec_id, xv, cell FROM a3 WHERE vec_id % 10 <> 0
),
bench AS (
  SELECT vec_id, xv, cell FROM a3 WHERE vec_id % 10 = 0
),
hits AS (
  SELECT p.vec_id,
         CAST(count(*) AS BIGINT) AS n_bench_hits,
         max({_cosd('p.xv', 'b.xv')}) AS max_cosine
  FROM pool p JOIN bench b USING (cell)
  WHERE {_cosd('p.xv', 'b.xv')} >= 0.3
  GROUP BY p.vec_id
)
SELECT p.vec_id, p.cell,
       CAST(COALESCE(h.n_bench_hits, 0) AS BIGINT) AS n_bench_hits,
       h.max_cosine,
       CAST(CASE WHEN h.n_bench_hits IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS contaminated
FROM pool p LEFT JOIN hits h USING (vec_id)
"""


# ---------------------------------------------------------------------------
# Hashed-feature logistic regression (selection.lr_train / lr_scores) —
# three full-batch GD iterations unrolled, weight state as (b, w) rows
# with the bias at b = -1. MATERIALIZED per the iterative-CTE rule (each
# state is referenced several times by the next iteration). Integer
# division // truncates toward zero in BOTH engines (Python // floors —
# the operator uses a trunc helper); >> is arithmetic in both.
# ---------------------------------------------------------------------------

_LR_B = 64  # must match queries.quality_lr_classifier num_buckets
_LR_SALTED = "(f || '__lr|')"
_LR_BUCKET = f"({_h(_LR_SALTED)} % {_LR_B})"
_LR_SIG = "greatest(CAST(0 AS BIGINT), least(CAST(16777216 AS BIGINT), 8388608 + ({m} >> 2)))"


def _lr_iter_cte(prev_w: str, name: str) -> str:
    sig = _LR_SIG.format(m="m")
    return f""",
{name}_m AS MATERIALIZED (
  SELECT l.doc_id, l.y,
         CAST(COALESCE(s.dot, 0)
              + (SELECT w FROM {prev_w} WHERE b = -1) AS BIGINT) AS m
  FROM lab_train l LEFT JOIN (
    SELECT f.doc_id, CAST(sum(f.x * w.w) AS BIGINT) AS dot
    FROM fx f JOIN {prev_w} w ON f.b = w.b GROUP BY f.doc_id
  ) s USING (doc_id)
),
{name}_e AS MATERIALIZED (
  SELECT doc_id, CAST({sig} - y * 16777216 AS BIGINT) AS e FROM {name}_m
),
{name}_g AS (
  SELECT f.b, CAST(sum(e.e * f.x) AS BIGINT) AS g
  FROM fx f JOIN {name}_e e USING (doc_id) GROUP BY f.b
  UNION ALL
  SELECT -1, CAST(sum(e) AS BIGINT) FROM {name}_e
),
{name} AS MATERIALIZED (
  SELECT w.b,
         CAST(w.w - ((COALESCE(g.g, 0) // (SELECT n FROM ntr)) >> 3)
              AS BIGINT) AS w
  FROM {prev_w} w LEFT JOIN {name}_g g USING (b)
)"""


_LR_FINAL_SIG = _LR_SIG.format(m="m")

ORACLES["quality_lr_classifier"] = f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, {_tokens('text')} AS toks,
         CAST(lang = 'en' AS BIGINT) AS y
  FROM documents
),
lab_train AS MATERIALIZED (
  SELECT doc_id, y FROM d WHERE doc_id % 4 <> 3
),
fx AS MATERIALIZED (
  SELECT doc_id, {_LR_BUCKET} AS b, CAST(count(*) AS BIGINT) AS x
  FROM (SELECT doc_id, unnest({_DSIR_FEATS}) AS f FROM d
        WHERE doc_id % 4 <> 3)
  GROUP BY doc_id, b
),
ntr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lab_train),
w0 AS (
  SELECT CAST(t.b AS INT) AS b, CAST(0 AS BIGINT) AS w FROM range(-1, {_LR_B}) t(b)
){_lr_iter_cte('w0', 'it1')}{_lr_iter_cte('it1', 'it2')}{_lr_iter_cte('it2', 'it3')},
fxall AS MATERIALIZED (
  SELECT doc_id, {_LR_BUCKET} AS b, CAST(count(*) AS BIGINT) AS x
  FROM (SELECT doc_id, unnest({_DSIR_FEATS}) AS f FROM d)
  GROUP BY doc_id, b
),
sm AS (
  SELECT d.doc_id, d.y,
         CAST(COALESCE(s.dot, 0)
              + (SELECT w FROM it3 WHERE b = -1) AS BIGINT) AS m
  FROM d LEFT JOIN (
    SELECT f.doc_id, CAST(sum(f.x * w.w) AS BIGINT) AS dot
    FROM fxall f JOIN it3 w ON f.b = w.b GROUP BY f.doc_id
  ) s USING (doc_id)
)
SELECT doc_id, y AS curated, m AS margin_fp,
       CAST({_LR_FINAL_SIG} AS BIGINT) AS prob_fp,
       CAST(CASE WHEN m >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred,
       (CASE WHEN m >= 0 THEN 1 ELSE 0 END) = y AS is_correct
FROM sm
"""


# ---------------------------------------------------------------------------
# Dyadic EWMA (timeseries.ewma_halflife) — alpha = 1/2 half-life decay as
# exact integer lag arithmetic (weights are powers of two), pandas
# adjust=True renormalization over partial windows, one double division.
# All 16 lags share the single named window.
# ---------------------------------------------------------------------------

ORACLES["ts_ewma_orders"] = """
WITH o AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) AS ts_us,
         o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           AS price_cents
  FROM orders
)
SELECT o_custkey, ts_us, o_orderkey, price_cents,
       CAST(CASE WHEN lag(price_cents, 0) OVER w IS NOT NULL THEN 32768 ELSE 0 END
           + CASE WHEN lag(price_cents, 1) OVER w IS NOT NULL THEN 16384 ELSE 0 END
           + CASE WHEN lag(price_cents, 2) OVER w IS NOT NULL THEN 8192 ELSE 0 END
           + CASE WHEN lag(price_cents, 3) OVER w IS NOT NULL THEN 4096 ELSE 0 END
           + CASE WHEN lag(price_cents, 4) OVER w IS NOT NULL THEN 2048 ELSE 0 END
           + CASE WHEN lag(price_cents, 5) OVER w IS NOT NULL THEN 1024 ELSE 0 END
           + CASE WHEN lag(price_cents, 6) OVER w IS NOT NULL THEN 512 ELSE 0 END
           + CASE WHEN lag(price_cents, 7) OVER w IS NOT NULL THEN 256 ELSE 0 END
           + CASE WHEN lag(price_cents, 8) OVER w IS NOT NULL THEN 128 ELSE 0 END
           + CASE WHEN lag(price_cents, 9) OVER w IS NOT NULL THEN 64 ELSE 0 END
           + CASE WHEN lag(price_cents, 10) OVER w IS NOT NULL THEN 32 ELSE 0 END
           + CASE WHEN lag(price_cents, 11) OVER w IS NOT NULL THEN 16 ELSE 0 END
           + CASE WHEN lag(price_cents, 12) OVER w IS NOT NULL THEN 8 ELSE 0 END
           + CASE WHEN lag(price_cents, 13) OVER w IS NOT NULL THEN 4 ELSE 0 END
           + CASE WHEN lag(price_cents, 14) OVER w IS NOT NULL THEN 2 ELSE 0 END
           + CASE WHEN lag(price_cents, 15) OVER w IS NOT NULL THEN 1 ELSE 0 END
         AS BIGINT) AS weight_mass,
       CAST(COALESCE(lag(price_cents, 0) OVER w * 32768, 0)
           + COALESCE(lag(price_cents, 1) OVER w * 16384, 0)
           + COALESCE(lag(price_cents, 2) OVER w * 8192, 0)
           + COALESCE(lag(price_cents, 3) OVER w * 4096, 0)
           + COALESCE(lag(price_cents, 4) OVER w * 2048, 0)
           + COALESCE(lag(price_cents, 5) OVER w * 1024, 0)
           + COALESCE(lag(price_cents, 6) OVER w * 512, 0)
           + COALESCE(lag(price_cents, 7) OVER w * 256, 0)
           + COALESCE(lag(price_cents, 8) OVER w * 128, 0)
           + COALESCE(lag(price_cents, 9) OVER w * 64, 0)
           + COALESCE(lag(price_cents, 10) OVER w * 32, 0)
           + COALESCE(lag(price_cents, 11) OVER w * 16, 0)
           + COALESCE(lag(price_cents, 12) OVER w * 8, 0)
           + COALESCE(lag(price_cents, 13) OVER w * 4, 0)
           + COALESCE(lag(price_cents, 14) OVER w * 2, 0)
           + COALESCE(lag(price_cents, 15) OVER w * 1, 0)
         AS DOUBLE)
       / CAST(CASE WHEN lag(price_cents, 0) OVER w IS NOT NULL THEN 32768 ELSE 0 END
           + CASE WHEN lag(price_cents, 1) OVER w IS NOT NULL THEN 16384 ELSE 0 END
           + CASE WHEN lag(price_cents, 2) OVER w IS NOT NULL THEN 8192 ELSE 0 END
           + CASE WHEN lag(price_cents, 3) OVER w IS NOT NULL THEN 4096 ELSE 0 END
           + CASE WHEN lag(price_cents, 4) OVER w IS NOT NULL THEN 2048 ELSE 0 END
           + CASE WHEN lag(price_cents, 5) OVER w IS NOT NULL THEN 1024 ELSE 0 END
           + CASE WHEN lag(price_cents, 6) OVER w IS NOT NULL THEN 512 ELSE 0 END
           + CASE WHEN lag(price_cents, 7) OVER w IS NOT NULL THEN 256 ELSE 0 END
           + CASE WHEN lag(price_cents, 8) OVER w IS NOT NULL THEN 128 ELSE 0 END
           + CASE WHEN lag(price_cents, 9) OVER w IS NOT NULL THEN 64 ELSE 0 END
           + CASE WHEN lag(price_cents, 10) OVER w IS NOT NULL THEN 32 ELSE 0 END
           + CASE WHEN lag(price_cents, 11) OVER w IS NOT NULL THEN 16 ELSE 0 END
           + CASE WHEN lag(price_cents, 12) OVER w IS NOT NULL THEN 8 ELSE 0 END
           + CASE WHEN lag(price_cents, 13) OVER w IS NOT NULL THEN 4 ELSE 0 END
           + CASE WHEN lag(price_cents, 14) OVER w IS NOT NULL THEN 2 ELSE 0 END
           + CASE WHEN lag(price_cents, 15) OVER w IS NOT NULL THEN 1 ELSE 0 END
         AS DOUBLE) AS ewma
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY ts_us, o_orderkey)
"""


# ---------------------------------------------------------------------------
# Canary audit (privacy.inject_canaries / detect / report) — plant,
# scrub, re-extract, reconcile. The selection hash and the 16-hex secret
# both derive from the frozen md5 kernel; the detection pattern is
# backslash-free (RE2-safe verbatim in both engines).
# ---------------------------------------------------------------------------

_CANARY_SEL = "(CAST(doc_id AS VARCHAR) || '__canary|')"

ORACLES["canary_audit_docs"] = f"""
WITH sel AS (
  SELECT doc_id, text,
         ({_h(_CANARY_SEL)} % 16 = 0) AS s,
         lower(substr(md5(CAST(doc_id AS VARCHAR) || '__canary|secret'),
                      1, 16)) AS sec
  FROM documents
),
inj AS (
  SELECT doc_id,
         CASE WHEN s THEN text || ' CANARY' || sec ELSE text END AS text
  FROM sel
),
scrub AS (
  SELECT doc_id, {_scrub_sql('text')} AS text FROM inj
),
f AS (
  SELECT doc_id, secret FROM (
    SELECT doc_id,
           regexp_extract(text, 'CANARY([0-9a-f]{{16}})', 1) AS secret
    FROM scrub
  ) WHERE secret <> ''
),
e AS (
  SELECT doc_id, sec AS secret FROM sel WHERE s
),
j AS (
  SELECT f.doc_id AS fid, e.doc_id AS eid
  FROM f FULL JOIN e ON f.doc_id = e.doc_id AND f.secret = e.secret
)
SELECT CAST(sum(CASE WHEN eid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_expected,
       CAST(sum(CASE WHEN fid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_found,
       CAST(sum(CASE WHEN fid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing,
       CAST(sum(CASE WHEN eid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_spurious
FROM j
"""


# ---------------------------------------------------------------------------
# WordPiece training (textprep.wordpiece_train) — the BPE CTE chain with
# a likelihood-scored best-pair step: score_bits = bits(pair) -
# bits(left) - bits(right), ties by pair text. The rewrite step is
# byte-identical to BPE's (_bpe_seq_rewrite), so the encode oracle is
# the BPE encode chain over WordPiece b{i} states.
# ---------------------------------------------------------------------------


def _wp_cte_parts(n_merges: int) -> list[str]:
    parts = [
        "words AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq "
        "FROM ("
        f"SELECT unnest({_tokens('text')}) AS w FROM documents) GROUP BY w)",
        "v0 AS MATERIALIZED (SELECT freq, array_to_string("
        "[w[i] for i in range(1, len(w) + 1)], ' ') || ' </w>' AS seq "
        "FROM words)",
    ]
    for i in range(n_merges):
        parts.append(f"""y{i} AS MATERIALIZED (
  SELECT s AS sym, CAST(sum(freq) AS BIGINT) AS scnt FROM (
    SELECT freq, unnest(string_split(seq, ' ')) AS s FROM v{i}
  ) GROUP BY s
)""")
        parts.append(f"""p{i} AS MATERIALIZED (
  SELECT pr AS pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq,
           unnest([sym[j] || ' ' || sym[j + 1]
                   for j in range(1, len(sym))]) AS pr
    FROM (SELECT freq, string_split(seq, ' ') AS sym FROM v{i})
  ) GROUP BY pr
)""")
        parts.append(f"""b{i} AS MATERIALIZED (
  SELECT pair, cnt, score_bits FROM (
    SELECT p.pair, p.cnt,
           CAST(length(bin(p.cnt)) - length(bin(l.scnt))
                - length(bin(r.scnt)) AS BIGINT) AS score_bits
    FROM p{i} p
    JOIN y{i} l ON split_part(p.pair, ' ', 1) = l.sym
    JOIN y{i} r ON split_part(p.pair, ' ', 2) = r.sym
  ) ORDER BY score_bits DESC, pair ASC LIMIT 1
)""")
        parts.append(f"""v{i + 1} AS MATERIALIZED (
  SELECT freq, {_bpe_seq_rewrite(f'b{i}')} AS seq
  FROM v{i}
)""")
    return parts


def _wp_oracle(n_merges: int) -> str:
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS iteration, "
        f"split_part(pair, ' ', 1) AS \"left\", "
        f"split_part(pair, ' ', 2) AS \"right\", "
        f"replace(pair, ' ', '') AS merged, cnt AS pair_count, "
        f"score_bits FROM b{i}"
        for i in range(n_merges)
    ]
    return ("WITH " + ",\n".join(_wp_cte_parts(n_merges)) + "\n"
            + "\nUNION ALL ".join(selects))


def _wp_encode_oracle(n_merges: int) -> str:
    parts = _wp_cte_parts(n_merges)
    parts.append(f"""tok AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS w
  FROM (SELECT doc_id, {_tokens('text')} AS toks FROM documents)
)""")
    parts.append(
        "s0 AS MATERIALIZED (SELECT doc_id, pos, array_to_string("
        "[w[i] for i in range(1, len(w) + 1)], ' ') || ' </w>' AS seq "
        "FROM tok)"
    )
    for i in range(n_merges):
        parts.append(f"""s{i + 1} AS MATERIALIZED (
  SELECT doc_id, pos, {_bpe_seq_rewrite(f'b{i}')} AS seq
  FROM s{i}
)""")
    parts.append(f"""agg AS (
  SELECT doc_id, string_agg(seq, ' ' ORDER BY pos) AS pieces
  FROM s{n_merges} GROUP BY doc_id
)""")
    return ("WITH " + ",\n".join(parts) + """
SELECT d.doc_id,
       CAST(CASE WHEN a.pieces IS NULL OR a.pieces = '' THEN 0
                 ELSE len(string_split(a.pieces, ' ')) END AS BIGINT)
         AS n_pieces,
       COALESCE(a.pieces, '') AS pieces
FROM documents d LEFT JOIN agg a USING (doc_id)""")


ORACLES["wordpiece_train_corpus"] = _wp_oracle(6)
ORACLES["wordpiece_encode_docs"] = _wp_encode_oracle(6)


# ---------------------------------------------------------------------------
# Mondrian k-anonymity (privacy.mondrian_anonymize) — the 3-level median-
# cut recursion replayed exactly: per level, order statistics under the
# (value, id) total order, side counts vs the median element, and the
# (allowable, widest range, lowest dim) pick; unsplit partitions double
# their label so labels never collide. Generated by the same parameters
# as queries.privacy_mondrian_customer (k=20, depth=3).
# ---------------------------------------------------------------------------

ORACLES["privacy_mondrian_customer"] = """
WITH s0 AS MATERIALIZED (
  SELECT c_custkey AS cid, CAST(c_nationkey AS BIGINT) AS q0,
         CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS q1,
         CAST(0 AS BIGINT) AS label
  FROM customer
),
u0 AS MATERIALIZED (
  SELECT cid, label, 0 AS dim, q0 AS val FROM s0
  UNION ALL
  SELECT cid, label, 1 AS dim, q1 AS val FROM s0
),
m0 AS MATERIALIZED (
  SELECT label, dim, val AS med, n, lo, hi FROM (
    SELECT label, dim, val,
           row_number() OVER (PARTITION BY label, dim ORDER BY val, cid)
             AS rn,
           count(*) OVER (PARTITION BY label, dim) AS n,
           min(val) OVER (PARTITION BY label, dim) AS lo,
           max(val) OVER (PARTITION BY label, dim) AS hi
    FROM u0
  ) WHERE rn = (n + 1) // 2
),
c0 AS MATERIALIZED (
  SELECT u.label, u.dim,
         CAST(sum(CASE WHEN u.val <= m.med THEN 1 ELSE 0 END) AS BIGINT)
           AS cle
  FROM u0 u JOIN m0 m USING (label, dim)
  GROUP BY u.label, u.dim
),
p0 AS MATERIALIZED (
  SELECT label, dim, med FROM (
    SELECT m.label, m.dim, m.med,
           row_number() OVER (PARTITION BY m.label
                              ORDER BY (m.hi - m.lo) DESC, m.dim ASC) AS rk
    FROM m0 m JOIN c0 c USING (label, dim)
    WHERE least(c.cle, m.n - c.cle) >= 20
  ) WHERE rk = 1
),
s1 AS MATERIALIZED (
  SELECT s.cid, s.q0, s.q1,
         CAST(CASE WHEN p.label IS NULL THEN s.label * 2
              WHEN (CASE p.dim WHEN 0 THEN s.q0 ELSE s.q1 END) > p.med
                THEN s.label * 2 + 1
              ELSE s.label * 2 END AS BIGINT) AS label
  FROM s0 s LEFT JOIN p0 p USING (label)
),
u1 AS MATERIALIZED (
  SELECT cid, label, 0 AS dim, q0 AS val FROM s1
  UNION ALL
  SELECT cid, label, 1 AS dim, q1 AS val FROM s1
),
m1 AS MATERIALIZED (
  SELECT label, dim, val AS med, n, lo, hi FROM (
    SELECT label, dim, val,
           row_number() OVER (PARTITION BY label, dim ORDER BY val, cid)
             AS rn,
           count(*) OVER (PARTITION BY label, dim) AS n,
           min(val) OVER (PARTITION BY label, dim) AS lo,
           max(val) OVER (PARTITION BY label, dim) AS hi
    FROM u1
  ) WHERE rn = (n + 1) // 2
),
c1 AS MATERIALIZED (
  SELECT u.label, u.dim,
         CAST(sum(CASE WHEN u.val <= m.med THEN 1 ELSE 0 END) AS BIGINT)
           AS cle
  FROM u1 u JOIN m1 m USING (label, dim)
  GROUP BY u.label, u.dim
),
p1 AS MATERIALIZED (
  SELECT label, dim, med FROM (
    SELECT m.label, m.dim, m.med,
           row_number() OVER (PARTITION BY m.label
                              ORDER BY (m.hi - m.lo) DESC, m.dim ASC) AS rk
    FROM m1 m JOIN c1 c USING (label, dim)
    WHERE least(c.cle, m.n - c.cle) >= 20
  ) WHERE rk = 1
),
s2 AS MATERIALIZED (
  SELECT s.cid, s.q0, s.q1,
         CAST(CASE WHEN p.label IS NULL THEN s.label * 2
              WHEN (CASE p.dim WHEN 0 THEN s.q0 ELSE s.q1 END) > p.med
                THEN s.label * 2 + 1
              ELSE s.label * 2 END AS BIGINT) AS label
  FROM s1 s LEFT JOIN p1 p USING (label)
),
u2 AS MATERIALIZED (
  SELECT cid, label, 0 AS dim, q0 AS val FROM s2
  UNION ALL
  SELECT cid, label, 1 AS dim, q1 AS val FROM s2
),
m2 AS MATERIALIZED (
  SELECT label, dim, val AS med, n, lo, hi FROM (
    SELECT label, dim, val,
           row_number() OVER (PARTITION BY label, dim ORDER BY val, cid)
             AS rn,
           count(*) OVER (PARTITION BY label, dim) AS n,
           min(val) OVER (PARTITION BY label, dim) AS lo,
           max(val) OVER (PARTITION BY label, dim) AS hi
    FROM u2
  ) WHERE rn = (n + 1) // 2
),
c2 AS MATERIALIZED (
  SELECT u.label, u.dim,
         CAST(sum(CASE WHEN u.val <= m.med THEN 1 ELSE 0 END) AS BIGINT)
           AS cle
  FROM u2 u JOIN m2 m USING (label, dim)
  GROUP BY u.label, u.dim
),
p2 AS MATERIALIZED (
  SELECT label, dim, med FROM (
    SELECT m.label, m.dim, m.med,
           row_number() OVER (PARTITION BY m.label
                              ORDER BY (m.hi - m.lo) DESC, m.dim ASC) AS rk
    FROM m2 m JOIN c2 c USING (label, dim)
    WHERE least(c.cle, m.n - c.cle) >= 20
  ) WHERE rk = 1
),
s3 AS MATERIALIZED (
  SELECT s.cid, s.q0, s.q1,
         CAST(CASE WHEN p.label IS NULL THEN s.label * 2
              WHEN (CASE p.dim WHEN 0 THEN s.q0 ELSE s.q1 END) > p.med
                THEN s.label * 2 + 1
              ELSE s.label * 2 END AS BIGINT) AS label
  FROM s2 s LEFT JOIN p2 p USING (label)
),
b AS (
  SELECT label, CAST(count(*) AS BIGINT) AS class_size,
         min(q0) AS lo0, max(q0) AS hi0,
         min(q1) AS lo1, max(q1) AS hi1
  FROM s3 GROUP BY label
)
SELECT s.cid AS c_custkey,
       b.lo0 AS nat_lo, b.hi0 AS nat_hi,
       b.lo1 AS bal_cents_lo, b.hi1 AS bal_cents_hi,
       b.class_size
FROM s3 s JOIN b USING (label)
"""


# ---------------------------------------------------------------------------
# eps-DP histogram release (privacy.dp_noisy_counts over integer-cents
# bins) — same literal discrete-Laplace threshold table as
# privacy_dp_counts (eps = 0.5), keyed on the seeded bin bounds.
# ---------------------------------------------------------------------------

_DPH_KEY = (
    "('hist-release-1' || '|'"
    " || coalesce(CAST(bin_lo_cents AS VARCHAR), '<null>') || '|'"
    " || coalesce(CAST(bin_hi_cents AS VARCHAR), '<null>'))"
)

ORACLES["privacy_dp_histogram"] = f"""
WITH c AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
b AS (
  SELECT cents - cents % 5000000 AS bin_lo_cents,
         cents - cents % 5000000 + 5000000 AS bin_hi_cents
  FROM c
),
g AS (
  SELECT bin_lo_cents, bin_hi_cents, CAST(count(*) AS BIGINT) AS n,
         {O.raw_hash(_DPH_KEY)} AS uh
  FROM b GROUP BY bin_lo_cents, bin_hi_cents
)
SELECT bin_lo_cents, bin_hi_cents,
       greatest(CAST(0 AS BIGINT),
                n + CAST(len([t for t in {_DP_T} if t <= uh]) AS BIGINT)
                  - CAST({_DP_K} AS BIGINT)) AS noisy_count
FROM g
"""


# ---------------------------------------------------------------------------
# Hash-sampling quantile sketch (sketch.quantile_sketch) — deterministic
# 1-in-16 coordinated sample by the salted id hash, Horvitz-Thompson
# ranks, ceil targets in pure integer arithmetic ((a + b - 1) // b on
# positives == Spark's Python -(-a // b)); the exact side is the same
# estimator at level 0, its row_number window mirroring the distributed
# prefix-sum rank exactly.
# ---------------------------------------------------------------------------

_QSK_SALTED = "(CAST(id AS VARCHAR) || '__qsk|')"
_QSK_PCTS = (25, 50, 75, 95)

_qsk_est = "\nUNION ALL ".join(
    f"""(
  SELECT {p} AS pct, v AS est_value,
         CAST(rn * 16 AS BIGINT) AS est_rank,
         CAST(nk * 16 AS BIGINT) AS n_est
  FROM rk WHERE rn * 16 >= ({p} * nk * 16 + 99) // 100
  ORDER BY v, id LIMIT 1
)""" for p in _QSK_PCTS
)
_qsk_ex = "\nUNION ALL ".join(
    f"""(
  SELECT {p} AS pct, v AS exact_value
  FROM rkf WHERE rn >= ({p} * nf + 99) // 100
  ORDER BY v, id LIMIT 1
)""" for p in _QSK_PCTS
)

ORACLES["quantile_sketch_prices"] = f"""
WITH src AS (
  SELECT o_orderkey AS id,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
  FROM orders
),
kept AS (
  SELECT id, v FROM src
  WHERE {_h(_QSK_SALTED)} % 16 = 0
),
rk AS (
  SELECT id, v, row_number() OVER (ORDER BY v, id) AS rn,
         count(*) OVER () AS nk
  FROM kept
),
rkf AS (
  SELECT id, v, row_number() OVER (ORDER BY v, id) AS rn,
         count(*) OVER () AS nf
  FROM src
),
est AS (
{_qsk_est}
),
ex AS (
{_qsk_ex}
)
SELECT CAST(est.pct AS INT) AS pct, est.est_value, est.est_rank, est.n_est,
       ex.exact_value,
       CAST(est.est_value - ex.exact_value AS BIGINT) AS err_cents
FROM est JOIN ex ON est.pct = ex.pct
"""


# ---------------------------------------------------------------------------
# CUSUM change-point flags (timeseries.cusum_flags) — the prefix-extremum
# closed form: s_t = P_t - least(0, running_min(P)); both drift sides
# share one (user, ts, event_id) window sort. Exact int64 cents.
# ---------------------------------------------------------------------------

ORACLES["anomaly_cusum_events"] = """
WITH e AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS value_cents
  FROM events
),
p0 AS (
  SELECT user_id, ts_us, event_id, value_cents,
         sum(value_cents - 7000) OVER w AS p_up,
         sum(3000 - value_cents) OVER w AS p_dn
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
p AS (
  SELECT user_id, ts_us, event_id, value_cents, p_up, p_dn,
         min(p_up) OVER w AS m_up,
         min(p_dn) OVER w AS m_dn
  FROM p0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, ts_us, event_id, value_cents,
       CAST(p_up - least(m_up, 0) AS BIGINT) AS cusum_up,
       CAST(p_dn - least(m_dn, 0) AS BIGINT) AS cusum_dn,
       CAST(CASE WHEN p_up - least(m_up, 0) > 50000 THEN 1 ELSE 0 END
            AS BIGINT) AS alarm_up,
       CAST(CASE WHEN p_dn - least(m_dn, 0) > 50000 THEN 1 ELSE 0 END
            AS BIGINT) AS alarm_dn
FROM p
"""


# ---------------------------------------------------------------------------
# HLL union/overlap set algebra (sketch.hll_merge) — three register tables
# (shard A, shard B, union) share one key projection; the merged-register
# estimate equals the union's direct estimate (max of maxes), so the
# oracle computes the union directly. Same exact-integer harmonic sum and
# VARCHAR-round-tripped alpha constant as hll_distinct_orders.
# ---------------------------------------------------------------------------

def _hll_est_cte(tag: str, where: str) -> str:
    """One shard's register table + estimate as chained CTE clauses; the
    final clause ``e_{tag}`` has a single double column ``est_{tag}``."""
    hk = _h("(k || '__hll|')")
    return f"""
h_{tag} AS (
  SELECT {hk} AS h FROM keys
  WHERE k IS NOT NULL AND k <> '' AND ({where})
),
r_{tag} AS (
  SELECT CAST(h % 1024 AS INT) AS register,
         max(CASE WHEN h // 1024 = 0 THEN 22
             ELSE 22 - length(bin(h // 1024)) END) AS max_rho
  FROM h_{tag} GROUP BY register
),
s_{tag} AS (
  SELECT CAST(count(*) AS BIGINT) AS used,
         CAST(COALESCE(sum(CAST(1 AS BIGINT) << (22 - max_rho)), 0)
              AS BIGINT) AS used_pow
  FROM r_{tag}
),
e_{tag} AS (
  SELECT {_HLL_CONST_SQL}
         / CAST(used_pow + (1024 - used) * CAST(4194304 AS BIGINT)
                AS DOUBLE) AS est_{tag}
  FROM s_{tag}
)"""


_HLL_OVERLAP_CTES = ",".join([
    _hll_est_cte("a", "d < TIMESTAMP '1995-01-01'"),
    _hll_est_cte("b", "d >= TIMESTAMP '1995-01-01'"),
    _hll_est_cte("u", "TRUE"),
])

ORACLES["hll_overlap_halves"] = f"""
WITH keys AS (
  SELECT CAST(o_custkey AS VARCHAR) AS k,
         CAST(o_orderdate AS TIMESTAMP) AS d
  FROM orders
),{_HLL_OVERLAP_CTES},
ex AS (
  SELECT CAST(count(DISTINCT k) AS BIGINT) AS exact_union FROM keys
)
SELECT est_a, est_b, est_u AS est_union,
       est_a + est_b - est_u AS est_overlap, exact_union
FROM e_a CROSS JOIN e_b CROSS JOIN e_u CROSS JOIN ex
"""


# ---------------------------------------------------------------------------
# Linear multi-touch attribution (funnel.linear_attribution) — bounded
# interval join, then EXACT integer pair counts per (touch_type, k): the
# credit column is one double division per grid cell, never a
# row-order-dependent float sum.
# ---------------------------------------------------------------------------

ORACLES["attribution_linear_events"] = """
WITH e AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         event_id, event_type
  FROM events
),
conv AS (
  SELECT user_id AS ent, ts_us AS conv_us, event_id AS conv_id
  FROM e WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id AS ent, ts_us AS touch_us, event_type AS touch_type
  FROM e WHERE event_type IN ('click', 'view')
),
pairs AS (
  SELECT t.touch_type, c.ent, c.conv_id
  FROM conv c JOIN touch t ON t.ent = c.ent
   AND t.touch_us < c.conv_us
   AND t.touch_us >= c.conv_us - 604800000000
),
kk AS (
  SELECT touch_type,
         count(*) OVER (PARTITION BY ent, conv_id) AS k
  FROM pairs
)
SELECT touch_type, CAST(k AS BIGINT) AS touches_per_conversion,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(*) AS DOUBLE) / CAST(k AS DOUBLE) AS credit
FROM kk GROUP BY touch_type, k
ORDER BY touch_type, touches_per_conversion
"""


# ---------------------------------------------------------------------------
# Per-group OLS trend (stats.grouped_ols) — five sufficient statistics in
# exact int128 (Spark DECIMAL(38,0) / DuckDB HUGEINT); numerator and
# denominator stay exact, the one double division runs on identical
# operands. Big exact ints cross to DOUBLE via VARCHAR (the DECIMAL
# double-rounding gotcha applies to any >2^53 unscaled value).
# ---------------------------------------------------------------------------

ORACLES["ols_trend_priority"] = """
WITH src AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', DATE '1992-01-01',
                        CAST(o_orderdate AS DATE)) AS HUGEINT) AS x,
         CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
              AS HUGEINT) AS y
  FROM orders
),
agg AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_points,
         CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx,
         sum(y * y) AS syy
  FROM src GROUP BY o_orderpriority
),
nd AS (
  SELECT o_orderpriority, n_points,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS den,
         n * syy - sy * sy AS yden,
         sx, sy
  FROM agg
),
sl AS (
  SELECT *,
         CASE WHEN den <> 0 THEN
           CAST(CAST(num AS VARCHAR) AS DOUBLE)
           / CAST(CAST(den AS VARCHAR) AS DOUBLE)
         END AS slope
  FROM nd
)
SELECT o_orderpriority, n_points, slope,
       CASE WHEN den <> 0 THEN
         (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
          - slope * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
         / CAST(n_points AS DOUBLE)
       END AS intercept,
       CASE WHEN den <> 0 AND yden <> 0 THEN
         (CAST(CAST(num AS VARCHAR) AS DOUBLE)
          / CAST(CAST(den AS VARCHAR) AS DOUBLE))
         * (CAST(CAST(num AS VARCHAR) AS DOUBLE)
            / CAST(CAST(yden AS VARCHAR) AS DOUBLE))
       END AS r_squared
FROM sl
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Two-proportion z-test (stats.two_proportion_ztest) — four exact arm
# integers, then pure IEEE arithmetic: divisions of exact ints, one
# correctly-rounded sqrt; both engines evaluate the identical expression
# tree left-associatively.
# ---------------------------------------------------------------------------

ORACLES["ab_ztest_events"] = """
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
),
v AS (SELECT CAST(user_id % 2 AS INT) AS variant, converted FROM u),
a AS (
  SELECT
    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT)
      AS conv_a,
    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT)
      AS conv_b
  FROM v
),
b AS (
  SELECT *,
         CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ra,
         CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rb,
         (CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
           / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pool
  FROM a
)
SELECT n_a, conv_a, n_b, conv_b,
       CASE WHEN n_a > 0 THEN ra END AS rate_a,
       CASE WHEN n_b > 0 THEN rb END AS rate_b,
       CASE WHEN n_a > 0 AND n_b > 0 AND pool > 0 AND pool < 1 THEN
         (rb - ra) / sqrt(pool * (1.0 - pool)
                          * (1.0 / CAST(n_a AS DOUBLE)
                             + 1.0 / CAST(n_b AS DOUBLE)))
       END AS z_stat
FROM b
"""


# ---------------------------------------------------------------------------
# KMV overlap (sketch.kmv_overlap) — k smallest DISTINCT salted hashes per
# side; union sketch = k smallest of the union; Jaccard = fraction of the
# union sketch present in both sides. The one estimator division uses the
# exact integer kth minimum; 547608330240 = (k-1) * 2^31 at k = 256.
# ---------------------------------------------------------------------------

_KMV_H = _h("(k || '__kmv|')")

ORACLES["kmv_overlap_halves"] = f"""
WITH keys AS (
  SELECT CAST(o_custkey AS VARCHAR) AS k,
         CAST(o_orderdate AS TIMESTAMP) AS d
  FROM orders
),
ha AS (
  SELECT DISTINCT {_KMV_H} AS h FROM keys
  WHERE k IS NOT NULL AND k <> '' AND d < TIMESTAMP '1995-01-01'
  ORDER BY h LIMIT 256
),
hb AS (
  SELECT DISTINCT {_KMV_H} AS h FROM keys
  WHERE k IS NOT NULL AND k <> '' AND d >= TIMESTAMP '1995-01-01'
  ORDER BY h LIMIT 256
),
hu AS (
  SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
  ORDER BY h LIMIT 256
),
ue AS (
  SELECT CAST(count(*) AS BIGINT) AS k_union,
         CASE WHEN count(*) >= 256 THEN
           CAST(547608330240 AS DOUBLE) / CAST(max(h) AS DOUBLE)
         ELSE CAST(count(*) AS DOUBLE) END AS union_est
  FROM hu
),
ub AS (
  SELECT CAST(count(*) AS BIGINT) AS n_both FROM hu
  WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)
),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_inter FROM (
    SELECT DISTINCT k FROM keys WHERE d < TIMESTAMP '1995-01-01'
    INTERSECT
    SELECT DISTINCT k FROM keys WHERE d >= TIMESTAMP '1995-01-01'
  )
)
SELECT k_union, n_both, union_est,
       CAST(n_both AS DOUBLE) / CAST(k_union AS DOUBLE) AS jaccard_est,
       (CAST(n_both AS DOUBLE) / CAST(k_union AS DOUBLE)) * union_est
         AS inter_est,
       exact_inter
FROM ue CROSS JOIN ub CROSS JOIN ex
"""


# ---------------------------------------------------------------------------
# Join-size sketch probe (sketch.cms_inner_product + sketch.ams_join_size)
# — CMS: per sketch row the bucket-wise product sum, estimate = MIN across
# rows (collisions only over-estimate). AMS: signed tug-of-war sums, per-
# row product total, estimate = lower MEDIAN across 5 rows (unbiased).
# Both grids replay the frozen salted hashes exactly.
# ---------------------------------------------------------------------------


def _ams_cells(key: str, depth: int, width: int, src: str) -> str:
    selects = []
    for r in range(depth):
        hb = _h(f"({key} || '__ams{r}|')")
        hs = _h(f"({key} || '__amss{r}|')")
        selects.append(
            f"SELECT {r} AS sketch_row, "
            f"CAST({hb} % {width} AS INT) AS bucket, "
            f"CAST(1 - 2 * ({hs} % 2) AS BIGINT) AS sign FROM {src}"
        )
    return " UNION ALL ".join(selects)


ORACLES["join_size_sketch_orders"] = f"""
WITH ok AS (SELECT CAST(o_orderkey AS VARCHAR) AS key FROM orders),
lk AS (SELECT CAST(l_orderkey AS VARCHAR) AS key FROM lineitem),
ca AS ({_cms_cells('key', 4, 256, 'ok')}),
cb AS ({_cms_cells('key', 4, 256, 'lk')}),
ga AS (
  SELECT sketch_row, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM ca GROUP BY sketch_row, bucket
),
gb AS (
  SELECT sketch_row, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM cb GROUP BY sketch_row, bucket
),
rowest AS (
  SELECT ga.sketch_row,
         CAST(sum(ga.cnt * gb.cnt) AS BIGINT) AS row_est
  FROM ga JOIN gb ON ga.sketch_row = gb.sketch_row
                 AND ga.bucket = gb.bucket
  GROUP BY ga.sketch_row
),
cms AS (SELECT CAST(min(row_est) AS BIGINT) AS cms_est FROM rowest),
aa AS ({_ams_cells('key', 5, 1024, 'ok')}),
ab AS ({_ams_cells('key', 5, 1024, 'lk')}),
sa AS (
  SELECT sketch_row, bucket, CAST(sum(sign) AS BIGINT) AS s
  FROM aa GROUP BY sketch_row, bucket
),
sb AS (
  SELECT sketch_row, bucket, CAST(sum(sign) AS BIGINT) AS s
  FROM ab GROUP BY sketch_row, bucket
),
arow AS (
  SELECT sa.sketch_row, CAST(sum(sa.s * sb.s) AS BIGINT) AS row_est
  FROM sa JOIN sb ON sa.sketch_row = sb.sketch_row
                 AND sa.bucket = sb.bucket
  GROUP BY sa.sketch_row
),
amed AS (
  SELECT row_est, row_number() OVER (ORDER BY row_est) AS rn,
         count(*) OVER () AS n
  FROM arow
),
ams AS (SELECT CAST(row_est AS BIGINT) AS ams_est FROM amed
        WHERE rn = (n + 1) // 2),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_join_size
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)
SELECT cms_est, ams_est, exact_join_size,
       (CAST(cms_est AS DOUBLE) - CAST(exact_join_size AS DOUBLE))
         / CAST(exact_join_size AS DOUBLE) AS cms_rel_error,
       (CAST(ams_est AS DOUBLE) - CAST(exact_join_size AS DOUBLE))
         / CAST(exact_join_size AS DOUBLE) AS ams_rel_error
FROM cms CROSS JOIN ams CROSS JOIN ex
"""


# ---------------------------------------------------------------------------
# Exact-dedup ingest (dedup.exact_ingest) — batch hashed once, corpus index
# filtered to the batch's hashes, min-id tie-breaks on both sides.
# ---------------------------------------------------------------------------

_CHASH = O.stable_hash("text")

ORACLES["dedup_exact_ingest"] = f"""
WITH corpus AS (
  SELECT doc_id, {_CHASH} AS h FROM documents WHERE doc_id % 10 <> 0
),
batch AS (
  SELECT doc_id AS new_id, {_CHASH} AS h FROM documents
  WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 100000 AS new_id, {_CHASH} AS h FROM documents
  WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 200000 AS new_id, {_CHASH} AS h FROM documents
  WHERE doc_id % 25 = 1
),
cm AS (
  SELECT h, min(doc_id) AS cmatch FROM corpus
  WHERE h IN (SELECT h FROM batch) GROUP BY h
),
bf AS (SELECT h, min(new_id) AS bfirst FROM batch GROUP BY h)
SELECT b.new_id,
       CASE WHEN cm.cmatch IS NOT NULL THEN 'dup_of_corpus'
            WHEN bf.bfirst < b.new_id THEN 'dup_in_batch'
            ELSE 'unique' END AS status,
       CASE WHEN cm.cmatch IS NOT NULL THEN cm.cmatch
            WHEN bf.bfirst < b.new_id THEN bf.bfirst END AS match_id
FROM batch b LEFT JOIN cm ON b.h = cm.h JOIN bf ON b.h = bf.h
"""


# ---------------------------------------------------------------------------
# Grouped HLL (sketch.hll_grouped_registers/_estimate) — the same register
# construction as hll_distinct_orders, grouped by event_type; harmonic
# sums exact integers, one double division per group.
# ---------------------------------------------------------------------------

ORACLES["hll_distinct_users_by_type"] = f"""
WITH keys AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS k FROM events
),
hv AS (
  SELECT event_type, {_HLL_H} AS h FROM keys
  WHERE k IS NOT NULL AND k <> ''
),
regs AS (
  SELECT event_type, CAST(h % 16 AS INT) AS register,
         max(CASE WHEN h // 16 = 0 THEN 28
             ELSE 28 - length(bin(h // 16)) END) AS max_rho
  FROM hv GROUP BY event_type, register
),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS used_registers,
         CAST(sum(CAST(1 AS BIGINT) << (28 - max_rho)) AS BIGINT) AS used_pow
  FROM regs GROUP BY event_type
),
s2 AS (
  SELECT event_type, used_registers,
         CAST(16 - used_registers AS BIGINT) AS zero_registers,
         CAST(used_pow + (16 - used_registers) * CAST(268435456 AS BIGINT)
              AS BIGINT) AS sum_pow
  FROM s
),
s3 AS (
  SELECT *, CAST('46435841507.98225' AS DOUBLE) / CAST(sum_pow AS DOUBLE) AS hll_estimate
  FROM s2
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT k) AS BIGINT) AS exact_distinct
  FROM keys GROUP BY event_type
)
SELECT s3.event_type, used_registers, zero_registers, sum_pow,
       hll_estimate, exact_distinct,
       (hll_estimate - CAST(exact_distinct AS DOUBLE))
         / CAST(exact_distinct AS DOUBLE) AS rel_error
FROM s3 JOIN ex ON s3.event_type = ex.event_type
"""


# ---------------------------------------------------------------------------
# Poissonized bootstrap (stats.bootstrap_mean_ci) — 32 deterministic
# resample means; multiplicities by integer inverse-CDF thresholds
# (stats.poisson1_thresholds, embedded identically in both engines).
# ---------------------------------------------------------------------------

from ..operators.stats import poisson1_thresholds as _p1t  # noqa: E402

_BOOT_T = _p1t()


def _boot_mult(b: int) -> str:
    h = _h(f"(k || '__boot{b}|')")
    whens = " ".join(
        f"WHEN {h} < {t} THEN {j}" for j, t in enumerate(_BOOT_T)
    )
    return f"(CASE {whens} ELSE {len(_BOOT_T)} END)"


_BOOT_MCOLS = ",\n         ".join(
    f"{_boot_mult(b)} AS __M{b}" for b in range(32)
)
_BOOT_SELECTS = "\n  UNION ALL".join(
    f"""
  SELECT {b} AS resample,
         CAST(sum(__M{b}) AS BIGINT) AS n_drawn,
         CASE WHEN sum(__M{b}) > 0 THEN
           CAST(CAST(sum(cents * __M{b}) AS VARCHAR) AS DOUBLE)
           / CAST(sum(__M{b}) AS DOUBLE)
         END AS mean
  FROM m""" for b in range(32)
)

ORACLES["bootstrap_ci_order_price"] = f"""
WITH src AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS k,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
m AS (
  SELECT cents,
         {_BOOT_MCOLS}
  FROM src
){_BOOT_SELECTS}
"""


# ---------------------------------------------------------------------------
# Chi-squared independence (stats.chisq_independence) — full R x C grid
# with zero cells, exact int128 cell terms, one double division per cell,
# init-free list_reduce over (row, col)-sorted terms (0.0 + t1 == t1, so
# Spark's 0.0-seeded fold brackets identically).
# num and den round-trip via VARCHAR (num^2 exceeds 2^53).
# ---------------------------------------------------------------------------

ORACLES["chisq_type_variant_events"] = """
WITH src AS (
  SELECT event_type, CAST(user_id % 2 AS INT) AS variant FROM events
),
cells AS (
  SELECT event_type, variant, CAST(count(*) AS BIGINT) AS o
  FROM src GROUP BY event_type, variant
),
rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM cells
       GROUP BY event_type),
ct AS (SELECT variant, CAST(sum(o) AS BIGINT) AS ct FROM cells
       GROUP BY variant),
tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n,
         CAST(count(DISTINCT event_type) AS INT) AS n_rows,
         CAST(count(DISTINCT variant) AS INT) AS n_cols
  FROM cells
),
grid AS (
  SELECT rt.event_type, ct.variant, rt.rt, ct.ct,
         COALESCE(cells.o, 0) AS o
  FROM rt CROSS JOIN ct
  LEFT JOIN cells ON cells.event_type = rt.event_type
                 AND cells.variant = ct.variant
),
terms AS (
  SELECT g.event_type, g.variant,
         CAST(CAST(
           (CAST(g.o AS HUGEINT) * t.n - CAST(g.rt AS HUGEINT) * g.ct)
           * (CAST(g.o AS HUGEINT) * t.n - CAST(g.rt AS HUGEINT) * g.ct)
           AS VARCHAR) AS DOUBLE)
         / CAST(CAST(
             CAST(t.n AS HUGEINT) * g.rt * g.ct
           AS VARCHAR) AS DOUBLE) AS term
  FROM grid g CROSS JOIN tot t
),
folded AS (
  SELECT list_reduce(list(term ORDER BY event_type, variant),
                     (a, b) -> a + b) AS chi2
  FROM terms
)
SELECT t.n, t.n_rows, t.n_cols,
       CAST((t.n_rows - 1) * (t.n_cols - 1) AS BIGINT) AS dof,
       f.chi2
FROM tot t CROSS JOIN folded f
"""


# ---------------------------------------------------------------------------
# Mann-Whitney U (stats.mannwhitney_u) — doubled midranks 2s + t + 1 per
# distinct value (exclusive prefix s over values ascending), exact
# HUGEINT rank/tie sums, VARCHAR-round-tripped to DOUBLE, one mirrored
# expression tree for the tie-corrected z.
# ---------------------------------------------------------------------------

ORACLES["mannwhitney_value_events"] = """
WITH src AS (
  SELECT CAST(user_id % 2 AS INT) AS variant,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
),
g AS (
  SELECT cents AS v, CAST(count(*) AS BIGINT) AS t,
         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a
  FROM src WHERE variant IN (0, 1) GROUP BY cents
),
p AS (
  SELECT v, t, a,
         CAST(COALESCE(sum(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS HUGEINT) AS s
  FROM g
),
agg AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a,
         CAST(sum(t - a) AS BIGINT) AS n_b,
         CAST(sum(CAST(a AS HUGEINT) * (s * 2 + t + 1)) AS HUGEINT) AS r2a,
         CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS ties,
         CAST(sum(CASE WHEN t > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS tie_groups
  FROM p
),
d AS (
  SELECT *,
         CAST(CAST(r2a AS VARCHAR) AS DOUBLE)
           - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) AS u2a,
         CAST(n_a AS DOUBLE) AS nad,
         CAST(n_b AS DOUBLE) AS nbd,
         CAST(CAST(ties AS VARCHAR) AS DOUBLE) AS tiesd
  FROM agg
)
SELECT n_a, n_b, u2a AS u2_a, tie_groups,
       CASE WHEN n_a > 0 AND n_b > 0 AND
            (nad * nbd / 12.0) * ((nad + nbd + 1.0)
              - tiesd / ((nad + nbd) * (nad + nbd - 1.0))) > 0
       THEN (u2a - nad * nbd)
            / (2.0 * sqrt((nad * nbd / 12.0) * ((nad + nbd + 1.0)
                - tiesd / ((nad + nbd) * (nad + nbd - 1.0)))))
       END AS z_stat
FROM d
"""


# ---------------------------------------------------------------------------
# Welch t-test + CUPED (stats.welch_ttest / cuped_adjustment) — exact
# HUGEINT sufficient statistics, VARCHAR round-trips for the >2^53 moment
# numerators, mirrored IEEE expression trees.
# ---------------------------------------------------------------------------

ORACLES["welch_ttest_user_value"] = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
v AS (SELECT CAST(user_id % 2 AS INT) AS variant, cents FROM u),
a AS (
  SELECT
    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN variant = 0 THEN CAST(cents AS HUGEINT)
             ELSE 0 END) AS HUGEINT) AS sa,
    CAST(sum(CASE WHEN variant = 1 THEN CAST(cents AS HUGEINT)
             ELSE 0 END) AS HUGEINT) AS sb,
    CAST(sum(CASE WHEN variant = 0 THEN CAST(cents AS HUGEINT) * cents
             ELSE 0 END) AS HUGEINT) AS qa,
    CAST(sum(CASE WHEN variant = 1 THEN CAST(cents AS HUGEINT) * cents
             ELSE 0 END) AS HUGEINT) AS qb
  FROM v
),
d AS (
  SELECT *,
         CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
         CAST(CAST(sa AS VARCHAR) AS DOUBLE) / CAST(n_a AS DOUBLE)
           AS mean_a,
         CAST(CAST(sb AS VARCHAR) AS DOUBLE) / CAST(n_b AS DOUBLE)
           AS mean_b,
         CAST(CAST(n_a * qa - sa * sa AS VARCHAR) AS DOUBLE)
           / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)) AS var_a,
         CAST(CAST(n_b * qb - sb * sb AS VARCHAR) AS DOUBLE)
           / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)) AS var_b
  FROM a
),
e AS (SELECT *, var_a / nad + var_b / nbd AS se2 FROM d)
SELECT n_a, n_b,
       CASE WHEN n_a > 0 THEN mean_a END AS mean_a,
       CASE WHEN n_b > 0 THEN mean_b END AS mean_b,
       CASE WHEN n_a > 1 THEN var_a END AS var_a,
       CASE WHEN n_b > 1 THEN var_b END AS var_b,
       CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0 THEN
         (mean_b - mean_a) / sqrt(se2) END AS t_stat,
       CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0 THEN
         (se2 * se2)
         / ((var_a / nad) * (var_a / nad) / (nad - 1.0)
            + (var_b / nbd) * (var_b / nbd) / (nbd - 1.0)) END AS dof
FROM e
"""

ORACLES["cuped_user_value"] = """
WITH u AS (
  SELECT user_id,
         CAST(COALESCE(sum(CASE WHEN CAST(ts AS TIMESTAMP)
                < TIMESTAMP '2024-01-16'
              THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
              END), 0) AS BIGINT) AS pre,
         CAST(COALESCE(sum(CASE WHEN CAST(ts AS TIMESTAMP)
                >= TIMESTAMP '2024-01-16'
              THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
              END), 0) AS BIGINT) AS post
  FROM events GROUP BY user_id
),
v AS (SELECT CAST(user_id % 2 AS INT) AS variant,
             CAST(pre AS HUGEINT) AS x, CAST(post AS HUGEINT) AS y
      FROM u),
a AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy,
         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_a,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_b,
         CAST(sum(CASE WHEN variant = 0 THEN x ELSE 0 END) AS HUGEINT)
           AS sxa,
         CAST(sum(CASE WHEN variant = 1 THEN x ELSE 0 END) AS HUGEINT)
           AS sxb,
         CAST(sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS HUGEINT)
           AS sya,
         CAST(sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS HUGEINT)
           AS syb
  FROM v
),
d AS (
  SELECT *,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS den,
         n * syy - sy * sy AS yden
  FROM a
),
e AS (
  SELECT *,
         CAST(CAST(num AS VARCHAR) AS DOUBLE)
           / CAST(CAST(den AS VARCHAR) AS DOUBLE) AS theta,
         CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
         CAST(CAST(sx AS VARCHAR) AS DOUBLE)
           / CAST(CAST(n AS VARCHAR) AS DOUBLE) AS mean_x,
         CAST(CAST(sya AS VARCHAR) AS DOUBLE) / CAST(n_a AS DOUBLE)
           AS mean_a,
         CAST(CAST(syb AS VARCHAR) AS DOUBLE) / CAST(n_b AS DOUBLE)
           AS mean_b
  FROM d
)
SELECT n_a, n_b,
       CASE WHEN n_a > 0 THEN mean_a END AS mean_a,
       CASE WHEN n_b > 0 THEN mean_b END AS mean_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN mean_b - mean_a END AS diff_mean,
       CASE WHEN den <> 0 THEN theta END AS theta,
       CASE WHEN den <> 0 AND yden <> 0 THEN
         (CAST(CAST(num AS VARCHAR) AS DOUBLE)
            / CAST(CAST(den AS VARCHAR) AS DOUBLE))
         * (CAST(CAST(num AS VARCHAR) AS DOUBLE)
            / CAST(CAST(yden AS VARCHAR) AS DOUBLE)) END AS rho2,
       CASE WHEN den <> 0 AND n_a > 0 AND n_b > 0 THEN
         mean_a - theta * (CAST(CAST(sxa AS VARCHAR) AS DOUBLE)
                             / CAST(n_a AS DOUBLE) - mean_x)
       END AS mean_adj_a,
       CASE WHEN den <> 0 AND n_a > 0 AND n_b > 0 THEN
         mean_b - theta * (CAST(CAST(sxb AS VARCHAR) AS DOUBLE)
                             / CAST(n_b AS DOUBLE) - mean_x)
       END AS mean_adj_b,
       CASE WHEN den <> 0 AND n_a > 0 AND n_b > 0 THEN
         (mean_b - theta * (CAST(CAST(sxb AS VARCHAR) AS DOUBLE)
                              / CAST(n_b AS DOUBLE) - mean_x))
         - (mean_a - theta * (CAST(CAST(sxa AS VARCHAR) AS DOUBLE)
                                / CAST(n_a AS DOUBLE) - mean_x))
       END AS diff_adj
FROM e
"""


# ---------------------------------------------------------------------------
# Round-6 batch: hybrid-retrieval fusion.
# ---------------------------------------------------------------------------

# RRF mirror: lexical list = the bm25_indexed oracle at top-50 (same
# integer-rational fixed-point ranks), semantic list = the embedding_topk
# oracle restricted to query vector 7 at k=50. Each RRF contribution is
# CAST(1 AS DOUBLE)/CAST(60+rank AS DOUBLE) (one correctly-rounded IEEE
# division of exact integers) and the sum is the same lex-then-sem chain
# as the Spark side, so fused doubles are bit-identical.
ORACLES["retrieval_rrf"] = f"""
WITH lex AS (
  SELECT doc_id, rank FROM ({_bm25_oracle(["merge", "stream", "vector"], 50)})
),
sem_scored AS (
  SELECT c.vec_id AS doc_id,
    {_DOT.replace('qv', 'q.embedding').replace('cv', 'c.embedding')}
      / ({_QNORM.replace('qv', 'q.embedding')}
         * {_CNORM.replace('cv', 'c.embedding')}) AS cos
  FROM embeddings c, (SELECT embedding FROM embeddings WHERE vec_id = 7) q
  WHERE c.vec_id <> 7
),
sem AS (
  SELECT doc_id,
    CAST(row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS BIGINT) AS rank
  FROM sem_scored
  QUALIFY rank <= 50
),
fused AS (
  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         CAST((l.rank IS NOT NULL) AS BIGINT)
           + CAST((s.rank IS NOT NULL) AS BIGINT) AS n_lists_hit,
         COALESCE(CAST(1 AS DOUBLE) / CAST(60 + l.rank AS DOUBLE),
                  CAST(0 AS DOUBLE))
           + COALESCE(CAST(1 AS DOUBLE) / CAST(60 + s.rank AS DOUBLE),
                      CAST(0 AS DOUBLE)) AS rrf
  FROM lex l FULL JOIN sem s ON l.doc_id = s.doc_id
)
SELECT doc_id, n_lists_hit, rrf,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT)
         AS rank
FROM fused
QUALIFY rank <= 20
"""


# Line-dedup mirror: same header/footer wrap, lines keyed by the shared
# stable-hash kernel, drop set = hashes spanning >= 10 distinct docs;
# string_agg(ORDER BY pos) rebuilds kept lines, COALESCE supplies the
# all-boilerplate empty string like array_join over an empty array.
ORACLES["dedup_lines_boilerplate"] = f"""
WITH wrapped AS (
  SELECT doc_id,
         '(c) example-corpus - all rights reserved' || chr(10) || text
           || chr(10) || 'fetched by crawler #' || CAST(doc_id % 7 AS VARCHAR)
           AS text
  FROM documents
),
sp AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM wrapped),
l AS (
  SELECT doc_id, unnest(parts) AS line,
         unnest(range(1, len(parts) + 1)) AS pos
  FROM sp
),
h AS (SELECT doc_id, pos, line, {O.stable_hash('line')} AS lh FROM l),
dup AS (
  SELECT lh FROM h GROUP BY lh HAVING count(DISTINCT doc_id) >= 10
),
m AS (
  SELECT h.doc_id, h.pos, h.line, (dup.lh IS NOT NULL) AS isdup
  FROM h LEFT JOIN dup ON h.lh = dup.lh
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN isdup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN NOT isdup THEN line END,
                           chr(10) ORDER BY pos), '') AS clean_text
FROM m
GROUP BY doc_id
"""


# Compaction-plan mirror: same bucketed inventory, one SQL window prefix
# sum (the oracle has no single-reducer concern), same offset//target
# integer bin arithmetic.
ORACLES["compaction_plan_files"] = """
WITH inv AS (
  SELECT 'part-' || lpad(CAST((o_orderkey - o_orderkey % 200) // 200
                              AS VARCHAR), 8, '0') AS file,
         CAST(sum(len(o_orderpriority) + 24) AS BIGINT) AS size_bytes
  FROM orders
  GROUP BY o_orderkey - o_orderkey % 200
),
c AS (
  SELECT file, size_bytes,
         sum(size_bytes) OVER (ORDER BY file ROWS UNBOUNDED PRECEDING)
           - size_bytes AS off
  FROM inv
)
SELECT file, size_bytes,
       CAST(off // 32768 AS BIGINT) AS bin,
       CAST(off % 32768 AS BIGINT) AS bin_offset
FROM c
"""



def _kcore_sql(k: int = 3, iterations: int = 8) -> str:
    """Unrolled k-core peeling mirror. Every iteration references the
    previous live-edge CTE THREE times (degree count + two endpoint
    joins): plain CTEs would inline 3^N-fold (the BPE lesson), so every
    generation is AS MATERIALIZED."""
    ctes = ["""e0 AS MATERIALIZED (
  SELECT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b FROM lineitem
  UNION
  SELECT l_suppkey * 2 + 1 AS a, l_partkey * 2 AS b FROM lineitem
)"""]
    for i in range(1, iterations + 1):
        ctes.append(f"""k{i} AS MATERIALIZED (
  SELECT a FROM e{i - 1} GROUP BY a HAVING count(*) >= {k}
)""")
        ctes.append(f"""e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{i - 1} e
  JOIN k{i} x ON e.a = x.a
  JOIN k{i} y ON e.b = y.a
)""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
       CAST(node // 2 AS BIGINT) AS id, core_degree
FROM (
  SELECT a AS node, CAST(count(*) AS BIGINT) AS core_degree
  FROM e{iterations} GROUP BY a
)
"""
    )


ORACLES["graph_kcore_supply"] = _kcore_sql(3, 8)


# Tokenizer round-trip mirror — deliberately an INDEPENDENT derivation:
# the Spark side compares the genuinely decoded text against the
# normalized token stream; the oracle derives the same flag as
# "no OOV token" from the tagged explode. A decode defect (positional
# order, vocab join, reassembly) flips the Spark flag but not the
# oracle's, so the gate catches it.
ORACLES["tokenizer_roundtrip_docs"] = f"""
WITH vtoks AS (
  SELECT unnest({_tokens('text')}) AS token FROM documents
),
vocab AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY count(*) DESC, token ASC)
             AS rnk
    FROM vtoks GROUP BY token
  ) WHERE rnk <= 29
),
d AS (SELECT doc_id, {_tokens('text')} AS toks FROM documents),
pos AS (
  SELECT doc_id, unnest(toks) AS token FROM d
),
tagged AS (
  SELECT p.doc_id, (v.token IS NULL) AS oov
  FROM pos p LEFT JOIN vocab v USING (token)
),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM tagged GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(per.n_oov, 0) AS BIGINT) AS n_oov,
       COALESCE(per.n_oov, 0) = 0 AS roundtrip_ok
FROM d LEFT JOIN per USING (doc_id)
"""


# Hard-negative mirror: same positive top-5 exclusion (cosine window),
# same salted-hash draw order; ANTI JOIN is the left_anti twin.
ORACLES["embedding_hard_negatives"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < 3
),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
    {_DOT} / ({_QNORM} * {_CNORM}) AS cos
  FROM c, q WHERE neighbor_id <> query_id
),
pos AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC
           ) AS rnk
    FROM scored
  ) WHERE rnk <= 5
),
rest AS (
  SELECT s.query_id, s.neighbor_id, s.cos
  FROM scored s ANTI JOIN pos p
    ON s.query_id = p.query_id AND s.neighbor_id = p.neighbor_id
),
ordd AS (
  SELECT query_id, neighbor_id, cos,
         {_h("CAST(query_id AS VARCHAR) || '_' || CAST(neighbor_id AS VARCHAR) || '_neg'")}
           AS o
  FROM rest
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY o ASC, neighbor_id ASC
       ) AS BIGINT) AS rank,
       cos
FROM ordd
QUALIFY rank <= 4
"""


# --- Round-7 additions ----------------------------------------------------

# orc_roundtrip_docs: Spark writes documents to ORC and reads it back;
# DuckDB cannot read ORC, so (exactly like avro/warc) the oracle is the
# source table itself — the value hash gates the whole write/read cycle.
ORACLES["orc_roundtrip_docs"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""

# dedup_url_canonical: both engines synthesize the SAME collision-rich
# URL (path keys on doc_id % 50, volatile parts on doc_id) and reuse the
# proven canonicalization mirror (_U_CANON) from url_parse_docs.
_COLLISION_URL_EXPR = (
    "'https://' || source || '.example.com/page/' || "
    "CAST(doc_id % 50 AS VARCHAR) || '?utm_source=crawl&ref=' || "
    "CAST(doc_id AS VARCHAR) || '#sec' || CAST(doc_id % 7 AS VARCHAR)"
)

ORACLES["dedup_url_canonical"] = f"""
WITH u AS (SELECT doc_id, {_COLLISION_URL_EXPR} AS url FROM documents)
SELECT {_U_CANON} AS url_canonical,
       CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM u GROUP BY url_canonical
"""

# lang_confusion_matrix: the lang_id scorer (same _lang_cols/_lang_pick
# builders) aggregated into a (true, predicted) grid with per-true-label
# row shares — exact int64 counts, one division on identical integers.
ORACLES["lang_confusion_matrix"] = f"""
WITH t AS (
  SELECT doc_id, lang, {_tokens('text')} AS toks FROM documents
),
scored AS (SELECT doc_id, lang, {_lang_cols} FROM t),
pred AS (SELECT doc_id, lang, {_lang_pick} AS predicted_lang FROM scored),
grid AS (
  SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM pred GROUP BY lang, predicted_lang
)
SELECT lang, predicted_lang, n_docs,
       CAST(n_docs AS DOUBLE)
         / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE) AS row_share
FROM grid
"""

# zipf_fit_tokens: integer-bits OLS (the doc_surprisal bits rule) over
# the top-1000 token frequencies; all regression sums exact int64, the
# slope one division on identical integers.
ORACLES["zipf_fit_tokens"] = f"""
WITH tok AS (
  SELECT unnest({_tokens('text')}) AS token FROM documents
),
freq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq
  FROM tok GROUP BY token
  ORDER BY freq DESC, token ASC LIMIT 1000
),
xy AS (
  SELECT
    CAST(length(bin(CAST(row_number() OVER (ORDER BY freq DESC, token ASC)
                         AS BIGINT))) AS BIGINT) AS x,
    CAST(length(bin(freq)) AS BIGINT) AS y
  FROM freq
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_fit,
         CAST(sum(x) AS BIGINT) AS sum_x,
         CAST(sum(y) AS BIGINT) AS sum_y,
         CAST(sum(x * x) AS BIGINT) AS sum_xx,
         CAST(sum(x * y) AS BIGINT) AS sum_xy
  FROM xy
)
SELECT n_fit, sum_x, sum_y, sum_xx, sum_xy,
       CAST(n_fit * sum_xy - sum_x * sum_y AS DOUBLE)
         / CAST(n_fit * sum_xx - sum_x * sum_x AS DOUBLE) AS zipf_slope
FROM s
"""

# ngram_novelty_release: contamination_screen inverted — batch = the
# deterministic doc_id % 4 = 3 quarter, prior = the rest; novelty =
# share of the batch doc's distinct 5-grams absent from the prior set.
ORACLES["ngram_novelty_release"] = f"""
WITH prior_grams AS (
  SELECT DISTINCT unnest({_doc_ngrams(5)}) AS gram
  FROM documents WHERE doc_id % 4 < 3
),
batch_docs AS (
  SELECT doc_id, {_doc_ngrams(5)} AS grams
  FROM documents WHERE doc_id % 4 = 3
),
batch_grams AS (
  SELECT doc_id, unnest(grams) AS gram FROM batch_docs
),
hits AS (
  SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_hit
  FROM batch_grams bg
  WHERE bg.gram IN (SELECT gram FROM prior_grams)
  GROUP BY bg.doc_id
)
SELECT d.doc_id,
       CAST(len(d.grams) AS BIGINT) AS n_grams,
       CAST(len(d.grams) - coalesce(h.n_hit, 0) AS BIGINT) AS n_novel,
       CASE WHEN len(d.grams) > 0 THEN
         CAST(len(d.grams) - coalesce(h.n_hit, 0) AS DOUBLE)
           / CAST(len(d.grams) AS DOUBLE)
       END AS novelty_ratio
FROM batch_docs d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""

# simjoin_containment_adjacent: the ngram_jaccard_adjacent mirror with
# directional denominators (Broder containment).
ORACLES["simjoin_containment_adjacent"] = f"""
WITH sh AS (
  SELECT doc_id, {_shingles('text')} AS sh FROM documents
),
pairs AS (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents)
SELECT p.id_a, p.id_b,
  CASE WHEN len(sa.sh) > 0 THEN
    CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
      / CAST(len(sa.sh) AS DOUBLE) END AS containment_ab,
  CASE WHEN len(sb.sh) > 0 THEN
    CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
      / CAST(len(sb.sh) AS DOUBLE) END AS containment_ba
FROM pairs p
JOIN sh sa ON sa.doc_id = p.id_a
JOIN sh sb ON sb.doc_id = p.id_b
"""

# remix_water_fill: the closed-form integer waterline — ascending-count
# exclusive prefix sums, per-row candidate (B - P) // remaining, first
# violating row's candidate is the line; no violation = unconstrained.
ORACLES["remix_water_fill"] = f"""
WITH counts AS (
  SELECT source, CAST(sum(len({_tokens('text')})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(n_tokens) // 2 AS BIGINT) AS b FROM counts),
ranked AS (
  SELECT c.source, c.n_tokens, t.b,
    CAST(row_number() OVER (ORDER BY c.n_tokens ASC, c.source ASC)
         AS BIGINT) AS k,
    CAST(coalesce(sum(c.n_tokens) OVER (
      ORDER BY c.n_tokens ASC, c.source ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p,
    CAST(count(*) OVER () AS BIGINT) AS m
  FROM counts c, tot t
),
cand AS (
  SELECT *, CAST((b - p) // (m - k + 1) AS BIGINT) AS c FROM ranked
),
line AS (
  SELECT min_by(c, k) AS waterline FROM cand WHERE c < n_tokens
)
SELECT r.source, r.n_tokens,
       CAST(l.waterline AS BIGINT) AS waterline,
       CAST(CASE WHEN l.waterline IS NOT NULL
                 THEN least(r.n_tokens, l.waterline)
                 ELSE r.n_tokens END AS BIGINT) AS granted
FROM cand r, line l
"""


# pack_efficiency_report: one aggregation over the SAME packing CTE as
# pack_sequences_docs (reused as a subquery — one source of truth).
ORACLES["pack_efficiency_report"] = f"""
WITH packed AS ({ORACLES["pack_sequences_docs"]})
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(seq_id) + 1 AS BIGINT) AS n_seqs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN seq_offset + n_tokens > 256 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_straddlers,
       CAST(sum(CASE WHEN seq_offset + n_tokens > 256 THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS straddle_share,
       CAST(sum(n_tokens) - 256 * (max(seq_id) + 1 - 1) AS DOUBLE) / 256.0
         AS tail_fill
FROM packed
"""

# vocab_coverage_curve: ranked vocab + k-grid (1..1024 by powers of 2);
# counts exact int64, one division per row on identical integers.
ORACLES["vocab_coverage_curve"] = f"""
WITH tok AS (
  SELECT unnest({_tokens('text')}) AS token FROM documents
),
freq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY token
),
ranked AS (
  SELECT freq, CAST(row_number() OVER (ORDER BY freq DESC, token ASC)
                    AS BIGINT) AS rank
  FROM freq
),
tot AS (
  SELECT CAST(sum(freq) AS BIGINT) AS total_tokens FROM ranked
),
ks AS (SELECT CAST(unnest([1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024])
               AS BIGINT) AS k)
SELECT ks.k,
       CAST(count(*) AS BIGINT) AS n_vocab_used,
       CAST(sum(r.freq) AS BIGINT) AS covered_tokens,
       t.total_tokens,
       CAST(sum(r.freq) AS DOUBLE) / CAST(t.total_tokens AS DOUBLE)
         AS coverage
FROM ks JOIN ranked r ON r.rank <= ks.k, tot t
GROUP BY ks.k, t.total_tokens
"""

# lang_id_kappa: chance-corrected agreement from the same _lang_pick
# scorer; all marginals exact int64, po/pe single divisions.
ORACLES["lang_id_kappa"] = f"""
WITH t AS (
  SELECT doc_id, lang, {_tokens('text')} AS toks FROM documents
),
scored AS (SELECT doc_id, lang, {_lang_cols} FROM t),
pred AS (SELECT doc_id, lang, {_lang_pick} AS predicted_lang FROM scored),
grid AS (
  SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
  FROM pred GROUP BY lang, predicted_lang
),
rows_m AS (SELECT lang AS cls, CAST(sum(n) AS BIGINT) AS rn
           FROM grid GROUP BY lang),
cols_m AS (SELECT predicted_lang AS cls, CAST(sum(n) AS BIGINT) AS cn
           FROM grid GROUP BY predicted_lang),
cross_m AS (
  SELECT CAST(sum(r.rn * c.cn) AS BIGINT) AS rc
  FROM rows_m r JOIN cols_m c ON r.cls = c.cls
),
base AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN lang = predicted_lang THEN n ELSE 0 END)
              AS BIGINT) AS n_agree
  FROM grid
)
SELECT b.n_docs, b.n_agree, x.rc,
  CAST(b.n_agree AS DOUBLE) / CAST(b.n_docs AS DOUBLE) AS po,
  CAST(x.rc AS DOUBLE) / CAST(b.n_docs * b.n_docs AS DOUBLE) AS pe,
  CASE WHEN x.rc = b.n_docs * b.n_docs THEN NULL ELSE
    (CAST(b.n_agree AS DOUBLE) / CAST(b.n_docs AS DOUBLE)
     - CAST(x.rc AS DOUBLE) / CAST(b.n_docs * b.n_docs AS DOUBLE))
    / (1.0 - CAST(x.rc AS DOUBLE) / CAST(b.n_docs * b.n_docs AS DOUBLE))
  END AS kappa
FROM base b, cross_m x
"""

# dedup_cluster_sizes: content-hash multiplicity histogram.
ORACLES["dedup_cluster_sizes"] = f"""
WITH clusters AS (
  SELECT {O.stable_hash('text')} AS h, CAST(count(*) AS BIGINT)
           AS cluster_size
  FROM documents GROUP BY h
)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(count(*) * cluster_size AS BIGINT) AS n_docs
FROM clusters GROUP BY cluster_size
"""

# source_lang_mix: dominant language per source with deterministic
# (count DESC, lang ASC) tie-break, shares on exact int64 counts.
ORACLES["source_lang_mix"] = """
WITH grid AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source, lang
),
ranked AS (
  SELECT source, lang, n,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, lang ASC) AS rk,
         CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS n_docs,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_langs
  FROM grid
)
SELECT source, n_docs, n_langs, lang AS top_lang,
       CAST(n AS DOUBLE) / CAST(n_docs AS DOUBLE) AS top_share
FROM ranked WHERE rk = 1
"""


# sample_customers_fixed_k: exact-k hash-rank sample, bucket + key order.
_FIXK_BUCKET = (
    "(" + O.stable_hash("(CAST(c_custkey AS VARCHAR) || '_fixk')") + " % 10000)"
)
ORACLES["sample_customers_fixed_k"] = f"""
SELECT c_custkey, c_mktsegment, CAST({_FIXK_BUCKET} AS BIGINT) AS bucket
FROM customer
ORDER BY {_FIXK_BUCKET} ASC, c_custkey ASC
LIMIT 100
"""

# fk_fanout_profile: one grouped count per FK edge + the parent count;
# UNION ALL of five 1-row edge summaries.
def _fanout_edge_sql(name: str, ptab: str, ctab: str, fk: str) -> str:
    return f"""
SELECT '{name}' AS edge,
  (SELECT CAST(count(*) AS BIGINT) FROM {ptab}) AS n_parents,
  CAST(count(*) AS BIGINT) AS parents_with_children,
  CAST(sum(n) AS BIGINT) AS n_children,
  CAST(min(n) AS BIGINT) AS min_fanout,
  CAST(max(n) AS BIGINT) AS max_fanout,
  CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_fanout
FROM (SELECT {fk}, count(*) AS n FROM {ctab} GROUP BY {fk})
"""


ORACLES["fk_fanout_profile"] = " UNION ALL ".join([
    _fanout_edge_sql("customer->orders", "customer", "orders", "o_custkey"),
    _fanout_edge_sql("orders->lineitem", "orders", "lineitem", "l_orderkey"),
    _fanout_edge_sql("part->lineitem", "part", "lineitem", "l_partkey"),
    _fanout_edge_sql("supplier->lineitem", "supplier", "lineitem",
                     "l_suppkey"),
    _fanout_edge_sql("nation->customer", "nation", "customer",
                     "c_nationkey"),
])

# char_entropy_docs: in-row char histogram, integer-bits entropy (the
# doc_surprisal rule). Comprehension variables avoid `i` (the inlined
# md5 helper binds it).
ORACLES["char_entropy_docs"] = """
WITH h AS (
  SELECT doc_id, length(text) AS n,
    [substr(text, cc, 1) for cc in range(1, length(text) + 1)] AS chars
  FROM documents
),
c AS (
  SELECT doc_id, CAST(n AS BIGINT) AS n_chars_counted,
    CAST(len(list_distinct(chars)) AS BIGINT) AS n_distinct_chars,
    [len(list_filter(chars, x -> x = ch))
     for ch in list_distinct(chars)] AS counts
  FROM h
)
SELECT doc_id, n_chars_counted, n_distinct_chars,
  CAST(coalesce(list_sum(
    [cnt * (length(bin(n_chars_counted)) - length(bin(cnt)))
     for cnt in counts]), 0) AS BIGINT) AS total_bits,
  CASE WHEN n_chars_counted > 0 THEN
    CAST(coalesce(list_sum(
      [cnt * (length(bin(n_chars_counted)) - length(bin(cnt)))
       for cnt in counts]), 0) AS DOUBLE)
      / CAST(n_chars_counted AS DOUBLE)
  END AS mean_bits_per_char
FROM c
"""


# events_user_gini: the textbook rank formula over per-user counts;
# sums in HUGEINT-exact DECIMAL(38,0), the final division on doubles
# round-tripped through VARCHAR (the DECIMAL->DOUBLE double-rounding
# gotcha) so both engines divide identical doubles.
ORACLES["events_user_gini"] = """
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY user_id
),
r AS (
  SELECT x, CAST(row_number() OVER (ORDER BY x ASC, user_id ASC)
                 AS BIGINT) AS rk
  FROM c
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(sum(CAST(rk AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS srx
  FROM r
)
SELECT n AS n_entities, CAST(sx AS BIGINT) AS total,
  CASE WHEN n >= 2 AND sx > 0 THEN
    CAST(CAST(2 * srx - (n + 1) * sx AS VARCHAR) AS DOUBLE)
      / CAST(CAST(n * sx AS VARCHAR) AS DOUBLE)
  END AS gini
FROM s
"""

# dup_span_islands: the scrub_dup_spans cover merged into maximal spans
# via gaps-and-islands (cpos - per-doc rank constant within a run).
ORACLES["dup_span_islands"] = f"""
WITH d AS (SELECT doc_id, {_tokens('text')} AS toks FROM documents),
gr AS (
  SELECT doc_id, sg['p'] AS p, sg['g'] AS gram
  FROM (
    SELECT doc_id,
           unnest([{{'p': s, 'g': array_to_string(toks[s+1:s+8], ' ')}}
                   for s in range(0, greatest(len(toks) - 8, 0) + 1)]) AS sg
    FROM d WHERE len(toks) > 0
  )
),
dup AS (
  SELECT gram FROM gr GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
cov AS (
  SELECT DISTINCT doc_id, unnest(range(p, p + 8)) AS cpos
  FROM gr WHERE gram IN (SELECT gram FROM dup)
),
isl AS (
  SELECT doc_id, cpos,
         cpos - row_number() OVER (PARTITION BY doc_id ORDER BY cpos)
           AS island
  FROM cov
)
SELECT doc_id, CAST(min(cpos) AS BIGINT) AS span_start,
       CAST(count(*) AS BIGINT) AS span_len
FROM isl GROUP BY doc_id, island
"""

# bm25_rm3_expansion: RM3 feedback terms over the bm25 top-10 — exact
# integer (tf * score_fp) // dl contributions (both engines truncate
# identically on positive int64), excluding the original query terms.
ORACLES["bm25_rm3_expansion"] = f"""
WITH fb AS (
  SELECT doc_id, score_fp
  FROM ({_bm25_oracle(["merge", "stream", "vector"], 10)})
),
toks AS (
  SELECT d.doc_id, f.score_fp, unnest({_tokens('text')}) AS term
  FROM documents d JOIN fb f USING (doc_id)
),
dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
),
tf AS (
  SELECT doc_id, term, score_fp, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term, score_fp
),
contrib AS (
  SELECT term, CAST((tf.tf * tf.score_fp) // dl.dl AS BIGINT) AS c
  FROM tf JOIN dl USING (doc_id)
  WHERE term NOT IN ('merge', 'stream', 'vector')
),
scored AS (
  SELECT term, CAST(sum(c) AS BIGINT) AS weight_fp,
         CAST(count(*) AS BIGINT) AS n_fb_docs
  FROM contrib GROUP BY term
  ORDER BY weight_fp DESC, term LIMIT 15
)
SELECT term, weight_fp,
       CAST(weight_fp AS DOUBLE) / 1048576.0 AS weight,
       n_fb_docs,
       CAST(row_number() OVER (ORDER BY weight_fp DESC, term) AS BIGINT)
         AS rank
FROM scored
"""

# source_kl_tokens: per-source whole-bits KL vs the corpus unigram mix;
# bit-length SUMS only (no n*N products — int64-safe at any scale).
ORACLES["source_kl_tokens"] = f"""
WITH tok AS (
  SELECT source AS g, unnest({_tokens('text')}) AS w FROM documents
),
ts AS (
  SELECT g, w, CAST(count(*) AS BIGINT) AS nts FROM tok GROUP BY g, w
),
tc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS nt FROM tok GROUP BY w
),
gt AS (
  SELECT g, CAST(sum(nts) AS BIGINT) AS ns,
         CAST(count(*) AS BIGINT) AS nterms
  FROM ts GROUP BY g
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
contrib AS (
  SELECT ts.g, gt.ns, gt.nterms,
         CAST(ts.nts * (CAST(length(bin(ts.nts)) AS BIGINT)
                        + CAST(length(bin(tot.n)) AS BIGINT)
                        - CAST(length(bin(gt.ns)) AS BIGINT)
                        - CAST(length(bin(tc.nt)) AS BIGINT))
              AS BIGINT) AS c
  FROM ts JOIN tc USING (w) JOIN gt USING (g) CROSS JOIN tot
)
SELECT g AS source, ns AS n_tokens, nterms AS n_terms,
       CAST(sum(c) AS BIGINT) AS kl_bits_total,
       CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / CAST(ns AS DOUBLE)
         AS mean_kl_bits
FROM contrib GROUP BY g, ns, nterms
"""


# ---------------------------------------------------------------------------
# Byte-level BPE (GPT-2 byte encoder — operators/textprep.py
# byte_bpe_train/byte_bpe_segment/byte_bpe_decode). Same unrolled
# MATERIALIZED iteration chain as the word-level trainer (_bpe_iter_parts
# is shared); only v0 differs: pre-tokens via the RE2/Java-identical
# GPT-2 regex, sequences are UTF-8 bytes remapped through the
# BYTE_BPE_SYMBOLS bijection (imported from the Spark side — one source
# of truth, no drift).

from ..operators.textprep import (  # noqa: E402  (appended section)
    BYTE_BPE_PRETOKEN_RE,
    BYTE_BPE_SYMBOLS,
)

_BSYMS_SQL = "'" + BYTE_BPE_SYMBOLS.replace("'", "''") + "'"
# Backslashes verbatim (RE2 raw strings); apostrophes doubled because the
# regex is embedded in a single-quoted SQL literal (a SQL-layer escape,
# not a regex change — RE2 still sees single quotes).
_BRE = BYTE_BPE_PRETOKEN_RE.replace("'", "''")
_HEXD = "'0123456789ABCDEF'"


def _byte_pretokens(text: str) -> str:
    return f"regexp_extract_all({text}, '{_BRE}')"


def _byte_seq_sql(hx: str) -> str:
    """Space-joined remapped byte symbols from an uppercase-hex column:
    each hex pair indexes one char of the 256-char symbol table
    (byte + 1 = 16 * hi + lo with 1-based strpos). Empty hex -> ''."""
    return (
        f"array_to_string([substr({_BSYMS_SQL}, "
        f"16 * (strpos({_HEXD}, substr({hx}, 2 * bj - 1, 1)) - 1) "
        f"+ strpos({_HEXD}, substr({hx}, 2 * bj, 1)), 1) "
        f"for bj in range(1, len({hx}) // 2 + 1)], ' ')"
    )


def _byte_bpe_cte_parts(n_merges: int) -> list[str]:
    parts = [
        "words AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq "
        "FROM ("
        f"SELECT unnest({_byte_pretokens('text')}) AS w FROM documents) "
        "GROUP BY w)",
        f"v0 AS MATERIALIZED (SELECT freq, {_byte_seq_sql('hx')} AS seq "
        "FROM (SELECT freq, hex(encode(w)) AS hx FROM words))",
    ]
    parts.extend(_bpe_iter_parts(n_merges))
    return parts


def _byte_bpe_oracle(n_merges: int) -> str:
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS iteration, "
        f"split_part(pair, ' ', 1) AS \"left\", "
        f"split_part(pair, ' ', 2) AS \"right\", "
        f"replace(pair, ' ', '') AS merged, cnt AS pair_count FROM b{i}"
        for i in range(n_merges)
    ]
    return ("WITH " + ",\n".join(_byte_bpe_cte_parts(n_merges)) + "\n"
            + "\nUNION ALL ".join(selects))


def _byte_bpe_encode_oracle(n_merges: int) -> str:
    parts = _byte_bpe_cte_parts(n_merges)
    parts.append(f"""tok AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(pts, 1) AS pos, unnest(pts) AS w
  FROM (SELECT doc_id, {_byte_pretokens('text')} AS pts FROM documents)
)""")
    parts.append(
        f"s0 AS MATERIALIZED (SELECT doc_id, pos, {_byte_seq_sql('hx')} "
        "AS seq FROM (SELECT doc_id, pos, hex(encode(w)) AS hx FROM tok))"
    )
    for i in range(n_merges):
        parts.append(f"""s{i + 1} AS MATERIALIZED (
  SELECT doc_id, pos, {_bpe_seq_rewrite(f'b{i}')} AS seq
  FROM s{i}
)""")
    parts.append(f"""agg AS (
  SELECT doc_id, string_agg(seq, ' ' ORDER BY pos) AS pieces
  FROM s{n_merges} GROUP BY doc_id
)""")
    return ("WITH " + ",\n".join(parts) + """
SELECT d.doc_id,
       CAST(CASE WHEN a.pieces IS NULL OR a.pieces = '' THEN 0
                 ELSE len(string_split(a.pieces, ' ')) END AS BIGINT)
         AS n_pieces,
       COALESCE(a.pieces, '') AS pieces
FROM documents d LEFT JOIN agg a USING (doc_id)""")


ORACLES["byte_bpe_train_corpus"] = _byte_bpe_oracle(8)
ORACLES["byte_bpe_encode_docs"] = _byte_bpe_encode_oracle(8)

# Round-trip losslessness as a DRIVER-VISIBLE contract: the Spark side
# trains 8 merges, encodes every document, and decodes the pieces back;
# the oracle is simply the original table. A value-hash match therefore
# PROVES decode(encode(x)) == x over the whole fixture corpus in the
# driver's own comparison, not just in pytest.
ORACLES["byte_bpe_roundtrip_docs"] = "SELECT doc_id, text FROM documents"

# iceberg_roundtrip_docs: Spark commits documents as two snapshots of an
# identity-partitioned Iceberg table and reads the current snapshot back
# through the metadata tree; DuckDB cannot walk Iceberg metadata, so
# (exactly like orc/avro/warc) the oracle is the source table — the
# value hash gates the whole commit/plan/read cycle.
ORACLES["iceberg_roundtrip_docs"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""

# iceberg_v2_delete_docs: Spark commits documents as a format-version-2
# table, deletes a predicate's rows via POSITION DELETE files, and reads
# the survivors back merge-on-read; the oracle is the source table under
# the negated predicate — the value hash gates the sequence-number /
# delete-manifest / (file_path, row_index) anti-join cycle exactly.
ORACLES["iceberg_v2_delete_docs"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE NOT (doc_id % 7 = 0 OR lang = 'de')
"""


def _byte_bpe_fertility_oracle(n_merges: int) -> str:
    """Byte-level fertility scorecard: the byte_bpe encode CTE chain,
    aggregated per document (pieces + pre-token counts) then per
    language with byte totals (strlen = UTF-8 bytes, mirroring Spark's
    octet_length)."""
    parts = _byte_bpe_cte_parts(n_merges)
    parts.append(f"""tok AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(pts, 1) AS pos, unnest(pts) AS w
  FROM (SELECT doc_id, {_byte_pretokens('text')} AS pts FROM documents)
)""")
    parts.append(
        f"s0 AS MATERIALIZED (SELECT doc_id, pos, {_byte_seq_sql('hx')} "
        "AS seq FROM (SELECT doc_id, pos, hex(encode(w)) AS hx FROM tok))"
    )
    for i in range(n_merges):
        parts.append(f"""s{i + 1} AS MATERIALIZED (
  SELECT doc_id, pos, {_bpe_seq_rewrite(f'b{i}')} AS seq FROM s{i}
)""")
    parts.append(f"""perdoc AS (
  SELECT doc_id,
         CAST(sum(len(string_split(seq, ' '))) AS BIGINT) AS n_pieces,
         CAST(count(*) AS BIGINT) AS n_pretokens
  FROM s{n_merges} GROUP BY doc_id
)""")
    return ("WITH " + ",\n".join(parts) + """
, agg AS (
  SELECT d.lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(sum(p.n_pretokens), 0) AS BIGINT) AS total_pretokens,
         CAST(COALESCE(sum(p.n_pieces), 0) AS BIGINT) AS total_pieces,
         CAST(sum(strlen(d.text)) AS BIGINT) AS total_bytes
  FROM documents d LEFT JOIN perdoc p USING (doc_id)
  GROUP BY d.lang
)
SELECT lang, n_docs, total_pretokens, total_pieces, total_bytes,
       CASE WHEN total_pretokens > 0 THEN
         CAST(total_pieces AS DOUBLE) / CAST(total_pretokens AS DOUBLE)
       END AS pieces_per_pretoken,
       CASE WHEN total_pieces > 0 THEN
         CAST(total_bytes AS DOUBLE) / CAST(total_pieces AS DOUBLE)
       END AS bytes_per_piece
FROM agg""")


ORACLES["byte_bpe_fertility_langs"] = _byte_bpe_fertility_oracle(8)

# iceberg_v2_upsert_docs: Spark upserts every tenth document into a v2
# table via equality-delete + append (the CDC MERGE pattern); the oracle
# amends the same rows in place — the value hash gates the equality_ids /
# sequence-rule / null-safe-key anti-join cycle and last-write-wins.
ORACLES["iceberg_v2_upsert_docs"] = """
SELECT doc_id,
       CASE WHEN doc_id % 10 = 0 THEN text || ' [v2]' ELSE text END
         AS text,
       lang, source, n_chars
FROM documents
"""

# iceberg_compact_docs: Spark deletes a predicate's rows then compacts
# (one REPLACE snapshot of the merge-on-read view, sorted) — compaction
# must change LAYOUT only, so the oracle is the same negated-predicate
# filter as before the rewrite.
ORACLES["iceberg_compact_docs"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE doc_id % 5 <> 2
"""

# iceberg_migrate_docs: documents -> Delta commit -> in-place Iceberg
# migration over the same files -> v2 position delete -> metadata-walk
# read; the oracle filters the source table by the negated predicate.
ORACLES["iceberg_migrate_docs"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE doc_id % 9 <> 4
"""

# pipeline_release_corpus: gopher keep -> grouped split by source ->
# 5-gram decontamination of train against the released test split.
# Composition oracle: embeds the gopher oracle whole (min_stopwords=1,
# pinned on BOTH sides — the fixture corpus carries at most one of the 8
# English stop words per doc, so the paper default of 2 empties the
# pipeline at stage 1 and the gate proves nothing), reuses the
# grouped-split bucket and the contamination gram CTE shapes.
ORACLES["pipeline_release_corpus"] = f"""
WITH gf AS ({_gopher_flags_sql(min_stopwords=1)}),
split_docs AS (
  SELECT d.doc_id, d.source, d.text,
         CASE WHEN {_GSPLIT_BUCKET} < 8000 THEN 'train'
              WHEN {_GSPLIT_BUCKET} < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM documents d JOIN gf ON gf.doc_id = d.doc_id AND gf.keep
),
test_grams AS (
  SELECT DISTINCT unnest({_doc_ngrams(5)}) AS gram
  FROM split_docs WHERE split = 'test'
),
train_docs AS (
  SELECT doc_id, {_doc_ngrams(5)} AS grams
  FROM split_docs WHERE split = 'train'
),
train_hits AS (
  SELECT tg.doc_id, CAST(count(*) AS BIGINT) AS n_hit
  FROM (SELECT doc_id, unnest(grams) AS gram FROM train_docs) tg
  WHERE tg.gram IN (SELECT gram FROM test_grams)
  GROUP BY tg.doc_id
),
flagged AS (
  SELECT d.doc_id
  FROM train_docs d LEFT JOIN train_hits h ON d.doc_id = h.doc_id
  WHERE len(d.grams) > 0
    AND 100 * coalesce(h.n_hit, 0) >= 20 * len(d.grams)
)
SELECT doc_id, source, split FROM split_docs
WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
"""

# iceberg_transforms_orders: orders -> multi-field transformed Iceberg
# spec (month x bucket[8]) -> transform-pruned read. The pruning is an
# optimization the residual filter makes exact, so the oracle is the
# plain filtered source table; timestamps cross the gate as epoch-micro
# bigints per the house rule.
ORACLES["iceberg_transforms_orders"] = """
SELECT o_orderkey, o_custkey,
  epoch_us(o_orderdate) AS o_orderdate_us,
  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-06-01' AND o_custkey = 14
"""

# iceberg_rename_docs: commit half -> rename n_chars -> len_chars
# (metadata-only) -> append the rest under the new name -> v2 position
# delete ON the renamed column -> name-mapping read. The oracle is the
# aliased source under the negated predicate.
ORACLES["iceberg_rename_docs"] = """
SELECT doc_id, text, lang, source, n_chars AS len_chars
FROM documents WHERE n_chars % 5 <> 1
"""

# iceberg_evolution_docs: identity-on-lang spec -> evolve default to
# bucket[4](source) -> append under the new spec -> v2 position delete
# across both generations -> lang-predicated read (per-file-spec
# pruning + residual). Oracle: plain filter minus the deleted slice.
ORACLES["iceberg_evolution_docs"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE lang = 'en' AND doc_id % 6 <> 3
"""

# iceberg_decimal_orders: exact decimal(12,2) price (integer cents via
# floor(x*100) — identical IEEE ops both engines) -> Iceberg spec
# truncate[2000000] x bucket[8] on the DECIMAL source -> range-pruned
# read. Pruning is an optimization the residual makes exact, so the
# oracle is the integer-cents filter; the DOUBLE exit is exact both
# ways (cents < 2^53, one correctly-rounded divide).
ORACLES["iceberg_decimal_orders"] = """
WITH c AS (
  SELECT o_orderkey, o_custkey,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_custkey, cents / 100.0 AS price_d
FROM c WHERE cents >= 35000000 AND cents < 36000000
"""

# iceberg_tag_docs: commit half -> tag v1 -> append rest -> v2 position
# delete on the head -> expire to keep_last=1 -> read ref="v1". The tag
# pins its snapshot through the later commits AND the expiry (refs
# retain), so the oracle is the plain pre-append, pre-delete half.
ORACLES["iceberg_tag_docs"] = """
SELECT doc_id, text, lang, source, n_chars
FROM documents WHERE doc_id % 2 = 0
"""

# iceberg_partitions_orders: orders under month x truncate[5000000]
# (exact integer cents) -> the partitions METADATA table's per-tuple
# row counts. Oracle: the same binning as a plain GROUP BY — month
# index is months-since-1970 (wall clock, both engines), the truncate
# bin is the cents floored to a multiple of 5e6, exact in DOUBLE
# (integer dollar multiples of 50000).
ORACLES["iceberg_partitions_orders"] = """
WITH c AS (
  SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderdate
  FROM orders
)
SELECT CAST((year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1
            AS INTEGER) AS month_idx,
       CAST(cents - cents % 5000000 AS DOUBLE) / 100 AS price_bin,
       COUNT(*) AS n_rows
FROM c
GROUP BY 1, 2
"""
