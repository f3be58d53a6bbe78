"""Exact set-similarity join with prefix filtering (PPJoin-style).

The third leg of the dedup/similarity stack: MinHash-LSH trades recall
for speed, brute force trades speed for recall — prefix filtering gives
EXACT results (lossless for pairs at-or-above the threshold) while
pruning the candidate space by orders of magnitude.

Theory (Chaudhuri et al., Bayardo et al. — the classic prefix-filtering
guarantee): order every document's distinct tokens by one global total
order (ascending corpus frequency, then token text). For Jaccard ≥ θ,
any qualifying pair has overlap ≥ ceil(θ·|x|) for each side x, so the
first ``|x| − ceil(θ·|x|) + 1`` tokens of each side (its *prefix*) must
contain a COMMON token. Candidates = pairs sharing ≥1 prefix token;
everything else is safely pruned. Rare-first ordering makes prefixes
low-frequency, so the candidate join is small and skew-resistant by
construction (hot tokens land at the END of the order, outside prefixes).

Determinism: the threshold is a rational num/den; the qualifying test is
``inter·den ≥ num·union`` in exact integers — the emitted jaccard double
is one exact-int division. Prefix lengths use integer ceil
(``(n·num + den − 1) div den``).

Scale (100 TB): token-frequency pass (combinable) + distributed
vocabulary rank (two-pass prefix sum, no vocab-sized single-partition
window) + per-doc sort (one shuffle on doc id) + candidate equi-join on
prefix ranks + verification on joined rank arrays. Tokens travel as
int64 vocabulary ranks from the signature stage on, so the verify join
carries int arrays, not strings — the payload that dominates the exact
join's cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textops as T


def _sorted_token_arrays(
    df: DataFrame, text_col: str, id_col: str,
    cache_owner: list | None = None,
) -> DataFrame:
    """(id, arr) with each document's distinct tokens as int64 VOCABULARY
    RANKS, ascending — rank = position under the global (corpus
    frequency, token) order, assigned by the distributed two-pass rank
    (``stats.global_ranks``), so no single-reducer vocabulary window.

    Ranks rather than strings for two reasons: the shared global order
    prefix filtering requires is the rank order itself (an array sort on
    longs), and the verify join then carries int64 arrays instead of
    string arrays — measured 2.6x faster end-to-end at sf0.1 (the verify
    payload and its hash probes dominate). The token<->rank bijection
    leaves every intersection/union count — and therefore the oracle
    contract — unchanged.
    """
    from .stats import global_ranks

    tok = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(T.tokens(F.col(text_col)))).alias("token"),
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("__f"))
    ranked, _ = global_ranks(freq, "__f", "token", cache_owner=cache_owner)
    return (
        tok.join(ranked, "token")
        .groupBy("__id")
        .agg(F.array_sort(F.collect_list("__rank")).alias("__arr"))
    )


def jaccard_join(
    df: DataFrame,
    threshold: tuple[int, int] = (3, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_owner: list | None = None,
) -> DataFrame:
    """All pairs with token-set Jaccard ≥ num/den — exact, via prefix
    filtering. Output: ``id_a, id_b, n_inter, n_union, jaccard``
    (id_a < id_b). ``cache_owner`` receives the vocabulary-rank
    projection (``stats.global_ranks`` contract).
    """
    num, den = threshold
    # r12: the rank-array projection feeds THREE plan subtrees (prefix
    # explode + both verify joins); lazy, each reference re-runs the
    # token explode, the vocabulary-rank shuffle join and the
    # collect_list aggregation (the dominant cost — 17 parquet scans in
    # the pre-change plan, arrs alone 2.3 s of the query's 11 s at
    # sf0.1, x3). Materialize it ONCE via eager localCheckpoint; the
    # pinned global_ranks range layout is only needed while that single
    # computation runs, so the rank cache is released right after
    # unless the caller took ownership.
    own: list = []
    arrs = _sorted_token_arrays(
        df, text_col, id_col, cache_owner if cache_owner is not None else own
    ).localCheckpoint(eager=True)
    for pinned in own:
        pinned.unpersist()
    n = F.size("__arr")
    # prefix length: n - ceil(n*num/den) + 1, integer ceil
    plen = n - F.floor((n * num + den - 1) / den).cast("int") + 1
    # Candidate generation carries ONLY (id, size, prefix token) — the
    # token arrays attach after the distinct, so the (potentially large)
    # pre-dedup join never shuffles array payloads. The classic length
    # filter rides the join: Jaccard >= num/den forces
    # den*|x| >= num*|y| both ways, which on high thresholds prunes most
    # prefix collisions before they exist as rows.
    pref = arrs.select(
        "__id", n.alias("__n"), F.explode(F.slice("__arr", 1, plen)).alias("ptok")
    )
    left = pref.select(
        F.col("__id").alias("id_a"), F.col("__n").alias("__na"), "ptok"
    )
    right = pref.select(
        F.col("__id").alias("id_b"), F.col("__n").alias("__nb"),
        F.col("ptok").alias("__ptok_b"),
    )
    cand = (
        left.join(
            right,
            (F.col("ptok") == F.col("__ptok_b"))
            & (F.col("id_a") < F.col("id_b"))
            & (F.col("__na") * den >= F.col("__nb") * num)
            & (F.col("__nb") * den >= F.col("__na") * num),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    verified = (
        cand.join(arrs.select(F.col("__id").alias("id_a"),
                              F.col("__arr").alias("__aa")), "id_a")
        .join(arrs.select(F.col("__id").alias("id_b"),
                          F.col("__arr").alias("__ab")), "id_b")
    )
    inter = F.size(F.array_intersect("__aa", "__ab"))
    union = F.size("__aa") + F.size("__ab") - inter
    # The threshold test references the intersection twice (n_inter and
    # inside n_union); Catalyst pushes it into the verify join where no
    # subexpression elimination runs, so every candidate paid the
    # O(|a|+|b|) intersect twice. Bind it once as a lambda leaf for the
    # PREDICATE (evaluated per candidate); the output columns below
    # compute only for survivors. Same integers reach the same test.
    total = F.size("__aa") + F.size("__ab")
    ok = F.transform(
        F.array(F.size(F.array_intersect("__aa", "__ab"))),
        lambda i: i.cast("long") * den
        >= num * (total - i).cast("long"),
    )[0]
    return (
        verified.where(ok)
        .select(
            "id_a", "id_b",
            inter.cast("long").alias("n_inter"),
            union.cast("long").alias("n_union"),
        )
        .select(
            "id_a", "id_b", "n_inter", "n_union",
            (F.col("n_inter").cast("double") / F.col("n_union").cast("double"))
            .alias("jaccard"),
        )
    )
