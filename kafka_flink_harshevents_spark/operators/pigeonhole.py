"""Pigeonhole-blocked Hamming-distance pair generation (Manku et al.'s
simhash-dedup scheme, WWW 2007), shared by the text (SimHash) and media
(perceptual-hash) near-dup paths.

A ``bits``-wide fingerprint split into ``n_blocks`` disjoint blocks:
any pair within Hamming distance ``n_blocks − 1`` shares at least one
identical block, so candidate generation is an equi-join on
(block_idx, block_value) with EXACT recall for
``max_hamming ≤ n_blocks − 1``, and verification is one xor-popcount
per candidate.

Scale shape: block extraction is shifts/masks on the long fingerprint
(no division — longs don't survive double-precision division); the
groupBy on the block key evaluates the fingerprint pipeline ONCE and
emits each bucket's ordered pairs array-locally (no self-join
re-evaluation). Shuffle ∝ colliding items, never all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pigeonhole_pairs(
    fps: DataFrame,
    id_col: str,
    fp_col: str,
    bits: int,
    n_blocks: int,
    max_hamming: int,
) -> DataFrame:
    """``(id, fingerprint)`` rows → ``(da, db, hamming)`` unordered
    pairs with ``hamming ≤ max_hamming`` (exact recall iff
    ``max_hamming ≤ n_blocks − 1``)."""
    assert bits % n_blocks == 0, "blocks must tile the fingerprint"
    assert max_hamming < n_blocks, (
        "pigeonhole recall is exact only for max_hamming <= n_blocks - 1; "
        "raise n_blocks (finer blocks) to widen the radius"
    )
    f = fps.select(F.col(id_col).alias("pid"), F.col(fp_col).alias("pfp"))
    width = bits // n_blocks
    mask = (1 << width) - 1
    block_structs = [
        F.struct(
            F.lit(i).alias("bi"),
            F.shiftright(F.col("pfp"), (n_blocks - 1 - i) * width)
            .bitwiseAND(F.lit(mask))
            .alias("bv"),
        )
        for i in range(n_blocks)
    ]
    blocks = f.select(
        "pid", "pfp", F.explode(F.array(*block_structs)).alias("x")
    ).select("pid", "pfp", F.col("x.bi").alias("bi"), F.col("x.bv").alias("bv"))
    buckets = (
        blocks.groupBy("bi", "bv")
        .agg(F.sort_array(F.collect_list(F.struct("pid", "pfp"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pair_expr = F.expr(
        """flatten(
               transform(ds, (x, i) ->
                   transform(slice(ds, i + 2, size(ds) - i - 1),
                             y -> struct(x.pid AS da, y.pid AS db,
                                         CAST(bit_count(x.pfp ^ y.pfp) AS BIGINT)
                                             AS hamming))))"""
    )
    return (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.*")
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
