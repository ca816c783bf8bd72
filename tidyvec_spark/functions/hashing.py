"""Portable content hashing for dedup / fingerprint operators.

The dedup family (exact, MinHash-LSH, SimHash) needs hash functions that
are (a) computable as native Spark SQL expressions — JVM-side, codegen,
no Python in the hot path — and (b) *bit-identical* in the DuckDB oracle
so every operator stays hash-checkable. Spark's ``xxhash64``/``hash``
have no DuckDB twin, so the engine standardizes on a 60-bit integer
derived from md5:

    md5_long(s) = int(hex(md5(s))[0:15], 16)        # 60 bits, fits BIGINT

Spark:   ``CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)``
DuckDB:  ``CAST(('0x' || substr(md5(s), 1, 15)) AS UBIGINT)``

60 bits is plenty for dedup banding (collision odds at 100 TB doc counts
are dominated by the *band* width, not the hash width) and stays positive
in a signed 64-bit long on both engines.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def md5_long(c: ColumnOrName) -> Column:
    """60-bit integer hash of a string column (see module docstring)."""
    return F.conv(F.substring(F.md5(_col(c)), 1, 15), 16, 10).cast("long")


MINHASH_MASK = (1 << 30) - 1          # base hash reduced to 30 bits (< P)
MINHASH_P = (1 << 31) - 1             # Mersenne prime 2^31-1 (Carter-Wegman)
_MINHASH_SEED = 1789


def minhash_coeffs(num_hashes: int, seed: int = _MINHASH_SEED) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the universal-hash family
    h_i(x) = (a_i·x + b_i) mod (2^31−1) over 30-bit base hashes.

    P must be SMALL relative to a_i·x so the mod wraps many times and
    scrambles the input order — with a large P the family degenerates to
    monotone maps that all pick the same minimum element. a_i·x + b_i <
    2^61 + 2^31 stays exact in a signed 64-bit integer on BOTH engines,
    so the family is bit-reproducible in DuckDB SQL with the same
    literals.
    """
    import random as _random

    rng = _random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P))
        for _ in range(int(num_hashes))
    ]


def minhash_signature(shingles: ColumnOrName, num_hashes: int = 16) -> Column:
    """MinHash signature: array<long> of length ``num_hashes``.

    sig[i] = min over shingles s of (a_i·(md5_long(s) & MASK) + b_i) mod P
    with P = 2^31−1.
    One md5 per shingle; the ``num_hashes`` family members are integer
    arithmetic derived from that single base hash inside ONE fold —
    higher-order functions are interpreted (not codegen) and re-evaluate
    their argument expression per outer-lambda iteration, so the naive
    "md5(seed||s) per (i, s)" formulation costs num_hashes× the md5 work.
    Entirely JVM-side, no shuffle — the signature step stays map-side at
    100 TB. Integer min is order-independent, so the DuckDB oracle may
    use the simpler per-i array_min form with guaranteed bit parity.

    Rows with an empty shingle array get an empty signature — callers
    must filter those out before banding (they can never match).
    """
    sh = _col(shingles)
    coeffs = minhash_coeffs(num_hashes)
    ab_lit = F.array(
        *[
            F.struct(F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b"))
            for a, b in coeffs
        ]
    )
    base = F.transform(sh, lambda s: md5_long(s).bitwiseAND(F.lit(MINHASH_MASK)))
    init = F.array_repeat(F.lit(MINHASH_P).cast("long"), int(num_hashes))
    sig = F.aggregate(
        base,
        init,
        lambda acc, hm: F.zip_with(
            acc,
            ab_lit,
            lambda m, ab: F.least(m, (ab["a"] * hm + ab["b"]) % F.lit(MINHASH_P)),
        ),
    )
    return F.when(F.size(sh) > 0, sig).otherwise(F.array().cast("array<bigint>"))


def band_hash(sig: ColumnOrName, band: Column, rows_per_band: int) -> Column:
    """Hash of one LSH band: md5_long('<band>#' || sig[slice] joined ',').

    Two signatures collide in band b iff their ``rows_per_band``
    consecutive minhashes are identical — the classic banding estimator
    for Jaccard similarity (Broder; Leskovec et al., Mining of Massive
    Datasets ch. 3).
    """
    s = _col(sig)
    piece = F.slice(s, band * rows_per_band + 1, rows_per_band)
    joined = F.concat_ws(",", F.transform(piece, lambda x: x.cast("string")))
    return md5_long(F.concat(band.cast("string"), F.lit("#"), joined))


def simhash(tokens: ColumnOrName, bits: int = 32) -> Column:
    """SimHash fingerprint (Charikar 2002) over a token array, ``bits`` wide.

    Each token (with multiplicity) votes ±1 on every bit of its 60-bit
    md5_long hash; fingerprint bit j is 1 iff the vote sum is positive.
    Near-identical documents land within a small Hamming distance.

    Single fold over the token array: one md5 per token, then a
    ``bits``-wide vote vector updated with integer arithmetic — the
    nested "aggregate per bit" formulation re-evaluates the md5
    transform once per bit (higher-order functions are interpreted and
    re-run their argument expression), costing bits× the hash work.
    O(bits × tokens) arithmetic, one hash per token, zero shuffle.
    Integer vote sums are order-independent, so the DuckDB oracle's
    per-bit list_sum formulation is bit-identical.
    """
    toks = _col(tokens)
    bit_idx = F.sequence(F.lit(0), F.lit(int(bits) - 1))

    # votes[j] = sum over tokens of ±1 by bit j of the token's hash
    # (the pyspark shiftright wrapper only takes int shift amounts;
    # call_function passes the bit index as a Column)
    votes = F.aggregate(
        F.transform(toks, lambda t: md5_long(t)),
        F.array_repeat(F.lit(0).cast("long"), int(bits)),
        lambda acc, h: F.zip_with(
            acc,
            bit_idx,
            lambda v, j: v
            + (
                F.call_function("shiftright", h, j).bitwiseAND(F.lit(1)) * 2 - 1
            ).cast("long"),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes, bit_idx, lambda v, j: F.struct(v.alias("v"), j.alias("j"))
        ),
        F.lit(0).cast("long"),
        lambda acc, vj: acc
        + F.when(
            vj["v"] > 0,
            F.call_function("shiftleft", F.lit(1).cast("long"), vj["j"]),
        ).otherwise(F.lit(0).cast("long")),
    )


def simhash_band(fp: ColumnOrName, band: Column, band_bits: int) -> Column:
    """Extract band ``band`` (``band_bits`` wide) from a simhash value."""
    mask = (1 << band_bits) - 1
    return F.call_function("shiftright", _col(fp), band * band_bits).bitwiseAND(
        F.lit(mask)
    )


def hamming64(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Hamming distance between two long fingerprints."""
    return F.bit_count(_col(a).bitwiseXOR(_col(b)))
