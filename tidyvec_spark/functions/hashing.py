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


def seeded_md5_long(c: ColumnOrName, seed: Column) -> Column:
    """Family of independent hash functions h_i(s) = md5_long(i || '|' || s).

    ``seed`` is a Column so the family can be generated *inside* a
    higher-order function (one expression evaluates all k hashes without
    k plan nodes).
    """
    return md5_long(F.concat(seed.cast("string"), F.lit("|"), _col(c)))


def minhash_signature(shingles: ColumnOrName, num_hashes: int = 16) -> Column:
    """MinHash signature: array<long> of length ``num_hashes``.

    sig[i] = min over shingles s of h_i(s). Entirely JVM-side: a nested
    ``transform``/``array_min`` over the shingle array — no shuffle, no
    UDF, embarrassingly parallel over rows, which is what lets the
    signature step run map-side at 100 TB.

    Rows with an empty shingle array get an empty signature — callers
    must filter those out before banding (they can never match).
    """
    sh = _col(shingles)
    idx = F.sequence(F.lit(0), F.lit(int(num_hashes) - 1))
    sig = F.transform(
        idx, lambda i: F.array_min(F.transform(sh, lambda s: seeded_md5_long(s, i)))
    )
    return F.when(F.size(sh) > 0, sig).otherwise(
        F.array().cast("array<bigint>")
    )


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

    Pure higher-order expression: ``bits`` nested aggregates over the
    token array per row — O(bits × tokens) arithmetic, zero shuffle.
    """
    toks = _col(tokens)
    hashes = F.transform(toks, lambda t: md5_long(t))
    bit_idx = F.sequence(F.lit(0), F.lit(int(bits) - 1))

    # the pyspark shiftright/shiftleft wrappers only take int shift
    # amounts; call_function passes the bit index as a Column
    def vote(j: Column) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + (
                F.call_function("shiftright", h, j).bitwiseAND(F.lit(1)) * 2 - 1
            ).cast("long"),
        )

    return F.aggregate(
        bit_idx,
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(
            vote(j) > 0, F.call_function("shiftleft", F.lit(1).cast("long"), j)
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
