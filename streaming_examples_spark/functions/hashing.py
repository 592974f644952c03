"""Hashing/shingling column expressions shared by dedup + fingerprint.

Everything is built on ``md5`` because it exists with identical
semantics in Spark and DuckDB — which makes MinHash-LSH *oracle
checkable*: the same deterministic algorithm runs on both engines and
must produce identical candidate sets and signatures. (Spark's native
``xxhash64``/``hash`` would be faster but has no DuckDB counterpart;
for a production run swap `_minhash` to xxhash64 — the structure is
identical.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: LSH banding layout: B bands × R rows; P(candidate | j) = 1-(1-j^R)^B.
#: With 8×4, j=0.9 → 0.9996, j=0.3 → 0.063 — near-dups survive, the
#: word-salad background (typical j≈0.2-0.4) mostly prunes away.
LSH_BANDS = 8
LSH_ROWS = 4


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a whitespace-tokenized text.

    Guarded for texts shorter than k words (→ empty array, matching
    DuckDB's empty range()).
    """
    words = F.split(text, " ")
    n = F.size(words)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k - 1)),
                lambda i: F.concat_ws(" ", F.slice(words, i, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash(shingles: Column, salt: str) -> Column:
    """One MinHash value: lexicographic min of salted md5 over the
    shingle set. Deterministic, engine-portable."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(salt), s)))
    )


#: universal-hash family for the fast MinHash path: one md5 per
#: shingle → 60-bit int → k permutations (a·h+b) mod P. P = 2^31-1
#: keeps a·h inside 62 bits (no overflow in either engine).
MERSENNE_P = 2_147_483_647


def perm_constants(i: int) -> tuple[int, int]:
    """Deterministic (a, b) for permutation i — embedded identically
    in the Spark expressions and the generated oracle SQL."""
    a = (i * 2_654_435_761 + 1) % (MERSENNE_P - 1) + 1
    b = (i * 40_503 + 7) % MERSENNE_P
    return a, b


def shingle_base_hashes(shingles: Column) -> Column:
    """One md5 per shingle → int in [0, P): the only expensive hash;
    every permutation below is a multiply-add over this array."""
    return F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % F.lit(MERSENNE_P),
    )


def band_keys_from_hashes(hs: Column, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> Column:
    """Array of LSH band keys over a precomputed base-hash array; band
    b's key concatenates ``rows`` independent minhash permutations
    (P(collide|band) = j^rows).

    Cost model: |shingles| md5 calls per doc total (compute the
    base-hash array ONCE as its own column via
    ``shingle_base_hashes``), then bands×rows multiply-add folds —
    versus md5 *per permutation per shingle* in the naive form (32×
    more md5; was the bench bottleneck)."""

    def perm_min(i: int) -> Column:
        a, b = perm_constants(i)
        return F.array_min(
            F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P))
        )

    return F.array(
        *[
            F.concat_ws("|", *[perm_min(b * rows + r) for r in range(rows)])
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - inter)
