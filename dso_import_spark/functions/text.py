"""Text-analysis Column expressions: tokenize, shingles, hashes, quality.

All pure Column expressions (codegen'd). The word hash is md5-derived
so a SQL oracle can reproduce it exactly: both Spark and DuckDB md5()
return the same lowercase hex, and the first 8 hex chars parse into a
32-bit-range BIGINT identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string>.

    Definition note (round-8 review): ``split`` retains the empty
    token produced by LEADING whitespace (and yields ``['']`` for the
    empty string), so token counts include it. This is a deliberate,
    CROSS-ENGINE-PINNED definition — every DuckDB oracle replays the
    identical ``string_split_regex(text, '\\s+')`` quirk, so changing
    it here would silently diverge ~30 differentials. Callers needing
    linguistic word counts filter empties explicitly (as
    bpe_regex_token_count does with its ``w != ''`` filter)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_token_estimate(col: Column | str, chars_per_token: int = 4) -> Column:
    """BPE-ish token-count estimate: ceil(chars / 4)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.ceil(F.length(c) / F.lit(chars_per_token)).cast("long")


def word_hash32(word: Column) -> Column:
    """Deterministic 32-bit-range hash of a word via md5 prefix.

    Matches DuckDB ``('0x' || substr(md5(w), 1, 8))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("long")


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """All k-char shingles of a string → array<string> (for MinHash/LSH)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k)))
    )


def stopword_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda w: F.lower(w).isin(*STOPWORDS)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def avg_word_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def bow_fingerprint(col: Column | str) -> Column:
    """Bag-of-words md5 fingerprint: md5 of sorted distinct tokens.

    Normalization-invariant document identity — the scalable "exact-ish"
    dedup key (same idea as the reference's surrogate ids: deterministic,
    computable in a single narrow projection).

    NULL semantics (round-8 review, by design): ``concat_ws`` never
    returns NULL, so a NULL document fingerprints identically to the
    empty document — all no-content rows share one key and a dedup
    groupBy collapses them to a single keeper. For a training-data
    dedup that is the desired outcome (empty docs ARE duplicates of
    each other); a caller that must preserve NULL-text rows filters
    them out before keying.
    """
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def simhash32(col: Column | str) -> Column:
    """32-bit SimHash over distinct whitespace tokens.

    For each bit position j, sum +1/-1 across word hashes' bit j; the
    sign gives bit j of the fingerprint. Pure Column expressions:
    explode-free — transforms over a literal 0..31 sequence and the
    token array, O(32·n_tokens) per row, no shuffle.

    NULL text yields a NULL fingerprint (round-8 review): the naive
    fold quietly produced 0 for NULL input, so on a corpus with m
    missing-text rows all m collided in every band at hamming
    distance 0 — m(m-1)/2 spurious "near-duplicate" pairs AND a
    quadratic bucket blowup. NULL band keys never match in the
    candidate equi-join, so NULL-text rows now simply drop out of
    simhash pairing.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(tokens(col))
    hashes = F.transform(toks, word_hash32)

    def bit_vote(j: int) -> Column:
        def merge(acc: Column, h: Column) -> Column:
            return acc + F.when(
                F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate(hashes, F.lit(0), merge)

    out = F.lit(0).cast("long")
    for j in range(32):
        out = out + F.when(bit_vote(j) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return F.when(c.isNull(), F.lit(None).cast("long")).otherwise(out)


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit fingerprints (popcount of XOR)."""
    x = a.bitwiseXOR(b)
    out = F.lit(0)
    for j in range(32):
        out = out + F.shiftright(x, j).bitwiseAND(F.lit(1)).cast("int")
    return out
