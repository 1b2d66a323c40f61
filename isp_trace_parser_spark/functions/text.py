"""Text analysis for training-data pipelines: token counting, quality
scoring, fingerprinting. All pure column expressions (JVM, codegen) —
the hot path of a 100 TB text pipeline must not enter Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish pre-tokenizer regex: words, numbers, or single non-space
# symbols (GPT-2-style pre-tokenization, public knowledge).
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "was", "with", "as", "at", "by", "an", "be", "this", "are",
]


def whitespace_token_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), 0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n > 0, punct / n).otherwise(0.0)


def stopword_ratio(text: Column) -> Column:
    words = F.split(F.lower(text), r"\s+")
    stops = F.size(
        F.filter(words, lambda w: w.isin(STOPWORDS))
    )
    return F.when(F.size(words) > 0, stops / F.size(words)).otherwise(0.0)


def mean_word_length(text: Column) -> Column:
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")
    total = F.aggregate(
        F.transform(words, lambda w: F.length(w)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return F.when(F.size(words) > 0, total / F.size(words)).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Heuristic [0, 1] quality: long enough, sane punctuation, has
    stopwords (prose-ness), sane word lengths. Weights are arbitrary but
    fixed; the point is the JVM-side plumbing, and that the score is a
    deterministic pure function usable as a filter at scale."""
    n_tok = whitespace_token_count(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4.0)
    stop_score = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    mwl = mean_word_length(text)
    wl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), 1.0).otherwise(0.5)
    return (len_score * 0.3 + punct_pen * 0.2 + stop_score * 0.3 + wl_score * 0.2)


def polynomial_fingerprint(
    text: Column,
    base: int = 31,
    mod: int = (1 << 31) - 1,
    token_hash: str = "portable",
) -> Column:
    """Rolling polynomial hash over the document's whitespace tokens:
    fp = sum(hash(tok_i) * base^i) mod p, computed with F.aggregate over
    the token array — a deterministic document fingerprint with an
    order-sensitive structure (unlike a flat hash of the whole string,
    the per-token form supports windowed/rolling variants).

    ``token_hash="portable"`` (default): first 15 hex digits of
    md5(token) mod p — arithmetic any engine reproduces bit-for-bit
    (the DuckDB oracle recomputes it in SQL), unlike Spark's seeded
    xxhash64. ``"fast"``: native xxhash64 mod p — one JVM hash vs
    md5+hex-substring+base-conversion per token; pick this on a
    production corpus where fingerprints never leave the engine.

    p = 2^31 - 1 (Mersenne) keeps every intermediate product < 2^62 so
    the arithmetic never overflows int64 (Spark 4 ANSI mode throws on
    long overflow)."""
    if token_hash not in ("portable", "fast"):
        raise ValueError("token_hash must be 'portable' or 'fast'")
    toks = F.split(F.trim(text), r"\s+")

    def tok_hash(t: Column) -> Column:
        if token_hash == "fast":
            return F.pmod(F.xxhash64(t), F.lit(mod))
        h = F.conv(F.substring(F.md5(F.encode(t, "UTF-8")), 1, 15), 16, 10)
        return F.pmod(h.cast("long"), F.lit(mod))

    # accumulate (hash, power) as a struct
    acc0 = F.struct(
        F.lit(0).cast("long").alias("h"), F.lit(1).cast("long").alias("p")
    )
    folded = F.aggregate(
        toks,
        acc0,
        lambda acc, t: F.struct(
            ((acc["h"] + tok_hash(t) * acc["p"]) % F.lit(mod)).alias("h"),
            ((acc["p"] * base) % F.lit(mod)).alias("p"),
        ),
    )
    return folded["h"]


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        "*",
        whitespace_token_count(t).alias("n_tokens_ws"),
        bpe_ish_token_count(t).alias("n_tokens_bpe"),
        F.length(t).alias("n_chars_computed"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        polynomial_fingerprint(t).alias("fingerprint"),
    )


# --- PII scrubbing (training-data curation) -------------------------
# Patterns restricted to syntax RE2 and Java regex evaluate identically
# (no backrefs, no lookaround), so the DuckDB oracle can reuse them.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{7,15}"
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class — size of regexp_extract_all, which
    both engines expose (len() in DuckDB)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0)),
    }


def redact_pii(text: Column) -> Column:
    """Replace every email/phone/IP with a typed placeholder token.
    Order matters: emails first (an address contains dot-runs an IP
    pattern could nibble), then phones, then IPs."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


def with_pii_redaction(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach per-class counts and the redacted text in one projection
    — a single codegen stage over the scan, no UDF, no shuffle."""
    t = F.col(text_col)
    cols = dict(pii_counts(t))
    cols["redacted_text"] = redact_pii(t)
    return df.withColumns(cols)


# --- repetition filters (Gopher/C4-style curation rules) -------------
def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def top_bigram_fraction(text: Column) -> Column:
    """Share of the document's word bigrams taken by its most frequent
    bigram — the classic repetition signal (a page of boilerplate or a
    keyword-stuffed spam doc scores near 1). Computed entirely with
    array expressions (no explode, no shuffle): build the bigram list,
    then for the distinct bigrams count occurrences and take the max.
    O(n_bigrams * n_distinct) per doc in the worst case — bounded by
    doc length, runs inside codegen, and keeps the operator a pure
    projection (the explode+groupBy formulation shuffles the corpus)."""
    toks = _tokens(text)
    n = F.size(toks)
    # zip the token list with itself shifted by one — the lambda binds
    # only its element arguments, never the outer `toks` expression: an
    # outer expression referenced INSIDE a higher-order lambda is
    # re-evaluated per element (the doc would be re-split once per
    # bigram, O(n^2) in doc length — measured 5x at 500-word docs and
    # unbounded beyond; OPTIMIZATION_r06.md). Guarded: slice with a
    # negative length is only evaluated on the n >= 2 branch.
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # max multiplicity = longest equal run in the SORTED bigram list —
    # one O(n log n) sort + one O(n) fold, instead of the naive
    # distinct x filter O(n²) (measured 100x slower on kilobyte docs;
    # higher-order lambdas run interpreted, so per-element cost is the
    # budget that matters at corpus scale)
    srt = F.array_sort(bigrams)
    init = F.struct(
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(None).cast("string").alias("prev"),
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            x.alias("prev"),
        )

    max_count = F.aggregate(srt, init, _step, lambda acc: acc["best"])
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        max_count.cast("double") / (n - 1)
    )


def dup_sentence_fraction(text: Column) -> Column:
    """Fraction of sentences (split on '. ') that are duplicates of an
    earlier sentence: 1 - distinct/total. Pure array math, same
    no-shuffle profile as :func:`top_bigram_fraction`."""
    sents = F.split(text, r"\. ")
    total = F.size(sents)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(sents)).cast("double") / total
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-token training windows with overlap
    (the standard LLM context-window prep): chunk i covers tokens
    [i*stride, i*stride + chunk_tokens) with stride = chunk_tokens -
    overlap; the last chunk may be short; a doc shorter than one chunk
    yields exactly one chunk.

    Chunk boundaries are computed as array expressions and emitted with
    ``inline`` (a generator — chunks stream out of the scan stage, no
    shuffle, no materialized intermediate). Deterministic: same doc =>
    same chunks on any cluster.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    id_cols = id_cols or ["doc_id"]
    stride = chunk_tokens - overlap
    # tokens are PROJECTED to a bound column before the chunk lambda:
    # an outer expression referenced inside a higher-order lambda is
    # re-evaluated per element, so the inline `_tokens(...)` would
    # re-split the document once per chunk (and twice per chunk for the
    # two slice() references) — a bound attribute is just a row-field
    # read (OPTIMIZATION_r06.md).
    base = df.select(*id_cols, _tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    extra = F.greatest(n - chunk_tokens, F.lit(0))
    n_chunks = (
        F.floor((extra + F.lit(stride - 1)) / F.lit(stride)) + 1
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.concat_ws(
                " ", F.slice(toks, i * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.size(F.slice(toks, i * stride + 1, chunk_tokens))
            .cast("long")
            .alias("chunk_n_tokens"),
        ),
    )
    return base.select(*id_cols, F.inline(chunks))
