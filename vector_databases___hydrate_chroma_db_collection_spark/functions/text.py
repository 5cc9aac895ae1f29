"""Text analysis as Catalyst expressions.

The reference treats the document column as an opaque payload
(reference sas:179); a training-data pipeline needs to score, filter
and fingerprint text at scale. Everything here is a pure expression
(split/regexp/aggregate) — JVM-side, codegen-friendly, no UDFs — and
each function has an exact ANSI-SQL equivalent used by the DuckDB
oracle harness.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multilingual stopword lists for the language-ID heuristic and
# stopword-ratio quality signal. Deliberately small + frozen: the
# oracle SQL embeds the same lists.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "est"),
    "de": ("der", "die", "das", "und", "zu", "in", "ein", "ist"),
}

def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def normalize_text(text: Column | str) -> Column:
    """Canonical form for dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(text)), r"\s+", " "))


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization, empty tokens removed."""
    return F.filter(F.split(_c(text), r"\s+"), lambda x: x != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count(text: Column | str) -> Column:
    return F.length(_c(text))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    t = _c(text)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"\p{Punct}", ""))
    return punct.cast("double") / F.greatest(F.length(t), F.lit(1)).cast("double")


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are (lang) stopwords — a classic
    fluency signal for quality filtering."""
    toks = tokens(F.lower(_c(text)))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column | str) -> Column:
    """Deterministic composite quality score in [0,1]:

    0.4 * length_score  (tokens/100 capped at 1)
    + 0.4 * (1 - punct_ratio)
    + 0.2 * stopword presence score (ratio/0.1 capped at 1)

    The exact formula is arbitrary but frozen — the oracle SQL
    replicates it literally.
    """
    tc = token_count(text).cast("double")
    length_score = F.least(tc / F.lit(100.0), F.lit(1.0))
    punct_score = F.lit(1.0) - punct_ratio(text)
    sw_score = F.least(stopword_ratio(text) / F.lit(0.1), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_score + F.lit(0.4) * punct_score + F.lit(0.2) * sw_score, 6
    )


def language_id(text: Column | str) -> Column:
    """Stopword-vote language heuristic: count hits per language list,
    argmax wins (ties broken by language code order); 'und' if no
    hits. Pure expression — at 100 TB this is a scan with no shuffle."""
    toks = tokens(F.lower(_c(text)))

    def hits_for(sw: Column) -> Column:
        return F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))

    hit_cols = []
    for code in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[code]])
        hit_cols.append(
            F.struct(hits_for(sw).alias("hits"), F.lit(code).alias("code"))
        )
    # array_max over (hits, code) structs: max hits, then max code —
    # to keep ties deterministic we order codes so later-wins matches
    # the documented tie-break (alphabetically last on equal hits).
    best = F.array_max(F.array(*hit_cols))
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


# GPT-2-style pre-tokenization approximation: letter runs, digit runs,
# and punctuation runs, each optionally preceded by one space. The
# alternation uses only ASCII classes so Java regex (Spark) and RE2
# (DuckDB) match byte-for-byte — verified identical on both engines.
BPE_REGEX = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_tokens(text: Column | str) -> Column:
    """BPE-ish pre-tokenization (see BPE_REGEX). A real BPE vocab
    merge table is model-specific; the pre-tokenizer split is what
    drives token-budget estimates in pipeline planning, and it is a
    pure codegen expression — counting tokens over 100 TB is a scan."""
    return F.regexp_extract_all(_c(text), F.lit(BPE_REGEX), 0)


def bpe_token_count(text: Column | str) -> Column:
    return F.size(bpe_tokens(text))


# PII patterns, RE2-compatible (no backreferences/lookaround) so the
# SAME pattern strings run in Spark's Java regex AND DuckDB's RE2 —
# a pattern that only compiles on one engine cannot be oracle-checked.
# Replacement ORDER matters and is part of the contract: emails first
# (they contain digit runs a phone pattern would chew), then IPv4
# (dotted digit runs), then phone-like digit runs over what remains.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d -]{7,}\d",
}


def redact_pii(text: Column | str) -> Column:
    """Replace emails, IPv4 addresses, and phone-like digit runs with
    typed placeholder tags — the standard scrubbing pass before
    training-data release. Pure codegen regexp_replace chain (three
    passes over the string, no UDF), so redacting 100 TB is a scan."""
    out = _c(text)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def pii_counts(text: Column | str) -> Column:
    """Struct of per-category PII match counts, counted in the same
    left-to-right replacement order redact_pii uses (each category is
    counted on the text with earlier categories already redacted, so
    an email's digits are never double-counted as a phone)."""
    stages = []
    cur = _c(text)
    for kind, pat in PII_PATTERNS.items():
        stages.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, f"[{kind.upper()}]")
    return F.struct(*stages)


def rolling_fingerprint(text: Column | str) -> Column:
    """Order-sensitive document fingerprint: md5 of the normalized
    text (hex). md5 exists in both Spark and DuckDB, making the
    fingerprint oracle-checkable; an xxhash64 variant would be faster
    but is not portable to the oracle."""
    return F.md5(normalize_text(text).cast("binary"))


def chunk_tokens(
    text: Column | str, *, window: int = 64, step: int = 48
) -> Column:
    """Split a document into overlapping token-window chunks — the
    standard pre-embedding step for RAG hydration (the reference's
    collections exist to serve retrieval, README.md:5, but its step
    assumes pre-chunked rows; this operator closes that gap).

    Returns ARRAY<STRUCT<chunk_idx INT, chunk_text STRING,
    chunk_tokens INT>>: windows of ``window`` tokens advancing by
    ``step`` (overlap = window - step); a document shorter than one
    window yields exactly one chunk. Pure expression — chunking a
    100 TB corpus is a scan, no shuffle; pair with posexplode for
    one-row-per-chunk output.
    """
    if not (0 < step <= window):
        raise ValueError("require 0 < step <= window")
    toks = tokens(_c(text))
    n = F.size(toks)
    # chunks = 1 + max(0, ceil((n - window) / step)), in integer math
    extra = F.greatest(n - F.lit(window), F.lit(0))
    n_chunks = F.lit(1) + F.floor(
        (extra + F.lit(step - 1)) / F.lit(step)
    ).cast("int")

    def one(i: Column) -> Column:
        piece = F.slice(toks, i * step + 1, window)
        return F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(" ", piece).alias("chunk_text"),
            F.size(piece).alias("chunk_tokens"),
        )

    return F.transform(F.sequence(F.lit(0), n_chunks - 1), one)


def add_text_features(df, text_col: str = "text"):
    """Materialize tokenization once, then derive every text metric
    from the shared column. The single-column convenience functions
    above re-tokenize inside each expression (subexpression
    elimination does not reach interpreted higher-order functions),
    which costs ~3x on quality scoring; pipelines touching several
    metrics should go through here.

    Adds: _toks, _ltoks (lowercased), tok_cnt, char_cnt, punct_ratio,
    stopword_ratio, quality, lang_pred. Formulas are identical to
    quality_score()/language_id() — oracle results do not change.

    The repartition between tokenization and the metrics is load-
    bearing twice over: it parallelizes single-file inputs AND acts
    as a barrier that stops Catalyst's CollapseProject from
    re-inlining (and so re-evaluating) the token arrays into every
    metric expression — measured 3-4x on quality scoring.
    """
    t = F.col(text_col)
    df = (
        df.withColumn("_toks", tokens(t))
        .withColumn("_ltoks", tokens(F.lower(t)))
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )

    punct = F.length(t) - F.length(F.regexp_replace(t, r"\p{Punct}", ""))
    praw = punct.cast("double") / F.greatest(F.length(t), F.lit(1)).cast("double")

    def hits(code: str) -> Column:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[code]])
        return F.size(F.filter("_ltoks", lambda x: F.array_contains(sw, x)))

    swr = hits("en").cast("double") / F.greatest(F.size("_ltoks"), F.lit(1)).cast(
        "double"
    )
    tc = F.size("_toks").cast("double")
    quality = F.round(
        F.lit(0.4) * F.least(tc / 100.0, F.lit(1.0))
        + F.lit(0.4) * (F.lit(1.0) - praw)
        + F.lit(0.2) * F.least(swr / 0.1, F.lit(1.0)),
        6,
    )
    best = F.array_max(
        F.array(
            *[
                F.struct(hits(code).alias("hits"), F.lit(code).alias("code"))
                for code in sorted(STOPWORDS)
            ]
        )
    )
    return (
        df.withColumn("tok_cnt", F.size("_toks"))
        .withColumn("char_cnt", F.length(t))
        .withColumn("punct_ratio", F.round(praw, 6))
        .withColumn("stopword_ratio", F.round(swr, 6))
        .withColumn("quality", quality)
        .withColumn(
            "lang_pred",
            F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und")),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_flags(
    text: Column | str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> Column:
    """Gopher-style document quality rules (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Table A1) as ONE struct
    expression — the standard pre-training repetition/garbage gate:

    - ``n_words`` within [min_words, max_words],
    - ``mean_word_len`` within [3, 10] characters,
    - ``symbol_ratio`` (# of ``#`` / ``...`` occurrences per word)
      below 0.1,
    - ``alpha_word_frac`` (words containing at least one letter)
      above 0.8,
    - at least 2 DISTINCT common-English stopwords present
      (``GOPHER_STOPWORDS``).

    Returns STRUCT(n_words, mean_word_len, symbol_ratio,
    alpha_word_frac, has_stopwords, gopher_pass) — project the
    fields you filter on; everything stays in whole-stage codegen
    (split + higher-order functions, no UDF). Ratios are rounded to
    4 decimals so a SQL oracle reproduces them bit-for-bit. The
    published word-count bounds (50..100k) are defaults; pass
    corpus-appropriate bounds explicitly for short-document sets.

    Empty / whitespace-only documents are the gate's bread and
    butter, so they must CLASSIFY (ratios 0.0, ``gopher_pass``
    false via the word-count bound), never crash: the ratio
    denominators are floored at 1 because Spark 4's default ANSI
    mode raises on division by zero — one empty doc in a 100 TB
    corpus must not abort the filtering job."""
    t = _c(text)
    ws = tokens(t)
    n = F.size(ws)
    nd = F.greatest(n.cast("double"), F.lit(1.0))
    mean_len = F.round(
        F.aggregate(
            ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / nd,
        4,
    )
    symbol_ratio = F.round(
        F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\."), F.lit(0))).cast(
            "double"
        )
        / nd,
        4,
    )
    alpha_frac = F.round(
        F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("double") / nd,
        4,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(ws, F.lower), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    )
    has_stop = stop_hits >= F.lit(min_stopword_hits)
    gopher_pass = (
        (n >= F.lit(min_words))
        & (n <= F.lit(max_words))
        & (mean_len >= F.lit(min_mean_word_len))
        & (mean_len <= F.lit(max_mean_word_len))
        & (symbol_ratio < F.lit(max_symbol_ratio))
        & (alpha_frac > F.lit(min_alpha_word_frac))
        & has_stop
    )
    return F.struct(
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        has_stop.alias("has_stopwords"),
        gopher_pass.alias("gopher_pass"),
    )


def remove_repeated_segments(
    text: Column | str, *, sep: str = "\n"
) -> Column:
    """Within-document repetition REMOVAL (Rae et al. 2021, Gopher
    App. A): rewrite a document by dropping every repeated
    line/paragraph, keeping each distinct segment's FIRST occurrence
    in its original position — the standard pre-dedup normalization
    for web corpora, where navigation chrome and boilerplate repeat
    inside a single page. This REWRITES text; ``gopher_flags`` /
    repetition ratios only MEASURE it.

    Pure codegen array expressions (split -> positional keep-first
    filter -> rejoin): ``array_position`` returns a segment's first
    1-based index, so a segment survives exactly when it sits at its
    own first occurrence. Empty segments (separator runs) dedup like
    any other segment — the first survives, so separator runs
    collapse. No shuffle, no UDF; per-row cost is O(segments^2) in
    the worst case, bounded by document length, embarrassingly
    parallel across the corpus."""
    import re as _re

    parts = F.split(_c(text), _re.escape(sep))
    kept = F.filter(
        parts, lambda x, i: F.array_position(parts, x) == i + F.lit(1)
    )
    return F.array_join(kept, sep)


def canonical_url(url: Column | str, *, drop_params: tuple = ()) -> Column:
    """Canonicalize a URL for exact web dedup: lowercase the scheme
    and host, drop the fragment, and strip tracking query parameters
    (``utm_*`` and the common click ids, plus any extra prefixes in
    ``drop_params``), preserving the order of the parameters that
    remain. Two crawls of the same page that differ only in tracking
    noise — ``?utm_source=feed`` vs ``?utm_source=tw#ref`` — collapse
    to one canonical key; dedup is then a single hash-shuffle on that
    key (see queries/dedup.py::dedup_canonical_url), the cheapest
    highest-yield dedup pass a web corpus gets.

    A non-default PORT is preserved (``:8080`` names a different
    server; collapsing it would merge genuinely distinct pages).
    USERINFO (``user:pass@``) is deliberately DROPPED — standard
    canonicalization hygiene: credentials in crawl URLs are noise at
    best and a secret leak at worst, and must never become part of a
    dedup key that gets persisted and logged.

    All codegen expressions over Spark's real URL parser
    (``try_parse_url`` PROTOCOL/HOST/AUTHORITY/PATH/QUERY — the
    ``try_`` form: ANSI-mode ``parse_url`` RAISES on invalid input,
    and a crawl corpus always contains invalid URLs) — no UDF;
    NULL-safe for URLs without a query string. Scheme-less or
    otherwise unparseable URLs (PROTOCOL/HOST parse to NULL) fall
    back to the RAW url as their own canonical key — were the NULL
    propagated instead, a groupBy-canonical dedup pass would collapse
    every malformed URL into one NULL key and discard all but one as
    "duplicates" of each other."""
    u = _c(url)
    tracked = ("utm_", "gclid", "fbclid", "msclkid", "mc_eid") + tuple(
        drop_params
    )
    q = F.try_parse_url(u, F.lit("QUERY"))
    kept = F.filter(
        F.split(F.coalesce(q, F.lit("")), "&"),
        lambda p: (p != F.lit(""))
        & ~reduce(
            lambda a, b: a | b,
            [p.startswith(F.lit(t)) for t in tracked],
        ),
    )
    q_canon = F.array_join(kept, "&")
    # HOST excludes userinfo AND port; recover the port (digits after
    # the authority's final colon) so distinct servers stay distinct.
    port = F.regexp_extract(
        F.coalesce(F.try_parse_url(u, F.lit("AUTHORITY")), F.lit("")),
        ":(\\d+)$",
        1,
    )
    canon = F.concat(
        F.lower(F.try_parse_url(u, F.lit("PROTOCOL"))),
        F.lit("://"),
        F.lower(F.try_parse_url(u, F.lit("HOST"))),
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("")),
        F.when(q_canon == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), q_canon)
        ),
    )
    # concat propagates the NULL that parse_url yields on scheme-less
    # / unparseable input; each such URL must keep a per-row key
    return F.coalesce(canon, u)
