"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All hot-path math is built-in column expressions (whole-stage codegen); the
only state is small constant lists baked into the plan. Each operator
appends columns so they compose into one scan → one projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Shared Unicode tokenizer (lower → non-word runs to spaces → split → drop
# empties; NULL ≡ empty). Lives in dedup.py because the dedup operators'
# SQL oracles pin its exact semantics; the ASCII-only \w it replaced
# deleted every CJK/Cyrillic character (round-5 max review).
from syncmaven_spark.operators.dedup import _NON_WORD_RE, _words

# minimal stopword marker sets per language — n-gram heuristic, not a model
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "que", "los", "es"],
}


def _hit_count(padded: Column, word: str) -> Column:
    token = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(token), F.lit(""))))
        / len(token)
    ).cast("long")


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Append stopword-score columns per language + argmax prediction.

    CJK text is detected by character-class ratio first (stopword tokens
    don't apply); otherwise the language with the highest stopword hit rate
    wins, 'und' (undetermined) when nothing matches.

    Tokenization: non-word runs (punctuation, newlines) normalize to TWO
    spaces before padding, so stopwords adjacent to punctuation or at line
    boundaries count, and adjacent repeats ("the the the") don't share
    their separating space under the non-overlapping replace counter.
    """
    padded = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.col(text_col)), r"\W+", "  "),
        F.lit(" "),
    )
    out = df
    for lang, words in STOPWORDS.items():
        score = None
        for w in words:
            h = _hit_count(padded, w)
            score = h if score is None else score + h
        out = out.withColumn(f"score_{lang}", score)

    cjk_chars = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
    cjk_ratio = cjk_chars / F.greatest(F.length(F.col(text_col)), F.lit(1))

    best = F.greatest(*[F.col(f"score_{lang}") for lang in STOPWORDS])
    pred = F.when(cjk_ratio > 0.05, F.lit("zh"))
    for lang in STOPWORDS:
        pred = pred.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        )
    return out.withColumn(out_col, pred.otherwise(F.lit("und")))


def token_count(
    df: DataFrame, text_col: str = "text", out_col: str = "n_tokens"
) -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (``n_bpe_tokens`` ≈ word pieces split on 4-char boundaries + punct).
    Empty/whitespace-only AND NULL text count 0 — ``split('')`` returns
    ``['']`` of size 1, and a NULL previously produced NULL counts that
    bypassed ``n_tokens == 0`` empty-doc filters (round-5 max review)."""
    empty = F.col(text_col).isNull() | (F.length(F.trim(F.col(text_col))) == 0)
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    bpe_ish = F.size(
        F.split(
            F.trim(
                F.regexp_replace(
                    F.col(text_col), r"([^\w\s])|(\w{4})(?=\w)", "$1$2 "
                )
            ),
            r"\s+",
        )
    )
    return df.withColumn(
        out_col, F.when(empty, 0).otherwise(F.size(words))
    ).withColumn("n_bpe_tokens", F.when(empty, 0).otherwise(bpe_ish))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style quality features + a composite [0,1] score.

    Features: word count, mean word length, alpha ratio, distinct-word
    ratio (repetition), stop-word presence. The composite is a fixed
    weighted product of saturating sub-scores — deterministic, explainable,
    and entirely JVM-side.
    """
    # NULL ≡ empty for every feature: all-NULL docs must score 0, not NULL
    # (NULL features bypass numeric quality filters)
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = _words(text)  # Unicode tokenizer, empties dropped
    n_words = F.size(words)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, r"[^A-Za-zÀ-ɏ]", ""))
    distinct_ratio = F.when(n_words == 0, 0.0).otherwise(
        F.size(F.array_distinct(words)) / F.greatest(n_words, F.lit(1))
    )
    mean_word_len = (
        F.length(F.regexp_replace(text, r"\s", "")) / F.greatest(n_words, F.lit(1))
    )

    length_score = F.least(F.lit(1.0), n_words / F.lit(50.0))
    alpha_ratio = alpha_chars / F.greatest(n_chars, F.lit(1))
    word_len_score = F.when(
        (mean_word_len >= 3) & (mean_word_len <= 10), 1.0
    ).otherwise(0.5)

    return (
        df.withColumn("q_n_words", n_words)
        .withColumn("q_mean_word_len", F.round(mean_word_len, 4))
        .withColumn("q_alpha_ratio", F.round(alpha_ratio, 4))
        .withColumn("q_distinct_ratio", F.round(distinct_ratio, 4))
        .withColumn(
            "quality_score",
            F.round(
                length_score * alpha_ratio * word_len_score * distinct_ratio, 4
            ),
        )
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals, appended per document.

    - ``n_words``: Unicode word-token count.
    - ``dup_word_frac``: ``1 - distinct_words / total_words`` — the
      word-level repetition fraction (high → looping/boilerplate text).
    - ``top_bigram_frac``: fraction of word bigrams taken by the single
      most frequent bigram (the "top n-gram fraction" family of filters
      from the Gopher/MassiveText data-quality rules).

    Entirely JVM-side array math, a zero-shuffle projection at any corpus
    size. The bigram mode is an O(n log n) sorted-run-length fold
    (``array_sort`` + one ``aggregate`` tracking the longest equal run) —
    measured 2.4× faster at sf0.1 than the O(distinct × n)
    count-each-distinct formulation, and it still beats an explode +
    per-doc groupBy shuffle. Empty/NULL docs score 0.0, not NULL, so
    downstream numeric filters can't be bypassed.
    """
    reserved_names = (
        "_rep_toks", "_rep_bigrams",        # internal temporaries
        "n_words", "dup_word_frac", "top_bigram_frac",  # outputs
    )
    for reserved in reserved_names:
        if reserved in df.columns:
            raise ValueError(
                f"repetition_stats reserves the column name {reserved!r} "
                "(a withColumn would silently overwrite it); rename or "
                "drop it on the input DataFrame"
            )
    out = df.withColumn("_rep_toks", _words(F.col(text_col)))
    n = F.size(F.col("_rep_toks"))
    out = out.withColumn(
        "_rep_bigrams",
        F.when(
            n >= 2,
            F.expr(
                "transform(sequence(1, size(_rep_toks) - 1), "
                "i -> concat(element_at(_rep_toks, i), ' ', "
                "element_at(_rep_toks, i + 1)))"
            ),
        ).otherwise(F.expr("CAST(array() AS array<string>)")),
    )
    n_bigrams = F.size(F.col("_rep_bigrams"))
    # longest equal run over the sorted bigram array == the mode's count;
    # the initial prev '' can never equal a real bigram (tokens non-empty)
    top_count = F.expr(
        "aggregate(array_sort(_rep_bigrams), "
        "struct(CAST('' AS STRING) AS prev, CAST(0 AS BIGINT) AS run, "
        "CAST(0 AS BIGINT) AS best), "
        "(s, x) -> struct(x AS prev, "
        "CASE WHEN x = s.prev THEN s.run + 1 ELSE CAST(1 AS BIGINT) END AS run, "
        "greatest(s.best, CASE WHEN x = s.prev THEN s.run + 1 "
        "ELSE CAST(1 AS BIGINT) END) AS best), "
        "s -> s.best)"
    )
    dup_frac = F.when(n == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct("_rep_toks")) / n.cast("double")
    )
    top_frac = F.when(n_bigrams == 0, F.lit(0.0)).otherwise(
        top_count / n_bigrams.cast("double")
    )
    return (
        out.withColumn("n_words", n.cast("long"))
        .withColumn("dup_word_frac", F.round(dup_frac, 4))
        .withColumn("top_bigram_frac", F.round(top_frac, 4))
        .drop("_rep_toks", "_rep_bigrams")
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    word_len_range: tuple[float, float] = (2.0, 12.0),
    min_alpha_ratio: float = 0.5,
    max_dup_word_frac: float = 0.9,
) -> DataFrame:
    """The C4/Gopher-style KEEP/DROP verdict — the filter stage itself,
    composed from :func:`quality_features` and :func:`repetition_stats`.

    Appends one boolean per rule (``r_min_words``, ``r_word_len``,
    ``r_alpha``, ``r_repetition``) plus ``keep`` (their conjunction), so a
    pipeline can both filter (``WHERE keep``) and report per-rule drop
    attribution — the standard corpus-curation audit. Still a zero-shuffle
    projection: every input feature is per-row column math.
    """
    lo, hi = word_len_range
    for reserved in ("r_min_words", "r_word_len", "r_alpha", "r_repetition",
                     "keep"):
        if reserved in df.columns:
            raise ValueError(
                f"quality_filter reserves the column name {reserved!r} "
                "(a withColumn would silently overwrite it); rename or "
                "drop it on the input DataFrame"
            )
    feats = repetition_stats(quality_features(df, text_col), text_col)
    r_min_words = F.col("q_n_words") >= int(min_words)
    r_word_len = (F.col("q_mean_word_len") >= float(lo)) & (
        F.col("q_mean_word_len") <= float(hi)
    )
    r_alpha = F.col("q_alpha_ratio") >= float(min_alpha_ratio)
    r_rep = F.col("dup_word_frac") <= float(max_dup_word_frac)
    return (
        feats.withColumn("r_min_words", r_min_words)
        .withColumn("r_word_len", r_word_len)
        .withColumn("r_alpha", r_alpha)
        .withColumn("r_repetition", r_rep)
        .withColumn("keep", r_min_words & r_word_len & r_alpha & r_rep)
    )


# PII patterns shared by the operator and its SQL oracle. Deliberately
# conservative constructs only (char classes, bounded repeats, \b) so
# java.util.regex (Spark) and RE2 (DuckDB/BigQuery) agree exactly — no
# backreferences, no lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+1-555-[0-9]{4}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_redact(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Count and redact PII spans (emails, NANP test phones, IPv4).

    Appends ``n_pii_emails`` / ``n_pii_phones`` / ``n_pii_ipv4`` counts and
    ``out_col`` with spans replaced by ``<EMAIL>`` / ``<PHONE>`` / ``<IP>``
    placeholders. Replacement order is fixed (email → phone → ip), and each
    count is taken on the SAME intermediate its replacement runs on, so the
    counts always equal the placeholders emitted — counting every pattern
    on the raw text would tally an IP living inside an email's domain that
    the email pass already consumed (round-6 review).

    All JVM-side ``regexp_extract_all`` / ``regexp_replace`` — a pure
    projection with zero shuffles, the shape a 100-TB redaction pass needs
    (the regex cost is the scan cost). The pattern set is the demo trio;
    production would extend the constant list, not the operator.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))

    def _n(src: Column, pat: str) -> Column:
        return F.size(F.regexp_extract_all(src, F.lit(pat), F.lit(0))).cast("long")

    after_email = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, PII_PHONE_RE, "<PHONE>")
    redacted = F.regexp_replace(after_phone, PII_IPV4_RE, "<IP>")
    return (
        df.withColumn("n_pii_emails", _n(text, PII_EMAIL_RE))
        .withColumn("n_pii_phones", _n(after_email, PII_PHONE_RE))
        .withColumn("n_pii_ipv4", _n(after_phone, PII_IPV4_RE))
        .withColumn(out_col, redacted)
    )


def document_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "fingerprint",
    normalized_md5: bool = False,
) -> DataFrame:
    """Order-sensitive rolling fingerprint over normalized words.

    Polynomial rolling hash folded JVM-side:
    ``h = h * 31 + xxhash64(word)`` over the word sequence (via
    ``F.aggregate``), so word order matters (unlike a bag-of-words hash).
    ``normalized_md5=True`` instead emits the md5 of the normalized text —
    the content-equality key (SQL-oracle-able).

    Normalization is SPACE-REPLACING and Unicode-aware: the old
    ``[^a-z0-9 ]`` delete merged newline-separated words ("foo\\nbar" ==
    "foobar") and normalized every non-Latin doc to '' — one fingerprint
    for an entire CJK corpus (round-5 max review). Non-word runs map to one
    space, so separator kind no longer changes the key.
    """
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                _NON_WORD_RE,
                " ",
            ),
            r"\s+",
            " ",
        )
    )
    if normalized_md5:
        return df.withColumn(out_col, F.md5(normalized))
    words = _words(F.col(text_col))
    # modular polynomial hash: keep the accumulator < 2^56 so acc*31 + term
    # never overflows a long under ANSI mode
    modulus = F.lit(1 << 56).cast("long")
    rolling = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * F.lit(31).cast("long") + F.pmod(F.xxhash64(w), modulus), modulus),
    )
    return df.withColumn(out_col, rolling)


def _window_hashes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window_k: int,
    with_pos: bool,
) -> DataFrame:
    """Exploded per-position ``window_k``-token window hashes — the shared
    projection of :func:`verbatim_window_stats` and
    :func:`verbatim_spans`: ``(id, [pos,] _h)``.

    Each token hashes ONCE (``xxhash64(token)``); each window then hashes
    its ``window_k`` token hashes as one fixed-width multi-arg
    ``xxhash64`` call. Equality semantics are unchanged — identical
    window text ⟺ identical token-hash tuple ⟺ identical window hash,
    modulo the same ~2⁻⁶⁴ collision class as the previous
    hash-of-concatenated-string form — but the per-position cost drops
    from O(k) string slice+copy+concat to k array lookups over longs.
    The two selects keep tokenization and window hashing in separate
    projections so the token array is materialized once per row.
    """
    from syncmaven_spark.operators.dedup import _spread

    tokens_hashed = F.transform(
        _words(F.col(text_col)), lambda w: F.xxhash64(w)
    )
    base = _spread(df, id_col).select(
        F.col(id_col), tokens_hashed.alias("_th")
    )
    n = F.size(F.col("_th"))
    idx = F.sequence(F.lit(0), n - window_k)
    windows = F.when(
        n >= window_k,
        F.transform(
            idx,
            lambda i: F.xxhash64(
                *[
                    F.element_at(F.col("_th"), i + j + 1)
                    for j in range(window_k)
                ]
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    if with_pos:
        return base.select(
            F.col(id_col), F.posexplode(windows).alias("pos", "_h")
        )
    return base.select(F.col(id_col), F.explode(windows).alias("_h"))


def verbatim_window_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_k: int = 8,
) -> DataFrame:
    """Verbatim cross-document duplication score per doc: ``(id,
    n_windows, n_dup_windows, dup_ratio)`` where a doc's POSITIONAL
    ``window_k``-token windows count as duplicated when the same window
    text appears in ANOTHER document.

    This is the exact-substring dedup signal (the classic "remove
    verbatim ≥k-token overlaps" pipeline stage): a doc that merely shares
    vocabulary scores near 0, a doc whose paragraphs are copied verbatim
    scores the copied fraction — orthogonal to shingle-SET Jaccard, which
    ignores positions and multiplicity (a doc quoting one boilerplate
    sentence 50 times has low Jaccard to its source but high verbatim
    duplication). Filter with ``dup_ratio`` or route high scorers to the
    near-dup pipeline.

    Scale shape: one map-side window projection (tokens hashed once
    each, then each k-window hashed over its k token HASHES — re-slicing
    and concatenating the window's tokens into a fresh string per
    position paid O(k) string copies per window for the same equality
    semantics), then ONE analytic window over the hash key deriving the
    cross-doc flag in place (``min(doc) != max(doc)`` — cheaper than a
    distinct count), and a per-doc count. The flag rides the same
    shuffle as the positions, so the heavy tokenize+window projection
    runs ONCE and there is no join-back (the previous agg+join layout
    computed the projection for both join sides — round-12). Windows
    hash to longs; the ~2⁻⁶⁴ collision trade is the same one the shingle
    operators document. Docs with fewer than ``window_k`` tokens have
    zero windows and ``dup_ratio`` 0.0 (no silent NaN); within-doc
    repeats alone do NOT count (min == max — same doc).
    """
    if window_k < 1:
        raise ValueError(f"window_k must be >= 1; got {window_k!r}")
    from pyspark.sql import Window as W

    per_pos = _window_hashes(df, text_col, id_col, window_k, with_pos=False)
    w_h = W.partitionBy("_h")
    flagged = per_pos.withColumn(
        "_dup", F.min(id_col).over(w_h) != F.max(id_col).over(w_h)
    )
    stats = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.when(F.col("_dup"), 1).otherwise(0)).alias("n_dup_windows"),
    )
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .na.fill(0, ["n_windows", "n_dup_windows"])
        .select(
            id_col,
            F.col("n_windows").cast("long").alias("n_windows"),
            F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
            F.when(F.col("n_windows") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("n_dup_windows").cast("double")
                    / F.col("n_windows"),
                    4,
                )
            )
            .alias("dup_ratio"),
        )
    )


def verbatim_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_k: int = 8,
) -> DataFrame:
    """The ACTIONABLE half of exact-substring dedup: per document, the
    maximal merged token intervals covered by cross-document verbatim
    ``window_k``-token windows — ``(id, span_start, span_end,
    n_windows_in_span)`` with 0-based token offsets into the
    :func:`~syncmaven_spark.operators.dedup._words` tokenization
    (``span_end`` exclusive). :func:`verbatim_window_stats` scores docs;
    this emits WHAT to cut (or to inspect) — the span removal itself is
    policy (drop, truncate, keep-first-occurrence) and stays with the
    caller.

    Execution mirrors the stats operator through the duplicated-window
    flags (token-hash window projection → ONE analytic window over the
    hash key deriving the cross-doc flag in place, no agg+join-back —
    see :func:`verbatim_window_stats`), then merges overlapping/adjacent
    windows per doc with the gaps-and-islands pattern: a window starting
    at ``p2`` merges into its predecessor's interval iff
    ``p2 <= p1 + window_k`` ([p1, p1+k) and [p2, p2+k) touch or
    overlap), so islands break where the gap exceeds ``window_k``; one
    lag + one running-sum window per doc (per-doc partitions — no global
    window). Docs with no duplicated windows emit no rows.
    """
    if window_k < 1:
        raise ValueError(f"window_k must be >= 1; got {window_k!r}")
    from pyspark.sql import Window as W

    per_pos = _window_hashes(df, text_col, id_col, window_k, with_pos=True)
    w_h = W.partitionBy("_h")
    dup_pos = (
        per_pos.withColumn(
            "_dup", F.min(id_col).over(w_h) != F.max(id_col).over(w_h)
        )
        .filter(F.col("_dup"))
        .select(id_col, "pos")
    )
    w_doc = W.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") > F.lag("pos").over(w_doc) + window_k, 1
    ).otherwise(0)
    islands = dup_pos.withColumn("_brk", brk).withColumn(
        "_island",
        F.sum("_brk").over(
            w_doc.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return islands.groupBy(id_col, "_island").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + window_k).cast("long").alias("span_end"),
        F.count(F.lit(1)).alias("n_windows_in_span"),
    ).drop("_island")
