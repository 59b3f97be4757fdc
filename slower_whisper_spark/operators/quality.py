"""Training-corpus quality-filter chain (C4 / Gopher / RefinedWeb shape):
compose the package's row-local text signals into one keep/drop verdict
with named reasons, plus a one-pass drop-accounting rollup.

Engine analog of the reference's per-file acceptance pipeline (ref:
transcription/service_validation.py — a fixed chain of named rejection
reasons ending in one verdict; transcription/models.py quality fields),
re-expressed as the webtext pre-training filter every LLM data pipeline
runs between crawl and tokenizer.

Scale design: every signal is a row-local JVM expression (token counts,
punctuation/stopword ratios, duplicate-n-gram fraction, eTLD+1 blocklist
— see functions/text.py, functions/url.py), so the whole chain folds into
the scan: zero shuffle, zero Python, whole-stage codegen, and Catalyst
prunes unreferenced columns. At 10^12 rows the filter costs one pass;
``quality_filter_stats`` adds a single global aggregate of booleans (a
few hundred bytes per task of partial sums) — reason accounting never
explodes the reasons array.

Reason vocabulary (evaluation order is the output order, all evaluated —
a row reports EVERY reason it trips, the Gopher-report convention):
``too_short | too_long | high_punct | low_stopword | repetitive |
bad_lang | blocked_domain``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from slower_whisper_spark.functions.text import (
    duplicate_ngram_fraction,
    punct_ratio,
    stopword_ratio,
    token_count,
)

REASONS = (
    "null_text", "too_short", "too_long", "high_punct", "low_stopword",
    "repetitive", "bad_lang", "blocked_domain",
)


def quality_filter(
    df: DataFrame,
    *,
    text_col: str = "text",
    lang_col: str | None = None,
    url_col: str | None = None,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.3,
    min_stopword_ratio: float = 0.05,
    max_dup3_fraction: float = 0.3,
    allowed_langs: tuple[str, ...] = ("en",),
    blocked_domains: tuple[str, ...] = (),
) -> DataFrame:
    """Append ``reasons array<string>`` (every tripped check, fixed order)
    and ``verdict`` ('keep' | 'drop') to ``df``.

    Language comes from ``lang_col`` when the table already carries one
    (the usual case — langid ran at ingest); pass ``lang_col=None`` to
    derive it with the stopword-vote ``lang_id``. NULL/unknown language is
    a drop (``bad_lang``), the conservative pre-training default. The
    domain blocklist keys on LITE eTLD+1 so one entry covers every host
    under a registered domain.
    """
    t = F.col(text_col)
    n = token_count(t)
    # NULL text must DROP, matching rules/quality.py's documented semantics
    # ("a row with no body cannot demonstrate quality"): every signal check
    # below evaluates to NULL on NULL text and F.when(NULL, ...) yields NULL,
    # so without this explicit reason such rows kept verdict='keep'
    # (ADVICE r5 #1).
    checks: list[tuple[str, Column]] = [
        ("null_text", t.isNull()),
        ("too_short", n < int(min_tokens)),
        ("too_long", n > int(max_tokens)),
        ("high_punct", punct_ratio(t) > float(max_punct_ratio)),
        ("low_stopword", stopword_ratio(t) < float(min_stopword_ratio)),
        ("repetitive", duplicate_ngram_fraction(t, 3) > float(max_dup3_fraction)),
    ]
    if lang_col is not None:
        lang = F.col(lang_col)
    else:
        from slower_whisper_spark.functions.text import lang_id

        lang = lang_id(t)
    checks.append(
        ("bad_lang", ~F.coalesce(lang.isin(*allowed_langs), F.lit(False)))
    )
    if url_col is not None and blocked_domains:
        from slower_whisper_spark.functions.url import registered_domain

        checks.append(
            ("blocked_domain", registered_domain(url_col).isin(*blocked_domains))
        )
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in checks]),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("reasons", reasons).withColumn(
        "verdict", F.when(F.size("reasons") == 0, "keep").otherwise("drop")
    )


def quality_filter_stats(filtered: DataFrame) -> DataFrame:
    """One-row drop accounting from ``quality_filter`` output in a single
    global aggregate: total, kept, dropped, and a per-reason trip count
    (rows can trip several reasons, so reason counts exceed dropped —
    documented Gopher-report semantics). No explode; booleans sum as ints."""
    aggs = [
        F.count(F.lit(1)).alias("total"),
        F.sum((F.col("verdict") == "keep").cast("long")).alias("kept"),
        F.sum((F.col("verdict") == "drop").cast("long")).alias("dropped"),
    ]
    for r in REASONS:
        aggs.append(
            F.sum(F.array_contains("reasons", r).cast("long")).alias(f"n_{r}")
        )
    return filtered.agg(*aggs)


def compression_ratio(c: Column | str) -> Column:
    """CCNet-style compressibility signal: deflate(text) bytes / text
    bytes. Templated/repetitive documents compress far below prose (~0.3
    vs ~0.6+); a very low ratio is a strong spam/boilerplate tell that the
    n-gram signals miss on long-range repetition.

    This is the chain's one genuinely-Python signal (no SQL zlib):
    a scalar Arrow pandas_udf — batched, zero per-row py4j — and the
    intended use is on quality_filter SURVIVORS, so the Python cost scales
    with the accept set, not the corpus. NULL/empty text → NULL.
    Deterministic: zlib level 6, raw deflate length, round 6."""
    from pyspark.sql.functions import pandas_udf

    # no type hints: under `from __future__ import annotations` they are
    # strings pandas_udf cannot resolve (pd is function-local here)
    @pandas_udf("double")
    def _ratio(s):
        import zlib

        def one(t):
            if t is None:
                return None
            b = t.encode("utf-8")
            if not b:
                return None
            return round(len(zlib.compress(b, 6)) / len(b), 6)

        return s.map(one)

    return _ratio(F.col(c) if isinstance(c, str) else c)


def unigram_logprob_table(
    ref: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 50_000,
    alpha: float = 1.0,
):
    """Train the CCNet-style LM quality scorer's table: top-``vocab_size``
    normalized words of a REFERENCE corpus (the 'clean' slice — e.g.
    Wikipedia in CCNet) with add-alpha smoothed log-probs. Returns
    ``(table (word, logp), oov_logp)``; denominator = total reference
    tokens + alpha·(vocab_size+1), OOV gets the pure-alpha mass.

    Training-time op: one explode + partial-combine count, a TakeOrdered
    top-K, and ONE driver scalar (the total token count) — the table is
    a broadcast-sized dim by construction."""
    import math

    from slower_whisper_spark.functions.text import normalize_text, tokens

    words = (
        ref.select(F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = words.agg(F.sum("c")).collect()[0][0] or 0
    d = float(total) + float(alpha) * (int(vocab_size) + 1)
    top = words.orderBy(F.desc("c"), "word").limit(int(vocab_size))
    table = top.select(
        "word", F.log((F.col("c") + F.lit(float(alpha))) / F.lit(d)).alias("logp")
    )
    return table, math.log(float(alpha) / d)


def lm_score(
    df: DataFrame,
    table: DataFrame,
    oov_logp: float,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mean per-token log-prob under the reference unigram LM — higher is
    closer to the reference register (CCNet buckets corpora by exactly
    this, with the LM reduced to unigrams). Output: ``(id, lm_logprob)``,
    NULL for docs with no tokens.

    Scale: explode → BROADCAST hash join against the vocab table (corpus
    rows never shuffle raw words to a join exchange) → partial-combine avg
    back to one row per doc."""
    from slower_whisper_spark.functions.text import normalize_text, tokens

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"),
    ).where(F.col("word") != "")
    scored = (
        toks.join(F.broadcast(table), "word", "left")
        .groupBy("_id")
        .agg(F.round(F.avg(F.coalesce(F.col("logp"), F.lit(float(oov_logp)))), 6).alias("lm_logprob"))
    )
    return (
        df.select(F.col(id_col))
        .join(scored, F.col(id_col) == F.col("_id"), "left")
        .select(id_col, "lm_logprob")
    )
