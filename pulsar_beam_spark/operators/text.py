"""Text-analysis operators for corpus curation: tokenization stats,
language ID (stopword-lexicon heuristic), quality scoring, document
fingerprinting, term frequency. All pure Spark built-ins (codegen'd),
every one mirrorable in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texthash import exploded_nonnull, poly_fingerprint, tokens
from ..sources.tables import spread_small_input

# Tiny deterministic stopword lexicons; enough for the heuristic and for
# an oracle-identical SQL mirror (kept deliberately short & literal).
LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "ein", "mit", "auf", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "sur"),
}

STOPWORDS_EN = LEXICONS["en"]


def doc_tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(F.col(id_col), tokens(text_col).alias("toks"))


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy count
    (runs of word chars of length<=4 via regexp splitting)."""
    t = tokens(text_col)
    return docs.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z0-9]{1,4}"), F.lit(0))).alias("n_subwords"),
    )


def _hit_count(toks, lexicon: tuple[str, ...]):
    lex = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(toks, lambda t: F.array_contains(lex, F.lower(t))))


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Argmax over per-language stopword hit counts; deterministic
    tie-break by lexicon order en > de > fr, 'und' (unknown) when all 0."""
    t = tokens(text_col)
    hits = {lang: _hit_count(t, lex) for lang, lex in LEXICONS.items()}
    best = F.greatest(*hits.values())
    pred = (
        F.when(best == F.lit(0), F.lit("und"))
        .when(hits["en"] == best, F.lit("en"))
        .when(hits["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        F.col(id_col),
        *[h.alias(f"hits_{lang}") for lang, h in hits.items()],
        pred.alias("pred_lang"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features: length, mean token length, stopword
    ratio, alpha ratio; plus a composite keep/drop flag. All ratios are
    exact rational arithmetic rounded to 6 — oracle-stable."""
    t = tokens(text_col)
    n = F.size(t)
    text_len = F.length(F.col(text_col))
    alpha_len = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    stop_hits = _hit_count(t, STOPWORDS_EN)
    return docs.select(
        F.col(id_col),
        text_len.alias("n_chars"),
        n.alias("n_tokens"),
        F.round(alpha_len / F.greatest(text_len, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(stop_hits / F.greatest(n, F.lit(1)), 6).alias("stopword_ratio"),
        F.round((text_len - n + 1) / F.greatest(n, F.lit(1)), 6).alias("mean_token_len"),
        (
            (n >= 20)
            & (stop_hits / F.greatest(n, F.lit(1)) >= 0.01)
            & (alpha_len / F.greatest(text_len, F.lit(1)) >= 0.5)
        ).alias("keep"),
    )


def doc_fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rolling polynomial hash fingerprint per document (texthash.poly_fingerprint)."""
    return docs.select(F.col(id_col), poly_fingerprint(text_col).alias("fingerprint"))


def top_terms(docs: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Global term frequency top-k, stopwords removed; deterministic
    tie-break by term. Explode -> groupBy benefits from map-side partial
    aggregation; top-k is TakeOrderedAndProject (no global sort shuffle)."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    return (
        exploded_nonnull(spread_small_input(docs), [], tokens(text_col), "term")
        .filter(~F.array_contains(stop, F.lower(F.col("term"))))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(k)
    )


def tf_idf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_id: int | None = None,
) -> DataFrame:
    """Per-(doc, term) TF-IDF: tf * ln(N / df).

    Distributed shape: one explode for term frequencies (shuffled by
    (doc, term) — map-side combined), one distinct-explode for document
    frequencies (shuffled by term), N as a broadcast singleton. The df
    side joins by term; at corpus scale df is |vocabulary| rows — orders
    of magnitude smaller than the corpus, typically broadcastable.
    ``max_doc_id`` bounds the *output* (not the statistics): idf is
    always computed over the full corpus.
    """
    toks = exploded_nonnull(
        spread_small_input(docs), [F.col(id_col).alias("id")], tokens(text_col), "term"
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    df = toks.distinct().groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    out = tf
    if max_doc_id is not None:
        out = out.filter(F.col("id") < max_doc_id)
    return (
        out.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("id").alias(id_col),
            "term",
            "tf",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6).alias("tfidf"),
        )
    )


def repetition_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Intra-document repetition features (Gopher-style filters): total /
    distinct word n-grams, duplicate-n-gram fraction, and the most
    frequent n-gram's share. High values flag boilerplate/degenerate
    docs that near-dup removal misses (it only sees CROSS-doc overlap).

    Plan: one explode -> (doc, gram) count (map-side combined) -> per-doc
    agg — two shuffles total, both keyed small; docs shorter than n
    tokens come back with zero counts via the left join.
    """
    from ..functions.texthash import shingles

    sh = exploded_nonnull(
        spread_small_input(docs), [F.col(id_col).alias("id")],
        shingles(tokens(text_col), n), "g",
    )
    freq = sh.groupBy("id", "g").agg(F.count("*").alias("f"))
    agg = freq.groupBy("id").agg(
        F.sum("f").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max("f").cast("long").alias("top"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(agg, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("total", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct_ngrams"),
            F.round(
                F.when(F.col("total") > 0, 1.0 - F.col("n_distinct") * 1.0 / F.col("total")).otherwise(0.0), 6
            ).alias("dup_ngram_frac"),
            F.round(
                F.when(F.col("total") > 0, F.col("top") * 1.0 / F.col("total")).otherwise(0.0), 6
            ).alias("top_ngram_frac"),
        )
    )


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document average unigram log-probability under the corpus's own
    unigram LM — the cheap 'perplexity-ish' quality signal used to rank
    documents before an expensive model-based filter (low avg logprob =
    rare-token soup: OCR noise, codes, gibberish).

    Determinism contract (SURVEY §5.2): each token's ln(freq/total) is
    rounded to 1e-6 and integerized to micro-nats; per-doc sums are exact
    integer sums (order-independent across partitions), divided once at
    the end. ln() itself is IEEE-correctly-rounded on both engines, and
    the 1e-6 rounding absorbs the last-ulp difference — same pattern the
    driver-green t_tfidf entry relies on.

    Plan shape: one explode -> groupBy(term) for the vocab (map-side
    combined), the corpus total as a broadcast singleton, logprobs joined
    back to the exploded tokens by term (|vocab| << corpus rows — AQE
    broadcasts it at any realistic vocabulary size), then one groupBy by
    doc. Docs with zero tokens keep a NULL avg via the left join — they
    carry no evidence, which is not the same as scoring well.
    """
    toks = exploded_nonnull(
        spread_small_input(docs), [F.col(id_col).alias("id")], tokens(text_col), "term"
    )
    vocab = toks.groupBy("term").agg(F.count("*").alias("freq"))
    # NOTE(round 6): deriving total from vocab (sum of freqs) measured
    # SLOWER — without caching, Spark re-executes the vocab aggregation
    # (tokenize + term shuffle) for the scalar, while this map-side count
    # is one tokenize pass with no exchange.  Plans don't share subtrees;
    # "reuse the aggregate" is only a win when the aggregate is cached.
    total = toks.agg(F.count("*").alias("total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.round(F.log(F.col("freq") / F.col("total")) * 1e6, 0).cast("long").alias("lp_micro"),
    )
    per_doc = (
        toks.join(lp, "term")
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_lm_tokens"), F.sum("lp_micro").alias("s"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_lm_tokens", F.lit(0).cast("long")).alias("n_lm_tokens"),
            F.round(F.col("s") / F.col("n_lm_tokens") / 1e6, 6).alias("avg_logprob"),
        )
    )


# (pattern, replacement) in application order; counts are taken on the
# ORIGINAL text so overlapping rewrites can't hide matches
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction for training corpora: replace emails / IPv4s /
    NANP-style phone fragments with typed placeholder tags and count the
    redactions per category. Pure regexp built-ins (codegen'd, zero
    shuffles — scale is scan throughput); patterns chosen to behave
    identically under Java regex (Spark) and RE2 (DuckDB oracle).
    """
    scrubbed = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(f"n_{name}s")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval scoring for a literal query — the classic lexical
    ranking function (Robertson/Sparck-Jones idf with Lucene's +1 floor)
    and the sparse half of a RAG retrieval stack (the dense half is the
    ANN family in operators/similarity.py).

    Distributed shape: the term filter is applied BEFORE any shuffle, so
    everything downstream is proportional to the query terms' postings,
    not the corpus — at 100 TB the explode+filter is a map-only scan and
    the (doc, term) tf shuffle carries only matching tokens. Document
    length rides the explode as a carried column (functionally dependent
    on the doc id — no separate doc-length join), df is |query| rows
    broadcast, and the corpus stats (N, total length) are a broadcast
    scalar. Per-term contributions are summed in FIXED query order via
    conditional aggregation — each term's sum sees exactly one row per
    doc, so the float result is order-deterministic and oracle-exact
    (a plain sum() over terms would float-drift between engines).
    """
    terms = [t.lower() for t in query_terms]
    dl = F.size(tokens(text_col)).alias("dl")
    toks = exploded_nonnull(
        spread_small_input(docs),
        [F.col(id_col).alias("id"), dl], tokens(text_col), "term",
    )
    hits = toks.filter(F.col("term").isin(terms))
    tf = hits.groupBy("id", "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = (hits.select("id", "term").distinct()
             .groupBy("term").agg(F.count("*").alias("dfreq")))
    stats = docs.agg(
        F.count("*").alias("n"),
        F.sum(F.size(tokens(text_col))).alias("tot"),
    )
    avgdl = F.col("tot").cast("double") / F.col("n")
    idf = F.log((F.col("n") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5) + 1.0)
    contrib = (
        idf * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * ((1.0 - b) + b * F.col("dl") / avgdl))
    )
    per = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("id", "term", contrib.alias("c"))
    )
    by_doc = per.groupBy("id").agg(*[
        F.sum(F.when(F.col("term") == t, F.col("c"))).alias(f"_c{i}")
        for i, t in enumerate(terms)
    ])
    score = F.coalesce(F.col("_c0"), F.lit(0.0))
    for i in range(1, len(terms)):
        score = score + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
    out = by_doc.select(
        F.col("id").alias(id_col), F.round(score, 6).alias("bm25"))
    return out.orderBy(F.col("bm25").desc(), id_col).limit(k)
