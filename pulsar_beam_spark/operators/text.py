"""Text-analysis operators for corpus curation: tokenization stats,
language ID (stopword-lexicon heuristic), quality scoring, document
fingerprinting, term frequency. All pure Spark built-ins (codegen'd),
every one mirrorable in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.litarr import lit_arr
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
    lex = lit_arr(list(lexicon), "string")
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
    stop = lit_arr(list(STOPWORDS_EN), "string")
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


# Greedy-BPE merge table, in application (rank) order. Deliberately a
# small LITERAL vocabulary: the operator's contract is the deterministic
# merge ALGORITHM (rank-ordered, all non-overlapping occurrences per
# rank, left-to-right — the standard BPE-encoder convention), not a
# trained vocab; a production deployment swaps in its tokenizer's merge
# list unchanged. Later ranks reference tokens earlier ranks create
# (th+e, an+d, in+g ...), exercising the multi-level merge path.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("s", "t"), ("e", "n"),
    ("o", "r"), ("an", "d"), ("in", "g"), ("e", "s"), ("o", "u"),
    ("l", "e"), ("c", "h"), ("s", "e"), ("d", "a"), ("da", "ta"),
    ("s", "c"), ("sc", "an"), ("j", "o"), ("jo", "in"),
)


# Practical bound for the NESTED-replace plan form below (VERDICT r11
# item 4, measured on this container, Spark 4.1 local mode): the chain
# builds one expression node per rank, and the driver-side
# ColumnNodeToExpression conversion recurses per node — at 256 ranks
# build+exec cost ~1.3 s + ~4.4 s over 500 docs; at 512 ranks the
# conversion dies with java.lang.StackOverflowError before any plan
# exists. The bound is therefore a HARD engine limit, not a tuning
# choice; past it use bpe_token_count_hof (O(1) plan nodes — the merge
# table is DATA in one literal, any rank count) or the Arrow-batched
# bpe_token_count_arrow (the execution default for real tokenizers).
BPE_NESTED_MAX_RANKS = 256


def gen_bpe_merges(n: int) -> tuple[tuple[str, str], ...]:
    """Deterministic synthetic merge table of ``n`` ranks over the
    [a-z0-9]+ alphabet, for exercising realistic-tokenizer-scale rank
    counts (real tables are 10k-50k merges): first the 676 two-letter
    pairs in a fixed permuted order (stride 375, coprime to 676), then
    multi-level merges referencing earlier tokens — the structure (not
    the linguistics) of a trained BPE vocabulary. Duplicate-free by
    construction."""
    import string

    chars = string.ascii_lowercase
    out: list[tuple[str, str]] = []
    for k in range(676):
        if len(out) >= n:
            break
        idx = (k * 375 + 91) % 676
        out.append((chars[idx // 26], chars[idx % 26]))
    i = 0
    while len(out) < n:
        a, b = out[i]
        out.append((a + b, chars[(i * 17 + 7) % 26]))
        i += 1
    return tuple(out)


def _check_merge_alphabet(merges) -> None:
    import re

    for a, b in merges:
        # the bracket delimiting is only sound over the extracted
        # [a-z0-9]+ alphabet: a merge token carrying '[' or ']' (or any
        # char the word regex can't emit) would collide with the
        # delimiters and silently mis-merge — reject at plan-build time
        if not re.fullmatch(r"[a-z0-9]+", a) or not re.fullmatch(r"[a-z0-9]+", b):
            raise ValueError(
                f"bpe merge {(a, b)!r} outside the [a-z0-9]+ token "
                "alphabet — the bracket-delimited replace scheme cannot "
                "represent it")


def _bpe_words(text_col, max_words: int | None = None):
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.regexp_extract_all(
        F.lower(F.coalesce(c, F.lit(""))), F.lit("[a-z0-9]+"), F.lit(0))
    return F.slice(words, 1, max_words) if max_words else words


def bpe_token_count_hof(text_col, merges, max_words: int | None = None):
    """Rank-sweep BPE count with the merge table as DATA: one literal
    ``array<array<string>>`` folded over each word with ``aggregate``
    (replace per rank) — the plan holds O(1) expression nodes no matter
    the rank count, so the StackOverflowError wall the nested form hits
    at ~512 ranks (BPE_NESTED_MAX_RANKS) never appears. Exactly mirrors
    the DuckDB oracle's ``list_reduce(list_prepend(...))`` accumulator
    trick, so counts stay hash-verifiable at ANY table size. Execution
    is Spark's interpreted HOF path (~linear in ranks x words); for the
    throughput path see bpe_token_count_arrow, bit-equality gated."""
    _check_merge_alphabet(merges)
    ml = lit_arr([[a, b] for a, b in merges], "string").cast("array<array<string>>")

    def word_tokens(w):
        s0 = F.regexp_replace(w, "(.)", "[$1]")
        s = F.aggregate(ml, s0, lambda acc, m: F.replace(
            acc,
            F.concat(F.lit("["), F.element_at(m, 1), F.lit("]["),
                     F.element_at(m, 2), F.lit("]")),
            F.concat(F.lit("["), F.element_at(m, 1), F.element_at(m, 2),
                     F.lit("]"))))
        return F.length(s) - F.length(F.replace(s, F.lit("["), F.lit("")))

    return F.aggregate(
        F.transform(_bpe_words(text_col, max_words), word_tokens),
        F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long"),
    )


def bpe_token_count_arrow(text_col, merges, max_words: int | None = None):
    """Arrow-batched execution default for realistic merge tables: the
    same rank-sweep semantics (rank-ordered, left-to-right
    non-overlapping — Python str.replace == Spark replace == DuckDB
    replace on the bracket-disjoint encoding) run as C-level replaces
    with a per-batch DISTINCT-WORD cache, so each unique word pays the
    sweep once per batch regardless of its frequency — the shape a
    100 TB token-accounting pass actually runs. Bit-equality against
    bpe_token_count_hof (and through it the SQL oracle) is gated in
    tests/test_operators.py."""
    import re

    from pyspark.sql.functions import pandas_udf

    _check_merge_alphabet(merges)
    pairs = [(f"[{a}][{b}]", f"[{a}{b}]") for a, b in merges]
    word_re = re.compile(r"[a-z0-9]+")
    mw = max_words

    @pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def word_count(w: str) -> int:
            v = cache.get(w)
            if v is None:
                t = "".join("[" + ch + "]" for ch in w)
                for pat, rep in pairs:
                    t = t.replace(pat, rep)
                v = t.count("[")
                cache[w] = v
            return v

        out = []
        for txt in s:
            words = word_re.findall((txt or "").lower())
            if mw:
                words = words[:mw]
            out.append(sum(word_count(w) for w in words))
        return pd.Series(out, dtype="int64")

    return _count(F.col(text_col) if isinstance(text_col, str) else text_col)


def bpe_token_count(text_col, merges: tuple = BPE_MERGES):
    """Per-row subword token count under deterministic greedy BPE
    (VERDICT r10 item 4 — the packing/budget operators counted
    whitespace tokens; training-data budgets are computed with subword
    tokenizers).

    Algorithm: lowercase, extract ``[a-z0-9]+`` words, explode each word
    to bracket-delimited characters (``data`` -> ``[d][a][t][a]``), then
    apply each merge rank once as a literal string replace
    (``[d][a]`` -> ``[da]``). Because every token is self-delimited by
    its own brackets, adjacent matches never share characters, so the
    engines' standard left-to-right non-overlapping replace IS the BPE
    "merge all occurrences of this rank" sweep; and since merging two
    tokens can never create a new adjacency for an already-applied rank
    (tokens between two others never vanish, they only coarsen), one
    rank-ordered pass equals the canonical greedy encode. The token
    count is then the number of ``[`` delimiters.

    Everything is JVM built-ins (regexp_extract_all + literal replace
    chain inside transform/aggregate lambdas): whole-stage codegen, zero
    shuffles, no Python — and every step has an exact DuckDB mirror
    (queries._bpe_count_sql), so the count is hash-verifiable.
    """
    _check_merge_alphabet(merges)
    if len(merges) > BPE_NESTED_MAX_RANKS:
        raise ValueError(
            f"bpe_token_count: {len(merges)} merge ranks exceed the nested-"
            f"replace plan bound ({BPE_NESTED_MAX_RANKS}) — the per-rank "
            "expression chain StackOverflows driver-side conversion at "
            "~512 ranks (measured; see BPE_NESTED_MAX_RANKS). Use "
            "bpe_token_count_hof (literal merge table, O(1) plan nodes) "
            "or bpe_token_count_arrow (vectorized execution default)")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.regexp_extract_all(
        F.lower(F.coalesce(c, F.lit(""))), F.lit("[a-z0-9]+"), F.lit(0))

    def word_tokens(w):
        s = F.regexp_replace(w, "(.)", "[$1]")
        for a, b in merges:
            s = F.replace(s, F.lit(f"[{a}][{b}]"), F.lit(f"[{a}{b}]"))
        return F.length(s) - F.length(F.replace(s, F.lit("["), F.lit("")))

    return F.aggregate(
        F.transform(words, word_tokens),
        F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long"),
    )


def bpe_subword_tokens(text_col, merges: tuple = BPE_MERGES):
    """``array<string>`` of the row's greedy-BPE subword tokens — the
    same bracket-delimited rank sweep as ``bpe_token_count`` but
    RETURNING the tokens instead of counting the delimiters: strip the
    outer brackets, split on ``][``. Pure codegen; feeds the
    vocabulary-audit entry (top subwords over a corpus — what a
    tokenizer's vocab actually ABSORBS on this data, the counterpart of
    t_vocab_coverage for subword vocabularies)."""
    _check_merge_alphabet(merges)
    if len(merges) > BPE_NESTED_MAX_RANKS:
        raise ValueError(
            f"bpe_subword_tokens: {len(merges)} merge ranks exceed the "
            f"nested-replace plan bound ({BPE_NESTED_MAX_RANKS}); see "
            "bpe_token_count's scale forms")

    def word_tokens(w):
        s = F.regexp_replace(w, "(.)", "[$1]")
        for a, b in merges:
            s = F.replace(s, F.lit(f"[{a}][{b}]"), F.lit(f"[{a}{b}]"))
        return F.split(F.btrim(s, F.lit("[]")), r"\]\[")

    return F.flatten(F.transform(_bpe_words(text_col), word_tokens))


def bpe_top_subwords(
    docs: DataFrame, k: int = 20,
    merges: tuple = BPE_MERGES,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(token, n) top-k subword tokens by corpus frequency, ties by
    token — explode + one count shuffle + TakeOrderedAndProject."""
    return (
        spread_small_input(docs)
        .select(F.explode(bpe_subword_tokens(text_col, merges)).alias("token"))
        .groupBy("token").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(k)
    )


def bpe_train_merges(
    docs: DataFrame, ranks: int, text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """LEARN a greedy-BPE merge table from the corpus (VERDICT r12
    task 2 — the token family's training half, completing the fixed →
    trained arc the vector indexes already have): ``ranks`` iterations
    of most-frequent-adjacent-pair merging (Sennrich 2016), returning
    ``[(left, right, pair_count), ...]`` in rank order.

    Oracle-replayable by the k-means discipline: every count is an
    exact integer (occurrence-weighted adjacent-pair frequencies), the
    argmax tie-break is total (count DESC, then lexicographic (a, b) —
    binary collation over the [a-z0-9]+ alphabet on both engines), and
    each iteration's merge-apply is the same left-to-right
    non-overlapping bracket replace the encoder uses, so DuckDB can
    unroll the identical chain as CTEs (queries._bpe_train_ctes).

    Scale shape: ONE corpus-rate pass (the wordcount explode+groupBy
    shuffle) collapses the corpus to the distinct-word frame — vocab ≪
    corpus, the same reduction the Arrow encode kernel and the vocab-
    rate oracle exploit — localCheckpointed so iterations never re-read
    the corpus. Each iteration is then a vocab-rate pair count (explode
    adjacent symbol pairs + one small agg) and a ONE-row argmax collect;
    the driver holds only the learned table (ranks rows), exactly like
    kmeans_fit's k-row centroid state. The per-iteration bracket string
    is rebuilt from the base word under the current table (i replaces
    at iteration i — O(ranks²) vocab-rate replaces total), keeping the
    DataFrame lineage flat instead of stacking ranks checkpoints.
    """
    if ranks > BPE_NESTED_MAX_RANKS:
        raise ValueError(
            f"bpe_train_merges: {ranks} ranks exceed the nested-replace "
            f"plan bound ({BPE_NESTED_MAX_RANKS}); train in chunks or "
            "move the apply side to the HOF/Arrow forms first")
    words = (
        spread_small_input(docs)
        .select(F.explode(_bpe_words(text_col)).alias("w"))
        .groupBy("w").agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(ranks)):
        # The current table rides as DATA in one array literal folded
        # with aggregate() (r15): every rank's plan is then STRUCTURALLY
        # IDENTICAL — only the literal's value changes — so whole-stage
        # codegen compiles the pair-count stage once and later ranks
        # reuse it; the previous unrolled replace chain produced a NEW
        # plan (and a fresh codegen compile) at every rank, which
        # dominated the vocab-rate jobs (sf0.1: 31-row vocab, 0.4-1.5 s
        # per rank, nearly all driver-side). Fold order = chain order
        # (left to right) — the same equivalence bpe_token_count_hof
        # gates against the SQL oracle.
        if merges:
            ml = lit_arr([[a, b] for a, b, _cnt in merges], "string")
        else:
            ml = F.expr("CAST(array() AS array<array<string>>)")
        s = F.aggregate(ml, F.regexp_replace("w", "(.)", "[$1]"),
                        lambda acc, m: F.replace(
                            acc,
                            F.concat(F.lit("["), F.element_at(m, 1),
                                     F.lit("]["), F.element_at(m, 2),
                                     F.lit("]")),
                            F.concat(F.lit("["), F.element_at(m, 1),
                                     F.element_at(m, 2), F.lit("]"))))
        syms = F.split(F.btrim(s, F.lit("[]")), r"\]\[")
        pairs = F.zip_with(
            F.slice(syms, F.lit(1), F.size(syms) - 1),
            F.slice(syms, F.lit(2), F.size(syms) - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
        top = (
            words.select(F.explode(pairs).alias("p"), "n")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1).collect()
        )
        if not top:
            raise ValueError(
                f"bpe_train_merges: corpus exhausted after {len(merges)} "
                f"merges (every word is a single token) — {ranks} ranks "
                "exceed this corpus's merge capacity; lower ranks")
        r = top[0]
        merges.append((r["a"], r["b"], int(r["cnt"])))
    return merges


def bpe_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc token accounting under the three counters a budget
    pipeline compares: whitespace tokens, alnum words, and greedy-BPE
    subword tokens (always >= words: unmerged chars count singly)."""
    ws = F.size(tokens(text_col))
    words = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit("[a-z0-9]+"), F.lit(0))
    return docs.select(
        F.col(id_col),
        F.coalesce(ws, F.lit(0)).cast("long").alias("n_ws_tokens"),
        F.size(words).cast("long").alias("n_words"),
        bpe_token_count(text_col).alias("n_bpe_tokens"),
    )


def bm25_build_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One-time ingest-side pass producing the three persisted BM25
    artifacts (VERDICT r10 item 2 — ``bm25_topk`` re-tokenizes the full
    corpus per query for two scalars and the postings; at 100 TB that
    scan belongs at ingest, paid once, exactly like PQ's persisted code
    columns):

    - ``postings``  (term, doc_id, tf, dl) — the inverted index at
      (term, doc) grain, doc length denormalized onto every posting so
      query-time scoring needs no doc-length join. Written partitioned-
      by-nothing here but term-sortable: at cluster scale you'd bucket
      or partition by term so a query's ``term IN (...)`` prunes files.
    - ``dictionary`` (term, dfreq) — document frequency per term; tiny
      (vocab-sized), broadcast at query time.
    - ``stats``     (n, tot) — corpus document count and total token
      count, ONE row.

    The index is a pure deterministic function of the corpus, so any
    query scored from it is bit-identical to ``bm25_topk`` scored from
    the raw text — the oracle recomputes from ``documents`` directly.
    """
    dl = F.size(tokens(text_col)).alias("dl")
    toks = exploded_nonnull(
        spread_small_input(docs),
        [F.col(id_col).alias("doc_id"), dl], tokens(text_col), "term",
    )
    postings = toks.groupBy("term", "doc_id", "dl").agg(
        F.count("*").alias("tf"))
    # postings grain is already (term, doc): dfreq = plain count, no
    # second distinct pass over the token stream
    dictionary = postings.groupBy("term").agg(F.count("*").alias("dfreq"))
    stats = docs.agg(
        F.count("*").alias("n"),
        F.sum(F.size(tokens(text_col))).alias("tot"),
    )
    return postings, dictionary, stats


def bm25_merge_index(
    postings: DataFrame,
    dictionary: DataFrame,
    stats: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incremental index maintenance — fold a NEW document batch into
    existing BM25 artifacts without re-reading the old corpus (the
    ingest-side story at 100 TB: the indexed path is only honest if the
    index can be MAINTAINED, not just built once):

    - postings: pure append (the batch's doc ids are new, so (term,
      doc) grain cannot collide — append-only corpora; upstream dedup
      owns id reuse);
    - dictionary: vocab-sized union + re-sum of dfreq;
    - stats: two one-row frames summed.

    Every artifact is an integer table, so the merged index is
    BIT-IDENTICAL to a full rebuild over the union corpus — pinned by
    the t_bm25_index_merge entry, whose oracle scores the full corpus
    from raw text and must hash-match the incrementally-merged path.
    Only the new batch is tokenized; the old corpus contributes its
    (tiny) dictionary and stats rows.
    """
    np_, nd_, ns_ = bm25_build_index(new_docs, id_col=id_col, text_col=text_col)
    merged_postings = postings.unionByName(np_)
    merged_dictionary = (
        dictionary.unionByName(nd_)
        .groupBy("term").agg(F.sum("dfreq").alias("dfreq"))
    )
    merged_stats = stats.unionByName(ns_).agg(
        F.sum("n").alias("n"), F.sum("tot").alias("tot"))
    return merged_postings, merged_dictionary, merged_stats


def bm25_topk_indexed(
    postings: DataFrame,
    dictionary: DataFrame,
    stats: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Query-time BM25 over the persisted index from
    ``bm25_build_index`` — never touches the corpus text. The term
    filter is the FIRST operation on the postings scan, so with the
    artifacts on parquet it lands in PushedFilters and the scan reads
    only the query terms' postings (plan-pinned in
    tests/test_plans.py); the dictionary is filtered to the query terms
    and broadcast; stats is one broadcast row. One shuffle total (the
    per-doc score agg), proportional to matching postings — the true
    100 TB shape: corpus cost paid once at ingest, per-query cost
    proportional to |postings(query)|.

    Scoring is term-for-term identical to ``bm25_topk`` (Lucene-form
    idf, fixed query-order conditional sums for an order-deterministic
    float), so the same DuckDB oracle text verifies both paths.
    """
    terms = [t.lower() for t in query_terms]
    hits = postings.filter(F.col("term").isin(terms))
    dfq = dictionary.filter(F.col("term").isin(terms))
    avgdl = F.col("tot").cast("double") / F.col("n")
    idf = F.log((F.col("n") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5) + 1.0)
    contrib = (
        idf * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * ((1.0 - b) + b * F.col("dl") / avgdl))
    )
    per = (
        hits.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", contrib.alias("c"))
    )
    by_doc = per.groupBy("doc_id").agg(*[
        F.sum(F.when(F.col("term") == t, F.col("c"))).alias(f"_c{i}")
        for i, t in enumerate(terms)
    ])
    score = F.coalesce(F.col("_c0"), F.lit(0.0))
    for i in range(1, len(terms)):
        score = score + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
    out = by_doc.select(
        F.col("doc_id").alias(id_col), F.round(score, 6).alias("bm25"))
    return out.orderBy(F.col("bm25").desc(), id_col).limit(k)
