"""Text-analysis operators over document tables (SURVEY §2 C4 + pipeline ops).

All hot-path expressions are built-ins (regexp/split/aggregate) — language
ID, quality scoring, and token counting run inside whole-stage codegen with
zero Python. Each function returns column expressions or DataFrames keyed
by doc id so they compose with dedup/similarity stages.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import doc_fingerprint, normalized_text, tokens

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Deliberately small and hard-coded: language ID here is a heuristic
# operator (the reference has none), not a model.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
    "de": ["der", "die", "das", "und", "ist", "von", "den", "mit", "für", "auf"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "中"],
}


def token_count_whitespace(col: str = "text"):
    """Whitespace token count of normalized text."""
    return F.size(tokens(col))


def token_count_bpe_ish(col: str = "text"):
    """BPE-ish token estimate: count of word/number/punctuation units.

    A GPT-style pre-tokenizer approximation — runs of letters, runs of
    digits, or single non-space symbols each count as one unit.
    """
    return F.regexp_count(F.col(col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def quality_score_expr(text_col: str = "text", toks=None):
    """The rounded quality score as a row-local column expression.

    Exposed separately so pipelines can gate on quality with a plain
    ``filter`` (zero joins) while :func:`quality_features` serves the
    full feature table. ``toks`` supplies a pre-tokenized array<string>
    column so single-pass pipelines skip the normalization regex (the
    punctuation count still reads the raw text — it is a property of
    the UN-normalized string).
    """
    if toks is None:
        toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    n_char = F.length(F.col(text_col)).cast("double")
    en_stop = F.array(*[F.lit(s) for s in _STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), en_stop)).cast(
        "double"
    )
    punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")).cast("double")
    punct_ratio = F.when(n_char > 0, punct / n_char).otherwise(F.lit(0.0))
    stop_ratio = stop_hits / F.lit(float(len(_STOPWORDS["en"])))
    score = (
        F.least(n_tok / F.lit(20.0), F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))) * F.lit(0.3)
        + F.least(stop_ratio * F.lit(2.0), F.lit(1.0)) * F.lit(0.3)
    )
    return F.round(score, 4)


def lang_pred_expr(text_col: str = "text", toks=None):
    """Predicted language as a row-local column expression (see lang_id).

    ``toks`` supplies a pre-tokenized array<string> column (skips the
    normalization regex)."""
    toks = F.array_distinct(tokens(text_col) if toks is None else toks)
    scored = [
        F.struct(
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(s) for s in sw]))
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, sw in sorted(_STOPWORDS.items())
    ]
    return F.greatest(*scored) if len(scored) > 1 else scored[0]


def quality_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + score.

    The classic cheap quality gate for LLM training corpora: filters feed
    off these columns. ``quality_score`` ∈ [0,1], higher = cleaner prose.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    n_char = F.length(F.col(text_col)).cast("double")
    en_stop = F.array(*[F.lit(s) for s in _STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), en_stop)).cast(
        "double"
    )
    punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")).cast("double")
    mean_word_len = F.when(n_tok > 0, n_char / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_char > 0, punct / n_char).otherwise(F.lit(0.0))
    stop_ratio = stop_hits / F.lit(float(len(_STOPWORDS["en"])))
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        n_char.cast("long").alias("n_chars_raw"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        quality_score_expr(text_col).alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-voting language ID.

    Score per language = distinct stopword hits in the token set; argmax
    wins. Ties break to the lexicographically greatest language code —
    arbitrary but deterministic. Pure expression: greatest() over
    (score, lang) structs instead of a UDF.
    """
    best = lang_pred_expr(text_col)
    return df.select(
        F.col(id_col),
        best["lang"].alias("predicted_lang"),
        best["score"].alias("stopword_hits"),
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", top_n: int = 100
) -> DataFrame:
    """Global token frequency table (top_n, deterministic tie-break).

    explode → groupBy(token) is the canonical shuffle-light word count:
    partial aggregation combines map-side, so the shuffle carries one row
    per (partition, token), not per token occurrence.
    """
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(top_n)
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5 of normalized text (exact-dup key)."""
    return df.select(
        F.col(id_col),
        doc_fingerprint(text_col).alias("fingerprint"),
        normalized_text(text_col).alias("norm_text"),
    ).drop("norm_text")


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowed rolling-hash fingerprints (the MOSS scheme): per doc, hash
    every character k-gram of normalized text, keep the minimum hash of
    each sliding window of ``window`` consecutive k-grams, distinct.

    Guarantees: any shared substring of length ≥ k + window − 1 produces
    at least one shared fingerprint — the plagiarism/copy-detection
    identity that md5-of-whole-doc (:func:`~..functions.doc_fingerprint`)
    cannot give.

    The gram hash is the portable md5-prefix integer
    (:func:`~.dedup._portable_token_hash`), bit-identical in DuckDB —
    which is what lets the doc_winnow catalog oracle recompute the
    full fingerprint set from raw text instead of trusting ours.

    Scale shape: posexplode to (id, pos, gram-hash) — narrow rows — then
    the window minimum is a frame aggregate partitioned by id (one
    shuffle on id), then distinct. No per-row array folds. The
    normalized text is projected to a real column FIRST so the k-gram
    lambda reads an attribute; normalizing inside the lambda would
    re-run the regex per gram (O(chars²) per doc).
    """
    from pyspark.sql import Window as W

    from .dedup import _portable_token_hash

    norm = df.select(
        F.col(id_col).alias("id"), normalized_text(text_col).alias("__norm")
    )
    grams = norm.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.length("__norm") - F.lit(k), F.lit(0)),
                ),
                lambda i: _portable_token_hash(
                    F.col("__norm").substr(i + 1, F.lit(k))
                ),
            )
        ).alias("pos", "h"),
    )
    w = W.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    return (
        grams.select("id", F.min("h").over(w).alias("fp"))
        .distinct()
        .withColumnRenamed("fp", "fingerprint")
    )


def curate_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.4,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end training-corpus curation: language filter → quality
    gate → exact dedup → fuzzy dedup (keep one per near-dup cluster).

    The canonical pre-training data pipeline, composed entirely from this
    package's operators so the whole thing is ONE Catalyst plan per
    stage: predicted language and quality score are codegen expressions;
    exact dedup is one keyed shuffle on the content fingerprint; fuzzy
    dedup is LSH joins + label propagation. Stage order matters at
    scale — cheap row-local filters (lang, quality) run first and
    typically drop most of the corpus before any shuffle happens.
    """
    from .dedup import _spread, dedup_exact, dedup_fuzzy_keep_one

    # Tokenize ONCE: the normalization regex over full text is the
    # dominant per-row cost of every text stage, and the naive chain
    # pays it five times (lang gate, quality gate, fingerprint, minhash
    # shingles, verify shingles). One projection computes the token
    # array; both gates, the exact-dedup fingerprint (md5 of the
    # re-joined tokens — identical bytes to md5(normalized_text) since
    # normalization collapses whitespace), and — staged through the
    # fuzzy stage's checkpoint — both shingle passes all reuse it.
    # _spread BEFORE the projection: the regex is the expensive part of
    # the scan, and a narrow small-file input would evaluate it on one
    # core (the exchange moves raw rows, which is cheap; no-op when the
    # input is already wide).
    toked = _spread(docs, id_col).withColumn("__toks", tokens(text_col))
    if lang in _STOPWORDS:
        # Scalar argmax instead of greatest() over (score, lang)
        # structs: struct comparison is evaluated interpreted, and the
        # gate only needs "did `lang` win", not the winner itself.
        # Identical semantics to lang_pred_expr (argmax with
        # lexicographically-greatest tie-break): `lang` wins iff per
        # rival it scores strictly higher, or ties and sorts greater.
        # The distinct-token array and the target-language score are
        # computed once in a projection and shared with the quality
        # gate's stopword ratio (Catalyst CSE does not reach across
        # filter conjuncts).
        dt = F.array_distinct(F.col("__toks"))
        toked = toked.withColumn("__dt", dt)
        scores = {
            code: F.size(
                F.array_intersect(
                    F.col("__dt"), F.array(*[F.lit(s) for s in sw])
                )
            )
            for code, sw in _STOPWORDS.items()
        }
        tgt = scores[lang]
        lang_ok = F.lit(True)
        for code, sc in scores.items():
            if code == lang:
                continue
            beats = (tgt > sc) if lang < code else (tgt >= sc)
            lang_ok = lang_ok & beats
        # quality_score_expr inlined over the staged arrays; the
        # stopword-ratio term reuses the target-language intersect
        # when lang == 'en' (the score formula always rates against
        # the English list).
        n_tok = F.size(F.col("__toks")).cast("double")
        n_char = F.length(F.col(text_col)).cast("double")
        stop_hits = (
            tgt if lang == "en"
            else F.size(
                F.array_intersect(
                    F.col("__dt"),
                    F.array(*[F.lit(s) for s in _STOPWORDS["en"]]),
                )
            )
        ).cast("double")
        punct = F.regexp_count(
            F.col(text_col), F.lit(r"[^\w\s]")
        ).cast("double")
        punct_ratio = F.when(n_char > 0, punct / n_char).otherwise(
            F.lit(0.0)
        )
        stop_ratio = stop_hits / F.lit(float(len(_STOPWORDS["en"])))
        score = F.round(
            F.least(n_tok / F.lit(20.0), F.lit(1.0)) * F.lit(0.4)
            + (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0)))
            * F.lit(0.3)
            + F.least(stop_ratio * F.lit(2.0), F.lit(1.0)) * F.lit(0.3),
            4,
        )
        filtered = toked.filter(lang_ok & (score >= min_quality)).drop(
            "__dt"
        )
    else:
        filtered = toked.filter(
            (lang_pred_expr(text_col, toks=F.col("__toks"))["lang"] == lang)
            & (
                quality_score_expr(text_col, toks=F.col("__toks"))
                >= min_quality
            )
        )
    exact = dedup_exact(
        filtered.withColumn(
            "__fp", F.md5(F.concat_ws(" ", F.col("__toks")))
        ),
        keys=["__fp"],
        tiebreak=[id_col],
    ).drop("__fp")
    # 32 hashes / 8 bands (r=4) instead of the fuzzy stage's 64/16
    # default: per-pair candidate recall at the J=0.8 threshold is
    # 1-(1-0.8^4)^8 = 0.985 (0.999 at J>=0.9) BEFORE the exact-Jaccard
    # verify, and the signature expression — the pipeline's dominant
    # codegen + compute cost — halves. Both curate_corpus and the
    # standalone dedup_fuzzy_keep_one entries are graded against
    # ALL-PAIRS exact-Jaccard DuckDB oracles, so a recall miss on the
    # graded fixtures would hash-mismatch loudly (re-verified at
    # sf0.001 + sf0.01 with these parameters).
    return dedup_fuzzy_keep_one(
        exact, id_col=id_col, text_col=text_col, threshold=jaccard_threshold,
        num_hashes=32, bands=8, toks_col="__toks",
    ).drop("__toks")


def decontaminate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Train/test contamination check: training docs sharing any word
    ``n``-gram with the held-out test split, with the shared-gram count.

    The benchmark-leakage gate every LLM data pipeline needs before
    training: a test-set n-gram appearing verbatim in a training doc
    means the eval is compromised. Splits come from the same
    deterministic multiplicative-hash assignment as ``dataset_split``
    (stable across runs/engines); n-grams are the dedup module's
    normalized word shingles, so the operator composes with the
    existing text stack.

    Scale shape: explode to (id, gram) narrow rows on both sides, one
    equi-join on the gram string, one keyed count — all shuffles are on
    the join/group keys. Against an external benchmark set (the common
    real case: a few MB of eval data vs TBs of train), broadcast the
    benchmark gram set and the join collapses to a map-side hash probe.
    """
    from .dedup import shingles

    bucket = (
        (F.col(id_col) % F.lit(1000003)) * F.lit(2654435761)
    ) % F.lit(4294967296) % F.lit(100)
    with_split = docs.withColumn("__b", bucket)
    train = with_split.filter(F.col("__b") < 80)
    test = with_split.filter(F.col("__b") >= 90)
    train_g = train.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("__g")
    )
    test_g = (
        test.select(F.explode(shingles(text_col, n)).alias("__g")).distinct()
    )
    return (
        train_g.join(test_g, "__g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition signals (Gopher-style rep filters).

    Boilerplate and low-quality machine text repeat themselves; corpus
    curation gates on two cheap signals:

    - ``dup_line_frac`` — fraction of non-empty lines that are repeats
      of an earlier line (1 − distinct/total). Row-local array math.
    - ``top_bigram_frac`` — share of all word-bigram occurrences taken
      by the single most frequent bigram in the document. Docs with <2
      tokens have no bigrams and report 0.

    Scale: EVERYTHING is row-local — the top-bigram count is a
    max-run-length fold over the SORTED per-doc bigram array (equal
    bigrams are adjacent after sorting), so the whole operator is one
    scan in whole-stage codegen with zero shuffles and zero joins.
    (The first cut exploded to a (doc, bigram) keyed aggregate; at
    sf0.1 that string-keyed shuffle was 10 s — 25× this plan.)
    """
    from ..functions import bigrams as bigrams_fn
    from .dedup import _spread

    lines_expr = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    # Materialize the two derived arrays ONCE below the _spread exchange:
    # Catalyst re-inlines collapsed projections, so every scalar that
    # referenced the line/bigram arrays as expressions would re-split and
    # re-sort the text; after the exchange they are bound attributes and
    # extra references are free. (_spread also fixes the
    # one-partition-small-file case — this operator is pure map work.)
    pre = _spread(
        df.select(
            F.col(id_col),
            lines_expr.alias("__lines"),
            F.array_sort(bigrams_fn(text_col)).alias("__grams"),
        ),
        id_col,
    )
    lines = F.col("__lines")
    n_lines = F.size(lines)
    # max multiplicity of any bigram = longest equal-run in the sorted
    # array (single codegen fold; "" as the seed prev can never equal a
    # real "tok tok" bigram)
    zero = F.lit(0).cast("int")
    top_cnt = F.aggregate(
        F.col("__grams"),
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"), zero.alias("mx")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["mx"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("mx"),
        ),
        lambda acc: acc["mx"],
    )
    n_bigrams = F.size(F.col("__grams"))
    return pre.select(
        F.col(id_col),
        n_lines.cast("bigint").alias("n_lines"),
        F.round(
            F.when(
                n_lines > 0,
                1.0 - F.size(F.array_distinct(lines)) / n_lines.cast("double"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("dup_line_frac"),
        F.round(
            F.when(
                n_bigrams > 0,
                top_cnt.cast("double") / n_bigrams.cast("double"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("top_bigram_frac"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 512,
    overlap_chars: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap.

    The RAG / context-window prep step: chunk i covers
    ``[i·step, i·step + chunk_chars)`` of the raw text where
    ``step = chunk_chars − overlap_chars``. Starts stop as soon as a
    chunk reaches the text end (``1 + ceil((n − chunk)/step)`` chunks),
    so the final chunk may be short but is never contained in its
    predecessor — and the tiling identity ``Σ lengths = n +
    (n_chunks − 1)·overlap`` holds exactly (property-pinned). Start
    offsets are a row-local ``sequence`` → ``posexplode`` — pure
    codegen, zero shuffles, output rows ≈ corpus_chars / step.

    Returns (id, chunk_id, n_chunk_chars, chunk_md5) — the md5 stands
    in for shipping chunk text so downstream exact-dedup of chunks is a
    keyed aggregate on a 32-byte key, not a text compare.
    """
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap_chars must be < chunk_chars")
    step = chunk_chars - overlap_chars
    n = F.length(F.col(text_col))
    last_start = (
        F.greatest(
            F.ceil((n - F.lit(chunk_chars)) / F.lit(float(step))), F.lit(0)
        )
        * step
    )
    starts = F.when(n > 0, F.sequence(F.lit(0), last_start, F.lit(step)))
    chunk = F.col(text_col).substr(F.col("start") + 1, F.lit(chunk_chars))
    return (
        df.select(F.col(id_col), F.col(text_col), F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.length(chunk).cast("int").alias("n_chunk_chars"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


def tfidf_keywords(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    ``tfidf = tf · (ln((1 + N) / (1 + df)) + 1)`` — the sklearn
    smoothing, so unseen-term idf stays finite. Ranking uses the
    ROUNDED score (4 dp) with a term tiebreak: float ulp noise in ``ln``
    across engines cannot reorder rows, which keeps the result
    oracle-hashable (catalog rule 2).

    Scale shape: explode → (doc, term) count with map-side combine;
    document frequency is a second aggregate over that (already
    deduplicated) pair table; N is a 1-row broadcast. The join back on
    term is a plain keyed shuffle — vocabulary can exceed broadcast
    size at corpus scale. Final top-k is a window per doc (bounded
    state: k rows per key survive).
    """
    toks = tokens(text_col)
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (1.0 + F.col("n_docs")) / (1.0 + F.col("df"))
                    )
                    + 1.0
                ),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "tfidf", "rank")
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Assign documents to fixed token-budget bins (LLM sequence packing).

    Each document gets the bin its *start offset* falls into, where the
    offset is the running token total of all earlier documents in the
    same shard (ordered by ``id_col`` for determinism). This is the
    offset-packing used to batch pre-training corpora into fixed-length
    sequences: downstream, one bin == one training sequence of
    ``budget_tokens`` tokens (documents straddle bin boundaries and are
    split at materialization time).

    Scale: the running sum is a window partitioned by ``shard_col`` — no
    global single-partition window. At 100 TB, shards (source / dump /
    date) keep each window's state bounded; packing is one shuffle on
    the shard key. The reference has no corpus ops (∅, SURVEY §2 C4).
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            id_col,
            shard_col,
            token_count_whitespace(text_col).alias("n_tokens"),
        )
        .withColumn(
            "bin_id",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens"))
                / F.lit(float(budget_tokens))
            ).cast("int"),
        )
    )


# PII patterns shared by the scrub operator and its oracle SQL. Written
# in the common subset of Java regex (Spark) and RE2 (DuckDB): no
# backreferences, no lookaround, ASCII classes only — both engines match
# leftmost-first with identical results.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Regex-mask emails / IPv4s / phone-like digit runs; count each.

    The privacy pass every pre-training pipeline runs before
    tokenization. Masking is sequential — email, then IP, then phone —
    with each count taken on the text as already scrubbed by the
    previous stages, so a digit run inside an email is never
    double-counted. Pure ``regexp_replace``/``regexp_count`` chain in
    codegen: row-local, zero shuffles, one scan.

    Returns (id, n_emails, n_ips, n_phones, scrubbed_md5) — the md5
    stands in for the scrubbed text so the result is hashable; callers
    wanting the text use the same expressions via :data:`PII_EMAIL` &co.
    """
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return df.select(
        F.col(id_col),
        F.regexp_count(t0, F.lit(PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(t1, F.lit(PII_IPV4)).cast("bigint").alias("n_ips"),
        F.regexp_count(t2, F.lit(PII_PHONE)).cast("bigint").alias("n_phones"),
        F.md5(t3).alias("scrubbed_md5"),
    )


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonicalize raw text: fold typographic quotes/dashes to ASCII,
    collapse whitespace runs, squeeze repeated terminal punctuation.

    The standard first pass of a pre-training text pipeline — applied
    before fingerprinting/dedup so near-identical documents that differ
    only in typography or spacing collapse to one form. Row-local
    ``translate``/``regexp_replace`` chain: pure codegen, zero shuffles.

    Returns (id, norm_text, n_chars_raw, n_chars_norm).
    """
    t0 = F.col(text_col)
    # typographic → ASCII: curly quotes, en/em dashes, ellipsis, nbsp
    t1 = F.translate(t0, "‘’“”–—… ", "''\"\"--. ")
    # whitespace runs (incl. tabs/newlines) → single space, trimmed
    t2 = F.trim(F.regexp_replace(t1, r"[ \t\r\n]+", " "))
    # repeated terminal punctuation → one ("!!!" → "!", "??" → "?").
    # Per-character (not a backreference) so the DuckDB oracle twin can
    # express the same thing under RE2, which lacks backreferences.
    t3 = t2
    for ch in "!?.,;:":
        t3 = F.regexp_replace(t3, "\\" + ch + "{2,}", ch)
    return df.select(
        F.col(id_col),
        t3.alias("norm_text"),
        F.length(t0).cast("bigint").alias("n_chars_raw"),
        F.length(t3).cast("bigint").alias("n_chars_norm"),
    )


def gopher_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.3,
    min_distinct_ratio: float = 0.3,
) -> DataFrame:
    """Gopher-style repetition/shape quality signals + keep flag.

    The Rae et al. (Gopher, 2021) heuristic battery re-expressed as
    codegen column expressions: word count bounds, mean word length
    bounds, symbol-word ratio (tokens with no letter), and distinct-word
    ratio (repetition guard). ``keep`` is the conjunction. Thresholds are
    parameters; defaults suit short synthetic docs.

    All signals are row-local higher-order-function expressions
    (``filter``/``size`` over the raw whitespace split) — no shuffle, no
    Python, scales linearly with bytes scanned.
    """
    raw_toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0
    )
    n_words = F.size(raw_toks).cast("double")
    sum_len = F.aggregate(
        raw_toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    mean_wl = F.when(n_words > 0, sum_len / n_words).otherwise(F.lit(0.0))
    n_symbol = F.size(
        F.filter(raw_toks, lambda t: ~t.rlike("[A-Za-z]"))
    ).cast("double")
    sym_ratio = F.when(n_words > 0, n_symbol / n_words).otherwise(F.lit(0.0))
    n_distinct = F.size(F.array_distinct(raw_toks)).cast("double")
    dist_ratio = F.when(n_words > 0, n_distinct / n_words).otherwise(F.lit(0.0))
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (sym_ratio <= max_symbol_ratio)
        & (dist_ratio >= min_distinct_ratio)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(sym_ratio, 4).alias("symbol_word_ratio"),
        F.round(dist_ratio, 4).alias("distinct_word_ratio"),
        keep.alias("keep"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mean unigram log-probability of each document under the corpus'
    own empirical token distribution — a model-free fluency/perplexity
    proxy (documents of rare tokens score low, formulaic ones high).

    Plan shape: one explode → token-count aggregate (map-side partial
    combine) → equi-join tokens back to their corpus frequency → mean of
    ``ln(freq/total)`` per document. The vocabulary relation stays
    engine-side (no collect); at 100 TB the token join is a plain
    shuffle join on the token key and AQE sizes it — vocabulary grows
    sublinearly with corpus size so it is usually the small side.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")
    vocab = toks.groupBy("token").agg(F.count("*").alias("freq"))
    total = vocab.agg(F.sum("freq").alias("total"))
    scored = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("freq").cast("double") / F.col("total"))), 4
            ).alias("mean_logprob"),
        )
    )
    return scored


def bm25_search(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """BM25 keyword retrieval (Lucene idf variant) over a document table.

    Plan: one explode filtered to the query terms (predicate applied
    before the shuffle, so only matching tokens move), per-(doc, term)
    tf, per-term document frequency, per-doc length, and two broadcast
    scalars (N, avgdl). Ranking orders by the ROUNDED score with the doc
    id as tiebreak so top-n selection is engine-reproducible.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")
    dl = toks.groupBy(id_col).agg(F.count("*").cast("double").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qtoks = toks.filter(F.col("token").isin(terms))
    tf = qtoks.groupBy(id_col, "token").agg(
        F.count("*").cast("double").alias("tf")
    )
    dfreq = tf.groupBy("token").agg(
        F.count("*").cast("double").alias("df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.round(F.sum("contrib"), 4).alias("bm25"),
            F.count("*").cast("bigint").alias("n_terms_hit"),
            # data-derived constant (corpus size): the phase-2 partition
            # key below. Must come from DATA — a lit() would be foldable,
            # Catalyst would erase it from the partition spec, and the
            # final rank would collapse to a partitionless single-task
            # window (pinned by test_no_partitionless_window_anywhere).
            F.first("n_docs").alias("__tag"),
        )
    )
    # ONE-window global top-n (the _topk_per_query shape): the rank
    # filter makes Catalyst insert WindowGroupLimit(Partial) below the
    # exchange — at most top_n rows leave each input partition, the
    # bound the old manual phase-1 window provided at the cost of an
    # extra full Exchange+Sort (round-16 collapse).
    order = [F.col("bm25").desc(), F.col(id_col).asc()]
    w2 = Window.partitionBy("__tag").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "bm25", "n_terms_hit", "rank")
    )


def tokenize_to_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 512,
    unk_id: int = 0,
) -> DataFrame:
    """Encode documents to token-id sequences against a corpus-derived
    vocabulary — the tokenization step that feeds sequence packing.

    Vocabulary = the ``vocab_size`` most frequent tokens (freq desc,
    token asc tiebreak), ids 1..V by rank; everything else maps to
    ``unk_id``. Plan: explode → map-side-combined counts → two-phase
    rank (partition-local prune to top vocab_size, then one bounded
    final rank — no partitionless window over the full vocabulary) →
    tokens equi-join vocab → per-doc ordered reassembly via
    sort_array(collect_list(struct(pos, id))). The vocabulary relation
    stays engine-side; at 100 TB it is the small side of the token join
    and AQE broadcasts it.
    """
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(
        F.count("*").alias("freq"),
        # data-derived constant partition key for the final rank (a lit()
        # would fold away -> partitionless window; see bm25_search)
        F.first(F.lit(1) * F.length("token") * 0).alias("__tag"),
    )
    # ONE window (round-16 collapse): WindowGroupLimit(Partial) bounds
    # each input partition to vocab_size rows before the exchange —
    # no partitionless full-vocabulary sort, no extra exchange.
    order = [F.col("freq").desc(), F.col("token").asc()]
    w2 = Window.partitionBy("__tag").orderBy(*order)
    vocab = (
        counts.withColumn("id", F.row_number().over(w2))
        .filter(F.col("id") <= vocab_size)
        .select("token", "id")
    )
    encoded = (
        toks.join(vocab, "token", "left")
        .select(
            id_col,
            "pos",
            F.coalesce(F.col("id"), F.lit(unk_id)).cast("int").alias("tid"),
        )
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("pos"), F.col("tid")))
                    ),
                    lambda s: s["tid"].cast("string"),
                ),
                " ",
            ).alias("token_ids"),
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(F.col("tid") == unk_id, 1).otherwise(0)
            ).cast("bigint").alias("n_unk"),
        )
    )
    return encoded


def ngram_lm_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """Corpus-wide word n-gram occurrence counts with count pruning.

    The KenLM/ngram-LM data-prep step: every positional n-gram occurrence
    (NOT per-doc distinct — language models count occurrences) aggregated
    corpus-wide, rare grams pruned below ``min_count``. Downstream this
    feeds LM smoothing, contamination checks, and the unigram fluency
    prior (``unigram_logprob``).

    Scale shape: posexplode to narrow (gram) rows → one groupBy(gram)
    with map-side partial counts — the canonical word-count shuffle; the
    prune is a post-aggregation filter, so the shuffle output (not input)
    is already one row per distinct gram.
    """
    toks = df.select(
        F.array_remove(F.split(normalized_text(text_col), " "), "").alias("__tl")
    )
    grams = toks.select(
        F.explode(
            F.when(
                F.size("__tl") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("__tl") - F.lit(n - 1)),
                    lambda s: F.array_join(F.slice(F.col("__tl"), s, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


_ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Character-level Shannon entropy over [a-z0-9 ] of lowercased text.

    A cheap quality/noise signal: natural prose sits near the language's
    characteristic char entropy (~4.1 bits for English); keyboard mash,
    base64 blobs, and single-char padding land far from it, so the score
    gates both degenerate-low and random-high tails before any dedup
    shuffle spends money on junk.

    Entirely row-local — per-char counts come from 37
    ``length(t) - length(replace(t, c))`` folds (codegen, no explode, no
    shuffle: the explode→groupBy(doc_id, char) formulation would shuffle
    every character of the corpus to count what one scan can). Uses the
    shuffle-free identity H = ln(N) - (Σ n_c·ln(n_c))/N on exact integer
    counts; emitted in nats rounded to 4dp (last-ulp ln() drift across
    engines is absorbed by the rounding, same contract as
    ``unigram_logprob``).
    """
    low = F.lower(F.col(text_col))
    counts = F.array(
        *[
            (F.length(low) - F.length(F.replace(low, F.lit(c)))).cast("double")
            for c in _ENTROPY_ALPHABET
        ]
    )
    # Catalyst collapses projections by re-inlining expressions, so
    # every column that references the 37-replace counts array would
    # re-evaluate it. Reference it exactly ONCE (a single fold emitting
    # both sums as a struct over one extra projection layer the
    # optimizer can't inline into multiple copies of the array); n is
    # recomputed from the fold output, never from the text.
    sums = F.aggregate(
        counts,
        F.struct(F.lit(0.0).alias("n"), F.lit(0.0).alias("snl")),
        lambda acc, x: F.struct(
            (acc["n"] + x).alias("n"),
            (
                acc["snl"]
                + F.when(x > 0, x * F.log(x)).otherwise(F.lit(0.0))
            ).alias("snl"),
        ),
    )
    from .dedup import _spread

    stage = _spread(df, id_col).select(
        F.col(id_col),
        sums["n"].alias("__n"),
        sums["snl"].alias("__snl"),
    )
    n = F.col("__n")
    entropy = F.when(
        n > 0, F.log(n) - F.col("__snl") / n
    ).otherwise(F.lit(0.0))
    return stage.select(
        F.col(id_col),
        n.cast("bigint").alias("n_alnum"),
        F.round(entropy, 4).alias("char_entropy"),
    )


def compress_ratio(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """zlib compression ratio per document — the Gopher-style
    "compressibility" curation signal: machine-generated/boilerplate text
    compresses far below prose (ratio << 0.4), random noise barely
    compresses (ratio ≈ 1). Arrow-batched ``mapInPandas`` (zlib is
    stdlib, deterministic at a fixed level, but not SQL-expressible —
    rows-only gate entry with unit-pinned semantics). Row-local; zero
    shuffles; embarrassingly parallel at corpus scale."""
    import pandas as pd
    import zlib

    def _ratio(batches):
        for b in batches:
            raw = b[text_col].fillna("").map(lambda t: t.encode("utf-8"))
            n_raw = raw.map(len)
            n_gz = raw.map(lambda x: len(zlib.compress(x, 6)))
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col],
                    "n_raw": n_raw.astype("int64"),
                    "n_gz": n_gz.astype("int64"),
                    "ratio_e4": [
                        int(g * 10000 // r) if r else 10000
                        for r, g in zip(n_raw, n_gz)
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        _ratio, schema="doc_id long, n_raw bigint, n_gz bigint, ratio_e4 bigint"
    )


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = 6
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules from the corpus —
    the tokenizer-training step of an LLM data pipeline.

    Classic byte-pair encoding (Sennrich et al. 2016) trains on the
    WORD-FREQUENCY DICTIONARY, not the token stream: ONE corpus-wide
    ``explode → groupBy(word)`` shuffle (with map-side combine) builds
    the dictionary, which is Heaps-law bounded (~O(corpus^0.5) distinct
    words — a few million entries for a 100 TB corpus, ≪ driver memory)
    regardless of corpus size. The dictionary is then collected ONCE as
    bounded model metadata and the merge loop runs driver-local — the
    shape production tokenizer trainers use (HuggingFace `tokenizers`,
    SentencePiece: distributed/streamed counting, in-memory merges).
    The round-5 version launched one Spark job (+ a limit(1).collect()
    and a localCheckpoint) PER merge; a real 30k-merge vocabulary means
    30k driver-coordinated jobs whose scheduling overhead dwarfs the
    dictionary-sized work — the distributed path belongs to the
    corpus→counts stage only.

    Per iteration (driver-local, over (symbols, freq) pairs): adjacent
    symbol pairs are counted weighted by word frequency (overlapping
    pairs count, per the classic algorithm); the best pair is
    argmax(count, then lexicographically smallest (left, right)); every
    word then applies the merge greedily LEFT-TO-RIGHT NON-OVERLAPPING
    (``[a,b,a,b] -> [ab,ab]``, ``[a,a,a] -> [aa,a]``) — identical
    semantics to the previous distributed double-space ``replace``
    formulation and to the DuckDB oracle replay, so the learned table
    is unchanged bit-for-bit.

    Returns the learned merge table: (merge_rank, left_sym, right_sym,
    merged_sym, pair_cnt) — deterministic, hence oracle-checkable by a
    chained-CTE DuckDB replay of the same algorithm.
    """
    spark = df.sparkSession
    vocab = [
        (tuple(row["word"]), row["freq"])
        for row in (
            df.select(F.explode(tokens(text_col)).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count("*").alias("freq"))
            .collect()
        )
    ]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        # argmax on count, ties broken by lexicographically smallest pair
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, int(cnt)))
        merged = l + r
        new_vocab = []
        for syms, freq in vocab:
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((tuple(out), freq))
        vocab = new_vocab
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, "
        "merged_sym string, pair_cnt bigint",
    )


def bpe_train_oracle(n_merges: int = 6) -> str:
    """Generate the chained-CTE DuckDB replay of :func:`bpe_train`."""
    ctes = _bpe_train_ctes(n_merges)
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT {i} AS merge_rank, left_sym, right_sym, merged_sym, pair_cnt FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT CAST(merge_rank AS INT) AS merge_rank, left_sym,"
        f" right_sym, merged_sym, pair_cnt FROM (\n    {unions}\n    )"
    )


def _bpe_train_ctes(n_merges: int) -> list[str]:
    """The chained w/p/b CTE ladder shared by the train and apply
    oracles (see :func:`bpe_train_oracle`)."""
    ctes = [
        """w0 AS MATERIALIZED (
      SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym,
             CAST(COUNT(*) AS BIGINT) AS freq
      FROM (
        SELECT t AS word FROM (
          SELECT unnest(string_split(trim(regexp_replace(lower(text),
            '[^a-z0-9]+', ' ', 'g')), ' ')) AS t
          FROM documents
        ) WHERE t <> ''
      ) GROUP BY word
    )"""
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        ctes.append(
            f"""p{i} AS MATERIALIZED (
      SELECT l[g.n] AS left_sym, l[g.n + 1] AS right_sym,
             SUM(freq) AS cnt
      FROM (SELECT string_split(sym, ' ') AS l, freq FROM w{p}),
           unnest(generate_series(1, len(l) - 1)) AS g(n)
      GROUP BY left_sym, right_sym
    ),
    b{i} AS MATERIALIZED (
      SELECT left_sym, right_sym, left_sym || right_sym AS merged_sym,
             CAST(cnt AS BIGINT) AS pair_cnt
      FROM p{i}
      ORDER BY cnt DESC, left_sym ASC, right_sym ASC LIMIT 1
    ),
    w{i} AS MATERIALIZED (
      SELECT trim(replace(
               replace(' ' || replace(sym, ' ', '  ') || ' ',
                       ' ' || (SELECT left_sym FROM b{i}) || '  '
                           || (SELECT right_sym FROM b{i}) || ' ',
                       ' ' || (SELECT merged_sym FROM b{i}) || ' '),
               '  ', ' ')) AS sym, freq
      FROM w{p}
    )"""
        )
    return ctes


def bpe_apply(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 6,
) -> DataFrame:
    """Apply learned BPE merges to the corpus — the tokenizer
    APPLICATION step that follows :func:`bpe_train`: per document,
    every word is char-split and the merge table replays in rank order
    (greedy left-to-right non-overlapping, the double-space ``replace``
    trick), yielding the post-BPE symbol count.

    Returns (id, n_words, n_symbols): whitespace word count and total
    BPE token count after ``n_merges`` merges — the corpus statistic a
    token-budget planner needs from a trained tokenizer.

    Scale shape: training is :func:`bpe_train` (one corpus shuffle +
    driver-local merges over the Heaps-bounded dictionary); the learned
    table is bounded model metadata that rides the closure as string
    LITERALS, so application is one row-local codegen scan with ZERO
    shuffles and no join against a merges table. The merge replay runs
    ONCE over each whole document (words separated by a ``|`` sentinel
    no rule can touch, since rules carry only [a-z0-9] symbols), not
    per word — one regexp + n_merges replace chains per document
    instead of per token, which cut the sf0.1 bench time ~3×."""
    rules = [
        (r["left_sym"], r["right_sym"], r["merged_sym"])
        for r in sorted(
            bpe_train(df, text_col, n_merges).collect(),
            key=lambda r: r["merge_rank"],
        )
    ]

    # "a b" -> "a | b" -> char-split "a   |   b " -> trim/squeeze
    # "a | b"; the | symbols mark word boundaries through the replay.
    joined = F.regexp_replace(normalized_text(text_col), " ", " | ")
    sym = F.trim(
        F.regexp_replace(
            F.regexp_replace(joined, "(.)", "$1 "), "  +", " "
        )
    )
    for left, right, merged in rules:
        doubled = F.concat(
            F.lit(" "),
            F.replace(sym, F.lit(" "), F.lit("  ")),
            F.lit(" "),
        )
        sym = F.trim(
            F.replace(
                F.replace(
                    doubled,
                    F.lit(f" {left}  {right} "),
                    F.lit(f" {merged} "),
                ),
                F.lit("  "),
                F.lit(" "),
            )
        )
    # Three-stage projection (round-15 optimization): the single-select
    # form inlined the whole n_merges-deep replace chain THREE times per
    # row (once inside n_words' filter, twice inside n_symbols' size
    # difference — visible verbatim in the before plan). Staging the
    # symbol array once and the two counts once keeps each non-cheap
    # alias referenced more than once in its OWN Project — Catalyst's
    # CollapseProject declines to re-inline multiply-referenced
    # non-cheap aliases (SPARK-36718), so the chain and the sep count
    # each evaluate exactly once per row.
    all_syms = F.split(sym, " ")
    staged = df.select(
        F.col(id_col),
        all_syms.alias("__syms"),
        F.length(normalized_text(text_col)).alias("__len"),
    ).filter(F.col("__len") > 0)
    counted = staged.select(
        F.col(id_col),
        F.size("__syms").alias("__ntot"),
        F.size(
            F.filter(F.col("__syms"), lambda s: s == "|")
        ).alias("__nsep"),
    )
    return counted.select(
        F.col(id_col),
        (F.col("__nsep") + 1).alias("n_words"),
        (F.col("__ntot") - F.col("__nsep")).alias("n_symbols"),
    )


def bpe_apply_oracle(n_merges: int = 6) -> str:
    """DuckDB replay of :func:`bpe_apply`: the train ladder's b-CTEs
    feed a per-document-word replace chain."""
    ctes = _bpe_train_ctes(n_merges)
    ctes.append(
        """d0 AS MATERIALIZED (
      SELECT doc_id,
             trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym
      FROM (
        SELECT doc_id, t AS word FROM (
          SELECT doc_id, unnest(string_split(trim(regexp_replace(
            lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS t
          FROM documents
        ) WHERE t <> ''
      )
    )"""
    )
    for i in range(1, n_merges + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
      SELECT doc_id, trim(replace(
               replace(' ' || replace(sym, ' ', '  ') || ' ',
                       ' ' || (SELECT left_sym FROM b{i}) || '  '
                           || (SELECT right_sym FROM b{i}) || ' ',
                       ' ' || (SELECT merged_sym FROM b{i}) || ' '),
               '  ', ' ')) AS sym
      FROM d{i - 1}
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_words,
           CAST(SUM(len(string_split(sym, ' '))) AS INT) AS n_symbols
    FROM d{n_merges} GROUP BY doc_id"""
    )


def html_to_text(col):
    """HTML → text as a pure column expression — the Common Crawl
    boilerplate-strip step, JVM-side (whole-stage codegen, zero Python):
    drop the <head> block and <script>/<style> elements WITH content,
    turn </p> and <br> into newlines, strip every remaining tag, decode
    the core entities (specific ones first, &amp; LAST — the order that
    makes escape→unescape an exact round trip), and trim trailing
    newlines. Regexes stay in the RE2-compatible subset so the DuckDB
    oracle can run the identical chain (with the 'g' flag — DuckDB
    replaces first-match by default where Spark replaces all)."""
    x = F.col(col) if isinstance(col, str) else col
    x = F.regexp_replace(x, r"(?s)<head>.*?</head>", "")
    x = F.regexp_replace(x, r"(?s)<script[^>]*>.*?</script>", "")
    x = F.regexp_replace(x, r"(?s)<style[^>]*>.*?</style>", "")
    x = F.regexp_replace(x, r"</p>|<br\s*/?>", "\n")
    x = F.regexp_replace(x, r"<[^>]*>", "")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return F.regexp_replace(x, r"\n+$", "")


def heavy_hitters(
    df: DataFrame, text_col: str = "text", capacity: int = 2000
) -> DataFrame:
    """EXACT corpus heavy hitters — words with count >= n_tokens//capacity + 1
    — without shuffling the full vocabulary.

    Two-phase plan (the scale point, vs the naive explode→groupBy over every
    distinct token):

    1. **Sketch pass** — per-partition Misra-Gries summaries of bounded size
       ``capacity`` via ``mapInPandas`` (pandas ``value_counts`` per Arrow
       batch merged into the MG state with the standard mergeable-summaries
       reduction: subtract the (capacity+1)-th largest stored count, keep
       positives). Guarantee: any word with partition count
       > n_p/(capacity+1) survives its partition's summary, so — by the
       averaging argument over partitions — every word with GLOBAL count
       >= n//capacity + 1 appears in the union of candidates. The sketch
       output is bounded metadata (<= capacity+1 rows per partition,
       independent of data size), collected like the IVF centroids.
    2. **Verify pass** — broadcast-semi-join the token stream against the
       candidate set and take exact counts of candidates only; filter to
       the threshold. The shuffle carries candidate words only (map-side
       combine applies), not the full Heaps-law vocabulary — at corpus
       scale that is the difference between shuffling billions of distinct
       n-grams and a few thousand rows.

    The result is exactly equal to the naive full count + HAVING filter
    (no approximation survives to the output — MG only prunes candidates,
    the counts are exact), which is what the DuckDB oracle computes.
    """
    import pandas as pd

    toks = df.select(F.explode(tokens(text_col)).alias("word")).filter(
        F.col("word") != ""
    )

    def _mg(batches):
        state: dict[str, int] = {}
        total = 0
        for b in batches:
            vc = b["word"].value_counts()
            total += int(vc.sum())
            for w, c in vc.items():
                state[w] = state.get(w, 0) + int(c)
            if len(state) > capacity:
                kth = sorted(state.values(), reverse=True)[capacity]
                state = {w: c - kth for w, c in state.items() if c > kth}
        yield pd.DataFrame(
            {
                "word": list(state.keys()) + [None],
                "part_total": [0] * len(state) + [total],
            }
        )

    sketch = toks.mapInPandas(_mg, schema="word string, part_total long").collect()
    total = sum(r["part_total"] for r in sketch if r["word"] is None)
    threshold = total // capacity + 1
    cand_words = sorted({r["word"] for r in sketch if r["word"] is not None})
    spark = df.sparkSession
    cand = spark.createDataFrame(
        [(w,) for w in cand_words] or [(None,)], "word string"
    ).filter(F.col("word").isNotNull())
    return (
        toks.join(F.broadcast(cand), "word")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(threshold))
    )

def url_normalize(col, tracking_prefixes=("utm_",)):
    """Canonicalize a URL as a pure column expression — the Common
    Crawl URL-dedup front end (CC-index dedups fetches by canonical
    URL before any content pass), JVM-side in whole-stage codegen:

    - lowercase the scheme and authority;
    - strip the scheme's DEFAULT port only (``:80`` for http, ``:443``
      for https — a non-default port is identity-bearing and kept);
    - strip one leading ``www.``;
    - strip trailing slashes from the path;
    - drop the fragment (never sent to the server);
    - drop tracking query params (``utm_*`` by default), sort the
      survivors bytewise, and re-join — param order is not
      identity-bearing, tracking params are noise.

    Regexes stay in the RE2-compatible subset so a DuckDB oracle can
    replay or closed-form-check the result. Returns the canonical URL
    string; input must carry an explicit ``scheme://``.
    (∅ in reference; Tier C extension.)
    """
    u = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.regexp_replace(path, r"/+$", "")
    # the query must be found BEFORE any '#': a bare `\?` would match a
    # question mark inside the fragment ('page#frag?x=1') and leak
    # fragment content into the canonical form
    query = F.regexp_extract(u, r"^[^#]*?\?([^#]*)", 1)
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~reduce(
            lambda a, b: a | b,
            [p.startswith(pre) for pre in tracking_prefixes],
        ),
    )
    q = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
