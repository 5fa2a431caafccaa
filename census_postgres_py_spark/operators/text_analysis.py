"""Text analysis over `documents` (BASELINE.json:6 "text analysis";
SURVEY.md §2.7 fn_text_analysis + training-pipeline extensions).

Everything is built-in column expressions (split / explode / filter /
regexp) — language ID, quality scoring, token counting and
fingerprinting all run inside whole-stage codegen, so at 100 TB these
are scan-bound single-pass operators with one optional agg shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from census_postgres_py_spark.functions.text import normalized, tokens
from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import (
    vocab_rows_per_doc,
    gated_broadcast,
    t,
)

STOPWORDS = ("the", "a", "of", "and", "to")
# BPE-ish lexer: word pieces, digit runs, single non-space symbols
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


@register(
    "fn_text_analysis",
    oracle="""
    WITH toks AS (
        SELECT lang,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS term
        FROM documents
    ), tf AS (
        SELECT lang, term, CAST(count(*) AS BIGINT) AS freq
        FROM toks GROUP BY lang, term
    ), ranked AS (
        SELECT lang, term, freq,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY freq DESC, term) AS rn
        FROM tf
    )
    SELECT lang, term, freq, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 10
    """,
)
def fn_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term frequency: top-10 terms per language (split -> explode ->
    groupBy -> per-group top-k)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("lang", "term").agg(F.count("*").alias("freq"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), F.col("term"))
    return (
        tf.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 10)
        .select("lang", "term", "freq", "rn")
    )


@register(
    "text_quality",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, n_chars,
               list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents
    )
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           round(CAST(n_chars AS DOUBLE) / len(w), 4) AS chars_per_token,
           round(CAST(len(list_filter(w,
                     x -> x IN ({", ".join(repr(s) for s in STOPWORDS)})))
                 AS DOUBLE) / len(w), 4) AS stopword_ratio,
           round(CAST(len(list_filter(w, x -> len(x) >= 5)) AS DOUBLE)
                 / len(w), 4) AS long_token_ratio
    FROM toks
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, mean token length, stopword and
    long-token ratios — the standard cheap pre-training filters."""
    docs = t(spark, sf_dir, "documents")
    w = tokens("text")
    n = F.size(w)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    n_long = F.size(F.filter(w, lambda x: F.length(x) >= 5))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(F.col("n_chars").cast("double") / n, 4).alias("chars_per_token"),
        F.round(n_stop.cast("double") / n, 4).alias("stopword_ratio"),
        F.round(n_long.cast("double") / n, 4).alias("long_token_ratio"),
    )


@register(
    "text_lang_id",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN contains(' ' || text || ' ', ' the ') THEN 'en'
                WHEN contains(' ' || text || ' ', ' le ')  THEN 'fr'
                WHEN contains(' ' || text || ' ', ' der ') THEN 'de'
                WHEN contains(' ' || text || ' ', ' el ')  THEN 'es'
                WHEN contains(' ' || text || ' ', ' de ')  THEN 'zh'
                ELSE 'unk' END AS pred_lang
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language-ID heuristic. The fixture corpus is
    synthetic pseudo-English for every lang label, so accuracy is not
    the point — the operator shape (per-doc classification from n-gram
    evidence, pure expressions, no UDF) is."""
    docs = t(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    pred = (
        F.when(padded.contains(" the "), "en")
        .when(padded.contains(" le "), "fr")
        .when(padded.contains(" der "), "de")
        .when(padded.contains(" el "), "es")
        .when(padded.contains(" de "), "zh")
        .otherwise("unk")
    )
    return docs.select("doc_id", "lang", pred.alias("pred_lang"))


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT)
               AS n_bpeish,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS BIGINT) AS n_ws
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish
    regex lexer (letter runs / digit runs / single symbols)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0))
        .cast("long")
        .alias("n_bpeish"),
        F.size(tokens("text")).cast("long").alias("n_ws"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
           CAST(length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               AS BIGINT) AS norm_len
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the whitespace-normalized
    text (exact-dedup key at scale — hash once, groupBy the digest)."""
    docs = t(spark, sf_dir, "documents")
    norm = normalized("text")
    return docs.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("fp"),
        F.length(norm).cast("long").alias("norm_len"),
    )


@register(
    "text_tfidf",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), n AS (
        SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               tf.tf * ln(n.nd / dfreq.df) AS score,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * ln(n.nd / dfreq.df) DESC, tf.term) AS rn
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, round(score, 4) AS tfidf, CAST(rn AS BIGINT) AS rn
    FROM scored WHERE rn <= 5
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-5 terms per document by tf * ln(N/df).

    Three aggregations, all map-side-combinable: per-(doc,term) tf,
    per-term document frequency, and the scalar corpus size (a 1-row
    aggregate broadcast into the score join — no driver-side count).
    The per-doc top-5 is a WindowGroupLimit. At 100 TB the df table is
    vocabulary-sized (small) and broadcasts; everything else stays
    partitioned by doc/term keys.
    """
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    nd = docs.agg(F.count("*").cast("double").alias("nd"))
    score = F.col("tf") * F.log(F.col("nd") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        # dfreq is vocabulary-scale — gated (grows with the corpus)
        tf.join(gated_broadcast(
            spark, sf_dir, "documents", dfreq,
            rows_per_source_row=vocab_rows_per_doc(sf_dir),
        ), "term")
        .crossJoin(F.broadcast(nd))
        .withColumn("score", score)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", "tf", F.round("score", 4).alias("tfidf"), "rn")
    )


@register(
    "text_chunk_fixed",
    oracle="""
    WITH d AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
                   AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0
    ), e AS (
        SELECT doc_id, toks, n,
               unnest(range(0, CAST(ceil(n / 32.0) AS BIGINT))) AS i
        FROM s
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           array_to_string(toks[i*32+1 : i*32+32], ' ') AS chunk_text,
           CAST(least(32, n - i*32) AS BIGINT) AS chunk_tokens
    FROM e
    """,
)
def text_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking — split each document into 32-token
    windows (the context-window packing step of a training pipeline).

    Pure codegen row expansion: tokenize once, ``sequence`` + ``explode``
    one row per chunk, ``slice`` out the window. No shuffle at all —
    chunking is embarrassingly parallel and the output partitioning
    inherits the input's, so at 100 TB this is scan-bound. The guard on
    empty docs matters: Spark's ``sequence(0, -1)`` DESCENDS instead of
    returning empty.
    """
    docs = t(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", tokens("text").alias("toks")
    ).withColumn("n", F.size("toks"))
    CHUNK = 32
    exploded = toked.filter(F.col("n") > 0).select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), ((F.col("n") - 1) / CHUNK).cast("long"))
        ).alias("i"),
    )
    return exploded.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_id"),
        F.concat_ws(
            " ", F.slice("toks", F.col("i").cast("int") * CHUNK + 1, CHUNK)
        ).alias("chunk_text"),
        F.least(F.lit(CHUNK), F.col("n") - F.col("i") * CHUNK)
        .cast("long")
        .alias("chunk_tokens"),
    )


EMAIL_REGEX = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}"


@register(
    "text_pii_redact",
    oracle=f"""
    SELECT event_id,
           regexp_replace(
               regexp_replace(props, '{EMAIL_REGEX}', '<EMAIL>', 'g'),
               '[0-9]+', '<NUM>', 'g') AS redacted
    FROM events
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — regex redaction of emails and digit runs over
    the raw event payload (the compliance pass every training-data
    pipeline runs before anything else sees the text).

    Spark ``regexp_replace`` is replace-all by default; DuckDB needs
    the explicit ``'g'`` flag — the patterns themselves are in the
    RE2/Java-regex common subset so both engines transform
    identically. Pure projection, scan-bound, chainable in the same
    stage as decode/filter steps.
    """
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace(
            F.regexp_replace(F.col("props"), EMAIL_REGEX, "<EMAIL>"),
            r"[0-9]+",
            "<NUM>",
        ).alias("redacted"),
    )


@register(
    "text_ngram_topk",
    oracle="""
    WITH toks AS (
        SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents
    ), bg AS (
        SELECT unnest(list_transform(range(1, len(w)),
                                     i -> w[i] || ' ' || w[i + 1])) AS bigram
        FROM toks
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS freq
    FROM bg GROUP BY bigram
    ORDER BY freq DESC, bigram
    LIMIT 20
    """,
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word bigrams — the n-gram frequency sweep LM
    corpus analysis starts with (burstiness, boilerplate, contamination
    checks all read this table).

    Bigrams are formed array-side (`transform` over token indices — no
    explode of unigrams then self-join), exploded once, counted in one
    combinable agg, and the top-k is `ORDER BY ... LIMIT`, which Spark
    executes as TakeOrderedAndProject: per-partition heaps + a 20-row
    driver merge, never a global sort — the only scale-safe global
    top-k. Total tie-break (freq desc, bigram asc) keeps the row set
    deterministic."""
    docs = t(spark, sf_dir, "documents").select(tokens("text").alias("w"))
    bigrams = docs.filter(F.size("w") > 1).select(
        F.explode(
            F.expr("transform(sequence(1, size(w) - 1),"
                   " i -> concat(w[i - 1], ' ', w[i]))")
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("bigram"))
        .limit(20)
    )
