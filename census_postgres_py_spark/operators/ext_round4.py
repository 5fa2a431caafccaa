"""Round-4 extension operators (SURVEY.md §2.15).

Fourth-round widening along the axes real pipelines ask for next:
web-corpus URL canonicalization, ML feature encoding, batch
sessionization + streaks, basket co-occurrence, deterministic A/B
reads, readability scoring, boilerplate-prefix dedup, and EMA
smoothing. Registered AFTER the r4 grading window (registry
_WINDOW_PRIORITY pins ids 1-82; these join the tail and rotate into
the r5/r6 windows).

Same contract discipline as every other module: identical aliases on
both engines, integer/decimal accumulation wherever a sum can wrap,
half-up fixed-point rounding on the one float projection, epoch-millis
export for timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from census_postgres_py_spark.registry import register
from census_postgres_py_spark.tables import t

_SESSION_GAP_MIN = 30


@register(
    "fn_url_canonicalize",
    oracle="""
    SELECT doc_id,
           'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR)
               || '?lang=' || lang || '&ref=x' AS canonical_url,
           source || '.example.com' AS host_key
    FROM documents
    """,
)
def fn_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical URL key for web-corpus dedup: lowercase the host,
    drop the default :443 port and the #fragment, strip tracking
    (utm_*) params, and emit the sorted surviving query string — the
    transform that makes "same page, different tracking link" collapse
    to one key before any content dedup runs.

    URLs are synthesized from document metadata (fn_url_parse's
    idiom), so the oracle states the canonical form by construction.
    All codegen'd string expressions (parse_url + regexp + array
    sort/filter via JVM fns) — shuffle-free, no UDF.
    """
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.upper(F.col("source")),
        F.lit(".Example.COM:443/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&lang="),
        F.col("lang"),
        F.lit("&ref=x#frag"),
    )
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    path = F.parse_url(url, F.lit("PATH"))
    # split query, drop utm_* params, keep declaration order of the
    # survivors (already sorted by construction here; array_sort would
    # pin it for arbitrary inputs but Spark/DuckDB sort stability on
    # '=': keep it simple and deterministic either way)
    params = F.filter(
        F.split(F.parse_url(url, F.lit("QUERY")), "&"),
        lambda p: ~p.startswith("utm_"),
    )
    canon = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
        ).otherwise(F.lit("")),
    )
    return d.select(
        "doc_id",
        canon.alias("canonical_url"),
        host.alias("host_key"),
    )


@register(
    "transform_onehot",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS pri_urgent,
           CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END
               AS pri_high,
           CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END
               AS pri_medium,
           CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END
               AS pri_notspec,
           CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS pri_low,
           CAST(CAST(substr(o_orderpriority, 1, 1) AS INTEGER) - 1
                AS BIGINT) AS pri_index
    FROM orders
    """,
)
def transform_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot encoding of a low-cardinality categorical against a
    FIXED vocabulary (the ML-feature-prep step before any trainer).

    The category list is pinned in code, not inferred — inference
    would need a distinct pass AND could silently reorder columns
    between runs, the training-serving-skew classic. Pure codegen'd
    projection: no shuffle, no pivot, schema known statically.
    """
    cats = [
        ("1-URGENT", "pri_urgent"),
        ("2-HIGH", "pri_high"),
        ("3-MEDIUM", "pri_medium"),
        ("4-NOT SPECIFIED", "pri_notspec"),
        ("5-LOW", "pri_low"),
    ]
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        *[
            F.when(F.col("o_orderpriority") == v, 1)
            .otherwise(0)
            .alias(name)
            for v, name in cats
        ],
        (F.substring("o_orderpriority", 1, 1).cast("int") - 1)
        .cast("long")
        .alias("pri_index"),
    )


@register(
    "win_sessionize",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
        FROM events
    ), flagged AS (
        SELECT user_id, ts_ms, event_id,
               CASE WHEN ts_ms - lag(ts_ms)
                        OVER (PARTITION BY user_id
                              ORDER BY ts_ms, event_id)
                        > {_SESSION_GAP_MIN} * 60000
                    OR lag(ts_ms) OVER (PARTITION BY user_id
                                        ORDER BY ts_ms, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM ev
    ), sessioned AS (
        SELECT user_id, ts_ms, event_id,
               sum(is_start) OVER (PARTITION BY user_id
                                   ORDER BY ts_ms, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           min(ts_ms) AS start_ms,
           CAST(count(*) AS BIGINT) AS n_events,
           max(ts_ms) - min(ts_ms) AS dur_ms
    FROM sessioned
    GROUP BY user_id, session_no
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a session breaks after 30 idle minutes;
    output is one row per (user, session) with start, size, duration —
    the classic lag -> boundary-flag -> running-sum assignment.

    Distinct from stream_session (Spark's native session_window in a
    streaming job): this is the BATCH shape every warehouse runs
    nightly, and the session id is deterministic (total order by
    ts, event_id). ONE shuffle on user_id serves both windows and the
    final groupBy — the aggregation keys are a superset of the window
    partition key, so no second exchange. O(1) state per row.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    flagged = ev.withColumn(
        "is_start",
        F.when(gap.isNull() | (gap > _SESSION_GAP_MIN * 60000), 1).otherwise(
            0
        ),
    )
    sessioned = flagged.withColumn(
        "session_no",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessioned.groupBy(
        "user_id", F.col("session_no").cast("long").alias("session_no")
    ).agg(
        F.min("ts_ms").alias("start_ms"),
        F.count("*").cast("long").alias("n_events"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("dur_ms"),
    )


@register(
    "win_streak",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), grouped AS (
        SELECT user_id, d,
               CAST(d AS DATE) - CAST(row_number()
                   OVER (PARTITION BY user_id ORDER BY d) AS INTEGER)
                   AS grp
        FROM days
    ), streaks AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS len
        FROM grouped GROUP BY user_id, grp
    )
    SELECT user_id,
           max(len) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id
    """,
)
def win_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (plus total
    active days) — the engagement metric behind every retention
    dashboard, and the canonical gaps-and-islands reduction: distinct
    days -> row_number -> (day - rank) constant per island -> count.

    Two shuffles total (distinct, then the window+agg reuse one
    exchange on user_id); day arithmetic stays in DATE space on both
    engines so timezone never enters.
    """
    days = (
        t(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count("*").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("n_active_days"),
    )


_COOC_TOP = 20


@register(
    "agg_cooccurrence",
    oracle=f"""
    WITH pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_orders
    FROM pairs
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT {_COOC_TOP}
    """,
)
def agg_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top part-pair co-occurrence across orders (2-item frequent
    itemsets / market-basket support) with a total tiebreak order.

    The pair space is generated by an equi-join ON THE ORDER KEY, so
    the blow-up is Σ k²/2 over per-order item counts — bounded by the
    basket size (~7 here), never corpus². The top-k is
    TakeOrderedAndProject (a k-row heap per partition, merged on the
    driver), not a global sort. At 100 TB the same plan holds; if
    baskets were huge, cap per-basket items first (the standard
    guard), but that is a data contract, not a plan change.
    """
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )
    return pairs.orderBy(
        F.col("n_orders").desc(), "part_a", "part_b"
    ).limit(_COOC_TOP)


@register(
    "agg_ab_lift",
    oracle="""
    WITH assigned AS (
        SELECT DISTINCT user_id,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                        < '8' THEN 'A' ELSE 'B' END AS variant
        FROM events
    ), conv AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ), stats AS (
        SELECT a.variant,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_converted
        FROM assigned a LEFT JOIN conv c ON a.user_id = c.user_id
        GROUP BY a.variant
    )
    SELECT variant, n_users, n_converted,
           floor(CAST(n_converted AS DOUBLE) / n_users * 1000000 + 0.5)
               / 1000000 AS conv_rate
    FROM stats
    """,
)
def agg_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment read: users are assigned to arms
    by md5 hex prefix (50/50, stable across runs and engines — the
    sample_split_assign discipline applied to experimentation), then
    per-arm conversion (any purchase event) is counted.

    Why hash assignment matters at scale: a rerun must put every user
    in the SAME arm or the read is garbage; engine-seeded RNG can't
    promise that, content hashing can. Plan: distinct users (one
    shuffle), broadcast-size converter set joined back, one combinable
    count — the corpus collapses to |users| rows before any join.
    """
    ev = t(spark, sf_dir, "events")
    assigned = ev.select("user_id").distinct().select(
        "user_id",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
            "A",
        )
        .otherwise("B")
        .alias("variant"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    stats = (
        assigned.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0)))
            .cast("long")
            .alias("n_converted"),
        )
    )
    rate = F.col("n_converted").cast("double") / F.col("n_users")
    return stats.select(
        "variant",
        "n_users",
        "n_converted",
        (F.floor(rate * 1000000 + F.lit(0.5)) / 1000000).alias("conv_rate"),
    )


@register(
    "text_readability",
    oracle="""
    WITH counts AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS w,
               CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
                   AS s
        FROM documents
    )
    SELECT doc_id, w AS n_words, s AS n_syllables,
           floor(CAST(206835 * w - 1015 * w * w - 84600 * s AS DOUBLE)
                 / (10.0 * w) + 0.5) / 100 AS flesch
    FROM counts WHERE w > 0
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability scoring: word count, vowel-group
    syllable approximation, and the classic 206.835 − 1.015·wps −
    84.6·spw formula (single-sentence corpus ⇒ words-per-sentence =
    word count). The quality-gate signal that catches word-salad and
    run-on boilerplate in a crawl.

    Pure codegen'd regexp counts — `regexp_extract_all` + `size` on
    both engines, shuffle-free, one pass. Joins text_quality's
    length/punct ratios as the §2.10 quality family's third lens.

    Hash-stability: the formula is evaluated as ONE exact integer
    numerator (206835·w − 1015·w² − 84600·s, milli-points scaled by w)
    over one double division — a single correctly-rounded IEEE op on
    identical integers, so both engines produce the identical double.
    The naive float chain differs between engines at the ULP level
    (DuckDB folds 1.015·w in DECIMAL, Spark in double) and this
    formula lands EXACTLY on .xx5 rounding boundaries for many (w, s).
    """
    d = t(spark, sf_dir, "documents")
    words = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), 0))
        .cast("long")
    )
    syll = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[aeiouy]+"), 0))
        .cast("long")
    )
    base = d.select(
        "doc_id", words.alias("w"), syll.alias("s")
    ).filter(F.col("w") > 0)
    num = (
        F.lit(206835) * F.col("w")
        - F.lit(1015) * F.col("w") * F.col("w")
        - F.lit(84600) * F.col("s")
    ).cast("double")
    return base.select(
        "doc_id",
        F.col("w").alias("n_words"),
        F.col("s").alias("n_syllables"),
        (
            F.floor(num / (F.lit(10.0) * F.col("w")) + F.lit(0.5)) / 100
        ).alias("flesch"),
    )


_PREFIX_LEN = 64


@register(
    "dedup_prefix_cluster",
    oracle=f"""
    WITH pref AS (
        SELECT doc_id, substr(text, 1, {_PREFIX_LEN}) AS prefix
        FROM documents
    )
    SELECT md5(prefix) AS prefix_key,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS keeper_id
    FROM pref
    GROUP BY prefix
    HAVING count(*) > 1
    """,
)
def dedup_prefix_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix clustering: documents sharing their first
    {64} characters (template headers, scraped navigation, license
    stubs) grouped into clusters with a deterministic keeper — the
    cheap first-pass dedup every crawl pipeline runs BEFORE the
    expensive shingle/minhash stages, because it removes the worst
    offenders with one hash shuffle.

    Grouping key is the md5 of the prefix (fixed 32-byte shuffle key
    instead of a 64-char string); a templated corpus makes this key
    skewed by construction — at 100 TB pre-aggregate with the salted
    two-phase idiom (agg_skew_salted) if one template dominates.
    """
    d = t(spark, sf_dir, "documents")
    pref = d.select(
        "doc_id", F.substring("text", 1, _PREFIX_LEN).alias("prefix")
    )
    return (
        pref.groupBy("prefix")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keeper_id"),
        )
        .filter(F.col("n_docs") > 1)
        .select(F.md5("prefix").alias("prefix_key"), "n_docs", "keeper_id")
    )


_EMA_SPAN = 7
_EMA_ALPHA = 0.25


@register(
    "win_ema",
    oracle=f"""
    WITH base AS (
        SELECT o_custkey, o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
        FROM orders
    ), lagged AS (
        SELECT o_custkey, o_orderkey, y,
               {" , ".join(
                   f"lag(y, {i}) OVER (PARTITION BY o_custkey "
                   f"ORDER BY o_orderkey) AS y{i}"
                   for i in range(1, _EMA_SPAN)
               )}
        FROM base
    )
    SELECT o_custkey, o_orderkey,
           floor((
               {" + ".join(
                   f"coalesce(y{i} * {(1 - _EMA_ALPHA) ** i!r}, 0)"
                   if i else "y * 1.0"
                   for i in range(_EMA_SPAN)
               )}
           ) / (
               {" + ".join(
                   f"(CASE WHEN y{i} IS NOT NULL THEN "
                   f"{(1 - _EMA_ALPHA) ** i!r} ELSE 0 END)"
                   if i else "1.0"
                   for i in range(_EMA_SPAN)
               )}
           ) * 100 + 0.5) / 100 AS ema_cents
    FROM lagged
    """,
)
def win_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average over the trailing
    {7}-order frame (span-bounded EMA — the smoothing every
    monitoring/trend surface applies before alerting).

    A true infinite-history EMA is a sequential recurrence — wrong
    shape for a distributed engine. The bounded-span form is a LINEAR
    combination of the last k values, so it unrolls to k lag() terms
    with fixed weights (1-α)^i, all inside ONE window pass over ONE
    shuffle on the partition key: exact, order-stable, codegen'd, and
    the weights are compile-time constants. Integer cents in, one
    rounded float projection out.
    """
    o = t(spark, sf_dir, "orders")
    base = o.select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    decay = 1 - _EMA_ALPHA
    terms = [F.col("y").cast("double")]
    wsum = [F.lit(1.0)]
    for i in range(1, _EMA_SPAN):
        yi = F.lag("y", i).over(w)
        terms.append(F.coalesce(yi * F.lit(decay**i), F.lit(0.0)))
        wsum.append(
            F.when(yi.isNotNull(), F.lit(decay**i)).otherwise(F.lit(0.0))
        )
    num = terms[0]
    for x in terms[1:]:
        num = num + x
    den = wsum[0]
    for x in wsum[1:]:
        den = den + x
    return base.select(
        "o_custkey",
        "o_orderkey",
        (F.floor(num / den * 100 + F.lit(0.5)) / 100).alias("ema_cents"),
    )
