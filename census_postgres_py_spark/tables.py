"""Test-fixture table access (TESTDATA.md; schemas in FIXTURES.md).

All operator queries load via :func:`t` so predicate pushdown / column
pruning reach the parquet scan — we never materialize or cache fixture
tables driver-side.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region
# and nation are fixed-size in ACS terms: geographies, not facts).
BROADCAST_DIMS = ("region", "nation")


#: (path, stat fingerprint) -> inferred Spark schema. Every bare
#: ``spark.read.parquet`` runs a 1-task schema-inference JOB (~70 ms
#: warm, and a host-stall exposure point); an explicit ``.schema(...)``
#: read plans with zero jobs (measured 20 reads: 1.68 s inferred vs
#: 0.34 s explicit). The first read of each fixture path infers
#: exactly as before and caches Spark's OWN StructType, so later reads
#: are byte-identical in semantics; the mtime+size fingerprint drops
#: the entry if a harness regenerates the file in-process. Metadata
#: only — no data or results are cached (r12, guide §1.2 "remove
#: driver-blocking work").
_SCHEMA_CACHE: dict = {}


def _path_fingerprint(path: str):
    import os

    try:
        st = os.stat(path)
        if os.path.isdir(path):
            # Rewriting a part file in place changes neither the
            # directory's mtime nor size, so directory-backed fixtures
            # fold the contained files' stats into the fingerprint
            # (r12 ADVICE).
            parts = tuple(
                sorted(
                    (fn, s.st_mtime_ns, s.st_size)
                    for root, _, fns in os.walk(path)
                    for fn in fns
                    for s in (os.stat(os.path.join(root, fn)),)
                )
            )
            return (st.st_mtime_ns, st.st_size, parts)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def _as_nullable(dt):
    """Parquet read-back re-infers every field nullable; normalize a
    written frame's schema the same way so a schema-explicit read is
    indistinguishable from the inferred one."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _as_nullable(f.dataType), True)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_as_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _as_nullable(dt.keyType), _as_nullable(dt.valueType), True
        )
    return dt


def read_back(spark: SparkSession, schema, *paths: str) -> DataFrame:
    """Schema-explicit parquet read of scratch data the operator itself
    (logically) wrote: ``schema`` is the written DataFrame's schema (or
    an expression-derived StructType equal to it). Every bare
    ``spark.read.parquet`` pays a 1-task schema-inference job — a
    serial driver round trip and a host-stall exposure point (the r12
    schema memo covers fixture paths; this helper covers the
    write-then-read-back scratch sites, r12 VERDICT item 2). For
    self-written parquet the inferred schema IS the written schema
    modulo nullability (normalized here exactly as inference would);
    partition columns are resolved by name and cast from their
    directory strings to the written type — identical to inference at
    every call site (string codes stay strings, int years stay ints).
    """
    return spark.read.schema(_as_nullable(schema)).parquet(*paths)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table.

    Some generations of ``events.parquet`` store ``ts`` as parquet INT64
    TIMESTAMP(NANOS), which Spark 4.x rejects at read time
    (PARQUET_TYPE_ILLEGAL). We read those via ``nanosAsLong`` and rebuild
    a microsecond timestamp — DuckDB (the oracle) reads the same file at
    microsecond precision, so ``ts div 1000`` keeps both sides exactly
    equal. Newer generations store a plain TIMESTAMP(MICROS), which both
    engines read natively — detect by the arrived-at Spark type. The conf
    is set here, not only in session.py, because the driver supplies its
    own SparkSession.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    fp = _path_fingerprint(path)
    cached = _SCHEMA_CACHE.get(path)
    if cached is not None and fp is not None and cached[0] == fp:
        df = spark.read.schema(cached[1]).parquet(path)
    else:
        df = spark.read.parquet(path)
        if fp is not None:
            _SCHEMA_CACHE[path] = (fp, df.schema)
    if name == "events" and dict(df.dtypes)["ts"] == "bigint":  # legacy NANOS
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Newer testdata generations write TIMESTAMP(MICROS, isAdjustedToUTC=
    # false), which Spark reads as TIMESTAMP_NTZ. Session tz is UTC
    # (session.py), so casting to TIMESTAMP is epoch-exact, matches how
    # DuckDB (the oracle) reads the same file, and keeps unix_millis()/
    # window()/watermark call sites — which require LTZ — type-valid.
    ntz = [c for c, d in df.dtypes if d == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def approx_rows(
    spark: SparkSession, sf_dir: str, name: str
) -> int:
    """O(1) row count of one fixture table from its parquet footer.

    Shared by every operator that needs a cheap cardinality guard
    (per-row-UDF refusals, broadcast-vs-shuffle gates) so the guard and
    :func:`t`'s scan can never disagree about where the table lives —
    both derive the path from the same ``{sf_dir}/{name}.parquet``
    convention here. Falls back to a full ``count()`` only when the
    footer isn't readable (non-file source, exotic layout); directories
    of part-files sum their footers without scanning data pages.
    """
    import os

    path = f"{sf_dir}/{name}.parquet"
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
                for root, _, fns in os.walk(path)
                for fn in fns
                if fn.endswith(".parquet")
            )
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return t(spark, sf_dir, name).count()


#: Gate for broadcast hints on frames derived from SCALE-GROWING
#: tables (part, customer, filtered orders — everything except the
#: fixed-cardinality BROADCAST_DIMS): at fixture scale the hint is
#: right (per-executor hash relation beats a shuffle of the fact
#: side), but the hint OVERRIDES Spark's size check, so at 100 TB an
#: unconditional hint would force an executor-memory-scale build.
#: 8M rows of a 2-3 column projection ≈ 200-400 MB — the practical
#: single-executor ceiling. Above the gate the hint is dropped and the
#: planner/AQE picks the strategy from real stats (which may STILL be
#: broadcast when a selective filter makes the side genuinely small).
BROADCAST_DIM_CONF = "spark.census.broadcastDimMaxRows"
_BROADCAST_DIM_MAX_ROWS = 8_000_000

#: FLOOR for the expansion factor on TERM-level derivations of
#: ``documents`` (dfreq/maxw vocabulary frames in text_tfidf /
#: text_bm25 / dedup_tfidf_cosine): those frames hold one row per
#: DISTINCT TERM, and vocabulary cardinality can exceed document count
#: by orders of magnitude (worst case every token unique => docs ×
#: tokens/doc). 64 distinct terms/doc closes the vocab gate at ~125k
#: docs under the default 8M-row cap — well before a vocabulary
#: broadcast could blow past the ~200-400 MB ceiling. This constant is
#: a best-effort PLANNING FLOOR, not an upper bound (r8 ADVICE):
#: :func:`vocab_rows_per_doc` derives the real factor from fixture
#: stats and never returns below it. When the hint is dropped the
#: planner/AQE still auto-broadcasts a side whose REAL runtime stats
#: show it small.
VOCAB_ROWS_PER_DOC = 64

_HEAD_SAMPLE_CACHE: dict[tuple, list[str]] = {}


def _documents_head_sample(sf_dir: str, n: int = 512) -> list[str]:
    """First ≤n document texts, read driver-side via pyarrow (one
    column, one batch, no Spark job) and cached per (path, size,
    mtime_ns). Serves the corpus-statistic planning gates
    (:func:`vocab_rows_per_doc`, :func:`vocab_sample_distinct`).
    Raises on a missing/unreadable table — callers own the fallback."""
    import os

    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):
        cands = [
            os.path.join(root, fn)
            for root, _, fns in os.walk(path)
            for fn in sorted(fns)
            if fn.endswith(".parquet")
        ]
        fpath = sorted(cands)[0]
    else:
        fpath = path
    st = os.stat(fpath)
    key = (fpath, st.st_size, st.st_mtime_ns, n)
    hit = _HEAD_SAMPLE_CACHE.get(key)
    if hit is not None:
        return hit
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(fpath)
    batch = next(pf.iter_batches(batch_size=n, columns=["text"]))
    texts = [txt or "" for txt in batch.column("text").to_pylist()]
    _HEAD_SAMPLE_CACHE[key] = texts
    return texts


def vocab_sample_distinct(sf_dir: str, n: int = 512) -> int:
    """Distinct whitespace-token count across the first ≤n documents —
    the SMALL-VOCABULARY detector: a corpus whose 512-doc head sample
    holds only a few thousand distinct terms is hub-dominated (every
    term is common), which flips which near-dup plan wins (see
    dedup_tfidf_cosine). Returns a large sentinel on a missing table so
    callers default to the general-corpus plan."""
    try:
        texts = _documents_head_sample(sf_dir, n)
    except Exception:
        return 1 << 30
    vocab: set[str] = set()
    for txt in texts:
        vocab.update(w for w in txt.split(" ") if w)
    return len(vocab)


def vocab_rows_per_doc(sf_dir: str) -> int:
    """Distinct-terms-per-doc bound derived from the corpus itself.

    Reads the first ≤512 rows of ``documents.parquet`` driver-side via
    pyarrow (one column, one batch — no Spark job), measures the MAX
    distinct whitespace-token count per document, and doubles it for
    sample-vs-population headroom, flooring at the static
    ``VOCAB_ROWS_PER_DOC``. Deriving from data instead of trusting the
    constant closes the r8 ADVICE gap: a corpus with long documents
    (>64 distinct terms) raises the factor and closes the broadcast
    gate EARLIER, instead of letting the hint override Spark's size
    check past the ceiling. Still best-effort (a head sample can
    under-read a heavy tail — hence the 2× margin and the floor); the
    gate's job is planning, not a hard memory guarantee. The head
    sample is cached per (path, size, mtime_ns) so repeated gate reads
    cost nothing.
    """
    try:
        texts = _documents_head_sample(sf_dir)
        max_terms = max(
            (len({w for w in txt.split(" ") if w}) for txt in texts),
            default=0,
        )
        return max(VOCAB_ROWS_PER_DOC, 2 * max_terms)
    except Exception:
        return VOCAB_ROWS_PER_DOC


def gated_broadcast(
    spark: SparkSession,
    sf_dir: str,
    table: str | tuple[str, ...],
    df: DataFrame,
    rows_per_source_row: float = 1.0,
) -> DataFrame:
    """Broadcast-hint ``df`` (a projection/derivation of fixture table
    ``table``) only while the table's O(1) footer row count ×
    ``rows_per_source_row`` is under ``spark.census.broadcastDimMaxRows``;
    otherwise return ``df`` un-hinted.

    The raw row count of the UNDERLYING table is a conservative upper
    bound only for KEY-level derivations (≤1 output row per source
    row: projections, groupBys on a source key, filtered key sets).
    Derivations that EXPAND the key space — term-level vocabulary
    frames being the repo's one family of these — must pass the
    expansion factor (``rows_per_source_row=VOCAB_ROWS_PER_DOC``) so
    the gate prices the derived cardinality, not the source's.

    ``table`` may be a PREFERENCE TUPLE (r8 ADVICE): the gate keys on
    the first candidate whose parquet EXISTS in ``sf_dir``, falling
    back left-to-right. This lets part-cardinality frames (e.g.
    distinct-partkey aggregates of lineitem) key on ``part`` — the
    tight bound, which stays broadcastable far past the point where
    lineitem's row count would close the gate — while table-subset
    corpora (the edges-only stress fixture carries no part.parquet)
    fall back to the derivation source instead of crashing through
    approx_rows' count() of a missing file. The LAST entry must be a
    table the op actually reads (static-tested in test_tables.py), so
    the fallback always exists on any corpus the op can run on."""
    import os

    if isinstance(table, tuple):
        chosen = table[-1]
        for cand in table:
            if os.path.exists(f"{sf_dir}/{cand}.parquet"):
                chosen = cand
                break
        table = chosen
    limit = int(
        spark.conf.get(BROADCAST_DIM_CONF, str(_BROADCAST_DIM_MAX_ROWS))
    )
    if approx_rows(spark, sf_dir, table) * rows_per_source_row <= limit:
        return F.broadcast(df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: t(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(
    spark: SparkSession, sf_dir: str, names: Iterable[str] | None = None
) -> None:
    """Register fixture tables as temp views (for spark.sql ops).

    Pass ``names`` to register only the tables a query touches —
    registering all ten eagerly forces a schema read of every file
    (and used to fail collaterally on events' NANOS timestamps).
    """
    for name in names if names is not None else TABLE_NAMES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
