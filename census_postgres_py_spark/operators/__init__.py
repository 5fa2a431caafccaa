"""Operator modules. Importing this package registers every operator
with the registry (IDs = SURVEY.md §2 inventory)."""

from census_postgres_py_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    joins,
    multimodal,
    sampling,
    scalar_fns,
    scans,
    setops,
    similarity,
    sketches,
    streaming_batch,
    text_analysis,
    timeseries,
    transforms,
    udfs,
    windows,
)
from census_postgres_py_spark.streaming import jobs  # noqa: F401
from census_postgres_py_spark import pipeline  # noqa: F401
