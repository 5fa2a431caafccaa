"""census_postgres_py_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
tool ``grant-humphries/census-postgres-py`` (which loads US Census ACS
summary files into Postgres), rebuilt Spark-first:

* metadata-driven schema generation  -> ``StructType`` built from data
  (``sources.metadata_schema``)
* sequence-file CSV / geoheader fixed-width parsing -> schema-explicit
  readers (``sources.csv_sequence``, ``sources.fixed_width``)
* geoheader ⋈ estimates ⋈ margins assembly -> broadcast / star joins
  with Catalyst column pruning (``operators.joins``)
* bulk COPY into Postgres -> partitioned ``df.write.jdbc``
  (``sources.jdbc``)

plus the LLM-data-pipeline extensions mandated by BASELINE.json:6 —
exact & MinHash dedup, top-k vector similarity search, multimodal
binary columns, text analysis, and windowed/streaming event processing.

Provenance note: the reference checkout at /root/reference is EMPTY
(SURVEY.md §0), so reference parity is documented against public
knowledge of the reference's behavior, tagged [PK] in SURVEY.md, not
against file:line citations.
"""

from census_postgres_py_spark.registry import all_oracles, all_queries, flagship

__all__ = ["all_queries", "all_oracles", "flagship"]
