"""Sources & sinks — the reference's ETL I/O surface re-expressed.

The reference ingests ACS sequence files (headerless CSV with '.'-coded
jam values), fixed-width geoheader files, and a metadata lookup that
drives schema generation; it bulk-loads into Postgres [PK — SURVEY.md
§1.1]. Here: schema-explicit Spark readers + StructType-from-metadata +
partitioned parquet / JDBC writers.
"""
