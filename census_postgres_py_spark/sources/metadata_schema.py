"""Metadata-driven schema generation (SURVEY.md §2.1 schema_from_metadata).

Reference behavior [PK]: the ACS *Sequence Number and Table Number
Lookup* file maps each census table ID to its sequence number, cell
positions and counts; the reference parses it and generates Postgres
DDL programmatically via SQLAlchemy — schemas are data, not code.

Spark-first: the same metadata becomes rows of (column_name, data_type,
ordinal) from which we construct a ``StructType``. No DDL string
generation; the StructType IS the schema object used by readers,
writers, and ``createDataFrame``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_TYPE_MAP: dict[str, DataType] = {
    "int": IntegerType(),
    "integer": IntegerType(),
    "bigint": LongType(),
    "long": LongType(),
    "double": DoubleType(),
    "float": FloatType(),
    "string": StringType(),
    "varchar": StringType(),
    "timestamp": TimestampType(),
}


def schema_from_metadata(rows: list[tuple[str, str, int]]) -> StructType:
    """Build a StructType from (column_name, type_name, ordinal) rows.

    Rows may arrive in any order (the ACS lookup is keyed by position);
    fields are emitted in ordinal order, mirroring the reference's
    position-driven column generation.
    """
    fields = []
    for name, type_name, _pos in sorted(rows, key=lambda r: r[2]):
        try:
            dtype = _TYPE_MAP[type_name.lower()]
        except KeyError:
            raise ValueError(f"unknown metadata type {type_name!r} for {name!r}")
        fields.append(StructField(name, dtype, nullable=True))
    return StructType(fields)


def sequence_table_schema(
    table_id: str, cell_count: int, cell_type: str = "double"
) -> StructType:
    """ACS sequence-table schema: six bookkeeping columns then
    ``{table_id}001..{table_id}NNN`` data cells [PK — SURVEY.md §1.1]."""
    rows: list[tuple[str, str, int]] = [
        ("fileid", "string", 1),
        ("filetype", "string", 2),
        ("stusab", "string", 3),
        ("chariter", "string", 4),
        ("sequence", "int", 5),
        ("logrecno", "int", 6),
    ]
    rows += [
        (f"{table_id.lower()}{i:03d}", cell_type, 6 + i)
        for i in range(1, cell_count + 1)
    ]
    return schema_from_metadata(rows)
