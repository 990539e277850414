"""Semi-structured (JSON) column extraction.

Web-scale event/transcript tables carry free-form JSON payload columns
(here: ``events.props``). The scale-correct way to read them in Spark is
ONE typed parse per row — ``from_json`` with an explicit schema — never
N ``get_json_object`` calls (each re-parses the string) and never a
Python UDF. The parsed struct stays inside whole-stage codegen, the
schema makes downstream column pruning possible, and malformed JSON
degrades to NULL fields (PERMISSIVE mode) instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["parse_json_fields", "json_field"]


def parse_json_fields(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
    keep_raw: bool = False,
) -> DataFrame:
    """Project typed top-level fields out of a JSON string column.

    ``fields`` maps output column name → Spark SQL type string (e.g.
    ``{"k": "bigint", "tag": "string"}``). Compiles to a single
    ``from_json`` with a struct schema — one parse per row, all fields
    extracted from that one parse. Missing keys and malformed documents
    yield NULL (PERMISSIVE), matching SQL-engine JSON semantics so the
    result is oracle-checkable.
    """
    if not fields:
        raise ValueError("fields must name at least one JSON key")
    schema = StructType.fromDDL(
        ", ".join(f"{name} {typ}" for name, typ in fields.items())
    )
    parsed = F.from_json(F.col(json_col), schema).alias("__j")
    keep = [c for c in df.columns if keep_raw or c != json_col]
    return df.select(*keep, parsed).select(
        *keep, *[F.col(f"__j.{name}").alias(name) for name in fields]
    )


def json_field(json_col: Column, path: str, typ: str = "string") -> Column:
    """Single-field escape hatch: ``get_json_object`` + cast. Fine for
    one field; for two or more use :func:`parse_json_fields` so the
    document is parsed once, not once per field."""
    return F.get_json_object(json_col, path).cast(typ)
