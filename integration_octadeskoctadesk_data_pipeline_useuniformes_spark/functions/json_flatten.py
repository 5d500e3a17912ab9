"""Semi-structured flattening (SURVEY C14/C15, ticket.py:149, chat.py:116).

The reference flattens arbitrary nested JSON with pd.json_normalize,
producing dotted column names. Spark-first:

- JSON *strings* → ``from_json`` with an explicit or inferred schema,
- struct columns → a recursive projection of leaves aliased with the
  dotted (then sanitized) path — pure metadata work, no data movement,
  and Catalyst prunes unreferenced leaves down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .names import sanitize_column_name


def struct_leaves(schema: StructType, prefix: str = "") -> list[str]:
    """Dotted paths of all leaf fields of a struct schema."""
    out: list[str] = []
    for field in schema.fields:
        path = f"{prefix}{field.name}"
        if isinstance(field.dataType, StructType):
            out.extend(struct_leaves(field.dataType, prefix=f"{path}."))
        else:
            out.append(path)
    return out


def flatten_struct_columns(
    df: DataFrame, sep: str = ".", sanitize: bool = True
) -> DataFrame:
    """json_normalize-equivalent: explode every struct column into its
    leaves named ``parent{sep}child…`` (then sanitized to legal names,
    so '.' becomes '_')."""
    cols: list[Column] = []
    for field in df.schema.fields:
        if isinstance(field.dataType, StructType):
            for leaf in struct_leaves(field.dataType, prefix=f"{field.name}."):
                name = leaf if sep == "." else leaf.replace(".", sep)
                cols.append(F.col(leaf).alias(sanitize_column_name(name) if sanitize else name))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


def parse_json_column(
    df: DataFrame, json_col: str, schema: str | StructType, out_col: str | None = None
) -> DataFrame:
    """from_json with explicit schema (permissive: malformed → nulls)."""
    return df.withColumn(out_col or json_col, F.from_json(F.col(json_col), schema))
