"""Schema normalization / union-by-name (P24).

Reference parity: ais_egressServerCH.py:23-65,176-191 maps the DAC533/FID1
payload onto the FID4 37-column layout zero-filling missing buoy flags, and
pads FID2 rows with two zero columns — i.e. normalize heterogeneous record
layouts into one table. Spark-first: ``unionByName(allowMissingColumns)``
with typed fill defaults; no shuffle at all (union is a narrow op).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_normalize(
    dfs: Sequence[DataFrame],
    fill: Mapping[str, object] | None = None,
    tag_col: str | None = None,
    tags: Sequence[str] | None = None,
) -> DataFrame:
    """Union heterogeneous frames into one normalized layout.

    Missing columns are added as nulls (or ``fill[col]`` literals, matching
    the reference's zero-fill of absent vendor fields). ``tag_col``/``tags``
    optionally records each row's source layout.
    """
    fill = dict(fill or {})
    all_cols: list[str] = []
    types: dict[str, object] = {}
    for df in dfs:
        for f_ in df.schema.fields:
            if f_.name not in types:
                all_cols.append(f_.name)
                types[f_.name] = f_.dataType

    out = []
    for i, df in enumerate(dfs):
        missing = [c for c in all_cols if c not in df.columns]
        for c in missing:
            default = F.lit(fill.get(c, None)).cast(types[c])
            df = df.withColumn(c, default)
        df = df.select(*all_cols)
        if tag_col is not None:
            df = df.withColumn(tag_col, F.lit(tags[i] if tags else str(i)))
        out.append(df)

    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res
