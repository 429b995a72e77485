"""Repetition-based document quality rules (Gopher-style) for the
training-data pipeline: duplicate-word fraction, most-frequent n-gram
fraction, and duplicated n-gram fraction per document.

These are the classic pre-training corpus filters (Rae et al. 2021 "Scaling
Language Models" §A1.1 repetition rules; C4's boilerplate heuristics),
adapted to word n-grams.

Scale design: the whole computation is a NARROW map stage — per document we
sort the n-gram array and run-length-encode it with one ``F.aggregate``
higher-order function (O(g log g) per doc, JVM-side, inside whole-stage
codegen). No explode, no groupBy, ZERO shuffles: the plan is scan -> project,
which trivially survives 100 TB because every document is independent. The
DuckDB oracle computes the same statistics the classic way (unnest + GROUP
BY) so the two implementations cross-check each other.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pincspark.functions.text import ws_tokens


def run_length_stats(sorted_arr: Column) -> Column:
    """Run-length statistics of a SORTED string array in one ``F.aggregate``
    pass: ``struct(dup, best_c, best_g)`` where ``dup`` = total elements that
    sit in a run of length > 1 (i.e. occurrences of duplicated values),
    ``best_c``/``best_g`` = the longest run's length and value (ties broken
    toward the lexicographically larger value — the array is ascending and
    later runs win on ``>=``)."""
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("dup"),
        zero.alias("best_c"),
        F.lit("").alias("best_g"),
    )

    def step(acc: Column, g: Column) -> Column:
        same = (acc["run"] > 0) & (acc["prev"] == g)
        boundary = ~same
        return F.struct(
            g.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            (
                acc["dup"]
                + F.when(boundary & (acc["run"] > 1), acc["run"]).otherwise(zero)
            ).alias("dup"),
            F.when(
                boundary & (acc["run"] >= acc["best_c"]) & (acc["run"] > 0), acc["run"]
            )
            .otherwise(acc["best_c"])
            .alias("best_c"),
            F.when(
                boundary & (acc["run"] >= acc["best_c"]) & (acc["run"] > 0), acc["prev"]
            )
            .otherwise(acc["best_g"])
            .alias("best_g"),
        )

    def finish(acc: Column) -> Column:
        promote = (acc["run"] >= acc["best_c"]) & (acc["run"] > 0)
        return F.struct(
            (acc["dup"] + F.when(acc["run"] > 1, acc["run"]).otherwise(zero)).alias(
                "dup"
            ),
            F.when(promote, acc["run"]).otherwise(acc["best_c"]).alias("best_c"),
            F.when(promote, acc["prev"]).otherwise(acc["best_g"]).alias("best_g"),
        )

    return F.aggregate(sorted_arr, init, step, finish)


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Per-document repetition metrics:

    - ``dup_word_frac``: 1 - distinct_tokens / tokens (unigram repetition);
    - ``top_ngram`` / ``top_ngram_frac``: the most frequent ``top_n``-gram
      and the fraction of n-gram occurrences it accounts for (ties ->
      lexicographically larger gram);
    - ``dup_ngram_frac``: fraction of ``dup_n``-gram occurrences whose gram
      appears more than once in the doc.

    Tokens are lowercased whitespace tokens. Docs shorter than n tokens
    collapse to one whole-doc gram (fraction 1.0) — ngram_array semantics.
    """
    toks = ws_tokens(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col), toks.alias("__toks"))
    # Gram counting runs in an Arrow batch kernel (r16, guide §4.2):
    # the previous ngram_array + array_sort + run_length_stats chain is
    # built from higher-order-function lambdas, which Catalyst evaluates
    # INTERPRETED per array element (no codegen) — measured ~0.8 s of the
    # 1.25 s stage at sf0.1, and per-token interpreted cost at any scale.
    # A dict-count per document in a mapInPandas batch does the same work
    # at native speed. Drift containment: tokenization (lower + split)
    # stays JVM-side and the kernel emits ONLY integer counters and the
    # winning gram (ties to the lexicographically larger gram, compared
    # as UTF-8 bytes — UTF8String's binary order); every fraction and its
    # rounding stays in exactly the JVM expressions below, so the float
    # semantics the oracle pins are untouched. Still a narrow map stage:
    # scan -> kernel -> project, zero shuffles.
    from collections import Counter
    from collections.abc import Iterator

    import pandas as pd

    # schema-derived DDL (not dict(df.dtypes)) + backticked identifier so
    # id columns with spaces/special characters parse (ADVICE r16)
    id_type = df.schema[id_col].dataType.simpleString()

    def _grams(tl: list, n: int) -> list:
        if len(tl) >= n:
            return [" ".join(tl[i : i + n]) for i in range(len(tl) - n + 1)]
        return [" ".join(tl)]

    def _kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, tl in zip(pdf[id_col], pdf["__toks"]):
                if tl is None:
                    n_tok = n_dis = None
                    tl = []
                else:
                    tl = list(tl)
                    n_tok = len(tl)
                    n_dis = len(set(tl))
                ct = Counter(_grams(tl, top_n))
                best_g, best_c = max(
                    ct.items(), key=lambda kv: (kv[1], kv[0].encode("utf-8"))
                )
                cd = Counter(_grams(tl, dup_n))
                rows.append(
                    (
                        doc_id,
                        n_tok,
                        n_dis,
                        sum(ct.values()),
                        best_c,
                        best_g,
                        sum(cd.values()),
                        sum(c for c in cd.values() if c > 1),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "n_tokens",
                    "__n_distinct",
                    "__nt",
                    "__best_c",
                    "__best_g",
                    "__nd",
                    "__dup",
                ],
                dtype=object,
            )

    counted = base.mapInPandas(
        _kernel,
        f"`{id_col}` {id_type}, n_tokens int, __n_distinct int, __nt int, "
        "__best_c long, __best_g string, __nd int, __dup long",
    )
    frac = lambda num, den: F.round(  # noqa: E731
        num.cast("double") / den.cast("double"), 6
    )
    return counted.select(
        id_col,
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                1.0 - F.col("__n_distinct").cast("double") / F.col("n_tokens"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
        F.col("__best_g").alias("top_ngram"),
        frac(F.col("__best_c"), F.col("__nt")).alias("top_ngram_frac"),
        frac(F.col("__dup"), F.col("__nd")).alias("dup_ngram_frac"),
    )


# ---------------------------------------------------------------------------
# Declarative data-quality constraints (the deequ/Great-Expectations core,
# engine-native): a constraint census is the gate a warehouse runs before
# promoting a load. Row-local rules fold into ONE aggregation pass over the
# table (no per-rule scans); uniqueness and referential rules are the two
# shapes that genuinely need more than a scan (a keyed agg / an anti-join).
# ---------------------------------------------------------------------------


def constraint_violations(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Row-local constraint census: ``checks`` maps rule name -> a boolean
    Column that is TRUE when the row VIOLATES the rule. All rules are
    summed in a single scan; returns (rule string, violations bigint),
    one row per rule."""
    aggs = [
        F.sum(F.coalesce(c.cast("bigint"), F.lit(0))).alias(n)
        for n, c in checks.items()
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', coalesce({n}, 0L)" for n in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {stack}) as (rule, violations)"
    )


def duplicate_key_count(df: DataFrame, keys: list[str]) -> DataFrame:
    """Uniqueness constraint: rows carrying a (keys...) tuple that occurs
    more than once (every row of a duplicated tuple counts). One keyed
    aggregation."""
    extra = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("violations"))
    )
    return extra.select(F.lit("duplicate_key").alias("rule"), "violations")


def orphan_count(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Referential-integrity constraint: child rows whose key has no match
    in the parent (NULL keys are not orphans — cover them with a
    row-local not-null rule). Plans as an anti-join; AQE broadcasts the
    parent key column when it fits."""
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
    )
    return orphans.select(F.lit("orphan_key").alias("rule"), "violations")
