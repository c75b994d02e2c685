"""Declarative data-quality constraints (deequ/dbt-test family).

A rule set compiles into ONE aggregation pass over the table — every
rule becomes a conditional-sum expression, so checking N rules costs a
single scan with map-side partial aggregation, not N queries. The
result is data (rule, violations, passed), so quality gates compose
with the rest of the pipeline (fail a DAG task, route to quarantine,
trend violations over time).

``unique`` rules need a distinct count, which Spark evaluates in the
same aggregate (expand + two-phase hash agg) — still one pass over the
input.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    violation: Optional[Column] = None  # true where the row VIOLATES
    unique_on: Sequence[str] = field(default_factory=tuple)


def not_null(column: str) -> Rule:
    return Rule(f"not_null({column})", F.col(column).isNull())


def accepted_values(column: str, values: Sequence) -> Rule:
    vals = ", ".join(repr(v) for v in values)
    return Rule(
        f"accepted_values({column})",
        ~F.col(column).isin(list(values)) | F.col(column).isNull(),
    )


def in_range(column: str, lo, hi) -> Rule:
    return Rule(
        f"range({column})",
        ~F.col(column).between(lo, hi) | F.col(column).isNull(),
    )


def matches(column: str, pattern: str) -> Rule:
    return Rule(
        f"matches({column})",
        ~F.col(column).rlike(pattern) | F.col(column).isNull(),
    )


def unique(*columns: str) -> Rule:
    return Rule(f"unique({','.join(columns)})", unique_on=tuple(columns))


def annotate_violations(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Row-level variant: adds ``violated_rules array<string>`` (empty =
    clean row). A pure narrow map — the quarantine-routing building
    block: ``annotated.where(size(violated_rules) > 0)`` goes to the
    quarantine sink, the rest flows on. ``unique`` rules are aggregate
    properties and are rejected here."""
    names = []
    flags = []
    for r in rules:
        if r.unique_on:
            raise ValueError(f"{r.name}: unique rules are not row-level")
        names.append(r.name)
        flags.append(F.when(r.violation, F.lit(r.name)))
    return df.withColumn(
        "violated_rules",
        F.filter(F.array(*flags), lambda x: x.isNotNull()),
    )


def quarantine_split(df: DataFrame, rules: Sequence[Rule]):
    """(clean_df, quarantined_df) — quarantined rows carry their reasons."""
    annotated = annotate_violations(df, rules)
    clean = annotated.where(F.size("violated_rules") == 0).drop("violated_rules")
    bad = annotated.where(F.size("violated_rules") > 0)
    return clean, bad


def check(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """One aggregation pass -> (rule, violations, n_rows, passed)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        if r.unique_on:
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.count_distinct(*[F.col(c) for c in r.unique_on])
                ).alias(f"_v{i}")
            )
        else:
            aggs.append(
                F.sum(r.violation.cast("long")).alias(f"_v{i}")
            )
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{r.name}', _v{i}" for i, r in enumerate(rules)
    )
    return row.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, violations)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("rule", "violations", "n_rows", (F.col("violations") == 0).alias("passed"))
