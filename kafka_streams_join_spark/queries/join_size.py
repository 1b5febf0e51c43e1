"""AGMS join-size estimation (round 12): estimate |A ⋈ B| from one
±1-sketch pass over each table — the cardinality-estimation primitive a
query optimizer (or a pipeline planner sizing a shuffle) consults
BEFORE running the join. Completes the sketch shelf's query-planning
corner: ``agg_ams_f2`` is the self-join size F₂ = Σc²; this is the
two-table generalization Σ c_A(k)·c_B(k) (Alon-Gilbert-Matias-Szegedy,
"Tracking Join and Self-Join Sizes in Limited Storage", PODS'99).

Estimator: for sketch j, S_A(j) = Σ_rows∈A s_j(key) and
S_B(j) = Σ_rows∈B s_j(key) with four-wise-independent-style signs
s_j ∈ {±1}; E[S_A·S_B] = join size exactly. The registered query runs
{_N_EST} independent sketches and takes their MEDIAN — deterministic
(middle element of the sorted odd-length product list), no float.

Determinism contract: signs derive from hex digit j of md5(key) —
parity even → +1, odd → −1 — via the repo's proven cross-engine idiom
(Spark ``conv(substr(md5(..)))`` ≡ DuckDB ``CAST('0x'||substr AS
INT)``); ONE md5 per row feeds all {_N_EST} signs. Every sum is BIGINT,
every product DECIMAL(38,0)/HUGEINT (|S| ≤ rows, so products ≤ 1e24 at
1e12 rows — 14 digits of headroom), the median is an array index, and
the error report is truncating-div ppm. The exact join size rides along
as the in-row audit leg (the ``sketch_hll_bias_corrected`` contract):
computed from per-key count frames joined key-on-key — never by
materializing the join.

Scale: each sketch pass is ONE map-side-combinable {_N_EST}-sum
aggregate per table (two corpus scans total, 1-row frames out); the
audit leg is two per-key aggregates + one key equi-join. Nothing
data-sized crosses a wide Exchange; dropping the audit leg (as a
production planner would) leaves two scans and no join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_N_EST = 9  # independent ±1 sketches; median of an odd count is exact


def _sign_spark(key: str, j: int) -> str:
    return (
        f"case when cast(conv(substr(md5(cast({key} as string)), {j}, 1),"
        " 16, 10) as int) % 2 = 0 then 1 else -1 end"
    )


def _sign_sql(key: str, j: int) -> str:
    return (
        f"CASE WHEN CAST(('0x' || substr(md5({key}::VARCHAR), {j}, 1))"
        " AS INT) % 2 = 0 THEN 1 ELSE -1 END"
    )


_SA_SQL = ",\n".join(
    f"CAST(sum({_sign_sql('user_id', j)}) AS BIGINT) AS sa{j}"
    for j in range(1, _N_EST + 1)
)
_SB_SQL = ",\n".join(
    f"CAST(sum({_sign_sql('o_custkey', j)}) AS BIGINT) AS sb{j}"
    for j in range(1, _N_EST + 1)
)
_PROD_SQL = ", ".join(
    f"CAST(a.sa{j} AS HUGEINT) * b.sb{j}" for j in range(1, _N_EST + 1)
)


@register(
    "sketch_agms_join_size",
    oracle=f"""
    WITH a AS (SELECT {_SA_SQL} FROM events),
    b AS (SELECT {_SB_SQL} FROM orders),
    est AS (
      SELECT CAST(list_sort([{_PROD_SQL}])[{_N_EST // 2 + 1}] AS BIGINT)
               AS est_join_size
      FROM a CROSS JOIN b
    ),
    exact AS (
      SELECT CAST(coalesce(sum(CAST(e.c AS HUGEINT) * o.c), 0) AS BIGINT)
               AS exact_join_size
      FROM (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1) e
      JOIN (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1) o
        ON o.k = e.k
    )
    SELECT exact.exact_join_size, est.est_join_size,
           CAST({_N_EST} AS BIGINT) AS n_sketches,
           CAST(CASE WHEN exact.exact_join_size = 0 THEN 0
                ELSE abs(est.est_join_size - exact.exact_join_size)
                     * 1000000 // exact.exact_join_size
                END AS BIGINT) AS err_ppm
    FROM exact CROSS JOIN est
    """,
)
def sketch_agms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-{_N_EST} AGMS estimate of |events ⋈ orders| on
    user_id = o_custkey, with the exact join size and the estimator's
    ppm error as in-row audit columns. Module docstring has the sign
    construction, determinism, and two-scan scale contracts."""
    ev = load_table(spark, sf_dir, "events")
    od = load_table(spark, sf_dir, "orders")
    a = ev.agg(
        *[
            F.expr(f"cast(sum({_sign_spark('user_id', j)}) as bigint)").alias(
                f"sa{j}"
            )
            for j in range(1, _N_EST + 1)
        ]
    )
    b = od.agg(
        *[
            F.expr(
                f"cast(sum({_sign_spark('o_custkey', j)}) as bigint)"
            ).alias(f"sb{j}")
            for j in range(1, _N_EST + 1)
        ]
    )
    prods = ", ".join(
        f"cast(sa{j} as decimal(38,0)) * sb{j}"
        for j in range(1, _N_EST + 1)
    )
    est = a.crossJoin(F.broadcast(b)).select(
        F.expr(
            f"cast(element_at(array_sort(array({prods})),"
            f" {_N_EST // 2 + 1}) as bigint)"
        ).alias("est_join_size")
    )
    ec = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    oc = od.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    exact = (
        ec.join(oc.withColumnRenamed("c", "c2"), "k")
        .agg(
            F.expr(
                "cast(coalesce(sum(cast(c as decimal(38,0)) * c2), 0)"
                " as bigint)"
            ).alias("exact_join_size")
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_join_size",
        "est_join_size",
        F.lit(_N_EST).cast("bigint").alias("n_sketches"),
        F.expr(
            "cast(case when exact_join_size = 0 then 0"
            " else abs(est_join_size - exact_join_size)"
            " * 1000000 div exact_join_size end as bigint)"
        ).alias("err_ppm"),
    )


for _fn in (sketch_agms_join_size,):
    _fn.__doc__ = _fn.__doc__.replace("{_N_EST}", str(_N_EST))
__doc__ = __doc__.replace("{_N_EST}", str(_N_EST))
