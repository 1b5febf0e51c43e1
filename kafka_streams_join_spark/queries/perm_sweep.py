"""MinHash signature-length sweep (round 12): the Jaccard-estimation
error of 8- vs 16- vs 32-permutation MinHash signatures, measured on
the certified LSH candidate pairs against their exact Jaccard — the
space/accuracy dial behind ``dedup_minhash_lsh``'s frozen K=32 (each
halving of the signature halves index size and shuffle bytes; this is
the curve that shows what it costs in estimator error, on this corpus
rather than from the 1/√K folklore).

Prefix lengths NEST by construction — the 8-perm signature is the
first 8 of the registered 32 ``_HASH_PARAMS`` permutations — so ONE
signature computation feeds all three lengths (the round's one-pass
dial discipline), and the 32-perm row doubles as a self-audit of the
production signature.

Exactness: the per-pair error compares two exact rationals —
|matches/p − c/u| in milli = |1000·matches·u − 1000·c·p| div (p·u) on
exact BIGINTs (matches from minhash equality, c/u from the 60-bit
exact sets) — and the report is the truncating-div mean and max over
pairs. Pairs where both docs are shingle-free (u = 0) are excluded —
they are unhashable, the ``mm_phash_neardup`` empty-blob rule.

Scale: inherited from dedup_minhash_lsh verbatim — signatures are
map-side expressions over the staged shingle sets, candidates come
from the (band, band_sig) equi-join (never all-pairs), and the sweep
adds per-pair prefix-match counts (array expressions over 32-element
arrays) plus one 3-level aggregate over the candidate-pair frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import staged as _staged
from .dedup import (
    _BANDS,
    _K,
    _MINHASH_SQL_PARAMS,
    _P,
    _SHINGLES_SQL,
    _doc_shingle_sets,
    _minhash_bands,
)
from .registry import register

_PERM_LEVELS = (8, 16, 32)


@register(
    "dedup_minhash_perm_sweep",
    oracle=f"""
    {_SHINGLES_SQL},
    hashed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)  AS h32,
             CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h60
      FROM sh
    ),
    params(i, a, b) AS (VALUES {_MINHASH_SQL_PARAMS}),
    mh AS (
      SELECT doc_id, i AS hash_idx, min((a * h32 + b) % {_P}) AS mh
      FROM hashed, params GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, hash_idx // {_K // _BANDS} AS band,
             md5(string_agg(mh::VARCHAR, ',' ORDER BY hash_idx)) AS band_sig
      FROM mh GROUP BY doc_id, hash_idx // {_K // _BANDS}
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id
    ),
    sizes AS (SELECT doc_id, count(DISTINCT h60) AS n
              FROM hashed GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(DISTINCT a.h60) AS c
      FROM cand c
      JOIN hashed a ON a.doc_id = c.doc_a
      JOIN hashed b ON b.doc_id = c.doc_b AND b.h60 = a.h60
      GROUP BY 1, 2
    ),
    mm AS (
      SELECT c.doc_a, c.doc_b,
             {", ".join(
                 f"CAST(sum(CASE WHEN ma.hash_idx < {p} AND ma.mh = mb.mh"
                 f" THEN 1 ELSE 0 END) AS BIGINT) AS m{p}"
                 for p in _PERM_LEVELS
             )}
      FROM cand c
      JOIN mh ma ON ma.doc_id = c.doc_a
      JOIN mh mb ON mb.doc_id = c.doc_b AND mb.hash_idx = ma.hash_idx
      GROUP BY 1, 2
    ),
    perpair AS (
      SELECT mm.doc_a, mm.doc_b,
             CAST(coalesce(i.c, 0) AS BIGINT) AS c,
             CAST(sa.n + sb.n - coalesce(i.c, 0) AS BIGINT) AS u,
             {", ".join(f"mm.m{p}" for p in _PERM_LEVELS)}
      FROM mm
      LEFT JOIN inter i ON i.doc_a = mm.doc_a AND i.doc_b = mm.doc_b
      JOIN sizes sa ON sa.doc_id = mm.doc_a
      JOIN sizes sb ON sb.doc_id = mm.doc_b
      WHERE sa.n + sb.n - coalesce(i.c, 0) > 0
    ),
    ps AS (SELECT unnest([{", ".join(str(p) for p in _PERM_LEVELS)}]) AS p),
    errs AS (
      SELECT ps.p,
             abs(1000 * (CASE ps.p {" ".join(
                 f"WHEN {p} THEN m{p}" for p in _PERM_LEVELS
             )} END) * u - 1000 * c * ps.p) // (ps.p * u) AS err
      FROM perpair CROSS JOIN ps
    )
    SELECT CAST(p AS BIGINT) AS perms,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(err) // count(*) AS BIGINT) AS mean_abs_err_milli,
           CAST(max(err) AS BIGINT) AS max_abs_err_milli
    FROM errs GROUP BY p
    """,
)
def dedup_minhash_perm_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per signature length {ps} permutations: candidate-pair count and
    the mean/max absolute error of the MinHash Jaccard estimate vs the
    exact 60-bit-set Jaccard, in exact integer milli. Module docstring
    has the nesting, exact-rational, and inherited-candidate
    contracts."""
    docsets = _staged(_doc_shingle_sets(spark, sf_dir))
    # the registered signature columns mh0..mh{K-1}, packed into one array
    # for prefix slicing — same values, no recompute
    mh_arr = "array(" + ", ".join(f"mh{i}" for i in range(_K)) + ")"
    sets = _staged(
        docsets.select(
            "doc_id",
            "hs60",
            F.size("hs60").alias("n"),
            F.expr(mh_arr).alias("mh"),
        )
    )
    bands = _minhash_bands(docsets)
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_sig") == F.col("y.band_sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sets.alias("sa")
    sb = sets.alias("sb")
    c = F.size(F.expr("array_intersect(sa.hs60, sb.hs60)")).cast("long")
    match_cols = [
        F.expr(
            f"cast(size(filter(zip_with(slice(sa.mh, 1, {p}),"
            f" slice(sb.mh, 1, {p}), (mx, my) -> mx = my), v -> v))"
            " as bigint)"
        ).alias(f"m{p}")
        for p in _PERM_LEVELS
    ]
    perpair = (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            c.alias("c"),
            (F.col("sa.n") + F.col("sb.n") - c).cast("long").alias("u"),
            *match_cols,
        )
        .filter(F.col("u") > 0)
    )
    stack_args = ", ".join(f"{p}L, m{p}" for p in _PERM_LEVELS)
    errs = perpair.select(
        F.expr(
            f"stack({len(_PERM_LEVELS)}, {stack_args}) as (p, m)"
        ),
        "c",
        "u",
    ).select(
        "p",
        F.expr("abs(1000 * m * u - 1000 * c * p) div (p * u)").alias("err"),
    )
    return errs.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("cast(sum(err) div count(1) as bigint)").alias(
            "mean_abs_err_milli"
        ),
        F.max("err").cast("bigint").alias("max_abs_err_milli"),
    ).select(
        F.col("p").cast("bigint").alias("perms"),
        "n_pairs",
        "mean_abs_err_milli",
        "max_abs_err_milli",
    )


dedup_minhash_perm_sweep.__doc__ = dedup_minhash_perm_sweep.__doc__.replace(
    "{ps}", "/".join(str(p) for p in _PERM_LEVELS)
)
