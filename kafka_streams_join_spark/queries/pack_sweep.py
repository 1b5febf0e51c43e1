"""Packing context-length sweep (round 12): padding waste and packing
gain at four training sequence lengths (512/1024/2048/4096 units) from
ONE aggregate — the context-length dial behind
``pipeline_pack_sequences``' frozen constant. Choosing a sequence
length trades truncation/boundary loss against padding waste; this is
the report that shows, per candidate length L, what per-document
padding would cost and what concatenate-and-chunk packing recovers —
the two numbers a pretraining-data engineer compares before setting L.

Per length L over documents with non-empty text (length in chars, the
repo's token proxy):
  n_seqs_padded  = Σ ceil(len/L)      (one doc per sequence, padded)
  pad_waste_ppm  = (n_seqs_padded·L − total)·10⁶ div (n_seqs_padded·L)
  n_seqs_packed  = ceil(total/L)      (causal-LM concat packing)
  packing_gain_ppm = (n_seqs_padded − n_seqs_packed)·10⁶
                       div n_seqs_padded
— all exact integers (ceil(a/b) = (a + b − 1) div b on positive ints);
the four lengths are four conditional sums inside the SAME map-side-
combinable aggregate, unpivoted by a 4-row stack. The sweep costs one
pruned 1-column scan regardless of how many lengths it evaluates.

Scale: one scan, one combinable aggregate to a 1-row frame, a 4-row
Generate — nothing else. Corpus size never crosses an Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register

_PACK_LENS = (512, 1024, 2048, 4096)


@register(
    "pipeline_pack_length_sweep",
    oracle=f"""
    WITH d AS (
      SELECT length(text) AS len FROM documents WHERE length(text) > 0
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len) AS BIGINT) AS total_units,
             {", ".join(
                 f"CAST(sum((len + {L} - 1) // {L}) AS BIGINT) AS p{i}"
                 for i, L in enumerate(_PACK_LENS)
             )}
      FROM d
    ),
    rows_ AS (
      {" UNION ALL ".join(
          f"SELECT CAST({L} AS BIGINT) AS seq_len, n_docs, total_units,"
          f" p{i} AS n_seqs_padded FROM m"
          for i, L in enumerate(_PACK_LENS)
      )}
    )
    SELECT seq_len, n_docs, total_units, n_seqs_padded,
           CAST(CAST(n_seqs_padded * seq_len - total_units AS HUGEINT) * 1000000
                // (n_seqs_padded * seq_len) AS BIGINT) AS pad_waste_ppm,
           CAST((total_units + seq_len - 1) // seq_len AS BIGINT)
             AS n_seqs_packed,
           CAST(CAST(n_seqs_padded - (total_units + seq_len - 1) // seq_len
                     AS HUGEINT)
                * 1000000 // n_seqs_padded AS BIGINT) AS packing_gain_ppm
    FROM rows_
    """,
)
def pipeline_pack_length_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per candidate sequence length {lens}: padded sequence count and
    waste, concat-packed sequence count, and the packing gain — all
    exact-integer ppm from one scan + one aggregate. Module docstring
    has the ceil identities and single-pass contracts."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select(F.length("text").alias("len"))
        .filter(F.col("len") > 0)
    )
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("len").cast("bigint").alias("total_units"),
        *[
            F.expr(f"cast(sum((len + {L} - 1) div {L}) as bigint)").alias(
                f"p{i}"
            )
            for i, L in enumerate(_PACK_LENS)
        ],
    )
    stack_args = ", ".join(
        f"{L}L, p{i}" for i, L in enumerate(_PACK_LENS)
    )
    return m.select(
        F.expr(
            f"stack({len(_PACK_LENS)}, {stack_args})"
            " as (seq_len, n_seqs_padded)"
        ),
        "n_docs",
        "total_units",
    ).select(
        "seq_len",
        "n_docs",
        "total_units",
        "n_seqs_padded",
        F.expr(
            "cast(cast(n_seqs_padded * seq_len - total_units as decimal(38,0))"
            " * 1000000 div (n_seqs_padded * seq_len) as bigint)"
        ).alias("pad_waste_ppm"),
        F.expr(
            "cast((total_units + seq_len - 1) div seq_len as bigint)"
        ).alias("n_seqs_packed"),
        F.expr(
            "cast(cast(n_seqs_padded - (total_units + seq_len - 1) div seq_len"
            " as decimal(38,0)) * 1000000 div n_seqs_padded as bigint)"
        ).alias("packing_gain_ppm"),
    )


pipeline_pack_length_sweep.__doc__ = pipeline_pack_length_sweep.__doc__.replace(
    "{lens}", "/".join(str(x) for x in _PACK_LENS)
)
