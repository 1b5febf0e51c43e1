"""Streaming near-dup: MinHash-band dedup within a watermark.

Composition proof for the dedup family (SURVEY §2.7 × §2.6): the batch
MinHash-LSH machinery (queries/dedup.py) re-expressed so its signature
stage is a PER-RECORD projection — no corpus aggregation — which lets it
compose with ``dropDuplicatesWithinWatermark`` exactly the way the scrub
and decontamination projections already compose with streams. Same
shingling contract, same permutation constants, same banding
(``_band_sig_exprs``): a record's band signatures on the stream equal the
batch pipeline's for the same text, which the tests certify by running
both on identical rows.

Semantics — band-granular first-wins: each record explodes into B
(band, band_sig) rows, and a band row is EMITTED iff that signature was
not seen within the watermark delay. Doc-level policies are counts over
the surviving rows of a key:
- all B bands emitted → novel document;
- zero emitted → (within LSH error) a near-duplicate of a recent record;
- partial → shares some bands, i.e. an LSH *candidate* — the aggressive
  drop-if-any-band-collides rule is "survived < B".
Emission is immediate (dedup emits on arrival, append mode); the
watermark only drives STATE EVICTION, so state is one entry per distinct
(band, band_sig) inside the delay window — bounded at any throughput by
the delay, never by corpus size. After the watermark passes, a
re-arriving duplicate is emitted again: within-delay dedup is the
guarantee, exactly ``dropDuplicatesWithinWatermark``'s contract (and the
right one for a pipeline deduping a firehose in rolling windows; full
historical near-dup is the batch operators' job).

Records with < 3 tokens have no shingles (NULL minima); their bands fall
back to an exact-text signature — exact dedup is the only sensible
near-dup notion for 1-2 token records, and NULL bands must never compare
equal across different texts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.dedup import _band_sig_exprs, minhash_signature_cols


def minhash_band_rows(
    df: DataFrame, text_col: str = "value", carry: list[str] | None = None
) -> DataFrame:
    """(carry..., band, band_sig) — one row per LSH band per record, all
    row-local (projection + explode, stream-safe). ``carry`` columns pass
    through (default: key and ts)."""
    carry = carry if carry is not None else ["key", "ts"]
    fallback = f"md5(concat('short|', regexp_replace(trim({text_col}), '\\\\s+', ' ')))"
    structs = ", ".join(
        f"named_struct('band', {b}, 'band_sig',"
        f" CASE WHEN mh0 IS NULL THEN {fallback} ELSE {sig} END)"
        for b, sig in _band_sig_exprs()
    )
    sig = minhash_signature_cols(df, text_col)
    return sig.select(
        *carry, F.explode(F.expr(f"array({structs})")).alias("bs")
    ).select(*carry, F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))


def stream_dedup_minhash(
    df: DataFrame,
    text_col: str = "value",
    ts: str = "ts",
    watermark_delay: str = "1 minute",
    key: str = "key",
    extra_carry: list[str] | None = None,
) -> DataFrame:
    """Streaming MinHash-band dedup: band rows surviving first-seen
    filtering within the watermark. The streaming sibling of
    ``dedup_minhash_lsh`` the way ``stream_dedup`` is ``dedup_exact``'s —
    state keyed on (band, band_sig), evicted by the watermark. The
    ``key``/``ts`` columns are forwarded into the band rows' carry list,
    so non-default column names work end to end; ``extra_carry`` rides
    additional upstream columns (scrubbed text, quality scores) through
    the stateful stage for downstream consumers."""
    # dict.fromkeys dedups while preserving order: an extra_carry entry
    # repeating key/ts would otherwise duplicate the column and crash
    # withWatermark with an ambiguous reference
    carry = list(dict.fromkeys([key, ts, *(extra_carry or [])]))
    bands = minhash_band_rows(df, text_col, carry=carry)
    return bands.withWatermark(ts, watermark_delay).dropDuplicatesWithinWatermark(
        ["band", "band_sig"]
    )


def stream_novelty_counts(
    df: DataFrame,
    text_col: str = "value",
    key: str = "key",
    ts: str = "ts",
    window: str = "1 minute",
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Doc-granular novelty: per key, how many of its bands were novel —
    the band-level dedup CHAINED with a windowed count, i.e. two stateful
    operators in one append-mode pipeline (dropDuplicatesWithinWatermark
    → window aggregation; supported since Spark 3.5's multi-stateful
    support, and the shape a production firehose-dedup job runs).

    Reading the output: ``novel_bands`` = B → the document is novel;
    a missing key (zero surviving bands) → near-duplicate of a recent
    record; 0 < novel_bands < B → LSH candidate (shares bands). Rows
    finalize when the watermark passes their window's end."""
    survived = stream_dedup_minhash(df, text_col, ts, watermark_delay, key=key)
    return (
        survived.groupBy(F.window(ts, window).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("novel_bands"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            key,
            "novel_bands",
        )
    )
