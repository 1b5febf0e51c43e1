#!/usr/bin/env python
"""Deterministic corpus amplifier for the scale-stress ledger (VERDICT r12
item 1).

Builds an sf(K x src) corpus by replicating a driver-generated source dir
K times with per-copy transformations that preserve WITHIN-copy structure
(dup pairs, graph components, join fan-outs) while decorrelating ACROSS
copies — so candidate-generation stages scale the way real corpus growth
scales instead of exploding quadratically on identical replicas:

- id columns shift by a power-of-10 stride per copy (vec_id's %-100 query
  stride and doc-id hash buckets keep their density);
- foreign keys shift consistently (orderkey across orders+lineitem,
  partkey across part+lineitem, custkey, suppkey);
- document text mutates every 5th word with a copy token (k-shingle sets
  across copies become disjoint; within a copy both members of a dup pair
  mutate identically, so near-dup structure is preserved);
- embeddings permute dimensions with a per-copy affine bijection
  (within-copy cosines are EXACTLY invariant; cross-copy cosines drop to
  background level);
- region/nation stay single-copy (fixed-size dims at any TPC-H sf).

Copy 0 is the identity, so the source corpus is a subset of the output.
Everything is seed-free and deterministic: same inputs -> same bytes.

Usage: python tools/gen_scale.py <src_sf_dir> <out_dir> <K>
e.g.   python tools/gen_scale.py /root/testdata/sf0.1 /root/repo/.tmp/scale/sf1 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIM = 64
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _stride(df: DataFrame, col: str) -> int:
    mx = df.agg(F.max(col)).collect()[0][0] or 0
    s = 1
    while s <= mx:
        s *= 10
    return s


def _mutate_text(copy: int) -> str:
    """Every 5th word (phase-shifted by copy) gets a copy suffix: k-shingle
    sets across copies share (almost) nothing, within-copy alignment is
    identical for identical texts."""
    return (
        "array_join(transform(split(text, ' '), (w, i) -> "
        f"if((i + {copy}) % 5 = 0, concat(w, '_c{copy}'), w)), ' ')"
    )


def _permute_embedding(copy: int) -> str:
    """Per-copy affine dimension bijection d -> (a*d + b) mod DIM with a
    odd (coprime to 64): within-copy cosines invariant, cross-copy
    decorrelated. Copy 0 must be identity."""
    if copy == 0:
        return "embedding"
    a = 2 * ((copy * 7) % 16) + 1  # odd in [1, 31]
    b = (copy * 13) % DIM
    return (
        f"transform(sequence(0, {DIM - 1}), "
        f"d -> embedding[(({a} * d + {b}) % {DIM})])"
    )


def amplify(spark: SparkSession, src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    # load_table, not a bare read: it normalizes the events TIMESTAMP(NANOS)
    # footer and NTZ variants (sources/parquet.py), so the amplified corpus
    # is written with one uniform µs LTZ timestamp type
    from kafka_streams_join_spark.sources.parquet import load_table

    t = {n: load_table(spark, src, n) for n in TABLES}
    strides = {
        "order": _stride(t["orders"], "o_orderkey"),
        "part": _stride(t["part"], "p_partkey"),
        "cust": _stride(t["customer"], "c_custkey"),
        "supp": _stride(t["supplier"], "s_suppkey"),
        "event": _stride(t["events"], "event_id"),
        "user": _stride(t["events"], "user_id"),
        "doc": _stride(t["documents"], "doc_id"),
        "vec": _stride(t["embeddings"], "vec_id"),
    }

    def copies(name: str, exprs) -> DataFrame:
        parts = []
        cols = t[name].columns
        for c in range(k):
            sel = [
                F.expr(exprs(c).get(col, col)).alias(col) for col in cols
            ]
            parts.append(t[name].select(*sel))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    plans = {
        "region": t["region"],
        "nation": t["nation"],
        "customer": copies(
            "customer", lambda c: {"c_custkey": f"c_custkey + {c * strides['cust']}"}
        ),
        "supplier": copies(
            "supplier", lambda c: {"s_suppkey": f"s_suppkey + {c * strides['supp']}"}
        ),
        "part": copies(
            "part", lambda c: {"p_partkey": f"p_partkey + {c * strides['part']}"}
        ),
        "orders": copies(
            "orders",
            lambda c: {
                "o_orderkey": f"o_orderkey + {c * strides['order']}",
                "o_custkey": f"o_custkey + {c * strides['cust']}",
            },
        ),
        "lineitem": copies(
            "lineitem",
            lambda c: {
                "l_orderkey": f"l_orderkey + {c * strides['order']}",
                "l_partkey": f"l_partkey + {c * strides['part']}",
                "l_suppkey": f"l_suppkey + {c * strides['supp']}",
            },
        ),
        "events": copies(
            "events",
            lambda c: {
                "event_id": f"event_id + {c * strides['event']}",
                "user_id": f"user_id + {c * strides['user']}",
            },
        ),
        "documents": copies(
            "documents",
            lambda c: {
                "doc_id": f"doc_id + {c * strides['doc']}",
                "text": _mutate_text(c) if c else "text",
                "n_chars": f"length({_mutate_text(c)})" if c else "n_chars",
            },
        ),
        "embeddings": copies(
            "embeddings",
            lambda c: {
                "vec_id": f"vec_id + {c * strides['vec']}",
                "embedding": _permute_embedding(c),
            },
        ),
    }
    for name, df in plans.items():
        df.repartition(max(4, 4 * k)).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"wrote {name}")


def main() -> int:
    if len(sys.argv) != 4:
        print(__doc__)
        return 2
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    if os.path.realpath(out).startswith("/root/testdata"):
        print("refusing to write into /root/testdata (read-only contract)")
        return 2
    from kafka_streams_join_spark.session import get_spark

    amplify(get_spark("gen_scale"), src, out, k)
    return 0


if __name__ == "__main__":
    sys.exit(main())
