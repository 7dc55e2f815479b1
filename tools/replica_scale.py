"""Replica-scale the sf0.1 test tables 1x/3x/10x and time catalog
entries at each scale — the harness behind BASELINE.md's scale-
validation rows (r4/r5). Reusable next round; writes only to /tmp.

Replicas are isomorphic but content-disjoint so join/agg cardinalities
scale with the data instead of collapsing: documents get a per-replica
token-suffix vocabulary, embeddings get per-replica dimension
rotation, events get per-replica suffixed series keys and offset ids.

Usage:
    python tools/replica_scale.py                   # all default entries
    python tools/replica_scale.py name1 name2 ...   # specific entries
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/scale_r5_data"
SCALES = [1, 3, 10]

DEFAULT_ENTRIES = [
    "semdedup_trained",
    "semdedup_ann",
    "embed_near_dup",
    "dedup_clusters",
    "dup_spans",
    "corpus_shuffle",
    "quality_deciles",
    "image_ahash",
    # r9 wave-2 heavies (batch 28)
    "incremental_dedup",
    "simhash_near_pairs",
    # r10 (batch 30)
    "embed_decontaminate",
    "para_dedup",
    "quality_train",
    "quality_train_apply",
    "quality_train_eval",
    # r11 (batch 31)
    "hybrid_rrf",
    "quality_train_bigram",
    # r11 (batch 32)
    "hll_distinct",
    "cluster_balanced_sample",
    # r12 (batch 33)
    "lang_id_train",
    "lang_id_apply",
    "lang_id_eval",
    # r12 (batch 34)
    "quality_calibration",
    "tokenizer_fertility",
    "epoch_mix_plan",
]


def build_replicas() -> None:
    con = duckdb.connect()
    for s in SCALES:
        d = f"{OUT}/x{s}"
        os.makedirs(d, exist_ok=True)
        if not os.path.exists(f"{d}/documents.parquet"):
            reps = " UNION ALL ".join(
                f"""SELECT doc_id + {r * 10_000_000} AS doc_id,
                     array_to_string(list_transform(
                       list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
                       t -> t || '{"" if r == 0 else f"_r{r}"}'), ' ') AS text,
                     lang, source, n_chars
                     FROM read_parquet('{BASE}/documents.parquet')"""
                for r in range(s)
            )
            con.execute(f"COPY ({reps}) TO '{d}/documents.parquet' (FORMAT PARQUET)")
        if not os.path.exists(f"{d}/embeddings.parquet"):
            reps = " UNION ALL ".join(
                f"""SELECT vec_id + {r * 1_000_000} AS vec_id,
                     list_concat(embedding[{r % 64 + 1}:64], embedding[1:{r % 64}]) AS embedding
                     FROM read_parquet('{BASE}/embeddings.parquet')"""
                for r in range(s)
            )
            con.execute(f"COPY ({reps}) TO '{d}/embeddings.parquet' (FORMAT PARQUET)")
        # TPC-H family: fact/entity keys offset per replica so join and
        # agg cardinalities scale; nation/region stay fixed (they are
        # fixed-size dims at every TPC-H scale factor too).
        tpch_reps = {
            "lineitem": """SELECT l_orderkey + {o} AS l_orderkey,
                   l_partkey + {p} AS l_partkey, l_suppkey + {s} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate""",
            "orders": """SELECT o_orderkey + {o} AS o_orderkey,
                   o_custkey + {c} AS o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate, o_orderpriority""",
            "customer": """SELECT c_custkey + {c} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment""",
            "supplier": """SELECT s_suppkey + {s} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal""",
            "part": """SELECT p_partkey + {p} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice""",
            "nation": "SELECT *",
            "region": "SELECT *",
        }
        for tbl, sel in tpch_reps.items():
            if os.path.exists(f"{d}/{tbl}.parquet"):
                continue
            n_reps = 1 if tbl in ("nation", "region") else s
            reps = " UNION ALL ".join(
                sel.format(
                    o=r * 100_000_000,
                    c=r * 10_000_000,
                    s=r * 1_000_000,
                    p=r * 10_000_000,
                )
                + f" FROM read_parquet('{BASE}/{tbl}.parquet')"
                for r in range(n_reps)
            )
            con.execute(f"COPY ({reps}) TO '{d}/{tbl}.parquet' (FORMAT PARQUET)")
        if not os.path.exists(f"{d}/events.parquet"):
            reps = " UNION ALL ".join(
                f"""SELECT event_id + {r * 10_000_000} AS event_id, ts,
                     user_id + {r * 100_000} AS user_id,
                     event_type || '{"" if r == 0 else f"_r{r}"}' AS event_type,
                     value, props
                     FROM read_parquet('{BASE}/events.parquet')"""
                for r in range(s)
            )
            con.execute(f"COPY ({reps}) TO '{d}/events.parquet' (FORMAT PARQUET)")
        print(f"x{s} ready", flush=True)


def main() -> None:
    names = sys.argv[1:] or DEFAULT_ENTRIES
    build_replicas()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from wq_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="replica-scale")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    q = entry.queries()
    # warm the JVM so the first entry doesn't absorb start-up cost
    spark.read.parquet(f"{OUT}/x1/documents.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        ts: list[float] = []
        for s in SCALES:
            t0 = time.time()
            q[name](spark, f"{OUT}/x{s}").write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.time() - t0)
            print(f"{name} x{s}: {ts[-1]:.1f}s", flush=True)
        xs = [math.log(s) for s in SCALES]
        ys = [math.log(t) for t in ts]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        print(
            f"== {name}: {'/'.join(f'{t:.1f}' for t in ts)} s  exponent={slope:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
