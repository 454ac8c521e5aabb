#!/usr/bin/env python3
"""Synthesize a 10x row-scaled corpus from an sf dir — the THIRD
scaling decade (round 16): the sf0.001/0.01/0.1 sweep's fitted alphas
are overhead-dominated (0.01-0.35), so a super-linear term could hide
inside the per-query constant; one more decade gives the exponents
dynamic range where data actually dominates.

Scaled tables (key-remapped so copies never collide):
 - documents: 10 copies; copies 1-9 get every token suffixed with the
   copy index. Distinct vocabulary per copy means NO artificial
   cross-copy exact/near-duplicates (verbatim copies would explode
   dedup pair counts quadratically into a pathology a natural 10x
   corpus does not have) and Heaps-style vocabulary growth, which is
   what a larger real corpus does to the lexical/BPE families.
 - embeddings: 10 copies; copy i's vector is rotated by i dimensions.
   A rotation of an isotropic random vector points in an (almost)
   independent direction, so copies do not form artificial exact-dup
   cosine clusters that would distort ANN/embedding-dedup timings.
 - lineitem + orders: 10 copies with orderkey remapped; dimension keys
   untouched, so dim joins fan out 10x naturally.
Everything else (dims, events) is symlinked unscaled — the swept
families do not read them at scale. events in particular must NOT be
rewritten: its TIMESTAMP(NANOS) column only round-trips through
graft.Tables.

Usage: python3 scripts/make_scaled_corpus.py /root/testdata/sf0.1 /tmp/graft_sf1 [copies]
"""
import os
import sys

import duckdb


def main():
    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def copy_sql(table, select_for_copy):
        parts = " UNION ALL ".join(select_for_copy(i) for i in range(copies))
        con.execute(
            f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n_src = con.execute(
            f"SELECT count(*) FROM '{src}/{table}.parquet'").fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        assert n_dst == copies * n_src, (table, n_src, n_dst)
        print(f"  {table}: {n_src} -> {n_dst} rows")

    doc_stride = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'").fetchone()[0]
    bs = "\\"  # f-string expressions cannot contain a backslash literal
    copy_sql("documents", lambda i: f"""
        SELECT doc_id + {i * doc_stride} AS doc_id,
               {"text" if i == 0 else
                f"regexp_replace(text, '({bs}S+)', '{bs}1x{i}', 'g')"} AS text,
               lang, source, n_chars
        FROM '{src}/documents.parquet'""")

    vec_stride = con.execute(
        f"SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'").fetchone()[0]
    copy_sql("embeddings", lambda i: f"""
        SELECT vec_id + {i * vec_stride} AS vec_id,
               {"embedding" if i == 0 else
                f"list_concat(embedding[{i + 1}:], embedding[1:{i}])"} AS embedding,
               label
        FROM '{src}/embeddings.parquet'""")

    ok_stride = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'").fetchone()[0]
    copy_sql("orders", lambda i: f"""
        SELECT o_orderkey + {i * ok_stride} AS o_orderkey,
               o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               o_orderpriority
        FROM '{src}/orders.parquet'""")
    copy_sql("lineitem", lambda i: f"""
        SELECT l_orderkey + {i * ok_stride} AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet'""")

    for t in ["region", "nation", "customer", "supplier", "part", "events"]:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)
        print(f"  {t}: symlinked unscaled")


if __name__ == "__main__":
    main()
