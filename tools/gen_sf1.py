#!/usr/bin/env python3
"""Generate an SF1-equivalent TPC-H-ish dataset from the sf0.1 fixtures.

Replicates each sf0.1 table N times (default 10) with per-copy key offsets so
pk/fk relationships stay consistent: copy i shifts every orderkey by
i*OK, custkey by i*CK, partkey by i*PK, suppkey by i*SK. Dates, prices and
dimension text are unchanged, so per-row selectivities match the originals and
aggregates scale ~N x.  nation/region are fixed-size and copied as-is.

Output layout mirrors /root/testdata/sf*/: <out>/<table>.parquet, written as a
DIRECTORY of ~16 files per big table so a Spark scan parallelizes.

Usage: python3 tools/gen_sf1.py [outdir] [N]
"""
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    os.makedirs(out, exist_ok=True)

    def mx(table, col):
        return con.execute(f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]

    ok, ck = mx("orders", "o_orderkey"), mx("customer", "c_custkey")
    pk, sk = mx("part", "p_partkey"), mx("supplier", "s_suppkey")

    # Write each table as a DIRECTORY of one file per copy-chunk. Row groups,
    # not byte-split ranges, bound Spark's parquet read parallelism — the old
    # single-file layout (PER_THREAD_OUTPUT collapses to one file because the
    # unnest(range) cross join runs single-threaded) capped SF1 scans at 6
    # tasks. But groups that are too SMALL tax the read path: 250k-row groups
    # (256 groups at SF10) measured 2x slower than 1M-row groups (96 groups)
    # on the same 6-query bench. Target ~64 groups/table, clamped to
    # [250k, 1M] rows/group — hits the measured optimum at both SF1 and SF10.
    def write(table, sql, threads=True):
        dst = f"{out}/{table}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        os.makedirs(dst)
        chunks = min(n, 32)
        src_rows = con.execute(
            f"SELECT count(*) FROM '{SRC}/{table}.parquet'").fetchone()[0]
        rg = min(1_000_000, max(250_000, src_rows * n // 64))
        opts = f"FORMAT PARQUET, ROW_GROUP_SIZE {rg}"
        for c in range(chunks):
            lo, hi = c * n // chunks, (c + 1) * n // chunks
            chunk_rep = (f"(SELECT unnest(range({lo}, {hi})) AS i) copies")
            con.execute(f"COPY ({sql.replace(REP, chunk_rep)}) "
                        f"TO '{dst}/chunk_{c:02d}.parquet' ({opts})")
        rows = con.execute(f"SELECT count(*) FROM '{dst}/*.parquet'").fetchone()[0]
        print(f"{table}: {rows} rows -> {dst} ({chunks} files)")

    REP = "__REP__"
    rep = REP
    write("lineitem", f"""
        SELECT l_orderkey + i*{ok} AS l_orderkey, l_partkey + i*{pk} AS l_partkey,
               l_suppkey + i*{sk} AS l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate
        FROM '{SRC}/lineitem.parquet', {rep}""")
    write("orders", f"""
        SELECT o_orderkey + i*{ok} AS o_orderkey, o_custkey + i*{ck} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', {rep}""")
    write("customer", f"""
        SELECT c_custkey + i*{ck} AS c_custkey, c_name, c_nationkey, c_acctbal,
               c_mktsegment
        FROM '{SRC}/customer.parquet', {rep}""")
    write("supplier", f"""
        SELECT s_suppkey + i*{sk} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', {rep}""")
    write("part", f"""
        SELECT p_partkey + i*{pk} AS p_partkey, p_name, p_brand, p_type, p_size,
               p_retailprice
        FROM '{SRC}/part.parquet', {rep}""")
    dk = mx("documents", "doc_id")
    vk = mx("embeddings", "vec_id")
    # Perturb each copy's text with a copy-tag word so copies are NEAR-dups
    # (one extra shingle), not byte-dups — the realistic shape for dedup ops.
    write("documents", f"""
        SELECT doc_id + i*{dk} AS doc_id,
               'c' || i || ' ' || text AS text, lang, source,
               n_chars + 3 + len(CAST(i AS VARCHAR)) AS n_chars
        FROM '{SRC}/documents.parquet', {rep}""")
    write("embeddings", f"""
        SELECT vec_id + i*{vk} AS vec_id, embedding, label
        FROM '{SRC}/embeddings.parquet', {rep}""")
    # events: shift ids per copy; keep ts untouched so time-bucketed
    # aggregations grow in GROUP SIZE (same buckets, N x rows) while the
    # user x minute matrix grows in CELL COUNT (new users per copy) — both
    # scale axes of the ClickBench-shaped workloads.
    ek = mx("events", "event_id")
    uk = mx("events", "user_id")
    write("events", f"""
        SELECT event_id + i*{ek} AS event_id, ts,
               user_id + i*{uk} AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet', {rep}""")
    # partsupp: real TPC-H volume (4 suppliers/part — 800k rows at SF1, the
    # reference's actual q2/q11/q16/q20 input) derived deterministically from
    # the GENERATED part x supplier with the exact formula graft.Tables
    # derives when the file is absent, so file mode == derived mode and the
    # DuckDB oracle (which always derives) checks both.
    ps_dst = f"{out}/partsupp.parquet"
    if os.path.isdir(ps_dst):
        shutil.rmtree(ps_dst)
    elif os.path.exists(ps_dst):
        os.remove(ps_dst)
    os.makedirs(ps_dst)
    ps_files = 8
    for c in range(ps_files):
        con.execute(f"""
            COPY (
              WITH supp AS (
                SELECT s_suppkey FROM '{out}/supplier.parquet/*.parquet'),
              snum AS (
                SELECT s_suppkey, row_number() OVER (ORDER BY s_suppkey) AS rn,
                       (SELECT count(*) FROM supp) AS scnt
                FROM supp)
              SELECT p_partkey AS ps_partkey, sn.s_suppkey AS ps_suppkey,
                     CAST((p_partkey*31 + seq.i*17) % 9999 + 1 AS INT)
                       AS ps_availqty,
                     CAST(((p_partkey*53 + seq.i*29) % 100000 + 100) / 100.0
                          AS DECIMAL(12,2)) AS ps_supplycost
              FROM '{out}/part.parquet/*.parquet'
              CROSS JOIN (VALUES (0),(1),(2),(3)) seq(i)
              JOIN snum sn ON sn.rn = (p_partkey*7 + seq.i*13) % sn.scnt + 1
              WHERE p_partkey % {ps_files} = {c}
              ORDER BY ps_partkey
            ) TO '{ps_dst}/chunk_{c:02d}.parquet'
              (FORMAT PARQUET, ROW_GROUP_SIZE 250000)""")
    ps_rows = con.execute(
        f"SELECT count(*) FROM '{ps_dst}/*.parquet'").fetchone()[0]
    print(f"partsupp: {ps_rows} rows -> {ps_dst} ({ps_files} files)")

    for small in ("nation", "region"):
        dst = f"{out}/{small}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copyfile(f"{SRC}/{small}.parquet", dst)
        print(f"{small}: copied")


if __name__ == "__main__":
    main()
