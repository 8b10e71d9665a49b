#!/usr/bin/env python3
"""sf1 Spark-vs-DuckDB head-to-head for the heavy query families.

VERDICT r8 task 1: the toy-scale (sf0.1) bench excused several >2x
Spark/DuckDB ratios as "fixed Spark job cost, amortizes at scale" on
`exec_only` evidence alone. This tool settles it by timing both
engines at the sf1-equivalent corpus (`tools/sf1_gate.py`
materializes ~6M lineitem / 1M events / 50k documents under
/tmp/detanalysis_sf1x): Spark runs the engine plan, DuckDB runs
either the query's own oracle SQL (when the oracle does the same
work, linearly) or a FAIR ALGORITHM-PARITY implementation written for
this comparison:

- ``domain_curation_stats``: the correctness oracle replays a planted
  arithmetic construction (no suffix matching at all, ~20 ms), so the
  fair side implements the SAME PSL algorithm in DuckDB — per-depth
  candidate suffixes probed against the engine's own rule tables,
  exception/longest-match precedence, then the blocklist + profile
  aggregate.
- ``near_dup_pairs_minhash``: the correctness oracle is deliberately
  all-pairs exact Jaccard (O(n^2) — hours at 50k docs), so the fair
  side implements the SAME banded MinHash LSH in DuckDB (64
  signatures over 3-gram shingles with DuckDB's own hash(), 16x4
  banding, bucket self-join, exact Jaccard on candidates only). Hash
  families differ so candidate sets differ at the margin; the WORK
  SHAPE — sign, band, bucket-join, verify — is identical.

Output: one JSON line (stdout) + a Markdown table (stderr). The six
core families the verdict named are flagged ``core`` and their median
ratio is the headline number; STATUS.md embeds the committed table.

Usage: python tools/sf1_compare.py [--runs N]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/detanalysis_sf1x")

# (query, core?, duckdb implementation key)
FAMILIES = [
    ("curated_corpus_exact_stats", True, "oracle"),
    ("span_dedup_stats", True, "oracle"),
    ("trimmed_price_stats", True, "oracle"),
    ("training_pipeline_stats", True, "oracle"),
    ("domain_curation_stats", True, "psl_parity"),
    ("near_dup_pairs_minhash", True, "lsh_parity"),
    # context rows (not in the verdict's core six)
    ("heavy_hitter_tokens", False, "oracle"),
    ("upsert_merge_stats", False, "merge_parity"),
    ("language_id_counts", False, "oracle"),
    ("text_quality_by_source", False, "oracle"),
    ("tfidf_top_terms", False, "oracle"),
    ("bpe_first_merge_pairs", False, "oracle"),
    ("sequence_packing_stats", False, "oracle"),
    ("dedup_exact_documents", False, "oracle"),
]

LSH_PARITY_SQL = r"""
WITH t AS (
  SELECT doc_id, list_distinct([array_to_string(toks[i:i+3], ' ')
                                for i in range(1, len(toks)-2)]) AS sh
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '') AS toks
        FROM documents)),
sig AS (
  SELECT doc_id, sh,
         list_transform(range(64), i -> list_min(
             list_transform(sh, s -> hash(s || '#' || i)))) AS mh
  FROM t WHERE len(sh) > 0),
bb AS (
  SELECT doc_id, b,
         hash(array_to_string(mh[b*4+1:b*4+4], ',')) AS bucket
  FROM sig, range(16) r(b)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bb a JOIN bb b ON a.b = b.b AND a.bucket = b.bucket
                      AND a.doc_id < b.doc_id),
j AS (
  SELECT id_a, id_b,
         len(list_intersect(ta.sh, tb.sh))::DOUBLE /
         len(list_distinct(list_concat(ta.sh, tb.sh))) AS jaccard
  FROM cand JOIN t ta ON ta.doc_id = id_a
            JOIN t tb ON tb.doc_id = id_b)
SELECT id_a, id_b, round(jaccard, 6) AS jaccard
FROM j WHERE jaccard >= 0.5
"""


def install_psl_tables(con) -> int:
    """The engine's own rule tables, loaded into DuckDB per depth —
    the same broadcast-probe shape the Spark matcher uses."""
    from detanalysis_spark.llm.psl import default_psl
    rules = default_psl()
    merged: dict[int, dict[str, list[bool]]] = {}

    def put(s, d, kind):
        ent = merged.setdefault(d, {}).setdefault(s, [False] * 3)
        ent[kind] = True

    for s in rules.exact:
        d = s.count(".") + 1
        if d > 1:
            put(s, d, 0)
    for s in rules.wildcard:
        put(s, s.count(".") + 1, 1)
    for s in rules.exception:
        put(s, s.count(".") + 1, 2)
    for d, tbl in merged.items():
        con.execute(f"CREATE TEMP TABLE psl_d{d} "
                    "(s VARCHAR, e BOOLEAN, w BOOLEAN, x BOOLEAN)")
        con.executemany(
            f"INSERT INTO psl_d{d} VALUES (?, ?, ?, ?)",
            [(s, *fl) for s, fl in tbl.items()])
    return max(merged)


def psl_parity_sql(max_depth: int) -> str:
    """Same construction + same PSL algorithm as domain_curation_stats,
    in SQL: per-depth candidate suffix probes against the rule tables,
    exception > longest-match > implicit-'*' precedence, then the
    blocklist filter and the domain profile aggregate."""
    cand_cols, joins, depth_terms, exc_terms = [], [], ["1"], []
    for d in range(2, max_depth + 1):
        cand_cols.append(
            f"CASE WHEN n >= {d} THEN "
            f"array_to_string(parts[n-{d}+1:n], '.') END AS c{d}")
        joins.append(f"LEFT JOIN psl_d{d} r{d} ON hp.c{d} = r{d}.s")
        depth_terms.append(
            f"CASE WHEN coalesce(r{d}.e, false) THEN {d} ELSE 1 END")
        depth_terms.append(
            f"CASE WHEN coalesce(r{d}.w, false) AND n >= {d}+1 "
            f"THEN {d}+1 ELSE 1 END")
        exc_terms.append(
            f"WHEN coalesce(r{d}.x, false) THEN {d}-1")
    exc = (" CASE " + " ".join(reversed(exc_terms))
           + " ELSE greatest(" + ", ".join(depth_terms) + ") END")
    return f"""
WITH u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) || source ||
         (CASE WHEN doc_id % 5 = 0 THEN '.co.uk' ELSE '.com' END) AS host
  FROM documents),
hp AS (
  SELECT doc_id, host, string_split(host, '.') AS parts,
         len(string_split(host, '.')) AS n,
         {', '.join(cand_cols)}
  FROM u),
m AS (
  SELECT hp.doc_id, hp.host, hp.parts, hp.n, {exc} AS ps_depth
  FROM hp {' '.join(joins)}),
reg AS (
  SELECT doc_id, host,
         CASE WHEN n > ps_depth
              THEN array_to_string(parts[n-ps_depth:n], '.') END AS domain
  FROM m),
f AS (SELECT * FROM reg
      WHERE domain NOT IN ('src0.co.uk', 'src1.com')),
g AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
      FROM f GROUP BY domain)
SELECT domain, n_docs, n_hosts,
       round(n_docs / (SELECT sum(n_docs) FROM g), 6) AS share
FROM g
"""


# VERDICT r9 #9: upsert_merge_stats is priced against a DuckDB doing
# COMPARABLE I/O — the engine query builds the COW table (full write)
# and MERGE-rewrites the touched buckets (second write); the parity
# side materializes the base table to parquet and then writes the
# merged table to parquet (';;'-separated statements, run in order),
# instead of replaying the merge as a logical CTE with no write cost.
MERGE_PARITY_SQL = """
COPY (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
TO '{tmp}/duck_merge_base.parquet' (FORMAT PARQUET)
;;
COPY (
WITH upd AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice
  FROM read_parquet('{tmp}/duck_merge_base.parquet')
  WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey + 10000000, 'N', o_totalprice
  FROM read_parquet('{tmp}/duck_merge_base.parquet')
  WHERE o_orderkey % 100 = 7)
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM read_parquet('{tmp}/duck_merge_base.parquet')
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
UNION ALL SELECT * FROM upd
) TO '{tmp}/duck_merge_out.parquet' (FORMAT PARQUET)
;;
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM read_parquet('{tmp}/duck_merge_out.parquet')
GROUP BY o_orderstatus
"""


def main() -> int:
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    if not os.path.exists(os.path.join(SF1_DIR, "documents.parquet")):
        print(f"materialize the corpus first: python tools/sf1_gate.py "
              f"(expected {SF1_DIR})", file=sys.stderr)
        return 1

    from detanalysis_spark.session import get_spark
    from detanalysis_spark import suite
    from detanalysis_spark.sources.tables import TABLES

    spark = get_spark("sf1-compare")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF1_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{p}')")
    max_depth = install_psl_tables(con)
    import tempfile
    merge_tmp = tempfile.mkdtemp(prefix="duck_merge_")
    duck_sql = {
        "psl_parity": psl_parity_sql(max_depth),
        "lsh_parity": LSH_PARITY_SQL,
        "merge_parity": MERGE_PARITY_SQL.format(tmp=merge_tmp),
    }

    # warm both engines
    suite.QUERIES["flagship_event_cut_stats"](spark, SF1_DIR).collect()
    con.execute(suite.ORACLES["flagship_event_cut_stats"]).fetchall()

    rows = []
    for name, core, impl in FAMILIES:
        st, dt = [], []
        sql = duck_sql.get(impl) or suite.ORACLES[name]
        for _ in range(runs):
            t0 = time.time()
            suite.QUERIES[name](spark, SF1_DIR).collect()
            st.append(time.time() - t0)
            t0 = time.time()
            for stmt in sql.split(";;"):
                con.execute(stmt).fetchall()
            dt.append(time.time() - t0)
        s, d = min(st), min(dt)
        rows.append({"query": name, "core": core, "duckdb_impl": impl,
                     "spark_s": round(s, 3), "duckdb_s": round(d, 3),
                     "ratio": round(s / max(d, 1e-9), 2)})

    core_ratios = sorted(r["ratio"] for r in rows if r["core"])
    out = {
        "sf_dir": SF1_DIR,
        "runs": runs,
        "core_median_ratio": round(
            statistics.median(core_ratios), 2),
        "rows": rows,
    }
    print(json.dumps(out))
    print("\n| query | core | duckdb impl | spark s | duckdb s "
          "| spark/duckdb |", file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['query']} | {'y' if r['core'] else ''} "
              f"| {r['duckdb_impl']} | {r['spark_s']} | {r['duckdb_s']} "
              f"| {r['ratio']} |", file=sys.stderr)
    print(f"\ncore-six median ratio: {out['core_median_ratio']}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
