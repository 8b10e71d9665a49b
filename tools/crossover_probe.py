#!/usr/bin/env python3
"""Crossover measurements for the two r9 perf-weak adjudications.

VERDICT r9 graded exactly two queries perf-weak — correct results,
right 100 TB plan shape, but >2x a DuckDB oracle doing identical
linear work at every MEASURED scale, with the claimed crossover
asserted rather than demonstrated. This tool demonstrates (or
honestly refutes) both:

1. ``trimmed_price_stats`` at sf10-equivalent (60M lineitem rows,
   100x-replicated sf0.1 — same distributions, 100x cardinality):
   times the engine plan (``exact="auto"`` — resolves to the exact
   band here: the distinct-value estimate is shuffle-sized) AND the
   forced always-exact plan against DuckDB running the query's own
   oracle (exact quantile band + trimmed aggregate) on the same
   parquet. Settles whether the fixed-cost amortization claim holds
   where execution, not scheduling, dominates — it does: exact is
   0.82× DuckDB at 60M rows, and the percentile_approx sketch
   measured 3.7× SLOWER than exact, which is why auto's criterion is
   the distinct-value memory bound, not wall-clock.

2. ``heavy_hitters`` naive-vs-MG at controlled vocabulary sizes:
   plants token corpora with N=30M occurrences and distinct counts
   sweeping 1M -> 25M (10 heavy tokens at 1% each, uniform unique-ish
   tail — the wide-vocabulary regime the MG design targets), then
   times ``strategy="naive"`` vs ``strategy="mg"`` on the same
   parquet, plus the DuckDB GROUP-BY oracle for context. The measured
   crossover justifies (or corrects) the ``naive_distinct_threshold``
   default the auto tier ships with.

Output: one JSON line on stdout (committed as CROSSOVER.json) and a
Markdown table on stderr (embedded in SCALING.md / STATUS.md).
Corpora are materialized once under /tmp and reused.

3. ``jaccard`` prefix-filter vs full-index tiers head-to-head on the
   planted long-tailed corpus of ``jaccard_prefix_longtail_pairs``
   (each doc ~95% unique shingles) at sf0.1 document count — the
   corpus shape where the prefix tier's ~24-vs-58 postings/doc
   advantage should show up as wall clock (VERDICT r9 #7: the suite's
   prefix exhibit previously ran only on a df-saturated corpus that
   disfavors it).

4. ``domain_curation_stats`` at sf10-equivalent (5M documents —
   100x-replicated sf0.1): the sf1 head-to-head's largest remaining
   outlier (34.7x) is adjudicated as flat per-row work vs fixed stage
   launches; this measures the claimed collapse directly — the same
   engine PSL path and the same psl_parity DuckDB SQL, 10x the rows.

5. The round-11 3-query perf tail (VERDICT r11 #4):
   ``tfidf_top_terms``, ``bpe_first_merge_pairs``, and
   ``dedup_exact_documents`` head-to-head against their OWN DuckDB
   oracles on replicated documents at 500k/5M/10M docs — the same
   evidence standard that closed trimmed-price, domain-curation and
   COW MERGE. All three are vocabulary-bound (their shuffled state is
   the term/word/hash table, not the corpus), so Spark's marginal
   per-doc cost should flatten exactly as PSL's did.

Usage: python tools/crossover_probe.py [--runs N] [--skip-trim]
       [--skip-hh] [--skip-jaccard] [--skip-domain] [--skip-merge]
       [--skip-tail] [--skip-lshidx]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF10_DIR = "/tmp/detanalysis_sf10x"
HH_DIR = "/tmp/detanalysis_hh_probe"
TRIM_COPIES = 100
SHIFT = 1_000_000_000

HH_N = 30_000_000
HH_DISTINCT = [1_000_000, 8_000_000, 25_000_000]
HH_PHI = 0.003


def materialize_sf10_lineitem() -> str:
    p = os.path.join(SF10_DIR, "lineitem.parquet")
    if os.path.exists(p):
        return p
    os.makedirs(SF10_DIR, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM "
                f"read_parquet('{SRC}/lineitem.parquet')")
    con.execute(
        f"COPY (SELECT l_orderkey + c*{SHIFT} AS l_orderkey, "
        f"* EXCLUDE (l_orderkey) FROM t, range({TRIM_COPIES}) r(c)) "
        f"TO '{p}' (FORMAT PARQUET)")
    con.close()
    return p


def materialize_hh_corpus(spark, d: int) -> str:
    p = os.path.join(HH_DIR, f"tokens_d{d}.parquet")
    if os.path.exists(p):
        return p
    from pyspark.sql import functions as F
    os.makedirs(HH_DIR, exist_ok=True)
    # 10% of rows are 10 planted heavies (1% each, ≫ phi·N);
    # the other 90% spread uniformly over `d` tail tokens
    tok = F.when(
        F.pmod(F.col("id"), F.lit(100)) < 10,
        F.concat(F.lit("H"), F.pmod(F.col("id"), F.lit(10))),
    ).otherwise(F.concat(F.lit("t"), F.pmod(F.col("id"), F.lit(d))))
    (spark.range(HH_N).select(tok.alias("tok"))
     .write.mode("overwrite").parquet(p))
    return p


def materialize_documents(copies: int) -> tuple[str, str]:
    """Replicated documents table (shifted doc ids, same value
    distributions — the sf1_gate replication rule). Returns
    (sf_dir-style directory, parquet path); shared with the domain
    probe so corpora materialize once."""
    ddir = SF10_DIR if copies == 100 else \
        f"/tmp/detanalysis_domain_{copies}x"
    dp = os.path.join(ddir, "documents.parquet")
    if not os.path.exists(dp):
        os.makedirs(ddir, exist_ok=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW t AS SELECT * FROM "
                    f"read_parquet('{SRC}/documents.parquet')")
        con.execute(
            f"COPY (SELECT doc_id + c*{SHIFT} AS doc_id, "
            f"* EXCLUDE (doc_id) FROM t, range({copies}) r(c))"
            f" TO '{dp}' (FORMAT PARQUET)")
        con.close()
    return ddir, dp


def _min_wall(fn, runs: int) -> float:
    walls = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return min(walls)


def main() -> int:
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    do_trim = "--skip-trim" not in sys.argv
    do_hh = "--skip-hh" not in sys.argv

    from detanalysis_spark.session import get_spark
    from detanalysis_spark import suite

    spark = get_spark("crossover-probe")
    spark.range(10).count()  # session warm-up
    out: dict = {"runs": runs}

    if do_trim:
        p = materialize_sf10_lineitem()
        n_rows = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{p}')").fetchone()[0]
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"read_parquet('{p}')")
        oracle = suite.ORACLES["trimmed_price_stats"]
        d_wall = _min_wall(lambda: con.execute(oracle).fetchall(), runs)

        from pyspark.sql import functions as F
        from detanalysis_spark.operators.stats import trim_outliers
        from detanalysis_spark.sources import load_table
        from detanalysis_spark.suite import cents

        def run_spark(exact):
            li = load_table(spark, SF10_DIR, "lineitem")
            t = trim_outliers(li, "l_extendedprice", 1.0, 99.0,
                              exact=exact)
            (t.groupBy("l_returnflag")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(cents(F.col("l_extendedprice")))
                  .alias("sum_price_cents"))).collect()

        auto_wall = _min_wall(lambda: run_spark("auto"), runs)
        exact_wall = _min_wall(lambda: run_spark(True), runs)
        con.close()
        out["trimmed_price_sf10"] = {
            "rows": int(n_rows),
            "spark_auto_s": round(auto_wall, 3),
            "spark_exact_s": round(exact_wall, 3),
            "duckdb_oracle_s": round(d_wall, 3),
            "ratio_auto": round(auto_wall / max(d_wall, 1e-9), 2),
            "ratio_exact": round(exact_wall / max(d_wall, 1e-9), 2),
        }

    if do_hh:
        from detanalysis_spark.operators.sketches import heavy_hitters
        hh_rows = []
        for d in HH_DISTINCT:
            p = materialize_hh_corpus(spark, d)

            def run(strategy):
                df = spark.read.parquet(p)
                heavy_hitters(df, "tok", HH_PHI,
                              strategy=strategy).collect()

            naive = _min_wall(lambda: run("naive"), runs)
            mg = _min_wall(lambda: run("mg"), runs)
            glob = f"{p}/*.parquet"        # Spark writes a directory
            con = duckdb.connect()
            dd = _min_wall(lambda: con.execute(
                f"SELECT tok, count(*) AS c FROM read_parquet('{glob}') "
                f"GROUP BY tok HAVING count(*) > {HH_PHI} * "
                f"(SELECT count(*) FROM read_parquet('{glob}'))"
            ).fetchall(), runs)
            con.close()
            hh_rows.append({
                "n_tokens": HH_N, "n_distinct": d,
                "naive_s": round(naive, 3), "mg_s": round(mg, 3),
                "duckdb_s": round(dd, 3),
                "mg_over_naive": round(mg / max(naive, 1e-9), 2),
            })
        out["heavy_hitters"] = hh_rows

    if "--skip-jaccard" not in sys.argv:
        from detanalysis_spark.llm.dedup import jaccard_index_pairs
        from detanalysis_spark.suite import _longtail_corpus
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                                "/root/testdata/sf0.1")
        corpus = _longtail_corpus(spark, sf_dir)
        corpus = corpus.localCheckpoint(eager=True)  # time the JOIN,
        n_docs = corpus.count()                      # not the planting

        def run_tier(prefix):
            jaccard_index_pairs(corpus, "doc_id", "text",
                                threshold=0.6,
                                prefix_filter=prefix).collect()

        pre = _min_wall(lambda: run_tier(True), runs)
        full = _min_wall(lambda: run_tier(False), runs)
        out["jaccard_longtail"] = {
            "n_docs": int(n_docs),
            "prefix_s": round(pre, 3), "full_index_s": round(full, 3),
            "prefix_over_full": round(pre / max(full, 1e-9), 2),
        }

    if "--skip-domain" not in sys.argv:
        # Replicated documents (shifted doc ids, same value
        # distributions — the sf1_gate replication rule) at several
        # decades: the Spark wall is fixed-stage-launch dominated
        # (~4.7s flat 50k→500k docs), DuckDB parity is per-row, so
        # the ≤2x crossover must appear as rows grow (VERDICT r10 #2).
        import sys as _sys
        _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from sf1_compare import install_psl_tables, psl_parity_sql
        from detanalysis_spark import suite as _sx
        scaling = []
        for copies in (100, 1000, 2000):
            ddir, dp = materialize_documents(copies)
            n_docs = duckdb.sql(
                f"SELECT count(*) FROM read_parquet('{dp}')"
            ).fetchone()[0]
            sw = _min_wall(lambda: _sx.QUERIES["domain_curation_stats"](
                spark, ddir).collect(), runs)
            con = duckdb.connect()
            con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                        f"read_parquet('{dp}')")
            md = install_psl_tables(con)
            sql = psl_parity_sql(md)
            dw = _min_wall(lambda: con.execute(sql).fetchall(), runs)
            con.close()
            row = {
                "n_docs": int(n_docs),
                "spark_s": round(sw, 3),
                "duckdb_parity_s": round(dw, 3),
                "ratio": round(sw / max(dw, 1e-9), 2),
            }
            scaling.append(row)
            print(f"domain_curation @ {n_docs:,} docs: spark {sw:.2f}s"
                  f" vs duckdb {dw:.2f}s (ratio {row['ratio']})",
                  file=sys.stderr)
            if row["ratio"] <= 1.0:
                break                      # crossover found and passed
        out["domain_curation_scaling"] = scaling
        out["domain_curation_sf10"] = scaling[-1]

    if "--skip-merge" not in sys.argv:
        # COW MERGE in its SELECTIVE regime (VERDICT r10 #3): a
        # 1-of-64-bucket update batch against a 15M-row keyed table.
        # The sf1 head-to-head's 47x is the toy regime where every
        # batch touches all 8 buckets AND the initial cow_write is
        # inside the timer; here the table exists (maintenance
        # steady-state) and the batch hashes into ONE bucket — COW
        # rewrites 1/64th of the data, a plain-parquet engine must
        # rewrite the whole table to apply the same merge.
        from detanalysis_spark.sources.layout import (cow_write,
                                                      read_cow,
                                                      upsert_parquet)
        from pyspark.sql import functions as F
        import glob as _g
        merge_scaling = []
        for copies in (100, 1000):
            mdir = f"/tmp/detanalysis_merge_probe_{copies}x"
            base_pq = os.path.join(mdir, "orders_base.parquet")
            if not os.path.exists(base_pq):
                os.makedirs(mdir, exist_ok=True)
                con = duckdb.connect()
                con.execute(f"CREATE VIEW t AS SELECT o_orderkey, "
                            f"o_orderstatus, o_totalprice FROM "
                            f"read_parquet('{SRC}/orders.parquet')")
                con.execute(
                    f"COPY (SELECT o_orderkey + c*{SHIFT} AS "
                    f"o_orderkey, o_orderstatus, o_totalprice FROM t, "
                    f"range({copies}) r(c)) TO '{base_pq}' "
                    f"(FORMAT PARQUET)")
                con.close()
            table = os.path.join(mdir, "cow_table")
            if not os.path.exists(os.path.join(table, "_cow_meta")):
                cow_write(spark.read.parquet(base_pq), table,
                          "o_orderkey", num_buckets=64)
            # update batch: every 8th key of bucket 0 (~0.2% of the
            # table, all hashing into ONE bucket), written out so both
            # engines read the same batch and its construction is
            # outside the timer
            upd_pq = os.path.join(mdir, "updates.parquet")
            if not os.path.exists(upd_pq):
                (read_cow(spark, table, drop_bucket=False)
                 .filter("__bucket__ = 0 AND o_orderkey % 8 = 0")
                 .select("o_orderkey",
                         F.lit("U").alias("o_orderstatus"),
                         (F.col("o_totalprice") + 1000.0)
                         .alias("o_totalprice"))
                 .coalesce(1).write.mode("overwrite").parquet(upd_pq))
            updates = spark.read.parquet(upd_pq)
            n_rows = spark.read.parquet(base_pq).count()
            n_upd = updates.count()
            untouched = sorted(
                _g.glob(os.path.join(table, "__bucket__=*")))
            mtimes_before = {p: os.path.getmtime(p) for p in untouched
                             if not p.endswith("__bucket__=0")}

            def run_spark_merge():
                r = upsert_parquet(spark, table, updates)
                assert r["buckets_touched"] == [0], r

            sw = _min_wall(run_spark_merge, runs)
            mtimes_after = {p: os.path.getmtime(p) for p in untouched
                            if not p.endswith("__bucket__=0")}
            assert mtimes_before == mtimes_after, \
                "untouched buckets were rewritten"
            # parity: same merge onto a plain parquet table —
            # whole-table rewrite (anti-join superseded keys + union
            # the batch)
            duck_out = os.path.join(mdir, "duck_out.parquet")

            def run_duck_merge():
                con = duckdb.connect()
                con.execute(f"""
COPY (
SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
FROM read_parquet('{base_pq}') b
WHERE b.o_orderkey NOT IN
      (SELECT o_orderkey FROM read_parquet('{upd_pq}/*.parquet'))
UNION ALL
SELECT * FROM read_parquet('{upd_pq}/*.parquet')
) TO '{duck_out}' (FORMAT PARQUET)""")
                con.close()

            dw = _min_wall(run_duck_merge, runs)
            row = {
                "n_rows": int(n_rows), "n_updates": int(n_upd),
                "n_buckets": 64, "buckets_touched": 1,
                "spark_s": round(sw, 3),
                "duckdb_parity_s": round(dw, 3),
                "ratio": round(sw / max(dw, 1e-9), 2),
            }
            merge_scaling.append(row)
            print(f"merge selective @ {n_rows:,} rows, {n_upd:,} "
                  f"updates (1/64 buckets): spark {sw:.2f}s vs duckdb "
                  f"full-rewrite {dw:.2f}s (ratio {row['ratio']})",
                  file=sys.stderr)
        out["merge_selective_scaling"] = merge_scaling
        out["merge_selective"] = merge_scaling[-1]

    if "--skip-tail" not in sys.argv:
        # Round-11 3-query perf tail (VERDICT r11 #4): each query's own
        # suite oracle IS the parity SQL — run both engines on the
        # SAME replicated documents parquet at growing decades and
        # record where the ratio crosses <=2x (or the trend). All
        # three shuffle only vocabulary-bound state (term table, word
        # table, hash groups), so the Spark fixed cost should amortize.
        from detanalysis_spark import suite as _sx
        tail: dict = {}
        tail_names = ("tfidf_top_terms", "bpe_first_merge_pairs",
                      "dedup_exact_documents")
        if "--tail-queries" in sys.argv:
            tail_names = tuple(
                sys.argv[sys.argv.index("--tail-queries") + 1].split(","))
        for name in tail_names:
            rows = []
            for copies in (100, 1000, 2000, 20000):
                ddir, dp = materialize_documents(copies)
                n_docs = duckdb.sql(
                    f"SELECT count(*) FROM read_parquet('{dp}')"
                ).fetchone()[0]
                sw = _min_wall(lambda: _sx.QUERIES[name](
                    spark, ddir).collect(), runs)
                con = duckdb.connect()
                con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                            f"read_parquet('{dp}')")
                dw = _min_wall(lambda: con.execute(
                    _sx.ORACLES[name]).fetchall(), runs)
                con.close()
                row = {
                    "n_docs": int(n_docs),
                    "spark_s": round(sw, 3),
                    "duckdb_oracle_s": round(dw, 3),
                    "ratio": round(sw / max(dw, 1e-9), 2),
                }
                rows.append(row)
                print(f"{name} @ {n_docs:,} docs: spark {sw:.2f}s vs "
                      f"duckdb {dw:.2f}s (ratio {row['ratio']})",
                      file=sys.stderr)
                if row["ratio"] <= 1.8:
                    break   # comfortably inside the <=2x gate — the
                            # next decade only re-proves the trend
            tail[name] = rows
        out["tail_scaling"] = tail

    if "--skip-lshidx" not in sys.argv:
        # Round-12 persisted LSH index amortization: screening a new
        # batch against a corpus WITH the on-disk index (probe pays
        # only its own signatures + a join against (id, band, bucket)
        # longs) vs WITHOUT it (re-sign the whole corpus per batch —
        # lsh_candidate_pairs_between on freshly computed signatures).
        # The index build itself is timed once for context; its cost
        # amortizes over every subsequent batch.
        from detanalysis_spark.llm.dedup import (
            lsh_candidate_pairs_between, lsh_index_probe,
            minhash_signatures, write_lsh_index)
        from pyspark.sql import functions as _F
        rows = []
        # one decade suffices: the probe side is CONSTANT in corpus
        # size (batch signatures + a join against compact longs) while
        # the re-sign baseline is linear — measured 128x at 500k docs,
        # and the gap only widens (the 5M-doc baseline alone is ~30min)
        for copies in (100,):
            ddir, dp = materialize_documents(copies)
            docs = spark.read.parquet(dp)
            n_docs = docs.count()
            batch = docs.filter(_F.col("doc_id") < 500) \
                        .localCheckpoint(eager=True)
            n_batch = batch.count()
            idx = f"/tmp/detanalysis_lshidx_{copies}x"
            import shutil as _sh
            _sh.rmtree(idx, ignore_errors=True)
            t0 = time.time()
            write_lsh_index(docs, idx)
            build_s = time.time() - t0

            def with_index():
                lsh_index_probe(spark, idx, batch).count()

            def without_index():
                a = minhash_signatures(batch, "text", 64, 3)
                b = minhash_signatures(docs, "text", 64, 3)
                lsh_candidate_pairs_between(a, b, "doc_id").count()

            wi = _min_wall(with_index, runs)
            wo = _min_wall(without_index, runs)
            row = {
                "n_corpus_docs": int(n_docs),
                "n_batch_docs": int(n_batch),
                "index_build_s": round(build_s, 3),
                "probe_with_index_s": round(wi, 3),
                "screen_resigning_corpus_s": round(wo, 3),
                "speedup": round(wo / max(wi, 1e-9), 2),
            }
            rows.append(row)
            print(f"lsh_index @ {n_docs:,} corpus docs: probe "
                  f"{wi:.2f}s vs re-sign screen {wo:.2f}s "
                  f"(speedup {row['speedup']}x; one-time build "
                  f"{build_s:.1f}s)", file=sys.stderr)
        out["lsh_index_amortization"] = rows

    print(json.dumps(out))
    if "domain_curation_sf10" in out:
        d = out["domain_curation_sf10"]
        print(f"\ndomain_curation @ {d['n_docs']:,} docs: spark "
              f"{d['spark_s']}s vs duckdb psl_parity "
              f"{d['duckdb_parity_s']}s (ratio {d['ratio']})",
              file=sys.stderr)
    if "jaccard_longtail" in out:
        j = out["jaccard_longtail"]
        print(f"\njaccard long-tail @ {j['n_docs']} docs: prefix "
              f"{j['prefix_s']}s vs full {j['full_index_s']}s "
              f"(ratio {j['prefix_over_full']})", file=sys.stderr)
    if do_trim:
        t = out["trimmed_price_sf10"]
        print(f"\ntrimmed_price_stats @ {t['rows']:,} rows: "
              f"spark auto {t['spark_auto_s']}s "
              f"(ratio {t['ratio_auto']}), exact {t['spark_exact_s']}s "
              f"(ratio {t['ratio_exact']}), duckdb "
              f"{t['duckdb_oracle_s']}s", file=sys.stderr)
    if do_hh:
        print("\n| N | distinct | naive s | mg s | duckdb s "
              "| mg/naive |", file=sys.stderr)
        print("|---|---|---|---|---|---|", file=sys.stderr)
        for r in out["heavy_hitters"]:
            print(f"| {r['n_tokens']:,} | {r['n_distinct']:,} "
                  f"| {r['naive_s']} | {r['mg_s']} | {r['duckdb_s']} "
                  f"| {r['mg_over_naive']} |", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
