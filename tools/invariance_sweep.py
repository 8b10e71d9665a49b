#!/usr/bin/env python3
"""Execution-invariance sweep: every query, hashed under adversarial
session configs, asserting the results don't depend on physical
execution (VERDICT r9 #4).

The oracle gate re-runs queries under ONE fixed session; a result that
silently depends on partitioning — a ``first()`` without a
deterministic frame, an unordered ``limit``, a per-partition tie-break
— passes that gate forever and still breaks on a real cluster. This
sweep catches exactly that failure class: each config variant runs in
its OWN subprocess/JVM, computes a canonical hash per query at
sf0.01, and the driver asserts all variants hash identically to the
baseline.

Variants (each a full engine session with one knob forced):
  baseline   engine defaults (local[32], shuffle=32, AQE on)
  shuffle1   spark.sql.shuffle.partitions=1
  shuffle97  spark.sql.shuffle.partitions=97 (prime, > default)
  aqe_off    spark.sql.adaptive.enabled=false
  par3       local[3] + spark.default.parallelism=3 (input splits and
             scan parallelism change, not just the shuffle)

Hashing: columns sorted by name, rows sorted, floats kept EXACT —
double-sum reassociation across partitionings is real, so a mismatch
is re-checked under rtol=1e-9 and classified ``float-reassoc``
(reported, non-fatal: the engine's queries round their float outputs,
so exact mismatches indicate a boundary-riding value, not an ordering
bug) vs ``REAL`` (fatal: values genuinely differ).

Usage:
    python tools/invariance_sweep.py [query ...]      # driver (all 5)
    python tools/invariance_sweep.py --worker CFG --out F [query ...]

Writes INVARIANCE.json at the repo root in driver mode.
"""
from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                        "/root/testdata/sf0.01")

CONFIGS = ["baseline", "shuffle1", "shuffle97", "aqe_off", "par3"]


def _session(cfg: str):
    from detanalysis_spark.session import get_spark
    if cfg == "baseline":
        return get_spark("invariance-baseline")
    if cfg == "shuffle1":
        return get_spark("invariance-s1", shuffle_partitions=1)
    if cfg == "shuffle97":
        return get_spark("invariance-s97", shuffle_partitions=97)
    if cfg == "aqe_off":
        return get_spark("invariance-aqe-off",
                         **{"spark.sql.adaptive.enabled": "false"})
    if cfg == "par3":
        return get_spark("invariance-par3", master="local[3]",
                         **{"spark.default.parallelism": "3"})
    raise SystemExit(f"unknown config {cfg!r}")


def _canon(pdf) -> tuple[str, list]:
    """(exact hash, normalized rows) — columns sorted by name, rows
    sorted by string form, floats repr'd exactly."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        rows.append(tuple(
            repr(float(v)) if isinstance(v, float)
            else str(v) for v in tup))
    rows.sort()
    h = hashlib.sha256(
        ("\x1e".join("\x1f".join(r) for r in rows)).encode()
    ).hexdigest()
    return h, rows


def worker(cfg: str, out: str, names: list[str]) -> int:
    from detanalysis_spark import suite
    spark = _session(cfg)
    res: dict[str, dict] = {}
    for n in names:
        try:
            h, rows = _canon(suite.QUERIES[n](spark, SF_DIR).toPandas())
            res[n] = {"hash": h, "rows": rows}
        except Exception as e:      # noqa: BLE001 — recorded, not raised
            res[n] = {"err": f"{type(e).__name__}: {e}"[:300]}
    with open(out, "w") as f:
        json.dump(res, f)
    return 0


def _close(rows_a, rows_b, rtol: float = 1e-9) -> bool:
    """Tolerance re-check after sorting both row sets — classifies
    float-reassociation wobble vs a real mismatch."""
    if len(rows_a) != len(rows_b):
        return False
    for ra, rb in zip(rows_a, rows_b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if va == vb:
                continue
            try:
                fa, fb = float(va), float(vb)
            except ValueError:
                return False
            if abs(fa - fb) > rtol * max(abs(fa), abs(fb), 1e-300):
                return False
    return True


def main() -> int:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        cfg = sys.argv[i + 1]
        j = sys.argv.index("--out")
        out = sys.argv[j + 1]
        names = [a for a in sys.argv[1:]
                 if a not in ("--worker", cfg, "--out", out)]
        if not names:
            from detanalysis_spark import suite
            names = list(suite.QUERIES)
        return worker(cfg, out, names)

    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    outdir = "/tmp/detanalysis_invariance"
    os.makedirs(outdir, exist_ok=True)
    results: dict[str, dict] = {}
    for cfg in CONFIGS:
        out = os.path.join(outdir, f"{cfg}.json")
        cmd = [sys.executable, os.path.abspath(__file__),
               "--worker", cfg, "--out", out] + names
        print(f"[invariance] running {cfg} ...", file=sys.stderr)
        rc = subprocess.run(cmd, cwd=ROOT).returncode
        if rc != 0:
            print(f"[invariance] {cfg} worker failed rc={rc}",
                  file=sys.stderr)
            return 1
        with open(out) as f:
            results[cfg] = json.load(f)

    base = results["baseline"]
    report: dict[str, dict] = {}
    n_real = n_reassoc = 0
    for n in base:
        cell: dict[str, str] = {}
        for cfg in CONFIGS[1:]:
            r, b = results[cfg].get(n, {}), base[n]
            if "err" in b or "err" in r:
                cell[cfg] = "ERR:" + (b.get("err") or r.get("err", ""))[:120]
                n_real += 1
            elif r["hash"] == b["hash"]:
                cell[cfg] = "ok"
            elif _close(b["rows"], r["rows"]):
                cell[cfg] = "float-reassoc"
                n_reassoc += 1
            else:
                cell[cfg] = "REAL-MISMATCH"
                n_real += 1
        report[n] = cell
    summary = {
        "sf_dir": SF_DIR,
        "configs": CONFIGS,
        "n_queries": len(base),
        "cells": len(base) * (len(CONFIGS) - 1),
        "real_mismatches": n_real,
        "float_reassoc": n_reassoc,
        "report": report,
    }
    with open(os.path.join(ROOT, "INVARIANCE.json"), "w") as f:
        json.dump(summary, f, indent=1)
    bad = {n: c for n, c in report.items()
           if any(v not in ("ok", "float-reassoc") for v in c.values())}
    wobble = {n: c for n, c in report.items()
              if any(v == "float-reassoc" for v in c.values())}
    print(f"\n{summary['cells']} cells over {len(base)} queries: "
          f"{n_real} real mismatches, {n_reassoc} float-reassoc",
          file=sys.stderr)
    for n, c in sorted(bad.items()):
        print(f"  REAL {n}: {c}", file=sys.stderr)
    for n, c in sorted(wobble.items()):
        print(f"  wobble {n}: "
              f"{[k for k, v in c.items() if v == 'float-reassoc']}",
              file=sys.stderr)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "report"}))
    return 1 if n_real else 0


if __name__ == "__main__":
    raise SystemExit(main())
