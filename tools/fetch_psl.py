#!/usr/bin/env python3
"""Download the complete Public Suffix List and install it as the
engine's default rule set.

Writes ``detanalysis_spark/llm/data/public_suffix_list.dat``, which
``detanalysis_spark.llm.psl.default_psl()`` prefers over the vendored
snapshot (resolution order: ``$DETANALYSIS_PSL_PATH`` → installed full
list → snapshot — see ``psl.psl_source()``).

Run once per deployment (the list is ~240 KB and changes slowly;
publicsuffix.org asks consumers to refresh no more than daily):

    python tools/fetch_psl.py [--url URL] [--dest PATH]

Offline environments: download ``public_suffix_list.dat`` from
https://publicsuffix.org/list/ on any networked machine and either
drop it at the destination path or export ``DETANALYSIS_PSL_PATH``.

The installed file is validated before it replaces anything: it must
parse under the PSL grammar with ≥ 5,000 exact rules and contain the
ICANN/private section markers — a truncated or error-page download
never clobbers a working rule set.
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile

DEFAULT_URL = "https://publicsuffix.org/list/public_suffix_list.dat"
DEST = os.path.join(os.path.dirname(__file__), "..",
                    "detanalysis_spark", "llm", "data",
                    "public_suffix_list.dat")
MIN_EXACT_RULES = 5_000


def validate(path: str) -> int:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from detanalysis_spark.llm.psl import load_psl
    text = open(path, encoding="utf-8").read()
    for marker in ("===BEGIN ICANN DOMAINS===",
                   "===BEGIN PRIVATE DOMAINS==="):
        if marker not in text:
            raise SystemExit(f"downloaded file lacks '{marker}' — "
                             "not the real list (error page?)")
    rules = load_psl(path)
    n = len(rules.exact)
    if n < MIN_EXACT_RULES:
        raise SystemExit(
            f"downloaded file parses to only {n} exact rules "
            f"(< {MIN_EXACT_RULES}) — truncated download?")
    return n


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--url", default=DEFAULT_URL)
    ap.add_argument("--dest", default=os.path.normpath(DEST))
    ap.add_argument("--from-file", default=None,
                    help="install a pre-downloaded copy instead of "
                         "fetching (for air-gapped deployments)")
    args = ap.parse_args()

    if args.from_file:
        tmp = args.from_file
    else:
        import urllib.request
        fd, tmp = tempfile.mkstemp(suffix=".dat")
        os.close(fd)
        print(f"fetching {args.url} ...", file=sys.stderr)
        with urllib.request.urlopen(args.url, timeout=60) as r, \
                open(tmp, "wb") as f:
            f.write(r.read())

    n = validate(tmp)
    os.makedirs(os.path.dirname(args.dest), exist_ok=True)
    os.replace(tmp, args.dest) if not args.from_file else \
        __import__("shutil").copyfile(tmp, args.dest)
    print(f"installed {args.dest} ({n} exact rules); default_psl() "
          "now resolves to the complete list")


if __name__ == "__main__":
    main()
