#!/usr/bin/env python
"""pdf2doi-style CLI over a folder (or parquet table) of web documents.

Mirrors the reference's command-line surface (reference ``main.py:244-377``)
for everything that exists offline:

    python cli.py <target> [-s FILENAME] [-no_arxiv2doi] [-google N]...

- ``target``: a directory of raw ``*.html`` files (reference: folder of
  PDFs, ``main.py:60-82``) or a parquet pages table.
- ``-s/--save``: write the fixed-width identifier report to a file
  (reference ``save_identifiers``, ``main.py:192-227``).
- ``-no_arxiv2doi``: keep arXiv IDs instead of rewriting to DOIs
  (reference flag at ``main.py:355``).
- web flags (``-nwv``, ``-nws``) are accepted for drop-in compatibility
  but are no-ops: the engine is permanently offline (no executor egress),
  which equals the reference run with both flags set.

Prints the reference's stdout table: ``{:<15s} {:<40s} {:<10s}`` with
``n.a.`` placeholders (reference ``main.py:366-372``).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Find identifiers (DOI/arXiv) of web documents, distributed."
    )
    ap.add_argument("target", help="directory of *.html files, or a parquet pages table")
    ap.add_argument("-s", "--save", default=None, metavar="FILENAME",
                    help="save report (fixed-width rows) to this file")
    ap.add_argument("-no_arxiv2doi", action="store_true",
                    help="do not replace arXiv IDs with synthetic DOIs")
    ap.add_argument("-nwv", action="store_true", help="(no-op: always offline)")
    ap.add_argument("-nws", action="store_true", help="(no-op: always offline)")
    ap.add_argument("--glob", default="*.html", help="raw-file glob (default *.html)")
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args()

    from pdf2doi_spark.session import build_session
    from pdf2doi_spark.operators.extract import extract_identifiers, format_report
    from pdf2doi_spark.sources.io import read_pages, read_raw_files

    spark = build_session(master=args.master, app_name="pdf2doi-cli")
    try:
        if os.path.isdir(args.target) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(args.target)
        ):
            pages = read_pages(spark, args.target)
        elif os.path.isdir(args.target):
            pages = read_raw_files(spark, args.target, glob=args.glob)
        else:
            pages = read_pages(spark, args.target)

        results = extract_identifiers(
            pages, replace_arxiv=not args.no_arxiv2doi, with_text=False
        )
        lines = [r["report_line"] for r in format_report(results).collect()]
        for line in lines:
            print(line)
        if args.save:
            with open(args.save, "w") as fh:
                fh.write("\n".join(lines) + "\n")
            print(f"saved {len(lines)} rows -> {args.save}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
