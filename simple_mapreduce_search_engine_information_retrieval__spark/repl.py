"""Interactive query REPL — the engine's twin of the reference's
IntDocVectorsForwardIndex main loop (IntDocVectorsForwardIndex.java:
243-322): type 1-2 words, get the top-10 (docid, score) hits.

Differences from the reference, on purpose:
- >2-word queries print a warning instead of TERMINATING the loop
  (reference :319 exits on 3+ words — P4);
- ties rank deterministically (score desc, docno asc);
- df is correct by default; pass --compat-df1 for reference-bug scores.

Usage:
    python -m simple_mapreduce_search_engine_information_retrieval__spark.repl \
        [sf_dir] [--compat-df1] [--stemmed] [--no-docids]
Reads queries from stdin (one per line, blank line or EOF quits), so it
is scriptable: `echo "spark join" | python -m ...repl`.
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None, out=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out or sys.stdout
    compat = "--compat-df1" in argv
    stemmed = "--stemmed" in argv
    docids = "--no-docids" not in argv
    argv = [a for a in argv if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    from .plans.search import search, search_fidelity, search_with_docids
    from .session import get_spark

    spark = get_spark("smse-repl")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"index: {sf_dir}  mode: "
          f"{'compat_df1' if compat else 'correct'}{' stemmed' if stemmed else ''}",
          file=out)
    prompt = "query (1-2 words, blank to quit): "
    print(prompt, end="", flush=True, file=out)
    for line in sys.stdin:
        q = line.strip()
        if not q:
            break
        if len(q.split()) > 2:
            print("! queries are 1-2 words (reference REPL constraint)", file=out)
        elif stemmed:
            _show(search_fidelity(spark, sf_dir, q), out)
        elif docids:
            # the reference's display shape: docid via the J3 broadcast
            # mapping join (IntDocVectorsForwardIndex.java:310-312)
            _show(search_with_docids(
                spark, sf_dir, q, df_mode="compat_df1" if compat else "correct"
            ), out)
        else:
            _show(search(spark, sf_dir, q,
                         df_mode="compat_df1" if compat else "correct"), out)
        print(prompt, end="", flush=True, file=out)
    return 0


def _show(df, out) -> None:
    rows = df.collect()
    if not rows:
        print("  (no hits)", file=out)
    rows = sorted(rows, key=lambda r: r.rank)
    for r in rows:
        docid = f" [{r.docid}]" if "docid" in df.columns else ""
        print(f"  {r.rank:>2}. doc {r.docno:<8}{docid} score {r.score:.6f}",
              file=out)


if __name__ == "__main__":
    raise SystemExit(main())
