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
        [sf_dir] [--compat-df1] [--stemmed]
Reads queries from stdin (one per line, blank line or EOF quits), so it
is scriptable: `echo "spark join" | python -m ...repl`.
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    compat = "--compat-df1" in argv
    stemmed = "--stemmed" in argv
    argv = [a for a in argv if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    from .plans.search import search, search_fidelity
    from .session import get_spark

    spark = get_spark("smse-repl")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"index: {sf_dir}  mode: "
          f"{'compat_df1' if compat else 'correct'}{' stemmed' if stemmed else ''}")
    print("query (1-2 words, blank to quit): ", end="", flush=True)
    for line in sys.stdin:
        q = line.strip()
        if not q:
            break
        if len(q.split()) > 2:
            print("! queries are 1-2 words (reference REPL constraint)")
        elif stemmed:
            _show(search_fidelity(spark, sf_dir, q))
        else:
            _show(search(spark, sf_dir, q,
                         df_mode="compat_df1" if compat else "correct"))
        print("query (1-2 words, blank to quit): ", end="", flush=True)
    return 0


def _show(df) -> None:
    rows = df.collect()
    if not rows:
        print("  (no hits)")
    for r in rows:
        print(f"  {r.rank:>2}. doc {r.docno:<8} score {r.score:.6f}")


if __name__ == "__main__":
    raise SystemExit(main())
