"""Regenerate QUERIES.md — the driver-contract query inventory.

Run: python tools/gen_queries_md.py > QUERIES.md
(Ray auto-inits when queries() builds lazy datasets is NOT triggered:
only the registry dict and docstrings are touched.)
"""

import importlib.util
import inspect
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "_ray_entry_doc", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q = m.queries()
    o = set(m.oracle_sql())

    def summary(fn) -> str:
        # unwrap functools.partial chains so shape-bound registrations
        # (api_predictions_azure/google) show the operator's docstring,
        # not functools.partial's
        while hasattr(fn, "func"):
            fn = fn.func
        doc = inspect.getdoc(fn) or ""
        s = " ".join(doc.split())
        return s[:160]

    print("# Query inventory — driver contract `queries()`")
    print()
    print("Auto-generated from registered callables' docstrings (first"
          " sentence). `oracle`: hash-matched against DuckDB at sf0.01 by"
          " the driver; `rows-only`: non-SQL-expressible, known-answer"
          " pytest coverage instead.")
    print()
    print(f"**{len(q)} queries, {len(o & set(q))} DuckDB-oracled.**")
    print()
    print("| query | check | summary |")
    print("|---|---|---|")
    for name in sorted(q):
        kind = "oracle" if name in o else "rows-only"
        s = summary(q[name]).replace("|", "\\|")
        print(f"| `{name}` | {kind} | {s} |")


if __name__ == "__main__":
    main()
