"""Off-repo driver harness — reproduces the multi-node failure mode.

Run this with ``cwd=/tmp`` (or anywhere that is NOT the repo root) and
WITHOUT the repo on ``PYTHONPATH``:

    cd /tmp && python /root/repo/tools/offrepo_driver.py [query ...]

The script inserts the repo path into the DRIVER's ``sys.path`` only.
Ray workers are separate processes whose cwd/env don't include the repo,
so any runtime relative import executing inside worker-run code raises
``ModuleNotFoundError`` — exactly what happens on a real cluster where
the package ships by value via cloudpickle but is not installed on the
workers (the invariant ``docling_eval_ray/__init__.py`` declares).

With no query args, runs ``entry()`` plus EVERY ``queries()`` entry at
sf0.001 and prints one JSON line per query: {"q": name, "ok": bool,
"rows": n, "err": "..."}.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

REPO = "/root/repo"
assert os.getcwd() != REPO, "run me from OUTSIDE the repo (e.g. cwd=/tmp)"
sys.path.insert(0, REPO)

import ray  # noqa: E402


def _nrows(res) -> int:
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    raise TypeError(f"unexpected result type {type(res)}")


def main() -> int:
    sf_dir = os.environ.get("OFFREPO_SF_DIR", "/root/testdata/sf0.001")
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("OFFREPO_CPUS", "4")),
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    wanted = sys.argv[1:] or (["__entry__"] + sorted(qs))
    n_fail = 0
    for name in wanted:
        try:
            if name == "__entry__":
                res = entrymod.entry()
            else:
                res = qs[name](sf_dir)
            rows = _nrows(res)
            print(json.dumps({"q": name, "ok": True, "rows": rows}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — harness must keep going
            n_fail += 1
            tb = traceback.format_exc(limit=40)
            print(json.dumps({"q": name, "ok": False,
                              "err": f"{type(e).__name__}: {e}",
                              "tb": tb[-2000:]}), flush=True)
    print(json.dumps({"total": len(wanted), "failed": n_fail}), flush=True)
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
