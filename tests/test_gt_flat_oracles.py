"""GT-builder flat-view oracle gate (VERDICT r4 ask #3): the formerly
rows-only raw-fixture builders now expose hash-oracled flat views whose
DuckDB SQL re-derives the builder semantics from the committed fixture
files (read_json_auto / read_text / the pdf fixture plan). This test
replicates the driver's compare exactly (sorted columns, sorted rows,
dtype-strict) so a MISMATCH here fails before the driver ever sees it."""

import duckdb
import pandas as pd
import pytest

NAMES = [
    "funsd_gt_flat",
    "dpbench_gt_flat",
    "docvqa_gt_flat",
    "pdf_gt_flat",
    "xfund_gt_flat",
    "doclaynet_gt_flat",
    "omnidocbench_gt_flat",
    "otsl_gt_flat",
    "pixparse_gt_flat",
    "doclaynet_v2_gt_flat",
]


@pytest.fixture(scope="module")
def entry_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ray_entry_gtflat_test", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", NAMES)
def test_gt_flat_matches_oracle(name, entry_mod, ray_session):
    res = entry_mod.queries()[name]("")
    got = _canon(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    assert len(got) > 0, "flat view must not be empty"
    con = duckdb.connect()
    want = _canon(con.sql(entry_mod.oracle_sql()[name]).df())
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=True,
                                  check_exact=True)
