"""Adversarial-corpus oracle gate: every text-oracled query must
hash-match DuckDB on documents with blank text, non-space whitespace at
the edges, embedded NUL bytes, and newlines — the inputs where (a) the
tokenization convention (functions/tokens.py) and (b) pandas'
NUL-conflating object hashtables historically diverged from SQL."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TEXTS = [
    "",                       # empty
    "   ",                    # all spaces (SQL trim -> '')
    "\thello world",          # tab-led -> leading '' token
    "hello world\t",          # trailing tab -> trailing '' token
    "a b c d e f g h i j",    # clean
    "\x00total \x00total x",  # embedded NUL (pandas hashtable trap)
    "the the the the the and of to a in is it",
    "el la de que y en un una es no",
    "join hash row batch scan " * 8,
    "one\ntwo\nthree",        # newlines
]

#: the documents-table queries whose oracles read only text/lang/n_chars
NAMES = [
    "quality_repetition", "tfidf_topk", "token_heavy_hitters",
    "token_counts", "pack_sequences", "simhash_fingerprints",
    "language_id", "stratified_sample", "fixed_size_sample",
    "deterministic_sample", "decontaminate_ngrams", "document_winnow",
    "ngram_jaccard_pairs", "minhash_near_dups", "token_frequency_topk",
    "dedup_exact", "document_fingerprints", "quality_scores",
    # continuation-2 documents-only oracled ops
    "token_count_min", "dedup_inflation_by_source", "k_anonymity_census",
    "split_contamination_audit", "quality_perplexity_corr",
    "vocab_coverage_curve", "incremental_dedup_ingest",
    "shard_skew_report", "langid_confusion", "curriculum_stage_assign",
    "token_ttr_by_source", "pack_efficiency_report",
    "epoch_shuffle_order", "classifier_reliability_bins",
    "bloom_fp_calibration", "approx_token_vocabulary",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    n = len(TEXTS)
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "lang": pa.array((["en", "fr", "es", "zh", "de"] * 2)[:n],
                             pa.string()),
            "source": pa.array(["edge"] * n, pa.string()),
            "n_chars": pa.array([max(len(t), 1) for t in TEXTS], pa.int64()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def entry_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ray_entry_edge_test", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", NAMES)
def test_edge_corpus_matches_oracle(name, edge_dir, entry_mod, ray_session):
    res = entry_mod.queries()[name](edge_dir)
    got = _canon(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{edge_dir}/documents.parquet'")
    want = _canon(con.sql(entry_mod.oracle_sql()[name]).df())
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=True,
                                  check_exact=True)
