"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are consistent."""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_consistency(entrymod):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 20
    assert set(oracles).issubset(set(qs))
    # the vast majority must have a full value-level oracle; the rows-only
    # set is exactly the non-SQL-expressible ops (driver quadtree pipeline,
    # binary decode paths, approximate ANN, audio/video kernels)
    assert len(oracles) >= 28
    assert len(qs) - len(oracles) <= 7


def test_entry_runs(entrymod, spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"tile_id", "n_rows"}.issubset(set(df.columns))
    assert all(r["n_rows"] > 0 for r in rows)


@pytest.mark.parametrize("name", [
    "q1_pricing_summary", "density_histogram", "tile_assign_fixed",
    "knn_customers_suppliers", "doc_simhash", "embed_top3",
])
def test_query_smoke(entrymod, spark, name):
    df = entrymod.queries()[name](spark, SF)
    assert df.count() > 0
