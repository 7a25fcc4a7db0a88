"""Oracle parity at sf0.001 for every SQL-expressible query (SURVEY.md §5
layer 2) — the same comparison the driver runs at sf0.01."""

import pytest

import __spark_entry__ as entrymod
from tools.check_correctness import rows_key

QS = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    df = QS[name](spark, sf_dir)
    scols, srows = df.columns, df.collect()
    rel = duck.execute(ORACLES[name])
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert rows_key(scols, srows) == rows_key(dcols, drows), f"{name}: value mismatch"


@pytest.mark.parametrize("name", sorted(set(QS) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    rows = QS[name](spark, sf_dir).collect()
    assert rows is not None
