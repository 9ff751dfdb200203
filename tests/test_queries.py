"""Every queries() entry with an oracle must match DuckDB at sf0.001 —
a local replica of the driver's correctness gate."""

import pytest

import __ray_entry__ as entrymod
from tests.util import assert_matches_oracle

SF = "/root/testdata/sf0.001"

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name):
    assert name in _QUERIES, f"oracle_sql has {name} but queries() doesn't"
    result = _QUERIES[name](SF)
    assert_matches_oracle(result, _ORACLES[name], SF)


def test_entry_smoke():
    out = entrymod.entry()
    df = out if hasattr(out, "columns") else out.to_pandas()
    assert len(df) >= 0
    assert len(df.columns) > 0
