"""Testdata physical-schema drift guard.

The driver regenerates /root/testdata between rounds, and its PHYSICAL
parquet details are not contractual — in r2 the events.ts unit changed
from TIMESTAMP(NANOS) to TIMESTAMP(MICROS), which silently corrupted
every timestamp under the r1 nanos workaround and broke 10 oracle
queries at once.  This module fails fast and readably when the next
drop drifts, instead of letting value-level oracle mismatches surface
it query by query.

Footer-only checks (pyarrow), no Spark session needed — runs in
milliseconds, safe to run first in any round.
"""

import os

import pyarrow.parquet as pq
import pytest

from dbt_lab_spark.catalog import SCHEMAS, TABLE_NAMES

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
           if os.path.isdir(d)]

# Spark type -> acceptable pyarrow footer type names.  Physical widths
# may legitimately differ (the catalog reads with a declared schema and
# Spark up/down-casts); what must hold is the logical family, so a
# regeneration that flips a column family (string -> binary, timestamp
# -> int64...) is caught here.
_FAMILY = {
    "LongType": {"int64", "int32", "int16"},
    "IntegerType": {"int64", "int32", "int16"},
    "ShortType": {"int64", "int32", "int16"},
    "DoubleType": {"double", "float"},
    "FloatType": {"float", "double"},
    "StringType": {"string", "large_string"},
    "DateType": {"date32[day]", "date64[ms]"},
    # any timestamp unit is fine — the catalog sniffs it (events_ts_unit)
    "TimestampType": {"timestamp[s]", "timestamp[ms]", "timestamp[us]", "timestamp[ns]"},
    "BooleanType": {"bool"},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", TABLE_NAMES)
def test_footer_matches_declared_family(sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent in this drop")
    footer = pq.read_schema(path)
    declared = {f.name: f.dataType for f in SCHEMAS[table].fields}
    footer_names = set(footer.names)
    missing = set(declared) - footer_names
    assert not missing, f"{table}: declared columns missing from footer: {missing}"
    for name, dtype in declared.items():
        at = footer.field(name).type
        fam = _FAMILY.get(type(dtype).__name__)
        if fam is None:
            # complex types (arrays etc.): compare loosely by string prefix
            assert str(at), f"{table}.{name}: unreadable footer type"
            continue
        assert str(at) in fam, (
            f"{table}.{name}: footer type {at} no longer in the {type(dtype).__name__} "
            f"family {fam} — testdata drop drifted; update catalog handling"
        )


def test_embeddings_dim_consistent():
    """embeddings.embedding must stay a list of floats with a constant
    dimension — similarity/dedup derive dim from the data."""
    for sf_dir in SF_DIRS:
        path = os.path.join(sf_dir, "embeddings.parquet")
        if not os.path.exists(path):
            continue
        t = pq.read_table(path, columns=["embedding"]).column("embedding")
        first = t[0].as_py()
        assert isinstance(first, list) and len(first) > 0
        sample = [t[i].as_py() for i in range(0, min(100, len(t)))]
        dims = {len(v) for v in sample}
        assert len(dims) == 1, f"{sf_dir}: embedding dims vary in sample: {dims}"
