"""Empty-input contract over the WHOLE registry: every declared query
either evaluates cleanly to an empty/valid result on zero-row tables,
or raises an explicit ValueError (the iterative trainers' documented
refusal — never a TypeError/IndexError from an unguarded first()/[0]).

This is the sweep that would have caught the semantic-dedup
empty-corpus TypeError the r2 ADVICE flagged."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as e

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Iterative trainers whose contract IS the loud ValueError.
_EXPECTED_REFUSALS = {
    "q_classifier_train",
    "q_pagerank",
    "q_pca_project",
    "q_pca_power",
    "q_pq_ann",
    "q_pq_adc_seeded",
    "q_logreg_step",
    "q_markov_attribution",  # needs >=1 converting journey (base p=0)
    # inference stats whose denominators are undefined on zero rows
    "q_kappa",
    "q_chi2",
    "q_ab_test",
    "q_cramers_v",  # r4: contingency total is 0
    "q_youden_j",  # r4: degenerate label distribution on empty tables
}


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory, sf_small):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in _TABLES:
        schema = pq.read_schema(os.path.join(sf_small, f"{t}.parquet"))
        pq.write_table(
            pa.table({f.name: pa.array([], type=f.type) for f in schema}),
            str(d / f"{t}.parquet"),
        )
    return str(d)


def test_every_query_survives_empty_tables(spark, empty_sf):
    failures = []
    for name, build in sorted(e.queries().items()):
        try:
            build(spark, empty_sf).count()
            if name in _EXPECTED_REFUSALS:
                failures.append(f"{name}: expected ValueError refusal, got success")
        except ValueError:
            if name not in _EXPECTED_REFUSALS:
                failures.append(f"{name}: unexpected ValueError")
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:100]}")
    assert not failures, "\n".join(failures)
