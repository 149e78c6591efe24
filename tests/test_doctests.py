"""Executable docstring examples (the reference ships a doctest corpus,
tests/test_docstrings.py) for the pure-python modules."""

import doctest

import scdataset_spark.autoconfig
import scdataset_spark.plans.plan
import scdataset_spark.plans.seeds


def test_doctests():
    failures = 0
    for m in (
        scdataset_spark.plans.seeds,
        scdataset_spark.plans.plan,
        scdataset_spark.autoconfig,
    ):
        r = doctest.testmod(m, verbose=False)
        failures += r.failed
    assert failures == 0
