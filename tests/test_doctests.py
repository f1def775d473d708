"""Doctests in module docstrings are part of the suite — mirroring the
reference's CI (`pytest ./tf2_gnn/ --doctest-modules`, azure-ci.yml:36-40)."""
import doctest

import pytest

import tf2_gnn_tpu.data.preprocess
import tf2_gnn_tpu.harness.config
import tf2_gnn_tpu.ops.segment


@pytest.mark.parametrize(
    "module",
    [
        tf2_gnn_tpu.data.preprocess,
        tf2_gnn_tpu.ops.segment,
        tf2_gnn_tpu.harness.config,
    ],
)
def test_module_doctests(module):
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures in {module}"
