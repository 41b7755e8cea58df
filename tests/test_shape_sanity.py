"""The reference's shape-model correctness probes (adam_shape_fitting.py,
dgssm_rigid_toy_example.py) as tests."""
import numpy as np
import pytest


def test_adam_recovers_ssm_weights():
    from shape_sanity_checks import sanity_check_weights
    err, baseline = sanity_check_weights(n_iter=200, verbose=False)
    # Adam's reconstruction must land close to the PCA-optimal one
    assert err < 0.05, (err, baseline)


def test_adam_recovers_eigenvectors():
    from shape_sanity_checks import sanity_check_eigenvectors
    err, optimal = sanity_check_eigenvectors(verbose=False)
    assert err < max(3 * optimal, 0.02), (err, optimal)


@pytest.mark.slow
def test_dgssm_rigid_recovery_improves():
    from shape_sanity_checks import dgssm_rigid_toy_example
    errs = dgssm_rigid_toy_example(epochs=10, steps=5, verbose=False)
    assert errs[-1] < errs[0] * 0.9, errs
