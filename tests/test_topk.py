"""masked_top_k: exact parity with lax.top_k incl. the fallback path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.ops.topk import masked_top_k


def _check(scores, k, **kw):
    scores = jnp.asarray(scores, jnp.float32)
    v_ref, i_ref = jax.lax.top_k(scores, k)
    v, i = masked_top_k(scores, k, **kw)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    finite = np.isfinite(np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i)[finite],
                                  np.asarray(i_ref)[finite])
    if finite.any():
        # indices must address the claimed values
        np.testing.assert_array_equal(
            np.asarray(scores)[np.asarray(i)[finite]],
            np.asarray(v)[finite])


def test_random_scores_fast_path():
    rng = np.random.default_rng(0)
    _check(rng.normal(size=2 ** 20), 1000)


def test_clustered_scores_trigger_fallback():
    # all global top-k live in one row: the certificate must fail and the
    # fallback must still return exact results
    s = np.zeros(2 ** 20, np.float32)
    s[5000:5200] = np.arange(200) + 10.0
    _check(s, 100, row_k=8)


def test_fewer_finite_candidates_than_k():
    s = np.full(2 ** 20, -np.inf, np.float32)
    idx = np.random.default_rng(1).choice(2 ** 20, 500, replace=False)
    s[idx] = np.random.default_rng(2).normal(size=500)
    _check(s, 1000)


def test_n_not_multiple_of_row_width():
    rng = np.random.default_rng(3)
    _check(rng.normal(size=4096 * 37 + 123), 200)


def test_small_n_falls_through():
    rng = np.random.default_rng(4)
    _check(rng.normal(size=3000), 2000)


def test_ties_match_reference_order():
    s = np.zeros(2 ** 18, np.float32)
    s[::100] = 1.0      # many ties at the cut
    _check(s, 64)
