import jax.numpy as jnp
import numpy as np
import torch

from fissure_segmentation_tpu.ops import edge_features, gather_neighbors, knn, pairwise_sqdist


def _torch_knn(x_bcn, k, self_loop=False):
    """Reference knn (utils/general_utils.py:315-327, pairwise_dist:43)."""
    x = x_bcn.transpose(2, 1)
    xx = (x ** 2).sum(2, keepdim=True)
    dist = xx - 2.0 * torch.bmm(x, x.transpose(2, 1)) + xx.transpose(2, 1)
    dist[:, torch.arange(dist.shape[1]), torch.arange(dist.shape[2])] = 0
    k_mod = 0 if self_loop else 1
    _, idx = dist.topk(k=k + k_mod, dim=-1, largest=False)
    return idx[..., k_mod:]


def test_knn_matches_reference(rng):
    pts = rng.normal(size=(2, 128, 3)).astype(np.float32)
    for self_loop in (True, False):
        ref = _torch_knn(torch.from_numpy(pts).transpose(2, 1), k=8, self_loop=self_loop)
        ours = knn(jnp.asarray(pts), k=8, self_loop=self_loop)
        # neighbor *sets* must match (tie order may differ between topk impls)
        ref_sets = np.sort(ref.numpy(), axis=-1)
        our_sets = np.sort(np.asarray(ours), axis=-1)
        np.testing.assert_array_equal(our_sets, ref_sets)


def test_knn_chunked_equals_dense(rng):
    pts = rng.normal(size=(2, 256, 3)).astype(np.float32)
    dense = knn(jnp.asarray(pts), k=10)
    chunked = knn(jnp.asarray(pts), k=10, query_chunk=64)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(chunked))


def test_pairwise_sqdist_diag_zero(rng):
    pts = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))
    d = pairwise_sqdist(pts)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(d, axis1=-2, axis2=-1)), 0.0)


def test_edge_features_semantics(rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 4)).astype(np.float32))
    idx = knn(x[..., :3], k=5, self_loop=True)
    ef = edge_features(x, idx)
    assert ef.shape == (1, 16, 5, 8)
    # first half is x_j - x_i, second half is x_i
    neigh = gather_neighbors(x, idx)
    np.testing.assert_allclose(np.asarray(ef[..., 4:]),
                               np.broadcast_to(np.asarray(x)[:, :, None], neigh.shape))
    np.testing.assert_allclose(np.asarray(ef[..., :4]),
                               np.asarray(neigh) - np.asarray(x)[:, :, None])


def test_self_loop_includes_self(rng):
    x = jnp.asarray(rng.normal(size=(1, 20, 3)).astype(np.float32))
    idx = knn(x, k=4, self_loop=True)
    np.testing.assert_array_equal(np.asarray(idx[..., 0]), np.arange(20)[None])

def test_knn_approx_recall_and_self_semantics(rng):
    """recall_target path: high set-recall vs exact, preserved self handling.

    On CPU approx_min_k lowers to exact top-k, so recall here is 1.0; the
    assertions bound what the TPU lowering must also satisfy (recall>=target)
    and pin the exact self-loop semantics (self first, distance 0).
    """
    pts = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
    k = 12
    exact = np.asarray(knn(pts, k=k, self_loop=False))
    approx, dist = knn(pts, k=k, self_loop=False, return_dist=True,
                       recall_target=0.9)
    assert approx.shape == (2, 256, k) and dist.shape == (2, 256, k)
    hits = np.array([
        len(set(exact[b, n]) & set(np.asarray(approx)[b, n]))
        for b in range(2) for n in range(256)])
    assert hits.mean() / k >= 0.9
    # self is never a neighbor in the no-self-loop path
    assert not (np.asarray(approx) == np.arange(256)[None, :, None]).any()

    idx_s, dist_s = knn(pts, k=k, self_loop=True, return_dist=True,
                        recall_target=0.9)
    np.testing.assert_array_equal(np.asarray(idx_s[..., 0]),
                                  np.broadcast_to(np.arange(256)[None], (2, 256)))
    np.testing.assert_allclose(np.asarray(dist_s[..., 0]), 0.0)
    assert float(dist_s.min()) >= 0.0
