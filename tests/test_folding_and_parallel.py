import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.models.folding_net import (DGCNNFoldingNet,
                                                         get_plane_mesh)
from fissure_segmentation_tpu.losses.mesh import (MeshTopology,
                                                  make_regularized_mesh_loss)


def test_folding_net_shapes():
    model = DGCNNFoldingNet(k=8, n_embedding=64, shape_type="plane",
                            n_input_points=256, decode_mesh=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 3))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    verts, faces = model.apply(variables, x, train=False)
    assert verts.shape == (2, model.m, 3)
    assert faces.shape[1] == 3
    # deform decoder variant
    model2 = DGCNNFoldingNet(k=8, n_embedding=64, shape_type="plane",
                             n_input_points=256, decode_mesh=False, deform=True)
    variables2 = model2.init(jax.random.PRNGKey(1), x, train=False)
    out = model2.apply(variables2, x, train=False)
    assert out.shape == (2, model2.m, 3)


@pytest.mark.slow
def test_mesh_loss_terms():
    pts, faces = get_plane_mesh(n=100)
    topo = MeshTopology.from_faces(faces, len(pts))
    verts = jnp.asarray(np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1))[None]
    loss_fn = make_regularized_mesh_loss(n_samples=256)
    target = verts + 0.01
    total, comps = loss_fn(verts, target, faces=faces, topo=topo,
                           target_faces=faces, target_topo=topo,
                           rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    # flat plane -> normal consistency == 0, laplacian ~ 0 in the interior
    assert float(comps["Normal Consistency"]) < 1e-5
    # sampled chamfer: bounded by sample spacing (~0.04 on a 0.6-wide plane)
    assert float(comps["Chamfer"]) < 0.05
    # and grows monotonically with surface separation
    far, _ = loss_fn(verts, verts + 0.3, faces=faces, topo=topo,
                     target_faces=faces, target_topo=topo,
                     rng=jax.random.PRNGKey(0))
    assert float(far) > float(total)


def test_sharded_ensemble_matches_single_device(rng):
    """shard_map'd subset ensemble == single-device ensemble on the same
    subsets (8 virtual CPU devices)."""
    import fissure_segmentation_tpu.models.ensemble as ens
    from fissure_segmentation_tpu.models import PointNetSeg
    from fissure_segmentation_tpu.parallel import make_mesh, sharded_ensemble_predict

    model = PointNetSeg(in_features=3, num_classes=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 3))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    pc = jnp.asarray(rng.normal(size=(500, 3)).astype(np.float32))

    mesh = make_mesh(("data",))
    probs_sharded = sharded_ensemble_predict(
        model.apply, variables, pc, jax.random.PRNGKey(2), mesh,
        sample_points=64, n_runs_min=16, subset_batch=2)
    assert probs_sharded.shape == (500, 3)
    np.testing.assert_allclose(np.asarray(probs_sharded.sum(-1)), 1.0, atol=1e-5)

    probs_single = ens.ensemble_predict(model.apply, variables, pc,
                                        jax.random.PRNGKey(2), sample_points=64,
                                        n_runs_min=16, subset_batch=2)
    # same rng -> same subsets -> same accumulation (order differs only)
    np.testing.assert_allclose(np.asarray(probs_sharded),
                               np.asarray(probs_single), atol=1e-4)


@pytest.mark.slow
def test_graft_entry_dryrun_multichip():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1].shape[0]
    ge.dryrun_multichip(8)
