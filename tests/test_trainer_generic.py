"""Tests for the family-generic trainer hooks (train/trainer.py): custom
batch/forward fns, epoch-aware losses, head-schedule callbacks,
checkpoint/resume, plus the image trainer and the profiling utilities."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fissure_segmentation_tpu.data import (PointDataset,
                                           make_synthetic_dataset,
                                           make_synthetic_image_case)
from fissure_segmentation_tpu.losses import get_loss_fn
from fissure_segmentation_tpu.models import DGCNNSeg
from fissure_segmentation_tpu.train import ModelTrainer, TrainConfig


def _tiny_ds(n=6, pts=64):
    cases = make_synthetic_dataset(n, n_points=256, with_feature=False,
                                   shape=(32, 32, 32))
    return PointDataset(cases, sample_points=pts)


def test_epoch_in_loss_and_callback(tmp_path):
    ds = _tiny_ds()
    model = DGCNNSeg(k=8, in_features=3, num_classes=4, dynamic=False)
    seen = []

    base = get_loss_fn("nnunet", jnp.asarray(ds.get_class_weights()))

    def loss_fn(out, y, epoch):
        loss, comps = base(out, y)
        # epoch-dependent scaling must stay traced (no recompile per epoch)
        return loss * (1.0 + 0.0 * epoch), comps

    def cb(trainer, epoch):
        seen.append(epoch)
        return False

    cfg = TrainConfig(epochs=3, batch_size=2, val_split=0.34, show_every=10)
    tr = ModelTrainer(model, ds, loss_fn, str(tmp_path), cfg,
                      epoch_in_loss=True, epoch_callback=cb)
    tr.run()
    assert seen == [0, 1, 2]
    assert os.path.exists(os.path.join(str(tmp_path), "model.fst"))


def test_visualization_hook(tmp_path):
    """Per-epoch visualization parity (model_trainer.py:35-39,134-136):
    the hook fires every `visualize_every` epochs with host arrays of the
    validation batch, and the default renderer writes a PNG per call."""
    from fissure_segmentation_tpu.utils.visualization import \
        point_seg_visualization
    ds = _tiny_ds()
    model = DGCNNSeg(k=8, in_features=3, num_classes=4, dynamic=False)
    loss_fn = get_loss_fn("nnunet", jnp.asarray(ds.get_class_weights()))
    calls = []

    def vis(x, y, out, epoch, out_dir):
        assert isinstance(x, np.ndarray) and x.shape[-1] == 3
        assert out.shape[:2] == y.shape and out.shape[-1] == 4
        calls.append(epoch)
        point_seg_visualization(x, y, out, epoch, out_dir)

    cfg = TrainConfig(epochs=3, batch_size=2, val_split=0.34, show_every=10)
    tr = ModelTrainer(model, ds, loss_fn, str(tmp_path), cfg,
                      visualization_fn=vis, visualize_every=2)
    tr.run()
    assert calls == [1]  # (epoch+1) % 2 == 0 -> epoch 1 only
    assert os.path.exists(os.path.join(str(tmp_path), "visualizations",
                                       "epoch1.png"))


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    ds = _tiny_ds()
    model = DGCNNSeg(k=8, in_features=3, num_classes=4, dynamic=False)
    loss_fn = get_loss_fn("nnunet", jnp.asarray(ds.get_class_weights()))

    cfg = TrainConfig(epochs=4, batch_size=2, checkpoint_every=2,
                      show_every=10)
    out1 = str(tmp_path / "full")
    tr1 = ModelTrainer(model, ds, loss_fn, out1, cfg)
    tr1.run()
    full_hist = list(tr1.training_history["total_loss"])

    # run 2 epochs, "crash", resume from checkpoint
    out2 = str(tmp_path / "resumed")
    cfg2 = TrainConfig(epochs=2, batch_size=2, checkpoint_every=2,
                       show_every=10)
    tr2a = ModelTrainer(model, ds, loss_fn, out2, cfg2)
    tr2a.run()
    assert os.path.exists(os.path.join(out2, "checkpoint.pkl"))

    cfg3 = TrainConfig(epochs=4, batch_size=2, checkpoint_every=2,
                       show_every=10)
    tr2b = ModelTrainer(model, ds, loss_fn, out2, cfg3)
    tr2b.run(resume=True)
    resumed_hist = tr2b.training_history["total_loss"]
    # epochs 0-1 from the checkpointed history, 2-3 continued
    np.testing.assert_allclose(resumed_hist[:2], full_hist[:2], rtol=1e-4)
    assert resumed_hist[2] != 0.0 and resumed_hist[3] != 0.0
    # deterministic data order -> resumed run matches the uninterrupted one
    np.testing.assert_allclose(resumed_hist[2:], full_hist[2:], rtol=1e-3)


def test_custom_batch_fn(tmp_path):
    """Regression-style training via a custom batch_fn + loss."""
    import flax.linen as nn

    class TinyReg(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Dense(16)(x)
            h = nn.relu(h)
            return nn.Dense(3)(h).mean(axis=-2)

    class _DS:  # minimal dataset protocol (len + to_store unused)
        def __len__(self):
            return 8

    target_w = jnp.asarray([[0.5, -1.0, 2.0]])

    def batch_fn(rng, idx, train):
        x = jax.random.normal(rng, (idx.shape[0], 16, 3))
        y = x.mean(axis=-2) * target_w
        return x, y

    def loss_fn(out, y):
        l = jnp.mean((out - y) ** 2)
        return l, {"mse": l}

    model = TinyReg()
    cfg = TrainConfig(epochs=5, batch_size=4, lr=1e-2, val_split=0.25,
                      scheduler="none", show_every=10)
    tr = ModelTrainer(model, _DS(), loss_fn, str(tmp_path), cfg,
                      batch_fn=batch_fn,
                      init_input=jnp.zeros((1, 16, 3), jnp.float32))
    tr.run()
    first = tr.training_history["total_loss"][0]
    last = tr.training_history["total_loss"][-1]
    assert last < first


@pytest.mark.slow
def test_image_trainer(tmp_path):
    from fissure_segmentation_tpu.data import ImageDataset
    from fissure_segmentation_tpu.models import MobileNetASPP
    from fissure_segmentation_tpu.train.image_trainer import ImageTrainer

    cases = [make_synthetic_image_case(i, shape=(32, 32, 32)) for i in range(3)]
    ds = ImageDataset([c["image"] for c in cases],
                      [c["labels"] for c in cases],
                      [(c["case_id"], c["sequence"]) for c in cases],
                      resample_spacing=1.0, patch_size=(16, 16, 16))
    model = MobileNetASPP(num_classes=4, patch_size=(16, 16, 16))
    loss_fn = get_loss_fn("nnunet", jnp.asarray(ds.get_class_weights()))
    cfg = TrainConfig(epochs=2, batch_size=2, val_split=0.34, show_every=10)
    tr = ImageTrainer(model, ds, loss_fn, str(tmp_path), cfg)
    tr.run()
    assert os.path.exists(os.path.join(str(tmp_path), "model.fst"))
    assert np.isfinite(tr.training_history["total_loss"]).all()


def test_profiling_utils():
    from fissure_segmentation_tpu.utils.profiling import (cost_analysis,
                                                          count_parameters,
                                                          param_and_op_count,
                                                          time_fn)

    def f(a, b):
        return a @ b

    a = jnp.ones((64, 64))
    costs = cost_analysis(f, a, a)
    assert costs["flops"] > 0
    t = time_fn(f, a, a, repeats=2)
    assert t["mean_s"] > 0

    variables = {"params": {"w": jnp.ones((4, 5)), "b": jnp.ones(5)}}
    assert count_parameters(variables) == 25
    row = param_and_op_count(f, (a, a), variables)
    assert row["flops"] > 0 and row["params"] == 25


@pytest.mark.slow
def test_trainer_data_parallel_matches_single_device(tmp_path):
    """ModelTrainer(mesh=...) trains with the batch axis sharded over the
    full 8-device mesh for a MULTI-STEP run (20 epochs); same seeds => the
    whole loss trajectory matches the unsharded trainer within reduction-
    order tolerance, and both actually learn."""
    import jax
    import numpy as np
    from fissure_segmentation_tpu.data import PointDataset, make_synthetic_dataset
    from fissure_segmentation_tpu.losses import get_loss_fn
    from fissure_segmentation_tpu.models import DGCNNSeg
    from fissure_segmentation_tpu.parallel import make_mesh
    from fissure_segmentation_tpu.train import ModelTrainer, TrainConfig
    import jax.numpy as jnp

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")

    cases = make_synthetic_dataset(10, n_points=400, with_feature=True)
    ds = PointDataset(cases, sample_points=128)
    loss_fn = get_loss_fn("nnunet", jnp.asarray(ds.get_class_weights()))
    cfg = TrainConfig(epochs=20, lr=1e-3, batch_size=8, scheduler="cosine",
                      show_every=10, seed=0)

    def build(out, mesh):
        model = DGCNNSeg(k=8, in_features=4, num_classes=4, dynamic=False)
        return ModelTrainer(model, ds, loss_fn, out, cfg, mesh=mesh)

    t_single = build(str(tmp_path / "single"), None)
    t_single.run()
    mesh = make_mesh(("data",), devices=jax.devices()[:8])
    t_dp = build(str(tmp_path / "dp"), mesh)
    t_dp.run()

    a = np.asarray(t_single.training_history["total_loss"])
    b = np.asarray(t_dp.training_history["total_loss"])
    # sharded batches change only the reduction order; trajectories track
    # within a small drift over the full 20-epoch run
    np.testing.assert_allclose(a, b, rtol=3e-2, atol=3e-2)
    av = np.asarray(t_single.validation_history["total_loss"])
    bv = np.asarray(t_dp.validation_history["total_loss"])
    np.testing.assert_allclose(av, bv, rtol=3e-2, atol=3e-2)
    assert a[-1] < a[0] and b[-1] < b[0], "neither run learned"


def test_trainer_dp_rejects_indivisible_batch():
    import jax
    import pytest
    import jax.numpy as jnp
    from fissure_segmentation_tpu.data import PointDataset, make_synthetic_dataset
    from fissure_segmentation_tpu.losses import get_loss_fn
    from fissure_segmentation_tpu.models import DGCNNSeg
    from fissure_segmentation_tpu.parallel import make_mesh
    from fissure_segmentation_tpu.train import ModelTrainer, TrainConfig

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    ds = PointDataset(make_synthetic_dataset(4, n_points=200), sample_points=64)
    mesh = make_mesh(("data",), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="not divisible"):
        ModelTrainer(DGCNNSeg(k=4, in_features=4, num_classes=4),
                     ds, get_loss_fn("ce"), "/tmp/x",
                     TrainConfig(batch_size=6, epochs=1), mesh=mesh)
