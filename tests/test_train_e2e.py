"""End-to-end slice: synthetic data -> DGCNN training -> ensembled full-cloud
inference -> Dice clearly above chance. (SURVEY.md §7 step 3.)"""
import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.data import PointDataset, make_synthetic_dataset
from fissure_segmentation_tpu.losses import get_loss_fn
from fissure_segmentation_tpu.metrics import batch_dice
from fissure_segmentation_tpu.models import DGCNNSeg, ensemble_predict, load_model
from fissure_segmentation_tpu.train import ModelTrainer, TrainConfig
import pytest


@pytest.mark.slow
def test_train_and_infer_e2e(tmp_path):
    cases = make_synthetic_dataset(8, n_points=1200, with_feature=True)
    ds = PointDataset(cases, sample_points=512)
    model = DGCNNSeg(k=10, in_features=4, num_classes=4, dynamic=False)
    loss_fn = get_loss_fn("nnunet", jnp.asarray(ds.get_class_weights()))
    # 60 epochs: the val-loss knee on this synthetic realization is ~ep 40
    # (8 cases / batch 8 = 1 step per epoch); 30 was under the knee.
    cfg = TrainConfig(epochs=60, lr=1e-3, batch_size=8, scheduler="cosine",
                      show_every=20, seed=0)
    trainer = ModelTrainer(model, ds, loss_fn, str(tmp_path), cfg)
    variables = trainer.run()

    hist = trainer.training_history["total_loss"]
    assert hist[-1] < hist[0] - 0.2, f"no learning: {hist[0]} -> {hist[-1]}"

    # best model was persisted and reloads
    model2, variables2 = load_model(str(tmp_path / "model.fst"))
    assert model2 == model

    # ensembled full-cloud inference on a held-out-ish case
    x, y = ds.get_full_pointcloud(0)
    probs = ensemble_predict(model.apply, variables2, jnp.asarray(x),
                             jax.random.PRNGKey(0), sample_points=512,
                             n_runs_min=10)
    pred = jnp.argmax(probs, axis=-1)
    dice = np.asarray(batch_dice(pred[None], jnp.asarray(y)[None], 4))
    print("dice:", dice)
    # trained-on-case: background + fissures should be segmented far above chance
    assert dice[0] > 0.8
    assert dice[1:].mean() > 0.5

    # artifacts written (trainer parity)
    assert (tmp_path / "train_time.csv").exists()
    assert (tmp_path / "history.csv").exists()
