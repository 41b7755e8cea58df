"""SSM qualitative evaluation + sampled-data export (shape_model/
qualitative.py) — reference shape_model/qualitative_evaluation.py and
create_sampled_data.py."""
import numpy as np

from fissure_segmentation_tpu.shape_model import (fit_ssm,
                                                  latent_interpolation,
                                                  sample_shapes_to_npz,
                                                  visualize_reconstruction,
                                                  visualize_ssm_samples)


def _train_shapes(n=12, p=64, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randn(p, 3).astype(np.float32)
    modes = rng.randn(3, p, 3).astype(np.float32)
    w = rng.randn(n, 3).astype(np.float32)
    return base[None] + np.einsum("nm,mpd->npd", w, modes) * 0.3


def test_visualize_reconstruction(tmp_path):
    shapes = _train_shapes()
    visualize_reconstruction(shapes[0], shapes[1],
                             savepath=str(tmp_path / "rec.png"))
    assert (tmp_path / "rec.png").stat().st_size > 0


def test_visualize_ssm_samples(tmp_path):
    params = fit_ssm(_train_shapes())
    samples = visualize_ssm_samples(params, 3, str(tmp_path))
    assert samples.shape == (3, 64, 3)
    for i in range(3):
        assert (tmp_path / f"smpl_{i}.png").exists()


def test_latent_interpolation(tmp_path):
    shapes = _train_shapes()
    params = fit_ssm(shapes)
    decoded = latent_interpolation(shapes[0], shapes[1], params, steps=2,
                                   savepath=str(tmp_path / "interp.png"))
    assert decoded.shape == (4, 64, 3)
    # endpoints are the SSM reconstructions of the two inputs: close to them
    assert np.abs(decoded[0] - shapes[0]).mean() < np.abs(
        decoded[0] - shapes[1]).mean()
    assert (tmp_path / "interp.png").exists()


def test_sample_shapes_to_npz(tmp_path):
    from fissure_segmentation_tpu.shape_model import load_shape_npz

    params = fit_ssm(_train_shapes())
    paths = sample_shapes_to_npz(params, 4, str(tmp_path))
    assert len(paths) == 4
    arr, trf = load_shape_npz(paths[0])
    assert arr.shape == (2, 32, 3)
    assert trf["scale"] == 1.0 and trf["rotation"].shape == (3, 3)
