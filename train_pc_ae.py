"""Train the point-cloud autoencoder (DGCNN encoder + Folding/Deforming
decoder) on surface samples of ground-truth meshes.

Counterpart of reference train_pc_ae.py: cross-validated PC-AE training on
`SampleFromMeshDS`, chamfer (point target) or regularized mesh loss (mesh
target), per-fold reconstruction evaluation (ASSD between decoded and GT
surface).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from fissure_segmentation_tpu.cli import (get_pc_ae_train_parser,
                                          load_args_for_testing, store_args)
from fissure_segmentation_tpu.data import (SampleFromMeshDS, create_split,
                                           load_split_file,
                                           make_synthetic_mesh_dataset,
                                           save_split_file)
from fissure_segmentation_tpu.losses import chamfer_distance, get_loss_fn
from fissure_segmentation_tpu.models import DGCNNFoldingNet, load_model
from fissure_segmentation_tpu.models.folding_net import folding_points_for
from fissure_segmentation_tpu.losses.mesh import MeshTopology
from fissure_segmentation_tpu.train import ModelTrainer, TrainConfig
from fissure_segmentation_tpu.utils.detached_run import maybe_run_detached_cli


def build_dataset(args) -> SampleFromMeshDS:
    if args.ds == "synthetic" or args.data_dir is None:
        cases, meshes, sizes = make_synthetic_mesh_dataset(
            n_cases=12, grid_n=24, n_points=400, with_feature=False)
        ids = [(c["case_id"], c["sequence"]) for c in cases]
        return SampleFromMeshDS(meshes, ids, sizes, sample_points=args.pts,
                                fixed_object=args.obj,
                                exclude_rhf=args.exclude_rhf,
                                mesh_as_target=args.mesh)
    return SampleFromMeshDS.from_folder(
        args.data_dir, sample_points=args.pts, fixed_object=args.obj,
        exclude_rhf=args.exclude_rhf, mesh_as_target=args.mesh,
        lobes=args.data == "lobes")


def make_loss(args, model: DGCNNFoldingNet):
    if not args.mesh:
        loss = get_loss_fn("chamfer")

        def wrapped(out, y):
            return loss(out, y)
        return wrapped

    # mesh decoding: regularized mesh loss with the decoder's fixed topology
    _, faces = folding_points_for(args.shape, model.m, decode_mesh=True)
    faces = np.asarray(faces)
    topo = MeshTopology.from_faces(faces, model.m)
    base = get_loss_fn("mesh", term_weights=args.loss_weights)

    def wrapped(out, y):
        verts = out[0] if isinstance(out, tuple) else out
        return base(verts, y, faces=faces, topo=topo)
    return wrapped


def evaluate_reconstruction(ds: SampleFromMeshDS, model, variables,
                            out_dir: str, n_eval_samples: int = 4096):
    """Mean symmetric surface distance between AE reconstruction and the GT
    mesh surface per object (counterpart of train_pc_ae.py test: ASSD eval)."""
    os.makedirs(out_dir, exist_ok=True)
    store = ds.to_store()
    rng = jax.random.PRNGKey(7)

    @jax.jit
    def recon_and_target(r, item):
        from fissure_segmentation_tpu.ops.marching import sample_points_on_triangles
        samples, _ = ds.sample_batch(r, store, item[None])  # (1, S, 3)
        out = model.apply(variables, samples, train=False)
        verts = out[0] if isinstance(out, tuple) else out
        target = sample_points_on_triangles(r, store.tris[item], store.valid[item],
                                            n_eval_samples)
        return verts[0], target

    dists = []
    aug = ds.do_augmentation
    ds.do_augmentation = False
    for item in range(len(ds)):
        rng, r = jax.random.split(rng)
        verts, target = recon_and_target(r, jnp.asarray(item))
        d = chamfer_distance(verts[None], target[None])
        dists.append(float(d))
    ds.do_augmentation = aug

    mean, std = float(np.mean(dists)), float(np.std(dists))
    with open(os.path.join(out_dir, "reconstruction_chamfer.csv"), "w") as f:
        f.write("mean_chamfer,std_chamfer\n")
        f.write(f"{mean},{std}\n")
    print(f"reconstruction chamfer: {mean:.5f} +- {std:.5f}")
    return {"chamfer": mean}


def run(args):
    os.makedirs(args.output, exist_ok=True)
    if args.test_only:
        args = load_args_for_testing(args.output, args)
    else:
        store_args(args, args.output)

    ds = build_dataset(args)
    model = DGCNNFoldingNet(k=args.k, n_embedding=args.latent,
                            shape_type=args.shape, n_input_points=args.pts,
                            decode_mesh=args.mesh, deform=args.deform,
                            static=args.static, dec_depth=args.dec_depth)
    loss_fn = make_loss(args, model)

    if not args.test_only:
        # op_count.csv artifact (reference train_pc_ae.py via thesis/utils.py)
        from fissure_segmentation_tpu.utils.profiling import param_and_op_count
        x0 = jnp.zeros((1, args.pts, 3), jnp.float32)
        variables0 = model.init(jax.random.PRNGKey(0), x0, train=False)
        counts = param_and_op_count(
            lambda v, x: model.apply(v, x, train=False), (variables0, x0),
            variables=variables0["params"], out_dir=args.output)
        print(f"model: {counts['params']:,} params, "
              f"{counts['flops'] / 1e9:.2f} GFLOP / fwd batch-1")

    case_ids = [list(i) for i in ds.ids]
    split = load_split_file(args.split) if args.split else \
        create_split(case_ids, k=5)
    save_split_file(split, os.path.join(args.output, "cross_val_split.json"))

    fold_metrics = []
    folds = range(len(split)) if args.fold is None else [args.fold]
    for fold in folds:
        print(f"------------ FOLD {fold} ----------------------")
        fold_dir = os.path.join(args.output, f"fold{fold}")
        train_ds, val_ds = ds.split_data_set(split[fold])

        if not args.test_only:
            store = train_ds.to_store()

            def batch_fn(rng, item_idx, train):
                aug = train_ds.do_augmentation
                train_ds.do_augmentation = train and aug
                out = train_ds.sample_batch(rng, store, item_idx)
                train_ds.do_augmentation = aug
                return out

            cfg = TrainConfig(epochs=args.epochs, lr=args.lr,
                              batch_size=args.batch, weight_decay=args.wd,
                              scheduler=args.scheduler, seed=fold)
            trainer = ModelTrainer(
                model, train_ds, loss_fn, fold_dir, cfg, batch_fn=batch_fn,
                init_input=jnp.zeros((1, args.pts, 3), jnp.float32))
            trainer.run()

        if not args.train_only:
            _, variables = load_model(os.path.join(fold_dir, "model.fst"))
            fold_metrics.append(evaluate_reconstruction(
                val_ds, model, variables, os.path.join(fold_dir, "test")))

    if fold_metrics:
        vals = [m["chamfer"] for m in fold_metrics]
        with open(os.path.join(args.output, "cv_results.csv"), "w") as f:
            f.write("fold,chamfer\n")
            for i, v in enumerate(vals):
                f.write(f"{i},{v}\n")
            f.write(f"mean,{np.mean(vals)}\n")


if __name__ == "__main__":
    from fissure_segmentation_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    parser = get_pc_ae_train_parser()
    args = parser.parse_args()
    maybe_run_detached_cli(args)
    run(args)
