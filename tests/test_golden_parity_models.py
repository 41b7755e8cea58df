"""Full-model golden parity: DGCNNSeg / DGCNNReg forward vs the reference.

The strongest cross-framework check we can run: build the reference PyTorch
model (models/dgcnn.py:116-209), copy its weights into our channel-last Flax
model (a 1x1 ConvNd is a Dense: kernel = conv.weight[..., 0].T; BatchNorm
buffers map 1:1), and assert the eval-mode logits agree on the same input.
This pins the whole forward path at once — static-graph kNN, the fused
matmul-before-gather EdgeMLP (ops/edge.py), edge-feature concat order
([x_j - x_i, x_i], dgcnn.py:36), max-pools, the BatchNorm/LeakyReLU stacks
and the segmentation/regression heads.

Dynamic-graph mode is deliberately not golden-tested end-to-end: feature-space
kNN makes neighbor sets sensitive to f32 rounding, so the op-level tests in
test_golden_parity.py cover it instead.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_golden_parity import import_ref, t2n  # noqa: E402

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference repo not mounted")


def _conv_kernel(conv) -> np.ndarray:
    """1x1 ConvNd weight (out, in, 1[, 1]) -> Dense kernel (in, out)."""
    w = t2n(conv.weight)
    return w.reshape(w.shape[0], w.shape[1]).T.copy()


def _bn(bn):
    return ({"scale": t2n(bn.weight).copy(), "bias": t2n(bn.bias).copy()},
            {"mean": t2n(bn.running_mean).copy(),
             "var": t2n(bn.running_var).copy()})


def _shared_fc(sfc, last=False):
    """Reference SharedFullyConnected -> our SharedMLP {Dense_0, BatchNorm_0}."""
    dense = {"kernel": _conv_kernel(sfc.layers[0])}
    if last:
        dense["bias"] = t2n(sfc.layers[0].bias).copy()
        return {"Dense_0": dense}, None
    p, s = _bn(sfc.layers[1])
    return {"Dense_0": dense, "BatchNorm_0": p}, {"BatchNorm_0": s}


def _edge_conv(ec):
    """Reference EdgeConv -> our {EdgeMLP_0, SharedMLP_j...}.

    The first shared-MLP layer is our fused EdgeMLP: its (2C, F) kernel rows
    [:C] act on x_j - x_i and rows [C:] on x_i — the same channel order the
    reference concatenates in (dgcnn.py:36), so the conv kernel copies over
    without permutation.
    """
    params, stats = {}, {}
    first = ec.shared_mlp[0]
    p, s = _bn(first.layers[1])
    params["EdgeMLP_0"] = {"kernel": _conv_kernel(first.layers[0]),
                           "BatchNorm_0": p}
    stats["EdgeMLP_0"] = {"BatchNorm_0": s}
    for j, mlp in enumerate(ec.shared_mlp[1:]):
        pj, sj = _shared_fc(mlp)
        params[f"SharedMLP_{j}"] = pj
        stats[f"SharedMLP_{j}"] = sj
    return params, stats


def _randomize_bn_buffers(model, gen):
    """Give every BatchNorm non-trivial eval-mode statistics and affine."""
    for m in model.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    gen.normal(0, 0.2, m.running_mean.shape).astype("f4")))
                m.running_var.copy_(torch.from_numpy(
                    gen.uniform(0.5, 1.5, m.running_var.shape).astype("f4")))
                m.weight.copy_(torch.from_numpy(
                    gen.uniform(0.5, 1.5, m.weight.shape).astype("f4")))
                m.bias.copy_(torch.from_numpy(
                    gen.normal(0, 0.2, m.bias.shape).astype("f4")))


def _assemble(tm, edge_convs, head_modules, head_last_idx):
    params, stats = {}, {}
    for i, ec in enumerate(edge_convs):
        p, s = _edge_conv(ec)
        params[f"EdgeConv_{i}"] = p
        stats[f"EdgeConv_{i}"] = s
    p, s = _shared_fc(tm.global_feature[0])
    params["SharedMLP_0"] = p
    stats["SharedMLP_0"] = s
    for j, mod in enumerate(head_modules):
        last = j == head_last_idx
        p, s = _shared_fc(mod, last=last)
        params[f"SharedMLP_{j + 1}"] = p
        if s is not None:
            stats[f"SharedMLP_{j + 1}"] = s
    return {"params": params, "batch_stats": stats}


def _tree_paths(tree):
    return {jax.tree_util.keystr(kp): np.shape(leaf)
            for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _run_parity(torch_model, flax_model, variables, x_np, rng):
    # structural check: the copied tree must match what init would build
    init_vars = flax_model.init(jax.random.PRNGKey(0),
                                jnp.asarray(x_np), train=False)
    assert _tree_paths(init_vars) == _tree_paths(variables)

    torch_model.eval()
    with torch.no_grad():
        out_t = t2n(torch_model(torch.from_numpy(x_np.transpose(0, 2, 1))))
    with jax.default_matmul_precision("float32"):
        out_j = np.asarray(flax_model.apply(variables, jnp.asarray(x_np),
                                            train=False))
    return out_t, out_j


def test_dgcnn_seg_forward_matches_reference(rng):
    ref = import_ref("models.dgcnn")
    from fissure_segmentation_tpu.models import DGCNNSeg

    torch.manual_seed(0)
    tm = ref.DGCNNSeg(k=6, in_features=4, num_classes=4, dynamic=False)
    _randomize_bn_buffers(tm, rng)
    variables = _assemble(tm, [tm.ec1, tm.ec2, tm.ec3],
                          list(tm.segmentation), head_last_idx=3)

    x = rng.normal(size=(2, 48, 4)).astype("f4")
    jm = DGCNNSeg(k=6, in_features=4, num_classes=4, dynamic=False)
    out_t, out_j = _run_parity(tm, jm, variables, x, rng)
    np.testing.assert_allclose(out_j, out_t.transpose(0, 2, 1),
                               rtol=2e-4, atol=2e-4)


def _conv3d_kernel(conv) -> np.ndarray:
    """torch Conv3d weight (out, in/g, kd, kh, kw) -> flax (kd, kh, kw, in/g, out)."""
    return t2n(conv.weight).transpose(2, 3, 4, 1, 0).copy()


def _conv_bn(seq, conv_idx=0, bn_idx=1):
    p, s = _bn(seq[bn_idx])
    return {"kernel": _conv3d_kernel(seq[conv_idx])}, p, s


def _assemble_mobilenet(model):
    """Reference MobileNetASPP -> full flax variables tree."""
    params, stats = {}, {}
    # backbone: layers[0] is Identity; blocks may be wrapped in ResBlock
    mb_p, mb_s = {}, {}
    for i, block in enumerate(list(model.backbone.layers)[1:]):
        seq = block.module if hasattr(block, "module") else block
        bp, bs = {}, {}
        for j, (ci, bi) in enumerate([(0, 1), (3, 4), (6, 7)]):
            k, p, s = _conv_bn(seq, ci, bi)
            bp[f"Conv_{j}"] = k
            bp[f"BatchNorm_{j}"] = p
            bs[f"BatchNorm_{j}"] = s
        name = f"Checkpoint_InvertedResidual_{i}"
        mb_p[name], mb_s[name] = bp, bs
    params["MobileNet3D_0"], stats["MobileNet3D_0"] = mb_p, mb_s

    # ASPP: 1x1 + 4 atrous + pooling branches, then the projection
    ap, as_ = {}, {}
    for j, branch in enumerate(model.aspp.convs):
        k, p, s = _conv_bn(branch)
        ap[f"Conv_{j}"] = k
        ap[f"BatchNorm_{j}"] = p
        as_[f"BatchNorm_{j}"] = s
    k, p, s = _conv_bn(model.aspp.project)
    ap["Conv_6"], ap["BatchNorm_6"], as_["BatchNorm_6"] = k, p, s
    params["CheckpointASPP_0"], stats["CheckpointASPP_0"] = ap, as_

    # head: conv/bn/relu, conv/bn/relu, conv(+bias)
    for j, (ci, bi) in enumerate([(0, 1), (3, 4)]):
        k, p, s = _conv_bn(model.head, ci, bi)
        params[f"Conv_{j}"] = k
        params[f"BatchNorm_{j}"] = p
        stats[f"BatchNorm_{j}"] = s
    params["Conv_2"] = {"kernel": _conv3d_kernel(model.head[6]),
                        "bias": t2n(model.head[6].bias).copy()}
    return {"params": params, "batch_stats": stats}


@pytest.mark.slow
def test_mobilenet_aspp_forward_matches_reference(rng):
    """Voxel-CNN full-forward parity (seg_cnn.py:100-126, mobilenet.py:16-52,
    aspp_3d.py:58-86): backbone inverted residuals incl. the grouped
    depthwise convs, the 6-branch ASPP + projection, the conv head, and both
    nearest/trilinear x2 upsamplings."""
    ref = import_ref("models.seg_cnn")
    from fissure_segmentation_tpu.models import MobileNetASPP

    torch.manual_seed(2)
    tm = ref.MobileNetASPP(num_classes=3, patch_size=(16, 16, 16))
    _randomize_bn_buffers(tm, rng)
    variables = _assemble_mobilenet(tm)

    x = rng.normal(size=(1, 16, 16, 16, 1)).astype("f4")
    jm = MobileNetASPP(num_classes=3, patch_size=(16, 16, 16))
    init_vars = jm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert _tree_paths(init_vars) == _tree_paths(variables)

    tm.eval()
    with torch.no_grad():
        out_t = t2n(tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))))
    with jax.default_matmul_precision("float32"):
        out_j = np.asarray(jm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out_j, out_t.transpose(0, 2, 3, 4, 1),
                               rtol=1e-3, atol=1e-3)


def _folding_net_vars(tm):
    """Reference DGCNNFoldingNet (FoldingDecoder variant) -> flax tree."""
    enc_p, enc_s = {}, {}
    for j, conv in enumerate([tm.encoder.conv1, tm.encoder.conv2,
                              tm.encoder.conv3, tm.encoder.conv4]):
        p, s = _bn(conv[1])
        enc_p[f"EdgeMLP_{j}"] = {"kernel": _conv_kernel(conv[0]),
                                 "BatchNorm_0": p}
        enc_s[f"EdgeMLP_{j}"] = {"BatchNorm_0": s}
    p, s = _bn(tm.encoder.conv5[1])
    enc_p["SharedMLP_0"] = {"Dense_0": {"kernel": _conv_kernel(tm.encoder.conv5[0])},
                            "BatchNorm_0": p}
    enc_s["SharedMLP_0"] = {"BatchNorm_0": s}

    dec_p = {}
    for j, conv in enumerate([tm.decoder.folding1[0], tm.decoder.folding1[2],
                              tm.decoder.folding1[4], tm.decoder.folding2[0],
                              tm.decoder.folding2[2], tm.decoder.folding2[4]]):
        dec_p[f"Dense_{j}"] = {"kernel": _conv_kernel(conv),
                               "bias": t2n(conv.bias).copy()}
    return {"params": {"DGCNNClsEncoder_0": enc_p,
                       "FoldingDecoder_0": dec_p},
            "batch_stats": {"DGCNNClsEncoder_0": enc_s}}


@pytest.mark.slow
def test_folding_net_forward_matches_reference(rng):
    """PC-AE full-forward parity (folding_net.py:42-228): the open-source
    DGCNN cls encoder (4 single-layer EdgeConvs with self-loop kNN,
    dgcnn_opensrc.py:34-66) + two-stage FoldingDecoder over the fixed 45x45
    +-0.3 plane (shape_constructor.py:35-40 -> m=2025, the only m the
    reference's non-mesh plane path supports)."""
    ref = import_ref("models.folding_net")
    from fissure_segmentation_tpu.models import DGCNNFoldingNet

    torch.manual_seed(3)
    emb = 16
    tm = ref.DGCNNFoldingNet(k=6, n_embedding=emb, shape_type="plane",
                             n_input_points=2025, decode_mesh=False,
                             static=True)
    _randomize_bn_buffers(tm, rng)
    variables = _folding_net_vars(tm)

    x = rng.normal(size=(2, 64, 3)).astype("f4")
    jm = DGCNNFoldingNet(k=6, n_embedding=emb, shape_type="plane",
                         n_input_points=2025, decode_mesh=False, static=True)
    out_t, out_j = _run_parity(tm, jm, variables, x, rng)
    # reference decodes channel-first: (B, 3, m)
    np.testing.assert_allclose(out_j, out_t.transpose(0, 2, 1),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_folding_net_gradients_match_reference(rng):
    """Backward parity for the PC-AE: pins the self-loop-kNN EdgeMLP gather
    backward (a different neighbor pattern than DGCNNSeg's static graph) and
    the folding-decoder chain."""
    import copy

    ref = import_ref("models.folding_net")
    from fissure_segmentation_tpu.models import DGCNNFoldingNet

    torch.manual_seed(14)
    emb = 16
    tm = ref.DGCNNFoldingNet(k=6, n_embedding=emb, shape_type="plane",
                             n_input_points=2025, decode_mesh=False,
                             static=True)
    _randomize_bn_buffers(tm, rng)
    variables = _folding_net_vars(tm)

    x = rng.normal(size=(2, 64, 3)).astype("f4")
    w = rng.normal(size=(2, 3, 2025)).astype("f4")

    tm.eval()
    out_t = tm(torch.from_numpy(x.transpose(0, 2, 1)))
    loss_t = (out_t * torch.from_numpy(w)).mean()
    loss_t.backward()
    clone = copy.deepcopy(tm)
    for pc, pp in zip(clone.parameters(), tm.parameters()):
        pc.data = pp.grad if pp.grad is not None else torch.zeros_like(pp)
    grads_t = _folding_net_vars(clone)["params"]

    jm = DGCNNFoldingNet(k=6, n_embedding=emb, shape_type="plane",
                         n_input_points=2025, decode_mesh=False, static=True)

    def loss_j(prm):
        out = jm.apply({"params": prm,
                        "batch_stats": variables["batch_stats"]},
                       jnp.asarray(x), train=False)
        return jnp.mean(out * jnp.asarray(w.transpose(0, 2, 1)))

    with jax.default_matmul_precision("float32"):
        loss_val, grads_j = jax.value_and_grad(loss_j)(variables["params"])
    np.testing.assert_allclose(float(loss_val), float(loss_t.detach()),
                               rtol=1e-5)
    flat_t = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(grads_t)[0]}
    flat_j = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(grads_j)[0]}
    assert flat_t.keys() == flat_j.keys()
    for key in flat_t:
        np.testing.assert_allclose(np.asarray(flat_j[key]), flat_t[key],
                                   rtol=1e-3, atol=1e-5, err_msg=key)


@pytest.mark.slow
def test_dgcnn_seg_st_imgfeat_forward_matches_reference(rng):
    """DGCNNSeg with BOTH optional modules: the 1x1-conv ImageFeatures
    embedding (dgcnn.py:326-343) and the SpatialTransformer (zero-kernel /
    identity-bias transform head, dgcnn.py:246-279), static graph computed
    from the pre-transform coords like the reference."""
    ref = import_ref("models.dgcnn")
    from fissure_segmentation_tpu.models import DGCNNSeg

    torch.manual_seed(12)
    tm = ref.DGCNNSeg(k=6, in_features=6, num_classes=4, dynamic=False,
                      spatial_transformer=True, image_feat_module=True)
    _randomize_bn_buffers(tm, rng)
    variables = _assemble(tm, [tm.ec1, tm.ec2, tm.ec3],
                          list(tm.segmentation), head_last_idx=3)

    def lin(m):
        d = {"kernel": t2n(m.weight).T.copy()}
        if m.bias is not None:
            d["bias"] = t2n(m.bias).copy()
        return d

    # ImageFeatures: two ConvBlocks (conv1d + BN + LeakyReLU 1e-2)
    if_p, if_s = {}, {}
    for j, block in enumerate(tm.image_feature_module.layers):
        p, s = _bn(block.layers[1])
        if_p[f"SharedMLP_{j}"] = {
            "Dense_0": {"kernel": _conv_kernel(block.layers[0])},
            "BatchNorm_0": p}
        if_s[f"SharedMLP_{j}"] = {"BatchNorm_0": s}
    variables["params"]["ImageFeatures_0"] = if_p
    variables["batch_stats"]["ImageFeatures_0"] = if_s

    # SpatialTransformer: EdgeConv([64,128]) + SharedFC(1024) + 2-layer MLP
    # + the zero-init/identity-bias transform head
    st = tm.spatial_transformer
    st_p, st_s = _edge_conv(st.ec)
    p, s = _bn(st.shared_fc.layers[1])
    sp = {"EdgeConv_0": st_p,
          "SharedMLP_0": {"Dense_0": {"kernel": _conv_kernel(st.shared_fc.layers[0])},
                          "BatchNorm_0": p}}
    ss = {"EdgeConv_0": st_s, "SharedMLP_0": {"BatchNorm_0": s}}
    p, s = _bn(st.mlp[1])
    sp["Dense_0"], sp["BatchNorm_0"], ss["BatchNorm_0"] = lin(st.mlp[0]), p, s
    p, s = _bn(st.mlp[4])
    sp["Dense_1"], sp["BatchNorm_1"], ss["BatchNorm_1"] = lin(st.mlp[3]), p, s
    sp["Dense_2"] = lin(st.transform)
    variables["params"]["SpatialTransformer_0"] = sp
    variables["batch_stats"]["SpatialTransformer_0"] = ss

    x = rng.normal(size=(2, 48, 6)).astype("f4")
    jm = DGCNNSeg(k=6, in_features=6, num_classes=4, dynamic=False,
                  spatial_transformer=True, image_feat_module=True)
    out_t, out_j = _run_parity(tm, jm, variables, x, rng)
    np.testing.assert_allclose(out_j, out_t.transpose(0, 2, 1),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_dgcnn_seg_gradients_match_reference(rng):
    """Backward-pass golden parity for the flagship model: with copied
    weights and the same scalar loss, every parameter gradient must match
    the reference autograd — pinning the fused matmul-before-gather EdgeMLP
    custom VJP (ops/edge.py), the scatter-add backward of the neighbor
    gather, and the max-pool subgradients. BN buffers are frozen (eval-mode
    statistics) so only parameter gradients are compared."""
    import copy

    ref = import_ref("models.dgcnn")
    from fissure_segmentation_tpu.models import DGCNNSeg

    torch.manual_seed(6)
    tm = ref.DGCNNSeg(k=6, in_features=4, num_classes=4, dynamic=False)
    _randomize_bn_buffers(tm, rng)
    variables = _assemble(tm, [tm.ec1, tm.ec2, tm.ec3],
                          list(tm.segmentation), head_last_idx=3)

    x = rng.normal(size=(2, 48, 4)).astype("f4")
    w = rng.normal(size=(2, 48, 4)).astype("f4")  # fixed projection weights

    tm.eval()  # frozen BN statistics; grads still flow
    out_t = tm(torch.from_numpy(x.transpose(0, 2, 1)))
    loss_t = (out_t * torch.from_numpy(w.transpose(0, 2, 1))).mean()
    loss_t.backward()

    # re-read the torch grads through the same weight-mapping helpers by
    # loading each parameter's .grad into a cloned model's .data
    clone = copy.deepcopy(tm)
    for pc, p in zip(clone.parameters(), tm.parameters()):
        pc.data = p.grad if p.grad is not None else torch.zeros_like(p)
    grads_t = _assemble(clone, [clone.ec1, clone.ec2, clone.ec3],
                        list(clone.segmentation), head_last_idx=3)["params"]

    jm = DGCNNSeg(k=6, in_features=4, num_classes=4, dynamic=False)

    def loss_j(params):
        out = jm.apply({"params": params,
                        "batch_stats": variables["batch_stats"]},
                       jnp.asarray(x), train=False)
        return jnp.mean(out * jnp.asarray(w))

    with jax.default_matmul_precision("float32"):
        loss_val, grads_j = jax.value_and_grad(loss_j)(variables["params"])

    np.testing.assert_allclose(float(loss_val), float(loss_t.detach()),
                               rtol=1e-5)
    flat_t = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(grads_t)[0]}
    flat_j = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(grads_j)[0]}
    assert flat_t.keys() == flat_j.keys()
    for key in flat_t:
        np.testing.assert_allclose(
            np.asarray(flat_j[key]), flat_t[key], rtol=1e-3, atol=1e-5,
            err_msg=key)


@pytest.mark.slow
def test_mobilenet_aspp_gradients_match_reference(rng):
    """Backward parity for the voxel CNN: pins conv3d / grouped-depthwise /
    dilated-conv gradients and the nearest+trilinear resize backwards."""
    import copy

    ref = import_ref("models.seg_cnn")
    from fissure_segmentation_tpu.models import MobileNetASPP

    torch.manual_seed(7)
    tm = ref.MobileNetASPP(num_classes=3, patch_size=(16, 16, 16))
    _randomize_bn_buffers(tm, rng)

    variables = _assemble_mobilenet(tm)
    x = rng.normal(size=(1, 16, 16, 16, 1)).astype("f4")
    w = rng.normal(size=(1, 16, 16, 16, 3)).astype("f4")

    tm.eval()
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    xt.requires_grad_(True)  # torch checkpoint needs a grad-requiring input
    out_t = tm(xt)
    loss_t = (out_t * torch.from_numpy(w.transpose(0, 4, 1, 2, 3))).mean()
    loss_t.backward()
    clone = copy.deepcopy(tm)
    for pc, p in zip(clone.parameters(), tm.parameters()):
        pc.data = p.grad if p.grad is not None else torch.zeros_like(p)
    grads_t = _assemble_mobilenet(clone)["params"]

    jm = MobileNetASPP(num_classes=3, patch_size=(16, 16, 16))

    def loss_j(params):
        out = jm.apply({"params": params,
                        "batch_stats": variables["batch_stats"]},
                       jnp.asarray(x), train=False)
        return jnp.mean(out * jnp.asarray(w))

    with jax.default_matmul_precision("float32"):
        loss_val, grads_j = jax.value_and_grad(loss_j)(variables["params"])

    np.testing.assert_allclose(float(loss_val), float(loss_t.detach()),
                               rtol=1e-4)
    flat_t = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(grads_t)[0]}
    flat_j = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(grads_j)[0]}
    assert flat_t.keys() == flat_j.keys()
    for key in flat_t:
        np.testing.assert_allclose(
            np.asarray(flat_j[key]), flat_t[key], rtol=1e-3, atol=1e-4,
            err_msg=key)


@pytest.mark.slow
def test_point_transformer_layer_matches_reference(rng):
    """Vector self-attention golden parity (seg_model.py:17-53), the core of
    the one CUDA-bound reference model. The CUDA `pointops.queryandgroup` is
    replaced by an equivalent pure-torch shim (sorted kNN gather, relative
    xyz) so the reference layer runs on CPU; q/k/v projections, positional
    encoding MLP, the share_planes-grouped weight MLP, neighbor-axis softmax
    and the grouped weighted sum are then compared against our layer."""
    ref = import_ref("models.pointtransformer.seg_model")
    from fissure_segmentation_tpu.models.point_transformer import \
        PointTransformerLayer

    def queryandgroup(nsample, xyz, new_xyz, feat, idx, offset, new_offset,
                      use_xyz=True):
        d = torch.cdist(new_xyz, xyz)
        nn_idx = d.topk(nsample, largest=False).indices  # (m, ns) ascending
        grouped_xyz = xyz[nn_idx] - new_xyz.unsqueeze(1)
        grouped_feat = feat[nn_idx]
        if use_xyz:
            return torch.cat([grouped_xyz, grouped_feat], -1)
        return grouped_feat

    ref.pointops.queryandgroup = queryandgroup

    torch.manual_seed(8)
    c, s, ns, n = 16, 8, 4, 32
    tm = ref.PointTransformerLayer(in_planes=c, out_planes=c,
                                   share_planes=s, nsample=ns)
    _randomize_bn_buffers(tm, rng)

    def lin(m):
        d = {"kernel": t2n(m.weight).T.copy()}
        if m.bias is not None:
            d["bias"] = t2n(m.bias).copy()
        return d

    p0, s0 = _bn(tm.linear_p[1])
    p1, s1 = _bn(tm.linear_w[0])
    p2, s2 = _bn(tm.linear_w[3])
    variables = {
        "params": {"Dense_0": lin(tm.linear_q), "Dense_1": lin(tm.linear_k),
                   "Dense_2": lin(tm.linear_v),
                   "Dense_3": lin(tm.linear_p[0]), "BatchNorm_0": p0,
                   "Dense_4": lin(tm.linear_p[3]),
                   "BatchNorm_1": p1, "Dense_5": lin(tm.linear_w[2]),
                   "BatchNorm_2": p2, "Dense_6": lin(tm.linear_w[5])},
        "batch_stats": {"BatchNorm_0": s0, "BatchNorm_1": s1,
                        "BatchNorm_2": s2},
    }

    p = rng.normal(size=(n, 3)).astype("f4")
    x = rng.normal(size=(n, c)).astype("f4")

    tm.eval()
    with torch.no_grad():
        out_t = t2n(tm([torch.from_numpy(p), torch.from_numpy(x),
                        torch.tensor([n])]))

    jm = PointTransformerLayer(out_planes=c, share_planes=s, nsample=ns)
    init_vars = jm.init(jax.random.PRNGKey(0), jnp.asarray(p[None]),
                        jnp.asarray(x[None]), train=False)
    assert _tree_paths(init_vars) == _tree_paths(variables)
    with jax.default_matmul_precision("float32"):
        out_j = np.asarray(jm.apply(variables, jnp.asarray(p[None]),
                                    jnp.asarray(x[None]), train=False))[0]
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_point_transformer_layer_gradients_match_reference(rng):
    """Backward parity for the vector self-attention layer: with copied
    weights and the same scalar loss every parameter gradient must match
    torch autograd (through the kNN gathers, neighbor softmax and the
    share_planes-grouped weighted sum)."""
    import copy

    ref = import_ref("models.pointtransformer.seg_model")
    from fissure_segmentation_tpu.models.point_transformer import \
        PointTransformerLayer

    def queryandgroup(nsample, xyz, new_xyz, feat, idx, offset, new_offset,
                      use_xyz=True):
        d = torch.cdist(new_xyz, xyz)
        nn_idx = d.topk(nsample, largest=False).indices
        grouped_xyz = xyz[nn_idx] - new_xyz.unsqueeze(1)
        grouped_feat = feat[nn_idx]
        if use_xyz:
            return torch.cat([grouped_xyz, grouped_feat], -1)
        return grouped_feat

    ref.pointops.queryandgroup = queryandgroup

    torch.manual_seed(13)
    c, s, ns, n = 16, 8, 4, 32
    tm = ref.PointTransformerLayer(in_planes=c, out_planes=c,
                                   share_planes=s, nsample=ns)
    _randomize_bn_buffers(tm, rng)
    params, stats = _pt_layer_params(tm)
    variables = {"params": params, "batch_stats": stats}

    p = rng.normal(size=(n, 3)).astype("f4")
    x = rng.normal(size=(n, c)).astype("f4")
    w = rng.normal(size=(n, c)).astype("f4")

    tm.eval()
    out_t = tm([torch.from_numpy(p), torch.from_numpy(x), torch.tensor([n])])
    loss_t = (out_t * torch.from_numpy(w)).mean()
    loss_t.backward()
    clone = copy.deepcopy(tm)
    for pc, pp in zip(clone.parameters(), tm.parameters()):
        pc.data = pp.grad if pp.grad is not None else torch.zeros_like(pp)
    grads_t, _ = _pt_layer_params(clone)

    jm = PointTransformerLayer(out_planes=c, share_planes=s, nsample=ns)

    def loss_j(prm):
        out = jm.apply({"params": prm, "batch_stats": variables["batch_stats"]},
                       jnp.asarray(p[None]), jnp.asarray(x[None]),
                       train=False)
        return jnp.mean(out[0] * jnp.asarray(w))

    with jax.default_matmul_precision("float32"):
        loss_val, grads_j = jax.value_and_grad(loss_j)(variables["params"])
    np.testing.assert_allclose(float(loss_val), float(loss_t.detach()),
                               rtol=1e-5)
    flat_t = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(grads_t)[0]}
    flat_j = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(grads_j)[0]}
    assert flat_t.keys() == flat_j.keys()
    for key in flat_t:
        np.testing.assert_allclose(np.asarray(flat_j[key]), flat_t[key],
                                   rtol=1e-3, atol=1e-5, err_msg=key)


def _install_pointops_shims(ref):
    """Pure-torch single-batch replacements for the CUDA pointops used by
    the reference PointTransformer (pointops.py:16-255): FPS seeded at
    index 0 with argmax tie-breaks, sorted self-inclusive kNN gather, and
    normalized inverse-distance 3-NN interpolation — the exact semantics
    ops/fps.py and ops/pointops.py implement."""

    def furthestsampling(p, o, n_o):
        n, m = int(o[0]), int(n_o[0])
        idx = torch.zeros(m, dtype=torch.int32)
        min_d = torch.full((n,), 1e10)
        last = 0
        for i in range(1, m):
            d = ((p - p[last]) ** 2).sum(1)
            min_d = torch.minimum(min_d, d)
            last = int(torch.argmax(min_d))
            idx[i] = last
        return idx

    def queryandgroup(nsample, xyz, new_xyz, feat, idx, offset, new_offset,
                      use_xyz=True):
        d = torch.cdist(new_xyz, xyz)
        nn_idx = d.topk(nsample, largest=False).indices
        grouped_xyz = xyz[nn_idx] - new_xyz.unsqueeze(1)
        grouped_feat = feat[nn_idx]
        if use_xyz:
            return torch.cat([grouped_xyz, grouped_feat], -1)
        return grouped_feat

    def interpolation(xyz, new_xyz, feat, offset, new_offset, k=3):
        d = torch.cdist(new_xyz, xyz)
        dist, idx = d.topk(min(k, xyz.shape[0]), largest=False)
        rec = 1.0 / (dist + 1e-8)
        w = rec / rec.sum(1, keepdim=True)
        return (feat[idx] * w.unsqueeze(-1)).sum(1)

    ref.pointops.furthestsampling = furthestsampling
    ref.pointops.queryandgroup = queryandgroup
    ref.pointops.interpolation = interpolation


def _pt_layer_params(layer):
    """PointTransformerLayer weights -> our flax layer tree (see
    test_point_transformer_layer_matches_reference)."""
    def lin(m):
        d = {"kernel": t2n(m.weight).T.copy()}
        if m.bias is not None:
            d["bias"] = t2n(m.bias).copy()
        return d

    p0, s0 = _bn(layer.linear_p[1])
    p1, s1 = _bn(layer.linear_w[0])
    p2, s2 = _bn(layer.linear_w[3])
    params = {"Dense_0": lin(layer.linear_q), "Dense_1": lin(layer.linear_k),
              "Dense_2": lin(layer.linear_v), "Dense_3": lin(layer.linear_p[0]),
              "BatchNorm_0": p0, "Dense_4": lin(layer.linear_p[3]),
              "BatchNorm_1": p1, "Dense_5": lin(layer.linear_w[2]),
              "BatchNorm_2": p2, "Dense_6": lin(layer.linear_w[5])}
    stats = {"BatchNorm_0": s0, "BatchNorm_1": s1, "BatchNorm_2": s2}
    return params, stats


def _pt_block_params(block):
    """PointTransformerBlock (seg_model.py:120-141) -> our flax block."""
    lp, ls = _pt_layer_params(block.transformer2)
    p1, s1 = _bn(block.bn1)
    p2, s2 = _bn(block.bn2)
    p3, s3 = _bn(block.bn3)
    params = {"Dense_0": {"kernel": t2n(block.linear1.weight).T.copy()},
              "BatchNorm_0": p1, "PointTransformerLayer_0": lp,
              "BatchNorm_1": p2,
              "Dense_1": {"kernel": t2n(block.linear3.weight).T.copy()},
              "BatchNorm_2": p3}
    stats = {"BatchNorm_0": s1, "PointTransformerLayer_0": ls,
             "BatchNorm_1": s2, "BatchNorm_2": s3}
    return params, stats


@pytest.mark.slow
def test_point_transformer_seg_forward_matches_reference(rng):
    """FULL PointTransformerSeg forward parity (seg_model.py:145-211) — the
    one CUDA-bound reference model, run on CPU via pure-torch pointops shims:
    5 FPS/kNN TransitionDown stages, decoder TransitionUps (global-context
    summit head + inverse-distance interpolation fusion), vector-attention
    blocks, and the cls head. blocks=[1,1,1,1,1] keeps encoder attention out
    (covered by the layer test) while every distinct module type runs."""
    ref = import_ref("models.pointtransformer.seg_model")
    from fissure_segmentation_tpu.models.point_transformer import \
        PointTransformerSeg

    _install_pointops_shims(ref)
    torch.manual_seed(9)
    tm = ref.PointTransformerSeg(ref.PointTransformerBlock, [1, 1, 1, 1, 1],
                                 c=4, k=3)
    _randomize_bn_buffers(tm, rng)
    variables = _pt_seg_variables(tm)

    n = 4096  # stage sizes 4096/1024/256/64/16 keep every kNN >= nsample
    p_np = rng.normal(size=(n, 3)).astype("f4")
    f_np = rng.normal(size=(n, 1)).astype("f4")

    tm.eval()
    with torch.no_grad():
        out_t = t2n(tm([torch.from_numpy(p_np), torch.from_numpy(f_np),
                        torch.tensor([n])]))

    x = np.concatenate([p_np, f_np], -1)[None]  # (1, N, 4), coords first
    jm = PointTransformerSeg(in_features=4, num_classes=3,
                             blocks=(1, 1, 1, 1, 1))
    init_vars = jm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert _tree_paths(init_vars) == _tree_paths(variables)
    with jax.default_matmul_precision("float32"):
        out_j = np.asarray(jm.apply(variables, jnp.asarray(x),
                                    train=False))[0]
    np.testing.assert_allclose(out_j, out_t, rtol=5e-4, atol=5e-4)


def _pt_seg_variables(tm):
    """Full PointTransformerSeg weight tree (seg_model.py:145-211) -> our
    flax variables (shared by the forward and gradient parity tests)."""
    def lin(m):
        d = {"kernel": t2n(m.weight).T.copy()}
        if m.bias is not None:
            d["bias"] = t2n(m.bias).copy()
        return d

    params, stats = {}, {}
    for i, enc in enumerate([tm.enc1, tm.enc2, tm.enc3, tm.enc4, tm.enc5]):
        td = enc[0]
        p, s = _bn(td.bn)
        params[f"TransitionDown_{i}"] = {
            "Dense_0": {"kernel": t2n(td.linear.weight).T.copy()},
            "BatchNorm_0": p}
        stats[f"TransitionDown_{i}"] = {"BatchNorm_0": s}
    # decoder head (dec5): TransitionUp(in, None) + one block
    tu = tm.dec5[0]
    p, s = _bn(tu.linear1[1])
    params["TransitionUp_0"] = {"Dense_0": lin(tu.linear2[0]),
                                "Dense_1": lin(tu.linear1[0]),
                                "BatchNorm_0": p}
    stats["TransitionUp_0"] = {"BatchNorm_0": s}
    bp, bs = _pt_block_params(tm.dec5[1])
    params["PointTransformerBlock_0"], stats["PointTransformerBlock_0"] = bp, bs
    for j, dec in enumerate([tm.dec4, tm.dec3, tm.dec2, tm.dec1]):
        tu = dec[0]
        p1, s1 = _bn(tu.linear1[1])
        p2, s2 = _bn(tu.linear2[1])
        params[f"TransitionUp_{j + 1}"] = {
            "Dense_0": lin(tu.linear1[0]), "BatchNorm_0": p1,
            "Dense_1": lin(tu.linear2[0]), "BatchNorm_1": p2}
        stats[f"TransitionUp_{j + 1}"] = {"BatchNorm_0": s1,
                                          "BatchNorm_1": s2}
        bp, bs = _pt_block_params(dec[1])
        params[f"PointTransformerBlock_{j + 1}"] = bp
        stats[f"PointTransformerBlock_{j + 1}"] = bs
    p, s = _bn(tm.cls[1])
    params["Dense_0"] = lin(tm.cls[0])
    params["BatchNorm_0"] = p
    stats["BatchNorm_0"] = s
    params["Dense_1"] = lin(tm.cls[3])
    return {"params": params, "batch_stats": stats}


@pytest.mark.slow
def test_point_transformer_seg_gradients_match_reference(rng):
    """FULL-model backward parity for PointTransformerSeg: with copied
    weights and the same scalar loss, every parameter gradient must match
    torch autograd — pinning the FPS index sequences, kNN-gather transposes
    (scatter-add), inverse-distance interpolation backward and the summit
    global-context path end-to-end (VERDICT r2 item 7; layer-level grads are
    covered separately above)."""
    import copy

    ref = import_ref("models.pointtransformer.seg_model")
    from fissure_segmentation_tpu.models.point_transformer import \
        PointTransformerSeg

    _install_pointops_shims(ref)
    torch.manual_seed(9)
    tm = ref.PointTransformerSeg(ref.PointTransformerBlock, [1, 1, 1, 1, 1],
                                 c=4, k=3)
    _randomize_bn_buffers(tm, rng)
    variables = _pt_seg_variables(tm)

    n = 4096
    p_np = rng.normal(size=(n, 3)).astype("f4")
    f_np = rng.normal(size=(n, 1)).astype("f4")
    w_np = rng.normal(size=(n, 3)).astype("f4")

    tm.eval()
    out_t = tm([torch.from_numpy(p_np), torch.from_numpy(f_np),
                torch.tensor([n])])
    loss_t = (out_t * torch.from_numpy(w_np)).mean()
    loss_t.backward()
    clone = copy.deepcopy(tm)
    for pc, pp in zip(clone.parameters(), tm.parameters()):
        pc.data = pp.grad if pp.grad is not None else torch.zeros_like(pp)
    grads_t = _pt_seg_variables(clone)["params"]

    x = np.concatenate([p_np, f_np], -1)[None]
    jm = PointTransformerSeg(in_features=4, num_classes=3,
                             blocks=(1, 1, 1, 1, 1))

    def loss_j(prm):
        out = jm.apply({"params": prm,
                        "batch_stats": variables["batch_stats"]},
                       jnp.asarray(x), train=False)
        return jnp.mean(out[0] * jnp.asarray(w_np))

    with jax.default_matmul_precision("float32"):
        loss_val, grads_j = jax.value_and_grad(loss_j)(variables["params"])
    # 5 encoder/decoder stages of f32 accumulation-order differences: the
    # scalar loss agrees to ~5e-5 rel (forward parity is pinned at 5e-4 by
    # the test above); the per-parameter gradients are the assertion here
    np.testing.assert_allclose(float(loss_val), float(loss_t.detach()),
                               rtol=2e-4)
    flat_t = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(grads_t)[0]}
    flat_j = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(grads_j)[0]}
    assert flat_t.keys() == flat_j.keys()
    for key in flat_t:
        np.testing.assert_allclose(np.asarray(flat_j[key]), flat_t[key],
                                   rtol=1e-3, atol=1e-5, err_msg=key)


def _mlp_block(block):
    """Reference MLPBlock (point_net.py:11-30: [conv,bn,lrelu]*n) -> our
    MLPStack {SharedMLP_i: {Dense_0, BatchNorm_0}}."""
    params, stats = {}, {}
    convs = list(block.layers)
    for i in range(len(convs) // 3):
        p, s = _bn(convs[3 * i + 1])
        params[f"SharedMLP_{i}"] = {
            "Dense_0": {"kernel": _conv_kernel(convs[3 * i])},
            "BatchNorm_0": p}
        stats[f"SharedMLP_{i}"] = {"BatchNorm_0": s}
    return params, stats


def test_pointnet_seg_forward_matches_reference(rng):
    """PointNetSeg full-forward parity (point_net.py:55-100) without
    T-Nets (the reference's TNet head is runtime-broken, point_net.py:44,
    so the transform-free configuration is the only runnable one)."""
    ref = import_ref("models.point_net")
    from fissure_segmentation_tpu.models import PointNetSeg

    torch.manual_seed(5)
    tm = ref.PointNetSeg(in_features=4, num_classes=4,
                         spatial_transform=False, feature_transform=False)
    _randomize_bn_buffers(tm, rng)

    params, stats = {}, {}
    for name, block in [("MLPStack_0", tm.local_features),
                        ("MLPStack_1", tm.global_features[0]),
                        ("MLPStack_2", tm.seg_branch[0])]:
        p, s = _mlp_block(block)
        params[name], stats[name] = p, s
    head = tm.seg_branch[1]
    params["Dense_0"] = {"kernel": _conv_kernel(head),
                         "bias": t2n(head.bias).copy()}
    variables = {"params": params, "batch_stats": stats}

    x = rng.normal(size=(2, 48, 4)).astype("f4")
    jm = PointNetSeg(in_features=4, num_classes=4)
    out_t, out_j = _run_parity(tm, jm, variables, x, rng)
    np.testing.assert_allclose(out_j, out_t.transpose(0, 2, 1),
                               rtol=2e-4, atol=2e-4)


def _dgcnn_cls_params(tm):
    """Reference open-source DGCNN (dgcnn_opensrc.py:101-172) -> our
    DGCNNCls variables tree."""
    params, stats = {}, {}
    for j, conv in enumerate([tm.conv1, tm.conv2, tm.conv3, tm.conv4]):
        p, s = _bn(conv[1])
        params[f"EdgeMLP_{j}"] = {"kernel": _conv_kernel(conv[0]),
                                  "BatchNorm_0": p}
        stats[f"EdgeMLP_{j}"] = {"BatchNorm_0": s}
    p, s = _bn(tm.conv5[1])
    params["SharedMLP_0"] = {"Dense_0": {"kernel": _conv_kernel(tm.conv5[0])},
                             "BatchNorm_0": p}
    stats["SharedMLP_0"] = {"BatchNorm_0": s}
    for j, (lin, bn) in enumerate([(tm.linear1, tm.bn6), (tm.linear2, tm.bn7),
                                   (tm.linear3, None)]):
        d = {"kernel": t2n(lin.weight).T.copy()}
        if lin.bias is not None:
            d["bias"] = t2n(lin.bias).copy()
        params[f"Dense_{j}"] = d
        if bn is not None:
            p, s = _bn(bn)
            params[f"BatchNorm_{j}"] = p
            stats[f"BatchNorm_{j}"] = s
    return params, stats


@pytest.mark.slow
def test_deforming_decoder_forward_matches_reference(rng):
    """PC-AE deform variant (folding_net.py:231-288): residual-offset
    decoder built from SharedFullyConnected stacks, plane grid + z=0."""
    ref = import_ref("models.folding_net")
    from fissure_segmentation_tpu.models import DGCNNFoldingNet

    torch.manual_seed(11)
    emb = 16
    tm = ref.DGCNNFoldingNet(k=6, n_embedding=emb, shape_type="plane",
                             n_input_points=2025, decode_mesh=False,
                             static=True, deform=True, dec_depth=2)
    _randomize_bn_buffers(tm, rng)

    enc_p, enc_s = {}, {}
    for j, conv in enumerate([tm.encoder.conv1, tm.encoder.conv2,
                              tm.encoder.conv3, tm.encoder.conv4]):
        p, s = _bn(conv[1])
        enc_p[f"EdgeMLP_{j}"] = {"kernel": _conv_kernel(conv[0]),
                                 "BatchNorm_0": p}
        enc_s[f"EdgeMLP_{j}"] = {"BatchNorm_0": s}
    p, s = _bn(tm.encoder.conv5[1])
    enc_p["SharedMLP_0"] = {"Dense_0": {"kernel": _conv_kernel(tm.encoder.conv5[0])},
                            "BatchNorm_0": p}
    enc_s["SharedMLP_0"] = {"BatchNorm_0": s}

    dec_p, dec_s = {}, {}
    j = 0
    for layer in tm.decoder.deforming_layers:
        for i, sfc in enumerate(layer):
            last = i == 2
            pj, sj = _shared_fc(sfc, last=last)
            dec_p[f"SharedMLP_{j}"] = pj
            if sj is not None:
                dec_s[f"SharedMLP_{j}"] = sj
            j += 1
    variables = {"params": {"DGCNNClsEncoder_0": enc_p,
                            "DeformingDecoder_0": dec_p},
                 "batch_stats": {"DGCNNClsEncoder_0": enc_s,
                                 "DeformingDecoder_0": dec_s}}

    x = rng.normal(size=(2, 64, 3)).astype("f4")
    jm = DGCNNFoldingNet(k=6, n_embedding=emb, shape_type="plane",
                         n_input_points=2025, decode_mesh=False, static=True,
                         deform=True, dec_depth=2)
    out_t, out_j = _run_parity(tm, jm, variables, x, rng)
    np.testing.assert_allclose(out_j, out_t.transpose(0, 2, 1),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_dgcnn_cls_forward_matches_reference(rng):
    """cls-DGCNN (DGSSM backbone) full-forward parity
    (dgcnn_opensrc.py:101-172): 4 EdgeConvs, emb conv, global max+avg
    pooling, and the 3-layer FC head."""
    from types import SimpleNamespace
    ref = import_ref("models.dgcnn_opensrc")
    from fissure_segmentation_tpu.models import DGCNNCls

    torch.manual_seed(4)
    emb = 32
    args = SimpleNamespace(k=6, emb_dims=emb, dropout=0.0, static=True)
    tm = ref.DGCNN(args, input_channels=3, output_channels=5)
    _randomize_bn_buffers(tm, rng)
    params, stats = _dgcnn_cls_params(tm)
    variables = {"params": params, "batch_stats": stats}

    x = rng.normal(size=(2, 48, 3)).astype("f4")
    jm = DGCNNCls(k=6, output_channels=5, emb_dims=emb, static=True)
    init_vars = jm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert _tree_paths(init_vars) == _tree_paths(variables)

    tm.eval()
    with torch.no_grad():
        out_t = t2n(tm(torch.from_numpy(x.transpose(0, 2, 1))))
    with jax.default_matmul_precision("float32"):
        out_j, _ = jm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out_j), out_t[..., 0],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_dgssm_forward_matches_reference(rng):
    """DG-SSM full-forward parity (dg_ssm.py:91-141) without the affine
    transform (its pytorch3d `compose_transform` can't run under the stubbed
    wheel; the coefficients -> eigenvalue-scaled weights -> SSM decode chain
    and all three regression heads' weights are still exercised): fit the
    reference SSM, copy its modes + the MultiHeadDGCNN weights, and match
    reconstruction and predicted weights."""
    ref = import_ref("models.dg_ssm")
    from fissure_segmentation_tpu.models import DGSSM
    from fissure_segmentation_tpu.shape_model.ssm import SSMParams

    torch.manual_seed(10)
    tm = ref.DGSSM(k=6, in_features=3, dynamic=False,
                   predict_affine_params=False)
    base = torch.from_numpy(rng.normal(size=(1, 64, 3)).astype("f4"))
    shapes = base + 0.1 * torch.from_numpy(
        rng.normal(size=(10, 64, 3)).astype("f4"))
    tm.fit_ssm(shapes)          # re-inits the DGCNN incl. the modes head
    _randomize_bn_buffers(tm, rng)
    modes = int(tm.ssm.num_modes)

    cls_p, cls_s = _dgcnn_cls_params(tm.dgcnn)
    mh_p = {"DGCNNCls_0": cls_p}
    mh_s = {"DGCNNCls_0": cls_s}
    for name in ("translation", "rotation", "scaling"):
        head = tm.dgcnn.heads[name]
        hp, hs = {}, {}
        lins = [m for m in head.layers
                if isinstance(m, torch.nn.Linear)]
        bns = [m for m in head.layers
               if isinstance(m, torch.nn.BatchNorm1d)]
        for j, m in enumerate(lins):
            d = {"kernel": t2n(m.weight).T.copy()}
            if m.bias is not None:
                d["bias"] = t2n(m.bias).copy()
            hp[f"Dense_{j}"] = d
        for j, m in enumerate(bns):
            p, s = _bn(m)
            hp[f"BatchNorm_{j}"] = p
            hs[f"BatchNorm_{j}"] = s
        mh_p[f"head_{name}"] = hp
        mh_s[f"head_{name}"] = hs
    variables = {"params": {"MultiHeadDGCNN_0": mh_p},
                 "batch_stats": {"MultiHeadDGCNN_0": mh_s}}

    ssm = SSMParams(mean_shape=jnp.asarray(t2n(tm.ssm.mean_shape)),
                    eigenvalues=jnp.asarray(t2n(tm.ssm.eigenvalues)),
                    eigenvectors=jnp.asarray(t2n(tm.ssm.eigenvectors)))
    assert ssm.num_modes == modes

    x = rng.normal(size=(2, 48, 3)).astype("f4")
    tm.eval()
    with torch.no_grad():
        rec_t, w_t, aff_t = tm(torch.from_numpy(x.transpose(0, 2, 1)))

    jm = DGSSM(k=6, in_features=3, ssm_modes=modes, dynamic=False,
               predict_affine_params=False)
    init_vars = jm.init(jax.random.PRNGKey(0), jnp.asarray(x), ssm,
                        train=False)
    assert _tree_paths(init_vars) == _tree_paths(variables)
    with jax.default_matmul_precision("float32"):
        rec_j, w_j, aff_j = jm.apply(variables, jnp.asarray(x), ssm,
                                     train=False)
    np.testing.assert_allclose(np.asarray(w_j), t2n(w_t), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(rec_j),
                               t2n(rec_t).transpose(0, 2, 1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(aff_j), t2n(aff_t), atol=1e-7)


def test_dgcnn_reg_forward_matches_reference(rng):
    ref = import_ref("models.dgcnn")
    from fissure_segmentation_tpu.models import DGCNNReg

    torch.manual_seed(1)
    tm = ref.DGCNNReg(k=6, in_features=3, num_classes=9, dynamic=False)
    _randomize_bn_buffers(tm, rng)
    variables = _assemble(tm, [tm.ec1, tm.ec2, tm.ec3, tm.ec4],
                          list(tm.regression), head_last_idx=2)

    x = rng.normal(size=(2, 48, 3)).astype("f4")
    jm = DGCNNReg(k=6, in_features=3, num_classes=9, dynamic=False)
    out_t, out_j = _run_parity(tm, jm, variables, x, rng)
    # reference reg head keeps a trailing length-1 point axis: (B, C, 1)
    np.testing.assert_allclose(out_j, out_t[..., 0], rtol=2e-4, atol=2e-4)
