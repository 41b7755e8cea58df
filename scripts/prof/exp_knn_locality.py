"""Exp: how local are kNN neighbor indices under Morton point ordering?"""
import numpy as np
import os
os.environ["JAX_PLATFORMS"] = "cpu"
from fissure_segmentation_tpu.data.synthetic import make_synthetic_case


def morton_key(pts):
    # quantize to 10 bits per axis, interleave
    q = np.clip(((pts - pts.min(0)) / (np.ptp(pts, 0) + 1e-9) * 1023), 0, 1023).astype(np.uint64)
    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x
    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def knn_np(x, k):
    d = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    return np.argsort(d, axis=1)[:, :k]


rng = np.random.default_rng(0)
fracs = {w: [] for w in (64, 128, 192, 256, 384, 512)}
fracs_rand = {256: []}
maxleft = {w: [] for w in (128, 192, 256, 384)}
for seed in range(4):
    case = make_synthetic_case(seed, n_points=20000)
    pts = case["coords"]
    pts = np.asarray(case["coords"], np.float64)
    sel = rng.choice(len(pts), 2048, replace=False)
    p = pts[sel]
    order = np.argsort(morton_key(p), kind="stable")
    p_sorted = p[order]
    idx = knn_np(p_sorted, 40)
    i = np.arange(2048)[:, None]
    d = np.abs(idx - i)
    for w in fracs:
        fracs[w].append((d <= w).mean())
    for w in maxleft:
        # leftover edges per graph if window +-w
        maxleft[w].append(int((d > w).sum()))
    idx_r = knn_np(p, 40)
    d_r = np.abs(idx_r - np.arange(2048)[:, None])
    fracs_rand[256].append((d_r <= 256).mean())

for w, v in fracs.items():
    print(f"window +-{w:4d}: in-window {np.mean(v)*100:6.2f}%  (min {np.min(v)*100:.2f}%)")
for w, v in maxleft.items():
    print(f"window +-{w:4d}: leftover edges/graph mean {np.mean(v):8.0f} max {np.max(v):8.0f} of {2048*40}")
print(f"random order +-256: {np.mean(fracs_rand[256])*100:.2f}%")
