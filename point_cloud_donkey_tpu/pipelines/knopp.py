"""knopp pipeline: PCL's ImplicitShapeModelEstimation (Knopp et al.,
ECCV 2010) as driven by the reference's eval_pipeline_knopp/pcl_ism.cpp.

Training (implicit_shape_model.hpp trainISM, :769-827):
  per cloud: center = mean of the full cloud; simplifyCloud voxel sampling
  that keeps the SOURCE point nearest each voxel centroid (:1222-1283);
  normals from the full cloud; FPFH at the sampled points; per feature the
  direction to the (centered) origin stored rotated into the per-point
  normal-aligned basis (alignYCoordWithNormal, :1301-1330); k-means codebook
  over all descriptors with k = cluster_rate * N (clusterDescriptors,
  :993-1037; the reference driver sets setClusterRate(1.0), pcl_ism.cpp:93);
  per-class sigma fixed at 0.1 ("objects are scaled to unit circle" HACK,
  :798-800) with calculateSigmas (:1041-1089) as the zero-sigma fallback;
  learned per-word weights = median Gaussian agreement of same-class cluster
  members' center predictions, and statistical per-(class, cluster) weights
  from the vote count statistics (calculateWeights, :1092-1219).

Classification (findObjects :830-926 + findStrongestPeaks :125-247, driven
per class at pcl_ism.cpp:113-150): FPFH at sampled scene points -> nearest
cluster center -> every same-class word of that cluster votes
point + rotateBack(direction) with strength = statistical * learned weight;
per class, 100 mean-shift seeds over the votes (kernel strength *
exp(-d^2/sigma^2), radius 3*sigma, eps sigma/100) with NMS; sigma =
8 * class sigma, NMS radius = 10 * class sigma.

Documented divergences: FPFH here is the standard 33-bin signature (the
reference templates pcl::FPFHEstimation on Histogram<153> but leaves the
default 11-bin axes, pcl_ism.cpp:84); alignYCoordWithNormal guards its
denominators with an epsilon instead of reproducing PCL's division by zero
for axis-aligned normals.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from .building_blocks import PipelineParams
from ..utils.io import load_cloud


def align_y_with_normal(normals: np.ndarray) -> np.ndarray:
    """alignYCoordWithNormal (implicit_shape_model.hpp:1301-1330),
    vectorized: rotation mapping the normal onto the +Y axis, composed of an
    X-axis and a Z-axis rotation.  Returns [N, 3, 3]."""
    n = np.asarray(normals, np.float64)
    eps = 1e-12
    dx = np.sqrt(n[:, 2] ** 2 + n[:, 1] ** 2)
    A = n[:, 1] / np.maximum(dx, eps)
    B = -n[:, 2] / np.maximum(dx, eps)
    N = len(n)
    rx = np.zeros((N, 3, 3))
    rx[:, 0, 0] = 1.0
    rx[:, 1, 1] = A
    rx[:, 1, 2] = -B
    rx[:, 2, 1] = B
    rx[:, 2, 2] = A
    dz = np.sqrt(n[:, 0] ** 2 + n[:, 1] ** 2)
    A2 = n[:, 1] / np.maximum(dz, eps)
    B2 = -n[:, 0] / np.maximum(dz, eps)
    rz = np.zeros((N, 3, 3))
    rz[:, 0, 0] = A2
    rz[:, 0, 1] = -B2
    rz[:, 1, 0] = B2
    rz[:, 1, 1] = A2
    rz[:, 2, 2] = 1.0
    return rx @ rz


def simplify_cloud(xyz: np.ndarray, leaf: float) -> np.ndarray:
    """simplifyCloud (implicit_shape_model.hpp:1222-1283): voxel grid that
    keeps, per voxel, the index of the SOURCE point closest to the voxel
    centroid — sampled points are real surface points, not centroids."""
    keys = np.floor(xyz / leaf).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    nv = len(uniq)
    sums = np.zeros((nv, 3), np.float64)
    np.add.at(sums, inv, xyz)
    centroids = sums / np.bincount(inv, minlength=nv)[:, None]
    d2 = ((xyz - centroids[inv]) ** 2).sum(axis=1)
    best = np.full(nv, -1, np.int64)
    bestd = np.full(nv, np.inf)
    order = np.argsort(d2, kind="stable")
    for i in order:
        v = inv[i]
        if d2[i] < bestd[v]:
            bestd[v] = d2[i]
            best[v] = i
    return best[best >= 0]


class PclIsmTrainedModel:
    """ISMModel analogue (trained state of trainISM)."""

    FIELDS = ("cluster_centers", "word_cluster", "directions", "points",
              "normals", "classes", "learned_weights", "statistical_weights",
              "sigmas")

    def __init__(self, **kw):
        for f in self.FIELDS:
            setattr(self, f, kw[f])
        self.num_classes = int(kw["statistical_weights"].shape[0])
        self.num_clusters = int(kw["cluster_centers"].shape[0])

    def save(self, path: str) -> None:
        np.savez_compressed(path if path.endswith(".npz") else path + ".npz",
                            **{f: getattr(self, f) for f in self.FIELDS})

    @classmethod
    def load(cls, path: str) -> "PclIsmTrainedModel":
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
        z = np.load(path)
        return cls(**{f: z[f] for f in cls.FIELDS})


class PclIsm:
    def __init__(self, params: PipelineParams = None,
                 cluster_rate: float = 1.0, training_sigmas=None):
        self.params = params or PipelineParams(
            normal_radius=0.05, feature_radius=0.4,
            keypoint_sampling_radius=0.2, feature_type="FPFH")
        # setClusterRate (pcl_ism.cpp:93 passes 1.0: k-means with k = N)
        self.cluster_rate = cluster_rate
        # setSigmaDists override (implicit_shape_model.hpp:746-751)
        self.training_sigmas = training_sigmas
        self.model: PclIsmTrainedModel = None

    # -- feature extraction (estimateFeatures on the simplified cloud) -------

    def _extract(self, xyz: np.ndarray):
        """simplify + full-cloud normals + FPFH at the sampled points.
        Returns (sampled points, sampled normals, descriptors); zero-sum
        descriptors dropped (extractDescriptors :966-968)."""
        from ..ops.fpfh import fpfh_descriptor
        from ..ops.normals import compute_normals
        p = self.params
        xyz = np.asarray(xyz, np.float32)
        sel = simplify_cloud(xyz, p.keypoint_sampling_radius)
        # PCL NormalEstimation: full-cloud PCA normals flipped towards the
        # (0,0,0) viewpoint (pcl_ism.cpp:53-54) -> method 0
        full = jnp.asarray(xyz)
        fmask = jnp.ones(len(xyz), bool)
        nrm = np.asarray(compute_normals(full, fmask, p.normal_radius,
                                         method=0).normals)
        spts = xyz[sel]
        snrm = nrm[sel]
        res = fpfh_descriptor(jnp.asarray(spts), jnp.ones(len(spts), bool),
                              jnp.asarray(spts), jnp.asarray(snrm),
                              jnp.ones(len(spts), bool), p.feature_radius)
        desc = np.asarray(res.descriptors, np.float64)
        keep = desc.sum(axis=1) > np.finfo(np.float32).eps
        return spts[keep], snrm[keep], desc[keep]

    # -- training -------------------------------------------------------------

    def train(self, filenames, class_labels, instance_labels, output_file):
        del instance_labels  # PCL ISM trains on class labels only
        all_desc, all_pts, all_nrm, all_dirs, all_cls = [], [], [], [], []
        clouds_per_class: dict = {}
        for fn, c in zip(filenames, class_labels):
            cloud = load_cloud(fn).remove_nan()
            center = cloud.xyz.mean(axis=0)
            pts, nrm, desc = self._extract(cloud.xyz)
            pts = pts - center[None, :]          # shiftCloud (:951-956)
            basis = align_y_with_normal(nrm)     # [F, 3, 3]
            dirs = np.einsum("fab,fb->fa", basis, -pts)  # applyTransform
            all_desc.append(desc)
            all_pts.append(pts)
            all_nrm.append(nrm)
            all_dirs.append(dirs)
            all_cls.append(np.full(len(pts), c, np.int32))
            clouds_per_class.setdefault(int(c), []).append(
                cloud.xyz - center[None, :])
        desc = np.concatenate(all_desc)
        pts = np.concatenate(all_pts)
        nrm = np.concatenate(all_nrm)
        dirs = np.concatenate(all_dirs)
        cls = np.concatenate(all_cls)
        ncls = int(max(class_labels)) + 1
        nfeat = len(desc)

        # clusterDescriptors (:993-1037): k-means, k = cluster_rate * N,
        # kmeans++ seeding, 10 iterations — rides the framework's MXU k-means
        from ..models.clustering import kmeans
        k = max(1, min(nfeat, int(self.cluster_rate * nfeat)))
        centers, labels = kmeans(desc, k, metric="l2", iterations=10)

        sigmas = self._sigmas(ncls, clouds_per_class)
        stat_w, learned_w = self._calculate_weights(
            pts, nrm, dirs, cls, labels, k, ncls, sigmas, clouds_per_class)

        self.model = PclIsmTrainedModel(
            cluster_centers=centers, word_cluster=labels,
            directions=dirs, points=pts, normals=nrm, classes=cls,
            learned_weights=learned_w, statistical_weights=stat_w,
            sigmas=sigmas)
        self.model.save(output_file)

    def _sigmas(self, ncls: int, clouds_per_class) -> np.ndarray:
        """trainISM's sigma HACK (:798-800): constant 0.1 per class (objects
        scaled to the unit sphere), overridable via setSigmaDists."""
        if self.training_sigmas is not None:
            return np.asarray(self.training_sigmas, np.float64)
        return np.full(ncls, 0.1, np.float64)

    @staticmethod
    def _calculate_sigmas(ncls: int, clouds_per_class) -> np.ndarray:
        """calculateSigmas (:1041-1089), the zero-sigma fallback: per class,
        mean over its training clouds of sqrt(max pairwise DOT PRODUCT) / 10
        — PCL sums coordinate products, i.e. a dot product, not a squared
        distance; transcribed as written."""
        out = np.zeros(ncls, np.float64)
        for c, clouds in clouds_per_class.items():
            vals = []
            for xyz in clouds:
                g = np.asarray(xyz, np.float64)
                dots = g @ g.T
                vals.append(np.sqrt(max(dots.max(), 0.0)))
            out[c] = np.mean(vals) / 10.0
        return out

    def _calculate_weights(self, pts, nrm, dirs, cls, labels, k, ncls,
                           sigmas, clouds_per_class):
        """calculateWeights (:1092-1219).

        learned_weights[i]: median over same-class members j of word i's
        cluster of exp(-||predicted_j - actual_i||^2 / sigma_class^2), where
        actual_i = p_i + R_i @ dir_i and predicted_j = p_j + R_j @ dir_i
        (PCL composes with the basis matrix itself on both sides, :1161-1181;
        transcribed as written).

        statistical_weights[c][m] = 1/n_vw[c] * 1/n_vot[m]
            * (n_vot_2[m][c]/n_ftr[c]) / sum_j n_vot_2[m][j]/n_ftr[j]
        (:1197-1218)."""
        nfeat = len(pts)
        # vote-count statistics
        n_vot_2 = np.zeros((k, ncls), np.int64)
        np.add.at(n_vot_2, (labels, cls), 1)
        n_vot = n_vot_2.sum(axis=1)                       # votes per cluster
        n_ftr = np.bincount(cls, minlength=ncls)          # features per class
        n_vw = (n_vot_2 > 0).sum(axis=0)                  # words per class

        basis = align_y_with_normal(nrm)                  # [N, 3, 3]
        learned = np.zeros(nfeat, np.float64)
        order = np.argsort(labels, kind="stable")
        bounds = np.searchsorted(labels[order], np.arange(k + 1))
        for m in range(k):
            members = order[bounds[m]:bounds[m + 1]]
            if len(members) == 0:
                continue
            for i in members:
                c = cls[i]
                s2 = sigmas[c] * sigmas[c]
                if s2 < np.finfo(np.float32).eps:
                    s2 = self._calculate_sigmas(ncls, clouds_per_class)[c] ** 2
                    if s2 < np.finfo(np.float32).eps:
                        continue
                actual = pts[i] + basis[i] @ dirs[i]
                same = members[cls[members] == c]
                predicted = pts[same] + np.einsum(
                    "fab,b->fa", basis[same], dirs[i])
                resid2 = ((predicted - actual[None, :]) ** 2).sum(axis=1)
                gauss = np.exp(-resid2 / s2)
                mid = (len(gauss) - 1) // 2
                learned[i] = np.partition(gauss, mid)[mid]

        stat = np.zeros((ncls, k), np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.where(n_ftr[None, :] > 0,
                            n_vot_2 / np.maximum(n_ftr[None, :], 1), 0.0)
            part_4 = frac.sum(axis=1)                     # [k]
        for c in range(ncls):
            if n_vw[c] == 0 or n_ftr[c] == 0:
                continue
            ok = (n_vot_2[:, c] > 0) & (n_vot > 0) & (part_4 > 0)
            stat[c, ok] = (1.0 / n_vw[c]) * (1.0 / n_vot[ok]) \
                * frac[ok, c] / part_4[ok]
        return stat, learned

    # -- classification --------------------------------------------------------

    def load_model(self, path: str) -> None:
        self.model = PclIsmTrainedModel.load(path)

    def _cast_votes(self, filename: str):
        """findObjects (:830-926) for ALL classes at once: the reference
        driver loops findObjects per class over the same scene features
        (pcl_ism.cpp:113-150); features and cluster assignment are computed
        once here, votes partitioned per class."""
        from ..ops.neighbors import knn
        cloud = load_cloud(filename).remove_nan()
        spts, snrm, desc = self._extract(cloud.xyz)
        if len(desc) == 0:
            return {}
        m = self.model
        _, idx = knn(jnp.asarray(desc, jnp.float32),
                     jnp.asarray(m.cluster_centers, jnp.float32),
                     jnp.ones(m.num_clusters, bool), k=1, metric="l2")
        nearest = np.asarray(idx)[:, 0]                  # [S]
        basis_t = align_y_with_normal(snrm).transpose(0, 2, 1)  # transpose()

        # expand: scene point i votes once per word of its cluster
        order = np.argsort(m.word_cluster, kind="stable")
        wsorted = m.word_cluster[order]
        lo = np.searchsorted(wsorted, nearest)
        hi = np.searchsorted(wsorted, nearest, side="right")
        counts = hi - lo
        src = np.repeat(np.arange(len(nearest)), counts)
        if len(src) == 0:
            return {}
        offs = np.concatenate([np.arange(c) for c in counts if c > 0])
        words = order[np.repeat(lo, counts) + offs]

        dirs = np.einsum("sab,sb->sa", basis_t[src], m.directions[words])
        votes = spts[src] + dirs
        strength = m.statistical_weights[m.classes[words], nearest[src]] \
            * m.learned_weights[words]
        keep = strength > np.finfo(np.float32).eps
        votes, strength = votes[keep], strength[keep]
        vcls = m.classes[words][keep]
        out = {}
        for c in range(m.num_classes):
            sel = vcls == c
            if sel.any():
                out[c] = (votes[sel], strength[sel])
        return out

    @staticmethod
    def _strongest_peaks(votes, strength, sigma, nms_radius):
        """findStrongestPeaks (:125-247): 100 uniformly-indexed seeds, mean
        shift with kernel strength * exp(-d^2/sigma^2) over the 3*sigma
        neighborhood until the move falls below sigma/100, then NMS over the
        converged seeds within nms_radius."""
        NUM_INIT = 100
        n = len(votes)
        seeds = votes[(np.arange(NUM_INIT) * n) // NUM_INIT].copy()
        eps = sigma / 100.0
        s2 = sigma * sigma
        for _ in range(1000):
            d2 = ((seeds[:, None, :] - votes[None, :, :]) ** 2).sum(-1)
            w = np.where(d2 <= 9.0 * s2,
                         strength[None, :] * np.exp(-d2 / s2), 0.0)
            denom = w.sum(axis=1)
            new = np.where(denom[:, None] > 0,
                           (w @ votes) / np.maximum(denom[:, None], 1e-300),
                           seeds)
            moved = np.linalg.norm(new - seeds, axis=1)
            seeds = new
            if (moved <= eps).all():
                break
        d2 = ((seeds[:, None, :] - votes[None, :, :]) ** 2).sum(-1)
        dens = (np.where(d2 <= 9.0 * s2,
                         strength[None, :] * np.exp(-d2 / s2), 0.0)).sum(1)
        flags = np.ones(NUM_INIT, bool)
        peaks = []
        for _ in range(NUM_INIT):
            if not flags.any():
                break
            i = np.argmax(np.where(flags, dens, -1.0))
            peaks.append((seeds[i], float(dens[i])))
            flags[i] = False
            flags &= np.linalg.norm(seeds - seeds[i], axis=1) >= nms_radius
        return peaks

    def classify(self, filename: str) -> List[Tuple[int, float]]:
        per_class = self._cast_votes(filename)
        results = []
        for c, (votes, strength) in per_class.items():
            sigma = float(self.model.sigmas[c]) * 8.0    # pcl_ism.cpp:141
            radius = float(self.model.sigmas[c]) * 10.0  # pcl_ism.cpp:140
            for _pos, dens in self._strongest_peaks(votes, strength,
                                                    max(sigma, 1e-9), radius):
                results.append((int(c), float(dens)))
        results.sort(key=lambda r: -r[1])
        return results
