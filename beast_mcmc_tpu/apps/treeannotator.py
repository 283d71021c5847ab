"""TreeAnnotator: summarize a posterior tree sample.

Role of dr.app.tools.treeannotator (ref: src/dr/app/tools/treeannotator/
TreeAnnotator.java, CladeSystem.java): collect clade posterior
frequencies, select the Maximum Clade Credibility (MCC) tree, and annotate
its nodes with posterior support and height summaries (mean / median /
95% HPD over the trees containing each clade).
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from beast_mcmc_tpu.data.io import read_nexus
from beast_mcmc_tpu.tree.topology import parse_newick


def hpd_interval(samples: np.ndarray, prob: float = 0.95) -> Tuple[float, float]:
    """Shortest interval containing `prob` mass (ref: dr.stats.DiscreteStatistics.HPD)."""
    x = np.sort(np.asarray(samples))
    n = len(x)
    k = max(1, int(np.ceil(prob * n)))
    widths = x[k - 1:] - x[: n - k + 1]
    i = int(np.argmin(widths))
    return float(x[i]), float(x[i + k - 1])


@dataclasses.dataclass
class TreeSample:
    parent: np.ndarray
    children: np.ndarray
    heights: np.ndarray
    root: int
    taxa: List[str]


def _clades_of(tree: TreeSample) -> Dict[int, int]:
    """node index -> clade bitmask of tip indices (iterative post-order)."""
    n = len(tree.taxa)
    m = len(tree.parent)
    mask = [0] * m
    # process nodes in height order (children first)
    order = sorted(range(m), key=lambda i: tree.heights[i])
    for node in order:
        if node < n:
            mask[node] = 1 << node
        else:
            c0, c1 = tree.children[node]
            mask[node] = mask[c0] | mask[c1]
    return {node: mask[node] for node in range(m)}


def summarize_trees(
    trees: Sequence[TreeSample],
    burnin_fraction: float = 0.1,
    prob: float = 0.95,
):
    """Returns (mcc tree, clade support dict, per-node annotations)."""
    n_burn = int(len(trees) * burnin_fraction)
    kept = list(trees[n_burn:])
    if not kept:
        raise ValueError("no trees after burn-in")
    n_trees = len(kept)

    clade_count: Dict[int, int] = {}
    clade_heights: Dict[int, List[float]] = {}
    per_tree_clades = []
    for t in kept:
        clades = _clades_of(t)
        per_tree_clades.append(clades)
        for node, c in clades.items():
            if node < len(t.taxa):
                continue
            clade_count[c] = clade_count.get(c, 0) + 1
            clade_heights.setdefault(c, []).append(float(t.heights[node]))

    # MCC: maximize sum of log clade credibilities
    best_i, best_score = 0, -np.inf
    for i, clades in enumerate(per_tree_clades):
        score = 0.0
        for node, c in clades.items():
            if node < len(kept[i].taxa):
                continue
            score += np.log(clade_count[c] / n_trees)
        if score > best_score:
            best_i, best_score = i, score
    mcc = kept[best_i]
    clades = per_tree_clades[best_i]

    annotations = {}
    for node in range(len(mcc.parent)):
        c = clades[node]
        if node < len(mcc.taxa):
            continue
        hs = np.asarray(clade_heights[c])
        lo, hi = hpd_interval(hs, prob)
        annotations[node] = {
            "posterior": clade_count[c] / n_trees,
            "height_mean": float(hs.mean()),
            "height_median": float(np.median(hs)),
            "height_hpd_lower": lo,
            "height_hpd_upper": hi,
        }
    support = {c: k / n_trees for c, k in clade_count.items()}
    return mcc, support, annotations


def annotated_newick(mcc: TreeSample, annotations: Dict[int, dict],
                     set_mean_heights: bool = False) -> str:
    """MCC tree with [&...] NHX-style annotations (FigTree-compatible)."""
    n = len(mcc.taxa)
    heights = mcc.heights.copy()
    if set_mean_heights:
        for node, ann in annotations.items():
            heights[node] = ann["height_mean"]

    def fmt(node):
        if node < n:
            label = mcc.taxa[node]
            ann = ""
        else:
            c0, c1 = mcc.children[node]
            label = f"({fmt(c0)},{fmt(c1)})"
            a = annotations[node]
            ann = (f"[&posterior={a['posterior']:.4f},"
                   f"height_mean={a['height_mean']:.6g},"
                   f"height_median={a['height_median']:.6g},"
                   f"height_95%_HPD={{{a['height_hpd_lower']:.6g},"
                   f"{a['height_hpd_upper']:.6g}}}]")
        par = mcc.parent[node]
        bl = f":{heights[par] - heights[node]:.6g}" if par >= 0 else ""
        return label + ann + bl

    return fmt(mcc.root) + ";"


def read_trees_file(path: str) -> List[TreeSample]:
    _, newicks = read_nexus(open(path).read())
    out = []
    taxa = None
    for name, nwk in newicks.items():
        parent, children, heights, root, t = parse_newick(nwk, taxa=taxa)
        taxa = taxa or t
        out.append(TreeSample(parent, children, heights, int(root), list(t)))
    return out


def main(argv=None):
    args = argv if argv is not None else sys.argv[1:]
    burnin = 0.1
    files = []
    i = 0
    while i < len(args):
        if args[i] in ("-burnin", "--burnin"):
            burnin = float(args[i + 1]); i += 2
        else:
            files.append(args[i]); i += 1
    trees = read_trees_file(files[0])
    mcc, support, ann = summarize_trees(trees, burnin)
    out = annotated_newick(mcc, ann)
    if len(files) > 1:
        open(files[1], "w").write(out + "\n")
    else:
        print(out)


if __name__ == "__main__":
    main()
