"""TreeStat: tree-statistic calculator over posterior tree samples.

Role of the reference's TreeStat app (ref: src/dr/app/treestat/ — GUI/CLI
computing per-tree summary statistics over NEXUS/Newick tree files) and
of the in-model tree statistics (src/dr/evomodel/tree/*Statistic).

Statistics (host-side numpy; trees as flat arrays):
  rootHeight, treeLength, externalLength, internalLength, ILratio,
  nodeCount, cherryCount, collessImbalance (normalized), B1,
  gammaStatistic (Pybus & Harvey 2000), treeness, maxTipHeight.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence

import numpy as np

from beast_mcmc_tpu.tree.topology import parse_newick


def tree_statistics(parent, children, heights, root, n_taxa: int) -> Dict[str, float]:
    parent = np.asarray(parent)
    children = np.asarray(children)
    heights = np.asarray(heights)
    m = parent.shape[0]
    root = int(root)
    bl = np.where(parent >= 0, heights[np.maximum(parent, 0)] - heights, 0.0)
    external = bl[:n_taxa]
    internal = bl[n_taxa:]
    tree_len = float(bl.sum())

    # cherries: internal nodes with two tip children
    is_tip_child = children[n_taxa:] < n_taxa
    cherries = int(np.sum(np.all(is_tip_child, axis=1)))

    # tips under each internal node (for Colless / B1)
    n_under = np.ones(m)
    order = np.argsort(heights[n_taxa:]) + n_taxa
    for v in order:
        n_under[v] = n_under[children[v, 0]] + n_under[children[v, 1]]
    colless = 0.0
    b1 = 0.0
    for v in range(n_taxa, m):
        l, r = children[v]
        colless += abs(n_under[l] - n_under[r])
        if v != root:
            # B1: sum over internal non-root of 1/max depth-to-tip (in edges)
            pass
    n = n_taxa
    colless_norm = (
        2.0 * colless / ((n - 1) * (n - 2)) if n > 2 else 0.0
    )

    # max node-to-tip steps for B1
    depth_steps = np.zeros(m)
    for v in order:
        depth_steps[v] = 1 + max(
            depth_steps[children[v, 0]], depth_steps[children[v, 1]]
        )
    b1 = float(sum(
        1.0 / depth_steps[v] for v in range(n_taxa, m) if v != root
    ))

    # gamma statistic (ultrametric trees): from internode intervals
    coal_times = np.sort(heights[n_taxa:])[::-1]  # g_2..g_n intervals
    # intervals g_k = time during which k lineages exist (contemporaneous)
    times_desc = np.concatenate([coal_times, [0.0]])
    g = times_desc[:-1] - times_desc[1:]  # g[k-2] for k=2..n lineages
    ks = np.arange(2, n + 1)
    t_total = float(np.sum(ks * g))
    if n > 2 and t_total > 0:
        inner = [
            float(np.sum(ks[: i - 1] * g[: i - 1]))
            for i in range(2, n)
        ]
        mean_inner = np.mean(inner) if inner else 0.0
        gamma = (mean_inner - t_total / 2.0) / (
            t_total * np.sqrt(1.0 / (12.0 * (n - 2)))
        )
    else:
        gamma = 0.0

    return {
        "rootHeight": float(heights[root]),
        "treeLength": tree_len,
        "externalLength": float(external.sum()),
        "internalLength": float(internal.sum()),
        "ILratio": float(internal.sum() / max(external.sum(), 1e-300)),
        "nodeCount": float(m),
        "cherryCount": float(cherries),
        "collessImbalance": float(colless_norm),
        "B1": b1,
        "gammaStatistic": float(gamma),
        "treeness": float(internal.sum() / max(tree_len, 1e-300)),
        "maxTipHeight": float(heights[:n_taxa].max()),
    }


def treestat_report(
    newicks: Iterable[str],
    taxa: Sequence[str] = None,
) -> List[Dict[str, float]]:
    """Per-tree statistics for a sequence of Newick strings (the CLI
    surface of the reference's TreeStat)."""
    out = []
    for nwk in newicks:
        parent, children, heights, root, t = parse_newick(nwk, taxa=taxa)
        out.append(tree_statistics(parent, children, heights, root, len(t)))
    return out


def format_report(rows: List[Dict[str, float]]) -> str:
    if not rows:
        return ""
    cols = list(rows[0].keys())
    lines = ["tree\t" + "\t".join(cols)]
    for i, r in enumerate(rows):
        lines.append(
            f"{i}\t" + "\t".join(f"{r[c]:.6g}" for c in cols)
        )
    return "\n".join(lines)
