"""Key-value graph kernels.

``classify_cells`` reimplements the reference's degree-based node
labeling exactly (utils/utils.py:536-587):
  - outdegree 0                     → VALUE (leaf)
  - indegree 0, outdegree ≥ 1       → KEY (root)
  - in ≥ 1, out ≥ 1, all targets leaves → KEY
  - otherwise                       → UNSPECIFIED

``normalize_cell_ids`` renumbers cells and links to positional order
(reference sort_cell_ids, utils/utils.py:590-598).
"""

from __future__ import annotations

from collections import defaultdict

KEY, VALUE, UNSPECIFIED = "key", "value", "unspecified"


def classify_cells(cell_ids: list[int],
                   links: list[tuple[int, int]]) -> dict[int, str]:
    indeg: dict[int, int] = defaultdict(int)
    outdeg: dict[int, int] = defaultdict(int)
    out_nbrs: dict[int, list[int]] = defaultdict(list)
    for cid in cell_ids:
        indeg[cid] = 0
        outdeg[cid] = 0
        out_nbrs[cid] = []
    for src, tgt in links:
        outdeg[src] += 1
        indeg[tgt] += 1
        out_nbrs[src].append(tgt)

    labels: dict[int, str] = {}
    for cid in cell_ids:
        if outdeg[cid] == 0:
            labels[cid] = VALUE
        elif indeg[cid] == 0:
            labels[cid] = KEY
        elif outdeg[cid] > 0 and indeg[cid] > 0:
            if all(outdeg[nb] == 0 for nb in out_nbrs[cid]):
                labels[cid] = KEY
            else:
                labels[cid] = UNSPECIFIED
        else:
            labels[cid] = UNSPECIFIED
    return labels


def normalize_cell_ids(cell_ids: list[int],
                       links: list[tuple[int, int]]):
    """Renumber cell ids (and link endpoints) to positional order."""
    mapping = {cid: i for i, cid in enumerate(cell_ids)}
    return (
        [mapping[c] for c in cell_ids],
        [(mapping[s], mapping[t]) for s, t in links],
    )


def distinct_links(links: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Order-preserving distinct of (source, target) pairs (reference
    funsd_builder.py:283-289)."""
    seen = set()
    out = []
    for pair in links:
        if pair not in seen:
            seen.add(pair)
            out.append(pair)
    return out
