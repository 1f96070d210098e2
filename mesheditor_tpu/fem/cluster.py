"""Element clustering: agglomerate tets into macro-elements for the TPU apply.

Why: the K/M apply is ROW-RATE-bound on the TPU's gather/scatter engines (~24M
rows/s measured on a v5e, nearly independent of row width — scripts/profile_iter.py,
round 5). The element-form apply moves E*10 node-rows per gather and per scatter;
agglomerating adjacent tets into macro-elements of <= node_cap unique quadratic
nodes cuts the row count by the node-sharing factor (measured 2.4-2.6x at cap 48)
AND turns the batched matmul from (30, 30) blocks — far below MXU tile size — into
(3*cap, 3*cap) blocks that actually fill the systolic array.

Exactness: every tet belongs to exactly ONE macro, so the macro block array is a
PARTITION of the element assembly — the macro apply computes the same operator, with
cross-macro coupling carried by the shared-node scatter-add exactly as the element
form carries cross-element coupling. (Used for the preconditioner's shifted
operator; the f32 Gram/residual paths keep the element form so their roundoff is
byte-identical to before.)

Clustering is a single ORDER-GREEDY pass over elements sorted by minimum node id:
mesh build order carries enough locality that this matches face-adjacency BFS
row-for-row on the bench box (2.57x both) at 1/18th the host cost (50 ms vs 0.9 s
— the host pass runs per solve, inside the Factorize budget).
"""

from __future__ import annotations

import numpy as np


def cluster_tets(elem_nodes: np.ndarray, node_cap: int = 48):
    """Greedy order-based agglomeration of tets into macro-elements.

    elem_nodes: (E, 10) quadratic-node ids. Returns
      macro_nodes (M, node_cap) int32 — each macro's node list, padded with 0
          (pad slots have all-zero block rows/cols, so gathering node 0 there and
          scatter-adding zeros back is a no-op by construction);
      elem_macro (E,) int32 — owning macro of each tet;
      elem_slot (E, 10) int32 — slot of each tet node inside its macro's list.
    Deterministic (sorted by min node id, stable)."""
    en = np.asarray(elem_nodes, np.int64)
    e = en.shape[0]
    order = np.argsort(en.min(axis=1), kind="stable")
    elem_macro = np.empty(e, np.int32)
    elem_slot = np.empty((e, 10), np.int32)
    macro_lists: list[list[int]] = []
    cur: dict[int, int] = {}
    cur_members: list[int] = []

    def close():
        if cur_members:
            macro_lists.append(list(cur.keys()))

    for ei in order:
        row = en[ei]
        new = [n for n in row if n not in cur]
        if cur_members and len(cur) + len(new) > node_cap:
            close()
            cur = {}
            cur_members = []
            new = list(dict.fromkeys(row.tolist()))
        for n in new:
            cur[n] = len(cur)
        m = len(macro_lists)
        elem_macro[ei] = m
        for k in range(10):
            elem_slot[ei, k] = cur[row[k]]
        cur_members.append(ei)
    close()

    mcount = len(macro_lists)
    macro_nodes = np.zeros((mcount, node_cap), np.int32)
    for m, lst in enumerate(macro_lists):
        macro_nodes[m, : len(lst)] = lst
    return macro_nodes, elem_macro, elem_slot


def macro_stats(macro_nodes: np.ndarray, e: int) -> dict:
    """Row-reduction diagnostics (padding included — padded slots still move)."""
    m, cap = macro_nodes.shape
    return {
        "macros": int(m),
        "rows_padded": int(m * cap),
        "rows_elem_form": int(e * 10),
        "row_reduction": float(e * 10) / max(m * cap, 1),
    }
