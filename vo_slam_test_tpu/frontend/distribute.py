"""Quad-tree spatial keypoint distribution (host side).

Semantics follow ORB-SLAM2's DistributeOctTree (reference:
ORBextractor.cpp:545-769): start from round(w/h) root cells, repeatedly
split every node holding >1 point into 4 quadrants until the node count
reaches the per-level target (with a largest-first finishing round), then
keep the highest-response point per node.

This is the one data-dependent, sequential piece of the front end; it runs
on ~2-3k pre-compacted candidates per frame (the device already did dense
FAST + NMS + per-cell top-K), so a numpy implementation is cheap. A C++
native version is a planned optimization.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass
class _Node:
    x0: float
    x1: float
    y0: float
    y1: float
    idx: np.ndarray  # candidate indices inside this node
    no_more: bool = False


def _split(node: _Node, xs: np.ndarray, ys: np.ndarray) -> List[_Node]:
    hx = (node.x0 + node.x1) / 2.0
    hy = (node.y0 + node.y1) / 2.0
    x = xs[node.idx]
    y = ys[node.idx]
    left = x < hx
    top = y < hy
    quads = [
        _Node(node.x0, hx, node.y0, hy, node.idx[left & top]),
        _Node(hx, node.x1, node.y0, hy, node.idx[~left & top]),
        _Node(node.x0, hx, hy, node.y1, node.idx[left & ~top]),
        _Node(hx, node.x1, hy, node.y1, node.idx[~left & ~top]),
    ]
    out = []
    for q in quads:
        if q.idx.size == 0:
            continue
        q.no_more = q.idx.size == 1
        out.append(q)
    return out


def distribute_octtree(
    xs: np.ndarray,
    ys: np.ndarray,
    responses: np.ndarray,
    min_x: float,
    max_x: float,
    min_y: float,
    max_y: float,
    target: int,
) -> np.ndarray:
    """Returns indices of the retained candidates (<= ~target + a few)."""
    n = xs.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n <= target:
        return np.arange(n, dtype=np.int64)

    n_ini = max(int(round((max_x - min_x) / max(max_y - min_y, 1e-9))), 1)
    hx = (max_x - min_x) / n_ini
    all_idx = np.arange(n, dtype=np.int64)
    nodes: List[_Node] = []
    bucket = np.clip(((xs - min_x) / hx).astype(np.int64), 0, n_ini - 1)
    for i in range(n_ini):
        idx = all_idx[bucket == i]
        if idx.size == 0:
            continue
        nodes.append(
            _Node(min_x + i * hx, min_x + (i + 1) * hx, min_y, max_y, idx, no_more=idx.size == 1)
        )

    while True:
        prev_size = len(nodes)
        if prev_size >= target:
            break
        expandable = [nd for nd in nodes if not nd.no_more]
        if not expandable:
            break
        # finishing round: when a full expansion would overshoot, split the
        # most-populated nodes first and stop exactly at the target.
        if prev_size + 3 * len(expandable) > target:
            expandable.sort(key=lambda nd: nd.idx.size)
            keep = [nd for nd in nodes if nd.no_more]
            while expandable and len(keep) + len(expandable) < target:
                nd = expandable.pop()  # largest
                children = _split(nd, xs, ys)
                for ch in children:
                    if ch.no_more:
                        keep.append(ch)
                    else:
                        expandable.append(ch)
                expandable.sort(key=lambda nd: nd.idx.size)
            nodes = keep + expandable
            break
        new_nodes: List[_Node] = []
        for nd in nodes:
            if nd.no_more:
                new_nodes.append(nd)
            else:
                new_nodes.extend(_split(nd, xs, ys))
        nodes = new_nodes
        if len(nodes) == prev_size:
            break

    out = np.empty(len(nodes), dtype=np.int64)
    for i, nd in enumerate(nodes):
        r = responses[nd.idx]
        out[i] = nd.idx[int(np.argmax(r))]
    return out
