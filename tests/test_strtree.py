"""STRtree unit properties: the packed-tree probes against brute force, and
the kNN beam descent's pruning certificate (every leaf absent from the
candidate slate must have box distance >= the reported min pruned lower
bound — that is exactly what makes the caller's kNN provably exact)."""

import numpy as np

from avecado_spark.functions.strtree import STRtree


def _random_boxes(rng, n, world=1000.0, max_side=30.0):
    c = rng.uniform(0, world, size=(n, 2))
    s = rng.uniform(0.5, max_side, size=(n, 2))
    return np.column_stack([c - s, c + s])


def _box_d2(xs, ys, boxes):
    dx = np.maximum(0.0, np.maximum(boxes[None, :, 0] - xs[:, None],
                                    xs[:, None] - boxes[None, :, 2]))
    dy = np.maximum(0.0, np.maximum(boxes[None, :, 1] - ys[:, None],
                                    ys[:, None] - boxes[None, :, 3]))
    return dx * dx + dy * dy


def test_query_box_matches_brute_force():
    rng = np.random.default_rng(42)
    for n in (1, 7, 16, 17, 300, 2000):
        boxes = _random_boxes(rng, n)
        tree = STRtree(boxes)
        for _ in range(20):
            q = np.sort(rng.uniform(0, 1000, size=(2, 2)), axis=0)
            qbox = (q[0, 0], q[0, 1], q[1, 0], q[1, 1])
            got = set(tree.query_box(qbox).tolist())
            want = set(np.flatnonzero(
                ~((boxes[:, 2] < qbox[0]) | (qbox[2] < boxes[:, 0]) |
                  (boxes[:, 3] < qbox[1]) | (qbox[3] < boxes[:, 1]))).tolist())
            assert got == want, (n, qbox)


def test_knn_candidates_certificate():
    rng = np.random.default_rng(7)
    for n in (20, 100, 1500):
        boxes = _random_boxes(rng, n)
        tree = STRtree(boxes)
        xs = rng.uniform(-100, 1100, size=200)
        ys = rng.uniform(-100, 1100, size=200)
        leaf, lb, min_pruned = tree.knn_candidates(xs, ys, beam=4)
        true_d2 = _box_d2(xs, ys, boxes)
        for i in range(len(xs)):
            cands = set(int(j) for j in leaf[i] if j >= 0)
            # reported lower bounds are the true box distances
            for c, d in zip(leaf[i], lb[i]):
                if c >= 0:
                    assert d == true_d2[i, int(c)]
            # certificate: every absent leaf is at least min_pruned away
            absent = [j for j in range(n) if j not in cands]
            if absent:
                assert min(true_d2[i, j] for j in absent) >= min_pruned[i]


def test_knn_candidates_small_trees_keep_everything():
    rng = np.random.default_rng(3)
    boxes = _random_boxes(rng, 12)
    tree = STRtree(boxes)
    leaf, lb, min_pruned = tree.knn_candidates(
        np.array([500.0]), np.array([500.0]), beam=4)
    assert set(int(j) for j in leaf[0] if j >= 0) == set(range(12))
    assert np.isinf(min_pruned[0])  # nothing pruned → always certified
