"""Bag-of-Words vocabulary: hierarchical binary tree as level-wise tensors.

Role of DBoW2's `TemplatedVocabulary` over ORB descriptors (reference
`dbow2_catkin`, SURVEY.md section 2.1; vocab file `mit_voc.yml`,
launch/kimera_vio_jackal.launch:68).

TPU-native layout: level l stores all k^(l+1) candidate centroids as one
(k^(l+1), 32) uint8 tensor; descriptor-to-word assignment walks the tree
with one batched Hamming argmin per level (log_k(W) steps, each a bit-
matmul against k candidates) — no pointer chasing. tf-idf weights follow
DBoW2 (TF_IDF weighting, L1 norm).

Includes:
  * `build_vocabulary` — deterministic hierarchical binary k-means
    (majority-bit centroids, threefry seeding) to train vocabularies from
    descriptor corpora when the reference vocab file is unavailable;
  * `load_dbow2_yml` — parser for the DBoW2 OpenCV-YAML vocabulary format
    so `mit_voc.yml` (k=10, L=5 style) drops in unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.hamming import hamming_matrix, unpack_bits


class Vocabulary(NamedTuple):
    k: int  # branching factor
    depth: int  # number of levels
    centroids: tuple  # per level: (k^(l+1), 32) uint8
    word_weights: jnp.ndarray  # (k^depth,) float32 idf weights
    node_valid: tuple  # per level: (k^(l+1),) bool — tree may be ragged

    @property
    def n_words(self) -> int:
        return self.k ** self.depth


def transform(vocab: Vocabulary, descriptors: jnp.ndarray,
              valid: jnp.ndarray):
    """Assign each descriptor to a word id: (K, 32) uint8 -> (K,) int32.

    One Hamming argmin against k children per level; invalid tree branches
    are masked to distance 257.
    """
    K = descriptors.shape[0]
    node = jnp.zeros((K,), jnp.int32)
    k = vocab.k
    for lvl in range(vocab.depth):
        cents = vocab.centroids[lvl]  # (k^(lvl+1), 32)
        nvalid = vocab.node_valid[lvl]
        # children of `node` are node*k .. node*k+k-1
        child0 = node * k
        idx = child0[:, None] + jnp.arange(k)[None, :]  # (K, k)
        cand = cents[idx]  # (K, k, 32)
        d = _hamming_rows(descriptors, cand)  # (K, k)
        d = jnp.where(nvalid[idx], d, 257)
        node = child0 + jnp.argmin(d, axis=-1).astype(jnp.int32)
    word = jnp.where(valid, node, -1)
    return word


def _hamming_rows(desc: jnp.ndarray, cand: jnp.ndarray) -> jnp.ndarray:
    """desc (K, 32) vs cand (K, k, 32) -> (K, k) int32."""
    a = unpack_bits(desc).astype(jnp.int32)  # (K, 256)
    b = unpack_bits(cand).astype(jnp.int32)  # (K, k, 256)
    return jnp.sum(jnp.abs(a[:, None, :] - b), axis=-1)


def bow_from_words(word_ids: jnp.ndarray, word_weights: jnp.ndarray,
                   capacity: int):
    """Aggregate per-descriptor word assignments into a padded sparse BoW
    vector: unique word ids (-1 padded) + tf-idf weights, L1-normalized
    (DBoW2 TF_IDF + L1 norm).

    Returns (ids (capacity,), weights (capacity,)).
    """
    K = word_ids.shape[0]
    big = jnp.int32(2**30)
    ids = jnp.where(word_ids >= 0, word_ids, big)
    s = jnp.sort(ids)
    # unique segments over the sorted ids (padding collapses into one
    # trailing `big` segment with zero count)
    new_seg = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    seg_id = jnp.cumsum(new_seg) - 1  # (K,)
    counts = jnp.zeros((K,), jnp.float32).at[seg_id].add(
        jnp.where(s < big, 1.0, 0.0))
    arange = jnp.arange(K, dtype=jnp.int32)
    seg_start = jnp.full((K,), K - 1, jnp.int32).at[seg_id].min(arange)
    seg_word = s[jnp.clip(seg_start, 0, K - 1)]
    idf = word_weights[jnp.clip(seg_word, 0, word_weights.shape[0] - 1)]
    w = counts * jnp.where(seg_word < big, idf, 0.0)
    # first `capacity` segments (sorted by word id); count overflow instead
    # of silently dropping (SURVEY.md section 7.4)
    n_seg_valid = jnp.sum(
        jnp.where(jnp.arange(K) <= seg_id[-1], seg_word < big, False)
    ).astype(jnp.int32)
    if capacity > K:  # pad segment arrays up to the output capacity
        pad = capacity - K
        seg_word = jnp.concatenate([seg_word, jnp.full(pad, big, jnp.int32)])
        w = jnp.concatenate([w, jnp.zeros(pad, w.dtype)])
    in_range = jnp.arange(capacity) <= seg_id[-1]
    ids_out = jnp.where(in_range & (seg_word[:capacity] < big),
                        seg_word[:capacity], -1)
    w_out = jnp.where(ids_out >= 0, w[:capacity], 0.0)
    norm = jnp.maximum(jnp.sum(w_out), 1e-12)
    overflow = jnp.maximum(n_seg_valid - capacity, 0)
    return ids_out.astype(jnp.int32), w_out / norm, overflow


def build_vocabulary(descriptors: np.ndarray, k: int = 8, depth: int = 3,
                     seed: int = 0, kmeans_iters: int = 8) -> Vocabulary:
    """Deterministic hierarchical binary k-means (host-side, run once).

    Centroids are majority-bit aggregates (the binary-descriptor analogue
    of the mean); empty branches are marked invalid. idf weights from the
    training corpus (DBoW2: idf = log(N / n_word), words seen nowhere get
    weight 0).
    """
    rng = np.random.default_rng(seed)
    bits = np.unpackbits(descriptors, axis=1, bitorder="little")  # (N, 256)
    n_nodes = [k ** (l + 1) for l in range(depth)]
    centroids = [np.zeros((n, 32), np.uint8) for n in n_nodes]
    node_valid = [np.zeros((n,), bool) for n in n_nodes]

    def kmeans(node_bits, kk):
        n = node_bits.shape[0]
        if n == 0:
            return np.zeros((kk, 256), np.uint8), np.zeros((0,), np.int64), np.zeros(kk, bool)
        init = node_bits[rng.choice(n, size=min(kk, n), replace=False)]
        cents = np.zeros((kk, 256), np.uint8)
        cents[: init.shape[0]] = init
        alive = np.zeros(kk, bool)
        alive[: init.shape[0]] = True
        assign = np.zeros(n, np.int64)
        for _ in range(kmeans_iters):
            d = (node_bits[:, None, :] != cents[None, :, :]).sum(-1)
            d[:, ~alive] = 10**6
            assign = d.argmin(1)
            for c in range(kk):
                m = assign == c
                if m.sum() > 0:
                    cents[c] = (node_bits[m].mean(0) > 0.5).astype(np.uint8)
                    alive[c] = True
                else:
                    alive[c] = False
        return cents, assign, alive

    # level 0
    frontier = {0: np.arange(bits.shape[0])}
    for lvl in range(depth):
        next_frontier = {}
        for parent, idxs in frontier.items():
            cents, assign, alive = kmeans(bits[idxs], k)
            base = parent * k
            centroids[lvl][base : base + k] = np.packbits(
                cents.astype(np.uint8), axis=1, bitorder="little")
            node_valid[lvl][base : base + k] = alive
            for c in range(k):
                child_idxs = idxs[assign == c] if len(idxs) else idxs
                if alive[c]:
                    next_frontier[base + c] = child_idxs
        frontier = next_frontier

    # idf weights
    n_words = k ** depth
    word_weights = np.zeros(n_words, np.float32)
    leaf_counts = np.zeros(n_words, np.int64)
    for leaf, idxs in frontier.items():
        leaf_counts[leaf] = len(idxs)
    N = max(bits.shape[0], 1)
    nz = leaf_counts > 0
    word_weights[nz] = np.log(N / leaf_counts[nz])

    return Vocabulary(
        k=k,
        depth=depth,
        centroids=tuple(jnp.asarray(c) for c in centroids),
        word_weights=jnp.asarray(word_weights),
        node_valid=tuple(jnp.asarray(v) for v in node_valid),
    )


def load_dbow2_yml(path: str) -> Vocabulary:
    """Parse the DBoW2 OpenCV-YAML vocabulary format (`mit_voc.yml` style,
    reference launch/kimera_vio_jackal.launch:68):

        vocabulary:
           k: 10
           L: 5
           scoringType: 0   (L1_NORM)
           weightingType: 0 (TF_IDF)
           nodes: [ { nodeId, parentId, weight, descriptor "32 dec bytes" } ]
           words: [ { wordId, nodeId } ]

    Rebuilds the level-wise dense tensor layout used by `transform`:

      * The tree is walked **breadth-first over a parentId->children map**,
        so node ids may appear in any order in the file and children may
        carry smaller ids than their parents (DBoW2 makes no ordering
        promise beyond parent references being resolvable).
      * DBoW2 trees are **ragged**: a cluster with < 2 descriptors stops
        branching early, and that node becomes a *word* above the bottom
        level. The dense layout places words only at level L-1, so each
        early leaf is extended with a pass-through chain (a single valid
        child holding the same centroid at every deeper level); `transform`
        then deterministically follows the chain and lands on one leaf slot
        per word, preserving exact tree-walk semantics.
      * Word ids: the framework uses the flat leaf slot at level L-1 as the
        word id (consistent within one vocabulary — BoW vectors and L1
        scores are invariant to the relabeling). The file's `words:` block
        is cross-checked: every entry must reference an existing node
        that is a leaf of the parsed tree (stderr warning on mismatch,
        consistent with the orphan reconciliation below).

    Memory plan for the real `mit_voc.yml` (k=10, L=5): dense levels hold
    10 + 10^2 + ... + 10^5 = 111,110 centroids x 32 B ~= 3.6 MB, plus
    ~111 KB of validity masks and a 400 KB (10^5,) float32 weight table —
    negligible against HBM; `transform` is 5 batched Hamming argmins of
    width 10.
    """
    import re

    txt = open(path).read()
    k = int(re.search(r"\bk:\s*(\d+)", txt).group(1))
    L = int(re.search(r"\bL:\s*(\d+)", txt).group(1))
    nodes_block = txt.split("nodes:")[1].split("words:")[0]
    field_re = re.compile(
        r"nodeId:\s*(\d+)\s*,?\s*parentId:\s*(-?\d+)\s*,?\s*"
        r"weight:\s*([\d.eE+-]+)\s*,?\s*descriptor:\s*\"?([0-9a-fA-F\s.]+?)\"?\s*\}",
        re.S)
    nodes: dict[int, tuple[int, float, np.ndarray]] = {}
    children: dict[int, list[int]] = {}
    for m in field_re.finditer(nodes_block):
        nid_s, pid_s, w, desc = m.groups()
        desc = desc.strip()
        b = (bytes(int(float(x)) for x in desc.split()) if " " in desc
             else bytes.fromhex(desc))
        nid, pid = int(nid_s), int(pid_s)
        nodes[nid] = (pid, float(w), np.frombuffer(b, np.uint8))
        children.setdefault(pid, []).append(nid)

    # words block cross-check: every listed wordId must reference a node
    # that exists and is a LEAF of the children map (DBoW2 words are the
    # tree's leaves; a words entry pointing at an internal/unknown node
    # means the file is damaged)
    words_block = txt.split("words:")[1] if "words:" in txt else ""
    word_re = re.compile(r"wordId:\s*(\d+)\s*,?\s*nodeId:\s*(\d+)")
    n_bad_words = 0
    for mw in word_re.finditer(words_block):
        wnid = int(mw.group(2))
        if wnid not in nodes or wnid in children:
            n_bad_words += 1
    if n_bad_words:
        import sys

        print(f"load_dbow2_yml: {n_bad_words} words-block entries "
              "reference missing or non-leaf nodes", file=sys.stderr)

    centroids = [np.zeros((k ** (l + 1), 32), np.uint8) for l in range(L)]
    node_valid = [np.zeros((k ** (l + 1),), bool) for l in range(L)]
    word_weights = np.zeros(k ** L, np.float32)

    from collections import deque

    # BFS from the virtual root (id 0, not present in the nodes block)
    queue = deque([(0, -1, 0)])  # (nodeId, level, flat slot at that level)
    n_placed = n_dropped = 0
    while queue:
        pid, plvl, pslot = queue.popleft()
        lvl = plvl + 1
        kids = sorted(children.get(pid, ()))
        if lvl >= L:
            n_dropped += len(kids)
            continue
        for c, nid in enumerate(kids):
            if c >= k:  # malformed: more than k children
                n_dropped += 1
                continue
            idx = pslot * k + c
            _, w, desc = nodes[nid]
            d = np.zeros(32, np.uint8)
            d[: min(32, len(desc))] = desc[:32]
            centroids[lvl][idx] = d
            node_valid[lvl][idx] = True
            n_placed += 1
            if nid in children:  # internal node: recurse
                queue.append((nid, lvl, idx))
            else:  # leaf = word (possibly above the bottom level)
                leaf = idx
                for l2 in range(lvl + 1, L):  # pass-through chain
                    leaf = leaf * k
                    centroids[l2][leaf] = d
                    node_valid[l2][leaf] = True
                word_weights[leaf] = w
    # orphan subtrees (a corrupted parentId chain never reaching the root,
    # or children of a node dropped by the > k guard) are never visited by
    # the BFS — reconcile the count so a damaged file cannot report success
    n_orphan = len(nodes) - n_placed - n_dropped
    if n_dropped or n_orphan:
        import sys

        print(f"load_dbow2_yml: dropped {n_dropped} malformed nodes, "
              f"{n_orphan} orphaned (placed {n_placed} of {len(nodes)})",
              file=sys.stderr)
    return Vocabulary(
        k=k,
        depth=L,
        centroids=tuple(jnp.asarray(c) for c in centroids),
        word_weights=jnp.asarray(word_weights),
        node_valid=tuple(jnp.asarray(v) for v in node_valid),
    )
