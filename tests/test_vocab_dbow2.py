"""`load_dbow2_yml` validation on a realistic fixture (VERDICT r2 item 7).

Fixture: a ragged k=10, depth-4 DBoW2 OpenCV-YAML vocabulary with >= 10^4
nodes, node ids relabeled by a random permutation (so children routinely
carry SMALLER ids than their parents — DBoW2 makes no ordering promise),
entries written in shuffled order, and ~1% of branches terminating early
(words above the bottom level, as real DBoW2 trees have).

Oracle: an independent host tree-walk over the raw parent/child dicts —
descend from the root by Hamming argmin over each node's sorted children
(first-minimum tie-break, matching `transform`'s argmin over child slots).
The oracle's leaf SLOT is derived purely from the child-position path
(slot = fold(slot*k + pos), padded with pass-through zeros below an early
leaf), so it shares no code with the loader's placement logic.

Reference behavior being validated: DBoW2 TemplatedVocabulary::transform
(reference `dbow2_catkin`, SURVEY.md section 2.1; `mit_voc.yml` drop-in at
launch/kimera_vio_jackal.launch:68).
"""

import numpy as np
import pytest

from kimera_multi_tpu.frontend import vocab as vocab_mod

K_BRANCH = 10
DEPTH = 4


def _popcount_bytes(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.unpackbits(a ^ b).sum())


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    """Build the ragged tree, relabel ids, write the YAML, load it."""
    rng = np.random.default_rng(42)

    # ---- grow the tree in canonical ids (0 = virtual root) --------------
    nodes = {}  # canonical nid -> (parent canonical nid, weight, desc)
    children = {}  # canonical nid -> [canonical child ids]
    next_id = 1
    frontier = [0]
    for lvl in range(DEPTH):
        new_frontier = []
        for pid in frontier:
            if lvl >= 1 and pid != 0 and rng.uniform() < 0.01:
                continue  # early leaf: a word above the bottom level
            n_kids = K_BRANCH if lvl < 2 else int(rng.integers(10, 11))
            for _ in range(n_kids):
                nid = next_id
                next_id += 1
                desc = rng.integers(0, 256, 32, dtype=np.uint8)
                w = float(rng.uniform(0.5, 3.0)) if lvl == DEPTH - 1 else 0.0
                nodes[nid] = (pid, w, desc)
                children.setdefault(pid, []).append(nid)
                new_frontier.append(nid)
        frontier = new_frontier
    # leaves (no children) get idf-style weights
    for nid, (pid, w, desc) in list(nodes.items()):
        if nid not in children and w == 0.0:
            nodes[nid] = (pid, float(rng.uniform(0.5, 3.0)), desc)
    n_nodes = len(nodes)
    assert n_nodes >= 10_000, n_nodes  # the fixture must be realistic-scale

    # ---- relabel with a random permutation (out-of-order parent ids) ----
    perm = rng.permutation(n_nodes) + 1  # new ids, 1-based; root stays 0
    relabel = {0: 0}
    for i, nid in enumerate(sorted(nodes)):
        relabel[nid] = int(perm[i])
    nodes_r = {relabel[n]: (relabel[p], w, d)
               for n, (p, w, d) in nodes.items()}
    children_r = {relabel[p]: sorted(relabel[c] for c in kids)
                  for p, kids in children.items()}
    # sanity: the permutation must produce children with smaller ids than
    # their parents, or the fixture does not test out-of-order handling
    n_inverted = sum(1 for n, (p, _, _) in nodes_r.items() if p != 0 and n < p)
    assert n_inverted > n_nodes // 10

    # ---- write the OpenCV-YAML file in shuffled entry order -------------
    entries = []
    for nid, (pid, w, d) in nodes_r.items():
        ds = " ".join(str(int(x)) for x in d)
        entries.append(f"      - {{ nodeId:{nid}, parentId:{pid}, "
                       f"weight:{w:.6e}, descriptor:\"{ds} \" }}")
    rng.shuffle(entries)
    leaves = sorted(n for n in nodes_r if n not in children_r)
    words = [f"      - {{ wordId:{i}, nodeId:{n} }}"
             for i, n in enumerate(leaves)]
    txt = ("%YAML:1.0\n---\nvocabulary:\n"
           f"   k: {K_BRANCH}\n   L: {DEPTH}\n"
           "   scoringType: 0\n   weightingType: 0\n"
           "   nodes:\n" + "\n".join(entries) +
           "\n   words:\n" + "\n".join(words) + "\n")
    path = tmp_path_factory.mktemp("dbow2") / "voc.yml"
    path.write_text(txt)

    voc = vocab_mod.load_dbow2_yml(str(path))
    return voc, nodes_r, children_r


def _oracle_leaf(desc: np.ndarray, nodes, children):
    """Host tree-walk: returns (leaf node id, flat leaf slot at level L-1,
    leaf weight). Slot derivation is independent of the loader."""
    nid, slot, lvl = 0, 0, -1
    while nid in children:
        kids = children[nid]  # already sorted
        dists = [_popcount_bytes(desc, nodes[c][2]) for c in kids]
        pos = int(np.argmin(dists))  # first minimum, like argmin over slots
        nid = kids[pos]
        slot = slot * K_BRANCH + pos
        lvl += 1
    # pass-through padding below an early leaf
    slot *= K_BRANCH ** (DEPTH - 1 - lvl)
    return nid, slot, nodes[nid][1]


def test_loader_places_full_tree(fixture_tree):
    voc, nodes, children = fixture_tree
    assert voc.k == K_BRANCH and voc.depth == DEPTH
    placed = sum(int(np.asarray(v).sum()) for v in voc.node_valid)
    # every node placed, plus one pass-through slot per level skipped by
    # each early leaf
    n_pass = sum(
        DEPTH - 1 - _level(nid, nodes)
        for nid in nodes if nid not in children
    )
    assert placed == len(nodes) + n_pass


def _level(nid, nodes):
    lvl = -1
    while nid != 0:
        nid = nodes[nid][0]
        lvl += 1
    return lvl


def test_transform_matches_tree_walk_oracle(fixture_tree):
    import jax.numpy as jnp

    voc, nodes, children = fixture_tree
    rng = np.random.default_rng(7)
    descs = rng.integers(0, 256, (300, 32), dtype=np.uint8)
    # include exact leaf centroids (distance-0 paths) and an early leaf
    leaves = [n for n in nodes if n not in children]
    picks = rng.choice(len(leaves), 50, replace=False)
    exact = np.stack([nodes[leaves[i]][2] for i in picks])
    early = [n for n in leaves if _level(n, nodes) < DEPTH - 1]
    assert early, "fixture lost its early leaves"
    exact[0] = nodes[early[0]][2]
    descs = np.concatenate([descs, exact])

    got = np.asarray(vocab_mod.transform(
        voc, jnp.asarray(descs), jnp.ones(len(descs), bool)))
    want = np.asarray([_oracle_leaf(d, nodes, children)[1] for d in descs])
    assert (got == want).all(), (got != want).nonzero()


def test_word_weights_and_early_leaf_slots(fixture_tree):
    voc, nodes, children = fixture_tree
    ww = np.asarray(voc.word_weights)
    for nid in list(n for n in nodes if n not in children)[:200]:
        _, slot, w = _oracle_leaf(nodes[nid][2], nodes, children)
        # the leaf's own centroid must land on its own slot with its weight
        assert ww[slot] == pytest.approx(w, rel=1e-5)


def test_bow_scoring_parity_with_host_oracle(fixture_tree):
    """BoW build + L1 score through the vocab path equals a host oracle."""
    import jax.numpy as jnp

    from kimera_multi_tpu.kernels import bow

    voc, nodes, children = fixture_tree
    rng = np.random.default_rng(3)
    K = 64

    def host_bow(descs):
        hist = {}
        for d in descs:
            _, slot, w = _oracle_leaf(d, nodes, children)
            hist[slot] = hist.get(slot, 0.0) + w
        tot = sum(hist.values())
        return {s: v / tot for s, v in hist.items()}

    def device_bow(descs):
        words = vocab_mod.transform(voc, jnp.asarray(descs),
                                    jnp.ones(len(descs), bool))
        ids, w, overflow = vocab_mod.bow_from_words(
            words, voc.word_weights, capacity=K)
        assert int(overflow) == 0
        return ids, w

    da = rng.integers(0, 256, (K, 32), dtype=np.uint8)
    db = rng.integers(0, 256, (K, 32), dtype=np.uint8)
    ha, hb = host_bow(da), host_bow(db)
    want = sum(min(ha[s], hb.get(s, 0.0)) for s in ha)

    ia, wa = device_bow(da)
    ib, wb = device_bow(db)
    qs, qw = bow.sort_bow(ia, wa)
    got = float(bow.l1_scores(qs, qw, ib[None], wb[None],
                              jnp.ones(1, bool))[0])
    assert got == pytest.approx(want, rel=1e-5)
