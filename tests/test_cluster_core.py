"""Unit tests for the greedy clustering core using a scripted fake
engine — the reference tests these semantics against real skani/fastANI
(src/clusterer.rs:537-823); here the engine is deterministic and the
expectations are derived from first principles plus reference parity.
"""

from typing import Optional

from galah_tpu.cluster.cache import SortedPairDistanceCache
from galah_tpu.cluster.greedy import cluster
from galah_tpu.cluster.union_find import DisjointSet
from galah_tpu.engines.base import ClusterDistanceFinder, PreclusterDistanceFinder


class FakePreclusterer(PreclusterDistanceFinder):
    def __init__(self, n, pairs, name="fake"):
        self.n = n
        self.pairs = pairs  # {(i, j): ani}
        self.name = name

    def distances(self, paths):
        cache = SortedPairDistanceCache()
        for (i, j), ani in self.pairs.items():
            cache.insert((i, j), ani)
        return cache

    distances_contigs = None
    distances_with_references = None

    def distances_contigs(self, paths, contig_names):  # noqa: F811
        return self.distances(paths)

    def distances_with_references(self, paths, refs):  # noqa: F811
        return self.distances(paths)

    def method_name(self):
        return self.name


class FakeClusterer(ClusterDistanceFinder):
    def __init__(self, threshold, ani_by_pair, name="fakeclu"):
        self.threshold = threshold
        self.ani_by_pair = ani_by_pair  # {(pathA, pathB) sorted: ani or None}
        self.calls = []
        self.name = name

    def method_name(self):
        return self.name

    def get_ani_threshold(self):
        return self.threshold

    def calculate_ani(self, f1, f2) -> Optional[float]:
        self.calls.append((f1, f2))
        key = tuple(sorted((f1, f2)))
        return self.ani_by_pair.get(key)


def paths(n):
    return [f"g{i}" for i in range(n)]


def test_single_cluster():
    pre = FakePreclusterer(3, {(0, 1): 96.0, (0, 2): 95.5, (1, 2): 97.0})
    clu = FakeClusterer(
        95.0,
        {("g0", "g1"): 96.5, ("g0", "g2"): 95.2, ("g1", "g2"): 97.0},
    )
    out = cluster(paths(3), pre, clu)
    assert out == [[0, 1, 2]]


def test_two_clusters_by_threshold():
    # 2 is preclustered with 0 and 1 but its precise ANI is below threshold
    pre = FakePreclusterer(3, {(0, 1): 97.0, (0, 2): 91.0, (1, 2): 91.0})
    clu = FakeClusterer(
        95.0,
        {("g0", "g1"): 97.0, ("g0", "g2"): 93.0, ("g1", "g2"): 93.0},
    )
    out = cluster(paths(3), pre, clu)
    assert out == [[0, 1], [2]]


def test_disjoint_preclusters_no_cross_ani_calls():
    pre = FakePreclusterer(4, {(0, 1): 97.0, (2, 3): 97.0})
    clu = FakeClusterer(
        95.0,
        {("g0", "g1"): 97.0, ("g2", "g3"): 97.0},
    )
    out = cluster(paths(4), pre, clu)
    assert sorted(out) == [[0, 1], [2, 3]]
    # No ANI computed across preclusters
    for f1, f2 in clu.calls:
        assert tuple(sorted((f1, f2))) in clu.ani_by_pair


def test_skip_clusterer_reuses_precluster_anis():
    pre = FakePreclusterer(3, {(0, 1): 96.0, (0, 2): 91.0}, name="same")
    clu = FakeClusterer(95.0, {}, name="same")
    out = cluster(paths(3), pre, clu)
    # 1 joins 0 (96 >= 95); 2 stays separate (91 < 95) but is in the same
    # precluster via single linkage, assigned to best rep with known ANI=91?
    # No: 2 is a rep itself since no rep passes threshold.
    assert out == [[0, 1], [2]]
    assert clu.calls == []  # clusterer never invoked


def test_membership_best_ani_wins():
    # 0 and 1 both reps (ANI(0,1) < threshold); 2 within threshold of both,
    # closer to 1.
    pre = FakePreclusterer(3, {(0, 1): 91.0, (0, 2): 95.5, (1, 2): 96.0})
    clu = FakeClusterer(
        95.0,
        {("g0", "g1"): 91.0, ("g0", "g2"): 95.5, ("g1", "g2"): 96.0},
    )
    out = cluster(paths(3), pre, clu)
    # greedy: 0 rep; 1 fails (91 < 95) -> rep; 2 passes vs 0 (95.5) ->
    # member; best ANI rep is 1 (96 > 95.5)
    assert out == [[0], [1, 2]]


def test_priority_order_determines_reps():
    # Same data, but priority order makes g1 the rep of {1, 0}
    pre = FakePreclusterer(2, {(0, 1): 99.0})
    clu = FakeClusterer(95.0, {("g0", "g1"): 99.0})
    out = cluster(paths(2), pre, clu)
    assert out == [[0, 1]]  # index 0 is first in priority order


def test_transitivity_bug_fix_skip_clusterer():
    # A-B >= t, B-C >= t, but A-C < t and not in cache as a pair value.
    # With skip_clusterer, rep selection: A rep; B joins A; C: candidates
    # vs rep A only -> ANI(A,C)=90 < t so C becomes a rep. Membership fine.
    pre = FakePreclusterer(
        3, {(0, 1): 97.0, (1, 2): 97.0, (0, 2): 90.0}, name="same"
    )
    clu = FakeClusterer(95.0, {}, name="same")
    out = cluster(paths(3), pre, clu)
    assert out == [[0, 1], [2]]


def test_union_find_sets_order():
    ds = DisjointSet(5)
    ds.join(3, 4)
    ds.join(0, 2)
    assert ds.sets() == [[0, 2], [1], [3, 4]]


def test_cache_transform_ids():
    # Parity with src/sorted_pair_genome_distance_cache.rs:61-115
    cache = SortedPairDistanceCache()
    cache.insert((1, 2), 0.99)
    cache.insert((1, 4), 0.98)
    assert len(cache.transform_ids([0, 3])) == 0
    t = cache.transform_ids([1, 2])
    assert t.get((0, 1)) == (0.99,)
    t = cache.transform_ids([1, 2, 4])
    assert t.get((0, 1)) == (0.99,)
    assert t.get((0, 2)) == (0.98,)
    assert t.get((1, 2)) is None


def test_cache_sorted_keys():
    cache = SortedPairDistanceCache()
    cache.insert((5, 2), 0.9)
    assert cache.get((2, 5)) == (0.9,)
    assert cache.get((5, 2)) == (0.9,)
    assert cache.contains_key((2, 5))
    cache.insert((2, 5), None)
    assert cache.get((5, 2)) == (None,)  # present-but-None distinguishable


def _oracle_cluster(n, pair_anis, threshold, clu_anis=None):
    """Straightforward reimplementation of the reference semantics
    (scan over ALL reps per genome, src/clusterer.rs:182-259, 350-449)
    — the O(m^2) shape the production adjacency-scan path must match
    exactly, including stable-sort tie order."""
    import bisect

    skip = clu_anis is None
    cache = SortedPairDistanceCache()
    for (i, j), ani in pair_anis.items():
        cache.insert((i, j), ani)
    ds = DisjointSet(n)
    for (i, j), _ in cache.items():
        ds.join(i, j)
    preclusters = ds.sets()
    preclusters.sort(key=len, reverse=True)
    out = []
    for ids in preclusters:
        local = cache.transform_ids(ids)
        m = len(ids)
        reps = []
        calculated = SortedPairDistanceCache()
        for i in range(m):
            cands = []
            for j in reps:
                got = local.get((i, j))
                if got is not None:
                    cands.append((j, got[0]))
            cands.sort(key=lambda t: (t[1] is not None, t[1]))
            is_rep = True
            for j, _ in cands:
                if skip:
                    got = local.get((j, i))
                    ani = got[0] if got is not None else None
                else:
                    key = tuple(sorted((f"g{ids[i]}", f"g{ids[j]}")))
                    ani = clu_anis.get(key)
                    if ani is not None:
                        calculated.insert((j, i), ani)
                if ani is not None and ani >= threshold:
                    is_rep = False
            if is_rep:
                bisect.insort(reps, i)
        if skip:
            calculated = local
        rep_set = set(reps)
        rep_to_idx = {r: k for k, r in enumerate(reps)}
        result = [[r] for r in reps]
        for i in range(m):
            if i in rep_set:
                continue
            if not skip:
                for rep in reps:
                    if not calculated.contains_key((i, rep)) and local.contains_key(
                        (i, rep)
                    ):
                        key = tuple(sorted((f"g{ids[i]}", f"g{ids[rep]}")))
                        calculated.insert((i, rep), clu_anis.get(key))
            best = None
            bani = None
            for rep in reps:
                got = calculated.get((i, rep))
                ani = got[0] if got is not None else None
                if ani is not None and (bani is None or ani > bani):
                    best, bani = rep, ani
            result[rep_to_idx[best]].append(i)
        for c in result:
            out.append([ids[w] for w in c])
    return out


def test_adjacency_scan_matches_full_scan_oracle():
    """Randomized parity pin for the O(E) adjacency-scan fast path
    (both skip and non-skip modes), with quantized ANIs forcing ties so
    tie-break iteration order is exercised."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        n = 60
        pair_anis = {}
        for i in range(n):
            for j in range(i + 1, n):
                if rng.random() < 0.12:
                    pair_anis[(i, j)] = rng.choice([93.0, 95.0, 96.0, 96.0, 98.0])
        # skip mode (precluster method == cluster method)
        pre = FakePreclusterer(n, pair_anis, name="same")
        clu = FakeClusterer(95.0, {}, name="same")
        got = cluster(paths(n), pre, clu)
        want = _oracle_cluster(n, pair_anis, 95.0)
        assert got == want, f"skip mode diverged at seed {seed}"
        # non-skip mode: independent clusterer ANIs, some None
        clu_anis = {}
        for (i, j) in pair_anis:
            key = tuple(sorted((f"g{i}", f"g{j}")))
            clu_anis[key] = rng.choice([None, 94.0, 95.5, 96.5, 96.5])
        pre2 = FakePreclusterer(n, pair_anis, name="pre")
        clu2 = FakeClusterer(95.0, clu_anis, name="clu")
        got2 = cluster(paths(n), pre2, clu2)
        want2 = _oracle_cluster(n, pair_anis, 95.0, clu_anis)
        assert got2 == want2, f"non-skip mode diverged at seed {seed}"
