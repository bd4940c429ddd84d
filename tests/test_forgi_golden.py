"""External golden tests + randomized property tests for the forgi
element decomposition (graphs/forgi_elements.py).

The reference delegates decomposition to the forgi package itself
(reference utils.py:316-325); forgi is not installable in this image, so
the goldens below encode forgi's *documented* semantics:

- element letters per nucleotide follow ``BulgeGraph.to_element_string``
  (s=stem, h=hairpin, i=interior, m=multiloop segment, f=5' unpaired,
  t=3' unpaired), as documented in the forgi graph tutorial
  (viennarna.github.io/forgi graph_tutorial; Kerpedjiev et al. 2015,
  Bioinformatics 31(20):3377-3379, Fig. 1 uses the same decomposition);
- stems are maximal helices of stacked pairs; an interior loop is the
  (possibly one-sided) unpaired region between exactly two stems; every
  single-stranded segment of a >=2-branch loop (including the exterior
  loop and zero-length segments) is its own multiloop element.

The property tests bound the remaining risk on arbitrary inputs:
partition completeness, stem maximality, loop membership, and
element-connection consistency over thousands of random structures.
"""

import numpy as np
import pytest

from ginfinity_tpu.graphs.dotbracket import pair_table
from ginfinity_tpu.graphs.forgi_elements import (
    Element,
    _nested_pairs,
    decompose_elements,
    element_connections,
)

_LETTER = {
    "stem": "s",
    "hairpin": "h",
    "internal": "i",
    "multiloop": "m",
    "five_prime": "f",
    "three_prime": "t",
}


def element_string(structure: str) -> str:
    """Per-position element letters, forgi's to_element_string layout."""
    pt = pair_table(structure, strict=False)
    els = decompose_elements(pt)
    out = [None] * len(structure)
    for el in els:
        for pos in el.members:
            assert out[pos] is None, f"position {pos} in two elements"
        for pos in el.members:
            out[pos] = _LETTER[el.kind]
    assert None not in out, "positions missing from every element"
    return "".join(out)


# --------------------------------------------------------------------
# Goldens. Each entry: (structure, expected element string,
# expected per-kind element counts).
# --------------------------------------------------------------------

GOLDEN = [
    # hairpin + stem (forgi tutorial's minimal example shape)
    ("(((...)))", "ssshhhsss", {"stem": 1, "hairpin": 1}),
    # 5' and 3' dangles
    ("..(((...)))..", "ffssshhhssstt",
     {"stem": 1, "hairpin": 1, "five_prime": 1, "three_prime": 1}),
    # symmetric interior loop
    ("((..((...))..))", "ssiisshhhssiiss",
     {"stem": 2, "hairpin": 1, "internal": 1}),
    # one-sided interior loop (bulge): still ONE 'i' element in forgi
    ("(((..((...)))))", "sssiisshhhsssss",
     {"stem": 2, "hairpin": 1, "internal": 1}),
    # three-branch multiloop: every single-stranded segment its own 'm'
    ("((.((...)).((...)).))", "ssmsshhhssmsshhhssmss",
     {"stem": 3, "hairpin": 2, "multiloop": 3}),
    # zero-length multiloop segments still exist as elements
    ("((((...))((...))))", "sssshhhsssshhhssss",
     {"stem": 3, "hairpin": 2, "multiloop": 3}),
    # exterior-loop segment between top-level stems is a multiloop
    # segment in forgi (not a separate exterior type)
    ("((...))..((...))", "sshhhssmmsshhhss",
     {"stem": 2, "hairpin": 2, "multiloop": 1}),
    # forgi graph-tutorial worked example (documented element string)
    (
        "(((((((((...((((((.........))))))........((((((.......))))))..)))))))))",
        "sssssssssmmmsssssshhhhhhhhhssssssmmmmmmmmsssssshhhhhhhssssssmmsssssssss",
        {"stem": 3, "hairpin": 2, "multiloop": 3},
    ),
    # unpaired-only structure: a single 5' element
    ("....", "ffff", {"five_prime": 1}),
]


class TestForgiGolden:
    @pytest.mark.parametrize("structure,expected,counts", GOLDEN)
    def test_element_string(self, structure, expected, counts):
        assert element_string(structure) == expected

    @pytest.mark.parametrize("structure,expected,counts", GOLDEN)
    def test_element_counts(self, structure, expected, counts):
        els = decompose_elements(pair_table(structure, strict=False))
        got: dict[str, int] = {}
        for el in els:
            got[el.kind] = got.get(el.kind, 0) + 1
        assert got == counts

    def test_connections_multiloop(self):
        """forgi bg.edges semantics: each multiloop segment connects the
        two stems it lies between; hairpins connect to one stem."""
        els = decompose_elements(pair_table("((.((...)).((...)).))"))
        conns = element_connections(els)
        stems = [i for i, e in enumerate(els) if e.kind == "stem"]
        for i, el in enumerate(els):
            deg = sum(1 for a, b in conns if i in (a, b))
            if el.kind == "hairpin":
                assert deg == 1
            elif el.kind == "multiloop":
                assert deg == 2
        # every connection touches at least one stem
        assert all(a in stems or b in stems for a, b in conns)


# --------------------------------------------------------------------
# Randomized property tests
# --------------------------------------------------------------------


def random_structure(rng: np.random.Generator, n: int, p_open=0.3, p_close=0.3,
                     pseudoknot=False) -> str:
    """Random valid dot-bracket of length n (stack simulation)."""
    chars = []
    stack = 0
    pk_stack = 0
    for i in range(n):
        r = rng.random()
        remaining = n - i
        if stack + pk_stack >= remaining:  # must close to stay valid
            if pk_stack and (stack == 0 or rng.random() < 0.5):
                chars.append("]")
                pk_stack -= 1
            else:
                chars.append(")")
                stack -= 1
        elif r < p_open and stack + pk_stack + 1 < remaining:
            if pseudoknot and rng.random() < 0.15:
                chars.append("[")
                pk_stack += 1
            else:
                chars.append("(")
                stack += 1
        elif r < p_open + p_close and (stack > 0 or pk_stack > 0):
            if pk_stack and rng.random() < 0.3:
                chars.append("]")
                pk_stack -= 1
            elif stack:
                chars.append(")")
                stack -= 1
            else:
                chars.append("]")
                pk_stack -= 1
        else:
            chars.append(".")
    return "".join(chars)


def _stem_pairs(el: Element) -> list[tuple[int, int]]:
    m = el.members
    k = len(m) // 2
    return [(m[d], m[-1 - d]) for d in range(k)]


class TestForgiProperties:
    N_STRUCTURES = 1200

    @pytest.fixture(scope="class")
    def cases(self):
        rng = np.random.default_rng(7)
        out = []
        for t in range(self.N_STRUCTURES):
            n = int(rng.integers(1, 120))
            s = random_structure(rng, n, pseudoknot=(t % 4 == 0))
            pt = pair_table(s, strict=False)
            if pt is None:
                continue
            out.append((s, pt, decompose_elements(pt)))
        assert len(out) > 1000
        return out

    def test_partition_completeness(self, cases):
        """Every base belongs to exactly one element."""
        for s, pt, els in cases:
            seen = np.zeros(len(s), np.int32)
            for el in els:
                for pos in el.members:
                    seen[pos] += 1
            assert (seen == 1).all(), s

    def test_stems_are_maximal_helices(self, cases):
        """Each stem is a run of stacked nested pairs that cannot be
        extended outward or inward."""
        for s, pt, els in cases:
            nested = _nested_pairs(pt)
            n = len(s)
            for el in els:
                if el.kind != "stem":
                    continue
                pairs = _stem_pairs(el)
                assert pairs, s
                # members really form stacked pairs
                for (i, j), (i2, j2) in zip(pairs, pairs[1:]):
                    assert (i2, j2) == (i + 1, j - 1), (s, el.members)
                for i, j in pairs:
                    assert int(nested[i]) == j, (s, el.members)
                # maximality outward and inward
                i0, j0 = pairs[0]
                ik, jk = pairs[-1]
                if i0 - 1 >= 0 and j0 + 1 < n:
                    assert int(nested[i0 - 1]) != j0 + 1, s
                assert not (
                    ik + 1 < n and int(nested[ik + 1]) == jk - 1 and jk - 1 > ik + 1
                ), s

    def test_nested_subset_is_inclusion_maximal(self, cases):
        """Every pair-table pair NOT kept by _nested_pairs must cross a
        kept pair — the greedy scan alone could drop a pair whose
        crossers were themselves dropped (regression: '([)(])' lost
        (0, 2))."""
        for s, pt, _ in cases:
            nested = _nested_pairs(pt)
            kept = [(i, int(nested[i])) for i in range(len(s))
                    if int(nested[i]) > i]
            for a in range(len(s)):
                b = int(pt[a])
                if b <= a or int(nested[a]) == b:
                    continue
                assert any(
                    (c < a < d < b) or (a < c < b < d) for c, d in kept
                ), (s, a, b)

    def test_pseudoknot_regression_keeps_noncrossing_pair(self):
        import numpy as np

        pt = np.array([2, 4, 0, 5, 1, 3], np.int32)  # '([)(])'
        nested = _nested_pairs(pt)
        assert int(nested[0]) == 2 and int(nested[2]) == 0
        assert int(nested[3]) == 5 and int(nested[5]) == 3
        assert int(nested[1]) == -1 and int(nested[4]) == -1

    def test_loop_members_unpaired(self, cases):
        """Loop elements contain only nested-unpaired positions."""
        for s, pt, els in cases:
            nested = _nested_pairs(pt)
            for el in els:
                if el.kind == "stem":
                    continue
                for pos in el.members:
                    assert int(nested[pos]) < 0, (s, el.kind, pos)

    def test_connection_degrees(self, cases):
        """forgi-consistent element degrees: hairpins border 1 stem,
        interior loops exactly 2, multiloop segments exactly 2,
        dangling ends at most 1."""
        expected = {
            "hairpin": (1, 1),
            "internal": (2, 2),
            "multiloop": (2, 2),
            "five_prime": (0, 1),
            "three_prime": (1, 1),
        }
        for s, pt, els in cases:
            stems = [i for i, e in enumerate(els) if e.kind == "stem"]
            for el in els:
                if el.kind == "stem":
                    continue
                lo, hi = expected[el.kind]
                deg = len(set(el.connected_stems))
                assert lo <= deg <= hi, (s, el.kind, el.connected_stems)
                assert all(sid in stems for sid in el.connected_stems), s

    def test_loops_border_their_stems(self, cases):
        """A loop's connected stems are exactly the stems adjacent (in
        sequence) to the loop's member runs — consistency between the
        membership and the connection graph."""
        for s, pt, els in cases:
            n = len(s)
            owner = np.full(n, -1, np.int32)  # position -> stem element id
            for i, el in enumerate(els):
                if el.kind == "stem":
                    for pos in el.members:
                        owner[pos] = i
            for el in els:
                if el.kind == "stem" or not el.members:
                    continue
                adjacent = set()
                for pos in el.members:
                    if pos - 1 >= 0 and owner[pos - 1] >= 0:
                        adjacent.add(int(owner[pos - 1]))
                    if pos + 1 < n and owner[pos + 1] >= 0:
                        adjacent.add(int(owner[pos + 1]))
                assert adjacent <= set(el.connected_stems), (
                    s, el.kind, el.members, adjacent, el.connected_stems,
                )
