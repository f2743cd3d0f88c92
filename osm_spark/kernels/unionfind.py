"""Union-find with union-by-rank (no path compression).

Semantics parity with the reference implementation
(/root/reference/unionfind.go:1-49): ``find`` follows parent pointers
without compressing, ``merge`` attaches the lower-rank root under the
higher-rank root and, on ties, attaches the second argument's root under
the first's and bumps its rank. The exact representative ids matter for
deterministic arc-merge order (ring assembly), so we keep the same tie
rule instead of a generic DSU.
"""

from __future__ import annotations


class UnionFind:
    __slots__ = ("parent", "rank")

    def __init__(self, count: int) -> None:
        self.parent = list(range(count))
        self.rank = [0] * count

    def find(self, i: int) -> int:
        p = self.parent
        while p[i] != i:
            i = p[i]
        return i

    def merge(self, i1: int, i2: int) -> None:
        n1 = self.find(i1)
        n2 = self.find(i2)
        if n1 == n2:
            return
        if self.rank[n1] < self.rank[n2]:
            self.parent[n1] = n2
        elif self.rank[n1] > self.rank[n2]:
            self.parent[n2] = n1
        else:
            self.parent[n2] = n1
            self.rank[n1] += 1
